package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.queries.Parity.Q
import graft.tables.Tables

/** Beyond-reference training-data-pipeline operators (builder prompt +
  * SURVEY §7 last paragraph): deduplication, similarity search, text
  * analysis, multimodal plumbing — each exercised over the `documents` /
  * `embeddings` / `events` testdata with a DuckDB oracle where the
  * semantics are SQL-expressible.
  */
object Extensions {

  /** Exact dedup — hash-groupBy on content fingerprint. At scale this is
    * one shuffle on the 32-byte digest, with map-side combine.
    */
  private val q40 = Q("q40_dedup_exact",
    (s, d) => Dedup.exact(Tables.documents(s, d), col("text"), col("doc_id"))
      .orderBy("fp"),
    Some("""SELECT MD5(text) AS fp, MIN(doc_id) AS keep_id,
              COUNT(*) AS copies
            FROM documents GROUP BY MD5(text) ORDER BY fp"""))

  /** Text quality scoring — length / punctuation / stopword ratios. */
  private val q41 = Q("q41_text_quality",
    (s, d) => TextAnalysis.qualityScore(Tables.documents(s, d))
      .orderBy("doc_id"),
    Some(TextAnalysis.qualityScoreOracle))

  /** Token counting — whitespace + BPE-ish regex token streams. */
  private val q42 = Q("q42_token_count",
    (s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d))
      .orderBy("doc_id"),
    Some(TextAnalysis.tokenCountsOracle))

  /** Language ID — marker-word scoring with deterministic argmax. */
  private val q43 = Q("q43_lang_id",
    (s, d) => TextAnalysis.langId(Tables.documents(s, d))
      .orderBy("doc_id"),
    Some(TextAnalysis.langIdOracle))

  /** Document fingerprinting — min-of-shingle-hashes (winnowing-lite). */
  private val q44 = Q("q44_doc_fingerprint",
    (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d))
      .orderBy("doc_id"),
    Some(TextAnalysis.fingerprintOracle))

  /** Multimodal plumbing — opaque binary payload + typed metadata. The
    * decode step itself is stubbed (no image/audio libs in-container);
    * the schema/partitioning/batch plumbing is real (graft.operators.
    * Multimodal) and the metadata extraction is oracle-checked here.
    */
  private val q45 = Q("q45_binary_metadata",
    (s, d) => Tables.documents(s, d)
      .select(
        col("doc_id"),
        octet_length(col("text").cast(BinaryType)).as("n_bytes"),
        md5(col("text").cast(BinaryType)).as("digest"),
        col("source"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, OCTET_LENGTH(CAST(text AS BLOB)) AS n_bytes,
              MD5(text) AS digest, source
            FROM documents ORDER BY doc_id"""))

  /** Brute-force cosine top-k (the ANN correctness baseline). */
  private val q46 = Q("q46_knn_brute_force",
    (s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d), nQueries = 5, k = 3)
      .orderBy("query_id", "rnk"),
    Some(Similarity.bruteForceTopKOracle(nQueries = 5, k = 3)),
    headline = true)

  val all: Vector[Q] = Vector(q40, q41, q42, q43, q44, q45, q46)
}
