package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.{AhoCorasick, BlocklistHits}

/** Multi-pattern blocklist matching — the bad-words / URL-blocklist
  * screen every curation pipeline runs before quality scoring. The
  * existing PII scrub ([[TextAnalysis.piiScrub]]) is three regexes;
  * that shape is O(patterns · doc_len) and stops scaling around tens
  * of patterns, where production blocklists carry 10³–10⁴ terms. This
  * operator compiles the whole categorized term list into ONE
  * Aho–Corasick automaton ([[graft.expressions.AhoCorasick]]), ships
  * it as a broadcast, and scans each document once inside whole-stage
  * codegen ([[graft.expressions.BlocklistHits]]) — O(doc_len +
  * matches) per document regardless of list size.
  *
  * Scale shape (100 TB): zero shuffles before the final (tiny,
  * map-side-combinable) per-doc explode — the automaton rides the
  * broadcast, the scan is a narrow projection over the corpus, and
  * the output is |docs| × |categories| rows. Nothing joins, nothing
  * sorts, nothing is data-sized but the one corpus pass itself.
  *
  * Matching semantics (oracle-pinned): case-insensitive via ONE
  * per-char folding rule applied to both terms and text inside the
  * automaton ([[graft.expressions.AhoCorasick]] — `Character
  * .toLowerCase`, locale-independent, ≡ SQL `LOWER` on ASCII, which is
  * what the DuckDB oracles mirror), SUBSTRING occurrences — no
  * word-boundary rule, overlaps and nested terms all count, a term
  * listed under two categories counts for both. Dense output: one row
  * per (doc, category) including zero-hit rows, so downstream
  * thresholds (`hits == 0` → clean) need no anti-join.
  */
object Blocklist {

  /** Per-document per-category term-occurrence counts:
    * (doc_id, category, hits), dense over the sorted distinct
    * category list.
    */
  def hits(docs: DataFrame, content: Column, id: Column,
           terms: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge._
    // folding lives INSIDE the automaton (one per-char rule for build
    // and scan — round 11); no lower() wrap, no pre-folded terms
    val ac = AhoCorasick.build(terms)
    val bc = docs.sparkSession.sparkContext.broadcast(ac)
    val cats = ac.categories.toSeq
    // The generate runs over a CONSTANT-length index sequence, with the
    // counts array `h` carried through as a pass-through column — NOT
    // posexplode(h): the optimizer infers a `size(h) > 0` pruning
    // filter from a generator's own input and pushes it below the
    // projection, which re-evaluates the automaton scan a second time
    // per document (observed in the q183 plan audit). With the
    // foldable sequence the inferred filter constant-folds away and
    // blocklist_hits runs exactly once per doc.
    docs
      .select(id.as("doc_id"),
        column(BlocklistHits(expression(content), bc)).as("h"))
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(cats.size - 1))).as("i"))
      .select(col("doc_id"),
        element_at(typedlit(cats), col("i") + 1).as("category"),
        element_at(col("h"), col("i") + 1).as("hits"))
  }

  /** Documents whose total hits across all categories stay under
    * `maxHits` — the pass-through filter form (the decision most
    * pipelines consume; `maxHits = 1` is the usual drop-on-any-hit
    * rule). Same single scan; the per-doc total is an
    * `aggregate` over the counts array, no explode and no shuffle at
    * all — the filter is a narrow predicate on the corpus pass.
    */
  def clean(docs: DataFrame, content: Column,
            terms: Seq[(String, String)], maxHits: Long = 1L): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge._
    require(maxHits >= 1L, s"maxHits ($maxHits) must be >= 1")
    val ac = AhoCorasick.build(terms)
    val bc = docs.sparkSession.sparkContext.broadcast(ac)
    docs.filter(
      aggregate(column(BlocklistHits(expression(content), bc)),
        lit(0L), (acc, x) => acc + x) < maxHits)
  }

  /** Redaction — mask every character covered by ANY term occurrence
    * (union of match intervals: overlapping and nested matches merge
    * into one masked run, so the output is independent of term
    * enumeration order — unlike chained per-term REPLACE, where an
    * earlier replacement can destroy or create later matches). Same
    * single broadcast-automaton scan as [[hits]]; the interval
    * accumulation is a difference array, O(doc_len + matches) per doc
    * ([[graft.expressions.AhoCorasick.redact]]).
    *
    * Matching is case-insensitive; masked characters are replaced by
    * `*`, everything else keeps its original case. `n_masked` is the
    * exact covered-position count (0 = clean doc, text unchanged).
    *
    * @return (doc_id, redacted, n_masked)
    */
  def redact(docs: DataFrame, content: Column, id: Column,
             terms: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge._
    val ac = AhoCorasick.build(terms)
    val bc = docs.sparkSession.sparkContext.broadcast(ac)
    docs
      .select(id.as("doc_id"),
        column(graft.expressions.BlocklistRedact(expression(content), bc,
          '*')).as("r"))
      .select(col("doc_id"), col("r.redacted").as("redacted"),
        col("r.n_masked").as("n_masked"))
  }

  /** Oracle for [[redact]]: per term, the lowercase match start
    * positions; expand each to its covered positions; union DISTINCT
    * per doc; rebuild the string masking exactly that set. `n_masked`
    * = the set's size. LEFT JOIN keeps clean docs verbatim.
    */
  def redactOracle(terms: Seq[(String, String)],
                   source: String = "documents"): String = {
    val vals = terms
      .map { case (t, c) => s"(${q(t.toLowerCase)}, ${q(c)})" }
      .mkString(",\n    ")
    s"""WITH terms(term, category) AS (VALUES
       |    $vals),
       |d AS (SELECT doc_id, text AS orig, LOWER(text) AS txt
       |      FROM $source),
       |st AS (
       |  SELECT d.doc_id, u.p, LEN(t.term) AS tl
       |  FROM d CROSS JOIN terms t,
       |    UNNEST(LIST_FILTER(
       |      GENERATE_SERIES(1, LEN(d.txt) - LEN(t.term) + 1),
       |      p -> SUBSTR(d.txt, p, LEN(t.term)) = t.term)) AS u(p)),
       |cp AS (
       |  SELECT doc_id, UNNEST(GENERATE_SERIES(p, p + tl - 1)) AS c
       |  FROM st),
       |mask AS (
       |  SELECT doc_id, LIST(DISTINCT c) AS cs FROM cp GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CASE WHEN m.cs IS NULL THEN d.orig ELSE
       |    ARRAY_TO_STRING(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(d.orig)),
       |      p -> CASE WHEN LIST_CONTAINS(m.cs, p) THEN '*'
       |                ELSE SUBSTR(d.orig, p, 1) END), '')
       |  END AS redacted,
       |  CAST(COALESCE(LEN(m.cs), 0) AS INT) AS n_masked
       |FROM d LEFT JOIN mask m USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** SQL literal escape for term strings (single quotes doubled). */
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Oracle for [[hits]]: per (term, category) row, count the
    * starting positions where the lowercased term matches — the
    * overlap-inclusive substring count AC computes — then sum per
    * category. `GENERATE_SERIES(1, n)` is empty for n ≤ 0, so docs
    * shorter than a term contribute 0.
    */
  def hitsOracle(terms: Seq[(String, String)],
                 source: String = "documents"): String = {
    val vals = terms
      .map { case (t, c) => s"(${q(t.toLowerCase)}, ${q(c)})" }
      .mkString(",\n    ")
    s"""WITH terms(term, category) AS (VALUES
       |    $vals),
       |d AS (SELECT doc_id, LOWER(text) AS txt FROM $source),
       |m AS (
       |  SELECT d.doc_id, t.category,
       |    LEN(LIST_FILTER(
       |      GENERATE_SERIES(1, LEN(txt) - LEN(term) + 1),
       |      p -> SUBSTR(txt, p, LEN(term)) = term)) AS hits
       |  FROM d CROSS JOIN terms t)
       |SELECT doc_id, category, CAST(SUM(hits) AS BIGINT) AS hits
       |FROM m GROUP BY doc_id, category
       |ORDER BY doc_id, category""".stripMargin
  }

  /** Oracle for [[clean]] (passes the whole doc row through). */
  def cleanOracle(terms: Seq[(String, String)], maxHits: Long = 1L,
                  source: String = "documents"): String = {
    val vals = terms
      .map { case (t, c) => s"(${q(t.toLowerCase)}, ${q(c)})" }
      .mkString(",\n    ")
    s"""WITH terms(term, category) AS (VALUES
       |    $vals),
       |tot AS (
       |  SELECT d.doc_id,
       |    SUM(LEN(LIST_FILTER(
       |      GENERATE_SERIES(1, LEN(LOWER(d.text)) - LEN(term) + 1),
       |      p -> SUBSTR(LOWER(d.text), p, LEN(term)) = term))) AS hits
       |  FROM $source d CROSS JOIN terms GROUP BY d.doc_id)
       |SELECT s.* FROM $source s JOIN tot USING (doc_id)
       |WHERE tot.hits < $maxHits ORDER BY s.doc_id""".stripMargin
  }

  /** The q183 fixture list: three categories over the synthetic
    * corpus vocabulary, chosen to pin every matching rule — multi-word
    * phrase terms ("hash join", "row scan"), a term that is a strict
    * substring of corpus words ("val" hits inside "value"), nested
    * terms across categories ("scan" alone and inside "row scan"),
    * and a term that never occurs ("zzzq") to pin dense zero rows.
    */
  val DefaultTerms: Seq[(String, String)] = Seq(
    "slow" -> "speed",
    "fast" -> "speed",
    "spark" -> "engine",
    "scan" -> "engine",
    "hash join" -> "phrase",
    "row scan" -> "phrase",
    "val" -> "substr",
    "zzzq" -> "substr")
}
