package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Tokenizer TRAINING — deterministic BPE vocabulary induction over a
  * corpus, the one major LLM-pipeline stage (tokenizer fitting) the
  * inventory lacked. Reference scope: the reference pipeline has no
  * tokenizer at all (`ai/rag_api/app.py` delegates tokenization to a
  * hosted model); this is a beyond-reference training-data operator in
  * the q111-vocab / q140-fixed-round-iteration family.
  *
  * Algorithm (classic byte-pair encoding on word counts): lowercase the
  * corpus, extract `[a-z]+` words, aggregate to a (word, cnt) frame;
  * then for each of `merges` rounds, count adjacent symbol pairs
  * weighted by word count, pick the most frequent pair (ties broken by
  * (left, right) ascending — total order, so the result is
  * deterministic on any partitioning), and merge that pair greedily
  * left-to-right in every word. Exactly how production BPE trainers
  * work — and exactly why this scales: after the FIRST aggregation the
  * corpus is never touched again.
  *
  * Scale shape (100 TB):
  *   - ONE data-sized operation: the word-count aggregation — a single
  *     map-side-combined shuffle on the word. Everything downstream
  *     operates on the DISTINCT-WORD count frame, which is bounded by
  *     the language's vocabulary (natural-language corpora plateau at
  *     ~10⁶–10⁷ distinct `[a-z]+` words whatever the row count — the
  *     same domain-vs-data distinction as the Profiling count-frame
  *     operators), localCheckpoint-ed once and guarded by a loud
  *     `maxWords` gate (the [[Profiling.DefaultMaxDomain]] contract:
  *     adversarial corpora where distinct words ≈ rows must fail with
  *     instructions, not funnel the data through the vocab path).
  *   - Per merge round: one aggregation over the vocab frame (pair
  *     counts, map-side combined) topped by `orderBy.limit(1)` —
  *     TakeOrderedAndProject, never a global sort — and a 1-row driver
  *     collect. The merge itself is a collected-literal `replace`
  *     projection: narrow, codegen'd, zero shuffle. Lineage stays
  *     shallow (k replaces over the checkpointed base), so no
  *     per-round re-checkpoint is needed — one Spark job per round,
  *     the [[GraphOps.pageRank]] iteration discipline on a frame that
  *     is vocabulary-sized instead of |V|-sized.
  *
  * Greedy-merge mechanics: each word is encoded as its symbols joined
  * by DOUBLED U+0001 separators (`||a||b||` for [a,b]). Merging pair
  * (l, r) is then the single literal replace
  * `|l||r|` → `|lr|`: the doubled separators give every symbol a
  * private boundary character on each side, so one left-to-right
  * non-overlapping `replace` — the semantics BOTH engines implement —
  * is exactly the greedy BPE merge, including the adjacent-repeat case
  * ([a,a,a] + merge (a,a) → [aa, a]; spec-pinned). No UDF, no lateral
  * rescan: `replace` is a codegen'd string kernel.
  */
object Tokenizer {

  /** Symbol separator — U+0001, outside the `[a-z]+` word alphabet by
    * construction (words are filtered to lowercase ASCII letters).
    */
  private val Sep = "\u0001"

  /** Merge rounds between lineage truncations of the evolving vocab
    * frame (see the loop comment in [[train]]).
    */
  private val CheckpointEvery = 8

  /** (word, cnt) over `[a-z]+` word occurrences in lower(content) —
    * the one data-sized pass (map-side-combined shuffle on the word).
    */
  def wordCounts(docs: DataFrame, content: Column): DataFrame =
    graft.functions.Fns.spreadIfNarrow(
        docs.select(content.as("__content")), xxhash64(col("__content")))
      .select(explode(
        regexp_extract_all(lower(col("__content")), lit("[a-z]+"), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** One learned merge: `rank`-th most frequent pair (l, r) with its
    * weighted count at selection time.
    */
  final case class BpeMerge(rank: Int, l: String, r: String, c: Long)

  /** Train `merges` BPE rounds; returns (merge table, final encoded
    * vocab frame (seq, cnt)) — the frame feeds [[bpeTokenFrequencies]].
    */
  private def train(docs: DataFrame, content: Column, merges: Int,
                    maxWords: Long,
                    checkpointEvery: Int = CheckpointEvery): (Seq[BpeMerge], DataFrame) = {
    require(merges >= 1, s"merges ($merges) must be >= 1")
    require(maxWords >= 1L, s"maxWords ($maxWords) must be >= 1")
    // ||a||b||c|| encoding: every symbol flanked by doubled separators.
    val encoded = wordCounts(docs, content).select(
      concat(regexp_replace(col("word"), "(.)", Sep + Sep + "$1"),
        lit(Sep + Sep)).as("seq"),
      col("cnt"))
    val base = encoded.localCheckpoint(eager = true)
    val nWords = base.count()
    if (nWords > maxWords)
      throw new IllegalArgumentException(
        s"bpeTrain: the distinct-word frame holds $nWords rows, above " +
          s"maxWords=$maxWords. BPE iterates over the word-count frame; " +
          "a corpus whose distinct words grow with the data (random " +
          "strings, ids, unsegmented scripts) makes every merge round " +
          "data-sized. Pre-filter the content to natural-language text " +
          "(langId / qualityScore) or raise maxWords deliberately.")

    val symsOf = filter(split(col("seq"), Sep + "+"), x => x =!= "")
    var cur = base
    val out = Seq.newBuilder[BpeMerge]
    for (k <- 1 to merges) {
      // sequence(1, 0) would DESCEND in Spark, so guard 1-symbol words.
      val pairs = cur.select(col("cnt"), symsOf.as("syms"))
        .select(col("cnt"), explode(when(size(col("syms")) > 1,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("l"),
                element_at(col("syms"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
      val best = pairs.orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty)
        throw new IllegalArgumentException(
          s"bpeTrain: corpus fully merged after ${k - 1} rounds — no " +
            s"adjacent pair remains, merges=$merges is above the " +
            "corpus's mergeable depth (its longest word's symbol " +
            "count). Lower merges.")
      val (l, r, c) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      out += BpeMerge(k, l, r, c)
      cur = cur.select(
        replace(col("seq"), lit(Sep + l + Sep + Sep + r + Sep),
          lit(Sep + l + r + Sep)).as("seq"),
        col("cnt"))
      // Lineage hygiene: round k's pair-count job re-derives k chained
      // replaces over the checkpointed base, so total replay work is
      // quadratic in merge depth — invisible at 8 merges, real at the
      // 64-merge vocabularies production tokenizers train. Truncating
      // the lineage every CheckpointEvery rounds keeps each round's
      // replay ≤ CheckpointEvery replaces (linear overall) at the cost
      // of one small vocab-frame materialization per window. A/B at
      // merges=32 in PLANS.md (round 10).
      if (checkpointEvery > 0 && k % checkpointEvery == 0 && k < merges)
        cur = cur.localCheckpoint(eager = true)
    }
    (out.result(), cur)
  }

  /** The learned merge table — (rank, l, r, c), `merges` rows. The
    * artifact a downstream encoder ships; the query's result frame is
    * driver-local by construction (`merges` rows, each collected as
    * the round's 1-row argmax).
    */
  def bpeTrain(docs: DataFrame, content: Column, merges: Int,
               maxWords: Long = Profiling.DefaultMaxDomain): DataFrame = {
    val (ms, _) = train(docs, content, merges, maxWords)
    toMergeTable(docs, ms)
  }

  /** A/B instrumentation hook (dev mains + specs only): [[bpeTrain]]
    * with the lineage-truncation cadence exposed; `checkpointEvery =
    * 0` disables truncation entirely (the pre-round-10 behavior —
    * quadratic replay in merge depth). Results are identical for any
    * cadence (spec-pinned); only the job graph changes.
    */
  private[graft] def bpeTrainWithCadence(docs: DataFrame, content: Column,
                                         merges: Int, checkpointEvery: Int,
                                         maxWords: Long = Profiling.DefaultMaxDomain): DataFrame = {
    val (ms, _) = train(docs, content, merges, maxWords, checkpointEvery)
    toMergeTable(docs, ms)
  }

  private def toMergeTable(docs: DataFrame, ms: Seq[BpeMerge]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    ms.toDF("rank", "l", "r", "c")
      .withColumn("rank", col("rank").cast(IntegerType))
  }

  /** Corpus token frequencies AFTER `merges` BPE rounds — the encoder
    * applied back to the training corpus: (tok, freq), Σ freq·|tok| ==
    * total word characters (mass conservation, spec-pinned). One extra
    * vocab-frame aggregation beyond [[bpeTrain]]; the corpus is still
    * read exactly once.
    */
  def bpeTokenFrequencies(docs: DataFrame, content: Column, merges: Int,
                          maxWords: Long = Profiling.DefaultMaxDomain): DataFrame = {
    val (_, cur) = train(docs, content, merges, maxWords)
    val symsOf = filter(split(col("seq"), Sep + "+"), x => x =!= "")
    cur.select(col("cnt"), explode(symsOf).as("tok"))
      .groupBy("tok").agg(sum("cnt").as("freq"))
  }

  /** Tokenizer fertility histogram after `merges` BPE rounds — the
    * standard tokenizer-evaluation metric: how many tokens the trained
    * vocabulary spends per word. (tokens_per_word, n_words distinct,
    * n_occurrences corpus-weighted); mean fertility =
    * Σ tpw·n_occurrences / Σ n_occurrences. Same single corpus pass
    * and vocab-frame iteration as [[bpeTrain]] — the histogram is one
    * extra aggregation over the final encoded vocab frame, output
    * bounded by the longest word's symbol count.
    */
  def bpeFertility(docs: DataFrame, content: Column, merges: Int,
                   maxWords: Long = Profiling.DefaultMaxDomain): DataFrame = {
    val (_, cur) = train(docs, content, merges, maxWords)
    val symsOf = filter(split(col("seq"), Sep + "+"), x => x =!= "")
    cur.select(size(symsOf).as("tokens_per_word"), col("cnt"))
      .groupBy("tokens_per_word")
      .agg(count(lit(1)).as("n_words"), sum("cnt").as("n_occurrences"))
  }

  /** Tokenizer APPLICATION — the deployment half of [[bpeTrain]]:
    * train `merges` rounds on the corpus, then price every document
    * under the trained vocabulary: (doc_id, n_words, n_tokens). This
    * is the "how many tokens will this corpus cost" query every
    * training-data budget starts from (the per-doc companion to
    * [[bpeFertility]]'s corpus-level histogram; n_tokens/n_words is
    * the doc's own fertility).
    *
    * Scale shape: training contributes its one corpus pass; the
    * pricing side adds ONE more corpus pass (the per-doc word stream)
    * plus a DISTINCT-WORD encode frame — the learned merges replay as
    * `merges` chained literal `replace` projections over the
    * vocab-bounded frame (lineage truncated every [[CheckpointEvery]]
    * rounds, the r10 cadence), never over the corpus. The word→token
    * count map then joins back to the word stream on the word (AQE
    * broadcasts a small vocab, shuffle-joins a large one) and one
    * map-side-combinable per-doc aggregation finishes. Documents with
    * zero `[a-z]+` words carry no row (no word, no cost — mirrored by
    * the oracle's inner join).
    */
  def bpeTokensPerDoc(docs: DataFrame, content: Column, id: Column,
                      merges: Int,
                      maxWords: Long = Profiling.DefaultMaxDomain): DataFrame = {
    val (ms, _) = train(docs, content, merges, maxWords)
    // spread the narrow local scan before the heavy per-doc tokenize —
    // this frame feeds both the vocab join and the per-doc aggregate
    // (round 14: 0.6-0.8 s 2-task stages at sf1 otherwise)
    val words = graft.functions.Fns.spreadIfNarrow(
        docs.select(id.as("doc_id"), content.as("__content")), col("doc_id"))
      .select(col("doc_id"), explode(
        regexp_extract_all(lower(col("__content")), lit("[a-z]+"), lit(0)))
        .as("word"))
    val enc0 = words.select(col("word")).distinct()
      .select(col("word"),
        concat(regexp_replace(col("word"), "(.)", Sep + Sep + "$1"),
          lit(Sep + Sep)).as("seq"))
    val encFinal = ms.foldLeft(enc0) { (df, m) =>
      val step = df.select(col("word"),
        replace(col("seq"), lit(Sep + m.l + Sep + Sep + m.r + Sep),
          lit(Sep + m.l + m.r + Sep)).as("seq"))
      if (m.rank % CheckpointEvery == 0 && m.rank < ms.size)
        step.localCheckpoint(eager = true)
      else step
    }
    val nTok = encFinal.select(col("word"),
      size(filter(split(col("seq"), Sep + "+"), x => x =!= "")).as("n_tok"))
    words.join(nTok, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_tok").cast("long").as("n_tokens"))
  }

  // ---------------------------------------------------------- oracles

  private def oracleBase(docsTable: String, textCol: String): String =
    s"""words AS MATERIALIZED (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT UNNEST(regexp_extract_all(lower($textCol), '[a-z]+')) AS w
       |    FROM $docsTable) GROUP BY 1),
       |w0 AS MATERIALIZED (
       |  SELECT regexp_replace(word, '(.)', chr(1)||chr(1)||'\\1', 'g') ||
       |         chr(1)||chr(1) AS seq,
       |         cnt
       |  FROM words)""".stripMargin

  /** One merge round as CTEs: split back to symbols, count adjacent
    * pairs (range(1, len) is empty for 1-symbol words — no descending
    * trap on the DuckDB side), argmax with the (c DESC, l, r) total
    * order, replay the doubled-separator replace.
    *
    * MATERIALIZED is load-bearing, not a hint: each w_k is referenced
    * TWICE (round k+1 counts pairs from it AND rewrites it), so
    * DuckDB's default CTE inlining doubles the plan per round — 2^32
    * base-table scans at merges = 32 (the first attempt died on file
    * handles before it died on time). Materialization makes the
    * chain linear in depth, which is what lets q195 grade the
    * realistic-depth tokenizer at all.
    */
  private def roundCtes(k: Int): String =
    s"""s$k AS MATERIALIZED (
       |  SELECT cnt, list_filter(str_split_regex(seq, chr(1)||'+'),
       |                          x -> x <> '') AS syms
       |  FROM w${k - 1}),
       |p$k AS (
       |  SELECT p.l AS l, p.r AS r, CAST(SUM(cnt) AS BIGINT) AS c FROM (
       |    SELECT cnt, UNNEST(list_transform(range(1, len(syms)),
       |      i -> {'l': syms[i], 'r': syms[i + 1]})) AS p
       |    FROM s$k) GROUP BY 1, 2),
       |b$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
       |w$k AS MATERIALIZED (
       |  SELECT replace(seq, chr(1)||b.l||chr(1)||chr(1)||b.r||chr(1),
       |                 chr(1)||b.l||b.r||chr(1)) AS seq, cnt
       |  FROM w${k - 1} CROSS JOIN b$k b)""".stripMargin

  /** Oracle for [[bpeTrain]]: replays the identical merge rounds as
    * chained CTEs (the [[GraphOps.pageRankOracle]] discipline).
    */
  def bpeTrainOracle(merges: Int, docsTable: String = "documents",
                     textCol: String = "text"): String = {
    val ctes = (1 to merges).map(roundCtes).mkString(",\n")
    val rows = (1 to merges)
      .map(k => s"SELECT CAST($k AS INT) AS rank, l, r, c FROM b$k")
      .mkString(" UNION ALL ")
    s"""WITH ${oracleBase(docsTable, textCol)},
       |$ctes
       |SELECT rank, l, r, c FROM ($rows) ORDER BY rank""".stripMargin
  }

  /** Oracle for [[bpeFertility]]. */
  def bpeFertilityOracle(merges: Int, docsTable: String = "documents",
                         textCol: String = "text"): String = {
    val ctes = (1 to merges).map(roundCtes).mkString(",\n")
    s"""WITH ${oracleBase(docsTable, textCol)},
       |$ctes
       |SELECT CAST(LEN(list_filter(str_split_regex(seq, chr(1)||'+'),
       |              x -> x <> '')) AS INT) AS tokens_per_word,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(cnt) AS BIGINT) AS n_occurrences
       |FROM w$merges GROUP BY 1 ORDER BY tokens_per_word""".stripMargin
  }

  /** Oracle for [[bpeTokensPerDoc]]: the training CTEs (identical
    * rounds) provide the merge tables b1..bk; the pricing side encodes
    * the distinct target words and replays each learned merge as one
    * CROSS JOIN replace step (the [[roundCtes]] w-step applied to the
    * target word frame), then joins token counts back to the per-doc
    * word stream.
    */
  def bpeTokensPerDocOracle(merges: Int, docsTable: String = "documents",
                            textCol: String = "text",
                            idCol: String = "doc_id"): String = {
    val ctes = (1 to merges).map(roundCtes).mkString(",\n")
    val encSteps = (1 to merges).map { k =>
      s"""e$k AS (
         |  SELECT word, replace(seq, chr(1)||b.l||chr(1)||chr(1)||b.r||chr(1),
         |                 chr(1)||b.l||b.r||chr(1)) AS seq
         |  FROM e${k - 1} CROSS JOIN b$k b)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${oracleBase(docsTable, textCol)},
       |$ctes,
       |tw AS (
       |  SELECT $idCol AS doc_id,
       |    UNNEST(regexp_extract_all(lower($textCol), '[a-z]+')) AS word
       |  FROM $docsTable),
       |e0 AS (
       |  SELECT word, regexp_replace(word, '(.)', chr(1)||chr(1)||'\\1', 'g')
       |           || chr(1)||chr(1) AS seq
       |  FROM (SELECT DISTINCT word FROM tw)),
       |$encSteps,
       |enc AS (
       |  SELECT word, LEN(list_filter(str_split_regex(seq, chr(1)||'+'),
       |                               x -> x <> '')) AS n_tok
       |  FROM e$merges)
       |SELECT tw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |FROM tw JOIN enc USING (word)
       |GROUP BY tw.doc_id ORDER BY tw.doc_id""".stripMargin
  }

  /** Oracle for [[bpeTokenFrequencies]]. */
  def bpeTokenFrequenciesOracle(merges: Int, docsTable: String = "documents",
                                textCol: String = "text"): String = {
    val ctes = (1 to merges).map(roundCtes).mkString(",\n")
    s"""WITH ${oracleBase(docsTable, textCol)},
       |$ctes,
       |fin AS (
       |  SELECT cnt, UNNEST(list_filter(str_split_regex(seq, chr(1)||'+'),
       |                                 x -> x <> '')) AS tok
       |  FROM w$merges)
       |SELECT tok, CAST(SUM(cnt) AS BIGINT) AS freq
       |FROM fin GROUP BY 1 ORDER BY tok""".stripMargin
  }
}
