package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the operators composed the way a
  * training-data pipeline actually runs them:
  *
  *   1. exact dedup (keep the min-id copy of byte-identical text);
  *   2. near-dup clustering (SimHash + connected components) and keep
  *      only each cluster's representative (= its min doc_id, which is
  *      the cluster label by construction);
  *   3. quality filter (token-count bounds + stopword ratio);
  *   4. deterministic Bernoulli hash sample down to `fraction`.
  *
  * Every stage is deterministic and shuffle-bounded, so the curated set
  * is reproducible run-over-run and cluster-size-independent — and the
  * whole chain is replayable in SQL for the oracle gate.
  */
object Curate {

  def corpus(docs: DataFrame, content: Column, id: Column,
             maxHamming: Int = 3, fraction: Double = 0.5): DataFrame = {
    // survivors feed BOTH the cluster computation and the final
    // projection — persist for the call, clean up before returning
    // (the pair-operator lifecycle discipline)
    val survivors = Dedup.dropExactDuplicates(docs, content, id)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.selfCleaning(survivors) {
      // pointerDoubling: the SimHash near-dup graph measures diameter
      // ~14 at sf0.1 (chained near-dups) — the shortcut join drops the
      // propagation from 8 to 6 materialized rounds (see q67 in
      // PLANS.md round-4)
      val reps = Dedup.simHashClusters(survivors, content, id, maxHamming,
        pointerDoubling = true)
        .filter(col("doc_id") === col("cluster"))
        .select("doc_id")
      // quality keep is a pure per-row predicate — filter inline, no
      // self-join back onto the kept frame
      TextAnalysis.bernoulliHashSample(
        survivors.join(reps, Seq("doc_id"), "left_semi")
          .filter(TextAnalysis.keepCol(content))
          .select("doc_id", "lang", "n_chars"),
        id, fraction)
    }
  }

  /** Leakage-safe train/test split — the decontamination step an eval
    * pipeline needs: assign documents to test/train by the
    * deterministic hash gate, then EVICT every train document that
    * near-duplicates a test document (MinHash-LSH lookup against the
    * test-side index, exact-Jaccard verified — q106's machinery with
    * the test set as the standing corpus). Returns every document with
    * its final assignment: `test`, `train`, or `dropped`.
    *
    * Scale shape: the split is a shuffle-free filter; the leak probe is
    * the incremental near-dup lookup (test-side index, band equi-join,
    * train side never self-joins); the eviction is a left join on
    * doc_id. The train corpus never pairs with itself — only
    * train→test leakage is pruned, which is the decontamination
    * contract (train-internal duplicates are a different operator).
    */
  def leakageSafeSplit(docs: DataFrame, content: Column, id: Column,
                       testFraction: Double = 0.2, n: Int = 3, k: Int = 8,
                       bands: Int = 4, threshold: Double = 0.8): DataFrame = {
    require(testFraction >= 0 && testFraction <= 1, "testFraction in [0,1]")
    val thr = TextAnalysis.sampleThreshold(testFraction)
    val h = TextAnalysis.hash60(id)
    val leaks = Dedup.incrementalNearDups(
        docs.filter(h < thr), docs.filter(h >= thr),
        content, id, n, k, bands, threshold)
      .select(col("new_id").as("leak_id")).distinct()
    docs.select(id.as("doc_id"), h.as("h60"))
      .join(leaks, col("doc_id") === col("leak_id"), "left")
      .select(col("doc_id"),
        when(col("h60") < thr, "test")
          .when(col("leak_id").isNotNull, "dropped")
          .otherwise("train").as("split"))
      .orderBy("doc_id")
  }

  /** Oracle for [[leakageSafeSplit]]: the q106 incremental-near-dup SQL
    * spliced in as the leak probe, with the hash-gate predicates
    * inlined over md5(doc_id).
    */
  def leakageSafeSplitOracle(testFraction: Double = 0.2, n: Int = 3,
                             k: Int = 8, bands: Int = 4,
                             threshold: Double = 0.8): String = {
    val thr = TextAnalysis.sampleThreshold(testFraction)
    val h60 = TextAnalysis.hash60Sql("MD5(CAST(doc_id AS VARCHAR))")
    val testWhere = s"($h60) < $thr"
    val leakSql = Dedup.incrementalNearDupsOracle(n, k, bands, threshold,
      corpusWhere = testWhere, batchWhere = s"NOT (($h60) < $thr)")
    s"""SELECT doc_id,
       |  CASE WHEN ($h60) < $thr THEN 'test'
       |       WHEN doc_id IN (SELECT new_id FROM ($leakSql)) THEN 'dropped'
       |       ELSE 'train' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Group-coherent k-fold assignment — cross-validation folds where
    * every row of a group (author, site, session…) lands in the SAME
    * fold, so no group straddles train/validation (the group-leakage
    * cousin of [[leakageSafeSplit]]): fold = hash60(group) mod k,
    * deterministic and engine-portable by the md5 convention, folds
    * ~uniform by md5 uniformity (group-count imbalance is bounded by
    * the largest group, which no assignment scheme can split).
    *
    * Scale shape: the fold is a pure scalar expression on the row —
    * no shuffle, no group materialization, composes with any
    * downstream partitioning.
    *
    * @return (doc_id, grp, fold) with fold in [0, k)
    */
  def groupKFold(docs: DataFrame, group: Column, id: Column,
                 k: Int): DataFrame = {
    require(k >= 2, s"k ($k) must be >= 2")
    docs.select(id.as("doc_id"), group.as("grp"),
      pmod(TextAnalysis.hash60(group), lit(k.toLong)).as("fold"))
  }

  /** Oracle for [[groupKFold]]: `groupSql` is the group expression
    * over `documents`.
    */
  def groupKFoldOracle(groupSql: String, k: Int): String =
    s"""WITH h AS (
       |  SELECT doc_id, $groupSql AS grp,
       |    MD5(CAST($groupSql AS VARCHAR)) AS hx
       |  FROM documents)
       |SELECT doc_id, grp,
       |  CAST((${TextAnalysis.hash60Sql("hx")}) % $k AS BIGINT) AS fold
       |FROM h ORDER BY doc_id""".stripMargin

  /** SQL replay of [[corpus]] for the oracle gate: the exact-dedup CTE
    * feeds the spliced SimHash/closure CTEs, reps/quality/sample filters
    * mirror the Spark stages one-to-one.
    */
  def corpusOracle(maxHamming: Int = 3, fraction: Double = 0.5): String = {
    val clusterSql = Dedup.simHashClustersOracle(maxHamming, source = "surv")
    // keep only the CTE definitions (everything before the final SELECT)
    val clusterCtes = clusterSql
      .substring("WITH RECURSIVE ".length,
        clusterSql.lastIndexOf("SELECT src AS doc_id"))
      .trim.stripSuffix(",")
    s"""WITH RECURSIVE surv AS (
       |  SELECT doc_id, text, lang, n_chars FROM (
       |    SELECT doc_id, text, lang, n_chars,
       |      ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn
       |    FROM documents)
       |  WHERE rn = 1),
       |$clusterCtes,
       |reps AS (
       |  SELECT s.doc_id, s.text, s.lang, s.n_chars
       |  FROM surv s JOIN (
       |    SELECT src AS doc_id FROM (
       |      SELECT src, MIN(dst) AS cluster FROM reach GROUP BY src)
       |    WHERE src = cluster) r ON s.doc_id = r.doc_id),
       |q AS (
       |  SELECT doc_id, lang, n_chars FROM (
       |    SELECT doc_id, lang, n_chars,
       |      STRING_SPLIT_REGEX(text, '\\s+') AS toks
       |    FROM reps)
       |  WHERE ${TextAnalysis.keepSql("toks")})
       |SELECT doc_id, lang, n_chars FROM (
       |  SELECT doc_id, lang, n_chars, MD5(CAST(doc_id AS VARCHAR)) AS hx
       |  FROM q)
       |WHERE ${TextAnalysis.hash60Sql("hx")} < ${TextAnalysis.sampleThreshold(fraction)}
       |ORDER BY doc_id""".stripMargin
  }
}
