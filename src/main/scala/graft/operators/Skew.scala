package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * `saltedAggregate` runs a two-phase aggregation: phase 1 groups by
  * (keys + a deterministic salt) so one hot key's rows spread over
  * `saltBuckets` reducers; phase 2 merges the partials per real key.
  * For algebraic aggregates (sum/count/min/max) the result is identical
  * to a direct groupBy — AQE's skew handling covers joins, but a single
  * mega-hot GROUP BY key still needs salting at 100 TB.
  *
  * The salt is a hash of a caller-chosen disambiguator column (NOT
  * random — deterministic results under retries, and the same rows land
  * in the same bucket on every run).
  */
object Skew {

  /** Materialize `df` as a sorted-bucketed catalog table and return it.
    * Both sides of a repeated equi-join bucketed (same bucket count) and
    * sorted on their join keys join WITHOUT a shuffle or sort — the
    * bucket files ARE the co-located partitions, so at 100 TB a fact
    * table joined every hour against another bucketed fact pays its
    * shuffle ONCE at write time instead of per query (the plan-level
    * zero-Exchange proof lives in ScaleSpec).
    *
    * Spark bucketing requires a catalog table (`saveAsTable`) — plain
    * `parquet(path)` writes cannot carry the bucket spec.
    */
  def bucketed(df: DataFrame, fqTable: String, nBuckets: Int,
               keys: String*): DataFrame = {
    val spark = df.sparkSession
    // repartition on the bucket keys first so every task holds exactly
    // one bucket → ONE file per bucket. That is what lets the sorted
    // bucket files be consumed as-is downstream: with multiple files
    // per bucket Spark must re-sort each bucket at read time, and the
    // no-Sort half of the co-located join guarantee is lost.
    df.repartition(nBuckets, keys.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(fqTable)
    spark.table(fqTable)
  }

  final case class Partial(name: String, phase1: Column, phase2: Column => Column)

  /** Algebraic partial specs for the common aggregates. */
  def sumOf(c: Column, as: String): Partial = Partial(as, sum(c).as(as), sum)
  def countAll(as: String): Partial = Partial(as, count(lit(1)).as(as), sum)
  def minOf(c: Column, as: String): Partial = Partial(as, min(c).as(as), min)
  def maxOf(c: Column, as: String): Partial = Partial(as, max(c).as(as), max)

  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFrom: Column,
                      saltBuckets: Int, aggs: Seq[Partial]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltFrom), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.phase1, aggs.tail.map(_.phase1): _*)
    val phase2Aggs = aggs.map(a => a.phase2(col(a.name)).as(a.name))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Key-skew diagnostics (round 5): the profile you run BEFORE picking
    * a partition/salt strategy at 100 TB — per-key count distribution
    * reduced to one row: total rows, distinct keys, the hottest key's
    * count and share, the top-10 keys' share, and exact p50/p99 of the
    * per-key counts.
    *
    * Scale shape: ONE full-data shuffle (the per-key count aggregate,
    * map-side combinable); everything after runs on the per-key frame —
    * top-10 via sort+limit (TakeOrderedAndProject, distributed top-k,
    * no global window), the exact count-percentiles via the q127
    * technique (aggregate counts-of-counts, then rank the DISTINCT
    * count values — window input D ≤ min(n_keys, max_cnt): counts are
    * positive integers, so D is bounded by the largest count, and a
    * Zipf-ish distribution gives D ≈ √(2·n_rows) — the global cumsum
    * window runs over that reduced frame, not the keys). All
    * integer/deterministic; the two shares are the only doubles, in
    * one fixed expression shape.
    */
  def keySkewProfile(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perKey = df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
    val totals = perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    val top10 = perKey.orderBy(col("cnt").desc, col("k"))
      .limit(10).agg(sum(col("cnt")).as("top10_rows"))
    // counts-of-counts → cumulative over DISTINCT count values
    val cc = perKey.groupBy("cnt").agg(count(lit(1)).as("freq"))
    val wCum = Window.orderBy("cnt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cc.withColumn("cum", sum("freq").over(wCum))
    def kth(kExpr: String, as: String) =
      max(when(col("cum") - col("freq") < expr(kExpr) &&
               col("cum") >= expr(kExpr), col("cnt"))).as(as)
    val pcts = ranked
      .crossJoin(broadcast(totals.select(col("n_keys").as("nk"))))
      .agg(kth("(nk + 1) div 2", "p50_cnt"),
           kth("(nk * 99 + 99) div 100", "p99_cnt"))
    totals.crossJoin(broadcast(top10)).crossJoin(broadcast(pcts))
      .select(
        col("n_rows"), col("n_keys"), col("max_cnt"),
        (col("max_cnt").cast("double") / col("n_rows")).as("top1_share"),
        (col("top10_rows").cast("double") / col("n_rows")).as("top10_share"),
        col("p50_cnt"), col("p99_cnt"))
  }

  /** Two-phase ROW_NUMBER over LOW-CARDINALITY partitions — the window
    * sibling of [[saltedAggregate]] (round 5, generalizing the q127
    * lesson beyond percentiles).
    *
    * `row_number().over(Window.partitionBy(grp).orderBy(x))` with a
    * 3-value `grp` is one single-task sort per group over the whole
    * table — dead at 100 TB. This computes the identical rank in two
    * phases:
    *
    *  1. RANGE-bucket each row on the integer order key — bucket
    *     boundaries derive deterministically from the per-group
    *     (min, max) domain, `(x − lo)·B div (hi − lo + 1)`, pure int64
    *     arithmetic so the split is exactly monotonic in `x` (no IEEE
    *     boundary wobble) and identical on every run/cluster size.
    *     Local ranks + bucket sizes come from ONE window over
    *     `(grp, bucket)` — the only full-data shuffle, with
    *     `groups × buckets` reducers instead of `groups`.
    *  2. Bucket offsets = cumulative counts over the (tiny)
    *     `groups × buckets` frame, broadcast back; the global rank is
    *     `offset + local rank`. Monotone bucketing makes the
    *     concatenation of bucket-local orders THE global order.
    *
    * Order must be made total by `tieCols` (ids, not floats — the
    * determinism rule every graded query follows). Skewed value
    * domains give uneven buckets — the failure mode is graceful (one
    * hot bucket ≈ one fat task, never wrong ranks), and `buckets`
    * scales the parallelism. `hi == lo` degenerates to one bucket —
    * correct, just unsplit (a constant order key has no parallel
    * rank). Caller contract: `(hi − lo) · buckets` must fit int64 —
    * true for any discretized measure (cents, micros, ns-in-day).
    */
  def saltedRank(df: DataFrame, partCols: Seq[String], orderCol: String,
                 tieCols: Seq[String], buckets: Int = 64,
                 as: String = "rn"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = partCols.map(col)
    val bounds = df.groupBy(part: _*)
      .agg(min(col(orderCol)).as("__lo"), max(col(orderCol)).as("__hi"))
    val bkt = call_function("div",
      (col(orderCol) - col("__lo")) * lit(buckets.toLong),
      col("__hi") - col("__lo") + lit(1L))
    val localW = Window
      .partitionBy((partCols :+ "__bkt").map(col): _*)
      .orderBy((orderCol +: tieCols).map(col): _*)
    val withB = df
      .join(broadcast(bounds), partCols)
      .withColumn("__bkt", bkt)
    // Bucket sizes come from the PRE-window frame: a map-side-combined
    // aggregate whose shuffle carries groups × buckets rows, i.e. a
    // second column-pruned SCAN but no second full-data shuffle. (The
    // first cut derived sizes from the ranked frame via
    // window-count + distinct — column pruning specialized that
    // branch's exchange, ReuseExchange missed, and the executed plan
    // shuffled the full data TWICE.)
    val offsets = withB
      .groupBy((partCols :+ "__bkt").map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(part: _*).orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((partCols :+ "__bkt" :+ "__offset").map(col): _*)
    withB
      .withColumn("__rn_local", row_number().over(localW))
      .join(broadcast(offsets), partCols :+ "__bkt")
      .withColumn(as, col("__offset") + col("__rn_local"))
      .drop("__lo", "__hi", "__bkt", "__rn_local", "__offset")
  }
}
