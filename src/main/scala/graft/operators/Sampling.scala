package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling. Reference has no sampling operator;
  * this is training-data-pipeline surface (corpus subsampling by
  * quality weight / domain budget) built to the engine's exactness
  * contract: integer arithmetic only, engine-replayable, no RNG state.
  */
object Sampling {

  /** Systematic PPS (probability-proportional-to-size) sample WITHOUT
    * replacement, fully deterministic and exact. Rows are laid on a
    * weight line in a pseudo-random but engine-replayable order — md5
    * of the id, the cross-engine portable hash, ties broken by id —
    * and a row is selected iff its weight interval (cum−w, cum]
    * crosses a sampling boundary ⌈j·W/k⌉, i.e.
    *
    *   ⌊(cum − w)·k / W⌋ < ⌊cum·k / W⌋
    *
    * All arithmetic is BIGINT (caller contract: W·k fits int64, every
    * w ≥ 1); no float and no RNG, so the sample is bit-identical on
    * any engine and any partitioning — reproducible corpus builds.
    *
    * Semantics: inclusion probability is w·k/W for rows with
    * w ≤ W/k — the classic systematic PPS design. A heavy row
    * (w > W/k) absorbs every boundary in its interval but is emitted
    * once, so the output holds exactly k rows unless such rows exist
    * (then fewer — without replacement cannot repeat a row).
    *
    * Scale shape: the cumulative position is computed in TWO phases
    * (the q129 salted-rank discipline): per-bucket partial sums over
    * the 256 md5-prefix buckets (map-side combined, 256-row output),
    * bucket offsets by a window over that tiny frame, then a
    * within-bucket cumulative window partitioned by bucket — the
    * global-order window never sees the data, and each bucket's
    * window holds ~n/256 rows running in parallel. Because the bucket
    * is the ORDER'S OWN leading prefix, bucket offset + within-bucket
    * cumsum equals the global cumsum exactly.
    *
    * @param df     input frame
    * @param id     unique row id (uniqueness is the caller's contract;
    *               duplicate ids collapse order ties arbitrarily)
    * @param weight positive BIGINT weight
    * @param k      number of sampling boundaries (target sample size)
    * @return (id, w, cum) — selected rows with their weight-line
    *         position, deterministic
    */
  def systematicSample(df: DataFrame, id: Column, weight: Column,
                       k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val v = df.select(id.as("id"), weight.as("w"),
        md5(id.cast("string")).as("h"))
      .withColumn("b", substring(col("h"), 1, 2))
    val perB = v.groupBy("b").agg(sum("w").as("bw"))
    val wOff = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    val offs = perB
      .withColumn("off", coalesce(sum("bw").over(wOff), lit(0L)))
      .select(col("b"), col("off"))
    val tot = perB.agg(sum("bw").as("tw"))
    val wCum = Window.partitionBy("b").orderBy("h", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.join(offs, "b") // 256-row frame: AQE broadcasts it
      .withColumn("cum", col("off") + sum("w").over(wCum))
      .crossJoin(broadcast(tot))
      .filter(call_function("div", (col("cum") - col("w")) * k, col("tw")) <
        call_function("div", col("cum") * k, col("tw")))
      .select(col("id"), col("w"), col("cum"))
  }

  /** Per-group [[systematicSample]] — the domain-mixture sampler: k
    * sampling boundaries laid over EACH group's own weight line
    * ("sample ~k docs per domain, within a domain by quality weight"
    * — the training-mixture curation shape). Same integer boundary
    * arithmetic, same md5 order, same two-phase cumulative sum with
    * every window additionally partitioned by the group — per-group
    * parallel, nothing global. The per-group totals frame is
    * |G|-sized and joins back with NO broadcast hint (AQE decides —
    * the [[Profiling.robustStats]] contract).
    *
    * @return (g, id, w, cum) — selected rows per group
    */
  def systematicSamplePerGroup(df: DataFrame, grp: Column, id: Column,
                               weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val v = df.select(grp.as("g"), id.as("id"), weight.as("w"),
        md5(id.cast("string")).as("h"))
      .withColumn("b", substring(col("h"), 1, 2))
    val perB = v.groupBy("g", "b").agg(sum("w").as("bw"))
    val wOff = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = perB
      .withColumn("off", coalesce(sum("bw").over(wOff), lit(0L)))
      .select(col("g"), col("b"), col("off"))
    val tot = perB.groupBy("g").agg(sum("bw").as("tw"))
    val wCum = Window.partitionBy("g", "b").orderBy("h", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.join(offs, Seq("g", "b"))
      .withColumn("cum", col("off") + sum("w").over(wCum))
      .join(tot, Seq("g"))
      .filter(call_function("div", (col("cum") - col("w")) * k, col("tw")) <
        call_function("div", col("cum") * k, col("tw")))
      .select(col("g"), col("id"), col("w"), col("cum"))
  }

  /** Oracle for [[systematicSamplePerGroup]]: per-group windows over
    * the same md5 order. `vSql` must yield (g, id, w).
    */
  def systematicSamplePerGroupOracle(vSql: String, k: Int): String =
    s"""WITH v AS (
       |  SELECT g, id, w, MD5(CAST(id AS VARCHAR)) AS h FROM ($vSql)),
       |c AS (
       |  SELECT g, id, w,
       |    CAST(SUM(w) OVER (PARTITION BY g ORDER BY h, id ROWS BETWEEN
       |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM v),
       |t AS (SELECT g, CAST(SUM(w) AS BIGINT) AS tw FROM v GROUP BY g)
       |SELECT c.g, c.id, c.w, c.cum FROM c JOIN t ON c.g = t.g
       |WHERE ((c.cum - c.w) * $k) // t.tw < (c.cum * $k) // t.tw
       |ORDER BY c.g, c.id""".stripMargin

  /** Oracle for [[systematicSample]]: the same md5-ordered weight line
    * as ONE global window (oracle-side only — DuckDB materializes it
    * fine at gate scale) and the identical integer boundary filter.
    * `vSql` must yield (id, w).
    */
  def systematicSampleOracle(vSql: String, k: Int): String =
    s"""WITH v AS (
       |  SELECT id, w, MD5(CAST(id AS VARCHAR)) AS h FROM ($vSql)),
       |c AS (
       |  SELECT id, w,
       |    CAST(SUM(w) OVER (ORDER BY h, id ROWS BETWEEN UNBOUNDED
       |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM v),
       |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM v)
       |SELECT id, w, cum FROM c CROSS JOIN t
       |WHERE ((cum - w) * $k) // tw < (cum * $k) // tw
       |ORDER BY id""".stripMargin
}
