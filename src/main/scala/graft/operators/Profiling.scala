package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Table profiling: per-column row/null/distinct counts, unpivoted to
  * a row per column.
  *
  * `exact = false` (THE DEFAULT) estimates distincts with HLL sketches:
  * the whole profile is ONE aggregate pass — counts, null counts and
  * one mergeable sketch per column — with no shuffle amplification. At
  * 100 TB this is the only sane default: the exact multi-distinct form
  * plans an Expand that duplicates the scan stream once per profiled
  * column ((k+1)× rows through the shuffle for k columns).
  *
  * `exact = true` is the opt-in for when exact distincts are worth the
  * Expand (small tables, audit passes) — the q126-gated shape.
  *
  * In sketch mode the output carries the q62-style hash-checkable
  * contract: the EXACT count (one gate-only multi-distinct aggregate)
  * plus a boolean asserting the sketch landed within the 5% bound.
  * The oracle emits the exact count and literal TRUE, so a wildly-off
  * estimate fails the gate while bit-level sketch differences do not.
  * At 100 TB the exact branch is dropped and the profile ships the
  * sketch alone — it exists here to make approximation a CHECKED
  * claim, not a vibe.
  */
object Profiling {

  /** `exactCheck` (sketch mode only): attach the exact distincts and
    * the within-bound flag — the gate contract. `false` is the 100 TB
    * production shape: the sketch pass alone, `n_distinct` carries the
    * estimate, no Expand anywhere in the plan (spec-asserted).
    */
  def tableProfile(df: DataFrame, cols: Seq[String],
                   exact: Boolean = false,
                   exactCheck: Boolean = true): DataFrame =
    if (exact) exactProfile(df, cols)
    else sketchProfile(df, cols, exactCheck)

  /** Exact equal-frequency binning (round 5) — the feature-engineering
    * twin of the q127 percentile machinery: split an integer measure
    * into `bins` quantile buckets and profile each.
    *
    * Boundary j (j = 1..bins−1) is the k_j-th smallest value with
    * k_j = ⌈j·n/bins⌉ in pure integer arithmetic; a row's bin is
    * 1 + |{j : boundary_j < x}| — strictly-less, so EQUAL VALUES ALWAYS
    * SHARE A BIN (value-deterministic, partition-independent; bins can
    * be unevenly sized exactly when ties straddle a boundary, which is
    * the price of determinism).
    *
    * Scale shape: boundaries come from the aggregate-then-rank-distinct
    * form (window input bounded by the VALUE DOMAIN, never a
    * low-cardinality full-data window), land in ONE single-row frame,
    * and broadcast back — the per-row bin assignment is a statically
    * unrolled comparison chain, map-side, no driver collect anywhere.
    */
  def equiFreqBins(df: DataFrame, value: Column, bins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2, s"bins ($bins) must be >= 2")
    val counts = df.select(value.as("x")).groupBy("x")
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = counts
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    def boundary(j: Int) =
      max(when(col("cum") - col("cnt") < expr(s"(n * $j + ${bins - 1}) div $bins")
            && col("cum") >= expr(s"(n * $j + ${bins - 1}) div $bins"), col("x")))
        .as(s"b_$j")
    val bounds = ranked.agg(boundary(1),
      (2 until bins).map(boundary): _*)
    val bin = (1 until bins)
      .map(j => when(col(s"b_$j") < col("x"), 1).otherwise(0))
      .reduce(_ + _) + 1
    df.select(value.as("x"))
      .crossJoin(broadcast(bounds))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        (sum(col("x")).cast(DoubleType) / count(lit(1))).as("mean_x"))
  }

  /** Oracle for [[equiFreqBins]] over an integer-SQL value expression. */
  def equiFreqBinsOracle(valueSql: String, table: String, bins: Int): String = {
    val ks = (1 until bins)
      .map(j => s"MAX(CASE WHEN cum - cnt < (n * $j + ${bins - 1}) // $bins " +
        s"AND cum >= (n * $j + ${bins - 1}) // $bins THEN x END) AS b_$j")
      .mkString(",\n    ")
    val binExpr = (1 until bins)
      .map(j => s"CASE WHEN b.b_$j < v.x THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH v AS (SELECT $valueSql AS x FROM $table),
       |c AS (SELECT x, COUNT(*) AS cnt FROM v GROUP BY x),
       |r AS (
       |  SELECT x, cnt,
       |    SUM(cnt) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    SUM(cnt) OVER () AS n
       |  FROM c),
       |b AS (SELECT $ks FROM r)
       |SELECT $binExpr + 1 AS bin, COUNT(*) AS n_rows,
       |  MIN(v.x) AS min_x, MAX(v.x) AS max_x,
       |  CAST(SUM(v.x) AS DOUBLE) / COUNT(*) AS mean_x
       |FROM v, b
       |GROUP BY bin ORDER BY bin""".stripMargin
  }

  private def exactProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column_name"), col("n_rows"),
      col(s"null_$c").as("n_null"), col(s"dist_$c").as("n_distinct")))
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  private def sketchProfile(df: DataFrame, cols: Seq[String],
                            exactCheck: Boolean): DataFrame = {
    // one pass: count + per-column null counts + per-column HLL.
    // Sketch partials merge associatively — no Expand, no per-distinct
    // keying of the shuffle (the q62 plan lesson). DataSketches HLL
    // (hll_sketch_agg), not approx_count_distinct: the HLL++
    // ImperativeAggregate's interpreted per-row update measured ~2 s
    // for 4 columns × 600k rows where the DataSketches update is near
    // free (q128 3.16 → 0.94 s at sf0.1; the remainder is mostly the
    // gate-only exact branch). Inputs cast to string — an injective
    // mapping, so the sketch sees exactly one value per distinct
    // column value (the function accepts only int/long/string/binary).
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        hll_sketch_estimate(
          hll_sketch_agg(col(c).cast("string"))).as(s"ad_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    if (!exactCheck) {
      // the 100 TB production shape: sketch pass only, estimate IS the
      // reported distinct count, no Expand in the plan
      val rows = cols.map(c => struct(
        lit(c).as("column_name"), col("n_rows"),
        col(s"null_$c").as("n_null"),
        col(s"ad_$c").cast(LongType).as("n_distinct")))
      return wide.select(explode(array(rows: _*)).as("r")).select("r.*")
    }
    // gate-only exact branch: ONE multi-distinct aggregate (it pays
    // the q126 Expand, but once — k separate two-phase distincts cost
    // k extra scans, measured worse at any scale).
    val exacts = df.agg(
      countDistinct(col(cols.head)).as(s"ex_${cols.head}"),
      cols.tail.map(c => countDistinct(col(c)).as(s"ex_$c")): _*)
    val joined = wide.crossJoin(exacts)
    val rows = cols.map(c => struct(
      lit(c).as("column_name"), col("n_rows"),
      col(s"null_$c").as("n_null"),
      col(s"ex_$c").as("n_distinct"),
      (abs(col(s"ad_$c").cast(LongType) - col(s"ex_$c")).cast(DoubleType) /
        col(s"ex_$c") <= lit(0.05)).as("within_bound")))
    joined.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
