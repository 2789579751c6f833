package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-preceding) join — an operator Spark lacks
  * natively (SURVEY §7 custom-operator preference order (a): composed
  * from built-ins, no custom plan node needed).
  *
  * For every left row, attach the latest right row with
  * `right.time <= left.time` within the same partition keys.
  *
  * Formulation: UNION the two sides (right first on ties), then one
  * running `last(_, ignoreNulls)` window per carried column. This is
  * the scale-optimal shape — a SINGLE shuffle on the partition keys and
  * a sort, versus a join formulation that shuffles both sides AND
  * explodes on range predicates. At 100 TB the window sort is exactly
  * the time-series order the data usually already has (sorted parquet →
  * near-no-op sort).
  */
object AsOfJoin {

  /** @param left       probe side (all columns kept)
    * @param right      reference side
    * @param partitionKeys equality keys present on both sides
    * @param timeCol    ordering column name present on both sides
    * @param carryCols  right-side columns to attach (prefixed)
    * @param prefix     prefix for carried columns in the output
    * @param tieBreak   extra deterministic ordering columns (applied
    *                   after (time, side)); pass when (keys, time) is
    *                   not unique per side
    */
  def asOf(left: DataFrame, right: DataFrame, partitionKeys: Seq[String],
           timeCol: String, carryCols: Seq[String],
           prefix: String = "r_", tieBreak: Seq[String] = Nil): DataFrame = {
    val leftOnly = left.columns.filterNot(c =>
      partitionKeys.contains(c) || c == timeCol).toSeq
    val carried = carryCols.map(c => s"$prefix$c")

    val lSide = left.select(
      (partitionKeys :+ timeCol).map(col) ++
        leftOnly.map(col) ++
        carryCols.map(c => lit(null).as(s"$prefix$c")) :+
        lit(1).as("__side"): _*)
    val rSide = right.select(
      (partitionKeys :+ timeCol).map(col) ++
        leftOnly.map(c => lit(null).as(c)) ++
        carryCols.map(c => col(c).as(s"$prefix$c")) :+
        lit(0).as("__side"): _*)

    val ordering: Seq[Column] =
      (col(timeCol) +: col("__side") +: tieBreak.map(col)) ++
        // among right rows tied on (time, tieBreak), order by the
        // carried values so last() picks deterministically
        carried.map(col)
    val w = Window.partitionBy(partitionKeys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withCarried = carried.foldLeft(rSide.unionByName(lSide)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    withCarried
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
