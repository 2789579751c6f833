package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — the second operator family Spark lacks a
  * native physical strategy for (SURVEY §7 preference order (a):
  * composed from built-ins).
  *
  * `countInPrecedingRange(left, right, …)` counts, for every left row,
  * the right rows of the same key whose time falls in
  * `[t_left - range, t_left)`.
  *
  * Naive formulation is a non-equi join → BroadcastNestedLoop (O(n·m)
  * per key — dies at scale). This implementation BUCKETS time into
  * `range`-width bins: each right row lands in exactly one bin, each
  * left row probes its two candidate bins (an equi-join on (key, bin)),
  * and the exact range predicate filters inside the narrow candidate
  * set. Shuffle volume is linear in both inputs at any scale.
  */
object RangeJoin {

  /** @param left     probe side with columns (idCol, keyCol, timeCol)
    * @param right    counted side with columns (keyCol, timeCol)
    * @param keyCol   equality key on both sides
    * @param timeCol  integer time column (e.g. epoch µs) on both sides
    * @param range    window width in time units; counts rows in
    *                 [t_left - range, t_left)
    */
  def countInPrecedingRange(left: DataFrame, right: DataFrame,
                            idCol: String, keyCol: String, timeCol: String,
                            range: Long): DataFrame = {
    val r = right.select(
      col(keyCol), col(timeCol).as("__rt"),
      expr(s"$timeCol div $range").as("__bin"))
    val probes = left.select(
      col(idCol), col(keyCol), col(timeCol),
      explode(array_distinct(array(
        expr(s"($timeCol - $range) div $range"),
        expr(s"$timeCol div $range")))).as("__bin"))
    val inRange = col("__rt") >= col(timeCol) - range && col("__rt") < col(timeCol)
    probes
      .join(r, Seq(keyCol, "__bin"), "left")
      .groupBy(idCol, keyCol, timeCol)
      .agg(count(when(inRange, 1)).as("n_in_range"))
  }
}
