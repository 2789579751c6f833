package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus preparation.
  *
  * Exact dedup is a single hash-shuffle on a 128-bit digest; at 100 TB
  * this is the cheapest possible formulation (map-side combine collapses
  * per-partition duplicates before the shuffle, and the digest — not the
  * document body — is what moves over the network).
  */
object Dedup {

  /** Exact content dedup: group by MD5(content), keep the minimum id.
    * Returns (fp, keep_id, copies).
    */
  def exact(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(md5(content.cast("binary")).as("fp"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("copies"))

  /** The deduplicated view itself: one surviving row per distinct content. */
  def dropExactDuplicates(df: DataFrame, content: Column, id: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(content.cast("binary"))).orderBy(id)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
