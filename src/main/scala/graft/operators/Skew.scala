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
}
