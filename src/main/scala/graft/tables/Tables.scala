package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver testdata (TESTDATA.md): one parquet file per
  * table under `/root/testdata/sf*`/. Reading is always a plain
  * `spark.read.parquet` so Catalyst's vectorized reader, predicate
  * pushdown, and column pruning apply unmodified; at cluster scale the
  * same call fans out over however many row groups / files the table has.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events` with `ts` normalized to the engine's internal int64
    * epoch-nanoseconds convention (SURVEY §1.2) regardless of the
    * file's physical type. Early testdata drops wrote parquet
    * TIMESTAMP(NANOS) — int64 ns under `nanosAsLong` — while the
    * round-7 regeneration writes TIMESTAMP(MICROS), which Spark reads
    * as TIMESTAMP_NTZ. The match keeps both working: one codegen'd
    * projection (`unix_micros · 1000`, exact — µs·1000 cannot overflow
    * int64 before year 2262), never a data pass. The session timezone
    * is pinned UTC (Sessions.local) so the NTZ→instant cast is
    * identity.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(load(s, d, "events"))

  /** The `ts` normalization behind [[events]], usable on any
    * events-shaped frame (spec batch twins read staged copies).
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn("ts", tsToNsLong(col("ts")))
    }

  /** timestamp (tz or ntz) → int64 epoch ns; shared with the streaming
    * reader so batch and stream agree on the `ts` convention.
    */
  def tsToNsLong(ts: Column): Column =
    unix_micros(ts.cast(TimestampType)) * lit(1000L)
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views (used by the SafeSql gateway
    * path). `events` goes through the ts-normalizing accessor so the
    * view exposes the same int64-ns `ts` the rest of the engine sees.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
