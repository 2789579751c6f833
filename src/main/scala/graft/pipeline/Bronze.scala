package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze layer — hive-partitioned parquet, one table dir per entity,
  * partition spec `season=<int>/round=<%02d>/grand_prix=<slug>/session=<code>`
  * (ref: ingestion/src/ingestion/fastf1_ingest.py:15-22, utils.py:39-44).
  *
  * SURVEY §2 rows S3-S6. At cluster scale the partition layout IS the
  * pruning index: dashboard-style predicates on season/session prune
  * entire directory subtrees before a single byte is read.
  */
object Bronze {

  val PartitionCols: Seq[String] = Seq("season", "round", "grand_prix", "session")

  /** S3 — the reference's zero-padded partition value (`round=%02d`,
    * fastf1_ingest.py:19). Partition values are strings on disk; silver
    * owns the typing (SURVEY §7 hard part 2).
    */
  def roundValue(round: Int): String = f"$round%02d"

  /** S4+S3 — write one entity's frame into the hive layout. Partition
    * columns must already be string-typed (round pre-padded via
    * [[roundValue]]). `coalesce(1)` mirrors the reference's one
    * `part-00000.parquet` per leaf — correct for per-session ingestion
    * batches; large backfills should drop the coalesce and let each task
    * write its partition.
    */
  def write(df: DataFrame, root: String, table: String,
            singleFilePerLeaf: Boolean = true): Unit = {
    val out = if (singleFilePerLeaf) df.coalesce(1) else df
    out.write
      .partitionBy(PartitionCols: _*)
      .mode("append")
      .parquet(s"$root/$table")
  }

  /** S5 — idempotent-write guard: skip if the leaf dir already holds a
    * parquet file (utils.py:36-37).
    */
  def leafExists(spark: SparkSession, root: String, table: String,
                 season: Int, round: Int, gpSlug: String, code: String): Boolean = {
    val leaf = new Path(
      s"$root/$table/season=$season/round=${roundValue(round)}/grand_prix=$gpSlug/session=$code")
    val fs = leaf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(leaf) && fs.globStatus(new Path(leaf, "*.parquet")).nonEmpty
  }

  /** S6 — recursive hive-partitioned scan with by-name schema union
    * across files (DuckDB `read_parquet(..., hive_partitioning=1)`
    * semantics). Partition-type inference must be OFF so `round="01"`
    * stays a string and silver's try_cast is the single typing point
    * (SURVEY §7 hard part 2) — set at session construction
    * (graft.Sessions), asserted here so a mis-built session fails fast
    * instead of silently typing `round=01` as an int.
    */
  def read(spark: SparkSession, root: String, table: String): DataFrame = {
    graft.Sessions.assertNoPartitionTypeInference(spark)
    spark.read.option("mergeSchema", "true").parquet(s"$root/$table")
  }
}
