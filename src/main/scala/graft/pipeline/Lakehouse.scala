package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.quality.Checks

/** The full lakehouse build — the engine's equivalent of `dbt build`
  * (SURVEY §3.1): read bronze, promote the three silver entities,
  * build both gold marts, materialize everything as catalog tables
  * (S7 CTAS semantics into the S8 warehouse), and run the not-null
  * contract as the post-build gate.
  *
  * The dbt DAG becomes plain dataflow: silver models are independent
  * (Catalyst/Spark schedule their jobs separately), gold.tes is built
  * FROM gold.dss (the J3 mart-over-mart edge), and the 17-test
  * contract runs one scan per table instead of 17 probe queries.
  */
object Lakehouse {

  final case class BuildResult(
      silverRows: Map[String, Long],
      dssRows: Long, tesRows: Long,
      contract: Seq[Checks.CheckResult])

  private val SilverEntities = Seq("laps", "weather", "results")

  /** Transactional CTAS: materialize `df` as `fqTable` by writing to
    * `<table>__tmp` and swapping via catalog renames — the engine's
    * equivalent of dbt's `CREATE … __dbt_tmp` + ALTER RENAME swap
    * (transform/target/run/f1_transform/models/silver/laps.sql:6-20).
    * The live table is touched only AFTER the tmp write fully succeeded,
    * so a failure mid-build (bad data, executor loss, contract breach in
    * the producing query) leaves the previous table intact; if the final
    * rename itself fails, the backup is restored. The rename pair is the
    * narrowest non-atomic window a plain-parquet catalog allows — full
    * ACID swap is what a Delta/Iceberg table format would buy on top.
    */
  /** Crash recovery for [[ctasSwap]]'s rename window: a process killed
    * between `target → backup` and `tmp → target` leaves the live name
    * missing with the previous version intact under `__backup`. Restore
    * it before reading or rebuilding — callers that check
    * `tableExists(fqTable)` (e.g. the streaming merge sink) must call
    * this first or they would silently rebuild from scratch.
    */
  def recoverSwap(spark: SparkSession, fqTable: String): Unit =
    if (!spark.catalog.tableExists(fqTable) &&
        spark.catalog.tableExists(s"${fqTable}__backup"))
      spark.sql(s"ALTER TABLE ${fqTable}__backup RENAME TO $fqTable")

  def ctasSwap(spark: SparkSession, df: DataFrame, fqTable: String,
               partitionBy: Seq[String] = Nil): Unit = {
    val tmp = s"${fqTable}__tmp"
    val backup = s"${fqTable}__backup"
    recoverSwap(spark, fqTable)
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE IF EXISTS $backup")
    if (spark.catalog.tableExists(fqTable))
      spark.sql(s"ALTER TABLE $fqTable RENAME TO $backup")
    try spark.sql(s"ALTER TABLE $tmp RENAME TO $fqTable")
    catch {
      case e: Throwable =>
        if (spark.catalog.tableExists(backup))
          spark.sql(s"ALTER TABLE $backup RENAME TO $fqTable")
        throw e
    }
    spark.sql(s"DROP TABLE IF EXISTS $backup")
  }

  /** Full rebuild, mirroring the reference's `+materialized: table`
    * semantics (no incrementality — SURVEY §4 row "Incrementality").
    * Entities missing from bronze are skipped (the reference's
    * ingestion writes whatever sessions exist).
    */
  def build(spark: SparkSession, bronzeRoot: String,
            silverDb: String = "silver", goldDb: String = "gold"): BuildResult = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $silverDb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $goldDb")

    val silverRows = SilverEntities.flatMap { entity =>
      val exists = new org.apache.hadoop.fs.Path(s"$bronzeRoot/$entity")
      val fs = exists.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(exists)) None
      else {
        Silver.build(Bronze.read(spark, bronzeRoot, entity), s"$silverDb.$entity")
        Some(entity -> spark.table(s"$silverDb.$entity").count())
      }
    }.toMap

    val silverLaps = spark.table(s"$silverDb.laps")
    ctasSwap(spark, Gold.driverSessionSummary(silverLaps),
      s"$goldDb.driver_session_summary")
    val dss = spark.table(s"$goldDb.driver_session_summary")
    ctasSwap(spark, Gold.teamEventSummary(dss), s"$goldDb.team_event_summary")
    val tes = spark.table(s"$goldDb.team_event_summary")

    val keyCols = Seq("season", "round", "grand_prix")
    val contract =
      silverRows.keys.toSeq.sorted.map(e =>
        Checks.notNull(spark.table(s"$silverDb.$e"), s"$silverDb.$e", keyCols)) :+
        Checks.notNull(dss, s"$goldDb.driver_session_summary", keyCols :+ "driver") :+
        Checks.notNull(tes, s"$goldDb.team_event_summary", keyCols :+ "team")

    BuildResult(silverRows, dss.count(), tes.count(), contract.flatten)
  }
}
