package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns

/** Gold marts — the two aggregate models of the reference, re-expressed
  * as one declarative Catalyst plan each.
  *
  * Ground truth is the COMPILED dbt SQL (the checked-in source of
  * driver_session_summary is corrupted — SURVEY.md ground-truth caveat):
  *  [DSS] transform/target/compiled/f1_transform/models/gold/driver_session_summary.sql
  *  [TES] transform/target/compiled/f1_transform/models/gold/team_event_summary.sql
  */
object Gold {

  /** The 12-column closed schema of [DSS]:44-48. Durations stay int64
    * nanoseconds end-to-end (SURVEY §1.2).
    */
  final case class DriverSessionSummary(
      season: Option[Int], round: Option[Int],
      grand_prix: String, session_code: String,
      driver: String, driver_number: String, team: String,
      laps_total: Long, laps_on_track: Long, pitstops: Long,
      best_lap_time: Option[Long], personal_best_laps: Long)

  /** The 8-column closed schema of [TES]:8-14. */
  final case class TeamEventSummary(
      season: Option[Int], round: Option[Int],
      grand_prix: String, session_code: String, team: String,
      team_laps_on_track: Long, team_pitstops: Long,
      team_best_lap_time: Option[Long])

  private val SessionKeys = Seq("season", "round", "grand_prix", "session_code")
  private val DriverKeys = SessionKeys ++ Seq("driver", "driver_number", "team")

  /** [DSS] — driver_session_summary over silver.laps:
    *
    *  - P5: WHERE laptime IS NOT NULL ([DSS]:2)
    *  - P8: driver = COALESCE(NULLIF(driver,''), CAST(drivernumber AS
    *    VARCHAR)) ([DSS]:10)
    *  - W1: ROW_NUMBER() OVER (PARTITION BY 7 keys ORDER BY laptime ASC
    *    NULLS LAST) ([DSS]:18-32) — `asc_nulls_last` spelled explicitly:
    *    Spark's default asc is NULLS FIRST, DuckDB's is NULLS LAST
    *  - A1-A5: 7-key aggregate ([DSS]:32-42)
    *  - J1: the reference's 7-key equi LEFT join agg←pb with plain `=`
    *    semantics + COALESCE(…,0) ([DSS]:49-57), expressed in its
    *    algebraically-equal single-aggregate form (see below)
    *
    * Quirk preserved, not fixed (SURVEY §7.6): in the reference, NULL
    * join keys never match (`=`, not `<=>`), so groups with any NULL
    * key get personal_best_laps = 0 from the COALESCE patch; every
    * other group trivially matches itself. The fused plan reproduces
    * exactly that: one aggregate over the ranked frame, with the
    * rn=1 count overridden to 0 when any grouping key is NULL.
    * PipelineSpec's golden fixture (NULL-team driver) pins this.
    *
    * Scale: the reference's two-branch shape shuffles the laps base
    * TWICE on the same 7-key hash (the partial-agg exchange and the
    * window exchange have different subtrees, so ReuseExchange cannot
    * merge them). Fused, the window's Exchange+Sort is the ONLY
    * shuffle — the groupBy reuses its partitioning — which halves the
    * dominant cost of the mart build at any scale.
    */
  def driverSessionSummary(silverLaps: DataFrame): DataFrame = {
    val base = silverLaps
      .filter(col("laptime").isNotNull)
      .withColumn("driver",
        Fns.emptyToFallback(col("driver"), col("drivernumber").cast(StringType)))
      .withColumn("driver_number", col("drivernumber").cast(StringType))

    val onTrack = when(col("pitintime").isNull && col("pitouttime").isNull, 1)
      .otherwise(0)

    val w = Window.partitionBy(DriverKeys.map(col): _*)
      .orderBy(col("laptime").asc_nulls_last)
    val anyKeyNull = DriverKeys.map(col(_).isNull).reduce(_ || _)

    base
      .withColumn("rn", row_number().over(w))
      .groupBy(DriverKeys.map(col): _*)
      .agg(
        count(lit(1)).as("laps_total"),
        sum(onTrack).as("laps_on_track"),
        sum(lit(1) - onTrack).as("pitstops"),
        min("laptime").as("best_lap_time"),
        sum(when(col("rn") === 1, 1).otherwise(0)).as("pb_raw"))
      .select(
        (DriverKeys.map(col) :+
          col("laps_total") :+ col("laps_on_track") :+ col("pitstops") :+
          col("best_lap_time") :+
          when(anyKeyNull, 0L).otherwise(col("pb_raw")).as("personal_best_laps")): _*)
  }

  /** [TES] — team_event_summary re-aggregates the DSS mart (J3: the
    * mart-over-mart DAG edge — computed from the DSS DataFrame, never
    * from laps). Quirk preserved: "race_only" actually admits R, Q and
    * S ([TES]:4-5, SURVEY §7.6).
    */
  def teamEventSummary(dss: DataFrame): DataFrame =
    dss
      .filter(col("session_code").isin("R", "Q", "S"))
      .groupBy((SessionKeys :+ "team").map(col): _*)
      .agg(
        sum("laps_on_track").as("team_laps_on_track"),
        sum("pitstops").as("team_pitstops"),
        min("best_lap_time").as("team_best_lap_time"))

  def asDss(df: DataFrame, spark: SparkSession): Dataset[DriverSessionSummary] = {
    import spark.implicits._
    df.as[DriverSessionSummary]
  }

  def asTes(df: DataFrame, spark: SparkSession): Dataset[TeamEventSummary] = {
    import spark.implicits._
    df.as[TeamEventSummary]
  }
}
