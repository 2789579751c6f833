package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.{Bronze, Gold, Silver}

/** Second-season parity sweep (round 15, verdict item 8): the
  * PipelineSpec golden covers the reference's edge cases on 8
  * hand-written rows; THIS spec pushes a deterministic TWO-season ×
  * 3-round × 3-session × 12-driver × 25-lap bronze fixture (5400
  * rows, every edge case sprinkled arithmetically — null laptimes,
  * empty drivers, null teams, pit in/out, exact-tie laptimes) through
  * the REAL bronze→silver→gold pipeline and checks both marts
  * row-for-row against an INDEPENDENT in-memory recomputation of the
  * reference semantics (plain Scala collections — no Spark, no shared
  * code with the operators under test). Keeps the parity evidence
  * honest at a fixture size where partitioning, the fused DSS
  * aggregate, and the hive layout all actually engage.
  */
class SeasonSweepSpec extends SparkSpec {

  private val lapsSchema = StructType(Seq(
    StructField("driver", StringType), StructField("drivernumber", StringType),
    StructField("team", StringType), StructField("lapnumber", DoubleType),
    StructField("laptime", LongType), StructField("pitintime", LongType),
    StructField("pitouttime", LongType), StructField("lapstartdate", TimestampType),
    StructField("season", StringType), StructField("round", StringType),
    StructField("grand_prix", StringType), StructField("session", StringType)))

  private case class Lap(driver: String, number: String, team: String,
                         lap: Int, laptime: Option[Long], pitin: Option[Long],
                         pitout: Option[Long], season: String, round: String,
                         gp: String, session: String)

  /** Purely index-arithmetic fixture — no RNG, so the sweep is exactly
    * replayable and every edge-case density is auditable from the
    * formulas alone.
    */
  private lazy val laps: Seq[Lap] = for {
    s <- Seq("2023", "2024")
    r <- 1 to 3
    (sess, sessIdx) <- Seq("R" -> 0, "Q" -> 1, "S" -> 2)
    d <- 0 until 12
    l <- 1 to 25
  } yield {
    val base = 80000000000L +
      (d * 997L + l * 7919L + r * 104729L + sessIdx * 31L +
        (if (s == "2024") 17L else 0L)) % 20000000000L
    Lap(
      driver = if ((d + l) % 13 == 0) "" else s"D$d",
      number = (d + 1).toString,
      team = if ((d + l) % 17 == 0) null else s"T${d / 2}",
      lap = l,
      laptime = if (l % 7 == 0) None
        else if (l % 19 == 0) Some(85000000000L) // exact cross-row tie
        else Some(base),
      pitin = if (l % 5 == 0) Some(1000000000L) else None,
      pitout = if (l % 11 == 0) Some(2000000000L) else None,
      season = s, round = f"$r%02d",
      gp = s"gp-$r", session = sess)
  }

  private lazy val bronzeRoot: String = {
    val root = Files.createTempDirectory("graft-sweep-bronze").toString
    val rows = laps.map { p =>
      Row(p.driver, p.number, p.team, p.lap.toDouble,
        p.laptime.map(Long.box).orNull, p.pitin.map(Long.box).orNull,
        p.pitout.map(Long.box).orNull,
        Timestamp.valueOf(s"${p.season}-03-0${p.round.toInt} 15:00:00"),
        p.season, p.round, p.gp, p.session)
    }
    Bronze.write(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8), lapsSchema), root, "laps")
    root
  }

  // ---- the independent oracle: reference semantics in plain Scala
  private type K7 = (Int, Int, String, String, String, String, String)

  private lazy val oracleDss: Map[K7, (Long, Long, Long, Option[Long], Long)] =
    laps.filter(_.laptime.isDefined)
      .groupBy { p =>
        val drv = if (p.driver == null || p.driver.isEmpty) p.number
          else p.driver
        (p.season.toInt, p.round.toInt, p.gp, p.session, drv, p.number,
          p.team)
      }
      .map { case (k, rs) =>
        val onTrack = rs.count(p => p.pitin.isEmpty && p.pitout.isEmpty)
        // personal_best_laps: ROW_NUMBER()=1 over the SAME 7 keys is
        // exactly one row per group, zeroed when any key is NULL (the
        // reference's `=`-join COALESCE quirk; team is the only
        // nullable key in this fixture)
        val pb = if (k._7 == null) 0L else 1L
        k -> ((rs.size.toLong, onTrack.toLong, (rs.size - onTrack).toLong,
          Some(rs.flatMap(_.laptime).min): Option[Long], pb))
      }

  private lazy val dssRows: Seq[Row] = {
    val silver = Silver.promoteKeys(Bronze.read(spark, bronzeRoot, "laps"))
    Gold.driverSessionSummary(silver).collect().toSeq
  }

  test("two-season sweep: DSS matches the independent recomputation " +
       "row-for-row (5400-lap fixture)") {
    assert(laps.size === 5400)
    val got = dssRows.map { r =>
      (r.getAs[Int]("season"), r.getAs[Int]("round"),
        r.getAs[String]("grand_prix"), r.getAs[String]("session_code"),
        r.getAs[String]("driver"), r.getAs[String]("driver_number"),
        r.getAs[String]("team")) ->
        ((r.getAs[Long]("laps_total"), r.getAs[Long]("laps_on_track"),
          r.getAs[Long]("pitstops"),
          Option(r.getAs[java.lang.Long]("best_lap_time")).map(_.longValue),
          r.getAs[Long]("personal_best_laps")))
    }.toMap
    assert(got.size === dssRows.size, "duplicate 7-key groups in DSS")
    assert(got.size === oracleDss.size,
      s"group count: got ${got.size}, oracle ${oracleDss.size}")
    oracleDss.foreach { case (k, v) =>
      assert(got.get(k) === Some(v), s"DSS mismatch at $k")
    }
  }

  test("two-season sweep: TES re-aggregates DSS exactly (mart-over-mart)") {
    val silver = Silver.promoteKeys(Bronze.read(spark, bronzeRoot, "laps"))
    val tes = Gold.teamEventSummary(Gold.driverSessionSummary(silver))
      .collect().toSeq
    // independent recompute ON TOP OF the DSS oracle (the J3 edge is
    // mart-over-mart; R/Q/S admits every session in this fixture)
    val expect = oracleDss.toSeq
      .groupBy { case (k, _) => (k._1, k._2, k._3, k._4, k._7) }
      .map { case (k, rs) =>
        k -> ((rs.map(_._2._2).sum, rs.map(_._2._3).sum,
          rs.flatMap(_._2._4).min))
      }
    val got = tes.map { r =>
      (r.getAs[Int]("season"), r.getAs[Int]("round"),
        r.getAs[String]("grand_prix"), r.getAs[String]("session_code"),
        r.getAs[String]("team")) ->
        ((r.getAs[Long]("team_laps_on_track"), r.getAs[Long]("team_pitstops"),
          r.getAs[Long]("team_best_lap_time")))
    }.toMap
    assert(got.size === tes.size, "duplicate team groups in TES")
    assert(got.size === expect.size)
    expect.foreach { case (k, v) =>
      assert(got.get(k) === Some(v), s"TES mismatch at $k")
    }
  }

  test("two-season sweep: serving KPIs agree with the oracle slice") {
    val silver = Silver.promoteKeys(Bronze.read(spark, bronzeRoot, "laps"))
    val kpis = graft.serving.QueryService.kpis(silver, 2024, "R").collect()
    assert(kpis.length === 1)
    // kpis counts every lap in the slice — silver does NOT apply the
    // DSS null-laptime filter (that is P5, a mart concern)
    val sliced = laps.filter(p => p.season == "2024" && p.session == "R")
    assert(kpis(0).getAs[Long]("total_laps") === sliced.size.toLong)
  }
}
