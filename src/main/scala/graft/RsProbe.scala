package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.DataFrame
import graft.operators.Profiling
import graft.tables.Tables

/** robustStats ranking-path A/B + phase profile (dev main, the
  * [[BlocklistBench]] family): times the full q144 operator on the
  * live fixture under both adaptive arms — the one-window cumulative
  * ranking (`maxWindowDomain = Long.MaxValue` forces it) and the
  * range-bucketed [[Profiling.lowerQuantilesW]] (`= 1` forces it) —
  * then replays the round-14 persist-based internals phase by phase
  * (scan+persist+bounds, mode counts, med ranking, mad ranking) so a
  * regression names its stage. The r13 PLANS A/B record comes from
  * this run; the r14 record re-anchors it on the persist shape.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.RsProbe"
  */
object RsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = Sessions.local("rs-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rs] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val li = Tables.lineitem(spark, sfDir)
    li.select(count(lit(1))).collect() // warm the scan
    for (mwd <- Seq(Long.MaxValue, 1L); run <- 1 to 2) {
      t(s"robustStats maxWindowDomain=$mwd run$run") {
        Profiling.robustStats(li, col("l_returnflag"),
            floor(col("l_quantity")).cast(LongType),
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType),
            maxWindowDomain = mwd)
          .write.format("noop").mode("overwrite").save()
      }
      clean()
    }
    // phase replay of the bucketed arm's internals
    for (run <- 1 to 2) {
      val v = li.select(col("l_returnflag").as("g"),
          floor(col("l_quantity")).cast(LongType).as("q"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType).as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bounds = t(s"phase bounds+persist run$run") {
        v.groupBy("g")
          .agg(min("x").as("__lo"), max("x").as("__hi"),
            count(lit(1)).as("__n"),
            approx_count_distinct(col("x")).as("__dx"))
          .localCheckpoint(eager = true)
      }
      val b3 = bounds.select("g", "__lo", "__hi", "__n")
      val modes = t(s"phase mode run$run") {
        val mc = v.groupBy("g", "q").agg(count(lit(1)).as("cnt"))
        val mx = mc.groupBy("g").agg(max("cnt").as("mx"))
        mc.join(broadcast(mx), Seq("g"))
          .filter(col("cnt") === col("mx"))
          .groupBy("g").agg(min("q").as("mode_val"))
          .localCheckpoint(eager = true)
      }
      val vw = v.select(col("g"), col("x"), lit(1L).as("w"))
      val med = t(s"phase med run$run") {
        Profiling.lowerQuantilesW(vw, Seq(("q0", 1L, 2L)), boundsOpt = Some(b3))
          .select("g", "q0").withColumnRenamed("q0", "med")
          .localCheckpoint(eager = true)
      }
      val devBounds = b3.join(med, Seq("g"))
        .select(col("g"), lit(0L).as("__lo"),
          greatest(col("__hi") - col("med"), col("med") - col("__lo")).as("__hi"),
          col("__n"))
      t(s"phase mad run$run") {
        val dev = vw.join(broadcast(med), Seq("g"))
          .select(col("g"), abs(col("x") - col("med")).as("x"), col("w"))
        Profiling.lowerQuantilesW(dev, Seq(("q0", 1L, 2L)),
            boundsOpt = Some(devBounds))
          .select("g", "q0")
          .write.format("noop").mode("overwrite").save()
      }
      val _ = modes
      clean()
    }
    // Interleaved A/B (round-17 verdict item 1): the window arm's two
    // count passes over the cache — mode's (g, q) and the ranking's
    // (g, x) — vs ONE grouping-sets pass (Expand doubles the map-side
    // rows, halves the scan/job count). grouping_id discriminates the
    // sets, so NULL measure values can never collide with the
    // grouping nulls. Checksum parity gates the comparison.
    {
      val v = li.select(col("l_returnflag").as("g"),
          floor(col("l_quantity")).cast(LongType).as("q"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType).as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      v.count()
      def twoPass() = {
        v.groupBy("g", "q").agg(count(lit(1)).as("w"))
          .write.format("noop").mode("overwrite").save()
        v.groupBy("g", "x").agg(count(lit(1)).as("w"))
          .write.format("noop").mode("overwrite").save()
      }
      def fused() =
        v.groupingSets(Seq(Seq(col("g"), col("q")), Seq(col("g"), col("x"))),
            col("g"), col("q"), col("x"))
          .agg(count(lit(1)).as("w"), grouping(col("q")).as("gq"))
          .write.format("noop").mode("overwrite").save()
      // parity: the fused pass must reproduce both count frames
      val g2 = v.groupingSets(Seq(Seq(col("g"), col("q")), Seq(col("g"), col("x"))),
          col("g"), col("q"), col("x"))
        .agg(count(lit(1)).as("w"), grouping(col("q")).as("gq"))
      val fusedQ = g2.filter(col("gq") === 0).select("g", "q", "w")
      val fusedX = g2.filter(col("gq") === 1).select("g", "x", "w")
      val okQ = fusedQ.collect().map(_.toString).sorted.sameElements(
        v.groupBy("g", "q").agg(count(lit(1)).as("w"))
          .collect().map(_.toString).sorted)
      val okX = fusedX.collect().map(_.toString).sorted.sameElements(
        v.groupBy("g", "x").agg(count(lit(1)).as("w"))
          .collect().map(_.toString).sorted)
      println(s"[rs] AB parity: q=$okQ x=$okX")
      for (run <- 1 to 3) {
        t(s"AB two-pass run$run") { twoPass() }
        t(s"AB fused run$run") { fused() }
      }
      clean()
    }
    spark.stop()
  }
}
