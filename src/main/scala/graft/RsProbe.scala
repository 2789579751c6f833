package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Profiling
import graft.tables.Tables

/** robustStats ranking-path A/B (dev main, the [[BlocklistBench]]
  * family): times the full q144 operator on the live fixture under
  * both adaptive arms — the one-window cumulative ranking
  * (`maxWindowDomain = Long.MaxValue` forces it) and the
  * range-bucketed [[Profiling.lowerQuantileW]] (`= 1` forces it) —
  * plus the individual phases (grouping-sets checkpoint, probe,
  * modes, med, mad). The r13 PLANS A/B record comes from this run:
  * on the widened sf1 fixture (5.5M distinct cents over 3 groups)
  * the window arm funnels the count frame through |G| sort tasks
  * while the bucketed arm stays parallel — the measurement behind
  * [[Profiling.DefaultWindowRankDomain]].
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
    spark.stop()
  }
}
