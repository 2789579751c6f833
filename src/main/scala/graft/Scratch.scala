package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.Tables

/** Throwaway sub-pipeline profiler (not part of the library surface).
  * Edit the `stages` map, `sbt "runMain graft.Scratch"`, read the
  * per-stage times. Times are median-of-3 after one warm run.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("scratch", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    import graft.operators.Profiling

    def v = Tables.lineitem(spark, sfDir).select(
      col("l_returnflag").as("g"),
      floor(col("l_quantity")).cast(LongType).as("q"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType).as("x"))

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "scan_only" -> (() => v),
      "counts_gx" -> (() => v.groupBy("g", "x").agg(count(lit(1)).as("cnt"))),
      "mode" -> (() => {
        val mc = v.groupBy("g", "q").agg(count(lit(1)).as("cnt"))
        val mx = mc.groupBy("g").agg(max("cnt").as("mx"))
        mc.join(broadcast(mx), Seq("g")).filter(col("cnt") === col("mx"))
          .groupBy("g").agg(min("q").as("mode_val"))
      }),
      "med" -> (() => Profiling.lowerMedian(v.select("g", "x"))),
      "med_mad" -> (() => {
        val med = Profiling.lowerMedian(v.select("g", "x"))
          .withColumnRenamed("med0", "med")
        Profiling.lowerMedian(
          v.join(broadcast(med), Seq("g"))
            .select(col("g"), abs(col("x") - col("med")).as("x")))
      }),
      "full" -> (() => Profiling.robustStats(
        Tables.lineitem(spark, sfDir), col("l_returnflag"),
        floor(col("l_quantity")).cast(LongType),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType)))
    )

    stages.foreach { case (name, mk) =>
      mk().write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[scratch] $name%-12s ${ts(1)}%8.3f s  (min ${ts.head}%.3f)")
    }
    spark.stop()
  }
}
