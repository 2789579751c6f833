package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Interleaved same-JVM A/B for the round-15 quantile-machinery input
  * cache (`lowerQuantilesW(persistInput = true)`): does one shared
  * materialization of the (g, x, w) projection beat re-scanning the
  * fact per pass? Alternates cached/uncached weightedMedian (q157
  * shape) and quantileBands (q155 shape) on the same session; MINs
  * are the signal (the q139 persist lesson: measure, don't assume).
  */
object QcacheAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val spark = Sessions.local("qcache-ab", Sessions.defaultCpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def cents = floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType)
    def wmedInput = tables.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"), cents.as("x"),
        floor(col("l_quantity")).cast(LongType).as("w"))
    def bandsInput = tables.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("g"), cents.as("x"), lit(1L).as("w"))

    def once(label: String)(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      println(f"[qcache] $label: $t%.3f s")
      t
    }

    val acc = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)
    // warm
    once("warm")(operators.Profiling.lowerQuantilesW(
      wmedInput, Seq(("q0", 1L, 2L))))
    for (_ <- 1 to rounds) {
      for ((label, persist) <- Seq("wmed_nocache" -> false,
          "wmed_cache" -> true)) {
        val t = once(label)(operators.Profiling.lowerQuantilesW(
          wmedInput, Seq(("q0", 1L, 2L)), persistInput = persist))
        acc(label) = t :: acc(label)
      }
      for ((label, persist) <- Seq("bands_nocache" -> false,
          "bands_cache" -> true)) {
        val t = once(label)(operators.Profiling.lowerQuantilesW(
          bandsInput,
          Seq(("p_10", 10L, 100L), ("p_50", 50L, 100L), ("p_90", 90L, 100L)),
          persistInput = persist))
        acc(label) = t :: acc(label)
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"[qcache] RESULT $k min=${ts.min}%.3f med=${
        ts.sorted.apply(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
