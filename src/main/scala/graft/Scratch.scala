package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.Tables

/** Throwaway sub-pipeline profiler (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("scratch", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    println("[scratch] bloom=" + plan.contains("bloom_filter_might_contain"))
    val pieces = plan.linesIterator.filter(_.contains("might_contain")).take(3).toList
    pieces.foreach(l => println("[scratch] " + l.trim.take(150)))
    spark.stop()
  }
}
