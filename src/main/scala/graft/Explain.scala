package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan of one or more
  * registered queries. Run: sbt "runMain graft.Explain q08_a1_groupby_agg"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local("graft-explain", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q30_flagship_dss_shape")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      // SPARK_GRAFT_EXPLAIN_EXECUTED=1: also run the query and print
      // the FINAL adaptive plan — AQE decisions (stage reuse, runtime
      // join strategy, coalesced partitions) only exist post-execution
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_EXECUTED")) {
        // execute THIS Dataset's own QueryExecution — a noop write
        // would run a separate QueryExecution and leave this one's
        // adaptive plan in its initial (isFinalPlan=false) state
        df.queryExecution.toRdd.foreachPartition(_ => ())
        println(s"----- $n executed (AQE final) -----")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
