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
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
