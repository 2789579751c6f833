package graft

import org.apache.spark.sql.SparkSession
import graft.serving.SafeSql
import graft.tables.Tables

/** Quick end-to-end smoke: the driver's t1 contract (entry rows>0 on
  * sf0.001) plus the SafeSql gateway accept/reject surface.
  * Run: sbt "runMain graft.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n (driver requires > 0)")

    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val ok = SafeSql.run(spark, "SELECT count(*) AS n FROM lineitem").collect()
    println(s"[smoke] gateway SELECT ok: ${ok.mkString}")

    Seq(
      "DROP TABLE lineitem",
      "INSERT INTO lineitem VALUES (1)",
      "SELECT * FROM lineitem; DROP TABLE lineitem",
      "CREATE TABLE x AS SELECT 1",
      "WITH t AS (SELECT 1) INSERT INTO lineitem SELECT * FROM t"
    ).foreach { sql =>
      try {
        SafeSql.run(spark, sql)
        println(s"[smoke] !! NOT REJECTED: $sql")
      } catch {
        case e: SafeSql.RejectedSql =>
          println(s"[smoke] rejected as expected (${e.getMessage}): $sql")
      }
    }
    val capped = SafeSql.run(spark, "SELECT l_orderkey FROM lineitem").count()
    println(s"[smoke] row cap: $capped (must be <= 200)")
    spark.stop()
  }
}
