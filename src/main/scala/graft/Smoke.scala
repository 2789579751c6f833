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
    val spark = Sessions.local("graft-smoke", "4").getOrCreate()
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

    // scale mechanisms: salted aggregation ≡ direct; resize stub budget
    import org.apache.spark.sql.functions._
    val li = graft.tables.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val salted = graft.operators.Skew.saltedAggregate(li,
        keys = Seq("l_returnflag"), saltFrom = col("l_orderkey"),
        saltBuckets = 16,
        aggs = Seq(graft.operators.Skew.countAll("n"),
          graft.operators.Skew.sumOf(col("l_quantity").cast("decimal(38,6)"), "q")))
      .orderBy("l_returnflag").collect().toSeq
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(38,6)")).as("q"))
      .orderBy("l_returnflag").collect().toSeq
    println(s"[smoke] salted agg == direct agg: ${salted == direct}")

    val assets = graft.operators.Multimodal.fromText(
      graft.tables.Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
    val overBudget = graft.operators.Multimodal.resizeStub(assets, targetBytes = 64)
      .filter(r => r.resized_bytes > 64).count()
    println(s"[smoke] resize stub over-budget rows: $overBudget (must be 0)")
    spark.stop()
  }
}
