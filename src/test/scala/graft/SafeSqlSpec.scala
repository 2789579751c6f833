package graft

import graft.serving.SafeSql

class SafeSqlSpec extends SparkSpec {

  private def viewReady(): Unit =
    spark.range(10).selectExpr("id", "id * 2 AS v").createOrReplaceTempView("t")

  test("accepts plain SELECT and caps rows at maxRows") {
    viewReady()
    assert(SafeSql.run(spark, "SELECT id FROM t", maxRows = 3).count() === 3)
    assert(SafeSql.run(spark, "SELECT id FROM t;", maxRows = 200).count() === 10)
    assert(SafeSql.run(spark, "WITH c AS (SELECT id FROM t) SELECT * FROM c").count() === 10)
  }

  test("rejects non-SELECT statements") {
    viewReady()
    Seq(
      "DROP TABLE t",
      "INSERT INTO t VALUES (1, 2)",
      "CREATE TABLE x AS SELECT 1 AS a",
      "UPDATE t SET v = 0",
      "DELETE FROM t",
      "SELECT * FROM t; DROP TABLE t",
      "WITH c AS (SELECT 1 AS a) INSERT INTO t SELECT a, a FROM c",
      "SET spark.sql.ansi.enabled=true"
    ).foreach { sql =>
      assertThrows[SafeSql.RejectedSql](SafeSql.run(spark, sql))
    }
  }

  test("schema-prefix rewrite replaces only whole-word prefixes") {
    assert(SafeSql.rewriteSchemas("SELECT * FROM silver.laps",
      Map("silver" -> "main_silver")) === "SELECT * FROM main_silver.laps")
    assert(SafeSql.rewriteSchemas("SELECT * FROM notsilver.laps",
      Map("silver" -> "main_silver")) === "SELECT * FROM notsilver.laps")
  }
}
