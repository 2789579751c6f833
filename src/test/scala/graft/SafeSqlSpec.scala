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

  test("keyword screen ignores quoted literals and identifiers") {
    viewReady()
    // forbidden words inside literals / quoted aliases must NOT trip the
    // screen (reference forbids statements, not data mentioning them)
    assert(SafeSql.run(spark, "SELECT id FROM t WHERE 'set' = 'set'").count() === 10)
    assert(SafeSql.run(spark, "SELECT id AS `x`, 'drop table users' AS msg FROM t").count() === 10)
    assert(SafeSql.run(spark, "SELECT 'it''s a copy' AS s FROM t").count() === 10)
    // backslash-escaped quotes (Spark's default parser accepts both
    // conventions) must not desync the stripper: if `\'` were read as a
    // terminator, ` merge ` below would sit outside quotes and be
    // falsely rejected
    assert(SafeSql.run(spark, """SELECT 'it\'s a merge case' AS s FROM t""").count() === 10)
    assert(SafeSql.run(spark, """SELECT 'trailing backslash \\' AS s, 'drop' AS d FROM t""").count() === 10)
    // ...while genuinely hostile statements still reject
    assertThrows[SafeSql.RejectedSql](
      SafeSql.run(spark, "SELECT 'x' AS s FROM t; DROP TABLE t"))
    assertThrows[SafeSql.RejectedSql](
      SafeSql.run(spark, "WITH c AS (SELECT 'set' AS s) INSERT INTO t SELECT 1, 1"))
  }

  test("schema-prefix rewrite replaces only whole-word prefixes") {
    assert(SafeSql.rewriteSchemas("SELECT * FROM silver.laps",
      Map("silver" -> "main_silver")) === "SELECT * FROM main_silver.laps")
    assert(SafeSql.rewriteSchemas("SELECT * FROM notsilver.laps",
      Map("silver" -> "main_silver")) === "SELECT * FROM notsilver.laps")
  }
}
