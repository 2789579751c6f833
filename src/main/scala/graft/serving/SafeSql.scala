package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan}

/** Guard-railed gateway for untrusted SQL (SURVEY §2 F9/F10/T3, §3.3).
  *
  * Mirrors the reference's NL→SQL copilot guard rails
  * (ai/rag_api/app.py:167-177, ai/rag_api/main.py:79-88,146-147):
  *   1. SELECT-only + forbidden-keyword screen (same error surface);
  *   2. schema-prefix rewrite (`silver.` → resolved schema);
  *   3. hard row cap via a LIMIT wrap (AI_MAX_ROWS=200, .env:8);
  * and improves on the reference (SURVEY §2 F9 note) by *also* parsing
  * with Catalyst and rejecting any plan that contains a command/write
  * node — a keyword screen alone can be smuggled past, a parsed plan
  * cannot.
  */
object SafeSql {

  final case class RejectedSql(reason: String)
      extends IllegalArgumentException(reason)

  /** Keyword screen kept for parity of the error surface with
    * ai/rag_api/main.py:82-85 (word-boundary regex).
    */
  private val Forbidden: Seq[String] = Seq(
    "insert", "update", "delete", "drop", "alter", "create", "replace",
    "truncate", "attach", "detach", "copy", "export", "import", "pragma",
    "call", "grant", "revoke", "vacuum", "merge", "set")

  /** Blank out quoted regions before keyword-scanning so that a literal
    * (`WHERE word = 'set'`) or a quoted identifier (`AS "copy"`) never
    * trips the screen. Handles BOTH quote-escape conventions Spark's
    * parser accepts: ''-doubling (`'it''s'` is two adjacent quoted
    * segments, each removed) and backslash escapes (`'it\'s'`,
    * `'a\\'` — the `\\.` alternative consumes the escaped character so
    * the scan cannot desync and leave literal text outside quotes).
    * The keyword screen is a parity-surface heuristic anyway; the
    * sound gate is the Catalyst parse in `assertQueryPlan`.
    */
  private def stripQuoted(sql: String): String =
    sql.replaceAll("""(?s)'(?:[^'\\]|\\.)*'""", "''")
      .replaceAll("""(?s)"(?:[^"\\]|\\.)*"""", "\"\"")

  private def keywordScreen(sql: String): Unit = {
    val lowered = stripQuoted(sql).toLowerCase
    Forbidden.foreach { kw =>
      if (("""\b""" + kw + """\b""").r.findFirstIn(lowered).isDefined)
        throw RejectedSql(s"forbidden keyword: $kw")
    }
  }

  private def isSelectLike(sql: String): Boolean = {
    val head = sql.trim.stripPrefix("(").trim.toLowerCase
    head.startsWith("select") || head.startsWith("with")
  }

  /** Catalyst-level validation: the parsed plan must be a pure query —
    * no Command (DDL/DML/utility) nodes anywhere in the tree.
    */
  private def assertQueryPlan(spark: SparkSession, sql: String): Unit = {
    val plan: LogicalPlan = spark.sessionState.sqlParser.parsePlan(sql)
    val bad = plan.collectFirst {
      case c: Command => c
      case i: InsertIntoStatement => i
    }
    if (bad.isDefined)
      throw RejectedSql(s"not a read-only query: ${bad.get.nodeName}")
  }

  /** S9 — schema resolution probe: first existing database among the
    * candidates (dashboard/app.py:22-35 tries `main_silver` then
    * `silver`; same two-candidate behavior here via the Catalog API).
    */
  def resolveSchema(spark: SparkSession, candidates: Seq[String]): Option[String] =
    candidates.find(spark.catalog.databaseExists)

  /** F12/A11 — catalog dump in the reference's `schema_overview` shape:
    * one "table(col type, …)" line per table, columns in ordinal order
    * (ai/rag_api/app.py:77-90). Uses the Catalog API — Spark has no
    * information_schema — with identical output shape.
    */
  def schemaOverview(spark: SparkSession, tables: Seq[String]): Seq[(String, String)] =
    tables.sorted.map { t =>
      val cols = spark.catalog.listColumns(t).collect()
        .map(c => s"${c.name} ${c.dataType}").mkString(", ")
      (t, s"$t($cols)")
    }

  /** Engine-neutral variant of `schemaOverview` for cross-engine
    * verification: (table, alphabetically-sorted column-name list). Type
    * spellings differ between engines (`DOUBLE` vs `DoubleType`), names
    * do not; alphabetical order makes the line independent of any
    * engine's metadata ordering guarantees, so the result is
    * hash-comparable against a DuckDB DESCRIBE aggregation.
    */
  def columnOverview(spark: SparkSession, tables: Seq[String]): Seq[(String, String)] =
    tables.sorted.map { t =>
      val cols = spark.table(t).schema.fieldNames.sorted.mkString(", ")
      (t, cols)
    }

  /** F10 — schema-prefix rewrite (ai/rag_api/main.py:146-147). */
  def rewriteSchemas(sql: String, rewrites: Map[String, String]): String =
    rewrites.foldLeft(sql) { case (acc, (from, to)) =>
      acc.replaceAll("""\b""" + from + """\.""", to + ".")
    }

  /** Validate + execute untrusted SQL with a hard row cap (default 200,
    * matching AI_MAX_ROWS). The `.limit` lands as a GlobalLimit on top of
    * the parsed plan — the same shape as the reference's
    * `SELECT * FROM (<stmt>) AS safe_view LIMIT 200` wrap.
    */
  def run(
      spark: SparkSession,
      sql: String,
      maxRows: Int = 200,
      schemaRewrites: Map[String, String] = Map.empty): DataFrame = {
    val stripped = sql.trim.stripSuffix(";")
    if (!isSelectLike(stripped)) throw RejectedSql("only SELECT queries are allowed")
    keywordScreen(stripped)
    val rewritten = rewriteSchemas(stripped, schemaRewrites)
    assertQueryPlan(spark, rewritten)
    spark.sql(rewritten).limit(maxRows)
  }
}
