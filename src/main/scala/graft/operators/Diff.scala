package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff (batch CDC): classify every key of two table versions
  * as `added` / `removed` / `changed`, with unchanged keys dropped.
  * This is the change-data-capture primitive a lakehouse runs between
  * two loads of the same table when the source emits no log.
  *
  * Rows are compared by an md5 fingerprint of the tracked columns
  * (md5 is the one hash both engines spell identically). Each column
  * is HASHED INDIVIDUALLY first (cast to string → md5), NULL replaced
  * by an out-of-band sentinel (\\u0002) AFTER the per-column hash, and
  * the per-column digests are then \\u0001-joined and hashed again.
  * Per-column hashing makes the encoding injective by construction:
  * a digest is lowercase hex, so it can never contain the separator
  * or the sentinel — a literal \\u0002 value no longer collides with
  * NULL, and a \\u0001 inside a value can no longer alias the column
  * boundary (("a\\u0001b","c") vs ("a","b\\u0001c") now differ).
  * concat_ws silently skips NULLs on both engines, which is why the
  * sentinel goes in before the join. Tracked columns must be
  * string/integer typed: float-to-string formatting is not
  * cross-engine stable (discretize first, the usual cents contract).
  *
  * Scale shape: both snapshots project to (keys, fingerprint) —
  * column-pruned scans, a few bytes per row — then ONE full-outer
  * sort-merge join shuffled on the key. Nothing else moves; the
  * output is bounded by the churn, not the table.
  */
object Diff {

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compare.nonEmpty, "keys and compare required")
    def fp(df: DataFrame, as: String) = df.select(
      keys.map(col) :+
        md5(concat_ws("\u0001",
          compare.map(c => coalesce(md5(col(c).cast("string")), lit("\u0002"))): _*))
          .as(as): _*)
    fp(oldSnap, "old_fp").join(fp(newSnap, "new_fp"), keys, "full_outer")
      .withColumn("change_type",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type") :+
        col("old_fp") :+ col("new_fp"): _*)
  }

  /** Oracle for [[snapshotDiff]]: `oldSql` / `newSql` must yield the
    * key columns plus the tracked columns named in `compare`.
    */
  def snapshotDiffOracle(oldSql: String, newSql: String,
                         keys: Seq[String], compare: Seq[String]): String = {
    val fpSql = compare
      .map(c => s"COALESCE(MD5(CAST($c AS VARCHAR)), CHR(2))")
      .mkString("MD5(CONCAT_WS(CHR(1), ", ", ", "))")
    val keyList = keys.mkString(", ")
    val keyOut = keys.map(k => s"COALESCE(a.$k, b.$k) AS $k").mkString(", ")
    val keyCond = keys.map(k => s"a.$k = b.$k").mkString(" AND ")
    s"""WITH a AS (SELECT $keyList, $fpSql AS old_fp FROM ($oldSql)),
       |b AS (SELECT $keyList, $fpSql AS new_fp FROM ($newSql))
       |SELECT $keyOut,
       |  CASE WHEN a.old_fp IS NULL THEN 'added'
       |       WHEN b.new_fp IS NULL THEN 'removed'
       |       ELSE 'changed' END AS change_type,
       |  a.old_fp, b.new_fp
       |FROM a FULL OUTER JOIN b ON $keyCond
       |WHERE a.old_fp IS NULL OR b.new_fp IS NULL OR a.old_fp <> b.new_fp
       |ORDER BY ${keys.map(k => s"COALESCE(a.$k, b.$k)").mkString(", ")}"""
      .stripMargin
  }
}
