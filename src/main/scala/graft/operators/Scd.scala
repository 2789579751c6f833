package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance: dimension rows carry
  * `(keys…, attrs…, valid_from, valid_to)` with `valid_to IS NULL`
  * marking the open version. Applying a change batch effective at `effTs`:
  *
  *  - open rows whose tracked attrs CHANGED are closed
  *    (`valid_to = effTs`) and a new open version is appended;
  *  - open rows matched with identical attrs pass through untouched
  *    (no spurious versions);
  *  - change rows for unseen keys become brand-new open rows;
  *  - historical (already closed) rows always pass through.
  *
  * Scale shape: one equi-join of the open slice against the change
  * batch to find changed keys, then semi/anti joins against that
  * (small) key set — with AQE every one of them broadcasts when the
  * batch is small, so the dimension is never shuffled. Null-safe
  * comparison (`<=>`) makes NULL→value and value→NULL transitions
  * count as changes, as SCD2 requires.
  *
  * Precondition (same contract as [[Merge.upsert]]): `changes` must be
  * unique on `keys` — a batch carrying two rows for one key would append
  * two open versions and break the one-open-row-per-key invariant.
  * Upstream must collapse multi-event batches to latest-wins first
  * (the `orderCol` dedup in `EventStream.mergeSink` is the reusable
  * shape); this is a per-batch contract the engine cannot check without
  * forcing an extra aggregate over every batch.
  */
object Scd {

  def scd2(dim: DataFrame, changes: DataFrame, keys: Seq[String],
           effTs: Long): DataFrame = {
    val meta = Seq("valid_from", "valid_to")
    val attrs = dim.columns.filterNot(c => keys.contains(c) || meta.contains(c))
    require(attrs.nonEmpty, "dimension must have tracked attribute columns")

    val open = dim.filter(col("valid_to").isNull)
    val hist = dim.filter(col("valid_to").isNotNull)
    val keyCond = keys.map(k => col(s"o.$k") === col(s"c.$k")).reduce(_ && _)
    val unchanged = attrs.map(a => col(s"o.$a") <=> col(s"c.$a")).reduce(_ && _)

    val changedKeys = open.as("o").join(changes.as("c"), keyCond)
      .filter(!unchanged)
      .select(keys.map(k => col(s"o.$k")): _*)

    val closed = open.join(changedKeys, keys, "left_semi")
      .withColumn("valid_to", lit(effTs))
    val stillOpen = open.join(changedKeys, keys, "left_anti")
    val newVersions = changes.join(changedKeys, keys, "left_semi")
      .withColumn("valid_from", lit(effTs))
      .withColumn("valid_to", lit(null).cast("bigint"))
    val brandNew = changes.join(open.select(keys.map(col): _*), keys, "left_anti")
      .withColumn("valid_from", lit(effTs))
      .withColumn("valid_to", lit(null).cast("bigint"))

    hist.unionByName(closed).unionByName(stillOpen)
      .unionByName(newVersions).unionByName(brandNew)
  }

  /** Build SCD2 version history directly FROM an event log (the dual
    * of [[scd2]], which applies a pre-collapsed batch): per key, runs
    * of consecutive equal `state` values collapse into one version
    * row `(k, ver, state, valid_from, valid_to)` — `valid_from` = the
    * run's first order value, `valid_to` = the next version's
    * `valid_from` (NULL for the open version), `ver` = 1-based version
    * number. Null-safe comparison: a NULL→value transition versions,
    * NULL→NULL does not.
    *
    * Ordering must be made total by the caller: `tie` breaks `ord`
    * ties deterministically (an event id), otherwise run boundaries
    * are partition-order-dependent.
    *
    * Scale shape: two window passes (run detection, version numbering)
    * and the valid_to self-stitch, all partitioned by the key — one
    * shuffle total, high-cardinality key, per-key history bounded by
    * the usual window sort-spill contract.
    *
    * @return (k, ver, state, valid_from, valid_to)
    */
  def scd2FromLog(log: DataFrame, key: Column, ord: Column, tie: Column,
                  state: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("ord", "tie")
    val runs = log
      .select(key.as("k"), ord.as("ord"), tie.as("tie"), state.as("state"))
      .withColumn("rn", row_number().over(w))
      .withColumn("chg",
        when(col("rn") === 1 ||
          !(col("state") <=> lag(col("state"), 1).over(w)), 1L)
          .otherwise(0L))
      .withColumn("ver", sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val vw = Window.partitionBy("k").orderBy("ver")
    runs.groupBy(col("k"), col("ver"))
      .agg(max("state").as("state"), min("ord").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(vw))
      .select("k", "ver", "state", "valid_from", "valid_to")
  }

  /** Oracle for [[scd2FromLog]]: `logSql` must yield
    * (k, ord, tie, state).
    */
  def scd2FromLogOracle(logSql: String): String =
    s"""WITH v AS ($logSql),
       |r AS (
       |  SELECT k, ord, tie, state,
       |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY ord, tie) AS rn,
       |    LAG(state) OVER (PARTITION BY k ORDER BY ord, tie) AS prev
       |  FROM v),
       |f AS (
       |  SELECT k, ord, tie, state,
       |    CASE WHEN rn = 1 OR state IS DISTINCT FROM prev
       |         THEN 1 ELSE 0 END AS chg
       |  FROM r),
       |g AS (
       |  SELECT k, ord, state,
       |    SUM(chg) OVER (PARTITION BY k ORDER BY ord, tie
       |      ROWS UNBOUNDED PRECEDING) AS ver
       |  FROM f),
       |vers AS (
       |  SELECT k, CAST(ver AS BIGINT) AS ver, MAX(state) AS state,
       |    MIN(ord) AS valid_from
       |  FROM g GROUP BY k, ver)
       |SELECT k, ver, state, valid_from,
       |  LEAD(valid_from) OVER (PARTITION BY k ORDER BY ver) AS valid_to
       |FROM vers ORDER BY k, ver""".stripMargin
}
