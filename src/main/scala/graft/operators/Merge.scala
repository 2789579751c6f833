package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert) semantics over plain-parquet tables — the
  * incremental-maintenance primitive a Delta/Iceberg `MERGE INTO` would
  * provide, expressed as composable dataflow so it can feed
  * [[graft.pipeline.Lakehouse.ctasSwap]] for an atomic table replace:
  *
  *   WHEN MATCHED THEN UPDATE  → matched target rows are REPLACED by
  *                               their update row (anti-join drops them);
  *   WHEN NOT MATCHED THEN INSERT → update rows with unseen keys append.
  *
  * Scale shape: ONE shuffle of the target on the merge keys (the
  * anti-join) + the union — no window, no full rewrite of unmatched
  * partitions at the dataflow level. With AQE the anti-join broadcasts
  * whenever the update batch is small (the common incremental case), so
  * the target is never shuffled at all.
  */
object Merge {

  /** Upsert `updates` into `target` on `keys`. Column sets must match
    * (enforced by unionByName). Duplicate keys WITHIN `updates` are the
    * caller's contract to avoid, exactly as SQL MERGE requires
    * ("cannot update the same row twice").
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target
      .join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** MERGE with a delete branch: keys present in `deletes` are removed,
    * then `updates` upsert as in [[upsert]] (delete wins over update if
    * a key appears in both — SQL MERGE's WHEN MATCHED AND <cond> DELETE).
    */
  def upsertDelete(target: DataFrame, updates: DataFrame,
                   deletes: DataFrame, keys: Seq[String]): DataFrame =
    upsert(
      target.join(deletes.select(keys.map(col): _*), keys, "left_anti"),
      updates.join(deletes.select(keys.map(col): _*), keys, "left_anti"),
      keys)

  // ------------------------- incremental aggregate maintenance (IVM)

  /** Mergeable per-key aggregate state: (k, cnt, sum_v). Count and sum
    * form a commutative monoid, so states computed over ANY partition of
    * the input merge to the full-recompute answer ([[mergeAggState]] —
    * the law the q143 oracle and the spec both gate). `value` should be
    * an integer measure (e.g. money as cents) so the merge is exact.
    */
  def aggState(df: DataFrame, key: org.apache.spark.sql.Column,
               value: org.apache.spark.sql.Column): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))

  /** Merge a delta state into a base state — the incremental-view-
    * maintenance step: cost is ONE outer join shuffled on the key (and
    * with a small delta, AQE broadcasts it and the base state is never
    * shuffled at all), versus a full rescan-and-reaggregate of the
    * base table. At 100 TB the base state is the stored materialized
    * view; only the delta's rows are ever read twice.
    */
  def mergeAggState(base: DataFrame, delta: DataFrame): DataFrame =
    base.select(col("k"), col("cnt").as("b_cnt"), col("sum_v").as("b_sum"))
      .join(delta.select(col("k"), col("cnt").as("d_cnt"),
        col("sum_v").as("d_sum")), Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("b_cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("b_sum"), lit(0L)) + coalesce(col("d_sum"), lit(0L)))
          .as("sum_v"))

  /** Oracle for base ⊕ delta = full recompute: the plain aggregate over
    * the whole table.
    */
  def aggStateOracle(table: String, keySql: String, valueSql: String): String =
    s"""SELECT $keySql AS k, CAST(COUNT(*) AS BIGINT) AS cnt,
       |  CAST(SUM($valueSql) AS BIGINT) AS sum_v
       |FROM $table GROUP BY k ORDER BY k""".stripMargin
}
