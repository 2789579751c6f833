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
}
