package graft.operators

import org.apache.spark.sql.DataFrame
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
}
