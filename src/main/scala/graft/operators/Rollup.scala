package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ROLLUP / CUBE / GROUPING SETS over DECOMPOSABLE aggregates (COUNT +
  * exact decimal SUM) as a re-aggregation of the FINEST grouping level,
  * instead of Spark's native Expand plan.
  *
  * Why (r17, guide §2.3/§2.4): the native plan is
  * `Expand(×|sets|) → partial agg → Exchange → final agg` — Expand
  * replicates EVERY input row once per grouping set, so the partial
  * hash aggregate (and its per-row decimal adds) does |sets|× the work
  * and the exchange carries |sets|× the per-mapper group rows. At
  * 100 TB a 4-set CUBE pushes 4× the corpus through the aggregation.
  * COUNT and decimal SUM are exactly re-aggregable (decimal addition
  * is exact, associative and commutative; SUM of per-group COUNTs is
  * the group COUNT), so every coarser grouping set derives from the
  * finest one's 9-to-|domain|-row result by arithmetic — the corpus is
  * scanned and aggregated ONCE, and the derived levels are
  * domain-sized work, never data-sized.
  *
  * The finest aggregate is materialized via one eager localCheckpoint
  * (the [[Profiling]] domain-frame discipline) so the |sets|-branch
  * union reads it from block storage instead of gambling on
  * ReuseExchange across differently-pruned branches (the r06 lesson:
  * per-branch column pruning defeats exchange reuse).
  *
  * Result equivalence with the native operator (oracle-gated): each
  * grouping set contributes one output row per surviving key
  * combination with non-participating keys NULL — exactly the native
  * column projection of ROLLUP/CUBE output. Data-level NULL keys group
  * into the fine level's NULL bucket and re-aggregate into subtotals
  * the same way Expand's nulled copies do (both engines emit a
  * separate row per grouping set, so a data-NULL fine row and a
  * subtotal row coexist identically in both formulations).
  */
object Rollup {

  /** (keys..., cnt BIGINT, __s DECIMAL(38,6)) for every grouping set in
    * `sets` (each a subset of `keys`; include `keys` itself for the
    * fine level). Callers rename/cast `cnt`/`__s` and order the output.
    */
  def fromPartials(df: DataFrame, keys: Seq[String], value: Column,
                   sets: Seq[Seq[String]]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(sets.forall(_.forall(keys.contains)),
      s"every grouping set must be a subset of keys=$keys")
    val fine = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        graft.functions.Fns.exactSum(value).as("__s"))
      .localCheckpoint(eager = true)
    val keyType = keys.map(k => k -> fine.schema(k).dataType).toMap
    val levels = sets.map { g =>
      val agg =
        if (g == keys) fine
        else if (g.isEmpty)
          // global aggregate: one row even on empty input — COUNT is 0
          // there (sum-of-counts is NULL), matching the native () set
          fine.agg(coalesce(sum(col("cnt")), lit(0L)).as("cnt"),
            sum(col("__s")).as("__s"))
        else fine.groupBy(g.map(col): _*)
          .agg(sum(col("cnt")).as("cnt"), sum(col("__s")).as("__s"))
      agg.select(keys.map(k =>
        (if (g.contains(k)) col(k)
         else lit(null).cast(keyType(k))).as(k))
        ++ Seq(col("cnt"), col("__s")): _*)
    }
    levels.reduce(_.unionByName(_))
  }

  /** The `sets` argument for a ROLLUP over `keys` (fine → grand total). */
  def rollupSets(keys: Seq[String]): Seq[Seq[String]] =
    keys.indices.map(i => keys.take(keys.length - i)) :+ Seq.empty

  /** The `sets` argument for a CUBE over `keys` (all subsets). */
  def cubeSets(keys: Seq[String]): Seq[Seq[String]] = {
    val n = keys.length
    (0 until (1 << n)).map(m =>
      keys.zipWithIndex.collect { case (k, i) if (m & (1 << i)) != 0 => k })
  }
}
