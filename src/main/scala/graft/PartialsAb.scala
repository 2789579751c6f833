package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dev A/B (NOT part of the library): native Expand-based
  * ROLLUP/CUBE/GROUPING SETS vs [[graft.operators.Rollup.fromPartials]]
  * on the declared q35/q54/q79 shapes, same session, interleaved
  * medians — the r18 evidence that the fine-level re-aggregation stays
  * at-or-below native at BOTH tested scales (the r17 verdict flagged
  * q79's sf1 regression under the union-of-branches shape; the r18
  * grouping-sets-over-fine shape removes the fixed overhead).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PartialsAb [reps]"
  */
object PartialsAb {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-partials-ab", Sessions.defaultCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.Rollup
    import graft.tables.Tables
    def orders = Tables.orders(spark, sfDir)
    def li = Tables.lineitem(spark, sfDir)
    val oKeys = Seq("o_orderstatus", "o_orderpriority")
    val lKeys = Seq("l_returnflag", "l_linestatus")

    def shape(name: String, native: () => DataFrame,
              derived: () => DataFrame): Unit = {
      def time(f: () => DataFrame): Double = {
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        t
      }
      time(native): Unit; time(derived): Unit // codegen warm
      val (n, d) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (_ <- 1 to reps) { n += time(native); d += time(derived) }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[ab] $name native=${med(n.result())}%.3f " +
        f"fromPartials=${med(d.result())}%.3f (reps=$reps interleaved)")
    }

    def sel(df: DataFrame, keys: Seq[String]) =
      df.select(keys.map(col) ++ Seq(col("cnt"),
        col("__s").cast(DoubleType).as("total")): _*)
        .orderBy(keys.map(k => col(k).asc_nulls_first): _*)
    def natAgg(g: org.apache.spark.sql.RelationalGroupedDataset,
               v: String, keys: Seq[String]) =
      sel(g.agg(count(lit(1)).as("cnt"),
        graft.functions.Fns.exactSum(col(v)).as("__s")), keys)

    shape("q79_grouping_sets(orders)",
      () => natAgg(orders.groupingSets(
          Seq(oKeys.map(col), Seq(col("o_orderstatus")), Seq()),
          oKeys.map(col): _*), "o_totalprice", oKeys),
      () => sel(Rollup.fromPartials(orders, oKeys, col("o_totalprice"),
        Seq(oKeys, Seq("o_orderstatus"), Seq.empty)), oKeys))
    shape("q54_rollup(lineitem)",
      () => natAgg(li.rollup(lKeys.map(col): _*), "l_quantity", lKeys),
      () => sel(Rollup.fromPartials(li, lKeys, col("l_quantity"),
        Rollup.rollupSets(lKeys)), lKeys))
    shape("q35_cube(orders)",
      () => natAgg(orders.cube(oKeys.map(col): _*), "o_totalprice", oKeys),
      () => sel(Rollup.fromPartials(orders, oKeys, col("o_totalprice"),
        Rollup.cubeSets(oKeys)), oKeys))
    spark.stop()
  }
}
