package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Interleaved same-JVM A/B for the q129 two-phase rank (round-16
  * verdict item 4): the current [[operators.Skew.saltedRank]] derives
  * bucket offsets from a SECOND column-pruned scan of the input
  * (StageProbe: 0.95 s of the 2.9 s steady state at sf1). Candidate B
  * derives the per-(grp, bucket) sizes from a `count(*)` window over
  * the SAME partitioning as the rank window — zero extra exchange,
  * the offsets frame comes from `rn_local = 1` rows — trading the
  * second scan for a second post-shuffle window pass on the reused
  * exchange. MINs decide; checksum equality gates the comparison.
  */
object SaltAb {
  /** HARNESS-ONLY candidate, not a general operator (r16 ADVICE): the
    * bucket expression `(x − lo) · buckets` runs in non-ANSI Long
    * arithmetic and WRAPS when the per-group spread exceeds
    * Long.MaxValue / buckets (e.g. a full-range 64-bit hash as the
    * order column), assigning wrong buckets. Fine for the q129 price
    * column this rig benches — the production `Skew.saltedRank` is
    * the guarded general form; promote this shape only behind
    * Profiling's `(hi − lo) · B must fit int64` gate. The checksum
    * parity gate below would fail loudly on a wrapped run.
    */
  def saltedRankWindowCount(df: DataFrame, partCols: Seq[String],
                            orderCol: String, tieCols: Seq[String],
                            buckets: Int = 64,
                            as: String = "rn"): DataFrame = {
    val part = partCols.map(col)
    val bounds = df.groupBy(part: _*)
      .agg(min(col(orderCol)).as("__lo"), max(col(orderCol)).as("__hi"))
    val bkt = call_function("div",
      (col(orderCol) - col("__lo")) * lit(buckets.toLong),
      col("__hi") - col("__lo") + lit(1L))
    val keyCols = (partCols :+ "__bkt").map(col)
    val localW = Window.partitionBy(keyCols: _*)
      .orderBy((orderCol +: tieCols).map(col): _*)
    val cntW = Window.partitionBy(keyCols: _*)
    val ranked = df.join(broadcast(bounds), partCols)
      .withColumn("__bkt", bkt)
      .withColumn("__rn_local", row_number().over(localW))
      .withColumn("__cnt", count(lit(1)).over(cntW))
    val offsets = ranked.filter(col("__rn_local") === 1)
      .select((keyCols :+ col("__cnt")): _*)
      .withColumn("__offset",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(part: _*).orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((keyCols :+ col("__offset")): _*)
    ranked.join(broadcast(offsets), partCols :+ "__bkt")
      .withColumn(as, col("__offset") + col("__rn_local"))
      .drop("__lo", "__hi", "__bkt", "__rn_local", "__offset", "__cnt")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val rounds = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.local("salt-ab", Sessions.defaultCpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def base = tables.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("grp"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType).as("x"),
        col("l_orderkey"), col("l_linenumber"))
    def checksum(ranked: DataFrame): DataFrame = ranked
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        (sum((col("rn") * col("x")).cast(DecimalType(38, 0)))
            % lit(999999999999999989L).cast(DecimalType(38, 0)))
          .cast(LongType).as("rank_weighted_sum"))
      .orderBy("grp")
    def qA = checksum(operators.Skew.saltedRank(base, Seq("grp"), "x",
      Seq("l_orderkey", "l_linenumber"), buckets = 64))
    def qB = checksum(saltedRankWindowCount(base, Seq("grp"), "x",
      Seq("l_orderkey", "l_linenumber"), buckets = 64))

    // correctness gate before any timing
    val a = qA.collect().map(_.toSeq).toSeq
    val b = qB.collect().map(_.toSeq).toSeq
    require(a == b, s"variant outputs differ:\nA=$a\nB=$b")
    println(s"[salt] checksum parity OK: $a")
    println("[salt] B executed plan shuffle lines: " +
      qB.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("Exchange hashpartitioning") &&
          !l.contains("ReusedExchange")))

    def once(label: String)(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[salt] $label: $t%.3f s")
      t
    }
    val acc = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)
    once("warm")(qA)
    for (_ <- 1 to rounds; (label, q) <- Seq("A_scan" -> (() => qA),
        "B_wcount" -> (() => qB))) {
      acc(label) = once(label)(q()) :: acc(label)
    }
    acc.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"[salt] RESULT $k min=${ts.min}%.3f med=${
        ts.sorted.apply(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
