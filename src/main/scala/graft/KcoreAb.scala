package graft

import org.apache.spark.sql.functions._

/** Dev A/B harness for the round-14 kCore broadcast-round rewrite
  * (NOT part of the library): first asserts the physical premise —
  * a degree aggregation above a checkpointed hash-partitioned doubled
  * adjacency plans with ZERO ShuffleExchanges — then interleaves the
  * shuffled (broadcastNodeLimit = 0) and broadcast (default) peeling
  * paths on the q156 workload (kCore over the frequent-part-pair
  * graph) at sf1. Interleaving in one JVM is mandatory on this
  * stall-prone box (the r13 box-control lesson): back-to-back blocks
  * confound code with box weather.
  */
object KcoreAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = Sessions.local("graft-kcore-ab", Sessions.defaultCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- premise: exchange-free degree agg + broadcast-semi round
    val adj = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("n", "peer")
      .repartition(col("n")).localCheckpoint(eager = true)
    val keep = adj.groupBy("n").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 1).select("n")
    val round = adj.join(broadcast(keep), Seq("n"), "left_semi")
      .join(broadcast(keep.withColumnRenamed("n", "peer")),
        Seq("peer"), "left_semi")
      .select("n", "peer")
      .groupBy("n").agg(count(lit(1)).as("deg"))
    round.write.format("noop").mode("overwrite").save()
    val plan = round.queryExecution.executedPlan.toString
    // ShuffleExchangeExec renders as "Exchange hashpartitioning(...)"
    // (and under AQE as "ShuffleQueryStage") — matching the class name
    // would always count 0 and make the premise gate vacuous. Count
    // per line and skip ReusedExchange nodes: their plan line embeds
    // the reused child's "Exchange hashpartitioning(...)" text, which
    // would double-count a single physical shuffle (false failure).
    val shufflePat =
      "Exchange (hash|range|SinglePartition)|ShuffleQueryStage".r
    val shuffles = plan.linesIterator
      .filterNot(_.contains("ReusedExchange"))
      .map(l => shufflePat.findAllIn(l).size).sum
    println(s"ROUND_SHUFFLE_EXCHANGES=$shuffles (want 0)")
    if (shuffles != 0) { println(plan); sys.exit(1) }
    adj.unpersist(blocking = true)

    // --- interleaved A/B on the q156 workload
    def edges = operators.ProductAnalytics.frequentPairs(
        tables.Tables.lineitem(spark, sfDir),
        col("l_orderkey"), col("l_partkey"),
        minItemSupport = 25, minPairSupport = 2)
      .select(col("item_a").as("doc_a"), col("item_b").as("doc_b"))

    def once(limit: Long): Double = {
      val t0 = System.nanoTime()
      operators.GraphOps.kCore(edges, k = 2, rounds = 4,
          broadcastNodeLimit = limit)
        .orderBy("node")
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      t
    }
    // result-equivalence witness before timing
    val a = operators.GraphOps.kCore(edges, k = 2, rounds = 4,
        broadcastNodeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = operators.GraphOps.kCore(edges, k = 2, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(a == b, s"paths disagree: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
    println(s"RESULTS_IDENTICAL rows=${a.size}")

    once(0L); once(1L << 20) // warmup both
    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      olds += once(0L)
      news += once(1L << 20)
    }
    def fmt(xs: Seq[Double]) =
      f"min ${xs.min}%.2f med ${xs.sorted.apply(xs.size / 2)}%.2f " +
        xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"SHUFFLED  ${fmt(olds.toSeq)}")
    println(s"BROADCAST ${fmt(news.toSeq)}")
    spark.stop()
  }
}
