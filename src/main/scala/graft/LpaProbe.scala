package graft

import org.apache.spark.sql.functions._

/** Dev probe for the round-14 LPA broadcast-round rewrite: asserts the
  * physical premise — a `repartition(n).localCheckpoint` LogicalRDD
  * carries its HashPartitioning, so a broadcast-joined round's BOTH
  * aggregations plan with ZERO exchanges above it — and then measures
  * the two labelPropagation paths interleaved on the q171 edge build
  * (`runMain graft.LpaProbe [reps]`, SPARK_GRAFT_SF_DIR).
  */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = Sessions.local("graft-lpa-probe", Sessions.defaultCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- premise check: exchange-free round above a checkpointed
    // hash-partitioned adjacency
    val adj = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("n", "nbr")
      .repartition(col("n")).localCheckpoint(eager = true)
    val lbl = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("node", "lbl")
    val round = adj
      .join(broadcast(lbl.select(col("node").as("nbr"), col("lbl"))), "nbr")
      .groupBy(col("n"), col("lbl")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("n").as("node"))
      .agg(min(struct((-col("cnt")).as("neg"), col("lbl")))
        .getField("lbl").as("lbl"))
    round.write.format("noop").mode("overwrite").save()
    val plan = round.queryExecution.executedPlan.toString
    val shuffles = "ShuffleExchange".r.findAllIn(plan).size
    println(s"ROUND_SHUFFLE_EXCHANGES=$shuffles (want 0)")
    if (shuffles != 0) { println(plan); sys.exit(1) }
    adj.unpersist(blocking = true)

    // --- interleaved A/B on the q171 workload
    def edges = operators.ProductAnalytics.frequentPairs(
        tables.Tables.lineitem(spark, sfDir),
        col("l_orderkey"), col("l_partkey"),
        minItemSupport = 25, minPairSupport = 2)
      .select(col("item_a").as("doc_a"), col("item_b").as("doc_b"))

    def once(limit: Long): Double = {
      val t0 = System.nanoTime()
      operators.GraphOps.labelPropagation(edges, rounds = 4,
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
