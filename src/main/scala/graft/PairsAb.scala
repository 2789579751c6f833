package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B of the q141 frequent-pairs formulations —
  * the r13 box-control protocol in miniature: on a VM with
  * multi-second scheduling stalls, only ALTERNATING measurements in
  * one session are comparable. `runMain graft.PairsAb [reps]`.
  */
object PairsAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = Sessions.local("graft-pairs-ab", Sessions.defaultCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def txns = graft.tables.Tables.lineitem(spark, sfDir)

    // OLD (r07-r13): distinct -> semi prune -> checkpoint -> basket
    // self-join (SMJ, two exchanges) -> pair agg
    def oldPairs(): DataFrame = {
      val bi = txns.select(col("l_orderkey").as("basket"),
        col("l_partkey").as("item")).distinct()
      val freq = bi.groupBy("item").agg(count(lit(1)).as("isup"))
        .filter(col("isup") >= 25).select("item")
      val fbi = bi.join(freq, Seq("item"), "left_semi")
        .localCheckpoint(eager = true)
      val l = fbi.select(col("basket"), col("item").as("item_a"))
      val r = fbi.select(col("basket").as("basket_r"),
        col("item").as("item_b"))
      l.join(r, col("basket") === col("basket_r") &&
          col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
    }

    // NEW (r14): lazy basket-sets + in-expression enumeration
    def newPairs(): DataFrame =
      graft.operators.ProductAnalytics.frequentPairs(
        txns, col("l_orderkey"), col("l_partkey"),
        minItemSupport = 25, minPairSupport = 2)

    // C: old row-based shape, but ONE basket exchange — repartition
    // the checkpointed prune once; both self-join sides read the same
    // exchange (alias-aware partitioning keeps it exchange-free)
    def repartPairs(): DataFrame = {
      val bi = txns.select(col("l_orderkey").as("basket"),
        col("l_partkey").as("item")).distinct()
      val freq = bi.groupBy("item").agg(count(lit(1)).as("isup"))
        .filter(col("isup") >= 25).select("item")
      val fbi = bi.join(freq, Seq("item"), "left_semi")
        .localCheckpoint(eager = true)
        .repartition(col("basket"))
      val l = fbi.select(col("basket"), col("item").as("item_a"))
      val r = fbi.select(col("basket").as("basket_r"),
        col("item").as("item_b"))
      l.join(r, col("basket") === col("basket_r") &&
          col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
    }

    def once(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      t
    }
    // warmup all
    once(oldPairs _); once(newPairs _); once(repartPairs _)
    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    val reps2 = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      olds += once(oldPairs _)
      news += once(newPairs _)
      reps2 += once(repartPairs _)
    }
    def fmt(xs: Seq[Double]) =
      f"min ${xs.min}%.2f med ${xs.sorted.apply(xs.size / 2)}%.2f " +
        xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"OLD ${fmt(olds.toSeq)}")
    println(s"NEW ${fmt(news.toSeq)}")
    println(s"RPT ${fmt(reps2.toSeq)}")
    spark.stop()
  }
}
