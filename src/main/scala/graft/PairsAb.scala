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

    // D: sorted-run enumeration — repartition(basket) +
    // sortWithinPartitions + a mapPartitions double-pointer walk per
    // basket run (ONE sort instead of the SMJ's two, no join build),
    // then the same pair aggregate. fbi checkpoint kept (bi is
    // referenced twice upstream either way).
    def mpPairs(checkpoint: Boolean): DataFrame = {
      import spark.implicits._
      val bi = txns.select(col("l_orderkey").as("basket"),
        col("l_partkey").as("item")).distinct()
      val freq = bi.groupBy("item").agg(count(lit(1)).as("isup"))
        .filter(col("isup") >= 25).select("item")
      val fbi0 = bi.join(freq, Seq("item"), "left_semi")
      val fbi = if (checkpoint) fbi0.localCheckpoint(eager = true) else fbi0
      val pairs = fbi
        .select(col("basket").cast("long"), col("item").cast("long"))
        .repartition(col("basket"))
        .sortWithinPartitions("basket", "item")
        .as[(Long, Long)]
        .mapPartitions { it =>
          val in = it.buffered
          new Iterator[(Long, Long)] {
            private var items: Array[Long] = Array.emptyLongArray
            private var i = 0
            private var j = 1
            private def loadNext(): Unit = {
              items = Array.emptyLongArray
              while (items.length < 2 && in.hasNext) {
                val b = in.head._1
                val ab = scala.collection.mutable.ArrayBuilder.make[Long]
                while (in.hasNext && in.head._1 == b) ab += in.next()._2
                items = ab.result()
              }
              if (items.length < 2) items = Array.emptyLongArray
              i = 0; j = 1
            }
            def hasNext: Boolean =
              i < items.length - 1 || { loadNext(); items.length >= 2 }
            def next(): (Long, Long) = {
              if (!hasNext) throw new NoSuchElementException
              val p = (items(i), items(j)); j += 1
              if (j >= items.length) { i += 1; j = i + 1 }
              p
            }
          }
        }.toDF("item_a", "item_b")
      pairs.groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
    }

    // E: basket-first clustering — repartition the RAW projection on
    // basket once; the distinct, the semi prune, the sort and the walk
    // all run exchange-free above it (basket ⊆ every downstream
    // clustering); freq's {item} agg reads the REUSED exchange. One
    // full-data shuffle, one scan, zero barriers, fully lazy.
    def mp3Pairs(): DataFrame = {
      import spark.implicits._
      val base = txns.select(col("l_orderkey").as("basket"),
        col("l_partkey").as("item")).repartition(col("basket"))
      val bi = base.distinct()
      val freq = bi.groupBy("item").agg(count(lit(1)).as("isup"))
        .filter(col("isup") >= 25).select("item")
      val fbi = bi.join(freq, Seq("item"), "left_semi")
      val pairs = fbi
        .filter(col("basket").isNotNull)
        .select(col("basket").cast("long"), col("item").cast("long"))
        .sortWithinPartitions("basket", "item")
        .as[(Long, Long)]
        .mapPartitions { it =>
          val in = it.buffered
          new Iterator[(Long, Long)] {
            private var items: Array[Long] = Array.emptyLongArray
            private var i = 0
            private var j = 1
            private def loadNext(): Unit = {
              items = Array.emptyLongArray
              while (items.length < 2 && in.hasNext) {
                val b = in.head._1
                val ab = scala.collection.mutable.ArrayBuilder.make[Long]
                while (in.hasNext && in.head._1 == b) ab += in.next()._2
                items = ab.result()
              }
              if (items.length < 2) items = Array.emptyLongArray
              i = 0; j = 1
            }
            def hasNext: Boolean =
              i < items.length - 1 || { loadNext(); items.length >= 2 }
            def next(): (Long, Long) = {
              if (!hasNext) throw new NoSuchElementException
              val p = (items(i), items(j)); j += 1
              if (j >= items.length) { i += 1; j = i + 1 }
              p
            }
          }
        }.toDF("item_a", "item_b")
      pairs.groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("support"))
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
    // sanity: the MP enumeration must reproduce the shipped output
    val shipped = newPairs().collect()
      .map(r => (r.getAs[Any]("item_a").toString.toLong,
        r.getAs[Any]("item_b").toString.toLong,
        r.getAs[Long]("support"))).toSet
    val mp = mpPairs(checkpoint = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(mp == shipped,
      s"MP mismatch: ${mp.size} vs shipped ${shipped.size}")
    val mp3 = mp3Pairs().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    require(mp3 == shipped,
      s"MP3 mismatch: ${mp3.size} vs shipped ${shipped.size}")
    println(s"MP sanity: ${mp.size} pairs identical to shipped (MP3 too)")

    // warmup all
    once(oldPairs _); once(newPairs _); once(repartPairs _)
    once(() => mpPairs(true)); once(() => mpPairs(false)); once(mp3Pairs _)
    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    val reps2 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val mp1s = scala.collection.mutable.ArrayBuffer.empty[Double]
    val mp2s = scala.collection.mutable.ArrayBuffer.empty[Double]
    val mp3s = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      olds += once(oldPairs _)
      news += once(newPairs _)
      reps2 += once(repartPairs _)
      mp1s += once(() => mpPairs(true))
      mp2s += once(() => mpPairs(false))
      mp3s += once(mp3Pairs _)
    }
    def fmt(xs: Seq[Double]) =
      f"min ${xs.min}%.2f med ${xs.sorted.apply(xs.size / 2)}%.2f " +
        xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"OLD ${fmt(olds.toSeq)}")
    println(s"NEW ${fmt(news.toSeq)}")
    println(s"RPT ${fmt(reps2.toSeq)}")
    println(s"MP1 ${fmt(mp1s.toSeq)} (checkpointed prune)")
    println(s"MP2 ${fmt(mp2s.toSeq)} (fully lazy single job)")
    println(s"MP3 ${fmt(mp3s.toSeq)} (basket-first single exchange)")
    spark.stop()
  }
}
