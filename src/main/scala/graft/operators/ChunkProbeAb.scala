package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Standing chunk-probe join-shape A/B (dev main, verdict-r13 item 8):
  * the probe's batch-vs-corpus digest anti-join is the 100 TB hot
  * path. Three kernels over the same built index's digest member,
  * isolating the join shape from the shared chunk/reassembly tail:
  *
  *   A. shipped: batch digests left-anti SMJ against the bucketed
  *      member (corpus streams from its buckets, batch side shuffles);
  *   B. bloom prefilter: a bloom_filter_agg over the batch digests
  *      broadcasts and filters the corpus member MAP-SIDE before the
  *      anti-join — the scan still reads every fp but rows that
  *      cannot match die before the merge (false positives just pass
  *      through to the exact join, so output is identical);
  *   C. broadcast-semi prefilter: the distinct batch digests broadcast
  *      and semi-join the corpus member map-side (exact), the tiny
  *      survivor set then anti-joins without touching the buckets'
  *      sort order.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.operators.ChunkProbeAb [reps]"
  */
object ChunkProbeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = graft.Sessions.local("chunk-probe-ab", "32")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-cpab").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    StandingIndex.buildChunkIndex(spark, corpus, col("text"), col("doc_id"),
      chunkTokens = 8, nBuckets = 32, db = "graft_cp_ab", name = "c")
    val m = StandingIndex.manifest(spark, "graft_cp_ab", "c").get
    val fps = spark.table(s"graft_cp_ab.c__v${m.getAs[Int]("version")}__fps")

    def batchFps: DataFrame =
      TextAnalysis.chunkedCore(batch, col("text"), col("doc_id"),
          chunkTokens = 8, overlap = 0)
        .select(col("doc_id"), col("chunk_id"),
          md5(col("chunk_text")).as("fp"))

    def kernelA(): Long =
      batchFps.join(fps, Seq("fp"), "left_anti").count()

    def kernelB(): Long = {
      // dev-probe bloom: stat.bloomFilter builds on the driver and the
      // broadcast UDF filters the corpus map-side (a production form
      // would use the internal BloomFilterAggregate expression; the
      // measured cost profile is the same: one batch pass + one
      // map-side corpus filter + the tiny exact anti-join)
      val bf = batchFps.stat.bloomFilter("fp", 100000L, 0.01)
      val bcast = spark.sparkContext.broadcast(bf)
      val mc = udf((s: String) => bcast.value.mightContainString(s))
      val pruned = fps.filter(mc(col("fp"))).select("fp")
      batchFps.join(pruned, Seq("fp"), "left_anti").count()
    }

    def kernelC(): Long = {
      val pruned = fps.join(
        broadcast(batchFps.select("fp").distinct()), Seq("fp"), "left_semi")
      batchFps.join(pruned, Seq("fp"), "left_anti").count()
    }

    def t(name: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[cpab] $name: min ${ts.map(_._1).min}%.2f " +
        ts.map(x => f"${x._1}%.2f").mkString("[", ",", "]") +
        s" rows=${ts.head._2}")
    }
    // interleaved (the r13 box protocol): warm all, then alternate
    kernelA(); kernelB(); kernelC()
    for (_ <- 1 to 1) {
      t("A shipped bucketed anti-join")(kernelA())
      t("B bloom map-side prefilter  ")(kernelB())
      t("C broadcast-semi prefilter  ")(kernelC())
      t("A shipped (again)           ")(kernelA())
      t("B bloom (again)             ")(kernelB())
      t("C semi (again)              ")(kernelC())
    }
    spark.stop()
  }
}
