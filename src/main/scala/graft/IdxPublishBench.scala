package graft

import org.apache.spark.sql.functions._
import graft.operators.StandingIndex
import graft.tables.Tables

/** Standing-index publish-cost A/B (dev main, the [[BlocklistBench]]
  * family): on the live fixture, an index holding 90% of the corpus
  * receives the remaining 10% either as a FULL rebuild (the pre-r13
  * only option: re-derive everything from base ∪ delta) or as an
  * APPEND publish (r13: old member tables ∪ delta-derived frames —
  * the indexed 90% is never re-tokenized). Both paths commit a
  * complete next version with identical members; the measured gap is
  * exactly the corpus-side derivation the append path skips, which at
  * 100 TB is the entire publish cost. The r13 PLANS A/B record comes
  * from this run.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.IdxPublishBench"
  */
object IdxPublishBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    // "sweep" runs only the maxLevels economics sweep; default runs all
    val mode = args.headOption.getOrElse("all")
    val spark = Sessions.local("idx-bench", "32")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-idxb").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[idx] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    if (mode == "sweep") { maxLevelsSweep(spark, docs); spark.stop(); return }
    val base = docs.filter(col("doc_id") % 10 >= 1)   // 90%
    val delta = docs.filter(col("doc_id") % 10 === 0) // 10%
    val full = docs
    val db = "graft_idx_bench"

    // ---- match index
    t("match: initial build (90% corpus)") {
      StandingIndex.buildMatchIndex(spark, base, col("text"), col("doc_id"),
        minLen = 20, nBuckets = 32, db = db, name = "m")
    }
    t("match: FULL rebuild over base+delta") {
      StandingIndex.buildMatchIndex(spark, full, col("text"), col("doc_id"),
        minLen = 20, nBuckets = 32, db = db, name = "m_full")
    }
    t("match: APPEND publish of the 10% delta") {
      StandingIndex.appendMatchIndex(spark, delta, col("text"),
        col("doc_id"), db = db, name = "m")
    }

    // ---- chunk index
    t("chunk: initial build (90% corpus)") {
      StandingIndex.buildChunkIndex(spark, base, col("text"), col("doc_id"),
        chunkTokens = 8, nBuckets = 32, db = db, name = "c")
    }
    t("chunk: FULL rebuild over base+delta") {
      StandingIndex.buildChunkIndex(spark, full, col("text"), col("doc_id"),
        chunkTokens = 8, nBuckets = 32, db = db, name = "c_full")
    }
    t("chunk: APPEND publish of the 10% delta") {
      StandingIndex.appendChunkIndex(spark, delta, col("text"),
        col("doc_id"), db = db, name = "c")
    }

    // ---- near-dup index
    t("neardup: initial build (90% corpus)") {
      StandingIndex.buildNearDupIndex(spark, base, col("text"),
        col("doc_id"), n = 3, k = 8, bands = 4, nBuckets = 32, db = db,
        name = "n")
    }
    t("neardup: FULL rebuild over base+delta") {
      StandingIndex.buildNearDupIndex(spark, full, col("text"),
        col("doc_id"), n = 3, k = 8, bands = 4, nBuckets = 32, db = db,
        name = "n_full")
    }
    t("neardup: APPEND publish of the 10% delta") {
      StandingIndex.appendNearDupIndex(spark, delta, col("text"),
        col("doc_id"), db = db, name = "n")
    }

    // ---- r14 leveled economics: on a GROWN index, a same-sized later
    // append must cost what the first did (cost ∝ delta, not ∝ index).
    // Grow a chunk index through 4 equal deltas and time each publish;
    // pre-r14 (union + full-member rewrite) each step was slower than
    // the last because the rewritten member kept growing.
    println("[idx] --- leveled append-cost growth (chunk, 5 equal slices) ---")
    val slices = (0 to 4).map(i => docs.filter(col("doc_id") % 5 === i))
    t("chunk leveled: initial build (slice 0)") {
      StandingIndex.buildChunkIndex(spark, slices(0), col("text"),
        col("doc_id"), chunkTokens = 8, nBuckets = 32, db = db, name = "cg")
    }
    (1 to 4).foreach { i =>
      t(s"chunk leveled: append slice $i (index now ${i}x the delta)") {
        StandingIndex.appendChunkIndex(spark, slices(i), col("text"),
          col("doc_id"), db = db, name = "cg")
      }
    }
    // and the probe-side price of levels: same batch against the
    // 5-level index vs a monolithic rebuild of the same corpus
    t("chunk leveled: probe against 5 levels") {
      StandingIndex.probeChunks(spark, docs.limit(500), col("text"),
        col("doc_id"), db = db, name = "cg")
        .write.format("noop").mode("overwrite").save()
    }
    t("chunk monolithic: full rebuild (all 5 slices)") {
      StandingIndex.buildChunkIndex(spark, docs, col("text"),
        col("doc_id"), chunkTokens = 8, nBuckets = 32, db = db, name = "cg1")
    }
    t("chunk monolithic: probe against 1 level") {
      StandingIndex.probeChunks(spark, docs.limit(500), col("text"),
        col("doc_id"), db = db, name = "cg1")
        .write.format("noop").mode("overwrite").save()
    }
    maxLevelsSweep(spark, docs)
    spark.stop()
  }

  /** Compaction-trigger economics (round 15, the r14 verdict item):
    * grow a chunk index through 7 equal appends at each maxLevels in
    * {2, 4, 8}, timing every publish (compactions land inside their
    * triggering append) and the same 500-doc probe after each. The
    * curve trades amortized publish cost (low maxLevels compacts
    * often — cost ∝ index, paid 1/maxLevels of the time) against the
    * probe's per-level anti-join tax (the r14 note: 1.80 s at 5
    * levels vs 1.01 monolithic). The default is picked from THIS
    * table — see PLANS round 15.
    */
  private def maxLevelsSweep(spark: org.apache.spark.sql.SparkSession,
                             docs: org.apache.spark.sql.DataFrame): Unit = {
    def t2(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println("[idx] --- maxLevels economics sweep (chunk, 8 equal slices) ---")
    val db = "graft_idx_sweep"
    val s8 = (0 to 7).map(i => docs.filter(col("doc_id") % 8 === i))
    val probeBatch = docs.limit(500)
    for (ml <- Seq(2, 4, 8)) {
      val nm = s"sw$ml"
      val build = t2(StandingIndex.buildChunkIndex(spark, s8(0), col("text"),
        col("doc_id"), chunkTokens = 8, nBuckets = 32, db = db, name = nm))
      println(f"[idx] ml=$ml build(slice0): $build%.2f s")
      var appendTot = 0.0
      var probeTot = 0.0
      (1 to 7).foreach { i =>
        val a = t2(StandingIndex.appendChunkIndex(spark, s8(i), col("text"),
          col("doc_id"), db = db, name = nm, maxLevels = ml))
        val p = t2(StandingIndex.probeChunks(spark, probeBatch, col("text"),
          col("doc_id"), db = db, name = nm)
          .write.format("noop").mode("overwrite").save())
        appendTot += a; probeTot += p
        println(f"[idx] ml=$ml append$i: $a%.2f s  probe: $p%.2f s")
      }
      println(f"[idx] ml=$ml TOTAL appends(7): $appendTot%.2f s  " +
        f"probes(7): $probeTot%.2f s")
    }
    // The per-ml sequences above run in ONE fixed order, so the first
    // carries JVM warmup. The three FINAL indexes hold the same corpus
    // at 2/4/8 levels — interleaved re-probes give the clean
    // probe-cost-vs-level-count curve (MINs are the signal).
    val probeMin = scala.collection.mutable.Map
      .empty[Int, Double].withDefaultValue(Double.MaxValue)
    for (round <- 1 to 4; ml <- Seq(2, 4, 8)) {
      val p = t2(StandingIndex.probeChunks(spark, probeBatch, col("text"),
        col("doc_id"), db = db, name = s"sw$ml")
        .write.format("noop").mode("overwrite").save())
      probeMin(ml) = math.min(probeMin(ml), p)
      println(f"[idx] interleaved probe r$round ml=$ml: $p%.2f s")
    }
    Seq(2, 4, 8).foreach(ml =>
      println(f"[idx] PROBE-MIN ml=$ml: ${probeMin(ml)}%.2f s"))

    // Same curve for the NEAR-DUP family — the r14 read-tax note
    // (1.80 s at 5 levels vs 1.01 monolithic) was measured on ITS
    // per-level probes (bucket collision + Jaccard verify per level),
    // which do more per-level work than the chunk anti-join chain.
    println("[idx] --- neardup maxLevels sweep ---")
    for (ml <- Seq(2, 4, 8)) {
      val nm = s"nsw$ml"
      val build = t2(StandingIndex.buildNearDupIndex(spark, s8(0),
        col("text"), col("doc_id"), n = 3, k = 8, bands = 4,
        nBuckets = 32, db = db, name = nm))
      println(f"[idx] nd ml=$ml build(slice0): $build%.2f s")
      var appendTot = 0.0
      (1 to 7).foreach { i =>
        val a = t2(StandingIndex.appendNearDupIndex(spark, s8(i),
          col("text"), col("doc_id"), db = db, name = nm, maxLevels = ml))
        appendTot += a
        println(f"[idx] nd ml=$ml append$i: $a%.2f s")
      }
      println(f"[idx] nd ml=$ml TOTAL appends(7): $appendTot%.2f s")
    }
    val ndProbeMin = scala.collection.mutable.Map
      .empty[Int, Double].withDefaultValue(Double.MaxValue)
    for (round <- 1 to 4; ml <- Seq(2, 4, 8)) {
      val p = t2(StandingIndex.probeNearDups(spark, probeBatch,
        col("text"), col("doc_id"), db = db, name = s"nsw$ml")
        .write.format("noop").mode("overwrite").save())
      ndProbeMin(ml) = math.min(ndProbeMin(ml), p)
      println(f"[idx] nd interleaved probe r$round ml=$ml: $p%.2f s")
    }
    Seq(2, 4, 8).foreach(ml =>
      println(f"[idx] ND-PROBE-MIN ml=$ml: ${ndProbeMin(ml)}%.2f s"))
  }
}
