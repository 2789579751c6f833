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
    spark.stop()
  }
}
