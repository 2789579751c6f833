package graft
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, StandingIndex}
import graft.tables.Tables

/** IVFADC parameter grid + standing-index probe economics (dev main,
  * the [[graft.operators.MmProbe]] family). Two modes:
  *   - default: the q204/q205 recall grid on sf0.01 (the r13 PLANS
  *     honest-record sweep);
  *   - SPARK_GRAFT_SF_DIR set: the standing-ANN A/B — inline
  *     ivfadcTopK (train + encode + search every call) vs
  *     StandingIndex.probeAnn over a prebuilt index (search only),
  *     the q206 economics measurement.
  */
object IvfadcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.get("SPARK_GRAFT_SF_DIR")
    val spark = Sessions.local("ivfadc-probe",
      if (sfDir.isDefined) "32" else "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfadc] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    sfDir match {
      case Some(d) =>
        val emb = Tables.embeddings(spark, d)
        emb.select(count(lit(1))).collect()
        val q = emb.filter(col("vec_id") >= 16 && col("vec_id") < 24)
        for (run <- 1 to 2) t(s"inline ivfadcTopK run$run") {
          println("[ivfadc]   rows = " + Similarity.ivfadcTopK(emb,
            nCells = 16, m = 4, ksub = 16, nQueries = 8, k = 5,
            nprobe = 2, iters = 4).count())
        }
        t("buildAnnIndex (once per publish)") {
          StandingIndex.buildAnnIndex(spark, emb, nCells = 16, m = 4,
            ksub = 16, corpusFrom = 24, iters = 4, nBuckets = 16,
            name = "probe_ann")
        }
        for (run <- 1 to 2) t(s"probeAnn run$run") {
          println("[ivfadc]   rows = " + StandingIndex.probeAnn(spark, q,
            k = 5, nprobe = 2, name = "probe_ann").count())
        }
      case None =>
        val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
        for (it <- Seq(2, 4); np <- Seq(1, 2, 4); nc <- Seq(8, 16)) {
          val r = Similarity.recallAtK(
            Similarity.ivfadcTopK(emb, nCells = nc, m = 4, ksub = 16,
              nQueries = 8, k = 5, nprobe = np, iters = it),
            Similarity.bruteForceTopKL2(emb, 8, 5, queryFrom = nc))
            .agg(avg("recall")).head().getDouble(0)
          // the IVF pruning ceiling at the same budget, and the exact
          // re-rank's recall against it (r14: the refine stage can
          // reach the ceiling but never exceed it)
          val ceil = Similarity.ivfCellRecall(emb, nCells = nc,
            nQueries = 8, k = 5, nprobe = np, iters = it)
            .agg(avg("cell_recall")).head().getDouble(0)
          val rr = Similarity.recallAtK(
            Similarity.ivfadcRefineTopK(emb, nCells = nc, m = 4, ksub = 16,
              nQueries = 8, k = 5, nprobe = np, iters = it, rerank = sys.env.getOrElse("RR","20").toInt),
            Similarity.bruteForceTopKL2(emb, 8, 5, queryFrom = nc))
            .agg(avg("recall")).head().getDouble(0)
          println(f"[ivfadc] nCells=$nc%2d iters=$it nprobe=$np%2d " +
            f"recall = $r%.3f refine@rr = $rr%.3f ceiling = $ceil%.3f")
        }
    }
    spark.stop()
  }
}
