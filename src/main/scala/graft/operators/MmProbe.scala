package graft.operators

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.tables.Tables

/** q181 maximal-matches cost profile (dev main, the [[RsProbe]]
  * family): phase-times the operator on the live fixture and measures
  * the candidate-volume structure the r12 verdict asked about —
  * how many anchor-alignment candidates exist per emitted match
  * (each candidate pays the token-array attach join + a
  * [[graft.expressions.SpanMatchLen]] invocation, but only the
  * leftmost survives the head check), and what fraction of candidate
  * rows a diagonal run-start pre-filter would eliminate before the
  * array joins. The r13 PLANS A/B record comes from this run.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.MmProbe"
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = Sessions.local("mm-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mm] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    docs.select(count(lit(1))).collect() // warm the scan
    val minLen = 20

    // phase structure (each phase includes its upstream — deltas are
    // the per-phase cost)
    val toks = docs.select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= minLen)
    t("phase toks count") {
      println("[mm]   n_docs = " + toks.count())
    }
    val anchors = Dedup.anchorGrams(toks, minLen)
    t("phase anchors count") {
      println("[mm]   n_anchors = " + anchors.count())
    }
    val cand = anchors.as("a")
      .join(anchors.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.pos").as("pos_a"),
        col("b.doc_id").as("doc_b"), col("b.pos").as("pos_b"))
    t("phase candidates count") {
      println("[mm]   n_cand = " + cand.count())
    }
    // candidate multiplicity: candidates per diagonal run (a run of
    // consecutive positions on one (doc_a, doc_b, pos_a-pos_b)
    // diagonal = the candidate set of ONE match)
    t("diagonal run structure") {
      val runs = cand
        .withColumn("diag", col("pos_a") - col("pos_b"))
        .groupBy("doc_a", "doc_b", "diag")
        .agg(count(lit(1)).as("n"), min("pos_a").as("lo"), max("pos_a").as("hi"))
      val s = runs.agg(count(lit(1)).as("n_diags"), sum("n").as("n_cand"),
        max("n").as("max_per_diag")).collect()(0)
      println(s"[mm]   n_diags = ${s.getLong(0)}  cand = ${s.getLong(1)}  max/diag = ${s.getLong(2)}")
    }
    for (run <- 1 to 2) t(s"full maximalMatchPairs run$run") {
      val n = Dedup.maximalMatchPairs(docs, col("text"), col("doc_id"),
        minLen = minLen).count()
      println("[mm]   n_matches = " + n)
    }
    // operator-internal stage replica (WITH the hot-anchor machinery,
    // unlike the bare-join phases above) to localize the cost
    val sizes = anchors.groupBy("gh").agg(count(lit(1)).as("__asz"))
    val sub = anchors.join(sizes, "gh")
      .withColumn("__sub", pmod(xxhash64(col("doc_id")),
        call_function("div", col("__asz") + lit((1L << 20) - 1),
          lit(1L << 20))))
      .select(col("gh"), col("doc_id"), col("pos"), col("__sub"))
    val candSub = sub.as("a")
      .join(sub.as("b"),
        col("a.gh") === col("b.gh") && col("a.__sub") === col("b.__sub")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.pos").as("pos_a"),
        col("b.doc_id").as("doc_b"), col("b.pos").as("pos_b"))
    t("stage cand-with-sub count") {
      println("[mm]   n_cand_sub = " + candSub.count())
    }
    val runsF = candSub
      .groupBy(col("doc_a"), col("doc_b"),
        (col("pos_a") - col("pos_b")).as("__diag"))
      .agg(min("pos_a").as("__lo_a"), min("pos_b").as("__lo_b"),
        (max("pos_a") - min("pos_a") + lit(minLen)).as("__span"))
    t("stage diagonal runs count") {
      println("[mm]   n_runs = " + runsF.count())
    }
    spark.stop()
  }
}
