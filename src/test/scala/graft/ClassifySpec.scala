package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Behavioral laws for the learned-curation operators (the oracle gate
  * owns bit-parity; these pin the semantics the gate can't see).
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // doc_id % 5 == 0 is the held-out slice. Classes have disjoint
  // vocabularies so the expected prediction is unambiguous.
  private lazy val docs = Seq(
    (1L, "alpha beta gamma alpha", "aa"),
    (2L, "alpha beta beta gamma", "aa"),
    (6L, "delta epsilon zeta", "bb"),
    (7L, "delta delta epsilon zeta", "bb"),
    (0L, "alpha beta alpha", "aa"),     // held out, pure class-aa text
    (5L, "delta epsilon epsilon", "bb") // held out, pure class-bb text
  ).toDF("doc_id", "text", "lang")

  test("centroidClassifier: held-out docs with class-pure vocab predict their class") {
    val out = Classify.centroidClassifier(docs, col("text"), col("doc_id"),
      col("lang")).orderBy("doc_id").collect()
    assert(out.length == 2)
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("predicted"), r.getAs[Boolean]("hit"))).toMap
    assert(byId(0L) == (("aa", true)))
    assert(byId(5L) == (("bb", true)))
  }

  test("centroidClassifier: unseen-vocab doc falls back to smoothing-only scores with deterministic tie-break") {
    val d2 = docs.union(Seq((10L, "omega omega psi", "aa"))
      .toDF("doc_id", "text", "lang"))
    val out = Classify.centroidClassifier(d2, col("text"), col("doc_id"),
      col("lang")).filter(col("doc_id") === 10L).collect()
    assert(out.length == 1)
    // all tokens unseen -> score_c = T / (2*N_c + V); class-aa has
    // N=8 train tokens, class-bb has 7, so bb's smaller denominator
    // wins regardless of the doc's own text
    assert(out.head.getAs[String]("predicted") == "bb")
    val expected = 3.0 / (2 * 7 + 6)
    assert(math.abs(out.head.getAs[Double]("score") - expected) < 1e-15)
  }

  test("classifierReport: per-class counts reconcile with the scored frame") {
    val rep = Classify.classifierReport(docs, col("text"), col("doc_id"),
      col("lang")).collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == 2)
    rep.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_docs"))
    }
  }

  test("importanceWeights: target-resembling raw docs outweigh target-alien ones") {
    val d = Seq(
      (1L, "sun moon star sun moon", true),
      (2L, "sun star moon", true),
      (3L, "sun moon star", false),   // pure target vocabulary
      (4L, "rock sand mud", false),   // disjoint from target
      (5L, "sun moon rock", false)    // mixed
    ).toDF("doc_id", "text", "is_tgt")
    val w = Classify.importanceWeights(d, col("text"), col("doc_id"),
      col("is_tgt")).orderBy("doc_id").collect()
    assert(w.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L, 4L, 5L))
    val byId = w.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("weight")).toMap
    assert(byId(3L) > byId(5L) && byId(5L) > byId(4L))
    assert(byId(3L) > 0.0 && byId(4L) < 0.0)
  }

  test("importanceWeights: weight is exactly tgt_score - raw_score and scores are positive") {
    val d = Seq(
      (1L, "a b c", true),
      (2L, "a b d", false),
      (3L, "c d e", false)
    ).toDF("doc_id", "text", "is_tgt")
    Classify.importanceWeights(d, col("text"), col("doc_id"), col("is_tgt"))
      .collect().foreach { r =>
        val t = r.getAs[Double]("tgt_score")
        val raw = r.getAs[Double]("raw_score")
        assert(r.getAs[Double]("weight") == t - raw)
        assert(t > 0.0 && raw > 0.0)
      }
  }
}
