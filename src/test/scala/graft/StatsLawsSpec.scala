package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{GraphOps, Profiling}

/** Algebraic laws of the round-6 exact-rational statistics operators,
  * checked over randomized inputs (plain scalacheck Gen sampling, the
  * MaintenanceLawsSpec discipline): the invariants that make these
  * operators trustworthy at any partitioning — exact integer cores
  * must be bit-stable under repartition, and the closed-form bounds
  * (kappa ≤ 1, encoding between raw rate and prior) must hold on
  * every input, not just the textbook fixtures.
  */
class StatsLawsSpec extends SparkSpec {

  import spark.implicits._

  test("systematicSample: census law |sample| == k and driver-replay equality (property)") {
    import graft.operators.Sampling
    // weights 1..6 over 60 rows with k = 7: W >= 60 so W/k > 6 >= every
    // w — the boundary census is exactly k on EVERY draw, and the
    // selected set must equal the driver's replay of the md5 weight
    // line (the operator's two-phase cumsum == one global line)
    val gen = Gen.listOfN(60, Gen.choose(1L, 6L))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md5.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    for ((ws, it) <- samples(gen, 6).zipWithIndex) {
      val rows = ws.zipWithIndex.map { case (w, j) =>
        (it * 1000L + j + 1, w) }
      val got = Sampling.systematicSample(
          rows.toDF("id0", "w0"), col("id0"), col("w0"), k = 7)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum")))
        .sortBy(_._1).toSeq
      val W = ws.sum
      var cum = 0L
      val want = rows.map { case (id, w) => (hex(id.toString), id, w) }
        .sorted.flatMap { case (_, id, w) =>
          val before = cum; cum += w
          if (before * 7 / W < cum * 7 / W) Some((id, cum)) else None
        }.sortBy(_._1)
      assert(got.length === 7, s"draw $it")
      assert(got === want, s"draw $it")
    }
  }

  private val labelledGen: Gen[List[(String, Int)]] =
    Gen.listOfN(20, Gen.zip(Gen.oneOf("p", "q", "r"), Gen.oneOf(0, 1)))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("targetEncoding: m=0 is the raw rate; m>0 stays between raw and prior (property)") {
    for (rows <- samples(labelledGen, 6)) {
      val df = rows.toDF("c0", "y0")
      val n = rows.size.toDouble
      val p = rows.count(_._2 == 1).toDouble
      val raw = rows.groupBy(_._1).map { case (c, xs) =>
        c -> xs.count(_._2 == 1).toDouble / xs.size }
      val m0 = Profiling.targetEncoding(df, col("c0"), col("y0"), 0L)
        .collect().map(r => r.getAs[String]("cat") -> r.getAs[Double]("enc"))
        .toMap
      raw.foreach { case (c, v) => assert(math.abs(m0(c) - v) < 1e-12) }
      val m7 = Profiling.targetEncoding(df, col("c0"), col("y0"), 7L)
        .collect().map(r => r.getAs[String]("cat") -> r.getAs[Double]("enc"))
        .toMap
      val prior = p / n
      raw.foreach { case (c, v) =>
        val lo = math.min(v, prior) - 1e-12
        val hi = math.max(v, prior) + 1e-12
        assert(m7(c) >= lo && m7(c) <= hi,
          s"enc ${m7(c)} outside [$lo, $hi] for cat $c")
      }
    }
  }

  test("cohensKappa: bounded above by 1; identical raters score exactly 1 (property)") {
    for (rows <- samples(labelledGen, 6)) {
      val df = rows.map { case (c, y) => (c, if (y == 1) "yes" else "no") }
        .toDF("ra", "rb")
      val k = Profiling.cohensKappa(df, col("ra"), col("rb"))
        .collect()(0).getAs[Double]("kappa")
      assert(k.isNaN || k <= 1.0 + 1e-12, s"kappa $k > 1")
      // rater agreement with itself is exact 1 when >= 2 categories
      if (rows.map(_._1).distinct.size >= 2) {
        val same = Profiling.cohensKappa(df, col("ra"), col("ra"))
          .collect()(0).getAs[Double]("kappa")
        assert(same === 1.0)
      }
    }
  }

  test("exact integer cores are partitioning-invariant (property)") {
    // the portability claim behind the oracle gate: rows arriving in
    // any order / any partition count must give bit-identical output
    for (rows <- samples(labelledGen, 3)) {
      val df = rows.toDF("c0", "y0")
      def enc(d: org.apache.spark.sql.DataFrame) =
        Profiling.targetEncoding(d, col("c0"), col("y0"), 3L)
          .collect().map(r => (r.getAs[String]("cat"), r.getAs[Long]("cnt"),
            r.getAs[Long]("pos"), r.getAs[Double]("enc"))).sortBy(_._1).toSeq
      assert(enc(df.repartition(7)) === enc(df.coalesce(1)))
      def kap(d: org.apache.spark.sql.DataFrame) =
        Profiling.cohensKappa(d, col("c0"),
            when(col("y0") === 1, lit("p")).otherwise(lit("q")))
          .collect()(0).toSeq
      assert(kap(df.repartition(5)) === kap(df.coalesce(1)))
    }
  }

  test("hits: invariant under parallel-edge duplication and repartition") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 2L))
    val nodes = (0L to 3L).toDF("node")
    def run(e: Seq[(Long, Long)], parts: Int) =
      GraphOps.hits(e.toDF("src", "dst").repartition(parts), nodes, iters = 3)
        .collect().map(r => (r.getAs[Long]("node"),
          r.getAs[Long]("auth_scaled"), r.getAs[Long]("hub_scaled")))
        .sortBy(_._1).toSeq
    val base = run(edges, 1)
    assert(run(edges ++ edges ++ edges.take(2), 6) === base)
  }

  test("interleavedOrder: proportional spread law + partition invariance") {
    import graft.operators.Curate
    // source "big" has 4 docs, "small" has 2: positions must land at
    // 0, .25, .5, .75 and 0, .5 of the 1e9 line — any prefix of the
    // interleaved order then holds each source at its corpus
    // proportion (the training-mixture law), independent of ids.
    val df = Seq(("big", 1L), ("big", 2L), ("big", 3L), ("big", 4L),
      ("small", 5L), ("small", 6L)).toDF("src", "id")
    val r = Curate.interleavedOrder(df, col("src"), col("id"), take = 6)
      .collect().map(x => (x.getAs[String]("source"), x.getAs[Long]("r"),
        x.getAs[Long]("pos_key")))
    // census: every row appears exactly once, ranks 1..cnt per source
    assert(r.length === 6)
    assert(r.filter(_._1 == "big").map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    assert(r.filter(_._1 == "small").map(_._2).sorted.toSeq === Seq(1L, 2L))
    // spread: pos_keys are exactly the integer-division lattice
    assert(r.filter(_._1 == "big").map(_._3).sorted.toSeq ===
      Seq(0L, 250000000L, 500000000L, 750000000L))
    assert(r.filter(_._1 == "small").map(_._3).sorted.toSeq ===
      Seq(0L, 500000000L))
    // the first 3 rows of the order already contain both sources
    assert(r.take(3).map(_._1).toSet === Set("big", "small"))
    // output is an ORDER: pos_key non-decreasing
    assert(r.map(_._3).toSeq === r.map(_._3).sorted.toSeq)
    val again = Curate.interleavedOrder(df.repartition(7), col("src"),
        col("id"), take = 6)
      .collect().map(x => (x.getAs[String]("source"), x.getAs[Long]("r"),
        x.getAs[Long]("pos_key")))
    assert(again.toSeq === r.toSeq)
  }
}
