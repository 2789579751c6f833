package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Tokenizer

/** BPE tokenizer training — hand-computed merge sequences (including
  * the adjacent-repeat greedy case the doubled-separator replace must
  * get right), partitioning invariance, the mass-conservation law, and
  * both loud failure gates.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  // words: aaa ×2, ab ×3, b ×1
  private def corpus: DataFrame =
    Seq("aaa aaa ab", "ab ab b").toDF("text")

  test("bpeTrain replays hand-computed greedy merges (adjacent repeats)") {
    // r1: (a,a) weighted 4 (two per "aaa" occurrence) beats (a,b) 3;
    //     greedy left-to-right merges "aaa" to [aa, a], NOT [a, aa].
    // r2: (a,b) 3 beats (aa,a) 2.  r3: (aa,a) 2 is all that remains.
    val got = Tokenizer.bpeTrain(corpus, col("text"), merges = 3)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq((1, "a", "a", 4L), (2, "a", "b", 3L),
      (3, "aa", "a", 2L)))
  }

  test("bpeTokenFrequencies: encoded corpus + character-mass conservation") {
    val toks = Tokenizer.bpeTokenFrequencies(corpus, col("text"), merges = 3)
      .orderBy("tok").as[(String, Long)].collect().toSeq
    assert(toks === Seq(("aaa", 2L), ("ab", 3L), ("b", 1L)))
    // Σ freq·len(tok) == total [a-z] characters, at EVERY merge depth.
    val totalChars = corpus
      .select(sum(length(regexp_replace(lower(col("text")), "[^a-z]", ""))))
      .as[Long].first()
    for (m <- 1 to 3) {
      val mass = Tokenizer.bpeTokenFrequencies(corpus, col("text"), m)
        .select(sum(col("freq") * length(col("tok")))).as[Long].first()
      assert(mass === totalChars, s"mass not conserved at merges=$m")
    }
  }

  test("merge table is invariant under input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Tokenizer.bpeTrain(docs, col("text"), merges = 5)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val b = Tokenizer.bpeTrain(docs.repartition(7), col("text"), merges = 5)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(a === b)
    assert(a.size === 5)
  }

  test("maxWords gate fails loudly on an unbounded word domain") {
    val e = intercept[IllegalArgumentException] {
      Tokenizer.bpeTrain(corpus, col("text"), merges = 1, maxWords = 2L)
    }
    assert(e.getMessage.contains("maxWords"))
    assert(e.getMessage.contains("Pre-filter"))
  }

  test("merge-depth exhaustion fails loudly, not silently short") {
    val e = intercept[IllegalArgumentException] {
      Tokenizer.bpeTrain(corpus, col("text"), merges = 4)
    }
    assert(e.getMessage.contains("fully merged after 3 rounds"))
  }

  test("bpeFertility: hand-computed histogram + token-count conservation") {
    // after 3 merges the vocab is fully fused: aaa→[aaa], ab→[ab],
    // b→[b] — every word costs exactly 1 token
    val full = Tokenizer.bpeFertility(corpus, col("text"), merges = 3)
      .orderBy("tokens_per_word").as[(Int, Long, Long)].collect().toSeq
    assert(full === Seq((1, 3L, 6L))) // 3 distinct words, 6 occurrences
    // after 1 merge (a,a): aaa→[aa,a] (2 toks), ab→[a,b] (2), b→[b] (1)
    val m1 = Tokenizer.bpeFertility(corpus, col("text"), merges = 1)
      .orderBy("tokens_per_word").as[(Int, Long, Long)].collect().toSeq
    assert(m1 === Seq((1, 1L, 1L), (2, 2L, 5L)))
    // Σ tpw·n_occurrences == Σ freq from bpeTokenFrequencies — the
    // two views count the same encoded corpus
    for (m <- 1 to 3) {
      val viaFert = Tokenizer.bpeFertility(corpus, col("text"), m)
        .select(sum(col("tokens_per_word") * col("n_occurrences")))
        .as[Long].first()
      val viaFreq = Tokenizer.bpeTokenFrequencies(corpus, col("text"), m)
        .select(sum("freq")).as[Long].first()
      assert(viaFert === viaFreq, s"token count mismatch at merges=$m")
    }
  }

  test("checkpoint cadence never changes the merge table (lineage law)") {
    // merges=12 crosses the CheckpointEvery=8 boundary, so the default
    // path exercises the mid-loop truncation; cadence 0 (never), 3
    // (multiple truncations), and the default must agree row-for-row.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(cadence: Int) =
      Tokenizer.bpeTrainWithCadence(docs, col("text"), merges = 12,
          checkpointEvery = cadence)
        .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val never = run(0)
    val three = run(3)
    val deflt = Tokenizer.bpeTrain(docs, col("text"), merges = 12)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(never.size === 12)
    assert(never === three)
    assert(never === deflt)
  }

  test("bpeTokensPerDoc conserves corpus token and word totals") {
    // pricing the corpus per doc must agree with the corpus-level
    // views: Σ n_tokens == Σ bpeTokenFrequencies freq, and
    // Σ n_words == the raw [a-z]+ word occurrence count
    val docs = Seq((1L, "aaa aaa ab"), (2L, "ab ab b"))
      .toDF("doc_id", "text")
    for (m <- Seq(1, 3)) {
      val per = Tokenizer.bpeTokensPerDoc(docs, col("text"), col("doc_id"),
        merges = m)
      val viaDoc = per.select(sum("n_tokens")).as[Long].first()
      val viaFreq = Tokenizer.bpeTokenFrequencies(corpus, col("text"), m)
        .select(sum("freq")).as[Long].first()
      assert(viaDoc === viaFreq, s"token totals diverge at merges=$m")
      val words = per.select(sum("n_words")).as[Long].first()
      val raw = Tokenizer.wordCounts(corpus, col("text"))
        .select(sum("cnt")).as[Long].first()
      assert(words === raw, s"word totals diverge at merges=$m")
    }
  }
}
