package graft

import org.apache.spark.sql.functions._
import graft.operators.Tokenizer

/** BPE lineage-cadence A/B (dev main, the [[GateProbe]]/[[Explain]]
  * family): measures [[graft.operators.Tokenizer.bpeTrain]]'s
  * checkpoint-every-8 lineage truncation against the unbounded-lineage
  * variant at merge depths past the default cadence — the r09 verdict
  * item 7 evidence (each round's pair-count job replays ALL k prior
  * replaces over the checkpointed base, so total replay is quadratic
  * in merge depth without truncation).
  *
  * Two corpora:
  *   1. the sf0.01 documents fixture (~30 distinct words — shows the
  *      small-vocab regime where the truncation is near-free either
  *      way);
  *   2. a synthetic wide-vocab corpus (dev measurement only, not a
  *      graded query): 200k distinct 7-letter words with a skewed
  *      count profile — the realistic ~10⁵–10⁶-distinct-word regime
  *      where per-round replay cost is visible.
  *
  * Run: sbt "runMain graft.BpeAb [merges]"   (default 32)
  */
object BpeAb {
  def main(args: Array[String]): Unit = {
    val merges = if (args.nonEmpty) args(0).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.defaultCpus)
    val spark = Sessions.local("graft-bpe-ab", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String, cadence: Int,
             docs: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = Tokenizer.bpeTrainWithCadence(docs, col("text"), merges,
        checkpointEvery = cadence, maxWords = 1L << 21).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-ab] $label cadence=$cadence merges=$merges " +
        f"rows=$n%d time=$t%.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    val fixture = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")

    // 200k distinct words, 7 lowercase letters each, zipf-ish counts via
    // repetition (word i appears 1 + (200000/(i+1)) times, capped):
    // base-26 digits of the id give the letters.
    val letters = array(('a' to 'z').map(c => lit(c.toString)): _*)
    var word = lit("")
    for (j <- 0 until 7)
      word = concat(word,
        element_at(letters,
          (pmod(floor(col("id") / math.pow(26, j).toLong), lit(26)) + 1)
            .cast("int")))
    val synthetic = spark.range(200000)
      .select(col("id"), word.as("w"))
      .select(concat_ws(" ",
        array_repeat(col("w"),
          (lit(1) + least(lit(50), floor(lit(200000) / (col("id") + 1))))
            .cast("int"))).as("text"))

    for ((label, docs) <- Seq("fixture-sf0.01" -> fixture,
                              "synthetic-200k" -> synthetic);
         cadence <- Seq(0, 8)) {
      // warmup pass at tiny depth so codegen/JIT is out of the measure
      Tokenizer.bpeTrainWithCadence(docs, col("text"), 1,
        checkpointEvery = cadence, maxWords = 1L << 21).count()
      time(label, cadence, docs)
    }
    spark.stop()
  }
}
