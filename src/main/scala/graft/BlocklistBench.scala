package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the Aho–Corasick blocklist family at production
  * list sizes (the q183 fixture has 8 terms; real bad-word/URL lists
  * carry 10³–10⁴). Builds an n-term list from the corpus's own
  * vocabulary — the worst case for an automaton, since every term is
  * guaranteed to occur — and times `Blocklist.hits` and
  * `Blocklist.redact` over SPARK_GRAFT_SF_DIR with a noop-write
  * materialization (the Bench.scala protocol). One JSON line out.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain
  *   graft.BlocklistBench [nTerms] [runs]"
  */
object BlocklistBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nTerms = if (args.nonEmpty) args(0).toInt else 1000
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.defaultCpus)
    val spark = Sessions.local("graft-blocklist-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.tables.Tables.documents(spark, sfDir)
    // term list: the nTerms most frequent corpus words (every term
    // matches, maximizing output-edge work), round-robined over 4
    // categories; deterministic (count desc, word asc)
    val words = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(nTerms).collect().map(_.getString(0))
    val terms = words.zipWithIndex
      .map { case (w, i) => (w, s"cat${i % 4}") }.toSeq

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(f: => Unit): Double = {
      val ts = Seq.fill(runs)(time(f)).sorted; ts(ts.size / 2)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(docs)                                 // warm the scan cache
    val tHits = med(noop(graft.operators.Blocklist.hits(
      docs, col("text"), col("doc_id"), terms)))
    val tRedact = med(noop(graft.operators.Blocklist.redact(
      docs, col("text"), col("doc_id"), terms)))
    println(s"""{"metric":"blocklist_microbench","n_terms":$nTerms,""" +
      s""""runs":$runs,"hits_sec":$tHits,"redact_sec":$tRedact,""" +
      s""""sf_dir":"$sfDir"}""")
    spark.stop()
  }
}
