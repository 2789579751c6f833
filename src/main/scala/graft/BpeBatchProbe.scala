package graft

import org.apache.spark.sql.functions._

/** Dev probe (NOT part of the library): measures how much of the BPE
  * merge sequence on THIS corpus is batchable under the conservative
  * sound rule (r18 verdict item 3 feasibility check, run BEFORE
  * writing the real batched trainer):
  *
  * From one round's top-K pair list t(1..K) (sorted (c DESC, l, r)),
  * accept the maximal prefix t(1..m) such that for every j ≤ m:
  *   (a) non-interference: t(j).r != t(i).l and t(j).l != t(i).r for
  *       every accepted i < j — merging t(i) can only change counts of
  *       pairs of the forms (x, l_i) / (r_i, y), so t(j)'s count at
  *       its turn still equals the round-start count;
  *   (b) dominance: c(t(j)) strictly exceeds the count of every pair
  *       that could overtake it after the earlier merges — every NEW
  *       pair involving a merged symbol s_i is bounded by its source's
  *       old count (sources are exactly the interfering forms), so it
  *       suffices that c(t(j)) > c(q) for every potential source q
  *       below j in the list AND c(t(j)) > c(t(K)) (everything outside
  *       the list is ≤ c(t(K)); ties are refused because a renamed new
  *       pair could win the (l, r) tie-break unpredictably).
  *
  * The probe runs the EXACT sequential trainer (one merge per round,
  * semantics identical to Tokenizer.train) and per round reports the
  * hypothetical accepted-prefix length — the projected job-count
  * reduction if rounds were batched.
  *
  * Run: sbt "runMain graft.BpeBatchProbe [merges] [K]"
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val merges = if (args.length > 0) args(0).toInt else 32
    val k = if (args.length > 1) args(1).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bpe-batch-probe", Sessions.defaultCpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.tables.Tables.documents(spark, sfDir)

    val Sep = "\u0001"
    val enc = graft.operators.Tokenizer.wordCounts(docs, col("text")).select(
      concat(regexp_replace(col("word"), "(.)", Sep + Sep + "$1"),
        lit(Sep + Sep)).as("seq"), col("cnt"))
    var cur = enc.localCheckpoint(eager = true)
    val symsOf = filter(split(col("seq"), Sep + "+"), x => x =!= "")

    final case class P(l: String, r: String, c: Long)
    def acceptedPrefix(top: Seq[P], complete: Boolean): Int = {
      var m = 1
      var ok = true
      while (ok && m < top.size) {
        val t = top(m)
        val acc = top.take(m)
        val interferes = acc.exists(a => t.r == a.l || t.l == a.r)
        val sourcesBelow = top.drop(m + 1).filter(q =>
          acc.exists(a => q.r == a.l || q.l == a.r))
        val dominated = sourcesBelow.forall(q => t.c > q.c) &&
          (complete || t.c > top.last.c)
        if (interferes || !dominated) ok = false else m += 1
      }
      m
    }

    var jobs = 0
    var i = 1
    val lens = Seq.newBuilder[Int]
    while (i <= merges) {
      val pairs = cur.select(col("cnt"), symsOf.as("syms"))
        .select(col("cnt"), explode(when(size(col("syms")) > 1,
            transform(sequence(lit(1), size(col("syms")) - 1),
              x => struct(element_at(col("syms"), x).as("l"),
                element_at(col("syms"), x + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
      val top = pairs.orderBy(col("c").desc, col("l"), col("r"))
        .limit(k).collect()
        .map(r => P(r.getString(0), r.getString(1), r.getLong(2))).toSeq
      jobs += 1
      val m = math.min(acceptedPrefix(top, top.size < k), merges - i + 1)
      lens += m
      println(s"[bpe-batch] round $i top=${top.take(4).map(p =>
        s"${p.l}+${p.r}:${p.c}").mkString(", ")} ... acceptedPrefix=$m")
      // apply the accepted prefix sequentially (identical semantics)
      for (j <- 0 until m) {
        val t = top(j)
        cur = cur.select(
          replace(col("seq"), lit(Sep + t.l + Sep + Sep + t.r + Sep),
            lit(Sep + t.l + t.r + Sep)).as("seq"), col("cnt"))
      }
      i += m
      if (jobs % 4 == 0) cur = cur.localCheckpoint(eager = true)
    }
    val ls = lens.result()
    println(s"[bpe-batch] merges=$merges pairJobs=$jobs " +
      s"meanBatch=${merges.toDouble / jobs} lens=${ls.mkString(",")}")
    spark.stop()
  }
}
