package graft
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.tables.Tables
object IvfadcProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("ivfadc-probe", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val exact = Similarity.bruteForceTopKL2(emb, 8, 5, queryFrom = 16)
    for (it <- Seq(2, 4); np <- Seq(1, 2, 4); nc <- Seq(8, 16)) {
      val r = Similarity.recallAtK(
        Similarity.ivfadcTopK(emb, nCells = nc, m = 4, ksub = 16,
          nQueries = 8, k = 5, nprobe = np, iters = it), 
        Similarity.bruteForceTopKL2(emb, 8, 5, queryFrom = nc))
        .agg(avg("recall")).head().getDouble(0)
      println(f"[ivfadc] nCells=$nc%2d iters=$it nprobe=$np%2d mean recall = $r%.3f")
    }
    spark.stop()
  }
}
