package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions
import graft.operators.Layout

/** Z-order clustering and compaction: expression semantics, the pruning
  * property (the REASON z-order exists), and content preservation.
  */
class LayoutSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-layout-$name").toString + "/d"

  test("z_value interleaves bucket bits round-robin") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // n=2: child0 bits land at even z-positions, child1 at odd.
    // (3, 1) = (0b11, 0b01) -> z 0b0111 = 7; (0, 0) -> 0; (2, 3) =
    // (0b10, 0b11) -> bit0:c1 -> 2, bit1:c0 -> 4, bit1:c1 -> 8 = 14
    val rows = Seq((3, 1), (0, 0), (2, 3)).toDF("a", "b")
      .selectExpr("z_value(2, a, b) AS z").as[Long].collect().toSeq
    assert(rows === Seq(7L, 0L, 14L))
    // null id -> null z
    val n = Seq((Some(1), Option.empty[Int])).toDF("a", "b")
      .selectExpr("z_value(2, a, b) AS z").collect()(0)
    assert(n.isNullAt(0))
    // z-curve locality: close in both dims -> close z; the interleave of
    // (id, id) is monotone in id
    val mono = Seq(0, 1, 2, 3, 7).map(i =>
      Seq((i, i)).toDF("a", "b").selectExpr("z_value(3, a, b)")
        .as[Long].head())
    assert(mono === mono.sorted)
  }

  test("search_sorted returns the quantile bucket of a value") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val cuts = "array(10.0d, 20.0d, 30.0d)"
    val got = Seq(5.0, 10.0, 19.9, 25.0, 30.0, 99.0).toDF("v")
      .selectExpr(s"search_sorted(v, $cuts) AS b").as[Int].collect().toSeq
    assert(got === Seq(0, 1, 1, 2, 3, 3))
    val nul = Seq(Option.empty[Double]).toDF("v")
      .selectExpr(s"search_sorted(v, $cuts) AS b").collect()(0)
    assert(nul.isNullAt(0))
  }

  /** Rows the parquet reader actually surfaced (after row-group/page
    * pruning by footer stats), i.e. the scan's numOutputRows — the
    * quantity z-ordering exists to shrink.
    */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = finalPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-order clustering prunes scans on BOTH clustered dimensions") {
    import spark.implicits._
    // two independent uniform dimensions; 7919 is coprime to 500 so b is
    // a full-period permutation — no accidental correlation with a
    val data = spark.range(200000).select(
      col("id"),
      (col("id") % 500).as("a"),
      ((col("id") * 7919) % 500).as("b"))
    val shuffled = tmp("shuffled")
    val zordered = tmp("zordered")
    // worst case layout: round-robin repartition scatters every (a, b)
    // range across every file
    data.repartition(16).write.mode("overwrite").parquet(shuffled)
    Layout.zorderWrite(data, Seq("a", "b"), zordered, files = 16, bins = 64)

    // same content
    val total = spark.read.parquet(zordered).count()
    assert(total === 200000L)
    assert(spark.read.parquet(zordered).agg(sum("id")).as[Long].head() ===
      spark.read.parquet(shuffled).agg(sum("id")).as[Long].head())

    for (dim <- Seq("a", "b")) {
      val pred = col(dim) === 7
      val full = scannedRows(spark.read.parquet(shuffled).filter(pred))
      val z = scannedRows(spark.read.parquet(zordered).filter(pred))
      // the shuffled copy surfaces ~every row (stats are useless); the
      // z-ordered copy must skip the large majority of row groups on
      // EITHER dimension — 4x is a loose floor, measured is ~10-100x
      assert(z * 4 <= full,
        s"dim $dim: z-ordered scan surfaced $z rows vs $full shuffled " +
          "— clustering is not pruning")
    }
  }

  test("z-order keeps null rows and refuses non-numeric columns") {
    import spark.implicits._
    val out = tmp("nulls")
    // every 7th row has a NULL z-column — clustering must move it, not
    // lose it (null z-values sort into the first range partition)
    val data = spark.range(5000).select(
      col("id"),
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id") % 50).as("a"),
      (col("id") % 13).as("b"))
    Layout.zorderWrite(data, Seq("a", "b"), out, files = 4, bins = 16)
    val back = spark.read.parquet(out)
    assert(back.count() === 5000L)
    assert(back.filter(col("a").isNull).count() === math.ceil(5000.0 / 7).toLong)
    assert(back.agg(sum("id")).as[Long].head() ===
      data.agg(sum("id")).as[Long].head())
    // a string z-column is refused (it would silently cast to null)
    val strs = spark.range(10).select(col("id"), col("id").cast("string").as("s"))
    val e = intercept[IllegalArgumentException] {
      Layout.zorderFrame(strs, Seq("id", "s"), files = 2)
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("compact refuses hive-partitioned input instead of flattening it") {
    import spark.implicits._
    val part = tmp("part")
    spark.range(100).select(col("id"), (col("id") % 3).as("p"))
      .write.partitionBy("p").parquet(part)
    val e = intercept[IllegalArgumentException] {
      Layout.compact(spark, part, tmp("part-out"))
    }
    assert(e.getMessage.contains("partition"))
  }

  test("compact bin-packs small files shuffle-free and preserves content") {
    import spark.implicits._
    val frag = tmp("frag")
    val out = tmp("compacted")
    val src = spark.range(10000).select(col("id"), md5(col("id").cast("string")).as("h"))
    src.repartition(50).write.mode("overwrite").parquet(frag)
    assert(new java.io.File(frag).listFiles().count(_.getName.endsWith(".parquet")) === 50)

    val stats = Layout.compact(spark, frag, out, targetBytes = 128L << 20)
    assert(stats.filesBefore === 50)
    assert(stats.filesAfter < 10,
      s"50 tiny files should compact to a handful, got ${stats.filesAfter}")
    // content identical (order-independent hash)
    def fingerprint(p: String): Row =
      spark.read.parquet(p)
        .agg(count(lit(1)), sum(col("id")), sum(crc32(col("h")))).head()
    assert(fingerprint(out) === fingerprint(frag))
    // in-place compaction is refused
    intercept[IllegalArgumentException] {
      Layout.compact(spark, frag, frag)
    }
  }
  private type Row = org.apache.spark.sql.Row
}
