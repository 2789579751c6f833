package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** Physical data layout operators: multi-dimensional clustering
  * (Z-order) and small-file compaction. Neither changes table CONTENT —
  * both reorganize bytes on disk so later scans read less — which is
  * why their oracle queries compare against the UNTOUCHED source table.
  */
object Layout {

  /** Write `df` clustered on `zcols` (2-4 columns) by Z-value:
    *
    *   1. per column, `bins` quantile cut points via `approxQuantile`
    *      (one pass, driver result bounded at `bins` doubles per column
    *      by construction — the IVF-centroid collect class);
    *   2. per row, quantile-bucket ids via the codegen'd binary-search
    *      expression `search_sorted`, interleaved into one Morton code
    *      by `z_value`;
    *   3. `repartitionByRange` on the z-value (range partitioner
    *      samples → balanced output files even when buckets are
    *      skewed), sort WITHIN partitions, drop the helper column,
    *      write parquet.
    *
    * Every output file then covers a narrow range of z-values = a small
    * hyper-rectangle in bucket space, so parquet footer min/max stats
    * prune files and row groups for predicates on ANY clustered column
    * — the property a single-column ORDER BY only gives its leading
    * column. LayoutSpec proves the pruning machine-checkably (scan
    * numOutputRows on a z-ordered copy vs a row-shuffled copy).
    *
    * Quantile bucketing (not min/max linear scaling) keeps locality
    * under skew: each bucket holds ~1/bins of the DATA, not of the
    * value range. NULLs in a z-column produce a NULL z-value and sort
    * into the first range partition — present, never dropped.
    *
    * Scale: one approxQuantile pass + one range shuffle of the full
    * input — the same cost profile as a single global sort, and the
    * standard way (Delta OPTIMIZE ZORDER, Iceberg rewrite) to amortize
    * many future scans into one rewrite.
    */
  /** The clustering TRANSFORM behind [[zorderWrite]]: returns `df`
    * range-partitioned into `files` partitions and sorted by z-value
    * within each, helper column dropped — one output file per partition
    * when written. Exposed separately so table-managed rewrites
    * ([[graft.pipeline.Lakehouse.optimize]]) can publish the clustered
    * frame through the transactional view-pointer swap instead of a
    * bare path write.
    */
  def zorderFrame(df: DataFrame, zcols: Seq[String], files: Int,
                  bins: Int = 256): DataFrame = {
    require(zcols.size >= 2 && zcols.size <= 4,
      s"z-order clusters on 2-4 columns, got ${zcols.size} " +
        "(for 1 column use a plain sorted write)")
    require(files >= 1 && bins >= 2, "need files >= 1 and bins >= 2")
    // numeric-only: a string column would CAST to null doubles silently
    // — every row lands in bucket 0 and the "clustered" table degrades
    // to one giant z-run with no pruning and skewed files. (Cluster on
    // a string by adding a numeric surrogate — e.g. a dictionary code —
    // and z-ordering on that.)
    zcols.foreach { c =>
      val f = df.schema(c)
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"zorderFrame needs numeric columns, got $c: ${f.dataType.simpleString}")
    }
    GraftFunctions.ensureRegistered(df.sparkSession)
    val bits = 32 - Integer.numberOfLeadingZeros(bins - 1)
    val probs = (1 until bins).map(_.toDouble / bins).toArray
    val bounds = df.stat.approxQuantile(zcols.toArray, probs, 0.25 / bins)
    val binCols = zcols.zip(bounds).map { case (c, bs) =>
      // distinct: low-cardinality columns repeat cut points; a constant
      // column degenerates to bucket 0 everywhere, which is correct
      call_function("search_sorted", col(c).cast("double"),
        lit(bs.distinct.sorted))
    }
    val z = call_function("z_value", lit(bits) +: binCols: _*)
    df.withColumn("__graft_z", z)
      .repartitionByRange(files, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }

  def zorderWrite(df: DataFrame, zcols: Seq[String], path: String,
                  files: Int, bins: Int = 256): Unit =
    zorderFrame(df, zcols, files, bins)
      .write.mode("overwrite").parquet(path)

  final case class CompactionStats(filesBefore: Int, bytesTotal: Long,
                                   filesAfter: Int)

  /** Bin-pack a directory of small parquet files into ~`targetBytes`
    * files — the maintenance pass every streaming/incremental sink
    * needs (each micro-batch leaves one file per partition; a month of
    * 30 s batches is ~90k tiny files whose open/footer cost dominates
    * scans).
    *
    * SHUFFLE-FREE by design: Spark's parquet reader already bin-packs
    * small files into splits (`spark.sql.files.maxPartitionBytes` /
    * `openCostInBytes`), so reading the fragmented directory yields
    * sensibly-grouped partitions; `coalesce` (not `repartition`) then
    * caps the output file count without moving a single row between
    * executors. Content is byte-identical — only the file boundaries
    * change (q102's oracle hashes the compacted copy against the
    * original table).
    *
    * `outPath` must differ from `inPath`: an in-place read+overwrite
    * would delete the input mid-scan. For an in-place swap, compact to
    * a scratch dir and publish via [[graft.pipeline.Lakehouse.ctasSwap]]
    * semantics (write new, atomically repoint, GC old).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L << 20): CompactionStats = {
    val conf = spark.sessionState.newHadoopConf()
    val in = new Path(inPath)
    val fs = in.getFileSystem(conf)
    // compare FULLY-QUALIFIED paths: a relative/absolute alias of the
    // same directory must not slip past the guard — the overwrite write
    // would delete the input before the lazy read runs
    val qIn = fs.makeQualified(in)
    val qOut = new Path(outPath).getFileSystem(conf)
      .makeQualified(new Path(outPath))
    require(qIn != qOut,
      "compact cannot run in place — write to a scratch path and swap")
    def dataFiles(p: Path) = fs.listStatus(p).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val before = dataFiles(in)
    // a hive-partitioned table surfaces DIRECTORIES here, not files —
    // flattening it through a single read would silently drop the
    // partition layout; compact each leaf instead
    require(before.nonEmpty,
      s"compact expects a flat directory of data files at $inPath " +
        "(partitioned tables: compact each partition leaf)")
    val total = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
    CompactionStats(before.length, total, dataFiles(new Path(outPath)).length)
  }
}
