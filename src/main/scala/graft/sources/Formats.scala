package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source-format breadth beyond parquet: JSONL and CSV, the two formats
  * a training-data pipeline ingests most after parquet. Reads always
  * take an EXPLICIT schema — schema inference is a full extra pass over
  * the data (a non-starter at 100 TB) and type-guesses differently
  * between engines; with a declared schema the scan is single-pass and
  * columns prune as usual.
  */
object Formats {

  /** One JSON object per line (the interchange format for document
    * corpora). Spark writes doubles in shortest round-trippable form,
    * so read-back is bit-exact.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Header CSV with standard quoting (embedded commas/quotes survive). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** ORC — the columnar alternative Spark ships natively (Hive-ecosystem
    * interchange). Same explicit-schema contract; ORC carries its own
    * schema, but declaring it keeps the reader honest about drift.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
