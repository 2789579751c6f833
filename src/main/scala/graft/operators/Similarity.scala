package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against a partitioned scan of the corpus, so the big side never
  * shuffles; per-row score + a per-query top-k window. At 100 TB the
  * same plan holds: broadcast Q, map-side score, `TakeOrdered`-style
  * window on rank.
  *
  * Scale path: LSH/IVF bucketing (see `lshBucket`) — candidates are
  * restricted to the query's bucket, turning the cross product into an
  * equi-join on bucket id.
  *
  * Float math notes for oracle parity: elements are cast float→double
  * (exact), products/sums run left-to-right (Spark `aggregate` fold ≡
  * DuckDB `list_reduce` fold, and `0.0 + x == x` in IEEE), so scores are
  * bit-identical to the single-threaded oracle.
  */
object Similarity {

  /** Left-to-right dot product of two double arrays. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Brute-force cosine top-k: query set = vec_id < nQueries (broadcast),
    * corpus = the rest. Returns (query_id, neighbor_id, score, rnk).
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val asDouble = col("embedding").cast(ArrayType(DoubleType))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), asDouble.as("qe"))
    val c = emb.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), asDouble.as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qe"), col("ce")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "score", "rnk")
  }

  def bruteForceTopKOracle(nQueries: Int, k: Int): String = {
    def dotSql(x: String, y: String) =
      s"""LIST_REDUCE(LIST_TRANSFORM(GENERATE_SERIES(1, LEN($x)),
         |    i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (u, v) -> u + v)""".stripMargin
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $nQueries),
       |c AS (
       |  SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings
       |  WHERE vec_id >= $nQueries),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    ${dotSql("qe", "ce")}
       |    / SQRT(${dotSql("qe", "qe")} * ${dotSql("ce", "ce")}) AS score
       |  FROM c CROSS JOIN q),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM scored)
       |SELECT query_id, neighbor_id, score, rnk FROM ranked
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with
    * cosine >= threshold. Test-scale formulation is the full pairwise
    * nested-loop (one broadcast side); the 100 TB path replaces the
    * `<` condition join with the sign-LSH bucket equi-join of
    * [[lshTopK]] — same scoring expression, restricted candidates.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val asDouble = col("embedding").cast(ArrayType(DoubleType))
    val e = emb.select(col("vec_id"), asDouble.as("e"))
    e.as("a").join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.e"), col("b.e")).as("score"))
      .filter(col("score") >= threshold)
  }

  def nearDupPairsOracle(threshold: Double): String = {
    def dotSql(x: String, y: String) =
      s"""LIST_REDUCE(LIST_TRANSFORM(GENERATE_SERIES(1, LEN($x)),
         |    i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (u, v) -> u + v)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${dotSql("a.embedding", "b.embedding")}
       |    / SQRT(${dotSql("a.embedding", "a.embedding")}
       |         * ${dotSql("b.embedding", "b.embedding")}) AS score
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, score FROM scored
       |WHERE score >= $threshold ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Sign-LSH bucket id from the first `bits` dimensions: bit j set iff
    * embedding[j] > 0. Equal vectors land in equal buckets; at scale the
    * ANN search becomes an equi-join on this id.
    */
  def lshBucket(emb: Column, bits: Int): Column =
    (0 until bits).map { j =>
      when(element_at(emb, j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: same contract as bruteForceTopK but candidates are
    * restricted to the query's sign-LSH bucket (recall < 1, cost ≫ lower).
    */
  def lshTopK(emb: DataFrame, nQueries: Int, k: Int, bits: Int): DataFrame = {
    val asDouble = col("embedding").cast(ArrayType(DoubleType))
    val withBucket = emb.select(col("vec_id"),
      asDouble.as("e"), lshBucket(col("embedding"), bits).as("bucket"))
    val q = withBucket.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("bucket"))
    val c = withBucket.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), col("e").as("ce"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qe"), col("ce")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "score", "rnk")
  }

  def lshTopKOracle(nQueries: Int, k: Int, bits: Int): String = {
    def dotSql(x: String, y: String) =
      s"""LIST_REDUCE(LIST_TRANSFORM(GENERATE_SERIES(1, LEN($x)),
         |    i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (u, v) -> u + v)""".stripMargin
    val bucketSql = (0 until bits).map { j =>
      s"CASE WHEN embedding[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qe, bucket FROM b
       |  WHERE vec_id < $nQueries),
       |c AS (
       |  SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM b
       |  WHERE vec_id >= $nQueries),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    ${dotSql("qe", "ce")}
       |    / SQRT(${dotSql("qe", "qe")} * ${dotSql("ce", "ce")}) AS score
       |  FROM c JOIN q USING (bucket)),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
       |  FROM scored)
       |SELECT query_id, neighbor_id, score, rnk FROM ranked
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }
}
