package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair frames (the near-dup graph is the
  * in-engine producer). Everything here is equi-join-shaped — the only
  * formulation that survives a 1000-executor scale-up.
  */
object GraphOps {

  /** Exact triangle count over an ORIENTED edge list (`a < b` on every
    * row, the near-dup pair convention). With oriented edges each
    * triangle {x < y < z} is counted exactly once as the join
    * (x,y) ⋈ (y,z) ⋈ (x,z) — two equi-joins, no orientation dedup
    * pass, no double counting. The candidate join (e1 ⋈ e2) is the
    * quadratic-in-degree step every triangle algorithm pays; oriented
    * edges bound it by the FORWARD degree (max ~√|E| after the
    * standard degree-ordering transform, which the caller can apply by
    * relabeling ids in degree order).
    *
    * The WEDGE census (the clustering-coefficient denominator) is NOT
    * the ordered-candidate count — a wedge centered at v exists for
    * every unordered neighbor pair, Σ_v C(deg(v), 2), counted from the
    * UNDIRECTED degree per node (one bounded aggregate), or the
    * coefficient silently inflates ~3× and can exceed 1.
    *
    * @return one row: (n_nodes, n_edges, n_wedges, n_triangles,
    *         global_clustering = 3·triangles / wedges)
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val cands = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tris = cands.join(e.as("e3"),
      col("x") === col("e3.a") && col("z") === col("e3.b"))
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val nodeStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(call_function("div", col("d") * (col("d") - 1), lit(2L)))
        .as("n_wedges"))
    val base = e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(tris.agg(count(lit(1)).as("n_triangles"))))
      .crossJoin(broadcast(nodeStats))
    base.select(col("n_nodes"), col("n_edges"), col("n_wedges"),
      col("n_triangles"),
      when(col("n_wedges") === 0, lit(0.0))
        .otherwise(lit(3.0) * col("n_triangles") / col("n_wedges"))
        .as("global_clustering"))
  }

  /** Oracle wrapper: `edgesSql` must yield (doc_a, doc_b) with
    * doc_a < doc_b.
    */
  def triangleStatsOracle(edgesSql: String): String =
    s"""WITH edges AS (SELECT doc_a, doc_b FROM ($edgesSql)),
       |w AS (
       |  SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
       |  FROM edges e1 JOIN edges e2 ON e1.doc_b = e2.doc_a),
       |tri AS (
       |  SELECT 1 FROM w JOIN edges e3
       |    ON w.x = e3.doc_a AND w.z = e3.doc_b),
       |deg AS (
       |  SELECT n, COUNT(*) AS d FROM (
       |    SELECT doc_a AS n FROM edges
       |    UNION ALL SELECT doc_b FROM edges)
       |  GROUP BY n),
       |nn AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |    CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
       |  FROM deg),
       |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri)
       |SELECT n_nodes, n_edges, n_wedges, n_triangles,
       |  CASE WHEN n_wedges = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE CAST(3.0 AS DOUBLE) * n_triangles / n_wedges
       |  END AS global_clustering
       |FROM nn, ne, nt""".stripMargin
}
