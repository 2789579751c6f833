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

  /** Weighted PageRank by power iteration, in EXACT scaled-integer
    * arithmetic so the result is bit-identical on any engine and any
    * partitioning: ranks live as `BIGINT` multiples of `1/scale`, and
    * every step uses only `+`, `*`, and integer division (floor on the
    * all-positive domain), never a float.
    *
    *   r_0(i)    = scale div N
    *   r_{k+1}(i) = ((100-d)·scale) div (100·N)
    *              + (d · Σ_{j→i} (r_k(j)·w_ji) div outw_j) div 100
    *
    * Dangling mass (nodes with no out-edges) is dropped — the standard
    * "lost mass" variant — identically on both engines.
    *
    * Scale shape (the Pregel formulation): `edges` is augmented with its
    * per-source out-weight once (one shuffle on src) and persisted —
    * iterations never rebuild it. Each iteration is one equi-join of the
    * rank frame against the edge list on `src` plus one aggregation
    * shuffled on `dst`; the rank frame is |V|-sized, never |E|-sized.
    * With a dim-sized node set (here: nations) the rank side broadcasts;
    * at 100 TB both sides hash-partition on the node key and the
    * iteration cost is O(|E|/executors) per round.
    *
    * Overflow headroom: r·w must stay under 2^63 — with scale=1e12 that
    * caps per-edge weight at ~9e6; re-scale `scale` down (or pre-divide
    * weights) for heavier graphs.
    *
    * @param edges (src, dst, w: BIGINT) — positive integer weights
    * @param nodes single column `node` — the full vertex set
    * @return (node, rank_scaled: BIGINT) — rank ≈ rank_scaled / scale
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
               scale: Long = 1000000000000L, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1, s"iters ($iters) must be >= 1")
    require(dampingPct > 0 && dampingPct < 100, s"dampingPct in (0,100)")
    val ow = edges.groupBy("src").agg(sum("w").as("ow"))
    val e = edges.join(ow, "src").select("src", "dst", "w", "ow")
      .persist() // iterations reuse the augmented edge list as-is
    val nn = nodes.agg(count(lit(1)).as("n"))
    val r0 = nodes.crossJoin(broadcast(nn))
      .select(col("node"), call_function("div", lit(scale), col("n")).as("r"))
    val rFinal = (1 to iters).foldLeft(r0) { (rank, _) =>
      val contrib = e
        .join(rank.select(col("node").as("src"), col("r")), "src")
        .groupBy("dst")
        .agg(sum(call_function("div", col("r") * col("w"), col("ow"))).as("s"))
      nodes.crossJoin(broadcast(nn))
        .join(contrib.select(col("dst").as("node"), col("s")), Seq("node"), "left")
        .select(col("node"),
          (call_function("div",
              lit((100L - dampingPct) * scale), lit(100L) * col("n"))
            + call_function("div",
                lit(dampingPct.toLong) * coalesce(col("s"), lit(0L)), lit(100L)))
            .as("r"))
    }
    rFinal.select(col("node"), col("r").as("rank_scaled"))
  }

  /** Oracle for [[pageRank]]: replays the identical integer iterations
    * as a chained-CTE DuckDB query. `edgesSql` must yield
    * (src, dst, w), `nodesSql` a single `node` column.
    */
  def pageRankOracle(edgesSql: String, nodesSql: String, iters: Int,
                     scale: Long = 1000000000000L,
                     dampingPct: Int = 85): String = {
    val baseNum = (100L - dampingPct) * scale
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT nodes.node,
         |    CAST(($baseNum // (100 * nn.n))
         |      + ($dampingPct * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst, SUM((r${k - 1}.r * e.w) // e.ow) AS s
         |    FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
         |    GROUP BY e.dst) s ON nodes.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS ($edgesSql),
       |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM e0 GROUP BY src),
       |e AS (SELECT e0.src, e0.dst, e0.w, ow.ow
       |      FROM e0 JOIN ow ON e0.src = ow.src),
       |nodes AS ($nodesSql),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (SELECT node, CAST($scale // n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN nn),
       |$iterCtes
       |SELECT node, r AS rank_scaled FROM r$iters ORDER BY node""".stripMargin
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
