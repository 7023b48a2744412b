package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.GraphOps

/**
 * Graph queries over the customer–supplier bipartite graph induced by
 * orders⋈lineitem (edge: o_custkey → 100000+l_suppkey). Connected
 * components is verified exactly against a DuckDB recursive-CTE
 * transitive closure; PageRank against a programmatically unrolled
 * 3-iteration SQL (same float formula, summation rounded to 6).
 */
object GraphQueries {

  private val SuppOffset = 100000L

  private def edges(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "lineitem")
      .join(Tables.table(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
              (col("l_suppkey") + SuppOffset).as("dst"))
      .distinct()

  // limit graph size: orders of the first 200 customers
  private def smallEdges(s: SparkSession, dir: String): DataFrame =
    edges(s, dir).filter(col("src") <= 200)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_connected_components" -> ((s, dir) =>
      GraphOps.connectedComponents(smallEdges(s, dir))
        .select(col("node"), col("component"))),

    // Same components via large-star/small-star contraction (Kiveris et
    // al.) — the diameter-independent variant for 100x graphs; oracle is
    // q50's recursive-CTE reachability, verbatim.
    "q253_cc_star" -> ((s, dir) =>
      GraphOps.connectedComponentsStar(smallEdges(s, dir))
        .select(col("node"), col("component"))),

    "q51_pagerank" -> ((s, dir) =>
      GraphOps.pageRank(smallEdges(s, dir), iters = 3)
        .select(col("node"), round(col("rank"), 6).as("rank_r"))),

    "q52_label_propagation" -> ((s, dir) =>
      GraphOps.labelPropagation(smallEdges(s, dir), iters = 2)
        .select(col("node"), col("label"))),

    // SSSP from customer 1 with deterministic per-edge weights
    // ((src+dst) % 7 + 1) — verified against a DuckDB recursive-CTE
    // shortest-path (bounded walk + min per node).
    "q86_sssp" -> ((s, dir) =>
      GraphOps.sssp(
          smallEdges(s, dir)
            .withColumn("w", pmod(col("src") + col("dst"), lit(7L)) + 1L),
          source = 1L)
        .select(col("node"), col("dist"))),

    // Per-node triangle counts on the co-purchase graph: customers are
    // adjacent when they share ≥ 10 suppliers (modularly thinned to keep
    // the fixture sparse); canonical u < v edges.
    "q89_triangles" -> ((s, dir) =>
      GraphOps.triangleCounts(copurchaseEdges(s, dir))),

    // HITS hubs (customers) & authorities (suppliers) on the bipartite
    // purchase graph, 2 iterations, max-normalized.
    "q90_hits" -> ((s, dir) =>
      GraphOps.hits(smallEdges(s, dir), iters = 2)),

    // Graph summarization: contract by node % 5 groups.
    "q91_summarize" -> ((s, dir) => {
      val e = smallEdges(s, dir)
      val labels = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .withColumn("label", pmod(col("node"), lit(5L)))
      GraphOps.summarize(e, labels)
    }),

    // Local clustering coefficient on the co-purchase graph.
    "q92_clustering" -> ((s, dir) =>
      GraphOps.clusteringCoefficients(copurchaseEdges(s, dir))),

    // Community detection (score-attenuated LP), 2 supersteps.
    "q93_community" -> ((s, dir) =>
      GraphOps.communityDetection(smallEdges(s, dir), iters = 2)),

    // Jaccard-index vertex similarity on the co-purchase graph
    // (library/similarity/JaccardIndex.java): pairs sharing ≥1 neighbor
    // scored by |N(u)∩N(v)| / |N(u)∪N(v)|.
    "q283_jaccard_index" -> ((s, dir) =>
      GraphOps.jaccardIndex(copurchaseEdges(s, dir))),

    // Adamic–Adar similarity (library/similarity/AdamicAdar.java):
    // common neighbors weighted by 1/ln(degree), milli-quantized.
    "q284_adamic_adar" -> ((s, dir) =>
      GraphOps.adamicAdar(copurchaseEdges(s, dir))),

    // Whole-graph degree metrics (library/metric/undirected/
    // VertexMetrics.java): vertex/edge counts, avg/max degree, triplets.
    "q285_vertex_metrics" -> ((s, dir) =>
      GraphOps.vertexMetrics(copurchaseEdges(s, dir)))
  )

  // co-purchase projection: frequent-co-supplier pairs, deterministically
  // thinned ((u+v) % 3 = 0) so triangles are nontrivial but bounded
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val cs = Tables.table(s, dir, "lineitem")
      .join(Tables.table(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct()
    cs.as("a").join(cs.as("b"),
        col("a.sp") === col("b.sp") && col("a.c") < col("b.c"))
      .groupBy(col("a.c").as("u"), col("b.c").as("v"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 10 && pmod(col("u") + col("v"), lit(3)) === 0)
      .select(col("u"), col("v"))
  }

  /** Recursive-CTE min-reachability — shared by q50 and q253 (same
    * semantics, two implementations under one oracle). */
  private lazy val ccOracleSql: String = s"""
      WITH RECURSIVE $edgesSql,
      edges AS (SELECT src, dst FROM edges0
                UNION SELECT dst, src FROM edges0),
      nodes AS (SELECT DISTINCT src AS n FROM edges),
      reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.n)
      SELECT n AS node, min(r) AS component FROM reach GROUP BY n"""

  private val edgesSql = s"""
      edges0 AS (
        SELECT DISTINCT o_custkey AS src, l_suppkey + $SuppOffset AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey <= 200)"""

  /** SQL dual of [[copurchaseEdges]] — the single copy shared by every
    * co-purchase-graph oracle (q89, q92, q283–q285). */
  private val coEdgesSql = """
      cs AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey <= 100),
      e AS (
        SELECT a.c AS u, b.c AS v
        FROM cs a JOIN cs b ON a.sp = b.sp AND a.c < b.c
        GROUP BY a.c, b.c
        HAVING count(*) >= 10 AND (a.c + b.c) % 3 = 0)"""

  val oracle: Map[String, String] = Map(
    "q50_connected_components" -> ccOracleSql,

    "q253_cc_star" -> ccOracleSql,

    "q51_pagerank" -> {
      val d = 0.85
      val iters = (1 to 3).map { i =>
        s"""r$i AS (
        SELECT n.node,
               (1 - $d) / (SELECT cnt FROM nn) + $d * COALESCE(s.in_sum, 0.0) AS rank
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node, sum(r.rank / o.outdeg) AS in_sum
          FROM edges0 e
          JOIN r${i - 1} r ON e.src = r.node
          JOIN outdeg o ON e.src = o.src
          GROUP BY e.dst) s ON n.node = s.node)"""
      }.mkString(",\n      ")
      s"""
      WITH $edgesSql,
      nodes AS (SELECT DISTINCT src AS node FROM edges0
                UNION SELECT DISTINCT dst FROM edges0),
      nn AS (SELECT count(*) AS cnt FROM nodes),
      outdeg AS (SELECT src, count(*) AS outdeg FROM edges0 GROUP BY src),
      r0 AS (SELECT node, 1.0 / (SELECT cnt FROM nn) AS rank FROM nodes),
      $iters
      SELECT node, round(rank, 6) AS rank_r FROM r3"""
    },

    // 2 synchronous LP supersteps unrolled: per node take the most
    // frequent neighbor label, ties to the smallest label (exactly
    // GraphOps.labelPropagation's min_by(label, (-cnt, label))).
    "q52_label_propagation" -> s"""
      WITH $edgesSql,
      edges AS (SELECT src, dst FROM edges0
                UNION SELECT dst, src FROM edges0),
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      l0 AS (SELECT node, node AS label FROM nodes),
      c1 AS (
        SELECT e.dst AS node, l.label, count(*) AS cnt,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, l.label) AS rk
        FROM edges e JOIN l0 l ON e.src = l.node
        GROUP BY e.dst, l.label),
      l1 AS (
        SELECT n.node, COALESCE(c.label, n.node) AS label
        FROM nodes n LEFT JOIN (SELECT node, label FROM c1 WHERE rk = 1) c
          ON n.node = c.node),
      c2 AS (
        SELECT e.dst AS node, l.label, count(*) AS cnt,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, l.label) AS rk
        FROM edges e JOIN l1 l ON e.src = l.node
        GROUP BY e.dst, l.label),
      l2 AS (
        SELECT n.node, COALESCE(c.label, l1.label) AS label
        FROM nodes n
        JOIN l1 ON n.node = l1.node
        LEFT JOIN (SELECT node, label FROM c2 WHERE rk = 1) c
          ON n.node = c.node)
      SELECT node, label FROM l2""",

    // Bounded-walk shortest path: enumerate all (node, walk length ≤ 60)
    // pairs reachable from source 1, keep the min per node. The 60 cap
    // only has to exceed the true weighted diameter (≤ 7 × hop diameter,
    // hop diameter ≈ 4 on this dense bipartite graph).
    "q86_sssp" -> s"""
      WITH RECURSIVE $edgesSql,
      edges AS (
        SELECT src, dst, (src + dst) % 7 + 1 AS w FROM edges0
        UNION SELECT dst, src, (src + dst) % 7 + 1 AS w FROM edges0),
      walk(node, d) AS (
        SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
        UNION
        SELECT e.dst, walk.d + e.w FROM edges e JOIN walk ON e.src = walk.node
        WHERE walk.d + e.w <= 60)
      SELECT node, min(d) AS dist FROM walk GROUP BY node""",

    "q89_triangles" -> s"""
      WITH $coEdgesSql,
      tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v)
      SELECT node, count(*) AS n_tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) x
      GROUP BY node""",

    "q90_hits" -> s"""
      WITH $edgesSql,
      auth1 AS (
        SELECT dst AS node, CAST(count(*) AS DOUBLE) AS score
        FROM edges0 GROUP BY dst),
      hub1 AS (
        SELECT e.src AS node, sum(a.score) AS score
        FROM edges0 e JOIN auth1 a ON e.dst = a.node GROUP BY e.src),
      auth2 AS (
        SELECT e.dst AS node, sum(h.score) AS score
        FROM edges0 e JOIN hub1 h ON e.src = h.node GROUP BY e.dst),
      hub2 AS (
        SELECT e.src AS node, sum(a.score) AS score
        FROM edges0 e JOIN auth2 a ON e.dst = a.node GROUP BY e.src)
      SELECT node, 'hub' AS role,
             round(score / (SELECT max(score) FROM hub2), 6) AS score
      FROM hub2
      UNION ALL
      SELECT node, 'auth' AS role,
             round(score / (SELECT max(score) FROM auth2), 6) AS score
      FROM auth2""",

    "q91_summarize" -> s"""
      WITH $edgesSql
      SELECT src % 5 AS src_label, dst % 5 AS dst_label,
             count(*) AS n_edges
      FROM edges0 GROUP BY 1, 2""",

    "q92_clustering" -> s"""
      WITH $coEdgesSql,
      tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v),
      tcnt AS (
        SELECT node, count(*) AS n_tri FROM (
          SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri) x
        GROUP BY node),
      deg AS (
        SELECT node, count(*) AS deg FROM (
          SELECT u AS node FROM e UNION ALL SELECT v FROM e) d
        GROUP BY node)
      SELECT deg.node,
             CASE WHEN deg < 2 THEN 0.0
                  ELSE round(COALESCE(n_tri, 0) * 2.0 / (deg * (deg - 1)), 6)
             END AS coeff
      FROM deg LEFT JOIN tcnt ON deg.node = tcnt.node""",

    // 2 supersteps of score-attenuated LP unrolled: superstep 1 all
    // incoming scores are 1.0 (unique labels) so the pick degenerates to
    // min neighbor id; superstep 2 all scores are 0.5 so the pick is the
    // neighbor-label mode (count desc, label asc) — both SQL-exact.
    "q93_community" -> s"""
      WITH $edgesSql,
      edges AS (SELECT src, dst FROM edges0
                UNION SELECT dst, src FROM edges0),
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      l1 AS (
        SELECT e.dst AS node, min(e.src) AS label
        FROM edges e GROUP BY e.dst),
      c2 AS (
        SELECT e.dst AS node, l.label, count(*) AS cnt,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, l.label) AS rk
        FROM edges e JOIN l1 l ON e.src = l.node
        GROUP BY e.dst, l.label),
      l2 AS (
        SELECT n.node, COALESCE(c.label, l1.label) AS label
        FROM nodes n
        JOIN l1 ON n.node = l1.node
        LEFT JOIN (SELECT node, label FROM c2 WHERE rk = 1) c
          ON n.node = c.node)
      SELECT node, label FROM l2""",

    "q283_jaccard_index" -> s"""
      WITH $coEdgesSql,
      sym AS (SELECT u AS w, v AS x FROM e
              UNION SELECT v AS w, u AS x FROM e),
      deg AS (SELECT w AS node, count(*) AS deg FROM sym GROUP BY w),
      p AS (
        SELECT a.x AS u, b.x AS v, count(*) AS shared
        FROM sym a JOIN sym b ON a.w = b.w AND a.x < b.x
        GROUP BY 1, 2)
      SELECT p.u, p.v, p.shared,
             du.deg + dv.deg - p.shared AS union_deg,
             round(CAST(p.shared AS DOUBLE)
                   / (du.deg + dv.deg - p.shared), 6) AS jaccard
      FROM p
      JOIN deg du ON p.u = du.node
      JOIN deg dv ON p.v = dv.node""",

    "q284_adamic_adar" -> s"""
      WITH $coEdgesSql,
      sym AS (SELECT u AS w, v AS x FROM e
              UNION SELECT v AS w, u AS x FROM e),
      deg AS (SELECT w AS node, count(*) AS deg FROM sym GROUP BY w),
      c AS (SELECT node,
                   CAST(round(1000.0 / ln(deg)) AS BIGINT) AS contrib
            FROM deg)
      SELECT a.x AS u, b.x AS v, count(*) AS n_common,
             CAST(sum(c.contrib) AS BIGINT) AS aa_milli
      FROM sym a
      JOIN sym b ON a.w = b.w AND a.x < b.x
      JOIN c ON a.w = c.node
      GROUP BY 1, 2""",

    "q285_vertex_metrics" -> s"""
      WITH $coEdgesSql,
      deg AS (
        SELECT node, count(*) AS deg FROM (
          SELECT u AS node FROM e
          UNION ALL SELECT v FROM e) x
        GROUP BY node)
      SELECT count(*) AS n_vertices,
             (SELECT count(*) FROM e) AS n_edges,
             round(avg(deg), 6) AS avg_degree,
             max(deg) AS max_degree,
             CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) AS n_triplets
      FROM deg"""
  )
}
