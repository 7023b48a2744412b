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

    "q51_pagerank" -> ((s, dir) =>
      GraphOps.pageRank(smallEdges(s, dir), iters = 3)
        .select(col("node"), round(col("rank"), 6).as("rank_r"))),

    "q52_label_propagation" -> ((s, dir) =>
      GraphOps.labelPropagation(smallEdges(s, dir), iters = 2)
        .select(col("node"), col("label")))
  )

  private val edgesSql = s"""
      edges0 AS (
        SELECT DISTINCT o_custkey AS src, l_suppkey + $SuppOffset AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey <= 200)"""

  val oracle: Map[String, String] = Map(
    "q50_connected_components" -> s"""
      WITH RECURSIVE $edgesSql,
      edges AS (SELECT src, dst FROM edges0
                UNION SELECT dst, src FROM edges0),
      nodes AS (SELECT DISTINCT src AS n FROM edges),
      reach(n, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.n)
      SELECT n AS node, min(r) AS component FROM reach GROUP BY n""",

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
    }
    // q52 label propagation: rows-only check (mode-of-neighbors with
    // tie-breaks is impractical to unroll in portable SQL; covered by
    // GraphSpec against a local reference implementation instead).
  )
}
