package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphOps

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // two triangles bridged by one edge + an isolated pair
  private lazy val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L),
    (10L, 11L), (11L, 12L), (12L, 10L),
    (3L, 10L),
    (20L, 21L)).toDF("src", "dst")

  test("connected components finds the two components") {
    val cc = GraphOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 10L, 11L, 12L).forall(cc(_) == 1L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
  }

  test("star-contraction CC matches min-label on the bridged graph") {
    val a = GraphOps.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.connectedComponentsStar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("star-contraction CC solves a path graph far deeper than its round count") {
    // 4001-node path: min-label propagation moves the min ONE hop per
    // superstep (needs ~4000), which is exactly the diameter-bound
    // failure mode at 100x scale. Star contraction must finish in
    // O(log n) rounds and label everything with the path head.
    val n = 4000L
    val path = spark.range(n)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val (cc, rounds) = GraphOps.connectedComponentsStarWithStats(path)
    assert(rounds <= 15, s"expected O(log n) rounds, took $rounds")
    val rows = cc.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == n + 1)
    assert(rows.forall(_._2 == 0L))
  }

  test("pagerank sums to <= 1 and favors high in-degree nodes") {
    val pr = GraphOps.pageRank(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.values.sum <= 1.0 + 1e-9)
    assert(pr(10L) > pr(20L)) // 10 has in-edges from 12 and 3; 20 has none
  }

  test("label propagation: clique converges to one label") {
    val clique = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val lp = GraphOps.labelPropagation(clique, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp.values.toSet.size == 1)
  }

  test("label propagation matches local reference on the bridged graph") {
    val got = GraphOps.labelPropagation(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // local sync reference: adopt most frequent neighbor label, tie → min
    val sym = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 2) {
      labels = labels.map { case (n, l) =>
        val counts = nbrs(n).map(labels).groupBy(identity)
          .map { case (lab, xs) => (lab, xs.size) }
        n -> counts.toSeq.sortBy { case (lab, c) => (-c, lab) }.head._1
      }
    }
    assert(got == labels)
  }

  // undirected canonical (u < v) view of the bridged graph for the
  // similarity/metric operators
  private lazy val uvEdges = edges.toDF("u", "v")

  test("jaccard index matches the hand-computed pair table") {
    val got = GraphOps.jaccardIndex(uvEdges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    // 10 pairs share >= 1 neighbor on the bridged two-triangle graph
    assert(got.size == 10)
    assert(got((1L, 2L)) == (1L, 0.333333))   // common {3}, deg 2+2
    assert(got((11L, 12L)) == (1L, 0.333333)) // common {10}, deg 2+2
    assert(got((1L, 10L)) == (1L, 0.25))      // bridge pair via 3
    assert(!got.contains((20L, 21L)))         // no common neighbor
  }

  test("adamic-adar weights rare shared neighbors higher") {
    val got = GraphOps.adamicAdar(uvEdges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 10)
    // via a degree-2 neighbor: round(1000/ln 2) = 1443
    assert(got((1L, 3L)) == (1L, 1443L))
    // via a degree-3 neighbor: round(1000/ln 3) = 910
    assert(got((1L, 2L)) == (1L, 910L))
    assert(got((1L, 10L)) == (1L, 910L))
  }

  test("vertex metrics aggregate the degree table") {
    val r = GraphOps.vertexMetrics(uvEdges).head()
    assert(r.getAs[Long]("n_vertices") == 8L)
    assert(r.getAs[Long]("n_edges") == 8L)
    assert(r.getAs[Double]("avg_degree") == 2.0)
    assert(r.getAs[Long]("max_degree") == 3L)
    assert(r.getAs[Long]("n_triplets") == 10L) // 1+1+3+3+1+1
  }
}
