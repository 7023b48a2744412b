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
}
