package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q299 PCA: the driver-side Jacobi eigensolve and the distributed
  * projection are checked against an INDEPENDENT local recomputation
  * of the covariance from raw collected embeddings — orthonormality,
  * the eigen equation, explained-variance ordering, and the projection
  * arithmetic itself. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val X: Array[Array[Double]] =
    Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(f =>
        math.round(f.toDouble * 1000).toDouble).toArray)

  private lazy val model = graft.operators.VectorOps.pcaModel(
    graft.operators.VectorOps.quantizedEmbeddings(spark, dir), 8)

  test("components are orthonormal and satisfy the eigen equation") {
    val (means, evals, comps) = model
    val d = 64; val n = X.length.toDouble
    // independent covariance from the raw quantized vectors
    val cov = Array.tabulate(d, d) { (i, j) =>
      X.map(x => (x(i) - means(i)) * (x(j) - means(j))).sum / n
    }
    for (a <- comps.indices; b <- comps.indices) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"orthonormality ($a,$b): $dot")
    }
    comps.zip(evals).foreach { case (vec, ev) =>
      val cv = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * vec(j)).sum)
      val resid = math.sqrt(cv.zip(vec)
        .map { case (a, b) => (a - ev * b) * (a - ev * b) }.sum)
      assert(resid < 1e-6 * math.max(1.0, math.abs(ev)),
        s"eigen residual $resid for eigenvalue $ev")
    }
    assert(evals.sorted(Ordering[Double].reverse).toSeq == evals.toSeq)
    assert(evals.forall(_ > 0.0))
  }

  test("projection column equals the local centered dot product") {
    val (means, evals, comps) = model
    val rows = graft.operators.VectorOps
      .queries("q299_pca_project")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (1 to 8).map(j => r.getLong(j)).toArray).toMap
    assert(rows.size == X.length)
    rows.keys.take(25).foreach { id =>
      val x = X(id.toInt)
      (0 until 8).foreach { j =>
        val y = x.indices.map(i => (x(i) - means(i)) * comps(j)(i)).sum
        assert(math.abs(rows(id)(j) - math.round(y)) <= 1,
          s"vec $id comp $j: got ${rows(id)(j)}, local $y")
      }
    }
    // explained variance really decreases along components: the
    // empirical variance of projection j tracks eigenvalue j
    val n = X.length.toDouble
    val vars = (0 until 8).map { j =>
      val ys = rows.values.map(_(j).toDouble)
      val m = ys.sum / n
      ys.map(y => (y - m) * (y - m)).sum / n
    }
    vars.zip(evals).foreach { case (v, ev) =>
      assert(math.abs(v - ev) < 0.01 * math.max(1.0, ev),
        s"projected variance $v vs eigenvalue $ev")
    }
  }

  test("q309 fixed basis is orthonormal up to its 1e-4 quantization") {
    val b = graft.operators.VectorOps.fixedBasis
    assert(b.length == 8 && b.forall(_.length == 64))
    val scale = 1e4
    for (j <- b.indices) {
      val norm2 = b(j).map(x => x.toDouble * x).sum / (scale * scale)
      assert(math.abs(norm2 - 1.0) < 1e-2, s"row $j norm² $norm2")
      for (p <- 0 until j) {
        val dot = b(j).zip(b(p)).map { case (x, y) => x.toDouble * y }.sum /
          (scale * scale)
        assert(math.abs(dot) < 1e-2, s"rows $j x $p dot $dot")
      }
    }
  }
}
