package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Embedding moment operators (q286–q288): independent local
  * recomputation of the integer-quantized statistics. */
class MomentsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val vecs: Map[Long, Array[Long]] =
    Tables.table(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.round(x.toDouble * 1000)).toArray
      }.toMap

  test("q286: upper-triangle gram cells match a local recomputation") {
    val got = VectorOps.queries("q286_embedding_gram")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == 64 * 65 / 2)
    assert(got.keys.forall { case (i, j) => j >= i })
    val n = vecs.size.toDouble
    for ((i, j) <- Seq((1, 1), (1, 64), (7, 33))) {
      val gram = vecs.values.map(q => q(i - 1) * q(j - 1)).sum
      val (si, sj) = (vecs.values.map(_(i - 1)).sum,
                      vecs.values.map(_(j - 1)).sum)
      val cov = (gram.toDouble - si.toDouble * sj.toDouble / n) / n
      assert(got((i, j))._1 == gram)
      assert(math.abs(got((i, j))._2 - cov) < 1e-5)
    }
  }

  test("q287: label centroid sums partition the corpus") {
    val rows = VectorOps.queries("q287_label_centroids")(spark, dir)
      .collect()
    assert(rows.length == 10 * 64)
    val perDim = rows.groupBy(_.getAs[Int]("i"))
    assert(perDim.values.forall(_.map(_.getAs[Long]("n")).sum == vecs.size))
    // total milli-sum over labels for dim 1 equals the corpus sum
    assert(perDim(1).map(_.getAs[Long]("s")).sum ==
      vecs.values.map(_(0)).sum)
  }

  test("q288: outlier scores are the top-20, positive, strictly ranked") {
    val rows = VectorOps.queries("q288_embedding_outliers")(spark, dir)
      .collect().sortBy(_.getAs[Int]("rnk"))
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("score_micro")).forall(_ > 0))
    val scores = rows.map(_.getAs[Long]("score_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
