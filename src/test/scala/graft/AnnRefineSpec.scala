package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnOps, VectorOps}

/**
 * Two-stage PQ serving with exact re-rank (q334 — FAISS's
 * IndexRefineFlat over IndexPQ): the properties that make the refine
 * stage trustworthy.
 *
 *  - REFINE-EXACTNESS: the refined recall@5 equals the candidate
 *    ceiling (how many true top-5 the ADC top-R contains) at every R —
 *    any true-top-5 member inside the candidate set outranks every
 *    non-member under the exact kernel, so re-ranking loses nothing.
 *  - MONOTONE in R, reaching exact recall once the candidate set
 *    covers the true neighbors (R=400 on this near-random fixture —
 *    the honest version of "R = 2-10× k recovers ≥ 0.95+ on real
 *    clustered embeddings", since PQ's 16-codeword snap scatters the
 *    fixture's neighbors deep into the ADC order).
 */
class AnnRefineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("refined recall equals the ADC candidate ceiling at every R; exact at R=400") {
    val refined = AnnOps.queries("q334_pq_refine")(spark, dir)
      .select("refine_r", "n_hit", "recall_at_5")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toList
    assert(refined.map(_._1) == List(20, 50, 400))

    // candidate ceiling: |ADC top-R ∩ exact top-5| per R
    val gt = VectorOps.queries("q38_cosine_topk")(spark, dir)
      .select(col("q_id"), col("cand_id"))
    val pq = AnnOps.pqAdcRanked(spark, dir)
      .select(col("q_id"), col("cand_id"), col("rnk"))
    val ceiling = refined.map { case (r, _, _) =>
      r -> pq.filter(col("rnk") <= r).join(gt, Seq("q_id", "cand_id")).count()
    }.toMap
    refined.foreach { case (r, nHit, _) =>
      assert(nHit == ceiling(r),
        s"refine must recover exactly the candidate ceiling at R=$r: " +
        s"refined $nHit vs ceiling ${ceiling(r)}")
    }
    // monotone in R; the widest point covers the true neighbors →
    // exact recall (≥ the 0.98 SQ8 bar by construction)
    assert(refined.map(_._2) == refined.map(_._2).sorted)
    assert(refined.last._3 == 1.0)
  }
}
