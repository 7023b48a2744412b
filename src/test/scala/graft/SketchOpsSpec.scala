package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchOps

/**
 * Invariant checks for the mergeable-sketch family (SketchOps) on the
 * sf0.001 fixture — the value-exact oracle runs at sf0.01 via the
 * driver; these specs assert the STRUCTURAL guarantees each sketch
 * carries by construction (the properties a user relies on at 100 TB
 * where no exact answer exists to compare against).
 */
class SketchOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SketchOps.queries.getOrElse(name,
      graft.operators.TextOps.queries(name))(spark, dir)

  test("cms: estimate never under-counts (one-sided error), and reported " +
    "heavy hitters clear the threshold") {
    val rows = run("q150_cms_heavy").collect()
    assert(rows.nonEmpty, "fixture has frequent tokens")
    rows.foreach { r =>
      val est = r.getAs[Long]("est")
      val cnt = r.getAs[Long]("true_cnt")
      assert(est >= cnt,
        s"CMS must only over-count: token=${r.getAs[String]("token")} " +
          s"est=$est true=$cnt")
    }
  }

  test("hll: per-source estimate lands within 3 standard errors " +
    "(1.04/sqrt(64) ~ 13%) of the exact distinct count") {
    val rows = run("q151_hll_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("exact_cnt").toDouble
      assert(math.abs(est - exact) / exact <= 0.39,
        s"source=${r.getAs[String]("source")} est=$est exact=$exact")
      assert(r.getAs[Long]("n_reg") <= 64)
    }
  }

  test("bottom-k: estimate within 3 standard errors (1/sqrt(30) ~ 18%) " +
    "when the sketch is full; exact when not") {
    val rows = run("q154_bottomk_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("exact_cnt").toDouble
      if (r.getAs[Long]("n_kept") == 32)
        assert(math.abs(est - exact) / exact <= 0.55,
          s"source=${r.getAs[String]("source")} est=$est exact=$exact")
      else assert(est == exact)
    }
  }

  test("weighted sample: deterministic, bounded, priority-ordered") {
    val a = run("q152_weighted_sample").collect()
    val b = run("q152_weighted_sample").collect()
    assert(a.length == 50 && a.toSeq == b.toSeq)
    val prios = a.map(_.getAs[Double]("priority")).toSeq
    assert(prios == prios.sorted, "ascending priority order")
  }

  test("length model: positive slope, outliers are a strict minority " +
    "in every language") {
    val rows = run("q153_length_model").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("a") > 0, "BPE count grows with token count")
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n_docs"))
    }
  }

  test("winnow_fp_set agrees with winnow_fp on size/min/max per document") {
    import org.apache.spark.sql.graftbridge.Bridge
    val fp = Bridge.column(graft.plans.WinnowFp(
      Bridge.expression(col("text")), k = 8, w = 16))
    val fpSet = Bridge.column(graft.plans.WinnowFpSet(
      Bridge.expression(col("text")), k = 8, w = 16))
    val bad = Tables.table(spark, dir, "documents")
      .filter(length(col("text")) >= 8)
      .select(fp.as("fp"), fpSet.as("set"))
      .filter(!(col("fp.n_fp") === size(col("set")) &&
        col("fp.fp_min") === element_at(col("set"), 1) &&
        col("fp.fp_max") === element_at(col("set"), -1) &&
        col("set") === array_sort(col("set"))))
      .count()
    assert(bad == 0L)
  }

  test("q149 pairs: containment bounded by 1, keys ordered da < db") {
    val rows = run("q149_winnow_pairs").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
      val c = r.getAs[Double]("containment")
      assert(c >= 0.5 && c <= 1.0)
      assert(r.getAs[Long]("shared") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    }
  }
}
