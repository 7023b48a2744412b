package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the retrieval / data-selection operators (RetrievalOps)
  * on hand-computable fixtures plus scale-relevant properties on the
  * driver testdata. The oracle gate proves SQL equivalence; these specs
  * pin the *intended* semantics (interval-union coverage arithmetic,
  * BM25 ordering, DSIR target separation) independently of the oracle.
  */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Write a tiny documents table and return its parent dir. */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("retr").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("substring dedup: interval union over duplicated 5-gram positions") {
    // doc 0 and doc 1 share tokens 0..5 ("a b c d e f"): duplicated
    // 5-gram positions 0 and 1 → union [0,6) = 6 tokens each.
    // doc 2 is unique -> absent. doc 3 repeats its own 5-gram
    // ("x y z w v" twice) -> intra-doc dup, positions 0 and 5,
    // gap 5 >= k so disjoint spans: 5 + 5 = 10 of its 10 tokens.
    val dir = docsDir(Seq(
      (0L, "a b c d e f p q r s", "en", "s0", 0L),
      (1L, "a b c d e f t u v w", "en", "s0", 0L),
      (2L, "one two three four five six seven", "en", "s0", 0L),
      (3L, "x y z w v x y z w v", "en", "s0", 0L)))
    val out = SparkEntry.queries("q247_substring_dedup")(spark, dir)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "dup_tokens", "dup_frac")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 10, 6L, 0.6), (1L, 10, 6L, 0.6), (3L, 10, 10L, 1.0)))
  }

  test("substring dedup: overlapping spans merge (no double counting)") {
    // doc 0/1 share the full 8 tokens: dup positions 0..3, each next
    // gap 1 < k -> one merged span of 8; dup_frac exactly 1.
    val dir = docsDir(Seq(
      (0L, "a b c d e f g h", "en", "s0", 0L),
      (1L, "a b c d e f g h", "en", "s0", 0L)))
    val out = SparkEntry.queries("q247_substring_dedup")(spark, dir)
      .select(sum(col("dup_tokens")).cast("long"), min("dup_frac"))
      .head()
    assert(out.getLong(0) == 16L && out.getDouble(1) == 1.0)
  }

  test("substring dedup invariants on testdata: coverage bounded by doc length") {
    val out = SparkEntry.queries("q247_substring_dedup")(spark, sf)
    val bad = out.filter(
      col("dup_tokens") > col("n_tokens") || col("dup_tokens") < lit(5) ||
        col("dup_frac") > 1.0 || col("dup_frac") <= 0.0)
    assert(bad.count() == 0)
  }

  test("bm25: tf monotonicity at equal length, and full-corpus term sanity") {
    // Same doc length; doc 0 has the query term twice, doc 1 once, doc 2
    // none -> scores strictly ordered, doc 2 absent.
    val dir = docsDir(Seq(
      (0L, "spark spark alpha beta gamma", "en", "s0", 0L),
      (1L, "spark delta alpha beta gamma", "en", "s0", 0L),
      (2L, "epsilon delta alpha beta gamma", "en", "s0", 0L)))
    val out = SparkEntry.queries("q248_bm25")(spark, dir)
      .select("doc_id", "score_u").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) > out(1L))
    // Testdata: top-50 list is full and strictly ordered by (score, id).
    val top = SparkEntry.queries("q248_bm25")(spark, sf)
      .collect().map(r => (r.getAs[Long]("score_u"), r.getAs[Long]("doc_id")))
    assert(top.length == 50)
    assert(top.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) })
  }

  test("dsir: weights separate the target domain on testdata") {
    // The bucket LM is trained on lang='en'; mean weight of en docs must
    // exceed mean weight of the rest (the model prefers its own domain).
    val w = SparkEntry.queries("q249_dsir_weights")(spark, sf)
      .join(Tables.table(spark, sf, "documents").select("doc_id", "lang"),
        "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("weight_mlb")).as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(w(true) > w(false))
  }

  test("rrf fusion: scores recompute from the reported leg ranks, order total") {
    val rows = graft.operators.RetrievalOps
      .queries("q298_rrf_fusion")(spark, sf).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getLong(3), r.getLong(4)))
    assert(rows.length == 20)
    assert(rows.map(_._5).sorted.toSeq == (1L to 20L))
    rows.foreach { case (id, lex, den, rrf, _) =>
      val expect = lex.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        den.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf == expect, s"doc $id rrf mismatch")
      assert(lex.isDefined || den.isDefined)
    }
    // the fused order really is (rrf desc, doc_id asc)
    val sorted = rows.sortBy { case (id, _, _, rrf, _) => (-rrf, id) }
    assert(sorted.map(_._5).toSeq == (1L to 20L),
      "fused ranking must order by (rrf desc, doc_id)")
    // both legs contribute to the fused head (it is a real fusion, not
    // one leg passing through)
    assert(rows.exists(_._2.isDefined) && rows.exists(_._3.isDefined))
  }
}
