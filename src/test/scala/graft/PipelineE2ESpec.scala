package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, PipelineOps}

/**
 * Batch end-to-end training-set build — the capstone composition the
 * individual oracle queries exist FOR (the batch dual of
 * StreamingSpec's composite replay case):
 *
 *   quality gates → exact-dup removal → near-dup (MinHash signature)
 *   representative selection → benchmark decontamination → budgeted
 *   selection.
 *
 * Each stage is the operator the per-query oracle already proved; the
 * spec asserts the CROSS-STAGE invariants a user relies on: survivors
 * pass every gate, contain no exact or signature-level duplicates, no
 * contaminated docs, the budget holds, and the whole build is
 * deterministic end to end.
 */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("train-set build: gates → dedup chain → decontam → budget, " +
    "deterministic with all invariants holding") {
    def build() = {
      val docs = Tables.table(spark, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .withColumn("nt", size(col("toks")).cast("long"))
        .withColumn("nd", size(array_distinct(col("toks"))).cast("long"))
      // 1. quality gates (q169's integer-arithmetic thresholds)
      val gated = docs.filter(col("n_chars") >= 100 && col("nt") >= 20 &&
        (col("nt") - col("nd")) * 10 <= col("nt") * 6)
      // 2. exact dedup: keep min doc_id per md5(text)
      val exactRep = gated
        .withColumn("eh", md5(col("text")))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("eh")).orderBy(col("doc_id"))))
        .filter(col("rk") === 1).drop("rk", "eh")
      // 3. near-dup: keep min doc_id per MinHash signature key
      val sigRep = exactRep
        .withColumn("sk", DedupOps.minhashSigKey("text"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("sk")).orderBy(col("doc_id"))))
        .filter(col("rk") === 1).drop("rk")
      // 4. decontamination: drop docs q140 flags (plus the eval slice)
      val contaminated = PipelineOps.queries("q140_decontaminate")(spark, dir)
        .filter(col("contaminated") === 1).select(col("doc_id"))
      val clean = sigRep.filter(col("doc_id") % 20 =!= 7)
        .join(contaminated, Seq("doc_id"), "left_anti")
      // 5. budgeted selection: longest-first fill to 6000 tokens
      val selected = graft.operators.GlobalRank.withCumSum(
          clean.select(col("doc_id"), col("text"), col("sk"), col("nt")),
          Seq(col("nt").desc, col("doc_id")), col("nt"),
          outCol = "cum_tokens")
        .filter(col("cum_tokens") <= 6000)
      selected
    }

    val sel = build().cache()
    val rows = sel.collect()
    assert(rows.nonEmpty, "budget admits at least one doc")
    // budget invariant
    assert(rows.map(_.getAs[Long]("cum_tokens")).max <= 6000)
    assert(rows.map(_.getAs[Long]("nt")).sum <= 6000)
    // no exact or near duplicates among survivors
    assert(sel.select("text").distinct().count() == sel.count())
    assert(sel.select("sk").distinct().count() == sel.count())
    // no contaminated survivors, eval slice excluded
    val contam = PipelineOps.queries("q140_decontaminate")(spark, dir)
      .filter(col("contaminated") === 1).select("doc_id")
    assert(sel.join(contam, "doc_id").count() == 0)
    assert(rows.forall(_.getAs[Long]("doc_id") % 20 != 7))
    // gates hold on every survivor (recomputed independently)
    val bad = sel.withColumn("toks2", split(trim(col("text")), "\\s+"))
      .withColumn("nt2", size(col("toks2")).cast("long"))
      .withColumn("nd2", size(array_distinct(col("toks2"))).cast("long"))
      .filter(!(col("nt2") >= 20 &&
        (col("nt2") - col("nd2")) * 10 <= col("nt2") * 6))
    assert(bad.count() == 0)
    // determinism: a rebuilt pipeline selects the identical set
    val again = build().select("doc_id", "cum_tokens")
    assert(again.except(sel.select("doc_id", "cum_tokens")).isEmpty &&
      sel.select("doc_id", "cum_tokens").except(again).isEmpty)
  }
}
