package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ReplayQueries

/**
 * The oracle-gated replay queries claim their final state is
 * batch-boundary-independent — that is what lets an unbounded execution
 * sit under a hash-matching gate at all. This spec replays the hardest
 * one (three chained stateful operators: changelog aggregate x2 ▸
 * per-record incremental changelog join ▸ materialize) under DIFFERENT
 * micro-batch splits and asserts bit-identical results.
 */
class ReplaySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("changelog-join replay: one giant batch == four micro-batches, " +
    "bit-identical final state") {
    def run(nFiles: Int, fpt: Int): Set[(Long, Double, Long, Double, Long)] =
      ReplayQueries.changelogJoinReplay(spark, dir, nFiles, fpt)
        .selectExpr("user_id", "purchase_amt", "purchases",
                    "click_amt", "clicks")
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
                   r.getDouble(3), r.getLong(4)))
        .toSet
    val oneBatch = run(nFiles = 1, fpt = 1)
    val fourBatches = run(nFiles = 8, fpt = 2)
    assert(oneBatch.nonEmpty, "replay produced rows")
    assert(oneBatch == fourBatches,
      "final materialized state must not depend on micro-batch boundaries")
  }

  test("semi/anti existence-join replay: one giant batch == four " +
    "micro-batches, bit-identical final state") {
    // q304/q305's claim: threshold crossings of the right-side agg view
    // retract/admit left rows such that the FINAL state equals the batch
    // EXISTS/NOT-EXISTS dual regardless of micro-batch boundaries.
    def run(anti: Boolean, nFiles: Int, fpt: Int): Set[(Long, Double, Long)] =
      ReplayQueries.existenceJoinReplay(spark, dir, anti, nFiles, fpt)
        .selectExpr("user_id", "purchase_amt", "purchases")
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
    for (anti <- Seq(false, true)) {
      val oneBatch = run(anti, nFiles = 1, fpt = 1)
      val fourBatches = run(anti, nFiles = 8, fpt = 2)
      assert(oneBatch.nonEmpty, s"anti=$anti replay produced rows")
      assert(oneBatch == fourBatches,
        s"anti=$anti final state must not depend on micro-batch boundaries")
    }
  }

  test("watermark-ordered over-window replay: 1, 2 and 4 ts-slices emit " +
    "identical rows") {
    // the stageOrdered path (sessions/CEP/over/count-window gates) rests
    // on the claim that watermark-ordered emission is independent of how
    // event time is sliced into micro-batches — assert it on the overAgg
    // gate, which emits one row PER EVENT (the finest-grained check).
    def run(n: Int): Set[(Long, Long, Long, Double)] =
      ReplayQueries.overReplay(spark, dir, nSlices = n)
        .selectExpr("user_id", "t_ms", "event_id", "run_min")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val one = run(1)
    val two = run(2)
    val four = run(4)
    assert(one.nonEmpty, "replay produced rows")
    assert(one == two && two == four,
      "per-row emissions must not depend on ts-slice boundaries")
  }

  test("streaming ingest-dedup replay: 1 and 5 doc_id-slices admit the " +
    "identical keeper set") {
    // each micro-batch admits its per-digest min(doc_id) and slices are
    // doc_id-ordered, so the admitted doc must be the GLOBAL min per
    // digest regardless of slicing — the q303 determinism claim.
    def run(n: Int): Set[(Long, String, Long)] =
      ReplayQueries.ingestDedupReplay(spark, dir, nSlices = n)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    val one = run(1)
    val five = run(5)
    assert(one.nonEmpty, "replay admitted rows")
    assert(one == five, "admitted set must not depend on slice boundaries")
  }
}
