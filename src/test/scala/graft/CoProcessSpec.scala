package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{CoProcess, ReplayQueries}

/**
 * Keyed two-input connect (`streaming.CoProcess`, the
 * KeyedCoProcessFunction analogue) — unit semantics on a controlled
 * MemoryStream plus the batch-boundary-independence claim its oracle
 * gate (q268) rests on.
 */
class CoProcessSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Drive CoProcess.connect over explicit micro-batches of
    * (key, ts, tie, side, value) control/data rows. */
  private def drive(batches: Seq[Seq[(Long, Long, Long, Int, Double)]])
      : Seq[(Long, Long, Double, Double)] = {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Int, Double)]
    val src = mem.toDS()
    val ctrl = src.filter(_._4 == 0).map(r => (r._1, r._2, r._3, r._5))
    val data = src.filter(_._4 == 1).map(r => (r._1, r._2, r._3, (r._1, r._3, r._5)))
    val out = CoProcess.connect[Long, Double, (Long, Long, Double),
                                Double, (Long, Long, Double, Double)](
      ctrl, data,
      onLeft = (_, thr) => (Some(thr), Iterator.empty),
      onRight = (st, p) => (st, st match {
        case Some(thr) if p._3 > thr => Iterator((p._1, p._2, p._3, thr))
        case _ => Iterator.empty
      }))
    val q = out.writeStream.format("memory").queryName("coproc_spec")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("coproc_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
    } finally q.stop()
  }

  test("control before data at equal event time; state persists across batches") {
    // batch 1: set thr=5 at t=10, purchase 7 at t=10 (same instant →
    // control folds first, so the purchase sees thr=5 and fires);
    // purchase 3 at t=11 (under thr → silent).
    // batch 2: purchase 9 at t=20 — thr=5 survived the batch boundary.
    val out = drive(Seq(
      Seq((1L, 10L, 1L, 0, 5.0), (1L, 10L, 2L, 1, 7.0), (1L, 11L, 3L, 1, 3.0)),
      Seq((1L, 20L, 4L, 1, 9.0))))
    assert(out.toSet == Set((1L, 2L, 7.0, 5.0), (1L, 4L, 9.0, 5.0)))
  }

  test("per-key state isolation: keys never observe each other's control") {
    val out = drive(Seq(Seq(
      (1L, 10L, 1L, 0, 100.0),      // key 1 thr=100
      (2L, 11L, 2L, 1, 50.0),       // key 2 purchase, NO control yet → silent
      (1L, 12L, 3L, 1, 50.0))))     // key 1 purchase 50 < 100 → silent
    assert(out.isEmpty)
  }

  test("later control overwrites: only the latest threshold applies") {
    val out = drive(Seq(Seq(
      (1L, 10L, 1L, 0, 5.0),
      (1L, 11L, 2L, 0, 50.0),       // raises the bar
      (1L, 12L, 3L, 1, 20.0))))     // 20 < 50 → silent despite first thr=5
    assert(out.isEmpty)
  }

  test("q268 replay: 1, 2 and 4 ts-slices emit identical alert sets") {
    def run(n: Int): Set[(Long, Long, Double, Double)] =
      ReplayQueries.coProcessReplay(spark, dir, nSlices = n)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
    val one = run(1); val two = run(2); val four = run(4)
    assert(one.nonEmpty, "replay produced alerts")
    assert(one == two && two == four,
      "coprocess emissions must not depend on ts-slice boundaries")
  }

  test("q269 lateness replay: accepted-late set independent of main slicing") {
    def run(n: Int): Set[(String, Long, Long, Long)] =
      ReplayQueries.latenessReplay(spark, dir, nSlices = n)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val two = run(2); val three = run(3)
    assert(two.nonEmpty, "replay produced windows")
    assert(two == three,
      "sentinel watermark carriers must pin the late-filter watermark " +
        "to max(main) - delay regardless of slicing")
  }
}
