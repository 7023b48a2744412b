package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.OverWindow

case class OEv(k: Long, t: Long, v: Double, ets: Timestamp)

class OverWindowSpec extends AnyFunSuite {
  lazy val spark = graft.TestSession.spark
  import spark.implicits._

  private val base = 1700000000000L
  // two keys; equal-ts peers (t=3000 on key 1) exercise RANGE peer groups
  // time-ordered across keys so chunked arrival never crosses the
  // watermark (chunk boundary at t=3000 → wm=2000 < everything later)
  private val evs = Seq(
    (1L, 1000L, 2.0), (2L, 2000L, 1.0), (1L, 3000L, 3.0), (1L, 3000L, 5.0),
    (2L, 5000L, 4.0), (1L, 7000L, 7.0), (2L, 9000L, 6.0), (1L, 12000L, 11.0))

  private def runStreamAgg[A](frame: OverWindow.Frame,
                              agg: OverWindow.FoldAgg[OEv, A],
                              tag: String)(
      implicit se: org.apache.spark.sql.Encoder[(Seq[OEv], Seq[OEv], A, Long)])
      : Set[(Long, Long, Long, Double)] = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val ds = mem.toDS()
      .withColumn("ets", (($"_2" + base) / 1000).cast("timestamp"))
      .select($"_1".as("k"), ($"_2" + base).as("t"), $"_3".as("v"), $"ets")
      .withWatermark("ets", "1 second")
      .as[OEv]
    val out = OverWindow.overAgg[Long, OEv, A](
      ds.groupByKey(_.k), _.t, _.v.toLong, _.v, agg, frame)
    val name = s"ow_${tag}_${frame.hashCode.abs}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      evs.grouped(4).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      mem.addData((9L, 10000000L, 0.0)); q.processAllAvailable()
      mem.addData((9L, 20000000L, 0.0)); q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[(Long, Long, Long, Double)].collect().toSet
      .filter(_._1 != 9L)
  }

  private def runStream(frame: OverWindow.Frame): Set[(Long, Long, Long, Double)] =
    runStreamAgg(frame, OverWindow.sumAgg[OEv](_.v), "sum")

  private def batchDualAgg(aggCol: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                           w: Window.type => org.apache.spark.sql.expressions.WindowSpec)
      : Set[(Long, Long, Long, Double)] =
    evs.toDF("k", "t0", "v")
      .withColumn("t", $"t0" + base)
      .withColumn("agg", aggCol($"v").over(w(Window)).cast("double"))
      .select($"k", $"t", $"v".cast("long").as("tb"), $"agg")
      .as[(Long, Long, Long, Double)].collect().toSet

  private def batchDual(w: Window.type => org.apache.spark.sql.expressions.WindowSpec)
      : Set[(Long, Long, Long, Double)] =
    batchDualAgg(sum(_), w)

  test("unbounded-preceding running sum equals batch ROWS UNBOUNDED PRECEDING") {
    val got = runStream(OverWindow.UnboundedPreceding)
    val exp = batchDual(_.partitionBy("k").orderBy($"t", $"v".cast("long"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    assert(got == exp && got.nonEmpty)
  }

  test("range-bounded preceding equals batch RANGE BETWEEN x PRECEDING") {
    val got = runStream(OverWindow.RangePreceding(4000L))
    val exp = batchDual(_.partitionBy("k").orderBy($"t")
      .rangeBetween(-4000L, Window.currentRow))
    assert(got == exp && got.nonEmpty)
  }

  test("rows-bounded preceding equals batch ROWS BETWEEN n PRECEDING") {
    val got = runStream(OverWindow.RowsPreceding(1))
    val exp = batchDual(_.partitionBy("k").orderBy($"t", $"v".cast("long"))
      .rowsBetween(-1, Window.currentRow))
    assert(got == exp && got.nonEmpty)
  }

  test("min over ROWS-bounded frame equals batch") {
    val got = runStreamAgg(OverWindow.RowsPreceding(1),
      OverWindow.minAgg[OEv](_.v), "min")
    val exp = batchDualAgg(min(_), _.partitionBy("k")
      .orderBy($"t", $"v".cast("long"))
      .rowsBetween(-1, Window.currentRow))
    assert(got == exp && got.nonEmpty)
  }

  test("min over RANGE-bounded frame equals batch") {
    val got = runStreamAgg(OverWindow.RangePreceding(4000L),
      OverWindow.minAgg[OEv](_.v), "minr")
    val exp = batchDualAgg(min(_), _.partitionBy("k").orderBy($"t")
      .rangeBetween(-4000L, Window.currentRow))
    assert(got == exp && got.nonEmpty)
  }

  test("count over ROWS-bounded frame equals batch") {
    val got = runStreamAgg(OverWindow.RowsPreceding(2),
      OverWindow.countAgg[OEv], "cnt")
    val exp = batchDualAgg(count(_), _.partitionBy("k")
      .orderBy($"t", $"v".cast("long"))
      .rowsBetween(-2, Window.currentRow))
    assert(got == exp && got.nonEmpty)
  }

  test("count over RANGE-bounded frame equals batch") {
    val got = runStreamAgg(OverWindow.RangePreceding(4000L),
      OverWindow.countAgg[OEv], "cntr")
    val exp = batchDualAgg(count(_), _.partitionBy("k").orderBy($"t")
      .rangeBetween(-4000L, Window.currentRow))
    assert(got == exp && got.nonEmpty)
  }

  test("max and avg over unbounded frame equal batch") {
    val gotMax = runStreamAgg(OverWindow.UnboundedPreceding,
      OverWindow.maxAgg[OEv](_.v), "max")
    val expMax = batchDualAgg(max(_), _.partitionBy("k")
      .orderBy($"t", $"v".cast("long"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    assert(gotMax == expMax && gotMax.nonEmpty)
    val gotAvg = runStreamAgg(OverWindow.UnboundedPreceding,
      OverWindow.avgAgg[OEv](_.v), "avg")
    val expAvg = batchDualAgg(avg(_), _.partitionBy("k")
      .orderBy($"t", $"v".cast("long"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    assert(gotAvg == expAvg && gotAvg.nonEmpty)
  }

  test("too-late rows are dropped, on-time results unchanged") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val ds = mem.toDS()
      .withColumn("ets", (($"_2" + base) / 1000).cast("timestamp"))
      .select($"_1".as("k"), ($"_2" + base).as("t"), $"_3".as("v"), $"ets")
      .withWatermark("ets", "1 second")
      .as[OEv]
    val out = OverWindow.overSum[Long, OEv](
      ds.groupByKey(_.k), _.t, _.v.toLong, _.v, OverWindow.UnboundedPreceding)
    val q = out.writeStream.format("memory").queryName("ow_late")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, 1000L, 2.0), (1L, 60000L, 3.0)); q.processAllAvailable()
      // wm is now ~59s past epoch-base: this 5s event is too late
      mem.addData((1L, 5000L, 100.0)); q.processAllAvailable()
      mem.addData((9L, 10000000L, 0.0)); q.processAllAvailable()
      mem.addData((9L, 20000000L, 0.0)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ow_late").as[(Long, Long, Long, Double)]
      .collect().toSet.filter(_._1 == 1L)
    assert(got == Set((1L, base + 1000L, 2L, 2.0), (1L, base + 60000L, 3L, 5.0)))
  }
}
