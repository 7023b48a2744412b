package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Changelog

case class CRow(key: Long, kind: String, value: Double, ord: Long)

class ChangelogSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("materialize applies +I/+U/-D in order, last state wins") {
    val log = Seq(
      CRow(1, "+I", 10.0, 1), CRow(1, "+U", 11.0, 2), CRow(1, "+U", 12.0, 3),
      CRow(2, "+I", 20.0, 1), CRow(2, "-D", 20.0, 2),
      CRow(3, "+I", 30.0, 1), CRow(3, "-U", 30.0, 2) // -U alone: no effect
    ).toDF()
    val got = Changelog.materialize(log, "key", "kind", "ord")
      .select("key", "value").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 12.0), (3L, 30.0))) // key 2 deleted
  }

  test("streaming changelog aggregate emits -U/+U retraction pairs") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelog[CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value)
    val q = out.writeStream.format("memory").queryName("cl_agg")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 7.0, 2))
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 5.0, 3)) // retract the 5.0
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 7.0, 4)) // group count → 0: full delete
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_agg")
      .select("key", "kind", "sum", "count")
      .as[(Long, String, Double, Long)].collect().toList
    assert(got == List(
      (1L, "+U", 12.0, 2L),              // batch 1: new aggregate
      (1L, "-U", 12.0, 2L), (1L, "+U", 7.0, 1L), // batch 2: retract + update
      (1L, "-U", 7.0, 1L), (1L, "-D", 7.0, 1L))) // batch 3: retire group
  }

  test("retract-aware max: deleting the current max re-emits the runner-up") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelogMinMax[CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value, _.ord)
    val q = out.writeStream.format("memory").queryName("cl_minmax")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 9.0, 2), CRow(1, "+I", 7.0, 3))
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 9.0, 2)) // delete the row holding the max
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 5.0, 1)) // delete the row holding min+first
      q.processAllAvailable()
      mem.addData(CRow(1, "-D", 7.0, 3)) // group retires
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_minmax")
      .select("kind", "min", "max", "first", "last", "count")
      .as[(String, Double, Double, Double, Double, Long)].collect().toList
    assert(got == List(
      ("+U", 5.0, 9.0, 5.0, 7.0, 3L),                      // batch 1
      ("-U", 5.0, 9.0, 5.0, 7.0, 3L), ("+U", 5.0, 7.0, 5.0, 7.0, 2L), // max→7
      ("-U", 5.0, 7.0, 5.0, 7.0, 2L), ("+U", 7.0, 7.0, 7.0, 7.0, 1L), // min/first move
      ("-U", 7.0, 7.0, 7.0, 7.0, 1L), ("-D", 7.0, 7.0, 7.0, 7.0, 1L))) // retire
  }

  test("changelog aggregate emits nothing for no-op batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    val out = Changelog.aggregateChangelog[CRow](
      mem.toDS().groupByKey(_.key), _.kind, _.value)
    val q = out.writeStream.format("memory").queryName("cl_noop")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(9, "+I", 1.0, 1)); q.processAllAvailable()
      mem.addData(CRow(9, "+I", 2.0, 2), CRow(9, "-D", 2.0, 3)) // net zero
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("cl_noop").count()
    assert(rows == 1) // only the first batch's +U
  }

  test("changelog join: retractions, updates, duplicates, group retirement") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    val left = lMem.toDS().map(c => (c.key, c.kind, LSide(c.value)))
    val right = rMem.toDS().map(c => (c.key, c.kind, RSide(c.value)))
    val out = Changelog.joinChangelog(left, right)
    val q = out.writeStream.format("memory").queryName("cl_join")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: both sides arrive in ONE batch — exactly one +I, no
      // transient pair; duplicate left rows count twice
      lMem.addData(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 5.0, 2))
      rMem.addData(CRow(1, "+I", 100.0, 1))
      q.processAllAvailable()
      // batch 2: right-side update → each left instance retracts+reinserts
      rMem.addData(CRow(1, "-U", 100.0, 2), CRow(1, "+U", 200.0, 3))
      q.processAllAvailable()
      // batch 3: one left duplicate retracts → one -U, no +
      lMem.addData(CRow(1, "-D", 5.0, 3))
      q.processAllAvailable()
      // batch 4: last left row dies → join result empties with -D
      lMem.addData(CRow(1, "-D", 5.0, 4))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cl_join")
      .selectExpr("kind", "left.v", "right.v", "ord")
      .as[(String, Double, Double, Long)].collect().toList.sortBy(_._4)
    assert(got == List(
      ("+I", 5.0, 100.0, 1L), ("+I", 5.0, 100.0, 2L),          // batch 1
      ("-U", 5.0, 100.0, 3L), ("-U", 5.0, 100.0, 4L),          // batch 2
      ("+U", 5.0, 200.0, 5L), ("+U", 5.0, 200.0, 6L),
      ("-U", 5.0, 200.0, 7L),                                   // batch 3
      ("-D", 5.0, 200.0, 8L)))                                  // batch 4
  }

  test("agg ▸ joinChangelog ▸ materialize equals the batch join of the views") {
    implicit val sc = spark.sqlContext
    val lMem = MemoryStream[CRow]
    val rMem = MemoryStream[CRow]
    // two updating views: per-key SUM/COUNT over each raw changelog
    val lAgg = Changelog.aggregateChangelog[CRow](
        lMem.toDS().groupByKey(_.key), _.kind, _.value)
      .map(a => (a.key, a.kind, LAgg(a.sum, a.count)))
    val rAgg = Changelog.aggregateChangelog[CRow](
        rMem.toDS().groupByKey(_.key), _.kind, _.value)
      .map(a => (a.key, a.kind, RAgg(a.sum, a.count)))
    val out = Changelog.joinChangelog(lAgg, rAgg)
    val q = out.writeStream.format("memory").queryName("cl_compose")
      .outputMode(OutputMode.Append).start()
    val lRaw = scala.collection.mutable.ArrayBuffer.empty[CRow]
    val rRaw = scala.collection.mutable.ArrayBuffer.empty[CRow]
    def feed(ls: Seq[CRow], rs: Seq[CRow]): Unit = {
      lRaw ++= ls; rRaw ++= rs
      if (ls.nonEmpty) lMem.addData(ls: _*)
      if (rs.nonEmpty) rMem.addData(rs: _*)
      q.processAllAvailable()
    }
    try {
      feed(Seq(CRow(1, "+I", 5.0, 1), CRow(1, "+I", 7.0, 2),
               CRow(2, "+I", 20.0, 3)),
           Seq(CRow(1, "+I", 100.0, 1), CRow(2, "+I", 30.0, 2),
               CRow(3, "+I", 9.0, 3)))
      // out-of-order update: key 1 left loses the 5.0 while right updates
      feed(Seq(CRow(1, "-D", 5.0, 4)),
           Seq(CRow(1, "-D", 100.0, 4), CRow(1, "+I", 150.0, 5)))
      // key 2's left group retires entirely → join pair must vanish
      feed(Seq(CRow(2, "-D", 20.0, 5)), Seq.empty)
    } finally q.stop()
    val mat = Changelog.materialize(
        spark.table("cl_compose"), "key", "kind", "ord")
      .selectExpr("key", "left.sum", "left.count", "right.sum", "right.count")
      .as[(Long, Double, Long, Double, Long)].collect().toSet
    // batch reference: aggregate each side's final live rows, inner join
    def view(rows: Seq[CRow]): Map[Long, (Double, Long)] = rows
      .groupBy(_.key).flatMap { case (k, rs) =>
        val live = rs.foldLeft((0.0, 0L)) { (acc, r) =>
          if (r.kind == "+I" || r.kind == "+U") (acc._1 + r.value, acc._2 + 1)
          else (acc._1 - r.value, acc._2 - 1)
        }
        if (live._2 > 0) Some(k -> live) else None
      }
    val lv = view(lRaw.toSeq)
    val rv = view(rRaw.toSeq)
    val expected = (lv.keySet & rv.keySet).map { k =>
      (k, lv(k)._1, lv(k)._2, rv(k)._1, rv(k)._2)
    }
    assert(mat == expected)
    assert(mat == Set((1L, 7.0, 1L, 150.0, 1L))) // keys 2,3 must be gone
  }
}

case class LSide(v: Double)
case class RSide(v: Double)
case class LAgg(sum: Double, count: Long)
case class RAgg(sum: Double, count: Long)
