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
}
