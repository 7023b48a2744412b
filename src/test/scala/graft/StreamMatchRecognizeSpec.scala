package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MatchRecognize

/** Streaming MATCH_RECOGNIZE must equal the batch operator on the same
  * data: matches finalize at the watermark, ordinals continue across
  * micro-batches, state prunes to the within horizon. */
class StreamMatchRecognizeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private lazy val eventRows: Seq[SEv] =
    Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"))
      .as[SEv].collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id)).take(600)

  test("SKIP TO NEXT ROW: overlapping matches survive batch boundaries") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[SEv]
    val out = MatchRecognize.annotateStream[Long, SEv](
      mem.toDS().withWatermark("ts", "1 second").groupByKey(_.user_id),
      orderTs = _.ts.getTime, tiebreak = _.event_id,
      // contiguous overlap: "A A" over a run of three a's shares the
      // middle row between two matches — found only under skip-to-next
      pattern = "A A",
      define = Seq("A" -> ((e: SEv) => e.event_type == "a")),
      withinMs = 10000L, skip = MatchRecognize.SkipToNextRow)
    val q = out.map(t => (t._2, t._3, t._4.event_id))
      .toDF("mid", "var", "id")
      .writeStream.format("memory").queryName("s_mr_over")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    def ev(id: Long, ms: Long, tp: String) =
      SEv(id, new Timestamp(ms), 1L, tp, 0.0)
    try {
      // the a-run splits across batches; both overlapping pairs emit
      mem.addData(ev(1, 1000, "a"), ev(2, 2000, "a"))
      q.processAllAvailable()
      mem.addData(ev(3, 3000, "a"))
      q.processAllAvailable()
      mem.addData(ev(99, 60000, "x")) // watermark push finalizes both
      q.processAllAvailable()
      mem.addData(ev(98, 120000, "x"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_mr_over")
      .select("mid", "var", "id").as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "A", 1L), (1L, "A", 2L),
                      (2L, "A", 2L), (2L, "A", 3L)))
  }

  test("SQL stream ONE ROW PER MATCH equals batch dual on out-of-order input") {
    implicit val sc = spark.sqlContext
    val clause =
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES FIRST(A.event_id) AS first_id, LAST(B.event_id) AS last_id,
        |         COUNT(B.*) AS n_b, sum(B.value) AS b_value
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A B+) WITHIN INTERVAL '1' DAY
        |DEFINE A AS event_type = 'purchase', B AS event_type = 'click'
        |""".stripMargin
    val mem = MemoryStream[SEv]
    val src = mem.toDS().toDF().withWatermark("ts", "7 days")
    val sm = graft.streaming.MatchRecognizeSql.stream(src, clause)
    val dir = java.nio.file.Files.createTempDirectory("mr_stream").toString
    val q = sm.start(s"$dir/out", s"$dir/ck")
    val rnd = new scala.util.Random(42)
    try {
      // shuffle each chunk: arrival order within a micro-batch is
      // arbitrary; chunks stay time-ordered so nothing is late-dropped
      eventRows.grouped(150).foreach { c =>
        mem.addData(rnd.shuffle(c): _*); q.processAllAvailable()
      }
      val last = eventRows.last
      mem.addData(SEv(-1L, new Timestamp(last.ts.getTime + 30L * 86400 * 1000),
        -1L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("mr_match"), col("first_id"),
        col("last_id"), col("n_b"), round(col("b_value"), 3).as("bv"))
      .collect().map(_.toSeq).toSet
    val got = canon(
      graft.streaming.MatchRecognizeSql.readMatches(spark, s"$dir/out"))
    val exp = canon(graft.streaming.MatchRecognizeSql(eventRows.toDF(), clause))
    assert(got.nonEmpty)
    assert(got == exp)

    // DEFINE with PREV/NEXT must be rejected up front on streams
    val err = intercept[IllegalArgumentException] {
      graft.streaming.MatchRecognizeSql.stream(src,
        """PARTITION BY user_id ORDER BY ts, event_id
          |MEASURES COUNT(*) AS n ONE ROW PER MATCH
          |PATTERN (A B) WITHIN INTERVAL '1' DAY
          |DEFINE A AS event_type = 'purchase',
          |       B AS value > PREV(value)""".stripMargin)
    }
    assert(err.getMessage.contains("PREV"))
  }

  test("streaming annotate equals batch annotate with WITHIN") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val out = MatchRecognize.annotateStream[Long, SEv](
      mem.toDS().withWatermark("ts", "10 minutes").groupByKey(_.user_id),
      orderTs = _.ts.getTime, tiebreak = _.event_id,
      pattern = "A B+",
      define = Seq(
        "A" -> ((e: SEv) => e.event_type == "purchase"),
        "B" -> ((e: SEv) => e.event_type == "click")),
      withinMs = 86400000L)
    val q = out.map(t => (t._1, t._2, t._3, t._4.event_id))
      .toDF("user_id", "mid", "var", "event_id")
      .writeStream.format("memory").queryName("s_mr")
      .outputMode(OutputMode.Append).start()
    try {
      eventRows.grouped(150).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val last = eventRows.last
      mem.addData(SEv(-1L, new Timestamp(last.ts.getTime + 48L * 3600 * 1000),
        -1L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_mr").filter(col("user_id") =!= -1L)
      .select("user_id", "mid", "var", "event_id")
      .as[(Long, Long, String, Long)].collect().toSet

    val exp = MatchRecognize.annotate(
        eventRows.toDF(),
        partitionBy = Seq("user_id"),
        orderBy = Seq("ts", "event_id"),
        pattern = "A B+",
        define = Seq(
          "A" -> (col("event_type") === "purchase"),
          "B" -> (col("event_type") === "click")),
        within = Some((unix_millis(col("ts")), 86400000L)))
      .select(col("user_id"), col("mr_match"), col("mr_var"), col("event_id"))
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got.nonEmpty)
    assert(got == exp)
  }

  test("MATCH_RECOGNIZE idle-state TTL: an expired key's partial match does not resume") {
    implicit val sc = spark.sqlContext
    def ev(id: Long, ms: Long, tp: String) =
      SEv(id, new Timestamp(ms), 1L, tp, 0.0)
    // identical phases (incl. the idle gap) with and without TTL
    def run(name: String, ttl: Option[graft.streaming.Changelog.IdleStateTtl])
        : Set[(Long, String, Long)] = {
      val mem = MemoryStream[SEv]
      val out = MatchRecognize.annotateStream[Long, SEv](
        mem.toDS().withWatermark("ts", "1 second").groupByKey(_.user_id),
        orderTs = _.ts.getTime, tiebreak = _.event_id,
        pattern = "A B",
        define = Seq(
          "A" -> ((e: SEv) => e.event_type == "a"),
          "B" -> ((e: SEv) => e.event_type == "b")),
        withinMs = 60000L, ttl = ttl)
      val q = out.map(t => (t._2, t._3, t._4.event_id))
        .toDF("mid", "var", "id")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        mem.addData(ev(1, 1000, "a")) // the A prefix buffers
        q.processAllAvailable()
        Thread.sleep(4500L)           // idle past the 2 s retention
        // the closer, still inside the 60 s event-time horizon
        mem.addData(ev(2, 2000, "b"))
        q.processAllAvailable()
        mem.addData(ev(99, 600000, "x")); q.processAllAvailable()
        mem.addData(ev(98, 1200000, "x")); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).select("mid", "var", "id")
        .as[(Long, String, Long)].collect().toSet
    }
    assert(run("s_mr_nottl", None) ==
      Set((1L, "A", 1L), (1L, "B", 2L)))
    assert(run("s_mr_ttl",
      Some(graft.streaming.Changelog.IdleStateTtl(2000L))) == Set.empty)
  }
}
