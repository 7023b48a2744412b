package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Cep
import graft.streaming.Cep.{Match, Pattern, Step}

case class CEv(id: Long, t: Long, kind: String)
case class WEv(id: Long, t: Long, kind: String, ets: Timestamp)

class CepSpec extends AnyFunSuite {
  lazy val spark = graft.TestSession.spark
  import spark.implicits._

  private val abc = Pattern[CEv](Seq(
    Step[CEv]("a", _.kind == "a"),
    Step[CEv]("b", _.kind == "b"),
    Step[CEv]("c", _.kind == "c")), withinMs = Some(100L))

  private def ids(m: Seq[CEv]) = m.map(_.id)

  test("matchSeq enumerates all relaxed matches within window") {
    val evs = IndexedSeq(
      CEv(1, 0, "a"), CEv(2, 10, "b"), CEv(3, 20, "b"),
      CEv(4, 30, "c"), CEv(5, 200, "c"))
    val ms = Cep.matchAll(abc, evs, (_: CEv).t).map(ids)
    // both b's combine with the single a and the in-window c
    assert(ms.toSet == Set(Seq(1L, 2L, 4L), Seq(1L, 3L, 4L)))
  }

  test("matchSeq within-window excludes expired completions") {
    val evs = IndexedSeq(CEv(1, 0, "a"), CEv(2, 50, "b"), CEv(3, 150, "c"))
    assert(Cep.matchAll(abc, evs, (_: CEv).t).isEmpty)
  }

  test("strict contiguity (next) requires adjacency") {
    val strict = Pattern[CEv](Seq(
      Step[CEv]("a", _.kind == "a"),
      Step[CEv]("b", _.kind == "b", strict = true)), withinMs = None)
    val hit = Cep.matchAll(strict,
      IndexedSeq(CEv(1, 0, "a"), CEv(2, 1, "b")), (_: CEv).t)
    val miss = Cep.matchAll(strict,
      IndexedSeq(CEv(1, 0, "a"), CEv(9, 1, "x"), CEv(2, 2, "b")), (_: CEv).t)
    assert(hit.map(ids) == Seq(Seq(1L, 2L)) && miss.isEmpty)
  }

  test("skip-past-last consumes matched events greedily") {
    val p = abc.copy(skipPastLast = true)
    val evs = IndexedSeq(
      CEv(1, 0, "a"), CEv(2, 10, "b"), CEv(3, 20, "c"),
      CEv(4, 30, "a"), CEv(5, 40, "b"), CEv(6, 50, "c"))
    assert(Cep.matchAll(p, evs, (_: CEv).t).map(ids)
      == Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))
  }

  test("batch CEP over Dataset matches per-key sequential matcher") {
    val evs = (0 until 50).map { i =>
      CEv(i, i * 7L, Seq("a", "b", "x", "c")(i % 4))
    } ++ (100 until 140).map { i => CEv(i, (i - 100) * 11L, Seq("a", "c", "b")(i % 3)) }
    val ds = evs.toDS()
    val got = Cep.matchBatch[Long, CEv](ds, abc, _.id % 3, _.t, _.id)
      .collect().map(m => (m.key, ids(m.events))).toSet
    // note .toSeq before flatMap: flatMapping a Map over pair results
    // would collapse to one match per key
    val exp = evs.groupBy(_.id % 3).toSeq.flatMap { case (k, xs) =>
      val sorted = xs.sortBy(e => (e.t, e.id)).toIndexedSeq
      Cep.matchAll(abc, sorted, (_: CEv).t).map(m => (k, ids(m)))
    }.toSet
    assert(got == exp && got.nonEmpty)
  }

  test("oneOrMore: greedy-maximal consecutive runs, enumerate-all entry") {
    val p = Pattern[CEv](Seq(
      Step[CEv]("a", _.kind == "a"),
      Step[CEv]("b", _.kind == "b", maxTimes = Cep.Unbounded)), withinMs = None)
    val evs = IndexedSeq(
      CEv(1, 0, "a"), CEv(2, 10, "b"), CEv(3, 20, "b"), CEv(4, 30, "x"),
      CEv(5, 40, "b"))
    val ms = Cep.matchAll(p, evs, (_: CEv).t).map(ids).toSet
    // runs are [2,3] and [5]; relaxed entry enumerates every suffix of
    // each run after the 'a'; greedy extension forbids sub-runs [2] alone.
    assert(ms == Set(Seq(1L, 2L, 3L), Seq(1L, 3L), Seq(1L, 5L)))
  }

  test("oneOrMore closing event can start the next match (skip-past-last)") {
    val p = Pattern[CEv](Seq(
      Step[CEv]("a", _.kind == "a"),
      Step[CEv]("b", _.kind == "b", strict = true, maxTimes = Cep.Unbounded)),
      withinMs = None, skipPastLast = true)
    val evs = IndexedSeq(
      CEv(1, 0, "a"), CEv(2, 10, "b"), CEv(3, 20, "b"),
      CEv(4, 30, "a"), CEv(5, 40, "b"))
    // match 1 = [1,2,3] closes at event 4, which must itself start match 2
    assert(Cep.matchAll(p, evs, (_: CEv).t).map(ids)
      == Seq(Seq(1L, 2L, 3L), Seq(4L, 5L)))
  }

  test("timesOrMore(2): bounded lead copies then unbounded loop") {
    val p = Pattern[CEv](Seq(
      Step[CEv]("b", _.kind == "b", minTimes = 2, maxTimes = Cep.Unbounded)),
      withinMs = None)
    val evs = IndexedSeq(
      CEv(1, 0, "b"), CEv(2, 10, "b"), CEv(3, 20, "b"), CEv(4, 30, "x"))
    val ms = Cep.matchAll(p, evs, (_: CEv).t).map(ids).toSet
    // ≥2 consecutive b's, greedy to run end: suffixes of length ≥ 2
    assert(ms == Set(Seq(1L, 2L, 3L), Seq(2L, 3L)))
  }

  test("strict-entry oneOrMore equals MATCH_RECOGNIZE 'A B+'") {
    val df = (0 until 60).map { i =>
      (i.toLong % 5, i.toLong, if (i % 4 == 0) "a" else if (i % 4 == 3) "x" else "b")
    }.toDF("k", "seq", "kind")
    val mr = graft.streaming.MatchRecognize.annotate(
        df, Seq("k"), Seq("seq"), "A B+",
        Seq("A" -> (org.apache.spark.sql.functions.col("kind") === "a"),
            "B" -> (org.apache.spark.sql.functions.col("kind") === "b")))
      .groupBy("k", "mr_match")
      .agg(org.apache.spark.sql.functions.min("seq").as("s"),
           org.apache.spark.sql.functions.max("seq").as("e"),
           org.apache.spark.sql.functions.count(
             org.apache.spark.sql.functions.lit(1)).as("n"))
      .select("k", "s", "e", "n")
      .as[(Long, Long, Long, Long)].collect().toSet
    val p = Pattern[CEv](Seq(
      Step[CEv]("a", _.kind == "a"),
      Step[CEv]("b", _.kind == "b", strict = true, maxTimes = Cep.Unbounded)),
      withinMs = None, skipPastLast = true)
    val cep = Cep.matchBatch[Long, CEv](
        df.as[(Long, Long, String)].map(t => CEv(t._2, t._2, t._3)).as[CEv],
        p, _.id % 5, _.t, _.id)
      .collect()
      .map(m => (m.key, m.events.head.id, m.events.last.id, m.events.length.toLong))
      .toSet
    assert(cep == mr && cep.nonEmpty)
  }

  test("oneOrMore run closed by an out-of-window event still emits") {
    // Every event of the run is inside the within-window; the event that
    // CLOSES the run merely falls outside it. The run must be emitted
    // exactly as the end-of-input sweep would emit it — dropping it would
    // make matches depend on whether a later event happens to exist.
    val p = Pattern[CEv](Seq(
      Step[CEv]("a", _.kind == "a"),
      Step[CEv]("b", _.kind == "b", maxTimes = Cep.Unbounded)),
      withinMs = Some(50L))
    val evs = IndexedSeq(
      CEv(1, 0, "a"), CEv(2, 10, "b"), CEv(3, 20, "b"), CEv(9, 200, "x"))
    val withTrailing = Cep.matchAll(p, evs, (_: CEv).t).map(ids)
    val noTrailing = Cep.matchAll(p, evs.dropRight(1), (_: CEv).t).map(ids)
    // enumerate-all relaxed entry: run [2,3] plus its suffix [3]
    assert(withTrailing.toSet == Set(Seq(1L, 2L, 3L), Seq(1L, 3L)))
    assert(withTrailing == noTrailing)
    // skip-past-last: the out-of-window closer stays eligible to START
    // the next match (it is not part of the emitted run)
    val p2 = p.copy(skipPastLast = true)
    val evs2 = IndexedSeq(
      CEv(1, 0, "a"), CEv(2, 10, "b"), CEv(3, 20, "b"),
      CEv(4, 200, "a"), CEv(5, 210, "b"))
    assert(Cep.matchAll(p2, evs2, (_: CEv).t).map(ids)
      == Seq(Seq(1L, 2L, 3L), Seq(4L, 5L)))
  }

  test("streaming CEP emits finalized matches and matches batch result") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CEv]
    // keep the watermarked event-time column INSIDE the element type —
    // a typed map that drops it would detach the watermark from the plan
    val pattern = Pattern[WEv](Seq(
      Step[WEv]("a", _.kind == "a"),
      Step[WEv]("b", _.kind == "b"),
      Step[WEv]("c", _.kind == "c")), withinMs = Some(60000L))
    val base = 1700000000000L
    val evs = Seq(
      CEv(1, base, "a"), CEv(2, base + 1000, "b"), CEv(3, base + 2000, "c"),
      CEv(4, base + 100000, "a"), CEv(5, base + 101000, "b"),
      CEv(6, base + 102000, "c"))
    val ds = mem.toDS()
      .withColumn("ets", ($"t" / 1000).cast("timestamp"))
      .withWatermark("ets", "1 second")
      .as[WEv]
    val out = Cep.matchStream[Long, WEv](
      ds.groupByKey(_ => 0L), pattern, _.t)
    val q = out.map(m => m.events.map(_.id).mkString("-"))
      .writeStream.format("memory").queryName("s_cep")
      .outputMode(OutputMode.Append).start()
    try {
      evs.grouped(3).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      // sentinel advances the watermark past everything
      mem.addData(CEv(99, base + 10000000, "x")); q.processAllAvailable()
      mem.addData(CEv(98, base + 20000000, "x")); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_cep").as[String].collect().toSet
    assert(got == Set("1-2-3", "4-5-6"))
  }

  test("streaming CEP idle-state TTL: an expired key's partial match does not resume") {
    implicit val sc = spark.sqlContext
    val pattern = Pattern[WEv](Seq(
      Step[WEv]("a", _.kind == "a"),
      Step[WEv]("b", _.kind == "b"),
      Step[WEv]("c", _.kind == "c")), withinMs = Some(60000L))
    val base = 1700000000000L
    // identical phases (incl. the idle gap) with and without TTL — the
    // retention is the only difference, so it is the cause
    def run(name: String, ttl: Option[graft.streaming.Changelog.IdleStateTtl])
        : Set[String] = {
      val mem = MemoryStream[CEv]
      val ds = mem.toDS()
        .withColumn("ets", ($"t" / 1000).cast("timestamp"))
        .withWatermark("ets", "1 second")
        .as[WEv]
      val out = Cep.matchStream[Long, WEv](
        ds.groupByKey(_ => 0L), pattern, _.t, ttl = ttl)
      val q = out.map(m => m.events.map(_.id).mkString("-"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        // phase 1: the a-b PREFIX of a match, in one batch
        mem.addData(CEv(1, base, "a"), CEv(2, base + 1000, "b"))
        q.processAllAvailable()
        Thread.sleep(4500L) // idle past the 2 s retention
        // phase 2: the closer, still INSIDE the 60 s event-time horizon
        mem.addData(CEv(3, base + 2000, "c"))
        q.processAllAvailable()
        // sentinels flush the watermark past everything
        mem.addData(CEv(99, base + 10000000, "x")); q.processAllAvailable()
        mem.addData(CEv(98, base + 20000000, "x")); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).as[String].collect().toSet
    }
    assert(run("s_cep_nottl", None) == Set("1-2-3"))
    assert(run("s_cep_ttl",
      Some(graft.streaming.Changelog.IdleStateTtl(2000L))) == Set.empty)
  }

  test("a drained CEP key removes its state entry (no ever-seen-key leak)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CEv]
    val pattern = Pattern[WEv](Seq(
      Step[WEv]("a", _.kind == "a"),
      Step[WEv]("b", _.kind == "b")), withinMs = Some(60000L))
    val base = 1700000000000L
    val ds = mem.toDS()
      .withColumn("ets", ($"t" / 1000).cast("timestamp"))
      .withWatermark("ets", "1 second")
      .as[WEv]
    // the match lives on key 1; sentinels ride key 99 so advancing the
    // watermark never re-touches the drained key with data
    val out = Cep.matchStream[Long, WEv](
      ds.groupByKey(e => if (e.kind == "x") 99L else 1L), pattern, _.t)
    val ck = java.nio.file.Files.createTempDirectory("cep_drain_ck").toString
    val q = out.map(m => m.events.map(_.id).mkString("-"))
      .writeStream.format("memory").queryName("s_cep_drain")
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CEv(1, base, "a"), CEv(2, base + 1000, "b"))
      q.processAllAvailable()
      // sentinels push the watermark far past key 1's horizon: its
      // event-time timeout fires, the buffer flushes (match emitted),
      // pending empties — the entry must be REMOVED, not parked empty
      mem.addData(CEv(99, base + 10000000, "x")); q.processAllAvailable()
      mem.addData(CEv(98, base + 20000000, "x")); q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("s_cep_drain").as[String].collect().toSet == Set("1-2"))
    // empirical state audit: only the sentinel key's pending tail may
    // remain; the drained key must have NO entry (pre-fix it kept an
    // empty-buffer row per ever-seen key, forever)
    val keys = spark.read.format("statestore").load(ck)
      .selectExpr("key.value AS k").as[Long].collect().toSet
    assert(!keys.contains(1L), s"drained key 1 still holds state: $keys")
    assert(keys.contains(99L)) // the read itself is live, not vacuous
  }
}
