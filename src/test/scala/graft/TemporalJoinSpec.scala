package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.streaming.{Changelog, TemporalJoin}

case class Probe(p_id: Long, p_user: Long, p_ts: Timestamp)
case class Ver(v_user: Long, v_ts: Timestamp, v_id: Long, v_val: Double)

/** Streaming temporal/as-of join: the stream result must equal the batch
  * dual (`AsOfJoin.leftAsOf`) on the same data, and a version arriving
  * AFTER a pending probe — even with an event time below the current
  * watermark — must still be matched (TemporalRowTimeJoinOperator
  * semantics: emission waits for the watermark, so the version set at the
  * probe's instant is complete). */
class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private lazy val eventRows =
    Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"))
      .as[SEv].collect().toSeq.sortBy(_.ts.getTime).take(600)

  test("streaming as-of join equals batch leftAsOf") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val ds = mem.toDS()
    val probes = ds.filter(_.event_type == "purchase")
      .map(e => Probe(e.event_id, e.user_id, e.ts))
    val vers = ds.filter(_.event_type == "click")
      .map(e => Ver(e.user_id, e.ts, e.event_id, e.value))
    val joined = TemporalJoin.streamAsOf[Probe, Ver](
      probes, vers, _.p_user, _.v_user, _.p_ts, _.v_ts, _.v_id, "10 minutes")
      .select(col("_1.p_id").as("p_id"), col("_2.v_id").as("v_id"))
    val q = joined.writeStream.format("memory").queryName("s_asof")
      .outputMode(OutputMode.Append).start()
    try {
      eventRows.grouped(200).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val last = eventRows.last
      mem.addData(SEv(-1L, new Timestamp(last.ts.getTime + 86400000L),
        -1L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_asof")

    val pb = eventRows.filter(_.event_type == "purchase")
      .map(e => Probe(e.event_id, e.user_id, e.ts)).toDF()
    val vb = eventRows.filter(_.event_type == "click")
      .map(e => Ver(e.user_id, e.ts, e.event_id, e.value)).toDF()
    val exp = AsOfJoin.leftAsOf(pb, vb, "p_user", "v_user", "p_ts", "v_ts",
        Seq("v_id"), "v_id")
      .select(col("p_id"), col("v_id"))
    assert(got.count() > 0)
    assert(got.count() == exp.count())
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
  }

  test("version arriving after the probe, out of order, still matches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val ds = mem.toDS()
    val probes = ds.filter(_.event_type == "p")
      .map(e => Probe(e.event_id, e.user_id, e.ts))
    val vers = ds.filter(_.event_type == "v")
      .map(e => Ver(e.user_id, e.ts, e.event_id, e.value))
    val joined = TemporalJoin.streamAsOf[Probe, Ver](
      probes, vers, _.p_user, _.v_user, _.p_ts, _.v_ts, _.v_id, "3 seconds")
      .select(col("_1.p_id").as("p_id"), col("_2.v_id").as("v_id"))
    val q = joined.writeStream.format("memory").queryName("s_asof_late")
      .outputMode(OutputMode.Append).start()
    def ev(id: Long, tsMs: Long, user: Long, tpe: String) =
      SEv(id, new Timestamp(tsMs), user, tpe, 0.0)
    try {
      // batch 1: version v1@1s, probe@5s (key 1), filler@7.9s (key 2)
      // → wm after batch = 4.9s: the probe stays pending (5s > 4.9s)
      mem.addData(ev(10, 1000, 1, "v"), ev(100, 5000, 1, "p"),
                  ev(999, 7900, 2, "v"))
      q.processAllAvailable()
      // batch 2: v2@4.95s — arriving AFTER the probe row, out of order
      // but inside the watermark delay — plus filler@8.1s pushing the
      // wm to 5.1s, which releases the probe on the following sweep.
      // (A version strictly below the watermark never reaches the
      // operator: SS's stateful late-data filter drops it — same
      // emission-at-watermark guarantee as the reference.)
      mem.addData(ev(11, 4950, 1, "v"), ev(998, 8100, 2, "v"))
      q.processAllAvailable()
      mem.addData(ev(997, 90000, 2, "v"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_asof_late").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exactly one emission for the probe, matched to the LATEST version
    // at or before 5s — the later-arriving v2@4.95s, not v1@1s
    assert(got.toSeq == Seq((100L, 11L)))
  }

  test("probes below the watermark at arrival are dropped — reference isLate semantics") {
    // The reference drops a probe whose rowtime is already below the
    // watermark when it arrives (TemporalRowTimeJoinOperator's isLate
    // path); this operator does the same via its ms >= wm guard.
    // DETERMINISTIC staging: one MemoryStream, explicit batches — the
    // versions batch advances the watermark to 4s BEFORE the probes
    // batch is processed, so probes at 0.5s/3s are late by construction
    // (no two-source batch race).
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val ds = mem.toDS()
    val probes = ds.filter(_.event_type == "p")
      .map(e => Probe(e.event_id, e.user_id, e.ts))
    val vers = ds.filter(_.event_type == "v")
      .map(e => Ver(e.user_id, e.ts, e.event_id, e.value))
    val joined = TemporalJoin.streamAsOf[Probe, Ver](
      probes, vers, _.p_user, _.v_user, _.p_ts, _.v_ts, _.v_id, "1 second")
      .select(col("_1.p_id").as("p_id"), col("_2.v_id").as("v_id"))
    val q = joined.writeStream.format("memory").queryName("s_asof_isl")
      .outputMode(OutputMode.Append).start()
    def ev(id: Long, tsMs: Long, user: Long, tpe: String) =
      SEv(id, new Timestamp(tsMs), user, tpe, 0.0)
    try {
      // batch 1: versions only → wm after the batch = 5s - 1s = 4s
      mem.addData(ev(10, 1000, 1, "v"), ev(11, 5000, 1, "v"))
      q.processAllAvailable()
      // batch 2 (processed AT wm = 4s): probes at 0.5s and 3s are late
      // → dropped; 5s and 9s are on time → buffered
      mem.addData(ev(100, 500, 1, "p"), ev(101, 3000, 1, "p"),
                  ev(102, 5000, 1, "p"), ev(103, 9000, 1, "p"))
      q.processAllAvailable()
      // flush: wm passes 9s, releasing the last pending probe
      mem.addData(ev(12, 1000000, 1, "v"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_asof_isl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ONLY the on-time probes emitted, both matched to v11@5s; the late
    // probes are silently dropped, never matched to a stale version
    assert(got == Set((102L, 11L), (103L, 11L)), s"got $got")
  }

  test("Bin payloads cross the join distinct per sweep — deterministic pre-start staging") {
    // Folded from the round-14 BinRepro isolation spec: multiple ready
    // probes in ONE emission sweep must each carry their OWN packed
    // payload image (a reused UnsafeRow buffer would alias them).
    // Staging is deterministic: all data enters BOTH MemoryStreams
    // before start(), so batch 0 reads both sources atomically at
    // wm = 0 and nothing is late.
    implicit val sc = spark.sqlContext
    implicit val pe: Encoder[(Long, Timestamp, Changelog.Bin)] = ExpressionEncoder()
    implicit val ve: Encoder[(Long, Timestamp, Long, Changelog.Bin)] = ExpressionEncoder()
    implicit val tagE: Encoder[TemporalJoin.TaggedK[
      Long, (Long, Timestamp, Changelog.Bin), (Long, Timestamp, Long, Changelog.Bin)]] = ExpressionEncoder()
    implicit val stE: Encoder[TemporalJoin.TJState[
      (Long, Timestamp, Changelog.Bin), (Long, Timestamp, Long, Changelog.Bin)]] = ExpressionEncoder()
    implicit val outE: Encoder[((Long, Timestamp, Changelog.Bin),
      Option[(Long, Timestamp, Long, Changelog.Bin)])] = ExpressionEncoder()

    val base = 1700000000000L
    val pmem = MemoryStream[(Long, Long, Long)]
    val vmem = MemoryStream[(Long, Long, Double, Long)]
    val pdf = pmem.toDS().select(col("_1").as("pk"), col("_2").as("pid"),
      timestamp_millis(col("_3") + base).as("pts"))
    val vdf = vmem.toDS().select(col("_1").as("vk"), col("_2").as("vid"),
      col("_3").as("vval"), timestamp_millis(col("_4") + base).as("vts"))

    val probes = pdf.select(col("pk").cast("long"), col("pts"),
      Changelog.packPayload(Seq("pk", "pid", "pts"))).as[(Long, Timestamp, Changelog.Bin)]
    val vers = vdf.select(col("vk").cast("long"), col("vts"),
      col("vid").cast("long"),
      Changelog.packPayload(Seq("vk", "vid", "vval", "vts")))
      .as[(Long, Timestamp, Long, Changelog.Bin)]

    val j = TemporalJoin.streamAsOfKeyed[Long, (Long, Timestamp, Changelog.Bin),
        (Long, Timestamp, Long, Changelog.Bin)](
      probes, vers, _._1, _._1, _._2, _._2, _._3, "1 second").toDF()

    val pSchema = pdf.schema
    val decoded = j.select(
      Changelog.unpackPayload(col("_1._3.bytes"), pSchema).as("__l"),
      col("_1._3.bytes").as("raw"))
      .select(col("__l.pid").as("pid"), hex(col("raw")).as("rawhex"))

    // ALL data staged before start: batch 0 sees both sources at wm=0
    vmem.addData((1L, 100L, 10.0, 1000L), (1L, 101L, 20.0, 5000L))
    pmem.addData((1L, 1L, 500L), (1L, 2L, 3000L), (1L, 3L, 5000L),
                 (1L, 4L, 9000L), (2L, 5L, 4000L))

    val sink = "bin_tj_sink"
    val q = decoded.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      pmem.addData((9L, 90L, 10000000L)) // flush: wm past every probe
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(sink).collect()
      .filter(_.getLong(0) < 90L)
    // every probe emitted exactly once...
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L),
      s"got ${rows.map(_.getLong(0)).toSet}")
    // ...and each carries its OWN payload image, no buffer aliasing
    assert(rows.map(_.getString(1)).distinct.length == rows.length,
      "aliased Bin payloads within a sweep")
  }

  test("version state is pruned below the watermark: retained rows measured, not assumed") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SEv]
    val ds = mem.toDS()
    val probes = ds.filter(_.event_type == "p")
      .map(e => Probe(e.event_id, e.user_id, e.ts))
    val vers = ds.filter(_.event_type == "v")
      .map(e => Ver(e.user_id, e.ts, e.event_id, e.value))
    val joined = TemporalJoin.streamAsOf[Probe, Ver](
      probes, vers, _.p_user, _.v_user, _.p_ts, _.v_ts, _.v_id, "1 second")
      .select(col("_1.p_id").as("p_id"), col("_2.v_id").as("v_id"))
    val ck = java.nio.file.Files.createTempDirectory("tj_prune_ck").toString
    val q = joined.writeStream.format("memory").queryName("s_asof_prune")
      .option("checkpointLocation", ck)
      .outputMode(OutputMode.Append).start()
    def ev(id: Long, tsMs: Long, user: Long, tpe: String) =
      SEv(id, new Timestamp(tsMs), user, tpe, 0.0)
    try {
      // 10 versions for key 1 land inside one batch; key 2 is filler
      // whose only job is to advance the watermark
      mem.addData(((1 to 10).map(i =>
        ev(i.toLong, i * 1000L, 1, "v")) :+ ev(900, 20000, 2, "v")): _*)
      q.processAllAvailable()
      // wm = 19s: the next touch of key 1 prunes versions 1..9 (all
      // below wm), keeping v10 as the current version plus the new one
      mem.addData(ev(11, 70000, 1, "v"), ev(901, 80000, 2, "v"))
      q.processAllAvailable()
      // wm = 79s: key 1 receives NO data — the prune timer registered
      // at v11's instant must fire on its own and shed the tail
      mem.addData(ev(902, 120000, 2, "v"))
      q.processAllAvailable()
    } finally q.stop()
    // read the checkpoint's state store: the empirical retained rows
    val st = spark.read.format("statestore").load(ck)
    val byKey = st.selectExpr("key.value AS k",
        "size(value.groupState.probes) AS n_probes",
        "size(value.groupState.versions) AS n_versions")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // 11 versions entered for key 1; only the current one (v11) survives
    assert(byKey(1L) == (0, 1),
      s"key 1 state not pruned to the single current version: $byKey")
    // invariant for every key: one current version plus live versions
    // still inside the watermark lag (key 2's last row IS above the
    // final watermark, so it legitimately holds current + live = 2)
    assert(byKey.values.forall(_._2 <= 2), s"unbounded version tail: $byKey")
  }
}
