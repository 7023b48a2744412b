package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SqlFrontend
import graft.streaming.{StreamSql, TemporalJoin}

/**
 * Streaming-SQL reachability of the TIME-DOMAIN operators
 * (StreamSqlTime): OVER aggregates, interval joins planned from a
 * BETWEEN time bound, and streaming FOR SYSTEM_TIME AS OF — the repo's
 * analogue of the reference's StreamExecOverAggregate /
 * RowTimeBoundedStreamJoin / LogicalCorrelateToJoinFromTemporalTableRule
 * planning these from SQL text. Each SQL entry is checked against the
 * batch dual (the parity contract every streaming gate relies on).
 */
class StreamSqlTimeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def fresh(name: String): String =
    name + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  private val base = 1700000000000L

  // two keys; equal-ts peers (t=3000 on key 1) exercise the default
  // RANGE frame's peer semantics; time-ordered so chunked arrival never
  // crosses the 1s watermark
  private val evs = Seq(
    (1L, 1L, 2.0, 1000L), (2L, 2L, 1.0, 2000L), (1L, 3L, 3.0, 3000L),
    (1L, 4L, 5.0, 3000L), (2L, 5L, 4.0, 5000L), (1L, 6L, 7.0, 7000L),
    (2L, 7L, 6.0, 9000L), (1L, 8L, 11.0, 12000L))

  /** Register `evs` as a stream view, run `sql`, replay in chunks with
    * two far-future sentinels, return the sink rows. */
  private def runOverSql(sql: String => String): org.apache.spark.sql.DataFrame = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val df = mem.toDS()
      .select($"_1".as("k"), $"_2".as("id"), $"_3".as("v"),
              timestamp_millis($"_4" + base).as("ets"))
    val vn = fresh("ovv")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second",
      rowId = Some("id"))
    val out = SqlFrontend.sql(spark, sql(vn))
    val sink = fresh("ov_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      evs.grouped(4).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      mem.addData((9L, 90L, 0.0, 10000000L)); q.processAllAvailable()
      mem.addData((9L, 91L, 0.0, 20000000L)); q.processAllAvailable()
    } finally q.stop()
    StreamSql.dropStream(vn)
    spark.table(sink)
  }

  private def overDual(frame: Window.type => org.apache.spark.sql.expressions.WindowSpec,
                       agg: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Set[(Long, Long, Long, Double)] =
    evs.toDF("k", "id", "v", "t0")
      .withColumn("t", $"t0" + base)
      .withColumn("agg", agg($"v").over(frame(Window)).cast("double"))
      .select($"k", $"t", $"id", $"agg")
      .as[(Long, Long, Long, Double)].collect().toSet

  test("SQL OVER ROWS UNBOUNDED routes to overAgg and equals the batch dual") {
    val got = runOverSql(vn =>
      s"""SELECT k AS uid, ets AS ts, id AS rid,
                 SUM(v) OVER (PARTITION BY k ORDER BY ets, id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
          FROM $vn""")
      .filter($"uid" =!= 9L)
      .select($"uid", unix_millis($"ts"), $"rid", $"s")
      .as[(Long, Long, Long, Double)].collect().toSet
    val exp = overDual(_.partitionBy("k").orderBy($"t", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow), sum(_))
    assert(got == exp && got.nonEmpty)
  }

  test("SQL OVER with no frame uses SQL's default RANGE (peer-inclusive) semantics") {
    val got = runOverSql(vn =>
      s"""SELECT k AS uid, ets AS ts, id AS rid,
                 MIN(v) OVER (PARTITION BY k ORDER BY ets) AS m
          FROM $vn""")
      .filter($"uid" =!= 9L)
      .select($"uid", unix_millis($"ts"), $"rid", $"m")
      .as[(Long, Long, Long, Double)].collect().toSet
    // batch default frame over the same ORDER BY: RANGE UNBOUNDED
    // PRECEDING AND CURRENT ROW (peers at t=3000 share the value)
    val exp = overDual(_.partitionBy("k").orderBy($"t")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow), min(_))
    assert(got == exp && got.nonEmpty)
  }

  test("SQL OVER bounded frames: ROWS n PRECEDING and RANGE INTERVAL PRECEDING") {
    val gotRows = runOverSql(vn =>
      s"""SELECT k AS uid, ets AS ts, id AS rid,
                 AVG(v) OVER (PARTITION BY k ORDER BY ets, id
                   ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS a
          FROM $vn""")
      .filter($"uid" =!= 9L)
      .select($"uid", unix_millis($"ts"), $"rid", $"a")
      .as[(Long, Long, Long, Double)].collect().toSet
    val expRows = overDual(_.partitionBy("k").orderBy($"t", $"id")
      .rowsBetween(-1, Window.currentRow), avg(_))
    assert(gotRows == expRows && gotRows.nonEmpty)
    val gotRange = runOverSql(vn =>
      s"""SELECT k AS uid, ets AS ts, id AS rid,
                 COUNT(*) OVER (PARTITION BY k ORDER BY ets
                   RANGE BETWEEN INTERVAL '4' SECOND PRECEDING
                     AND CURRENT ROW) AS c
          FROM $vn""")
      .filter($"uid" =!= 9L)
      .select($"uid", unix_millis($"ts"), $"rid", $"c".cast("double"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val expRange = overDual(_.partitionBy("k").orderBy($"t")
      .rangeBetween(-4000L, Window.currentRow), count(_))
    assert(gotRange == expRange && gotRange.nonEmpty)
  }

  test("SQL interval join with a BETWEEN bound equals the batch dual") {
    implicit val sc = spark.sqlContext
    val pmem = MemoryStream[(Long, Long, Long)]
    val cmem = MemoryStream[(Long, Long, Long)]
    val pdf = pmem.toDS().select($"_1".as("pk"), $"_2".as("pid"),
      timestamp_millis($"_3" + base).as("pts"))
    val cdf = cmem.toDS().select($"_1".as("ck"), $"_2".as("cid"),
      timestamp_millis($"_3" + base).as("cts"))
    val pv = fresh("ivp"); val cv = fresh("ivc")
    StreamSql.registerStream(pv, pdf, tsCol = "pts", delay = "1 second")
    StreamSql.registerStream(cv, cdf, tsCol = "cts", delay = "1 second")
    val out = SqlFrontend.sql(spark,
      s"""SELECT p.pid, c.cid FROM $pv p JOIN $cv c
          ON p.pk = c.ck
         AND c.cts BETWEEN p.pts - INTERVAL '5' SECOND AND p.pts""")
    val sink = fresh("iv_sink")
    val ps = Seq((1L, 10L, 6000L), (1L, 11L, 20000L), (2L, 12L, 9000L))
    val cs = Seq((1L, 20L, 1000L), (1L, 21L, 5000L), (1L, 22L, 18000L),
                 (2L, 23L, 3000L), (2L, 24L, 9000L), (3L, 25L, 9000L))
    // both sources' first rows are buffered BEFORE the query starts so
    // batch 0 reads them together at watermark 0: with the query already
    // running, a trigger firing between the two addData calls advances
    // the watermark past the other source's rows and late-drops them
    pmem.addData(ps: _*); cmem.addData(cs: _*)
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      pmem.addData((9L, 0L, 10000000L)); cmem.addData((9L, 0L, 10000000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).filter($"pid" =!= 0L)
      .as[(Long, Long)].collect().toSet
    val exp = ps.toDF("pk", "pid", "pt").join(cs.toDF("ck", "cid", "ct"),
        $"pk" === $"ck" && $"ct" >= $"pt" - 5000L && $"ct" <= $"pt")
      .select($"pid", $"cid").as[(Long, Long)].collect().toSet
    assert(got == exp && got.nonEmpty)
    StreamSql.dropStream(pv); StreamSql.dropStream(cv)
  }

  test("SQL LEFT interval join null-pads unmatched probes once the watermark passes") {
    implicit val sc = spark.sqlContext
    val pmem = MemoryStream[(Long, Long, Long)]
    val cmem = MemoryStream[(Long, Long, Long)]
    val pdf = pmem.toDS().select($"_1".as("pk"), $"_2".as("pid"),
      timestamp_millis($"_3" + base).as("pts"))
    val cdf = cmem.toDS().select($"_1".as("ck"), $"_2".as("cid"),
      timestamp_millis($"_3" + base).as("cts"))
    val pv = fresh("ivlp"); val cv = fresh("ivlc")
    StreamSql.registerStream(pv, pdf, tsCol = "pts", delay = "1 second")
    StreamSql.registerStream(cv, cdf, tsCol = "cts", delay = "1 second")
    val out = SqlFrontend.sql(spark,
      s"""SELECT p.pid, c.cid FROM $pv p LEFT JOIN $cv c
          ON p.pk = c.ck
         AND c.cts BETWEEN p.pts - INTERVAL '5' SECOND AND p.pts""")
    val sink = fresh("ivl_sink")
    // pid 10 matches cid 20; pid 11 has no click in its window → padded
    val ps = Seq((1L, 10L, 6000L), (1L, 11L, 30000L))
    val cs = Seq((1L, 20L, 5000L))
    // both sources' first rows are buffered BEFORE the query starts so
    // batch 0 reads them together at watermark 0: with the query already
    // running, a trigger firing between the two addData calls advances
    // the watermark past the other source's rows and late-drops them
    pmem.addData(ps: _*); cmem.addData(cs: _*)
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // watermark far past both windows so the padded row finalizes
      pmem.addData((9L, 0L, 10000000L)); cmem.addData((9L, 0L, 10000000L))
      q.processAllAvailable()
      pmem.addData((9L, 1L, 20000000L)); cmem.addData((9L, 1L, 20000000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).filter($"pid" >= 10L && $"pid" < 90L)
      .as[(Long, Option[Long])].collect().toSet
    assert(got == Set((10L, Some(20L)), (11L, None)))
    StreamSql.dropStream(pv); StreamSql.dropStream(cv)
  }

  test("SQL FOR SYSTEM_TIME AS OF on streams is bit-identical to streamAsOf") {
    implicit val sc = spark.sqlContext
    val pmem = MemoryStream[(Long, Long, Long)]
    val vmem = MemoryStream[(Long, Long, Double, Long)]
    val pdf = pmem.toDS().select($"_1".as("pk"), $"_2".as("pid"),
      timestamp_millis($"_3" + base).as("pts"))
    val vdf = vmem.toDS().select($"_1".as("vk"), $"_2".as("vid"),
      $"_3".as("vval"), timestamp_millis($"_4" + base).as("vts"))
    val pv = fresh("tjp"); val vv = fresh("tjv")
    StreamSql.registerStream(pv, pdf, tsCol = "pts", delay = "1 second")
    StreamSql.registerStream(vv, vdf, tsCol = "vts", delay = "1 second",
      rowId = Some("vid"))
    val out = SqlFrontend.sql(spark,
      s"""SELECT p.pid AS pid, v.vid AS vid, v.vval AS vv
          FROM $pv p LEFT JOIN $vv FOR SYSTEM_TIME AS OF p.pts AS v
          ON p.pk = v.vk""")
    val sink = fresh("tj_sink")
    // versions: key 1 at t=1000 (v=10), t=5000 (v=20); key 2 none
    // probes: key 1 at 500 (no version), 3000 (→10), 5000 (→20, the
    // equal-ts version is visible), 9000 (→20); key 2 at 4000 (padded)
    // both sources' first rows are buffered BEFORE the query starts so
    // batch 0 reads them together at watermark 0: with the query already
    // running, a trigger firing between the two addData calls advances
    // the watermark past the other source's rows and late-drops them
    vmem.addData((1L, 100L, 10.0, 1000L), (1L, 101L, 20.0, 5000L))
    pmem.addData((1L, 1L, 500L), (1L, 2L, 3000L), (1L, 3L, 5000L),
                 (1L, 4L, 9000L), (2L, 5L, 4000L))
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      pmem.addData((9L, 90L, 10000000L)); vmem.addData((9L, 900L, 0.0, 10000000L))
      q.processAllAvailable()
      pmem.addData((9L, 91L, 20000000L)); vmem.addData((9L, 901L, 0.0, 20000000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).filter($"pid" < 90L)
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    val exp = Set(
      (1L, None: Option[Long], None: Option[Double]),
      (2L, Some(100L), Some(10.0)),
      (3L, Some(101L), Some(20.0)),
      (4L, Some(101L), Some(20.0)),
      (5L, None: Option[Long], None: Option[Double]))
    assert(got == exp)
    StreamSql.dropStream(pv); StreamSql.dropStream(vv)
  }

  test("temporal join residual applies to the matched pair, no version fallback") {
    implicit val sc = spark.sqlContext
    // versions key 1: vid 100 (vval 10.0) at t=1000, vid 101 (vval 50.0)
    // at t=5000. probes key 1: pid 1 (pval 20.0) at t=3000 → as-of vid
    // 100, residual 10<20 passes; pid 2 (pval 20.0) at t=6000 → as-of
    // vid 101, residual 50<20 FAILS — the reference's
    // TemporalRowTimeJoinOperator does NOT fall back to vid 100 (which
    // would pass): INNER drops the probe, LEFT null-pads.
    def run(joinKind: String): Set[(Long, Option[Long])] = {
      val pmem = MemoryStream[(Long, Long, Double, Long)]
      val vmem = MemoryStream[(Long, Long, Double, Long)]
      val pdf = pmem.toDS().select($"_1".as("pk"), $"_2".as("pid"),
        $"_3".as("pval"), timestamp_millis($"_4" + base).as("pts"))
      val vdf = vmem.toDS().select($"_1".as("vk"), $"_2".as("vid"),
        $"_3".as("vval"), timestamp_millis($"_4" + base).as("vts"))
      val pv = fresh("trp"); val vv = fresh("trv")
      StreamSql.registerStream(pv, pdf, tsCol = "pts", delay = "1 second")
      StreamSql.registerStream(vv, vdf, tsCol = "vts", delay = "1 second",
        rowId = Some("vid"))
      val out = SqlFrontend.sql(spark,
        s"""SELECT p.pid AS pid, v.vid AS vid
            FROM $pv p $joinKind JOIN $vv FOR SYSTEM_TIME AS OF p.pts AS v
            ON p.pk = v.vk AND v.vval < p.pval""")
      vmem.addData((1L, 100L, 10.0, 1000L), (1L, 101L, 50.0, 5000L))
      pmem.addData((1L, 1L, 20.0, 3000L), (1L, 2L, 20.0, 6000L))
      val sink = fresh("tr_sink")
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append).start()
      try {
        q.processAllAvailable()
        pmem.addData((9L, 90L, 0.0, 10000000L))
        vmem.addData((9L, 900L, 0.0, 10000000L))
        q.processAllAvailable()
        pmem.addData((9L, 91L, 0.0, 20000000L))
        vmem.addData((9L, 901L, 0.0, 20000000L))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(sink).filter($"pid" < 90L)
        .as[(Long, Option[Long])].collect().toSet
      StreamSql.dropStream(pv); StreamSql.dropStream(vv)
      got
    }
    assert(run("") == Set((1L, Some(100L))))
    assert(run("LEFT") ==
      Set((1L, Some(100L)), (2L, None: Option[Long])))
  }

  test("SQL temporal join with a composite key routes via the packed-struct key") {
    implicit val sc = spark.sqlContext
    val pmem = MemoryStream[(Long, String, Long, Long)]
    val vmem = MemoryStream[(Long, String, Long, Double, Long)]
    val pdf = pmem.toDS().select($"_1".as("pk"), $"_2".as("pg"),
      $"_3".as("pid"), timestamp_millis($"_4" + base).as("pts"))
    val vdf = vmem.toDS().select($"_1".as("vk"), $"_2".as("vg"),
      $"_3".as("vid"), $"_4".as("vval"),
      timestamp_millis($"_5" + base).as("vts"))
    val pv = fresh("ctjp"); val vv = fresh("ctjv")
    StreamSql.registerStream(pv, pdf, tsCol = "pts", delay = "1 second")
    StreamSql.registerStream(vv, vdf, tsCol = "vts", delay = "1 second",
      rowId = Some("vid"))
    // two key equalities: the same long key 1 carries DIFFERENT versions
    // under group x vs y — a single-column key would conflate them
    val out = SqlFrontend.sql(spark,
      s"""SELECT p.pid AS pid, v.vval AS vv
          FROM $pv p JOIN $vv FOR SYSTEM_TIME AS OF p.pts AS v
          ON p.pk = v.vk AND p.pg = v.vg""")
    vmem.addData((1L, "x", 100L, 10.0, 1000L), (1L, "y", 101L, 99.0, 1000L))
    pmem.addData((1L, "x", 1L, 3000L), (1L, "y", 2L, 3000L))
    val sink = fresh("ctj_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      pmem.addData((9L, "z", 90L, 10000000L))
      vmem.addData((9L, "z", 900L, 0.0, 10000000L))
      q.processAllAvailable()
      pmem.addData((9L, "z", 91L, 20000000L))
      vmem.addData((9L, "z", 901L, 0.0, 20000000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).filter($"pid" < 90L)
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 10.0), (2L, 99.0)))
    StreamSql.dropStream(pv); StreamSql.dropStream(vv)
  }

  // ---- generic keys / multi-aggregate / offset OVER -------------------

  private val evsStr = evs.map { case (k, id, v, t) =>
    (if (k == 1L) "alpha" else "beta", id, v, t) }

  private def runOverSqlStr(sql: String => String): org.apache.spark.sql.DataFrame = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double, Long)]
    val df = mem.toDS()
      .select($"_1".as("k"), $"_2".as("id"), $"_3".as("v"),
              timestamp_millis($"_4" + base).as("ets"))
    val vn = fresh("ovs")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second",
      rowId = Some("id"))
    val out = SqlFrontend.sql(spark, sql(vn))
    val sink = fresh("ovs_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      evsStr.grouped(4).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      mem.addData(("zz", 90L, 0.0, 10000000L)); q.processAllAvailable()
      mem.addData(("zz", 91L, 0.0, 20000000L)); q.processAllAvailable()
    } finally q.stop()
    StreamSql.dropStream(vn)
    spark.table(sink)
  }

  test("string-keyed multi-aggregate OVER: one statement, one state buffer, batch-exact") {
    val wtxt = "PARTITION BY k ORDER BY ets, id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    val got = runOverSqlStr(vn =>
      s"""SELECT k AS kk, id AS rid,
                SUM(v) OVER ($wtxt) AS s,
                COUNT(*) OVER ($wtxt) AS c,
                MIN(v) OVER ($wtxt) AS mn,
                AVG(v) OVER ($wtxt) AS av
          FROM $vn""")
      .filter($"kk" =!= "zz")
      .select($"kk", $"rid", $"s", $"c", $"mn", $"av")
      .as[(String, Long, Double, Long, Double, Double)].collect().toSet
    val w = Window.partitionBy("k").orderBy($"t", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = evsStr.toDF("k", "id", "v", "t0")
      .withColumn("t", $"t0" + base)
      .select($"k", $"id", sum($"v").over(w).as("s"),
              count(lit(1)).over(w).as("c"), min($"v").over(w).as("mn"),
              avg($"v").over(w).as("av"))
      .as[(String, Long, Double, Long, Double, Double)].collect().toSet
    assert(got == exp && got.nonEmpty)
  }

  test("FIRST_VALUE/LAST_VALUE route as over-window folds") {
    val wtxt = "PARTITION BY k ORDER BY ets, id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    val got = runOverSql(vn =>
      s"""SELECT k AS uid, id AS rid,
                FIRST_VALUE(v) OVER ($wtxt) AS fv,
                LAST_VALUE(v) OVER ($wtxt) AS lv
          FROM $vn""")
      .filter($"uid" =!= 9L)
      .select($"uid", $"rid", $"fv", $"lv")
      .as[(Long, Long, Double, Double)].collect().toSet
    val w = Window.partitionBy("k").orderBy($"t", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = evs.toDF("k", "id", "v", "t0")
      .withColumn("t", $"t0" + base)
      .select($"k", $"id", first($"v").over(w).as("fv"),
              last($"v").over(w).as("lv"))
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == exp && got.nonEmpty)
  }

  test("SQL LAG routes to the offset over-window and equals the batch dual") {
    val got = runOverSql(vn =>
      s"""SELECT k AS uid, id AS rid,
                LAG(v, 1) OVER (PARTITION BY k ORDER BY ets, id) AS lg
          FROM $vn""")
      .filter($"uid" =!= 9L)
      .select($"uid", $"rid", $"lg")
      .as[(Long, Long, Option[Double])].collect().toSet
    val w = Window.partitionBy("k").orderBy($"t", $"id")
    val exp = evs.toDF("k", "id", "v", "t0")
      .withColumn("t", $"t0" + base)
      .select($"k", $"id", lag($"v", 1).over(w).as("lg"))
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(got == exp && got.nonEmpty)
    // LAG of the first row per key is NULL (SQL default)
    assert(exp.exists(_._3.isEmpty))
  }

  test("SQL LEAD emits a row only when its offset row is final (holdback)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val df = mem.toDS()
      .select($"_1".as("k"), $"_2".as("id"), $"_3".as("v"),
              timestamp_millis($"_4" + base).as("ets"))
    val vn = fresh("ld")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second",
      rowId = Some("id"))
    val out = SqlFrontend.sql(spark,
      s"""SELECT k AS uid, id AS rid,
                LEAD(v, 1) OVER (PARTITION BY k ORDER BY ets, id) AS ld
          FROM $vn""")
    val sink = fresh("ld_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    def gotNow(): Set[(Long, Long, Option[Double])] =
      spark.table(sink).filter($"uid" =!= 9L)
        .select($"uid", $"rid", $"ld")
        .as[(Long, Long, Option[Double])].collect().toSet
    try {
      // two final rows for key 1 → only the first can emit (its lead is
      // the second); the second's lead row does not exist yet
      mem.addData((1L, 1L, 2.0, 1000L), (1L, 2L, 3.0, 3000L))
      mem.addData((9L, 90L, 0.0, 100000L)); q.processAllAvailable()
      assert(gotNow() == Set((1L, 1L, Some(3.0))))
      // a third key-1 row (inside the new watermark horizon) finalizes
      // → the withheld second row emits with it as its lead
      mem.addData((1L, 3L, 7.0, 200000L))
      mem.addData((9L, 91L, 0.0, 10000000L)); q.processAllAvailable()
      assert(gotNow() == Set((1L, 1L, Some(3.0)), (1L, 2L, Some(7.0))))
      // the trailing row stays withheld — on an unbounded stream "no
      // next row yet" is undefined, not NULL
    } finally q.stop()
    StreamSql.dropStream(vn)
  }

  test("SQL FOR SYSTEM_TIME with STRING keys routes generically") {
    implicit val sc = spark.sqlContext
    val pmem = MemoryStream[(String, Long, Long)]
    val vmem = MemoryStream[(String, Long, Double, Long)]
    val pdf = pmem.toDS().select($"_1".as("pk"), $"_2".as("pid"),
      timestamp_millis($"_3" + base).as("pts"))
    val vdf = vmem.toDS().select($"_1".as("vk"), $"_2".as("vid"),
      $"_3".as("vval"), timestamp_millis($"_4" + base).as("vts"))
    val pv = fresh("tjsp"); val vv = fresh("tjsv")
    StreamSql.registerStream(pv, pdf, tsCol = "pts", delay = "1 second")
    StreamSql.registerStream(vv, vdf, tsCol = "vts", delay = "1 second",
      rowId = Some("vid"))
    val out = SqlFrontend.sql(spark,
      s"""SELECT p.pid AS pid, v.vid AS vid, v.vval AS vv
          FROM $pv p LEFT JOIN $vv FOR SYSTEM_TIME AS OF p.pts AS v
          ON p.pk = v.vk""")
    val sink = fresh("tjs_sink")
    // both sources' first rows are buffered BEFORE the query starts so
    // batch 0 reads them together at watermark 0: with the query already
    // running, a trigger firing between the two addData calls advances
    // the watermark past the other source's rows and late-drops them
    vmem.addData(("u1", 100L, 10.0, 1000L), ("u1", 101L, 20.0, 5000L))
    pmem.addData(("u1", 1L, 500L), ("u1", 2L, 3000L), ("u1", 3L, 6000L),
                 ("u2", 4L, 4000L))
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      pmem.addData(("zz", 90L, 10000000L)); vmem.addData(("zz", 900L, 0.0, 10000000L))
      q.processAllAvailable()
      pmem.addData(("zz", 91L, 20000000L)); vmem.addData(("zz", 901L, 0.0, 20000000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).filter($"pid" < 90L)
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(
      (1L, None: Option[Long], None: Option[Double]),
      (2L, Some(100L), Some(10.0)),
      (3L, Some(101L), Some(20.0)),
      (4L, None: Option[Long], None: Option[Double])))
    StreamSql.dropStream(pv); StreamSql.dropStream(vv)
  }

  test("OVER statements reject mixed offset/fold and divergent window specs") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val df = mem.toDS().select($"_1".as("k"), $"_2".as("id"), $"_3".as("v"),
      timestamp_millis($"_4").as("ets"))
    val vn = fresh("ovf")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second",
      rowId = Some("id"))
    val e1 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT LAG(v, 1) OVER (PARTITION BY k ORDER BY ets, id) AS lg,
                  SUM(v) OVER (PARTITION BY k ORDER BY ets, id) AS s
            FROM $vn""")
    }
    assert(e1.getMessage.contains("offset frame"))
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT SUM(v) OVER (PARTITION BY k ORDER BY ets, id) AS s,
                  MIN(v) OVER (PARTITION BY id ORDER BY ets, id) AS mn
            FROM $vn""")
    }
    assert(e2.getMessage.contains("share one window spec"))
    StreamSql.dropStream(vn)
  }

  // ---- GROUP BY TUMBLE/HOP/SESSION (streaming SQL group windows) ------

  private val gwEvs = Seq(
    ("a", 1.0, 1000L), ("b", 2.0, 2000L), ("a", 3.0, 6000L),
    ("a", 4.0, 7000L), ("b", 5.0, 12000L), ("a", 6.0, 21000L))

  /** Register gwEvs as a stream view, build the output via `build`
    * (SQL text or the Scala API), replay with far-future sentinels,
    * return the sink rows. */
  private def runGwStream(build: (String, org.apache.spark.sql.DataFrame)
      => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long)]
    val df = mem.toDS().select($"_1".as("k"), $"_2".as("v"),
      timestamp_millis($"_3" + base).as("ets"))
    val vn = fresh("gwv")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second")
    val out = build(vn, df)
    val sink = fresh("gw_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      gwEvs.grouped(3).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      mem.addData(("zz", 0.0, 10000000L)); q.processAllAvailable()
      mem.addData(("zz", 0.0, 20000000L)); q.processAllAvailable()
    } finally q.stop()
    StreamSql.dropStream(vn)
    spark.table(sink)
  }

  test("SQL GROUP BY TUMBLE equals StreamOps.tumbleAgg (string keys, mixed aggs)") {
    val gotSql = runGwStream((vn, _) => SqlFrontend.sql(spark,
      s"""SELECT k AS kk, TUMBLE_START(ets, INTERVAL '5' SECOND) AS ws,
                TUMBLE_END(ets, INTERVAL '5' SECOND) AS we,
                COUNT(*) AS n, SUM(v) AS sv
          FROM $vn GROUP BY TUMBLE(ets, INTERVAL '5' SECOND), k"""))
      .filter($"kk" =!= "zz")
      .select($"kk", unix_millis($"ws"), unix_millis($"we"), $"n", $"sv")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    val gotApi = runGwStream((_, df) => graft.streaming.StreamOps
        .tumbleAgg(df, "ets", "5 seconds", "1 second",
          Seq(col("k")), Seq(count(lit(1)).as("n"), sum($"v").as("sv")))
        .select($"k", $"w.start".as("ws"), $"w.end".as("we"), $"n", $"sv"))
      .filter($"k" =!= "zz")
      .select($"k", unix_millis($"ws"), unix_millis($"we"), $"n", $"sv")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(gotSql == gotApi && gotSql.nonEmpty)
  }

  test("SQL GROUP BY HOP keeps Flink's (time, slide, size) argument order") {
    val gotSql = runGwStream((vn, _) => SqlFrontend.sql(spark,
      s"""SELECT HOP_START(ets, INTERVAL '5' SECOND, INTERVAL '10' SECOND) AS ws,
                COUNT(*) AS n
          FROM $vn WHERE k <> 'zz'
          GROUP BY HOP(ets, INTERVAL '5' SECOND, INTERVAL '10' SECOND)"""))
      .select(unix_millis($"ws"), $"n")
      .as[(Long, Long)].collect().toSet
    val gotApi = runGwStream((_, df) => graft.streaming.StreamOps
        .hopAgg(df.filter($"k" =!= "zz"), "ets", "10 seconds", "5 seconds",
          "1 second", Seq.empty, Seq(count(lit(1)).as("n")))
        .select($"w.start".as("ws"), $"n"))
      .select(unix_millis($"ws"), $"n")
      .as[(Long, Long)].collect().toSet
    assert(gotSql == gotApi && gotSql.nonEmpty)
  }

  test("SQL GROUP BY SESSION with HAVING equals StreamOps.sessionAgg + filter") {
    val gotSql = runGwStream((vn, _) => SqlFrontend.sql(spark,
      s"""SELECT k AS kk, SESSION_START(ets, INTERVAL '3' SECOND) AS ws,
                COUNT(*) AS n
          FROM $vn GROUP BY SESSION(ets, INTERVAL '3' SECOND), k
          HAVING n >= 1"""))
      .filter($"kk" =!= "zz")
      .select($"kk", unix_millis($"ws"), $"n")
      .as[(String, Long, Long)].collect().toSet
    val gotApi = runGwStream((_, df) => graft.streaming.StreamOps
        .sessionAgg(df, "ets", "3 seconds", "1 second",
          Seq(col("k")), Seq(count(lit(1)).as("n")))
        .select($"k", $"w.start".as("ws"), $"n").filter($"n" >= 1))
      .filter($"k" =!= "zz")
      .select($"k", unix_millis($"ws"), $"n")
      .as[(String, Long, Long)].collect().toSet
    assert(gotSql == gotApi && gotSql.nonEmpty)
  }

  test("SQL SESSION with an expression gap routes to dynamicSessionAgg") {
    // per-row gap: 'a' rows hold sessions open 5 s, others 2 s. The
    // INTERVAL CASE form is DayTimeIntervalType — the router normalizes
    // it to a CalendarInterval (gap / INTERVAL '1' SECOND →
    // make_interval); the string-duration form routes directly.
    val gotApi = runGwStream((_, df) => graft.streaming.StreamOps
        .dynamicSessionAgg(df, "ets",
          when($"k" === "a", "5 seconds").otherwise("2 seconds"),
          "1 second", Seq(col("k")), Seq(count(lit(1)).as("n")))
        .select($"k".as("kk"), $"n"))
      .filter($"kk" =!= "zz")
      .select($"kk", $"n").as[(String, Long)].collect().toList.sorted
    val gotSql = runGwStream((vn, _) => SqlFrontend.sql(spark,
      s"""SELECT k AS kk, COUNT(*) AS n
          FROM $vn GROUP BY SESSION(ets, CASE WHEN k = 'a'
                                              THEN INTERVAL '5' SECOND
                                              ELSE INTERVAL '2' SECOND END), k"""))
      .filter($"kk" =!= "zz")
      .select($"kk", $"n").as[(String, Long)].collect().toList.sorted
    assert(gotSql == gotApi && gotSql.nonEmpty)
    val gotStr = runGwStream((vn, _) => SqlFrontend.sql(spark,
      s"""SELECT k AS kk, COUNT(*) AS n
          FROM $vn GROUP BY SESSION(ets, CASE WHEN k = 'a'
                                              THEN '5 seconds'
                                              ELSE '2 seconds' END), k"""))
      .filter($"kk" =!= "zz")
      .select($"kk", $"n").as[(String, Long)].collect().toList.sorted
    assert(gotStr == gotApi)
    // session-timezone-proof: the DayTimeInterval normalization is a
    // DIFFERENCE of unix_micros, so a non-UTC session timezone must not
    // shift the gap by the zone offset (a bare unix_micros(epoch + gap)
    // under UTC+9 turns a 5 s gap negative and silently drops all rows)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      val gotTz = runGwStream((vn, _) => SqlFrontend.sql(spark,
        s"""SELECT k AS kk, COUNT(*) AS n
            FROM $vn GROUP BY SESSION(ets, CASE WHEN k = 'a'
                                                THEN INTERVAL '5' SECOND
                                                ELSE INTERVAL '2' SECOND END), k"""))
        .filter($"kk" =!= "zz")
        .select($"kk", $"n").as[(String, Long)].collect().toList.sorted
      assert(gotTz == gotApi)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    // a non-duration gap expression rejects loudly at routing time
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long)]
    val df = mem.toDS().select($"_1".as("k"), $"_2".as("v"),
      timestamp_millis($"_3" + base).as("ets"))
    val vn = fresh("gwdyn")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second")
    try {
      val e = intercept[IllegalArgumentException] {
        SqlFrontend.sql(spark,
          s"SELECT k AS kk, COUNT(*) AS n FROM $vn GROUP BY SESSION(ets, v), k")
      }
      assert(e.getMessage.contains("duration"))
    } finally StreamSql.dropStream(vn)
  }

  test("window-agg SQL output chains into the changelog Top-N (cross-domain)") {
    // statement 1: native watermarked TUMBLE aggregate (append mode);
    // its insert-only output registers as a changelog view feeding
    // statement 2's retractable rank — the reference's
    // StreamExecGroupWindowAggregate → StreamExecRank composition.
    val cn = fresh("gwc")
    val raw = try {
      runGwStream { (vn, _) =>
        val g = SqlFrontend.sql(spark,
          s"""SELECT k AS kk, TUMBLE_START(ets, INTERVAL '5' SECOND) AS ws,
                    SUM(v) AS sv
              FROM $vn GROUP BY TUMBLE(ets, INTERVAL '5' SECOND), k""")
        StreamSql.registerChangelog(cn,
          g.withColumn("kind", lit("+I"))
           .withColumn("w_ms", unix_millis($"ws")),
          "kind", rowId = Some("w_ms"))
        SqlFrontend.sql(spark,
          s"""SELECT kk, w_ms, sv FROM (
                SELECT kk, w_ms, sv,
                       ROW_NUMBER() OVER (PARTITION BY kk
                         ORDER BY sv DESC, w_ms) AS rn
                FROM $cn) t WHERE rn <= 1""")
      }
    } finally StreamSql.dropChangelog(cn)
    // the first batch's leader (window 0) is displaced by the second
    // batch's bigger window — the rank state must emit real retractions
    assert(raw.filter($"row_kind".isin("-U", "-D")).count() > 0)
    val fin = graft.streaming.Changelog.materialize(
        raw.filter($"kk" =!= "zz")
          .withColumn("mk", concat_ws("#", $"kk", $"w_ms")),
        "mk", "row_kind", "row_ord")
      .select($"kk", $"w_ms" - base, $"sv")
      .as[(String, Long, Double)].collect().toSet
    assert(fin == Set(("a", 5000L, 7.0), ("b", 10000L, 5.0)))
  }

  test("SELECT DISTINCT over an append stream view: first occurrence only, insert-only") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long)]
    val df = mem.toDS().select($"_1".as("k"), $"_2".as("v"),
      timestamp_millis($"_3" + base).as("ets"))
    val vn = fresh("adv")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second")
    val out = SqlFrontend.sql(spark,
      s"SELECT DISTINCT k, v FROM $vn WHERE v > 0")
    assert(out.columns.toSeq == Seq("k", "v", "row_kind", "row_ord"))
    val sink = fresh("ad_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(("a", 1.0, 1000L), ("a", 1.0, 2000L), ("b", -5.0, 2500L))
      q.processAllAvailable()
      mem.addData(("a", 1.0, 3000L), ("a", 2.0, 4000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink)
      .select($"k", $"v", $"row_kind")
      .as[(String, Double, String)].collect().toList
    // duplicates silent (same batch AND across batches), filter drops
    // b, nothing ever retracts
    assert(got.toSet == Set(("a", 1.0, "+I"), ("a", 2.0, "+I")) &&
           got.size == 2, s"got $got")
    StreamSql.dropStream(vn)
  }

  test("group-window route fails loudly on malformed shapes") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long)]
    val df = mem.toDS().select($"_1".as("k"), $"_2".as("v"),
      timestamp_millis($"_3" + base).as("ets"))
    val vn = fresh("gwf")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second")
    // window over a non-event-time column
    val e1 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT k, COUNT(*) AS n FROM $vn GROUP BY TUMBLE(v, INTERVAL '5' SECOND), k")
    }
    assert(e1.getMessage.contains("event-time"))
    // accessor family must match the window kind
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT SESSION_START(ets, INTERVAL '5' SECOND) AS ws, COUNT(*) AS n
            FROM $vn GROUP BY TUMBLE(ets, INTERVAL '5' SECOND)""")
    }
    assert(e2.getMessage.contains("does not match"))
    // projection item that is not a grouping expression
    val e3 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT v, COUNT(*) AS n FROM $vn GROUP BY TUMBLE(ets, INTERVAL '5' SECOND), k")
    }
    assert(e3.getMessage.contains("neither a GROUP BY key"))
    // DISTINCT aggregates are a streaming restriction
    val e4 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT k, COUNT(DISTINCT v) AS n FROM $vn GROUP BY TUMBLE(ets, INTERVAL '5' SECOND), k")
    }
    assert(e4.getMessage.contains("DISTINCT"))
    StreamSql.dropStream(vn)
  }

  test("alias-less LEFT temporal join runs as LEFT (null-pads), not INNER") {
    // regression: without the probe-alias keyword guard, `FROM P LEFT
    // JOIN V FOR SYSTEM_TIME …` parsed alias='LEFT' and the LEFT group
    // stayed null — unmatched probes were silently FILTERED (inner
    // semantics) instead of null-padded
    implicit val sc = spark.sqlContext
    val pmem = MemoryStream[(Long, Long, Long)]
    val vmem = MemoryStream[(Long, Long, Double, Long)]
    val pdf = pmem.toDS().select($"_1".as("pk"), $"_2".as("pid"),
      timestamp_millis($"_3" + base).as("pts"))
    val vdf = vmem.toDS().select($"_1".as("vk"), $"_2".as("vid"),
      $"_3".as("vval"), timestamp_millis($"_4" + base).as("vts"))
    val pv = fresh("tjnp"); val vv = fresh("tjnv")
    StreamSql.registerStream(pv, pdf, tsCol = "pts", delay = "1 second")
    StreamSql.registerStream(vv, vdf, tsCol = "vts", delay = "1 second",
      rowId = Some("vid"))
    val out = SqlFrontend.sql(spark,
      s"""SELECT $pv.pid AS pid, v.vid AS vid
          FROM $pv LEFT JOIN $vv FOR SYSTEM_TIME AS OF $pv.pts AS v
          ON $pv.pk = v.vk""")
    val sink = fresh("tjn_sink")
    // both sources' first rows are buffered BEFORE the query starts so
    // batch 0 reads them together at watermark 0: with the query already
    // running, a trigger firing between the two addData calls advances
    // the watermark past the other source's rows and late-drops them
    vmem.addData((1L, 100L, 10.0, 1000L))
    // pid 2 sees the version; pid 5 (key 2) has none → must null-pad
    pmem.addData((1L, 2L, 3000L), (2L, 5L, 4000L))
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      pmem.addData((9L, 90L, 10000000L)); vmem.addData((9L, 900L, 0.0, 10000000L))
      q.processAllAvailable()
      pmem.addData((9L, 91L, 20000000L)); vmem.addData((9L, 901L, 0.0, 20000000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).filter($"pid" < 90L)
      .as[(Long, Option[Long])].collect().toSet
    assert(got == Set((2L, Some(100L)), (5L, None: Option[Long])))
    StreamSql.dropStream(pv); StreamSql.dropStream(vv)
  }

  test("interval-join time bound is shape-validated: two-sided ranges only") {
    implicit val sc = spark.sqlContext
    val pmem = MemoryStream[(Long, Long, Long)]
    val cmem = MemoryStream[(Long, Long, Long)]
    val pdf = pmem.toDS().select($"_1".as("pk"), $"_2".as("pid"),
      timestamp_millis($"_3" + base).as("pts"))
    val cdf = cmem.toDS().select($"_1".as("ck"), $"_2".as("cid"),
      timestamp_millis($"_3" + base).as("cts"))
    val pv = fresh("ivsp"); val cv = fresh("ivsc")
    StreamSql.registerStream(pv, pdf, tsCol = "pts", delay = "1 second")
    StreamSql.registerStream(cv, cdf, tsCol = "cts", delay = "1 second")
    // one-sided bound: mentions both ts columns but leaves state
    // unbounded — refused (was silently accepted by word containment)
    val e1 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT p.pid, c.cid FROM $pv p JOIN $cv c
            ON p.pk = c.ck AND c.cts <= p.pts""")
    }
    assert(e1.getMessage.contains("two-sided time bound"))
    // non-range expression mentioning both columns — refused
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT p.pid, c.cid FROM $pv p JOIN $cv c
            ON p.pk = c.ck AND abs(unix_millis(c.cts) - unix_millis(p.pts)) < 5000""")
    }
    assert(e2.getMessage.contains("two-sided time bound"))
    // an explicit inequality PAIR (the desugared BETWEEN) is accepted
    val ok = SqlFrontend.sql(spark,
      s"""SELECT p.pid, c.cid FROM $pv p JOIN $cv c
          ON p.pk = c.ck
         AND c.cts >= p.pts - INTERVAL '5' SECOND
         AND c.cts <= p.pts""")
    assert(ok.columns.toSeq == Seq("pid", "cid"))
    StreamSql.dropStream(pv); StreamSql.dropStream(cv)
  }

  test("time-domain routes fail loudly on unsupported shapes") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Long)]
    val df = mem.toDS().select($"_1".as("k"), $"_2".as("id"), $"_3".as("v"),
      timestamp_millis($"_4").as("ets"))
    val sv = fresh("fl")
    StreamSql.registerStream(sv, df, tsCol = "ets", delay = "1 second",
      rowId = Some("id"))
    // plain project/filter IS routable since round 17 (the Calc route —
    // the reference's StreamExecCalc on an insert-only table) …
    val calc = SqlFrontend.sql(spark, s"SELECT k FROM $sv WHERE v > 5")
    assert(calc.isStreaming && calc.columns.toSeq == Seq("k"))
    // … but a stream view in a genuinely unroutable statement must
    // still throw, not fall through to batch SQL (a GLOBAL aggregate
    // has no append-mode plan without a window)
    val e1 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark, s"SELECT SUM(v) AS s FROM $sv")
    }
    assert(e1.getMessage.contains("no supported streaming-SQL shape"))
    // interval join without a ts bound: unbounded state — refused
    val sv2 = fresh("fl2")
    val df2 = mem.toDS().select($"_1".as("k2"), $"_2".as("id2"),
      $"_3".as("v2"), timestamp_millis($"_4").as("ets2"))
    StreamSql.registerStream(sv2, df2, tsCol = "ets2", delay = "1 second")
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT a.v, b.v2 FROM $sv a JOIN $sv2 b ON a.k = b.k2")
    }
    assert(e2.getMessage.contains("time bound"))
    // OVER ordering by a non-event-time column
    val e3 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT k, SUM(v) OVER (PARTITION BY k ORDER BY v) AS s FROM $sv")
    }
    assert(e3.getMessage.contains("event-time"))
    // AS OF over something other than the probe's event-time column
    val e4 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT p.v AS v, q.v2 AS w FROM $sv p
            JOIN $sv2 FOR SYSTEM_TIME AS OF p.v AS q ON p.k = q.k2""")
    }
    assert(e4.getMessage.contains("event-time"))
    // version side without a registered rowId (version order)
    val e5 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT p.v AS v, q.v2 AS w FROM $sv p
            JOIN $sv2 FOR SYSTEM_TIME AS OF p.ets AS q ON p.k = q.k2""")
    }
    assert(e5.getMessage.contains("rowId"))
    StreamSql.dropStream(sv); StreamSql.dropStream(sv2)
  }

  /** Stage pattern rows through a stream view and run one MR statement
    * through the UNIFIED SQL entry (SqlFrontend.sql → StreamSql router
    * → MatchRecognizeSql.streamSql). */
  private def runMrSql(clause: String): org.apache.spark.sql.DataFrame = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double, Long)]
    val df = mem.toDS()
      .select($"_1".as("k"), $"_2".as("id"), $"_3".as("tp"), $"_4".as("v"),
              timestamp_millis($"_5" + base).as("ets"))
    val vn = fresh("mrv")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second")
    val out = SqlFrontend.sql(spark,
      s"SELECT * FROM $vn MATCH_RECOGNIZE ($clause)")
    val sink = fresh("mr_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    val rows = Seq(
      (1L, 1L, "p", 10.0, 1000L), (1L, 2L, "c", 1.0, 2000L),
      (1L, 3L, "c", 2.0, 3000L), (1L, 4L, "p", 20.0, 4000L),
      (1L, 5L, "c", 3.0, 5000L), (2L, 6L, "p", 7.0, 2500L),
      (1L, 7L, "x", 0.0, 6000L))
    try {
      rows.grouped(3).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      mem.addData((9L, 90L, "x", 0.0, 10000000L)); q.processAllAvailable()
      mem.addData((9L, 91L, "x", 0.0, 20000000L)); q.processAllAvailable()
    } finally q.stop()
    StreamSql.dropStream(vn)
    spark.table(sink).filter(col("k") < 9)
  }

  private val mrCommon = """
      PARTITION BY k
      ORDER BY ets, id
      %s
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (A B+) WITHIN INTERVAL '1' MINUTE
      DEFINE A AS tp = 'p', B AS tp = 'c'"""

  test("MATCH_RECOGNIZE over a stream view routes through the unified SQL entry — ONE ROW PER MATCH") {
    val got = runMrSql(mrCommon.format("""
        MEASURES FIRST(A.id) AS a_id, LAST(B.id) AS b_id,
                 COUNT(B.*) AS nb,
                 CAST(SUM(v) AS DOUBLE) AS tot,
                 CLASSIFIER() AS cls
        ONE ROW PER MATCH"""))
      .select("k", "mr_match", "a_id", "b_id", "nb", "tot", "cls")
      .as[(Long, Long, Long, Long, Long, Double, String)].collect().toSet
    // key 1: (p1 c2 c3) then (p4 c5); key 2's lone p never completes
    assert(got == Set(
      (1L, 1L, 1L, 3L, 2L, 13.0, "B"),
      (1L, 2L, 4L, 5L, 1L, 23.0, "B")), s"got $got")
  }

  test("MATCH_RECOGNIZE over a stream view — ALL ROWS PER MATCH carries NFA-emitted mr_seq") {
    val got = runMrSql(mrCommon.format("ALL ROWS PER MATCH"))
      .select("k", "mr_match", "mr_var", "mr_seq", "id")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, "A", 0L, 1L), (1L, 1L, "B", 1L, 2L), (1L, 1L, "B", 2L, 3L),
      (1L, 2L, "A", 0L, 4L), (1L, 2L, "B", 1L, 5L)), s"got $got")
  }

  test("stream MR ALL ROWS + MEASURES: per-row RUNNING prefix folds, FINAL whole-match") {
    val got = runMrSql(mrCommon.format("""
        MEASURES COUNT(*) AS k_run,
                 RUNNING CAST(SUM(v) AS DOUBLE) AS run_tot,
                 FINAL COUNT(B.*) AS n_b,
                 CLASSIFIER() AS cls,
                 LAST(B.id) AS last_b_so_far
        ALL ROWS PER MATCH"""))
      .na.fill(-1L, Seq("last_b_so_far")) // null = no B row yet
      .select("k", "mr_match", "mr_seq", "id", "k_run", "run_tot",
              "n_b", "cls", "last_b_so_far")
      .as[(Long, Long, Long, Long, Long, Double, Long, String, Long)]
      .collect().toSet
    // key 1 match 1: p1(10) c2(1) c3(2); match 2: p4(20) c5(3)
    assert(got == Set(
      (1L, 1L, 0L, 1L, 1L, 10.0, 2L, "A", -1L),
      (1L, 1L, 1L, 2L, 2L, 11.0, 2L, "B", 2L),
      (1L, 1L, 2L, 3L, 3L, 13.0, 2L, "B", 3L),
      (1L, 2L, 0L, 4L, 1L, 20.0, 1L, "A", -1L),
      (1L, 2L, 1L, 5L, 2L, 23.0, 1L, "B", 5L)), s"got $got")
  }

  test("stream MR MEASURES are string-literal-opaque; AVG folds once") {
    // the CASE literal ')' must not derail the aggregate-argument scan,
    // and AVG(B.v) uses the single (sum, count) fold
    val got = runMrSql(mrCommon.format("""
        MEASURES CAST(SUM(CASE WHEN tp = ')' THEN 0.0 ELSE v END) AS DOUBLE) AS tot,
                 CAST(AVG(B.v) AS DOUBLE) AS avg_b
        ONE ROW PER MATCH"""))
      .select("k", "mr_match", "tot", "avg_b")
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == Set((1L, 1L, 13.0, 1.5), (1L, 2L, 23.0, 3.0)), s"got $got")
  }

  test("stream MR rejects lossy tiebreaks and 3+ ORDER BY columns loudly") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double, Long)]
    val df = mem.toDS()
      .select($"_1".as("k"), $"_2".as("id"), $"_3".as("tp"), $"_4".as("v"),
              timestamp_millis($"_5" + base).as("ets"))
    val vn = fresh("mrrej")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second")
    def mr(order: String) = s"""SELECT * FROM $vn MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY $order ONE ROW PER MATCH
        MEASURES COUNT(B.*) AS nb
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B+) WITHIN INTERVAL '1' MINUTE
        DEFINE A AS tp = 'p', B AS tp = 'c')"""
    // a STRING tiebreak silently cast to 0 was the old behavior — reject
    val e1 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark, mr("ets, tp"))
    }
    assert(e1.getMessage.contains("tiebreak"))
    // a silently-dropped third order column is the same bug in disguise
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark, mr("ets, id, v"))
    }
    assert(e2.getMessage.contains("one tiebreak"))
    StreamSql.dropStream(vn)
  }

  test("stream MR timestamp partition keys keep µs precision end-to-end") {
    // two partitions whose timestamp keys differ only in MICROSECONDS:
    // the ms-truncating default JSON format would collapse them into
    // one NFA key (wrong matches) and truncate the output value
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double, Long)]
    val df = mem.toDS()
      .select(timestamp_micros($"_1").as("pk"), $"_2".as("id"),
              $"_3".as("tp"), $"_4".as("v"),
              timestamp_millis($"_5" + base).as("ets"))
    val vn = fresh("mrus")
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second")
    val out = SqlFrontend.sql(spark, s"""SELECT * FROM $vn MATCH_RECOGNIZE (
        PARTITION BY pk ORDER BY ets, id
        MEASURES FIRST(A.id) AS a_id, COUNT(B.*) AS nb
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B) WITHIN INTERVAL '1' MINUTE
        DEFINE A AS tp = 'p', B AS tp = 'c')""")
    val sink = fresh("mrus_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    val us1 = 1700000000000001L; val us2 = 1700000000000002L
    try {
      mem.addData((us1, 1L, "p", 1.0, 1000L), (us2, 2L, "p", 1.0, 1500L),
                  (us1, 3L, "c", 1.0, 2000L), (us2, 4L, "c", 1.0, 2500L))
      q.processAllAvailable()
      mem.addData((us1, 90L, "x", 0.0, 10000000L)); q.processAllAvailable()
      mem.addData((us1, 91L, "x", 0.0, 20000000L)); q.processAllAvailable()
    } finally q.stop()
    StreamSql.dropStream(vn)
    val got = spark.table(sink)
      .select(unix_micros($"pk"), $"a_id", $"nb")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((us1, 1L, 1L), (us2, 2L, 1L)), s"got $got")
  }
}
