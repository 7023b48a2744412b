package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SqlFrontend
import graft.streaming.{Changelog, StreamSql}

/**
 * Streaming-SQL reachability of the changelog operator family
 * (StreamSql): the SQL entry must reproduce the direct Scala-API
 * pipelines — the repo's analogue of the reference planning
 * `WHERE [NOT] EXISTS` / `ROW_NUMBER() <= k` / `COUNT(DISTINCT)` over
 * updating inputs onto StreamingSemiAntiJoinOperator /
 * RetractableTopNFunction / the distinct MapView accumulator
 * (FlinkStreamRuleSets.scala rank + subquery rules).
 */
class StreamSqlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def fresh(name: String): String =
    name + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  test("plain Calc over a changelog view maps the payload, row kind rides along") {
    implicit val sc = spark.sqlContext
    val cv = fresh("calc_cv")
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(cv, mem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"SELECT key AS k, value * 2 AS v2 FROM $cv WHERE value > 3")
    assert(out.isStreaming && out.columns.toSeq == Seq("k", "v2", "row_kind"))
    val sink = fresh("sql_calc")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      // +I passes the filter; the later update's -U carries the OLD
      // payload (passes) while its +U (new value 2.0) is filtered out —
      // the bare retraction the reference's Calc on updating input emits
      mem.addData(CRow(1, "+I", 10.0, 1))
      q.processAllAvailable()
      mem.addData(CRow(1, "-U", 10.0, 2), CRow(1, "+U", 2.0, 3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink)
      .select("k", "v2", "row_kind").as[(Long, Double, String)]
      .collect().toList.sortBy(_._3)
    assert(got == List((1L, 20.0, "+I"), (1L, 20.0, "-U")))
    // 'row_kind' is a reserved output alias
    val e = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark, s"SELECT key AS row_kind FROM $cv")
    }
    assert(e.getMessage.contains("reserved"))
    StreamSql.dropChangelog(cv)
  }

  test("SQL EXISTS routes to the semi changelog join: 0↔1 association transitions") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lv"); val rv = fresh("rv")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT key AS k, value AS v FROM $lv
          WHERE EXISTS (SELECT 1 FROM $rv
                        WHERE $rv.key = $lv.key AND $rv.value >= 5)""")
    val sink = fresh("sql_semi")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: left row arrives, right side below threshold → nothing
      lmem.addData(CRow(1, "+I", 10.0, 1))
      rmem.addData(CRow(1, "+I", 3.0, 1))
      q.processAllAvailable()
      // batch 2: right crosses the residual threshold → 0→1 → +I
      rmem.addData(CRow(1, "+I", 7.0, 2))
      q.processAllAvailable()
      // batch 3: the passing right row retracts → 1→0 → -D
      rmem.addData(CRow(1, "-D", 7.0, 2))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("k", "v", "row_kind").as[(Long, Double, String)].collect().toList
    assert(got == List((1L, 10.0, "+I"), (1L, 10.0, "-D")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL NOT EXISTS routes to the anti changelog join") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lv"); val rv = fresh("rv")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT key AS k, value AS v FROM $lv
          WHERE NOT EXISTS (SELECT 1 FROM $rv WHERE $rv.key = $lv.key)""")
    val sink = fresh("sql_anti")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1)) // no right row → member
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 1.0, 1))  // first association → retract
      q.processAllAvailable()
      rmem.addData(CRow(1, "-D", 1.0, 1))  // last association gone → re-admit
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("v", "row_kind").as[(Double, String)].collect().toList
    assert(got == List((10.0, "+I"), (10.0, "-D"), (10.0, "+I")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL EXISTS composite key + cross-side residual evaluate in the operator") {
    implicit val sc = spark.sqlContext
    val lv = fresh("cel"); val rv = fresh("cer")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    // two equalities → one packed composite key; the residual compares
    // the OUTER row against the inner one → operator condition
    val out = SqlFrontend.sql(spark,
      s"""SELECT key AS k, value AS v FROM $lv
          WHERE EXISTS (SELECT 1 FROM $rv
                        WHERE $rv.key = $lv.key AND $rv.ord = $lv.ord
                          AND $lv.value > $rv.value)""")
    val sink = fresh("sql_csemi")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 5))
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 12.0, 5)) // 10 > 12 fails → ∅
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 7.0, 6))  // ord differs → ∅
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 7.0, 5))  // both keys + residual → +I
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("k", "v", "row_kind").as[(Long, Double, String)].collect().toList
    assert(got == List((1L, 10.0, "+I")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL NOT EXISTS cross-side residual keeps failing outer rows emitting") {
    implicit val sc = spark.sqlContext
    val lv = fresh("cal"); val rv = fresh("car")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT value AS v FROM $lv
          WHERE NOT EXISTS (SELECT 1 FROM $rv
                            WHERE $rv.key = $lv.key
                              AND $lv.value > $rv.value)""")
    val sink = fresh("sql_canti")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1)) // no inner rows → member
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 12.0, 1)) // condition fails → still member
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 7.0, 2))  // first real association → retract
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("v", "row_kind").as[(Double, String)].collect().toList
    assert(got == List((10.0, "+I"), (10.0, "-D")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("unwindowed GROUP BY over an APPEND stream view lifts to the changelog aggregate") {
    implicit val sc = spark.sqlContext
    val vn = fresh("agv")
    val mem = MemoryStream[(Long, Double, Long)]
    val df = mem.toDS().select($"_1".as("k"), $"_2".as("v"),
      timestamp_millis($"_3" + 1700000000000L).as("ets"))
    StreamSql.registerStream(vn, df, tsCol = "ets", delay = "1 second")
    // the reference's day-one updating aggregate over an insert-only
    // table: the append view lifts to a constant-+I changelog and runs
    // the retract-capable operator (which never sees a retraction)
    val out = SqlFrontend.sql(spark,
      s"SELECT k AS kk, SUM(v) AS sv, COUNT(*) AS n FROM $vn GROUP BY k")
    assert(out.columns.contains("row_kind"))
    val sink = fresh("ag_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, 2.0, 1000L)); q.processAllAvailable()
      mem.addData((1L, 3.0, 2000L)); q.processAllAvailable()
    } finally q.stop()
    // the agg routes emit row_kind (no ord) — compare as a sorted bag
    val got = spark.table(sink)
      .select("kk", "sv", "n", "row_kind")
      .as[(Long, Double, Long, String)].collect().toList.sorted
    // the moment-family operator emits +U on every refresh including
    // the first (the materialization treats a first +U as the insert —
    // the same contract every groupAgg gate pins)
    assert(got == List((1L, 2.0, 1L, "+U"),
                       (1L, 2.0, 1L, "-U"), (1L, 5.0, 2L, "+U")).sorted)
    StreamSql.dropStream(vn)
  }

  test("SQL Top-N is bit-identical to the direct topNChangelog API") {
    implicit val sc = spark.sqlContext
    val tv = fresh("tv")
    val sqlMem = MemoryStream[CRow]; val apiMem = MemoryStream[CRow]
    StreamSql.registerChangelog(tv, sqlMem.toDS().toDF(),
      kindCol = "kind", rowId = Some("key"))
    val out = SqlFrontend.sql(spark,
      s"""SELECT grp, id, v FROM (
            SELECT key % 2 AS grp, key AS id, value AS v,
                   ROW_NUMBER() OVER (PARTITION BY key % 2
                                      ORDER BY value DESC, key) AS rn
            FROM $tv) t WHERE rn <= 2""")
    val direct = Changelog.topNChangelog[Long, CRow](
      apiMem.toDS().groupByKey(_.key % 2), n = 2,
      kind = _.kind, score = _.value, rowId = _.key)
    val sinkS = fresh("sql_topn"); val sinkA = fresh("api_topn")
    val qs = out.writeStream.format("memory").queryName(sinkS)
      .outputMode(OutputMode.Append).start()
    val qa = direct.writeStream.format("memory").queryName(sinkA)
      .outputMode(OutputMode.Append).start()
    try {
      // identical batches in lockstep so batch boundaries coincide
      def feed(rows: CRow*): Unit = {
        sqlMem.addData(rows); apiMem.addData(rows)
        qs.processAllAvailable(); qa.processAllAvailable()
      }
      feed(CRow(2, "+I", 5.0, 1), CRow(4, "+I", 9.0, 2), CRow(6, "+I", 7.0, 3))
      feed(CRow(8, "+I", 8.0, 4))          // overtakes 6 → demote/admit
      feed(CRow(4, "-D", 9.0, 2))          // current best retracts → re-admit 6
      feed(CRow(2, "-U", 5.0, 1), CRow(2, "+U", 10.0, 5)) // score update in slice
    } finally { qs.stop(); qa.stop() }
    val gotSql = spark.table(sinkS).orderBy("grp", "row_ord")
      .select("grp", "id", "v", "row_kind", "row_ord")
      .as[(Long, Long, Double, String, Long)].collect().toList
    val gotApi = spark.table(sinkA).orderBy("key", "ord")
      .select("key", "rowId", "score", "kind", "ord")
      .as[(Long, Long, Double, String, Long)].collect().toList
    assert(gotSql == gotApi) // bit-identical incl. ord sequence
    assert(gotSql.nonEmpty)
  }

  test("SQL Top-N ASC ranks smallest-first and restores the score sign") {
    implicit val sc = spark.sqlContext
    val tv = fresh("tva")
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(tv, mem.toDS().toDF(),
      kindCol = "kind", rowId = Some("key"))
    val out = SqlFrontend.sql(spark,
      s"""SELECT id, v FROM (
            SELECT key AS id, value AS v,
                   ROW_NUMBER() OVER (PARTITION BY key % 1
                                      ORDER BY value ASC) AS rn
            FROM $tv) WHERE rn <= 1""")
    val sink = fresh("sql_topn_asc")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(1, "+I", 5.0, 1), CRow(2, "+I", 3.0, 2))
      q.processAllAvailable()
      mem.addData(CRow(3, "+I", 1.0, 3)) // new minimum takes the slice
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("id", "v", "row_kind").as[(Long, Double, String)].collect().toList
    assert(got == List((2L, 3.0, "+I"), (2L, 3.0, "-D"), (3L, 1.0, "+I")))
    StreamSql.dropChangelog(tv)
  }

  test("SQL COUNT(DISTINCT) is bit-identical to the direct API and sees 0↔1 value transitions") {
    implicit val sc = spark.sqlContext
    val dv = fresh("dv")
    val sqlMem = MemoryStream[CRow]; val apiMem = MemoryStream[CRow]
    StreamSql.registerChangelog(dv, sqlMem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT key % 2 AS g, COUNT(DISTINCT value) AS d, COUNT(*) AS c
          FROM $dv GROUP BY key % 2""")
    val direct = Changelog.aggregateChangelogDistinct[Long, CRow](
      apiMem.toDS().groupByKey(_.key % 2), _.kind, _.value)
    val sinkS = fresh("sql_dist"); val sinkA = fresh("api_dist")
    val qs = out.writeStream.format("memory").queryName(sinkS)
      .outputMode(OutputMode.Append).start()
    val qa = direct.writeStream.format("memory").queryName(sinkA)
      .outputMode(OutputMode.Append).start()
    try {
      def feed(rows: CRow*): Unit = {
        sqlMem.addData(rows); apiMem.addData(rows)
        qs.processAllAvailable(); qa.processAllAvailable()
      }
      feed(CRow(2, "+I", 5.0, 1), CRow(4, "+I", 5.0, 2)) // two rows, one value
      feed(CRow(2, "-D", 5.0, 1)) // one of two equal values: distinct stays 1
      feed(CRow(4, "-D", 5.0, 2)) // last instance: group retires
    } finally { qs.stop(); qa.stop() }
    val gotSql = spark.table(sinkS)
      .select("g", "d", "c", "row_kind")
      .as[(Long, Long, Long, String)].collect().toList
    val gotApi = spark.table(sinkA)
      .select("key", "distinct", "count", "kind")
      .as[(Long, Long, Long, String)].collect().toList
    assert(gotSql == gotApi)
    assert(gotSql == List(
      (0L, "+U", 1L, 2L), (0L, "-U", 1L, 2L), (0L, "+U", 1L, 1L),
      (0L, "-U", 1L, 1L), (0L, "-D", 1L, 1L))
      .map { case (g, k, d, c) => (g, d, c, k) })
    StreamSql.dropChangelog(dv)
  }

  test("SQL FIRST_VALUE/LISTAGG/COLLECT is bit-identical to the direct API") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lav")
    val sqlMem = MemoryStream[CRow]; val apiMem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, sqlMem.toDS().toDF(),
      kindCol = "kind", rowId = Some("ord"))
    val out = SqlFrontend.sql(spark,
      s"""SELECT key % 2 AS g, FIRST_VALUE(value) AS fv,
                 LAST_VALUE(value) AS lv2, LISTAGG(value) AS vals,
                 COLLECT(value) AS ms, COUNT(*) AS c
          FROM $lv GROUP BY key % 2""")
    val direct = Changelog.aggregateChangelogListAgg[Long, CRow](
      apiMem.toDS().groupByKey(_.key % 2), _.kind, _.value, _.ord)
    val sinkS = fresh("sql_la"); val sinkA = fresh("api_la")
    val qs = out.writeStream.format("memory").queryName(sinkS)
      .outputMode(OutputMode.Append).start()
    val qa = direct.writeStream.format("memory").queryName(sinkA)
      .outputMode(OutputMode.Append).start()
    try {
      def feed(rows: CRow*): Unit = {
        sqlMem.addData(rows); apiMem.addData(rows)
        qs.processAllAvailable(); qa.processAllAvailable()
      }
      feed(CRow(2, "+I", 5.0, 1), CRow(4, "+I", 9.0, 2))
      feed(CRow(2, "-D", 5.0, 1)) // the first retracts: successor takes over
      feed(CRow(4, "-U", 9.0, 2), CRow(4, "+U", 7.0, 2)) // in-place update
    } finally { qs.stop(); qa.stop() }
    val gotSql = spark.table(sinkS)
      .select("g", "fv", "lv2", "vals", "ms", "c", "row_kind")
      .as[(Long, Double, Double, String, String, Long, String)]
      .collect().toList
    val gotApi = spark.table(sinkA)
      .select("key", "first", "last", "listagg", "collect", "count", "kind")
      .as[(Long, Double, Double, String, String, Long, String)]
      .collect().toList
    assert(gotSql == gotApi)
    assert(gotSql.nonEmpty)
    StreamSql.dropChangelog(lv)
  }

  test("SQL JOIN routes to the two-sided changelog join: pair lifecycle with a one-side residual") {
    implicit val sc = spark.sqlContext
    val lv = fresh("jl"); val rv = fresh("jr")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT a.value AS lv, b.value AS rv2 FROM $lv a JOIN $rv b
          ON a.key = b.key AND b.value >= 5""")
    assert(out.columns.toSeq == Seq("lv", "rv2", "row_kind", "row_ord"))
    val sink = fresh("sql_join")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1)) // no right yet → nothing
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 3.0, 1))  // residual filters it → nothing
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 7.0, 2))  // first passing pair → +I
      q.processAllAvailable()
      lmem.addData(CRow(1, "-U", 10.0, 1), CRow(1, "+U", 12.0, 1)) // in-place
      q.processAllAvailable()
      rmem.addData(CRow(1, "-D", 7.0, 2))  // last pair gone → -D
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("lv", "rv2", "row_kind")
      .as[(Double, Double, String)].collect().toList
    assert(got == List((10.0, 7.0, "+I"), (10.0, 7.0, "-U"),
                       (12.0, 7.0, "+U"), (12.0, 7.0, "-D")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL LEFT JOIN pads the right side and transitions pad↔pair") {
    implicit val sc = spark.sqlContext
    val lv = fresh("jol"); val rv = fresh("jor")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    // no aliases: LEFT must parse as the join type, not as an alias of
    // the left view (the regex's negative lookahead)
    val out = SqlFrontend.sql(spark,
      s"""SELECT $lv.value AS lv2, $rv.value AS rv2
          FROM $lv LEFT JOIN $rv ON $lv.key = $rv.key""")
    val sink = fresh("sql_ljoin")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1)) // unmatched → null-padded +I
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 7.0, 1))  // pad retracts, pair inserts
      q.processAllAvailable()
      rmem.addData(CRow(1, "-D", 7.0, 1))  // back to the padded row
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("lv2", "rv2", "row_kind")
      .as[(Double, Option[Double], String)].collect().toList
    assert(got == List(
      (10.0, None, "+I"),
      (10.0, None, "-U"), (10.0, Some(7.0), "+U"),
      (10.0, Some(7.0), "-U"), (10.0, None, "+U")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL RIGHT JOIN pads the left side (the mirrored outer configuration)") {
    implicit val sc = spark.sqlContext
    val lv = fresh("jrl"); val rv = fresh("jrr")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT a.value AS lv2, b.value AS rv2
          FROM $lv a RIGHT OUTER JOIN $rv b ON a.key = b.key""")
    val sink = fresh("sql_rjoin")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      rmem.addData(CRow(1, "+I", 7.0, 1))  // unmatched right → padded left
      q.processAllAvailable()
      lmem.addData(CRow(1, "+I", 10.0, 1)) // pad retracts, pair inserts
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("lv2", "rv2", "row_kind")
      .as[(Option[Double], Double, String)].collect().toList
    assert(got == List(
      (None, 7.0, "+I"),
      (None, 7.0, "-U"), (Some(10.0), 7.0, "+U")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL JOIN composite key: two equalities form one packed state key") {
    implicit val sc = spark.sqlContext
    val lv = fresh("jcl"); val rv = fresh("jcr")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT a.value AS lv2, b.value AS rv2 FROM $lv a JOIN $rv b
          ON a.key = b.key AND a.ord = b.ord""")
    val sink = fresh("sql_cjoin")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 5))
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 7.0, 6))  // key matches, ord differs → ∅
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 8.0, 5))  // both columns match → +I
      q.processAllAvailable()
      rmem.addData(CRow(1, "-D", 8.0, 5))  // pair retracts
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("lv2", "rv2", "row_kind")
      .as[(Double, Double, String)].collect().toList
    assert(got == List((10.0, 8.0, "+I"), (10.0, 8.0, "-D")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL JOIN cross-side residual compiles into the operator condition") {
    implicit val sc = spark.sqlContext
    val lv = fresh("jxl"); val rv = fresh("jxr")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT a.value AS lv2, b.value AS rv2 FROM $lv a JOIN $rv b
          ON a.key = b.key AND a.value > b.value""")
    val sink = fresh("sql_xjoin")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1))
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 12.0, 1)) // 10 > 12 fails → ∅
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 7.0, 2))  // 10 > 7 → +I
      q.processAllAvailable()
      lmem.addData(CRow(1, "-D", 10.0, 1)) // pair retracts (12-row never paired)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("lv2", "rv2", "row_kind")
      .as[(Double, Double, String)].collect().toList
    assert(got == List((10.0, 7.0, "+I"), (10.0, 7.0, "-D")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL LEFT JOIN preserved-side residual keeps failing rows null-padded") {
    implicit val sc = spark.sqlContext
    val lv = fresh("jpl"); val rv = fresh("jpr")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    // a.value > 5 sits on the PRESERVED side: it may only disqualify
    // matches — failing left rows must still emit null-padded (exact
    // SQL ON semantics; a pre-join filter would drop them entirely)
    val out = SqlFrontend.sql(spark,
      s"""SELECT a.value AS lv2, b.value AS rv2 FROM $lv a LEFT JOIN $rv b
          ON a.key = b.key AND a.value > 5""")
    val sink = fresh("sql_pjoin")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 3.0, 1))  // fails residual → padded +I
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 7.0, 1))  // still fails → padded row stays
      q.processAllAvailable()
      lmem.addData(CRow(1, "+I", 10.0, 2)) // passes → immediate pair
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("lv2", "rv2", "row_kind")
      .as[(Double, Option[Double], String)].collect().toList
    // the pair arrives as +U: the key's join result was already live
    // (the padded 3.0 row), so it is an update, not a 0→1 insert
    assert(got == List((3.0, None, "+I"), (10.0, Some(7.0), "+U")))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL JOIN rejects bare *, unregistered sides, and bad residual/key shapes") {
    implicit val sc = spark.sqlContext
    val lv = fresh("jel"); val rv = fresh("jer")
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, mem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, mem.toDS().toDF(), kindCol = "kind")
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark, s"SELECT * FROM $lv a JOIN $rv b ON a.key = b.key")
    }
    assert(e2.getMessage.contains("explicit projection"))
    val e3 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT a.value AS v FROM $lv a JOIN not_registered b ON a.key = b.key")
    }
    assert(e3.getMessage.contains("unregistered"))
    // a residual referencing NEITHER side (unqualified) is ambiguous
    val e4 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT a.value AS v FROM $lv a JOIN $rv b
            ON a.key = b.key AND value > 5""")
    }
    assert(e4.getMessage.contains("neither side"))
    // a composite key pair with no canonical common type rejects
    val e4b = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT a.value AS v FROM $lv a JOIN $rv b
            ON a.key = b.key AND a.value = b.kind""")
    }
    assert(e4b.getMessage.contains("no canonical key form"))
    // single-side residuals still pre-filter on non-preserved sides
    assert(SqlFrontend.sql(spark,
      s"""SELECT a.value AS v FROM $lv a LEFT JOIN $rv b
          ON a.key = b.key AND b.value > 5""").columns.contains("row_kind"))
    assert(SqlFrontend.sql(spark,
      s"""SELECT a.value AS v FROM $lv a JOIN $rv b
          ON a.key = b.key AND a.value > 5""").columns.contains("row_kind"))
    // a registered view AFTER the JOIN keyword with an unregistered
    // FROM side must fail loudly, not fall through to batch SQL
    val e5 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT a.v AS v FROM not_registered a JOIN $rv b ON a.k = b.key")
    }
    assert(e5.getMessage.contains("no supported streaming-SQL shape"))
    // bare `OUTER JOIN` (no direction) is invalid SQL: it must not
    // silently parse as an inner join
    val e6 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT a.value AS v FROM $lv a OUTER JOIN $rv b ON a.key = b.key")
    }
    assert(e6.getMessage.contains("no supported streaming-SQL shape"))
    // self-join points at double registration
    val e7 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT a.value AS v FROM $lv a JOIN $lv b ON a.key = b.key")
    }
    assert(e7.getMessage.contains("self-join"))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("fail-loud scan rides Spark's parser: view-like tokens in literals don't trip it") {
    implicit val sc = spark.sqlContext
    val lv = fresh("scanv")
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, mem.toDS().toDF(), kindCol = "kind")
    Seq((1L, "a")).toDF("id", "s").createOrReplaceTempView("scan_batch_t")
    // the registered name appears ONLY inside a string literal — the
    // old FROM/JOIN token scan would spuriously reject this batch
    // statement; the parser-based scan sees only scan_batch_t
    val got = SqlFrontend.sql(spark,
      s"SELECT ' FROM $lv ' AS marker, id FROM scan_batch_t")
    assert(got.count() == 1)
    // ...while a REAL reference still fails loudly
    val e = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark, s"SELECT percentile(value, 0.5) FROM $lv")
    }
    assert(e.getMessage.contains("no supported streaming-SQL shape"))
    StreamSql.dropChangelog(lv)
  }

  test("unregistered names fall through to the batch SQL path") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .createOrReplaceTempView("streamsql_batch_t")
    val got = SqlFrontend.sql(spark,
      "SELECT id FROM streamsql_batch_t WHERE EXISTS " +
      "(SELECT 1 FROM streamsql_batch_t u WHERE u.id = streamsql_batch_t.id)")
    assert(got.count() == 2)
  }

  test("unsupported streaming constructs fail loudly, not silently degrade") {
    implicit val sc = spark.sqlContext
    val tv = fresh("tverr")
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(tv, mem.toDS().toDF(), kindCol = "kind")
    // Top-N without a declared rowId
    val e1 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT id FROM (SELECT key AS id, ROW_NUMBER() OVER (
              PARTITION BY key ORDER BY value DESC) AS rn FROM $tv)
            WHERE rn <= 1""")
    }
    assert(e1.getMessage.contains("rowId"))
    // projecting the rank number
    StreamSql.registerChangelog(tv, mem.toDS().toDF(),
      kindCol = "kind", rowId = Some("key"))
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT id, rn FROM (SELECT key AS id, ROW_NUMBER() OVER (
              PARTITION BY key ORDER BY value DESC) AS rn FROM $tv)
            WHERE rn <= 1""")
    }
    assert(e2.getMessage.contains("no-rank-number"))
    // a shape NO route supports (an agg outside every family) over a
    // registered view must throw — falling through to the batch path
    // would fold -U/-D retraction rows as ordinary inserts and return
    // silently wrong results (the documented fail-loud contract)
    val e3 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT key, MEDIAN(value) AS s FROM $tv GROUP BY key")
    }
    assert(e3.getMessage.contains("no supported streaming-SQL shape"))
    // a bare filtered scan routes via the changelog Calc since round 17
    // (row_kind rides along) — the fail-loud arm for this shape retired
    val calc = SqlFrontend.sql(spark, s"SELECT * FROM $tv WHERE value > 5")
    assert(calc.isStreaming && calc.columns.contains("row_kind"))
    // an aggregate OUTSIDE the token guard sneaking into the Calc shape
    // (selectExpr would silently plan a global Aggregate) still throws
    val e5 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark, s"SELECT percentile(value, 0.5) FROM $tv")
    }
    assert(e5.getMessage.contains("no supported streaming-SQL shape"))
    // and a registered view buried in an otherwise-unmatched statement
    // (e.g. as the EXISTS inner with an unregistered outer) also throws
    val e4 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT * FROM not_a_view WHERE EXISTS " +
        s"(SELECT 1 FROM $tv WHERE $tv.key = not_a_view.key)")
    }
    assert(e4.getMessage.contains("no supported streaming-SQL shape"))
    StreamSql.dropChangelog(tv)
  }

  test("router accepts qualified expressions, bare multi-token keys and newline conjuncts") {
    implicit val sc = spark.sqlContext
    val tv = fresh("tvq")
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(tv, mem.toDS().toDF(),
      kindCol = "kind", rowId = Some("key"))
    // view-qualified partition/order/tiebreak exprs: the stripped inner
    // items must compare against the STRIPPED partition/order sides
    val topn = SqlFrontend.sql(spark,
      s"""SELECT grp, id, v FROM (
            SELECT $tv.key % 6 AS grp, $tv.key AS id, $tv.value AS v,
                   ROW_NUMBER() OVER (PARTITION BY $tv.key % 6
                     ORDER BY $tv.value DESC, $tv.key) AS rn
            FROM $tv) t WHERE rn <= 2""")
    assert(topn.columns.toSeq == Seq("grp", "id", "v", "row_kind", "row_ord"))
    // bare un-aliased group key: `key % 5` must stay one expression,
    // not backtrack to expr `key %` + implicit alias `5`
    val dist = SqlFrontend.sql(spark,
      s"SELECT key % 5, COUNT(DISTINCT value) AS d FROM $tv GROUP BY key % 5")
    assert(dist.columns.contains("d"))
    // newline-delimited AND inside the EXISTS subquery predicate
    val rv = fresh("rvq")
    val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val ex = SqlFrontend.sql(spark,
      s"SELECT key AS k FROM $tv WHERE EXISTS (SELECT 1 FROM $rv" +
      s" WHERE $rv.key = $tv.key\nAND $rv.value >= 5)")
    assert(ex.columns.toSeq == Seq("k", "row_kind", "row_ord"))
    StreamSql.dropChangelog(tv); StreamSql.dropChangelog(rv)
  }

  test("SQL SUM/COUNT/AVG/VAR_POP routes to the stats changelog aggregate") {
    implicit val sc = spark.sqlContext
    val gv = fresh("gv")
    val sqlMem = MemoryStream[CRow]; val apiMem = MemoryStream[CRow]
    StreamSql.registerChangelog(gv, sqlMem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT key % 2 AS g, SUM(value) AS s, COUNT(*) AS c,
                 AVG(value) AS a, VAR_POP(value) AS vp,
                 STDDEV_SAMP(value) AS sd
          FROM $gv GROUP BY key % 2""")
    val direct = Changelog.aggregateChangelogStats[Long, CRow](
      apiMem.toDS().groupByKey(_.key % 2), _.kind, _.value)
    val sinkS = fresh("sql_ga"); val sinkA = fresh("api_ga")
    val qs = out.writeStream.format("memory").queryName(sinkS)
      .outputMode(OutputMode.Append).start()
    val qa = direct.writeStream.format("memory").queryName(sinkA)
      .outputMode(OutputMode.Append).start()
    try {
      def feed(rows: CRow*): Unit = {
        sqlMem.addData(rows); apiMem.addData(rows)
        qs.processAllAvailable(); qa.processAllAvailable()
      }
      feed(CRow(2, "+I", 10.0, 1), CRow(4, "+I", 20.0, 2))
      feed(CRow(2, "-U", 10.0, 1), CRow(2, "+U", 16.0, 1)) // in-place update
      feed(CRow(4, "-D", 20.0, 2)) // retraction reverses both moments
    } finally { qs.stop(); qa.stop() }
    val gotSql = spark.table(sinkS)
      .select("g", "s", "c", "a", "vp", "sd", "row_kind")
      .as[(Long, Double, Long, Double, Double, Option[Double], String)]
      .collect().toList
    // the SQL projection must equal the derivation over the direct
    // accumulator, operand order and all
    val gotApi = spark.table(sinkA)
      .selectExpr("key", "sum", "count",
        "sum / count",
        "(sumsq - sum * sum / count) / count",
        "CASE WHEN count > 1 THEN " +
          "sqrt((sumsq - sum * sum / count) / (count - 1)) END",
        "kind")
      .as[(Long, Double, Long, Double, Double, Option[Double], String)]
      .collect().toList
    assert(gotSql == gotApi)
    // spot-check the lifecycle: the update leaves count 2 → var over
    // {16, 20}: mean 18, var_pop 4
    assert(gotSql.map(r => (r._1, r._2, r._3, r._5, r._7)).contains(
      (0L, 36.0, 2L, 4.0, "+U")))
    StreamSql.dropChangelog(gv)
  }

  test("SQL WHERE pre-filters the view; HAVING runs as a changelog filter with explicit -D") {
    implicit val sc = spark.sqlContext
    val hv = fresh("hv")
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(hv, mem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT key % 2 AS g, SUM(value) AS s, COUNT(*) AS c
          FROM $hv WHERE value < 100 GROUP BY key % 2 HAVING s > 15""")
    assert(out.columns.toSeq == Seq("g", "s", "c", "row_kind"))
    val sink = fresh("sql_having")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      // WHERE drops the 200-value row entirely; sum 10 fails HAVING
      mem.addData(CRow(2, "+I", 10.0, 1), CRow(4, "+I", 200.0, 2))
      q.processAllAvailable()
      // sum 10 → 22 crosses the HAVING threshold → group enters (+U)
      mem.addData(CRow(6, "+I", 12.0, 3))
      q.processAllAvailable()
      // stays above: value change emits -U/+U
      mem.addData(CRow(6, "-U", 12.0, 3), CRow(6, "+U", 13.0, 3))
      q.processAllAvailable()
      // retraction drops the sum below the threshold → explicit -D
      mem.addData(CRow(6, "-D", 13.0, 3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).select("g", "s", "c", "row_kind")
      .as[(Long, Double, Long, String)].collect().toList
    assert(got == List(
      (0L, 22.0, 2L, "+U"),
      (0L, 22.0, 2L, "-U"), (0L, 23.0, 2L, "+U"),
      (0L, 23.0, 2L, "-D")))
    StreamSql.dropChangelog(hv)
  }

  test("SQL MIN/MAX routes to the extremes aggregate; mixed families route to the multi operator") {
    implicit val sc = spark.sqlContext
    val mv = fresh("mv")
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(mv, mem.toDS().toDF(),
      kindCol = "kind", rowId = Some("ord"))
    val out = SqlFrontend.sql(spark,
      s"""SELECT key % 2 AS g, MIN(value) AS mn, MAX(value) AS mx,
                 COUNT(*) AS c FROM $mv GROUP BY key % 2""")
    val sink = fresh("sql_mm")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(CRow(2, "+I", 5.0, 1), CRow(4, "+I", 9.0, 2))
      q.processAllAvailable()
      mem.addData(CRow(4, "-D", 9.0, 2)) // current max retracts
      q.processAllAvailable()            // runner-up re-admitted from live set
    } finally q.stop()
    val got = spark.table(sink).select("g", "mn", "mx", "c", "row_kind")
      .as[(Long, Double, Double, Long, String)].collect().toList
    assert(got == List(
      (0L, 5.0, 9.0, 2L, "+U"),
      (0L, 5.0, 9.0, 2L, "-U"), (0L, 5.0, 5.0, 1L, "+U")))
    // heterogeneous families in ONE statement: SUM + MIN + COUNT route
    // onto the multi-accumulator operator (GroupAggFunction hosting
    // both families) — previously a documented fail-loud rejection
    val mixMem = MemoryStream[CRow]
    val mixV = fresh("mixv")
    StreamSql.registerChangelog(mixV, mixMem.toDS().toDF(),
      kindCol = "kind", rowId = Some("ord"))
    val mixed = SqlFrontend.sql(spark,
      s"""SELECT key % 2 AS g, SUM(value) AS s, MIN(value) AS mn,
                 MAX(value) AS mx, AVG(value) AS a, COUNT(*) AS c
          FROM $mixV GROUP BY key % 2""")
    val mixSink = fresh("sql_mixed")
    val qm = mixed.writeStream.format("memory").queryName(mixSink)
      .outputMode(OutputMode.Append).start()
    try {
      mixMem.addData(CRow(2, "+I", 5.0, 1), CRow(4, "+I", 9.0, 2))
      qm.processAllAvailable()
      mixMem.addData(CRow(4, "-D", 9.0, 2)) // max retracts: both families react
      qm.processAllAvailable()
    } finally qm.stop()
    val gotMix = spark.table(mixSink)
      .select("g", "s", "mn", "mx", "a", "c", "row_kind")
      .as[(Long, Double, Double, Double, Double, Long, String)]
      .collect().toList
    assert(gotMix == List(
      (0L, 14.0, 5.0, 9.0, 7.0, 2L, "+U"),
      (0L, 14.0, 5.0, 9.0, 7.0, 2L, "-U"), (0L, 5.0, 5.0, 5.0, 5.0, 1L, "+U")))
    StreamSql.dropChangelog(mixV)
    // MIN/MAX without a declared rowId: pointer at registration
    val mv2 = fresh("mv2")
    StreamSql.registerChangelog(mv2, mem.toDS().toDF(), kindCol = "kind")
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT key AS g, MAX(value) AS mx FROM $mv2 GROUP BY key")
    }
    assert(e2.getMessage.contains("rowId"))
    StreamSql.dropChangelog(mv); StreamSql.dropChangelog(mv2)
  }

  test("EXISTS rejects colliding qualifiers and self-EXISTS (attribution ambiguity)") {
    implicit val sc = spark.sqlContext
    val lv = fresh("exg"); val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, mem.toDS().toDF(), kindCol = "kind")
    // self-EXISTS on one registered view: the inner qualifier would
    // match first and silently swap lKey/rKey — must point at
    // re-registering under a distinct name
    val e1 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT key AS k FROM $lv a
            WHERE EXISTS (SELECT 1 FROM $lv b WHERE b.key = a.key)""")
    }
    assert(e1.getMessage.contains("self-EXISTS"))
    // outer alias colliding case-insensitively with the inner view name
    val rv = fresh("exc")
    val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT key AS k FROM $lv AS ${rv.toUpperCase}
            WHERE EXISTS (SELECT 1 FROM $rv
                          WHERE $rv.key = ${rv.toUpperCase}.key)""")
    }
    assert(e2.getMessage.contains("disjoint"))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("qualifier rewrites are string-literal-opaque (strip and join requalification)") {
    implicit val sc = spark.sqlContext
    // unit level: qualifier-like text inside a literal must survive
    assert(SqlFrontend.strip("concat(a.name, ' see a.example ')", Seq("a")) ==
      "concat(name, ' see a.example ')")
    assert(SqlFrontend.strip("'it''s a.b' || a.b", Seq("a")) ==
      "'it''s a.b' || b")
    // end to end: a join projection whose literal contains `a.`-shaped
    // text must emit the literal unchanged (not '__l.'-rewritten)
    val lv = fresh("litl"); val rv = fresh("litr")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT concat(a.value, ' see a.example ') AS s, b.value AS w
          FROM $lv a JOIN $rv b ON a.key = b.key""")
    val sink = fresh("sql_lit")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1))
      rmem.addData(CRow(1, "+I", 2.0, 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).select("s").as[String].collect().toList
    assert(got == List("10.0 see a.example "))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("DISTINCT as an identifier substring must not trip the COUNT(DISTINCT) route") {
    implicit val sc = spark.sqlContext
    val dv = fresh("dvw")
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(dv, mem.toDS().toDF(), kindCol = "kind")
    // `distinct_key` is an alias, not a COUNT(DISTINCT …) item: this is
    // a supported moment-aggregate statement and must route as one
    val out = SqlFrontend.sql(spark,
      s"""SELECT key AS distinct_key, SUM(value) AS s
          FROM $dv GROUP BY key""")
    assert(out.columns.toSeq == Seq("distinct_key", "s", "row_kind"))
    StreamSql.dropChangelog(dv)
  }

  test("SQL GROUP BY on a STRING key routes without user hashing; HAVING keeps working") {
    implicit val sc = spark.sqlContext
    val sv = fresh("strv")
    val mem = MemoryStream[SRow]
    StreamSql.registerChangelog(sv, mem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT skey AS src, SUM(value) AS s, COUNT(*) AS c
          FROM $sv GROUP BY skey HAVING s > 4""")
    assert(out.schema("src").dataType ==
      org.apache.spark.sql.types.StringType)
    val sink = fresh("sql_strkey")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(SRow("web/en", "+I", 5.0, 1), SRow("books", "+I", 2.0, 2))
      q.processAllAvailable()
      // books crosses the HAVING threshold; web/en updates in place
      mem.addData(SRow("books", "+I", 3.0, 3), SRow("web/en", "+I", 1.0, 4))
      q.processAllAvailable()
      // retraction drops web/en below the threshold → explicit -D
      mem.addData(SRow("web/en", "-D", 5.0, 5))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).select("src", "s", "c", "row_kind")
      .as[(String, Double, Long, String)].collect().toList
    assert(got.filter(_._1 == "books") == List(("books", 5.0, 2L, "+U")))
    assert(got.filter(_._1 == "web/en") == List(
      ("web/en", 5.0, 1L, "+U"),
      ("web/en", 5.0, 1L, "-U"), ("web/en", 6.0, 2L, "+U"),
      ("web/en", 6.0, 2L, "-D")))
    StreamSql.dropChangelog(sv)
  }

  test("mixed numeric join-key types normalize to one canonical form; disjoint types reject") {
    implicit val sc = spark.sqlContext
    val lv = fresh("mkl"); val rv = fresh("mkr")
    val lmem = MemoryStream[CRow]   // key: Long
    val rmem = MemoryStream[SRow]   // value used as a DOUBLE key below
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv,
      rmem.toDS().toDF().withColumnRenamed("value", "dkey"), kindCol = "kind")
    // Long key vs Double key: both normalize to double, so 1 matches
    // 1.0 (an unnormalized per-side stringification would compare
    // "1" vs "1.0" and silently match NOTHING)
    val out = SqlFrontend.sql(spark,
      s"""SELECT a.value AS v, b.skey AS s
          FROM $lv a JOIN $rv b ON a.key = b.dkey""")
    val sink = fresh("sql_mixedkey")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 42.0, 1))
      rmem.addData(SRow("hello", "+I", 1.0, 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).select("v", "s", "row_kind")
      .as[(Double, String, String)].collect().toList
    assert(got == List((42.0, "hello", "+I")))
    // numeric vs string key: no canonical common form — rejected with
    // a pointer at deriving a common-typed key column
    val e = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT a.value AS v FROM $lv a JOIN $rv b ON a.key = b.skey""")
    }
    assert(e.getMessage.contains("key types differ"))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL UNION ALL is changelog-preserving; branch WHERE is a changelog-mode filter") {
    implicit val sc = spark.sqlContext
    val lv = fresh("unl"); val rv = fresh("unr")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind",
      rowId = Some("ord"))
    val out = SqlFrontend.sql(spark,
      s"""SELECT 'a' AS side, key, value FROM $lv
          UNION ALL
          SELECT 'b' AS side, key, value FROM $rv WHERE value < 100""")
    assert(out.columns.toSeq == Seq("side", "key", "value", "row_kind"))
    val sink = fresh("sql_union")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1))
      rmem.addData(CRow(1, "+I", 5.0, 1), CRow(2, "+I", 200.0, 2))
      q.processAllAvailable()
      // retraction flows through the unfiltered branch unchanged
      lmem.addData(CRow(1, "-D", 10.0, 1))
      q.processAllAvailable()
      // a filtered-branch row whose NEW value fails the predicate must
      // surface as an explicit -D (an upsert sink would otherwise keep
      // the stale 5.0 row forever) — the changelog-MODE filter
      rmem.addData(CRow(1, "-U", 5.0, 1), CRow(1, "+U", 150.0, 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).select("side", "key", "value", "row_kind")
      .as[(String, Long, Double, String)].collect().toSet
    assert(got == Set(
      ("a", 1L, 10.0, "+I"),
      ("b", 1L, 5.0, "+U"),   // 200.0 dropped by the branch WHERE
      ("a", 1L, 10.0, "-D"),
      ("b", 1L, 5.0, "-D")))  // left the filtered view: explicit -D
    // arity mismatch is rejected
    val e = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT key, value FROM $lv UNION ALL SELECT key FROM $rv")
    }
    assert(e.getMessage.contains("arity"))
    // branch WHERE without the view's rowId: pointer at registration
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT key FROM $rv UNION ALL
            SELECT key FROM $lv WHERE value < 100""")
    }
    assert(e2.getMessage.contains("rowId"))
    // three branches parse branch-by-branch, not by regex backtracking
    val three = SqlFrontend.sql(spark,
      s"""SELECT key, value FROM $lv UNION ALL
          SELECT key, value FROM $rv UNION ALL
          SELECT key + 1, value FROM $lv""")
    assert(three.columns.toSeq == Seq("key", "value", "row_kind"))
    // UNION separated from ALL by a long whitespace run (newline +
    // indent) still splits — keyword matching is over the full string,
    // not a fixed-width window
    val spaced = SqlFrontend.sql(spark,
      s"SELECT key, value FROM $lv UNION    \n      ALL " +
      s"SELECT key, value FROM $rv")
    assert(spaced.columns.toSeq == Seq("key", "value", "row_kind"))
    // 'ALLIES' is not 'ALL': no split, so the statement is rejected as
    // not-a-union (fail-loud, never a silent wrong parse)
    val e3 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT key, value FROM $lv UNION   ALLIES FROM $rv")
    }
    assert(e3.getMessage.contains("no supported streaming-SQL shape"))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL INTERSECT routes to distinct + semi join: membership lifecycle") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lv"); val rv = fresh("rv")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT key AS k, value AS v FROM $lv
          INTERSECT
          SELECT key AS k, value AS v FROM $rv""")
    assert(out.columns.toSeq == Seq("k", "v", "row_kind", "row_ord"))
    val sink = fresh("sql_isect")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1)) // only in A → not a member
      q.processAllAvailable()
      rmem.addData(CRow(1, "+I", 10.0, 1)) // enters B → membership 0→1
      q.processAllAvailable()
      lmem.addData(CRow(1, "+I", 10.0, 2)) // DUPLICATE in A → distinct absorbs
      q.processAllAvailable()
      rmem.addData(CRow(1, "-D", 10.0, 1)) // B drains → membership 1→0
      q.processAllAvailable()
      lmem.addData(CRow(2, "+I", 5.0, 3))  // A-only value → never a member
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("k", "v", "row_kind").as[(Long, Double, String)].collect().toList
    assert(got == List((1L, 10.0, "+I"), (1L, 10.0, "-D")), s"got $got")
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SQL EXCEPT routes to distinct + anti join; duplicates in A stay distinct") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lv"); val rv = fresh("rv")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT key AS k, value AS v FROM $lv
          EXCEPT
          SELECT key AS k, value AS v FROM $rv""")
    val sink = fresh("sql_except")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1), CRow(1, "+I", 10.0, 2))
      q.processAllAvailable() // in A (twice), not in B → ONE +I
      rmem.addData(CRow(1, "+I", 10.0, 1))
      q.processAllAvailable() // appears in B → -D
      rmem.addData(CRow(1, "-D", 10.0, 1))
      q.processAllAvailable() // B drains → re-admitted +I
      lmem.addData(CRow(1, "-D", 10.0, 1))
      q.processAllAvailable() // one of two A copies retracts → still live
      lmem.addData(CRow(1, "-D", 10.0, 2))
      q.processAllAvailable() // last A copy retracts → -D
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("v", "row_kind").as[(Double, String)].collect().toList
    assert(got == List((10.0, "+I"), (10.0, "-D"), (10.0, "+I"), (10.0, "-D")),
      s"got $got")
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("SELECT DISTINCT routes to the distinct changelog: 0<->1 membership only") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lv")
    val lmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind",
      rowId = Some("ord"))
    val out = SqlFrontend.sql(spark,
      s"SELECT DISTINCT value AS v FROM $lv WHERE key <= 2")
    assert(out.columns.toSeq == Seq("v", "row_kind", "row_ord"))
    val sink = fresh("sql_seldist")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1)) // value enters → +I
      q.processAllAvailable()
      lmem.addData(CRow(2, "+I", 10.0, 2)) // duplicate instance → silent
      q.processAllAvailable()
      lmem.addData(CRow(9, "+I", 10.0, 3)) // filtered out (key > 2) → silent
      q.processAllAvailable()
      lmem.addData(CRow(1, "-D", 10.0, 1)) // one of two live → silent
      q.processAllAvailable()
      lmem.addData(CRow(2, "-D", 10.0, 2)) // last instance leaves → -D
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink).orderBy("row_ord")
      .select("v", "row_kind").as[(Double, String)].collect().toList
    assert(got == List((10.0, "+I"), (10.0, "-D")), s"got $got")
    StreamSql.dropChangelog(lv)
  }

  test("ORDER BY LIMIT routes to a global updating Top-N; retraction re-admits") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lv")
    val lmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind",
      rowId = Some("key"))
    val out = SqlFrontend.sql(spark,
      s"SELECT key AS k, value AS v FROM $lv ORDER BY value DESC, key LIMIT 2")
    assert(out.columns.toSeq == Seq("k", "v", "row_kind", "row_ord"))
    val sink = fresh("sql_sortlim")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      lmem.addData(CRow(1, "+I", 10.0, 1), CRow(2, "+I", 20.0, 2),
                   CRow(3, "+I", 5.0, 3)) // top-2 = {2:20, 1:10}
      q.processAllAvailable()
      lmem.addData(CRow(2, "-D", 20.0, 2)) // leader retracts → 3 re-admitted
      q.processAllAvailable()
    } finally q.stop()
    val fin = graft.streaming.Changelog.materialize(
        spark.table(sink), "k", "row_kind", "row_ord")
      .select("k", "v").as[(Long, Double)].collect().toSet
    assert(fin == Set((1L, 10.0), (3L, 5.0)), s"got $fin")
    // the leader's exit must be an explicit retraction, not silence
    assert(spark.table(sink)
      .filter($"k" === 2 && $"row_kind".isin("-U", "-D")).count() == 1)
    // projection outside the rank state's columns fails loudly
    val e = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT kind FROM $lv ORDER BY value DESC, key LIMIT 2")
    }
    assert(e.getMessage.contains("rank state"))
    StreamSql.dropChangelog(lv)
  }

  test("rank-family rowId must be integral — lossy casts reject loudly") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lv")
    val lmem = MemoryStream[CRow]
    // a DOUBLE rowId would truncate (1.2 and 1.7 merge to one row), a
    // STRING rowId would die as null deep in the state encoder
    StreamSql.registerChangelog(lv,
      lmem.toDS().toDF().withColumn("did", $"value" + 0.2),
      kindCol = "kind", rowId = Some("did"))
    val e1 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT did, value FROM $lv ORDER BY value DESC, did LIMIT 2")
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT key, value FROM (
              SELECT key, value, ROW_NUMBER() OVER (PARTITION BY key
                ORDER BY value DESC, did) AS rn
              FROM $lv) t WHERE rn <= 2""")
    }
    assert(e2.getMessage.contains("integral"))
    StreamSql.dropChangelog(lv)
  }

  test("set-op keyword inside a backslash-escaped literal does not split the statement") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lv")
    val lmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    // Spark's parser accepts \' escapes inside literals; the set-op
    // splitter must not resume code scanning mid-literal and split at
    // the EXCEPT, which would throw 'unparseable EXCEPT branch'
    val out = SqlFrontend.sql(spark,
      s"""SELECT key AS g, SUM(value) AS sv FROM $lv
          WHERE kind <> 'don\\'t EXCEPT me' GROUP BY key""")
    assert(out.columns.contains("sv"))
    StreamSql.dropChangelog(lv)
  }

  test("set-op guardrails: ALL rejected, 3+ branches rejected, type mismatch rejected") {
    implicit val sc = spark.sqlContext
    val lv = fresh("lv"); val rv = fresh("rv")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val eAll = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT key FROM $lv INTERSECT ALL SELECT key FROM $rv")
    }
    assert(eAll.getMessage.contains("DISTINCT forms"))
    val eChain = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark, s"SELECT key FROM $lv INTERSECT " +
        s"SELECT key FROM $rv EXCEPT SELECT key FROM $rv")
    }
    assert(eChain.getMessage.contains("two branches"))
    val eType = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"SELECT key FROM $lv EXCEPT SELECT value FROM $rv")
    }
    assert(eType.getMessage.contains("types differ"))
    // an identifier containing the keyword must NOT trip the split
    val lv2 = fresh("except_like")
    StreamSql.registerChangelog(lv2,
      lmem.toDS().toDF().withColumnRenamed("value", "intersected"),
      kindCol = "kind")
    val ok = SqlFrontend.sql(spark,
      s"SELECT key, SUM(intersected) AS s FROM $lv2 GROUP BY key")
    assert(ok.columns.contains("s"))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
    StreamSql.dropChangelog(lv2)
  }

  test("AND immediately followed by '(' still splits conjuncts") {
    implicit val sc = spark.sqlContext
    val lv = fresh("apl"); val rv = fresh("apr")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind")
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"SELECT key AS k FROM $lv WHERE EXISTS (SELECT 1 FROM $rv" +
      s" WHERE $rv.key = $lv.key AND($rv.value >= 5))")
    assert(out.columns.toSeq == Seq("k", "row_kind", "row_ord"))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }

  test("mixed-domain JOIN: an append stream view lifts to a +I changelog") {
    implicit val sc = spark.sqlContext
    val sv = fresh("mixs"); val cv = fresh("mixc")
    val smem = MemoryStream[(Long, Long, Double, Long)]
    val cmem = MemoryStream[CRow]
    val sdf = smem.toDS()
      .select($"_1".as("id"), $"_2".as("skey"), $"_3".as("sv"),
              timestamp_millis($"_4").as("ets"))
    StreamSql.registerStream(sv, sdf, tsCol = "ets", delay = "1 second")
    StreamSql.registerChangelog(cv, cmem.toDS().toDF(), kindCol = "kind")
    val out = SqlFrontend.sql(spark,
      s"""SELECT $sv.id AS sid, $sv.sv AS sval, $cv.value AS cval
          FROM $sv JOIN $cv ON $sv.skey = $cv.key""")
    val sink = fresh("mix_sink")
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      // append row arrives first; no changelog partner yet → nothing
      smem.addData((1L, 7L, 5.0, 1000L))
      q.processAllAvailable()
      assert(spark.table(sink).isEmpty)
      // partner appears → +I pair
      cmem.addData(CRow(7, "+I", 3.0, 1))
      q.processAllAvailable()
      // partner churns → retract + re-emit with the new value
      cmem.addData(CRow(7, "-U", 3.0, 1), CRow(7, "+U", 4.0, 1))
      q.processAllAvailable()
      // a second append row pairs with the CURRENT partner value
      smem.addData((2L, 7L, 6.0, 2000L))
      q.processAllAvailable()
    } finally q.stop()
    val fin = Changelog.materialize(spark.table(sink),
        "sid", "row_kind", "row_ord")
      .select("sid", "sval", "cval").as[(Long, Double, Double)]
      .collect().toSet
    assert(fin == Set((1L, 5.0, 4.0), (2L, 6.0, 4.0)))
    // the mixed route is the changelog join, not the interval join: the
    // append side's rows never retract, the changelog side's do
    val kinds = spark.table(sink).select("row_kind").as[String]
      .collect().toSet
    assert(kinds.contains("-U") || kinds.contains("-D"))
    StreamSql.dropStream(sv); StreamSql.dropChangelog(cv)
  }

  test("subqueries in a route's WHERE reject with the standard message") {
    implicit val sc = spark.sqlContext
    val lv = fresh("sqw"); val rv = fresh("sqx")
    val lmem = MemoryStream[CRow]; val rmem = MemoryStream[CRow]
    StreamSql.registerChangelog(lv, lmem.toDS().toDF(), kindCol = "kind",
      rowId = Some("ord"))
    StreamSql.registerChangelog(rv, rmem.toDS().toDF(), kindCol = "kind")
    // SELECT DISTINCT … WHERE EXISTS(subquery) would otherwise route
    // into filterChangelog and die with a confusing analysis error
    val e1 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT DISTINCT key FROM $lv
            WHERE EXISTS (SELECT 1 FROM $rv WHERE $rv.key = $lv.key)""")
    }
    assert(e1.getMessage.contains("subquery"))
    // same guard on the GROUP BY aggregates' WHERE
    val e2 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT key, SUM(value) AS s FROM $lv
            WHERE key IN (SELECT key FROM $rv) GROUP BY key""")
    }
    assert(e2.getMessage.contains("subquery"))
    // …and on ORDER BY … LIMIT
    val e3 = intercept[IllegalArgumentException] {
      SqlFrontend.sql(spark,
        s"""SELECT ord, value FROM $lv
            WHERE EXISTS (SELECT 1 FROM $rv)
            ORDER BY value DESC LIMIT 3""")
    }
    assert(e3.getMessage.contains("subquery"))
    // literal-opaque: the keyword inside a string constant is data
    val ok = SqlFrontend.sql(spark,
      s"SELECT DISTINCT key FROM $lv WHERE value > 0 AND 'EXISTS (' = 'EXISTS ('")
    assert(ok.columns.contains("row_kind"))
    StreamSql.dropChangelog(lv); StreamSql.dropChangelog(rv)
  }
}
