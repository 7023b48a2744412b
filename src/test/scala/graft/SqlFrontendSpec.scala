package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, SqlFrontend}

/** The SQL dispatcher must reproduce the operator-API results: ASOF JOIN
  * (inner + LEFT) → AsOfJoin.leftAsOf, FOR SYSTEM_TIME AS OF → broadcast
  * snapshot join, and pass plain SQL through untouched. */
class SqlFrontendSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private lazy val views = {
    val e = Tables.table(spark, "/root/testdata/sf0.001", "events")
    e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("sf_purchases")
    e.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
              col("ts").as("v_ts"))
      .createOrReplaceTempView("sf_views")
    Tables.table(spark, "/root/testdata/sf0.001", "customer")
      .createOrReplaceTempView("sf_customer")
    Tables.table(spark, "/root/testdata/sf0.001", "nation")
      .createOrReplaceTempView("sf_nation")
  }

  test("ASOF JOIN SQL equals AsOfJoin.leftAsOf (inner semantics)") {
    views
    val got = SqlFrontend.sql(spark, """
        SELECT p.p_id, v.v_id
        FROM sf_purchases p
        ASOF JOIN sf_views v
          ON p.user_id = v.v_user AND p.ts >= v.v_ts""",
      tiebreak = Some("v_id"))
    val exp = AsOfJoin.leftAsOf(
        spark.table("sf_purchases"), spark.table("sf_views"),
        "user_id", "v_user", "ts", "v_ts", Seq("v_id"), "v_id")
      .filter(col("v_id").isNotNull)
      .select(col("p_id"), col("v_id"))
    assert(got.count() > 0)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
    assert(got.count() == exp.count())
  }

  test("ASOF LEFT JOIN keeps unmatched probes with null version columns") {
    views
    val inner = SqlFrontend.sql(spark, """
        SELECT p.p_id, v.v_id FROM sf_purchases p ASOF JOIN sf_views v
          ON p.user_id = v.v_user AND p.ts >= v.v_ts""",
      tiebreak = Some("v_id"))
    val left = SqlFrontend.sql(spark, """
        SELECT p.p_id, v.v_id FROM sf_purchases p ASOF LEFT JOIN sf_views v
          ON p.user_id = v.v_user AND p.ts >= v.v_ts""",
      tiebreak = Some("v_id"))
    assert(left.count() == spark.table("sf_purchases").count())
    assert(left.filter(col("v_id").isNotNull).count() == inner.count())
  }

  test("FOR SYSTEM_TIME AS OF rewrites to a broadcast snapshot join") {
    views
    val got = SqlFrontend.sql(spark, """
        SELECT c.c_custkey, n.n_name
        FROM sf_customer c
        JOIN sf_nation FOR SYSTEM_TIME AS OF c.proctime AS n
          ON c.c_nationkey = n.n_nationkey""")
    val exp = spark.table("sf_customer")
      .join(broadcast(spark.table("sf_nation")),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty)
    assert(got.count() == exp.count() && got.count() > 0)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("FOR SYSTEM_TIME AS OF on a STREAMING probe: stream-static lookup join") {
    views
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SEv]
    mem.toDF().createOrReplaceTempView("sf_stream_probe")
    val joined = SqlFrontend.sql(spark, """
        SELECT p.event_id, n.n_name
        FROM sf_stream_probe p
        JOIN sf_nation FOR SYSTEM_TIME AS OF p.proctime AS n
          ON p.user_id % 25 = n.n_nationkey""")
    assert(joined.isStreaming)
    val q = joined.writeStream.format("memory").queryName("s_lookup")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      val evs = (1 to 40).map(i => SEv(i.toLong, new java.sql.Timestamp(i * 1000L),
        i.toLong, "x", 0.0))
      mem.addData(evs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s_lookup").as[(Long, String)].collect().toSet
    val exp = (1 to 40).map(i => (i.toLong, s"NATION_${i % 25}")).toSet
    assert(got == exp)
  }

  test("plain SQL passes through to spark.sql") {
    views
    val got = SqlFrontend.sql(spark,
      "SELECT count(*) AS n FROM sf_customer WHERE c_acctbal > 0")
    val exp = spark.sql(
      "SELECT count(*) AS n FROM sf_customer WHERE c_acctbal > 0")
    assert(got.collect().toSeq == exp.collect().toSeq)
  }

  private lazy val gwEvents = {
    Tables.table(spark, "/root/testdata/sf0.001", "events")
      .createOrReplaceTempView("gw_spec_events")
    spark.table("gw_spec_events")
  }

  test("GROUP BY HOP SQL equals the window() DataFrame dual (slide/size order)") {
    import spark.implicits._
    gwEvents
    val got = SqlFrontend.sql(spark, """
        SELECT unix_micros(HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)) AS ws,
               count(*) AS n
        FROM gw_spec_events
        GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)""")
      .as[(Long, Long)].collect().toSet
    val exp = gwEvents
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("ws"), col("n"))
      .as[(Long, Long)].collect().toSet
    assert(got == exp && got.nonEmpty)
  }

  test("GROUP BY SESSION SQL equals the session_window() DataFrame dual") {
    import spark.implicits._
    gwEvents
    val got = SqlFrontend.sql(spark, """
        SELECT user_id,
               unix_micros(SESSION_START(ts, INTERVAL '30' MINUTE)) AS ws,
               unix_micros(SESSION_END(ts, INTERVAL '30' MINUTE)) AS we,
               count(*) AS n
        FROM gw_spec_events
        GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)""")
      .as[(Long, Long, Long, Long)].collect().toSet
    val exp = gwEvents
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("w.start")).as("ws"),
              unix_micros(col("w.end")).as("we"), col("n"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == exp && got.nonEmpty)
  }

  test("skipLiteral clamps an unterminated literal ending in backslash") {
    // 'ab\  — the backslash "escapes" past the end; the scanner must
    // return s.length, not length+1 (substring would throw otherwise)
    val s = "'ab\\"
    assert(SqlFrontend.skipLiteral(s, 0) == s.length)
    // the shared rewriter stays total on the same malformed input
    assert(SqlFrontend.strip(s"x = $s", Seq("q")) == s"x = $s")
  }

  test("skipLiteral honors spark.sql.parser.escapedStringLiterals") {
    val key = "spark.sql.parser.escapedStringLiterals"
    val prev = spark.conf.get(key)
    val s = "'C:\\' AND x = 1"
    try {
      spark.conf.set(key, "false") // default: \' is an escaped quote
      // the literal never terminates → scanner consumes to end (clamped)
      assert(SqlFrontend.skipLiteral(s, 0) == s.length)
      spark.conf.set(key, "true") // backslash is an ordinary character
      assert(SqlFrontend.skipLiteral(s, 0) == 5) // past 'C:\'
    } finally spark.conf.set(key, prev)
  }
}
