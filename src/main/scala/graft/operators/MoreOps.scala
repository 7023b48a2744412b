package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/**
 * Remaining SURVEY §2 surface: SINGLE_VALUE aggregator (§2.4), tumbling
 * COUNT windows (§2.5 CountTumblingWindowAssigner), per-window stream
 * join (§2.3 window join), lookup join (§2.3), and a second scalar
 * battery (§2.8: base64, sha2, chr, left/right, overlay, position,
 * bit_length, format_string).
 */
object MoreOps {

  private val dec = DecimalType(18, 2)

  /** q276's async-lookup emission row (top-level so its Encoder derives
    * cleanly inside the mapPartitions closure). */
  final case class AsyncHit(event_id: Long, c_nationkey: Long)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SINGLE_VALUE over groups guaranteed single-valued (count = 1).
    "q55_single_value" -> ((s, dir) => {
      s.udf.register("single_value",
        org.apache.spark.sql.functions.udaf(new graft.functions.SingleValueString()))
      val singles = Tables.table(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .filter(col("n") === 1).select(col("o_custkey").as("k"))
      Tables.table(s, dir, "orders")
        .join(singles, col("o_custkey") === col("k"), "left_semi")
        .groupBy("o_custkey")
        .agg(expr("single_value(o_orderstatus)").as("status"))
    }),

    // Tumbling count windows: fixed-size batches of 10 per user in
    // event-time order (CountTumblingWindowAssigner analogue).
    "q56_count_tumble" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.table(s, dir, "events")
        .withColumn("win", ((row_number().over(w) - 1) / 10).cast("long"))
        .groupBy("user_id", "win")
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(dec)).cast("double").as("sum_v"))
    }),

    // Window join: views ⋈ purchases of the same user in the same
    // 1-day tumbling window (JoinedStreams/window-join analogue).
    "q57_window_join" -> ((s, dir) => {
      val e = Tables.table(s, dir, "events")
      def winAgg(t: String, n: String) = e
        .filter(col("event_type") === t)
        .groupBy(col("user_id"), window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as(n))
        .select(col("user_id").as(s"u_$n"), Tables.tsMicros(col("w.start")).as(s"ws_$n"),
                col(n))
      winAgg("view", "n_views")
        .join(winAgg("purchase", "n_purch"),
          col("u_n_views") === col("u_n_purch") &&
          col("ws_n_views") === col("ws_n_purch"))
        .select(col("u_n_views").as("user_id"), col("ws_n_views").as("w_start"),
                col("n_views"), col("n_purch"))
    }),

    // Lookup join: per-event point lookup of the user's customer row
    // against a broadcast snapshot (unmatched users stay, null name).
    "q58_lookup_join" -> ((s, dir) => {
      val probe = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"))
      val snap = Tables.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      LookupJoin.snapshot(probe, snap, "user_id", "c_custkey")
        .select(col("event_id"), col("user_id"), col("c_name"),
                col("c_mktsegment"))
    }),

    // Decimal arithmetic (reference DecimalITCase): exact +,-,× with
    // Spark/DuckDB-identical result scales; division compared as double
    // (DuckDB's decimal division yields float).
    "q63_decimal" -> ((s, dir) => {
      Tables.table(s, dir, "lineitem")
        .filter(col("l_orderkey") < 300)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice").cast(dec) + col("l_quantity").cast(dec))
            .cast("double").as("add"),
          (col("l_extendedprice").cast(dec) - col("l_tax").cast(dec))
            .cast("double").as("sub"),
          (col("l_extendedprice").cast(dec) * col("l_discount").cast(DecimalType(8, 4)))
            .cast("double").as("mul"),
          (col("l_extendedprice").cast(dec).cast("double") / 3).as("divd"))
    }),

    // ASYNC lookup join under the oracle gate (the reference's
    // AsyncLookupJoinRunner + AsyncWaitOperator ordered mode,
    // RUNTIME/runtime/operators/join/lookup/AsyncLookupJoinRunner.java):
    // per-event point lookups against a dictionary service (here a
    // broadcast snapshot standing in for the external system) with a
    // sliding window of 16 in-flight requests per partition and
    // probe-ORDER emission. The async machinery must not change the
    // result set: the oracle is the plain inner-join dual (q58's
    // broadcast snapshot is the sync path; this gate is the async one).
    // DIM-BOUNDED ASSUMPTION (mirrors IVF's O(K) driver collect): the
    // `collect().toMap` below materializes the whole dictionary on the
    // driver, which is only valid because a lookup TABLE is by contract
    // a bounded dimension (the reference's lookup source is a cached
    // external table, not a fact stream). At 100 TB the fact side
    // streams through unchanged; only the dim must fit in one JVM — for
    // a dim too big to broadcast, the co-partitioned changelog join
    // (q245) is the correct shape instead, not a bigger lookup cache.
    "q276_async_lookup" -> ((s, dir) => {
      import s.implicits._
      val probe = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"))
        .as[(Long, Long)]
      val dict = s.sparkContext.broadcast(
        Tables.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
          .as[(Long, Long)].collect().toMap)
      LookupJoin.async(probe, maxInFlight = 16, ordered = true) {
        case (eventId, userId) =>
          AsyncHit(eventId, dict.value.getOrElse(userId, -1L))
      }
        .filter(_.c_nationkey >= 0L)
        .toDF()
    }),

    // Side outputs under the oracle gate (the reference's OutputTag /
    // getSideOutput fan-out, STREAM/api/datastream/
    // SingleOutputStreamOperator.java:395): one pass tags every event,
    // the named outputs and the unconsumed-rest output are read back
    // separately (each from the SHARED cached tagged plan — the
    // one-operator-many-streams shape), and the gate summarizes each
    // leg. The oracle is the single-scan CASE dual, so the split must
    // neither drop nor double-count a row.
    "q277_side_outputs" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_type"),
                floor(col("value") * 100).cast("long").as("cents"))
      val parts = SideOutput.split(ev, col("event_type"),
        Seq("purchase", "click"))
      val legs = Seq("purchase", "click", "__rest").map { t =>
        parts(t).agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
          .select(lit(t).as("tag"), col("n"), col("cents"))
      }
      // a global agg emits one (0, null) row even for an EMPTY leg; the
      // GROUP BY oracle emits no row for an absent group — drop empty
      // legs so the shapes agree on any fixture
      legs.reduce(_.unionByName(_)).filter(col("n") > 0)
    }),

    // Salted (skew-spread) join under the oracle gate (the reference's
    // skew handling per SURVEY §2.4 SplitAggregateRule / salted
    // repartition): the probe side's hot keys are sprayed over 8 salt
    // buckets, the build side replicated 8x — and the result set must be
    // EXACTLY the plain join's (salting is a physical rewrite, never a
    // semantic one).
    "q278_salted_join" -> ((s, dir) => {
      val probe = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"))
      val build = Tables.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      Skew.saltedJoin(probe, build, "user_id", "c_custkey", salts = 8)
        .select(col("event_id"), col("user_id"), col("c_nationkey"))
    }),

    // Two-phase (salted partial + final) aggregation under the oracle
    // gate (SplitAggregateRule, PLANNER/plan/rules/logical/
    // SplitAggregateRule.scala — local/global split for hot grouping
    // keys): cents sums stay integral so the salted partials merge
    // bit-exactly to the direct groupBy dual.
    "q279_two_phase_agg" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_type"),
                floor(col("value") * 100).cast("long").as("cents"))
      Skew.twoPhaseAgg(ev, "event_type", salts = 8,
        partial = Seq(sum(col("cents")).as("pc"), count(lit(1)).as("pn")),
        finalAgg = Seq(sum(col("pc")).as("cents"), sum(col("pn")).as("n")))
    }),

    // Second scalar battery.
    "q54_scalar_string2" -> ((s, dir) => {
      Tables.table(s, dir, "documents").select(
        col("doc_id"),
        base64(encode(col("lang"), "UTF-8")).as("b64"),
        (decode(unbase64(base64(encode(col("text"), "UTF-8"))), "UTF-8")
          === col("text")).as("b64_roundtrip"),
        sha2(col("text"), 256).as("sha"),
        expr("char(65 + doc_id % 26)").as("c"),
        expr("left(source, 4)").as("l4"),
        expr("right(source, 2)").as("r2"),
        overlay(col("source"), lit("XX"), lit(2)).as("ov"),
        expr("position('r' in source)").cast("int").as("pos_r"),
        bit_length(col("lang")).as("bl"),
        format_string("%s_%04d", col("lang"), col("doc_id")).as("fmt"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q55_single_value" -> """
      SELECT o_custkey, min(o_orderstatus) AS status
      FROM orders
      WHERE o_custkey IN (
        SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) = 1)
      GROUP BY o_custkey""",

    "q56_count_tumble" -> """
      SELECT user_id, CAST((rn - 1) // 10 AS BIGINT) AS win,
             count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      FROM (SELECT user_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events) x
      GROUP BY user_id, (rn - 1) // 10""",

    "q57_window_join" -> """
      WITH v AS (
        SELECT user_id, epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS ws,
               count(*) AS n_views
        FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      p AS (
        SELECT user_id, epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS ws,
               count(*) AS n_purch
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT v.user_id, v.ws AS w_start, v.n_views, p.n_purch
      FROM v JOIN p ON v.user_id = p.user_id AND v.ws = p.ws""",

    "q58_lookup_join" -> """
      SELECT event_id, user_id, c_name, c_mktsegment
      FROM events LEFT JOIN customer ON user_id = c_custkey""",

    "q276_async_lookup" -> """
      SELECT event_id, c_nationkey
      FROM events JOIN customer ON user_id = c_custkey""",

    "q277_side_outputs" -> """
      SELECT CASE WHEN event_type IN ('purchase', 'click')
                  THEN event_type ELSE '__rest' END AS tag,
             count(*) AS n,
             CAST(sum(floor(value * 100)) AS BIGINT) AS cents
      FROM events GROUP BY 1""",

    "q278_salted_join" -> """
      SELECT event_id, user_id, c_nationkey
      FROM events JOIN customer ON user_id = c_custkey""",

    "q279_two_phase_agg" -> """
      SELECT event_type, CAST(sum(floor(value * 100)) AS BIGINT) AS cents,
             count(*) AS n
      FROM events GROUP BY event_type""",

    "q63_decimal" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) + CAST(l_quantity AS DECIMAL(18,2))
                  AS DOUBLE) AS add,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) - CAST(l_tax AS DECIMAL(18,2))
                  AS DOUBLE) AS sub,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,4))
                  AS DOUBLE) AS mul,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) / 3 AS divd
      FROM lineitem WHERE l_orderkey < 300""",

    "q54_scalar_string2" -> """
      SELECT doc_id,
             to_base64(CAST(lang AS BLOB)) AS b64,
             CAST(from_base64(to_base64(CAST(text AS BLOB))) AS VARCHAR) = text
               AS b64_roundtrip,
             sha256(text) AS sha,
             chr(65 + CAST(doc_id % 26 AS INT)) AS c,
             left(source, 4) AS l4,
             right(source, 2) AS r2,
             substr(source, 1, 1) || 'XX' || substr(source, 4) AS ov,
             CAST(strpos(source, 'r') AS INT) AS pos_r,
             CAST(bit_length(lang) AS INT) AS bl,
             printf('%s_%04d', lang, doc_id) AS fmt
      FROM documents"""
  )
}
