package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/**
 * Event-time operators over the `events` table (SURVEY §2.5, §2.6, §2.3):
 * tumbling / hopping / session windows, interval (time-bounded) join,
 * as-of join, keep-first deduplication, JSON access. These are the batch
 * duals of the reference's streaming window machinery
 * (flink-table-runtime-blink/.../operators/window/WindowOperator.java:98,
 * assigners/Tumbling-, Sliding-, SessionWindowAssigner) — same bucketing
 * semantics expressed as groupBy over computed window columns, which is
 * also exactly how the streaming versions run under Structured Streaming
 * (`groupBy(window(...))` + watermark).
 *
 * Timestamps in outputs are epoch-µs BIGINTs (unix_micros) so the DuckDB
 * compare is representation-free.
 *
 * Scale notes: every query here is a single hash exchange on its grouping
 * key (window bucket, user_id); the hop-window expansion is a 2× row
 * inflation BEFORE the shuffle (explode of 2 window starts), which is how
 * Flink's PanedWindowAssigner amortizes sliding windows too.
 */
object EventOps {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  private val dec = DecimalType(18, 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: each purchase sees the latest view at-or-before it.
    "q14_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
                col("ts").as("v_ts"))
      AsOfJoin.leftAsOf(
          purchases, views,
          leftKey = "user_id", rightKey = "v_user",
          leftTs = "ts", rightTs = "v_ts",
          rightCols = Seq("v_id"), rightOrd = "v_id")
        .filter(col("v_id").isNotNull)
        .select(col("p_id"), col("v_id"))
    }),

    // The q14 shape entered through the ASOF SQL front-end
    // (operators/SqlFrontend.scala) — the oracle gate value-checks the
    // SQL rewrite against DuckDB's native ASOF JOIN.
    "q113_asof_sql" -> ((s, dir) => {
      val e = ev(s, dir)
      e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView("asof_purchases")
      e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
                col("ts").as("v_ts"))
        .createOrReplaceTempView("asof_views")
      SqlFrontend.sql(s, """
          SELECT p.p_id, v.v_id
          FROM asof_purchases p
          ASOF JOIN asof_views v
            ON p.user_id = v.v_user AND p.ts >= v.v_ts""",
        tiebreak = Some("v_id"))
    }),

    // Tumbling window (TUMBLE): 1-day buckets per event_type.
    "q25_tumble" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(dec)).cast("double").as("sum_v"))
        .select(col("event_type"), Tables.tsMicros(col("w.start")).as("w_start"),
                col("n"), col("sum_v"))
    }),

    // Hopping window (HOP): 1h size, 30m slide — explode the 2 covering
    // window starts before the shuffle, then plain hash agg.
    "q26_hop" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(Tables.tsMicros(col("w.start")).as("w_start"), col("n"))
    }),

    // Session window (SESSION gap 30 min) per user: session count and size.
    "q27_session" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
             sum(col("n_events")).as("n_events"),
             max(col("n_events")).as("max_session"))
    }),

    // Interval (time-bounded) join: clicks within 10 min before a purchase
    // by the same user (TimeBoundedStreamJoin analogue).
    "q28_interval_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                col("ts").as("p_ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      p.join(c, col("p_user") === col("c_user") &&
               col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
               col("c_ts") < col("p_ts"), "left")
        .groupBy("p_id")
        .agg(count(col("c_ts")).as("n_clicks"))
    }),

    // Deduplicate keep-first (DeduplicateKeepFirstRowFunction):
    // earliest event per (user_id, event_type), ROW_NUMBER()=1 pattern.
    "q29_dedup_first" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"))
    }),

    // Flink SQL group-window syntax (GROUP BY TUMBLE + TUMBLE_START/END
    // accessors) through the SQL front-end — rewritten syntactically to
    // Spark's window() grouping (SqlFrontend.groupWindows), so the plan
    // is the same codegen'd hash aggregate as q25.
    "q133_sql_tumble" -> ((s, dir) => {
      ev(s, dir).createOrReplaceTempView("gw_events")
      SqlFrontend.sql(s, """
        SELECT event_type,
               unix_micros(TUMBLE_START(ts, INTERVAL '1' DAY)) AS w_start,
               unix_micros(TUMBLE_END(ts, INTERVAL '1' DAY)) AS w_end,
               count(*) AS n
        FROM gw_events
        GROUP BY event_type, TUMBLE(ts, INTERVAL '1' DAY)""")
    }),

    // JSON field access + aggregation over extracted values.
    "q30_json_props" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // Slowly-changing-dimension type-2 build from an update log: per
    // key, each update becomes a versioned row with a validity interval
    // [valid_from, valid_to) closed by the NEXT update (lead), open
    // (NULL) for the current row. The batch dual of materializing an
    // upsert changelog with history retained (streaming/Changelog.scala
    // materializes latest-only) — one hash exchange on the key, one
    // partition-local sort, no self-join.
    "q160_scd2" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .filter(col("event_type") === "view")
        .withColumn("valid_from", Tables.tsMicros(col("ts")))
        .withColumn("valid_to", Tables.tsMicros(lead(col("ts"), 1).over(w)))
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("event_id"), col("value"),
                col("version"), col("valid_from"), col("valid_to"),
                col("is_current"))
    }),

    // Conversion funnel view → click → purchase: per user, the first
    // view, the first click AFTER it, the first purchase AFTER that —
    // ORDERED containment, not mere co-occurrence. One pass: per-user
    // conditional mins chain through two more conditional aggregates on
    // the same grouped frame (no event self-joins); output is the
    // stage-count funnel.
    "q172_conversion_funnel" -> ((s, dir) => {
      val e = ev(s, dir)
      val perUser = e.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(perUser, "user_id")
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      val nV = perUser.filter(col("t_view").isNotNull)
        .agg(count(lit(1)).as("n")).select(col("n").as("n_view"))
      val nC = c.agg(count(lit(1)).as("n_click"))
      val nP = p.agg(count(lit(1)).as("n_purchase"))
      nV.crossJoin(nC).crossJoin(nP)
    }),

    // Snapshot diff → CDC changelog generation: two keyed snapshot
    // states (per-user trailing-10-day aggregates at two cutoffs) are
    // full-outer joined on the key and every difference becomes an
    // I/U/D row — the INVERSE of Changelog.materialize, for producing a
    // changelog when the upstream only offers snapshots. Trailing
    // windows make deletes REAL (users drop out of the window). One
    // exchange per snapshot + the diff join; deterministic value
    // compare via decimal sums.
    "q175_snapshot_diff" -> ((s, dir) => {
      def snap(lo: String, hi: String) = ev(s, dir)
        .filter(col("ts") >= lit(lo).cast("timestamp") &&
                col("ts") < lit(hi).cast("timestamp"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(dec)).cast("double").as("val"))
      val a = snap("2024-01-05", "2024-01-15")
        .select(col("user_id"), col("n").as("old_n"), col("val").as("old_val"))
      val b = snap("2024-01-10", "2024-01-20")
        .select(col("user_id").as("ub"), col("n").as("new_n"),
                col("val").as("new_val"))
      a.join(b, col("user_id") === col("ub"), "full")
        .withColumn("op",
          when(col("user_id").isNull, "I")
            .when(col("ub").isNull, "D")
            .when(col("old_n") =!= col("new_n") ||
                  col("old_val") =!= col("new_val"), "U")
            .otherwise("N"))
        .filter(col("op") =!= "N")
        .select(coalesce(col("user_id"), col("ub")).as("user_id"),
                col("op"), col("old_n"), col("new_n"),
                col("old_val"), col("new_val"))
    }),

    // Sessionized path analysis: 30-minute-gap sessions per user, each
    // session's ordered event-type path, top-20 paths by frequency.
    // Session assignment is the lag+cumsum pattern (one window over the
    // per-user sort — the batch dual of session_window); paths are
    // built from a SORTED struct array so the string is a deterministic
    // function of the session's rows.
    "q176_session_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = ev(s, dir)
        .withColumn("gap",
          when(Tables.tsMicros(col("ts"))
                 - Tables.tsMicros(lag(col("ts"), 1).over(w))
                 > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("session_no", sum(col("gap")).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id"), col("session_no"))
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(ts, event_id, " +
          "event_type))), x -> x.event_type)"), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    }),

    // Retention cohort grid: cohort = the user's first-activity day,
    // cell (cohort_day, offset) = distinct users of that cohort active
    // `offset` days later (offsets 0–7). Two hash exchanges total (the
    // per-user min, the cell distinct) — the cohort table never
    // materializes user×day beyond the distinct activity pairs.
    "q173_retention_cohorts" -> ((s, dir) => {
      val e = ev(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val firstDay = e.groupBy(col("user_id"))
        .agg(min(col("d")).as("cohort"))
      e.join(firstDay, "user_id")
        .withColumn("offset", datediff(col("d"), col("cohort")).cast("long"))
        .filter(col("offset") <= 7)
        .groupBy(col("cohort"), col("offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    })
  )

  // DuckDB reads events.ts as TIMESTAMP_NS; CAST to TIMESTAMP truncates to
  // µs — the same normalization Tables.scala applies on the Spark side.
  val oracle: Map[String, String] = Map(
    "q14_asof_join" -> """
      SELECT p.event_id AS p_id, v.event_id AS v_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)""",

    "q113_asof_sql" -> """
      SELECT p.event_id AS p_id, v.event_id AS v_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)""",

    "q25_tumble" -> """
      SELECT event_type,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      FROM events GROUP BY 1, 2""",

    "q133_sql_tumble" -> """
      SELECT event_type,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))
                      + INTERVAL 1 DAY) AS w_end,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3""",

    "q26_hop" -> """
      WITH b AS (SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS b30
                 FROM events)
      SELECT epoch_us(s) AS w_start, count(*) AS n FROM (
        SELECT b30 AS s FROM b
        UNION ALL
        SELECT b30 - INTERVAL 30 MINUTE AS s FROM b) x
      GROUP BY s""",

    "q27_session" -> """
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP))
                             OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      per_sess AS (
        SELECT user_id, sid, count(*) AS n_events
        FROM sess GROUP BY user_id, sid)
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n_events) AS BIGINT) AS n_events, max(n_events) AS max_session
      FROM per_sess GROUP BY user_id""",

    "q28_interval_join" -> """
      SELECT p.event_id AS p_id, count(c.c_ts) AS n_clicks
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
            FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT user_id AS c_user, CAST(ts AS TIMESTAMP) AS c_ts
                 FROM events WHERE event_type = 'click') c
        ON p.user_id = c.c_user
       AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE
       AND c.c_ts < p.p_ts
      GROUP BY p.event_id""",

    "q29_dedup_first" -> """
      SELECT user_id, event_type, event_id FROM (
        SELECT user_id, event_type, event_id,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events) x
      WHERE rn = 1""",

    "q30_json_props" -> """
      SELECT event_type,
             CAST(sum(k) AS BIGINT) AS sum_k, count(k) AS n_k,
             min(k) AS min_k, max(k) AS max_k
      FROM (SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events) x
      GROUP BY event_type""",

    "q160_scd2" -> """
      SELECT user_id, event_id, value,
             CAST(row_number() OVER w AS BIGINT) AS version,
             epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from,
             epoch_us(CAST(lead(ts, 1) OVER w AS TIMESTAMP)) AS valid_to,
             lead(ts, 1) OVER w IS NULL AS is_current
      FROM events
      WHERE event_type = 'view'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",

    "q172_conversion_funnel" -> """
      WITH pu AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                        THEN CAST(ts AS TIMESTAMP) END) AS t_view
        FROM events GROUP BY user_id),
      c AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
        FROM events e JOIN pu ON e.user_id = pu.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > pu.t_view
        GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND CAST(e.ts AS TIMESTAMP) > c.t_click
        GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM pu WHERE t_view IS NOT NULL) AS n_view,
             (SELECT count(*) FROM c) AS n_click,
             (SELECT count(*) FROM p) AS n_purchase""",

    "q175_snapshot_diff" -> """
      WITH a AS (
        SELECT user_id, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val
        FROM events
        WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05'
          AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
        GROUP BY 1),
      b AS (
        SELECT user_id, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val
        FROM events
        WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10'
          AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20'
        GROUP BY 1),
      d AS (
        SELECT coalesce(a.user_id, b.user_id) AS user_id,
               CASE WHEN a.user_id IS NULL THEN 'I'
                    WHEN b.user_id IS NULL THEN 'D'
                    WHEN a.n <> b.n OR a.val <> b.val THEN 'U'
                    ELSE 'N' END AS op,
               a.n AS old_n, b.n AS new_n,
               a.val AS old_val, b.val AS new_val
        FROM a FULL JOIN b ON a.user_id = b.user_id)
      SELECT * FROM d WHERE op <> 'N'""",

    "q176_session_paths" -> """
      WITH s0 AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                      - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                      > 1800000000 THEN 1 ELSE 0 END AS gap
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s1 AS (
        SELECT user_id, ts, event_id, event_type,
               sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
        FROM s0),
      p AS (
        SELECT user_id, session_no,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM s1 GROUP BY 1, 2)
      SELECT path, count(*) AS n_sessions
      FROM p GROUP BY path
      ORDER BY n_sessions DESC, path
      LIMIT 20""",

    "q173_retention_cohorts" -> """
      WITH a AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
        FROM events),
      f AS (SELECT user_id, min(d) AS cohort FROM a GROUP BY user_id)
      SELECT f.cohort, CAST(a.d - f.cohort AS BIGINT) AS "offset",
             count(DISTINCT a.user_id) AS n_active
      FROM a JOIN f ON a.user_id = f.user_id
      WHERE a.d - f.cohort <= 7
      GROUP BY 1, 2"""
  )
}
