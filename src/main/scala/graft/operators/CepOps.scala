package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.Cep

/**
 * Batch CEP (SURVEY §2.10): pattern matching over the `events` table with
 * the Cep NFA (graft.streaming.Cep — shared by the streaming runner).
 * Funnel pattern view → click → purchase per user within 10 minutes,
 * enumerate-all (followedByAny × noSkip) semantics, which a 3-way
 * self-join reproduces in the DuckDB oracle — so the NFA path itself is
 * value-checked against relational semantics.
 */
object CepOps {

  case class Ev(event_id: Long, user_id: Long, ts_us: Long, event_type: String)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_cep" -> ((s, dir) => {
      import s.implicits._
      val ds = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
                Tables.tsMicros(col("ts")).as("ts_us"), col("event_type"))
        .as[Ev]
      val pattern = Cep.Pattern[Ev](
        steps = Seq(
          Cep.Step[Ev]("view", _.event_type == "view"),
          Cep.Step[Ev]("click", _.event_type == "click"),
          Cep.Step[Ev]("purchase", _.event_type == "purchase")),
        withinMs = Some(24L * 3600 * 1000000)) // 24h in µs
      Cep.matchBatch[Long, Ev](ds, pattern, _.user_id, _.ts_us, _.event_id)
        .map(m => (m.key, m.events(0).event_id, m.events(1).event_id,
                   m.events(2).event_id))
        .toDF("user_id", "v_id", "c_id", "p_id")
    }),

    // MATCH_RECOGNIZE (SURVEY §2.10 SQL front-end): ALL ROWS PER MATCH,
    // pattern "A B+" over each customer's orders in date order — a
    // high-price order followed by a run of low-price orders. A/B are
    // complementary, so matches can't overlap and the relational oracle
    // (lead + cumulative windows) reproduces the NFA output exactly,
    // including greedy B+ and per-key 1-based match numbering.
    // Entered through the SQL-string front-end (MatchRecognizeSql), so
    // the oracle gate also value-checks the clause parser; the spec
    // proves SQL == Scala API on this exact shape.
    "q84_match_recognize" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"))
      graft.streaming.MatchRecognizeSql(o, """
          MATCH_RECOGNIZE (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ALL ROWS PER MATCH
            PATTERN (A B+)
            DEFINE A AS A.o_totalprice > 100000,
                   B AS B.o_totalprice <= 100000
          )""")
        .select(col("o_custkey"), col("o_orderkey"), col("mr_match"),
                col("mr_var"))
    }),

    // MATCH_RECOGNIZE ONE ROW PER MATCH + MEASURES (StreamExecMatch
    // MEASURES clause): one output row per "A B+" match carrying
    // FIRST(A.key), LAST(B.key), COUNT(B.*), CLASSIFIER() of the final
    // row, and a FINAL sum over the whole match.
    // Also entered via the SQL front-end (see q84 note).
    "q87_mr_measures" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"))
      graft.streaming.MatchRecognizeSql(o, """
          MATCH_RECOGNIZE (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            MEASURES FIRST(A.o_orderkey) AS a_key,
                     LAST(B.o_orderkey) AS last_b_key,
                     COUNT(B.*) AS n_b,
                     CLASSIFIER() AS cls,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS match_total
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B+)
            DEFINE A AS A.o_totalprice > 100000,
                   B AS B.o_totalprice <= 100000
          )""")
    }),

    // MATCH_RECOGNIZE ALL ROWS PER MATCH **with MEASURES** — the
    // reference evaluates measures for every visited row (RUNNING by
    // default, FINAL on request — MatchCodeGenerator.scala RUNNING/FINAL
    // split, StreamExecMatch). q84's pattern with per-row running
    // count/sum, the current-row CLASSIFIER, and a FINAL whole-match
    // count; evaluated as one codegen'd window pass over the annotated
    // rows (no extra exchange — same keys as the match shuffle).
    "q351_mr_all_rows_measures" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"))
      graft.streaming.MatchRecognizeSql(o, """
          MATCH_RECOGNIZE (
            PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            MEASURES COUNT(*) AS k,
                     RUNNING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DOUBLE) AS run_total,
                     FINAL COUNT(B.*) AS n_b,
                     CLASSIFIER() AS cls
            ALL ROWS PER MATCH
            PATTERN (A B+)
            DEFINE A AS A.o_totalprice > 100000,
                   B AS B.o_totalprice <= 100000
          )""")
        .select(col("o_custkey"), col("o_orderkey"), col("mr_match"),
                col("mr_seq"), col("k"), col("run_total"), col("n_b"),
                col("cls"))
    }),

    // CEP unbounded oneOrMore (Quantifier.java looping state): purchase
    // followed (relaxed) by a greedy-maximal consecutive run of clicks.
    // Enumerate-all (noSkip) semantics: every click after the purchase
    // starts a candidate run that extends to its run's end — the oracle
    // reproduces this with a gaps-and-islands run decomposition × suffix
    // enumeration.
    "q88_cep_oneormore" -> ((s, dir) => {
      import s.implicits._
      val ds = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
                Tables.tsMicros(col("ts")).as("ts_us"), col("event_type"))
        .as[Ev]
      val pattern = Cep.Pattern[Ev](
        steps = Seq(
          Cep.Step[Ev]("purchase", _.event_type == "purchase"),
          Cep.Step[Ev]("clicks", _.event_type == "click",
                       maxTimes = Cep.Unbounded)),
        withinMs = None)
      Cep.matchBatch[Long, Ev](ds, pattern, _.user_id, _.ts_us, _.event_id)
        .map(m => (m.key, m.events.head.event_id, m.events(1).event_id,
                   m.events.last.event_id, (m.events.length - 1).toLong))
        .toDF("user_id", "p_id", "c_first", "c_last", "n_clicks")
    })
  )

  val oracle: Map[String, String] = Map(
    "q49_cep" -> """
      SELECT v.user_id, v.event_id AS v_id, c.event_id AS c_id, p.event_id AS p_id
      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t
            FROM events WHERE event_type = 'view') v
      JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t
            FROM events WHERE event_type = 'click') c
        ON c.user_id = v.user_id AND c.t > v.t
      JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t
            FROM events WHERE event_type = 'purchase') p
        ON p.user_id = v.user_id AND p.t > c.t
       AND p.t <= v.t + INTERVAL 24 HOUR""",

    "q84_match_recognize" -> """
      WITH base AS (
        SELECT o_custkey, o_orderkey,
               (o_totalprice > 100000) AS hi,
               row_number() OVER w AS rn,
               lead(o_totalprice > 100000) OVER w AS next_hi,
               max(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS any_prev_hi
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      marked AS (
        SELECT *,
               CASE WHEN hi AND next_hi = false THEN 'A'
                    WHEN NOT hi AND any_prev_hi = 1 THEN 'B'
                    ELSE NULL END AS mr_var
        FROM base)
      SELECT o_custkey, o_orderkey,
             CAST(sum(CASE WHEN mr_var = 'A' THEN 1 ELSE 0 END) OVER (
               PARTITION BY o_custkey ORDER BY rn) AS BIGINT) AS mr_match,
             mr_var
      FROM marked
      WHERE mr_var IS NOT NULL""",

    "q87_mr_measures" -> """
      WITH base AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               (o_totalprice > 100000) AS hi,
               row_number() OVER w AS rn,
               lead(o_totalprice > 100000) OVER w AS next_hi,
               max(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS any_prev_hi
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      marked AS (
        SELECT *,
               CASE WHEN hi AND next_hi = false THEN 'A'
                    WHEN NOT hi AND any_prev_hi = 1 THEN 'B'
                    ELSE NULL END AS mr_var
        FROM base),
      annotated AS (
        SELECT o_custkey, o_orderkey, o_totalprice, mr_var, rn,
               CAST(sum(CASE WHEN mr_var = 'A' THEN 1 ELSE 0 END) OVER (
                 PARTITION BY o_custkey ORDER BY rn) AS BIGINT) AS mr_match
        FROM marked
        WHERE mr_var IS NOT NULL)
      SELECT o_custkey, mr_match,
             min(CASE WHEN mr_var = 'A' THEN o_orderkey END) AS a_key,
             arg_max(o_orderkey, rn) FILTER (mr_var = 'B') AS last_b_key,
             count(CASE WHEN mr_var = 'B' THEN 1 END) AS n_b,
             arg_max(mr_var, rn) AS cls,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS match_total
      FROM annotated
      GROUP BY o_custkey, mr_match""",

    "q351_mr_all_rows_measures" -> """
      WITH base AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               (o_totalprice > 100000) AS hi,
               row_number() OVER w AS rn,
               lead(o_totalprice > 100000) OVER w AS next_hi,
               max(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS any_prev_hi
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      marked AS (
        SELECT *,
               CASE WHEN hi AND next_hi = false THEN 'A'
                    WHEN NOT hi AND any_prev_hi = 1 THEN 'B'
                    ELSE NULL END AS mr_var
        FROM base),
      annotated AS (
        SELECT o_custkey, o_orderkey, o_totalprice, mr_var, rn,
               CAST(sum(CASE WHEN mr_var = 'A' THEN 1 ELSE 0 END) OVER (
                 PARTITION BY o_custkey ORDER BY rn) AS BIGINT) AS mr_match
        FROM marked
        WHERE mr_var IS NOT NULL)
      SELECT o_custkey, o_orderkey, mr_match,
             CAST(row_number() OVER wm - 1 AS BIGINT) AS mr_seq,
             CAST(count(*) OVER wr AS BIGINT) AS k,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wr
               AS DOUBLE) AS run_total,
             CAST(count(CASE WHEN mr_var = 'B' THEN 1 END) OVER wf
               AS BIGINT) AS n_b,
             mr_var AS cls
      FROM annotated
      WINDOW wm AS (PARTITION BY o_custkey, mr_match ORDER BY rn),
             wr AS (PARTITION BY o_custkey, mr_match ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY o_custkey, mr_match)""",

    "q88_cep_oneormore" -> """
      WITH ev AS (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events),
      clicks AS (
        SELECT user_id, event_id, rn,
               rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        FROM ev WHERE event_type = 'click'),
      runs AS (
        SELECT user_id, grp, max(rn) AS end_rn,
               arg_max(event_id, rn) AS c_last
        FROM clicks GROUP BY user_id, grp),
      suffixes AS (
        SELECT c.user_id, c.event_id AS c_first, c.rn AS first_rn,
               r.c_last, r.end_rn - c.rn + 1 AS n_clicks
        FROM clicks c
        JOIN runs r ON c.user_id = r.user_id AND c.grp = r.grp),
      purch AS (
        SELECT user_id, event_id AS p_id, rn
        FROM ev WHERE event_type = 'purchase')
      SELECT p.user_id, p.p_id, s.c_first, s.c_last,
             CAST(s.n_clicks AS BIGINT) AS n_clicks
      FROM purch p
      JOIN suffixes s ON p.user_id = s.user_id AND s.first_rn > p.rn"""
  )
}
