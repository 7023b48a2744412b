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
                unix_micros(col("ts")).as("ts_us"), col("event_type"))
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
    "q84_match_recognize" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"))
      graft.streaming.MatchRecognize.annotate(
          o,
          partitionBy = Seq("o_custkey"),
          orderBy = Seq("o_orderdate", "o_orderkey"),
          pattern = "A B+",
          define = Seq(
            "A" -> (col("o_totalprice") > 100000),
            "B" -> (col("o_totalprice") <= 100000)))
        .select(col("o_custkey"), col("o_orderkey"), col("mr_match"),
                col("mr_var"))
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
      WHERE mr_var IS NOT NULL"""
  )
}
