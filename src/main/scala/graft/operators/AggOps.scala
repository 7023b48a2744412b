package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/**
 * Aggregate-function parity (SURVEY §2.4: FIRST_VALUE/LAST_VALUE, LISTAGG,
 * COLLECT/multiset, MIN_BY/MAX_BY) plus Correlate/UNNEST (§2.2), VALUES
 * scan (§2.1) and count windows (§2.5).
 *
 * Flink's FIRST_VALUE/LAST_VALUE aggregate in *input order*, which is
 * nondeterministic on a distributed shuffle — here they are pinned to an
 * explicit event-time order via min_by/max_by over a composite sort key,
 * which is both deterministic and the only meaningful reading at 100 TB.
 * LISTAGG is materialized as sort-then-join (array_sort ∘ collect_list):
 * same result as LISTAGG ... WITHIN GROUP (ORDER BY …), shuffle-safe.
 */
object AggOps {

  // Composite deterministic order key: days since 1990-01-01, then orderkey.
  private def ordKey = datediff(col("o_orderdate").cast("date"),
    lit("1990-01-01").cast("date")).cast("long") * 10000000L + col("o_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // listagg / collect(multiset) / first_value / last_value / min_by / max_by
    "q45_agg_funcs" -> ((s, dir) => {
      Tables.table(s, dir, "orders")
        .filter(col("o_custkey") <= 40)
        .groupBy("o_custkey")
        .agg(
          array_join(array_sort(collect_list(col("o_orderpriority"))), ",")
            .as("prio_list"),
          // COLLECT (multiset) rendered as sorted "value:count" pairs
          array_join(expr(
            """transform(array_sort(array_distinct(collect_list(o_orderstatus))),
                 v -> concat(v, ':', CAST(size(filter(
                        collect_list(o_orderstatus), x -> x = v)) AS STRING)))"""),
            ",").as("status_multiset"),
          min_by(col("o_orderstatus"), ordKey).as("first_status"),
          max_by(col("o_orderstatus"), ordKey).as("last_status"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest"),
          max_by(col("o_orderkey"), col("o_totalprice")).as("dearest"),
          count(lit(1)).as("n"))
    }),

    // Correlate / UNNEST with ordinality (LATERAL VIEW posexplode).
    "q46_unnest" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
    }),

    // VALUES scan (LocalRelation) joined against a real table.
    "q47_values" -> ((s, dir) => {
      val vals = s.createDataFrame(Seq(
        (0, "low"), (1, "mid"), (2, "high"), (3, "top"), (4, "max")))
        .toDF("r_key", "tier")
      Tables.table(s, dir, "region")
        .join(vals, col("r_regionkey") === col("r_key"))
        .select(col("r_name"), col("tier"))
    }),

    // Exact percentiles (linear interpolation — Spark `percentile` ==
    // DuckDB `quantile_cont`): the distribution battery q06's
    // min/max/avg/stddev family lacks. Exact percentile is a full sort
    // per group; at 100 TB swap to approx_percentile (t-digest) and
    // accept the documented error bound — the exact form stays as the
    // verification baseline, same pattern as q37/q38.
    "q139_percentiles" -> ((s, dir) => {
      Tables.table(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"),
          count(lit(1)).as("n"))
    }),

    // Exact quantiles at scale — the 100 TB path q139's scaladoc defers
    // to, made a first-class operator: when the value domain is bounded
    // (here: prices quantize exactly to ≤50k distinct cents), the exact
    // p-quantile needs NO per-group value buffer (percentile()'s
    // full-sort state) — histogram per (group, cents), cumulative
    // counts over the ≤|domain| histogram rows, and the type-1 quantile
    // is the smallest value whose cumulative count reaches ceil(p·n).
    // One narrow groupBy + one window over histogram rows, both
    // partition-parallel; memory is |domain| per group, independent of
    // row count. (hist_quantile is the approx sibling for unbounded
    // domains.)
    "q291_exact_quantiles_hist" -> ((s, dir) => {
      val h = Tables.table(s, dir, "events")
        .groupBy(col("event_type"),
          floor(col("value") * 100).cast("long").as("cents"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.withColumn("cum", sum(col("c")).over(w))
      val tot = h.groupBy("event_type").agg(sum(col("c")).as("n"))
      def q(p: String, name: String) =
        min(when(col("cum") >= ceil(expr(s"$p * n")), col("cents"))).as(name)
      cum.join(broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(max(col("n")).as("n"),
             q("0.5", "p50_cents"), q("0.9", "p90_cents"),
             q("0.99", "p99_cents"))
    }),

    // Count window (reference CountSlidingWindowAssigner): ROWS frame of
    // the last 5 events per user.
    "q48_count_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      Tables.table(s, dir, "events")
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_in_win"),
          round(avg(col("value")).over(w), 6).as("avg_v"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q139_percentiles" -> """
      SELECT event_type,
             round(quantile_cont(value, 0.5), 6) AS p50,
             round(quantile_cont(value, 0.9), 6) AS p90,
             round(quantile_cont(value, 0.99), 6) AS p99,
             count(*) AS n
      FROM events GROUP BY event_type""",

    "q45_agg_funcs" -> """
      WITH o AS (
        SELECT *, CAST(datediff('day', DATE '1990-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) * 10000000
                  + o_orderkey AS ord
        FROM orders WHERE o_custkey <= 40),
      ms AS (
        SELECT o_custkey,
               array_to_string(list_sort(list(st || ':' || CAST(n AS VARCHAR))), ',')
                 AS status_multiset
        FROM (SELECT o_custkey, o_orderstatus AS st, count(*) AS n
              FROM o GROUP BY o_custkey, o_orderstatus) g
        GROUP BY o_custkey)
      SELECT o.o_custkey,
             array_to_string(list_sort(list(o_orderpriority)), ',') AS prio_list,
             any_value(ms.status_multiset) AS status_multiset,
             arg_min(o_orderstatus, ord) AS first_status,
             arg_max(o_orderstatus, ord) AS last_status,
             arg_min(o_orderkey, o_totalprice) AS cheapest,
             arg_max(o_orderkey, o_totalprice) AS dearest,
             count(*) AS n
      FROM o JOIN ms ON o.o_custkey = ms.o_custkey
      GROUP BY o.o_custkey""",

    "q46_unnest" -> """
      WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
                 FROM documents WHERE doc_id < 20)
      SELECT doc_id, CAST(i - 1 AS INT) AS pos, a[i] AS tok
      FROM t, UNNEST(generate_series(1, len(a))) AS g(i)""",

    "q47_values" -> """
      SELECT r_name, tier
      FROM region
      JOIN (VALUES (0, 'low'), (1, 'mid'), (2, 'high'), (3, 'top'), (4, 'max'))
           v(r_key, tier)
        ON r_regionkey = r_key""",

    "q291_exact_quantiles_hist" -> """
      WITH h AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
               count(*) AS c
        FROM events GROUP BY 1, 2),
      cum AS (
        SELECT event_type, cents, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM h),
      tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
              FROM h GROUP BY 1)
      SELECT event_type, max(n) AS n,
             min(CASE WHEN cum >= ceil(0.5 * n) THEN cents END)
               AS p50_cents,
             min(CASE WHEN cum >= ceil(0.9 * n) THEN cents END)
               AS p90_cents,
             min(CASE WHEN cum >= ceil(0.99 * n) THEN cents END)
               AS p99_cents
      FROM cum JOIN tot USING (event_type)
      GROUP BY event_type""",

    "q48_count_window" -> """
      SELECT event_id,
             count(*) OVER w AS n_in_win,
             round(avg(value) OVER w, 6) AS avg_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"""
  )
}
