package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/**
 * Batch relational core (SURVEY §2.2–2.7): projection/filter/agg, every
 * join type, grouping sets/rollup/cube, over-windows with all frame kinds,
 * sort/limit/top-n, set operations. All pure DataFrame delegation —
 * Catalyst picks hash/sort-merge/broadcast physical operators exactly like
 * the reference's Blink planner does (BatchExecHashJoinRule,
 * BatchExecHashAggregate, …; see SURVEY §4.2: every batch physical trick
 * is already in Spark).
 *
 * Correctness contract: each query has a DuckDB oracle with IDENTICAL
 * column names and value-exact semantics — money sums via DECIMAL(18,2)
 * casts (exact, order-independent), `round(x, 6)` only where float
 * accumulation order is engine-dependent (stddev/avg), deterministic
 * tie-breaks on unique keys in every window/limit.
 *
 * Scale notes (100 TB): dimension joins broadcast (`broadcast()` on
 * region/nation — bounded size by schema); fact-fact joins shuffle on the
 * join key and AQE re-plans skew; aggregations are partial+final
 * (map-side combine) automatically. No collect()s, no driver loops.
 */
object RelationalOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private val dec = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)

  // ---------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: fused filter+project (Calc), hash agg partial+final.
    "q01_tpch1" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec4))
            .cast("double").as("sum_disc_price"),
          round(sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)), 6)
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // Distinct aggregates (Catalyst RewriteDistinctAggregates → Expand).
    "q02_agg_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
    }),

    // ROLLUP → Catalyst Expand + agg (reference: DecomposeGroupingSetsRule).
    "q03_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping_id().as("gid"),
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
    }),

    "q04_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping_id().as("gid"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"),
          count(lit(1)).as("n"))
    }),

    // Explicit GROUPING SETS via SQL, per-column grouping() flags.
    // Pre-aggregate on the finest key BEFORE the grouping sets: Catalyst
    // plans Expand below the aggregate, so sets multiply the FULL input
    // (3x the fact table at 100 TB). Collapsing to the (flag, status)
    // key first shrinks the expanded set to |key domain| rows; SUM/COUNT
    // re-aggregate exactly (decimal sums of sums, sum of counts).
    "q05_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH pre AS (
          SELECT l_returnflag, l_linestatus,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS s,
                 count(*) AS c
          FROM lineitem GROUP BY l_returnflag, l_linestatus)
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS ga,
               CAST(grouping(l_linestatus) AS BIGINT) AS gb,
               CAST(sum(s) AS DOUBLE) AS sum_qty,
               sum(c) AS n
        FROM pre
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
    }),

    // Statistical aggregates (order-dependent float accumulation → round 6).
    "q06_stats_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          min(col("l_quantity")).as("min_q"),
          max(col("l_quantity")).as("max_q"),
          round(avg(col("l_quantity")), 6).as("avg_q"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_q"),
          round(var_pop(col("l_quantity")), 6).as("vp_q"))
    }),

    // Star join: broadcast the bounded dims, shuffle the facts.
    "q07_join_inner" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nation = broadcast(t(s, dir, "nation"))
      val region = broadcast(t(s, dir, "region"))
      orders
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"),
             count(lit(1)).as("n_orders"))
    }),

    // Left outer join + null-safe aggregation.
    "q08_join_left" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      cust.join(orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(sum(col("o_totalprice").cast(dec)), lit(0).cast(dec))
               .cast("double").as("total"))
    }),

    // Full outer join: disjoint-ish key ranges so both null sides appear.
    "q09_join_full" -> ((s, dir) => {
      val a = t(s, dir, "orders").filter(col("o_custkey") <= 750)
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_orders"))
      val b = t(s, dir, "customer").filter(col("c_custkey") >= 700)
        .select(col("c_custkey").as("k2"), col("c_name"))
      a.join(b, col("k") === col("k2"), "full")
        .select(coalesce(col("k"), col("k2")).as("custkey"),
                col("n_orders"), col("c_name"))
    }),

    // Semi join (EXISTS rewrite — StreamingSemiAntiJoinOperator analogue).
    "q10_semijoin" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // Anti join (NOT EXISTS).
    "q11_antijoin" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // Equi join + non-equi (theta) residual predicate.
    "q12_nonequi" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
    }),

    // Cartesian product (BatchExecNestedLoopJoin analogue).
    "q13_cross" -> ((s, dir) => {
      t(s, dir, "nation").crossJoin(t(s, dir, "region"))
        .groupBy("r_name").agg(count(lit(1)).as("n"))
    }),

    // Top-N per group: row_number + filter → WindowGroupLimit pushdown.
    "q15_topn_group" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
                col("o_totalprice").as("price"))
    }),

    // Running aggregate: ROWS UNBOUNDED PRECEDING frame.
    "q16_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_orderkey"),
                sum(col("o_totalprice").cast(dec)).over(w).cast("double")
                  .as("run_sum"))
    }),

    // LEAD/LAG offset frames (OffsetOverFrame analogue).
    "q17_leadlag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"),
                lag(col("o_totalprice"), 1).over(w).as("prev_p"),
                lead(col("o_totalprice"), 1).over(w).as("next_p"))
    }),

    // RANGE frame with numeric bound (RangeSlidingOverFrame analogue).
    "q18_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("qty_l"))
        .rangeBetween(-5, Window.currentRow)
      t(s, dir, "lineitem")
        .withColumn("qty_l", col("l_quantity").cast("long"))
        .select(col("l_orderkey"), col("l_linenumber"),
                sum(col("l_extendedprice").cast(dec)).over(w).cast("double")
                  .as("frame_sum"))
    }),

    // Rank-family + distribution functions.
    "q19_ntile" -> ((s, dir) => {
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"),
                ntile(4).over(w).as("nt"),
                percent_rank().over(w).as("pr"),
                cume_dist().over(w).as("cd"))
    }),

    // first/last/nth over full-partition frame.
    "q20_first_last" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_orderkey"),
                first(col("o_totalprice")).over(w).as("first_p"),
                last(col("o_totalprice")).over(w).as("last_p"),
                nth_value(col("o_totalprice"), 2).over(w).as("second_p"))
    }),

    // Global sort + limit → TakeOrderedAndProjectExec (no full sort at scale).
    "q21_toplimit" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice").as("price"))
    }),

    // UNION distinct (union + dedup rewrite, SURVEY §2.7).
    "q22_union" -> ((s, dir) => {
      val a = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val b = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      a.union(b).groupBy("k").agg(count(lit(1)).as("n_all"))
    }),

    // INTERSECT → left-semi rewrite (ReplaceIntersectWithSemiJoinRule).
    "q23_intersect" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("k"))
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_orderkey").as("k"))
      l.intersect(o)
    }),

    // EXCEPT → anti-join rewrite (ReplaceMinusWithAntiJoinRule).
    "q24_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val o = t(s, dir, "orders").select(col("o_custkey").as("k"))
      c.except(o)
    }),

    // INTERSECT ALL / EXCEPT ALL — multiset counting rewrites
    // (RewriteIntersectAllRule / RewriteMinusAllRule).
    "q64_intersect_all" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").select(col("l_suppkey").as("k"))
      val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 0)
        .select(col("s_suppkey").as("k"))
      l.intersectAll(sup).groupBy("k").agg(count(lit(1)).as("n"))
    }),

    "q65_except_all" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
        .select(col("l_suppkey").as("k"))
      val l2 = t(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
        .select(col("l_suppkey").as("k"))
      l.exceptAll(l2).groupBy("k").agg(count(lit(1)).as("n"))
    })
  )

  // ---------------------------------------------------------------- oracles

  val oracle: Map[String, String] = Map(
    "q01_tpch1" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""",

    "q02_agg_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_partkey) AS n_part,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag""",

    "q03_rollup" -> """
      SELECT l_returnflag, l_linestatus,
             grouping(l_returnflag, l_linestatus) AS gid,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q04_cube" -> """
      SELECT o_orderstatus, o_orderpriority,
             grouping(o_orderstatus, o_orderpriority) AS gid,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             count(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",

    "q05_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS BIGINT) AS ga,
             CAST(grouping(l_linestatus) AS BIGINT) AS gb,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",

    "q06_stats_agg" -> """
      SELECT l_linestatus,
             min(l_quantity) AS min_q, max(l_quantity) AS max_q,
             round(avg(l_quantity), 6) AS avg_q,
             round(stddev_samp(l_quantity), 6) AS sd_q,
             round(var_pop(l_quantity), 6) AS vp_q
      FROM lineitem GROUP BY l_linestatus""",

    "q07_join_inner" -> """
      SELECT r_name,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""",

    "q08_join_left" -> """
      SELECT c_custkey,
             count(o_orderkey) AS n_orders,
             CAST(COALESCE(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey""",

    "q09_join_full" -> """
      SELECT COALESCE(a.k, b.k2) AS custkey, a.n_orders, b.c_name
      FROM (SELECT o_custkey AS k, count(*) AS n_orders
            FROM orders WHERE o_custkey <= 750 GROUP BY o_custkey) a
      FULL JOIN (SELECT c_custkey AS k2, c_name
                 FROM customer WHERE c_custkey >= 700) b
        ON a.k = b.k2""",

    "q10_semijoin" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",

    "q11_antijoin" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "q12_nonequi" -> """
      SELECT o_orderpriority, count(*) AS n
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey
       AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY o_orderpriority""",

    "q13_cross" -> """
      SELECT r_name, count(*) AS n
      FROM nation CROSS JOIN region GROUP BY r_name""",

    "q15_topn_group" -> """
      SELECT c_mktsegment, rn, o_orderkey, price FROM (
        SELECT c_mktsegment,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               o_orderkey,
               o_totalprice AS price
        FROM orders JOIN customer ON o_custkey = c_custkey) x
      WHERE rn <= 3""",

    "q16_running_sum" -> """
      SELECT o_orderkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
      FROM orders""",

    "q17_leadlag" -> """
      SELECT o_orderkey,
             lag(o_totalprice, 1)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_p,
             lead(o_totalprice, 1)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_p
      FROM orders""",

    "q18_range_frame" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
               OVER (PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT)
                     RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS frame_sum
      FROM lineitem""",

    "q19_ntile" -> """
      SELECT o_orderkey,
             ntile(4) OVER w AS nt,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)""",

    "q20_first_last" -> """
      SELECT o_orderkey,
             first_value(o_totalprice) OVER w AS first_p,
             last_value(o_totalprice) OVER w AS last_p,
             nth_value(o_totalprice, 2) OVER w AS second_p
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",

    "q21_toplimit" -> """
      SELECT o_orderkey, o_totalprice AS price
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q22_union" -> """
      SELECT k, count(*) AS n_all FROM (
        SELECT c_nationkey AS k FROM customer
        UNION ALL
        SELECT s_nationkey AS k FROM supplier) u
      GROUP BY k""",

    "q23_intersect" -> """
      SELECT l_orderkey AS k FROM lineitem
      INTERSECT
      SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 300000""",

    "q24_except" -> """
      SELECT c_custkey AS k FROM customer
      EXCEPT
      SELECT o_custkey AS k FROM orders""",

    "q64_intersect_all" -> """
      SELECT k, count(*) AS n FROM (
        SELECT l_suppkey AS k FROM lineitem
        INTERSECT ALL
        SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 0) x
      GROUP BY k""",

    "q65_except_all" -> """
      SELECT k, count(*) AS n FROM (
        SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 2000
        EXCEPT ALL
        SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey < 1000) x
      GROUP BY k"""
  )
}
