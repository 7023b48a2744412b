package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/**
 * The remaining TPC-H query *shapes* (Q2..Q22), adapted to the driver
 * testdata schema. The reference's own correctness suite is TPC-H 22/22
 * at sf0.01 (flink-end-to-end-tests/test-scripts/test_tpch.sh:22,34;
 * flink-tpch-test/.../TpchResultComparator.java) — together with
 * TpchOps (Q1/Q3/Q5/Q18) this file completes the 22-query inventory.
 *
 * The testdata omits `partsupp` and several columns
 * (l_commitdate/l_receiptdate/l_shipmode, c_phone, p_container, ...), so
 * each query keeps its defining PLAN SHAPE — the joins, correlations,
 * semi/anti forms and agg structure Catalyst must optimize — with
 * predicates remapped to available columns:
 *   - part↔supplier link (partsupp) := DISTINCT (l_partkey, l_suppkey)
 *   - "late" (receipt > commit)     := l_shipdate > o_orderdate + 30d
 *   - country code (c_phone prefix) := c_nationkey % 10
 *   - supply cost                   := 0.5 * p_retailprice
 *
 * 100 TB notes: dimension sides (region/nation/supplier/part at TPC-H
 * ratios) broadcast; every fact-fact join is an equi-join that AQE can
 * re-plan; correlated scalar subqueries are expressed as window
 * functions or pre-aggregated derived tables so they execute as one
 * shuffle, not per-row subplans.
 */
object TpchSuite {

  private val dec = DecimalType(18, 4)
  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)
  private def rev: Column =
    (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2: min-cost supplier per part — correlated MIN rewritten as a
    // window over the candidate set (one shuffle; no per-row subquery).
    "q66_tpch2" -> ((s, dir) => {
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .distinct()
      val sup = t(s, dir, "supplier")
      val nat = broadcast(t(s, dir, "nation"))
      val reg = broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE"))
      val prt = t(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
      val cand = ps
        .join(sup, col("suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .join(prt, col("partkey") === col("p_partkey"))
      cand
        .withColumn("min_bal",
          min(col("s_acctbal")).over(Window.partitionBy(col("p_partkey"))))
        .filter(col("s_acctbal") === col("min_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
                col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
                 col("p_partkey"))
        .limit(100)
    }),

    // Q4: order-priority checking — EXISTS(late lineitem) as a semi join.
    "q67_tpch4" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      val late = t(s, dir, "lineitem").alias("l")
      o.alias("o")
        .join(late,
          col("l.l_orderkey") === col("o.o_orderkey") &&
          col("l.l_shipdate") > col("o.o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q6: forecasting revenue change — single scan, tight range filters.
    "q68_tpch6" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast(dec))
          .cast("double").as("revenue"))),

    // Q7: volume shipping between two nations, both directions, by year.
    // Both nation sides are pre-filtered to the two nations of interest:
    // Catalyst cannot derive per-side IN residuals from the cross-side OR
    // below, so without this 23/25 of supplier/customer rows would flow
    // through both joins only to be discarded by the pair filter.
    "q69_tpch7" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
                 year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // Q8: national market share — share-of-total via conditional agg.
    "q70_tpch8" -> ((s, dir) => {
      val nSup = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val nCust = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk")))
      val reg = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_type") === "PROMO"),
              col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(nSup, col("s_nationkey") === col("s_nk"))
        .join(nCust, col("c_nationkey") === col("c_nk"))
        .join(reg, col("c_rk") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0).cast(dec)))
            .cast("double") / sum(rev).cast("double"), 6).as("mkt_share"))
    }),

    // Q9: product-type profit, supply cost proxied by 0.5*p_retailprice.
    "q71_tpch9" -> ((s, dir) => {
      val nat = broadcast(t(s, dir, "nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").like("%gear%")),
              col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
                 year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
                  lit(0.5) * col("p_retailprice") * col("l_quantity")).cast(dec))
          .cast("double").as("sum_profit"))
    }),

    // Q10: returned-item reporting — top 20 customers by lost revenue.
    "q72_tpch10" -> ((s, dir) => {
      val nat = broadcast(t(s, dir, "nation"))
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q11: important stock — HAVING against a scalar share-of-total.
    "q73_tpch11" -> ((s, dir) => {
      val sup = t(s, dir, "supplier").filter(col("s_nationkey") < 5)
      val value = t(s, dir, "lineitem")
        .join(sup, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * col("l_quantity")).cast(dec)).as("value"))
      val total = value.agg(sum(col("value")).as("grand"))
      value.join(broadcast(total))
        .filter(col("value").cast("double") > col("grand").cast("double") * 0.001)
        .select(col("l_partkey"), col("value").cast("double").as("value"))
    }),

    // Q12: shipping modes vs priority — conditional-sum pivot.
    "q74_tpch12" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
                col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
             sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
    }),

    // Q13: customer order-count distribution — outer join, two-level agg.
    "q75_tpch13" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW")
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q14: promotion effect — percentage via conditional agg, one month.
    "q76_tpch14" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
                col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(dec)))
            .cast("double") /
          sum(rev).cast("double"), 6).as("promo_revenue"))),

    // Q15: top supplier — derived revenue view, scalar MAX equality join
    // (exact: revenue is a DECIMAL sum, so = max is deterministic).
    "q77_tpch15" -> ((s, dir) => {
      val revenue = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(rev).as("total_revenue"))
      val best = revenue.agg(max(col("total_revenue")).as("best"))
      t(s, dir, "supplier")
        .join(revenue, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(best), col("total_revenue") === col("best"))
        .withColumn("total_revenue", col("total_revenue").cast("double"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // Q16: part/supplier relationship — NOT IN exclusion + count distinct.
    "q78_tpch16" -> ((s, dir) => {
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .distinct()
      val excluded = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      ps.join(excluded, col("suppkey") === col("s_suppkey"), "left_anti")
        .join(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#4" && col("p_type") =!= "PROMO" &&
                  col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)),
          col("partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("suppkey")).as("supplier_cnt"))
    }),

    // Q17: small-quantity-order revenue — correlated AVG as a window
    // over the part's full lineitem history (computed pre-filter).
    "q79_tpch17" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .withColumn("avg_qty",
          avg(col("l_quantity")).over(Window.partitionBy(col("l_partkey"))))
      l.join(t(s, dir, "part").filter(col("p_brand") === "Brand#3"),
             col("l_partkey") === col("p_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum(col("l_extendedprice").cast(dec)).cast("double") / 7.0, 6)
          .as("avg_yearly"))
    }),

    // Q19: discounted revenue — three OR'd brand/size/quantity branches
    // fused into one scan+join (Catalyst keeps the disjunction a single
    // predicate; no union of three scans).
    "q80_tpch19" -> ((s, dir) => {
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
         col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
         col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
         col("l_quantity").between(20, 30))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // Q20: potential part promotion — IN(grouped HAVING) as semi joins.
    "q81_tpch20" -> ((s, dir) => {
      val redParts = t(s, dir, "part").filter(col("p_name").like("red%"))
        .select(col("p_partkey"))
      val bigSupp = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
        .filter(col("qty") > 100)
      val asiaNations = broadcast(t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey")))
      t(s, dir, "supplier")
        .join(bigSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(asiaNations, col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // Q21: suppliers who kept orders waiting — EXISTS(other supplier) +
    // NOT EXISTS(other late supplier), both as aggregated semi-state
    // per order (one shuffle instead of two correlated subplans).
    "q82_tpch21" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
              col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
            .cast("int"))
      // per (order, supplier): did THIS supplier ship late on the order?
      val perSupp = l.groupBy(col("l_orderkey").as("okey"),
                              col("l_suppkey").as("skey"))
        .agg(max(col("late")).as("i_late"))
      // per order: #suppliers and #late-suppliers
      val perOrder = perSupp.groupBy(col("okey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("i_late")).as("n_late"))
      perSupp.filter(col("i_late") === 1)
        .join(perOrder, "okey")
        // someone else exists on the order, and no OTHER supplier was late
        .filter(col("n_supp") > 1 && col("n_late") === 1)
        .join(t(s, dir, "supplier"), col("skey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // Q22: global sales opportunity — anti join against recent orders,
    // scalar AVG threshold, country code from nationkey.
    "q83_tpch22" -> ((s, dir) => {
      val code = pmod(col("c_nationkey"), lit(10)).cast("long")
      val c = t(s, dir, "customer")
        .withColumn("cntrycode", code)
        .filter(col("cntrycode").isin(1L, 3L, 5L, 7L, 9L))
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
             sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
               .as("totacctbal"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q66_tpch2" -> """
      WITH ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
                  FROM lineitem),
      cand AS (
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM ps
        JOIN supplier ON suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN part ON partkey = p_partkey
        WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD')
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      FROM (SELECT *, min(s_acctbal) OVER (PARTITION BY p_partkey) AS mb
            FROM cand) x
      WHERE s_acctbal = mb
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""",

    "q67_tpch4" -> """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        AND o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority""",

    "q68_tpch6" -> """
      SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""",

    "q69_tpch7" -> """
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      GROUP BY 1, 2, 3""",

    "q70_tpch8" -> """
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             round(
               CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                 THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                   AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      GROUP BY 1""",

    "q71_tpch9" -> """
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                      - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,4)))
               AS DOUBLE) AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
      GROUP BY 1, 2""",

    "q72_tpch10" -> """
      SELECT c_custkey, c_name, c_acctbal, n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""",

    "q73_tpch11" -> """
      WITH value AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS value
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
        GROUP BY l_partkey)
      SELECT l_partkey, CAST(value AS DOUBLE) AS value FROM value
      WHERE CAST(value AS DOUBLE) >
            (SELECT CAST(sum(value) AS DOUBLE) * 0.001 FROM value)""",

    "q74_tpch12" -> """
      SELECT l_returnflag,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag IN ('A','R')
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag""",

    "q75_tpch13" -> """
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders ON c_custkey = o_custkey
                                   AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count""",

    "q76_tpch14" -> """
      SELECT round(100.0 *
        CAST(sum(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
            AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate < TIMESTAMP '1996-10-01'""",

    "q77_tpch15" -> """
      WITH revenue AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""",

    "q78_tpch16" -> """
      SELECT p_brand, p_type, p_size,
             count(DISTINCT suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
            FROM lineitem) ps
      JOIN part ON partkey = p_partkey
      WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
        AND p_size IN (1,5,10,15,20,25,30,35)
        AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size""",

    "q79_tpch17" -> """
      SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   / 7.0, 6) AS avg_yearly
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#3'
        AND l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = lineitem.l_partkey)""",

    "q80_tpch19" -> """
      SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)""",

    "q81_tpch20" -> """
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 100)
        AND s_nationkey IN (SELECT n_nationkey FROM nation
                            JOIN region ON n_regionkey = r_regionkey
                            WHERE r_name = 'ASIA')""",

    "q82_tpch21" -> """
      WITH per_supp AS (
        SELECT l_orderkey AS okey, l_suppkey AS skey,
               max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                   THEN 1 ELSE 0 END) AS i_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1, 2),
      per_order AS (
        SELECT okey, count(*) AS n_supp, sum(i_late) AS n_late
        FROM per_supp GROUP BY okey)
      SELECT s_name, count(*) AS numwait
      FROM per_supp
      JOIN per_order USING (okey)
      JOIN supplier ON skey = s_suppkey
      WHERE i_late = 1 AND n_supp > 1 AND n_late = 1
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100""",

    "q83_tpch22" -> """
      WITH c AS (SELECT *, CAST(c_nationkey % 10 AS BIGINT) AS cntrycode
                 FROM customer
                 WHERE CAST(c_nationkey % 10 AS BIGINT) IN (1,3,5,7,9))
      SELECT cntrycode, count(*) AS numcust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM c
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM c WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2001-01-01')
      GROUP BY cntrycode"""
  )
}
