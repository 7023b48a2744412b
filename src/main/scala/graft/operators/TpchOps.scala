package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/**
 * TPC-H-shaped multi-join queries (SURVEY §6: the reference's own
 * correctness/perf suites are TPC-H/TPC-DS —
 * flink-end-to-end-tests/flink-tpch-test, flink-tpcds-test). Q3/Q5/Q18
 * shapes exercise join ordering, semi-join-by-aggregate, and
 * top-n-after-join — the plans Catalyst's CBO/AQE must get right at
 * 100 TB.
 */
object TpchOps {

  private val dec = DecimalType(18, 4)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3: shipping priority — join, filtered both sides, agg, top-10.
    "q60_tpch3" -> ((s, dir) => {
      val cutoff = lit("1998-01-01").cast("timestamp")
      val c = Tables.table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.table(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val l = Tables.table(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(dec)).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
                unix_micros(col("o_orderdate").cast("timestamp")).as("odate"),
                col("revenue"))
    }),

    // Q5: local-supplier volume — 6-way join with an extra equi condition.
    "q61_tpch5" -> ((s, dir) => {
      val r = broadcast(Tables.table(s, dir, "region")
        .filter(col("r_name") === "ASIA"))
      val n = broadcast(Tables.table(s, dir, "nation"))
      val c = Tables.table(s, dir, "customer")
      val o = Tables.table(s, dir, "orders")
      val l = Tables.table(s, dir, "lineitem")
      val sup = Tables.table(s, dir, "supplier")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
                   col("s_nationkey") === col("c_nationkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(dec)).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Q18: large-volume customers — agg-filtered semi join then rollup.
    "q62_tpch18" -> ((s, dir) => {
      val l = Tables.table(s, dir, "lineitem")
      val big = l.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("tot_qty"))
        .filter(col("tot_qty") > 150)
      val o = Tables.table(s, dir, "orders")
      val c = Tables.table(s, dir, "customer")
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
                unix_micros(col("o_orderdate").cast("timestamp")).as("odate"),
                col("o_totalprice").as("price"),
                col("tot_qty").cast("double").as("tot_qty"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q60_tpch3" -> """
      SELECT l_orderkey,
             epoch_us(o_orderdate) AS odate,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""",

    "q61_tpch5" -> """
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS revenue,
             count(*) AS n
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name""",

    "q62_tpch18" -> """
      SELECT c_custkey, c_name, o_orderkey,
             epoch_us(o_orderdate) AS odate,
             o_totalprice AS price,
             CAST(big.tot_qty AS DOUBLE) AS tot_qty
      FROM orders
      JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS tot_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150) big
        ON o_orderkey = big.l_orderkey
      JOIN customer ON o_custkey = c_custkey"""
  )
}
