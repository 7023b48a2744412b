package graft

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LookupJoin

/** The generic-JDBC scan/sink path (q246) against embedded Derby: scan
  * parallelism, predicate pushdown into the remote WHERE, write/read
  * value fidelity, and the reference's third JDBC ability — lookup —
  * via a JDBC-backed dimension behind the existing lookup join. */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def freshUrl(): String = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val d = Files.createTempDirectory("graft_jdbc_spec").toString
    s"jdbc:derby:$d/db;create=true"
  }

  test("jdbc round-trip: partitioned scan, pushed filter, exact values") {
    val url = freshUrl()
    val src = Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    src.coalesce(4).write.mode("overwrite").jdbc(url, "ORDERS_RT", props)
    val back = spark.read.jdbc(url, "ORDERS_RT", "o_orderkey", 0L, 4000L, 4, props)
      .filter(col("o_orderkey") < 2000)
    assert(back.rdd.getNumPartitions == 4) // range-split scan, 1 query/task
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"),
      s"key filter must reach the remote WHERE clause:\n$plan")
    val exp = src.filter(col("o_orderkey") < 2000).collect()
      .map(_.toString).sorted.toSeq
    assert(back.collect().map(_.toString).sorted.toSeq == exp)
  }

  test("jdbc-backed dimension drives the lookup join") {
    val url = freshUrl()
    Tables.table(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
      .coalesce(1).write.mode("overwrite").jdbc(url, "NATION_DIM", props)
    val dim = spark.read.jdbc(url, "NATION_DIM", props)
    val probe = Tables.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val joined = LookupJoin.snapshot(probe, dim, "c_nationkey", "n_nationkey")
    val exp = probe.join(dim, col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("c_custkey"), col("n_name")).collect()
      .map(_.toString).sorted.toSeq
    assert(joined.select(col("c_custkey"), col("n_name")).collect()
      .map(_.toString).sorted.toSeq == exp)
  }
}
