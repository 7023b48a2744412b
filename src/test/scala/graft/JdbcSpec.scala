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

  test("jdbc MERGE upsert: keep-last per key, streamed batches, idempotent replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.JdbcOps
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val url = freshUrl()
    // seed the table shape (and one row that batch 1 must overwrite)
    Seq((1L, "a", 0L)).toDF("k", "v", "seq")
      .write.mode("overwrite").jdbc(url, "UPS", props)
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDS().toDF("k", "v", "seq").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ups_ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        JdbcOps.upsertBatch(b, url, "UPS", Seq("k"), "seq")
      }.start()
    def state(): Set[(Long, String, Long)] =
      spark.read.jdbc(url, "UPS", props)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    try {
      mem.addData((1L, "b", 1L), (2L, "x", 1L), (2L, "y", 2L)) // in-batch dup key
      q.processAllAvailable()
      assert(state() == Set((1L, "b", 1L), (2L, "y", 2L)))
      mem.addData((2L, "z", 3L), (3L, "c", 3L))
      q.processAllAvailable()
      val after = state()
      assert(after == Set((1L, "b", 1L), (2L, "z", 3L), (3L, "c", 3L)))
      // replayed batch (retry semantics) must be a no-op
      JdbcOps.upsertBatch(Seq((2L, "z", 3L), (3L, "c", 3L)).toDF("k", "v", "seq"),
        url, "UPS", Seq("k"), "seq")
      assert(state() == after)
    } finally q.stop()
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
