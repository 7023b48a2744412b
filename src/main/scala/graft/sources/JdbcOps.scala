package graft.sources

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/**
 * JDBC source/sink through Spark's built-in generic JDBC relation —
 * the reference's flink-connectors/flink-connector-jdbc/.../
 * JdbcDynamicTableSource.java (scan + lookup abilities) and
 * JdbcDynamicTableSink.java, re-expressed as `spark.read.jdbc` /
 * `df.write.jdbc`.
 *
 * The in-image endpoint is EMBEDDED DERBY (derby-*.jar ships in
 * /opt/spark/jars as a Spark dependency, and Spark carries a
 * DerbyDialect) — but nothing here is Derby-specific: the exercised
 * code path is the generic JDBCRelation, identical for Postgres/MySQL/
 * Oracle URLs. At cluster scale the same calls carry the operative
 * options:
 *
 * - READ parallelism: `partitionColumn`/`lowerBound`/`upperBound`/
 *   `numPartitions` split the scan into range-predicated queries, one
 *   per task — the only way a JDBC scan is NOT a single-task driver
 *   bottleneck (q246 reads with 4 such partitions).
 * - Predicate pushdown: filters on the JDBC frame compile into the
 *   remote WHERE clause (JDBCRelation PushedFilters, asserted in
 *   JdbcSpec), so the database prunes before rows cross the wire.
 * - WRITE parallelism: each task opens its own connection and batches
 *   inserts; the frame is coalesced to a bounded number of partitions
 *   so an embedded/remote endpoint sees a sane connection count.
 *
 * Embedded Derby accepts concurrent connections only within ONE JVM —
 * exactly the local[n] test topology; a multi-executor deployment
 * would point the same code at a server URL.
 */
object JdbcOps {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", driver)
    p
  }

  /** Fresh embedded-Derby URL under a temp dir (one database per
    * invocation, so reruns never collide). */
  private def freshUrl(): String = {
    // keep Derby's log out of the working directory
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val dir = Files.createTempDirectory("graft_jdbc").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Round-trip: orders slice -> Derby table (parallel batched INSERT)
    // -> partitioned parallel JDBC scan with the key filter pushed to
    // the database -> aggregate. The oracle computes the same aggregate
    // straight from parquet, so type coercion or row loss in either
    // JDBC direction hash-mismatches.
    //
    // The written slice is the FIXED key range the query reads (key
    // values don't renumber with scale factor, so the Derby work is
    // constant at any SF) — a correctness-gate query should not grow a
    // single-node database linearly with the corpus. The parquet-side
    // filter prunes via PushedFilters before a single JDBC insert.
    "q246_jdbc_roundtrip" -> ((s, dir) => {
      val url = freshUrl()
      Tables.table(s, dir, "orders")
        .filter(col("o_orderkey") < 4000)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .coalesce(4)
        .write.mode("overwrite").jdbc(url, "ORDERS_RT", props)
      s.read.jdbc(url, "ORDERS_RT", "o_orderkey",
                  0L, 4000L, 4, props)
        .filter(col("o_orderkey") < 2000) // -> remote WHERE
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
             sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
               .as("total"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q246_jdbc_roundtrip" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders WHERE o_orderkey < 2000
      GROUP BY o_orderstatus"""
  )
}
