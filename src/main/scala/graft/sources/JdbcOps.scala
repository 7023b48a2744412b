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

  /** Keyed JDBC UPSERT via SQL-standard MERGE — the reference's
    * JdbcUpsertTableSink (flink-connectors/flink-connector-jdbc/.../
    * JdbcUpsertTableSink.java: UPDATE_AFTER stream into a keyed table).
    * Apply one micro-batch: keep-last per key within the batch by
    * `seqCol`, then each partition opens a connection and executes one
    * batched, transactional MERGE statement per row group.
    *
    * Idempotent on replay: re-MERGing an applied batch updates rows to
    * the values they already hold. Parameter markers are CAST to the
    * column's SQL type (Derby rejects untyped parameters; the cast is
    * harmless on other engines). The batch is coalesced to
    * `maxConnections` partitions so the endpoint sees a bounded
    * connection count. */
  def upsertBatch(batch: DataFrame, url: String, table: String,
                  keyCols: Seq[String], seqCol: String,
                  maxConnections: Int = 4): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    if (batch.isEmpty) return
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    def sqlType(dt: DataType): String = dt match {
      case LongType => "BIGINT";   case IntegerType => "INTEGER"
      case DoubleType => "DOUBLE"; case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case StringType => "VARCHAR(4000)"
      case other => throw new IllegalArgumentException(s"upsert: $other")
    }
    val cols = latest.schema.fields.toSeq
    val names = cols.map(_.name)
    val typeOf = cols.map(f => f.name -> sqlType(f.dataType)).toMap
    val nonKeys = names.filterNot(keyCols.contains)
    // Derby's MERGE source must be a base table or table function (no
    // VALUES constructor), so use the documented one-row idiom: the
    // dual table SYSIBM.SYSDUMMY1 as the source, the row's values as
    // typed parameters in ON / SET / INSERT. Parameter order per row:
    // keys (ON), non-keys (SET), then every column (INSERT).
    def p(c: String) = s"CAST(? AS ${typeOf(c)})"
    def q(c: String) = "\"" + c + "\"" // writer-created columns are case-exact
    val merge =
      s"""MERGE INTO $table t
         |USING SYSIBM.SYSDUMMY1
         |ON ${keyCols.map(k => s"t.${q(k)} = ${p(k)}").mkString(" AND ")}
         |WHEN MATCHED THEN UPDATE SET ${
           nonKeys.map(c => s"${q(c)} = ${p(c)}").mkString(", ")}
         |WHEN NOT MATCHED THEN INSERT (${names.map(q).mkString(", ")})
         |VALUES (${names.map(p).mkString(", ")})""".stripMargin
    val paramCols = (keyCols ++ nonKeys ++ names).toIndexedSeq
    val colIdx = names.zipWithIndex.toMap
    latest.coalesce(maxConnections).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          Class.forName(driver)
          val conn = java.sql.DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val st = conn.prepareStatement(merge)
            rows.foreach { r =>
              var i = 0
              while (i < paramCols.length) {
                st.setObject(i + 1, r.get(colIdx(paramCols(i))))
                i += 1
              }
              st.addBatch()
            }
            st.executeBatch()
            conn.commit()
          } finally conn.close()
        }
    }
  }

  val oracle: Map[String, String] = Map(
    "q246_jdbc_roundtrip" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders WHERE o_orderkey < 2000
      GROUP BY o_orderstatus"""
  )
}
