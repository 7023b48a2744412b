package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SqlDdl, SqlFrontend}
import graft.streaming.StreamSql

/**
 * The SQL DDL front door (SqlDdl): CREATE TABLE (bounded + WATERMARK
 * streaming), computed columns, CREATE VIEW over routed streaming SQL,
 * INSERT INTO (batch append + streaming writeStream), DROP/SHOW/
 * DESCRIBE, and the fail-loud arms — the reference's executeSql
 * statement dispatch (SqlToOperationConverter) re-expressed over
 * registerStream/registerChangelog/temp views.
 */
class SqlDdlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_ddl_spec").toString

  test("batch CREATE TABLE + INSERT INTO + SELECT round-trips") {
    val srcDir = tmp() + "/src"
    val sinkDir = tmp() + "/sink"
    spark.range(10).selectExpr("id", "id * 2 AS v")
      .write.parquet(srcDir)
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_src (id BIGINT, v BIGINT,
                            v3 AS v * 3)
      WITH ('connector' = 'filesystem', 'path' = '$srcDir',
            'format' = 'parquet')""")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_sink (id BIGINT, v3 BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$sinkDir',
            'format' = 'parquet')""")
    // computed column visible through the registered view
    val got0 = SqlDdl.executeSql(spark,
      "SELECT id, v3 FROM ddl_src WHERE id < 3").df.get
      .as[(Long, Long)].collect().toSet
    assert(got0 == Set((0L, 0L), (1L, 6L), (2L, 12L)))
    // INSERT INTO appends and refreshes the target view
    SqlDdl.executeSql(spark,
      "INSERT INTO ddl_sink SELECT id, v3 FROM ddl_src WHERE id >= 8")
    val got = SqlDdl.executeSql(spark, "SELECT id, v3 FROM ddl_sink").df.get
      .as[(Long, Long)].collect().toSet
    assert(got == Set((8L, 48L), (9L, 54L)))
    // second INSERT appends (mode append, not overwrite)
    SqlDdl.executeSql(spark,
      "INSERT INTO ddl_sink SELECT id, v3 FROM ddl_src WHERE id = 0")
    assert(spark.table("ddl_sink").count() == 3)
    SqlDdl.executeSql(spark, "DROP TABLE ddl_src")
    SqlDdl.executeSql(spark, "DROP TABLE ddl_sink")
  }

  test("WATERMARK DDL registers a stream table; all-text pipeline to a sink") {
    val srcDir = tmp() + "/src"
    val sinkDir = tmp() + "/sink"
    // two files so the replay crosses micro-batches
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val rows = (0 until 40).map { i =>
      (i.toLong, i % 4, new java.sql.Timestamp(base.getTime + i * 1000L))
    }
    rows.toDF("id", "bucket", "ts").repartition(2).write.parquet(srcDir)
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE ddl_ev (id BIGINT, bucket INT, ts TIMESTAMP,
                           WATERMARK FOR ts AS ts - INTERVAL '1' SECOND,
                           PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$srcDir',
            'format' = 'parquet', 'source.max-files-per-trigger' = '1');
      CREATE TABLE ddl_out (bucket INT, row_kind STRING, row_ord BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$sinkDir',
            'format' = 'parquet')""")
    // DESCRIBE carries watermark + pk annotations
    val desc = SqlDdl.executeSql(spark, "DESCRIBE ddl_ev").df.get
      .as[(String, String, String)].collect()
      .map { case (n, t, e) => (n, (t, e)) }.toMap
    assert(desc("ts")._2.contains("WATERMARK - 1 second"))
    assert(desc("id")._2.contains("PRIMARY KEY"))
    // the whole pipeline as text: streaming SELECT DISTINCT → sink
    val r = SqlDdl.executeSql(spark,
      "INSERT INTO ddl_out SELECT DISTINCT bucket FROM ddl_ev")
    r.await()
    val got = spark.read.parquet(sinkDir).select("bucket")
      .as[Int].collect().toSet
    assert(got == Set(0, 1, 2, 3))
    SqlDdl.executeSql(spark, "DROP TABLE ddl_ev")
    SqlDdl.executeSql(spark, "DROP TABLE ddl_out")
  }

  test("CREATE VIEW over a routed changelog statement registers for chaining") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog("ddl_cl", mem.toDS().toDF(), kindCol = "kind")
    try {
      SqlDdl.executeSql(spark, """
        CREATE VIEW ddl_agg AS
        SELECT key AS k, SUM(value) AS s FROM ddl_cl GROUP BY key""")
      // the registered view is consumable by a later streaming statement
      val out = SqlFrontend.sql(spark,
        "SELECT k, s FROM ddl_agg WHERE s >= 5 ORDER BY s DESC, k LIMIT 2")
      assert(out.isStreaming && out.columns.contains("row_kind"))
    } finally {
      SqlDdl.executeSql(spark, "DROP VIEW IF EXISTS ddl_agg")
      StreamSql.dropChangelog("ddl_cl")
    }
  }

  test("CREATE VIEW over a batch query is a temp view") {
    spark.range(5).toDF("id").createOrReplaceTempView("ddl_b")
    SqlDdl.executeSql(spark,
      "CREATE VIEW ddl_bv AS SELECT id * 2 AS d FROM ddl_b")
    assert(spark.table("ddl_bv").as[Long].collect().toSet ==
      Set(0L, 2L, 4L, 6L, 8L))
    SqlDdl.executeSql(spark, "DROP VIEW ddl_bv")
  }

  test("SHOW TABLES lists catalog entries with kinds") {
    val d = tmp()
    spark.range(1).write.parquet(d + "/p")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_show (id BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d/p')""")
    val rows = SqlDdl.executeSql(spark, "SHOW TABLES").df.get
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.contains(("ddl_show", "table")))
    SqlDdl.executeSql(spark, "DROP TABLE ddl_show")
  }

  test("fail-loud arms: connector, statement kind, missing column, types") {
    val d = tmp()
    val e1 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE t1 (id BIGINT)
        WITH ('connector' = 'kafka', 'path' = '$d')""")
    }
    assert(e1.getMessage.contains("connector"))
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "ALTER TABLE x RENAME TO y")
    }
    assert(e2.getMessage.contains("unsupported statement kind"))
    val e3 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "INSERT INTO nope SELECT 1 AS x")
    }
    assert(e3.getMessage.contains("unknown table"))
    spark.range(1).write.parquet(d + "/p4")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_t4 (id BIGINT, missing STRING)
      WITH ('connector' = 'filesystem', 'path' = '$d/p4')""")
    val e4 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "INSERT INTO ddl_t4 SELECT 1 AS id")
    }
    assert(e4.getMessage.contains("lacks declared column"))
    SqlDdl.executeSql(spark, "DROP TABLE ddl_t4")
    val e5 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE t5 (g GEOMETRY)
        WITH ('connector' = 'filesystem', 'path' = '$d')""")
    }
    assert(e5.getMessage.contains("unsupported column type"))
  }

  test("EXPLAIN, SET and RESET complete the statement dispatch") {
    val plan = SqlDdl.executeSql(spark, "EXPLAIN SELECT 1 AS x").df.get
      .as[String].head()
    assert(plan.contains("Project") || plan.contains("Scan"))
    assert(SqlDdl.executeSql(spark,
      "EXPLAIN PLAN FOR SELECT 1 AS x").df.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "EXPLAIN INSERT INTO t SELECT 1 AS x")
    }
    assert(e.getMessage.contains("INSERT"))
    // the reference's TTL config lands in ms on the engine's conf, in
    // every duration form
    SqlDdl.executeSql(spark, "SET 'table.exec.state.ttl' = '10 min'")
    assert(spark.conf.get("spark.graft.state.ttl.ms") == "600000")
    SqlDdl.executeSql(spark, "SET 'table.exec.state.ttl' = '3600000'")
    assert(spark.conf.get("spark.graft.state.ttl.ms") == "3600000")
    SqlDdl.executeSql(spark, "RESET 'table.exec.state.ttl'")
    assert(spark.conf.getOption("spark.graft.state.ttl.ms").isEmpty)
    SqlDdl.executeSql(spark, "SET 'spark.graft.test.key' = 'v1'")
    assert(spark.conf.get("spark.graft.test.key") == "v1")
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "SET 'table.exec.state.ttl' = 'soon'")
    }
    assert(e2.getMessage.contains("duration"))
  }

  test("INSERT INTO a PRIMARY KEY sink upserts by key; retracted keys disappear") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val d = tmp()
    val cv = "ddl_upsert_cv"
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog(cv, mem.toDS().toDF(), kindCol = "kind")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_upsert_sink (k2 BIGINT, sv DOUBLE,
        PRIMARY KEY (k2) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/up')""")
    try {
      val r = SqlDdl.executeSql(spark, s"""
        INSERT INTO ddl_upsert_sink
        SELECT key AS k2, SUM(value) AS sv FROM $cv GROUP BY key""")
      val q = r.query.get
      mem.addData(CRow(1, "+I", 2.0, 1), CRow(2, "+I", 9.0, 2))
      q.processAllAvailable()
      mem.addData(CRow(1, "+I", 3.0, 3))     // key 1 churns: 2.0 → 5.0
      q.processAllAvailable()
      mem.addData(CRow(2, "-D", 9.0, 2))     // key 2's sum retracts to ∅
      r.await()
      val live = SqlDdl.executeSql(spark,
        "SELECT k2, sv FROM ddl_upsert_sink").df.get
        .as[(Long, Double)].collect().toSet
      assert(live == Set((1L, 5.0))) // key 1 at its FINAL value; key 2 gone
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE ddl_upsert_sink")
      StreamSql.dropChangelog(cv)
    }
  }

  test("batch INSERT INTO a PRIMARY KEY sink merges by key across statements") {
    val d = tmp()
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_scd (k BIGINT, v DOUBLE, PRIMARY KEY (k) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/scd')""")
    try {
      SqlDdl.executeSql(spark, "INSERT INTO ddl_scd SELECT 1 AS k, 10.0 AS v")
      SqlDdl.executeSql(spark, "INSERT INTO ddl_scd SELECT 2 AS k, 20.0 AS v")
      // SCD1: the later statement overwrites key 1
      SqlDdl.executeSql(spark, "INSERT INTO ddl_scd SELECT 1 AS k, 11.0 AS v")
      val live = SqlDdl.executeSql(spark, "SELECT k, v FROM ddl_scd").df.get
        .as[(Long, Double)].collect().toSet
      assert(live == Set((1L, 11.0), (2L, 20.0)))
    } finally SqlDdl.executeSql(spark, "DROP TABLE ddl_scd")
  }

  test("review hardening: explain guard, CTE, comments, partitions, kind-aware DROP") {
    val d = tmp()
    // CTE / VALUES queries are accepted at the front door
    assert(SqlDdl.executeSql(spark,
      "WITH x AS (SELECT 7 AS a) SELECT a FROM x").df.get
      .collect()(0).getInt(0) == 7)
    // line comments (with ';' and keywords inside) neither split nor
    // block dispatch
    spark.range(3).toDF("id").write.parquet(d + "/pc")
    val rs = SqlDdl.executeAll(spark, s"""
      -- create the source; then query it
      CREATE TABLE ddl_cmt (id BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d/pc');
      SELECT count(*) AS n FROM ddl_cmt -- trailing note
      """)
    assert(rs.last.df.get.collect()(0).getLong(0) == 3)
    // EXPLAIN of a side-effecting statement rejects BEFORE running it
    val e = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "EXPLAIN DROP TABLE ddl_cmt")
    }
    assert(e.getMessage.contains("query statement"))
    assert(SqlDdl.executeSql(spark,
      "SELECT count(*) AS n FROM ddl_cmt").df.get
      .collect()(0).getLong(0) == 3) // the table survived
    assert(SqlDdl.executeSql(spark,
      "EXPLAIN WITH x AS (SELECT 1 AS a) SELECT a FROM x").df.nonEmpty)
    // kind-aware DROP: a typo'd kind errors instead of destroying
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "DROP VIEW ddl_cmt")
    }
    assert(e2.getMessage.contains("is a TABLE"))
    SqlDdl.executeSql(spark, "DROP TABLE ddl_cmt")
    // Hive-partitioned layout: data under k=v/ registers the view
    spark.range(4).toDF("id").withColumn("k", lit(1))
      .write.partitionBy("k").parquet(d + "/pp")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_pp (id BIGINT, k INT)
      WITH ('connector' = 'filesystem', 'path' = '$d/pp')""")
    assert(SqlDdl.executeSql(spark,
      "SELECT count(*) AS n FROM ddl_pp").df.get
      .collect()(0).getLong(0) == 4)
    SqlDdl.executeSql(spark, "DROP TABLE ddl_pp")
  }

  test("type mapping covers the Flink scalar surface") {
    import org.apache.spark.sql.types._
    assert(SqlDdl.sqlType("STRING") == StringType)
    assert(SqlDdl.sqlType("VARCHAR(20)") == StringType)
    assert(SqlDdl.sqlType("DECIMAL(18, 2)") == DecimalType(18, 2))
    assert(SqlDdl.sqlType("TIMESTAMP(3)") == TimestampType)
    assert(SqlDdl.sqlType("TIMESTAMP_LTZ(3)") == TimestampType)
    assert(SqlDdl.sqlType("ARRAY<DOUBLE>") == ArrayType(DoubleType))
    assert(SqlDdl.sqlType("BYTES") == BinaryType)
    assert(SqlDdl.sqlType("DOUBLE PRECISION") == DoubleType)
  }

  test("statement splitting and WITH parsing are literal-opaque") {
    val stmts = SqlDdl.splitStatements(
      "SELECT 'a;b' AS x; SELECT 2 AS y;")
    assert(stmts == Seq("SELECT 'a;b' AS x", "SELECT 2 AS y"))
    val opts = SqlDdl.parseOptions("'path' = '/x;y', 'csv.sep' = ';'")
    assert(opts == Map("path" -> "/x;y", "csv.sep" -> ";"))
  }
}
