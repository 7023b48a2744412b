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

  test("changelog INSERT INTO a non-PK sink without row_kind rejects loudly") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val d = tmp()
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog("ddl_guard_cv", mem.toDS().toDF(),
      kindCol = "kind")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_guard_sink (k2 BIGINT, sv DOUBLE)
      WITH ('connector' = 'filesystem', 'path' = '$d/g')""")
    try {
      // the reference's StreamExecSink validation: an updating result
      // into a plain append sink must fail BEFORE start(), not write
      // every intermediate +I/-U/+U/-D as a fact
      val e = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, """
          INSERT INTO ddl_guard_sink
          SELECT key AS k2, SUM(value) AS sv FROM ddl_guard_cv GROUP BY key""")
      }
      assert(e.getMessage.contains("consuming update changes"))
      assert(e.getMessage.contains("PRIMARY KEY"))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE ddl_guard_sink")
      StreamSql.dropChangelog("ddl_guard_cv")
    }
  }

  test("composite PRIMARY KEY merges on the full column list") {
    val d = tmp()
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_cpk (k BIGINT, g STRING, v DOUBLE,
        PRIMARY KEY (k, g) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/cpk')""")
    try {
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_cpk SELECT 1 AS k, 'x' AS g, 10.0 AS v")
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_cpk SELECT 1 AS k, 'y' AS g, 20.0 AS v")
      // a single-column key would conflate (1,x) and (1,y)
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_cpk SELECT 1 AS k, 'x' AS g, 11.0 AS v")
      val live = SqlDdl.executeSql(spark, "SELECT k, g, v FROM ddl_cpk")
        .df.get.as[(Long, String, Double)].collect().toSet
      assert(live == Set((1L, "x", 11.0), (1L, "y", 20.0)))
      val desc = SqlDdl.executeSql(spark, "DESCRIBE ddl_cpk").df.get
        .collect().map(r => (r.getString(0), r.getString(2))).toMap
      assert(desc("k").contains("PRIMARY KEY"))
      assert(desc("g").contains("PRIMARY KEY"))
    } finally SqlDdl.executeSql(spark, "DROP TABLE ddl_cpk")
  }

  test("re-CREATE of a PRIMARY KEY table re-attaches to the upsert layout") {
    val d = tmp()
    def create() = SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_reattach (k BIGINT, v DOUBLE,
        PRIMARY KEY (k) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/ra')""")
    create()
    try {
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_reattach SELECT 1 AS k, 10.0 AS v")
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_reattach SELECT 2 AS k, 20.0 AS v")
      SqlDdl.executeSql(spark, "DROP TABLE ddl_reattach")
      // re-attach: the readable live view must come back immediately
      create()
      val got = SqlDdl.executeSql(spark, "SELECT k, v FROM ddl_reattach")
        .df.get.as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 10.0), (2L, 20.0)))
      // and the re-seeded epoch counter must outrank the stored ords
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_reattach SELECT 1 AS k, 11.0 AS v")
      val live = SqlDdl.executeSql(spark, "SELECT k, v FROM ddl_reattach")
        .df.get.as[(Long, Double)].collect().toSet
      assert(live == Set((1L, 11.0), (2L, 20.0)))
    } finally SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_reattach")
  }

  test("insert-only streaming INSERT INTO a PK table upserts (no layout mixing)") {
    val srcDir = tmp() + "/src"
    val sinkDir = tmp() + "/pk"
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    (0 until 20).map { i =>
      (i.toLong, i * 1.0, new java.sql.Timestamp(base.getTime + i * 1000L))
    }.toDF("id", "v", "ts").repartition(2).write.parquet(srcDir)
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE ddl_io_src (id BIGINT, v DOUBLE, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
      WITH ('connector' = 'filesystem', 'path' = '$srcDir',
            'format' = 'parquet', 'source.max-files-per-trigger' = '1');
      CREATE TABLE ddl_io_pk (id BIGINT, v DOUBLE,
        PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$sinkDir')""")
    try {
      // an APPEND streaming result into a PK sink is still an UPSERT
      // (each row +I) — it must NOT fall into the plain-file arm, which
      // would interleave non-bucketed files with the bucketed layout
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_io_pk SELECT id, v FROM ddl_io_src").await()
      val live = SqlDdl.executeSql(spark, "SELECT id, v FROM ddl_io_pk")
        .df.get.as[(Long, Double)].collect().toSet
      assert(live == (0 until 20).map(i => (i.toLong, i * 1.0)).toSet)
      // layout purity: everything under __bucket= partitions
      val top = new java.io.File(sinkDir).listFiles().map(_.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
      assert(top.isEmpty, s"plain files leaked into the upsert layout: " +
        top.mkString(", "))
      // a later batch merge composes with the streamed rows
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_io_pk SELECT 3 AS id, 99.0 AS v")
      val after = SqlDdl.executeSql(spark, "SELECT v FROM ddl_io_pk WHERE id = 3")
        .df.get.as[Double].collect().toSeq
      assert(after == Seq(99.0))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE ddl_io_src")
      SqlDdl.executeSql(spark, "DROP TABLE ddl_io_pk")
    }
  }

  test("ord rescale: a later batch merge beats a TTL-era stream ord") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val d = tmp()
    val mem = MemoryStream[CRow]
    StreamSql.registerChangelog("ddl_ord_cv", mem.toDS().toDF(),
      kindCol = "kind", rowId = Some("ord"))
    // TTL makes the Top-N route seed its ord from the wall clock
    // (~2^60) — before the rescale, that dwarfed every later epoch and
    // silently lost subsequent merges to stale rows
    SqlDdl.executeSql(spark, "SET 'table.exec.state.ttl' = '10 min'")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_ord_sink (k2 BIGINT, sv DOUBLE,
        PRIMARY KEY (k2) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/ord')""")
    try {
      val r = SqlDdl.executeSql(spark, """
        INSERT INTO ddl_ord_sink
        SELECT k2, sv FROM (
          SELECT key AS k2, value AS sv,
                 ROW_NUMBER() OVER (PARTITION BY key ORDER BY value DESC)
                   AS rn
          FROM ddl_ord_cv) t WHERE rn <= 1""")
      mem.addData(CRow(1, "+I", 5.0, 1))
      r.await()
      assert(SqlDdl.executeSql(spark, "SELECT sv FROM ddl_ord_sink")
        .df.get.as[Double].collect().toSeq == Seq(5.0))
      SqlDdl.executeSql(spark, "RESET 'table.exec.state.ttl'")
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_ord_sink SELECT 1 AS k2, 99.0 AS sv")
      val live = SqlDdl.executeSql(spark, "SELECT k2, sv FROM ddl_ord_sink")
        .df.get.as[(Long, Double)].collect().toSet
      assert(live == Set((1L, 99.0)))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE ddl_ord_sink")
      StreamSql.dropChangelog("ddl_ord_cv")
      SqlDdl.executeSql(spark, "RESET 'table.exec.state.ttl'")
    }
  }

  test("INSERT OVERWRITE: full, partitioned dynamic, static spec — idempotent") {
    val d = tmp()
    Seq((0L, "a"), (1L, "a"), (2L, "b"), (3L, "b"), (4L, "b"))
      .toDF("id", "g").createOrReplaceTempView("ddl_ow_src")
    // unpartitioned: replaced whole
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_ow (id BIGINT, g STRING)
      WITH ('connector' = 'filesystem', 'path' = '$d/ow')""")
    SqlDdl.executeSql(spark,
      "INSERT INTO ddl_ow SELECT 99 AS id, 'z' AS g")
    SqlDdl.executeSql(spark,
      "INSERT OVERWRITE ddl_ow SELECT id, g FROM ddl_ow_src")
    SqlDdl.executeSql(spark,
      "INSERT OVERWRITE ddl_ow SELECT id, g FROM ddl_ow_src") // idempotent
    val ow = SqlDdl.executeSql(spark, "SELECT id, g FROM ddl_ow").df.get
      .as[(Long, String)].collect().toSet
    assert(ow == Set((0L, "a"), (1L, "a"), (2L, "b"), (3L, "b"), (4L, "b")))
    // partitioned: dynamic overwrite replaces ONLY the touched partition
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_owp (id BIGINT, g STRING) PARTITIONED BY (g)
      WITH ('connector' = 'filesystem', 'path' = '$d/owp')""")
    SqlDdl.executeSql(spark,
      "INSERT OVERWRITE ddl_owp SELECT id, g FROM ddl_ow_src")
    SqlDdl.executeSql(spark,
      "INSERT OVERWRITE ddl_owp SELECT id, g FROM ddl_ow_src WHERE g = 'a' AND id < 1")
    val owp = SqlDdl.executeSql(spark, "SELECT id, g FROM ddl_owp").df.get
      .as[(Long, String)].collect().toSet
    assert(owp == Set((0L, "a"), (2L, "b"), (3L, "b"), (4L, "b")))
    // static PARTITION spec pins the value; the query must not carry it
    SqlDdl.executeSql(spark, """
      INSERT OVERWRITE ddl_owp PARTITION (g='a')
      SELECT id FROM ddl_ow_src WHERE g = 'a'""")
    val owps = SqlDdl.executeSql(spark,
      "SELECT id FROM ddl_owp WHERE g = 'a'").df.get
      .as[Long].collect().toSet
    assert(owps == Set(0L, 1L))
    val e1 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, """
        INSERT OVERWRITE ddl_owp PARTITION (g='a')
        SELECT id, g FROM ddl_ow_src""")
    }
    assert(e1.getMessage.contains("must not also"))
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, """
        INSERT OVERWRITE ddl_ow PARTITION (g='a')
        SELECT id FROM ddl_ow_src""")
    }
    assert(e2.getMessage.contains("PARTITIONED BY"))
    SqlDdl.executeSql(spark, "DROP TABLE ddl_ow")
    SqlDdl.executeSql(spark, "DROP TABLE ddl_owp")
  }

  test("INSERT OVERWRITE rejects streaming results and PK targets") {
    val d = tmp()
    val srcDir = d + "/src"
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    Seq((1L, base)).toDF("id", "ts").write.parquet(srcDir)
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE ddl_owr_src (id BIGINT, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
      WITH ('connector' = 'filesystem', 'path' = '$srcDir');
      CREATE TABLE ddl_owr_t (id BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d/t');
      CREATE TABLE ddl_owr_pk (id BIGINT, PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/pk')""")
    try {
      val e1 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "INSERT OVERWRITE ddl_owr_t SELECT id FROM ddl_owr_src")
      }
      assert(e1.getMessage.contains("bounded"))
      val e2 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "INSERT OVERWRITE ddl_owr_pk SELECT 1 AS id")
      }
      assert(e2.getMessage.contains("PRIMARY KEY"))
    } finally SqlDdl.executeAll(spark,
      "DROP TABLE ddl_owr_src; DROP TABLE ddl_owr_t; DROP TABLE ddl_owr_pk")
  }

  test("BEGIN STATEMENT SET runs its INSERTs as one combined result") {
    val d = tmp()
    spark.range(6).selectExpr("id", "id % 2 AS m")
      .createOrReplaceTempView("ddl_set_src")
    val rs = SqlDdl.executeAll(spark, s"""
      CREATE TABLE ddl_set_a (id BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d/a');
      CREATE TABLE ddl_set_b (n BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d/b');
      BEGIN STATEMENT SET;
      INSERT INTO ddl_set_a SELECT id FROM ddl_set_src WHERE m = 0;
      INSERT INTO ddl_set_b SELECT count(*) AS n FROM ddl_set_src;
      END""")
    // 2 CREATEs + ONE combined set result
    assert(rs.length == 3)
    rs.last.await()
    assert(SqlDdl.executeSql(spark, "SELECT id FROM ddl_set_a").df.get
      .as[Long].collect().toSet == Set(0L, 2L, 4L))
    assert(SqlDdl.executeSql(spark, "SELECT n FROM ddl_set_b").df.get
      .as[Long].head() == 6L)
    // non-INSERT members reject; a lone BEGIN points at the script form
    val e = intercept[IllegalArgumentException] {
      SqlDdl.executeAll(spark,
        "BEGIN STATEMENT SET; SELECT 1 AS x; END")
    }
    assert(e.getMessage.contains("INSERT statements only"))
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "BEGIN STATEMENT SET")
    }
    assert(e2.getMessage.contains("executeAll"))
    SqlDdl.executeSql(spark, "DROP TABLE ddl_set_a")
    SqlDdl.executeSql(spark, "DROP TABLE ddl_set_b")
  }

  test("INSERT column list and VALUES map positionally") {
    val d = tmp()
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_vals (a BIGINT, b STRING, c DOUBLE)
      WITH ('connector' = 'filesystem', 'path' = '$d/v')""")
    try {
      // VALUES carries no usable names — positional onto (a, b, c)
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_vals VALUES (1, 'x', 1.5), (2, 'y', 2.5)")
      val got = SqlDdl.executeSql(spark, "SELECT a, b, c FROM ddl_vals")
        .df.get.as[(Long, String, Double)].collect().toSet
      assert(got == Set((1L, "x", 1.5), (2L, "y", 2.5)))
      // explicit column list: positional rename + NULL fill of the
      // unlisted nullable column (the reference's partial insert)
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_vals (b, a) SELECT 'z' AS q1, 3 AS q2")
      val part = SqlDdl.executeSql(spark,
        "SELECT a, b, c FROM ddl_vals WHERE a = 3").df.get
        .as[(Long, String, Option[Double])].collect().toSet
      assert(part == Set((3L, "z", None: Option[Double])))
      val e1 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "INSERT INTO ddl_vals VALUES (1, 'x')")
      }
      assert(e1.getMessage.contains("declared column"))
      val e2 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "INSERT INTO ddl_vals (nope) SELECT 1 AS x")
      }
      assert(e2.getMessage.contains("undeclared"))
    } finally SqlDdl.executeSql(spark, "DROP TABLE ddl_vals")
    // a NOT NULL column absent from the list rejects
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_vals2 (a BIGINT NOT NULL, b STRING)
      WITH ('connector' = 'filesystem', 'path' = '$d/v2')""")
    try {
      val e = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "INSERT INTO ddl_vals2 (b) SELECT 'x' AS q")
      }
      assert(e.getMessage.contains("NOT NULL"))
    } finally SqlDdl.executeSql(spark, "DROP TABLE ddl_vals2")
  }

  test("statement set multiplexes stateless members over ONE source scan") {
    val srcDir = tmp() + "/src"
    val d = tmp()
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    (0 until 20).map { i =>
      (i.toLong, i * 1.0, new java.sql.Timestamp(base.getTime + i * 1000L))
    }.toDF("id", "v", "ts").repartition(2).write.parquet(srcDir)
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE ddl_mx_src (id BIGINT, v DOUBLE, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
      WITH ('connector' = 'filesystem', 'path' = '$srcDir',
            'format' = 'parquet', 'source.max-files-per-trigger' = '1');
      CREATE TABLE ddl_mx_a (id BIGINT, v DOUBLE)
      WITH ('connector' = 'filesystem', 'path' = '$d/a');
      CREATE TABLE ddl_mx_b (dbl BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d/b')""")
    try {
      val rs = SqlDdl.executeAll(spark, """
        BEGIN STATEMENT SET;
        INSERT INTO ddl_mx_a SELECT id, v FROM ddl_mx_src WHERE id < 10;
        INSERT INTO ddl_mx_b SELECT id * 2 AS dbl FROM ddl_mx_src WHERE v > 14;
        END""")
      // structural proof of the multiplex: ONE query handle for the
      // whole set (the fallback path would carry one per member)
      assert(rs.last.query.nonEmpty && rs.last.queries.isEmpty)
      rs.last.await()
      assert(SqlDdl.executeSql(spark, "SELECT id FROM ddl_mx_a").df.get
        .as[Long].collect().toSet == (0L until 10L).toSet)
      assert(SqlDdl.executeSql(spark, "SELECT dbl FROM ddl_mx_b").df.get
        .as[Long].collect().toSet == (15 until 20).map(_ * 2L).toSet)
      // the idempotent batch-id partition layout
      val top = new java.io.File(d + "/a").listFiles().map(_.getName)
        .filter(_.startsWith("__sb="))
      assert(top.nonEmpty)
      // a member outside the multiplexable shape (explicit column
      // list here) falls back to one query per member
      val rs2 = SqlDdl.executeAll(spark, """
        BEGIN STATEMENT SET;
        INSERT INTO ddl_mx_a (id, v) SELECT id, v FROM ddl_mx_src WHERE id < 0;
        INSERT INTO ddl_mx_b SELECT id * 2 AS dbl FROM ddl_mx_src WHERE v < 0;
        END""")
      assert(rs2.last.queries.length == 2)
      rs2.last.await()
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE ddl_mx_src")
      SqlDdl.executeSql(spark, "DROP TABLE ddl_mx_a")
      SqlDdl.executeSql(spark, "DROP TABLE ddl_mx_b")
    }
  }

  test("SHOW TABLES lists plain (batch) views too") {
    SqlDdl.executeSql(spark,
      "CREATE VIEW ddl_plain_view AS SELECT 1 AS x")
    try {
      val rows = SqlDdl.executeSql(spark, "SHOW TABLES").df.get
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows.contains(("ddl_plain_view", "view")))
    } finally SqlDdl.executeSql(spark, "DROP VIEW ddl_plain_view")
  }

  test("CREATE TABLE guards mixed layouts (PK over plain data, plain over upsert)") {
    val d = tmp()
    spark.range(3).toDF("id").write.parquet(d + "/plain")
    val e1 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_mix1 (id BIGINT, PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector' = 'filesystem', 'path' = '$d/plain')""")
    }
    assert(e1.getMessage.contains("non-upsert data"))
    // build an upsert layout, then try to read it as a plain table
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_mix2 (id BIGINT, v DOUBLE,
        PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/up')""")
    SqlDdl.executeSql(spark, "INSERT INTO ddl_mix2 SELECT 1 AS id, 1.0 AS v")
    SqlDdl.executeSql(spark, "DROP TABLE ddl_mix2")
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_mix3 (id BIGINT, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '$d/up')""")
    }
    assert(e2.getMessage.contains("upsert-table layout"))
  }
}
