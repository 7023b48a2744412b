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
    // ALTER TABLE RENAME/SET are implemented now; an ALTER form this
    // front door does not take (ADD COLUMN) still rejects by kind, and
    // a rename of an unknown table rejects by name
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "ALTER TABLE x ADD COLUMN y BIGINT")
    }
    assert(e2.getMessage.contains("unsupported statement kind"))
    val e2b = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "ALTER TABLE x RENAME TO y")
    }
    assert(e2b.getMessage.contains("unknown table"))
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
    assert(e.getMessage.contains("unknown table"))
    // EXPLAIN of an INSERT into a known table plans the body, headers
    // the sink, and writes NOTHING
    val dx = tmp()
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_exp_t (x INT, PRIMARY KEY (x) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$dx/t')""")
    try {
      val ip = SqlDdl.executeSql(spark,
        "EXPLAIN INSERT INTO ddl_exp_t SELECT 1 AS x").df.get
        .as[String].head()
      assert(ip.contains("Sink: ddl_exp_t") && ip.contains("upsert on (x)"))
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_exp_t").df.get.as[Long].head() == 0L)
    } finally SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_exp_t")
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
    assert(e.getMessage.contains("not explainable"))
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
      // two members into the SAME sink must NOT multiplex (each would
      // dynamic-overwrite the other's __sb partition) and cannot run
      // concurrently either (the file sink's metadata log is
      // single-writer per path): they run SEQUENTIALLY, drained by
      // statement order, and BOTH slices land
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_mx_c (id BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/c')""")
      val rs3 = SqlDdl.executeAll(spark, """
        BEGIN STATEMENT SET;
        INSERT INTO ddl_mx_c SELECT id FROM ddl_mx_src WHERE id < 3;
        INSERT INTO ddl_mx_c SELECT id FROM ddl_mx_src WHERE id >= 17;
        END""")
      // structural: neither the multiplexed single handle nor live
      // concurrent handles — the members were drained sequentially
      assert(rs3.last.query.isEmpty && rs3.last.queries.isEmpty)
      rs3.last.await()
      assert(SqlDdl.executeSql(spark, "SELECT id FROM ddl_mx_c").df.get
        .as[Long].collect().toSet == Set(0L, 1L, 2L, 17L, 18L, 19L))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE ddl_mx_src")
      SqlDdl.executeSql(spark, "DROP TABLE ddl_mx_a")
      SqlDdl.executeSql(spark, "DROP TABLE ddl_mx_b")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_mx_c")
    }
  }

  test("successive streaming INSERTs into one append table both land") {
    // regression: the native file sink's per-path _spark_metadata log
    // marked batch 0 committed, so a SECOND streaming INSERT (fresh
    // checkpoint, batch ids from 0) silently skipped its writes
    val srcDir = tmp() + "/src"
    val d = tmp()
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    (0 until 8).map { i =>
      (i.toLong, new java.sql.Timestamp(base.getTime + i * 1000L))
    }.toDF("id", "ts").write.parquet(srcDir)
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE ddl_sa_src (id BIGINT, ts TIMESTAMP,
        WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
      WITH ('connector' = 'filesystem', 'path' = '$srcDir');
      CREATE TABLE ddl_sa_t (id BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d/t')""")
    try {
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_sa_t SELECT id FROM ddl_sa_src WHERE id < 3")
        .await()
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_sa_t SELECT id FROM ddl_sa_src WHERE id >= 6")
        .await()
      assert(SqlDdl.executeSql(spark, "SELECT id FROM ddl_sa_t").df.get
        .as[Long].collect().toSet == Set(0L, 1L, 2L, 6L, 7L))
      // and a batch INSERT into the same table remains readable too
      SqlDdl.executeSql(spark, "INSERT INTO ddl_sa_t VALUES (100)")
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_sa_t").df.get.as[Long].head() == 6L)
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE ddl_sa_src")
      SqlDdl.executeSql(spark, "DROP TABLE ddl_sa_t")
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

  test("CREATE TABLE LIKE inherits schema/options and merges per strategy") {
    val d = tmp()
    spark.range(4).selectExpr("id", "CAST(id * 1.5 AS DOUBLE) AS v")
      .write.parquet(d + "/base")
    spark.range(6).selectExpr("id", "CAST(id * 2.0 AS DOUBLE) AS v")
      .write.parquet(d + "/clone")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_like_base (id BIGINT, v DOUBLE, v2 AS v * 2)
      WITH ('connector' = 'filesystem', 'path' = '$d/base',
            'format' = 'parquet')""")
    try {
      // the standard clone idiom: same shape, new directory
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_like_c1
        WITH ('path' = '$d/clone')
        LIKE ddl_like_base (OVERWRITING OPTIONS)""")
      val got = SqlDdl.executeSql(spark,
        "SELECT CAST(sum(v2) AS BIGINT) AS s, count(*) AS n FROM ddl_like_c1")
        .df.get.as[(Long, Long)].head()
      assert(got == (60L, 6L)) // 2*sum(2.0*id, id<6)=60 — inherited v2
      // extra columns append; redefining an inherited physical errors
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_like_c2 (v4 AS v2 * 2)
        WITH ('path' = '$d/clone') LIKE ddl_like_base (OVERWRITING OPTIONS)""")
      val c2 = SqlDdl.executeSql(spark,
        "SELECT CAST(sum(v4) AS BIGINT) AS s FROM ddl_like_c2")
        .df.get.as[Long].head()
      assert(c2 == 120L)
      val e1 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, s"""
          CREATE TABLE ddl_like_bad (id BIGINT)
          WITH ('path' = '$d/clone') LIKE ddl_like_base (OVERWRITING OPTIONS)""")
      }
      assert(e1.getMessage.contains("already exists in the base table"))
      // INCLUDING OPTIONS (the default) + a redefined option errors
      val e2 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, s"""
          CREATE TABLE ddl_like_bad2
          WITH ('path' = '$d/clone') LIKE ddl_like_base""")
      }
      assert(e2.getMessage.contains("EXCLUDING OPTIONS or OVERWRITING"))
      // OVERWRITING GENERATED replaces the computed definition
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_like_c3 (v2 AS v * 10)
        WITH ('path' = '$d/clone')
        LIKE ddl_like_base (OVERWRITING GENERATED OVERWRITING OPTIONS)""")
      val c3 = SqlDdl.executeSql(spark,
        "SELECT CAST(sum(v2) AS BIGINT) AS s FROM ddl_like_c3")
        .df.get.as[Long].head()
      assert(c3 == 300L)
      // without OVERWRITING GENERATED the redefinition errors
      val e3 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, s"""
          CREATE TABLE ddl_like_bad3 (v2 AS v * 10)
          WITH ('path' = '$d/clone') LIKE ddl_like_base (OVERWRITING OPTIONS)""")
      }
      assert(e3.getMessage.contains("OVERWRITING GENERATED"))
      // EXCLUDING ALL drops options too — connector/path must be declared
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_like_c4 (w DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '$d/never')
        LIKE ddl_like_base (EXCLUDING ALL)""")
      val cols = SqlDdl.executeSql(spark, "DESCRIBE ddl_like_c4").df.get
        .collect().map(_.getString(0)).toSet
      // physical columns still inherit (LIKE always carries them);
      // the computed column is excluded
      assert(cols == Set("id", "v", "w"))
      // OVERWRITING ALL / OVERWRITING CONSTRAINTS are invalid forms
      val e4 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, s"""
          CREATE TABLE ddl_like_bad4
          WITH ('path' = '$d/clone') LIKE ddl_like_base (OVERWRITING ALL)""")
      }
      assert(e4.getMessage.contains("not applicable"))
    } finally Seq("ddl_like_base", "ddl_like_c1", "ddl_like_c2",
                  "ddl_like_c3", "ddl_like_c4").foreach(t =>
      SqlDdl.executeSql(spark, s"DROP TABLE IF EXISTS $t"))
  }

  test("CREATE TABLE LIKE carries watermark and PRIMARY KEY per strategy") {
    val d = tmp()
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_like_pk (id BIGINT, v BIGINT,
        PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/pk')""")
    try {
      // CONSTRAINTS inherit by default: the clone is an upsert table
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_like_pk2
        WITH ('path' = '$d/pk2') LIKE ddl_like_pk (OVERWRITING OPTIONS)""")
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_like_pk2 SELECT 1 AS id, 10 AS v")
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_like_pk2 SELECT 1 AS id, 20 AS v")
      val live = SqlDdl.executeSql(spark,
        "SELECT id, v FROM ddl_like_pk2").df.get
        .as[(Long, Long)].collect().toSet
      assert(live == Set((1L, 20L)))
      // both-defined PK errors; EXCLUDING CONSTRAINTS allows a new one
      val e = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, s"""
          CREATE TABLE ddl_like_pk3 (PRIMARY KEY (v) NOT ENFORCED)
          WITH ('path' = '$d/pk3') LIKE ddl_like_pk (OVERWRITING OPTIONS)""")
      }
      assert(e.getMessage.contains("EXCLUDING CONSTRAINTS"))
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_like_pk4 (PRIMARY KEY (v) NOT ENFORCED)
        WITH ('path' = '$d/pk4')
        LIKE ddl_like_pk (EXCLUDING CONSTRAINTS OVERWRITING OPTIONS)""")
      val desc = SqlDdl.executeSql(spark, "DESCRIBE ddl_like_pk4").df.get
        .collect().map(r => (r.getString(0), r.getString(2))).toMap
      assert(desc("v").contains("PRIMARY KEY") &&
             !desc("id").contains("PRIMARY KEY"))
    } finally Seq("ddl_like_pk", "ddl_like_pk2", "ddl_like_pk4").foreach(t =>
      SqlDdl.executeSql(spark, s"DROP TABLE IF EXISTS $t"))
  }

  test("ALTER TABLE RENAME TO moves the catalog entry and surfaces") {
    val d = tmp()
    spark.range(4).selectExpr("id", "id * 10 AS v").write.parquet(d + "/t")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_ren_a (id BIGINT, v BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d/t')""")
    try {
      SqlDdl.executeSql(spark, "ALTER TABLE ddl_ren_a RENAME TO ddl_ren_b")
      // old name gone, new name reads
      val got = SqlDdl.executeSql(spark,
        "SELECT CAST(sum(v) AS BIGINT) AS s FROM ddl_ren_b").df.get
        .as[Long].head()
      assert(got == 60L)
      assert(!spark.catalog.tableExists("ddl_ren_a"))
      val names = SqlDdl.executeSql(spark, "SHOW TABLES").df.get
        .collect().map(_.getString(0)).toSet
      assert(names.contains("ddl_ren_b") && !names.contains("ddl_ren_a"))
      // unknown source / existing target reject
      val e1 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "ALTER TABLE ddl_ren_a RENAME TO ddl_ren_c")
      }
      assert(e1.getMessage.contains("unknown table"))
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_ren_c (id BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/c')""")
      val e2 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "ALTER TABLE ddl_ren_b RENAME TO ddl_ren_c")
      }
      assert(e2.getMessage.contains("already exists"))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_ren_b")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_ren_c")
    }
  }

  test("ALTER TABLE RENAME keeps a PRIMARY KEY table's merged state") {
    val d = tmp()
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_ren_pk (id BIGINT, v BIGINT,
        PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/pk')""")
    try {
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_ren_pk SELECT 1 AS id, 10 AS v")
      SqlDdl.executeSql(spark,
        "ALTER TABLE ddl_ren_pk RENAME TO ddl_ren_pk2")
      // the upsert layout re-attaches under the new name, and a merge
      // under the new name still wins (epoch ordering keyed by path)
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_ren_pk2 SELECT 1 AS id, 99 AS v")
      val got = SqlDdl.executeSql(spark,
        "SELECT id, v FROM ddl_ren_pk2").df.get
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 99L)))
    } finally
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_ren_pk2")
  }

  test("ALTER TABLE SET merges properties and re-registers") {
    val d = tmp()
    spark.range(3).selectExpr("id").write.parquet(d + "/p1")
    spark.range(5).selectExpr("id").write.parquet(d + "/p2")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_set_t (id BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d/p1')""")
    try {
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_set_t").df.get.as[Long].head() == 3L)
      // repoint the path — the reference's alter-properties semantics
      SqlDdl.executeSql(spark,
        s"ALTER TABLE ddl_set_t SET ('path' = '$d/p2')")
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_set_t").df.get.as[Long].head() == 5L)
      // connector is immutable; empty list rejects; bad format rejects
      val e1 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "ALTER TABLE ddl_set_t SET ('connector' = 'kafka')")
      }
      assert(e1.getMessage.contains("immutable"))
      val e2 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "ALTER TABLE ddl_set_t SET ('format' = 'xml')")
      }
      assert(e2.getMessage.contains("unsupported format"))
      // schema is intact after the re-registrations
      val cols = SqlDdl.executeSql(spark, "DESCRIBE ddl_set_t").df.get
        .collect().map(_.getString(0)).toSet
      assert(cols == Set("id"))
    } finally SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_set_t")
  }

  test("databases: CREATE/USE/SHOW/DESCRIBE/DROP with RESTRICT and CASCADE") {
    val d = tmp()
    try {
      SqlDdl.executeSql(spark,
        "CREATE DATABASE ddl_db1 COMMENT 'staging' WITH ('owner' = 'etl')")
      // IF NOT EXISTS is idempotent; a bare re-create rejects
      SqlDdl.executeSql(spark, "CREATE DATABASE IF NOT EXISTS ddl_db1")
      val dup = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "CREATE DATABASE ddl_db1")
      }
      assert(dup.getMessage.contains("already exists"))
      val dbs = SqlDdl.executeSql(spark, "SHOW DATABASES").df.get
        .as[String].collect().toSet
      assert(dbs.contains("default_database") && dbs.contains("ddl_db1"))
      val info = SqlDdl.executeSql(spark, "DESCRIBE DATABASE ddl_db1").df.get
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(info("owner") == "etl")
      // a table created under USE ddl_db1 belongs to it
      SqlDdl.executeSql(spark, "USE ddl_db1")
      spark.range(3).write.parquet(d + "/owned")
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_db_owned (id BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/owned')""")
      SqlDdl.executeSql(spark, "USE default_database")
      // RESTRICT (default) refuses a non-empty database
      val full = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "DROP DATABASE ddl_db1")
      }
      assert(full.getMessage.contains("CASCADE"))
      assert(full.getMessage.contains("ddl_db_owned"))
      // CASCADE drops the owned table and its query surface
      SqlDdl.executeSql(spark, "DROP DATABASE ddl_db1 CASCADE")
      val gone = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "INSERT INTO ddl_db_owned SELECT 1 AS id")
      }
      assert(gone.getMessage.contains("unknown table"))
      // unknown database: USE and bare DROP reject; IF EXISTS is silent
      intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "USE ddl_db1")
      }
      intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "DROP DATABASE ddl_db1")
      }
      SqlDdl.executeSql(spark, "DROP DATABASE IF EXISTS ddl_db1")
      // default_database cannot be dropped
      val dflt = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "DROP DATABASE default_database")
      }
      assert(dflt.getMessage.contains("default"))
    } finally {
      SqlDdl.executeSql(spark, "USE default_database")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_db_owned")
      SqlDdl.executeSql(spark, "DROP DATABASE IF EXISTS ddl_db1")
    }
  }

  test("catalogs: CREATE/USE/SHOW/DESCRIBE/DROP generic_in_memory") {
    val d = tmp()
    try {
      assert(SqlDdl.executeSql(spark, "SHOW CATALOGS").df.get
        .as[String].collect().toSeq.contains("default_catalog"))
      SqlDdl.executeSql(spark, "USE CATALOG default_catalog")
      val e = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "USE CATALOG hive")
      }
      assert(e.getMessage.contains("unknown catalog"))
      // only generic_in_memory; type required
      val badType = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "CREATE CATALOG ddl_hc WITH ('type'='hive')")
      }
      assert(badType.getMessage.contains("generic_in_memory"))
      intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "CREATE CATALOG ddl_nt")
      }
      // lifecycle: create → use → its own database space
      SqlDdl.executeSql(spark, """CREATE CATALOG ddl_cat WITH
        ('type' = 'generic_in_memory', 'default-database' = 'base')""")
      val info = SqlDdl.executeSql(spark, "DESCRIBE CATALOG ddl_cat").df.get
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(info("default database") == "base")
      SqlDdl.executeSql(spark, "USE CATALOG ddl_cat")
      val dbs = SqlDdl.executeSql(spark, "SHOW DATABASES").df.get
        .as[String].collect().toSeq
      assert(dbs == Seq("base")) // NOT default_catalog's databases
      SqlDdl.executeSql(spark, "CREATE DATABASE staging")
      spark.range(2).toDF("id").write.parquet(d + "/t")
      SqlDdl.executeSql(spark, "USE staging")
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_cat_t (id BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/t')""")
      // the current catalog and a table-owning catalog are undroppable
      val cur = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "DROP CATALOG ddl_cat")
      }
      assert(cur.getMessage.contains("current"))
      SqlDdl.executeSql(spark, "USE CATALOG default_catalog")
      assert(SqlDdl.executeSql(spark, "SHOW DATABASES").df.get
        .as[String].collect().toSeq.contains("default_database"))
      val owns = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "DROP CATALOG ddl_cat")
      }
      assert(owns.getMessage.contains("ddl_cat_t"))
      SqlDdl.executeSql(spark, "DROP TABLE ddl_cat_t")
      SqlDdl.executeSql(spark, "DROP CATALOG ddl_cat")
      intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "USE CATALOG ddl_cat")
      }
      SqlDdl.executeSql(spark, "DROP CATALOG IF EXISTS ddl_cat")
      val dflt = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "DROP CATALOG default_catalog")
      }
      assert(dflt.getMessage.contains("default_catalog"))
    } finally {
      SqlDdl.executeSql(spark, "USE CATALOG default_catalog")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_cat_t")
      SqlDdl.executeSql(spark, "DROP CATALOG IF EXISTS ddl_cat")
    }
  }

  test("SHOW VIEWS lists changelog and plain views, not tables") {
    val d = tmp()
    try {
      spark.range(2).write.parquet(d + "/t")
      SqlDdl.executeAll(spark, s"""
        CREATE TABLE ddl_sv_t (id BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/t');
        CREATE VIEW ddl_sv_v AS SELECT id * 2 AS dbl FROM ddl_sv_t""")
      val views = SqlDdl.executeSql(spark, "SHOW VIEWS").df.get
        .as[String].collect().toSet
      assert(views.contains("ddl_sv_v"))
      assert(!views.contains("ddl_sv_t"))
    } finally {
      SqlDdl.executeSql(spark, "DROP VIEW IF EXISTS ddl_sv_v")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_sv_t")
    }
  }

  test("CREATE FUNCTION registers a reflective eval; SHOW/DROP bookkeep") {
    try {
      SqlDdl.executeSql(spark,
        "CREATE FUNCTION ddl_scale_fn AS 'graft.SqlDdlSpecScaleFn'")
      // SQL-invokable immediately, distributed (runs in tasks)
      val got = SqlDdl.executeSql(spark,
        "SELECT ddl_scale_fn(id, 10) AS v FROM range(4) ORDER BY v").df.get
        .as[Long].collect().toSeq
      assert(got == Seq(0L, 10L, 20L, 30L))
      val fns = SqlDdl.executeSql(spark, "SHOW FUNCTIONS").df.get
        .as[String].collect().toSet
      assert(fns.contains("ddl_scale_fn"))
      // duplicate rejects; IF NOT EXISTS is silent
      val dup = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "CREATE FUNCTION ddl_scale_fn AS 'graft.SqlDdlSpecScaleFn'")
      }
      assert(dup.getMessage.contains("already exists"))
      SqlDdl.executeSql(spark,
        "CREATE FUNCTION IF NOT EXISTS ddl_scale_fn AS 'graft.SqlDdlSpecScaleFn'")
      // LANGUAGE JAVA/SCALA accepted, PYTHON rejected
      val py = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "CREATE FUNCTION ddl_py AS 'x.Y' LANGUAGE PYTHON")
      }
      assert(py.getMessage.contains("LANGUAGE"))
      // missing class and missing eval reject loudly
      val nc = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "CREATE FUNCTION ddl_none AS 'graft.DoesNotExist'")
      }
      assert(nc.getMessage.contains("not found"))
      val ne = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "CREATE FUNCTION ddl_noeval AS 'graft.SqlDdlSpecNoEval'")
      }
      assert(ne.getMessage.contains("eval"))
    } finally {
      SqlDdl.executeSql(spark, "DROP FUNCTION IF EXISTS ddl_scale_fn")
    }
    // after DROP the registration is gone from the bookkeeping
    val e = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "DROP FUNCTION ddl_scale_fn")
    }
    assert(e.getMessage.contains("unknown function"))
  }

  test("ALTER VIEW RENAME/AS re-derive the registration; tables reject") {
    val d = tmp()
    try {
      spark.range(4).withColumn("v", col("id") * 10)
        .write.parquet(d + "/t")
      SqlDdl.executeAll(spark, s"""
        CREATE TABLE ddl_av_t (id BIGINT, v BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/t');
        CREATE VIEW ddl_av_v AS SELECT id, v FROM ddl_av_t WHERE id >= 2""")
      SqlDdl.executeSql(spark, "ALTER VIEW ddl_av_v RENAME TO ddl_av_v2")
      // new name answers, old name is gone everywhere
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_av_v2").df.get.as[Long].head() == 2L)
      assert(!spark.catalog.tableExists("ddl_av_v"))
      intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "ALTER VIEW ddl_av_v RENAME TO ddl_av_v3")
      }
      // AS replaces the body; a bad body leaves the old view intact
      SqlDdl.executeSql(spark,
        "ALTER VIEW ddl_av_v2 AS SELECT id FROM ddl_av_t WHERE id = 0")
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_av_v2").df.get.as[Long].head() == 1L)
      intercept[Exception] {
        SqlDdl.executeSql(spark,
          "ALTER VIEW ddl_av_v2 AS SELECT nope FROM ddl_av_t")
      }
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_av_v2").df.get.as[Long].head() == 1L)
      // a TABLE name rejects with the ALTER TABLE pointer
      val et = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "ALTER VIEW ddl_av_t RENAME TO x")
      }
      assert(et.getMessage.contains("TABLE"))
    } finally {
      SqlDdl.executeSql(spark, "DROP VIEW IF EXISTS ddl_av_v")
      SqlDdl.executeSql(spark, "DROP VIEW IF EXISTS ddl_av_v2")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_av_t")
    }
  }

  test("ALTER DATABASE merges properties; ALTER FUNCTION repoints") {
    try {
      SqlDdl.executeSql(spark,
        "CREATE DATABASE ddl_adb WITH ('owner' = 'a', 'tier' = 'bronze')")
      SqlDdl.executeSql(spark,
        "ALTER DATABASE ddl_adb SET ('tier' = 'gold', 'extra' = 'x')")
      val info = SqlDdl.executeSql(spark, "DESCRIBE DATABASE ddl_adb").df.get
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(info("tier") == "gold" && info("owner") == "a" &&
             info("extra") == "x")
      intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "ALTER DATABASE ddl_nope SET ('a' = 'b')")
      }
      // ALTER FUNCTION repoints an existing registration
      SqlDdl.executeSql(spark,
        "CREATE FUNCTION ddl_af AS 'graft.SqlDdlSpecScaleFn'")
      assert(SqlDdl.executeSql(spark, "SELECT ddl_af(3, 7) AS v").df.get
        .as[Long].head() == 21L)
      SqlDdl.executeSql(spark,
        "ALTER FUNCTION ddl_af AS 'graft.SqlDdlSpecAddFn'")
      assert(SqlDdl.executeSql(spark, "SELECT ddl_af(3, 7) AS v").df.get
        .as[Long].head() == 10L)
      intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "ALTER FUNCTION ddl_missing AS 'graft.SqlDdlSpecAddFn'")
      }
      SqlDdl.executeSql(spark,
        "ALTER FUNCTION IF EXISTS ddl_missing AS 'graft.SqlDdlSpecAddFn'")
    } finally {
      SqlDdl.executeSql(spark, "DROP FUNCTION IF EXISTS ddl_af")
      SqlDdl.executeSql(spark, "DROP DATABASE IF EXISTS ddl_adb")
    }
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT flips upsert semantics with guards") {
    val d = tmp()
    try {
      // keyless empty table → ADD CONSTRAINT → upsert merges by key
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_ac (id BIGINT, v BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/ac')""")
      SqlDdl.executeSql(spark,
        "ALTER TABLE ddl_ac ADD CONSTRAINT pk_ac PRIMARY KEY (id) NOT ENFORCED")
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_ac VALUES (1, 10), (2, 20)").await()
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_ac VALUES (1, 11)").await()
      val rows = SqlDdl.executeSql(spark,
        "SELECT id, v FROM ddl_ac ORDER BY id").df.get
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((1L, 11L), (2L, 20L)))
      // a second key rejects; DROP CONSTRAINT by wrong name rejects;
      // with upsert files on disk the drop itself rejects
      val dup = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "ALTER TABLE ddl_ac ADD PRIMARY KEY (v) NOT ENFORCED")
      }
      assert(dup.getMessage.contains("already has a PRIMARY KEY"))
      val wrong = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "ALTER TABLE ddl_ac DROP CONSTRAINT nope")
      }
      assert(wrong.getMessage.contains("pk_ac"))
      val layout = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "ALTER TABLE ddl_ac DROP CONSTRAINT pk_ac")
      }
      assert(layout.getMessage.contains("bucketed layout"))
      // ADD over pre-existing plain files rejects; DROP on a still-empty
      // keyed table succeeds and appends stop merging
      spark.range(3).select(col("id"), col("id").as("v"))
        .write.parquet(d + "/plain")
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_ac2 (id BIGINT, v BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/plain')""")
      val mix = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "ALTER TABLE ddl_ac2 ADD CONSTRAINT p2 PRIMARY KEY (id) NOT ENFORCED")
      }
      assert(mix.getMessage.contains("plain data files"))
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_ac3 (id BIGINT, v BIGINT,
          CONSTRAINT pk3 PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector' = 'filesystem', 'path' = '$d/ac3')""")
      SqlDdl.executeSql(spark, "ALTER TABLE ddl_ac3 DROP CONSTRAINT pk3")
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_ac3 VALUES (5, 1)").await()
      SqlDdl.executeSql(spark,
        "INSERT INTO ddl_ac3 VALUES (5, 2)").await()
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_ac3").df.get.as[Long].head() == 2L)
      // an unnamed key: DROP CONSTRAINT explains there is no name
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_ac4 (id BIGINT, v BIGINT,
          PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector' = 'filesystem', 'path' = '$d/ac4')""")
      val unnamed = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "ALTER TABLE ddl_ac4 DROP CONSTRAINT x")
      }
      assert(unnamed.getMessage.contains("without a CONSTRAINT name"))
    } finally {
      Seq("ddl_ac", "ddl_ac2", "ddl_ac3", "ddl_ac4").foreach(t =>
        SqlDdl.executeSql(spark, s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("OPTIONS hint merges dynamic table options under the enable flag") {
    val d = tmp()
    try {
      spark.range(5).select(col("id"), (col("id") * 2).as("v"))
        .write.parquet(d + "/a")
      spark.range(9).select(col("id"), (col("id") * 3).as("v"))
        .write.parquet(d + "/b")
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_hint_t (id BIGINT, v BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/a')""")
      // flag off (the default): the reference's exact error shape
      val off = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "SELECT count(*) AS n FROM ddl_hint_t /*+ OPTIONS('path' = '" +
          d + "/b') */")
      }
      assert(off.getMessage.contains(
        "table.dynamic-table-options.enabled"))
      SqlDdl.executeSql(spark,
        "SET 'table.dynamic-table-options.enabled' = 'true'")
      // hinted scan reads the overridden path; the base is untouched
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_hint_t /*+ OPTIONS('path' = '" +
        d + "/b') */").df.get.as[Long].head() == 9L)
      assert(SqlDdl.executeSql(spark,
        "SELECT count(*) AS n FROM ddl_hint_t").df.get
        .as[Long].head() == 5L)
      // a second hinted read reuses the registration (same options)
      assert(SqlDdl.executeSql(spark,
        "SELECT sum(v) AS s FROM ddl_hint_t /*+ OPTIONS('path' = '" +
        d + "/b') */").df.get.as[Long].head() == 108L)
      // hint aliases stay out of SHOW TABLES
      val listed = SqlDdl.executeSql(spark, "SHOW TABLES").df.get
        .collect().map(_.getString(0))
      assert(!listed.exists(_.contains("__opt")))
      // non-DDL views and sink-side hints reject loudly
      spark.range(1).toDF("id").createOrReplaceTempView("ddl_hint_tv")
      val nt = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "SELECT 1 AS x FROM ddl_hint_tv /*+ OPTIONS('a' = 'b') */")
      }
      assert(nt.getMessage.contains("CREATE TABLE"))
      val sink = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "INSERT INTO ddl_hint_t /*+ OPTIONS('a' = 'b') */ " +
          "SELECT 1 AS id, 2 AS v")
      }
      assert(sink.getMessage.contains("INSERT target"))
      // a literal containing the hint shape is untouched
      assert(SqlDdl.executeSql(spark,
        "SELECT '/*+ OPTIONS(''a''=''b'') */' AS s").df.get
        .as[String].head().contains("OPTIONS"))
    } finally {
      SqlDdl.executeSql(spark, "RESET 'table.dynamic-table-options.enabled'")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_hint_t")
      spark.catalog.dropTempView("ddl_hint_tv")
    }
  }

  test("duplicate names reject: re-CREATE, view/table clashes, computed PK") {
    val d = tmp()
    try {
      spark.range(2).toDF("id").write.parquet(d + "/t")
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_dup (id BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/t')""")
      val re = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, s"""
          CREATE TABLE ddl_dup (id BIGINT)
          WITH ('connector' = 'filesystem', 'path' = '$d/t2')""")
      }
      assert(re.getMessage.contains("already exists"))
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE IF NOT EXISTS ddl_dup (id BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '$d/t3')""") // silent
      // view/table name clashes reject both ways
      val vt = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "CREATE VIEW ddl_dup AS SELECT 1 AS x")
      }
      assert(vt.getMessage.contains("TABLE"))
      SqlDdl.executeSql(spark, "CREATE VIEW ddl_dup_v AS SELECT 1 AS x")
      val vv = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "CREATE VIEW ddl_dup_v AS SELECT 2 AS x")
      }
      assert(vv.getMessage.contains("OR REPLACE"))
      SqlDdl.executeSql(spark,
        "CREATE OR REPLACE VIEW ddl_dup_v AS SELECT 2 AS x")
      assert(SqlDdl.executeSql(spark, "SELECT x FROM ddl_dup_v").df.get
        .as[Int].head() == 2)
      val tv = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, s"""
          CREATE TABLE ddl_dup_v (id BIGINT)
          WITH ('connector' = 'filesystem', 'path' = '$d/t4')""")
      }
      assert(tv.getMessage.contains("VIEW"))
      // a computed-column PRIMARY KEY rejects at CREATE (physical only)
      val cpk = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, s"""
          CREATE TABLE ddl_cpk (a BIGINT, k AS a + 1,
            PRIMARY KEY (k) NOT ENFORCED)
          WITH ('connector' = 'filesystem', 'path' = '$d/cpk')""")
      }
      assert(cpk.getMessage.contains("physical"))
    } finally {
      SqlDdl.executeSql(spark, "DROP VIEW IF EXISTS ddl_dup_v")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_dup")
    }
  }

  test("constraint names follow the table: dropped on DROP, moved on RENAME") {
    val d = tmp()
    try {
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_pkn (id BIGINT,
          CONSTRAINT pk_old PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector' = 'filesystem', 'path' = '$d/a')""")
      // DROP + re-CREATE with an unnamed key: the old name must be gone
      SqlDdl.executeSql(spark, "DROP TABLE ddl_pkn")
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_pkn (id BIGINT, PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector' = 'filesystem', 'path' = '$d/b')""")
      val stale = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, "ALTER TABLE ddl_pkn DROP CONSTRAINT pk_old")
      }
      assert(stale.getMessage.contains("without a CONSTRAINT name"))
      SqlDdl.executeSql(spark, "DROP TABLE ddl_pkn")
      // RENAME carries the name along
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE ddl_pkn (id BIGINT,
          CONSTRAINT pk_n PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector' = 'filesystem', 'path' = '$d/c')""")
      SqlDdl.executeSql(spark, "ALTER TABLE ddl_pkn RENAME TO ddl_pkn2")
      SqlDdl.executeSql(spark, "ALTER TABLE ddl_pkn2 DROP CONSTRAINT pk_n")
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_pkn")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_pkn2")
    }
  }

  test("deep partition layouts register (no silent fixed-depth cutoff)") {
    val d = tmp()
    // data six directory levels down — past the old probe depth of 4
    spark.range(3).toDF("id").write
      .parquet(d + "/a/b/c/d/e/f")
    SqlDdl.executeSql(spark, s"""
      CREATE TABLE ddl_deep (id BIGINT)
      WITH ('connector' = 'filesystem', 'path' = '$d',
            'recursiveFileLookup' = 'true')""")
    try assert(SqlDdl.executeSql(spark,
      "SELECT count(*) AS n FROM ddl_deep").df.get.as[Long].head() == 3L)
    finally SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS ddl_deep")
  }

  test("DESCRIBE CATALOG and named PRIMARY KEY round out the dispatch") {
    val info = SqlDdl.executeSql(spark,
      "DESCRIBE CATALOG default_catalog").df.get
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(info("catalog name") == "default_catalog")
    intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, "DESCRIBE CATALOG hive")
    }
  }
}

/** ScalarFunction-contract test class: public no-arg constructor +
  * public eval, discovered reflectively by CREATE FUNCTION. */
class SqlDdlSpecAddFn {
  def eval(x: java.lang.Long, y: java.lang.Long): java.lang.Long =
    if (x == null || y == null) null else x + y
}

/** ScalarFunction-contract test class: public no-arg constructor +
  * public eval, discovered reflectively by CREATE FUNCTION. */
class SqlDdlSpecScaleFn {
  def eval(x: java.lang.Long, factor: java.lang.Long): java.lang.Long =
    if (x == null || factor == null) null else x * factor
}

/** Negative case: no eval method. */
class SqlDdlSpecNoEval {
  def evaluate(x: java.lang.Long): java.lang.Long = x
}
