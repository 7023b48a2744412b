package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SqlDdl

/**
 * CDC ingestion formats (CdcFormats + the SqlDdl 'format' hook): a
 * debezium-json / canal-json envelope log decodes into a CHANGELOG
 * view consumed end-to-end by the changelog SQL routes and the
 * PRIMARY KEY upsert sink — the reference's flink-json changelog
 * formats (DebeziumJsonDeserializationSchema /
 * CanalJsonDeserializationSchema op mappings, incl. canal's partial
 * `old` row merge).
 */
class CdcFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_cdc_spec").toString

  private def writeLog(dir: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "log.json"), lines.asJava)
  }

  test("debezium-json table decodes c/u/d into a changelog; aggregates materialize") {
    val d = tmp()
    writeLog(d + "/log", Seq(
      """{"before": null, "after": {"id": 1, "v": 10.0}, "op": "c"}""",
      """{"before": null, "after": {"id": 2, "v": 20.0}, "op": "c"}""",
      """{"before": null, "after": {"id": 3, "v": 30.0}, "op": "r"}""",
      """{"before": {"id": 1, "v": 10.0}, "after": {"id": 1, "v": 11.0}, "op": "u"}""",
      """{"before": {"id": 2, "v": 20.0}, "after": null, "op": "d"}"""))
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE cdc_dbz (id BIGINT, v DOUBLE,
        PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/log',
            'format' = 'debezium-json');
      CREATE TABLE cdc_dbz_sink (g BIGINT, s DOUBLE, n BIGINT,
        PRIMARY KEY (g) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/sink')""")
    try {
      // live rows after the log: id 1 → 11.0 (updated), id 2 deleted,
      // id 3 → 30.0 (snapshot read) → group id%2: g1 = {11, 30}, g0 = ∅
      SqlDdl.executeSql(spark, """
        INSERT INTO cdc_dbz_sink
        SELECT id % 2 AS g, SUM(v) AS s, COUNT(*) AS n
        FROM cdc_dbz GROUP BY id % 2""").await()
      val live = SqlDdl.executeSql(spark,
        "SELECT g, s, n FROM cdc_dbz_sink").df.get
        .as[(Long, Double, Long)].collect().toSet
      assert(live == Set((1L, 41.0, 2L)))
      // read-only: INSERT INTO the CDC table rejects
      val e = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark,
          "INSERT INTO cdc_dbz SELECT 9 AS id, 9.0 AS v")
      }
      assert(e.getMessage.contains("read-only"))
      // WATERMARK on a CDC table rejects
      val e2 = intercept[IllegalArgumentException] {
        SqlDdl.executeSql(spark, s"""
          CREATE TABLE cdc_bad (id BIGINT, ts TIMESTAMP,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
          WITH ('connector' = 'filesystem', 'path' = '$d/log',
                'format' = 'debezium-json')""")
      }
      assert(e2.getMessage.contains("CHANGELOG"))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_dbz")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_dbz_sink")
    }
    // DROP cleaned the changelog registration: the name no longer
    // routes as a view
    val e3 = intercept[Exception] {
      graft.operators.SqlFrontend.sql(spark,
        "SELECT g2, SUM(v) AS s FROM cdc_dbz GROUP BY g2").collect()
    }
    assert(e3 != null)
  }

  test("canal-json merges partial old rows into the -U before-image") {
    val d = tmp()
    writeLog(d + "/log", Seq(
      """{"data": [{"id": 1, "v": 10.0}, {"id": 2, "v": 20.0}], "old": null, "type": "INSERT"}""",
      // canal's `old` carries ONLY the changed field — the before-image
      // must merge old.v over data's id
      """{"data": [{"id": 1, "v": 15.0}], "old": [{"v": 10.0}], "type": "UPDATE"}""",
      """{"data": [{"id": 2, "v": 20.0}], "old": null, "type": "DELETE"}"""))
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE cdc_cnl (id BIGINT, v DOUBLE,
        PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/log',
            'format' = 'canal-json');
      CREATE TABLE cdc_cnl_sink (g BIGINT, s DOUBLE, n BIGINT,
        PRIMARY KEY (g) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/sink')""")
    try {
      // live: id 1 → 15.0, id 2 deleted → g1 = {15}, g0 = ∅. A wrong
      // merge (null id in the -U) would leave g-null residue or a
      // wrong sum.
      SqlDdl.executeSql(spark, """
        INSERT INTO cdc_cnl_sink
        SELECT id % 2 AS g, SUM(v) AS s, COUNT(*) AS n
        FROM cdc_cnl GROUP BY id % 2""").await()
      val live = SqlDdl.executeSql(spark,
        "SELECT g, s, n FROM cdc_cnl_sink").df.get
        .as[(Long, Double, Long)].collect().toSet
      assert(live == Set((1L, 15.0, 1L)))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_cnl")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_cnl_sink")
    }
  }

  test("debezium-json.schema-include unwraps the Kafka Connect payload envelope") {
    val d = tmp()
    // value.converter.schemas.enable wraps every envelope as
    // {"schema": …, "payload": {before, after, op}} — the decode reads
    // payload and never materializes the schema subtree
    writeLog(d + "/log", Seq(
      """{"schema": {"type": "struct"}, "payload": {"before": null, "after": {"id": 1, "v": 10.0}, "op": "c"}}""",
      """{"schema": {"type": "struct"}, "payload": {"before": null, "after": {"id": 2, "v": 20.0}, "op": "c"}}""",
      """{"schema": {"type": "struct"}, "payload": {"before": {"id": 1, "v": 10.0}, "after": {"id": 1, "v": 12.0}, "op": "u"}}""",
      """{"schema": {"type": "struct"}, "payload": {"before": {"id": 2, "v": 20.0}, "after": null, "op": "d"}}"""))
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE cdc_si (id BIGINT, v DOUBLE,
        PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/log',
            'format' = 'debezium-json',
            'debezium-json.schema-include' = 'true');
      CREATE TABLE cdc_si_sink (g BIGINT, s DOUBLE, n BIGINT,
        PRIMARY KEY (g) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/sink')""")
    try {
      SqlDdl.executeSql(spark, """
        INSERT INTO cdc_si_sink
        SELECT id % 2 AS g, SUM(v) AS s, COUNT(*) AS n
        FROM cdc_si GROUP BY id % 2""").await()
      val live = SqlDdl.executeSql(spark,
        "SELECT g, s, n FROM cdc_si_sink").df.get
        .as[(Long, Double, Long)].collect().toSet
      assert(live == Set((1L, 12.0, 1L)))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_si")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_si_sink")
    }
    // schema-include is a debezium option — canal rejects it
    val e = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE cdc_si_bad (id BIGINT, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '$d/log',
              'format' = 'canal-json',
              'debezium-json.schema-include' = 'true')""")
    }
    assert(e.getMessage.contains("does not apply"))
    // and a plain batch format rejects every CDC-scoped option
    val e2 = intercept[IllegalArgumentException] {
      SqlDdl.executeSql(spark, s"""
        CREATE TABLE cdc_si_bad2 (id BIGINT, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '$d/log',
              'format' = 'json',
              'debezium-json.ignore-parse-errors' = 'true')""")
    }
    assert(e2.getMessage.contains("apply only to CDC formats"))
  }

  test("ignore-parse-errors skips undecodable envelopes; strict mode raises") {
    val d = tmp()
    val lines = Seq(
      """{"before": null, "after": {"id": 1, "v": 10.0}, "op": "c"}""",
      """this line is not json at all""",
      """{"before": null, "after": {"id": 2, "v": 20.0}, "op": "x"}""",
      // known op with a missing required image — skip the WHOLE
      // message (the reference's catch wraps the full deserialize)
      """{"before": null, "after": {"id": 9, "v": 90.0}, "op": "u"}""",
      """{"before": null, "after": {"id": 3, "v": 30.0}, "op": "c"}""")
    writeLog(d + "/lenient", lines)
    writeLog(d + "/strict", lines)
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE cdc_len (id BIGINT, v DOUBLE,
        PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/lenient',
            'format' = 'debezium-json',
            'debezium-json.ignore-parse-errors' = 'true');
      CREATE TABLE cdc_len_sink (g BIGINT, s DOUBLE, n BIGINT,
        PRIMARY KEY (g) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/sink')""")
    try {
      SqlDdl.executeSql(spark, """
        INSERT INTO cdc_len_sink
        SELECT id % 2 AS g, SUM(v) AS s, COUNT(*) AS n
        FROM cdc_len GROUP BY id % 2""").await()
      val live = SqlDdl.executeSql(spark,
        "SELECT g, s, n FROM cdc_len_sink").df.get
        .as[(Long, Double, Long)].collect().toSet
      // only ids 1 and 3 decode; the corrupt line, the unknown op and
      // the image-less u are skipped whole
      assert(live == Set((1L, 40.0, 2L), (0L, 0.0, 0L)) ||
             live == Set((1L, 40.0, 2L)))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_len")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_len_sink")
    }
    // strict (default): the same log fails the query loudly
    SqlDdl.executeAll(spark, s"""
      CREATE TABLE cdc_str (id BIGINT, v DOUBLE,
        PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/strict',
            'format' = 'debezium-json');
      CREATE TABLE cdc_str_sink (g BIGINT, s DOUBLE,
        PRIMARY KEY (g) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$d/sink2')""")
    try {
      val e = intercept[Exception] {
        SqlDdl.executeSql(spark, """
          INSERT INTO cdc_str_sink
          SELECT id % 2 AS g, SUM(v) AS s
          FROM cdc_str GROUP BY id % 2""").await()
      }
      def msgs(t: Throwable): String = if (t == null) ""
        else Option(t.getMessage).getOrElse("") + "\n" + msgs(t.getCause)
      assert(msgs(e).contains("debezium-json"))
    } finally {
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_str")
      SqlDdl.executeSql(spark, "DROP TABLE IF EXISTS cdc_str_sink")
    }
  }
}
