package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Fixture-encoding drift guard (round-8 postmortem): the driver's
 * testdata generator has emitted `events.ts` as INT64 TIMESTAMP(NANOS),
 * plain `timestamp[us]` (TIMESTAMP_NTZ under Spark), and could plausibly
 * emit `timestamp[us, UTC]` (TimestampType). `Tables.normalizeEventTs`
 * must map all three to the identical µs TimestampType column so the 18
 * downstream epoch-µs call sites never see an analysis error again.
 */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // A tiny deterministic events slice: (event_id, epoch-µs).
  private val rowsUs: Seq[(Long, Long)] = Seq(
    (1L, 1700000000000000L),
    (2L, 1700000000123456L),
    (3L, 1700003600999999L))

  private def writeAndRead(dir: String, writeTs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = rowsUs.toDF("event_id", "us")
    writeTs(base).select("event_id", "ts").write.mode("overwrite").parquet(dir)
    Tables.normalizeEventTs(spark.read.parquet(dir))
  }

  private def epochUs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
    assert(df.schema("ts").dataType == TimestampType,
      s"normalizeEventTs must yield TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("normalizeEventTs: int64-ns, µs-NTZ and µs-TZ encodings all normalize to the same µs TimestampType") {
    val root = Files.createTempDirectory("tables-enc").toString

    // Encoding 1: long nanos column named ts (what INT64 TIMESTAMP(NANOS)
    // reads as under spark.sql.legacy.parquet.nanosAsLong=true).
    val ns = writeAndRead(s"$root/ns",
      _.withColumn("ts", col("us") * lit(1000L)))

    // Encoding 2: µs TIMESTAMP_NTZ (today's fixture encoding).
    val ntz = writeAndRead(s"$root/ntz",
      _.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)))

    // Encoding 3: µs TimestampType with TZ annotation.
    val tz = writeAndRead(s"$root/tz",
      _.withColumn("ts", timestamp_micros(col("us"))))

    val expected = rowsUs.sortBy(_._1)
    assert(epochUs(ns) == expected)
    assert(epochUs(ntz) == expected)
    assert(epochUs(tz) == expected)
  }

  test("tsMicros helper is total over long-free timestamp variants") {
    val df = rowsUs.toDF("event_id", "us")
      .withColumn("t_tz", timestamp_micros(col("us")))
      .withColumn("t_ntz", timestamp_micros(col("us")).cast(TimestampNTZType))
    val out = df.select(
      Tables.tsMicros(col("t_tz")).as("a"),
      Tables.tsMicros(col("t_ntz")).as("b"),
      col("us")).as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, us) => assert(a == us && b == us) }
  }

  test("driver fixture loads with µs TimestampType ts end-to-end") {
    val ev = Tables.table(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(min(unix_micros(col("ts")))).head().getLong(0) > 0L)
  }

  test("normalizeEmbedding: float passes through, precision drift fails loudly") {
    // A silent double→float cast would break vector-oracle parity (the
    // DuckDB oracle reads the raw fixture), so drift must fail at ingest
    // with a message naming the decision — not surface as subtle numeric
    // mismatches deep in a gate.
    val dir = Files.createTempDirectory("tables-emb").toString
    Seq((1L, Seq(1.5, -2.25, 0.125)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/d")
    val err = intercept[IllegalStateException] {
      Tables.normalizeEmbedding(spark.read.parquet(s"$dir/d"))
    }
    assert(err.getMessage.contains("fixture drift"))
    val fixture = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    assert(fixture.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true))
  }
}
