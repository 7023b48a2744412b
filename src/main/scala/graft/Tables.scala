package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loader for the driver testdata star schema (TESTDATA.md): TPC-H-ish
 * tables plus `events` (stream fixture), `documents` and `embeddings`
 * (LLM-pipeline fixtures).
 *
 * Scale notes: reads are plain parquet scans so Catalyst's vectorized
 * reader, predicate pushdown and column pruning all apply. At 100 TB the
 * same code path works — partition count is governed by
 * `spark.sql.files.maxPartitionBytes`, not by anything we do here.
 *
 * The reference models these as `ScanTableSource`s with pushdown
 * abilities (SURVEY §2.1, T-COMMON/connector/source/ScanTableSource.java);
 * Spark's DataSource V2 parquet source is the 1:1 analogue.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is nanosecond-precision in parquet; Spark reads INT64
    // TIMESTAMP(NANOS) only as LongType (legacy flag) or µs — normalize to
    // a µs timestamp at ingest (SURVEY §7.4.7).
    if (name == "events") normalizeEventTs(df) else df
  }

  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integer division (IntegralDivide): `/` on longs is double division
        // and ns epochs (~1.7e18) exceed 2^53, which would corrupt the µs.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df // already a timestamp type
    }

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
