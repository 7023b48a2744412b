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
    name match {
      case "events" => normalizeEventTs(df)
      case "embeddings" => normalizeEmbedding(df)
      case _ => df
    }
  }

  /**
   * Normalize `events.ts` to a µs-precision `TimestampType` column
   * regardless of which of the three plausible parquet encodings the
   * fixture generator emitted:
   *   - INT64 TIMESTAMP(NANOS) read as LongType under
   *     `spark.sql.legacy.parquet.nanosAsLong` → integer-divide to µs;
   *   - plain `timestamp[us]` (no TZ annotation) read as TIMESTAMP_NTZ →
   *     cast to TimestampType (session TZ is pinned UTC in GraftSession,
   *     so the cast is epoch-preserving and bit-compatible with the
   *     DuckDB oracle, which treats TIMESTAMP as naive);
   *   - `timestamp[us, UTC]` read as TimestampType → pass through.
   */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integer division (IntegralDivide): `/` on longs is double division
        // and ns epochs (~1.7e18) exceed 2^53, which would corrupt the µs.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already µs TimestampType
    }

  /**
   * Guard `embeddings.embedding`'s element type at ingest (the round-8
   * postmortem's lesson generalized: ingest owns fixture-encoding
   * drift). A silent double→float cast here would be WORSE than the
   * drift itself — the DuckDB oracle reads the raw fixture, so lossy
   * rounding on only the Spark side would break vector-oracle parity
   * subtly. Instead: float32 (the canonical encoding) passes through;
   * anything else fails LOUDLY at ingest with a message naming the
   * decision that has to be made consciously (widen operators to
   * double, or re-point the oracle at cast values).
   */
  private[graft] def normalizeEmbedding(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case other => throw new IllegalStateException(
        s"fixture drift: embeddings.embedding is $other (expected " +
          "array<float>). Do NOT silently cast — the DuckDB oracle " +
          "computes on the raw fixture values; decide the cast policy " +
          "on both sides together.")
    }
  }

  /**
   * Canonical epoch-µs projection for a normalized event-time column.
   * All operator code converts timestamps to epoch micros through this
   * helper so a future fixture-encoding change is a one-line fix here
   * rather than a sweep over every call site.
   */
  def tsMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Epoch-ms sibling of [[tsMicros]] (the watermark unit for
    * flatMapGroupsWithState event times). floor of the double division
    * is exact here: epoch-µs < 2^53, so the quotient's error (~2e-4 at
    * this magnitude) can never move it across an integer boundary. */
  def tsMillis(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(tsMicros(c) / lit(1000)).cast("long")

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
