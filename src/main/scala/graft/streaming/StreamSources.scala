package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Stream source abstraction (SURVEY §2.1): the reference's connector
 * surface — most importantly the fork's Kinesis EFO consumer
 * (flink-connector-kinesis-v2/.../KinesisDataFetcher.java:79-195: shard
 * discovery, per-shard ordered read, sequence-number checkpoints,
 * per-shard watermarks, global watermark alignment) — reduced to the
 * capabilities it provides, each of which Structured Streaming supplies
 * natively:
 *
 *  - per-partition ordered read → every SS source preserves partition order;
 *  - offset checkpointing       → SS commit log (exactly-once);
 *  - per-partition watermarking → `withWatermark` (bounded disorder);
 *  - global watermark alignment → SS watermark is already computed
 *    globally per micro-batch (JobManagerWatermarkTracker ≈ free).
 *
 * No Kinesis endpoint exists in this offline environment, so the
 * implementations are file / rate / kafka-shaped; a Kinesis DataSource V2
 * would plug in behind the same trait.
 */
trait StreamSource {
  /** Open the stream as an unbounded DataFrame. */
  def open(spark: SparkSession): DataFrame
}

/** Replays a parquet directory as a file stream (one file per batch). */
final case class FileReplaySource(
    path: String, schema: StructType, maxFilesPerTrigger: Int = 1)
  extends StreamSource {
  def open(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
}

/** Synthetic rate source (smoke tests / load generation). */
final case class RateSource(rowsPerSecond: Int) extends StreamSource {
  def open(spark: SparkSession): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
}

/** Kafka-shaped source (not reachable offline; shape parity only). */
final case class KafkaSource(bootstrap: String, topic: String)
  extends StreamSource {
  def open(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic).load()
}
