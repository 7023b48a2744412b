package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/**
 * Streaming paths under the driver's ORACLE gate (SURVEY §2.9): each
 * query stages a test table into a directory, replays it through a real
 * Structured Streaming query in several micro-batches
 * (`maxFilesPerTrigger` — the deterministic stand-in for the
 * reference's unbounded sources, e.g.
 * flink-streaming-java/.../functions/source/ContinuousFileMonitoringFunction.java:62),
 * sinks to parquet, and returns the read-back result. The oracle is the
 * BATCH DUAL SQL — the point is that the unbounded execution of the
 * same logical query produces byte-identical results to the batch
 * engine, which is the reference's own Table-API batch/stream parity
 * contract.
 *
 * Determinism notes (why these shapes can sit under a hash-matching
 * gate): the windowed aggregate runs in Complete mode, so the final
 * micro-batch rewrites the full result — no watermark-timing dependence
 * and decimal sums are order-independent; the dedup emits only the
 * distinct key set (keep-first payloads would depend on arrival order);
 * the interval join is an INNER join, whose full match set emits
 * regardless of micro-batch boundaries (the reference's
 * TimeBoundedStreamJoin, flink-streaming-java/.../co/IntervalJoinOperator.java:71).
 * Watermarks are present (the streaming-plan requirement) but set far
 * beyond the data's horizon so no correctness-bearing state is evicted
 * mid-replay.
 *
 * At 100 TB the replay harness itself is test scaffolding, but the
 * streaming plans it runs are the production shapes: keyed state in the
 * agg/dedup/join operators shuffles on the group/join key exactly as
 * the batch dual does, and parquet-sink commit is per-micro-batch
 * atomic via the sink's _spark_metadata log.
 */
object ReplayQueries {

  private val dec = DecimalType(18, 2)

  /** Stage `df` as `n` parquet files under a fresh temp dir; return the
    * (input, output, checkpoint) directory triple. */
  private def stage(df: DataFrame, n: Int): (String, String, String) = {
    val root = Files.createTempDirectory("graft_replay").toString
    df.repartition(n).write.mode("overwrite").parquet(s"$root/in")
    (s"$root/in", s"$root/out", s"$root/ck")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling-window aggregate executed as a STREAM: 4 micro-batches
    // of file replay, Complete-mode state carried across batches, final
    // batch rewrites the full result (same columns as batch q25).
    "q178_stream_tumble" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
      val (in, out, ck) = stage(ev, 8)
      val agg = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2).parquet(in)
        .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(dec)).cast("double").as("sum_v"))
        .select(col("event_type"), unix_micros(col("w.start")).as("w_start"),
                col("n"), col("sum_v"))
      val q = agg.writeStream.outputMode("complete")
        .option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(out)
        }
        .start()
      q.processAllAvailable(); q.stop()
      s.read.parquet(out)
    }),

    // Exact dedup executed as a STREAM: `dropDuplicates` keyed state
    // spans micro-batches; emits the distinct digest set (batch dual:
    // SELECT DISTINCT md5(text)).
    "q179_stream_dedup" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val (in, out, ck) = stage(docs, 8)
      val dd = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2).parquet(in)
        .select(md5(col("text")).as("digest"))
        .dropDuplicates("digest")
      val q = dd.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .start()
      q.processAllAvailable(); q.stop()
      s.read.parquet(out)
    }),

    // Interval join executed as a STREAM-STREAM join: purchases x
    // clicks within (p_ts - 10 min, p_ts) per user, inner — the full
    // pair set emits whatever the micro-batch boundaries, then the
    // batch dual SQL must hash-match it.
    "q180_stream_interval_join" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
      val (in, out, ck) = stage(ev, 8)
      def src() = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2).parquet(in)
      val p = src().filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                col("ts").as("p_ts"))
        .withWatermark("p_ts", "3650 days")
      val c = src().filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
                col("ts").as("c_ts"))
        .withWatermark("c_ts", "3650 days")
      val j = p.join(c, col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("p_ts"))
        .select(col("p_id"), col("c_id"))
      val q = j.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .start()
      q.processAllAvailable(); q.stop()
      s.read.parquet(out)
    })
  )

  val oracle: Map[String, String] = Map(
    "q178_stream_tumble" -> """
      SELECT event_type,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      FROM events GROUP BY 1, 2""",

    "q179_stream_dedup" -> """
      SELECT DISTINCT md5(text) AS digest FROM documents""",

    "q180_stream_interval_join" -> """
      SELECT p.event_id AS p_id, c.event_id AS c_id
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
            FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS c_ts
            FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id
       AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE
       AND c.c_ts < p.p_ts"""
  )
}
