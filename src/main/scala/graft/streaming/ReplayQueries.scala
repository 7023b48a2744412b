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
 *
 * Cost model of the harness (why the knobs below): each micro-batch
 * commits one delta file per STATE-STORE PARTITION per stateful
 * operator (HDFS-backed provider), so wall time ~ batches x
 * statePartitions, independent of row volume at test scale. The
 * staging projection keeps only the columns the streamed plan reads
 * (the "source" simply contains what a production topic would), two
 * micro-batches exercise the same cross-batch state transitions as
 * four, and `statePartitions` sizes the state exchange to the key
 * cardinality under test — on a real cluster this is the same
 * decision as sizing `spark.sql.shuffle.partitions` to executors,
 * made here per-query with set-and-restore so the shared session is
 * never left mutated (cf. the round-7 review note on
 * StreamSinks.applyBatch).
 */
object ReplayQueries {

  private val dec = DecimalType(18, 2)

  /** Typed row for the changelog-join replay (q245). `cents` is
    * floor(value*100): integer-valued doubles sum exactly in any
    * micro-batch order, so the stream's final state hash-matches the
    * batch dual without a float-ordering caveat. */
  final case class EvRow(user_id: Long, event_type: String, cents: Long)
  /** One side's updating aggregate view payload. */
  final case class SideAgg(sum: Double, count: Long)

  /** Stage `df` as `n` parquet files under a fresh temp dir; return the
    * (input, output, checkpoint) directory triple. */
  private def stage(df: DataFrame, n: Int): (String, String, String) = {
    val root = Files.createTempDirectory("graft_replay").toString
    df.repartition(n).write.mode("overwrite").parquet(s"$root/in")
    (s"$root/in", s"$root/out", s"$root/ck")
  }

  /** Run `body` with `spark.sql.shuffle.partitions` = `n`, restoring the
    * previous value afterwards even on failure. State-store partition
    * count is fixed at the FIRST checkpoint of a streaming query; every
    * replay query uses a fresh checkpoint dir, so the narrowed setting
    * applies cleanly per query. */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key  = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling-window aggregate executed as a STREAM: 2 micro-batches
    // of file replay, Complete-mode state carried across batches, final
    // batch rewrites the full result (same columns as batch q25).
    "q178_stream_tumble" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_type"), col("ts"), col("value"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val agg = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
          .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
          .agg(count(lit(1)).as("n"),
               sum(col("value").cast(dec)).cast("double").as("sum_v"))
          .select(col("event_type"), Tables.tsMicros(col("w.start")).as("w_start"),
                  col("n"), col("sum_v"))
        val q = agg.writeStream.outputMode("complete")
          .option("checkpointLocation", ck)
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("overwrite").parquet(out)
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out)
    }),

    // Exact dedup executed as a STREAM: `dropDuplicates` keyed state
    // spans micro-batches; emits the distinct digest set (batch dual:
    // SELECT DISTINCT md5(text)).
    "q179_stream_dedup" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents").select(col("text"))
      val (in, out, ck) = stage(docs, 4)
      withStatePartitions(s, 8) {
        val dd = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
          .select(md5(col("text")).as("digest"))
          .dropDuplicates("digest")
        val q = dd.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out)
    }),

    // Interval join executed as a STREAM-STREAM join: purchases x
    // clicks within (p_ts - 10 min, p_ts) per user, inner — the full
    // pair set emits whatever the micro-batch boundaries, then the
    // batch dual SQL must hash-match it.
    "q180_stream_interval_join" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
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
      }
      s.read.parquet(out)
    }),

    // The full updating-stream stack under the oracle gate: insert-only
    // event replay feeds TWO changelog aggregates (per-user purchase
    // and click SUM/COUNT views emitting -U/+U retraction pairs), whose
    // updating outputs drive the per-record incremental changelog JOIN
    // (`Changelog.joinChangelog`, the reference's StreamingJoinOperator
    // algorithm); the sink's accumulated changelog is then materialized
    // to its final table. Three chained stateful operators across
    // micro-batches — the final state is batch-boundary-independent,
    // so the batch dual SQL must hash-match it.
    "q245_stream_changelog_join" -> ((s, dir) =>
      changelogJoinReplay(s, dir, nFiles = 4, filesPerTrigger = 2))
  )

  /** q245's pipeline with the replay split as parameters, so the spec
    * can assert the final state is IDENTICAL under different
    * micro-batch boundaries (the batch-boundary-independence claim the
    * oracle gate relies on). */
  def changelogJoinReplay(s: SparkSession, dir: String,
                          nFiles: Int, filesPerTrigger: Int): DataFrame = {
    import s.implicits._
    val ev = Tables.table(s, dir, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_type"),
              floor(col("value") * 100).as("cents"))
    val (in, out, ck) = stage(ev, nFiles)
    withStatePartitions(s, 8) {
      val src = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", filesPerTrigger).parquet(in)
        .as[EvRow]
      def side(kind: String) = Changelog.aggregateChangelog[EvRow](
          src.filter(_.event_type == kind).groupByKey(_.user_id),
          _ => Changelog.Insert, _.cents.toDouble)
        .map(a => (a.key, a.kind, SideAgg(a.sum, a.count)))
      val j = Changelog.joinChangelog(side("purchase"), side("click"))
      val q = j.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .start()
      q.processAllAvailable(); q.stop()
    }
    Changelog.materialize(s.read.parquet(out), "key", "kind", "ord")
      .select(col("key").as("user_id"),
              (col("left.sum") / 100.0).as("purchase_amt"),
              col("left.count").as("purchases"),
              (col("right.sum") / 100.0).as("click_amt"),
              col("right.count").as("clicks"))
  }

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
       AND c.c_ts < p.p_ts""",

    "q245_stream_changelog_join" -> """
      WITH p AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      k AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT p.user_id AS user_id,
             p.s/100.0 AS purchase_amt, CAST(p.c AS BIGINT) AS purchases,
             k.s/100.0 AS click_amt, CAST(k.c AS BIGINT) AS clicks
      FROM p JOIN k ON p.user_id = k.user_id"""
  )
}
