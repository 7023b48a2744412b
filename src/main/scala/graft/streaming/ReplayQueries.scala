package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
 * Queries on unordered staging keep their watermark far beyond the
 * data's horizon so no correctness-bearing state is evicted mid-replay;
 * queries on `stageOrdered` staging run TIGHT watermarks instead —
 * state evicts continuously (the production shape) and the trailing
 * sentinel files flush the horizon.
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

  /** Typed event for the streaming-CEP replay (q251): `ts_us` is the
    * epoch-µs match time; `ets` is the watermarked event-time column,
    * kept inside the element type so the watermark stays attached to
    * the typed plan (cf. CepSpec's streaming harness note). */
  final case class CepEv(event_id: Long, user_id: Long, ts_us: Long,
                         event_type: String, ets: java.sql.Timestamp)

  /** Typed event for the streaming over-window replay (q252): `t_ms`
    * is the epoch-ms emission time (the watermark unit). */
  final case class OvEv(event_id: Long, user_id: Long, t_ms: Long,
                        value: Double, ets: java.sql.Timestamp)

  /** Probe / versioned-build rows for the streaming temporal join gate
    * (q275): purchases probe the per-user "latest view" version table. */
  final case class TjProbe(p_id: Long, p_user: Long, p_value: Double,
                           p_ts: java.sql.Timestamp)
  final case class TjVer(v_user: Long, v_ts: java.sql.Timestamp,
                         v_id: Long, v_value: Double)

  /** Typed event for the trigger/evictor gate (q289). */
  final case class TrigEv(event_id: Long, event_type: String, ts_us: Long,
                          cents: Long, ets: java.sql.Timestamp)

  /** Typed delta document for the streaming ingest-dedup gate (q303). */
  final case class IngestDoc(doc_id: Long, source: String, n_chars: Long,
                             dig: String)

  /** Stage `df` as `n` parquet files under a fresh temp dir; return the
    * (input, output, checkpoint) directory triple. */
  /**
   * Process-wide cache of STAGED INPUT directories, keyed by the
   * canonicalized logical plan of the staged frame (plus slicing
   * parameters): the bench harness times each gate as a median of
   * reps, and Verify may share a projection across gates — re-staging
   * an identical input is pure harness cost, not part of the streaming
   * operator under test. Only the read-only `in` dir is cached; every
   * run still gets a FRESH out + checkpoint dir, so the streaming
   * query itself replays from scratch each time. Canonicalized plans
   * normalize expression ids and embed literals (e.g. a sentinel's
   * max-ts) — but NOT file-source paths (HadoopFsRelation renders as
   * just its format short name), so the key additionally appends the
   * scan root paths via [[sourceRoots]]: two same-shaped frames reading
   * different data dirs in one JVM cannot collide.
   */
  private val stageCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The sorted file-scan root paths of ONE frame's analyzed plan — the
    * part of frame identity a canonicalized plan string omits. Covers v1
    * (`LogicalRelation`/`HadoopFsRelation`) and DSv2 relations. Callers
    * concatenate PER FRAME, in argument order — one merged sorted set
    * across frames could not tell `stageOrdered(main@A, sentinel@B)`
    * from `stageOrdered(main@B, sentinel@A)`. */
  private def sourceRoots(df: DataFrame): String =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case other => Seq(other.toString)
        }
      case dsv2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        Seq(dsv2.table.name())
    }.flatten.sorted.mkString(",")
  /** Cache-key rendering of one frame's canonicalized plan. The plain
    * `toString` elides fields beyond `spark.sql.debug.maxToStringFields`
    * (default 25), so two distinct WIDE plans over the same sources
    * could render identically; appending the canonicalized plan's
    * `semanticHash` (computed over the full tree, no elision) makes a
    * collision require both an identical elided rendering AND an Int
    * hash collision (r17 ADVICE item). */
  private def planKey(df: DataFrame): String = {
    val c = df.queryExecution.logical.canonicalized
    c.toString + "#" + c.semanticHash()
  }
  /** Process-wide cache of the tiny scalar max() aggregates the gates
    * run only to place their far-future sentinel rows — keyed exactly
    * like [[stageCache]] (canonicalized plan + scan roots), and the
    * same policy argument applies: the value is a pure function of the
    * staged INPUT (which is itself cached), so re-running the scan on
    * every bench rep is harness cost, not part of the streaming
    * operator under test. One JVM = one bench invocation, so nothing
    * persists across runs. */
  private val scalarCache =
    scala.collection.concurrent.TrieMap.empty[String, Any]
  private def maxTsOf(df: DataFrame, c: String): java.sql.Timestamp =
    scalarCache.getOrElseUpdate(
      s"maxts|$c|" + sourceRoots(df) + "|" +
        planKey(df),
      df.agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col(c))).head().getTimestamp(0))
      .asInstanceOf[java.sql.Timestamp]
  private def maxLongOf(df: DataFrame, c: String): Long =
    scalarCache.getOrElseUpdate(
      s"maxlong|$c|" + sourceRoots(df) + "|" +
        planKey(df),
      df.agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col(c))).head().getLong(0))
      .asInstanceOf[Long]

  private def cachedIn(key: String)(build: String => Unit): String =
    stageCache.getOrElseUpdate(key, {
      val in = Files.createTempDirectory("graft_replay").toString + "/in"
      build(in)
      in
    })

  /** Stage a CDC envelope frame as `n` json files — input-dir caching
    * per canonicalized plan exactly like [[stage]] (the staged dir is
    * read-only; every run still gets fresh sink/checkpoint dirs).
    * `extra` appends gate-specific raw files (e.g. q368's junk lines)
    * and participates in the key via `extraKey`. */
  private def stageJsonIn(df: DataFrame, n: Int, extraKey: String = "")
                         (extra: String => Unit = _ => ()): String = {
    val key = s"jsonin|$n|$extraKey|" + sourceRoots(df) + "|" +
      planKey(df)
    cachedIn(key) { in =>
      df.repartition(n).write.mode("overwrite").json(in)
      extra(in)
    }
  }

  private def stage(df: DataFrame, n: Int): (String, String, String) = {
    val key = s"plain|$n|" + sourceRoots(df) + "|" +
      planKey(df)
    val in = cachedIn(key) { in =>
      df.repartition(n).write.mode("overwrite").parquet(in)
    }
    val root = Files.createTempDirectory("graft_replay").toString
    (in, s"$root/out", s"$root/ck")
  }

  /**
   * Stage `df` as `n` EVENT-TIME-ORDERED parquet files (file i holds the
   * i-th ts-range slice), written as sequential jobs so file modification
   * times strictly increase — `FileStreamSource` replays oldest-first, so
   * a `maxFilesPerTrigger=1` query sees event time advance monotonically
   * and a tight watermark delay drops nothing. Two trailing `sentinel`
   * files (far-future rows on an impossible key) then push the watermark
   * past every real row so watermark-gated operators (session windows,
   * CEP horizons, over-window emission) finalize all state — the replay
   * analogue of the reference's final `Long.MAX_VALUE` watermark on
   * bounded input (flink-streaming-java/.../streamstatus/StreamStatus.java).
   *
   * The ntile staging sort is a single task — acceptable because staging
   * is harness scaffolding; the streamed plan under test is the
   * production shape (keyed state shuffled on the group key).
   */
  private def stageOrdered(df: DataFrame, tsCol: String, n: Int,
                           sentinel: DataFrame): (String, String, String) = {
    val key = s"ordered|$tsCol|$n|" + sourceRoots(df) + "||" +
      sourceRoots(sentinel) + "|" +
      planKey(df) +
      planKey(sentinel)
    val in = cachedIn(key) { in =>
      // slice on (ts, every other column): equal-ts rows would otherwise
      // land in nondeterministic slices, and maxFilesPerTrigger=1 makes
      // each slice its own micro-batch — a per-batch tie-break sort in
      // the operator cannot reorder ACROSS batches
      val tieCols = df.columns.filterNot(_ == tsCol).sorted.map(col)
      val sliced = df.withColumn("__slice",
        ntile(n).over(org.apache.spark.sql.expressions.Window
          .orderBy(col(tsCol) +: tieCols.toSeq: _*)))
        .localCheckpoint() // one global sort, not one per slice write
      for (i <- 1 to n) {
        sliced.filter(col("__slice") === i).drop("__slice")
          .coalesce(1).write.mode("append").parquet(in)
        stampMtimes(in)
      }
      sentinel.coalesce(1).write.mode("append").parquet(in)
      stampMtimes(in)
      sentinel.coalesce(1).write.mode("append").parquet(in)
      stampMtimes(in)
    }
    val root = Files.createTempDirectory("graft_replay").toString
    (in, s"$root/out", s"$root/ck")
  }

  /** Stamp any not-yet-stamped data file in `dir` with a strictly
    * increasing modification time. Sequential write jobs usually produce
    * increasing mtimes anyway, but local-FS mtime granularity is a
    * millisecond and FileStreamSource breaks ties in unspecified order —
    * an explicit monotone stamp removes the race outright. */
  private val mtimeClock = new java.util.concurrent.atomic.AtomicLong(1600000000000L)
  private def stampMtimes(dir: String): Unit = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .sortBy(_.getName)
      .foreach { f =>
        if (f.lastModified() < mtimeClock.get())
          () // already stamped by an earlier call
        else
          f.setLastModified(mtimeClock.addAndGet(60000L))
      }
  }

  /**
   * Stage `main` as `n` event-time-ordered slices (as [[stageOrdered]]),
   * then TWO `sentinel` watermark-carrier files, then `late` as one
   * trailing file — the replay shape for allowed-lateness testing.
   *
   * Why the sentinels: Spark keeps TWO watermark values per batch
   * (SPARK-42376): EVICTION uses the value updated from the previous
   * batch, but the LATE-EVENT FILTER uses the one from the batch before
   * that. The sentinels (rows on an impossible key at max(main) event
   * time) absorb that one-batch lag, so by the late file's batch the
   * filter watermark is exactly max(main event time) − delay — each
   * late row is then deterministically accepted (its window still open)
   * or dropped, independent of how `main` was sliced.
   */
  private def stageWithLate(main: DataFrame, tsCol: String, n: Int,
                            sentinel: DataFrame,
                            late: DataFrame): (String, String, String) = {
    val key = s"late|$tsCol|$n|" + sourceRoots(main) + "||" +
      sourceRoots(sentinel) + "||" + sourceRoots(late) + "|" +
      planKey(main) +
      planKey(sentinel) +
      planKey(late)
    val in = cachedIn(key) { in =>
      val tieCols = main.columns.filterNot(_ == tsCol).sorted.map(col)
      val sliced = main.withColumn("__slice",
        ntile(n).over(org.apache.spark.sql.expressions.Window
          .orderBy(col(tsCol) +: tieCols.toSeq: _*)))
        .localCheckpoint()
      for (i <- 1 to n) {
        sliced.filter(col("__slice") === i).drop("__slice")
          .coalesce(1).write.mode("append").parquet(in)
        stampMtimes(in)
      }
      sentinel.coalesce(1).write.mode("append").parquet(in)
      stampMtimes(in)
      sentinel.coalesce(1).write.mode("append").parquet(in)
      stampMtimes(in)
      late.coalesce(1).write.mode("append").parquet(in)
      stampMtimes(in)
    }
    val root = Files.createTempDirectory("graft_replay").toString
    (in, s"$root/out", s"$root/ck")
  }

  /** Run `body` with `spark.sql.shuffle.partitions` = `n`, restoring the
    * previous value afterwards even on failure. State-store partition
    * count is fixed at the FIRST checkpoint of a streaming query; every
    * replay query uses a fresh checkpoint dir, so the narrowed setting
    * applies cleanly per query.
    *
    * Also disables the post-data NO-DATA micro-batch for the wrapped
    * query (set-and-restore, same discipline): every replay gate drives
    * its final watermark-gated emissions with explicit far-future
    * sentinel FILES (two, absorbing the two-batch watermark lag — see
    * [[stageWithLate]]), so the idle extra trigger is pure overhead
    * here (~0.3–0.5 s per stateful query at the measured micro-batch
    * floor, ProfileReplay r17). Scoped to the replay harness — NOT a
    * session default — because operators outside it legitimately rely
    * on no-data batches for final emission (the StreamingSpec /
    * TemporalJoinSpec harnesses assert exactly that semantics). The
    * full DuckDB-oracle suite is hash-exact under this setting. */
  private[graft] def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key  = "spark.sql.shuffle.partitions"
    val nd   = "spark.sql.streaming.noDataMicroBatches.enabled"
    // Override hook for measurement (ProfileReplay A/B) and for sizing
    // the replay state exchange to the deployment: unset ⇒ the per-gate
    // default `n` stands.
    val eff = s.conf.getOption("spark.graft.replay.statePartitions")
      .map(_.toInt).getOrElse(n)
    val prev = s.conf.get(key)
    val prevNd = s.conf.get(nd)
    s.conf.set(key, eff.toString)
    s.conf.set(nd, "false")
    try body finally { s.conf.set(key, prev); s.conf.set(nd, prevNd) }
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

    // STREAMING ingest dedup — q297's incremental-ingest shape run as a
    // STREAM (the production deployment: deltas ARRIVE continuously):
    // the delta replays in doc_id order, a stream-static LEFT ANTI join
    // against the base snapshot's digest index drops already-ingested
    // prefixes, and a keyed keep-first state admits each new digest's
    // first arrival. Deterministic under any slicing: slices are
    // doc_id-ordered and each micro-batch admits its per-digest
    // min(doc_id), so the admitted doc is the GLOBAL min per digest —
    // exactly the batch dual's keeper. Oracle = the batch keepers SQL.
    "q303_stream_ingest_dedup" -> ((s, dir) => ingestDedupReplay(s, dir, 3)),

    // Interval join executed as a STREAM-STREAM join: purchases x
    // clicks within (p_ts - 10 min, p_ts) per user, inner — the full
    // pair set emits whatever the micro-batch boundaries, then the
    // batch dual SQL must hash-match it. Ordered staging + a TIGHT
    // watermark (was a 3650-day hold-everything delay): state is
    // continuously evicted as the watermark passes the 10-min bound,
    // which is the production shape — buffered state is bounded by the
    // interval width x arrival rate, not the stream length.
    "q180_stream_interval_join" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(2)
        .select((-col("id") - 1).as("event_id"), lit(-1L).as("user_id"),
                lit(sentTs).cast("timestamp").as("ts"),
                when(col("id") === 0, "purchase").otherwise("click")
                  .as("event_type"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        def src() = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val p = src().filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                  col("ts").as("p_ts"))
          .withWatermark("p_ts", "1 second")
        val c = src().filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
                  col("ts").as("c_ts"))
          .withWatermark("c_ts", "1 second")
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
      changelogJoinReplay(s, dir, nFiles = 4, filesPerTrigger = 2)),

    // SEMI changelog join under the oracle gate — EXISTS over two
    // UPDATING inputs (the reference's StreamingSemiAntiJoinOperator,
    // planned for `WHERE EXISTS (subquery)` on changelogs): the
    // per-user purchase agg view is emitted iff the user's click agg
    // view currently has count ≥ 14 (the fixture median, so both the
    // EXISTS and NOT-EXISTS sides stay populated at every SF). The click view CROSSES that
    // threshold mid-replay (its count ticks up across micro-batches via
    // -U/+U retraction pairs), so the gate exercises the 0→1
    // association transitions, not just a static filter.
    "q304_stream_semi_join" -> ((s, dir) =>
      existenceJoinReplay(s, dir, anti = false)),

    // ANTI changelog join — the NOT-EXISTS dual: purchase views of
    // users whose click count never reaches 14 (or who have no clicks).
    // Mid-replay threshold crossings RETRACT previously-emitted rows,
    // so the materialized final state equals the batch NOT EXISTS dual.
    "q305_stream_anti_join" -> ((s, dir) =>
      existenceJoinReplay(s, dir, anti = true)),

    // Streaming WINDOW JOIN under the oracle gate (the reference's
    // JoinedStreams.where(...).equalTo(...).window(Tumbling...) —
    // STREAM/api/datastream/JoinedStreams.java: elements of two streams
    // pair iff same key AND same tumbling window): expressed Spark-first
    // as a stream-stream equi-join on (key, window(ts)) — the window
    // bucket IS part of the join key, so Catalyst plans a plain
    // streaming symmetric hash join; in production a tight watermark on
    // both sides bounds state to open windows (the evict-on-window-close
    // of the reference's window join). THIS REPLAY stages via plain
    // stage() (unordered round-robin slices), so per the file-header
    // determinism rule the watermark delay is held BEYOND the fixture's
    // ~30-day span — no row may be late-dropped or state-evicted
    // mid-replay, making the 4-batch replay equal the batch dual by
    // construction rather than by Spark's current late-row behavior.
    // The production tight-watermark shape is exercised separately by
    // the stageOrdered gates (q250/q257/q259 et al.). Batch dual:
    // equi-join on the date_trunc'd day.
    "q308_stream_window_join" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        def src() = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        val p = src().filter(col("event_type") === "purchase")
          .withWatermark("ts", "90 days")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                  window(col("ts"), "1 day").as("p_w"))
        val c = src().filter(col("event_type") === "click")
          .withWatermark("ts", "90 days")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
                  window(col("ts"), "1 day").as("c_w"))
        val j = p.join(c, col("p_user") === col("c_user") &&
            col("p_w") === col("c_w"))
          .select(col("p_id"), col("c_id"))
        val q = j.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out)
    }),

    // Retract-capable COUNT(DISTINCT) under the oracle gate (the
    // reference's distinct aggregate on an UPDATING input, via the
    // generated DistinctAccumulator's MapView): per user-group, the
    // number of DISTINCT live purchase-total buckets (cents div 10000)
    // across the group's users. As users' sums grow, their bucket
    // FLIPS arrive as -U/+U retraction pairs; the distinct count must
    // drop only when a bucket's LAST occupant leaves it — the
    // value-instance 0↔1 transitions SUM/COUNT retraction can't see.
    "q307_stream_distinct_agg" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_type"),
                floor(col("value") * 100).as("cents"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
          .as[EvRow]
        val agg = Changelog.aggregateChangelog[Long, EvRow](
          src.groupByKey(_.user_id), _ => Changelog.Insert, _.cents.toDouble)
        val dis = Changelog.aggregateChangelogDistinct[Long, Changelog.AggChange[Long]](
          agg.groupByKey(_.key % 4),
          _.kind, a => math.floor(a.sum / 10000.0))
        // the GroupAggFunction protocol emits ≤ one +U/-D per key per
        // batch — the batch id is the per-key order (the q294 pattern)
        val q = dis.writeStream
          .option("checkpointLocation", ck)
          .outputMode("append")
          .foreachBatch { (batch: Dataset[Changelog.DistinctChange[Long]], bid: Long) =>
            batch.withColumn("bid", lit(bid))
              .write.mode("append").parquet(out)
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      Changelog.materialize(s.read.parquet(out), "key", "kind", "bid")
        .select(col("key").as("grp"), col("distinct").as("n_buckets"),
                col("count").cast("long").as("n_users"))
    }),

    // Retract-CONSUMING Top-N under the oracle gate (the reference's
    // RetractableTopNFunction): per user-group, the top-3 users by LIVE
    // purchase total — the input is the per-user changelog aggregate
    // view, so every micro-batch RE-RANKS on -U/+U retraction pairs
    // (users overtake each other as their sums grow; overtaken rows are
    // demoted with -D, runner-ups admitted with +I). The materialized
    // per-(group,row) upsert log must equal the batch row_number dual
    // over the FINAL sums. Group = user_id % 8 keeps the rank operator
    // key-parallel (the reference's rank keyed on partitionBy).
    "q306_stream_retract_topn" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_type"),
                floor(col("value") * 100).as("cents"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
          .as[EvRow]
        val agg = Changelog.aggregateChangelog[Long, EvRow](
          src.groupByKey(_.user_id), _ => Changelog.Insert, _.cents.toDouble)
        val top = Changelog.topNChangelog[Long, Changelog.AggChange[Long]](
          agg.groupByKey(_.key % 8), n = 3,
          kind = _.kind, score = _.sum, rowId = _.key)
        val q = top.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .start()
        q.processAllAvailable(); q.stop()
      }
      // per-(group,row) upsert log → final top-3 set; rank derived at
      // read over ≤ 3 rows × 8 groups (not part of the streamed state).
      // The materialize key is a string concat of BOTH columns —
      // collision-free for any user_id (an arithmetic composite like
      // key*1e6+rowId would alias once rowId crosses the multiplier)
      val fin = Changelog.materialize(
        s.read.parquet(out)
          .withColumn("mk", concat_ws("#", col("key"), col("rowId"))),
        "mk", "kind", "ord")
      fin.select(col("key").as("grp"), col("rowId").as("user_id"),
                 col("score").cast("long").as("cents"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("grp"))
            .orderBy(col("cents").desc, col("user_id"))).cast("int"))
        .select(col("grp"), col("rnk"), col("user_id"), col("cents"))
    }),

    // The changelog family REACHED FROM PLAIN SQL — the reference's
    // planner routing (FlinkStreamRuleSets.scala subquery rules +
    // FlinkChangelogModeInferenceProgram) re-expressed as
    // SqlFrontend.sql over registered changelog views (StreamSql).
    // Same operator family as q304, entered through `WHERE EXISTS`
    // text with an inner-side residual (threshold 12, vs q304's 14,
    // so both gates exercise different crossing sets).
    "q313_stream_sql_exists" -> ((s, dir) => {
      val (side, out, ck) = purchaseClickViews(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q313_p", side("purchase"), "kind")
        StreamSql.registerChangelog("q313_c", side("click"), "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key AS user_id, amt_c/100.0 AS purchase_amt,
                      cnt AS purchases
               FROM q313_p
               WHERE EXISTS (SELECT 1 FROM q313_c
                             WHERE q313_c.key = q313_p.key
                               AND q313_c.cnt >= 12)""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropChangelog("q313_p"); StreamSql.dropChangelog("q313_c")
        }
      }
      Changelog.materialize(s.read.parquet(out),
          "user_id", "row_kind", "row_ord")
        .select(col("user_id"), col("purchase_amt"), col("purchases"))
    }),

    // Retract-consuming Top-N entered via `ROW_NUMBER() <= k` SQL
    // (the reference's rank rules planning RetractableTopNFunction):
    // top-2 per key%6 group — a different slice/grouping than q306, so
    // the SQL route is a gate of its own, not a duplicate.
    "q314_stream_sql_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q314_p", view, "kind",
          rowId = Some("key"))
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT grp, user_id, cents FROM (
                 SELECT key % 6 AS grp, key AS user_id, amt_c AS cents,
                        ROW_NUMBER() OVER (PARTITION BY key % 6
                                           ORDER BY amt_c DESC, key) AS rn
                 FROM q314_p) t WHERE rn <= 2""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q314_p")
      }
      val fin = Changelog.materialize(
        s.read.parquet(out)
          .withColumn("mk", concat_ws("#", col("grp"), col("user_id"))),
        "mk", "row_kind", "row_ord")
      fin.select(col("grp"), col("user_id"),
                 col("cents").cast("long").as("cents"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("grp"))
            .orderBy(col("cents").desc, col("user_id"))).cast("int"))
        .select(col("grp"), col("rnk"), col("user_id"), col("cents"))
    }),

    // Retract-capable COUNT(DISTINCT) entered via SQL text (the
    // reference's distinct-accumulator planning): distinct live
    // purchase-total buckets per key%5 group.
    "q315_stream_sql_distinct" -> ((s, dir) => {
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q315_p", view, "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key % 5 AS grp,
                      COUNT(DISTINCT floor(amt_c/10000)) AS n_buckets,
                      COUNT(*) AS n_users
               FROM q315_p GROUP BY key % 5""")
          // ≤ one +U/-D per key per batch → batch id is the per-key
          // materialization order (the q294/q307 pattern)
          val q = j.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.withColumn("bid", lit(bid))
                .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q315_p")
      }
      Changelog.materialize(s.read.parquet(out), "grp", "row_kind", "bid")
        .select(col("grp"), col("n_buckets"), col("n_users"))
    }),

    // The two-sided changelog JOIN reached from plain SQL — the day-one
    // `A JOIN B ON` statement over two updating tables (the reference
    // plans it onto StreamingJoinOperator; FlinkStreamRuleSets join
    // rules + changelog-mode inference). Same operator as q245, entered
    // through SQL text WITH a right-side residual (clicks ≥ 12) that
    // q245 doesn't exercise — the residual is applied as a
    // changelog-preserving filter, so mid-replay threshold crossings
    // insert/retract whole pairs.
    "q322_stream_sql_join" -> ((s, dir) => {
      val (side, out, ck) = purchaseClickViews(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q322_p", side("purchase"), "kind")
        StreamSql.registerChangelog("q322_c", side("click"), "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT p.key AS user_id, p.amt_c/100.0 AS purchase_amt,
                      p.cnt AS purchases, c.cnt AS clicks
               FROM q322_p p JOIN q322_c c
                 ON p.key = c.key AND c.cnt >= 12""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropChangelog("q322_p"); StreamSql.dropChangelog("q322_c")
        }
      }
      Changelog.materialize(s.read.parquet(out),
          "user_id", "row_kind", "row_ord")
        .select(col("user_id"), col("purchase_amt"),
                col("purchases"), col("clicks"))
    }),

    // LEFT OUTER changelog join via SQL — null-padded right side with
    // in-place pad↔pair transitions as the click view crosses the
    // residual threshold mid-replay (the reference's
    // OuterJoinRecordStateView association counting; q274 gates the
    // FULL OUTER direct API, this gates LEFT through the SQL text).
    "q323_stream_sql_left_join" -> ((s, dir) => {
      val (side, out, ck) = purchaseClickViews(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q323_p", side("purchase"), "kind")
        StreamSql.registerChangelog("q323_c", side("click"), "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT p.key AS user_id, p.amt_c/100.0 AS purchase_amt,
                      p.cnt AS purchases, c.amt_c/100.0 AS click_amt,
                      c.cnt AS clicks
               FROM q323_p p LEFT OUTER JOIN q323_c c
                 ON p.key = c.key AND c.cnt >= 12""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropChangelog("q323_p"); StreamSql.dropChangelog("q323_c")
        }
      }
      Changelog.materialize(s.read.parquet(out),
          "user_id", "row_kind", "row_ord")
        .select(col("user_id"), col("purchase_amt"), col("purchases"),
                col("click_amt"), col("clicks"))
    }),

    // WHERE + HAVING over a streaming GROUP BY (the reference's Calc on
    // updating input + changelog-mode inference): WHERE is a
    // changelog-preserving payload filter on the view — users whose
    // live purchase total crosses 60000 cents mid-replay LEAVE the
    // aggregate via the -U retraction (no matching +U passes) — and
    // HAVING is a changelog filter on the updating result
    // (filterChangelog): groups cross the 600000 threshold as sums
    // accumulate, entering with +U (and leaving with an explicit -D if
    // member churn drops them back).
    "q324_stream_sql_having" -> ((s, dir) => {
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q324_p", view, "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key % 6 AS grp, SUM(amt_c) AS sum_c,
                      COUNT(*) AS n_users
               FROM q324_p WHERE amt_c < 60000
               GROUP BY key % 6 HAVING sum_c > 600000""")
          val q = j.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.withColumn("bid", lit(bid))
                .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q324_p")
      }
      Changelog.materialize(s.read.parquet(out), "grp", "row_kind", "bid")
        .select(col("grp"), col("sum_c").cast("long").as("sum_c"),
                col("n_users"))
    }),

    // CHAINED streaming SQL — statement 1's updating result registered
    // as a view feeding statement 2, the repo's analogue of the
    // reference planning one multi-operator retract pipeline from
    // nested SQL (GroupAggFunction → RetractableTopNFunction, its
    // changelog-mode inference wiring the -U/+U protocol between them):
    // per-user purchase aggs → SQL GROUP BY (key%6) sums → SQL Top-2
    // groups per parity by live sum. Group sums churn across batches,
    // so the rank state consumes genuine retractions from the chained
    // aggregate, all through SQL text.
    "q325_stream_sql_chain" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q325_p", view, "kind")
        try {
          val g = graft.operators.SqlFrontend.sql(s,
            """SELECT key % 6 AS grp, SUM(amt_c) AS sum_c
               FROM q325_p GROUP BY key % 6""")
          StreamSql.registerChangelog("q325_g", g, "row_kind",
            rowId = Some("grp"))
          val t = graft.operators.SqlFrontend.sql(s,
            """SELECT prt, grp, sum_c FROM (
                 SELECT grp % 2 AS prt, grp, sum_c,
                        ROW_NUMBER() OVER (PARTITION BY grp % 2
                                           ORDER BY sum_c DESC, grp) AS rn
                 FROM q325_g) t WHERE rn <= 2""")
          val q = t.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropChangelog("q325_p"); StreamSql.dropChangelog("q325_g")
        }
      }
      val fin = Changelog.materialize(
        s.read.parquet(out)
          .withColumn("mk", concat_ws("#", col("prt"), col("grp"))),
        "mk", "row_kind", "row_ord")
      fin.select(col("prt"), col("grp"),
                 col("sum_c").cast("long").as("sum_c"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("prt"))
            .orderBy(col("sum_c").desc, col("grp"))).cast("int"))
        .select(col("prt"), col("rnk"), col("grp"), col("sum_c"))
    }),

    // The ordered/multiset retract aggregates REACHED FROM PLAIN SQL —
    // FIRST_VALUE/LAST_VALUE/LISTAGG/COLLECT text over a registered
    // changelog view routes to aggregateChangelogListAgg (the view's
    // upsert key is the order, as in the reference's order-sensitive
    // retract aggs). Different grouping (%7) than q316's direct-API
    // gate, so both entries carry their own oracle.
    "q318_stream_sql_listagg" -> ((s, dir) => {
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q318_p", view, "kind",
          rowId = Some("key"))
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key % 7 AS grp, FIRST_VALUE(amt_c) AS first_c,
                      LAST_VALUE(amt_c) AS last_c, LISTAGG(amt_c) AS vals,
                      COLLECT(amt_c) AS vals_sorted, COUNT(*) AS n_users
               FROM q318_p GROUP BY key % 7""")
          val q = j.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.withColumn("bid", lit(bid))
                .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q318_p")
      }
      Changelog.materialize(s.read.parquet(out), "grp", "row_kind", "bid")
        .select(col("grp"),
                col("first_c").cast("long").as("first_c"),
                col("last_c").cast("long").as("last_c"),
                col("vals"), col("vals_sorted"), col("n_users"))
    }),

    // Plain streaming GROUP BY aggregation entered via SQL text — the
    // day-one streaming-SQL statement (the reference plans it onto
    // GroupAggFunction with retract-capable SUM/COUNT/AVG): the router
    // lands on aggregateChangelogStats, whose (Σv, Σv², n) accumulator
    // absorbs the upstream per-user -U/+U churn exactly (integral
    // doubles — the repo-wide cents discipline). AVG is a codegen'd
    // projection over the emitted accumulator, so the final state must
    // equal the batch dual bit-for-bit.
    "q319_stream_sql_groupagg" -> ((s, dir) => {
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q319_p", view, "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key % 6 AS grp, SUM(amt_c) AS sum_c,
                      COUNT(*) AS n_users, AVG(amt_c) AS avg_c
               FROM q319_p GROUP BY key % 6""")
          val q = j.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.withColumn("bid", lit(bid))
                .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q319_p")
      }
      Changelog.materialize(s.read.parquet(out), "grp", "row_kind", "bid")
        .select(col("grp"), col("sum_c").cast("long").as("sum_c"),
                col("n_users"), col("avg_c"))
    }),

    // The variance family over an updating input, via SQL — the
    // reference's VarPop/VarSamp/StddevPop/StddevSamp retract
    // functions: retraction subtracts from BOTH moments, so mid-replay
    // the accumulator churns and the final emission must equal the
    // batch `(Σv² − Σv·Σv/n)/n` dual computed with the identical
    // operand order (IEEE-correctly-rounded ops on identical integer
    // moments → bit-equal doubles, the q309/q38 discipline).
    "q320_stream_sql_stats" -> ((s, dir) => {
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q320_p", view, "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key % 4 AS grp, VAR_POP(amt_c) AS var_pop_c,
                      VAR_SAMP(amt_c) AS var_samp_c,
                      STDDEV_POP(amt_c) AS sd_pop_c,
                      STDDEV_SAMP(amt_c) AS sd_samp_c,
                      COUNT(*) AS n_users
               FROM q320_p GROUP BY key % 4""")
          val q = j.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.withColumn("bid", lit(bid))
                .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q320_p")
      }
      Changelog.materialize(s.read.parquet(out), "grp", "row_kind", "bid")
        .select(col("grp"), col("var_pop_c"), col("var_samp_c"),
                col("sd_pop_c"), col("sd_samp_c"), col("n_users"))
    }),

    // MIN/MAX over an updating input via SQL — the router's extremes
    // family (aggregateChangelogMinMax's live row set, keyed by the
    // view's declared upsert key): mid-replay a user's total GROWS
    // through -U/+U pairs, so the live set churns and per-group
    // extremes must settle to the batch min/max of the FINAL sums.
    "q321_stream_sql_minmax" -> ((s, dir) => {
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q321_p", view, "kind",
          rowId = Some("key"))
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key % 3 AS grp, MIN(amt_c) AS min_c,
                      MAX(amt_c) AS max_c, COUNT(*) AS n_users
               FROM q321_p GROUP BY key % 3""")
          val q = j.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.withColumn("bid", lit(bid))
                .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q321_p")
      }
      Changelog.materialize(s.read.parquet(out), "grp", "row_kind", "bid")
        .select(col("grp"), col("min_c").cast("long").as("min_c"),
                col("max_c").cast("long").as("max_c"), col("n_users"))
    }),

    // Retract-capable FIRST_VALUE / LAST_VALUE / LISTAGG / COLLECT
    // under the oracle gate (the reference's order/multiset-valued
    // retract aggs — FirstValueWithRetractAggFunction / ListAggWith
    // RetractAggFunction / CollectAggFunction): per user-group, the
    // ord-ordered value list and sorted multiset of per-user LIVE
    // purchase totals. Every upstream -U/+U pair REPLACES that user's
    // element in place (remove-by-ord), so mid-replay the list churns
    // and the final state must equal the batch arg_min/arg_max/
    // string_agg dual over the FINAL sums.
    "q316_stream_listagg" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_type"),
                floor(col("value") * 100).as("cents"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
          .as[EvRow]
        val agg = Changelog.aggregateChangelog[Long, EvRow](
          src.groupByKey(_.user_id), _ => Changelog.Insert, _.cents.toDouble)
        val la = Changelog.aggregateChangelogListAgg[Long, Changelog.AggChange[Long]](
          agg.groupByKey(_.key % 8),
          kind = _.kind, value = _.sum, ord = _.key)
        // GroupAggFunction protocol: ≤ one +U/-D per key per batch —
        // the batch id is the per-key order (the q294/q307 pattern)
        val q = la.writeStream
          .option("checkpointLocation", ck)
          .outputMode("append")
          .foreachBatch { (batch: Dataset[Changelog.ListAggChange[Long]], bid: Long) =>
            batch.withColumn("bid", lit(bid))
              .write.mode("append").parquet(out)
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      Changelog.materialize(s.read.parquet(out), "key", "kind", "bid")
        .select(col("key").as("grp"),
                col("first").cast("long").as("first_c"),
                col("last").cast("long").as("last_c"),
                col("listagg").as("vals"),
                col("collect").as("vals_sorted"),
                col("count").as("n_users"))
    }),

    // Stream-static LOOKUP join under the oracle gate (the reference's
    // LookupJoin against a bounded build side, T-COMMON/connector/
    // source/LookupTableSource.java): replayed events probe a BROADCAST
    // customer dim — no shuffle of the stream side, no watermark needed
    // (the dim is bounded); every probe emits exactly its match set, so
    // the append sink equals the batch join dual.
    "q263_stream_lookup" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"))
      val dim = broadcast(Tables.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val j = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
          .join(dim, col("user_id") === col("c_custkey"))
          .select(col("event_id"), col("c_nationkey"))
        val q = j.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out)
    }),

    // COUNT-tumbling windows executed as a STREAM (the reference's
    // CountTumblingWindowAssigner, STREAM/api/windowing/assigners/
    // GlobalWindows + count trigger): the hard part on an out-of-order
    // stream is assigning a DETERMINISTIC per-key sequence number, which
    // the watermark-ordered running count (OverWindow.overAgg) provides;
    // rows then fold into windows of 5 and only complete windows count.
    // The batch dual is the row_number / div-5 rewrite (same as q56's
    // batch shape).
    "q261_stream_count_tumble" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
                Tables.tsMillis(col("ts")).as("t_ms"),
                col("value"), col("ts").as("ets"))
      val maxTs = maxTsOf(ev, "ets")
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(maxTs.getTime + 100L * 86400 * 1000).as("t_ms"),
                lit(0.0).as("value"),
                lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                  .cast("timestamp").as("ets"))
      val (in, out, ck) = stageOrdered(ev, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
          .withWatermark("ets", "1 second")
          .as[OvEv]
        val rn = OverWindow.overAgg[Long, OvEv, Long](
            src.groupByKey(_.user_id),
            _.t_ms, _.event_id, _.value,
            OverWindow.countAgg[OvEv],
            OverWindow.UnboundedPreceding)
          .toDF("user_id", "t_ms", "event_id", "rn")
        val q = rn.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .withColumn("wid", expr("(CAST(rn AS BIGINT) - 1) div 5"))
        .groupBy("user_id", "wid")
        .agg(count(lit(1)).as("n"),
             min(col("event_id")).as("lo_id"),
             max(col("event_id")).as("hi_id"))
        .filter(col("n") === 5)
        .select(col("user_id"), col("wid"), col("lo_id"), col("hi_id"))
    }),

    // DYNAMIC-GAP session windows executed as a STREAM (the reference's
    // SessionWindowTimeGapExtractor, STREAM/api/windowing/assigners/
    // DynamicEventTimeSessionWindows.java): each event extends its
    // session by its own gap — purchases hold sessions open 60 min,
    // everything else 30 — through the native merging session operator
    // via StreamOps.dynamicSessionAgg. Oracle: running-max interval
    // union (new session iff the event starts at/after every prior
    // event's end).
    "q259_stream_dynamic_session" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
      val maxTs = maxTsOf(ev, "ts")
      val sentinel = s.range(1)
        .select(lit(-1L).as("user_id"),
                lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                  .cast("timestamp").as("ts"),
                lit("zz_sentinel").as("event_type"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val agg = StreamOps.dynamicSessionAgg(src, "ts",
            gap = when(col("event_type") === "purchase", "60 minutes")
              .otherwise("30 minutes"),
            disorder = "1 second",
            keys = Seq(col("user_id")),
            aggs = Seq(count(lit(1)).as("n_events")))
          .select(col("user_id"), col("n_events"))
        val q = agg.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
             sum(col("n_events")).as("n_events"),
             max(col("n_events")).as("max_session"))
    }),

    // Streaming Top-N per key (AppendOnlyTopNFunction analogue) under
    // the oracle gate: per event_type, the 3 highest values seen, state
    // carried across micro-batches; each refreshed top list is UPSERTED
    // by (key, batch-id) through the keyed sink, so the materialized
    // table is the final list per key — which must equal the batch
    // row_number dual exactly.
    "q260_stream_topn" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val root = Files.createTempDirectory("graft_replay").toString
      ev.repartition(4).write.mode("overwrite").parquet(s"$root/in")
      val tbl = s"$root/t"
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(s"$root/in")
          .as[(Long, String, Double)]
        val top = StatefulOps.topNPerKey[String, (Long, String, Double)](
          src.groupByKey(_._2), n = 3, score = _._3, tiebreak = _._1)
        val q = top.toDF("k", "top")
          .writeStream.outputMode("update")
          .option("checkpointLocation", s"$root/ck")
          .foreachBatch { (b: DataFrame, id: Long) =>
            StreamSinks.applyBatch(b.withColumn("__seq", lit(id)),
              tbl, Seq("k"), "__seq", buckets = 16)
          }
          .start()
        q.processAllAvailable(); q.stop()
      }
      StreamSinks.readUpsertTable(s, tbl)
        .select(col("k").as("event_type"),
                posexplode(col("top")).as(Seq("i", "e")))
        .select(col("event_type"), (col("i") + 1).cast("int").as("rnk"),
                col("e._1").as("event_id"), col("e._3").as("value"))
    }),

    // SQL MATCH_RECOGNIZE executed as a STREAM (StreamExecMatch
    // analogue): purchase followed by a greedy run of contiguous clicks
    // within 1 day, per user, ONE ROW PER MATCH with FIRST/LAST/COUNT
    // and a decimal-sum measure. The keyed streaming NFA finalizes
    // matches behind the watermark; ordered staging + sentinels flush
    // the horizon. Oracle: the strict-contiguity relational unroll
    // (first breaking row bounds each run).
    "q258_stream_match_recognize" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
                col("event_type"), col("value"))
      val maxTs = maxTsOf(ev, "ts")
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                  .cast("timestamp").as("ts"),
                lit("zz_sentinel").as("event_type"), lit(0.0).as("value"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
          .withWatermark("ts", "1 second")
        val sm = MatchRecognizeSql.stream(src, """
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.event_id) AS a_id,
                     LAST(B.event_id) AS last_b_id,
                     COUNT(B.*) AS n_b,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       AS match_total
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B+) WITHIN INTERVAL '1' DAY
            DEFINE A AS event_type = 'purchase',
                   B AS event_type = 'click'""")
        val q = sm.start(out, ck)
        q.processAllAvailable(); q.stop()
      }
      MatchRecognizeSql.readMatches(s, out)
        .select(col("user_id"), col("mr_match"), col("a_id"),
                col("last_b_id"), col("n_b"), col("match_total"))
    }),

    // HOP (sliding) window aggregate executed as a STREAM: each event
    // lands in size/slide = 2 overlapping windows (the Blink sliding
    // window operator's pane logic, RUNTIME/runtime/operators/window/);
    // Complete mode carries pane state across micro-batches and the
    // final batch rewrites the full result — batch dual is q26's
    // time_bucket union.
    "q257_stream_hop" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events").select(col("ts"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val agg = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(Tables.tsMicros(col("w.start")).as("w_start"), col("n"))
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

    // Keyed KEEP-LAST materialization executed as a STREAM through the
    // upsert sink (the reference's upsert-kafka / JDBC-upsert family,
    // T-COMMON/connector/sink/abilities/SupportsUpsert-style): per-user
    // latest row by event_id, merged bucket-wise per micro-batch,
    // idempotent on retry. The final table must equal the batch
    // arg-max dual regardless of micro-batch boundaries.
    "q256_stream_keep_last" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val root = Files.createTempDirectory("graft_replay").toString
      ev.repartition(4).write.mode("overwrite").parquet(s"$root/in")
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(s"$root/in")
        val q = StreamSinks.upsertParquet(src, s"$root/t", s"$root/ck",
          keyCols = Seq("user_id"), seqCol = "event_id", buckets = 16)
        q.processAllAvailable(); q.stop()
      }
      StreamSinks.readUpsertTable(s, s"$root/t")
        .select(col("user_id"), col("event_id"), col("value"))
    }),

    // Session windows executed as a STREAM (the reference's merging
    // SessionWindowAssigner, RUNTIME/runtime/operators/window/assigners/
    // SessionWindowAssigner.java): per-user 30-min-gap sessions assembled
    // by the native streaming session_window operator in Append mode —
    // sessions merge across micro-batches and emit once the watermark
    // passes their close; the sentinel files flush the horizon. The
    // read-back rollup to per-user stats is batch shaping; the session
    // ASSEMBLY (the stateful merging operator) runs unbounded. Oracle:
    // q27's lag/cumsum SQL dual.
    "q250_stream_session" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events").select(col("user_id"), col("ts"))
      val maxTs = maxTsOf(ev, "ts")
      val sentinel = s.range(1)
        .select(lit(-1L).as("user_id"),
                lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                  .cast("timestamp").as("ts"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      // Cost note: ~18 s cold / ~4 s warm-median at sf0.1, dominated by
      // the merging-session operator re-merging the accumulated per-key
      // session lists each batch (measured identical at 8 vs 32 state
      // partitions, so it is per-key merge work, not exchange width). A
      // correctness-gate entry by construction, like q180 — not a
      // serving path.
      withStatePartitions(s, 8) {
        val agg = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
          .withWatermark("ts", "1 second")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("n_events"))
        val q = agg.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
             sum(col("n_events")).as("n_events"),
             max(col("n_events")).as("max_session"))
    }),

    // CEP executed as a STREAM: the q49 funnel pattern (view → click →
    // purchase within 24h, enumerate-all) through the watermark-gated
    // NFA (`Cep.matchStream`, the CepOperator.java:83 analogue) — state
    // buffers per user, matches finalize once the within-horizon is
    // behind the watermark, sentinels flush the tail. Matching runs on
    // epoch-µs (`tsPerMs = 1000`) so the 24h boundary is exactly the
    // batch engine's; oracle: q49's 3-way self-join, verbatim.
    "q251_stream_cep" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
                Tables.tsMicros(col("ts")).as("ts_us"), col("event_type"),
                col("ts").as("ets"))
      val maxTs = maxTsOf(ev, "ets")
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit((maxTs.getTime + 100L * 86400 * 1000) * 1000).as("ts_us"),
                lit("zz_sentinel").as("event_type"),
                lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                  .cast("timestamp").as("ets"))
      val (in, out, ck) = stageOrdered(ev, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
          .withWatermark("ets", "1 second")
          .as[CepEv]
        val pattern = Cep.Pattern[CepEv](
          steps = Seq(
            Cep.Step[CepEv]("view", _.event_type == "view"),
            Cep.Step[CepEv]("click", _.event_type == "click"),
            Cep.Step[CepEv]("purchase", _.event_type == "purchase")),
          withinMs = Some(24L * 3600 * 1000000)) // 24h in µs, as q49
        val matches = Cep.matchStream[Long, CepEv](
            src.groupByKey(_.user_id), pattern, _.ts_us, _.event_id,
            tsPerMs = 1000L)
          .map(m => (m.key, m.events(0).event_id, m.events(1).event_id,
                     m.events(2).event_id))
          .toDF("user_id", "v_id", "c_id", "p_id")
        val q = matches.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
    }),

    // LEFT OUTER interval join executed as a STREAM-STREAM join — the
    // outer leg of q180's row (IntervalJoinOperator relatedness, plus
    // the reference's outer-join null-padding semantics): an unmatched
    // purchase emits its null-padded row only once the watermark proves
    // no in-window click can still arrive, so this gate checks the
    // state-eviction timing logic, not just the match set. Ordered
    // staging + sentinels advance the watermark past the horizon so
    // every real row resolves; sentinel rows (user -1, one per side so
    // both input streams see the advance) are filtered from the result.
    "q255_stream_interval_join_left" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(2)
        .select((-col("id") - 1).as("event_id"), lit(-1L).as("user_id"),
                lit(sentTs).cast("timestamp").as("ts"),
                when(col("id") === 0, "purchase").otherwise("click")
                  .as("event_type"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        def src() = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val p = src().filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                  col("ts").as("p_ts"))
          .withWatermark("p_ts", "1 second")
        val c = src().filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
                  col("ts").as("c_ts"))
          .withWatermark("c_ts", "1 second")
        val j = p.join(c, col("p_user") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
            col("c_ts") < col("p_ts"), "leftOuter")
          .select(col("p_user"), col("p_id"), col("c_id"))
        val q = j.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out).filter(col("p_user") >= 0)
    }),

    // Keyed two-input connect executed as a STREAM (the reference's
    // ConnectedStreams.process(KeyedCoProcessFunction), STREAM/api/
    // functions/co/KeyedCoProcessFunction.java:58-66): a CONTROL stream
    // (view events — each sets the user's alert threshold to its value)
    // and a DATA stream (purchase events — emitted iff they exceed the
    // latest threshold) share one per-key state cell. Event-time-ordered
    // replay + the deterministic (ts, side, tiebreak) fold order make
    // the emission set equal the batch as-of dual: each purchase pairs
    // with the last view at-or-before it.
    "q268_stream_coprocess" -> ((s, dir) => coProcessReplay(s, dir, 2)),

    // Allowed lateness executed as a STREAM (the reference's
    // WindowOperator allowedLateness re-firing, STREAM/runtime/operators/
    // windowing/WindowOperator.java:160 — a late-but-in-lateness element
    // re-fires its window with an updated result; beyond-lateness
    // elements are dropped): daily tumbling counts per event_type in
    // UPDATE mode with a 3-day watermark delay; a withheld slice of rows
    // (event_id % 7 = 0) replays AFTER the watermark reached
    // max(main) − 3d, so each late row deterministically updates its
    // still-open window or is dropped with its evicted one. The upsert
    // sink keeps the LAST update per window — which must equal the batch
    // dual over main ∪ accepted-late rows (the oracle re-derives the
    // acceptance predicate: window end > max(main) − 3d).
    "q269_stream_lateness" -> ((s, dir) => latenessReplay(s, dir, 2)),

    // FULL OUTER changelog join under the oracle gate — q245's pipeline
    // with the join in its outer configuration (the reference's
    // StreamingJoinOperator with leftIsOuter AND rightIsOuter, padding
    // via OuterJoinRecordStateView association counts): the two updating
    // per-user aggregates cover DIFFERENT user sets (value ≥ 150 on each
    // side keeps users with only qualifying purchases, only qualifying
    // clicks, and both), so the final materialized table contains live
    // null-padded rows on BOTH sides — rows that were retracted and
    // re-padded as the other side's first/last association arrived
    // across micro-batches. Batch dual: the FULL OUTER JOIN SQL.
    "q274_stream_changelog_outer" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click") &&
                col("value") >= 150)
        .select(col("user_id"), col("event_type"),
                floor(col("value") * 100).as("cents"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
          .as[EvRow]
        def side(kind: String) = Changelog.aggregateChangelog[Long, EvRow](
            src.filter(_.event_type == kind).groupByKey(_.user_id),
            _ => Changelog.Insert, _.cents.toDouble)
          .map(a => (a.key, a.kind, SideAgg(a.sum, a.count)))
        val j = Changelog.joinChangelogOuter(
          side("purchase"), side("click"), Changelog.FullOuter)
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
    }),

    // Streaming temporal (versioned-table) join under the oracle gate —
    // the reference's TemporalRowTimeJoinOperator (RUNTIME/runtime/
    // operators/join/temporal/TemporalRowTimeJoinOperator.java): view
    // events version a per-user build table; each purchase probes the
    // version current AT ITS EVENT TIME, emission deferred until the
    // watermark proves the version set at the probe's instant is
    // complete (versions at the probe's ms ARE visible; equal-ts
    // versions resolve to the highest event_id — the operator's
    // deterministic tie order). The far-future probe-side sentinel
    // flushes every pending probe. Batch dual: last view at-or-before
    // each purchase at ms precision.
    "q275_stream_temporal_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("event_id"), col("user_id"), col("ts"),
                col("event_type"), col("value"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(sentTs).cast("timestamp").as("ts"),
                lit("purchase").as("event_type"), lit(0.0).as("value"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val probes = src.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                  col("value").as("p_value"), col("ts").as("p_ts"))
          .as[TjProbe]
        val vers = src.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
                  col("event_id").as("v_id"), col("value").as("v_value"))
          .as[TjVer]
        val j = TemporalJoin.streamAsOf[TjProbe, TjVer](
            probes, vers, _.p_user, _.v_user, _.p_ts, _.v_ts, _.v_id,
            "1 second")
          .select(col("_1.p_user").as("p_user"), col("_1.p_id").as("p_id"),
                  col("_1.p_value").as("p_value"),
                  col("_2.v_id").as("v_id"), col("_2.v_value").as("v_value"))
        val q = j.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out).filter(col("p_user") >= 0)
    }),

    // GlobalWindows + CountTrigger + CountEvictor + purge executed as a
    // STREAM under the oracle gate (the reference's
    // STREAM/api/windowing/triggers/{CountTrigger,PurgingTrigger}.java +
    // evictors/CountEvictor.java over GlobalWindows): per event_type,
    // every 5th arrival fires, the evictor trims the fired window to its
    // LAST 3 elements, and the purge restarts the window — Flink's
    // count-window-with-evictor idiom. Determinism: event timestamps
    // are unique at µs precision in the fixture, stageOrdered slices by
    // ts and the operator sorts each micro-batch by ts_us, so the
    // arrival fold is the global event-time order whatever the slicing;
    // no watermark is involved (arrival-driven firing), so the trailing
    // partial window simply never fires — exactly the batch dual's
    // complete-windows-only predicate.
    "q289_stream_count_evictor" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("event_type"),
                Tables.tsMicros(col("ts")).as("ts_us"),
                floor(col("value") * 100).cast("long").as("cents"),
                col("ts").as("ets"))
      val maxTs = maxTsOf(ev, "ets")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit("zz_sentinel").as("event_type"),
                lit(sentTs.getTime * 1000L).as("ts_us"),
                lit(0L).as("cents"),
                lit(sentTs).cast("timestamp").as("ets"))
      val (in, out, ck) = stageOrdered(ev, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
          .as[TrigEv]
        val fired = Triggers.window[String, TrigEv,
                                    (String, Long, Long, Long, Long)](
            src.groupByKey(_.event_type),
            Triggers.CountTrigger(5), Triggers.CountEvictor[TrigEv](3),
            purge = true, orderBy = _.ts_us,
            tieBreak = _.event_id) { (k, kept) =>
          (k, kept.map(_.event_id).min, kept.map(_.event_id).max,
           kept.map(_.cents).sum, kept.size.toLong)
        }.toDF("event_type", "lo_id", "hi_id", "cents", "n")
        val q = fired.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ck)
          .outputMode("append")
          .start()
        q.processAllAvailable(); q.stop()
      }
      s.read.parquet(out).filter(col("event_type") =!= "zz_sentinel")
    }),

    // Idle-state retention (TTL) under the oracle gate — the
    // reference's `table.exec.state.ttl` /
    // `StreamQueryConfig#withIdleStateRetentionTime` wired through the
    // changelog aggregate (Changelog.IdleStateTtl): per-user purchase
    // cents accumulate as an updating view; the replay then goes IDLE
    // past the retention, so every key's state expires, and the second
    // half of the stream re-accumulates from FRESH state. Expiry is
    // silent (no -D), so the materialized view keeps each key's last
    // emitted row — the reference's documented staleness trade-off.
    // Deterministic by construction: phase 1 and phase 2 are each ONE
    // micro-batch (single staged file), and the idle gap exceeds the
    // TTL by a wide margin, so "phase-2 keys fold from fresh state" and
    // "phase-1-only keys keep their stale row" hold under any timing.
    // Oracle: per user, the phase-2-only aggregate when the user has
    // phase-2 purchases, else the full (= phase-1) aggregate; the phase
    // split is the event-time midpoint, identically computed in µs
    // integer arithmetic on both engines.
    "q294_stream_ttl_agg" -> ((s, dir) => {
      import s.implicits._
      val ttlMs = 1500L
      val p = Tables.table(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
                floor(col("value") * 100).cast("long").as("cents"),
                Tables.tsMicros(col("ts")).as("tus"))
      val (minUs, maxUs) = {
        val r = p.agg(min(col("tus")), max(col("tus"))).head()
        (r.getLong(0), r.getLong(1))
      }
      val splitUs = (minUs + maxUs) / 2
      val root = java.nio.file.Files.createTempDirectory("graft_ttl").toString
      val (in, out, ck) = (s"$root/in", s"$root/out", s"$root/ck")
      p.filter(col("tus") <= splitUs)
        .coalesce(1).write.mode("overwrite").parquet(in)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(p.schema)
          .option("maxFilesPerTrigger", 16).parquet(in)
          .as[(Long, Long, Long)]
        val agg = Changelog.aggregateChangelog[Long, (Long, Long, Long)](
          src.groupByKey(_._1), _ => Changelog.Insert, _._2.toDouble,
          ttl = Some(Changelog.IdleStateTtl(ttlMs)))
        val q = agg.writeStream
          .option("checkpointLocation", ck)
          .outputMode("append")
          .foreachBatch { (batch: Dataset[Changelog.AggChange[Long]], bid: Long) =>
            batch.withColumn("bid", lit(bid))
              .write.mode("append").parquet(out)
          }
          .start()
        q.processAllAvailable()
        Thread.sleep(ttlMs + 1100L) // idle past the retention: state expires
        p.filter(col("tus") > splitUs)
          .coalesce(1).write.mode("append").parquet(in)
        q.processAllAvailable(); q.stop()
      }
      Changelog.materialize(s.read.parquet(out), "key", "kind", "bid")
        .select(col("key").as("user_id"),
                col("sum").cast("long").as("cents"),
                col("count").as("cnt"))
    }),

    // Event-time over-window executed as a STREAM: running MIN(value)
    // per user (ROWS UNBOUNDED PRECEDING) through the watermark-ordered
    // fold (`OverWindow.overAgg`, the RowTimeRowsUnboundedPrecedingFunction
    // analogue, RUNTIME/runtime/operators/over/) — rows emit in
    // (event-ms, event_id) order per key once final; sentinels flush
    // emission past the data horizon. Oracle: the batch over-window SQL
    // with the identical deterministic ORDER BY.
    "q252_stream_over" -> ((s, dir) => overReplay(s, dir, nSlices = 2)),

    // q252's pipeline entered through SQL TEXT (the reference's
    // StreamExecOverAggregate planning `AGG(v) OVER (PARTITION BY …
    // ORDER BY rowtime)` from SQL — plan/nodes/physical/stream/
    // StreamExecOverAggregate.scala): the events replay registered as
    // an APPEND stream view (StreamSql.registerStream — the WATERMARK
    // DDL analogue) and the running MIN written as a plain OVER
    // statement. Same operator (OverWindow.overAgg), same oracle as
    // q252 — the SQL front door must change nothing.
    "q329_stream_sql_over" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
                col("ts").as("ets"))
      val maxTs = maxTsOf(ev, "ets")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(0.0).as("value"),
                lit(sentTs).cast("timestamp").as("ets"))
      val (in, out, ck) = stageOrdered(ev, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q329_v", src, tsCol = "ets",
          delay = "1 second", rowId = Some("event_id"))
        try {
          val res = graft.operators.SqlFrontend.sql(s,
            """SELECT user_id, ets, event_id,
                      MIN(value) OVER (PARTITION BY user_id
                        ORDER BY ets, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS run_min
               FROM q329_v""")
            .select(col("user_id"), unix_millis(col("ets")).as("t_ms"),
                    col("event_id"), col("run_min"))
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q329_v")
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
    }),

    // q180's interval join entered through SQL TEXT — the reference
    // plans `WHERE a.ts BETWEEN b.ts - x AND b.ts + y` onto
    // RowTimeBoundedStreamJoin (the time-bounded stream join); here the
    // BETWEEN bound in the ON clause routes two registered stream views
    // onto Spark's watermarked stream-stream join. Inclusive BETWEEN
    // bounds (vs q180's strict upper), mirrored exactly in the oracle.
    "q330_stream_sql_interval" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(2)
        .select((-col("id") - 1).as("event_id"), lit(-1L).as("user_id"),
                lit(sentTs).cast("timestamp").as("ts"),
                when(col("id") === 0, "purchase").otherwise("click")
                  .as("event_type"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        def src() = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val p = src().filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                  col("ts").as("p_ts"))
        val c = src().filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
                  col("ts").as("c_ts"))
        StreamSql.registerStream("q330_p", p, tsCol = "p_ts",
          delay = "1 second")
        StreamSql.registerStream("q330_c", c, tsCol = "c_ts",
          delay = "1 second")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT p.p_id, c.c_id FROM q330_p p JOIN q330_c c
               ON p.p_user = c.c_user
              AND c.c_ts BETWEEN p.p_ts - INTERVAL '10' MINUTE AND p.p_ts""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropStream("q330_p"); StreamSql.dropStream("q330_c")
        }
      }
      s.read.parquet(out).filter(col("p_id") >= 0)
    }),

    // q275's row-time temporal join entered through SQL TEXT — the
    // reference's LogicalCorrelateToJoinFromTemporalTableRule planning
    // `FOR SYSTEM_TIME AS OF probe.rowtime` onto
    // TemporalRowTimeJoinOperator; here the statement routes two
    // registered stream views onto TemporalJoin.streamAsOf. Same
    // operator, same oracle as q275.
    "q331_stream_sql_temporal" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("event_id"), col("user_id"), col("ts"),
                col("event_type"), col("value"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(sentTs).cast("timestamp").as("ts"),
                lit("purchase").as("event_type"), lit(0.0).as("value"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val probes = src.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                  col("value").as("p_value"), col("ts").as("p_ts"))
        val vers = src.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
                  col("event_id").as("v_id"), col("value").as("v_value"))
        StreamSql.registerStream("q331_p", probes, tsCol = "p_ts",
          delay = "1 second")
        StreamSql.registerStream("q331_v", vers, tsCol = "v_ts",
          delay = "1 second", rowId = Some("v_id"))
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT p.p_user AS p_user, p.p_id AS p_id,
                      p.p_value AS p_value, v.v_id AS v_id,
                      v.v_value AS v_value
               FROM q331_p p LEFT JOIN q331_v
                 FOR SYSTEM_TIME AS OF p.p_ts AS v
               ON p.p_user = v.v_user""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropStream("q331_p"); StreamSql.dropStream("q331_v")
        }
      }
      s.read.parquet(out).filter(col("p_user") >= 0)
    }),

    // STRING-keyed streaming group aggregate under the oracle gate —
    // the changelog family's generic-key support (the reference keys
    // state on arbitrary BinaryRowData): `GROUP BY source` over the
    // documents stream, entered through SQL text, with NO user-side
    // hashing. The router resolves the key expression's type (string →
    // canonical-string state keys); output carries the string key.
    "q332_stream_sql_string_key" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
                lit("+I").as("kind"))
      val (in, out, ck) = stage(docs, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        StreamSql.registerChangelog("q332_v", src, kindCol = "kind")
        try {
          val res = graft.operators.SqlFrontend.sql(s,
            """SELECT source AS src, SUM(n_chars) AS s, COUNT(*) AS c
               FROM q332_v GROUP BY source""")
          // GroupAggFunction protocol: ≤ one accumulate per key per
          // batch — the batch id is the per-key order (q294 pattern)
          val q = res.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch {
              (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
                batch.withColumn("bid", lit(bid))
                  .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q332_v")
      }
      Changelog.materialize(s.read.parquet(out), "src", "row_kind", "bid")
        .select(col("src"), col("s").cast("long").as("n_chars"),
                col("c").as("cnt"))
    }),

    // HETEROGENEOUS aggregate families in ONE streaming-SQL statement
    // (the reference's GroupAggFunction hosting moment accumulators
    // and Min/MaxWithRetract structures in one operator): SUM + MIN +
    // MAX + AVG + COUNT over the per-user updating purchase view — the
    // router lands on aggregateChangelogMulti, whose live-set state
    // serves the extremes while the moments fold deterministically in
    // ord order. Mid-replay -U/+U churn exercises both families'
    // retraction in one state machine.
    "q333_stream_sql_mixed_agg" -> ((s, dir) => {
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q333_p", view, "kind",
          rowId = Some("key"))
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key % 5 AS grp, SUM(amt_c) AS sum_c,
                      MIN(amt_c) AS min_c, MAX(amt_c) AS max_c,
                      AVG(amt_c) AS avg_c, COUNT(*) AS n_users
               FROM q333_p GROUP BY key % 5""")
          val q = j.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.withColumn("bid", lit(bid))
                .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q333_p")
      }
      Changelog.materialize(s.read.parquet(out), "grp", "row_kind", "bid")
        .select(col("grp"), col("sum_c").cast("long").as("sum_c"),
                col("min_c").cast("long").as("min_c"),
                col("max_c").cast("long").as("max_c"),
                col("avg_c"), col("n_users"))
    }),

    // Changelog UNION ALL from SQL — the trivially changelog-preserving
    // set op the reference plans day-one (a union of two changelogs IS
    // the changelog of the union): the per-user purchase and click
    // aggregate views unioned with a literal side tag, the click branch
    // additionally WHERE-filtered — a changelog-MODE filter
    // (Changelog.filterChangelog keyed on the view's upsert key, so a
    // user whose count fell below the threshold would surface as an
    // explicit -D for the upsert sink). Each branch follows the
    // GroupAggFunction protocol on its own key and the side tag makes
    // the composite keys disjoint, so the batch id materializes the
    // union (q294 pattern).
    "q335_stream_sql_union" -> ((s, dir) => {
      val (side, out, ck) = purchaseClickViews(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q335_p", side("purchase"), "kind")
        StreamSql.registerChangelog("q335_c", side("click"), "kind",
          rowId = Some("key"))
        try {
          val u = graft.operators.SqlFrontend.sql(s,
            """SELECT 'purchase' AS side, key, amt_c, cnt FROM q335_p
               UNION ALL
               SELECT 'click' AS side, key, amt_c, cnt FROM q335_c
               WHERE cnt >= 10""")
          val q = u.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.withColumn("bid", lit(bid))
                .withColumn("mk", concat_ws("#", col("side"), col("key")))
                .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropChangelog("q335_p"); StreamSql.dropChangelog("q335_c")
        }
      }
      Changelog.materialize(s.read.parquet(out), "mk", "row_kind", "bid")
        .select(col("side"), col("key").as("user_id"),
                col("amt_c").cast("long").as("cents"), col("cnt"))
    }),

    // Streaming-SQL GROUP BY TUMBLE — the most common streaming SQL
    // statement a user types, planned from text day-one by the
    // reference (FlinkSqlOperatorTable TUMBLE + TUMBLE_START →
    // StreamExecGroupWindowAggregate): per-event-type daily windows
    // with COUNT + exact-cents SUM over a registered stream view,
    // routed onto StreamOps.tumbleAgg (Spark's native watermarked
    // window aggregate, append mode). Oracle: date_trunc day dual.
    "q336_stream_sql_tumble" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_type"), col("ts"), col("value"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit("zz_sentinel").as("event_type"),
                lit(sentTs).cast("timestamp").as("ts"), lit(0.0).as("value"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q336_v", src, tsCol = "ts",
          delay = "1 second")
        try {
          val res = graft.operators.SqlFrontend.sql(s,
            """SELECT event_type, TUMBLE_START(ts, INTERVAL '1' DAY) AS ws,
                      COUNT(*) AS n, SUM(floor(value * 100)) AS cents
               FROM q336_v GROUP BY TUMBLE(ts, INTERVAL '1' DAY), event_type""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q336_v")
      }
      s.read.parquet(out).filter(col("event_type") =!= "zz_sentinel")
        .select(col("event_type"), Tables.tsMicros(col("ws")).as("w_start"),
                col("n"), col("cents").cast("long").as("cents"))
    }),

    // Streaming-SQL GROUP BY HOP — q257's sliding-window pipeline
    // re-entered through SQL text, keeping Flink's (time, slide, size)
    // argument order (the route flips to Spark's (size, slide)). Here
    // the windows finalize behind the watermark (append mode, sentinel
    // flushed) instead of q257's Complete-mode rewrite — same oracle.
    "q337_stream_sql_hop" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events").select(col("ts"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(sentTs).cast("timestamp").as("ts"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q337_v", src, tsCol = "ts",
          delay = "1 second")
        try {
          val res = graft.operators.SqlFrontend.sql(s,
            """SELECT HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) AS ws,
                      COUNT(*) AS n
               FROM q337_v
               GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q337_v")
      }
      // the sentinel's two far-future windows start past the data max
      s.read.parquet(out).filter(col("ws") <= lit(maxTs))
        .select(Tables.tsMicros(col("ws")).as("w_start"), col("n"))
    }),

    // Streaming-SQL GROUP BY SESSION — q250's merging-session pipeline
    // re-entered through SQL text (the reference's SESSION group window
    // → the merging SessionWindowAssigner). Same readback rollup and
    // oracle as q250.
    "q338_stream_sql_session" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events").select(col("user_id"), col("ts"))
      val maxTs = maxTsOf(ev, "ts")
      val sentinel = s.range(1)
        .select(lit(-1L).as("user_id"),
                lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                  .cast("timestamp").as("ts"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q338_v", src, tsCol = "ts",
          delay = "1 second")
        try {
          val res = graft.operators.SqlFrontend.sql(s,
            """SELECT user_id, COUNT(*) AS n_events
               FROM q338_v
               GROUP BY SESSION(ts, INTERVAL '30' MINUTE), user_id""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q338_v")
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
             sum(col("n_events")).as("n_events"),
             max(col("n_events")).as("max_session"))
    }),

    // STRING-keyed streaming OVER aggregate from SQL text — the
    // time-domain routes' generic-key support (the changelog family's
    // round-13 move applied to StreamSqlTime): running SUM(n_chars) per
    // SOURCE over the documents stream, no user-side hashing — the
    // router resolves the key type (string → canonical-string state
    // keys). Event time derives from doc_id (documents carry no
    // timestamp), mirrored exactly in the oracle's ORDER BY doc_id.
    "q339_stream_sql_string_over" -> ((s, dir) => {
      // ets = epoch-2000 + doc_id seconds: the +base keeps doc_id 0 off
      // the epoch-0 initial watermark (a ts-0 row would read as late)
      val tsBase = 946684800000L
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
                timestamp_millis(col("doc_id") * 1000 + tsBase).as("ets"))
      val maxId = maxLongOf(docs, "doc_id")
      val sentinel = s.range(1)
        .select(lit(maxId + 8640000L).as("doc_id"),
                lit("zz_sentinel").as("source"),
                lit(0L).cast(docs.schema("n_chars").dataType).as("n_chars"),
                timestamp_millis(lit(maxId + 8640000L) * 1000 + tsBase)
                  .as("ets"))
      val (in, out, ck) = stageOrdered(docs, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q339_v", src, tsCol = "ets",
          delay = "1 second", rowId = Some("doc_id"))
        try {
          val res = graft.operators.SqlFrontend.sql(s,
            """SELECT source, doc_id,
                      SUM(n_chars) OVER (PARTITION BY source
                        ORDER BY ets, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS run_chars
               FROM q339_v""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q339_v")
      }
      s.read.parquet(out).filter(col("source") =!= "zz_sentinel")
        .select(col("source"), col("doc_id"),
                col("run_chars").cast("long").as("run_chars"))
    }),

    // MULTIPLE aggregates in ONE streaming OVER statement — one state
    // buffer serving five folds (OverWindow.overAggMulti, the
    // aggregateChangelogMulti architecture applied to over-windows; the
    // reference's StreamExecOverAggregate similarly hosts the whole
    // aggCall list in one generated AggsHandleFunction). Exact-cents
    // operands; AVG is the same sum/count division on both sides.
    "q340_stream_sql_multi_over" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
                col("ts").as("ets"))
      val maxTs = maxTsOf(ev, "ets")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(0.0).as("value"), lit(sentTs).cast("timestamp").as("ets"))
      val (in, out, ck) = stageOrdered(ev, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q340_v", src, tsCol = "ets",
          delay = "1 second", rowId = Some("event_id"))
        try {
          val w = "PARTITION BY user_id ORDER BY ets, event_id " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
          val res = graft.operators.SqlFrontend.sql(s,
            s"""SELECT user_id, event_id,
                      SUM(floor(value * 100)) OVER ($w) AS s_c,
                      COUNT(*) OVER ($w) AS n,
                      MIN(floor(value * 100)) OVER ($w) AS mn_c,
                      MAX(floor(value * 100)) OVER ($w) AS mx_c,
                      AVG(floor(value * 100)) OVER ($w) AS avg_c
               FROM q340_v""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q340_v")
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .select(col("user_id"), col("event_id"),
                col("s_c").cast("long").as("s_c"), col("n"),
                col("mn_c").cast("long").as("mn_c"),
                col("mx_c").cast("long").as("mx_c"), col("avg_c"))
    }),

    // LAG from streaming SQL — the reference's OffsetOverFrame family
    // planned from `LAG(v, n) OVER (PARTITION BY … ORDER BY rowtime)`;
    // routed onto OverWindow.overOffset (every row emits exactly once
    // behind the watermark, first-per-key rows with SQL's NULL
    // default). Oracle: the batch lag() dual.
    "q341_stream_sql_lag" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
                col("ts").as("ets"))
      val maxTs = maxTsOf(ev, "ets")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(0.0).as("value"), lit(sentTs).cast("timestamp").as("ets"))
      val (in, out, ck) = stageOrdered(ev, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q341_v", src, tsCol = "ets",
          delay = "1 second", rowId = Some("event_id"))
        try {
          val res = graft.operators.SqlFrontend.sql(s,
            """SELECT user_id, event_id,
                      LAG(floor(value * 100), 1) OVER (PARTITION BY user_id
                        ORDER BY ets, event_id) AS prev_c
               FROM q341_v""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q341_v")
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .select(col("user_id"), col("event_id"),
                col("prev_c").cast("long").as("prev_c"))
    }),

    // Streaming-SQL INTERSECT — the reference's stream set-op rewrite
    // (ReplaceIntersectWithSemiJoinRule: distinct aggregate over ALL
    // columns + SEMI join), routed onto distinctChangelog + the
    // changelog semi join keyed on the projected row's canonical
    // UnsafeRow image. The (user, count) pairs of the purchase and
    // click aggregate views churn on every event, so mid-replay a pair
    // repeatedly enters and leaves the intersection — the retraction
    // path is load-bearing, not incidental.
    "q342_stream_sql_intersect" -> ((s, dir) => {
      val (side, out, ck) = purchaseClickViews(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q342_p", side("purchase"), "kind")
        StreamSql.registerChangelog("q342_c", side("click"), "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key, cnt FROM q342_p
               INTERSECT
               SELECT key, cnt FROM q342_c""")
          val q = j.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.withColumn("mk", concat_ws("#", col("key"), col("cnt")))
                .write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropChangelog("q342_p"); StreamSql.dropChangelog("q342_c")
        }
      }
      Changelog.materialize(s.read.parquet(out), "mk", "row_kind", "row_ord")
        .select(col("key").as("user_id"), col("cnt"))
    }),

    // Streaming-SQL EXCEPT (ReplaceMinusWithAntiJoinRule: distinct
    // aggregate + ANTI join) with changelog-MODE branch WHERE filters:
    // users with ≥ 2 purchases minus users with ≥ 8 clicks. A user
    // crossing either threshold mid-replay flips membership — the
    // anti join's 0↔1 association transitions and the filter's
    // explicit -D both exercise live.
    "q343_stream_sql_except" -> ((s, dir) => {
      val (side, out, ck) = purchaseClickViews(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q343_p", side("purchase"), "kind",
          rowId = Some("key"))
        StreamSql.registerChangelog("q343_c", side("click"), "kind",
          rowId = Some("key"))
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT key FROM q343_p WHERE cnt >= 2
               EXCEPT
               SELECT key FROM q343_c WHERE cnt >= 8""")
          val q = j.writeStream
            .option("checkpointLocation", ck)
            .outputMode("append")
            .foreachBatch { (batch: DataFrame, bid: Long) =>
              batch.write.mode("append").parquet(out)
            }
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropChangelog("q343_p"); StreamSql.dropChangelog("q343_c")
        }
      }
      Changelog.materialize(s.read.parquet(out), "key", "row_kind", "row_ord")
        .select(col("key").as("user_id"))
    }),

    // q258's MATCH_RECOGNIZE pipeline re-entered through the UNIFIED
    // SQL entry: the statement text names a registerStream view and
    // SqlFrontend.sql routes it to MatchRecognizeSql.streamSql — the
    // reference plans StreamExecMatch from the one sqlQuery entry
    // (StreamExecMatch.scala:68). ONE ROW PER MATCH emits straight from
    // the NFA (each match as one row; MEASURES collapse statelessly
    // over the packed-rows array — no foreachBatch completion), so the
    // sink is a plain append parquet writeStream. Integer-cents sum
    // keeps the double-accumulating SUM fold bit-exact vs the oracle.
    "q344_stream_sql_match_recognize" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts").as("ets"),
                col("event_type"), col("value"))
      val maxTs = maxTsOf(ev, "ets")
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                  .cast("timestamp").as("ets"),
                lit("zz_sentinel").as("event_type"), lit(0.0).as("value"))
      val (in, out, ck) = stageOrdered(ev, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q344_v", src, tsCol = "ets",
          delay = "1 second")
        try {
          val res = graft.operators.SqlFrontend.sql(s, """
            SELECT * FROM q344_v MATCH_RECOGNIZE (
              PARTITION BY user_id
              ORDER BY ets, event_id
              MEASURES FIRST(A.event_id) AS a_id,
                       LAST(B.event_id) AS last_b_id,
                       COUNT(B.*) AS n_b,
                       CAST(SUM(floor(value * 100)) AS BIGINT) AS cents_total
              ONE ROW PER MATCH
              AFTER MATCH SKIP PAST LAST ROW
              PATTERN (A B+) WITHIN INTERVAL '1' DAY
              DEFINE A AS event_type = 'purchase',
                     B AS event_type = 'click')""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q344_v")
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .select(col("user_id"), col("mr_match"), col("a_id"),
                col("last_b_id"), col("n_b"), col("cents_total"))
    }),

    // LEAD from streaming SQL — q341's sibling, the other direction of
    // the reference's OffsetOverFrame. Emit-once-offset-row-final
    // holdback semantics (OverWindow.overOffset lead=true): a row emits
    // only when its offset row is itself final, so each key's trailing
    // `offset` rows are WITHHELD (on an unbounded stream "no next row
    // yet" is undefined, not NULL) — the oracle therefore excludes each
    // key's last row rather than padding it with NULL.
    "q345_stream_sql_lead" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
                col("ts").as("ets"))
      val maxTs = maxTsOf(ev, "ets")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(0.0).as("value"), lit(sentTs).cast("timestamp").as("ets"))
      val (in, out, ck) = stageOrdered(ev, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q345_v", src, tsCol = "ets",
          delay = "1 second", rowId = Some("event_id"))
        try {
          val res = graft.operators.SqlFrontend.sql(s,
            """SELECT user_id, event_id,
                      LEAD(floor(value * 100), 1) OVER (PARTITION BY user_id
                        ORDER BY ets, event_id) AS next_c
               FROM q345_v""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q345_v")
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .select(col("user_id"), col("event_id"),
                col("next_c").cast("long").as("next_c"))
    }),

    // Chained streaming SQL ACROSS time domains — the group-window
    // route's append output feeding the changelog family, the
    // reference's StreamExecGroupWindowAggregate → StreamExecRank
    // composition planned from nested SQL (its changelog-mode inference
    // wires the window agg's insert-only output into the rank state).
    // Statement 1: GROUP BY TUMBLE day windows per event_type (Spark's
    // native watermarked window aggregate, append mode — windows
    // finalize behind the watermark batch by batch). Its result
    // registers as an insert-only changelog view (kind = +I, upsert key
    // = the window start) for statement 2: a SQL Top-2 busiest windows
    // per event_type by cents, whose retractable rank state churns as
    // later-finalizing windows displace earlier leaders mid-replay.
    "q346_stream_sql_window_chain" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.table(s, dir, "events")
        .select(col("event_type"), col("ts"), col("value"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit("zz_sentinel").as("event_type"),
                lit(sentTs).cast("timestamp").as("ts"), lit(0.0).as("value"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q346_v", src, tsCol = "ts",
          delay = "1 second")
        try {
          val g = graft.operators.SqlFrontend.sql(s,
            """SELECT event_type, TUMBLE_START(ts, INTERVAL '1' DAY) AS ws,
                      SUM(floor(value * 100)) AS cents
               FROM q346_v GROUP BY TUMBLE(ts, INTERVAL '1' DAY), event_type""")
          StreamSql.registerChangelog("q346_g",
            g.withColumn("kind", lit("+I"))
             .withColumn("w_us", unix_micros(col("ws"))),
            "kind", rowId = Some("w_us"))
          try {
            val t = graft.operators.SqlFrontend.sql(s,
              """SELECT event_type, w_us, cents FROM (
                   SELECT event_type, w_us, cents,
                          ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents DESC, w_us) AS rn
                   FROM q346_g) t WHERE rn <= 2""")
            val q = t.writeStream.format("parquet")
              .option("path", out).option("checkpointLocation", ck)
              .outputMode("append")
              .start()
            q.processAllAvailable(); q.stop()
          } finally StreamSql.dropChangelog("q346_g")
        } finally StreamSql.dropStream("q346_v")
      }
      val fin = Changelog.materialize(
        s.read.parquet(out)
          .withColumn("mk", concat_ws("#", col("event_type"), col("w_us"))),
        "mk", "row_kind", "row_ord")
      fin.filter(col("event_type") =!= "zz_sentinel")
        .select(col("event_type"), col("w_us"),
                col("cents").cast("long").as("cents"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("cents").desc, col("w_us"))).cast("int"))
        .select(col("event_type"), col("rnk"), col("w_us"), col("cents"))
    }),

    // SELECT DISTINCT from streaming SQL — the reference plans distinct
    // on an updating input as an Aggregate with no aggregate calls
    // (grouped on all columns), sharing the set-op rewrite's distinct
    // machinery. Here the per-user purchase sums churn on every event,
    // so a residue class (sum mod 1000) repeatedly enters and leaves
    // the distinct set mid-replay — the 1→0 -D transitions are
    // load-bearing. Final materialized set = distinct residues of the
    // FINAL per-user sums.
    "q347_stream_sql_select_distinct" -> ((s, dir) => {
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q347_p", view, "kind")
        try {
          val d = graft.operators.SqlFrontend.sql(s,
            "SELECT DISTINCT CAST(amt_c AS BIGINT) % 1000 AS r FROM q347_p")
          val q = d.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q347_p")
      }
      Changelog.materialize(s.read.parquet(out), "r", "row_kind", "row_ord")
        .select(col("r"))
    }),

    // ORDER BY … LIMIT from streaming SQL — the reference's
    // StreamExecSortLimit, a GLOBAL updating Top-N (no PARTITION BY):
    // the top-5 users by live purchase cents. Per-user sums churn on
    // every replayed batch, so leaders are displaced and re-admitted
    // mid-replay; the final live set equals the batch ORDER BY/LIMIT.
    "q348_stream_sql_sort_limit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q348_p", view, "kind",
          rowId = Some("key"))
        try {
          val t = graft.operators.SqlFrontend.sql(s,
            "SELECT key, amt_c FROM q348_p ORDER BY amt_c DESC, key LIMIT 5")
          val q = t.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropChangelog("q348_p")
      }
      Changelog.materialize(s.read.parquet(out), "key", "row_kind", "row_ord")
        .select(col("key").as("user_id"),
                col("amt_c").cast("long").as("cents"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("cents").desc, col("user_id"))).cast("int"))
        .select(col("user_id"), col("rnk"), col("cents"))
    }),

    // SELECT DISTINCT over an APPEND stream view — running distinct on
    // an insert-only input (the reference's group aggregate without
    // aggregate calls over an append table; result insert-only). Each
    // distinct (event_type, value-bucket) pair emits exactly once, on
    // its first occurrence mid-replay; WHERE is a stateless pre-filter.
    "q349_stream_sql_append_distinct" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_type"), col("value"), col("ts"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        StreamSql.registerStream("q349_v", src, tsCol = "ts",
          delay = "1 second")
        try {
          val d = graft.operators.SqlFrontend.sql(s,
            """SELECT DISTINCT event_type,
                      CAST(floor(value * 10) AS BIGINT) % 7 AS b
               FROM q349_v WHERE value >= 0""")
          val q = d.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q349_v")
      }
      // insert-only by construction: every row is a first occurrence
      s.read.parquet(out).select(col("event_type"), col("b"))
    }),

    // The SQL DDL front door END-TO-END (the reference's executeSql
    // surface — SqlToOperationConverter statement dispatch +
    // parserImpls.ftl WATERMARK grammar): the ENTIRE pipeline enters as
    // SQL text. CREATE TABLE over the staged replay directory with a
    // WATERMARK clause (→ the monitoring file source registered as a
    // stream view under the covers), CREATE TABLE for the filesystem
    // sink, INSERT INTO with a streaming group-window statement whose
    // result lands in the sink exactly-once per micro-batch. Day-tumble
    // cents per event_type; sentinel staging finalizes the trailing
    // windows (the q346 harness).
    "q350_sql_ddl_pipeline" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_type"), col("ts"), col("value"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit("zz_sentinel").as("event_type"),
                lit(sentTs).cast("timestamp").as("ts"), lit(0.0).as("value"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        import graft.operators.SqlDdl
        try {
          SqlDdl.executeAll(s, s"""
            CREATE TABLE q350_src (event_type STRING, ts TIMESTAMP,
              value DOUBLE,
              WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
            WITH ('connector' = 'filesystem', 'path' = '$in',
                  'format' = 'parquet', 'source.max-files-per-trigger' = '1');
            CREATE TABLE q350_sink (event_type STRING, ws TIMESTAMP,
                                    cents BIGINT, n BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '$out',
                  'format' = 'parquet', 'sink.checkpoint' = '$ck')""")
          SqlDdl.executeSql(s, """
            INSERT INTO q350_sink
            SELECT event_type, TUMBLE_START(ts, INTERVAL '1' DAY) AS ws,
                   SUM(floor(value * 100)) AS cents, COUNT(*) AS n
            FROM q350_src GROUP BY TUMBLE(ts, INTERVAL '1' DAY), event_type""")
            .await()
        } finally {
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q350_src")
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q350_sink")
        }
      }
      s.read.parquet(out).filter(col("event_type") =!= "zz_sentinel")
        .select(col("event_type"), unix_micros(col("ws")).as("w_us"),
                col("cents"), col("n"))
    }),

    // Streaming MATCH_RECOGNIZE — ALL ROWS PER MATCH **with MEASURES**
    // (the reference's per-row RUNNING/FINAL measure evaluation,
    // MatchCodeGenerator RUNNING semantics per visited row). q344's
    // harness; matches emit from the NFA as packed-rows arrays, the
    // RUNNING folds evaluate statelessly over each row's match PREFIX
    // and FINAL over the whole array — no second stateful operator.
    "q352_stream_mr_all_rows_measures" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts").as("ets"),
                col("event_type"), col("value"))
      val maxTs = maxTsOf(ev, "ets")
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                  .cast("timestamp").as("ets"),
                lit("zz_sentinel").as("event_type"), lit(0.0).as("value"))
      val (in, out, ck) = stageOrdered(ev, "ets", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q352_v", src, tsCol = "ets",
          delay = "1 second")
        try {
          val res = graft.operators.SqlFrontend.sql(s, """
            SELECT * FROM q352_v MATCH_RECOGNIZE (
              PARTITION BY user_id
              ORDER BY ets, event_id
              MEASURES COUNT(*) AS k,
                       RUNNING CAST(SUM(floor(value * 100)) AS BIGINT)
                         AS run_cents,
                       FINAL COUNT(B.*) AS n_b,
                       CLASSIFIER() AS cls
              ALL ROWS PER MATCH
              AFTER MATCH SKIP PAST LAST ROW
              PATTERN (A B+) WITHIN INTERVAL '1' DAY
              DEFINE A AS event_type = 'purchase',
                     B AS event_type = 'click')""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q352_v")
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .select(col("user_id"), col("event_id"), col("mr_match"),
                col("mr_seq"), col("k"), col("run_cents"), col("n_b"),
                col("cls"))
    }),

    // MIXED-DOMAIN streaming-SQL join: the raw purchase APPEND view
    // (registerStream) joined to the churning per-user click aggregate
    // CHANGELOG view through one SQL statement — the reference joins an
    // insert-only table with an updating table via changelog-mode
    // inference (an append input is a changelog that never retracts,
    // FlinkChangelogModeInferenceProgram.scala). The click sums churn
    // on every replayed batch, so earlier-paired purchases retract and
    // re-emit; the final materialized state pairs EVERY purchase event
    // with the user's FINAL click aggregate — the batch inner dual.
    "q353_stream_sql_mixed_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("event_type"),
                floor(col("value") * 100).as("cents"), col("ts"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        val purchases = src.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("cents"), col("ts"))
        StreamSql.registerStream("q353_p", purchases, tsCol = "ts",
          delay = "1 second")
        val clicks = Changelog.aggregateChangelog[Long, EvRow](
            src.filter(col("event_type") === "click")
              .select(col("user_id"), col("event_type"), col("cents"))
              .as[EvRow].groupByKey(_.user_id),
            _ => Changelog.Insert, _.cents.toDouble)
          .map(a => (a.key, a.kind, a.sum))
          .toDF("key", "kind", "click_c")
        StreamSql.registerChangelog("q353_c", clicks, "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT q353_p.event_id AS eid, q353_p.cents AS pcents,
                      q353_c.click_c AS click_c
               FROM q353_p JOIN q353_c ON q353_p.user_id = q353_c.key""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropStream("q353_p"); StreamSql.dropChangelog("q353_c")
        }
      }
      Changelog.materialize(s.read.parquet(out), "eid", "row_kind", "row_ord")
        .select(col("eid"), col("pcents").cast("long").as("pcents"),
                col("click_c").cast("long").as("click_c"))
    }),

    // DYNAMIC-gap SESSION from SQL TEXT — q259's pipeline (the
    // reference's DynamicEventTimeSessionWindows +
    // SessionWindowTimeGapExtractor) re-entered as a SQL statement: the
    // SESSION gap is a per-row CASE expression (purchases hold sessions
    // open 60 min, everything else 30 min), routed by
    // StreamSqlTime.groupWindow onto StreamOps.dynamicSessionAgg.
    // Oracle: the same relational session reconstruction as q259.
    "q354_stream_sql_dynamic_session" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
      val maxTs = maxTsOf(ev, "ts")
      val sentinel = s.range(1)
        .select(lit(-1L).as("user_id"),
                lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                  .cast("timestamp").as("ts"),
                lit("zz_sentinel").as("event_type"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        StreamSql.registerStream("q354_v", src, tsCol = "ts",
          delay = "1 second")
        try {
          val res = graft.operators.SqlFrontend.sql(s,
            """SELECT user_id, COUNT(*) AS n_events
               FROM q354_v
               GROUP BY SESSION(ts, CASE WHEN event_type = 'purchase'
                                         THEN INTERVAL '60' MINUTE
                                         ELSE INTERVAL '30' MINUTE END),
                        user_id""")
          val q = res.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q354_v")
      }
      s.read.parquet(out).filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
             sum(col("n_events")).as("n_events"),
             max(col("n_events")).as("max_session"))
    }),

    // COMPOSITE-key + CROSS-SIDE-residual streaming-SQL join: two
    // churning per-(user_id, event_type) aggregate changelogs joined on
    // BOTH key columns (one packed-struct state key — the reference's
    // multi-field BinaryRowData key selector) with a residual comparing
    // columns ACROSS the sides (l.sum_c > r.cnt * 10 — compiled into
    // the operator's condition, the reference's generated
    // JoinCondition). Aggregates churn per replayed batch, so pairs
    // retract and re-emit; the final materialized state equals the
    // batch dual joining the FINAL aggregates under the residual.
    "q355_stream_sql_composite_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
                floor(col("value") * 100).as("cents"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        def agg(side: org.apache.spark.sql.DataFrame, v: EvRow => Double) =
          Changelog.aggregateChangelog[(Long, String), EvRow](
              side.select(col("user_id"), col("event_type"), col("cents"))
                .as[EvRow].groupByKey(r => (r.user_id, r.event_type)),
              _ => Changelog.Insert, v)
            .map(a => (a.key._1, a.key._2, a.kind, a.sum))
        StreamSql.registerChangelog("q355_l",
          agg(src.filter(col("event_id") % 2 === 0), _.cents.toDouble)
            .toDF("uid", "etype", "kind", "sum_c"), "kind")
        StreamSql.registerChangelog("q355_r",
          agg(src.filter(col("event_id") % 2 === 1), _ => 1.0)
            .toDF("uid", "etype", "kind", "cnt"), "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT l.uid AS uid, l.etype AS etype,
                      l.sum_c AS sum_c, r.cnt AS cnt
               FROM q355_l l JOIN q355_r r
               ON l.uid = r.uid AND l.etype = r.etype
                  AND l.sum_c > r.cnt * 10""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropChangelog("q355_l"); StreamSql.dropChangelog("q355_r")
        }
      }
      Changelog.materialize(
          s.read.parquet(out)
            .withColumn("mid", concat_ws("|", col("uid"), col("etype"))),
          "mid", "row_kind", "row_ord")
        .select(col("uid"), col("etype"),
                col("sum_c").cast("long").as("sum_c"),
                col("cnt").cast("long").as("cnt"))
    }),

    // NOT EXISTS with a COMPOSITE key and a CROSS-SIDE residual: q355's
    // two churning aggregates through the anti route — the residual
    // references the OUTER row, so it evaluates in the operator's
    // condition (a failing outer row must still EMIT under NOT EXISTS;
    // no pre-filter can express that). Final state = final outer
    // aggregates with NO inner partner satisfying the residual.
    "q356_stream_sql_exists_residual" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
                floor(col("value") * 100).as("cents"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        def agg(side: org.apache.spark.sql.DataFrame, v: EvRow => Double) =
          Changelog.aggregateChangelog[(Long, String), EvRow](
              side.select(col("user_id"), col("event_type"), col("cents"))
                .as[EvRow].groupByKey(r => (r.user_id, r.event_type)),
              _ => Changelog.Insert, v)
            .map(a => (a.key._1, a.key._2, a.kind, a.sum))
        StreamSql.registerChangelog("q356_l",
          agg(src.filter(col("event_id") % 2 === 0), _.cents.toDouble)
            .toDF("uid", "etype", "kind", "sum_c"), "kind")
        StreamSql.registerChangelog("q356_r",
          agg(src.filter(col("event_id") % 2 === 1), _ => 1.0)
            .toDF("uid", "etype", "kind", "cnt"), "kind")
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT l.uid AS uid, l.etype AS etype, l.sum_c AS sum_c
               FROM q356_l l
               WHERE NOT EXISTS (SELECT 1 FROM q356_r r
                                 WHERE r.uid = l.uid AND r.etype = l.etype
                                   AND l.sum_c > r.cnt * 3000)""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropChangelog("q356_l"); StreamSql.dropChangelog("q356_r")
        }
      }
      Changelog.materialize(
          s.read.parquet(out)
            .withColumn("mid", concat_ws("|", col("uid"), col("etype"))),
          "mid", "row_kind", "row_ord")
        .select(col("uid"), col("etype"),
                col("sum_c").cast("long").as("sum_c"))
    }),

    // The reference's HELLO-WORLD pipeline, entirely as SQL TEXT:
    // watermarked source DDL → UNWINDOWED GROUP BY over the insert-only
    // table (the day-one updating aggregate — the append view lifts to
    // a constant-+I changelog via changelog-mode inference) → INSERT
    // INTO a PRIMARY KEY sink (the reference's upsert table sink: each
    // micro-batch merges by key keeping the highest row_ord, retracted
    // keys disappear from the readable view) → SELECT the live rows.
    // Aggregates churn per replayed batch, so every key is upserted
    // repeatedly before settling on its final value — the batch dual.
    "q358_sql_upsert_sink_pipeline" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
                floor(col("value") * 100).cast("long").as("cents"), col("ts"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        import graft.operators.SqlDdl
        try {
          SqlDdl.executeAll(s, s"""
            CREATE TABLE q358_src (event_id BIGINT, user_id BIGINT,
              cents BIGINT, ts TIMESTAMP,
              WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
            WITH ('connector' = 'filesystem', 'path' = '$in',
                  'format' = 'parquet', 'source.max-files-per-trigger' = '2');
            CREATE TABLE q358_sink (user_id BIGINT, amt BIGINT, n BIGINT,
              PRIMARY KEY (user_id) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$out',
                  'format' = 'parquet', 'sink.checkpoint' = '$ck')""")
          SqlDdl.executeSql(s, """
            INSERT INTO q358_sink
            SELECT user_id, SUM(cents) AS amt, COUNT(*) AS n
            FROM q358_src GROUP BY user_id""").await()
          SqlDdl.executeSql(s,
            "SELECT user_id, amt, n FROM q358_sink").df.get
        } finally {
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q358_src")
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q358_sink")
        }
      }
    }),

    // APPEND-ONLY Top-N from SQL TEXT — the reference's
    // AppendOnlyTopNFunction (the rank rule planned over an insert-only
    // input): per event_type, the 3 highest cents seen; the stream view
    // lifts to a constant-+I changelog, and although the INPUT never
    // retracts, the rank's own state churns as later leaders displace
    // earlier ones mid-replay. Final state = the batch row_number dual.
    "q359_stream_sql_append_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("event_type"),
                floor(col("value") * 100).cast("long").as("cents"),
                col("ts"))
      val (in, out, ck) = stage(ev, 4)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        StreamSql.registerStream("q359_v", src, tsCol = "ts",
          delay = "1 second", rowId = Some("event_id"))
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT etype, event_id, cents FROM (
                 SELECT event_type AS etype, event_id, cents,
                        ROW_NUMBER() OVER (PARTITION BY event_type
                                           ORDER BY cents DESC, event_id)
                          AS rn
                 FROM q359_v) t WHERE rn <= 3""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally StreamSql.dropStream("q359_v")
      }
      val fin = Changelog.materialize(
        s.read.parquet(out)
          .withColumn("mk", concat_ws("#", col("etype"), col("event_id"))),
        "mk", "row_kind", "row_ord")
      fin.select(col("etype"), col("event_id"),
                 col("cents").cast("long").as("cents"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("etype"))
            .orderBy(col("cents").desc, col("event_id"))).cast("int"))
        .select(col("etype"), col("rnk"), col("event_id"), col("cents"))
    }),

    // STATEMENT SET — the reference's TableEnvironment.createStatementSet
    // (StatementSet.java, the endorsed multi-sink path): ONE watermarked
    // source DDL feeds TWO INSERT INTO sinks submitted as one unit
    // (`BEGIN STATEMENT SET; …; END`): a day-tumble aggregate into an
    // append sink AND an unwindowed per-user aggregate into a PRIMARY
    // KEY upsert sink. Both members START before the combined await, so
    // their micro-batches interleave; the result unions both sinks
    // under a tag so one oracle covers the whole set.
    "q360_sql_statement_set" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
                col("ts"), col("value"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit("zz_sentinel").as("event_type"),
                lit(sentTs).cast("timestamp").as("ts"), lit(0.0).as("value"))
      val (in, outA, _) = stageOrdered(ev, "ts", 2, sentinel)
      val outB = java.nio.file.Files.createTempDirectory("q360b").toString
      withStatePartitions(s, 8) {
        import graft.operators.SqlDdl
        try {
          SqlDdl.executeAll(s, s"""
            CREATE TABLE q360_src (event_id BIGINT, user_id BIGINT,
              event_type STRING, ts TIMESTAMP, value DOUBLE,
              WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
            WITH ('connector' = 'filesystem', 'path' = '$in',
                  'format' = 'parquet', 'source.max-files-per-trigger' = '1');
            CREATE TABLE q360_a (event_type STRING, ws TIMESTAMP,
                                 cents BIGINT, n BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '$outA');
            CREATE TABLE q360_b (user_id BIGINT, amt BIGINT, n BIGINT,
              PRIMARY KEY (user_id) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$outB/t')""")
          SqlDdl.executeAll(s, """
            BEGIN STATEMENT SET;
            INSERT INTO q360_a
            SELECT event_type, TUMBLE_START(ts, INTERVAL '1' DAY) AS ws,
                   SUM(floor(value * 100)) AS cents, COUNT(*) AS n
            FROM q360_src GROUP BY TUMBLE(ts, INTERVAL '1' DAY), event_type;
            INSERT INTO q360_b
            SELECT user_id, SUM(floor(value * 100)) AS amt, COUNT(*) AS n
            FROM q360_src WHERE event_type = 'purchase' GROUP BY user_id;
            END""").last.await()
          val a = s.read.parquet(outA)
            .filter(col("event_type") =!= "zz_sentinel")
            .select(concat_ws("|", lit("t"), col("event_type"),
                              unix_micros(col("ws"))).as("k"),
                    col("cents").as("a"), col("n").as("b"))
          val b = SqlDdl.executeSql(s,
              "SELECT user_id, amt, n FROM q360_b").df.get
            .select(concat_ws("|", lit("u"), col("user_id")).as("k"),
                    col("amt").as("a"), col("n").as("b"))
          a.unionByName(b)
        } finally {
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q360_src")
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q360_a")
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q360_b")
        }
      }
    }),

    // COMPOSITE PRIMARY KEY upsert sink from SQL text — q355's two
    // churning per-(user_id, event_type) aggregate changelogs joined on
    // both key columns, landed via `INSERT INTO` a `PRIMARY KEY
    // (uid, etype) NOT ENFORCED` table (the reference's
    // SqlTableConstraint column list, parserImpls.ftl:615): the keyed
    // merge buckets on BOTH columns, and the readable live view equals
    // q355's materialization — the batch dual joining the final
    // aggregates under the residual.
    "q361_sql_composite_pk_sink" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
                floor(col("value") * 100).as("cents"))
      val (in, _, ck) = stage(ev, 4)
      val out = java.nio.file.Files.createTempDirectory("q361").toString
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        def agg(side: org.apache.spark.sql.DataFrame, v: EvRow => Double) =
          Changelog.aggregateChangelog[(Long, String), EvRow](
              side.select(col("user_id"), col("event_type"), col("cents"))
                .as[EvRow].groupByKey(r => (r.user_id, r.event_type)),
              _ => Changelog.Insert, v)
            .map(a => (a.key._1, a.key._2, a.kind, a.sum))
        StreamSql.registerChangelog("q361_l",
          agg(src.filter(col("event_id") % 2 === 0), _.cents.toDouble)
            .toDF("uid", "etype", "kind", "sum_c"), "kind")
        StreamSql.registerChangelog("q361_r",
          agg(src.filter(col("event_id") % 2 === 1), _ => 1.0)
            .toDF("uid", "etype", "kind", "cnt"), "kind")
        import graft.operators.SqlDdl
        try {
          SqlDdl.executeSql(s, s"""
            CREATE TABLE q361_sink (uid BIGINT, etype STRING,
              sum_c BIGINT, cnt BIGINT,
              PRIMARY KEY (uid, etype) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$out/t',
                  'sink.checkpoint' = '$ck')""")
          SqlDdl.executeSql(s, """
            INSERT INTO q361_sink
            SELECT l.uid AS uid, l.etype AS etype,
                   l.sum_c AS sum_c, r.cnt AS cnt
            FROM q361_l l JOIN q361_r r
            ON l.uid = r.uid AND l.etype = r.etype
               AND l.sum_c > r.cnt * 10""").await()
          SqlDdl.executeSql(s,
            "SELECT uid, etype, sum_c, cnt FROM q361_sink").df.get
        } finally {
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q361_sink")
          StreamSql.dropChangelog("q361_l"); StreamSql.dropChangelog("q361_r")
        }
      }
    }),

    // Temporal-join RESIDUAL from SQL text — q331's row-time FOR
    // SYSTEM_TIME AS OF with a CROSS-SIDE residual conjunct
    // (v.v_value < p.p_value): the reference evaluates it in the
    // generated joinCondition AFTER the version lookup
    // (TemporalRowTimeJoinOperator — a failing residual does NOT fall
    // back to an earlier version; INNER drops the probe). The batch
    // dual picks the same as-of version (rn = 1) then applies the same
    // predicate.
    "q362_stream_sql_temporal_residual" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("event_id"), col("user_id"), col("ts"),
                col("event_type"), col("value"))
      val maxTs = maxTsOf(ev, "ts")
      val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
      val sentinel = s.range(1)
        .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
                lit(sentTs).cast("timestamp").as("ts"),
                lit("purchase").as("event_type"), lit(0.0).as("value"))
      val (in, out, ck) = stageOrdered(ev, "ts", 2, sentinel)
      withStatePartitions(s, 8) {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
        val probes = src.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                  col("value").as("p_value"), col("ts").as("p_ts"))
        val vers = src.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
                  col("event_id").as("v_id"), col("value").as("v_value"))
        StreamSql.registerStream("q362_p", probes, tsCol = "p_ts",
          delay = "1 second")
        StreamSql.registerStream("q362_v", vers, tsCol = "v_ts",
          delay = "1 second", rowId = Some("v_id"))
        try {
          val j = graft.operators.SqlFrontend.sql(s,
            """SELECT p.p_user AS p_user, p.p_id AS p_id,
                      p.p_value AS p_value, v.v_id AS v_id,
                      v.v_value AS v_value
               FROM q362_p p JOIN q362_v
                 FOR SYSTEM_TIME AS OF p.p_ts AS v
               ON p.p_user = v.v_user AND v.v_value < p.p_value""")
          val q = j.writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .outputMode("append")
            .start()
          q.processAllAvailable(); q.stop()
        } finally {
          StreamSql.dropStream("q362_p"); StreamSql.dropStream("q362_v")
        }
      }
      s.read.parquet(out).filter(col("p_user") >= 0)
    }),

    // INSERT OVERWRITE backfill from SQL text (the reference's
    // RichSqlInsert OVERWRITE + partitioned insert,
    // parserImpls.ftl:832-859): a PARTITIONED BY table backfilled
    // TWICE with the same statement (dynamic partition overwrite —
    // idempotence is the gate), then one partition re-backfilled via a
    // static PARTITION spec. Final contents = the plain batch
    // aggregate.
    "q363_sql_insert_overwrite" -> ((s, dir) => {
      import graft.operators.SqlDdl
      Tables.table(s, dir, "events").createOrReplaceTempView("q363_ev")
      val out = java.nio.file.Files.createTempDirectory("q363").toString
      try {
        SqlDdl.executeSql(s, s"""
          CREATE TABLE q363_t (user_id BIGINT, amt BIGINT, etype STRING)
          PARTITIONED BY (etype)
          WITH ('connector' = 'filesystem', 'path' = '$out/t')""")
        val backfill = """
          INSERT OVERWRITE q363_t
          SELECT user_id, CAST(sum(floor(value * 100)) AS BIGINT) AS amt,
                 event_type AS etype
          FROM q363_ev GROUP BY user_id, event_type"""
        SqlDdl.executeSql(s, backfill)
        SqlDdl.executeSql(s, backfill) // re-run: identical results
        SqlDdl.executeSql(s, """
          INSERT OVERWRITE q363_t PARTITION (etype='purchase')
          SELECT user_id, CAST(sum(floor(value * 100)) AS BIGINT) AS amt
          FROM q363_ev WHERE event_type = 'purchase' GROUP BY user_id""")
        SqlDdl.executeSql(s,
          "SELECT user_id, amt, etype FROM q363_t").df.get
      } finally {
        SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q363_t")
        s.catalog.dropTempView("q363_ev")
      }
    }),

    // MULTIPLEXED statement set — the reference's single-job scan
    // sharing (StatementSet plans N INSERTs as ONE job): two STATELESS
    // Calc members over ONE watermarked source run as ONE streaming
    // query whose foreachBatch persists each shared batch once and
    // applies both members' projections to it — the source is scanned
    // once per micro-batch regardless of member count (the day-two
    // fan-out shape the per-member model would scan N times).
    // Idempotent batch-id partitions land each member's slice.
    "q365_sql_statement_set_multiplex" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
                col("ts"), col("value"))
      val (in, outA, _) = stage(ev, 4)
      val outB = java.nio.file.Files.createTempDirectory("q365b").toString
      withStatePartitions(s, 8) {
        import graft.operators.SqlDdl
        try {
          SqlDdl.executeAll(s, s"""
            CREATE TABLE q365_src (event_id BIGINT, user_id BIGINT,
              event_type STRING, ts TIMESTAMP, value DOUBLE,
              WATERMARK FOR ts AS ts - INTERVAL '1' SECOND)
            WITH ('connector' = 'filesystem', 'path' = '$in',
                  'format' = 'parquet', 'source.max-files-per-trigger' = '1');
            CREATE TABLE q365_a (event_id BIGINT, cents BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '$outA');
            CREATE TABLE q365_b (event_id BIGINT, user_id BIGINT)
            WITH ('connector' = 'filesystem', 'path' = '$outB/t')""")
          val set = SqlDdl.executeAll(s, """
            BEGIN STATEMENT SET;
            INSERT INTO q365_a
            SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents
            FROM q365_src WHERE event_type = 'purchase';
            INSERT INTO q365_b
            SELECT event_id, user_id
            FROM q365_src WHERE event_type = 'click' AND user_id % 2 = 0;
            END""").last
          // the multiplexed plan is ONE query for the whole set
          require(set.query.nonEmpty && set.queries.isEmpty,
            "statement set did not multiplex")
          set.await()
          val a = SqlDdl.executeSql(s,
              "SELECT event_id, cents FROM q365_a").df.get
            .select(concat_ws("|", lit("p"), col("event_id")).as("k"),
                    col("cents").as("v"))
          val b = SqlDdl.executeSql(s,
              "SELECT event_id, user_id FROM q365_b").df.get
            .select(concat_ws("|", lit("c"), col("event_id")).as("k"),
                    col("user_id").as("v"))
          a.unionByName(b)
        } finally {
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q365_src")
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q365_a")
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q365_b")
        }
      }
    }),

    // CDC ingestion: debezium-json (the reference's flink-json
    // changelog format — DebeziumJsonDeserializationSchema's c/r/u/d
    // op mapping). A synthetic CDC log derived from events (insert
    // every entity, double the %5==0 ones via u with full before/after
    // images, delete the %7==0 ones via d) decodes expression-only
    // into a changelog view; a per-group SUM/COUNT aggregate
    // materializes into a PRIMARY KEY sink. SUM/COUNT are commutative
    // in +/- deltas, so the result is independent of envelope file
    // order — the final live rows equal the batch dual over the
    // surviving entities.
    "q366_cdc_debezium" -> ((s, dir) => {
      import graft.operators.SqlDdl
      val pt = "struct<id:bigint,grp:bigint,cents:bigint>"
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id").as("id"), (col("user_id") % 10).as("grp"),
                floor(col("value") * 100).cast("long").as("cents"))
      val payload = struct(col("id"), col("grp"), col("cents"))
      val cRows = ev.select(lit(null).cast(pt).as("before"),
        payload.as("after"), lit("c").as("op"))
      val uRows = ev.filter(col("id") % 5 === 0)
        .select(payload.as("before"),
          struct(col("id"), col("grp"),
                 (col("cents") * 2).as("cents")).as("after"),
          lit("u").as("op"))
      val dRows = ev.filter(col("id") % 7 === 0)
        .select(struct(col("id"), col("grp"),
            when(col("id") % 5 === 0, col("cents") * 2)
              .otherwise(col("cents")).as("cents")).as("before"),
          lit(null).cast(pt).as("after"), lit("d").as("op"))
      val in = stageJsonIn(cRows.unionByName(uRows).unionByName(dRows), 4)()
      val out = java.nio.file.Files.createTempDirectory("q366out").toString
      withStatePartitions(s, 8) {
        try {
          SqlDdl.executeAll(s, s"""
            CREATE TABLE q366_cdc (id BIGINT, grp BIGINT, cents BIGINT,
              PRIMARY KEY (id) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$in',
                  'format' = 'debezium-json',
                  'source.max-files-per-trigger' = '1');
            CREATE TABLE q366_sink (grp BIGINT, s BIGINT, n BIGINT,
              PRIMARY KEY (grp) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$out/t')""")
          SqlDdl.executeSql(s, """
            INSERT INTO q366_sink
            SELECT grp, SUM(cents) AS s, COUNT(*) AS n
            FROM q366_cdc GROUP BY grp""").await()
          SqlDdl.executeSql(s, "SELECT grp, s, n FROM q366_sink").df.get
        } finally {
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q366_cdc")
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q366_sink")
        }
      }
    }),

    // CDC ingestion: canal-json (CanalJsonDeserializationSchema) — the
    // UPDATE envelopes carry PARTIAL `old` rows (only the changed
    // column), so the -U before-image is the field-wise merge of old
    // over data; a wrong merge shifts entities across groups or
    // subtracts the wrong value. Same commutative-aggregate design as
    // q366 with different op populations.
    "q367_cdc_canal" -> ((s, dir) => {
      import graft.operators.SqlDdl
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id").as("id"), (col("user_id") % 8).as("grp"),
                floor(col("value") * 100).cast("long").as("cents"))
      val payload = struct(col("id"), col("grp"), col("cents"))
      val pArr = "array<struct<id:bigint,grp:bigint,cents:bigint>>"
      val iRows = ev.select(array(payload).as("data"),
        lit(null).cast(pArr).as("old"), lit("INSERT").as("type"))
      val uRows = ev.filter(col("id") % 4 === 0)
        .select(array(struct(col("id"), col("grp"),
            (col("cents") + 1000).as("cents"))).as("data"),
          // partial old: ONLY the changed column — id/grp come from data
          array(struct(lit(null).cast("bigint").as("id"),
                       lit(null).cast("bigint").as("grp"),
                       col("cents").as("cents"))).as("old"),
          lit("UPDATE").as("type"))
      val dRows = ev.filter(col("id") % 6 === 0)
        .select(array(struct(col("id"), col("grp"),
            when(col("id") % 4 === 0, col("cents") + 1000)
              .otherwise(col("cents")).as("cents"))).as("data"),
          lit(null).cast(pArr).as("old"), lit("DELETE").as("type"))
      val in = stageJsonIn(iRows.unionByName(uRows).unionByName(dRows), 4)()
      val out = java.nio.file.Files.createTempDirectory("q367out").toString
      withStatePartitions(s, 8) {
        try {
          SqlDdl.executeAll(s, s"""
            CREATE TABLE q367_cdc (id BIGINT, grp BIGINT, cents BIGINT,
              PRIMARY KEY (id) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$in',
                  'format' = 'canal-json',
                  'source.max-files-per-trigger' = '1');
            CREATE TABLE q367_sink (grp BIGINT, s BIGINT, n BIGINT,
              PRIMARY KEY (grp) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$out/t')""")
          SqlDdl.executeSql(s, """
            INSERT INTO q367_sink
            SELECT grp, SUM(cents) AS s, COUNT(*) AS n
            FROM q367_cdc GROUP BY grp""").await()
          SqlDdl.executeSql(s, "SELECT grp, s, n FROM q367_sink").df.get
        } finally {
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q367_cdc")
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q367_sink")
        }
      }
    }),

    // CDC ingestion under the reference's factory options
    // (DebeziumJsonFormatFactory SCHEMA_INCLUDE + IGNORE_PARSE_ERRORS):
    // every envelope arrives wrapped in Kafka Connect's
    // {"schema":…, "payload":{…}} form, and the log is NOISY — raw
    // non-JSON lines, unknown-op envelopes and an image-less `u`
    // envelope are interleaved with the real changes. The lenient
    // decode must skip each undecodable message WHOLE (keeping the +U
    // of a before-less update would corrupt the downstream sums) while
    // decoding everything else; the final live rows equal the batch
    // dual over the surviving entities.
    // Dynamic table options from SQL text (FLIP-113): the SAME table
    // scanned twice in one statement — once as declared, once with an
    // OPTIONS('path'=…) hint pointing the scan at a different
    // directory — under the reference's enable flag. The join of the
    // two aggregates proves the hint rebound ONLY its own scan.
    "q371_sql_options_hint" -> ((s, dir) => {
      import graft.operators.SqlDdl
      val in = java.nio.file.Files.createTempDirectory("q371").toString
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"))
      ev.filter(col("event_id") % 2 === 0)
        .write.mode("overwrite").parquet(in + "/a")
      ev.write.mode("overwrite").parquet(in + "/b")
      try {
        SqlDdl.executeAll(s, s"""
          CREATE TABLE q371_t (event_id BIGINT, user_id BIGINT)
          WITH ('connector' = 'filesystem', 'path' = '$in/a');
          SET 'table.dynamic-table-options.enabled' = 'true'""")
        SqlDdl.executeSql(s, s"""
          SELECT b.grp, b.n AS n_base, h.n AS n_hint
          FROM (SELECT user_id % 7 AS grp, count(*) AS n
                FROM q371_t GROUP BY user_id % 7) b
          JOIN (SELECT user_id % 7 AS grp, count(*) AS n
                FROM q371_t /*+ OPTIONS('path' = '$in/b') */
                GROUP BY user_id % 7) h
          ON b.grp = h.grp""").df.get
      } finally {
        SqlDdl.executeSql(s, "RESET 'table.dynamic-table-options.enabled'")
        SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q371_t")
      }
    }),

    // The round's full DDL statement surface as ONE batch pipeline in
    // SQL text: CREATE TABLE LIKE clones the source table's shape onto
    // a fresh directory (OVERWRITING OPTIONS + new 'path' — the
    // reference's standard SqlTableLike idiom), CREATE FUNCTION
    // registers a reflective ScalarFunction (`graft.functions
    // .FloorScale`, the reference's UserDefinedFunctionHelper eval
    // contract) used in both the INSERT's predicate and the view's
    // aggregate, ALTER TABLE RENAME and ALTER VIEW RENAME move the
    // surfaces mid-pipeline, and the final read goes through the
    // renamed view. The DuckDB dual re-expresses the function as plain
    // floor arithmetic.
    "q369_sql_ddl_lifecycle" -> ((s, dir) => {
      import graft.operators.SqlDdl
      val in = java.nio.file.Files.createTempDirectory("q369in").toString
      val out = java.nio.file.Files.createTempDirectory("q369out").toString
      Tables.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
                col("event_type"))
        .repartition(4).write.mode("overwrite").parquet(in + "/src")
      try {
        SqlDdl.executeAll(s, s"""
          CREATE TABLE q369_src (event_id BIGINT, user_id BIGINT,
            value DOUBLE, event_type STRING)
          WITH ('connector' = 'filesystem', 'path' = '$in/src');
          CREATE TABLE q369_stage
          WITH ('connector' = 'filesystem', 'path' = '$out/stage')
          LIKE q369_src (OVERWRITING OPTIONS);
          CREATE FUNCTION q369_cents AS 'graft.functions.FloorScale';
          INSERT INTO q369_stage
          SELECT event_id, user_id, value, event_type FROM q369_src
          WHERE q369_cents(value, 100) % 3 <> 0;
          ALTER TABLE q369_stage RENAME TO q369_final;
          CREATE VIEW q369_v AS
          SELECT user_id, count(*) AS n,
                 CAST(sum(q369_cents(value, 100)) AS BIGINT) AS cents
          FROM q369_final GROUP BY user_id;
          ALTER VIEW q369_v RENAME TO q369_res""")
        SqlDdl.executeSql(s,
          "SELECT user_id, n, cents FROM q369_res").df.get
      } finally {
        SqlDdl.executeSql(s, "DROP VIEW IF EXISTS q369_res")
        SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q369_final")
        SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q369_stage")
        SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q369_src")
        SqlDdl.executeSql(s, "DROP FUNCTION IF EXISTS q369_cents")
      }
    }),

    // ALTER TABLE ADD CONSTRAINT flips a keyless table to upsert
    // semantics mid-script: two batch INSERTs with overlapping keys
    // merge per key (the second statement's rows win where present —
    // SCD1), so the live view is a MIX of both statements' values.
    "q370_sql_add_constraint" -> ((s, dir) => {
      import graft.operators.SqlDdl
      Tables.table(s, dir, "events").createOrReplaceTempView("q370_ev")
      val out = java.nio.file.Files.createTempDirectory("q370").toString
      try {
        SqlDdl.executeAll(s, s"""
          CREATE TABLE q370_t (user_id BIGINT, n BIGINT)
          WITH ('connector' = 'filesystem', 'path' = '$out/t');
          ALTER TABLE q370_t ADD CONSTRAINT q370_pk
            PRIMARY KEY (user_id) NOT ENFORCED;
          INSERT INTO q370_t
          SELECT user_id, count(*) AS n FROM q370_ev
          WHERE event_id % 2 = 0 GROUP BY user_id;
          INSERT INTO q370_t
          SELECT user_id, count(*) AS n FROM q370_ev
          WHERE user_id % 3 = 0 GROUP BY user_id""")
        SqlDdl.executeSql(s, "SELECT user_id, n FROM q370_t").df.get
      } finally {
        SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q370_t")
        s.catalog.dropTempView("q370_ev")
      }
    }),

    "q368_cdc_debezium_noisy" -> ((s, dir) => {
      import graft.operators.SqlDdl
      val pt = "struct<id:bigint,grp:bigint,cents:bigint>"
      val ev = Tables.table(s, dir, "events")
        .select(col("event_id").as("id"), (col("user_id") % 9).as("grp"),
                floor(col("value") * 100).cast("long").as("cents"))
      val payload = struct(col("id"), col("grp"), col("cents"))
      def wrap(before: org.apache.spark.sql.Column,
               after: org.apache.spark.sql.Column, op: String) = Seq(
        struct(lit("struct").as("type")).as("schema"),
        struct(before.as("before"), after.as("after"),
               lit(op).as("op")).as("payload"))
      val cRows = ev.select(wrap(lit(null).cast(pt), payload, "c"): _*)
      val uRows = ev.filter(col("id") % 3 === 0)
        .select(wrap(payload,
          struct(col("id"), col("grp"),
                 (col("cents") * 3).as("cents")), "u"): _*)
      val dRows = ev.filter(col("id") % 11 === 0)
        .select(wrap(struct(col("id"), col("grp"),
            when(col("id") % 3 === 0, col("cents") * 3)
              .otherwise(col("cents")).as("cents")),
          lit(null).cast(pt), "d"): _*)
      // noise: unknown ops and an image-less u — must be skipped whole
      val junkOps = ev.filter(col("id") % 13 === 0)
        .select(wrap(lit(null).cast(pt), lit(null).cast(pt), "zz"): _*)
      val junkU = ev.filter(col("id") % 17 === 0)
        .select(wrap(lit(null).cast(pt), payload, "u"): _*)
      val in = stageJsonIn(
        cRows.unionByName(uRows).unionByName(dRows)
          .unionByName(junkOps).unionByName(junkU), 4, extraKey = "junk") {
        d =>
          // raw non-JSON garbage lines in their own file of the log dir
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d, "part-junk.json"),
            java.util.Arrays.asList("this is not json {{{", "", "[42,"))
      }
      val out = java.nio.file.Files.createTempDirectory("q368out").toString
      withStatePartitions(s, 8) {
        try {
          SqlDdl.executeAll(s, s"""
            CREATE TABLE q368_cdc (id BIGINT, grp BIGINT, cents BIGINT,
              PRIMARY KEY (id) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$in',
                  'format' = 'debezium-json',
                  'debezium-json.schema-include' = 'true',
                  'debezium-json.ignore-parse-errors' = 'true',
                  'source.max-files-per-trigger' = '1');
            CREATE TABLE q368_sink (grp BIGINT, s BIGINT, n BIGINT,
              PRIMARY KEY (grp) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$out/t')""")
          SqlDdl.executeSql(s, """
            INSERT INTO q368_sink
            SELECT grp, SUM(cents) AS s, COUNT(*) AS n
            FROM q368_cdc GROUP BY grp""").await()
          SqlDdl.executeSql(s, "SELECT grp, s, n FROM q368_sink").df.get
        } finally {
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q368_cdc")
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q368_sink")
        }
      }
    }),

    // Plain Calc over an UPDATING view from SQL text (the reference's
    // StreamExecCalc on updating input — projection/filter commute
    // with retraction), composed with the PRIMARY KEY upsert sink: the
    // churning per-user purchase aggregate is projected/filtered by
    // text and upserted per key. A key whose aggregate crosses the
    // filter mid-replay leaves the sink via the bare retraction the
    // Calc emits (its -U passes the filter on the OLD value, its +U is
    // filtered out). Final live rows = the batch dual's WHERE.
    "q364_stream_sql_calc_changelog" -> ((s, dir) => {
      val (view, out, ck) = purchaseCentsView(s, dir)
      withStatePartitions(s, 8) {
        StreamSql.registerChangelog("q364_p", view, "kind")
        import graft.operators.SqlDdl
        try {
          SqlDdl.executeSql(s, s"""
            CREATE TABLE q364_sink (uid BIGINT, r BIGINT, cents BIGINT,
              PRIMARY KEY (uid) NOT ENFORCED)
            WITH ('connector' = 'filesystem', 'path' = '$out',
                  'sink.checkpoint' = '$ck')""")
          SqlDdl.executeSql(s, """
            INSERT INTO q364_sink
            SELECT key AS uid, amt_c % 1000 AS r, amt_c AS cents
            FROM q364_p WHERE amt_c > 5000""").await()
          SqlDdl.executeSql(s,
            "SELECT uid, r, cents FROM q364_sink").df.get
        } finally {
          SqlDdl.executeSql(s, "DROP TABLE IF EXISTS q364_sink")
          StreamSql.dropChangelog("q364_p")
        }
      }
    })
  )

  /** q252's pipeline with the replay split as a parameter, so the spec
    * can assert the watermark-ordered overAgg emits IDENTICAL rows under
    * different micro-batch boundaries (the determinism claim every
    * stageOrdered gate relies on). */
  def overReplay(s: SparkSession, dir: String, nSlices: Int): DataFrame = {
    import s.implicits._
    val ev = Tables.table(s, dir, "events")
      .select(col("event_id"), col("user_id"),
              Tables.tsMillis(col("ts")).as("t_ms"),
              col("value"), col("ts").as("ets"))
    val maxTs = maxTsOf(ev, "ets")
    val sentinel = s.range(1)
      .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
              lit(maxTs.getTime + 100L * 86400 * 1000).as("t_ms"),
              lit(0.0).as("value"),
              lit(new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000))
                .cast("timestamp").as("ets"))
    val (in, out, ck) = stageOrdered(ev, "ets", nSlices, sentinel)
    withStatePartitions(s, 8) {
      val src = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .withWatermark("ets", "1 second")
        .as[OvEv]
      val runMin = OverWindow.overAgg[Long, OvEv, Double](
          src.groupByKey(_.user_id),
          _.t_ms, _.event_id, _.value,
          OverWindow.minAgg[OvEv](_.value),
          OverWindow.UnboundedPreceding)
        .toDF("user_id", "t_ms", "event_id", "run_min")
      val q = runMin.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .start()
      q.processAllAvailable(); q.stop()
    }
    s.read.parquet(out).filter(col("user_id") >= 0)
  }

  /** q268's pipeline with the replay split as a parameter, so the spec
    * can assert the coprocess emission set is IDENTICAL under different
    * micro-batch boundaries (the fold is (ts, side, tie)-ordered within
    * a batch and the slices are event-time ranges, so any slicing yields
    * the same global fold order). */
  def coProcessReplay(s: SparkSession, dir: String, nSlices: Int): DataFrame = {
    import s.implicits._
    val ev = Tables.table(s, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"),
              Tables.tsMicros(col("ts")).as("ts_us"),
              col("event_type"), col("value"), col("ts").as("ets"))
    val maxTs = maxTsOf(ev, "ets")
    val sentTs = new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)
    val sentinel = s.range(1)
      .select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
              lit(sentTs.getTime * 1000L).as("ts_us"),
              lit("zz_sentinel").as("event_type"), lit(0.0).as("value"),
              lit(sentTs).cast("timestamp").as("ets"))
    val (in, out, ck) = stageOrdered(ev, "ets", nSlices, sentinel)
    withStatePartitions(s, 8) {
      val src = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
      val ctrl = src.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
      val data = src.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"),
                struct(col("user_id"), col("event_id"), col("value")))
        .as[(Long, Long, Long, (Long, Long, Double))]
      val alerts = CoProcess.connect[Long, Double, (Long, Long, Double),
                                     Double, (Long, Long, Double, Double)](
        ctrl, data,
        onLeft = (_, thr) => (Some(thr), Iterator.empty),
        onRight = (st, p) => (st, st match {
          case Some(thr) if p._3 > thr =>
            Iterator((p._1, p._2, p._3, thr))
          case _ => Iterator.empty
        }))
        .toDF("user_id", "p_id", "p_value", "thr")
      val q = alerts.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .start()
      q.processAllAvailable(); q.stop()
    }
    s.read.parquet(out).filter(col("user_id") >= 0)
  }

  /** q269's pipeline with the main-slice split as a parameter, so the
    * spec can assert the accepted-late set does NOT depend on how the
    * main stream was sliced (the sentinel watermark-carrier files pin
    * the late batch's filter watermark to max(main) − delay whatever
    * the slicing). */
  def latenessReplay(s: SparkSession, dir: String, nSlices: Int): DataFrame = {
    val ev = Tables.table(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("ts"),
              floor(col("value") * 100).cast("long").as("cents"))
    val main = ev.filter(pmod(col("event_id"), lit(7)) =!= 0)
    val late = ev.filter(pmod(col("event_id"), lit(7)) === 0)
    val maxTs = maxTsOf(main, "ts")
    val sentinel = s.range(1)
      .select(lit("zz_sentinel").as("event_type"),
              lit(maxTs).cast("timestamp").as("ts"),
              lit(0L).as("cents"))
    val (in, tbl, ck) = stageWithLate(main.drop("event_id"), "ts", nSlices,
      sentinel, late.drop("event_id"))
    withStatePartitions(s, 8) {
      val src = s.readStream
        .schema(main.drop("event_id").schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .withWatermark("ts", "3 days")
      val agg = src
        .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
        .select(col("event_type"), Tables.tsMicros(col("w.start")).as("w_start"),
                col("n"), col("cents"))
      val q = agg.writeStream.outputMode("update")
        .option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, id: Long) =>
          StreamSinks.applyBatch(b.withColumn("__seq", lit(id)),
            tbl, Seq("event_type", "w_start"), "__seq", buckets = 16)
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    StreamSinks.readUpsertTable(s, tbl)
      .filter(col("event_type") =!= "zz_sentinel")
      .select(col("event_type"), col("w_start"), col("n"), col("cents"))
  }

  /** q303's pipeline with the slice count as a parameter, so the spec
    * can assert the admitted set is IDENTICAL under different
    * micro-batch boundaries (each batch admits its per-digest
    * min(doc_id); slices are doc_id-ordered, so that min is global). */
  def ingestDedupReplay(s: SparkSession, dir: String, nSlices: Int): DataFrame = {
    import s.implicits._
    val all = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
              md5(concat_ws(" ",
                slice(split(trim(lower(col("text"))), "\\s+"), 1, 10)))
                .as("dig"))
    val baseDigs = all.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      .select("dig").distinct().localCheckpoint()
    val delta = all.filter(pmod(col("doc_id"), lit(3)) === 0)
    val sentinel = s.range(1).select(
      lit(Long.MaxValue / 2).as("doc_id"), lit("zz_sentinel").as("source"),
      lit(0L).as("n_chars"), lit("zz_no_such_digest").as("dig"))
    val (in, out, ck) = stageOrdered(delta, "doc_id", nSlices, sentinel)
    withStatePartitions(s, 8) {
      val admitted = s.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .join(broadcast(baseDigs), Seq("dig"), "left_anti")
        .select(col("doc_id"), col("source"), col("n_chars"), col("dig"))
        .as[IngestDoc]
        .groupByKey(_.dig)
        .flatMapGroupsWithState[Boolean, IngestDoc](
          org.apache.spark.sql.streaming.OutputMode.Append,
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
          (_, vals, state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
            if (state.exists) Iterator.empty
            else { state.update(true); Iterator(vals.minBy(_.doc_id)) }
        }
      val q = admitted.toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    s.read.parquet(out).filter(col("source") =!= "zz_sentinel")
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  /** q245's pipeline with the replay split as parameters, so the spec
    * can assert the final state is IDENTICAL under different
    * micro-batch boundaries (the batch-boundary-independence claim the
    * oracle gate relies on). */
  /** Shared prelude of the streaming-SQL gates (q314–q325): stage the
    * purchase events (4 round-robin slices, 2 files per trigger) and
    * build the per-user live-cents aggregate view `(key, kind, amt_c)`
    * over the staged replay stream — the updating input every SQL
    * route consumes. Returns the view plus the gate's sink/checkpoint
    * dirs. */
  private def purchaseCentsView(s: SparkSession, dir: String)
      : (DataFrame, String, String) = {
    import s.implicits._
    val ev = Tables.table(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_type"),
              floor(col("value") * 100).as("cents"))
    val (in, out, ck) = stage(ev, 4)
    val src = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 2).parquet(in)
      .as[EvRow]
    val view = Changelog.aggregateChangelog[Long, EvRow](
        src.groupByKey(_.user_id), _ => Changelog.Insert, _.cents.toDouble)
      .map(a => (a.key, a.kind, a.sum))
      .toDF("key", "kind", "amt_c")
    (view, out, ck)
  }

  /** Two-sided variant (q313/q322/q323): per-user `(key, kind, amt_c,
    * cnt)` aggregate views of the purchase and click streams over one
    * staged replay — call the returned function with the event type. */
  private def purchaseClickViews(s: SparkSession, dir: String)
      : (String => DataFrame, String, String) = {
    import s.implicits._
    val ev = Tables.table(s, dir, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_type"),
              floor(col("value") * 100).as("cents"))
    val (in, out, ck) = stage(ev, 4)
    val src = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 2).parquet(in)
      .as[EvRow]
    def side(kind: String): DataFrame = Changelog.aggregateChangelog[Long, EvRow](
        src.filter(_.event_type == kind).groupByKey(_.user_id),
        _ => Changelog.Insert, _.cents.toDouble)
      .map(a => (a.key, a.kind, a.sum, a.count))
      .toDF("key", "kind", "amt_c", "cnt")
    (side _, out, ck)
  }

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
      def side(kind: String) = Changelog.aggregateChangelog[Long, EvRow](
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

  /** q304/q305's pipeline: two updating agg views feeding the SEMI or
    * ANTI changelog join; parameterized on the replay split so the spec
    * can assert batch-boundary independence (as [[changelogJoinReplay]]). */
  def existenceJoinReplay(s: SparkSession, dir: String, anti: Boolean,
                          nFiles: Int = 4, filesPerTrigger: Int = 2): DataFrame = {
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
      def side(kind: String) = Changelog.aggregateChangelog[Long, EvRow](
          src.filter(_.event_type == kind).groupByKey(_.user_id),
          _ => Changelog.Insert, _.cents.toDouble)
        .map(a => (a.key, a.kind, SideAgg(a.sum, a.count)))
      val cond = (_: SideAgg, r: SideAgg) => r.count >= 14
      val j =
        if (anti) Changelog.joinChangelogAnti(side("purchase"), side("click"), cond)
        else Changelog.joinChangelogSemi(side("purchase"), side("click"), cond)
      val q = j.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .start()
      q.processAllAvailable(); q.stop()
    }
    Changelog.materialize(s.read.parquet(out), "key", "kind", "ord")
      .select(col("key").as("user_id"),
              (col("left.sum") / 100.0).as("purchase_amt"),
              col("left.count").as("purchases"))
  }

  val oracle: Map[String, String] = Map(
    "q304_stream_semi_join" -> """
      WITH p AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      k AS (
        SELECT user_id, count(*) AS c
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT p.user_id AS user_id,
             p.s/100.0 AS purchase_amt, CAST(p.c AS BIGINT) AS purchases
      FROM p
      WHERE EXISTS (SELECT 1 FROM k
                    WHERE k.user_id = p.user_id AND k.c >= 14)""",

    "q305_stream_anti_join" -> """
      WITH p AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      k AS (
        SELECT user_id, count(*) AS c
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT p.user_id AS user_id,
             p.s/100.0 AS purchase_amt, CAST(p.c AS BIGINT) AS purchases
      FROM p
      WHERE NOT EXISTS (SELECT 1 FROM k
                        WHERE k.user_id = p.user_id AND k.c >= 14)""",

    "q308_stream_window_join" -> """
      SELECT p.event_id AS p_id, c.event_id AS c_id
      FROM (SELECT event_id, user_id,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
            FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT event_id, user_id,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
            FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.d = c.d""",

    "q307_stream_distinct_agg" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id % 4 AS grp,
             CAST(count(DISTINCT cents // 10000) AS BIGINT) AS n_buckets,
             count(*) AS n_users
      FROM p GROUP BY 1""",

    "q306_stream_retract_topn" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      r AS (
        SELECT user_id % 8 AS grp, user_id, cents,
               row_number() OVER (PARTITION BY user_id % 8
                                  ORDER BY cents DESC, user_id) AS rnk
        FROM p)
      SELECT grp, CAST(rnk AS INT) AS rnk, user_id, cents
      FROM r WHERE rnk <= 3""",

    "q313_stream_sql_exists" -> """
      WITH p AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      k AS (
        SELECT user_id, count(*) AS c
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT p.user_id AS user_id,
             p.s/100.0 AS purchase_amt, CAST(p.c AS BIGINT) AS purchases
      FROM p
      WHERE EXISTS (SELECT 1 FROM k
                    WHERE k.user_id = p.user_id AND k.c >= 12)""",

    "q314_stream_sql_topn" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      r AS (
        SELECT user_id % 6 AS grp, user_id, cents,
               row_number() OVER (PARTITION BY user_id % 6
                                  ORDER BY cents DESC, user_id) AS rnk
        FROM p)
      SELECT grp, CAST(rnk AS INT) AS rnk, user_id, cents
      FROM r WHERE rnk <= 2""",

    "q315_stream_sql_distinct" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id % 5 AS grp,
             CAST(count(DISTINCT floor(cents/10000)) AS BIGINT) AS n_buckets,
             count(*) AS n_users
      FROM p GROUP BY 1""",

    "q322_stream_sql_join" -> """
      WITH p AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      k AS (
        SELECT user_id, count(*) AS c
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT p.user_id AS user_id,
             p.s/100.0 AS purchase_amt, CAST(p.c AS BIGINT) AS purchases,
             CAST(k.c AS BIGINT) AS clicks
      FROM p JOIN k ON p.user_id = k.user_id AND k.c >= 12""",

    "q323_stream_sql_left_join" -> """
      WITH p AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      k AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT p.user_id AS user_id,
             p.s/100.0 AS purchase_amt, CAST(p.c AS BIGINT) AS purchases,
             k.s/100.0 AS click_amt, CAST(k.c AS BIGINT) AS clicks
      FROM p LEFT JOIN k ON p.user_id = k.user_id AND k.c >= 12""",

    "q324_stream_sql_having" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id % 6 AS grp,
             CAST(sum(cents) AS BIGINT) AS sum_c,
             count(*) AS n_users
      FROM p WHERE cents < 60000
      GROUP BY 1 HAVING sum(cents) > 600000""",

    "q325_stream_sql_chain" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      g AS (
        SELECT user_id % 6 AS grp, CAST(sum(cents) AS BIGINT) AS sum_c
        FROM p GROUP BY 1),
      r AS (
        SELECT grp % 2 AS prt, grp, sum_c,
               row_number() OVER (PARTITION BY grp % 2
                                  ORDER BY sum_c DESC, grp) AS rnk
        FROM g)
      SELECT prt, CAST(rnk AS INT) AS rnk, grp, sum_c
      FROM r WHERE rnk <= 2""",

    "q318_stream_sql_listagg" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id % 7 AS grp,
             arg_min(cents, user_id) AS first_c,
             arg_max(cents, user_id) AS last_c,
             string_agg(CAST(cents AS VARCHAR), ',' ORDER BY user_id) AS vals,
             string_agg(CAST(cents AS VARCHAR), ',' ORDER BY cents) AS vals_sorted,
             count(*) AS n_users
      FROM p GROUP BY 1""",

    "q316_stream_listagg" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id % 8 AS grp,
             arg_min(cents, user_id) AS first_c,
             arg_max(cents, user_id) AS last_c,
             string_agg(CAST(cents AS VARCHAR), ',' ORDER BY user_id) AS vals,
             string_agg(CAST(cents AS VARCHAR), ',' ORDER BY cents) AS vals_sorted,
             count(*) AS n_users
      FROM p GROUP BY 1""",

    "q319_stream_sql_groupagg" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id % 6 AS grp,
             CAST(sum(cents) AS BIGINT) AS sum_c,
             count(*) AS n_users,
             CAST(sum(cents) AS DOUBLE) / count(*) AS avg_c
      FROM p GROUP BY 1""",

    "q320_stream_sql_stats" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      m AS (
        SELECT user_id % 4 AS grp,
               CAST(sum(cents) AS DOUBLE) AS s,
               CAST(sum(cents*cents) AS DOUBLE) AS ssq,
               count(*) AS n
        FROM p GROUP BY 1)
      SELECT grp,
             (ssq - s*s/n)/n AS var_pop_c,
             CASE WHEN n > 1 THEN (ssq - s*s/n)/(n-1) END AS var_samp_c,
             sqrt((ssq - s*s/n)/n) AS sd_pop_c,
             CASE WHEN n > 1 THEN sqrt((ssq - s*s/n)/(n-1)) END AS sd_samp_c,
             n AS n_users
      FROM m""",

    "q321_stream_sql_minmax" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id % 3 AS grp,
             min(cents) AS min_c,
             max(cents) AS max_c,
             count(*) AS n_users
      FROM p GROUP BY 1""",

    "q178_stream_tumble" -> """
      SELECT event_type,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
      FROM events GROUP BY 1, 2""",

    "q179_stream_dedup" -> """
      SELECT DISTINCT md5(text) AS digest FROM documents""",

    "q303_stream_ingest_dedup" -> """
      WITH docs AS (
        SELECT doc_id, source, n_chars,
               md5(array_to_string(
                 (regexp_split_to_array(trim(lower(text)), '\s+'))[1:10],
                 ' ')) AS dig
        FROM documents),
      base AS (SELECT DISTINCT dig FROM docs WHERE doc_id % 3 != 0),
      fresh AS (
        SELECT d.* FROM docs d LEFT JOIN base b ON d.dig = b.dig
        WHERE d.doc_id % 3 = 0 AND b.dig IS NULL),
      keepers AS (SELECT dig, min(doc_id) AS doc_id FROM fresh GROUP BY dig)
      SELECT f.doc_id, f.source, f.n_chars
      FROM fresh f JOIN keepers k ON f.dig = k.dig AND f.doc_id = k.doc_id""",

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
      FROM p JOIN k ON p.user_id = k.user_id""",

    "q263_stream_lookup" -> """
      SELECT e.event_id, c.c_nationkey
      FROM events e JOIN customer c ON e.user_id = c.c_custkey""",

    "q274_stream_changelog_outer" -> """
      WITH p AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'purchase' AND value >= 150
        GROUP BY 1),
      k AS (
        SELECT user_id, sum(floor(value*100)) AS s, count(*) AS c
        FROM events WHERE event_type = 'click' AND value >= 150
        GROUP BY 1)
      SELECT COALESCE(p.user_id, k.user_id) AS user_id,
             p.s/100.0 AS purchase_amt, CAST(p.c AS BIGINT) AS purchases,
             k.s/100.0 AS click_amt, CAST(k.c AS BIGINT) AS clicks
      FROM p FULL JOIN k ON p.user_id = k.user_id""",

    // Idle-state TTL: phase split at the event-time midpoint (µs
    // integer arithmetic); users with phase-2 purchases re-accumulated
    // from fresh state, phase-1-only users keep their stale last row.
    "q294_stream_ttl_agg" -> """
      WITH p AS (
        SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        FROM events WHERE event_type = 'purchase'),
      b AS (SELECT (min(tus) + max(tus)) // 2 AS split FROM p),
      agg AS (
        SELECT user_id,
               sum(CASE WHEN tus > b.split THEN 1 ELSE 0 END) AS n2,
               CAST(sum(cents) AS BIGINT) AS s_all, count(*) AS c_all,
               CAST(sum(CASE WHEN tus > b.split THEN cents END) AS BIGINT) AS s2
        FROM p, b GROUP BY user_id)
      SELECT user_id,
             CASE WHEN n2 > 0 THEN s2 ELSE s_all END AS cents,
             CAST(CASE WHEN n2 > 0 THEN n2 ELSE c_all END AS BIGINT) AS cnt
      FROM agg""",

    // Complete windows of 5 per event_type in event-time order; the
    // evictor keeps positions 2..4 (the last 3) of each window.
    "q289_stream_count_evictor" -> """
      WITH o AS (
        SELECT event_type, event_id, floor(value * 100) AS cents_d,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id)
                 AS rn
        FROM events),
      w AS (
        SELECT event_type, event_id, CAST(cents_d AS BIGINT) AS cents,
               (rn - 1) // 5 AS wid, (rn - 1) % 5 AS p,
               count(*) OVER (PARTITION BY event_type, (rn - 1) // 5)
                 AS wn
        FROM o)
      SELECT event_type, min(event_id) AS lo_id, max(event_id) AS hi_id,
             CAST(sum(cents) AS BIGINT) AS cents, count(*) AS n
      FROM w WHERE wn = 5 AND p >= 2
      GROUP BY event_type, wid""",

    // ms-precision as-of (the operator keys its state on epoch millis):
    // the version visible to a probe is the last view row with
    // view-ms <= probe-ms; equal-ms versions resolve to max event_id.
    "q275_stream_temporal_join" -> """
      WITH v AS (
        SELECT user_id, event_id, value,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms
        FROM events WHERE event_type = 'view'),
      p AS (
        SELECT user_id, event_id, value,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT p.user_id, p.event_id AS p_id, p.value AS p_value,
               v.event_id AS v_id, v.value AS v_value,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.tms DESC, v.event_id DESC)
                 AS rn
        FROM p LEFT JOIN v
          ON v.user_id = p.user_id AND v.tms <= p.tms)
      SELECT user_id AS p_user, p_id, p_value, v_id, v_value
      FROM j WHERE rn = 1""",

    "q261_stream_count_tumble" -> """
      WITH o AS (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000, event_id)
                 AS rn
        FROM events),
      w AS (SELECT user_id, event_id, (rn - 1) // 5 AS wid FROM o)
      SELECT user_id, wid, min(event_id) AS lo_id, max(event_id) AS hi_id
      FROM w GROUP BY user_id, wid
      HAVING count(*) = 5""",

    // Dynamic-gap interval union: an event opens a new session iff its
    // start is strictly past the running max of all prior (event-time +
    // own-gap) ends for its user — Spark's merging-session iterators
    // start a new session only on start > currentSessionEnd, so
    // TOUCHING windows merge (same convention as q27/q250's oracle).
    "q259_stream_dynamic_session" -> """
      WITH o AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
               epoch_us(CAST(ts AS TIMESTAMP))
                 + CASE WHEN event_type = 'purchase'
                        THEN 3600000000 ELSE 1800000000 END AS endu,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        FROM events),
      m AS (
        SELECT user_id, tu, rn,
               max(endu) OVER (PARTITION BY user_id ORDER BY rn
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_end
        FROM o),
      f AS (
        SELECT user_id,
               CASE WHEN prev_end IS NULL OR tu > prev_end THEN 1 ELSE 0 END
                 AS new_s, rn
        FROM m),
      sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY rn
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS sid
        FROM f),
      per_sess AS (
        SELECT user_id, sid, count(*) AS n_events
        FROM sess GROUP BY user_id, sid)
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             max(n_events) AS max_session
      FROM per_sess GROUP BY user_id""",

    "q260_stream_topn" -> """
      SELECT event_type, CAST(rnk AS INT) AS rnk, event_id, value FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id) AS rnk
        FROM events) x
      WHERE rnk <= 3""",

    // Strict-contiguity A B+ unroll: per purchase, the run is bounded
    // by the first row after it that is not an in-window click; a match
    // exists iff the run is non-empty. SKIP PAST LAST ROW cannot drop
    // matches here because a purchase can never sit inside a click run.
    "q258_stream_match_recognize" -> """
      WITH w AS (
        SELECT user_id, event_id, event_type, value,
               CAST(ts AS TIMESTAMP) AS t,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
      brk AS (
        SELECT p.user_id, p.rn AS prn, p.t AS a_t,
               (SELECT min(c.rn) FROM w c
                WHERE c.user_id = p.user_id AND c.rn > p.rn
                  AND (c.event_type <> 'click'
                       OR c.t > p.t + INTERVAL 1 DAY)) AS lim
        FROM w p WHERE p.event_type = 'purchase'),
      brk2 AS (
        SELECT b.user_id, b.prn, COALESCE(b.lim, m.mx + 1) AS limx
        FROM brk b JOIN (SELECT user_id, max(rn) AS mx FROM w GROUP BY 1) m
          USING (user_id)),
      mrows AS (
        SELECT b.user_id, b.prn, x.rn, x.event_id, x.value
        FROM brk2 b JOIN w x ON x.user_id = b.user_id
             AND x.rn >= b.prn AND x.rn < b.limx
        WHERE b.limx > b.prn + 1),
      matches AS (
        SELECT user_id, prn,
               min(CASE WHEN rn = prn THEN event_id END) AS a_id,
               arg_max(event_id, rn) FILTER (rn > prn) AS last_b_id,
               count(*) FILTER (rn > prn) AS n_b,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS match_total
        FROM mrows GROUP BY user_id, prn)
      SELECT user_id,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY prn) AS BIGINT)
               AS mr_match,
             a_id, last_b_id, CAST(n_b AS BIGINT) AS n_b, match_total
      FROM matches""",

    // q26's batch dual, verbatim.
    "q257_stream_hop" -> """
      WITH b AS (SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS b30
                 FROM events)
      SELECT epoch_us(s) AS w_start, count(*) AS n FROM (
        SELECT b30 AS s FROM b
        UNION ALL
        SELECT b30 - INTERVAL 30 MINUTE AS s FROM b) x
      GROUP BY s""",

    "q256_stream_keep_last" -> """
      SELECT e.user_id, e.event_id, e.value
      FROM events e
      JOIN (SELECT user_id, max(event_id) AS m FROM events GROUP BY 1) k
        ON e.user_id = k.user_id AND e.event_id = k.m""",

    // q27's batch dual, verbatim: sessionization via lag/cumsum.
    "q250_stream_session" -> """
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP))
                             OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      per_sess AS (
        SELECT user_id, sid, count(*) AS n_events
        FROM sess GROUP BY user_id, sid)
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n_events) AS BIGINT) AS n_events, max(n_events) AS max_session
      FROM per_sess GROUP BY user_id""",

    // q49's batch dual, verbatim: the funnel as a 3-way self-join.
    "q251_stream_cep" -> """
      SELECT v.user_id, v.event_id AS v_id, c.event_id AS c_id, p.event_id AS p_id
      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t
            FROM events WHERE event_type = 'view') v
      JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t
            FROM events WHERE event_type = 'click') c
        ON c.user_id = v.user_id AND c.t > v.t
      JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t
            FROM events WHERE event_type = 'purchase') p
        ON p.user_id = v.user_id AND p.t > c.t
       AND p.t <= v.t + INTERVAL 24 HOUR""",

    "q255_stream_interval_join_left" -> """
      SELECT p.user_id AS p_user, p.event_id AS p_id, c.event_id AS c_id
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
            FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS c_ts
            FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id
       AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE
       AND c.c_ts < p.p_ts""",

    // Batch as-of dual of the coprocess fold: a purchase's threshold is
    // the last view value at-or-before it (side 0 sorts before side 1
    // at equal timestamps — the connect operator's fold order).
    "q268_stream_coprocess" -> """
      WITH u AS (
        SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS t,
               CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side
        FROM events WHERE event_type IN ('view', 'purchase')),
      thr AS (
        SELECT user_id, event_id, value, side,
               last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY t, side, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS thr
        FROM u)
      SELECT user_id, event_id AS p_id, value AS p_value, thr
      FROM thr WHERE side = 1 AND thr IS NOT NULL AND value > thr""",

    // Batch dual over main ∪ accepted-late rows: the oracle re-derives
    // the allowed-lateness acceptance predicate — a late row counts iff
    // its day window's END is past the final main watermark
    // (max(main ts) − 3 days), which is exactly Spark's late-data filter
    // for windowed aggregates (window.end > watermark).
    "q269_stream_lateness" -> """
      WITH m AS (SELECT * FROM events WHERE event_id % 7 <> 0),
      mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mt FROM m),
      l AS (SELECT e.* FROM events e, mx
            WHERE e.event_id % 7 = 0
              AND date_trunc('day', CAST(e.ts AS TIMESTAMP)) + INTERVAL 1 DAY
                  > mx.mt - INTERVAL 3 DAY),
      allr AS (SELECT event_type, ts, value FROM m
               UNION ALL SELECT event_type, ts, value FROM l)
      SELECT event_type,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start,
             count(*) AS n, CAST(sum(floor(value * 100)) AS BIGINT) AS cents
      FROM allr GROUP BY 1, 2""",

    "q252_stream_over" -> """
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS t_ms,
             event_id,
             min(value) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min
      FROM events""",

    // same batch dual as q252 — the SQL front door must change nothing
    "q329_stream_sql_over" -> """
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS t_ms,
             event_id,
             min(value) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min
      FROM events""",

    // q180's dual with the SQL route's INCLUSIVE BETWEEN bounds
    "q330_stream_sql_interval" -> """
      SELECT p.event_id AS p_id, c.event_id AS c_id
      FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
            FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS c_ts
            FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id
       AND c.c_ts BETWEEN p.p_ts - INTERVAL 10 MINUTE AND p.p_ts""",

    // same ms-precision as-of dual as q275
    "q331_stream_sql_temporal" -> """
      WITH v AS (
        SELECT user_id, event_id, value,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms
        FROM events WHERE event_type = 'view'),
      p AS (
        SELECT user_id, event_id, value,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT p.user_id, p.event_id AS p_id, p.value AS p_value,
               v.event_id AS v_id, v.value AS v_value,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.tms DESC, v.event_id DESC)
                 AS rn
        FROM p LEFT JOIN v
          ON v.user_id = p.user_id AND v.tms <= p.tms)
      SELECT user_id AS p_user, p_id, p_value, v_id, v_value
      FROM j WHERE rn = 1""",

    "q332_stream_sql_string_key" -> """
      SELECT source AS src, CAST(sum(n_chars) AS BIGINT) AS n_chars,
             count(*) AS cnt
      FROM documents GROUP BY source""",

    "q333_stream_sql_mixed_agg" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id % 5 AS grp,
             CAST(sum(cents) AS BIGINT) AS sum_c,
             min(cents) AS min_c,
             max(cents) AS max_c,
             CAST(sum(cents) AS DOUBLE) / count(*) AS avg_c,
             count(*) AS n_users
      FROM p GROUP BY 1""",

    "q335_stream_sql_union" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents,
               count(*) AS cnt
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      k AS (
        SELECT user_id, CAST(sum(floor(value*100)) AS BIGINT) AS cents,
               count(*) AS cnt
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT 'purchase' AS side, user_id, cents, cnt FROM p
      UNION ALL
      SELECT 'click' AS side, user_id, cents, cnt FROM k WHERE cnt >= 10""",

    // TUMBLE day windows are epoch-aligned — date_trunc day is exact
    "q336_stream_sql_tumble" -> """
      SELECT event_type,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_start,
             count(*) AS n,
             CAST(sum(floor(value * 100)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2""",

    // q257's batch dual, verbatim (q26's time_bucket union)
    "q337_stream_sql_hop" -> """
      WITH b AS (SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) AS b30
                 FROM events)
      SELECT epoch_us(s) AS w_start, count(*) AS n FROM (
        SELECT b30 AS s FROM b
        UNION ALL
        SELECT b30 - INTERVAL 30 MINUTE AS s FROM b) x
      GROUP BY s""",

    // q250's batch dual, verbatim: sessionization via lag/cumsum
    "q338_stream_sql_session" -> """
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP))
                             OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      per_sess AS (
        SELECT user_id, sid, count(*) AS n_events
        FROM sess GROUP BY user_id, sid)
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n_events) AS BIGINT) AS n_events, max(n_events) AS max_session
      FROM per_sess GROUP BY user_id""",

    // string-keyed running sum; event time derives from doc_id, so the
    // oracle's ORDER BY doc_id is the same total order
    "q339_stream_sql_string_over" -> """
      SELECT source, doc_id,
             CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS run_chars
      FROM documents""",

    // five-fold multi-aggregate dual; AVG spelled as the identical
    // sum/count double division
    "q340_stream_sql_multi_over" -> """
      WITH o AS (
        SELECT user_id, event_id, floor(value * 100) AS c,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms
        FROM events)
      SELECT user_id, event_id,
             CAST(sum(c) OVER w AS BIGINT) AS s_c,
             count(*) OVER w AS n,
             CAST(min(c) OVER w AS BIGINT) AS mn_c,
             CAST(max(c) OVER w AS BIGINT) AS mx_c,
             CAST(sum(c) OVER w AS DOUBLE) / count(*) OVER w AS avg_c
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

    "q341_stream_sql_lag" -> """
      WITH o AS (
        SELECT user_id, event_id, floor(value * 100) AS c,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms
        FROM events)
      SELECT user_id, event_id,
             CAST(lag(c, 1) OVER (PARTITION BY user_id
               ORDER BY tms, event_id) AS BIGINT) AS prev_c
      FROM o""",

    "q342_stream_sql_intersect" -> """
      WITH p AS (
        SELECT user_id, count(*) AS cnt
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      k AS (
        SELECT user_id, count(*) AS cnt
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT user_id, cnt FROM p
      INTERSECT
      SELECT user_id, cnt FROM k""",

    "q343_stream_sql_except" -> """
      WITH p AS (
        SELECT user_id, count(*) AS cnt
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      k AS (
        SELECT user_id, count(*) AS cnt
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT user_id FROM p WHERE cnt >= 2
      EXCEPT
      SELECT user_id FROM k WHERE cnt >= 8""",

    // q258's strict-contiguity unroll with the integer-cents sum
    "q344_stream_sql_match_recognize" -> """
      WITH w AS (
        SELECT user_id, event_id, event_type, value,
               CAST(ts AS TIMESTAMP) AS t,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
      brk AS (
        SELECT p.user_id, p.rn AS prn, p.t AS a_t,
               (SELECT min(c.rn) FROM w c
                WHERE c.user_id = p.user_id AND c.rn > p.rn
                  AND (c.event_type <> 'click'
                       OR c.t > p.t + INTERVAL 1 DAY)) AS lim
        FROM w p WHERE p.event_type = 'purchase'),
      brk2 AS (
        SELECT b.user_id, b.prn, COALESCE(b.lim, m.mx + 1) AS limx
        FROM brk b JOIN (SELECT user_id, max(rn) AS mx FROM w GROUP BY 1) m
          USING (user_id)),
      mrows AS (
        SELECT b.user_id, b.prn, x.rn, x.event_id, x.value
        FROM brk2 b JOIN w x ON x.user_id = b.user_id
             AND x.rn >= b.prn AND x.rn < b.limx
        WHERE b.limx > b.prn + 1),
      matches AS (
        SELECT user_id, prn,
               min(CASE WHEN rn = prn THEN event_id END) AS a_id,
               arg_max(event_id, rn) FILTER (rn > prn) AS last_b_id,
               count(*) FILTER (rn > prn) AS n_b,
               CAST(sum(floor(value * 100)) AS BIGINT) AS cents_total
        FROM mrows GROUP BY user_id, prn)
      SELECT user_id,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY prn) AS BIGINT)
               AS mr_match,
             a_id, last_b_id, CAST(n_b AS BIGINT) AS n_b, cents_total
      FROM matches""",

    // LEAD's batch dual MINUS each key's final row (the stream's
    // holdback: a trailing row's "next" is undefined until it exists,
    // so it never emits on a finite replay)
    "q345_stream_sql_lead" -> """
      WITH o AS (
        SELECT user_id, event_id, floor(value * 100) AS c,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms
        FROM events),
      l AS (
        SELECT user_id, event_id,
               lead(c, 1) OVER (PARTITION BY user_id
                 ORDER BY tms, event_id) AS next_c,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY tms DESC, event_id DESC) AS rdesc
        FROM o)
      SELECT user_id, event_id, CAST(next_c AS BIGINT) AS next_c
      FROM l WHERE rdesc > 1""",

    // day-tumble sums per event_type, then top-2 windows per type by
    // cents (tiebreak: earlier window) — q346's whole chained pipeline
    // as one batch statement
    "q346_stream_sql_window_chain" -> """
      WITH a AS (
        SELECT event_type,
               epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_us,
               CAST(sum(floor(value * 100)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT event_type, w_us, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents DESC, w_us) AS rn
        FROM a)
      SELECT event_type, CAST(rn AS INT) AS rnk, w_us, cents
      FROM r WHERE rn <= 2""",

    // distinct residues (mod 1000) of the final per-user purchase sums
    "q347_stream_sql_select_distinct" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value * 100)) AS BIGINT) AS amt
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT DISTINCT amt % 1000 AS r FROM p""",

    // top-5 users by final purchase cents (tiebreak: user id)
    "q348_stream_sql_sort_limit" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value * 100)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id,
             CAST(row_number() OVER (ORDER BY cents DESC, user_id) AS INT)
               AS rnk,
             cents
      FROM p ORDER BY cents DESC, user_id LIMIT 5""",

    // the append stream's running-distinct set equals plain DISTINCT
    "q349_stream_sql_append_distinct" -> """
      SELECT DISTINCT event_type,
             CAST(floor(value * 10) AS BIGINT) % 7 AS b
      FROM events WHERE value >= 0""",

    // the all-text DDL pipeline equals the batch day-window aggregate
    "q350_sql_ddl_pipeline" -> """
      SELECT event_type,
             epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS w_us,
             CAST(sum(floor(value * 100)) AS BIGINT) AS cents,
             count(*) AS n
      FROM events GROUP BY 1, 2""",

    // q344's match decomposition + per-row running/final measures over
    // each match's rows (window frames over the match ordinal)
    "q352_stream_mr_all_rows_measures" -> """
      WITH w AS (
        SELECT user_id, event_id, event_type, value,
               CAST(ts AS TIMESTAMP) AS t,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
      brk AS (
        SELECT p.user_id, p.rn AS prn, p.t AS a_t,
               (SELECT min(c.rn) FROM w c
                WHERE c.user_id = p.user_id AND c.rn > p.rn
                  AND (c.event_type <> 'click'
                       OR c.t > p.t + INTERVAL 1 DAY)) AS lim
        FROM w p WHERE p.event_type = 'purchase'),
      brk2 AS (
        SELECT b.user_id, b.prn, COALESCE(b.lim, m.mx + 1) AS limx
        FROM brk b JOIN (SELECT user_id, max(rn) AS mx FROM w GROUP BY 1) m
          USING (user_id)),
      mrows AS (
        SELECT b.user_id, b.prn, x.rn, x.event_id, x.value
        FROM brk2 b JOIN w x ON x.user_id = b.user_id
             AND x.rn >= b.prn AND x.rn < b.limx
        WHERE b.limx > b.prn + 1)
      SELECT user_id, event_id,
             CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY prn)
               AS BIGINT) AS mr_match,
             CAST(rn - prn AS BIGINT) AS mr_seq,
             CAST(count(*) OVER wr AS BIGINT) AS k,
             CAST(sum(floor(value * 100)) OVER wr AS BIGINT) AS run_cents,
             CAST(count(*) FILTER (rn > prn) OVER wf AS BIGINT) AS n_b,
             CASE WHEN rn = prn THEN 'A' ELSE 'B' END AS cls
      FROM mrows
      WINDOW wr AS (PARTITION BY user_id, prn ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id, prn)""",

    // every purchase event × the user's FINAL click aggregate (inner)
    "q353_stream_sql_mixed_join" -> """
      WITH k AS (
        SELECT user_id, CAST(sum(floor(value * 100)) AS BIGINT) AS s
        FROM events WHERE event_type = 'click' GROUP BY 1)
      SELECT e.event_id AS eid,
             CAST(floor(e.value * 100) AS BIGINT) AS pcents,
             k.s AS click_c
      FROM events e JOIN k ON e.user_id = k.user_id
      WHERE e.event_type = 'purchase'""",

    // q259's session reconstruction verbatim — the SQL-text route must
    // land on the identical dynamic-gap session windows
    "q354_stream_sql_dynamic_session" -> """
      WITH o AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
               epoch_us(CAST(ts AS TIMESTAMP))
                 + CASE WHEN event_type = 'purchase'
                        THEN 3600000000 ELSE 1800000000 END AS endu,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        FROM events),
      m AS (
        SELECT user_id, tu, rn,
               max(endu) OVER (PARTITION BY user_id ORDER BY rn
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_end
        FROM o),
      f AS (
        SELECT user_id,
               CASE WHEN prev_end IS NULL OR tu > prev_end THEN 1 ELSE 0 END
                 AS new_s, rn
        FROM m),
      sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY rn
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS sid
        FROM f),
      per_sess AS (
        SELECT user_id, sid, count(*) AS n_events
        FROM sess GROUP BY user_id, sid)
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(max(n_events) AS BIGINT) AS max_session
      FROM per_sess GROUP BY user_id""",

    // final per-(user, type) aggregates joined on BOTH key columns
    // under the cross-side residual
    "q355_stream_sql_composite_join" -> """
      WITH src AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events),
      l AS (
        SELECT user_id, event_type, sum(cents) AS sum_c
        FROM src WHERE event_id % 2 = 0 GROUP BY 1, 2),
      r AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM src WHERE event_id % 2 = 1 GROUP BY 1, 2)
      SELECT l.user_id AS uid, l.event_type AS etype,
             CAST(l.sum_c AS BIGINT) AS sum_c, CAST(r.cnt AS BIGINT) AS cnt
      FROM l JOIN r ON l.user_id = r.user_id
                   AND l.event_type = r.event_type
                   AND l.sum_c > r.cnt * 10""",

    // final outer aggregates with NO inner partner under the residual
    "q356_stream_sql_exists_residual" -> """
      WITH src AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events),
      l AS (
        SELECT user_id, event_type, sum(cents) AS sum_c
        FROM src WHERE event_id % 2 = 0 GROUP BY 1, 2),
      r AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM src WHERE event_id % 2 = 1 GROUP BY 1, 2)
      SELECT l.user_id AS uid, l.event_type AS etype,
             CAST(l.sum_c AS BIGINT) AS sum_c
      FROM l WHERE NOT EXISTS (
        SELECT 1 FROM r
        WHERE r.user_id = l.user_id AND r.event_type = l.event_type
          AND l.sum_c > r.cnt * 3000)""",

    // the all-text upsert pipeline's live rows = the batch aggregate
    "q358_sql_upsert_sink_pipeline" -> """
      SELECT user_id,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS amt,
             count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY user_id""",

    // top-3 cents per event type (tiebreak: event id)
    "q359_stream_sql_append_topn" -> """
      WITH src AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events),
      r AS (
        SELECT event_type AS etype, event_id, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents DESC, event_id) AS rn
        FROM src)
      SELECT etype, CAST(rn AS INT) AS rnk, event_id, cents
      FROM r WHERE rn <= 3""",

    // both statement-set members' batch duals under one tag
    "q360_sql_statement_set" -> """
      WITH a AS (
        SELECT 't|' || event_type || '|' ||
               CAST(epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP)))
                    AS VARCHAR) AS k,
               CAST(sum(floor(value * 100)) AS BIGINT) AS a,
               count(*) AS b
        FROM events GROUP BY event_type, date_trunc('day', CAST(ts AS TIMESTAMP))),
      b AS (
        SELECT 'u|' || CAST(user_id AS VARCHAR) AS k,
               CAST(sum(floor(value * 100)) AS BIGINT) AS a,
               count(*) AS b
        FROM events WHERE event_type = 'purchase' GROUP BY user_id)
      SELECT k, a, b FROM a UNION ALL SELECT k, a, b FROM b""",

    // q355's dual: the upsert table's live rows = the final aggregates
    // joined on the composite key under the residual
    "q361_sql_composite_pk_sink" -> """
      WITH src AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events),
      l AS (
        SELECT user_id, event_type, sum(cents) AS sum_c
        FROM src WHERE event_id % 2 = 0 GROUP BY 1, 2),
      r AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM src WHERE event_id % 2 = 1 GROUP BY 1, 2)
      SELECT l.user_id AS uid, l.event_type AS etype,
             CAST(l.sum_c AS BIGINT) AS sum_c, CAST(r.cnt AS BIGINT) AS cnt
      FROM l JOIN r ON l.user_id = r.user_id
                   AND l.event_type = r.event_type
                   AND l.sum_c > r.cnt * 10""",

    // as-of version first (rn = 1), residual applied to THAT pair —
    // no fallback to an earlier version
    "q362_stream_sql_temporal_residual" -> """
      WITH v AS (
        SELECT user_id, event_id, value,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms
        FROM events WHERE event_type = 'view'),
      p AS (
        SELECT user_id, event_id, value,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT p.user_id, p.event_id AS p_id, p.value AS p_value,
               v.event_id AS v_id, v.value AS v_value,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.tms DESC, v.event_id DESC)
                 AS rn
        FROM p JOIN v
          ON v.user_id = p.user_id AND v.tms <= p.tms)
      SELECT user_id AS p_user, p_id, p_value, v_id, v_value
      FROM j WHERE rn = 1 AND v_value < p_value""",

    // the twice-run backfill lands exactly the batch aggregate
    "q363_sql_insert_overwrite" -> """
      SELECT user_id, CAST(sum(floor(value * 100)) AS BIGINT) AS amt,
             event_type AS etype
      FROM events GROUP BY user_id, event_type""",

    // both multiplexed members' batch duals under one tag
    "q365_sql_statement_set_multiplex" -> """
      WITH a AS (
        SELECT 'p|' || CAST(event_id AS VARCHAR) AS k,
               CAST(floor(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'),
      b AS (
        SELECT 'c|' || CAST(event_id AS VARCHAR) AS k, user_id AS v
        FROM events WHERE event_type = 'click' AND user_id % 2 = 0)
      SELECT k, v FROM a UNION ALL SELECT k, v FROM b""",

    // surviving entities after the CDC log: %7==0 deleted, %5==0 doubled
    "q366_cdc_debezium" -> """
      WITH fin AS (
        SELECT user_id % 10 AS grp,
               CAST(floor(value * 100) AS BIGINT)
                 * (CASE WHEN event_id % 5 = 0 THEN 2 ELSE 1 END) AS cents
        FROM events WHERE event_id % 7 <> 0)
      SELECT grp, CAST(sum(cents) AS BIGINT) AS s, count(*) AS n
      FROM fin GROUP BY grp""",

    // surviving entities: %6==0 deleted, %4==0 incremented by 1000
    "q367_cdc_canal" -> """
      WITH fin AS (
        SELECT user_id % 8 AS grp,
               CAST(floor(value * 100) AS BIGINT)
                 + (CASE WHEN event_id % 4 = 0 THEN 1000 ELSE 0 END) AS cents
        FROM events WHERE event_id % 6 <> 0)
      SELECT grp, CAST(sum(cents) AS BIGINT) AS s, count(*) AS n
      FROM fin GROUP BY grp""",

    // surviving entities after the noisy schema-wrapped CDC log:
    // %11==0 deleted, %3==0 tripled; every noise message skipped whole
    // base scan = even event_ids; hinted scan = all events
    "q371_sql_options_hint" -> """
      WITH b AS (SELECT user_id % 7 AS grp, count(*) AS n FROM events
                 WHERE event_id % 2 = 0 GROUP BY user_id % 7),
           h AS (SELECT user_id % 7 AS grp, count(*) AS n FROM events
                 GROUP BY user_id % 7)
      SELECT b.grp, b.n AS n_base, h.n AS n_hint
      FROM b JOIN h ON b.grp = h.grp""",

    // the reflective q369_cents(v, 100) is floor(v*100) by definition
    "q369_sql_ddl_lifecycle" -> """
      SELECT user_id, count(*) AS n,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      WHERE CAST(floor(value * 100) AS BIGINT) % 3 <> 0
      GROUP BY user_id""",

    // keyed merge: the second INSERT's keys (user_id % 3 = 0, counts
    // over ALL events) overwrite the first's (counts over even
    // event_ids); keys only in either statement survive as written
    "q370_sql_add_constraint" -> """
      WITH h AS (SELECT user_id, count(*) AS n FROM events
                 WHERE event_id % 2 = 0 GROUP BY user_id),
           f AS (SELECT user_id, count(*) AS n FROM events
                 WHERE user_id % 3 = 0 GROUP BY user_id)
      SELECT COALESCE(f.user_id, h.user_id) AS user_id,
             COALESCE(f.n, h.n) AS n
      FROM h FULL OUTER JOIN f ON h.user_id = f.user_id""",

    "q368_cdc_debezium_noisy" -> """
      WITH fin AS (
        SELECT user_id % 9 AS grp,
               CAST(floor(value * 100) AS BIGINT)
                 * (CASE WHEN event_id % 3 = 0 THEN 3 ELSE 1 END) AS cents
        FROM events WHERE event_id % 11 <> 0)
      SELECT grp, CAST(sum(cents) AS BIGINT) AS s, count(*) AS n
      FROM fin GROUP BY grp""",

    // Calc over the updating aggregate = WHERE over the final values
    "q364_stream_sql_calc_changelog" -> """
      WITH p AS (
        SELECT user_id, CAST(sum(floor(value * 100)) AS BIGINT) AS amt
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id AS uid, amt % 1000 AS r, amt AS cents
      FROM p WHERE amt > 5000"""
  )
}
