package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/**
 * Streaming relational operators on Structured Streaming (SURVEY §7.2
 * phase C): windowed aggregations with watermarks, stream-stream interval
 * join, streaming deduplication, and the output-mode inference the
 * reference performs in FlinkChangelogModeInferenceProgram.scala
 * (SURVEY §2.9: each operator's changelog mode — here: which SS output
 * mode a query shape supports).
 *
 * These produce the SAME results as their batch duals in graft.operators
 * (EventOps) — the specs replay `events` through a stream and compare
 * against the batch computation, which is the Flink "unified batch/stream"
 * guarantee restated on Spark.
 */
object StreamOps {

  /** TUMBLE window aggregation with bounded-disorder watermark. */
  def tumbleAgg(df: DataFrame, tsCol: String, size: String, disorder: String,
                keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, disorder)
      .groupBy(keys :+ window(col(tsCol), size).as("w"): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** HOP (sliding) window aggregation. */
  def hopAgg(df: DataFrame, tsCol: String, size: String, slide: String,
             disorder: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, disorder)
      .groupBy(keys :+ window(col(tsCol), size, slide).as("w"): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** SESSION window aggregation (gap-merged). */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String, disorder: String,
                 keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, disorder)
      .groupBy(keys :+ session_window(col(tsCol), gap).as("w"): _*)
      .agg(aggs.head, aggs.tail: _*)

  /**
   * DYNAMIC-gap session windows (STREAM/api/windowing/assigners/
   * DynamicEventTimeSessionWindows.java analogue — the reference extracts
   * a per-element gap via SessionWindowTimeGapExtractor). Spark's
   * `session_window` takes an arbitrary gap *expression* evaluated per
   * row, so the extractor is just a Column — it must be
   * CalendarIntervalType, i.e. built with `make_interval(...)`, not an
   * INTERVAL literal (those are DayTimeIntervalType, which the
   * SessionWindowing rule rejects for dynamic gaps): e.g.
   * `when(col("event_type") === "purchase",
   *       expr("make_interval(0,0,0,0,0,40,0)")).otherwise(...)`. Merging of overlapping
   * per-row [ts, ts+gap) windows happens in the native
   * SessionWindowStateStore operator — same mechanics as the static gap,
   * no custom state needed. Rows whose gap expression is ≤ 0 or null are
   * dropped (Spark's documented dynamic-gap contract, matching the
   * reference's "extractor must return > 0").
   */
  def dynamicSessionAgg(df: DataFrame, tsCol: String, gap: Column,
                        disorder: String, keys: Seq[Column],
                        aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, disorder)
      .groupBy(keys :+ session_window(col(tsCol), gap).as("w"): _*)
      .agg(aggs.head, aggs.tail: _*)

  /**
   * Stream-stream interval join (TimeBoundedStreamJoin analogue): rows
   * join when `right.ts ∈ [left.ts + lower, left.ts + upper]` on the key.
   * Both sides need watermarks so state is pruned. `joinType` extends to
   * the outer variants (Flink SQL's LEFT/RIGHT/FULL OUTER interval
   * joins): the unmatched side null-pads once the watermark passes the
   * row's join horizon — same state bound as the inner form, emission
   * is just deferred to horizon close.
   */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   lower: String, upper: String,
                   disorder: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, disorder)
    val r = right.withWatermark(rightTs, disorder)
    l.join(r,
      col(leftKey) === col(rightKey) &&
      col(rightTs) >= col(leftTs) + expr(s"INTERVAL $lower") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upper"),
      joinType)
  }

  /** Streaming dedup keep-first (DeduplicateKeepFirstRowFunction
    * analogue): global per-key state, exactly like Flink's deduplicate —
    * the first row per key ever seen wins. State grows with key
    * cardinality (Flink bounds it with state TTL; SS with
    * dropDuplicatesWithinWatermark — see the horizon variant below). */
  def dedupKeepFirst(df: DataFrame, tsCol: String, disorder: String,
                     keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, disorder)
      .dropDuplicates(keys)

  /** Horizon-bounded dedup: duplicates are only suppressed within the
    * watermark window; state is pruned (for unbounded key spaces). */
  def dedupKeepFirstWithinWatermark(df: DataFrame, tsCol: String,
                                    disorder: String,
                                    keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, disorder)
      .dropDuplicatesWithinWatermark(keys)

  /**
   * Streaming NEAR-duplicate suppression: keep the first-arriving
   * document per MinHash signature within the watermark horizon. The
   * signature (operators.DedupOps.minhashSigExpr) is expression-only —
   * computed per row in the scan projection, no blocking aggregation —
   * so the only stateful operator is the signature-keyed dedup, whose
   * state the watermark prunes. Granularity: full-signature equality
   * (all 16 permutation minima), i.e. shingle-set near-identity; docs
   * under 3 tokens fall back to exact-text keys. This is the streaming
   * face of the batch LSH dedup family (q39/q114/q137): at 100 TB the
   * same signature expression feeds both, and state stays
   * O(distinct signatures within horizon), never O(corpus).
   */
  def nearDupSuppressWithinWatermark(df: DataFrame, textCol: String,
                                     tsCol: String,
                                     disorder: String): DataFrame = {
    val keyed = df.withColumn("graft_sig_key",
      graft.operators.DedupOps.minhashSigKey(textCol))
    keyed.withWatermark(tsCol, disorder)
      .dropDuplicatesWithinWatermark("graft_sig_key")
      .drop("graft_sig_key")
  }

  /**
   * Watermark idleness (CORE/api/common/eventtime/WatermarksWithIdleness
   * .java analogue): the reference marks a source idle after a timeout so
   * it stops holding back the combined watermark. Structured Streaming's
   * combined watermark is governed by
   * `spark.sql.streaming.multipleWatermarkPolicy` — the default `min`
   * stalls every downstream window while ANY input is silent (exactly the
   * problem WatermarksWithIdleness solves); `max` lets the fastest input
   * drive the clock, so an idle source cannot stall emission. That is the
   * behavioral analogue: instead of per-source idle DETECTION (timeout),
   * the policy ignores the laggard globally. The trade is explicit:
   * under `max`, events from the idle source that arrive late relative
   * to the busy source's watermark are dropped as late data — the same
   * risk Flink accepts while a source is marked idle.
   */
  def withIdleSourceTolerance(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")

  /** Restore the safe default (min: all inputs gate the watermark). */
  def withAllSourcesGating(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "min")

  /**
   * Output-mode inference (the reference's changelog-mode inference,
   * FlinkChangelogModeInferenceProgram.scala): decide which SS OutputMode
   * a query shape supports. Append iff every aggregation is windowed on a
   * watermarked event-time column (results finalize); Update for
   * unbounded keyed aggregation; Complete only as an explicit opt-in for
   * small result sets.
   */
  def inferOutputMode(df: DataFrame): OutputMode = {
    import org.apache.spark.sql.catalyst.expressions.{SessionWindow, TimeWindow}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, EventTimeWatermark}
    val plan = df.queryExecution.analyzed
    val aggs = plan.collect { case a: Aggregate => a }
    if (aggs.isEmpty) OutputMode.Append
    else {
      val hasWatermark = plan.collectFirst {
        case _: EventTimeWatermark => true }.getOrElse(false)
      // structural: a grouping expression is windowed iff it contains a
      // TimeWindow/SessionWindow expression, or references an attribute
      // the TimeWindowing/SessionWindowing rules marked with their
      // metadata key — never by column NAME (a column literally called
      // "window" must not fool this).
      val windowed = aggs.forall(_.groupingExpressions.exists(e =>
        e.exists {
          case _: TimeWindow | _: SessionWindow => true
          case _ => false
        } ||
        e.references.exists(a =>
          a.metadata.contains(TimeWindow.marker) ||
          a.metadata.contains(SessionWindow.marker))))
      if (hasWatermark && windowed) OutputMode.Append else OutputMode.Update
    }
  }
}
