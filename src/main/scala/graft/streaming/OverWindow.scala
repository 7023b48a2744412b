package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming OVER-window aggregates on event time (SURVEY §2.6): the
 * reference dedicates one operator per frame shape × aggregate
 * (flink-table-runtime-blink/.../operators/over/
 * RowTimeRangeBoundedPrecedingFunction.java, RowTimeRowsBounded-,
 * RowTimeRangeUnboundedPrecedingFunction.java, …, each parameterized by
 * generated AggsHandleFunction); here one flatMapGroupsWithState
 * operator parameterized by `Frame` × `FoldAgg` covers
 * ROWS/RANGE × bounded/unbounded PRECEDING × any fold-expressible
 * aggregate (SUM/COUNT/MIN/MAX/AVG built in).
 *
 * Semantics (same as the reference's row-time over-windows):
 *  - a row's aggregate is FINAL once the watermark passes its event time
 *    — rows are emitted in event-time order per key when they fall
 *    behind the watermark;
 *  - rows arriving later than the watermark (too-late rows) are dropped,
 *    exactly like the reference's `data.isLate` path;
 *  - RANGE frames include ALL peer rows sharing the event time (SQL
 *    RANGE semantics — emitted once the full peer group is final).
 *
 * State per key = the not-yet-final rows plus the frame's lookback
 * (bounded frames: rows within the range / the last n rows; unbounded:
 * one accumulator) — pruned every firing, the same bound the reference
 * keeps in its per-key MapState. Bounded frames recompute the fold over
 * the (frame-width-bounded) tail per emission instead of keeping a
 * retractable accumulator — the SS-idiomatic trade: O(frame) per row
 * with zero retract bookkeeping, which also frees the aggregate from
 * needing a retract operation (the reference needs retract() on its
 * bounded-preceding paths, AggsHandleFunction.retract).
 *
 * Scale: one shuffle on the key (the groupByKey), per-key state bounded
 * by disorder × rate + frame width; no global sort, no buffering of the
 * whole stream.
 */
object OverWindow {

  sealed trait Frame
  /** RANGE BETWEEN lookback PRECEDING AND CURRENT ROW (event-time units;
    * peers at the same event time are all included). */
  final case class RangePreceding(lookback: Long) extends Frame
  /** ROWS BETWEEN n PRECEDING AND CURRENT ROW (ties broken by
    * `tiebreak`, mirroring a deterministic batch ORDER BY). */
  final case class RowsPreceding(n: Int) extends Frame
  /** ROWS UNBOUNDED PRECEDING — running aggregate (ties split by
    * `tiebreak`, each row sees only rows at or before its own slot). */
  case object UnboundedPreceding extends Frame
  /** RANGE UNBOUNDED PRECEDING AND CURRENT ROW — SQL's DEFAULT frame
    * for an ordered window: the running aggregate INCLUDING all peer
    * rows at the current event time (every peer gets the same value,
    * the reference's RowTimeRangeUnboundedPrecedingFunction). State is
    * still one accumulator — peers are grouped per emission sweep. */
  case object RangeUnboundedPreceding extends Frame

  /**
   * A fold-expressible over-window aggregate: `zero`, per-row `add`,
   * and a `finish` projection to the output value — the analogue of
   * the reference's generated AggsHandleFunction accumulate/getValue
   * (retract is unnecessary here, see the class scaladoc).
   */
  final case class FoldAgg[V, A](zero: A, add: (A, V) => A,
                                 finish: A => Double) extends Serializable

  def sumAgg[V](value: V => Double): FoldAgg[V, Double] =
    FoldAgg(0.0, (a, v) => a + value(v), identity)
  def countAgg[V]: FoldAgg[V, Long] =
    FoldAgg(0L, (a, _) => a + 1L, _.toDouble)
  def minAgg[V](value: V => Double): FoldAgg[V, Double] =
    FoldAgg(Double.PositiveInfinity, (a, v) => math.min(a, value(v)), identity)
  def maxAgg[V](value: V => Double): FoldAgg[V, Double] =
    FoldAgg(Double.NegativeInfinity, (a, v) => math.max(a, value(v)), identity)
  def avgAgg[V](value: V => Double): FoldAgg[V, (Double, Long)] =
    FoldAgg((0.0, 0L), (a, v) => (a._1 + value(v), a._2 + 1L),
            a => a._1 / a._2)

  /**
   * Event-time over-window aggregate of `agg` per key. Emits
   * (key, eventTime, tiebreak, agg) for every non-late row, in
   * event-time order per key, once final. `eventTime` must be the
   * epoch-millis of the column the stream is watermarked on; `sortVal`
   * is a final deterministic sort key for rows whose
   * (eventTime, tiebreak) collide (see the sort note inline).
   *
   * `ttl`: idle-state retention ([[Changelog.IdleStateTtl]] — the
   * reference applies `table.exec.state.ttl` to over-window state too,
   * KeyedProcessFunctionWithCleanupState): a key whose last ELEMENT
   * arrival is more than `ttl` of processing time ago folds its next
   * element from fresh state — pending rows, frame tail, and running
   * accumulator are gone (the documented restart-the-running-agg
   * staleness trade). Watermark-timer firings drain pending rows
   * without touching the idle clock. `reclaimTimers` is NOT supported
   * here — the event-time timeout channel is already used for emission
   * (Spark allows one timeout kind per operator); memory reclamation
   * for never-returning keys would pair this operator with the
   * changelog family's reclaim deployment pattern instead.
   */
  def overAgg[K, V, A](
      grouped: KeyValueGroupedDataset[K, V],
      eventTime: V => Long,
      tiebreak: V => Long,
      sortVal: V => Double,
      agg: FoldAgg[V, A],
      frame: Frame,
      ttl: Option[Changelog.IdleStateTtl] = None)(
      implicit ke: Encoder[K], ve: Encoder[V],
      se: Encoder[(Seq[V], Seq[V], A, Long)],
      oe: Encoder[(K, Long, Long, Double)]): Dataset[(K, Long, Long, Double)] = {
    require(!ttl.exists(_.reclaimTimers),
      "overAgg: reclaimTimers unsupported (event-time timeout in use)")
    grouped.flatMapGroupsWithState[(Seq[V], Seq[V], A, Long),
                                   (K, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: K, values: Iterator[V],
       state: GroupState[(Seq[V], Seq[V], A, Long)]) =>
        val incoming = values.toSeq
        val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
        // lazy expiry on ELEMENT arrival only: timer firings (empty
        // batches draining pending rows) neither refresh nor trip it
        val st0 = state.getOption.filter { case (_, _, _, last) =>
          incoming.isEmpty || ttl.forall(t => now - last <= t.ms) }
        val (pending0, tail0, acc0, last0) =
          st0.getOrElse((Seq.empty[V], Seq.empty[V], agg.zero, now))
        val wm = state.getCurrentWatermarkMs()
        // drop too-late rows (their emission slot has passed), merge, sort.
        // sortVal(v) is a final sort key so duplicate (eventTime, tiebreak)
        // pairs still get a deterministic cross-batch order: rows equal in
        // all three keys are interchangeable for the aggregates computed
        // here, so replay determinism holds without requiring unique
        // tie-breaks.
        val pending = (pending0 ++ incoming.filter(eventTime(_) > wm))
          .sortBy(v => (eventTime(v), tiebreak(v), sortVal(v)))
        val (ready, still) = pending.partition(eventTime(_) <= wm)
        val out = mutable.ArrayBuffer.empty[(K, Long, Long, Double)]
        var tail = tail0
        var acc = acc0
        frame match {
          case UnboundedPreceding =>
            ready.foreach { v =>
              acc = agg.add(acc, v)
              out += ((key, eventTime(v), tiebreak(v), agg.finish(acc)))
            }
          case RangeUnboundedPreceding =>
            // peers fold together and all read the post-group value —
            // RANGE's peer semantics with the same O(1) accumulator
            ready.groupBy(eventTime).toSeq.sortBy(_._1).foreach {
              case (t, peers) =>
                peers.foreach(v => acc = agg.add(acc, v))
                val sVal = agg.finish(acc)
                peers.foreach(v => out += ((key, t, tiebreak(v), sVal)))
            }
          case RowsPreceding(n) =>
            ready.foreach { v =>
              tail = (tail :+ v).takeRight(n + 1)
              out += ((key, eventTime(v), tiebreak(v),
                       agg.finish(tail.foldLeft(agg.zero)(agg.add))))
            }
          case RangePreceding(lookback) =>
            // peer groups: all rows at one event time close together and
            // share the frame [t - lookback, t] including each other
            ready.groupBy(eventTime).toSeq.sortBy(_._1).foreach {
              case (t, peers) =>
                tail = (tail ++ peers).filter(v => eventTime(v) >= t - lookback)
                val s = agg.finish(tail.foldLeft(agg.zero)(agg.add))
                peers.foreach(v => out += ((key, t, tiebreak(v), s)))
            }
            // future emissions have t > wm: prune beyond their lookback
            tail = tail.filter(v => eventTime(v) >= wm - lookback)
        }
        val last1 = if (incoming.nonEmpty) now else last0
        state.update((still, tail, acc, last1))
        if (still.nonEmpty)
          state.setTimeoutTimestamp(math.max(eventTime(still.head), wm + 1))
        out.iterator
    }
  }

  /** Event-time over-window SUM of `value` per key (the original
    * surface; now a `sumAgg` instance of `overAgg`). */
  def overSum[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      eventTime: V => Long,
      tiebreak: V => Long,
      value: V => Double,
      frame: Frame)(
      implicit ke: Encoder[K], ve: Encoder[V],
      se: Encoder[(Seq[V], Seq[V], Double, Long)],
      oe: Encoder[(K, Long, Long, Double)]): Dataset[(K, Long, Long, Double)] =
    overAgg[K, V, Double](grouped, eventTime, tiebreak, value,
                          sumAgg(value), frame)
}
