package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming OVER-window aggregates on event time (SURVEY §2.6): the
 * reference dedicates one operator per frame shape
 * (flink-table-runtime-blink/.../operators/over/
 * RowTimeRangeBoundedPrecedingFunction.java, RowTimeRowsBounded-,
 * RowTimeRangeUnboundedPrecedingFunction.java, …); here one
 * flatMapGroupsWithState operator parameterized by `Frame` covers
 * ROWS/RANGE × bounded/unbounded PRECEDING.
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
 * keeps in its per-key MapState.
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
  /** ROWS/RANGE UNBOUNDED PRECEDING — running aggregate. */
  case object UnboundedPreceding extends Frame

  /**
   * Event-time over-window SUM of `value` per key. Emits
   * (key, eventTime, tiebreak, agg) for every non-late row, in
   * event-time order per key, once final. `eventTime` must be the
   * epoch-millis of the column the stream is watermarked on.
   */
  def overSum[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      eventTime: V => Long,
      tiebreak: V => Long,
      value: V => Double,
      frame: Frame)(
      implicit ke: Encoder[K], ve: Encoder[V],
      se: Encoder[(Seq[V], Seq[V], Double)],
      oe: Encoder[(K, Long, Long, Double)]): Dataset[(K, Long, Long, Double)] =
    grouped.flatMapGroupsWithState[(Seq[V], Seq[V], Double),
                                   (K, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: K, values: Iterator[V],
       state: GroupState[(Seq[V], Seq[V], Double)]) =>
        val (pending0, tail0, acc0) =
          state.getOption.getOrElse((Seq.empty[V], Seq.empty[V], 0.0))
        val wm = state.getCurrentWatermarkMs()
        // drop too-late rows (their emission slot has passed), merge, sort.
        // value(v) is a final sort key so duplicate (eventTime, tiebreak)
        // pairs still get a deterministic cross-batch order: rows equal in
        // all three keys are interchangeable for the aggregates computed
        // here, so replay determinism holds without requiring unique
        // tie-breaks.
        val pending = (pending0 ++ values.filter(eventTime(_) > wm))
          .sortBy(v => (eventTime(v), tiebreak(v), value(v)))
        val (ready, still) = pending.partition(eventTime(_) <= wm)
        val out = mutable.ArrayBuffer.empty[(K, Long, Long, Double)]
        var tail = tail0
        var acc = acc0
        frame match {
          case UnboundedPreceding =>
            ready.foreach { v =>
              acc += value(v)
              out += ((key, eventTime(v), tiebreak(v), acc))
            }
          case RowsPreceding(n) =>
            ready.foreach { v =>
              tail = (tail :+ v).takeRight(n + 1)
              out += ((key, eventTime(v), tiebreak(v),
                       tail.iterator.map(value).sum))
            }
          case RangePreceding(lookback) =>
            // peer groups: all rows at one event time close together and
            // share the frame [t - lookback, t] including each other
            ready.groupBy(eventTime).toSeq.sortBy(_._1).foreach {
              case (t, peers) =>
                tail = (tail ++ peers).filter(v => eventTime(v) >= t - lookback)
                val s = tail.iterator.map(value).sum
                peers.foreach(v => out += ((key, t, tiebreak(v), s)))
            }
            // future emissions have t > wm: prune beyond their lookback
            tail = tail.filter(v => eventTime(v) >= wm - lookback)
        }
        state.update((still, tail, acc))
        if (still.nonEmpty)
          state.setTimeoutTimestamp(math.max(eventTime(still.head), wm + 1))
        out.iterator
    }
}
