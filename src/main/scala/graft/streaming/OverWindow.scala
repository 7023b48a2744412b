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

  // ---- multi-aggregate over-window (one state buffer, N folds) ---------

  /** The fold-expressible aggregate functions [[overAggMulti]] hosts —
    * every one folds through a single (Double, Long) accumulator slot,
    * so N aggregates share ONE state buffer and one pass per emission
    * (the reference's GroupAggFunction architecture applied to
    * over-windows: one generated AggsHandleFunction hosting the whole
    * aggregate list, StreamExecOverAggregate's aggCalls). */
  sealed trait AggFn extends Serializable
  case object FnSum extends AggFn
  case object FnCount extends AggFn
  case object FnMin extends AggFn
  case object FnMax extends AggFn
  case object FnAvg extends AggFn
  /** FIRST_VALUE over the frame (running frames: first row per key). */
  case object FnFirst extends AggFn
  /** LAST_VALUE over the frame (the last folded row — with RANGE peer
    * grouping, the last peer in deterministic order). */
  case object FnLast extends AggFn

  private def zeroOf(f: AggFn): (Double, Long) = f match {
    case FnMin => (Double.PositiveInfinity, 0L)
    case FnMax => (Double.NegativeInfinity, 0L)
    case _ => (0.0, 0L)
  }
  private def addOf(f: AggFn, a: (Double, Long), x: Double): (Double, Long) =
    f match {
      case FnSum | FnAvg => (a._1 + x, a._2 + 1)
      case FnCount => (a._1, a._2 + 1)
      case FnMin => (math.min(a._1, x), a._2 + 1)
      case FnMax => (math.max(a._1, x), a._2 + 1)
      case FnFirst => if (a._2 == 0L) (x, 1L) else (a._1, a._2 + 1)
      case FnLast => (x, a._2 + 1)
    }
  private def finishOf(f: AggFn, a: (Double, Long)): Double = f match {
    case FnCount => a._2.toDouble
    case FnAvg => a._1 / a._2
    case _ => a._1
  }

  /**
   * N over-window aggregates sharing ONE window spec and ONE state
   * buffer: `values(v)(j)` is aggregate j's operand (distinct operand
   * expressions allowed). Emits (key, eventTime, tiebreak, results) —
   * `results(j)` = aggregate j — with exactly [[overAgg]]'s ordering,
   * lateness, frame and TTL semantics; each per-fn fold is the same
   * arithmetic as the single-aggregate helpers (sumAgg et al.), so an
   * N=1 run is value-identical to `overAgg`.
   */
  def overAggMulti[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      eventTime: V => Long,
      tiebreak: V => Long,
      sortVal: V => Double,
      fns: Seq[AggFn],
      values: V => Seq[Double],
      frame: Frame,
      ttl: Option[Changelog.IdleStateTtl] = None)(
      implicit ke: Encoder[K], ve: Encoder[V],
      se: Encoder[(Seq[V], Seq[V], Seq[(Double, Long)], Long)],
      oe: Encoder[(K, Long, Long, Seq[Double])])
      : Dataset[(K, Long, Long, Seq[Double])] = {
    require(fns.nonEmpty, "overAggMulti: empty aggregate list")
    require(!ttl.exists(_.reclaimTimers),
      "overAggMulti: reclaimTimers unsupported (event-time timeout in use)")
    val zeros = fns.map(zeroOf)
    def addAll(a: Seq[(Double, Long)], v: V): Seq[(Double, Long)] = {
      val xs = values(v)
      fns.indices.map(j => addOf(fns(j), a(j), xs(j)))
    }
    def finishAll(a: Seq[(Double, Long)]): Seq[Double] =
      fns.indices.map(j => finishOf(fns(j), a(j)))
    grouped.flatMapGroupsWithState[(Seq[V], Seq[V], Seq[(Double, Long)], Long),
                                   (K, Long, Long, Seq[Double])](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: K, vals: Iterator[V],
       state: GroupState[(Seq[V], Seq[V], Seq[(Double, Long)], Long)]) =>
        val incoming = vals.toSeq
        val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
        val st0 = state.getOption.filter { case (_, _, _, last) =>
          incoming.isEmpty || ttl.forall(t => now - last <= t.ms) }
        val (pending0, tail0, acc0, last0) =
          st0.getOrElse((Seq.empty[V], Seq.empty[V], zeros, now))
        val wm = state.getCurrentWatermarkMs()
        val pending = (pending0 ++ incoming.filter(eventTime(_) > wm))
          .sortBy(v => (eventTime(v), tiebreak(v), sortVal(v)))
        val (ready, still) = pending.partition(eventTime(_) <= wm)
        val out = mutable.ArrayBuffer.empty[(K, Long, Long, Seq[Double])]
        var tail = tail0
        var acc = acc0
        frame match {
          case UnboundedPreceding =>
            ready.foreach { v =>
              acc = addAll(acc, v)
              out += ((key, eventTime(v), tiebreak(v), finishAll(acc)))
            }
          case RangeUnboundedPreceding =>
            ready.groupBy(eventTime).toSeq.sortBy(_._1).foreach {
              case (t, peers) =>
                peers.foreach(v => acc = addAll(acc, v))
                val sVal = finishAll(acc)
                peers.foreach(v => out += ((key, t, tiebreak(v), sVal)))
            }
          case RowsPreceding(n) =>
            ready.foreach { v =>
              tail = (tail :+ v).takeRight(n + 1)
              out += ((key, eventTime(v), tiebreak(v),
                       finishAll(tail.foldLeft(zeros)(addAll))))
            }
          case RangePreceding(lookback) =>
            ready.groupBy(eventTime).toSeq.sortBy(_._1).foreach {
              case (t, peers) =>
                tail = (tail ++ peers).filter(v => eventTime(v) >= t - lookback)
                val s = finishAll(tail.foldLeft(zeros)(addAll))
                peers.foreach(v => out += ((key, t, tiebreak(v), s)))
            }
            tail = tail.filter(v => eventTime(v) >= wm - lookback)
        }
        val last1 = if (incoming.nonEmpty) now else last0
        state.update((still, tail, acc, last1))
        if (still.nonEmpty)
          state.setTimeoutTimestamp(math.max(eventTime(still.head), wm + 1))
        out.iterator
    }
  }

  // ---- LEAD/LAG offset over-windows -------------------------------------

  /**
   * Event-time LEAD/LAG per key (the reference's OffsetOverFrame
   * family, flink-table-runtime-blink/.../over/frame/OffsetOverFrame
   * .java, SQL-reachable as `LAG(v, n) OVER (PARTITION BY … ORDER BY
   * rowtime)`): each row's value is the row `offset` positions before
   * (`lead = false`) or after (`lead = true`) it in final per-key
   * event-time order. None where the offset row does not exist (SQL's
   * NULL default).
   *
   * Emission: LAG rows emit exactly like [[overAgg]] (final once the
   * watermark passes — the preceding rows are already final). LEAD
   * rows additionally WAIT until their offset row is itself final: on
   * an unbounded stream "no next row yet" is undefined, not NULL, so a
   * key's trailing `offset` rows are withheld until more rows for that
   * key arrive — the streaming-native reading of the offset frame
   * (results are final once emitted; nothing is ever retracted).
   * State: pending rows + `offset` lookback/holdback rows — O(disorder
   * × rate + offset) per key, the [[overAgg]] bound.
   */
  def overOffset[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      eventTime: V => Long,
      tiebreak: V => Long,
      sortVal: V => Double,
      value: V => Double,
      offset: Int,
      lead: Boolean,
      ttl: Option[Changelog.IdleStateTtl] = None)(
      implicit ke: Encoder[K], ve: Encoder[V],
      se: Encoder[(Seq[V], Seq[V], Long)],
      oe: Encoder[(K, Long, Long, Option[Double])])
      : Dataset[(K, Long, Long, Option[Double])] = {
    require(offset >= 1, s"overOffset: offset must be >= 1, got $offset")
    require(!ttl.exists(_.reclaimTimers),
      "overOffset: reclaimTimers unsupported (event-time timeout in use)")
    grouped.flatMapGroupsWithState[(Seq[V], Seq[V], Long),
                                   (K, Long, Long, Option[Double])](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: K, vals: Iterator[V], state: GroupState[(Seq[V], Seq[V], Long)]) =>
        val incoming = vals.toSeq
        val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
        val st0 = state.getOption.filter { case (_, _, last) =>
          incoming.isEmpty || ttl.forall(t => now - last <= t.ms) }
        // `buf` is the offset buffer: LAG → the last `offset` emitted
        // rows (lookback); LEAD → final rows still awaiting their
        // offset row (holdback)
        val (pending0, buf0, last0) =
          st0.getOrElse((Seq.empty[V], Seq.empty[V], now))
        val wm = state.getCurrentWatermarkMs()
        val pending = (pending0 ++ incoming.filter(eventTime(_) > wm))
          .sortBy(v => (eventTime(v), tiebreak(v), sortVal(v)))
        val (ready, still) = pending.partition(eventTime(_) <= wm)
        val out = mutable.ArrayBuffer.empty[(K, Long, Long, Option[Double])]
        var buf = buf0
        if (lead) {
          val all = buf ++ ready
          val emitN = all.length - offset
          (0 until emitN).foreach { i =>
            val v = all(i)
            out += ((key, eventTime(v), tiebreak(v), Some(value(all(i + offset)))))
          }
          buf = all.drop(math.max(emitN, 0))
        } else {
          ready.foreach { v =>
            val lagged =
              if (buf.length >= offset) Some(value(buf(buf.length - offset)))
              else None
            out += ((key, eventTime(v), tiebreak(v), lagged))
            buf = (buf :+ v).takeRight(offset)
          }
        }
        val last1 = if (incoming.nonEmpty) now else last0
        state.update((still, buf, last1))
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
