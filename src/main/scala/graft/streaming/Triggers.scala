package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom window triggers and evictors (SURVEY §2.5 — the reference's
 * flink-streaming-java/.../api/windowing/triggers/{CountTrigger,
 * DeltaTrigger, PurgingTrigger}.java and evictors/{CountEvictor,
 * TimeEvictor}.java): GlobalWindows-style per-key accumulation where a
 * TRIGGER decides when to fire, an EVICTOR trims the window content just
 * before the user aggregate sees it, and `purge` clears the window after
 * firing (PurgingTrigger.of(...)).
 *
 * Spark-first: one flatMapGroupsWithState operator; the window buffer is
 * the per-key state, exactly the reference's per-key window state in
 * WindowOperator. Elements are processed in `orderBy` order within each
 * micro-batch (the reference processes in arrival order; a deterministic
 * sort makes results replayable).
 *
 * Scale: state is bounded by the trigger interval (purging) or the
 * evictor width — same bound the reference maintains; keys partition
 * across the cluster via the groupByKey shuffle.
 */
object Triggers {

  /** When to fire: sees the buffered window (including `v`), the element
    * that last fired, and the new element. */
  trait Trigger[V] extends Serializable {
    def fires(window: Seq[V], lastFired: Option[V], v: V): Boolean
  }

  /** CountTrigger.java: fire every time the window reaches n elements. */
  final case class CountTrigger[V](n: Int) extends Trigger[V] {
    def fires(window: Seq[V], lastFired: Option[V], v: V): Boolean =
      window.size >= n
  }

  /** DeltaTrigger.java: fire when delta(lastFiredElement, current)
    * exceeds the threshold; first element always measures against the
    * window's first element. */
  final case class DeltaTrigger[V](threshold: Double, delta: (V, V) => Double)
      extends Trigger[V] {
    def fires(window: Seq[V], lastFired: Option[V], v: V): Boolean =
      delta(lastFired.getOrElse(window.head), v) > threshold
  }

  /** ContinuousEventTimeTrigger.java: fire whenever event time crosses
    * the next interval-ALIGNED boundary after the anchor (the reference
    * registers timers at ts - ts % interval + interval, so boundaries sit
    * on multiples of the interval regardless of where the first element
    * landed). Element-driven: the fire happens ON the first element
    * at/past the boundary rather than on a timer at the boundary itself —
    * documented divergence from the reference's timer-driven firing (same
    * fired window contents, shifted fire instant). */
  final case class ContinuousEventTimeTrigger[V](intervalMs: Long,
                                                 ts: V => Long)
      extends Trigger[V] {
    def fires(window: Seq[V], lastFired: Option[V], v: V): Boolean = {
      val anchor = lastFired.map(ts).getOrElse(ts(window.head))
      val aligned = anchor - java.lang.Math.floorMod(anchor, intervalMs)
      ts(v) >= aligned + intervalMs
    }
  }

  /** What the aggregate sees at fire time. */
  trait Evictor[V] extends Serializable {
    def evict(window: Seq[V]): Seq[V]
  }

  /** CountEvictor.java: keep only the last n elements. */
  final case class CountEvictor[V](n: Int) extends Evictor[V] {
    def evict(window: Seq[V]): Seq[V] = window.takeRight(n)
  }

  /** TimeEvictor.java: keep elements within `keepMs` of the newest. */
  final case class TimeEvictor[V](keepMs: Long, ts: V => Long)
      extends Evictor[V] {
    def evict(window: Seq[V]): Seq[V] = {
      val cutoff = ts(window.last) - keepMs
      window.filter(ts(_) >= cutoff)
    }
  }

  /** DeltaEvictor.java: evict every element whose delta against the
    * window's NEWEST element reaches the threshold (the reference
    * compares each buffered element to the last one and removes those
    * with delta >= threshold). */
  final case class DeltaEvictor[V](threshold: Double, delta: (V, V) => Double)
      extends Evictor[V] {
    def evict(window: Seq[V]): Seq[V] = {
      val newest = window.last
      window.filter(v => delta(v, newest) < threshold)
    }
  }

  /** No eviction (the default window content). */
  final case class KeepAll[V]() extends Evictor[V] {
    def evict(window: Seq[V]): Seq[V] = window
  }

  /**
   * GlobalWindows + trigger [+ evictor] [+ purge]: per key, buffer
   * elements in `orderBy` order; when `trigger` fires, emit
   * `aggregate(key, evictor.evict(window))`; with `purge` the window
   * restarts empty (PurgingTrigger), otherwise it keeps accumulating
   * (pure GlobalWindows semantics).
   */
  def window[K, V, O](
      grouped: KeyValueGroupedDataset[K, V],
      trigger: Trigger[V],
      evictor: Evictor[V],
      purge: Boolean,
      orderBy: V => Long,
      tieBreak: V => Long = (_: V) => 0L)(
      aggregate: (K, Seq[V]) => O)(
      implicit ve: Encoder[V], se: Encoder[(Seq[V], Option[V])],
      oe: Encoder[O]): Dataset[O] =
    grouped.flatMapGroupsWithState[(Seq[V], Option[V]), O](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: K, values: Iterator[V], state: GroupState[(Seq[V], Option[V])]) =>
        var (buf, lastFired) =
          state.getOption.getOrElse((Seq.empty[V], Option.empty[V]))
        val out = mutable.ArrayBuffer.empty[O]
        values.toSeq.sortBy(v => (orderBy(v), tieBreak(v))).foreach { v =>
          buf = buf :+ v
          if (trigger.fires(buf, lastFired, v)) {
            out += aggregate(key, evictor.evict(buf))
            lastFired = Some(v)
            if (purge) buf = Seq.empty
          }
        }
        state.update((buf, lastFired))
        out.iterator
    }
}
