package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom stateful streaming operators (SURVEY §7.2 phase D / §7.4.4):
 * the semantics the reference implements with keyed state + timers that
 * Structured Streaming lacks as built-ins — keyed process functions,
 * streaming Top-N, dedup keep-last. All are `flatMapGroupsWithState`
 * wrappers: state lives in the SS state store (HDFS/RocksDB backed,
 * exactly-once via the commit log — the analogue of the reference's
 * keyed state backends, CORE/api/common/state).
 *
 * Scale notes: state is per-key and incremental (a bounded top-n buffer /
 * one row / user state), never a replay of history; keys partition across
 * the cluster exactly like Flink keyBy.
 */
object StatefulOps {

  /**
   * Keyed-process equivalent (STREAM/api/functions/KeyedProcessFunction.java:
   * 52-85 — processElement + onTimer + per-key ValueState): user supplies
   * `onElements` invoked per key per batch with its buffered state;
   * event-time timeout fires `onTimer` when the watermark passes the
   * registered timestamp.
   */
  def keyedProcess[K, V, S, O](
      grouped: KeyValueGroupedDataset[K, V],
      outputMode: OutputMode = OutputMode.Append)(
      onElements: (K, Iterator[V], Option[S]) => (Option[S], Iterator[O], Option[Long]),
      onTimer: (K, S) => (Option[S], Iterator[O]))(
      implicit se: Encoder[S], oe: Encoder[O]): Dataset[O] =
    grouped.flatMapGroupsWithState[S, O](
        outputMode, GroupStateTimeout.EventTimeTimeout) {
      (key: K, values: Iterator[V], state: GroupState[S]) =>
        if (state.hasTimedOut) {
          val (next, out) = onTimer(key, state.get)
          next match {
            case Some(s) => state.update(s)
            case None => state.remove()
          }
          out
        } else {
          val (next, out, timerAt) =
            onElements(key, values, state.getOption)
          next match {
            case Some(s) => state.update(s)
            case None => state.remove()
          }
          timerAt.foreach(state.setTimeoutTimestamp)
          out
        }
    }

  /**
   * Streaming Top-N per key (AppendOnlyTopNFunction.java:48 analogue):
   * keeps the n best (score, payload) per key; emits the key's refreshed
   * top list whenever it changes (update semantics, like the reference's
   * retract + emit new rank list).
   */
  def topNPerKey[K: Encoder, V](
      grouped: KeyValueGroupedDataset[K, V],
      n: Int,
      score: V => Double,
      tiebreak: V => Long)(
      implicit ve: Encoder[V],
      se: Encoder[Seq[(Double, Long, V)]],
      oe: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] =
    grouped.flatMapGroupsWithState[Seq[(Double, Long, V)], (K, Seq[V])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (key: K, values: Iterator[V], state: GroupState[Seq[(Double, Long, V)]]) =>
        val cur = state.getOption.getOrElse(Seq.empty)
        val merged = (cur ++ values.map(v => (score(v), tiebreak(v), v)))
          .sortBy(t => (-t._1, t._2))
          .take(n)
        if (merged != cur) {
          state.update(merged)
          Iterator((key, merged.map(_._3)))
        } else Iterator.empty
    }

  /**
   * Streaming dedup keep-LAST per key (DeduplicateKeepLastRowFunction.java:
   * 36 analogue): latest row per key by event time wins; emits each time
   * the winner changes (update semantics — the -U/+U retraction pair of
   * the reference collapses to the new row in SS update mode).
   */
  def dedupKeepLast[K: Encoder, V](
      grouped: KeyValueGroupedDataset[K, V],
      eventTime: V => Long,
      tiebreak: V => Long)(
      implicit ve: Encoder[V], oe: Encoder[(K, V)]): Dataset[(K, V)] =
    grouped.flatMapGroupsWithState[V, (K, V)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (key: K, values: Iterator[V], state: GroupState[V]) =>
        val candidates = state.getOption.iterator ++ values
        val winner = candidates.maxBy(v => (eventTime(v), tiebreak(v)))
        val changed = state.getOption.forall(prev =>
          (eventTime(prev), tiebreak(prev)) != (eventTime(winner), tiebreak(winner)))
        state.update(winner)
        if (changed) Iterator((key, winner)) else Iterator.empty
    }
}
