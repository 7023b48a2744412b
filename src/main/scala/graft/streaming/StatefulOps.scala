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
   *
   * `ttl` is the idle-state retention of [[Changelog.IdleStateTtl]]
   * (the reference applies `table.exec.state.ttl` to ALL keyed state,
   * rank buffers included): a key idle past the TTL folds from a FRESH
   * empty buffer on its next arrival (lazy expiry); `reclaimTimers`
   * additionally reclaims memory of keys that never return (same
   * caveat as the changelog family — never in a replay harness).
   */
  def topNPerKey[K: Encoder, V](
      grouped: KeyValueGroupedDataset[K, V],
      n: Int,
      score: V => Double,
      tiebreak: V => Long,
      ttl: Option[Changelog.IdleStateTtl] = None)(
      implicit ve: Encoder[V],
      se: Encoder[(Seq[(Double, Long, V)], Long)],
      oe: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] = {
    val timeoutConf =
      if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    grouped.flatMapGroupsWithState[(Seq[(Double, Long, V)], Long), (K, Seq[V])](
        OutputMode.Update, timeoutConf) {
      (key: K, values: Iterator[V], state: GroupState[(Seq[(Double, Long, V)], Long)]) =>
       if (state.hasTimedOut) { state.remove(); Iterator.empty }
       else {
        val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
        // lazy expiry: a key idle past the TTL folds from a fresh buffer
        val cur = state.getOption
          .filter { case (_, last) => ttl.forall(t => now - last <= t.ms) }
          .map(_._1).getOrElse(Seq.empty)
        val merged = (cur ++ values.map(v => (score(v), tiebreak(v), v)))
          .sortBy(t => (-t._1, t._2))
          .take(n)
        // always (re)store: every arrival refreshes the idle clock, like
        // the reference's cleanup-timer reset on access
        state.update((merged, now))
        ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
        if (merged != cur) Iterator((key, merged.map(_._3)))
        else Iterator.empty
       }
    }
  }

  /**
   * Streaming dedup keep-LAST per key (DeduplicateKeepLastRowFunction.java:
   * 36 analogue): latest row per key by event time wins; emits each time
   * the winner changes (update semantics — the -U/+U retraction pair of
   * the reference collapses to the new row in SS update mode).
   *
   * `ttl`: idle-state retention, as [[topNPerKey]] — an expired key's
   * next row wins unconditionally (fresh state), even if an older-by-
   * event-time row had won before the key went idle (exactly the
   * documented staleness trade of the reference's dedup under state
   * TTL).
   */
  def dedupKeepLast[K: Encoder, V](
      grouped: KeyValueGroupedDataset[K, V],
      eventTime: V => Long,
      tiebreak: V => Long,
      ttl: Option[Changelog.IdleStateTtl] = None)(
      implicit ve: Encoder[V], oe: Encoder[(K, V)],
      se: Encoder[(V, Long)]): Dataset[(K, V)] = {
    val timeoutConf =
      if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    grouped.flatMapGroupsWithState[(V, Long), (K, V)](
        OutputMode.Update, timeoutConf) {
      (key: K, values: Iterator[V], state: GroupState[(V, Long)]) =>
       if (state.hasTimedOut) { state.remove(); Iterator.empty }
       else {
        val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
        // lazy expiry: an idle key's previous winner no longer competes
        val prev = state.getOption
          .filter { case (_, last) => ttl.forall(t => now - last <= t.ms) }
          .map(_._1)
        val candidates = prev.iterator ++ values
        val winner = candidates.maxBy(v => (eventTime(v), tiebreak(v)))
        val changed = prev.forall(p =>
          (eventTime(p), tiebreak(p)) != (eventTime(winner), tiebreak(winner)))
        state.update((winner, now))
        ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
        if (changed) Iterator((key, winner)) else Iterator.empty
       }
    }
  }
}
