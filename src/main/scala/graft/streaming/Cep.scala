package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * CEP / MATCH_RECOGNIZE (SURVEY §2.10): a pattern API and NFA matcher
 * re-expressing the reference's capability set — `Pattern.begin/next/
 * followedBy` contiguity, `times` quantifiers, `within` windows, and
 * after-match skip strategies (CEP/pattern/Pattern.java, CEP/nfa/NFA.java,
 * nfa/aftermatch/AfterMatchSkipStrategy.java) — on Spark.
 *
 * Execution is NOT a port of the reference's SharedBuffer runtime:
 *  - batch: repartition by key + sortWithinPartitions(key, ts), then one
 *    linear scan per partition holding only ACTIVE partial matches
 *    (bounded by the `within` horizon) — no per-key collect, scales to
 *    arbitrarily many keys per partition;
 *  - streaming: flatMapGroupsWithState buffers events per key, sorts the
 *    new batch into the buffer, and finalizes matches whose window has
 *    fully passed the watermark, pruning state as it goes.
 *
 * Match semantics implemented: relaxed contiguity (`followedBy`) and
 * strict (`next`); quantifier via repeated steps; `skipPastLast = false`
 * enumerates ALL matches (AfterMatchSkipStrategy.noSkip), `true` resumes
 * after each match's last event (skipPastLastEvent).
 */
object Cep {

  /** maxTimes sentinel for an unbounded quantifier (Pattern.oneOrMore /
    * timesOrMore — CEP/pattern/Quantifier.java looping states). */
  val Unbounded: Int = Int.MaxValue

  /** One pattern step: named predicate; strict = must match the
    * immediately following event (Pattern.next vs followedBy).
    * minTimes/maxTimes = quantifier (Pattern.times/optional/oneOrMore —
    * CEP/pattern/Quantifier.java). maxTimes == Unbounded is a looping
    * state: repeats are consecutive (internal strict contiguity, like
    * `.oneOrMore().consecutive()`) and GREEDY-MAXIMAL — the run extends
    * as long as the predicate holds, exactly MATCH_RECOGNIZE `X+`; the
    * run closes on the first non-matching event (or end of input), after
    * which the next step proceeds under its own contiguity. forbid = a
    * negative condition guarding the gap BEFORE this step: any event
    * matching it kills the partial match (Pattern.notFollowedBy);
    * forbidNextOnly restricts the guard to the immediately following
    * event (Pattern.notNext). */
  final case class Step[V](name: String, pred: V => Boolean,
                           strict: Boolean = false,
                           minTimes: Int = 1, maxTimes: Int = 1,
                           forbid: Option[V => Boolean] = None,
                           forbidNextOnly: Boolean = false) {
    require(minTimes >= 0 && maxTimes >= math.max(minTimes, 1),
      "need 0 <= minTimes <= maxTimes, maxTimes >= 1")
    def unbounded: Boolean = maxTimes == Unbounded
  }

  /** Variable-targeted after-match skip (the reference's
    * AfterMatchSkipStrategy.skipToFirst/skipToLast —
    * CEP/nfa/aftermatch/SkipToFirstStrategy.java, SkipToLastStrategy
    * .java): after a match emits, partial matches STARTING BEFORE the
    * first (`first = true`) or last row the match bound to `variable`
    * are pruned, and no new match may start before that row. When the
    * variable bound no rows, or the target is the match's own first row
    * (would loop), the reference's default is NO skip (NoSkipStrategy
    * fallback); `throwOnMiss` switches to its throwExceptionOnMiss /
    * MATCH_RECOGNIZE mode. */
  final case class SkipTo(variable: String, first: Boolean,
                          throwOnMiss: Boolean = false)

  /** A sequential pattern with an optional within-window (ms). */
  final case class Pattern[V](steps: Seq[Step[V]], withinMs: Option[Long],
                              skipPastLast: Boolean = false,
                              skipTo: Option[SkipTo] = None) {
    require(steps.nonEmpty && !steps.head.strict,
      "first step cannot be strict")
    require(steps.head.minTimes >= 1, "first step cannot be optional")
    require(!(skipPastLast && skipTo.isDefined),
      "skipPastLast and skipTo are mutually exclusive")
    skipTo.foreach(st => require(steps.exists(_.name == st.variable),
      s"skipTo references undefined step ${st.variable}"))
  }

  /** A completed match: the matched events in step order. */
  final case class Match[K, V](key: K, events: Seq[V])

  /** NFA thread: `reps >= 1` means a consecutive run of `reps` repeats of
    * `step` is in progress (bounded or looping); `reps == 0` waits for
    * the step's first repeat. `acc` is the matched (stepIdx, eventIdx)
    * pairs, reversed — indices (not events) so after-match skip can
    * locate the rows a variable bound. */
  private final case class Th(step: Int, reps: Int, startTs: Long,
                              lastIdx: Int, acc: List[(Int, Int)]) {
    /** input index of the match's first event (acc is newest-first). */
    def startIdx: Int = acc.last._2
  }

  /**
   * Unified threaded-NFA matcher (single engine for every quantifier —
   * the round-4 expansion enumeration is gone): one scan of the key's
   * time-ordered events, each live thread tracking (step, repeat-count).
   * Quantifiers branch IN PLACE — after the k-th repeat with k ≥ min the
   * thread forks into "continue repeating" (consecutive, like
   * `times(n).consecutive()`) and "advance to the next step" — so a
   * pattern with several `{n,m}` steps costs one pass, not the
   * Π(mᵢ−nᵢ+1) passes the expansion engine paid. Unbounded steps are
   * greedy-maximal runs (MATCH_RECOGNIZE `X+`): extension is mandatory
   * while the predicate holds; the run closes on the first non-matching
   * event, which cascades — the closing event is offered to the next
   * step (and may begin it).
   *
   * Enumerate-all semantics (followedByAny × noSkip) are unchanged:
   * relaxed steps survive gaps as waiting threads, every entry point of
   * a run is enumerated. Like the reference's NFA, an ambiguous pattern
   * (adjacent quantified steps sharing a predicate) yields one match per
   * distinct VARIABLE BINDING — same event sequence, different split —
   * which is Flink's own multiplicity, no longer an accident of the
   * expansion count.
   */
  private[streaming] def matchAll[V](
      pattern: Pattern[V], events: IndexedSeq[V], ts: V => Long): Seq[Seq[V]] = {
    val steps = pattern.steps
    val last = steps.length - 1
    // canEndAt(s): every step after s is optional → a match may end at s.
    val canEndAt = Array.tabulate(steps.length)(s =>
      ((s + 1) to last).forall(steps(_).minTimes == 0))
    // advance targets: s+1, plus further steps reachable by skipping
    // min==0 steps (the quantifier-elimination n=0 choices, as ε-moves).
    val advTargets = Array.tabulate(steps.length) { s =>
      val b = Seq.newBuilder[Int]
      var s2 = s + 1
      var go = s2 <= last
      while (go) { b += s2; go = s2 < last && steps(s2).minTimes == 0; s2 += 1 }
      b.result()
    }

    val skipToIdx = pattern.skipTo.map(st =>
      (st, steps.indexWhere(_.name == st.variable)))

    val out = mutable.ArrayBuffer.empty[Seq[V]]
    var partials = mutable.ArrayBuffer.empty[Th]
    // SkipTo prune threshold: partials starting before this input index
    // are dead, and no new match may start before it (the reference's
    // shouldPrune: startEventID < pruningId).
    var pruneBelow = 0
    var i = 0
    while (i < events.length) {
      val e = events(i)
      val t = ts(e)
      val next = mutable.ArrayBuffer.empty[Th]
      // consumed: a match ENDING IN e emitted under skip-past-last — e is
      // spent, overlapping partials die, e cannot start a new match.
      // wipe: a greedy run closed BEFORE e emitted — partials die but e
      // itself stays eligible to start the next match ("past last row").
      var consumed = false
      var wipe = false

      def pruned(acc: List[(Int, Int)]): Boolean = acc.last._2 < pruneBelow

      def emit(acc: List[(Int, Int)], close: Boolean): Unit = {
        if (pruned(acc)) return // discarded by an earlier match's skip
        out += acc.reverse.map(p => events(p._2))
        if (pattern.skipPastLast) { if (close) wipe = true else consumed = true }
        skipToIdx.foreach { case (st, vi) =>
          val ordered = acc.reverse
          val hit = if (st.first) ordered.find(_._1 == vi)
                    else acc.find(_._1 == vi) // acc is newest-first
          hit match {
            case None =>
              if (st.throwOnMiss) throw new IllegalStateException(
                s"skipTo ${st.variable}: no rows matched to it")
            case Some((_, ei)) if ei == ordered.head._2 =>
              // target is the match's own first row: no-skip fallback
              if (st.throwOnMiss) throw new IllegalStateException(
                s"skipTo ${st.variable}: skipping to the match's first " +
                "row would loop forever")
            case Some((_, ei)) => pruneBelow = math.max(pruneBelow, ei)
          }
        }
      }

      // rep k of bounded step s consumed e: emit / keep repeating / fork
      // waiting threads at the advance targets.
      def afterConsume(s: Int, k: Int, startTs: Long,
                       acc: List[(Int, Int)]): Unit = {
        val st = steps(s)
        if (st.unbounded) { next += Th(s, k, startTs, i, acc); return }
        if (k >= st.minTimes && canEndAt(s)) {
          emit(acc, close = false)
          if (consumed) return
        }
        if (k < st.maxTimes) next += Th(s, k, startTs, i, acc)
        if (k >= st.minTimes)
          advTargets(s).foreach(s2 => next += Th(s2, 0, startTs, i, acc))
      }

      // a greedy run closed by e (e not in the run): emit if the pattern
      // may end here, then cascade e to the following step(s).
      def closeRun(th: Th): Unit = {
        if (canEndAt(th.step)) {
          emit(th.acc, close = true)
          if (consumed || wipe) return
        }
        advTargets(th.step).foreach(s2 =>
          offer(Th(s2, 0, th.startTs, th.lastIdx, th.acc)))
      }

      def offer(th: Th): Unit = {
        if (consumed || wipe || pruned(th.acc)) return
        val st = steps(th.step)
        if (th.reps >= 1) {
          val canExtend = th.lastIdx == i - 1 && th.reps < st.maxTimes &&
            st.pred(e)
          if (st.unbounded) {
            // greedy-maximal: while the predicate holds the run MUST
            // extend (no submatch branching)
            if (canExtend)
              next += Th(th.step, th.reps + 1, th.startTs, i,
                         (th.step, i) :: th.acc)
            else if (th.reps >= st.minTimes) closeRun(th)
            return
          }
          // bounded repeats are strictly consecutive; the advance fork
          // already happened at consume time, so this thread only extends
          if (canExtend) afterConsume(th.step, th.reps + 1, th.startTs,
                                      (th.step, i) :: th.acc)
          return
        }
        // waiting for the step's first repeat
        val forbidden = st.forbid.exists(f =>
          (!st.forbidNextOnly || th.lastIdx == i - 1) && f(e))
        if (forbidden) return // notFollowedBy/notNext kills the partial
        val contiguityOk = !st.strict || th.lastIdx == i - 1
        if (contiguityOk && st.pred(e)) {
          if (st.unbounded) next += Th(th.step, 1, th.startTs, i,
                                       (th.step, i) :: th.acc)
          else afterConsume(th.step, 1, th.startTs, (th.step, i) :: th.acc)
        }
        // survival: relaxed steps may match a later event (followedByAny
        // branching); a strict step's only chance was i == lastIdx + 1
        if (!st.strict && !consumed && !wipe) next += th
      }

      partials.foreach { th =>
        if (!consumed && !wipe) {
          val withinOk = pattern.withinMs.forall(w => t - th.startTs <= w)
          if (withinOk) offer(th)
          else if (th.reps >= math.max(steps(th.step).minTimes, 1) &&
                   steps(th.step).unbounded && canEndAt(th.step)) {
            // a greedy run at a pattern-final step whose every event is
            // inside the within-window is COMPLETE; the out-of-window
            // event merely closes it
            emit(th.acc, close = true)
          }
        }
      }
      if (consumed || wipe) next.clear()
      if (!consumed && steps.head.pred(e)) {
        if (steps.head.unbounded) next += Th(0, 1, t, i, List((0, i)))
        else afterConsume(0, 1, t, List((0, i)))
      }
      partials = if (pruneBelow > 0) next.filter(_.startIdx >= pruneBelow)
                 else next
      i += 1
    }
    // end of input closes any still-open greedy run at a pattern-final step
    partials.foreach { th =>
      if (th.reps >= math.max(steps(th.step).minTimes, 1) &&
          steps(th.step).unbounded && canEndAt(th.step) &&
          th.startIdx >= pruneBelow) {
        out += th.acc.reverse.map(p => events(p._2))
        skipToIdx.foreach { case (st, vi) =>
          val hit = if (st.first) th.acc.reverse.find(_._1 == vi)
                    else th.acc.find(_._1 == vi)
          hit.filter(_._2 > th.startIdx)
            .foreach(h => pruneBelow = math.max(pruneBelow, h._2))
        }
      }
    }
    out.toSeq
  }

  /**
   * Batch CEP over a Dataset: one shuffle on the key, sort within
   * partitions, linear scan with bounded partial-match state.
   */
  def matchBatch[K, V](ds: Dataset[V], pattern: Pattern[V],
                       key: V => K, ts: V => Long,
                       tiebreak: V => Long = (_: V) => 0L)(
      implicit ke: Encoder[K], ve: Encoder[V],
      me: Encoder[Match[K, V]]): Dataset[Match[K, V]] = {
    import org.apache.spark.sql.functions.col
    val lng = org.apache.spark.sql.Encoders.scalaLong
    val tup = org.apache.spark.sql.Encoders.tuple(ke, lng, lng, ve)
    val keyed = ds.map(v => (key(v), ts(v), tiebreak(v), v))(tup)
    keyed.toDF("k", "t", "tb", "v")
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("t"), col("tb"))
      .as[(K, Long, Long, V)](tup)
      .mapPartitions { (it: Iterator[(K, Long, Long, V)]) =>
        // consecutive-key grouping over the sorted partition: only one
        // key's active window is in memory at a time.
        new Iterator[Match[K, V]] {
          // (named `src`, not `buffered`: Iterator already defines that)
          private val src = it.buffered
          private var queue: Iterator[Match[K, V]] = Iterator.empty
          private def refill(): Unit = {
            while (!queue.hasNext && src.hasNext) {
              val k = src.head._1
              val evs = mutable.ArrayBuffer.empty[V]
              while (src.hasNext && src.head._1 == k)
                evs += src.next()._4
              queue = matchAll(pattern, evs.toIndexedSeq, ts)
                .map(m => Match(k, m)).iterator
            }
          }
          def hasNext: Boolean = { refill(); queue.hasNext }
          def next(): Match[K, V] = { refill(); queue.next() }
        }
      }(me)
  }

  /**
   * Streaming CEP (CepOperator.java:83 analogue): buffer per key, emit
   * matches once their within-window is fully behind the watermark
   * (so late events cannot change them), prune emitted prefix.
   */
  /**
   * `tsPerMs` scales the watermark (always epoch-ms in Spark) into the
   * unit of `ts`/`withinMs` — pass 1000 when matching on epoch-µs event
   * times so the within-horizon keeps the batch engine's exact µs
   * boundary semantics instead of truncating to ms.
   *
   * State bounds: the within-horizon is the DEFAULT (and event-time-
   * sound) bound — a key's buffer only holds events younger than
   * `withinMs`, pruned as the watermark advances. `ttl` adds the
   * reference's idle-state retention ON TOP (table.exec.state.ttl
   * applies to CepOperator's keyed NFA state like any other operator):
   * a key IDLE past the retention in processing time drops its pending
   * prefix buffer — its partial match does NOT resume when the key
   * returns, even if the returning event is inside the event-time
   * horizon. Lazy-expiry only (the event-time timeout slot is taken by
   * the horizon flush; Changelog.IdleStateTtl.reclaimTimers is
   * rejected); an event-time timeout wakeup is not a record access and
   * does not refresh the idle clock.
   */
  def matchStream[K, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      pattern: Pattern[V], ts: V => Long,
      tiebreak: V => Long = (_: V) => 0L,
      tsPerMs: Long = 1L,
      ttl: Option[Changelog.IdleStateTtl] = None)(
      implicit ve: Encoder[V], se: Encoder[Seq[V]],
      me: Encoder[Match[K, V]]): Dataset[Match[K, V]] = {
    // Without a within-window there is no sound pruning horizon: state at
    // the watermark would be dropped even though an unbounded pattern may
    // still extend it across micro-batches, silently losing matches.
    require(pattern.withinMs.isDefined,
      "streaming CEP requires Pattern.withinMs (bounded within-window)")
    require(!ttl.exists(_.reclaimTimers),
      "streaming CEP uses the event-time timeout for its horizon flush; " +
      "idle-state retention is lazy-expiry only here")
    val horizon = pattern.withinMs.get
    implicit val stEnc: Encoder[(Seq[V], Long)] =
      org.apache.spark.sql.Encoders.tuple(
        se, org.apache.spark.sql.Encoders.scalaLong)
    grouped.flatMapGroupsWithState[(Seq[V], Long), Match[K, V]](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: K, values: Iterator[V], state: GroupState[(Seq[V], Long)]) =>
        val vs = values.toSeq
        val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
        val (buf0, last0) = state.getOption.getOrElse((Seq.empty[V], now))
        // lazy idle expiry: a key idle past the retention folds from an
        // EMPTY buffer — the expired partial match cannot resume
        val prev = if (ttl.exists(t => now - last0 > t.ms)) Seq.empty[V]
                   else buf0
        // same (ts, tiebreak) order as matchBatch, so ties among equal-ts
        // events resolve identically regardless of arrival batch
        val buf = (prev ++ vs).sortBy(v => (ts(v), tiebreak(v)))
        val wm = state.getCurrentWatermarkMs() * tsPerMs
        // a match starting at event e can only involve events up to
        // ts(e)+horizon; safe to finalize starts below wm - horizon.
        val safeTs = wm - horizon
        val (ready, pending) = buf.partition(v => ts(v) <= safeTs)
        // matches must see ready ∪ pending (a ready start may match into
        // pending events ≤ its horizon — those are all ≤ wm, also final);
        // emit only matches whose FIRST event is in the ready prefix.
        val all = matchAll(pattern, buf.toIndexedSeq, ts)
        val out = all.filter(m => ts(m.head) <= safeTs)
          .map(m => Match(key, m))
        // a drained buffer drops the state entry entirely (no ord counter
        // here, so no tombstone needed — cf. Changelog's drain protocol);
        // otherwise a timeout/flush wakeup (no records) is not an access:
        // carry the previous idle clock so the TTL measures
        // record-to-record gaps
        if (pending.isEmpty) state.remove()
        else {
          state.update((pending, if (vs.nonEmpty) now else last0))
          // timeout timestamps are epoch-ms: scale back from the ts unit
          state.setTimeoutTimestamp((ts(pending.head) + horizon) / tsPerMs + 1)
        }
        out.iterator
    }
  }
}
