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

  /** A sequential pattern with an optional within-window (ms). */
  final case class Pattern[V](steps: Seq[Step[V]], withinMs: Option[Long],
                              skipPastLast: Boolean = false) {
    require(steps.nonEmpty && !steps.head.strict,
      "first step cannot be strict")
    require(steps.head.minTimes >= 1, "first step cannot be optional")

    /** Quantifier elimination: the cartesian expansion of each step's
      * min..max repeat counts into plain step sequences. Enumerate-all
      * matching over the expansions equals Flink's followedByAny × noSkip
      * semantics for bounded quantifiers; expansions of different counts
      * yield matches of different lengths, so no duplicates arise unless
      * two ADJACENT quantified steps share a predicate (document: use
      * disjoint step predicates with quantifiers). */
    private[streaming] lazy val expansions: Seq[Seq[Step[V]]] =
      steps.foldLeft(Seq(Seq.empty[Step[V]])) { (acc, st) =>
        val reps: Seq[Seq[Step[V]]] =
          if (st.unbounded) {
            // timesOrMore(n): n-1 plain consecutive copies, then the
            // looping state itself (consumes the ≥1 remaining repeats).
            val lead =
              if (st.minTimes <= 1) Seq.empty
              else st.copy(minTimes = 1, maxTimes = 1) +:
                Seq.fill(st.minTimes - 2)(st.copy(minTimes = 1, maxTimes = 1,
                                                  strict = true, forbid = None))
            val loop = st.copy(minTimes = 1,
                               strict = st.strict || st.minTimes > 1,
                               forbid = if (st.minTimes > 1) None else st.forbid)
            // zeroOrMore also admits the empty repetition
            if (st.minTimes == 0) Seq(Seq.empty, lead :+ loop)
            else Seq(lead :+ loop)
          } else (st.minTimes to st.maxTimes).map { n =>
            if (n == 0) Seq.empty
            else st.copy(minTimes = 1, maxTimes = 1) +:
              // repeats of a quantified step are strictly contiguous with
              // each other (Flink's Pattern.times(n).consecutive())
              Seq.fill(n - 1)(st.copy(minTimes = 1, maxTimes = 1,
                                      strict = true, forbid = None))
          }
        for (a <- acc; r <- reps) yield a ++ r
      }
  }

  /** A completed match: the matched events in step order. */
  final case class Match[K, V](key: K, events: Seq[V])

  /**
   * Core matcher: enumerate matches over one key's time-ordered events.
   * Keeps only partial matches younger than the within-horizon; for
   * skipPastLast, matched events are consumed greedily in scan order.
   */
  private[streaming] def matchSeq[V](
      steps: Seq[Step[V]], pattern: Pattern[V], events: IndexedSeq[V],
      ts: V => Long): Seq[Seq[V]] = {
    val out = mutable.ArrayBuffer.empty[Seq[V]]
    // partial match:
    // (nextStepIdx, startTs, lastMatchedIdx, eventsReversed, looping)
    // looping = currently extending an Unbounded step's consecutive run.
    var partials = mutable.ArrayBuffer.empty[(Int, Long, Int, List[V], Boolean)]
    var i = 0
    while (i < events.length) {
      val e = events(i)
      val t = ts(e)
      val next = mutable.ArrayBuffer.empty[(Int, Long, Int, List[V], Boolean)]
      var consumed = false
      // a greedy run that closed BEFORE e emitted a match not containing
      // e: under skip-past-last all overlapping partials die, but e itself
      // stays eligible to start the next match (MR "past last row").
      var wipe = false
      // offer may cascade: a closing greedy run hands the SAME event to
      // the following step (the run-closing event can begin the next step).
      def offer(stepIdx: Int, startTs: Long, lastIdx: Int, acc: List[V],
                looping: Boolean): Unit = {
        if (consumed || wipe) return
        val step = steps(stepIdx)
        if (looping) {
          // greedy-maximal: while the predicate holds the run MUST extend
          // (no submatch branching — MATCH_RECOGNIZE `X+` semantics).
          if (lastIdx == i - 1 && step.pred(e)) {
            next += ((stepIdx, startTs, i, e :: acc, true))
          } else if (stepIdx == steps.length - 1) {
            // run closed by a non-matching event; loop was the last step
            out += acc.reverse
            wipe = pattern.skipPastLast
          } else {
            offer(stepIdx + 1, startTs, lastIdx, acc, looping = false)
          }
          return
        }
        // notFollowedBy / notNext: an event matching the negative guard
        // in the gap before this step kills the partial (takes
        // precedence over the step predicate — conservative).
        val forbidden = step.forbid.exists(f =>
          (!step.forbidNextOnly || lastIdx == i - 1) && f(e))
        if (forbidden) return
        val contiguityOk = !step.strict || lastIdx == i - 1
        if (contiguityOk && step.pred(e)) {
          if (step.unbounded) {
            next += ((stepIdx, startTs, i, e :: acc, true))
          } else if (stepIdx == steps.length - 1) {
            out += (e :: acc).reverse
            consumed = pattern.skipPastLast
          } else {
            next += ((stepIdx + 1, startTs, i, e :: acc, false))
          }
        }
        // Survival: relaxed steps may match a later event (followedByAny
        // branching — every combination is enumerated, the semantics the
        // SQL oracle's join reproduces); a strict step's only chance was
        // i == lastIdx + 1, so it never survives past its slot.
        if (!step.strict && !consumed)
          next += ((stepIdx, startTs, lastIdx, acc, false))
      }
      partials.foreach { case (stepIdx, startTs, lastIdx, acc, looping) =>
        val withinOk = pattern.withinMs.forall(w => t - startTs <= w)
        if (withinOk && !consumed && !wipe)
          offer(stepIdx, startTs, lastIdx, acc, looping)
        else if (!withinOk && !consumed && !wipe && looping &&
                 stepIdx == steps.length - 1) {
          // A greedy run at the final step whose every event is inside the
          // within-window is COMPLETE; the out-of-window event merely
          // closes it. Emit it (same as the end-of-input sweep below)
          // instead of silently dropping a valid match.
          out += acc.reverse
          wipe = pattern.skipPastLast
        }
      }
      // skip-past-last: drop overlapping partials
      if (consumed || wipe) next.clear()
      if (!consumed && steps.head.pred(e)) {
        if (steps.head.unbounded) next += ((0, t, i, List(e), true))
        else if (steps.length == 1) out += Seq(e)
        else next += ((1, t, i, List(e), false))
      }
      partials = next
      i += 1
    }
    // end of input closes any still-open run of a final looping step
    partials.foreach { case (stepIdx, _, _, acc, looping) =>
      if (looping && stepIdx == steps.length - 1) out += acc.reverse
    }
    out.toSeq
  }

  /** Enumerate matches across all quantifier expansions of the pattern. */
  private[streaming] def matchAll[V](
      pattern: Pattern[V], events: IndexedSeq[V], ts: V => Long): Seq[Seq[V]] =
    pattern.expansions.flatMap(st => matchSeq(st, pattern, events, ts))

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
  def matchStream[K, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      pattern: Pattern[V], ts: V => Long)(
      implicit ve: Encoder[V], se: Encoder[Seq[V]],
      me: Encoder[Match[K, V]]): Dataset[Match[K, V]] = {
    // Without a within-window there is no sound pruning horizon: state at
    // the watermark would be dropped even though an unbounded pattern may
    // still extend it across micro-batches, silently losing matches.
    require(pattern.withinMs.isDefined,
      "streaming CEP requires Pattern.withinMs (bounded within-window)")
    val horizon = pattern.withinMs.get
    grouped.flatMapGroupsWithState[Seq[V], Match[K, V]](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: K, values: Iterator[V], state: GroupState[Seq[V]]) =>
        val buf = (state.getOption.getOrElse(Seq.empty) ++ values)
          .sortBy(ts)
        val wm = state.getCurrentWatermarkMs()
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
        state.update(pending)
        if (pending.nonEmpty)
          state.setTimeoutTimestamp(ts(pending.head) + horizon + 1)
        out.iterator
    }
  }
}
