package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming temporal / as-of join (SURVEY §2.3 row 27, the one join the
 * batch layer alone couldn't cover): for each probe row, the latest
 * build-side version with `version.ts <= probe.ts` on the same key,
 * emitted only once the event-time watermark passes the probe's
 * timestamp — the semantics of the reference's
 * flink-table-runtime-blink/.../join/temporal/TemporalRowTimeJoinOperator.java:72
 * (both sides buffered in keyed state, rightState is a versioned map,
 * emission at watermark, state pruned below the watermark).
 *
 * Spark-first shape: the two inputs are tagged into one union stream,
 * watermarked, grouped by key, and joined inside ONE
 * flatMapGroupsWithState pass — per-key state is (pending probes,
 * versioned build rows), both bounded by the watermark:
 *   - a probe emits exactly once, when watermark ≥ its ts (so the
 *     version set at its ts is complete — same trigger as the
 *     reference's registerEventTimeTimer(rowTime));
 *   - versions below the watermark are pruned EXCEPT the latest one,
 *     which stays current for future probes (the reference's
 *     "keep latest version left of watermark" rule);
 *   - rows below the watermark at arrival never reach the operator —
 *     Structured Streaming's stateful-operator late-data filter drops
 *     them (both sides), which is exactly the reference's late-row
 *     handling for the probe side and strictly-at-watermark semantics
 *     for the build side: emission waits for the watermark, so every
 *     non-late version is in state before its probes emit.
 *
 * Scale: state per key is O(pending-probes-in-watermark-lag +
 * versions-in-lag + 1), not history; keys hash-partition across
 * executors exactly like the reference's keyBy, and the SS state store
 * checkpoints it exactly-once. No sort, no cross product.
 *
 * Tie semantics match the batch dual `AsOfJoin.leftAsOf`: versions at
 * ts equal to the probe ts ARE visible; among versions with identical
 * ts the highest `ord` wins.
 */
object TemporalJoin {

  /** Tagged union element — exactly one of probe/version is defined.
    * The event-time column `ts` stays inside the element so the
    * watermark survives the typed map (see repo env notes). Keys are
    * GENERIC since round 14 (the reference keys state on arbitrary
    * BinaryRowData); the Long-keyed surface below is the classic
    * signature, bit-identical to prior rounds. */
  case class TaggedK[K, L, R](key: K, ts: Timestamp,
                              probe: Option[L], version: Option[R])
  /** The classic Long-keyed element shape (type alias for source
    * compatibility with existing callers' encoder derivations). */
  type Tagged[L, R] = TaggedK[Long, L, R]

  /** Per-key state: pending probes + versioned build side, both as
    * (epochMillis, ord, payload) sorted ascending. */
  case class TJState[L, R](probes: List[(Long, L)],
                           versions: List[(Long, Long, R)])

  /**
   * @param left     probe stream
   * @param right    versioned build stream
   * @param leftKey/rightKey   key extractors (hash-partition key)
   * @param leftTs/rightTs     event-time extractors
   * @param rightOrd deterministic tie-break among equal-ts versions
   * @param delay    watermark delay (e.g. "10 minutes")
   * @return (probe, matched version or None), append-mode emissions
   */
  def streamAsOf[L, R](
      left: Dataset[L], right: Dataset[R],
      leftKey: L => Long, rightKey: R => Long,
      leftTs: L => Timestamp, rightTs: R => Timestamp,
      rightOrd: R => Long, delay: String)(
      implicit tagEnc: Encoder[Tagged[L, R]],
      stEnc: Encoder[TJState[L, R]],
      outEnc: Encoder[(L, Option[R])]): Dataset[(L, Option[R])] = {
    implicit val keyEnc: Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    streamAsOfKeyed[Long, L, R](left, right, leftKey, rightKey,
      leftTs, rightTs, rightOrd, delay)
  }

  /** [[streamAsOf]] with a GENERIC key type — the route StreamSqlTime
    * uses for string/canonical-form keys (the changelog family's
    * generic-key discipline applied to the temporal join). */
  def streamAsOfKeyed[K, L, R](
      left: Dataset[L], right: Dataset[R],
      leftKey: L => K, rightKey: R => K,
      leftTs: L => Timestamp, rightTs: R => Timestamp,
      rightOrd: R => Long, delay: String)(
      implicit keyEnc: Encoder[K],
      tagEnc: Encoder[TaggedK[K, L, R]],
      stEnc: Encoder[TJState[L, R]],
      outEnc: Encoder[(L, Option[R])]): Dataset[(L, Option[R])] = {

    val spark = left.sparkSession
    import spark.implicits._

    val lTagged = left.map(l =>
      TaggedK[K, L, R](leftKey(l), leftTs(l), Some(l), None))
    val rTagged = right.map(r =>
      TaggedK[K, L, R](rightKey(r), rightTs(r), None, Some(r)))

    lTagged.union(rTagged)
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[TJState[L, R], (L, Option[R])](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, values: Iterator[TaggedK[K, L, R]],
         state: GroupState[TJState[L, R]]) =>
          val st = state.getOption.getOrElse(
            TJState[L, R](Nil, Nil))
          val wm = state.getCurrentWatermarkMs()

          var probes = st.probes
          var versions = st.versions
          values.foreach { v =>
            val ms = v.ts.getTime
            v.probe match {
              // defensive: SS already filters below-watermark input, but
              // a probe exactly AT the watermark is emittable this sweep.
              case Some(l) => if (ms >= wm) probes = (ms, l) :: probes
              case None =>
                val r = v.version.get
                versions = (ms, rightOrd(r), r) :: versions
            }
          }

          val sortedV = versions.sortBy(v => (v._1, v._2))
          val (ready, pending) = probes.partition(_._1 <= wm)
          val out = ready.sortBy(_._1).iterator.map { case (pms, l) =>
            val m = sortedV.takeWhile(_._1 <= pms).lastOption
            (l, m.map(_._3))
          }.toList

          // Prune versions strictly below the watermark, keeping the
          // latest of them — it is still the current version for any
          // future probe at ts ≥ watermark.
          val (old, live) = sortedV.partition(_._1 < wm)
          val kept = (old.lastOption.toList ++ live)

          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(TJState(pending, kept))
            // earliest pending probe fires the next emission sweep (all
            // pending probes have ts > wm, so that timer is legal); and
            // when more than one version is retained, a PRUNE timer at
            // the earliest live version's instant reclaims an idle
            // key's version tail once the watermark passes it — the
            // reference prunes below-watermark state on watermark
            // timers (TemporalRowTimeJoinOperator.java:72), not only
            // when the key happens to receive another record.
            val probeTimer = pending.map(_._1).minOption
            val pruneTimer =
              if (kept.size > 1) live.map(_._1).minOption.map(_ + 1L)
              else None
            (probeTimer.toList ++ pruneTimer.toList).minOption
              .foreach(state.setTimeoutTimestamp)
          }
          out.iterator
      }
  }
}
