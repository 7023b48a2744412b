package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Keyed two-input connect (SURVEY §2.2/§2.9): the analogue of the
 * reference's `ConnectedStreams.keyBy(...).process(KeyedCoProcessFunction)`
 * (STREAM/api/datastream/ConnectedStreams.java:120,
 * STREAM/api/functions/co/KeyedCoProcessFunction.java:58-66 —
 * processElement1/processElement2 sharing one set of per-key state).
 *
 * Structured Streaming's stateful operator is single-input, so the two
 * streams are unioned into a tagged envelope BEFORE `groupByKey` — the
 * same mechanical trick the reference's own two-input StreamTask plays
 * at the network layer (records from either input interleave into one
 * keyed operator). Within each micro-batch the envelope buffer is
 * sorted by (eventTime, side, tiebreak) with side 0 (control) ordered
 * before side 1 (data) at equal timestamps, so the fold order is
 * deterministic and — under event-time-ordered replay — equals the
 * wall-clock arrival order a Flink job would see.
 *
 * Scale notes: state is one user value per key, partitioned across the
 * cluster by the group key exactly like Flink keyBy; the per-batch sort
 * is per-key-per-batch (bounded by a key's batch arrival volume), never
 * a global sort.
 */
object CoProcess {

  /** Tagged union envelope: exactly one of `a`/`b` is set; `ts`/`tie`
    * carry the ordering key so the fold never reaches into the payloads. */
  final case class Env[A, B](side: Int, ts: Long, tie: Long,
                             a: Option[A], b: Option[B])

  /**
   * Connect two keyed streams over shared per-key state `S`.
   *
   * @param onLeft  processElement1: (state, element) => (state', emissions)
   * @param onRight processElement2: (state, element) => (state', emissions)
   */
  def connect[K: Encoder, A, B, S, O](
      left: Dataset[(K, Long, Long, A)],   // (key, eventTime, tiebreak, payload)
      right: Dataset[(K, Long, Long, B)],
      onLeft: (Option[S], A) => (Option[S], Iterator[O]),
      onRight: (Option[S], B) => (Option[S], Iterator[O]))(
      implicit ae: Encoder[A], be: Encoder[B], se: Encoder[S],
      oe: Encoder[O],
      envE: Encoder[(K, Env[A, B])]): Dataset[O] = {
    val l = left.map { case (k, t, tb, a) =>
      (k, Env[A, B](0, t, tb, Some(a), None)) }
    val r = right.map { case (k, t, tb, b) =>
      (k, Env[A, B](1, t, tb, None, Some(b))) }
    l.union(r)
      .groupByKey(_._1)
      .flatMapGroupsWithState[S, O](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[(K, Env[A, B])], state: GroupState[S]) =>
          val sorted = rows.map(_._2).toSeq
            .sortBy(e => (e.ts, e.side, e.tie))
          var st = state.getOption
          val out = Seq.newBuilder[O]
          sorted.foreach { e =>
            val (next, emitted) =
              if (e.side == 0) onLeft(st, e.a.get) else onRight(st, e.b.get)
            st = next
            out ++= emitted
          }
          st match {
            case Some(v) => state.update(v)
            case None    => state.remove()
          }
          out.result().iterator
      }
  }
}
