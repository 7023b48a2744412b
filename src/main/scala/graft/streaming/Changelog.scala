package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Changelog / RowKind semantics (SURVEY §7.4.1 — the reference's central
 * streaming abstraction: RowKind +I/-U/+U/-D on every record,
 * CORE/types/RowKind.java:27; GroupAggFunction emits retraction pairs,
 * RUNTIME/.../aggregate/GroupAggFunction.java:43).
 *
 * Structured Streaming composes append-only streams, surfacing updates
 * only at the sink — so where Flink pipes an *updating* table into
 * another operator, we carry the row kind AS DATA (a `row_kind` column)
 * and make downstream operators changelog-aware:
 *
 *  - `materialize`: batch-apply a changelog (ordered upserts/deletes per
 *    key) into its final table — one window pass, no driver loop;
 *  - `aggregateChangelog`: a streaming per-key SUM/COUNT that CONSUMES a
 *    changelog (insert/delete rows) and EMITS a changelog (-U old, +U
 *    new per change), i.e. GroupAggFunction's retraction behavior;
 *  - `joinChangelog`: an inner join that CONSUMES two changelogs and
 *    EMITS the join result's changelog — the agg→join composition
 *    (StreamingJoinOperator semantics);
 *  - `joinChangelogOuter`: the LEFT/RIGHT/FULL outer configuration of
 *    the same operator, null-padding the outer side and retracting the
 *    padded row when the first match arrives
 *    (OuterJoinRecordStateView semantics).
 */
object Changelog {

  // RowKind byte encoding mirrors the reference ordinal.
  val Insert = "+I"
  val UpdateBefore = "-U"
  val UpdateAfter = "+U"
  val Delete = "-D"

  /**
   * Batch-materialize a changelog into its current table: per key, apply
   * +I/+U/-D in `ord` order; the last surviving row wins, deleted keys
   * vanish. One shuffle + one sorted window pass.
   */
  def materialize(changelog: DataFrame, keyCol: String, kindCol: String,
                  ordCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(ordCol).desc)
    changelog
      .filter(col(kindCol) =!= UpdateBefore) // -U carries no new state
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(kindCol) =!= Delete)
      .drop("__rn")
  }

  /** One changelog-aggregate output row (kind ∈ -U/+U per emission). */
  final case class AggChange(key: Long, kind: String, sum: Double, count: Long)

  /**
   * Streaming changelog-consuming SUM/COUNT per key: input rows are
   * (key, kind, value) where kind ∈ {+I, -D}; every state change emits
   * the retraction pair (-U previous aggregate, +U new aggregate) —
   * exactly GroupAggFunction's protocol. Groups whose count returns to 0
   * retire their state (the reference's RecordCounter behavior).
   */
  /** One retract-aware extremes output row (kind ∈ -U/+U/-D). */
  final case class ExtremeChange(key: Long, kind: String,
                                 min: Double, max: Double,
                                 first: Double, last: Double, count: Long)

  /**
   * Retract-aware MIN/MAX/FIRST_VALUE/LAST_VALUE per key — the agg
   * family SUM/COUNT retraction alone can't express: deleting the row
   * holding the current max must re-emit the runner-up
   * (PLANNER-J/functions/aggfunctions/MaxWithRetractAggFunction.java and
   * FirstValueWithRetractAggFunction.java keep a sorted map / ordered
   * list in keyed state for exactly this).
   *
   * State is the key's LIVE row set as `Map[ord → value]` (ord is the
   * caller's unique row id — the changelog position): an insert adds its
   * entry, a delete removes it, and every emission recomputes
   * min/max/first/last from the live set. Where Flink's TreeMap pays
   * O(log n) per record to keep extremes incremental, a micro-batch
   * recompute is one O(live) scan per key per batch — the SS-idiomatic
   * trade, bounded by the key's non-retracted rows, not by history.
   * Emission protocol is GroupAggFunction's: any change emits
   * (-U previous, +U new); a count reaching 0 emits (-U previous, -D).
   */
  def aggregateChangelogMinMax[V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[Long, V],
      kind: V => String, value: V => Double, ord: V => Long)(
      implicit ve: Encoder[V]): Dataset[ExtremeChange] = {
    import org.apache.spark.sql.Encoders
    implicit val se: Encoder[Map[Long, Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    implicit val oe: Encoder[ExtremeChange] = Encoders.product[ExtremeChange]
    def snap(key: Long, k: String, live: Map[Long, Double]): ExtremeChange = {
      val vs = live.values
      ExtremeChange(key, k, vs.min, vs.max,
        live(live.keys.min), live(live.keys.max), live.size.toLong)
    }
    grouped.flatMapGroupsWithState[Map[Long, Double], ExtremeChange](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: Long, values: Iterator[V], state: GroupState[Map[Long, Double]]) =>
        val live0 = state.getOption.getOrElse(Map.empty[Long, Double])
        var live = live0
        values.foreach { v =>
          kind(v) match {
            case Insert | UpdateAfter => live += (ord(v) -> value(v))
            case Delete | UpdateBefore => live -= ord(v)
          }
        }
        if (live.isEmpty) state.remove() else state.update(live)
        val before0 = if (live0.isEmpty) None else Some(snap(key, UpdateBefore, live0))
        val after0 = if (live.isEmpty) None else Some(snap(key, UpdateAfter, live))
        (before0, after0) match {
          case (Some(b), Some(a)) if (b.min, b.max, b.first, b.last, b.count) ==
                                     (a.min, a.max, a.first, a.last, a.count) =>
            Iterator.empty
          case (b, Some(a)) => b.iterator ++ Iterator(a)
          case (Some(b), None) =>
            Iterator(b, b.copy(kind = Delete))
          case (None, None) => Iterator.empty
        }
    }
  }

  /** One changelog-join output row: the joined pair plus the per-key
    * emission sequence (`ord`) that makes `materialize` applicable
    * downstream when the join output is upsert-shaped (≤1 live pair per
    * key, as in agg-view ▸ join compositions). */
  final case class JoinChange[L, R](key: Long, kind: String,
                                    left: L, right: R, ord: Long)

  /**
   * Streaming changelog-consuming INNER JOIN of two updating inputs —
   * the reference's StreamingJoinOperator
   * (RUNTIME/.../operators/join/stream/StreamingJoinOperator.java:38)
   * over JoinRecordStateViews (state/JoinRecordStateViews.java): each
   * side's keyed state is its LIVE row multiset (payload → count);
   * accumulate messages (+I/+U) add a row, retract messages (-U/-D)
   * remove one instance by payload equality, and every state change
   * emits the delta of the joined pair multiset as a changelog.
   *
   * Inputs are (joinKey, rowKind, payload) changelogs. Both are unioned
   * into ONE keyed stateful operator (a single shuffle on the join key —
   * the same co-partitioning Flink's twoInput operator gets from its
   * hash exchanges), so left and right state live under the same group
   * key, the way JoinRecordStateViews pairs them.
   *
   * Emission protocol is batch-atomic, mirroring `aggregateChangelog`:
   * after applying the micro-batch's messages, pairs removed from the
   * joined multiset emit -U (or -D when the key's join result empties)
   * and added pairs emit +U (or +I when the key had no live pair) —
   * the same net changelog as the reference's per-record emission,
   * without transient pairs for same-batch both-side updates. Emissions
   * carry a per-key sequence number (kept in state) so downstream
   * `materialize` sees a totally ordered per-key log.
   *
   * A retraction whose payload is not in the live set is ignored (the
   * reference's "state staled" tolerance). Duplicate rows are handled
   * by counting, exactly like JoinRecordStateView.InputSideHasNoUniqueKey.
   * `cond` is the residual join condition beyond the equi-key (the
   * reference's generated JoinCondition): pairs failing it never enter
   * the join-result multiset.
   *
   * Scale: state per key = live rows of BOTH sides for that key (what
   * any streaming two-way join must hold); one exchange total; the
   * per-batch cross-product delta touches only keys present in the
   * batch. 100 TB: hot join keys are the skew risk exactly as in the
   * reference — mitigate upstream via aggregateChangelog (upsert views
   * have ≤1 live row per key, making the join O(1) per key per batch).
   */
  def joinChangelog[L, R](
      left: Dataset[(Long, String, L)],
      right: Dataset[(Long, String, R)],
      cond: (L, R) => Boolean = (_: L, _: R) => true)(
      implicit lt: scala.reflect.runtime.universe.TypeTag[L],
      rt: scala.reflect.runtime.universe.TypeTag[R]): Dataset[JoinChange[L, R]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val ue: Encoder[(Long, String, Option[L], Option[R])] =
      ExpressionEncoder()
    implicit val ke: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    implicit val se: Encoder[(Seq[(L, Long)], Seq[(R, Long)], Long)] =
      ExpressionEncoder()
    implicit val oe: Encoder[JoinChange[L, R]] = ExpressionEncoder()

    def bump[P](m: Map[P, Long], p: P, d: Long): Map[P, Long] = {
      val c = m.getOrElse(p, 0L) + d
      // c == 0: count exhausted; c < 0: stale retract — drop/ignore either
      if (c > 0) m + (p -> c) else m - p
    }
    def cross(lm: Map[L, Long], rm: Map[R, Long]): Map[(L, R), Long] =
      for { (l, cl) <- lm; (r, cr) <- rm if cond(l, r) }
        yield (l, r) -> cl * cr
    def minus(a: Map[(L, R), Long], b: Map[(L, R), Long]) =
      a.flatMap { case (p, c) =>
        val d = c - b.getOrElse(p, 0L)
        if (d > 0) Some(p -> d) else None
      }
    // deterministic emission order within a batch (Map order is not)
    def expand(m: Map[(L, R), Long]): Seq[(L, R)] =
      m.toSeq.sortBy(_._1.toString)
        .flatMap { case (p, c) => Seq.fill(c.toInt)(p) }

    val tagged =
      left.map { case (k, kind, l) => (k, kind, Option(l), Option.empty[R]) }
        .union(right.map { case (k, kind, r) =>
          (k, kind, Option.empty[L], Option(r)) })
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(L, Long)], Seq[(R, Long)], Long),
                              JoinChange[L, R]](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, values: Iterator[(Long, String, Option[L], Option[R])],
         state: GroupState[(Seq[(L, Long)], Seq[(R, Long)], Long)]) =>
          val (l0, r0, n0) = state.getOption
            .getOrElse((Seq.empty[(L, Long)], Seq.empty[(R, Long)], 0L))
          var lm = l0.toMap
          var rm = r0.toMap
          val before = cross(lm, rm)
          values.foreach { case (_, kind, lo, ro) =>
            val d = kind match {
              case Insert | UpdateAfter => 1L
              case Delete | UpdateBefore => -1L
            }
            lo.foreach(p => lm = bump(lm, p, d))
            ro.foreach(p => rm = bump(rm, p, d))
          }
          val after = cross(lm, rm)
          val removed = expand(minus(before, after))
          val added = expand(minus(after, before))
          var n = n0
          def rows(ps: Seq[(L, R)], kind: String): Seq[JoinChange[L, R]] =
            ps.map { case (l, r) => n += 1; JoinChange(key, kind, l, r, n) }
          val out =
            rows(removed, if (after.isEmpty) Delete else UpdateBefore) ++
            rows(added, if (before.isEmpty) Insert else UpdateAfter)
          if (lm.isEmpty && rm.isEmpty) state.remove()
          else state.update((lm.toSeq, rm.toSeq, n))
          out.iterator
      }
  }

  /** Which side(s) of an outer changelog join emit null-padded rows
    * when the other side has no live match for the key. */
  sealed abstract class OuterSide(val padLeft: Boolean, val padRight: Boolean)
      extends Serializable
  case object LeftOuter extends OuterSide(padLeft = true, padRight = false)
  case object RightOuter extends OuterSide(padLeft = false, padRight = true)
  case object FullOuter extends OuterSide(padLeft = true, padRight = true)

  /** One OUTER changelog-join output row: `left`/`right` is None on the
    * null-padded side (the reference pads with NullRowData). */
  final case class OuterJoinChange[L, R](key: Long, kind: String,
                                         left: Option[L], right: Option[R],
                                         ord: Long)

  /**
   * Streaming changelog-consuming OUTER join (LEFT / RIGHT / FULL) of
   * two updating inputs — the reference's StreamingJoinOperator in its
   * outer configuration (RUNTIME/.../operators/join/stream/
   * StreamingJoinOperator.java:38 with leftIsOuter/rightIsOuter, padding
   * via `padRecord`; association counting per
   * state/OuterJoinRecordStateView.java:35).
   *
   * Same state/emission machinery as [[joinChangelog]] (live-row
   * multiset per side under one group key; batch-atomic delta of the
   * join-result multiset). The only difference is the result function:
   * a row on an outer side with zero passing associations emits paired
   * with None. The before→after diff then yields exactly the reference's
   * padded-row retractions: a left row living alone emits (l, None);
   * when its first passing right match arrives, (l, None) is retracted
   * (-U) and (l, r) inserted (+U) — the numOfAssociations 0→1 transition
   * of OuterJoinRecordStateView; the 1→0 transition re-pads. `cond` is
   * the residual join condition beyond the equi-key (the reference's
   * generated JoinCondition); with a non-trivial cond, padding is per
   * ROW — a left row whose only candidate fails the condition stays
   * padded even while the key's right side is non-empty.
   *
   * Scale: identical profile to the inner join — one exchange, per-key
   * state is both sides' live rows, padding adds no extra state (it is
   * derived from emptiness, where the reference stores an association
   * count beside each row as a lookup-cost optimization; recomputing the
   * count from in-memory batch state is cheaper than keeping it
   * transactionally consistent here).
   */
  def joinChangelogOuter[L, R](
      left: Dataset[(Long, String, L)],
      right: Dataset[(Long, String, R)],
      side: OuterSide,
      cond: (L, R) => Boolean = (_: L, _: R) => true)(
      implicit lt: scala.reflect.runtime.universe.TypeTag[L],
      rt: scala.reflect.runtime.universe.TypeTag[R]): Dataset[OuterJoinChange[L, R]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val ue: Encoder[(Long, String, Option[L], Option[R])] =
      ExpressionEncoder()
    implicit val ke: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    implicit val se: Encoder[(Seq[(L, Long)], Seq[(R, Long)], Long)] =
      ExpressionEncoder()
    implicit val oe: Encoder[OuterJoinChange[L, R]] = ExpressionEncoder()

    type Pair = (Option[L], Option[R])
    def bump[P](m: Map[P, Long], p: P, d: Long): Map[P, Long] = {
      val c = m.getOrElse(p, 0L) + d
      if (c > 0) m + (p -> c) else m - p
    }
    // The key's join-result multiset under the outer semantics. Padding
    // is PER ROW: a row pads when it has zero passing associations on
    // the other side (OuterJoinRecordStateView.numOfAssociations == 0)
    // — with the default always-true cond this reduces to "the other
    // side of the key is empty".
    def result(lm: Map[L, Long], rm: Map[R, Long]): Map[Pair, Long] = {
      val pairs: Map[Pair, Long] =
        for { (l, cl) <- lm; (r, cr) <- rm if cond(l, r) }
          yield (Option(l), Option(r)) -> cl * cr
      val padL: Map[Pair, Long] =
        if (side.padLeft)
          lm.collect { case (l, c) if !rm.keysIterator.exists(cond(l, _)) =>
            (Option(l), Option.empty[R]) -> c }
        else Map.empty
      val padR: Map[Pair, Long] =
        if (side.padRight)
          rm.collect { case (r, c) if !lm.keysIterator.exists(cond(_, r)) =>
            (Option.empty[L], Option(r)) -> c }
        else Map.empty
      pairs ++ padL ++ padR
    }
    def minus(a: Map[Pair, Long], b: Map[Pair, Long]) =
      a.flatMap { case (p, c) =>
        val d = c - b.getOrElse(p, 0L)
        if (d > 0) Some(p -> d) else None
      }
    def expand(m: Map[Pair, Long]): Seq[Pair] =
      m.toSeq.sortBy(_._1.toString)
        .flatMap { case (p, c) => Seq.fill(c.toInt)(p) }

    val tagged =
      left.map { case (k, kind, l) => (k, kind, Option(l), Option.empty[R]) }
        .union(right.map { case (k, kind, r) =>
          (k, kind, Option.empty[L], Option(r)) })
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(L, Long)], Seq[(R, Long)], Long),
                              OuterJoinChange[L, R]](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, values: Iterator[(Long, String, Option[L], Option[R])],
         state: GroupState[(Seq[(L, Long)], Seq[(R, Long)], Long)]) =>
          val (l0, r0, n0) = state.getOption
            .getOrElse((Seq.empty[(L, Long)], Seq.empty[(R, Long)], 0L))
          var lm = l0.toMap
          var rm = r0.toMap
          val before = result(lm, rm)
          values.foreach { case (_, kind, lo, ro) =>
            val d = kind match {
              case Insert | UpdateAfter => 1L
              case Delete | UpdateBefore => -1L
            }
            lo.foreach(p => lm = bump(lm, p, d))
            ro.foreach(p => rm = bump(rm, p, d))
          }
          val after = result(lm, rm)
          val removed = expand(minus(before, after))
          val added = expand(minus(after, before))
          var n = n0
          def rows(ps: Seq[Pair], kind: String): Seq[OuterJoinChange[L, R]] =
            ps.map { case (l, r) =>
              n += 1; OuterJoinChange(key, kind, l, r, n)
            }
          val out =
            rows(removed, if (after.isEmpty) Delete else UpdateBefore) ++
            rows(added, if (before.isEmpty) Insert else UpdateAfter)
          if (lm.isEmpty && rm.isEmpty) state.remove()
          else state.update((lm.toSeq, rm.toSeq, n))
          out.iterator
      }
  }

  def aggregateChangelog[V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[Long, V],
      kind: V => String, value: V => Double)(
      implicit ve: Encoder[V]): Dataset[AggChange] = {
    import org.apache.spark.sql.Encoders
    implicit val se: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    implicit val oe: Encoder[AggChange] = Encoders.product[AggChange]
    grouped.flatMapGroupsWithState[(Double, Long), AggChange](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: Long, values: Iterator[V], state: GroupState[(Double, Long)]) =>
        val (s0, c0) = state.getOption.getOrElse((0.0, 0L))
        var (s, c) = (s0, c0)
        values.foreach { v =>
          kind(v) match {
            case Insert | UpdateAfter => s += value(v); c += 1
            case Delete | UpdateBefore => s -= value(v); c -= 1
          }
        }
        if (c == 0L) state.remove() else state.update((s, c))
        if ((s, c) == (s0, c0)) Iterator.empty
        else {
          val before =
            if (c0 == 0L) Iterator.empty
            else Iterator(AggChange(key, UpdateBefore, s0, c0))
          val after =
            if (c == 0L) Iterator(AggChange(key, Delete, s0, c0))
            else Iterator(AggChange(key, UpdateAfter, s, c))
          before ++ after
        }
    }
  }
}
