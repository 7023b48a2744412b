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
 *    new per change), i.e. GroupAggFunction's retraction behavior.
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
