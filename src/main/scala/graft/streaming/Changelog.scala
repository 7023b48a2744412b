package graft.streaming

import scala.reflect.runtime.universe.TypeTag

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
  /** Internal pseudo-kind: refreshes a key's idle-state clock without
    * touching its multisets (used by [[joinChangelogSharded]] to keep
    * every shard of a key on the same TTL clock). Never emitted. */
  val Touch = "~T"

  /**
   * Idle-state retention (the reference's
   * `StreamQueryConfig#withIdleStateRetentionTime` /
   * `table.exec.state.ttl`, cleanup timers in
   * PLANNER-J/runtime/functions/KeyedProcessFunctionWithCleanupState.java):
   * a key whose state has not been ACCESSED (read-or-written by a
   * record) for `ms` of processing time is dropped, so never-retracted
   * keys don't accumulate forever on unbounded streams. Two mechanisms
   * give at-`ms` semantics under micro-batching:
   *
   *  - lazy expiry on access (always on): a record arriving for a key
   *    idle past the TTL folds from FRESH state (the view a Flink
   *    record gets after the cleanup timer fired) — wall-clock-exact,
   *    because it compares the batch's processing time against the
   *    key's recorded last access, and deterministic under replay;
   *  - `reclaimTimers = true` additionally registers
   *    `ProcessingTimeTimeout` callbacks that physically remove idle
   *    keys' state (the reference's cleanup timer — the actual memory
   *    reclamation for keys that never return). CAVEAT: with state
   *    timeouts registered, Spark's micro-batch engine keeps scheduling
   *    timeout-check batches, so the query never settles into the
   *    no-new-data state and `StreamingQuery#processAllAvailable` would
   *    block forever — use it only on continuously-triggered production
   *    queries (pair with a paced `Trigger.ProcessingTime`), never in a
   *    replay harness that synchronizes on processAllAvailable.
   *
   * Like the reference, expiry is SILENT — no -D retraction is emitted,
   * so a downstream materialized view keeps the last emitted row (the
   * documented staleness trade-off of idle-state retention). Flink's
   * (min, max) retention pair is a timer-coalescing optimization, not a
   * semantic: we honor the min bound exactly.
   *
   * In TTL mode, per-key emission sequence numbers are based on the
   * batch's processing time (`max(prev, nowMs << 20) + i`), so `ord`
   * stays strictly increasing across a retire-then-rearrive epoch even
   * after the timeout callback dropped the counter.
   *
   * TTL is also what bounds DRAIN TOMBSTONES (the O(1) ord-counter
   * entries the ord-emitting operators keep for keys whose state
   * emptied — see topNChangelog): without retention, tombstones make
   * state grow with EVER-SEEN keys rather than live keys, so unbounded
   * high-churn key domains require idle-state retention in production.
   */
  final case class IdleStateTtl(ms: Long, reclaimTimers: Boolean = false)

  /** JSON options for STRING-form transport sites (canonical string
    * keys, external JSON surfaces): the default generator truncates
    * timestamps to MILLISECONDS (`…ss.SSSXXX`), silently losing µs
    * precision on a projected event-time column — pinned by
    * JsonTransportSpec, fixed here with a µs format. PAYLOAD transport
    * no longer uses JSON at all: since round 15 the routes carry
    * payloads as [[Bin]] (the struct's UnsafeRow image — see
    * [[graft.plans.StructPack]]), which is bit-exact by construction
    * and skips text generation/parsing on every routed record. */
  private[graft] val TransportJsonOpts: Map[String, String] =
    Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  /**
   * Binary payload for the generic routes' typed tuples: the payload
   * struct's canonical UnsafeRow image (see [[graft.plans.StructPack]]
   * — the Spark-native analogue of the reference serializing rows into
   * keyed state as BinaryRowData, not as text). Value semantics are
   * BY CONTENT: the changelog operators key staleness guards and live
   * multisets on payload equality, and `Map[L, _]` needs equals /
   * hashCode over the bytes (an Array[Byte] payload would silently
   * compare by reference). `toString` is the hex image — the operators'
   * deterministic within-batch emission order (`sortBy(_.toString)`)
   * must not depend on JVM identity hashes.
   */
  final case class Bin(bytes: Array[Byte]) {
    override def equals(o: Any): Boolean = o match {
      case Bin(b) => java.util.Arrays.equals(bytes, b)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def toString: String = {
      val sb = new java.lang.StringBuilder(bytes.length * 2)
      bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
      sb.toString
    }
  }

  /** `struct(payload) → binary` (UnsafeRow image), wrapped as the
    * one-field struct the `Bin` encoder expects. */
  private[graft] def packPayload(payload: Seq[String]): org.apache.spark.sql.Column =
    struct(org.apache.spark.sql.graftbridge.Bridge.column(graft.plans.StructPack(
      org.apache.spark.sql.graftbridge.Bridge.expression(
        struct(payload.map(col): _*)))).as("bytes"))

  /** `binary → struct(schema)` — zero-copy UnsafeRow wrap. */
  private[graft] def unpackPayload(c: org.apache.spark.sql.Column,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.Bridge.column(graft.plans.StructUnpack(
      org.apache.spark.sql.graftbridge.Bridge.expression(c), schema))

  /** The CONFIG surface of idle-state retention — the reference exposes
    * it as `table.exec.state.ttl` (a table config, not an API argument),
    * so pipelines flip it cluster-wide without touching operator code.
    * Reads `spark.graft.state.ttl.ms`; unset or ≤ 0 → no retention.
    * `spark.graft.state.ttl.reclaimTimers=true` additionally enables
    * timer reclamation (see the caveat above). */
  def ttlFromConf(s: org.apache.spark.sql.SparkSession): Option[IdleStateTtl] =
    s.conf.getOption("spark.graft.state.ttl.ms").map(_.toLong)
      .filter(_ > 0)
      .map(ms => IdleStateTtl(ms,
        s.conf.getOption("spark.graft.state.ttl.reclaimTimers")
          .exists(_.toBoolean)))

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

  /**
   * Changelog-mode filter over an UPDATING stream — the reference's Calc
   * on a retract input followed by changelog-mode inference (a SQL
   * `HAVING` over a streaming GROUP BY plans onto exactly this;
   * FlinkChangelogModeInferenceProgram decides the Calc's produced
   * kinds). In pure retract mode a Calc is STATELESS: filtering each
   * row by its own values is correct because -U carries the OLD row.
   * Our upsert materialization (`materialize`, or the foreachBatch
   * batch-id pattern) ignores -U as a state carrier, so "previously
   * passed, now fails" must surface as an explicit -D — this operator
   * keeps the minimal state to synthesize it: the key's LAST EMITTED
   * payload (one row per live passing key, reclaimed on retire; orders
   * of magnitude below the upstream aggregate's own state).
   *
   * Input: a changelog DataFrame following the GroupAggFunction
   * protocol (per key per micro-batch, at most one accumulate row
   * +I/+U — the new state — plus its -U predecessor, or one -D).
   * `pred` is evaluated by Catalyst on the DataFrame (codegen, not a
   * per-row lambda); emission per key per batch:
   *
   *   none → passes   : +U (new state enters the filtered view)
   *   passes → passes : -U old, +U new (value changed)
   *   passes → fails  : -D old (leaves the view; the DELETE carries the
   *                     retracted row, as the reference pads it)
   *   fails → fails / none → fails : nothing
   *   passes → upstream -D : -D old
   *
   * Output columns = input columns (payload + `kindCol`). Honors
   * [[IdleStateTtl]] like every changelog operator (lazy expiry on
   * access + opt-in reclaim timers): an expired key's cell drops, so
   * its next passing value re-enters as a fresh +U — the same silent
   * staleness trade the upstream aggregate's own TTL makes.
   *
   * Scale: one exchange — but on the AGGREGATE'S OUTPUT changelog
   * (≤ groups × transitions rows per batch), orders of magnitude below
   * the input stream the aggregate itself shuffles; state is one cell
   * per currently-passing key, removed on leave (state-store-audited).
   */
  def filterChangelog(df: DataFrame, keyCol: String, kindCol: String,
                      pred: org.apache.spark.sql.Column,
                      ttl: Option[IdleStateTtl] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val ie: Encoder[(String, String, Boolean, Bin)] = ExpressionEncoder()
    implicit val oe: Encoder[(String, String, Bin)] = ExpressionEncoder()
    implicit val ke: Encoder[String] = org.apache.spark.sql.Encoders.STRING
    implicit val se: Encoder[(Bin, Long)] = ExpressionEncoder()
    val payloadCols = df.columns.filterNot(_ == kindCol).toSeq
    val schema = df.select(payloadCols.map(col): _*).schema
    // state keys on the key column's CANONICAL STRING form — any key
    // type groups correctly (string/composite keys included), and the
    // emitted payload carries the original typed key, so the cast is
    // invisible downstream
    val enc = df.select(col(keyCol).cast("string"), col(kindCol).cast("string"),
        coalesce(pred.cast("boolean"), lit(false)),
        packPayload(payloadCols))
      .as[(String, String, Boolean, Bin)]
    val timeoutConf = if (ttl.exists(_.reclaimTimers))
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val out = enc.groupByKey(_._1)
      .flatMapGroupsWithState[(Bin, Long), (String, String, Bin)](
          OutputMode.Append, timeoutConf) {
        (key: String, rows: Iterator[(String, String, Boolean, Bin)],
         state: GroupState[(Bin, Long)]) =>
         if (state.hasTimedOut) { state.remove(); Iterator.empty }
         else {
          val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
          // lazy expiry: a key idle past the TTL folds from fresh state
          val prev = state.getOption
            .filter { case (_, last) => ttl.forall(t => now - last <= t.ms) }
            .map(_._1)
          // fold the batch to the key's net transition (≤1 accumulate
          // and/or one -D under the upstream protocol)
          var acc: (Bin, Boolean) = null
          var retired = false
          rows.foreach { case (_, kind, pass, payload) =>
            if (kind == Insert || kind == UpdateAfter) acc = (payload, pass)
            else if (kind == Delete) retired = true
          }
          val next: Option[Bin] =
            if (acc != null) Some(acc._1).filter(_ => acc._2)
            else if (retired) None
            else prev
          def keep(p: Bin): Unit = {
            state.update((p, now))
            ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
          }
          (prev, next) match {
            case (None, Some(p)) =>
              keep(p); Iterator((key, UpdateAfter, p))
            case (Some(o), Some(p)) if o != p =>
              keep(p)
              Iterator((key, UpdateBefore, o), (key, UpdateAfter, p))
            case (Some(o), Some(_)) =>
              // value unchanged, but the key WAS accessed this batch —
              // refresh its idle clock (the TTL's read-or-written rule)
              if (ttl.isDefined) keep(o)
              Iterator.empty
            case (Some(o), None) =>
              state.remove(); Iterator((key, Delete, o))
            case _ =>
              // (None, None): if a physical cell exists here it was
              // TTL-expired out of `prev` — and this key's next
              // activity did NOT re-enter (failing value or upstream
              // -D), so drop the dead cell rather than leak it
              if (state.getOption.isDefined) state.remove()
              Iterator.empty
          }
         }
      }
    out.toDF("__k", "__kind", "__p")
      .select(unpackPayload(col("__p.bytes"), schema).as("__s"),
              col("__kind"))
      .select(payloadCols.map(c => col(s"__s.`$c`")) :+
              col("__kind").as(kindCol): _*)
  }

  /** One changelog-aggregate output row (kind ∈ -U/+U per emission).
    * Keys are generic since round 13 — any encodable type (Long for the
    * classic paths, String/composite for e.g. per-source document
    * aggregation), the way the reference keys state on arbitrary
    * BinaryRowData. */
  final case class AggChange[K](key: K, kind: String, sum: Double, count: Long)

  /**
   * Streaming changelog-consuming SUM/COUNT per key: input rows are
   * (key, kind, value) where kind ∈ {+I, -D}; every state change emits
   * the retraction pair (-U previous aggregate, +U new aggregate) —
   * exactly GroupAggFunction's protocol. Groups whose count returns to 0
   * retire their state (the reference's RecordCounter behavior).
   */
  /** One retract-aware extremes output row (kind ∈ -U/+U/-D). */
  final case class ExtremeChange[K](key: K, kind: String,
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
  def aggregateChangelogMinMax[K: TypeTag, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      kind: V => String, value: V => Double, ord: V => Long,
      ttl: Option[IdleStateTtl] = None)(
      implicit ve: Encoder[V]): Dataset[ExtremeChange[K]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val oe: Encoder[ExtremeChange[K]] = ExpressionEncoder()
    aggregateChangelogLive[K, V, ExtremeChange[K]](grouped, kind, value, ord, ttl)(
      snap = { (key, k, live) =>
        val vs = live.values
        ExtremeChange(key, k, vs.min, vs.max,
          live(live.keys.min), live(live.keys.max), live.size.toLong)
      },
      sameAgg = (b, a) => (b.min, b.max, b.first, b.last, b.count) ==
                          (a.min, a.max, a.first, a.last, a.count),
      asDelete = _.copy(kind = Delete))
  }

  /**
   * The shared state machine of the live-row-set retract aggregates
   * ([[aggregateChangelogMinMax]], [[aggregateChangelogListAgg]]):
   * per-key state is `Map[ord → value]` (+ the TTL access clock); an
   * insert adds its entry, a retraction removes BY ORD — guarded by
   * VALUE equality, the same staleness guard as `topNChangelog`, which
   * also makes an upstream -U/+U pair order-insensitive within a batch
   * (Spark contracts no intra-group value order: if +U(new) lands
   * first on the same ord, the late -U(old) no longer matches and is
   * ignored instead of deleting the updated row). Emission protocol is
   * GroupAggFunction's, with the aggregate snapshot/equality/delete
   * shape supplied by the caller.
   */
  private def aggregateChangelogLive[K, V, A](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      kind: V => String, value: V => Double, ord: V => Long,
      ttl: Option[IdleStateTtl])(
      snap: (K, String, Map[Long, Double]) => A,
      sameAgg: (A, A) => Boolean,
      asDelete: A => A)(
      implicit ve: Encoder[V], oe: Encoder[A]): Dataset[A] = {
    implicit val se: Encoder[(Map[Long, Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    val timeoutConf = if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    grouped.flatMapGroupsWithState[(Map[Long, Double], Long), A](
        OutputMode.Append, timeoutConf) {
      (key: K, values: Iterator[V], state: GroupState[(Map[Long, Double], Long)]) =>
       if (state.hasTimedOut) { state.remove(); Iterator.empty }
       else {
        val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
        val live0 = state.getOption
          .filter { case (_, last) => ttl.forall(t => now - last <= t.ms) }
          .map(_._1).getOrElse(Map.empty[Long, Double])
        var live = live0
        values.foreach { v =>
          kind(v) match {
            case Insert | UpdateAfter => live += (ord(v) -> value(v))
            case Delete | UpdateBefore =>
              if (live.get(ord(v)).contains(value(v))) live -= ord(v)
            case Touch => ()
          }
        }
        if (live.isEmpty) state.remove()
        else {
          state.update((live, now))
          ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
        }
        val before0 = if (live0.isEmpty) None else Some(snap(key, UpdateBefore, live0))
        val after0 = if (live.isEmpty) None else Some(snap(key, UpdateAfter, live))
        (before0, after0) match {
          case (Some(b), Some(a)) if sameAgg(b, a) => Iterator.empty
          case (b, Some(a)) => b.iterator ++ Iterator(a)
          case (Some(b), None) => Iterator(b, asDelete(b))
          case (None, None) => Iterator.empty
        }
       }
    }
  }

  /** One retract-aware ordered/multiset aggregate output row (kind ∈
    * -U/+U/-D): `first`/`last` are FIRST_VALUE/LAST_VALUE by the row
    * ord, `listagg` the ord-ordered delimiter-join, `collect` the
    * value-sorted serialization of the live multiset (duplicates
    * retained — value → count recoverable by counting). */
  final case class ListAggChange[K](key: K, kind: String,
                                    first: Double, last: Double,
                                    listagg: String, collect: String,
                                    count: Long)

  /** Canonical element formatting for listagg/collect strings:
    * integral doubles print as integers (matching `CAST(x AS VARCHAR)`
    * of an integer column in the batch dual), others as Scala's
    * shortest-round-trip double. */
  private def fmtVal(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 9.007199254740992e15)
      d.toLong.toString
    else d.toString

  /**
   * Retract-capable FIRST_VALUE / LAST_VALUE / LISTAGG / COLLECT per
   * key — the order/multiset-valued quarter of the reference's
   * retract-agg family (PLANNER-J/functions/aggfunctions/
   * FirstValueWithRetractAggFunction.java:61,
   * LastValueWithRetractAggFunction.java,
   * ListAggWithRetractAggFunction.java:37 — a ListView the retraction
   * removes from — and CollectAggFunction's value→count MapView).
   * SUM/COUNT retraction cannot express these: retracting the row that
   * holds the current FIRST must re-admit the successor, and deleting
   * ONE of two equal values must keep the element in COLLECT.
   *
   * State is the key's live row set as `Map[ord → value]` — exactly
   * [[aggregateChangelogMinMax]]'s layout (`ord` is the caller's
   * unique row id, which doubles as the FIRST/LAST/LISTAGG order, the
   * way the reference's order-sensitive retract aggs key their
   * ListView): an insert adds its entry, a retraction removes BY ORD
   * guarded by value equality (so duplicates are distinct instances,
   * removing one keeps the others, and a stale -U for an ord already
   * overwritten by its same-batch +U is ignored — see
   * [[aggregateChangelogLive]]), and every emission recomputes the
   * four aggregates from
   * the live set — one O(live log live) pass per touched key per
   * micro-batch, the SS-idiomatic trade vs the reference's per-record
   * O(log n) sorted-map maintenance. Emission protocol is
   * GroupAggFunction's: any change emits (-U previous, +U new); a key
   * whose live set empties emits (-U previous, -D).
   */
  def aggregateChangelogListAgg[K: TypeTag, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      kind: V => String, value: V => Double, ord: V => Long,
      delimiter: String = ",",
      ttl: Option[IdleStateTtl] = None)(
      implicit ve: Encoder[V]): Dataset[ListAggChange[K]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val oe: Encoder[ListAggChange[K]] = ExpressionEncoder()
    aggregateChangelogLive[K, V, ListAggChange[K]](grouped, kind, value, ord, ttl)(
      snap = { (key, k, live) =>
        val vals = live.toSeq.sortBy(_._1).map(_._2)
        ListAggChange(key, k, live(live.keys.min), live(live.keys.max),
          vals.map(fmtVal).mkString(delimiter),
          vals.sorted.map(fmtVal).mkString(delimiter), live.size.toLong)
      },
      sameAgg = (b, a) => (b.first, b.last, b.listagg, b.collect, b.count) ==
                          (a.first, a.last, a.listagg, a.collect, a.count),
      asDelete = _.copy(kind = Delete))
  }

  /** One mixed-family retract aggregate output row: the moment
    * accumulator (sum, sumsq, count) AND the live-set extremes
    * (min, max) side by side (kind ∈ -U/+U/-D). */
  final case class MultiChange[K](key: K, kind: String,
                                  sum: Double, sumsq: Double, count: Long,
                                  min: Double, max: Double)

  /**
   * Heterogeneous retract aggregates in ONE operator — SUM/COUNT/AVG/
   * VAR/STDDEV alongside MIN/MAX in a single GROUP BY, the way the
   * reference's GroupAggFunction hosts heterogeneous generated
   * accumulators in one operator (RUNTIME/.../aggregate/
   * GroupAggFunction.java:43 — one AggsHandleFunction covering all of
   * a statement's aggregates, moment accumulators next to
   * Min/MaxWithRetractAggFunction's sorted structures).
   *
   * State is the key's live row set `Map[ord → value]` — the MinMax
   * layout, which is the minimal sufficient state once any extreme is
   * present (under retraction ANY live row can become the new
   * min/max). The moments are recomputed from the live set in ord
   * order per emission — a deterministic fold, so replays are
   * bit-identical whatever the micro-batch slicing (and exact under
   * the repo-wide integral-double value discipline). Emission protocol
   * is GroupAggFunction's: any change emits (-U previous, +U new); an
   * emptied key emits (-U previous, -D).
   */
  def aggregateChangelogMulti[K: TypeTag, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      kind: V => String, value: V => Double, ord: V => Long,
      ttl: Option[IdleStateTtl] = None)(
      implicit ve: Encoder[V]): Dataset[MultiChange[K]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val oe: Encoder[MultiChange[K]] = ExpressionEncoder()
    aggregateChangelogLive[K, V, MultiChange[K]](grouped, kind, value, ord, ttl)(
      snap = { (key, k, live) =>
        val vs = live.toSeq.sortBy(_._1).map(_._2)
        var s = 0.0; var sq = 0.0
        vs.foreach { x => s += x; sq += x * x }
        MultiChange(key, k, s, sq, vs.size.toLong, vs.min, vs.max)
      },
      sameAgg = (b, a) => (b.sum, b.sumsq, b.count, b.min, b.max) ==
                          (a.sum, a.sumsq, a.count, a.min, a.max),
      asDelete = _.copy(kind = Delete))
  }

  /** One changelog-join output row: the joined pair plus the per-key
    * emission sequence (`ord`) that makes `materialize` applicable
    * downstream when the join output is upsert-shaped (≤1 live pair per
    * key, as in agg-view ▸ join compositions). */
  final case class JoinChange[K, L, R](key: K, kind: String,
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
   * PER-RECORD INCREMENTAL (the reference's exact algorithm): each
   * input message probes only the OTHER side's current live multiset —
   * an accumulate emits +count(r) for every matching other-side payload,
   * a retract emits the negatives — so per-batch work is
   * O(messages × other side's distinct payloads for the key), never the
   * key's full |L|×|R| cross product. The per-message deltas telescope
   * to exactly (after − before) per pair, so netting them at batch end
   * reproduces the batch-atomic protocol (no transient pairs for
   * same-batch both-side updates) while keeping the reference's
   * per-record cost profile. The join-result's live total is carried in
   * state so emptiness transitions (+I vs +U, -D vs -U) need no
   * recomputation.
   *
   * Scale: state per key = live rows of BOTH sides for that key (what
   * any streaming two-way join must hold); one exchange total. A hot
   * join key now costs O(update × other side) per batch — the reference's
   * own profile; for insert-only hot keys, [[joinChangelogSharded]]
   * additionally spreads one key's work across sub-key tasks.
   *
   * Known trade-off vs the reference's state backend: `GroupState` is a
   * single value, so a TOUCHED key re-(de)serializes its full live-row
   * state once per micro-batch — O(live rows of that key) I/O even for a
   * one-row update — where RocksDB MapState does per-payload point
   * reads/writes. Untouched keys cost nothing. The compute is still
   * per-record incremental; for keys where the serialization term
   * dominates (very large live sets under sustained updates),
   * [[joinChangelogSharded]] divides the per-task state by the shard
   * count, which bounds the term the same way key-group spreading does.
   */
  def joinChangelog[K, L, R](
      left: Dataset[(K, String, L)],
      right: Dataset[(K, String, R)],
      cond: (L, R) => Boolean = (_: L, _: R) => true,
      ttl: Option[IdleStateTtl] = None)(
      implicit kt: TypeTag[K],
      lt: scala.reflect.runtime.universe.TypeTag[L],
      rt: scala.reflect.runtime.universe.TypeTag[R]): Dataset[JoinChange[K, L, R]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val ue: Encoder[(K, String, Option[L], Option[R])] =
      ExpressionEncoder()
    implicit val ke: Encoder[K] = ExpressionEncoder()
    implicit val se: Encoder[(Seq[(L, Long)], Seq[(R, Long)], Long, Long, Long)] =
      ExpressionEncoder()
    implicit val oe: Encoder[JoinChange[K, L, R]] = ExpressionEncoder()

    // deterministic emission order within a batch (Map order is not)
    def expand(m: Map[(L, R), Long]): Seq[(L, R)] =
      m.toSeq.sortBy(_._1.toString)
        .flatMap { case (p, c) => Seq.fill(c.toInt)(p) }

    val timeoutConf = if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    val tagged =
      left.map { case (k, kind, l) => (k, kind, Option(l), Option.empty[R]) }
        .union(right.map { case (k, kind, r) =>
          (k, kind, Option.empty[L], Option(r)) })
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(L, Long)], Seq[(R, Long)], Long, Long, Long),
                              JoinChange[K, L, R]](
          OutputMode.Append, timeoutConf) {
        (key: K, values: Iterator[(K, String, Option[L], Option[R])],
         state: GroupState[(Seq[(L, Long)], Seq[(R, Long)], Long, Long, Long)]) =>
         if (state.hasTimedOut) { state.remove(); Iterator.empty }
         else {
          val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
          // lazy expiry: a key idle past the TTL folds from fresh state
          val (l0, r0, n0, t0) = state.getOption
            .filter { case (_, _, _, _, last) => ttl.forall(t => now - last <= t.ms) }
            .map { case (l, r, n, t, _) => (l, r, n, t) }
            .getOrElse((Seq.empty[(L, Long)], Seq.empty[(R, Long)], 0L, 0L))
          val lm = scala.collection.mutable.Map[L, Long](l0: _*)
          val rm = scala.collection.mutable.Map[R, Long](r0: _*)
          // net pair deltas for this batch (same-batch cancellation)
          val delta = scala.collection.mutable.Map.empty[(L, R), Long]
          var total = t0
          def addDelta(p: (L, R), d: Long): Unit = {
            val c = delta.getOrElse(p, 0L) + d
            if (c == 0L) delta -= p else delta(p) = c
            total += d
          }
          values.foreach { case (_, kind, lo, ro) =>
            if (kind != Touch) {
            val acc = kind == Insert || kind == UpdateAfter
            lo.foreach { l =>
              if (acc) {
                rm.foreach { case (r, cr) =>
                  if (cond(l, r)) addDelta((l, r), cr) }
                lm(l) = lm.getOrElse(l, 0L) + 1
              } else lm.get(l).foreach { cl => // absent ⇒ stale retract: ignore
                rm.foreach { case (r, cr) =>
                  if (cond(l, r)) addDelta((l, r), -cr) }
                if (cl == 1L) lm -= l else lm(l) = cl - 1
              }
            }
            ro.foreach { r =>
              if (acc) {
                lm.foreach { case (l, cl) =>
                  if (cond(l, r)) addDelta((l, r), cl) }
                rm(r) = rm.getOrElse(r, 0L) + 1
              } else rm.get(r).foreach { cr =>
                lm.foreach { case (l, cl) =>
                  if (cond(l, r)) addDelta((l, r), -cl) }
                if (cr == 1L) rm -= r else rm(r) = cr - 1
              }
            }
            }
          }
          val removed = expand(delta.collect {
            case (p, c) if c < 0 => p -> -c }.toMap)
          val added = expand(delta.filter(_._2 > 0).toMap)
          // TTL mode: processing-time-based ord keeps the per-key log
          // ordered across retire/expire epochs (see IdleStateTtl doc)
          var n = if (ttl.isDefined) math.max(n0, now << 20) else n0
          def rows(ps: Seq[(L, R)], kind: String): Seq[JoinChange[K, L, R]] =
            ps.map { case (l, r) => n += 1; JoinChange(key, kind, l, r, n) }
          val out =
            rows(removed, if (total == 0L) Delete else UpdateBefore) ++
            rows(added, if (t0 == 0L) Insert else UpdateAfter)
          // drained keys keep an O(1) tombstone with the ord counter —
          // see topNChangelog: a reset counter would let a stale -D
          // outrank a post-drain +I under `materialize`; unknown keys
          // that emitted nothing allocate no entry
          if (state.getOption.isDefined || lm.nonEmpty || rm.nonEmpty ||
              out.nonEmpty) {
            state.update((lm.toSeq, rm.toSeq, n, total, now))
            ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
          }
          out.iterator
         }
      }
  }

  /**
   * Hot-key skew guard: the changelog inner join with each join key
   * SHARDED into `shards` sub-keys — left rows route by payload hash,
   * right rows replicate to every shard — so one hot key's per-batch
   * work and state spread across `shards` independent tasks instead of
   * serializing in one (the classic salted-join skew mitigation,
   * cf. the reference's key-group spreading). Retractions stay correct:
   * a left payload always hashes to the same shard as its insert, and
   * the right side is fully replicated per shard.
   *
   * Trade-offs vs [[joinChangelog]]: right-side state is duplicated
   * ×shards for sharded keys, and `ord`/emptiness-kind bookkeeping is
   * per (key, shard) — the output is correct at the PAIR-MULTISET
   * level (fold it, aggregate it), not as a totally-ordered per-key
   * log for `materialize`. Shard routing composes the key with the
   * shard index as a (key, shard) tuple, so any key type shards
   * without range restrictions.
   *
   * With `ttl` set, every left record additionally fans a payload-free
   * [[Touch]] to the key's OTHER shards (right records already
   * replicate), so all shards of a key see the same access pattern and
   * expire on the same TTL clock — the sharded join under TTL stays
   * pair-multiset-equivalent to the unsharded one. Cost: ×shards tiny
   * touch rows per left record, the same order as the right-side
   * replication the operator already pays.
   */
  def joinChangelogSharded[K, L, R](
      left: Dataset[(K, String, L)],
      right: Dataset[(K, String, R)],
      shards: Int,
      cond: (L, R) => Boolean = (_: L, _: R) => true,
      ttl: Option[IdleStateTtl] = None)(
      implicit kt: TypeTag[K],
      lt: scala.reflect.runtime.universe.TypeTag[L],
      rt: scala.reflect.runtime.universe.TypeTag[R]): Dataset[JoinChange[K, L, R]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val le: Encoder[((K, Long), String, L)] = ExpressionEncoder()
    implicit val re: Encoder[((K, Long), String, R)] = ExpressionEncoder()
    implicit val je: Encoder[JoinChange[K, L, R]] = ExpressionEncoder()
    val s = shards.toLong
    val lSharded =
      if (ttl.isEmpty) left.map { case (k, kind, l) =>
        ((k, math.floorMod(l.hashCode.toLong, s)), kind, l) }
      else left.flatMap { case (k, kind, l) =>
        val home = math.floorMod(l.hashCode.toLong, s)
        (0L until s).map(i =>
          ((k, i), if (i == home) kind else Touch, l))
      }
    val rSharded = right.flatMap { case (k, kind, r) =>
      (0L until s).map(i => ((k, i), kind, r)) }
    joinChangelog(lSharded, rSharded, cond, ttl)
      .map(jc => JoinChange[K, L, R](jc.key._1, jc.kind, jc.left, jc.right,
                                     jc.ord))
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
  final case class OuterJoinChange[K, L, R](key: K, kind: String,
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
   * Same shuffle/netting/emission machinery as [[joinChangelog]], and
   * the same PER-RECORD INCREMENTAL algorithm: each message probes only
   * the other side's live multiset. Padding is PER ROW — a row on an
   * outer side with zero passing associations emits paired with None —
   * and, like the reference's OuterJoinRecordStateView:35, each live
   * payload carries its association count IN STATE (number of passing
   * other-side record instances), so the 0→1 transition (retract the
   * padded row, insert the pair) and the 1→0 transition (re-pad) are
   * detected in O(1) per touched payload while processing the message
   * that causes them — no post-hoc recomputation over the full state.
   * With a non-trivial `cond`, a left row whose only candidate fails
   * the condition stays padded even while the key's right side is
   * non-empty.
   *
   * Scale: identical profile to the inner join — one exchange, per-key
   * state is both sides' live rows plus one counter per payload
   * (exactly the reference's state layout); per-batch work is
   * O(messages × other side's distinct payloads), never |L|×|R|.
   */
  def joinChangelogOuter[K, L, R](
      left: Dataset[(K, String, L)],
      right: Dataset[(K, String, R)],
      side: OuterSide,
      cond: (L, R) => Boolean = (_: L, _: R) => true,
      ttl: Option[IdleStateTtl] = None)(
      implicit kt: TypeTag[K],
      lt: scala.reflect.runtime.universe.TypeTag[L],
      rt: scala.reflect.runtime.universe.TypeTag[R]): Dataset[OuterJoinChange[K, L, R]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val ue: Encoder[(K, String, Option[L], Option[R])] =
      ExpressionEncoder()
    implicit val ke: Encoder[K] = ExpressionEncoder()
    implicit val se: Encoder[(Seq[(L, Long, Long)], Seq[(R, Long, Long)], Long, Long, Long)] =
      ExpressionEncoder()
    implicit val oe: Encoder[OuterJoinChange[K, L, R]] = ExpressionEncoder()

    type Pair = (Option[L], Option[R])
    def expand(m: Map[Pair, Long]): Seq[Pair] =
      m.toSeq.sortBy(_._1.toString)
        .flatMap { case (p, c) => Seq.fill(c.toInt)(p) }

    val timeoutConf = if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    val tagged =
      left.map { case (k, kind, l) => (k, kind, Option(l), Option.empty[R]) }
        .union(right.map { case (k, kind, r) =>
          (k, kind, Option.empty[L], Option(r)) })
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(L, Long, Long)], Seq[(R, Long, Long)], Long, Long, Long),
                              OuterJoinChange[K, L, R]](
          OutputMode.Append, timeoutConf) {
        (key: K, values: Iterator[(K, String, Option[L], Option[R])],
         state: GroupState[(Seq[(L, Long, Long)], Seq[(R, Long, Long)], Long, Long, Long)]) =>
         if (state.hasTimedOut) { state.remove(); Iterator.empty }
         else {
          val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
          // lazy expiry: a key idle past the TTL folds from fresh state
          val (l0, r0, n0, t0) = state.getOption
            .filter { case (_, _, _, _, last) => ttl.forall(t => now - last <= t.ms) }
            .map { case (l, r, n, t, _) => (l, r, n, t) }
            .getOrElse((Seq.empty[(L, Long, Long)], Seq.empty[(R, Long, Long)], 0L, 0L))
          // payload → (live count, association count); assoc = number of
          // passing other-side record INSTANCES (the reference's
          // numOfAssociations), maintained incrementally below.
          val lm = scala.collection.mutable.Map[L, (Long, Long)](
            l0.map { case (p, c, a) => p -> (c, a) }: _*)
          val rm = scala.collection.mutable.Map[R, (Long, Long)](
            r0.map { case (p, c, a) => p -> (c, a) }: _*)
          val delta = scala.collection.mutable.Map.empty[Pair, Long]
          var total = t0
          def addDelta(p: Pair, d: Long): Unit = {
            val c = delta.getOrElse(p, 0L) + d
            if (c == 0L) delta -= p else delta(p) = c
            total += d
          }
          // NOTE: the loops below update assoc counters of EXISTING
          // entries of the map being iterated — in-place node value
          // mutation, safe for mutable.HashMap; no insert/remove happens
          // inside an iteration over the same map.
          values.foreach { case (_, kind, lo, ro) =>
            if (kind != Touch) {
            val acc = kind == Insert || kind == UpdateAfter
            lo.foreach { l =>
              if (acc) {
                var al = 0L
                rm.foreach { case (r, (cr, ar)) =>
                  if (cond(l, r)) {
                    al += cr
                    addDelta((Option(l), Option(r)), cr)
                    // this r gains 1 association (the new l instance)
                    if (ar == 0L && side.padRight)
                      addDelta((Option.empty[L], Option(r)), -cr)
                    rm(r) = (cr, ar + 1L)
                  }
                }
                if (al == 0L && side.padLeft)
                  addDelta((Option(l), Option.empty[R]), 1L)
                val (cl, _) = lm.getOrElse(l, (0L, 0L))
                lm(l) = (cl + 1L, al)
              } else lm.get(l).foreach { case (cl, al) =>
                rm.foreach { case (r, (cr, ar)) =>
                  if (cond(l, r)) {
                    addDelta((Option(l), Option(r)), -cr)
                    if (ar == 1L && side.padRight)
                      addDelta((Option.empty[L], Option(r)), cr)
                    rm(r) = (cr, ar - 1L)
                  }
                }
                if (al == 0L && side.padLeft)
                  addDelta((Option(l), Option.empty[R]), -1L)
                if (cl == 1L) lm -= l else lm(l) = (cl - 1L, al)
              }
            }
            ro.foreach { r =>
              if (acc) {
                var ar = 0L
                lm.foreach { case (l, (cl, al)) =>
                  if (cond(l, r)) {
                    ar += cl
                    addDelta((Option(l), Option(r)), cl)
                    if (al == 0L && side.padLeft)
                      addDelta((Option(l), Option.empty[R]), -cl)
                    lm(l) = (cl, al + 1L)
                  }
                }
                if (ar == 0L && side.padRight)
                  addDelta((Option.empty[L], Option(r)), 1L)
                val (cr, _) = rm.getOrElse(r, (0L, 0L))
                rm(r) = (cr + 1L, ar)
              } else rm.get(r).foreach { case (cr, ar) =>
                lm.foreach { case (l, (cl, al)) =>
                  if (cond(l, r)) {
                    addDelta((Option(l), Option(r)), -cl)
                    if (al == 1L && side.padLeft)
                      addDelta((Option(l), Option.empty[R]), cl)
                    lm(l) = (cl, al - 1L)
                  }
                }
                if (ar == 0L && side.padRight)
                  addDelta((Option.empty[L], Option(r)), -1L)
                if (cr == 1L) rm -= r else rm(r) = (cr - 1L, ar)
              }
            }
            }
          }
          val removed = expand(delta.collect {
            case (p, c) if c < 0 => p -> -c }.toMap)
          val added = expand(delta.filter(_._2 > 0).toMap)
          // TTL mode: processing-time-based ord keeps the per-key log
          // ordered across retire/expire epochs (see IdleStateTtl doc)
          var n = if (ttl.isDefined) math.max(n0, now << 20) else n0
          def rows(ps: Seq[Pair], kind: String): Seq[OuterJoinChange[K, L, R]] =
            ps.map { case (l, r) =>
              n += 1; OuterJoinChange(key, kind, l, r, n)
            }
          val out =
            rows(removed, if (total == 0L) Delete else UpdateBefore) ++
            rows(added, if (t0 == 0L) Insert else UpdateAfter)
          // drained keys keep an O(1) tombstone with the ord counter —
          // see topNChangelog: a reset counter would let a stale -D
          // outrank a post-drain +I under `materialize`; unknown keys
          // that emitted nothing allocate no entry
          if (state.getOption.isDefined || lm.nonEmpty || rm.nonEmpty ||
              out.nonEmpty) {
            state.update((
              lm.toSeq.map { case (p, (c, a)) => (p, c, a) },
              rm.toSeq.map { case (p, (c, a)) => (p, c, a) }, n, total, now))
            ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
          }
          out.iterator
         }
      }
  }

  /** One retract-consuming Top-N output row. Per (key, rowId) the
    * stream is upsert-shaped: +I/+U when the row (re-)enters the top-N
    * or changes score inside it, -D when it leaves — so a downstream
    * [[materialize]] on the composite (key, rowId) yields exactly the
    * final top-N set per key. */
  final case class TopNChange[K](key: K, kind: String, rowId: Long,
                                 score: Double, ord: Long)

  /**
   * Retract-CONSUMING streaming Top-N per key — the reference's
   * RetractableTopNFunction (PLANNER-J/runtime/rank/
   * RetractableTopNFunction.java: a sorted map of the key's FULL live
   * row set plus a record map, so a retraction of a top row re-admits
   * the runner-up): the input is a changelog (e.g. an updating
   * aggregate view), rows identified by `rowId` and ranked by
   * (`score` desc, `rowId` asc); the output is the changelog of the
   * key's top-`n` SLICE. [[aggregateChangelogMinMax]] is exactly the
   * n = 1 instance of this operator (for min/max only); this is the
   * general-N rank version.
   *
   * Emission per micro-batch is the top-slice DELTA, row-level: a row
   * demoted out of the slice (by a better arrival or its own update)
   * emits -D; the promoted runner-up emits +I; a row whose score
   * changes while staying ranked emits its -U/+U pair. Changes
   * entirely below rank n emit NOTHING — the reference's rank-range
   * suppression, which is what makes Top-N over a high-churn updating
   * view cheap at the sink.
   *
   * State is the key's live (rowId → score) map — the same O(live)
   * layout the reference keeps (its sorted map + record map), because
   * under arbitrary retraction ANY live row can become the runner-up.
   * Where Flink pays O(log n) per record in its TreeMap, a micro-batch
   * recomputes the n-slice in one O(live log live) pass per TOUCHED
   * key per batch (untouched keys cost nothing) — the SS-idiomatic
   * trade, cf. [[aggregateChangelogMinMax]]. For Top-N over an
   * updating aggregate, live = the key's distinct group count, not
   * raw-event history. Stale retractions (unknown rowId) are ignored.
   */
  def topNChangelog[K: TypeTag, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      n: Int,
      kind: V => String, score: V => Double, rowId: V => Long,
      ttl: Option[IdleStateTtl] = None)(
      implicit ve: Encoder[V]): Dataset[TopNChange[K]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val se: Encoder[(Map[Long, Double], Long, Long)] =
      ExpressionEncoder()
    implicit val oe: Encoder[TopNChange[K]] = ExpressionEncoder()
    def topOf(m: Map[Long, Double]): Seq[(Long, Double)] =
      m.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(n)
    val timeoutConf = if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    grouped.flatMapGroupsWithState[(Map[Long, Double], Long, Long), TopNChange[K]](
        OutputMode.Append, timeoutConf) {
      (key: K, values: Iterator[V], state: GroupState[(Map[Long, Double], Long, Long)]) =>
       if (state.hasTimedOut) { state.remove(); Iterator.empty }
       else {
        val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
        // lazy expiry: a key idle past the TTL folds from fresh state
        val (live0, n0) = state.getOption
          .filter { case (_, _, last) => ttl.forall(t => now - last <= t.ms) }
          .map { case (m, o, _) => (m, o) }
          .getOrElse((Map.empty[Long, Double], 0L))
        var live = live0
        values.foreach { v =>
          kind(v) match {
            case Insert | UpdateAfter => live += (rowId(v) -> score(v))
            case Delete | UpdateBefore =>
              // remove only when the retracted SCORE matches the live
              // row — the join family's payload-equality staleness
              // guard, which also makes an upstream update's -U/+U pair
              // order-insensitive within a batch (Spark contracts no
              // intra-group value order: if +U(new) lands first, the
              // late -U(old) no longer matches and is ignored)
              if (live.get(rowId(v)).contains(score(v))) live -= rowId(v)
            case Touch => ()
          }
        }
        val t0s = topOf(live0)
        val t1s = topOf(live)
        val removed = t0s.filterNot(t1s.contains)
        val added = t1s.filterNot(t0s.contains)
        val addedIds = added.map(_._1).toSet
        val removedIds = removed.map(_._1).toSet
        var ord = if (ttl.isDefined) math.max(n0, now << 20) else n0
        val out =
          removed.map { case (id, sc) =>
            ord += 1
            // same row re-appears with a new score → update pair;
            // otherwise the row left the slice outright
            TopNChange(key, if (addedIds(id)) UpdateBefore else Delete,
                       id, sc, ord)
          } ++
          added.map { case (id, sc) =>
            ord += 1
            TopNChange(key, if (removedIds(id)) UpdateAfter else Insert,
                       id, sc, ord)
          }
        // a drained key keeps an O(1) TOMBSTONE carrying the ord counter:
        // removing it would restart ord at 0 on re-arrival, and a stale
        // -D from the drain batch would then outrank the fresh +I under
        // `materialize` (ord desc), silently deleting a live row. With
        // TTL, tombstones expire like any state — the clock-epoch ord
        // keeps the per-key log ordered across expiry instead. Keys that
        // never HAD state and emitted nothing (e.g. a stale retraction
        // for an unknown key) allocate no entry — a buggy/replayed
        // upstream must not grow the store from nothing.
        //
        // SCALE NOTE: tombstones change state growth from LIVE keys to
        // EVER-SEEN keys — an unbounded leak when the key domain is
        // unbounded and high-churn (keys drain and never return).
        // Production deployments over unbounded key domains MUST enable
        // IdleStateTtl (plus reclaimTimers on continuously-triggered
        // queries) so drained keys' tombstones expire; bounded key
        // domains (the common Top-N-per-category shape) are unaffected —
        // the tombstone is O(1) per key that ever held state. This note
        // applies equally to the join family's drain tombstones.
        if (state.getOption.isDefined || live.nonEmpty || out.nonEmpty) {
          state.update((live, ord, now))
          ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
        }
        out.iterator
       }
    }
  }

  /** One SEMI/ANTI changelog-join output row: only the probe (left)
    * payload is emitted — the right side exists solely as the
    * EXISTS/NOT-EXISTS predicate. */
  final case class ExistChange[K, L](key: K, kind: String, left: L, ord: Long)

  /**
   * Streaming changelog-consuming SEMI join — `WHERE EXISTS (...)` over
   * two updating inputs, the reference's StreamingSemiAntiJoinOperator
   * (RUNTIME/runtime/operators/join/stream/StreamingSemiAntiJoinOperator
   * .java:36): a left row is IN the output iff it currently has ≥ 1
   * passing right association; the output is a changelog of LEFT rows
   * only. See [[joinChangelogAnti]] for the NOT-EXISTS dual.
   *
   * Same machinery as [[joinChangelogOuter]] — one union exchange on
   * the join key, left payloads carry their association count IN STATE
   * (the reference's OuterJoinRecordStateView.numOfAssociations; for
   * semi/anti the count is the whole game) — but the emission rule
   * flips from "pad vs pair" to "member vs non-member": only the 0↔1
   * association transitions change the output, so a right-side update
   * that keeps the count ≥ 1 emits NOTHING (exactly the reference's
   * semi-join suppression of redundant updates). Batch-atomic netting,
   * stale-retract tolerance, duplicate counting, per-key `ord` and TTL
   * behave as in the other changelog joins; with an agg view on the
   * left the output is upsert-shaped and [[materialize]]-able.
   *
   * Scale: identical profile to the inner join — per-key state is both
   * sides' live rows plus one counter per left payload; per-batch work
   * is O(messages × other side's distinct payloads). The OUTPUT is
   * strictly smaller than the inner join's (left rows, not pairs), and
   * right-side churn above one association is absorbed in state.
   */
  def joinChangelogSemi[K, L, R](
      left: Dataset[(K, String, L)],
      right: Dataset[(K, String, R)],
      cond: (L, R) => Boolean = (_: L, _: R) => true,
      ttl: Option[IdleStateTtl] = None)(
      implicit kt: TypeTag[K],
      lt: scala.reflect.runtime.universe.TypeTag[L],
      rt: scala.reflect.runtime.universe.TypeTag[R]): Dataset[ExistChange[K, L]] =
    existenceJoin(left, right, anti = false, cond, ttl)

  /**
   * Streaming changelog-consuming ANTI join — `WHERE NOT EXISTS (...)`
   * over two updating inputs (the other half of
   * StreamingSemiAntiJoinOperator.java:36): a left row is in the output
   * iff it currently has ZERO passing right associations. The FIRST
   * passing right arrival retracts the left row from the output; the
   * LAST passing right retraction re-admits it — the 1→0 / 0→1
   * transitions mirror [[joinChangelogSemi]] with the sign flipped.
   */
  def joinChangelogAnti[K, L, R](
      left: Dataset[(K, String, L)],
      right: Dataset[(K, String, R)],
      cond: (L, R) => Boolean = (_: L, _: R) => true,
      ttl: Option[IdleStateTtl] = None)(
      implicit kt: TypeTag[K],
      lt: scala.reflect.runtime.universe.TypeTag[L],
      rt: scala.reflect.runtime.universe.TypeTag[R]): Dataset[ExistChange[K, L]] =
    existenceJoin(left, right, anti = true, cond, ttl)

  private def existenceJoin[K, L, R](
      left: Dataset[(K, String, L)],
      right: Dataset[(K, String, R)],
      anti: Boolean,
      cond: (L, R) => Boolean,
      ttl: Option[IdleStateTtl])(
      implicit kt: TypeTag[K],
      lt: scala.reflect.runtime.universe.TypeTag[L],
      rt: scala.reflect.runtime.universe.TypeTag[R]): Dataset[ExistChange[K, L]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val ue: Encoder[(K, String, Option[L], Option[R])] =
      ExpressionEncoder()
    implicit val ke: Encoder[K] = ExpressionEncoder()
    // left state rows are (payload, live count, association count)
    implicit val se: Encoder[(Seq[(L, Long, Long)], Seq[(R, Long)], Long, Long, Long)] =
      ExpressionEncoder()
    implicit val oe: Encoder[ExistChange[K, L]] = ExpressionEncoder()

    def expand(m: Map[L, Long]): Seq[L] =
      m.toSeq.sortBy(_._1.toString)
        .flatMap { case (p, c) => Seq.fill(c.toInt)(p) }

    val timeoutConf = if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    val tagged =
      left.map { case (k, kind, l) => (k, kind, Option(l), Option.empty[R]) }
        .union(right.map { case (k, kind, r) =>
          (k, kind, Option.empty[L], Option(r)) })
    tagged.groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(L, Long, Long)], Seq[(R, Long)], Long, Long, Long),
                              ExistChange[K, L]](
          OutputMode.Append, timeoutConf) {
        (key: K, values: Iterator[(K, String, Option[L], Option[R])],
         state: GroupState[(Seq[(L, Long, Long)], Seq[(R, Long)], Long, Long, Long)]) =>
         if (state.hasTimedOut) { state.remove(); Iterator.empty }
         else {
          val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
          // lazy expiry: a key idle past the TTL folds from fresh state
          val (l0, r0, n0, t0) = state.getOption
            .filter { case (_, _, _, _, last) => ttl.forall(t => now - last <= t.ms) }
            .map { case (l, r, n, t, _) => (l, r, n, t) }
            .getOrElse((Seq.empty[(L, Long, Long)], Seq.empty[(R, Long)], 0L, 0L))
          val lm = scala.collection.mutable.Map[L, (Long, Long)](
            l0.map { case (p, c, a) => p -> (c, a) }: _*)
          val rm = scala.collection.mutable.Map[R, Long](r0: _*)
          val delta = scala.collection.mutable.Map.empty[L, Long]
          var total = t0
          def addDelta(p: L, d: Long): Unit = {
            val c = delta.getOrElse(p, 0L) + d
            if (c == 0L) delta -= p else delta(p) = c
            total += d
          }
          // a left payload is emitted iff its association count passes
          def passes(al: Long): Boolean = if (anti) al == 0L else al > 0L
          values.foreach { case (_, kind, lo, ro) =>
            if (kind != Touch) {
            val acc = kind == Insert || kind == UpdateAfter
            lo.foreach { l =>
              if (acc) {
                // a payload already in state carries its (incrementally
                // maintained) association count — no probe needed; a
                // NEW payload counts passing right INSTANCES once
                val (cl, al0) = lm.getOrElse(l, (0L, -1L))
                val al =
                  if (cl > 0L) al0
                  else rm.iterator.map { case (r, cr) =>
                    if (cond(l, r)) cr else 0L }.sum
                if (passes(al)) addDelta(l, 1L)
                lm(l) = (cl + 1L, al)
              } else lm.get(l).foreach { case (cl, al) => // absent ⇒ stale
                if (passes(al)) addDelta(l, -1L)
                if (cl == 1L) lm -= l else lm(l) = (cl - 1L, al)
              }
            }
            ro.foreach { r =>
              // iterate a SNAPSHOT of the left map: the body replaces
              // association counts of existing keys, and mutating a map
              // mid-foreach — even value-only — is unspecified for Scala
              // collections (safe for today's mutable.HashMap, not by
              // contract). The snapshot is O(key's live payloads), the
              // same cost the probe loop already pays.
              if (acc) {
                lm.toSeq.foreach { case (l, (cl, al)) =>
                  if (cond(l, r)) {
                    // 0→1 association: membership flips for all cl copies
                    if (al == 0L) addDelta(l, if (anti) -cl else cl)
                    lm(l) = (cl, al + 1L)
                  }
                }
                rm(r) = rm.getOrElse(r, 0L) + 1L
              } else rm.get(r).foreach { cr => // absent ⇒ stale retract
                lm.toSeq.foreach { case (l, (cl, al)) =>
                  if (cond(l, r)) {
                    // 1→0 association: membership flips back
                    if (al == 1L) addDelta(l, if (anti) cl else -cl)
                    lm(l) = (cl, al - 1L)
                  }
                }
                if (cr == 1L) rm -= r else rm(r) = cr - 1L
              }
            }
            }
          }
          val removed = expand(delta.collect {
            case (p, c) if c < 0 => p -> -c }.toMap)
          val added = expand(delta.filter(_._2 > 0).toMap)
          var n = if (ttl.isDefined) math.max(n0, now << 20) else n0
          def rows(ps: Seq[L], kind: String): Seq[ExistChange[K, L]] =
            ps.map { l => n += 1; ExistChange(key, kind, l, n) }
          val out =
            rows(removed, if (total == 0L) Delete else UpdateBefore) ++
            rows(added, if (t0 == 0L) Insert else UpdateAfter)
          // drained keys keep an O(1) tombstone with the ord counter —
          // see topNChangelog: a reset counter would let a stale -D
          // outrank a post-drain +I under `materialize`; unknown keys
          // that emitted nothing allocate no entry
          if (state.getOption.isDefined || lm.nonEmpty || rm.nonEmpty ||
              out.nonEmpty) {
            state.update((
              lm.toSeq.map { case (p, (c, a)) => (p, c, a) },
              rm.toSeq, n, total, now))
            ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
          }
          out.iterator
         }
      }
  }

  /**
   * SELECT-DISTINCT over a changelog — live instance counting per row
   * VALUE, emitting only the 0↔1 membership transitions: +I when a
   * value's live count becomes positive, -D when it drains. This is
   * the distinct Aggregate the reference's streaming set-op rules put
   * on top of the semi/anti join
   * (ReplaceIntersectWithSemiJoinRule / ReplaceMinusWithAntiJoinRule,
   * PLANNER/plan/rules/logical — a distinct agg grouping on ALL
   * columns), split out as its own operator so INTERSECT/EXCEPT route
   * as `semi/anti(distinct(A), B)`.
   *
   * CONTRACT: `key` must functionally determine the payload — it is
   * the row value's canonical form (the SQL route keys on the packed
   * UnsafeRow image, which is canonical by construction — see
   * [[graft.plans.StructPack]]). Per-key state is then ONE payload +
   * a live count + the ord counter: O(1) per distinct live value,
   * exactly the reference's distinct-agg MapView entry. Stale
   * retractions (count already 0) are ignored; drained keys keep the
   * O(1) ord tombstone (topNChangelog discipline) so a stale -D can
   * never outrank a post-drain +I under [[materialize]].
   */
  def distinctChangelog[K, L](
      input: Dataset[(K, String, L)],
      ttl: Option[IdleStateTtl] = None)(
      implicit kt: TypeTag[K],
      lt: scala.reflect.runtime.universe.TypeTag[L]): Dataset[ExistChange[K, L]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val ie: Encoder[(K, String, L)] = ExpressionEncoder()
    implicit val ke: Encoder[K] = ExpressionEncoder()
    implicit val se: Encoder[(Option[L], Long, Long, Long)] = ExpressionEncoder()
    implicit val oe: Encoder[ExistChange[K, L]] = ExpressionEncoder()
    val timeoutConf = if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    input.groupByKey(_._1)
      .flatMapGroupsWithState[(Option[L], Long, Long, Long), ExistChange[K, L]](
          OutputMode.Append, timeoutConf) {
        (key: K, values: Iterator[(K, String, L)],
         state: GroupState[(Option[L], Long, Long, Long)]) =>
         if (state.hasTimedOut) { state.remove(); Iterator.empty }
         else {
          val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
          val (p0, c0, n0, _) = state.getOption
            .filter { case (_, _, _, last) => ttl.forall(t => now - last <= t.ms) }
            .getOrElse((Option.empty[L], 0L, state.getOption.map(_._3).getOrElse(0L), 0L))
          var payload = p0
          var count = c0
          values.foreach { case (_, kind, l) =>
            if (kind != Touch) {
              if (kind == Insert || kind == UpdateAfter) {
                count += 1L; payload = Some(l)
              } else if (count > 0L) count -= 1L // absent ⇒ stale retract
            }
          }
          var n = if (ttl.isDefined) math.max(n0, now << 20) else n0
          val out =
            if (c0 == 0L && count > 0L) { n += 1; Seq(ExistChange(key, Insert, payload.get, n)) }
            else if (c0 > 0L && count == 0L) { n += 1; Seq(ExistChange(key, Delete, p0.get, n)) }
            else Seq.empty
          val updated =
            if (count == 0L) {
              // O(1) tombstone: ord counter survives the drain
              val keep = state.getOption.isDefined || out.nonEmpty
              if (keep) state.update((None, 0L, n, now))
              keep
            } else { state.update((payload, count, n, now)); true }
          if (updated)
            ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
          out.iterator
         }
      }
  }

  /** One distinct-aggregate output row (kind ∈ -U/+U/-D per emission):
    * `distinct` = number of DISTINCT live values, `count` = total live
    * value instances. */
  final case class DistinctChange[K](key: K, kind: String,
                                     distinct: Long, count: Long)

  /**
   * Retract-capable COUNT(DISTINCT) per key over a changelog input —
   * the reference's distinct aggregate with retraction (the planner
   * wraps distinct aggs in a DistinctAccumulator whose MapView keyed
   * state holds value → instance count,
   * PLANNER-J/functions/aggfunctions + the generated distinct
   * accumulator's MapView): an insert increments its value's instance
   * count, a retraction decrements it, and the DISTINCT count moves
   * only on a value's 0↔1 instance transitions. SUM/COUNT retraction
   * ([[aggregateChangelog]]) cannot express this — deleting one of two
   * equal values must NOT drop the distinct count.
   *
   * State per key is the live value multiset (value → count) — exactly
   * the reference's MapView layout, bounded by the key's distinct live
   * values (not history). Emission protocol is GroupAggFunction's:
   * any change emits (-U previous, +U new); a key whose multiset
   * empties emits (-U previous, -D). Stale retractions (value not
   * live) are ignored, like the join family's absent-payload guard.
   */
  def aggregateChangelogDistinct[K: TypeTag, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      kind: V => String, value: V => Double,
      ttl: Option[IdleStateTtl] = None)(
      implicit ve: Encoder[V]): Dataset[DistinctChange[K]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val se: Encoder[(Map[Double, Long], Long)] =
      ExpressionEncoder()
    implicit val oe: Encoder[DistinctChange[K]] = ExpressionEncoder()
    val timeoutConf = if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    grouped.flatMapGroupsWithState[(Map[Double, Long], Long), DistinctChange[K]](
        OutputMode.Append, timeoutConf) {
      (key: K, values: Iterator[V], state: GroupState[(Map[Double, Long], Long)]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
          // lazy expiry: a key idle past the TTL folds from fresh state
          val m0 = state.getOption
            .filter { case (_, last) => ttl.forall(t => now - last <= t.ms) }
            .map(_._1).getOrElse(Map.empty[Double, Long])
          var m = m0
          values.foreach { v =>
            kind(v) match {
              case Insert | UpdateAfter =>
                m += (value(v) -> (m.getOrElse(value(v), 0L) + 1L))
              case Delete | UpdateBefore =>
                m.get(value(v)).foreach { c => // absent ⇒ stale: ignore
                  if (c == 1L) m -= value(v) else m += (value(v) -> (c - 1L))
                }
              case Touch => ()
            }
          }
          if (m.isEmpty) state.remove()
          else {
            state.update((m, now))
            ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
          }
          def snap(mm: Map[Double, Long], k: String): DistinctChange[K] =
            DistinctChange(key, k, mm.size.toLong, mm.values.sum)
          val (d0, c0) = (m0.size.toLong, m0.values.sum)
          val (d1, c1) = (m.size.toLong, m.values.sum)
          if ((d0, c0) == (d1, c1)) Iterator.empty
          else {
            val before =
              if (c0 == 0L) Iterator.empty else Iterator(snap(m0, UpdateBefore))
            val after =
              if (c1 == 0L) Iterator(snap(m0, Delete))
              else Iterator(snap(m, UpdateAfter))
            before ++ after
          }
        }
    }
  }

  def aggregateChangelog[K: TypeTag, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      kind: V => String, value: V => Double,
      ttl: Option[IdleStateTtl] = None)(
      implicit ve: Encoder[V]): Dataset[AggChange[K]] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    // state = (sum, count, lastAccessMs); lastAccess is 0/unused without TTL
    implicit val se: Encoder[(Double, Long, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaLong)
    implicit val oe: Encoder[AggChange[K]] = ExpressionEncoder()
    val timeoutConf = if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    grouped.flatMapGroupsWithState[(Double, Long, Long), AggChange[K]](
        OutputMode.Append, timeoutConf) {
      (key: K, values: Iterator[V], state: GroupState[(Double, Long, Long)]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
          // lazy expiry: a key idle past the TTL folds from fresh state
          val (s0, c0) = state.getOption
            .filter { case (_, _, last) => ttl.forall(t => now - last <= t.ms) }
            .map { case (s, c, _) => (s, c) }.getOrElse((0.0, 0L))
          var (s, c) = (s0, c0)
          values.foreach { v =>
            kind(v) match {
              case Insert | UpdateAfter => s += value(v); c += 1
              // count 0 ⇒ no live rows ⇒ the retract is stale (e.g. a
              // late retraction of a row whose state the TTL already
              // expired) — ignore it, like the reference's
              // GroupAggFunction when the accumulator is absent and
              // joinChangelog's absent-payload guard; applying it would
              // persist a negative count that never self-heals.
              case Delete | UpdateBefore => if (c > 0) { s -= value(v); c -= 1 }
              case Touch => ()
            }
          }
          if (c == 0L) state.remove()
          else {
            state.update((s, c, now))
            ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
          }
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

  /** One retract-capable moment-accumulator output row (kind ∈
    * -U/+U/-D): raw (Σv, Σv², n) — AVG/VAR_POP/VAR_SAMP/STDDEV derive
    * declaratively downstream (`sum/count`,
    * `(sumsq − sum²/count)/count`, …), keeping emission minimal and the
    * derivation in codegen'd projections. */
  final case class StatsChange[K](key: K, kind: String,
                                  sum: Double, sumsq: Double, count: Long)

  /**
   * Retract-capable AVG / VAR_POP / VAR_SAMP / STDDEV_POP / STDDEV_SAMP
   * per key — the moment-accumulator quarter of the reference's
   * retract-agg family (PLANNER-J/functions/aggfunctions/
   * AvgAggFunction.java's retract() reversing (sum, count);
   * VarPopAggFunction / VarSampAggFunction / StddevPopAggFunction /
   * StddevSampAggFunction maintain exactly this (Σv, Σv², n)
   * accumulator with retract expressions subtracting from each).
   * [[aggregateChangelog]]'s sign-reversal discipline extends verbatim:
   * the second moment is as reversible as the first, so state is just
   * (sum, sumsq, count) — no live row set needed.
   *
   * Retraction exactness: like aggregateChangelog, bit-exact replay
   * assumes integer-quantized values (integral doubles < 2^53 — the
   * repo-wide cents/ppm discipline), where +v then −v round-trips
   * exactly; with arbitrary floats, add-then-subtract can leave
   * residual ulps (the reference has the same property — its retract
   * methods subtract in double/decimal too).
   *
   * Emission protocol is GroupAggFunction's: any change emits
   * (-U previous, +U new); a count reaching 0 emits (-U previous, -D)
   * and retires the state (RecordCounter behavior). Stale retractions
   * (count already 0) are ignored, like aggregateChangelog's guard.
   */
  def aggregateChangelogStats[K: TypeTag, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      kind: V => String, value: V => Double,
      ttl: Option[IdleStateTtl] = None)(
      implicit ve: Encoder[V]): Dataset[StatsChange[K]] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    // state = (sum, sumsq, count, lastAccessMs); lastAccess unused sans TTL
    implicit val se: Encoder[(Double, Double, Long, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
                     Encoders.scalaLong, Encoders.scalaLong)
    implicit val oe: Encoder[StatsChange[K]] = ExpressionEncoder()
    val timeoutConf = if (ttl.exists(_.reclaimTimers)) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    grouped.flatMapGroupsWithState[(Double, Double, Long, Long), StatsChange[K]](
        OutputMode.Append, timeoutConf) {
      (key: K, values: Iterator[V], state: GroupState[(Double, Double, Long, Long)]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
          // lazy expiry: a key idle past the TTL folds from fresh state
          val (s0, q0, c0) = state.getOption
            .filter { case (_, _, _, last) => ttl.forall(t => now - last <= t.ms) }
            .map { case (s, q, c, _) => (s, q, c) }.getOrElse((0.0, 0.0, 0L))
          var (s, sq, c) = (s0, q0, c0)
          values.foreach { v =>
            kind(v) match {
              case Insert | UpdateAfter =>
                val x = value(v); s += x; sq += x * x; c += 1
              case Delete | UpdateBefore =>
                // count 0 ⇒ stale retract (cf. aggregateChangelog)
                if (c > 0) { val x = value(v); s -= x; sq -= x * x; c -= 1 }
              case Touch => ()
            }
          }
          if (c == 0L) state.remove()
          else {
            state.update((s, sq, c, now))
            ttl.filter(_.reclaimTimers).foreach(t => state.setTimeoutDuration(t.ms))
          }
          if ((s, sq, c) == (s0, q0, c0)) Iterator.empty
          else {
            val before =
              if (c0 == 0L) Iterator.empty
              else Iterator(StatsChange(key, UpdateBefore, s0, q0, c0))
            val after =
              if (c == 0L) Iterator(StatsChange(key, Delete, s0, q0, c0))
              else Iterator(StatsChange(key, UpdateAfter, s, sq, c))
            before ++ after
          }
        }
    }
  }
}
