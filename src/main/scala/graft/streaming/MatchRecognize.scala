package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions.{coalesce, col, lit, struct, to_json, unix_micros, unix_millis}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType, StructField, StructType, TimestampType}

/**
 * SQL-standard MATCH_RECOGNIZE (SURVEY §2.10) as a DataFrame operator —
 * the capability of the reference's StreamExecMatch / CepOperator SQL
 * front-end (flink-table-planner-blink .../stream/StreamExecMatch.scala:68,
 * MatchCodeGenerator.scala) re-expressed Spark-first.
 *
 * Semantics follow the SQL:2016 row-pattern-recognition model, which is
 * STRICTLY CONTIGUOUS (unlike Flink-CEP's relaxed `followedBy`): rows of a
 * partition, in ORDER BY order, are classified by the DEFINE predicates and
 * matched against a regular expression over the classifier variables.
 * Supported pattern syntax: concatenation, alternation `|`, grouping
 * `(...)`, quantifiers `* + ? {n} {n,} {n,m}` each with a reluctant `?`
 * suffix. Preference is standard leftmost-greedy (reluctant swaps branch
 * priority). AFTER MATCH SKIP PAST LAST ROW, SKIP TO NEXT ROW, and the
 * variable-targeted SKIP TO FIRST/LAST `var` are supported; empty
 * matches are not emitted.
 *
 * Spark-first design, sized for the 100 TB case:
 *  - DEFINE predicates are evaluated as Catalyst `Column`s BEFORE the
 *    shuffle (whole-stage-codegen'd into the scan stage; pushdown/pruning
 *    still apply) — the pattern automaton only ever reads booleans;
 *  - one hash shuffle on the partition keys + sortWithinPartitions, then a
 *    single linear scan per partition (no per-key groupByKey collect on the
 *    driver, no global sort);
 *  - the matcher is a priority-ordered Pike VM over the compiled NFA:
 *    linear in rows × program size per started match, never backtracks
 *    exponentially.
 *
 * Output is the ALL ROWS PER MATCH form: the input rows that participate
 * in a match, annotated with `mr_match` (match ordinal within the
 * partition key) and `mr_var` (the classifier variable the row was matched
 * as). ONE ROW PER MATCH + MEASURES is then an ordinary
 * `groupBy(partitionKeys :+ "mr_match").agg(...)` — Catalyst aggregates
 * stay in codegen and the measure surface is the full Spark agg library
 * rather than a bespoke interpreter.
 */
object MatchRecognize {

  sealed trait Skip
  /** Resume after the last row of the match (non-overlapping matches). */
  case object SkipPastLastRow extends Skip
  /** Resume at the row after the match's first row (overlaps allowed). */
  case object SkipToNextRow extends Skip
  /** AFTER MATCH SKIP TO FIRST `variable` — resume at the first row the
    * match classified as `variable` (reference:
    * flink-cep/.../nfa/aftermatch/SkipToFirstStrategy.java). When the
    * target is the match's first row (would loop forever) or the
    * variable matched no rows: throw if `throwOnMiss` (the reference's
    * MATCH_RECOGNIZE mode), else fall back to the next row (the
    * reference's default CEP mode, NoSkipStrategy fallback). */
  final case class SkipToFirst(variable: String,
                               throwOnMiss: Boolean = true) extends Skip
  /** AFTER MATCH SKIP TO LAST `variable` — resume at the last row the
    * match classified as `variable` (SkipToLastStrategy.java); same
    * miss/loop handling as [[SkipToFirst]]. */
  final case class SkipToLast(variable: String,
                              throwOnMiss: Boolean = true) extends Skip

  // ---------------------------------------------------------------- pattern
  private[streaming] sealed trait Ast
  private final case class Lit(v: String) extends Ast
  private final case class Cat(a: Ast, b: Ast) extends Ast
  private final case class Alt(a: Ast, b: Ast) extends Ast
  private final case class Rep(a: Ast, min: Int, max: Option[Int],
                               greedy: Boolean) extends Ast

  /** Recursive-descent parser for the pattern regex. */
  private[streaming] def parse(s: String): Ast = {
    var pos = 0
    def peek: Char = if (pos < s.length) s.charAt(pos) else '\u0000'
    def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    def fail(msg: String) =
      throw new IllegalArgumentException(s"bad pattern at ${pos}: $msg in '$s'")

    def ident(): String = {
      skipWs()
      val start = pos
      while (pos < s.length &&
             (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
      if (pos == start) fail("expected variable")
      s.substring(start, pos)
    }
    def number(): Int = {
      skipWs()
      val start = pos
      while (pos < s.length && s.charAt(pos).isDigit) pos += 1
      if (pos == start) fail("expected number")
      s.substring(start, pos).toInt
    }
    def quant(a: Ast): Ast = {
      skipWs()
      val base = peek match {
        case '*' => pos += 1; Rep(a, 0, None, greedy = true)
        case '+' => pos += 1; Rep(a, 1, None, greedy = true)
        case '?' => pos += 1; Rep(a, 0, Some(1), greedy = true)
        case '{' =>
          pos += 1
          val lo = number(); skipWs()
          val hi = peek match {
            case ',' =>
              pos += 1; skipWs()
              if (peek == '}') None else Some(number())
            case _ => Some(lo)
          }
          skipWs()
          if (peek != '}') fail("expected }")
          pos += 1
          hi.foreach(h => if (h < lo) fail(s"quantifier max $h < min $lo"))
          Rep(a, lo, hi, greedy = true)
        case _ => return a
      }
      skipWs()
      if (peek == '?') { pos += 1; base.copy(greedy = false) } else base
    }
    def atom(): Ast = {
      skipWs()
      if (peek == '(') {
        pos += 1
        val inner = alt()
        skipWs()
        if (peek != ')') fail("expected )")
        pos += 1
        quant(inner)
      } else quant(Lit(ident()))
    }
    def cat(): Ast = {
      var a = atom()
      skipWs()
      while (pos < s.length && peek != '|' && peek != ')') {
        a = Cat(a, atom()); skipWs()
      }
      a
    }
    def alt(): Ast = {
      var a = cat()
      skipWs()
      while (peek == '|') { pos += 1; a = Alt(a, cat()); skipWs() }
      a
    }
    val r = alt()
    skipWs()
    if (pos != s.length) fail("trailing input")
    r
  }

  // --------------------------------------------------------------- program
  private[streaming] sealed trait Inst
  private final case class Sym(varIdx: Int) extends Inst
  private final case class Split(a: Int, b: Int) extends Inst
  private final case class Jmp(to: Int) extends Inst
  private case object Done extends Inst

  private[streaming] def compile(ast: Ast,
                                 varIdx: Map[String, Int]): Array[Inst] = {
    val buf = mutable.ArrayBuffer.empty[Inst]
    def emit(a: Ast): Unit = a match {
      case Lit(v) =>
        buf += Sym(varIdx.getOrElse(v,
          throw new IllegalArgumentException(s"undefined pattern variable $v")))
      case Cat(x, y) => emit(x); emit(y)
      case Alt(x, y) =>
        val sp = buf.length; buf += null
        emit(x)
        val jm = buf.length; buf += null
        val yStart = buf.length
        emit(y)
        buf(sp) = Split(sp + 1, yStart)
        buf(jm) = Jmp(buf.length)
      case Rep(x, min, max, greedy) =>
        for (_ <- 0 until min) emit(x)
        max match {
          case Some(m) =>
            // (m - min) nested-optional copies, flattened: each split
            // either enters the next copy or jumps to the common end.
            val splits = mutable.ArrayBuffer.empty[Int]
            for (_ <- min until m) { splits += buf.length; buf += null; emit(x) }
            val end = buf.length
            splits.foreach { sp =>
              buf(sp) = if (greedy) Split(sp + 1, end) else Split(end, sp + 1)
            }
          case None =>
            val l = buf.length; buf += null
            emit(x)
            buf += Jmp(l)
            buf(l) = if (greedy) Split(l + 1, buf.length)
                     else Split(buf.length, l + 1)
        }
    }
    emit(ast)
    buf += Done
    buf.toArray
  }

  /**
   * Priority Pike VM: returns the classifier index per consumed row for
   * the preferred (leftmost-greedy) match starting at `start`, or null.
   * With `times`/`spanMs` set (MATCH_RECOGNIZE WITHIN — the reference's
   * Flink extension, StreamExecMatch interval), rows whose event time is
   * more than `spanMs` past the start row's cannot be CONSUMED — the
   * leftmost-greedy preference then maximizes within the window, exactly
   * like the reference's NFA pruning partials at the window boundary —
   * while already-completed threads still record their match.
   */
  private[streaming] final class Vm(prog: Array[Inst],
                                    times: IndexedSeq[Long] = null,
                                    spanMs: Long = -1L) {
    def run(flags: IndexedSeq[Array[Boolean]], start: Int): Array[Int] = {
      var clist = mutable.ArrayBuffer.empty[(Int, List[Int])]
      val seen = new java.util.BitSet(prog.length)
      // Dedup EVERY pc (not just Sym/Done): the first, highest-priority
      // arrival at a pc wins, and — critically — epsilon cycles from
      // nullable bodies of unbounded quantifiers ('(A?)+', '(A*)*')
      // terminate instead of recursing forever.
      def add(list: mutable.ArrayBuffer[(Int, List[Int])], pc: Int,
              trace: List[Int]): Unit = {
        if (seen.get(pc)) return
        seen.set(pc)
        prog(pc) match {
          case Split(a, b) => add(list, a, trace); add(list, b, trace)
          case Jmp(t)      => add(list, t, trace)
          case _           => list += ((pc, trace))
        }
      }
      add(clist, 0, Nil)
      var best: List[Int] = null
      var i = start
      while (clist.nonEmpty) {
        val nlist = mutable.ArrayBuffer.empty[(Int, List[Int])]
        seen.clear()
        var t = 0
        var cut = false
        while (t < clist.length && !cut) {
          val (pc, trace) = clist(t)
          prog(pc) match {
            case Done =>
              // Threads after this one are lower priority: a recorded
              // match supersedes anything they could produce. Threads
              // already copied into nlist are higher priority and may
              // still override `best` at a later row (greedy loops).
              if (trace.nonEmpty) { best = trace; cut = true }
            case Sym(v) =>
              if (i < flags.length && flags(i)(v) &&
                  (spanMs < 0 || times(i) - times(start) <= spanMs))
                add(nlist, pc + 1, v :: trace)
            case _ => () // Split/Jmp never appear post-closure
          }
          t += 1
        }
        clist = nlist
        i += 1
      }
      if (best == null) null else best.reverse.toArray
    }
  }

  /** Resolve a Skip against the variable table into the scan-resume
    * function: (matchStart, classifiers) => next scan position. Always
    * advances (≥ start + 1) unless it throws. */
  private[streaming] def resumeFn(skip: Skip, vars: Seq[String])
      : (Int, Array[Int]) => Int = {
    def varIdx(v: String): Int = {
      val i = vars.indexOf(v)
      require(i >= 0, s"AFTER MATCH SKIP TO references undefined variable $v")
      i
    }
    skip match {
      case SkipPastLastRow => (p, m) => p + m.length
      case SkipToNextRow => (p, _) => p + 1
      case SkipToFirst(v, thr) =>
        val vi = varIdx(v)
        (p, m) => m.indexOf(vi) match {
          case -1 if thr => throw new IllegalStateException(
            s"AFTER MATCH SKIP TO FIRST $v: no rows matched to $v")
          case -1 => p + 1
          case 0 if thr => throw new IllegalStateException(
            s"AFTER MATCH SKIP TO FIRST $v: skipping to the match's " +
            "first row would loop forever")
          case 0 => p + 1
          case k => p + k
        }
      case SkipToLast(v, thr) =>
        val vi = varIdx(v)
        (p, m) => m.lastIndexOf(vi) match {
          case -1 if thr => throw new IllegalStateException(
            s"AFTER MATCH SKIP TO LAST $v: no rows matched to $v")
          case -1 => p + 1
          case 0 if thr => throw new IllegalStateException(
            s"AFTER MATCH SKIP TO LAST $v: skipping to the match's " +
            "first row would loop forever")
          case 0 => p + 1
          case k => p + k
        }
    }
  }

  /** One skip-strategy-driven scan over a key's rows: (startIdx,
    * classifier-per-consumed-row) for each match, in scan order. Shared
    * by the batch operator and the streaming operator. */
  private[streaming] def scanMatches(
      prog: Array[Inst], flags: IndexedSeq[Array[Boolean]],
      times: IndexedSeq[Long], spanMs: Long,
      resume: (Int, Array[Int]) => Int): Seq[(Int, Array[Int])] = {
    val vm = new Vm(prog, times, spanMs)
    val out = mutable.ArrayBuffer.empty[(Int, Array[Int])]
    var p = 0
    while (p < flags.length) {
      val m = vm.run(flags, p)
      if (m != null) {
        out += ((p, m))
        p = resume(p, m)
      } else p += 1
    }
    out.toSeq
  }

  // ------------------------------------------------------------- operator
  /**
   * ALL ROWS PER MATCH row-pattern recognition. `define` order fixes the
   * classifier indices; every variable used in `pattern` must appear.
   */
  def annotate(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[String],
               pattern: String, define: Seq[(String, Column)],
               skip: Skip = SkipPastLastRow,
               within: Option[(Column, Long)] = None): DataFrame = {
    require(partitionBy.nonEmpty && orderBy.nonEmpty && define.nonEmpty)
    val vars = define.map(_._1)
    val prog = compile(parse(pattern), vars.zipWithIndex.toMap)
    val varNames = vars.toArray

    val flagged0 = define.foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(s"__mr_$n", coalesce(c.cast("boolean"), lit(false)))
    }
    // WITHIN: event time (ms) evaluated per row before the shuffle, like
    // the DEFINE flags — the matcher only reads longs.
    val flagged = within match {
      case Some((tc, _)) => flagged0.withColumn("__mr_ts", tc.cast("long"))
      case None => flagged0
    }
    val spanMs = within.map(_._2).getOrElse(-1L)
    val sorted = flagged
      .repartition(partitionBy.map(col): _*)
      .sortWithinPartitions((partitionBy ++ orderBy).map(col): _*)

    val inSchema = sorted.schema
    val nOrig = df.schema.length
    val keyIdx = partitionBy.map(inSchema.fieldIndex).toArray
    val flagIdx = vars.map(n => inSchema.fieldIndex(s"__mr_$n")).toArray
    val tsIdx = if (within.isDefined) inSchema.fieldIndex("__mr_ts") else -1
    val outSchema = StructType(df.schema.fields :+
      StructField("mr_match", LongType, nullable = false) :+
      StructField("mr_var", StringType, nullable = false) :+
      StructField("mr_seq", LongType, nullable = false))
    val resume = resumeFn(skip, vars)

    sorted.mapPartitions { it =>
      // consecutive-key grouping over the sorted partition: one key's rows
      // in memory at a time (same bound as any per-key window operator).
      new Iterator[Row] {
        private val src = it.buffered
        private var queue: Iterator[Row] = Iterator.empty
        private def keyOf(r: Row): Seq[Any] = keyIdx.toSeq.map(r.get)
        private def matchGroup(rows: mutable.ArrayBuffer[Row]): Iterator[Row] = {
          val flags: IndexedSeq[Array[Boolean]] =
            rows.map(r => flagIdx.map(j => !r.isNullAt(j) && r.getBoolean(j))).toIndexedSeq
          val times: IndexedSeq[Long] =
            if (tsIdx < 0) null
            else rows.map(r => if (r.isNullAt(tsIdx)) Long.MinValue
                               else r.getLong(tsIdx)).toIndexedSeq
          scanMatches(prog, flags, times, spanMs, resume)
            .iterator.zipWithIndex.flatMap { case ((p, m), mi) =>
              m.iterator.zipWithIndex.map { case (v, k) =>
                Row.fromSeq(rows(p + k).toSeq.take(nOrig) ++
                  Seq(mi + 1L, varNames(v), k.toLong))
              }
            }
        }
        private def refill(): Unit = {
          while (!queue.hasNext && src.hasNext) {
            val k = keyOf(src.head)
            val rows = mutable.ArrayBuffer.empty[Row]
            while (src.hasNext && keyOf(src.head) == k) rows += src.next()
            queue = matchGroup(rows)
          }
        }
        def hasNext: Boolean = { refill(); queue.hasNext }
        def next(): Row = { refill(); queue.next() }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * STREAMING row-pattern recognition (the reference's StreamExecMatch /
   * CepOperator is streaming-first: rows buffer in keyed state and
   * matches emit as the watermark passes —
   * flink-table-planner-blink/.../stream/StreamExecMatch.scala:68). The
   * typed dual of `annotate`: per-key state is the time-sorted row
   * buffer; a match is FINAL once its start is older than
   * watermark − within (its full span is then behind the watermark, so
   * no admissible row can change it), at which point it emits and the
   * dead prefix is pruned. `within` is mandatory — it is the state
   * horizon (same soundness rule as Cep.matchStream: without a window
   * there is no point at which a partial match can be finalized).
   *
   * Because the buffer is time-sorted, everything pruned is a PREFIX:
   * matches are strictly contiguous, so a future match (start ts >
   * watermark − within) can only involve rows after the boundary — no
   * false adjacency is created by pruning. Match ordinals continue
   * across batches (the reference's per-key match numbering).
   *
   * Output: one row per (key, matchId, classifier, row, seq) — the ALL
   * ROWS PER MATCH form with the row's 0-based ordinal WITHIN its match
   * (`mr_seq`, emitted by the NFA itself — the scan knows each row's
   * position, so no downstream row_number pass is needed); ONE ROW PER
   * MATCH is [[matchRowsStream]] (the match's rows as one packed array,
   * emit-and-forget) or a downstream groupBy as in the batch operator.
   */
  def annotateStream[K, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      orderTs: V => Long, tiebreak: V => Long,
      pattern: String, define: Seq[(String, V => Boolean)],
      withinMs: Long, skip: Skip = SkipPastLastRow,
      ttl: Option[Changelog.IdleStateTtl] = None)(
      implicit ve: Encoder[V], se: Encoder[Seq[V]],
      oe: Encoder[(K, Long, String, V, Long)]): Dataset[(K, Long, String, V, Long)] =
    runNfa[K, V, (K, Long, String, V, Long)](
      grouped, orderTs, tiebreak, pattern, define, withinMs, skip, ttl) {
      (key, mid, rows) =>
        rows.map { case (v, row, seq) => (key, mid, v, row, seq) }
    }

  /**
   * ONE ROW PER MATCH streaming emission — each finalized match leaves
   * the NFA as a SINGLE row carrying its constituent rows as an array
   * of packed UnsafeRow images ([[graft.plans.RowPacker]]; `packRow`
   * maps (row, seq, classifier) to the bytes). This is the
   * emit-and-forget shape of the reference's StreamExecMatch: the
   * MEASURES collapse then runs STATELESSLY over the array column
   * (higher-order functions, no second stateful operator, no per-match
   * retained state) — see MatchRecognizeSql's unified-entry route.
   */
  def matchRowsStream[K, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      orderTs: V => Long, tiebreak: V => Long,
      pattern: String, define: Seq[(String, V => Boolean)],
      withinMs: Long, skip: Skip,
      packRow: (V, Long, String) => Array[Byte])(
      implicit ve: Encoder[V], se: Encoder[Seq[V]],
      oe: Encoder[(K, Long, Seq[Array[Byte]])]): Dataset[(K, Long, Seq[Array[Byte]])] =
    runNfa[K, V, (K, Long, Seq[Array[Byte]])](
      grouped, orderTs, tiebreak, pattern, define, withinMs, skip, None) {
      (key, mid, rows) =>
        Iterator.single((key, mid,
          rows.map { case (v, row, seq) => packRow(row, seq, v) }.toSeq))
    }

  /** The shared keyed-NFA state machine under [[annotateStream]] /
    * [[matchRowsStream]]: buffer, scan, finalize behind the watermark,
    * prune the dead prefix — `emit` shapes each finalized match
    * (classifier, row, 0-based seq) into output rows. */
  private def runNfa[K, V, O](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      orderTs: V => Long, tiebreak: V => Long,
      pattern: String, define: Seq[(String, V => Boolean)],
      withinMs: Long, skip: Skip,
      ttl: Option[Changelog.IdleStateTtl])(
      emit: (K, Long, Iterator[(String, V, Long)]) => Iterator[O])(
      implicit ve: Encoder[V], se: Encoder[Seq[V]],
      oe: Encoder[O]): Dataset[O] = {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(withinMs > 0, "streaming MATCH_RECOGNIZE requires a within horizon")
    // the within-horizon is the default state bound; `ttl` adds the
    // reference's idle-state retention on top — an idle key's pending
    // buffer AND match counter drop, exactly the full-state cleanup
    // the reference's TTL timer performs on CepOperator keyed state.
    // Lazy-expiry only (the event-time timeout slot is the horizon
    // flush), same contract as Cep.matchStream.
    require(!ttl.exists(_.reclaimTimers),
      "streaming MATCH_RECOGNIZE uses the event-time timeout for its " +
      "horizon flush; idle-state retention is lazy-expiry only here")
    val vars = define.map(_._1)
    val prog = compile(parse(pattern), vars.zipWithIndex.toMap)
    val preds = define.map(_._2).toArray
    val varNames = vars.toArray
    val resume = resumeFn(skip, vars)
    implicit val stEnc: Encoder[(Seq[V], Long, Long)] =
      E.tuple(se, E.scalaLong, E.scalaLong)
    grouped.flatMapGroupsWithState[(Seq[V], Long, Long), O](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: K, values: Iterator[V],
       state: org.apache.spark.sql.streaming.GroupState[(Seq[V], Long, Long)]) =>
        val vs = values.toSeq
        val now = if (ttl.isDefined) state.getCurrentProcessingTimeMs() else 0L
        val (buf1, mid1, last0) =
          state.getOption.getOrElse((Seq.empty[V], 0L, now))
        // lazy idle expiry: buffer and match ordinal fold from scratch
        val (buf0, mid0) =
          if (ttl.exists(t => now - last0 > t.ms)) (Seq.empty[V], 0L)
          else (buf1, mid1)
        val buf = (buf0 ++ vs).sortBy(v => (orderTs(v), tiebreak(v)))
          .toIndexedSeq
        val wm = state.getCurrentWatermarkMs()
        val safeTs = wm - withinMs
        val flags = buf.map(v => preds.map(p => p(v)))
        val times = buf.map(orderTs)
        val all = scanMatches(prog, flags, times, withinMs, resume)
        // time-sorted buffer ⇒ match starts are ts-nondecreasing ⇒ the
        // finalizable matches are a prefix of the scan's match list
        val ready = all.takeWhile { case (s, _) => times(s) <= safeTs }
        var mid = mid0
        val out = ready.flatMap { case (s, m) =>
          mid += 1
          emit(key, mid, m.toSeq.zipWithIndex.iterator.map { case (v, k) =>
            (varNames(v), buf(s + k), k.toLong)
          })
        }
        // prune the dead prefix: rows at/before the horizon, plus rows
        // the last emitted match's skip strategy scanned past (under
        // skip-past-last: its consumed rows; under skip-to-first/last:
        // rows before the resume target) — the next batch's scan then
        // restarts exactly where this scan resumed
        val scanEnd = if (ready.nonEmpty)
          resume(ready.last._1, ready.last._2) else 0
        val firstLive = math.max(buf.indexWhere(v => orderTs(v) > safeTs) match {
          case -1 => buf.length
          case i => i
        }, scanEnd)
        val pending = buf.drop(firstLive)
        if (pending.isEmpty) state.remove()
        else {
          // a timeout/flush wakeup (no records) is not an access: carry
          // the previous idle clock (record-to-record TTL, as in
          // Cep.matchStream)
          state.update((pending, mid, if (vs.nonEmpty) now else last0))
          state.setTimeoutTimestamp(orderTs(pending.head) + withinMs + 1)
        }
        out.iterator
    }
  }

  /**
   * STREAMING ALL-ROWS row-pattern recognition over an untyped
   * DataFrame — the Row-level dual of [[annotateStream]], the engine
   * under [[MatchRecognizeSql.stream]]. DEFINE flags and the event
   * clock are pre-computed as codegen'd boolean/long columns BEFORE the
   * keyed shuffle (the same trick as the batch [[annotate]]); the keyed
   * NFA state machine then reads only those primitives. Matches
   * finalize when the watermark passes their span (the caller must set
   * `withWatermark` on the first ORDER BY column upstream), emit whole
   * within one micro-batch, and per-key match ordinals equal the batch
   * operator's (matches finalize strictly in scan order). Output = the
   * input columns + (mr_match, mr_var); mr_seq is reconstructable
   * downstream as a row_number over (keys, mr_match) in ORDER BY order.
   *
   * State note: the per-key row buffer is kryo-encoded (rows are opaque
   * state bytes, as in the reference's CEP state) and bounded by the
   * `withinMs` horizon — identical pruning to [[annotateStream]].
   */
  /**
   * Shared prep for the untyped stream entries: flag columns per DEFINE,
   * the NFA's primitive order/tiebreak/partition-key columns, and the
   * per-variable predicate accessors. Validates the ORDER BY shape —
   * (rowtime [, one tiebreak]) with an integral or timestamp tiebreak:
   * a lossy `cast("long")` on anything else (the old behavior) turned
   * every tiebreak into 0 and made tie order nondeterministic, and a
   * silently-dropped third order column is the same bug in disguise.
   * The partition key serializes with [[Changelog.TransportJsonOpts]]
   * (µs timestamp format) — two partitions differing only in
   * microseconds must NOT collapse into one NFA key.
   */
  private def flagForNfa(df: DataFrame, partitionBy: Seq[String],
                         orderBy: Seq[String],
                         define: Seq[(String, Column)])
      : (DataFrame, Int, Int, Int, Seq[(String, Row => Boolean)]) = {
    require(partitionBy.nonEmpty && orderBy.nonEmpty && define.nonEmpty)
    require(orderBy.size <= 2,
      "streaming MATCH_RECOGNIZE orders on (rowtime [, one tiebreak " +
      s"column]); got ORDER BY ${orderBy.mkString(", ")}")
    val tb = orderBy.drop(1).headOption.map { c =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          coalesce(col(c).cast("long"), lit(0L))
        case TimestampType => coalesce(unix_micros(col(c)), lit(0L))
        case other => throw new IllegalArgumentException(
          s"streaming MATCH_RECOGNIZE tiebreak column '$c' must be an " +
          s"integral or timestamp column (got ${other.simpleString}) — " +
          "a lossy cast would make tie order nondeterministic")
      }
    }.getOrElse(lit(0L))
    val flagged0 = define.foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(s"__mr_$n", coalesce(c.cast("boolean"), lit(false)))
    }
    val flagged = flagged0
      .withColumn("__mr_ts",
        unix_millis(col(orderBy.head).cast("timestamp")))
      .withColumn("__mr_tb", tb)
      .withColumn("__mr_key",
        to_json(struct(partitionBy.map(col): _*),
                Changelog.TransportJsonOpts))
    val sch = flagged.schema
    val flagIdx = define.map { case (n, _) => sch.fieldIndex(s"__mr_$n") }
    val defs: Seq[(String, Row => Boolean)] =
      define.zipWithIndex.map { case ((n, _), i) =>
        val j = flagIdx(i)
        n -> ((r: Row) => !r.isNullAt(j) && r.getBoolean(j))
      }
    (flagged, sch.fieldIndex("__mr_key"), sch.fieldIndex("__mr_ts"),
     sch.fieldIndex("__mr_tb"), defs)
  }

  def annotateStreamDf(df: DataFrame, partitionBy: Seq[String],
                       orderBy: Seq[String], pattern: String,
                       define: Seq[(String, Column)], withinMs: Long,
                       skip: Skip = SkipPastLastRow): DataFrame = {
    val nOrig = df.schema.length
    val (flagged, keyIdx, tsIdx, tbIdx, defs) =
      flagForNfa(df, partitionBy, orderBy, define)
    val sch = flagged.schema
    implicit val ve: Encoder[Row] = Encoders.row(sch)
    implicit val se: Encoder[Seq[Row]] = Encoders.kryo[Seq[Row]]
    implicit val oe: Encoder[(String, Long, String, Row, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.STRING,
                     ve, Encoders.scalaLong)
    val ann = annotateStream[String, Row](
      flagged.groupByKey(_.getString(keyIdx))(Encoders.STRING),
      orderTs = _.getLong(tsIdx), tiebreak = _.getLong(tbIdx),
      pattern, defs, withinMs, skip)
    val outSchema = StructType(df.schema.fields :+
      StructField("mr_match", LongType, nullable = false) :+
      StructField("mr_var", StringType, nullable = false) :+
      StructField("mr_seq", LongType, nullable = false))
    ann.map { case (_, mid, v, r, seq) =>
      Row.fromSeq(r.toSeq.take(nOrig) :+ mid :+ v :+ seq)
    }(Encoders.row(outSchema))
  }

  /**
   * ONE ROW PER MATCH over an untyped DataFrame — the Row-level dual of
   * [[matchRowsStream]], the engine under MatchRecognizeSql's unified
   * streaming entry. Each finalized match emits ONE row
   * `(__mr_key, mr_match, __mr_rows)` where `__mr_key` is the JSON of
   * the partition columns and `__mr_rows` the match's rows (original
   * columns + mr_seq + mr_var) as packed UnsafeRow images in match
   * order ([[graft.plans.RowPacker]]). MEASURES then evaluate
   * STATELESSLY over the array (higher-order functions) — the
   * emit-and-forget shape of the reference's StreamExecMatch, no
   * second stateful operator, no per-match retained state.
   */
  def matchRowsStreamDf(df: DataFrame, partitionBy: Seq[String],
                        orderBy: Seq[String], pattern: String,
                        define: Seq[(String, Column)], withinMs: Long,
                        skip: Skip = SkipPastLastRow): DataFrame = {
    val nOrig = df.schema.length
    val (flagged, keyIdx, tsIdx, tbIdx, defs) =
      flagForNfa(df, partitionBy, orderBy, define)
    val sch = flagged.schema
    implicit val ve: Encoder[Row] = Encoders.row(sch)
    implicit val se: Encoder[Seq[Row]] = Encoders.kryo[Seq[Row]]
    implicit val oe: Encoder[(String, Long, Seq[Array[Byte]])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    val packedSchema = StructType(df.schema.fields :+
      StructField("mr_seq", LongType, nullable = false) :+
      StructField("mr_var", StringType, nullable = false))
    val packer = new graft.plans.RowPacker(packedSchema)
    matchRowsStream[String, Row](
      flagged.groupByKey(_.getString(keyIdx))(Encoders.STRING),
      orderTs = _.getLong(tsIdx), tiebreak = _.getLong(tbIdx),
      pattern, defs, withinMs, skip,
      packRow = (r, seq, v) =>
        packer.pack(Row.fromSeq(r.toSeq.take(nOrig) :+ seq :+ v)))
      .toDF("__mr_key", "mr_match", "__mr_rows")
  }

  /**
   * MEASURES building blocks for ONE ROW PER MATCH (the reference's
   * StreamExecMatch MEASURES clause / MatchCodeGenerator FIRST, LAST,
   * CLASSIFIER, RUNNING-vs-FINAL aggregates — re-expressed as ordinary
   * Catalyst aggregate expressions over the annotated match rows, so the
   * measure surface is Spark's whole agg library and stays in codegen).
   * All helpers read the `mr_var`/`mr_seq` columns `annotate` emits;
   * per-variable navigation uses min_by/max_by over the in-match ordinal
   * (null-safe: rows of other variables have a null ordering key and are
   * ignored by MaxMinBy).
   */
  object Measures {
    private def seqOf(v: String): Column =
      org.apache.spark.sql.functions.when(col("mr_var") === v, col("mr_seq"))
    /** FIRST(V.c) — c on the first row classified as V. */
    def firstOf(v: String, c: Column): Column =
      org.apache.spark.sql.functions.min_by(
        org.apache.spark.sql.functions.when(col("mr_var") === v, c), seqOf(v))
    /** LAST(V.c) — c on the last row classified as V. */
    def lastOf(v: String, c: Column): Column =
      org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.when(col("mr_var") === v, c), seqOf(v))
    /** CLASSIFIER() of the final row of the match. */
    def classifier: Column =
      org.apache.spark.sql.functions.max_by(col("mr_var"), col("mr_seq"))
    /** COUNT(V.*) — rows classified as V. */
    def countOf(v: String): Column =
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.when(col("mr_var") === v, lit(1)))

    private def varRows(v: String, c: Column): Column = {
      import org.apache.spark.sql.functions._
      // V's rows as (mr_seq, value) structs in match order; collect_list
      // drops the non-V rows' nulls, array_sort orders by mr_seq
      array_sort(collect_list(when(col("mr_var") === v,
        struct(col("mr_seq").as("s"), c.as("v")))))
    }
    /** FIRST(V.c, offset) — c on the (offset+1)-th row classified as V
      * (SQL:2016 logical navigation with offset; null when V matched
      * fewer rows — try_element_at, since Spark 4 runs ANSI mode). */
    def firstOf(v: String, c: Column, offset: Int): Column =
      org.apache.spark.sql.functions
        .try_element_at(varRows(v, c), lit(offset + 1))("v")
    /** LAST(V.c, offset) — c on the (offset+1)-th row of V counting from
      * the match end. */
    def lastOf(v: String, c: Column, offset: Int): Column =
      org.apache.spark.sql.functions.try_element_at(
        org.apache.spark.sql.functions.reverse(varRows(v, c)),
        lit(offset + 1))("v")

    /**
     * RUNNING semantics for ALL ROWS PER MATCH (the reference's
     * RUNNING-vs-FINAL measure split, MatchCodeGenerator.scala): a
     * per-row aggregate over the match PREFIX up to the current row.
     * Apply to `annotate`'s output:
     * `ann.withColumn("run_sum", Measures.running(Seq("k"))(sum($"x")))`.
     * FINAL semantics are the plain groupBy aggregate (oneRowPerMatch)
     * or an unbounded frame over the same window.
     */
    def running(partitionBy: Seq[String])(agg: Column): Column = {
      import org.apache.spark.sql.expressions.Window
      agg.over(Window
        .partitionBy((partitionBy :+ "mr_match").map(col): _*)
        .orderBy(col("mr_seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }
  }

  /**
   * ONE ROW PER MATCH: run `annotate`, then collapse each match to a
   * single row computing `measures` (aggregate Columns — plain
   * aggregates apply FINAL semantics over the whole match; the Measures
   * helpers cover FIRST/LAST/CLASSIFIER/per-variable counts). Output is
   * one row per (partition keys, mr_match).
   */
  def oneRowPerMatch(df: DataFrame, partitionBy: Seq[String],
                     orderBy: Seq[String], pattern: String,
                     define: Seq[(String, Column)],
                     measures: Seq[(String, Column)],
                     skip: Skip = SkipPastLastRow,
                     within: Option[(Column, Long)] = None): DataFrame = {
    require(measures.nonEmpty)
    val ann = annotate(df, partitionBy, orderBy, pattern, define, skip, within)
    val aggs = measures.map { case (n, c) => c.as(n) }
    ann.groupBy((partitionBy :+ "mr_match").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
