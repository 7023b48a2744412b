package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.operators.SqlFrontend

/**
 * Streaming-SQL reachability for the TIME-DOMAIN operators — the repo's
 * analogue of the reference planning row-time operators from SQL text:
 *
 *  - `AGG(v) OVER (PARTITION BY g ORDER BY ts [frame])` →
 *    [[OverWindow.overAgg]] (the reference's StreamExecOverAggregate,
 *    flink-table-planner-blink/.../plan/nodes/physical/stream/
 *    StreamExecOverAggregate.scala, executing
 *    RowTimeRows/RangeBounded/UnboundedPrecedingFunction);
 *  - a join whose ON carries a key equality plus a time bound between
 *    the two event-time columns (`b.ts BETWEEN a.ts - x AND a.ts + y`,
 *    or explicit inequalities) → a watermarked stream-stream interval
 *    join (the reference's RowTimeBoundedStreamJoin, planned from the
 *    BETWEEN predicate by FlinkStreamRuleSets' window-join rules);
 *  - `A JOIN V FOR SYSTEM_TIME AS OF a.ts ON a.k = v.k` where BOTH
 *    sides are streams → [[TemporalJoin.streamAsOf]] (the reference's
 *    LogicalCorrelateToJoinFromTemporalTableRule →
 *    TemporalRowTimeJoinOperator).
 *
 * Inputs are APPEND-ONLY STREAM VIEWS registered via
 * [[StreamSql.registerStream]] — an insert-only streaming DataFrame
 * with a declared event-time column and watermark delay, the repo's
 * analogue of the reference's `WATERMARK FOR ts AS ts - INTERVAL …`
 * DDL on an insert-only table. Outputs are plain APPEND streams (no
 * row_kind): every row is final once emitted, exactly the changelog
 * mode the reference infers for row-time operators over insert-only
 * inputs.
 *
 * OVER grammar: `SELECT <g> [AS ga], <ts> [AS ta], <rowId> [AS ia],
 * AGG1(<v1>) OVER (w) AS a1 [, AGG2(<v2>) OVER (w) AS a2 …] FROM S
 * [AS s]` with `w = PARTITION BY <g> ORDER BY <ts> [, <rowId>]
 * [frame]` — AGG ∈ SUM|COUNT(*)|MIN|MAX|AVG|FIRST_VALUE|LAST_VALUE
 * (any number per statement, all sharing ONE window spec: one state
 * buffer serves N folds, [[OverWindow.overAggMulti]]), or exactly one
 * LAG|LEAD(<v>[, n]) navigation item ([[OverWindow.overOffset]], the
 * reference's OffsetOverFrame family; LEAD withholds a key's trailing
 * rows until their offset row is final — append streams never
 * retract). Partition keys are GENERIC: integral expressions key state
 * as Long, anything else as its canonical string form (the changelog
 * family's discipline; the key column projects back in that form).
 * Plain projection items may reference only the partition key, the
 * event-time column and the registered rowId (the columns the
 * over-window state carries). Frames: `ROWS BETWEEN n PRECEDING AND
 * CURRENT ROW`, `RANGE BETWEEN INTERVAL 'x' <unit> PRECEDING AND
 * CURRENT ROW`, `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`
 * (running, ties split by rowId), `RANGE BETWEEN UNBOUNDED PRECEDING
 * AND CURRENT ROW` or frame omitted (SQL's default — running WITH peer
 * rows included). The event-time projection emits at the operator's
 * millisecond granularity (the watermark unit).
 *
 * Group-window grammar (the reference's streaming SQL group windows —
 * see [[groupWindow]]): `SELECT <keys…, TUMBLE_START/END(ts, …),
 * aggs…> FROM S [WHERE p] GROUP BY TUMBLE|HOP|SESSION(ts, INTERVAL …)
 * [, key…] [HAVING q]`, routed onto [[StreamOps.tumbleAgg]]/
 * [[StreamOps.hopAgg]]/[[StreamOps.sessionAgg]] (HOP keeps Flink's
 * (time, slide, size) argument order).
 *
 * Interval-join grammar: `SELECT <items> FROM A [AS a]
 * [INNER|LEFT|RIGHT|FULL [OUTER]] JOIN B [AS b] ON a.k = b.k AND
 * <time bound> [AND <residual>…]` — both views registered streams with
 * DISJOINT column names (qualifiers are stripped after the rewrite);
 * the time bound must relate the two registered event-time columns so
 * the state both sides buffer is watermark-evictable (Spark rejects an
 * outer variant without one; the route rejects it for inner too —
 * an unbounded-state stream join over append inputs is the changelog
 * family's job, not an interval join).
 *
 * Temporal grammar: `SELECT <items> FROM P [AS p] [LEFT] JOIN V
 * FOR SYSTEM_TIME AS OF p.<ts> ON p.k = v.k [AND p.k2 = v.k2…]
 * [AND <residual>…] [AS v]` — multiple key equalities form a COMPOSITE
 * key (the changelog joins' packed-struct discipline; the reference's
 * temporal join keys on the versioned table's possibly-composite
 * primary key), and any other conjunct is a RESIDUAL evaluated on the
 * matched pair AFTER the version lookup, exactly the reference's
 * generated joinCondition in TemporalRowTimeJoinOperator: a failing
 * residual does not fall back to an earlier version — INNER drops the
 * probe, LEFT null-pads the version side. V must declare
 * its version order at registration (`rowId`, the tiebreak among
 * equal-timestamp versions); the AS OF expression must be P's declared
 * event-time column (row-time temporal join; an unregistered probe
 * falls through to [[SqlFrontend]]'s batch snapshot route). Projection
 * items are alias-qualified; the probe view's watermark delay governs
 * the unioned watermark domain. Payloads cross the generic operator as
 * canonical JSON of each view's schema (one serialize per record —
 * StreamSql's documented transport; hot pipelines use the typed Scala
 * API).
 *
 * The rewrites are metadata-only: everything downstream is the
 * operators' normal one-exchange keyed-state path (interval joins are
 * Spark's own StreamingSymmetricHashJoin with watermark-bounded state),
 * so SQL entry adds no shuffle at any scale.
 */
object StreamSqlTime {

  private type Ts = java.sql.Timestamp

  private[streaming] val overRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s*$")

  // the optional probe alias must NOT swallow the join keywords: without
  // the lookahead, `FROM P LEFT JOIN V FOR SYSTEM_TIME …` with no probe
  // alias parses alias='LEFT' and the LEFT group stays null — a
  // documented LEFT temporal join silently running as INNER (the same
  // guard joinRe carries); the version alias gets the ON guard likewise
  private[streaming] val temporalRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!LEFT\\b|JOIN\\b)(\\w+))?" +
    "\\s+(LEFT\\s+(?:OUTER\\s+)?)?JOIN\\s+(\\w+)\\s+FOR\\s+SYSTEM_TIME" +
    "\\s+AS\\s+OF\\s+([\\w.]+)(?:\\s+(?:AS\\s+)?(?!ON\\b)(\\w+))?\\s+ON\\s+(.+?)\\s*$")

  /** `AGG(v) OVER (PARTITION BY g ORDER BY <order list + frame>) AS a` —
    * the order-list/frame split happens in [[frameRe]] (regex greediness
    * would otherwise make the boundary ambiguous). */
  private val overItemRe = java.util.regex.Pattern.compile(
    "(?is)^(SUM|COUNT|MIN|MAX|AVG|FIRST_VALUE|LAST_VALUE|LAG|LEAD)" +
    "\\s*\\(\\s*(.+?)\\s*\\)\\s+OVER\\s*\\(\\s*" +
    "PARTITION\\s+BY\\s+(.+?)\\s+ORDER\\s+BY\\s+(.+?)\\s*\\)\\s+(?:AS\\s+)?(\\w+)\\s*$")

  private val frameRe = java.util.regex.Pattern.compile(
    "(?is)^(.*?)\\s*(?:(ROWS|RANGE)\\s+BETWEEN\\s+(?:(UNBOUNDED)|(\\d+)|" +
    "INTERVAL\\s+'(\\d+)'\\s+(\\w+))\\s+PRECEDING\\s+AND\\s+CURRENT\\s+ROW)?\\s*$")

  private def unitMs(n: Long, unit: String): Long = unit.toUpperCase match {
    case "SECOND" | "SECONDS" => n * 1000L
    case "MINUTE" | "MINUTES" => n * 60000L
    case "HOUR" | "HOURS" => n * 3600000L
    case "DAY" | "DAYS" => n * 86400000L
    case u => throw new IllegalArgumentException(
      s"unsupported RANGE frame unit '$u' (SECOND/MINUTE/HOUR/DAY)")
  }

  // ---- GROUP BY TUMBLE/HOP/SESSION → StreamOps group-window aggs ------

  // same SELECT/FROM/WHERE/GROUP BY/HAVING shape as the changelog
  // aggregate routes; dispatched (maybeSql) only when the FROM target is
  // a registered STREAM view and the GROUP BY list carries a window fn
  private[streaming] val groupWinRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!WHERE\\b|GROUP\\b)(\\w+))?" +
    "(?:\\s+WHERE\\s+(.+?))?\\s+GROUP\\s+BY\\s+(.+?)" +
    "(?:\\s+HAVING\\s+(.+?))?\\s*$")

  private[streaming] def hasGroupWindow(groupByList: String): Boolean =
    java.util.regex.Pattern.compile("(?i)\\b(TUMBLE|HOP|SESSION)\\s*\\(")
      .matcher(groupByList).find()

  private val winPartRe = "(?is)^(TUMBLE|HOP|SESSION)\\s*\\((.+)\\)$".r
  private val accessorRe =
    "(?is)^(TUMBLE|HOP|SESSION)_(START|END)\\s*\\((.+)\\)\\s+(?:AS\\s+)?(\\w+)$".r
  private val gwAggRe =
    "(?is)^(SUM|COUNT|MIN|MAX|AVG)\\s*\\(\\s*(.+?)\\s*\\)\\s+(?:AS\\s+)?(\\w+)$".r
  private val ivLitRe = "(?is)^INTERVAL\\s+'(\\d+)'\\s+(\\w+)$".r

  private def ivStr(s: String): String = s.trim match {
    case ivLitRe(n, u) => s"$n ${u.toLowerCase}"
    case other => throw new IllegalArgumentException(
      s"expected INTERVAL '<n>' <unit>: $other")
  }

  /** A dynamic SESSION gap expression as the Column
    * [[StreamOps.dynamicSessionAgg]] needs. Spark's SessionWindowing
    * rule accepts a per-row gap only as a duration STRING or a
    * CalendarInterval — an INTERVAL literal inside the expression
    * (e.g. `CASE … THEN INTERVAL '60' MINUTE`) is DayTimeIntervalType,
    * which the rule rejects — so that case is normalized here: the
    * interval lands on the epoch and the epoch's own unix_micros is
    * subtracted back out (`unix_micros(epoch + gap) −
    * unix_micros(epoch)` — exact integer micros for ANY day-time unit,
    * and SESSION-TIMEZONE-PROOF: the zone offset on the epoch literal
    * appears in both terms and cancels), feeding `make_interval` as
    * decimal seconds. Anything non-duration-shaped fails loudly with
    * the supported forms. */
  private def sessionGapCol(df: DataFrame, gapText: String): Column = {
    val c = try expr(gapText) catch { case e: Exception =>
      throw new IllegalArgumentException(
        s"SESSION gap is neither an INTERVAL literal nor a parsable " +
        s"expression: $gapText", e)
    }
    val dt = try df.select(c).schema.head.dataType
    catch { case e: org.apache.spark.sql.AnalysisException =>
      throw new IllegalArgumentException(
        s"SESSION gap expression does not resolve against the stream " +
        s"view's columns: $gapText", e)
    }
    import org.apache.spark.sql.types.{StringType, DayTimeIntervalType,
      CalendarIntervalType}
    dt match {
      case StringType | CalendarIntervalType => c
      case _: DayTimeIntervalType =>
        // a DIFFERENCE of two unix_micros, so the session timezone's
        // offset on the epoch literal cancels — a bare
        // unix_micros(epoch + gap) would shift the gap by the zone
        // offset (negative gaps silently drop every row)
        expr(s"make_interval(0, 0, 0, 0, 0, 0, CAST((" +
             s"unix_micros(TIMESTAMP '1970-01-01 00:00:00' + ($gapText)) - " +
             s"unix_micros(TIMESTAMP '1970-01-01 00:00:00'))" +
             s" / 1000000.0 AS DECIMAL(18, 6)))")
      case other => throw new IllegalArgumentException(
        s"SESSION gap expression must produce a duration string, an " +
        s"INTERVAL, or a CalendarInterval per row (got " +
        s"${other.simpleString}): $gapText")
    }
  }

  /**
   * `SELECT <items> FROM S [WHERE p] GROUP BY TUMBLE(ts, INTERVAL …)
   * [, <key expr>…] [HAVING q]` (and HOP/SESSION) over a registered
   * APPEND stream view — the reference's streaming SQL group windows
   * (FlinkSqlOperatorTable TUMBLE/HOP/SESSION + the *_START/_END
   * auxiliary accessors, planned by LogicalWindowAggregateRuleBase into
   * StreamExecGroupWindowAggregate, flink-table-planner-blink/.../
   * physical/stream/StreamExecGroupWindowAggregate.scala). Routed onto
   * [[StreamOps.tumbleAgg]]/[[StreamOps.hopAgg]]/[[StreamOps.sessionAgg]]
   * — Spark's native watermarked window aggregation, so the output is a
   * plain APPEND stream (windows finalize behind the watermark) and the
   * rewrite is metadata-only: one exchange on (keys, window), partial
   * aggregation map-side, any scalar group-key expressions and any mix
   * of SUM/COUNT/MIN/MAX/AVG aggregates (all Catalyst-native — no typed
   * transport, so keys are fully generic here). Flink argument order is
   * preserved: HOP(ts, slide, size). `*_START/_END` accessors must match
   * the window kind and project `window.start`/`window.end`; HAVING
   * filters the finalized windows (an append-stream filter — stateless).
   * SESSION additionally accepts a per-row gap EXPRESSION in place of
   * the INTERVAL literal (`SESSION(ts, CASE WHEN … THEN INTERVAL '60'
   * MINUTE ELSE … END)`) — the reference's dynamic-gap session assigner
   * (DynamicEventTimeSessionWindows + SessionWindowTimeGapExtractor),
   * routed to [[StreamOps.dynamicSessionAgg]]; rows whose gap is ≤ 0 or
   * null are dropped (both engines' documented extractor contract).
   */
  private[streaming] def groupWindow(spark: SparkSession,
                                     m: java.util.regex.Matcher): DataFrame = {
    val (sel, vName, vAlias0, whereCl, groupBy, having) =
      (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5), m.group(6))
    val v = StreamSql.streamView(vName).get
    val quals = Seq(vAlias0, vName)
    import StreamSql.{norm, strip, itemAlias}

    // GROUP BY list: exactly one window fn + any scalar key expressions
    val gbParts = SqlFrontend.splitTop(strip(groupBy, quals))
    val (winParts, keyExprs) = gbParts.partition {
      case winPartRe(_, _) => true
      case _ => false
    }
    require(winParts.length == 1,
      s"group-window GROUP BY needs exactly one TUMBLE/HOP/SESSION " +
      s"window: $groupBy")
    val (kind, winArgs) = winParts.head match {
      case winPartRe(k, a) => (k.toUpperCase, SqlFrontend.splitTop(a))
    }
    require(norm(winArgs.head) == norm(v.tsCol),
      s"the group window must be over the registered event-time column " +
      s"'${v.tsCol}': ${winParts.head}")

    val vdf0 = Option(whereCl)
      .map(w => v.df.filter(expr(strip(w, quals)))).getOrElse(v.df)
    // derive key columns so the aggregate's grouping names are stable
    val vdf = keyExprs.zipWithIndex.foldLeft(vdf0) { case (d, (e, i)) =>
      d.withColumn(s"__gw$i", expr(e))
    }
    val keyCols = keyExprs.indices.map(i => col(s"__gw$i"))

    // SELECT items → output slots (statement order)
    val normKeys = keyExprs.map(norm)
    sealed trait Slot
    case class KeySlot(i: Int, alias: String) extends Slot
    case class AccSlot(end: Boolean, alias: String) extends Slot
    case class AggSlot(j: Int, alias: String) extends Slot
    val aggCols = scala.collection.mutable.ArrayBuffer.empty[Column]
    val slots = SqlFrontend.splitTop(sel).map(strip(_, quals)).map {
      case accessorRe(fam, se, args, alias) =>
        require(fam.equalsIgnoreCase(kind),
          s"${fam.toUpperCase}_${se.toUpperCase} does not match the " +
          s"statement's $kind window")
        require(norm(SqlFrontend.splitTop(args).head) == norm(v.tsCol),
          s"window accessor must reference the event-time column " +
          s"'${v.tsCol}': $args")
        AccSlot(se.equalsIgnoreCase("END"), alias)
      case item @ gwAggRe(fn, arg, alias) =>
        require(!arg.matches("(?is)^DISTINCT\\b.*"),
          s"streaming group windows do not support DISTINCT aggregates " +
          s"(Spark's append-mode window aggregation restriction): $item")
        val c = fn.toUpperCase match {
          case "COUNT" if arg.trim == "*" => count(lit(1))
          case "COUNT" => count(expr(arg))
          case "SUM" => sum(expr(arg))
          case "MIN" => min(expr(arg))
          case "MAX" => max(expr(arg))
          case _ => avg(expr(arg))
        }
        aggCols += c.as(s"__a${aggCols.length}")
        AggSlot(aggCols.length - 1, alias)
      case item =>
        val (e, alias) = itemAlias(item)
        val i = normKeys.indexOf(norm(e))
        require(i >= 0,
          s"group-window projection item '$item' is neither a GROUP BY " +
          "key expression, a window *_START/_END accessor, nor a " +
          "supported aggregate (SUM/COUNT/MIN/MAX/AVG)")
        KeySlot(i, alias)
    }
    require(aggCols.nonEmpty,
      s"group-window statement needs at least one aggregate: $sel")

    val agged = kind match {
      case "TUMBLE" =>
        require(winArgs.length == 2,
          s"TUMBLE(ts, INTERVAL '<n>' <unit>): ${winParts.head}")
        StreamOps.tumbleAgg(vdf, v.tsCol, ivStr(winArgs(1)), v.delay,
          keyCols, aggCols.toSeq)
      case "HOP" =>
        require(winArgs.length == 3,
          s"HOP(ts, INTERVAL slide, INTERVAL size): ${winParts.head}")
        // Flink order (time, slide, size); StreamOps/Spark take
        // (size, slide)
        StreamOps.hopAgg(vdf, v.tsCol, ivStr(winArgs(2)), ivStr(winArgs(1)),
          v.delay, keyCols, aggCols.toSeq)
      case _ =>
        require(winArgs.length >= 2,
          s"SESSION(ts, <gap>): ${winParts.head}")
        // SESSION's gap may be an INTERVAL literal (the static assigner)
        // or any per-row EXPRESSION — the reference's dynamic-gap session
        // assigner (STREAM/api/windowing/assigners/
        // DynamicEventTimeSessionWindows.java takes a
        // SessionWindowTimeGapExtractor); re-joined on ',' so gap
        // expressions carrying top-level function commas parse
        val gapText = winArgs.tail.mkString(", ").trim
        gapText match {
          case ivLitRe(_, _) =>
            StreamOps.sessionAgg(vdf, v.tsCol, ivStr(gapText), v.delay,
              keyCols, aggCols.toSeq)
          case _ =>
            StreamOps.dynamicSessionAgg(vdf, v.tsCol,
              sessionGapCol(vdf, strip(gapText, quals)), v.delay,
              keyCols, aggCols.toSeq)
        }
    }
    val out = agged.select(slots.map {
      case KeySlot(i, alias) => col(s"__gw$i").as(alias)
      case AccSlot(end, alias) =>
        (if (end) col("w.end") else col("w.start")).as(alias)
      case AggSlot(j, alias) => col(s"__a$j").as(alias)
    }: _*)
    Option(having).map(h => out.filter(expr(strip(h, quals)))).getOrElse(out)
  }

  // ---- AGG(v) OVER (PARTITION BY … ORDER BY ts) → OverWindow.overAgg ----

  private[streaming] def over(spark: SparkSession,
                              m: java.util.regex.Matcher,
                              ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (sel, vName, vAlias0) = (m.group(1), m.group(2), m.group(3))
    val v = StreamSql.streamView(vName).get
    val quals = Seq(vAlias0, vName)
    import StreamSql.{norm, strip, itemAlias}
    import scala.reflect.runtime.universe.TypeTag

    val items = SqlFrontend.splitTop(sel).map(strip(_, quals))
    // every OVER aggregate in the statement: (fn, arg, partition expr,
    // order+frame text, alias) — they must all share ONE window spec
    // (one state buffer serving N folds, the aggregateChangelogMulti
    // architecture applied to over-windows)
    val aggItems = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, String, String)]
    // output projection in statement item order; Left(j) marks the j-th
    // aggregate's slot, Right marks a plain (state-column) item
    val slots = scala.collection.mutable.ArrayBuffer
      .empty[Either[Int, (String, String)]]
    items.foreach { item =>
      val ma = overItemRe.matcher(item)
      if (ma.matches()) {
        aggItems += ((ma.group(1).toUpperCase, ma.group(2).trim,
                      ma.group(3).trim, ma.group(4).trim, ma.group(5)))
        slots += Left(aggItems.length - 1)
      } else slots += Right(itemAlias(item))
    }
    require(aggItems.nonEmpty, s"no supported OVER aggregate " +
      s"(SUM/COUNT/MIN/MAX/AVG/FIRST_VALUE/LAST_VALUE/LAG/LEAD) in: $sel")
    val (gExpr, orderAndFrame) = (aggItems.head._3, aggItems.head._4)
    aggItems.foreach { case (fn, _, g, of, _) =>
      require(norm(g) == norm(gExpr) && norm(of) == norm(orderAndFrame),
        s"all OVER aggregates in one statement must share one window " +
        s"spec (PARTITION BY / ORDER BY / frame): " +
        s"'$gExpr ... $orderAndFrame' vs '$g ... $of' ($fn)")
    }
    val offsetFns = Set("LAG", "LEAD")
    val isOffset = aggItems.exists(i => offsetFns(i._1))
    require(!isOffset || aggItems.length == 1,
      "LAG/LEAD is an offset frame with its own state buffer — one per " +
      "statement, not mixable with fold aggregates (compose in the " +
      s"Scala API): $sel")

    val rowIdCol = v.rowIdCol.getOrElse(throw new IllegalArgumentException(
      s"streaming OVER aggregate over '$vName' needs its deterministic " +
      "tiebreak: registerStream(..., rowId = Some(col)) — the reference's " +
      "row-time over-windows similarly order equal-rowtime rows by a " +
      "deterministic comparator"))

    // split the ORDER BY list from the optional frame clause
    val fm = frameRe.matcher(orderAndFrame)
    require(fm.matches(), s"unparseable OVER order/frame: $orderAndFrame")
    val ordParts = SqlFrontend.splitTop(fm.group(1))
    require(norm(ordParts.head.replaceAll("(?i)\\s+ASC$", "")) ==
              norm(v.tsCol),
      s"streaming OVER must ORDER BY the registered event-time column " +
      s"'${v.tsCol}' ascending: ${fm.group(1)}")
    ordParts.tail.foreach { p =>
      require(norm(p.replaceAll("(?i)\\s+ASC$", "")) == norm(rowIdCol),
        s"OVER tiebreak must be the rowId '$rowIdCol' ascending: " +
        fm.group(1))
    }
    val frame: OverWindow.Frame =
      if (fm.group(2) == null) OverWindow.RangeUnboundedPreceding
      else (fm.group(2).toUpperCase, fm.group(3), fm.group(4), fm.group(5)) match {
        case ("ROWS", u, _, _) if u != null => OverWindow.UnboundedPreceding
        case ("RANGE", u, _, _) if u != null => OverWindow.RangeUnboundedPreceding
        case ("ROWS", _, n, _) if n != null => OverWindow.RowsPreceding(n.toInt)
        case ("RANGE", _, _, x) if x != null =>
          OverWindow.RangePreceding(unitMs(x.toLong, fm.group(6)))
        case other => throw new IllegalArgumentException(
          s"unsupported OVER frame: $orderAndFrame")
      }
    require(!isOffset || fm.group(2) == null,
      s"LAG/LEAD is a navigation function — it takes no frame clause: " +
      s"$orderAndFrame")

    // per-aggregate operand + AggFn; COUNT routes the row-count form
    // only (COUNT(expr) null-skipping needs the Scala API's own fold)
    val fns: Seq[OverWindow.AggFn] = aggItems.toSeq.map { case (fn, arg, _, _, _) =>
      if (fn == "COUNT")
        require(arg == "*",
          s"streaming OVER COUNT supports COUNT(*) only (COUNT(<expr>) " +
          s"null-skipping: use OverWindow.overAgg with a custom FoldAgg): $sel")
      else require(arg != "*" && !arg.matches("(?is)^DISTINCT\\b.*"),
        s"$fn(*) / DISTINCT aggregates are not over-window folds: $sel")
      fn match {
        case "SUM" => OverWindow.FnSum
        case "COUNT" => OverWindow.FnCount
        case "MIN" => OverWindow.FnMin
        case "MAX" => OverWindow.FnMax
        case "AVG" => OverWindow.FnAvg
        case "FIRST_VALUE" => OverWindow.FnFirst
        case "LAST_VALUE" => OverWindow.FnLast
        case other => OverWindow.FnSum // LAG/LEAD: unused (offset path)
      }
    }

    // keys are GENERIC (the changelog-family discipline): integral
    // expressions key state as Long; everything else — string/date/
    // decimal keys — as the expression's canonical STRING form, exact
    // for any one type. The key column projects back in that canonical
    // form (strings round-trip unchanged).
    val integral = StreamSql.isIntegralKey(v.df, gExpr)

    // plain items may reference only the state's columns: partition
    // key, event-time column, rowId
    val (ng, nts, nid) = (norm(gExpr), norm(v.tsCol), norm(rowIdCol))
    def plainCol(e: String, alias: String) = norm(e) match {
      case `ng` => col("__k").as(alias)
      // the operator's event-time unit is the watermark millisecond:
      // the projection restores a TIMESTAMP at ms granularity
      case `nts` => timestamp_millis(col("__t")).as(alias)
      case `nid` => col("__i").as(alias)
      case _ => throw new IllegalArgumentException(
        s"OVER projection may reference only the partition key, the " +
        s"event-time column and the rowId (the over-window state's " +
        s"columns): $e")
    }

    // null guards BEFORE the typed boundary: a null partition key forms
    // its own group in SQL OVER (PARTITION BY groups nulls together) and
    // a null rowId has no slot in the total order — neither is modeled
    // by the typed transport, so both raise a clear plan-shaped error
    // instead of an opaque null-in-non-nullable-field encoder failure
    // (the changelog routes' nullKeyGuard discipline)
    def guard(df: DataFrame): DataFrame = Seq(
      ("__g", "partition key (a NULL key is its own OVER group, which " +
        "the keyed operator does not model — coalesce it in the view)"),
      ("__i", "rowId (the deterministic tiebreak must be total — " +
        "filter or coalesce NULL ids in the view)")).foldLeft(df) {
      case (d, (c, why)) => d.filter(expr(
        s"`$c` IS NOT NULL OR raise_error('streaming OVER: NULL $why')"))
    }

    val out: DataFrame = if (isOffset) {
      val (fn, arg, _, _, _) = aggItems.head
      val args = SqlFrontend.splitTop(arg)
      require(args.length <= 2,
        s"$fn(expr[, offset]) — the 3-argument default-value form is " +
        s"unsupported (NULL default only): $arg")
      val off = if (args.length == 2) args(1).trim.toInt else 1
      def run[K: TypeTag](cast: String): DataFrame = {
        implicit val evEnc: Encoder[(K, Ts, Long, Double)] = ExpressionEncoder()
        implicit val keyEnc: Encoder[K] = ExpressionEncoder()
        implicit val se: Encoder[(Seq[(K, Ts, Long, Double)],
                                  Seq[(K, Ts, Long, Double)], Long)] =
          ExpressionEncoder()
        implicit val oe: Encoder[(K, Long, Long, Option[Double])] =
          ExpressionEncoder()
        val base = guard(v.df
            .withColumn("__g", expr(gExpr).cast(cast))
            .withColumn("__v", expr(args.head).cast("double"))
            .select(col("__g"), col(v.tsCol).as("__ts"),
                    col(rowIdCol).cast("long").as("__i"), col("__v")))
          .withWatermark("__ts", v.delay)
          .as[(K, Ts, Long, Double)]
        OverWindow.overOffset[K, (K, Ts, Long, Double)](
          base.groupByKey(_._1), _._2.getTime, _._3, _._4, _._4,
          off, lead = fn == "LEAD", ttl = ttl)
          .toDF("__k", "__t", "__i", "__v")
      }
      if (integral) run[Long]("long") else run[String]("string")
    } else {
      def run[K: TypeTag](cast: String): DataFrame = {
        implicit val evEnc: Encoder[(K, Ts, Long, Seq[Double])] = ExpressionEncoder()
        implicit val keyEnc: Encoder[K] = ExpressionEncoder()
        implicit val se: Encoder[(Seq[(K, Ts, Long, Seq[Double])],
                                  Seq[(K, Ts, Long, Seq[Double])],
                                  Seq[(Double, Long)], Long)] =
          ExpressionEncoder()
        implicit val oe: Encoder[(K, Long, Long, Seq[Double])] =
          ExpressionEncoder()
        val operands = array(aggItems.toSeq.map { case (fn, arg, _, _, _) =>
          (if (fn == "COUNT") lit(0.0) else expr(arg)).cast("double")
        }: _*)
        val base = guard(v.df
            .withColumn("__g", expr(gExpr).cast(cast))
            .withColumn("__vs", operands)
            .select(col("__g"), col(v.tsCol).as("__ts"),
                    col(rowIdCol).cast("long").as("__i"), col("__vs")))
          .withWatermark("__ts", v.delay)
          .as[(K, Ts, Long, Seq[Double])]
        OverWindow.overAggMulti[K, (K, Ts, Long, Seq[Double])](
          base.groupByKey(_._1), _._2.getTime, _._3,
          sortVal = _._4.headOption.getOrElse(0.0), fns, _._4, frame, ttl)
          .toDF("__k", "__t", "__i", "__vs")
      }
      if (integral) run[Long]("long") else run[String]("string")
    }
    out.select(slots.toSeq.map {
      case Right((e, alias)) => plainCol(e, alias)
      case Left(j) if isOffset =>
        col("__v").as(aggItems(j)._5)
      case Left(j) =>
        val c = col("__vs").getItem(j)
        (if (aggItems(j)._1 == "COUNT") c.cast("long") else c)
          .as(aggItems(j)._5)
    }: _*)
  }

  // ---- key equality + ts bound join → watermarked interval join --------

  private[streaming] def interval(spark: SparkSession,
                                  m: java.util.regex.Matcher): DataFrame = {
    val (sel, lName, lAlias0, jt0, rName, rAlias0, onClause) =
      (m.group(1), m.group(2), m.group(3), m.group(4),
       m.group(5), m.group(6), m.group(7))
    val lv = StreamSql.streamView(lName).get
    val rv = StreamSql.streamView(rName).getOrElse(
      throw new IllegalArgumentException(
        s"interval JOIN over unregistered view '$rName' — both sides of " +
        "a streaming interval join must be registered stream views " +
        "(registerStream); an updating side is the changelog join's job"))
    val lAlias = Option(lAlias0).getOrElse(lName)
    val rAlias = Option(rAlias0).getOrElse(rName)
    require(!lName.equalsIgnoreCase(rName),
      s"streaming self-join on '$lName': register the view a second " +
      "time under a different name")
    val lQuals = Set(lAlias.toLowerCase, lName.toLowerCase)
    val rQuals = Set(rAlias.toLowerCase, rName.toLowerCase)
    require((lQuals & rQuals).isEmpty,
      s"interval JOIN qualifiers must be disjoint between sides: " +
      s"{$lAlias, $lName} vs {$rAlias, $rName}")
    val shared = lv.df.columns.toSet & rv.df.columns.toSet
    require(shared.isEmpty,
      s"interval-join views must have DISJOINT column names (qualifiers " +
      s"are stripped after the rewrite): shared ${shared.mkString(", ")}")
    val jt = Option(jt0).map(_.toUpperCase).getOrElse("INNER") match {
      case "INNER" => "inner"
      case "LEFT" => "leftOuter"
      case "RIGHT" => "rightOuter"
      case _ => "fullOuter"
    }

    import StreamSql.{splitAnd, strip}
    val conj = splitAnd(onClause)
    val qual = "(\\w+)\\.(\\w+)"
    val eqRe = s"(?s)^$qual\\s*=\\s*$qual$$".r
    def isL(q: String) = lQuals.contains(q.toLowerCase)
    def isR(q: String) = rQuals.contains(q.toLowerCase)
    val hasKeyEq = conj.exists {
      case eqRe(q1, _, q2, _) => (isL(q1) && isR(q2)) || (isR(q1) && isL(q2))
      case _ => false
    }
    require(hasKeyEq,
      s"interval JOIN needs a <left>.k = <right>.k equality: $onClause")
    // a time bound relating the two event-time columns makes the
    // buffered state watermark-evictable. SHAPE-validated, not word
    // containment: Spark derives state eviction only from a range — a
    // BETWEEN over the two event-time columns, or a conjunct pair
    // bounding their difference in both directions. A one-sided bound
    // (a.ts >= b.ts alone) or a non-range expression (abs(a.ts - b.ts)
    // < x) mentions both columns but leaves state unbounded, so this
    // route refuses to plan it.
    def word(s: String, w: String) =
      s.matches("(?is).*\\b" + java.util.regex.Pattern.quote(w) + "\\b.*")
    val betweenRe = "(?is)^(.+?)\\s+BETWEEN\\s+(.+?)\\s+AND\\s+(.+)$".r
    val ineqRe = "(?s)^(.+?)\\s*(<=|>=|<|>)\\s*(.+)$".r
    // mentions exactly one of the two event-time columns
    def tsSide(e: String): Option[Boolean] =
      (word(e, lv.tsCol), word(e, rv.tsCol)) match {
        case (true, false) => Some(true)   // left ts
        case (false, true) => Some(false)  // right ts
        case _ => None
      }
    var hasLower = false // r.ts >= l.ts - δ (difference bounded below)
    var hasUpper = false // r.ts <= l.ts + δ (difference bounded above)
    conj.foreach { c =>
      strip(c, Seq(lAlias, lName, rAlias, rName)) match {
        case betweenRe(x, lo, hi) =>
          (tsSide(x), tsSide(lo), tsSide(hi)) match {
            case (Some(a), Some(b), Some(c2)) if b != a && c2 != a =>
              hasLower = true; hasUpper = true
            case _ => ()
          }
        case ineqRe(e1, op, e2) =>
          (tsSide(e1), tsSide(e2)) match {
            case (Some(s1), Some(s2)) if s1 != s2 =>
              // normalize to a bound on (r.ts − l.ts): `right ≤ left…`
              // is an upper bound, `right ≥ left…` a lower; flip when
              // the left event-time column leads the comparison
              val rightLeads = !s1
              val le = op == "<=" || op == "<"
              if (rightLeads == le) hasUpper = true else hasLower = true
            case _ => ()
          }
        case _ => ()
      }
    }
    require(hasLower && hasUpper,
      s"interval JOIN needs a two-sided time bound between '${lv.tsCol}' " +
      s"and '${rv.tsCol}' (a BETWEEN, or a conjunct pair bounding the " +
      "difference in both directions) so state stays watermark-evictable" +
      s": $onClause")

    val quals = Seq(lAlias, lName, rAlias, rName)
    val l = lv.df.withWatermark(lv.tsCol, lv.delay)
    val r = rv.df.withWatermark(rv.tsCol, rv.delay)
    val joined = l.join(r, expr(strip(onClause, quals)), jt)
    val items = SqlFrontend.splitTop(sel).map(strip(_, quals))
    if (items == Seq("*")) joined else joined.selectExpr(items: _*)
  }

  // ---- FOR SYSTEM_TIME AS OF on streams → TemporalJoin.streamAsOf ------

  private[streaming] def temporal(spark: SparkSession,
                                  m: java.util.regex.Matcher): DataFrame = {
    val (sel, pName, pAlias0, leftJoin, vName, ofExpr, vAlias0, onClause) =
      (m.group(1), m.group(2), m.group(3), m.group(4) != null,
       m.group(5), m.group(6), m.group(7), m.group(8))
    val pv = StreamSql.streamView(pName).get
    val vv = StreamSql.streamView(vName).getOrElse(
      throw new IllegalArgumentException(
        s"streaming FOR SYSTEM_TIME over unregistered view '$vName' — " +
        "the version side of a row-time temporal join must be a " +
        "registered stream view (a static version table is the batch " +
        "snapshot route / LookupJoin)"))
    val pAlias = Option(pAlias0).getOrElse(pName)
    val vAlias = Option(vAlias0).getOrElse(vName)
    require(!pName.equalsIgnoreCase(vName),
      s"temporal self-join on '$pName': register the view a second time " +
      "under a different name")
    val pQuals = Set(pAlias.toLowerCase, pName.toLowerCase)
    val vQuals = Set(vAlias.toLowerCase, vName.toLowerCase)
    require((pQuals & vQuals).isEmpty,
      s"temporal JOIN qualifiers must be disjoint between sides: " +
      s"{$pAlias, $pName} vs {$vAlias, $vName}")
    import StreamSql.{norm, strip}
    // statement-shape validation first, registration gaps second: the
    // AS OF expression defines the join's semantics
    require(norm(strip(ofExpr, pQuals.toSeq)) == norm(pv.tsCol),
      s"FOR SYSTEM_TIME AS OF must reference the probe's registered " +
      s"event-time column '${pv.tsCol}': $ofExpr")
    val vOrd = vv.rowIdCol.getOrElse(throw new IllegalArgumentException(
      s"streaming temporal join over '$vName' needs its version order: " +
      "registerStream(..., rowId = Some(col)) — the tiebreak among " +
      "equal-timestamp versions, the reference's rowtime comparator"))

    // ON: one or more cross-side key equalities (multiple form a
    // COMPOSITE key — the changelog joins' packed-struct discipline;
    // the reference's temporal join similarly keys on the versioned
    // table's possibly-composite primary key). Any OTHER conjunct is a
    // RESIDUAL, applied to the matched pair after the version lookup.
    val conj = StreamSql.splitAnd(onClause)
    val qual = "(\\w+)\\.(\\w+)"
    val eqRe = s"(?s)^$qual\\s*=\\s*$qual$$".r
    def isP(q: String) = pQuals.contains(q.toLowerCase)
    def isV(q: String) = vQuals.contains(q.toLowerCase)
    val keyPairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val residuals = scala.collection.mutable.ArrayBuffer.empty[String]
    conj.foreach {
      case c @ eqRe(q1, c1, q2, c2)
          if (isP(q1) && isV(q2)) || (isV(q1) && isP(q2)) =>
        if (isP(q1)) keyPairs += ((c1, c2)) else keyPairs += ((c2, c1))
        val _ = c
      case resid => residuals += resid
    }
    require(keyPairs.nonEmpty,
      s"temporal JOIN needs a <probe>.k = <version>.k equality: $onClause")
    // the typed transport tuples key on Long — non-integral keys must
    // fail at plan time, not as an opaque null-encoder error mid-query
    val pPayload = pv.df.columns.toSeq
    val vPayload = vv.df.columns.toSeq
    // SQL null-equality discipline (nullKeyGuard): a null-keyed VERSION
    // row can never match — filtered; a null-keyed PROBE would change a
    // LEFT join's output (null-padded emission the keyed operator does
    // not model) — raised loudly there, filtered under INNER; a null
    // version ORDER has no slot in the version total order — raised
    val pGuarded = keyPairs.foldLeft(pv.df)((d, p) =>
      StreamSql.nullKeyGuard(d, p._1, affectsOutput = leftJoin,
        "temporal JOIN"))
    val vGuarded = keyPairs.foldLeft(vv.df)((d, p) =>
      StreamSql.nullKeyGuard(d, p._2, affectsOutput = false,
        "temporal JOIN")).filter(expr(
      s"`$vOrd` IS NOT NULL OR raise_error('streaming temporal JOIN: " +
      "NULL version rowId (the version order must be total — filter or " +
      "coalesce it in the view)')"))
    // keys are GENERIC across both sides (the changelog joins'
    // cross-side discipline, StreamSql.joinKeyEnc): both integral →
    // Long state keys (bit-identical to the classic path); same type →
    // that type's canonical string; mixed numerics → double-normalized
    // string; anything else rejected with the derive-a-common-key hint
    def run[K: scala.reflect.runtime.universe.TypeTag](
        pKeyC: Column, vKeyC: Column): DataFrame = {
      implicit val keyE: Encoder[K] = ExpressionEncoder()
      implicit val pe: Encoder[(K, Ts, Changelog.Bin)] = ExpressionEncoder()
      implicit val ve: Encoder[(K, Ts, Long, Changelog.Bin)] = ExpressionEncoder()
      implicit val tagE: Encoder[TemporalJoin.TaggedK[
        K, (K, Ts, Changelog.Bin), (K, Ts, Long, Changelog.Bin)]] = ExpressionEncoder()
      implicit val stE: Encoder[TemporalJoin.TJState[
        (K, Ts, Changelog.Bin), (K, Ts, Long, Changelog.Bin)]] = ExpressionEncoder()
      implicit val outE: Encoder[((K, Ts, Changelog.Bin),
        Option[(K, Ts, Long, Changelog.Bin)])] = ExpressionEncoder()
      val probes = pGuarded.select(pKeyC, col(pv.tsCol),
          Changelog.packPayload(pPayload)).as[(K, Ts, Changelog.Bin)]
      val vers = vGuarded.select(vKeyC, col(vv.tsCol),
          col(vOrd).cast("long"),
          Changelog.packPayload(vPayload)).as[(K, Ts, Long, Changelog.Bin)]
      TemporalJoin.streamAsOfKeyed[K, (K, Ts, Changelog.Bin), (K, Ts, Long, Changelog.Bin)](
        probes, vers,
        _._1, _._1, _._2, _._2, _._3, pv.delay).toDF()
    }
    val j0 =
      if (keyPairs.length == 1) {
        val (pKey, vKey) = keyPairs.head
        StreamSql.joinKeyEnc(pGuarded, pKey, vGuarded, vKey) match {
          case StreamSql.LongKey =>
            run[Long](col(pKey).cast("long"), col(vKey).cast("long"))
          case StreamSql.StringKey(pre) =>
            def k(c: String) =
              pre.foldLeft(col(c))(_.cast(_)).cast("string")
            run[String](k(pKey), k(vKey))
        }
      } else {
        val casts = keyPairs.map { case (pc, vc) =>
          StreamSql.pairCastType(
            pGuarded.select(col(pc)).schema.head.dataType,
            vGuarded.select(col(vc)).schema.head.dataType, s"$pc = $vc")
        }
        def k(names: Seq[String]) = StreamSql.compositeKey(
          names.zip(casts).map { case (n, c) => c.foldLeft(col(n))(_.cast(_)) })
        run[String](k(keyPairs.map(_._1).toSeq), k(keyPairs.map(_._2).toSeq))
      }

    val pSchema = pv.df.schema
    val vSchema = vv.df.schema
    val filtered = if (leftJoin) j0 else j0.filter(col("_2").isNotNull)
    val decoded = filtered.select(
      Changelog.unpackPayload(col("_1._3.bytes"), pSchema).as("__l"),
      Changelog.unpackPayload(col("_2._4.bytes"), vSchema).as("__r"))
    def requal(e: String): String =
      SqlFrontend.rewriteOutsideLiterals(e)(_
        .replaceAll("(?i)\\b(" + java.util.regex.Pattern.quote(pAlias) + "|" +
          java.util.regex.Pattern.quote(pName) + ")\\s*\\.", "__l.")
        .replaceAll("(?i)\\b(" + java.util.regex.Pattern.quote(vAlias) + "|" +
          java.util.regex.Pattern.quote(vName) + ")\\s*\\.", "__r."))
    // Residual conjuncts evaluate on the MATCHED pair — the reference's
    // TemporalRowTimeJoinOperator applies its generated joinCondition
    // to the as-of version it already picked (the latest ≤ probe time),
    // with NO fallback to an earlier version on failure: INNER drops
    // the probe, LEFT null-pads the version side. SQL three-valued ON:
    // a NULL residual is NOT a match.
    val withResid = if (residuals.isEmpty) decoded else {
      val c = residuals.map(r => s"(${requal(r)})").mkString(" AND ")
      try {
        val pass = coalesce(expr(c), lit(false))
        if (leftJoin)
          decoded.withColumn("__r", when(pass, col("__r"))
            .otherwise(lit(null).cast(decoded.schema("__r").dataType)))
        else decoded.filter(pass)
      } catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"temporal JOIN residual must reference the two views' " +
          s"columns qualified by alias ('$pAlias.' / '$vAlias.'): " +
          s"${residuals.mkString(" AND ")}", e)
      }
    }
    val items = SqlFrontend.splitTop(sel)
    require(items != Seq("*"), "temporal JOIN needs explicit projection " +
      "items qualified by view alias")
    try withResid.selectExpr(items.map(requal): _*)
    catch { case e: org.apache.spark.sql.AnalysisException =>
      throw new IllegalArgumentException(
        s"temporal JOIN projection items must be qualified with a view " +
        s"alias ('$pAlias.' / '$vAlias.'): $sel", e)
    }
  }
}
