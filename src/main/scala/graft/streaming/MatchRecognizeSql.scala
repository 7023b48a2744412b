package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{count, expr, lit}

/**
 * SQL-string front-end for MATCH_RECOGNIZE (SURVEY §2.10): parses the
 * full SQL:2016 clause —
 *
 *   SELECT * FROM <table> MATCH_RECOGNIZE (
 *     PARTITION BY k1 [, k2 …]
 *     ORDER BY t1 [, t2 …]
 *     [MEASURES <expr> AS name [, …]]
 *     [ONE ROW PER MATCH | ALL ROWS PER MATCH]
 *     [AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW
 *      | SKIP TO [FIRST | LAST] <var>]
 *     PATTERN ( <regex over variables> ) [WITHIN INTERVAL 'n' UNIT]
 *     DEFINE V AS <boolean sql> [, …]
 *   )
 *
 * — into the existing engine (`MatchRecognize.annotate` /
 * `oneRowPerMatch`), the reachability the reference provides through
 * `TableEnvironment.sqlQuery` → StreamExecMatch
 * (flink-table-api-java/.../TableEnvironmentImpl.java:626,
 * flink-table-planner-blink/.../stream/StreamExecMatch.scala:68).
 *
 * Measure surface: FIRST(V.c) / LAST(V.c) / COUNT(V.*) / COUNT(*) /
 * CLASSIFIER() map to the Measures helpers; any other SQL aggregate
 * works with per-variable scoping — `sum(B.price)` rewrites to
 * `sum(CASE WHEN mr_var = 'B' THEN price END)` (FINAL semantics over
 * the match's rows, SQL-standard variable scoping). DEFINE predicates
 * evaluate on the CURRENT row (variable qualifiers resolve to the
 * current row's columns); PREV(x[, n]) / NEXT(x[, n]) navigation IS
 * supported — since row-pattern matching is strictly contiguous, they
 * rewrite to lag/lead over the partition/order window before matching
 * (see `nav` below), mirroring the cross-row accessors the reference's
 * MatchCodeGenerator generates.
 *
 * Everything downstream of the parse is the engine's normal Catalyst
 * path — DEFINE predicates become codegen'd boolean columns computed
 * before the single hash shuffle; at 100 TB the SQL entry costs nothing
 * over the Scala API.
 */
object MatchRecognizeSql {

  /** Run `SELECT * FROM <table> MATCH_RECOGNIZE (...)` against the
    * session catalog (table/view name resolved via spark.table). */
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    val m = java.util.regex.Pattern.compile(
        "(?is)^\\s*SELECT\\s+\\*\\s+FROM\\s+([\\w.]+)\\s+MATCH_RECOGNIZE\\s*\\(")
      .matcher(sqlText)
    require(m.find(),
      "expected: SELECT * FROM <table> MATCH_RECOGNIZE ( ... )")
    val body = balanced(sqlText, m.end() - 1)
    run(spark.table(m.group(1)), body)
  }

  /** Apply a `MATCH_RECOGNIZE (...)` clause (with or without the keyword
    * wrapper) to an existing DataFrame. */
  def apply(df: DataFrame, clause: String): DataFrame = {
    val t = clause.trim
    val body =
      if (t.toUpperCase.startsWith("MATCH_RECOGNIZE"))
        balanced(t, t.indexOf('('))
      else if (t.startsWith("(")) balanced(t, 0)
      else t
    run(df, body)
  }

  // ------------------------------------------------------------- internals

  /** Positions inside single-quoted SQL string literals (quotes
    * included; `''` is an escaped quote, the same convention as
    * [[graft.operators.SqlFrontend.rewriteOutsideLiterals]]). Every
    * character-level scan below consults this mask so a literal like
    * `')'` or `'...SUM(...'` never derails paren counting, section
    * splitting or aggregate-call extraction. */
  private def literalMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        val end = math.min(
          graft.operators.SqlFrontend.skipLiteral(s, i), s.length)
        java.util.Arrays.fill(mask, i, end, true)
        i = end
      } else i += 1
    }
    mask
  }

  /** Content of the parenthesized group opening at `open`. */
  private def balanced(s: String, open: Int): String =
    graft.operators.SqlFrontend.balanced(s, open)

  private val sections = Seq(
    "PARTITION BY", "ORDER BY", "MEASURES", "ONE ROW PER MATCH",
    "ALL ROWS PER MATCH", "AFTER MATCH", "PATTERN", "DEFINE")

  /** Locate top-level (paren-depth-0, outside literals) section
    * keywords in the body. */
  private def sectionSpans(body: String): Seq[(String, Int, Int)] = {
    val upper = body.toUpperCase
    val mask = literalMask(body)
    // paren depth at each position, literal-opaque
    val depthAt = new Array[Int](body.length + 1)
    var d = 0
    var j = 0
    while (j < body.length) {
      depthAt(j) = d
      if (!mask(j)) {
        if (body.charAt(j) == '(') d += 1
        else if (body.charAt(j) == ')') d -= 1
      }
      j += 1
    }
    depthAt(body.length) = d
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    for (kw <- sections) {
      var from = 0
      var idx = upper.indexOf(kw, from)
      while (idx >= 0) {
        val beforeOk = idx == 0 || !upper.charAt(idx - 1).isLetterOrDigit
        val after = idx + kw.length
        val afterOk = after >= upper.length ||
          !(upper.charAt(after).isLetterOrDigit || upper.charAt(after) == '_')
        if (depthAt(idx) == 0 && !mask(idx) && beforeOk && afterOk)
          found += ((idx, kw))
        from = idx + 1
        idx = upper.indexOf(kw, from)
      }
    }
    val sorted = found.sortBy(_._1).toSeq
    sorted.zipWithIndex.map { case ((at, kw), i) =>
      val end = if (i + 1 < sorted.length) sorted(i + 1)._1 else body.length
      (kw, at + kw.length, end)
    }
  }

  /** Split on top-level (outside-literal) commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val mask = literalMask(s)
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      if (!mask(i)) s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Rewrite `V.col` (V a pattern variable) to a per-variable-scoped SQL
    * fragment; other qualifiers (table aliases) are left alone. */
  private def scopeVars(sqlExpr: String, vars: Seq[String],
                        perRow: Boolean): String =
    graft.operators.SqlFrontend.rewriteOutsideLiterals(sqlExpr) { t =>
      vars.foldLeft(t) { (e, v) =>
        val p = s"(?i)\\b$v\\.(\\w+)"
        if (perRow) e.replaceAll(p, "$1") // DEFINE: current row's column
        else e.replaceAll(p, s"(CASE WHEN mr_var = '$v' THEN $$1 END)")
      }
    }

  private val firstRe = "(?is)^FIRST\\s*\\(\\s*(\\w+)\\s*\\.\\s*(\\w+)\\s*\\)$".r
  private val lastRe = "(?is)^LAST\\s*\\(\\s*(\\w+)\\s*\\.\\s*(\\w+)\\s*\\)$".r
  private val firstOffRe =
    "(?is)^FIRST\\s*\\(\\s*(\\w+)\\s*\\.\\s*(\\w+)\\s*,\\s*(\\d+)\\s*\\)$".r
  private val lastOffRe =
    "(?is)^LAST\\s*\\(\\s*(\\w+)\\s*\\.\\s*(\\w+)\\s*,\\s*(\\d+)\\s*\\)$".r
  private val countVarRe = "(?is)^COUNT\\s*\\(\\s*(\\w+)\\s*\\.\\s*\\*\\s*\\)$".r
  private val countAllRe = "(?is)^COUNT\\s*\\(\\s*\\*\\s*\\)$".r
  private val classifierRe = "(?is)^CLASSIFIER\\s*\\(\\s*\\)$".r

  private def measureCol(e: String, vars: Seq[String]): Column = e.trim match {
    case firstRe(v, c) => MatchRecognize.Measures.firstOf(canon(v, vars), expr(c))
    case lastRe(v, c) => MatchRecognize.Measures.lastOf(canon(v, vars), expr(c))
    case firstOffRe(v, c, n) =>
      MatchRecognize.Measures.firstOf(canon(v, vars), expr(c), n.toInt)
    case lastOffRe(v, c, n) =>
      MatchRecognize.Measures.lastOf(canon(v, vars), expr(c), n.toInt)
    case countVarRe(v) => MatchRecognize.Measures.countOf(canon(v, vars))
    case countAllRe() => count(lit(1))
    case classifierRe() => MatchRecognize.Measures.classifier
    case other => expr(scopeVars(other, vars, perRow = false))
  }

  private def canon(v: String, vars: Seq[String]): String =
    vars.find(_.equalsIgnoreCase(v)).getOrElse(
      throw new IllegalArgumentException(s"undefined pattern variable $v"))

  /** Everything a MATCH_RECOGNIZE body parses to, df-independent —
    * shared by the batch path ([[run]]) and the streaming path
    * ([[stream]]). */
  private case class Parsed(
      partitionBy: Seq[String], orderBy: Seq[String], allRows: Boolean,
      skip: MatchRecognize.Skip, pattern: String,
      within: Option[(Column, Long)], define: Seq[(String, Column)],
      rawDefs: Seq[(String, String)], measures: Seq[(String, Column)],
      rawMeasures: Seq[(String, String, Boolean)])

  private def run(df: DataFrame, body: String): DataFrame = {
    val p = parseBody(body)
    if (p.allRows) {
      val ann = MatchRecognize.annotate(df, p.partitionBy, p.orderBy,
        p.pattern, p.define, p.skip, p.within)
      withAllRowsMeasures(ann, p)
    } else
      MatchRecognize.oneRowPerMatch(df, p.partitionBy, p.orderBy, p.pattern,
        p.define, p.measures, p.skip, p.within)
  }

  // --------------------------------------- ALL ROWS PER MATCH measures

  /**
   * Per-row MEASURES over an annotated (ALL ROWS PER MATCH) result —
   * the reference evaluates measures for every visited row with RUNNING
   * semantics by default and FINAL on request
   * (flink-table-planner-blink/.../codegen/MatchCodeGenerator.scala,
   * executed by StreamExecMatch). Here each measure is a window
   * aggregate over (partition keys, mr_match) ordered by mr_seq — the
   * RUNNING frame is rows UNBOUNDED PRECEDING..CURRENT ROW, FINAL the
   * whole-match frame — so the evaluation is one codegen'd window pass
   * over the already-shuffled annotated rows: no extra exchange (the
   * annotate operator partitioned by the same keys).
   */
  private def withAllRowsMeasures(ann: DataFrame, p: Parsed): DataFrame = {
    if (p.rawMeasures.isEmpty) return ann
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.col
    val vars = p.rawDefs.map(_._1)
    val keys = p.partitionBy :+ "mr_match"
    def w(fin: Boolean) = {
      val base = Window.partitionBy(keys.map(col): _*).orderBy(col("mr_seq"))
      if (fin) base.rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    def overText(fin: Boolean) =
      s"OVER (PARTITION BY ${keys.mkString(", ")} ORDER BY mr_seq ROWS " +
      "BETWEEN UNBOUNDED PRECEDING AND " +
      (if (fin) "UNBOUNDED FOLLOWING)" else "CURRENT ROW)")
    // collision checks against the running name set, not the original
    // frame: two measures sharing an alias would otherwise silently
    // overwrite (withColumn replaces by name) instead of erroring
    val taken = scala.collection.mutable.Set(ann.columns.map(_.toLowerCase): _*)
    p.rawMeasures.foldLeft(ann) { case (df, (name, e, fin)) =>
      require(taken.add(name.toLowerCase),
        s"ALL ROWS measure name '$name' collides with an input column " +
        "or another measure")
      df.withColumn(name,
        allRowsMeasureCol(e, vars, w(fin), overText(fin), fin))
    }
  }

  /** One ALL ROWS measure as a window Column: the navigation shapes map
    * to the Measures aggregates `.over` the match window; CLASSIFIER()
    * under RUNNING is the CURRENT row's variable; general expressions
    * get their SUM/MIN/MAX/AVG/COUNT calls windowized textually. */
  private def allRowsMeasureCol(e: String, vars: Seq[String],
      w: org.apache.spark.sql.expressions.WindowSpec,
      overText: String, fin: Boolean): Column = e.trim match {
    case firstRe(v, c) =>
      MatchRecognize.Measures.firstOf(canon(v, vars), expr(c)).over(w)
    case lastRe(v, c) =>
      MatchRecognize.Measures.lastOf(canon(v, vars), expr(c)).over(w)
    case firstOffRe(v, c, n) => offsetElem(v, c, vars, w, n.toInt, fromEnd = false)
    case lastOffRe(v, c, n) => offsetElem(v, c, vars, w, n.toInt, fromEnd = true)
    case countVarRe(v) =>
      MatchRecognize.Measures.countOf(canon(v, vars)).over(w)
    case countAllRe() => count(lit(1)).over(w)
    case classifierRe() =>
      if (fin) MatchRecognize.Measures.classifier.over(w)
      else org.apache.spark.sql.functions.col("mr_var")
    case other =>
      expr(windowizeAggs(scopeVars(other, vars, perRow = false), overText))
  }

  /** FIRST/LAST(V.c, offset) under a window frame: V's rows visible in
    * the frame as (mr_seq, value) structs, logical navigation via
    * try_element_at (null when V matched fewer rows — no throw). */
  private def offsetElem(v: String, c: String, vars: Seq[String],
      w: org.apache.spark.sql.expressions.WindowSpec,
      off: Int, fromEnd: Boolean): Column = {
    import org.apache.spark.sql.functions._
    val cv = canon(v, vars)
    val arr = array_sort(collect_list(when(col("mr_var") === cv,
      struct(col("mr_seq").as("s"), expr(c).as("v")))).over(w))
    try_element_at(if (fromEnd) reverse(arr) else arr, lit(off + 1))("v")
  }

  /** Append `overText` to every SUM/MIN/MAX/AVG/COUNT(<…>) call in a
    * general measure expression (literal-opaque, balanced-paren), so
    * `CAST(SUM(x) AS BIGINT)` becomes `CAST(SUM(x) OVER (…) AS BIGINT)`
    * — the surrounding scalar text passes through untouched. */
  private def windowizeAggs(e: String, overText: String): String = {
    val aggRe = java.util.regex.Pattern.compile(
      "(?i)\\b(SUM|MIN|MAX|AVG|COUNT)\\s*\\(")
    val mask = literalMask(e)
    val m = aggRe.matcher(e)
    def findOutsideLiteral(from: Int): Boolean = {
      var at = from
      while (m.find(at)) {
        if (!mask(m.start())) return true
        at = m.start() + 1
      }
      false
    }
    if (!findOutsideLiteral(0)) throw new IllegalArgumentException(
      s"unsupported ALL ROWS MEASURES item (expected FIRST/LAST/COUNT/" +
      s"CLASSIFIER navigation or SUM/MIN/MAX/AVG/COUNT aggregates): $e")
    val sb = new StringBuilder
    var pos = 0
    do {
      val arg = balanced(e.substring(m.end() - 1), 0)
      val end = m.end() - 1 + arg.length + 2 // past "(" + arg + ")"
      sb ++= e.substring(pos, end)
      sb ++= " " + overText
      pos = end
    } while (findOutsideLiteral(pos))
    sb ++= e.substring(pos)
    sb.toString
  }

  private def parseBody(body: String): Parsed = {
    val spans = sectionSpans(body)
    def section(kw: String): Option[String] =
      spans.find(_._1 == kw).map { case (_, s, e) => body.substring(s, e).trim }

    val partitionBy = splitTop(section("PARTITION BY").getOrElse(
      throw new IllegalArgumentException("PARTITION BY is required")))
    val orderBy = splitTop(section("ORDER BY").getOrElse(
        throw new IllegalArgumentException("ORDER BY is required")))
      .map { o =>
        // row-pattern order is ascending by the standard; reject DESC
        // loudly instead of misreading "ts DESC" as a column name
        require(!o.toUpperCase.endsWith(" DESC"),
          s"MATCH_RECOGNIZE ORDER BY must be ascending (got: $o)")
        o.replaceAll("(?i)\\s+ASC$", "")
      }
    val allRows = spans.exists(_._1 == "ALL ROWS PER MATCH")
    val toFirstRe = "(?i)^SKIP TO FIRST (\\w+)$".r
    val toLastRe = "(?i)^SKIP TO (?:LAST )?(\\w+)$".r // bare TO v = TO LAST v
    val skip = section("AFTER MATCH")
      .map(_.replaceAll("\\s+", " ").trim) match {
      case None => MatchRecognize.SkipPastLastRow
      case Some(s) if s.equalsIgnoreCase("SKIP PAST LAST ROW") =>
        MatchRecognize.SkipPastLastRow
      case Some(s) if s.equalsIgnoreCase("SKIP TO NEXT ROW") =>
        MatchRecognize.SkipToNextRow
      // SQL:2016 / the reference's MATCH_RECOGNIZE mode: a skip target
      // that misses or would not advance is a runtime error
      case Some(toFirstRe(v)) => MatchRecognize.SkipToFirst(v)
      case Some(toLastRe(v)) => MatchRecognize.SkipToLast(v)
      case Some(s) => throw new IllegalArgumentException(
        s"unsupported AFTER MATCH clause: $s")
    }
    val patternSec = section("PATTERN").getOrElse(
      throw new IllegalArgumentException("PATTERN is required"))
    val pattern = balanced(patternSec, patternSec.indexOf('('))
    // Flink extension: PATTERN (...) WITHIN INTERVAL 'n' UNIT — match span
    // bounded by event time of the first ORDER BY column.
    val withinRe =
      "(?is)WITHIN\\s+INTERVAL\\s+'(\\d+)'\\s+(SECOND|MINUTE|HOUR|DAY)".r
    val within = withinRe.findFirstMatchIn(patternSec).map { m =>
      val n = m.group(1).toLong
      val ms = m.group(2).toUpperCase match {
        case "SECOND" => n * 1000L
        case "MINUTE" => n * 60000L
        case "HOUR" => n * 3600000L
        case "DAY" => n * 86400000L
      }
      (org.apache.spark.sql.functions.unix_millis(
        org.apache.spark.sql.functions.col(orderBy.head).cast("timestamp")), ms)
    }

    val defineSec = section("DEFINE").getOrElse(
      throw new IllegalArgumentException("DEFINE is required"))
    val defRe = "(?is)^(\\w+)\\s+AS\\s+(.+)$".r
    val rawDefs = splitTop(defineSec).map {
      case defRe(name, pred) => (name, pred.trim)
      case other => throw new IllegalArgumentException(s"bad DEFINE item: $other")
    }
    val vars = rawDefs.map(_._1)
    // PREV/NEXT navigation: SQL row-pattern matching is strictly
    // contiguous, so the previous row IN THE MATCH is the previous row in
    // partition order — PREV(x, n) is exactly lag(x, n) OVER the
    // partition/order window (and NEXT is lead). The rewrite happens
    // before `expr`, so the navigation evaluates as an ordinary window
    // flag ahead of the shuffle, the way the reference's
    // MatchCodeGenerator emits cross-row accessors.
    val over = s"OVER (PARTITION BY ${partitionBy.mkString(", ")} " +
      s"ORDER BY ${orderBy.mkString(", ")})"
    def nav(e: String): String = e
      .replaceAll("(?i)\\bPREV\\s*\\(\\s*([^(),]+?)\\s*,\\s*(\\d+)\\s*\\)",
        s"lag($$1, $$2) $over")
      .replaceAll("(?i)\\bPREV\\s*\\(\\s*([^(),]+?)\\s*\\)", s"lag($$1, 1) $over")
      .replaceAll("(?i)\\bNEXT\\s*\\(\\s*([^(),]+?)\\s*,\\s*(\\d+)\\s*\\)",
        s"lead($$1, $$2) $over")
      .replaceAll("(?i)\\bNEXT\\s*\\(\\s*([^(),]+?)\\s*\\)", s"lead($$1, 1) $over")
    val define = rawDefs.map { case (n, p) =>
      n -> expr(nav(scopeVars(p, vars, perRow = true)))
    }

    // MEASURES parse — shared by both output modes. Each item may carry
    // an explicit RUNNING|FINAL prefix (SQL:2016 / the reference's
    // MatchCodeGenerator semantics split): in ALL ROWS PER MATCH the
    // default is RUNNING (per-row aggregate over the match PREFIX up to
    // the current row) and FINAL evaluates over the whole match; in
    // ONE ROW PER MATCH the two coincide (the only emitted row IS the
    // final row), so the prefix is accepted and stripped.
    val asRe = "(?is)^(.+?)\\s+AS\\s+(\\w+)$".r
    val prefRe = "(?is)^(RUNNING|FINAL)\\s+(.+)$".r
    val rawMeasures: Seq[(String, String, Boolean)] =
      section("MEASURES") match {
        case None if allRows => Seq.empty
        case None => throw new IllegalArgumentException(
          "ONE ROW PER MATCH needs MEASURES")
        case Some(sec) => splitTop(sec).map {
          case asRe(e, name) => e.trim match {
            case prefRe(p, rest) =>
              (name, rest.trim, p.equalsIgnoreCase("FINAL"))
            case t => (name, t, !allRows) // default: RUNNING in ALL ROWS
          }
          case other => throw new IllegalArgumentException(
            s"bad MEASURES item (need '[RUNNING|FINAL] <expr> AS name'): $other")
        }
      }
    val measures = rawMeasures.map { case (name, e, _) =>
      (name, measureCol(e, vars))
    }
    Parsed(partitionBy, orderBy, allRows, skip, pattern, within, define,
      rawDefs, measures, rawMeasures)
  }

  // ------------------------------------------------------- streaming entry

  /**
   * The streaming result of [[stream]]: `annotated` is the unbounded
   * ALL-ROWS match stream (matches finalize at the watermark and emit
   * whole within one micro-batch — `MatchRecognize.annotateStreamDf`);
   * `finishBatch` is the per-micro-batch completion that reconstructs
   * `mr_seq` and, for ONE ROW PER MATCH, collapses each match with the
   * clause's MEASURES (legal as a plain batch aggregate precisely
   * because matches are batch-atomic — no match ever spans two
   * micro-batches, the reference's StreamExecMatch emission unit).
   */
  case class StreamMatches(annotated: DataFrame,
                           finishBatch: DataFrame => DataFrame) {
    /** Run to a parquet directory, one `batch=<id>` partition per
      * micro-batch — overwrite per batch id makes retried batches
      * idempotent. Read back with [[readMatches]]. */
    def start(path: String, checkpoint: String)
        : org.apache.spark.sql.streaming.StreamingQuery =
      annotated.writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: DataFrame, id: Long) =>
          val out = finishBatch(b)
          if (!out.isEmpty)
            out.write.mode("overwrite").parquet(s"$path/batch=$id")
        }
        .start()
  }

  /** Read a [[StreamMatches.start]] sink back, dropping the batch-id
    * partition column. */
  def readMatches(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("batch")

  /**
   * STREAMING MATCH_RECOGNIZE from the same SQL clause, ONE ROW PER
   * MATCH included — the reference's StreamExecMatch default mode
   * (flink-table-planner-blink/.../stream/StreamExecMatch.scala:68).
   * The composition: the keyed streaming NFA finalizes matches as the
   * watermark passes (`PATTERN (…) WITHIN` is the mandatory state
   * horizon), whole matches emit atomically in one micro-batch, and the
   * MEASURES collapse runs as an ordinary batch aggregate per
   * micro-batch. Per-key match ordinals equal the batch operator's, so
   * stream output == batch dual row-for-row.
   *
   * `df` must carry a watermark on the first ORDER BY column
   * (`withWatermark`). Limitation vs the batch path: DEFINE predicates
   * cannot use PREV/NEXT (they rewrite to lag/lead window functions,
   * which streaming DataFrames don't support); conditions read the
   * current row only.
   */
  def stream(df: DataFrame, clause: String): StreamMatches = {
    val t = clause.trim
    val body =
      if (t.toUpperCase.startsWith("MATCH_RECOGNIZE"))
        balanced(t, t.indexOf('('))
      else if (t.startsWith("(")) balanced(t, 0)
      else t
    val p = parseBody(body)
    val withinMs = p.within.map(_._2).getOrElse(throw
      new IllegalArgumentException(
        "streaming MATCH_RECOGNIZE requires PATTERN (…) WITHIN INTERVAL"))
    val navRe = "(?i)\\b(PREV|NEXT)\\s*\\(".r
    p.rawDefs.foreach { case (n, pred) =>
      require(navRe.findFirstIn(pred).isEmpty,
        s"streaming DEFINE cannot use PREV/NEXT (variable $n): " +
          "lag/lead window functions are unsupported on streams")
    }
    val annotated = MatchRecognize.annotateStreamDf(
      df, p.partitionBy, p.orderBy, p.pattern, p.define, withinMs, p.skip)
    val keys = (p.partitionBy :+ "mr_match").map(
      org.apache.spark.sql.functions.col)
    val order = p.orderBy.map(org.apache.spark.sql.functions.col)
    val finish = (batch: DataFrame) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, row_number}
      val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      // the NFA emits mr_seq itself since round 15 — the row_number
      // pass survives only for sinks replaying pre-round-15 output
      val withSeq =
        if (batch.columns.contains("mr_seq")) batch
        else batch.withColumn("mr_seq",
          (row_number().over(w) - 1).cast("long"))
      if (p.allRows) withAllRowsMeasures(withSeq, p)
      else {
        val aggs = p.measures.map { case (n, c) => c.as(n) }
        withSeq.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      }
    }
    StreamMatches(annotated, finish)
  }

  // --------------------------------------------- unified streaming entry

  /** Matches `SELECT * FROM <name> MATCH_RECOGNIZE (` — the statement
    * shape StreamSql's router probes against registered stream views. */
  private[streaming] val streamEntryRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+\\*\\s+FROM\\s+(\\w+)\\s+MATCH_RECOGNIZE\\s*\\(")

  /**
   * STREAMING MATCH_RECOGNIZE as ONE DataFrame from the ONE SQL entry —
   * the route `StreamSql.maybeSql` takes when a MATCH_RECOGNIZE
   * statement's FROM target is a `registerStream` view (the reference
   * plans StreamExecMatch from the single `sqlQuery` entry,
   * PLANNER/plan/nodes/physical/stream/StreamExecMatch.scala:68; before
   * round 15 such statements hit the router's fail-loud arm).
   *
   *  - ALL ROWS PER MATCH → [[MatchRecognize.annotateStreamDf]]
   *    directly (input columns + mr_match/mr_var/mr_seq, append mode).
   *  - ONE ROW PER MATCH → [[MatchRecognize.matchRowsStreamDf]]: the
   *    NFA emits each match as ONE row carrying its rows as packed
   *    UnsafeRow images, and the MEASURES evaluate STATELESSLY over
   *    that array with higher-order functions ([[measureArrayExpr]]) —
   *    no second stateful operator, no foreachBatch completion, no
   *    per-match retained state (emit-and-forget, exactly the
   *    reference's operator shape). Output columns: the PARTITION BY
   *    keys, `mr_match`, then the measures.
   *
   * Numeric note: SUM/AVG measures on this route accumulate in DOUBLE
   * (`aggregate` higher-order fold); supply integer-valued operands
   * (e.g. cents) where bit-exactness against a decimal oracle matters.
   */
  def streamSql(spark: SparkSession, viewDf: DataFrame, tsCol: String,
                delay: String, sqlText: String): DataFrame = {
    val m = streamEntryRe.matcher(sqlText)
    require(m.find(),
      "expected: SELECT * FROM <stream view> MATCH_RECOGNIZE ( ... )")
    val body = balanced(sqlText, m.end() - 1)
    val p = parseBody(body)
    val withinMs = p.within.map(_._2).getOrElse(throw
      new IllegalArgumentException(
        "streaming MATCH_RECOGNIZE requires PATTERN (…) WITHIN INTERVAL"))
    require(p.orderBy.headOption.contains(tsCol),
      s"streaming MATCH_RECOGNIZE must ORDER BY the view's event-time " +
      s"column '$tsCol' first (got: ${p.orderBy.mkString(", ")})")
    val navRe = "(?i)\\b(PREV|NEXT)\\s*\\(".r
    p.rawDefs.foreach { case (n, pred) =>
      require(navRe.findFirstIn(pred).isEmpty,
        s"streaming DEFINE cannot use PREV/NEXT (variable $n): " +
          "lag/lead window functions are unsupported on streams")
    }
    val wdf = viewDf.withWatermark(tsCol, delay)
    if (p.allRows && p.rawMeasures.isEmpty)
      MatchRecognize.annotateStreamDf(
        wdf, p.partitionBy, p.orderBy, p.pattern, p.define, withinMs, p.skip)
    else {
      import org.apache.spark.sql.functions.{col, posexplode}
      val (base, fields) = packedMatches(viewDf, wdf, p, withinMs)
      val vars = p.rawDefs.map(_._1)
      if (!p.allRows) {
        val aggCols = p.rawMeasures.map { case (name, e, _) =>
          expr(measureArrayExpr(e, vars, fields)).as(name)
        }
        base.select(
          p.partitionBy.map(n => col(s"__pk.`$n`").as(n)) ++
          (col("mr_match") +: aggCols): _*)
      } else {
        // ALL ROWS PER MATCH + MEASURES, streaming: matches emit from
        // the NFA as packed-rows arrays (batch-atomic), so per-row
        // RUNNING measures evaluate STATELESSLY over the match PREFIX
        // (slice up to the row's ordinal) and FINAL over the whole
        // array — higher-order functions, no second stateful operator
        // and no window-over-stream restriction. Output mirrors the
        // batch ALL ROWS shape: view columns + mr_match/mr_var/mr_seq
        // + the measure columns. Cost is O(match²) per match in the
        // RUNNING folds — matches are WITHIN-bounded, so the quadratic
        // term is capped by the pattern horizon, not the stream.
        val rows = base.select(col("__pk"), col("mr_match"), col("__mrr"),
          posexplode(col("__mrr")).as(Seq("__pos", "__r")))
        val prefix = "slice(__mrr, 1, __pos + 1)"
        // running name set: duplicates among the measures themselves
        // (and the emitted mr_match/mr_var/mr_seq columns) must error,
        // not silently shadow in the final select
        val mTaken = scala.collection.mutable.Set(
          (fields ++ Seq("mr_match", "mr_var", "mr_seq"))
            .map(_.toLowerCase): _*)
        val mCols = p.rawMeasures.map { case (name, e, fin) =>
          require(mTaken.add(name.toLowerCase),
            s"ALL ROWS measure name '$name' collides with an input " +
            "column or another measure")
          expr(measureArrayExpr(e, vars, fields,
            if (fin) "__mrr" else prefix)).as(name)
        }
        val viewCols = viewDf.schema.fieldNames.toSeq
        rows.select(
          viewCols.map(n => col(s"__r.`$n`").as(n)) ++
          Seq(col("mr_match"), col("__r.mr_var").as("mr_var"),
              col("__r.mr_seq").as("mr_seq")) ++ mCols: _*)
      }
    }
  }

  /** Shared decode of [[MatchRecognize.matchRowsStreamDf]]'s output:
    * (`__pk` partition-key struct, `mr_match`, `__mrr` array of match
    * rows as structs of the view columns + mr_seq + mr_var, in match
    * order). Returns the decoded frame and the struct field names. */
  private def packedMatches(viewDf: DataFrame, wdf: DataFrame, p: Parsed,
      withinMs: Long): (DataFrame, Seq[String]) = {
    import org.apache.spark.sql.functions.{col, from_json, transform}
    import org.apache.spark.sql.graftbridge.Bridge
    val raw = MatchRecognize.matchRowsStreamDf(
      wdf, p.partitionBy, p.orderBy, p.pattern, p.define, withinMs, p.skip)
    val packedSchema = org.apache.spark.sql.types.StructType(
      viewDf.schema.fields :+
      org.apache.spark.sql.types.StructField("mr_seq",
        org.apache.spark.sql.types.LongType, nullable = false) :+
      org.apache.spark.sql.types.StructField("mr_var",
        org.apache.spark.sql.types.StringType, nullable = false))
    val partSchema = org.apache.spark.sql.types.StructType(
      p.partitionBy.map(n => viewDf.schema(n)))
    val base = raw.select(
      // TransportJsonOpts on BOTH codec sides: the packed key was
      // written with the µs timestamp format (flagForNfa) — the
      // default read format would ms-truncate timestamp partition
      // columns in the OUTPUT even though the keys stayed distinct
      from_json(col("__mr_key"), partSchema,
        Changelog.TransportJsonOpts).as("__pk"),
      col("mr_match"),
      transform(col("__mr_rows"), b => Bridge.column(
        graft.plans.StructUnpack(Bridge.expression(b), packedSchema)))
        .as("__mrr"))
    (base, packedSchema.map(_.name))
  }

  /** Translate one MEASURES item to a STATELESS SQL expression over a
    * packed-rows array (elements: view columns + mr_seq + mr_var, in
    * match order) — `arr` is the array expression, the full match
    * `__mrr` for FINAL / ONE ROW semantics or the per-row prefix slice
    * for RUNNING under ALL ROWS. The navigation shapes map to
    * filter/try_element_at; general aggregate calls map to higher-order
    * folds — SUM/AVG accumulate in DOUBLE, MIN/MAX are type-preserving
    * (array_min/array_max), COUNT is size-of-non-nulls. */
  private[streaming] def measureArrayExpr(e: String, vars: Seq[String],
                                          fields: Seq[String],
                                          arr: String = "__mrr"): String = {
    def filt(v: String): String =
      s"filter($arr, r -> r.mr_var = '${canon(v, vars)}')"
    e.trim match {
      case firstRe(v, c) => s"try_element_at(${filt(v)}, 1).`$c`"
      case lastRe(v, c) => s"try_element_at(${filt(v)}, -1).`$c`"
      case firstOffRe(v, c, n) =>
        s"try_element_at(${filt(v)}, ${n.toInt + 1}).`$c`"
      case lastOffRe(v, c, n) =>
        s"try_element_at(${filt(v)}, -${n.toInt + 1}).`$c`"
      case countVarRe(v) => s"CAST(size(${filt(v)}) AS BIGINT)"
      case countAllRe() => s"CAST(size($arr) AS BIGINT)"
      case classifierRe() => s"try_element_at($arr, -1).mr_var"
      case other => rewriteAggCalls(other, vars, fields, arr)
    }
  }

  /** Rewrite every SUM/MIN/MAX/AVG/COUNT(<expr>) call inside a general
    * measure expression into its array fold over `arr`; the
    * surrounding scalar text (CASTs, arithmetic) passes through. */
  private def rewriteAggCalls(e: String, vars: Seq[String],
                              fields: Seq[String], arr: String): String = {
    val aggRe = java.util.regex.Pattern.compile(
      "(?i)\\b(SUM|MIN|MAX|AVG|COUNT)\\s*\\(")
    val mask = literalMask(e)
    val m = aggRe.matcher(e)
    // skip agg-keyword hits that start inside a string literal
    def findOutsideLiteral(from: Int): Boolean = {
      var at = from
      while (m.find(at)) {
        if (!mask(m.start())) return true
        at = m.start() + 1
      }
      false
    }
    if (!findOutsideLiteral(0)) throw new IllegalArgumentException(
      s"unsupported streaming MEASURES item (expected FIRST/LAST/COUNT/" +
      s"CLASSIFIER navigation or SUM/MIN/MAX/AVG/COUNT aggregates): $e")
    val sb = new StringBuilder
    var pos = 0
    do {
      sb ++= e.substring(pos, m.start())
      val arg = balanced(e.substring(m.end() - 1), 0)
      val fn = m.group(1).toUpperCase
      sb ++= aggFold(fn, arg.trim, vars, fields, arr)
      pos = m.end() - 1 + arg.length + 2 // past "(" + arg + ")"
    } while (findOutsideLiteral(pos))
    sb ++= e.substring(pos)
    sb.toString
  }

  private def aggFold(fn: String, arg: String, vars: Seq[String],
                      fields: Seq[String], arr: String): String = {
    if (fn == "COUNT" && arg == "*") return s"CAST(size($arr) AS BIGINT)"
    // scope pattern-variable references, then qualify bare column refs
    // onto the lambda element `r` — literal-opaque, longest-name-first
    val scoped = scopeVars(arg, vars, perRow = false)
    val body = graft.operators.SqlFrontend.rewriteOutsideLiterals(scoped) { t =>
      fields.sortBy(-_.length).foldLeft(t) { (acc, f) =>
        acc.replaceAll(
          s"(?i)(?<![\\w.`])${java.util.regex.Pattern.quote(f)}\\b(?!\\s*\\()",
          java.util.regex.Matcher.quoteReplacement(s"r.`$f`"))
      }
    }
    val vals = s"transform($arr, r -> ($body))"
    val nn = s"filter($vals, x -> x IS NOT NULL)"
    fn match {
      case "SUM" => s"aggregate($nn, CAST(NULL AS DOUBLE), " +
        "(a, x) -> coalesce(a, CAST(0 AS DOUBLE)) + CAST(x AS DOUBLE))"
      case "COUNT" => s"CAST(size($nn) AS BIGINT)"
      case "MIN" => s"array_min($vals)"
      case "MAX" => s"array_max($vals)"
      // one (sum, count) fold — inlining $nn twice (sum / size) would
      // evaluate the whole transform+filter pipeline per match twice
      case "AVG" => s"aggregate($nn, " +
        "named_struct('s', CAST(0 AS DOUBLE), 'c', CAST(0 AS BIGINT)), " +
        "(a, x) -> named_struct('s', a.s + CAST(x AS DOUBLE), " +
        "'c', a.c + CAST(1 AS BIGINT)), " +
        "a -> IF(a.c = 0, CAST(NULL AS DOUBLE), a.s / a.c))"
    }
  }
}
