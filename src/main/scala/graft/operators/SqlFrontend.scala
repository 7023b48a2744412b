package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr}

import graft.streaming.MatchRecognizeSql

/**
 * SQL-string front-end for the custom join operators (SURVEY §2.3), the
 * reachability the reference provides through `TableEnvironment.sqlQuery`
 * (flink-table-api-java/.../TableEnvironmentImpl.java:626 → ParserImpl;
 * temporal joins surface as `FOR SYSTEM_TIME AS OF` and are planned by
 * LogicalCorrelateToJoinFromTemporalTableRule). One dispatcher:
 *
 *   - `… ASOF [LEFT] JOIN … ON l.k = r.k AND l.ts >= r.ts`
 *     (DuckDB/Snowflake surface syntax) → `AsOfJoin.leftAsOf`;
 *   - `… [LEFT] JOIN <t> FOR SYSTEM_TIME AS OF <probe.col> [AS a] ON …`
 *     (the reference's processing-time lookup join) →
 *     `LookupJoin.snapshot`-style broadcast join against the current
 *     table snapshot;
 *   - `… MATCH_RECOGNIZE (…)` → `MatchRecognizeSql`;
 *   - anything else → `spark.sql` unchanged.
 *
 * Supported SELECT shape for the rewrites: single join, table names
 * resolved from the session catalog, column references optionally
 * qualified by the declared aliases (qualifiers are stripped after the
 * rewrite — the operators emit unqualified columns, so both sides'
 * names must be distinct, as in the reference's temporal join output).
 * As-of tie-break among equal-(key, ts) versions defaults to the
 * version timestamp; pass `tiebreak` for a total order when (key, ts)
 * is not unique.
 *
 * The rewrite itself is metadata-only — everything downstream is the
 * operators' normal Catalyst path (one shuffle + window pass for as-of,
 * broadcast hash join for lookup), so the SQL entry costs nothing at
 * 100 TB over the Scala API.
 */
object SqlFrontend {

  private val asofRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+([\\w.]+)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+ASOF\\s+(LEFT\\s+)?JOIN\\s+([\\w.]+)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+ON\\s+(.+)$")

  private val lookupRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+([\\w.]+)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+(LEFT\\s+)?JOIN\\s+([\\w.]+)\\s+FOR\\s+SYSTEM_TIME\\s+AS\\s+OF\\s+" +
    "[\\w.]+(?:\\s+(?:AS\\s+)?(\\w+))?\\s+ON\\s+(.+)$")

  def sql(spark: SparkSession, text: String,
          tiebreak: Option[String] = None): DataFrame = {
    val upper = text.toUpperCase
    // streaming shapes over REGISTERED changelog views route to the
    // stateful retraction operators (graft.streaming.StreamSql — the
    // analogue of the reference's FlinkStreamRuleSets rank/subquery
    // rules); unregistered names fall through to the batch paths below
    graft.streaming.StreamSql.maybeSql(spark, text).getOrElse {
    if (upper.contains("MATCH_RECOGNIZE")) MatchRecognizeSql.sql(spark, text)
    else if (groupWindowRe.matcher(text).find())
      spark.sql(groupWindows(text))
    else {
      val am = asofRe.matcher(text)
      val lm = lookupRe.matcher(text)
      if (am.matches()) asof(spark, am, tiebreak)
      else if (lm.matches()) lookup(spark, lm)
      else spark.sql(text)
    }
    }
  }

  // ---- Flink SQL group windows (GROUP BY TUMBLE/HOP/SESSION) ----------
  // The reference plans these via LogicalWindowAggregateRuleBase
  // (flink-table-planner-blink/.../rules/logical/
  // LogicalWindowAggregateRuleBase.scala) with the auxiliary accessors
  // TUMBLE_START/TUMBLE_END/HOP_*/SESSION_* (FlinkSqlOperatorTable).
  // Spark SQL already has the same physical capability as the built-in
  // `window()` / `session_window()` grouping functions, so the rewrite
  // is purely syntactic — the plan underneath is Spark's normal
  // Expand(for HOP)/hash-aggregate path, fully codegen'd.
  //
  // Argument-order note: Flink's HOP is (time, slide, size); Spark's
  // window() is (time, size, slide).

  private val groupWindowRe = java.util.regex.Pattern.compile(
    "(?i)\\b(TUMBLE|HOP|SESSION)(_START|_END)?\\s*\\(")

  private val iv = "INTERVAL\\s+'(\\d+)'\\s+(\\w+)"

  private[operators] def groupWindows(text: String): String = {
    var t = text
    // auxiliary accessors first (their names contain the window names)
    t = t.replaceAll("(?i)\\b(?:TUMBLE|HOP)_START\\s*\\([^()]*\\)",
                     "window.start")
    t = t.replaceAll("(?i)\\b(?:TUMBLE|HOP)_END\\s*\\([^()]*\\)",
                     "window.end")
    t = t.replaceAll("(?i)\\bSESSION_START\\s*\\([^()]*\\)",
                     "session_window.start")
    t = t.replaceAll("(?i)\\bSESSION_END\\s*\\([^()]*\\)",
                     "session_window.end")
    t = t.replaceAll(s"(?i)\\bTUMBLE\\s*\\(\\s*([\\w.]+)\\s*,\\s*$iv\\s*\\)",
                     "window($1, '$2 $3')")
    t = t.replaceAll(
      s"(?i)\\bHOP\\s*\\(\\s*([\\w.]+)\\s*,\\s*$iv\\s*,\\s*$iv\\s*\\)",
      "window($1, '$4 $5', '$2 $3')")
    t = t.replaceAll(s"(?i)\\bSESSION\\s*\\(\\s*([\\w.]+)\\s*,\\s*$iv\\s*\\)",
                     "session_window($1, '$2 $3')")
    t
  }

  /** Apply a text rewrite to the NON-literal regions of `s` only —
    * single-quoted SQL string literals (with `''` escapes) pass through
    * untouched, so a literal like `' see a.example '` is never mangled
    * by qualifier rewrites. Shared by [[strip]] and
    * [[graft.streaming.StreamSql]]'s join requalification. */
  private[graft] def rewriteOutsideLiterals(s: String)(
      f: String => String): String = {
    val out = new StringBuilder
    var i = 0
    var start = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        out ++= f(s.substring(start, i))
        val end = skipLiteral(s, i)
        out ++= s.substring(i, end)
        i = end
        start = i
      } else i += 1
    }
    out ++= f(s.substring(start))
    out.toString
  }

  /** Index just past the string literal opening at `open`
    * (`s(open) == '\''`). Honors the SESSION's escape convention, the
    * same way Spark's own lexer does: under the default
    * `spark.sql.parser.escapedStringLiterals=false` both SQL-standard
    * `''` doubling and backslash escapes (`\'`) terminate nothing — a
    * literal like `'don\'t EXCEPT'` must not leak its tail into code
    * scanning; with the conf set true, backslash is an ordinary
    * character (`'C:\'` ends at the quote) and only `''` doubling
    * escapes. The return value is clamped to `s.length` so an
    * unterminated literal ending in `\` can never send a caller past
    * the string (substring would throw instead of reporting a clean
    * parse error). Shared by every literal-opaque text scanner (this
    * rewriter, [[graft.streaming.StreamSql]]'s splitters,
    * MatchRecognizeSql's section parser). */
  private[graft] def skipLiteral(s: String, open: Int): Int = {
    val backslashEscapes =
      try !org.apache.spark.sql.internal.SQLConf.get.escapedStringLiterals
      catch { case _: Throwable => true } // no active conf: Spark default
    var i = open + 1
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' if backslashEscapes => i += 2
        case '\'' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
          else return i + 1
        case _ => i += 1
      }
    }
    math.min(i, s.length)
  }

  /** Contents of the balanced `(…)` opening at `open` — paren-depth
    * aware, string-literal-opaque. THE shared scanner (SqlDdl's column
    * list / WITH options and MatchRecognizeSql's clause bodies both
    * delegate here), so an escape-convention change in [[skipLiteral]]
    * reaches every balanced-extraction site at once. */
  private[graft] def balanced(s: String, open: Int): String = {
    require(open >= 0 && open < s.length && s.charAt(open) == '(',
      "expected (")
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = math.min(skipLiteral(s, i), s.length) - 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return s.substring(open + 1, i)
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses: $s")
  }

  /** Strip `alias.` qualifiers so expressions run on the operators'
    * unqualified output. Shared with [[graft.streaming.StreamSql]]
    * (same surface-syntax convention); aliases are regex-quoted and
    * de-duplicated so a name = alias pair strips once. String literals
    * are opaque — qualifier-like text inside them survives. */
  private[graft] def strip(e: String, aliases: Seq[String]): String =
    rewriteOutsideLiterals(e)(seg =>
      aliases.filter(_ != null).distinct.foldLeft(seg)((s, a) =>
        s.replaceAll(s"(?i)\\b${java.util.regex.Pattern.quote(a)}\\.", "")))

  private def asof(spark: SparkSession, m: java.util.regex.Matcher,
                   tiebreak: Option[String]): DataFrame = {
    val (sel, lt, la, leftJoin, rt, ra, on) =
      (m.group(1), m.group(2), m.group(3), m.group(4) != null,
       m.group(5), m.group(6), m.group(7))
    val lAlias = Option(la).getOrElse(lt)
    val rAlias = Option(ra).getOrElse(rt)
    // ON = one key equality + one >= inequality (either operand order)
    val conj = on.split("(?i)\\s+AND\\s+").map(_.trim)
    require(conj.length == 2,
      "ASOF JOIN needs exactly: ON <key equality> AND <ts inequality>")
    val qual = "(\\w+)\\.(\\w+)"
    val eqRe = s"(?s)^$qual\\s*=\\s*$qual$$".r
    val geRe = s"(?s)^$qual\\s*>=\\s*$qual$$".r
    val leRe = s"(?s)^$qual\\s*<=\\s*$qual$$".r
    var lk: String = null; var rk: String = null
    var lts: String = null; var rts: String = null
    conj.foreach {
      case eqRe(q1, c1, q2, c2) =>
        if (q1.equalsIgnoreCase(lAlias)) { lk = c1; rk = c2 }
        else { lk = c2; rk = c1 }
      case geRe(q1, c1, q2, c2) => // l.ts >= r.ts (backward as-of)
        require(q1.equalsIgnoreCase(lAlias) && q2.equalsIgnoreCase(rAlias),
          s"ASOF inequality must be <probe>.ts >= <version>.ts: $on")
        lts = c1; rts = c2
      case leRe(q1, c1, q2, c2) => // r.ts <= l.ts (same, flipped)
        require(q1.equalsIgnoreCase(rAlias) && q2.equalsIgnoreCase(lAlias),
          s"ASOF inequality must be <version>.ts <= <probe>.ts: $on")
        rts = c1; lts = c2
      case other => throw new IllegalArgumentException(
        s"unsupported ASOF condition: $other")
    }
    require(lk != null && lts != null, s"ASOF ON clause incomplete: $on")

    val left = spark.table(m.group(2))
    val right0 = spark.table(rt)
    // carry the right key under an internal name: it marks matched rows
    // (inner semantics) without colliding with probe columns
    val right = right0.withColumn("__asof_k", col(rk))
    val carried = right0.columns.toSeq
      .filterNot(left.columns.contains) :+ "__asof_k"
    val ord = tiebreak.getOrElse(rts)
    val joined = AsOfJoin.leftAsOf(left, right, lk, rk, lts, rts,
      carried.distinct, ord)
    val filtered =
      if (leftJoin) joined else joined.filter(col("__asof_k").isNotNull)
    val items = splitTop(sel).map(i => strip(i, Seq(lAlias, rAlias)))
    val projected =
      if (items == Seq("*")) filtered.drop("__asof_k")
      else filtered.selectExpr(items: _*)
    projected
  }

  private def lookup(spark: SparkSession,
                     m: java.util.regex.Matcher): DataFrame = {
    val (sel, lt, la, leftJoin, rt, ra, on) =
      (m.group(1), m.group(2), m.group(3), m.group(4) != null,
       m.group(5), m.group(6), m.group(7))
    val lAlias = Option(la).getOrElse(lt)
    val rAlias = Option(ra).getOrElse(rt)
    val probe = spark.table(lt)
    val lookupTable = spark.table(rt)
    // processing-time temporal join = join against the CURRENT snapshot,
    // broadcast (LookupJoinRunner semantics — per-row point lookups
    // become a broadcast hash join when the table is scannable)
    val cond = expr(strip(on, Seq(lAlias, rAlias)))
    val joined = probe.join(broadcast(lookupTable), cond,
      if (leftJoin) "left" else "inner")
    val items = splitTop(sel).map(i => strip(i, Seq(lAlias, rAlias)))
    if (items == Seq("*")) joined else joined.selectExpr(items: _*)
  }

  private[graft] def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
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
}
