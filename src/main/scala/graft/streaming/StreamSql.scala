package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.operators.SqlFrontend

/**
 * Streaming-SQL reachability for the changelog operator family — the
 * repo's analogue of the reference's planner routing that makes
 * `WHERE [NOT] EXISTS`, `ROW_NUMBER() <= k` and `COUNT(DISTINCT …)`
 * over UPDATING inputs reach the stateful retraction operators from
 * plain SQL (flink-table-planner-blink/.../plan/rules/
 * FlinkStreamRuleSets.scala — the rank + subquery rule sets — and
 * FlinkChangelogModeInferenceProgram.scala deciding each operator's
 * changelog mode; execution lands in
 * RUNTIME/runtime/operators/join/stream/StreamingSemiAntiJoinOperator.java:36,
 * PLANNER-J/runtime/rank/RetractableTopNFunction.java and the generated
 * DistinctAccumulator MapView).
 *
 * The entry point is [[SqlFrontend.sql]]: when a statement's FROM target
 * is a REGISTERED CHANGELOG VIEW (a streaming DataFrame carrying a
 * row-kind column — the repo's updating-table representation, see
 * [[Changelog]]), the statement is routed here and rewritten onto
 * [[Changelog.joinChangelogSemi]]/[[Changelog.joinChangelogAnti]],
 * [[Changelog.topNChangelog]] or
 * [[Changelog.aggregateChangelogDistinct]]; unregistered names fall
 * through to `spark.sql` untouched, so the same text runs as a batch
 * query against catalog tables.
 *
 * OUTPUT CONTRACT: the result is itself a changelog DataFrame — the
 * projected columns plus `row_kind` (+I/-U/+U/-D) and, for the
 * ord-emitting operators (EXISTS / Top-N), `row_ord`, the per-key
 * emission sequence that makes [[Changelog.materialize]] applicable at
 * the sink. The distinct aggregate follows the GroupAggFunction
 * protocol (≤ one +U or -D per key per micro-batch), so a
 * `foreachBatch` batch id is its materialization order (the q294/q307
 * pattern).
 *
 * Supported shapes (single statement, view names resolved against
 * [[registerChangelog]]; `<expr>` may be any deterministic scalar
 * expression over the view's columns):
 *
 *  - `SELECT <items> FROM V [AS a]
 *     WHERE [NOT] EXISTS (SELECT … FROM W [AS b]
 *                         WHERE b.k = a.k [AND b.k2 = a.k2…]
 *                         [AND <residual>…])`
 *    → semi/anti changelog join; multiple key equalities form a
 *    COMPOSITE state key (one packed struct image — the joinStmt
 *    discipline). A residual referencing only the INNER view applies
 *    as a changelog-preserving filter on it (a stateless predicate
 *    commutes with retraction: dropping a payload's -U/+U pair on both
 *    sides of a threshold crossing is exactly the filtered view's
 *    changelog — how the reference plans WHERE on updating tables);
 *    residuals over the OUTER row (alone or with inner columns)
 *    compile into the operator's condition over the packed payloads —
 *    on NOT EXISTS a failing outer row must still emit, which no
 *    pre-filter can express.
 *  - `SELECT <items> FROM (
 *       SELECT <expr AS name>…, ROW_NUMBER() OVER (
 *         PARTITION BY <g> ORDER BY <s> [ASC|DESC] [, <rowId>]) AS rn
 *       FROM V) [t] WHERE rn <= <n>`
 *    → retract-consuming Top-N; V must declare a `rowId` (its upsert
 *    key) at registration. Inner items may reference only <g>, <s> and
 *    the rowId (the columns the rank state carries); `rn` itself is not
 *    projectable — this is the reference's no-rank-number output mode
 *    (RankProcessStrategy without outputRankNumber), ranks derive at
 *    read over the ≤ n materialized rows per key.
 *  - `SELECT <g> AS ga, COUNT(DISTINCT <v>) AS da [, COUNT(*) AS ca]
 *     FROM V GROUP BY <g>`
 *    → retract-capable distinct aggregate (value-instance 0↔1
 *    transitions); `ca` is the group's live input-row count.
 *  - `SELECT <g> AS ga, FIRST_VALUE(<v>) | LAST_VALUE(<v>) |
 *     LISTAGG(<v> [, '<delim>']) | COLLECT(<v>) | COUNT(*) …
 *     FROM V GROUP BY <g>`
 *    → retract-capable ordered/multiset aggregates
 *    ([[Changelog.aggregateChangelogListAgg]]); V must declare its
 *    upsert key at registration — it is the FIRST/LAST/LISTAGG order,
 *    the way the reference's order-sensitive retract aggs key their
 *    ListView. All value arguments must be the same expression (one
 *    live multiset per statement); COLLECT emits the value-sorted
 *    serialization of the multiset (duplicates retained).
 *  - `SELECT <items> FROM A [AS a]
 *     [INNER | LEFT [OUTER] | RIGHT [OUTER] | FULL [OUTER]] JOIN B [AS b]
 *     ON a.k = b.k [AND <one-side residual>…]`
 *    → two-sided changelog join ([[Changelog.joinChangelog]] /
 *    [[Changelog.joinChangelogOuter]] — the reference's
 *    StreamingJoinOperator, the day-one `A JOIN B` statement over two
 *    updating tables). Either side may instead be a [[registerStream]]
 *    APPEND view — it lifts to a constant-+I changelog (an insert-only
 *    input is a changelog that never retracts, the reference's
 *    changelog-mode inference for mixed-domain joins). The ON clause
 *    takes ONE OR MORE cross-side key equalities — multiple
 *    equalities form a COMPOSITE state key (per-pair type
 *    normalization, packed as one canonical struct image — the
 *    reference's multi-field BinaryRowData key selector) — plus any
 *    residual conjuncts: a single-side residual on a non-preserved
 *    side applies as a changelog-preserving pre-join filter on that
 *    view (shrinks join state); both-side residuals, and residuals on
 *    a PRESERVED outer side, compile into the join operator's
 *    condition over the packed payloads (the reference's generated
 *    JoinCondition — a failing preserved-side row still emits
 *    null-padded, exact SQL ON semantics). Projection items
 *    must be alias-qualified (`a.col`, `b.col` — both sides may share
 *    column names) and `*` is rejected; outer-side columns null-pad
 *    exactly like the batch join.
 *  - `SELECT <g> AS ga, SUM(<v>) | COUNT(*) | AVG(<v>) |
 *     VAR_POP(<v>) | VAR_SAMP(<v>) | STDDEV_POP(<v>) |
 *     STDDEV_SAMP(<v>) … FROM V GROUP BY <g>`
 *    → retract-capable moment aggregates
 *    ([[Changelog.aggregateChangelogStats]] — the reference's
 *    Avg/VarPop/VarSamp/StddevPop/StddevSamp retract functions over
 *    the (Σv, Σv², n) accumulator); the derived columns are
 *    codegen'd projections over the emitted accumulator. One value
 *    expression per statement (one accumulator).
 *  - `SELECT <g> AS ga, MIN(<v>) | MAX(<v>) | COUNT(*) …
 *     FROM V GROUP BY <g>`
 *    → retract-aware extremes ([[Changelog.aggregateChangelogMinMax]]
 *    — a live row set, so retracting the current max re-admits the
 *    runner-up); V must declare its upsert key at registration (the
 *    live set's row identity). A statement MIXING MIN/MAX with the
 *    moment family (`SUM(v), MIN(v), COUNT(*)` in one GROUP BY)
 *    routes onto [[Changelog.aggregateChangelogMulti]] — one operator
 *    hosting both accumulator families, the reference's
 *    GroupAggFunction architecture; it needs the upsert key too.
 *
 *  - `SELECT <items> FROM A [WHERE p] UNION ALL
 *     SELECT <items> FROM B [WHERE p]`
 *    → changelog-preserving union of two registered views (a union of
 *    two changelogs IS the changelog of the union — the day-one set
 *    op). Branches align positionally; output names come from the
 *    first branch; each branch's row kind emits as `row_kind` (no
 *    `row_ord` — two independent per-key logs carry no global order;
 *    re-register and aggregate, the chaining pattern).
 *  - `SELECT <items> FROM A [WHERE p] INTERSECT | EXCEPT
 *     SELECT <items> FROM B [WHERE p]`
 *    → the reference's streaming set-op rewrite
 *    (ReplaceIntersectWithSemiJoinRule / ReplaceMinusWithAntiJoinRule,
 *    PLANNER/plan/rules/logical, mirrored in FlinkStreamRuleSets):
 *    a distinct aggregate over ALL projected columns composed with
 *    the changelog SEMI (INTERSECT) or ANTI (EXCEPT) join —
 *    [[Changelog.distinctChangelog]] on A keyed on the projected
 *    row's canonical UnsafeRow image, then
 *    [[Changelog.joinChangelogSemi]]/[[Changelog.joinChangelogAnti]]
 *    against B on the same whole-row key (SQL set-op null semantics —
 *    NULLs compare equal — fall out of the canonical image for free).
 *    Branches align positionally and must agree on column TYPES;
 *    output names come from the first branch; emits `row_kind` and
 *    `row_ord`. The ALL forms are rejected (the reference's stream
 *    rule set rewrites only the DISTINCT forms); two branches per
 *    statement — register the intermediate view to chain.
 *  - `SELECT DISTINCT <items> FROM V [AS a] [WHERE p]`
 *    → distinct on an updating input — the reference plans it as an
 *    Aggregate with no aggregate calls grouped on all columns, the
 *    same distinct machinery the set-op rewrite shares.
 *    [[Changelog.distinctChangelog]] keyed on the projected row's
 *    canonical UnsafeRow image: +I on a value's 0→1 live-instance
 *    transition, -D on 1→0 (deleting one of two equal rows emits
 *    nothing). WHERE is the changelog-MODE filter (needs the view's
 *    rowId); emits `row_kind` and `row_ord`. The same statement over a
 *    [[registerStream]] APPEND view is running distinct on an
 *    insert-only input (first occurrence emits +I, duplicates silent,
 *    nothing retracts; WHERE is a plain stateless pre-filter).
 *  - `SELECT <items> FROM V [AS a] [WHERE p]
 *     ORDER BY <s> [ASC|DESC] [, <rowId>] LIMIT <n>`
 *    → the reference's StreamExecSortLimit: a GLOBAL updating Top-N
 *    (the rank operator under one constant key — retractions re-admit
 *    runners-up). V must declare its rowId; the optional explicit
 *    tiebreak must be that rowId ascending; items may reference only
 *    <s> and the rowId. Ranks derive at read over the ≤ n
 *    materialized rows, as with the partitioned route.
 *  - `SELECT <items> FROM S [AS a] [WHERE p]` — plain Calc (the
 *    reference's StreamExecCalc), NO state, zero exchanges. Over a
 *    [[registerStream]] APPEND view: project/filter/rename of the
 *    insert-only stream — the day-one `INSERT INTO sink SELECT … FROM
 *    src` pipeline shape. Over a CHANGELOG view: the same map with the
 *    row kind riding along as `row_kind` (a deterministic projection/
 *    filter commutes with retraction — the -U/-D row's OLD payload
 *    maps exactly as it did when inserted; a value leaving the
 *    filtered view surfaces as a bare retraction). Tried after every
 *    stateful route; any stateful token in the text falls to its own
 *    route or the fail-loud scan instead.
 *
 * Every GROUP BY shape above also accepts `[WHERE <pred>]` before the
 * GROUP BY and `[HAVING <pred>]` after it. WHERE is a
 * changelog-preserving payload filter on the view (a deterministic
 * predicate commutes with retraction — the reference's Calc on
 * updating input); HAVING references the statement's OUTPUT aliases
 * and runs as a changelog-mode filter on the updating result
 * ([[Changelog.filterChangelog]] — a group whose new value fails the
 * predicate leaves the filtered view with an explicit -D, so upsert
 * materialization stays correct).
 *
 * Keys: the changelog operators are generic in their key type (the
 * reference keys state on arbitrary BinaryRowData). The router encodes
 * the group/join key by its RESOLVED TYPE: integral expressions
 * (byte/short/int/long) key state as Long, everything else —
 * string/date/decimal/composite-derived keys — as the expression's
 * canonical STRING form, so `GROUP BY source` over a documents view
 * works without user-side hashing and without collision risk.
 * Composite keys: derive a single key column in the view (e.g.
 * concat_ws), as with Flink's key selector. Payloads cross the routed
 * operators as binary struct images ([[graft.plans.StructPack]] — the
 * payload struct's canonical UnsafeRow bytes, wrapped back zero-copy
 * by [[graft.plans.StructUnpack]] on exit), the Spark-native analogue
 * of the reference serializing BinaryRowData into keyed state: no
 * text codec anywhere on the routed path.
 * The rewrite is metadata-only: everything downstream is the
 * operators' normal one-exchange keyed-state path, so SQL entry adds
 * no shuffle at any scale.
 *
 * TTL: pass `ttl`, or set `spark.graft.state.ttl.ms` (the config
 * surface every changelog operator honors — [[Changelog.ttlFromConf]]).
 */
object StreamSql {

  /** A registered updating view: a (usually streaming) DataFrame whose
    * `kindCol` carries the row kind (+I/-U/+U/-D), plus the optional
    * upsert-key column rank queries require. */
  final case class ChangelogView(df: DataFrame, kindCol: String,
                                 rowIdCol: Option[String])

  // process-wide by design: mirrors the reference's per-process
  // TableEnvironment catalog of registered tables; names are
  // case-insensitive like SQL identifiers
  private val views = TrieMap.empty[String, ChangelogView]

  def registerChangelog(name: String, df: DataFrame,
                        kindCol: String = "kind",
                        rowId: Option[String] = None): Unit = {
    require(df.columns.contains(kindCol),
      s"changelog view '$name' has no row-kind column '$kindCol'")
    rowId.foreach(c => require(df.columns.contains(c),
      s"changelog view '$name' has no rowId column '$c'"))
    views(name.toLowerCase) = ChangelogView(df, kindCol, rowId)
  }

  def dropChangelog(name: String): Unit = views.remove(name.toLowerCase)

  private def view(name: String): Option[ChangelogView] =
    views.get(name.toLowerCase)

  /** A registered APPEND-ONLY streaming view: an insert-only streaming
    * DataFrame with a declared event-time column and watermark delay —
    * the repo's analogue of the reference's `WATERMARK FOR ts AS ts -
    * INTERVAL …` DDL clause on an insert-only table. `rowIdCol` is the
    * optional unique row/version id the time-domain operators use as a
    * deterministic tiebreak (over-window) or version order (temporal
    * join). Routed by [[StreamSqlTime]]. */
  final case class StreamView(df: DataFrame, tsCol: String, delay: String,
                              rowIdCol: Option[String])

  private val streams = TrieMap.empty[String, StreamView]

  def registerStream(name: String, df: DataFrame, tsCol: String,
                     delay: String, rowId: Option[String] = None): Unit = {
    require(df.columns.contains(tsCol),
      s"stream view '$name' has no event-time column '$tsCol'")
    require(df.schema(tsCol).dataType ==
        org.apache.spark.sql.types.TimestampType,
      s"stream view '$name': event-time column '$tsCol' must be TIMESTAMP " +
      s"(got ${df.schema(tsCol).dataType.simpleString})")
    rowId.foreach(c => require(df.columns.contains(c),
      s"stream view '$name' has no rowId column '$c'"))
    streams(name.toLowerCase) = StreamView(df, tsCol, delay, rowId)
  }

  def dropStream(name: String): Unit = streams.remove(name.toLowerCase)

  private[streaming] def streamView(name: String): Option[StreamView] =
    streams.get(name.toLowerCase)

  // ---- statement shapes -------------------------------------------------

  private val existsRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "\\s+WHERE\\s+(NOT\\s+)?EXISTS\\s*\\(\\s*SELECT\\s+.+?\\s+FROM\\s+" +
    "(\\w+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s+WHERE\\s+(.+)\\)\\s*$")

  // OUTER may only follow LEFT/RIGHT/FULL (as in standard SQL): a bare
  // `A OUTER JOIN B` must NOT parse — the alias lookahead rejects OUTER
  // and the type group requires a direction, so the statement falls to
  // the fail-loud scan instead of silently running as an inner join
  private val joinRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!INNER\\b|LEFT\\b|RIGHT\\b|FULL\\b|OUTER\\b|JOIN\\b)(\\w+))?" +
    "\\s+(?:(INNER|LEFT|RIGHT|FULL)(?:\\s+OUTER)?\\s+)?JOIN\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!ON\\b)(\\w+))?\\s+ON\\s+(.+?)\\s*$")

  // SELECT DISTINCT <items> FROM <view> [WHERE p] — the reference's
  // distinct on an updating input (an Aggregate with no agg calls, the
  // same distinct machinery the set-op rewrite shares)
  private val selDistinctRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+DISTINCT\\s+(.+?)\\s+FROM\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!WHERE\\b)(\\w+))?(?:\\s+WHERE\\s+(.+?))?\\s*$")

  // SELECT <items> FROM <view> [WHERE p] ORDER BY <s> [ASC|DESC]
  // [, <rowId>] LIMIT n — the reference's StreamExecSortLimit (a global
  // updating Top-N: no PARTITION BY)
  private val sortLimitRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!WHERE\\b|ORDER\\b)(\\w+))?" +
    "(?:\\s+WHERE\\s+(.+?))?" +
    "\\s+ORDER\\s+BY\\s+(.+?)\\s+LIMIT\\s+(\\d+)\\s*$")

  private val topnRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s*\\(\\s*SELECT\\s+(.+?),\\s*" +
    "ROW_NUMBER\\s*\\(\\s*\\)\\s+OVER\\s*\\(\\s*PARTITION\\s+BY\\s+(.+?)" +
    "\\s+ORDER\\s+BY\\s+(.+?)\\s*\\)\\s+(?:AS\\s+)?(\\w+)\\s+FROM\\s+(\\w+)" +
    "\\s*\\)\\s*(?:(?:AS\\s+)?(\\w+)\\s*)?WHERE\\s+(\\w+)\\s*<=\\s*(\\d+)\\s*$")

  private val distinctRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)(?:\\s+(?:AS\\s+)?(\\w+))?" +
    "(?:\\s+WHERE\\s+(.+?))?\\s+GROUP\\s+BY\\s+(.+?)" +
    "(?:\\s+HAVING\\s+(.+?))?\\s*$")

  // SELECT <items> FROM <stream view> [AS a] [WHERE p] — the
  // reference's plain Calc over an insert-only dynamic table
  // (StreamExecCalc: project/filter/rename, NO state), the day-one
  // `INSERT INTO sink SELECT … FROM src [WHERE …]` pipeline shape.
  // Guarded by [[statefulTokenRe]] so any stateful construct falls to
  // its own route (or the fail-loud scan), never silently through here.
  private val calcRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!WHERE\\b)(\\w+))?(?:\\s+WHERE\\s+(.+?))?\\s*$")
  private val statefulTokenRe = java.util.regex.Pattern.compile(
    "(?i)\\b(GROUP\\s+BY|JOIN|DISTINCT|EXISTS|UNION|INTERSECT|EXCEPT|" +
    "ORDER\\s+BY|LIMIT|MATCH_RECOGNIZE|OVER|SUM|AVG|COUNT|MIN|MAX|" +
    "VAR_POP|VAR_SAMP|STDDEV_POP|STDDEV_SAMP|FIRST_VALUE|LAST_VALUE|" +
    "LISTAGG|COLLECT)\\b")

  private val unionRe = java.util.regex.Pattern.compile(
    "(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!WHERE\\b|UNION\\b)(\\w+))?" +
    "(?:\\s+WHERE\\s+(.+?))?\\s+UNION\\s+ALL\\s+" +
    "SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!WHERE\\b)(\\w+))?" +
    "(?:\\s+WHERE\\s+(.+?))?\\s*$")

  /** Whitespace/case-insensitive expression identity — how inner rank
    * projection items are matched against the partition/order/rowId
    * expressions (textual, like the surface syntax itself). */
  private[streaming] def norm(e: String): String =
    e.replaceAll("\\s+", "").toLowerCase

  /** The OUTPUT alias of a single-key GROUP BY statement's key item, if
    * the text is one of the GROUP BY-family shapes — the key is the
    * aggregate's upsert key (one row per key value), the narrow slice
    * of the reference's unique-key inference (FlinkRelMdUniqueKeys)
    * [[graft.operators.SqlDdl]] uses to register CREATE VIEW results
    * with a usable rowId. None for GROUP BY 1 / multi-key / non-GROUP
    * shapes (register the view by hand for those). */
  private[graft] def groupKeyAlias(text: String): Option[String] = {
    val m = distinctRe.matcher(text)
    if (!m.matches()) None
    else {
      val quals = Seq(m.group(3), m.group(2))
      val gb = strip(m.group(5), quals).trim
      if (gb == "1" || SqlFrontend.splitTop(gb).length != 1) None
      else SqlFrontend.splitTop(m.group(1)).map(strip(_, quals))
        .flatMap { item =>
          val (e, a) = itemAlias(item)
          if (norm(e) == norm(gb)) Some(a) else None
        }.headOption
    }
  }

  /** Split a predicate on top-level ANDs (parenthesis-depth aware,
    * string-literal opaque, any whitespace around AND — newline/tab
    * delimited conjuncts split too; case matched in place with
    * `regionMatches(ignoreCase)` so no uppercased copy whose length
    * could diverge from the original). The AND belonging to a top-level
    * `x BETWEEN a AND b` is part of the BETWEEN, not a conjunct
    * delimiter — the interval-join route's time bound stays one
    * conjunct. */
  private[streaming] def splitAnd(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var pendingBetween = 0
    var start = 0
    var i = 0
    def keywordAt(j: Int, w: String): Boolean =
      s.regionMatches(true, j, w, 0, w.length) && {
        val after = j + w.length
        after >= s.length || {
          val c = s.charAt(after)
          !Character.isLetterOrDigit(c) && c != '_'
        }
      }
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' => i = SqlFrontend.skipLiteral(s, i)
        case c if depth == 0 && Character.isWhitespace(c) &&
                  keywordAt(i + 1, "BETWEEN") =>
          pendingBetween += 1
          i += 8
        case c if depth == 0 && Character.isWhitespace(c) &&
                  keywordAt(i + 1, "AND") && i + 4 < s.length =>
          if (pendingBetween > 0) { pendingBetween -= 1; i += 4 }
          else {
            out += s.substring(start, i)
            i += 4
            start = i
          }
        case _ => i += 1
      }
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  // qualifier stripping shared with the batch front-end — one
  // implementation of the surface-syntax convention to maintain
  private[streaming] def strip(e: String, quals: Seq[String]): String =
    SqlFrontend.strip(e, quals)

  /** `expr AS alias` | `expr alias` | bare expression — the projection
    * item grammar the rank/distinct routes accept. A trailing word is
    * an implicit alias only when the preceding text is a complete
    * expression: `key % 5` must NOT backtrack to (`key %`, alias `5`),
    * so an expr ending in an operator/comma keeps the whole item as a
    * bare (self-named) expression. */
  private[streaming] def itemAlias(item: String): (String, String) = {
    val m = java.util.regex.Pattern
      .compile("(?is)^(.+?)\\s+(?:AS\\s+)?(\\w+)\\s*$").matcher(item)
    val exprDone = m.matches() &&
      !"[%+*/=<>,(~^&|-]$".r.findFirstIn(m.group(1).trim).isDefined
    if (exprDone) (m.group(1).trim, m.group(2))
    else (item.trim, item.trim)
  }

  /** Reject a WHERE clause carrying a subquery / EXISTS before it
    * reaches `expr` — selDistinctRe's WHERE group swallows arbitrary
    * trailing predicates, so `SELECT DISTINCT … WHERE EXISTS (SELECT …)`
    * would otherwise die deep in filterChangelog with a confusing
    * analysis (or rowId-required) error instead of the standard
    * unsupported-shape message. Literal-opaque: 'EXISTS' inside a
    * string constant does not trip the guard. */
  private def requireNoSubquery(w: String, route: String): Unit = {
    // blank out literal regions, then scan the remaining code text
    val masked = {
      val sb = new StringBuilder
      var i = 0
      while (i < w.length) {
        if (w.charAt(i) == '\'') {
          val end = math.min(SqlFrontend.skipLiteral(w, i), w.length)
          sb ++= " " * (end - i); i = end
        } else { sb += w.charAt(i); i += 1 }
      }
      sb.toString
    }
    require(!masked.matches("(?is).*\\b(EXISTS\\s*\\(|SELECT)\\b.*"),
      s"streaming $route WHERE cannot carry a subquery/EXISTS — the " +
      "filter is a scalar predicate over the view's columns; route the " +
      "existence test through the WHERE [NOT] EXISTS statement shape " +
      s"(or the Changelog joinChangelogSemi/Anti Scala API): $w")
  }

  /** `WHERE <pred>` on an updating view, applied BEFORE the aggregate:
    * a deterministic predicate over the payload is changelog-preserving
    * on a retract stream (-U carries the OLD row, so a value crossing
    * the predicate surfaces as a bare retraction — exactly the
    * reference's Calc on updating input). */
  private def whereFilter(df: DataFrame, whereCl: String,
                          quals: Seq[String]): DataFrame =
    Option(whereCl).map { w =>
      requireNoSubquery(w, "aggregate")
      df.filter(expr(strip(w, quals)))
    }.getOrElse(df)

  /** Plain Calc over an APPEND stream view — project/filter/rename with
    * NO state (the reference's StreamExecCalc on an insert-only table).
    * Metadata-only: the result is the same append stream (whole-stage
    * codegen'd expressions, zero exchanges), and the view's event-time
    * column stays usable downstream when projected. */
  private def calc(spark: SparkSession,
                   m: java.util.regex.Matcher): DataFrame = {
    val (sel, vName, vAlias0, whereCl) =
      (m.group(1), m.group(2), m.group(3), m.group(4))
    val v = streamView(vName).get
    val quals = Seq(Option(vAlias0).getOrElse(vName), vName)
    val base = whereFilter(v.df, whereCl, quals)
    val items = SqlFrontend.splitTop(sel).map(strip(_, quals))
    calcProject(base,
      if (items == Seq("*")) Nil else items, extra = Nil)
  }

  /** The Calc routes' projection + fail-loud backstop: `selectExpr`
    * silently plans a GLOBAL Aggregate for items like
    * `percentile(v, 0.5)` (or fails analysis outright when such an item
    * mixes with a plain column) — the token guard lists the routed
    * aggregate names, but the function surface is open-ended, so the
    * ANALYZED plan is the authority. Without this, such a statement
    * dies later in Spark's unsupported-operation checker with a
    * confusing error (or, worse, folds an updating input as plain
    * rows). `items` empty = `*` (pass-through plus `extra`). */
  private def calcProject(base: DataFrame, items: Seq[String],
                          extra: Seq[String]): DataFrame = {
    val out =
      try {
        if (items.isEmpty && extra.isEmpty) base
        else if (items.isEmpty) base.selectExpr("*" +: extra: _*)
        else base.selectExpr(items ++ extra: _*)
      } catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          "plain-Calc projection failed to analyze — an aggregate item " +
          "matches no supported streaming-SQL shape here (use a GROUP " +
          "BY statement from the routed aggregate families or the " +
          s"Changelog Scala API); underlying: ${e.getMessage}", e)
      }
    require(out.queryExecution.analyzed.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isEmpty,
      "the statement's items contain an aggregate function, so it " +
      "matches no supported streaming-SQL shape for a plain Calc — " +
      "use a GROUP BY statement from the routed aggregate families " +
      "(see StreamSql's object doc) or the Changelog Scala API")
    out
  }

  /** Parse `text` as a plain-Calc statement over a registered APPEND
    * stream view and return the view's name plus a REUSABLE batch
    * transformation (the same projection/filter applied to any
    * DataFrame of the view's schema) — the statement-set multiplexer's
    * hook ([[graft.operators.SqlDdl.executeStatementSet]]): N stateless
    * members over ONE source run as one query, one scan per
    * micro-batch, each member's Calc applied to the shared batch.
    * None when the text is not a pure Calc over a stream view. */
  private[graft] def calcBatchPlan(
      text: String): Option[(String, DataFrame => DataFrame)] = {
    val m = calcRe.matcher(text)
    if (!m.matches() || statefulTokenRe.matcher(text).find()) None
    else streamView(m.group(2)).map { _ =>
      val (sel, vName, vAlias0, whereCl) =
        (m.group(1), m.group(2), m.group(3), m.group(4))
      val quals = Seq(Option(vAlias0).getOrElse(vName), vName)
      val items = SqlFrontend.splitTop(sel).map(strip(_, quals))
      (vName, (df: DataFrame) => calcProject(
        whereFilter(df, whereCl, quals),
        if (items == Seq("*")) Nil else items, extra = Nil))
    }
  }

  /** The registered APPEND stream view's DataFrame, for the DDL layer's
    * statement-set multiplexer (it re-sinks the one shared stream). */
  private[graft] def streamViewDf(name: String): Option[DataFrame] =
    streamView(name).map(_.df)

  /** Plain Calc over a CHANGELOG view — the reference's StreamExecCalc
    * on an UPDATING input: a deterministic projection/filter commutes
    * with retraction (a -U/-D row carries the OLD payload, which
    * projects and filters exactly as it did when inserted), so the
    * result is the same changelog with the payload mapped — the row
    * kind rides along as `row_kind`, and a row whose new value leaves
    * the filtered view surfaces as a bare retraction (the whereFilter
    * contract the aggregate routes already rely on). Stateless, zero
    * exchanges. */
  private def calcChangelog(spark: SparkSession,
                            m: java.util.regex.Matcher): DataFrame = {
    val (sel, vName, vAlias0, whereCl) =
      (m.group(1), m.group(2), m.group(3), m.group(4))
    val v = view(vName).get
    val quals = Seq(Option(vAlias0).getOrElse(vName), vName)
    val base = whereFilter(v.df, whereCl, quals)
    val items0 = SqlFrontend.splitTop(sel).map(strip(_, quals))
    val items =
      if (items0 == Seq("*"))
        v.df.columns.filterNot(_ == v.kindCol).toSeq.map(c => s"`$c`")
      else items0
    items.map(itemAlias).foreach { case (_, a) =>
      require(!a.equalsIgnoreCase("row_kind"),
        "changelog Calc: 'row_kind' is reserved — the view's row kind " +
        "rides along automatically")
    }
    calcProject(base, items, extra = Seq(s"`${v.kindCol}` AS row_kind"))
  }

  /** `HAVING <pred>` over the aggregate's OUTPUT aliases — a changelog
    * filter on the updating result ([[Changelog.filterChangelog]]):
    * emits +U when a group enters the filtered view, -U/+U while it
    * stays, and an explicit -D when its new value fails the predicate,
    * so upsert materialization stays correct. */
  private def havingFilter(res: DataFrame, having: String, keyAlias: String,
                           quals: Seq[String],
                           ttl: Option[Changelog.IdleStateTtl]): DataFrame =
    Option(having).map { h =>
      Changelog.filterChangelog(res, keyAlias, "row_kind",
        expr(strip(h, quals)), ttl = ttl)
    }.getOrElse(res)

  /**
   * Try to route `text` onto a changelog operator. Returns None when no
   * supported shape matches a REGISTERED view — the caller then falls
   * through to the batch path. Unsupported constructs on a registered
   * view throw with a pointer at the Scala API, not silently degrade:
   * running an updating view through a batch operator would be wrong,
   * not slow.
   */
  def maybeSql(spark: SparkSession, text: String,
               ttl: Option[Changelog.IdleStateTtl] = None): Option[DataFrame] = {
    val effTtl = ttl.orElse(Changelog.ttlFromConf(spark))
    val tm = topnRe.matcher(text)
    val em = existsRe.matcher(text)
    val jm = joinRe.matcher(text)
    val dm = distinctRe.matcher(text)
    val sdm = selDistinctRe.matcher(text)
    val slm = sortLimitRe.matcher(text)
    val mrm = MatchRecognizeSql.streamEntryRe.matcher(text)
    val tjm = StreamSqlTime.temporalRe.matcher(text)
    val ovm = StreamSqlTime.overRe.matcher(text)
    val gwm = StreamSqlTime.groupWinRe.matcher(text)
    val um = unionRe.matcher(text)
    val cm = calcRe.matcher(text)
    val (soBranches, soOps) = splitSetOp(text)
    if (soOps.nonEmpty && {
          val bm = unionBranchRe.matcher(soBranches.head)
          bm.matches() && view(bm.group(2)).isDefined
        })
      Some(setOp(spark, text, effTtl))
    else if (um.matches() && view(um.group(2)).isDefined)
      Some(unionAll(spark, text, effTtl))
    else if (sdm.matches() && view(sdm.group(2)).isDefined)
      Some(selectDistinct(spark, sdm, effTtl))
    else if (sdm.matches() && streamView(sdm.group(2)).isDefined)
      Some(selectDistinctAppend(spark, sdm, effTtl))
    else if (slm.matches() && view(slm.group(2)).isDefined)
      Some(sortLimit(spark, slm, effTtl))
    else if (tm.matches() && view(tm.group(6)).isDefined)
      Some(topn(spark, tm, effTtl))
    else if (em.matches() && view(em.group(2)).isDefined)
      Some(exists(spark, em, effTtl))
    // rank / existence shapes over APPEND stream views: the view lifts
    // to a constant-+I changelog (the reference runs the cheaper
    // AppendOnlyTopNFunction there — same results, no retractions ever
    // arrive; EXISTS against a churning inner side is the mixed-domain
    // move the join route already makes)
    else if (slm.matches() && streamView(slm.group(2)).isDefined)
      Some(sortLimit(spark, slm, effTtl))
    else if (tm.matches() && streamView(tm.group(6)).isDefined)
      Some(topn(spark, tm, effTtl))
    else if (em.matches() && streamView(em.group(2)).isDefined)
      Some(exists(spark, em, effTtl))
    // time-domain shapes over APPEND-ONLY stream views (registerStream)
    else if (mrm.find() && streamView(mrm.group(1)).isDefined) {
      val v = streamView(mrm.group(1)).get
      Some(MatchRecognizeSql.streamSql(spark, v.df, v.tsCol, v.delay, text))
    }
    else if (tjm.matches() && streamView(tjm.group(2)).isDefined)
      Some(StreamSqlTime.temporal(spark, tjm))
    else if (gwm.matches() && streamView(gwm.group(2)).isDefined &&
             StreamSqlTime.hasGroupWindow(gwm.group(5)))
      Some(StreamSqlTime.groupWindow(spark, gwm))
    // MIXED-DOMAIN join (append stream view × changelog view, either
    // order): the reference joins an insert-only table with an updating
    // table through changelog-mode inference — an append input is just
    // a changelog that never retracts
    // (FlinkChangelogModeInferenceProgram.scala). Routed to joinStmt,
    // which lifts the stream side to a constant-+I changelog.
    else if (jm.matches() && streamView(jm.group(2)).isDefined &&
             view(jm.group(5)).isDefined)
      Some(joinStmt(spark, jm, effTtl))
    else if (jm.matches() && streamView(jm.group(2)).isDefined)
      Some(StreamSqlTime.interval(spark, jm))
    else if (ovm.matches() && streamView(ovm.group(2)).isDefined &&
             java.util.regex.Pattern.compile("(?i)\\bOVER\\s*\\(")
               .matcher(ovm.group(1)).find())
      Some(StreamSqlTime.over(spark, ovm, effTtl))
    // UNWINDOWED GROUP BY over an APPEND stream view: the reference's
    // day-one updating aggregate over an insert-only table — the view
    // lifts to a constant-+I changelog (changelog-mode inference) and
    // runs the same retract-capable operators, which then simply never
    // see a retraction. Group-window statements took the gwm arm above.
    else if (dm.matches() && streamView(dm.group(2)).isDefined &&
             java.util.regex.Pattern
               .compile("(?i)\\bCOUNT\\s*\\(\\s*DISTINCT\\b")
               .matcher(dm.group(1)).find())
      Some(distinct(spark, dm, effTtl))
    else if (dm.matches() && streamView(dm.group(2)).isDefined &&
             dm.group(1).toUpperCase.matches(
               "(?s).*\\b(FIRST_VALUE|LAST_VALUE|LISTAGG|COLLECT)\\b.*"))
      Some(listagg(spark, dm, effTtl))
    else if (dm.matches() && streamView(dm.group(2)).isDefined &&
             dm.group(1).toUpperCase.matches(
               "(?s).*\\b(SUM|AVG|VAR_POP|VAR_SAMP|STDDEV_POP|STDDEV_SAMP|MIN|MAX|COUNT)\\s*\\(.*"))
      Some(groupAgg(spark, dm, effTtl))
    else if (jm.matches() && view(jm.group(2)).isDefined)
      Some(joinStmt(spark, jm, effTtl))
    else if (dm.matches() && view(dm.group(2)).isDefined &&
             // word-bounded: an alias like `distinct_key` must not trip
             // the COUNT(DISTINCT) route
             java.util.regex.Pattern
               .compile("(?i)\\bCOUNT\\s*\\(\\s*DISTINCT\\b")
               .matcher(dm.group(1)).find())
      Some(distinct(spark, dm, effTtl))
    else if (dm.matches() && view(dm.group(2)).isDefined &&
             dm.group(1).toUpperCase.matches(
               "(?s).*\\b(FIRST_VALUE|LAST_VALUE|LISTAGG|COLLECT)\\b.*"))
      Some(listagg(spark, dm, effTtl))
    else if (dm.matches() && view(dm.group(2)).isDefined &&
             dm.group(1).toUpperCase.matches(
               "(?s).*\\b(SUM|AVG|VAR_POP|VAR_SAMP|STDDEV_POP|STDDEV_SAMP|MIN|MAX|COUNT)\\s*\\(.*"))
      Some(groupAgg(spark, dm, effTtl))
    // plain Calc — tried LAST so every stateful shape above keeps its
    // own route; the token guard makes an unrecognized stateful
    // construct fall to the loud scan below rather than silently
    // projecting. Changelog views keep their row kind (`row_kind`
    // rides along); append stream views project statelessly.
    else if (cm.matches() && view(cm.group(2)).isDefined &&
             !statefulTokenRe.matcher(text).find())
      Some(calcChangelog(spark, cm))
    else if (cm.matches() && streamView(cm.group(2)).isDefined &&
             !statefulTokenRe.matcher(text).find())
      Some(calc(spark, cm))
    else {
      // fail-loud contract (object doc): a statement that references a
      // REGISTERED changelog view but matches no supported shape must
      // throw, not fall through — the batch path would fold -U/-D
      // retraction rows as ordinary inserts and return silently wrong
      // results (or a confusing TABLE_OR_VIEW_NOT_FOUND).
      // scan FROM *and* JOIN targets: a join whose OTHER side is
      // unregistered must still fail loudly when a registered view sits
      // after the JOIN keyword
      val hit = scala.collection.mutable.LinkedHashSet.empty[String]
      val hitStream = scala.collection.mutable.LinkedHashSet.empty[String]
      referencedNames(text).foreach { n =>
        if (view(n).isDefined) hit += n
        if (streamView(n).isDefined) hitStream += n
      }
      if (hit.nonEmpty) throw new IllegalArgumentException(
        s"statement references registered changelog view(s) " +
        s"${hit.mkString(", ")} but matches no supported streaming-SQL " +
        "shape (plain SELECT items FROM v [WHERE p] / " +
        "A [INNER|LEFT|RIGHT|FULL] JOIN B ON / WHERE [NOT] " +
        "EXISTS / UNION ALL / INTERSECT / EXCEPT / SELECT DISTINCT / " +
        "ROW_NUMBER() <= k / ORDER BY … LIMIT n / " +
        "COUNT(DISTINCT) / " +
        "FIRST_VALUE|LAST_VALUE|LISTAGG|COLLECT / " +
        "SUM|AVG|VAR_*|STDDEV_*|MIN|MAX|COUNT(*) group aggregates, each " +
        "GROUP BY shape with optional WHERE/HAVING — see StreamSql's " +
        "object doc for the exact grammar); running an updating view " +
        "through a batch operator would be wrong, not slow — use the " +
        "Changelog Scala API (aggregateChangelog[Stats/MinMax/Distinct/" +
        "ListAgg] / joinChangelog[Outer] / joinChangelogSemi/Anti / " +
        s"topNChangelog / filterChangelog) for this query: $text")
      if (hitStream.nonEmpty) throw new IllegalArgumentException(
        s"statement references registered stream view(s) " +
        s"${hitStream.mkString(", ")} but matches no supported " +
        "streaming-SQL shape (plain SELECT items FROM v [WHERE p] / " +
        "SELECT DISTINCT / GROUP BY TUMBLE/HOP/SESSION " +
        "(ts, INTERVAL …) with *_START/_END accessors / AGG(v) OVER " +
        "(PARTITION BY g ORDER BY ts [frame]) / A JOIN B ON a.k = b.k " +
        "AND <ts bound> (interval join) / A JOIN B FOR SYSTEM_TIME AS " +
        "OF a.ts ON a.k = b.k / SELECT * FROM v MATCH_RECOGNIZE (…) — " +
        "see StreamSqlTime's object doc for the " +
        "exact grammar); use the Scala API (StreamOps.tumbleAgg/hopAgg/" +
        "sessionAgg / OverWindow.overAgg / StreamOps.intervalJoin / " +
        "TemporalJoin.streamAsOf / MatchRecognizeSql.stream) for this " +
        s"query: $text")
      None
    }
  }

  /**
   * The table names a statement references, resolved by SPARK'S OWN
   * PARSER (`CatalystSqlParser.parsePlan` → UnresolvedRelations,
   * including inside subquery expressions) — the fail-loud scan's
   * classifier since round 13, so a registered-view-like token inside
   * a string literal no longer trips a spurious rejection. Statements
   * Spark's parser cannot express (the FOR SYSTEM_TIME JOIN dialect —
   * Spark's time-travel clause does not compose with JOIN) fall back
   * to the FROM/JOIN token scan.
   *
   * PARSER-CONSOLIDATION NOTE (the round-12 review's ask, evaluated):
   * full plan-walk ROUTING — deriving each route's parameters from the
   * parsed LogicalPlan instead of the anchored regexes — was probed
   * this round: every routed shape except the temporal join parses
   * under CatalystSqlParser, so the walk is feasible for 8 of 9
   * routes. Declined for now on risk/benefit: the rewrites operate on
   * the ORIGINAL text's qualifier conventions (strip/requal), each
   * route's parameter extraction from unresolved plan nodes
   * (UnresolvedAttribute nameParts, WindowSpecDefinitions, BETWEEN
   * desugared into >=/<= conjunctions) re-implements exactly the
   * validation the regexes already spec, the 28-spec + 18-oracle-gate
   * corpus pins today's grammar byte-for-byte, and one route would
   * still need a text path. The consolidation step taken instead is
   * this classifier: shape DETECTION now rides Spark's parser, which
   * is where the regex approach was actually wrong (literals), while
   * the per-route grammar stays anchored and fail-loud.
   */
  private def referencedNames(text: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    try {
      def walk(p: LogicalPlan): Unit = p.foreach { node =>
        node match {
          case u: UnresolvedRelation => out += u.multipartIdentifier.last
          case _ => ()
        }
        node.expressions.foreach(_.foreach {
          case sq: SubqueryExpression => walk(sq.plan)
          case _ => ()
        })
      }
      walk(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parsePlan(text))
    } catch {
      case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        val fm = java.util.regex.Pattern
          .compile("(?i)\\b(?:FROM|JOIN)\\s+(\\w+)").matcher(text)
        while (fm.find()) out += fm.group(1)
    }
    out.toSeq
  }

  /** A view's payload serialized for the generic join operators: (key,
    * kind, binary payload) — the payload struct's UnsafeRow image
    * ([[Changelog.Bin]] / [[graft.plans.StructPack]]), the same binary
    * row serialization the reference pays writing payloads into keyed
    * state (BinaryRowData), with no text codec on the path. Unwrapped
    * back to the view's schema after the operator (zero-copy
    * StructUnpack). `K`/`keyCast` come from [[joinKeyEnc]]: Long for
    * integral key columns, canonical String otherwise. */
  private def encodeView[K: scala.reflect.runtime.universe.TypeTag](
      df: DataFrame, kindCol: String,
      keyCol: String, keyCast: String,
      preCast: Option[String] = None): Dataset[(K, String, Changelog.Bin)] =
    encodeViewKeyed[K](df, kindCol,
      preCast.foldLeft(col(keyCol))((c, t) => c.cast(t)).cast(keyCast))

  /** [[encodeView]]'s primitive: the state key as an arbitrary Column
    * expression over the view (single keys cast their column; COMPOSITE
    * keys pack the normalized key struct — [[compositeKey]]). */
  private def encodeViewKeyed[K: scala.reflect.runtime.universe.TypeTag](
      df: DataFrame, kindCol: String,
      key: Column): Dataset[(K, String, Changelog.Bin)] = {
    implicit val enc3: Encoder[(K, String, Changelog.Bin)] = ExpressionEncoder()
    val payload = df.columns.filterNot(_ == kindCol).toSeq
    df.select(key, col(kindCol).cast("string"),
              Changelog.packPayload(payload))
      .as[(K, String, Changelog.Bin)]
  }

  /** Canonical COMPOSITE state key: the per-pair-normalized key columns
    * packed as ONE struct's canonical UnsafeRow image
    * ([[graft.plans.StructPack]] — equal values ⇒ equal bytes, the
    * StructTransportSpec canonicity property), base64'd into the String
    * key domain. The reference keys multi-column joins the same way —
    * one BinaryRowData key selector over the key fields
    * (flink-table/flink-table-planner-blink KeySelectorUtil /
    * BinaryRowDataKeySelector) — not by concatenating text (separator
    * collisions) or hashing (silent collisions). Null fields never
    * reach here: [[nullKeyGuard]] runs per key column first. */
  private[streaming] def compositeKey(cols: Seq[Column]): Column =
    base64(org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.StructPack(org.apache.spark.sql.graftbridge.Bridge
        .expression(struct(cols: _*)))))

  /** [[joinKeyEnc]]'s coercion table applied to ONE `l.k = r.k` pair of
    * a composite key: both integral → long; same type → as-is; mixed
    * numeric → double (exact to 2^53); anything else rejects loudly. */
  private[streaming] def pairCastType(lt: org.apache.spark.sql.types.DataType,
                           rt: org.apache.spark.sql.types.DataType,
                           pair: String): Option[String] = {
    import org.apache.spark.sql.types.NumericType
    if (isIntegralType(lt) && isIntegralType(rt)) Some("long")
    else if (lt == rt) None
    else if (lt.isInstanceOf[NumericType] && rt.isInstanceOf[NumericType])
      Some("double")
    else throw new IllegalArgumentException(
      s"streaming join key pair '$pair' types differ (${lt.simpleString} " +
      s"vs ${rt.simpleString}) and share no canonical key form — derive " +
      "a common-typed key column in the views")
  }

  /** A compiled residual condition over BOTH sides' packed payloads —
    * the SQL surface of the join operators' `cond` lambda (the
    * reference's generated JoinCondition,
    * flink-table/flink-table-planner-blink/src/main/scala/org/apache/
    * flink/table/planner/codegen/JoinCondType — consumed by
    * StreamingJoinOperator). The Catalyst predicate compiles lazily
    * once per task (codegen'd objects are not serializable — the
    * StructPack/RowPacker discipline) and evaluates on a JoinedRow over
    * the two UnsafeRow payload images, zero-copy `pointTo`.
    * Three-valued logic: a NULL result is NOT a match — SQL ON
    * semantics, and BasePredicate.eval already folds null → false. */
  private final class BinJoinCond(
      lFields: Int, rFields: Int,
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
    extends ((Changelog.Bin, Changelog.Bin) => Boolean) with Serializable {
    @transient private lazy val pred = {
      val p = org.apache.spark.sql.catalyst.expressions.Predicate
        .create(cond, out.toList)
      p.initialize(0)
      p
    }
    @transient private lazy val jr =
      new org.apache.spark.sql.catalyst.expressions.JoinedRow
    override def apply(l: Changelog.Bin, r: Changelog.Bin): Boolean = {
      val lr = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(lFields)
      lr.pointTo(l.bytes, l.bytes.length)
      val rr = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(rFields)
      rr.pointTo(r.bytes, r.bytes.length)
      pred.eval(jr(lr, rr))
    }
  }

  /** Compile CROSS-SIDE residual conjuncts into the operators' `cond`
    * lambda: side qualifiers rewrite to side-tagged column names
    * (literal-opaque), the predicate resolves through the REAL analyzer
    * over an empty relation of the two payload schemas (full
    * function/coercion surface, not a hand-rolled resolver), and the
    * resolved condition ships with the relation's output attributes so
    * [[BinJoinCond]] binds it to the concatenated (left ++ right)
    * payload layout its JoinedRow presents. */
  private def compileResidualCond(
      spark: SparkSession,
      lSchema: org.apache.spark.sql.types.StructType,
      rSchema: org.apache.spark.sql.types.StructType,
      lQuals: Seq[String], rQuals: Seq[String],
      residuals: Seq[String]): (Changelog.Bin, Changelog.Bin) => Boolean = {
    def tag(e: String): String = SqlFrontend.rewriteOutsideLiterals(e) { t =>
      val lp = lQuals.map(java.util.regex.Pattern.quote).mkString("|")
      val rp = rQuals.map(java.util.regex.Pattern.quote).mkString("|")
      t.replaceAll(s"(?i)\\b($lp)\\s*\\.\\s*", "__l_")
       .replaceAll(s"(?i)\\b($rp)\\s*\\.\\s*", "__r_")
    }
    val text = residuals.map(r => s"(${tag(r)})").mkString(" AND ")
    val schema = org.apache.spark.sql.types.StructType(
      lSchema.fields.map(f => f.copy(name = "__l_" + f.name)) ++
      rSchema.fields.map(f => f.copy(name = "__r_" + f.name)))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val analyzed =
      try empty.filter(expr(text)).queryExecution.analyzed
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"JOIN residual does not resolve against the two views' " +
          s"payload columns (every column reference must be qualified " +
          s"with its side's alias): ${residuals.mkString(" AND ")}", e)
      }
    val (condE, out) = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        (f.condition, f.child.output)
    }.getOrElse(throw new IllegalStateException(
      s"residual analysis produced no Filter node: $text"))
    new BinJoinCond(lSchema.length, rSchema.length, condE, out)
  }

  private def isIntegralType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** Pick the state-key encoding for a key expression: integral types
    * key as Long (the classic path, bit-identical to prior rounds);
    * anything else keys as its canonical string form — collision-free
    * for any one type, no user-side hashing (object doc "Keys"). */
  private[streaming] def isIntegralKey(df: DataFrame, keyExpr: String): Boolean =
    isIntegralType(df.select(expr(keyExpr)).schema.head.dataType)

  /** The rank family keys row identity as Long — a lossy rowId cast
    * (double → truncation merges distinct rows, string → null dies deep
    * in the state encoder) must fail loudly at routing time instead. */
  private def requireIntegralRowId(df: DataFrame, rowIdCol: String,
                                   route: String): Unit = {
    val dt = df.schema(rowIdCol).dataType
    require(isIntegralType(dt),
      s"streaming $route rowId '$rowIdCol' must be an integral column " +
      s"(got ${dt.simpleString}) — the rank state keys row identity as " +
      "Long; derive an integral id column in the view")
  }

  /** Cross-side key plan for the TWO-SIDED routes (EXISTS / JOIN): the
    * two key columns must share ONE canonical state-key form, or the
    * equality silently matches nothing (an integral "42" never equals
    * a double's "42.0" as strings). Both integral → the Long path;
    * SAME type → that type's canonical string directly (exact for any
    * width, decimals included); MIXED numeric types → normalize to
    * double first — SQL's own coercion, exact for |v| ≤ 2^53 (beyond
    * that, derive a common exact-typed key column in the view);
    * anything else is an ambiguous coercion we reject (the Flink
    * key-selector normalization is the user-side fix). */
  private[streaming] sealed trait KeyEnc
  private[streaming] case object LongKey extends KeyEnc
  private[streaming] final case class StringKey(preCast: Option[String])
    extends KeyEnc
  private[streaming] def joinKeyEnc(ldf: DataFrame, lKey: String,
                                    rdf: DataFrame, rKey: String): KeyEnc = {
    val lt = ldf.select(col(lKey)).schema.head.dataType
    val rt = rdf.select(col(rKey)).schema.head.dataType
    import org.apache.spark.sql.types.NumericType
    if (isIntegralType(lt) && isIntegralType(rt)) LongKey
    else if (lt == rt) StringKey(None)
    else if (lt.isInstanceOf[NumericType] && rt.isInstanceOf[NumericType])
      StringKey(Some("double"))
    else throw new IllegalArgumentException(
      s"streaming join key types differ (${lt.simpleString} vs " +
      s"${rt.simpleString}) and share no canonical key form — derive a " +
      "common-typed key column in the views (the reference's key " +
      "selector performs the same normalization)")
  }

  /** SQL null-equality discipline for the two-sided routes: a NULL key
    * never matches, so on a non-preserved side null-keyed rows are
    * simply FILTERED (they cannot affect the result); on a PRESERVED
    * or anti side they WOULD affect the result (null-padded / NOT
    * EXISTS emission), which the keyed-state operators don't model —
    * those raise a clear error instead of silently pairing null with
    * null (what a bare string-cast key would do) or crashing in the
    * encoder (what the old long cast did). */
  private[streaming] def nullKeyGuard(df: DataFrame, keyCol: String,
                                      affectsOutput: Boolean,
                                      what: String): DataFrame =
    if (!affectsOutput) df.filter(col(keyCol).isNotNull)
    else df.filter(expr(
      s"`$keyCol` IS NOT NULL OR raise_error('streaming $what: a NULL " +
      "join key on a preserved/anti side would change the output (SQL " +
      "null-equality never matches) — filter or coalesce it in the view')"))

  // ---- UNION ALL → changelog-preserving union ---------------------------

  /** Split a statement on TOP-LEVEL `UNION ALL` (parenthesis-depth
    * aware, string-literal opaque — the splitAnd discipline), so 3+
    * branch unions parse branch-by-branch instead of backtracking into
    * one garbled select list. */
  private def splitUnionAll(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    // keyword matching over the full string (the splitAnd discipline),
    // not a fixed-width window: `UNION` and `ALL` may be separated by
    // any run of whitespace, and the word-boundary check after ALL
    // tests the real string, never a window edge ('UNION   ALLIES'
    // must not split)
    def keywordAt(j: Int, w: String): Boolean =
      j + w.length <= s.length && s.regionMatches(true, j, w, 0, w.length) && {
        val after = j + w.length
        after >= s.length || {
          val c = s.charAt(after)
          !Character.isLetterOrDigit(c) && c != '_'
        }
      }
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' => i = SqlFrontend.skipLiteral(s, i)
        case c if depth == 0 && Character.isWhitespace(c) &&
                  keywordAt(i + 1, "UNION") =>
          var j = i + 1 + 5
          while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
          if (j > i + 6 && keywordAt(j, "ALL")) {
            out += s.substring(start, i)
            i = j + 3
            start = i
          } else i += 1
        case _ => i += 1
      }
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private val unionBranchRe = java.util.regex.Pattern.compile(
    "(?is)^SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)" +
    "(?:\\s+(?:AS\\s+)?(?!WHERE\\b)(\\w+))?(?:\\s+WHERE\\s+(.+?))?\\s*$")

  /** `SELECT <items> FROM A [WHERE p] UNION ALL SELECT <items> FROM B
    * [WHERE p] [UNION ALL …]` over registered changelog views — the
    * trivially changelog-preserving set op the reference plans day-one
    * (a union of changelogs is the changelog of the union). Branches
    * align POSITIONALLY (standard UNION ALL), output column names come
    * from the first branch, and each branch's row kind is emitted as
    * `row_kind`.
    *
    * Branch `WHERE` runs as a CHANGELOG-MODE filter
    * ([[Changelog.filterChangelog]], keyed on the view's declared
    * rowId): the union's output feeds a sink of unknown mode, so a row
    * whose new value fails the predicate must surface as an explicit
    * -D — a stateless pre-filter would pass the bare -U and an upsert
    * materialization would keep the stale row forever (the same
    * reasoning as HAVING; the stateless version is only correct where
    * the consumer is a retract-aware operator, as in the pre-aggregate
    * WHERE of the GROUP BY shapes). A branch with WHERE therefore
    * requires `registerChangelog(..., rowId = …)`.
    *
    * No `row_ord` — independent per-key logs carry no global order;
    * re-register the result and aggregate it (the chaining pattern),
    * or materialize via the foreachBatch batch id when each branch
    * follows the GroupAggFunction protocol on disjoint keys. */
  private def unionAll(spark: SparkSession, text: String,
                       ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val branches = splitUnionAll(text)
    require(branches.length >= 2, s"not a UNION ALL statement: $text")
    val parsed = branches.map { b =>
      val m = unionBranchRe.matcher(b)
      require(m.matches(), s"unparseable UNION ALL branch (expected " +
        s"SELECT <items> FROM <view> [WHERE <pred>]): $b")
      val name = m.group(2)
      val v = view(name).getOrElse(throw new IllegalArgumentException(
        s"UNION ALL over unregistered view '$name' — every branch of a " +
        "streaming union must be a registered changelog view"))
      (v, name, m.group(1), Option(m.group(3)), Option(m.group(4)))
    }
    val dfs = parsed.map { case (v, name, sel, alias, whereCl) =>
      val qualifiers = Seq(alias.orNull, name)
      val f = whereCl match {
        case None => v.df
        case Some(w) =>
          val rid = v.rowIdCol.getOrElse(throw new IllegalArgumentException(
            "UNION ALL branch WHERE needs the view's upsert key: " +
            "registerChangelog(..., rowId = Some(col)) — the branch " +
            "filter is changelog-MODE (explicit -D when a row's new " +
            "value fails the predicate), keyed on the row identity"))
          Changelog.filterChangelog(v.df, rid, v.kindCol,
            expr(strip(w, qualifiers)), ttl = ttl)
      }
      val items = SqlFrontend.splitTop(sel).map(strip(_, qualifiers))
      require(items != Seq("*"), "streaming UNION ALL needs explicit " +
        "projection items (branches align positionally)")
      f.selectExpr(items :+ s"${v.kindCol} AS row_kind": _*)
    }
    val arity = dfs.head.columns.length
    dfs.tail.foreach(d => require(d.columns.length == arity,
      s"UNION ALL branches must have the same arity: " +
      s"${arity - 1} vs ${d.columns.length - 1} items"))
    dfs.reduce(_ union _)
  }

  // ---- INTERSECT / EXCEPT → distinct + semi/anti changelog join ---------

  /** Split a statement on TOP-LEVEL `INTERSECT` / `EXCEPT` / `MINUS`
    * (parenthesis-depth aware, string-literal opaque — the
    * splitUnionAll discipline). Returns the branches plus, per split
    * point, the operator keyword and its optional ALL/DISTINCT
    * modifier (consumed out of the following branch text). */
  private[streaming] def splitSetOp(s: String): (Seq[String], Seq[(String, Option[String])]) = {
    val branches = scala.collection.mutable.ArrayBuffer.empty[String]
    val ops = scala.collection.mutable.ArrayBuffer.empty[(String, Option[String])]
    var depth = 0
    var start = 0
    var i = 0
    def keywordAt(j: Int, w: String): Boolean =
      j + w.length <= s.length && s.regionMatches(true, j, w, 0, w.length) && {
        val after = j + w.length
        after >= s.length || {
          val c = s.charAt(after)
          !Character.isLetterOrDigit(c) && c != '_'
        }
      }
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' => i = SqlFrontend.skipLiteral(s, i)
        case c if depth == 0 && Character.isWhitespace(c) &&
                  (keywordAt(i + 1, "INTERSECT") || keywordAt(i + 1, "EXCEPT") ||
                   keywordAt(i + 1, "MINUS")) =>
          val kw = Seq("INTERSECT", "EXCEPT", "MINUS")
            .find(k => keywordAt(i + 1, k)).get
          branches += s.substring(start, i)
          var j = i + 1 + kw.length
          while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
          val mod =
            if (keywordAt(j, "ALL")) { val m = Some("ALL"); j += 3; m }
            else if (keywordAt(j, "DISTINCT")) { val m = Some("DISTINCT"); j += 8; m }
            else None
          ops += ((kw, mod))
          i = j
          start = i
        case _ => i += 1
      }
    }
    branches += s.substring(start)
    (branches.map(_.trim).filter(_.nonEmpty).toSeq, ops.toSeq)
  }

  /** `SELECT <items> FROM A [WHERE p] INTERSECT|EXCEPT SELECT <items>
    * FROM B [WHERE p]` over registered changelog views — see the
    * object doc bullet. Both branches project positionally-aligned,
    * TYPE-identical items; the whole projected row (its canonical
    * UnsafeRow image) is the state key; the result is the distinct
    * membership changelog: +I when a row value enters the set
    * (INTERSECT: live in A AND in B; EXCEPT: live in A and NOT in B),
    * -D when it leaves. */
  private def setOp(spark: SparkSession, text: String,
                    ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (branches, ops) = splitSetOp(text)
    require(branches.length == 2 && ops.length == 1,
      s"streaming INTERSECT/EXCEPT supports exactly two branches — " +
      s"register the intermediate result to chain set ops: $text")
    val (kw, mod) = ops.head
    require(!mod.contains("ALL"),
      s"streaming $kw ALL is not supported: the reference's stream rule " +
      "set rewrites only the DISTINCT forms (ReplaceIntersectWithSemiJoin" +
      "Rule / ReplaceMinusWithAntiJoinRule); use the batch path, or " +
      "GROUP BY with COUNT(*) to carry multiplicities explicitly")
    val anti = !kw.equalsIgnoreCase("INTERSECT")

    val parsed = branches.map { b =>
      val m = unionBranchRe.matcher(b)
      require(m.matches(), s"unparseable $kw branch (expected " +
        s"SELECT <items> FROM <view> [WHERE <pred>]): $b")
      val name = m.group(2)
      val v = view(name).getOrElse(throw new IllegalArgumentException(
        s"$kw over unregistered view '$name' — both branches of a " +
        "streaming set op must be registered changelog views"))
      (v, name, m.group(1), Option(m.group(3)), Option(m.group(4)))
    }
    val projected = parsed.map { case (v, name, sel, alias, whereCl) =>
      val qualifiers = Seq(alias.orNull, name)
      val f = whereCl match {
        case None => v.df
        case Some(w) =>
          val rid = v.rowIdCol.getOrElse(throw new IllegalArgumentException(
            s"$kw branch WHERE needs the view's upsert key: " +
            "registerChangelog(..., rowId = Some(col)) — the branch " +
            "filter is changelog-MODE (explicit -D when a row's new " +
            "value fails the predicate), keyed on the row identity"))
          Changelog.filterChangelog(v.df, rid, v.kindCol,
            expr(strip(w, qualifiers)), ttl = ttl)
      }
      val items = SqlFrontend.splitTop(sel).map(strip(_, qualifiers))
      require(items != Seq("*"), s"streaming $kw needs explicit " +
        "projection items (branches align positionally)")
      (f.selectExpr(items :+ s"${v.kindCol} AS __kind": _*), v)
    }
    val Seq((ldf, _), (rdf, _)) = projected
    require(ldf.columns.length == rdf.columns.length,
      s"$kw branches must have the same arity: " +
      s"${ldf.columns.length - 1} vs ${rdf.columns.length - 1} items")
    val lTypes = ldf.schema.dropRight(1).map(_.dataType)
    val rTypes = rdf.schema.dropRight(1).map(_.dataType)
    lTypes.zip(rTypes).zipWithIndex.foreach { case ((lt, rt), idx) =>
      // catalogString ignores nullability at every nesting level —
      // null bits live in the value image, not the schema layout
      require(lt.catalogString == rt.catalogString,
        s"$kw branch item ${idx + 1} types differ (${lt.simpleString} vs " +
        s"${rt.simpleString}) — the whole-row state key needs identical " +
        "canonical images; CAST the item in the view or the statement")
    }

    implicit val enc3: Encoder[(String, String, Changelog.Bin)] =
      ExpressionEncoder()
    val lDistinct = Changelog.distinctChangelog(encodeRowKeyed(ldf), ttl)
      .map(e => (e.key, e.kind, e.left))
    val rEnc = encodeRowKeyed(rdf)
    val joined =
      (if (anti) Changelog.joinChangelogAnti(lDistinct, rEnc, ttl = ttl)
       else Changelog.joinChangelogSemi(lDistinct, rEnc, ttl = ttl)).toDF()
    decodeRowKeyed(joined, ldf)
  }

  /** Encode a projected changelog branch (payload columns + `__kind`)
    * as (canonical row-image hex, kind, packed payload) — the key IS
    * the payload's canonical form, so the whole-row-keyed operators'
    * key-determines-payload contract holds by construction. Shared by
    * the set-op and SELECT DISTINCT routes. */
  private def encodeRowKeyed(df: DataFrame)(
      implicit e: Encoder[(String, String, Changelog.Bin)])
      : Dataset[(String, String, Changelog.Bin)] = {
    val payload = df.columns.filterNot(_ == "__kind").toSeq
    df.select(Changelog.packPayload(payload).as("__p"),
              col("__kind").cast("string").as("__k"))
      .select(hex(col("__p.bytes")).as("_1"), col("__k").as("_2"),
              col("__p").as("_3"))
      .as[(String, String, Changelog.Bin)]
  }

  /** Inverse of [[encodeRowKeyed]] for an operator output carrying
    * (`left` packed payload, `kind`, `ord`): unpack back to the
    * projected columns + row_kind/row_ord, named from the branch
    * DataFrame the payload was packed from. */
  private def decodeRowKeyed(opOut: DataFrame, branch: DataFrame): DataFrame = {
    val outCols = branch.columns.filterNot(_ == "__kind").toSeq
    val schema = branch.select(outCols.map(col): _*).schema
    opOut
      .select(Changelog.unpackPayload(col("left.bytes"), schema).as("__p"),
              col("kind").as("row_kind"), col("ord").as("row_ord"))
      .select(outCols.map(c => col(s"__p.`$c`")) :+
              col("row_kind") :+ col("row_ord"): _*)
  }

  /**
   * `SELECT DISTINCT <items> FROM <view> [WHERE p]` over a changelog
   * view — the reference plans distinct on an updating input as an
   * Aggregate with no aggregate calls (grouped on all columns), the
   * same distinct machinery its set-op rewrite shares. Routed onto
   * [[Changelog.distinctChangelog]] keyed on the projected row's
   * canonical UnsafeRow image: a value's membership emits +I on its
   * 0→1 live-instance transition and -D on 1→0, so deleting one of two
   * equal rows changes nothing downstream. WHERE is the changelog-MODE
   * filter (explicit -D when a row's new value fails the predicate),
   * same contract as the set-op branches.
   */
  private def selectDistinct(spark: SparkSession,
                             m: java.util.regex.Matcher,
                             ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (sel, name, alias, whereCl) =
      (m.group(1), m.group(2), Option(m.group(3)), Option(m.group(4)))
    val v = view(name).get
    val qualifiers = Seq(alias.orNull, name)
    whereCl.foreach(requireNoSubquery(_, "SELECT DISTINCT"))
    val f = whereCl match {
      case None => v.df
      case Some(w) =>
        val rid = v.rowIdCol.getOrElse(throw new IllegalArgumentException(
          "SELECT DISTINCT with WHERE needs the view's upsert key: " +
          "registerChangelog(..., rowId = Some(col)) — the filter is " +
          "changelog-MODE (explicit -D when a row's new value fails " +
          "the predicate), keyed on the row identity"))
        Changelog.filterChangelog(v.df, rid, v.kindCol,
          expr(strip(w, qualifiers)), ttl = ttl)
    }
    val items = SqlFrontend.splitTop(sel).map(strip(_, qualifiers))
    require(items != Seq("*"), "streaming SELECT DISTINCT needs explicit " +
      "projection items (the distinct key is the projected row)")
    val pdf = f.selectExpr(items :+ s"${v.kindCol} AS __kind": _*)
    implicit val enc3: Encoder[(String, String, Changelog.Bin)] =
      ExpressionEncoder()
    decodeRowKeyed(
      Changelog.distinctChangelog(encodeRowKeyed(pdf), ttl).toDF(), pdf)
  }

  /**
   * `SELECT DISTINCT <items> FROM <stream view> [WHERE p]` over an
   * APPEND-ONLY [[registerStream]] view — running distinct on an
   * insert-only input, the reference's group aggregate without
   * aggregate calls over an append table (its changelog-mode inference
   * marks the result insert-only: values only ever ENTER the distinct
   * set). Same machinery as the changelog route with every row an
   * insert — the first occurrence of a projected row value emits +I,
   * duplicates are silent, and nothing ever retracts (`row_kind` is
   * constant +I, kept for sink-shape uniformity). WHERE is a plain
   * stateless pre-filter (no row identity needed on an append input).
   * State per key is O(1) (a count) keyed by the value's canonical
   * image — bounded by DISTINCT live values, not stream length; `ttl`
   * (or `spark.graft.state.ttl.ms`) bounds idle values, the
   * reference's state-retention knob for exactly this operator.
   */
  private def selectDistinctAppend(spark: SparkSession,
                                   m: java.util.regex.Matcher,
                                   ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (sel, name, alias, whereCl) =
      (m.group(1), m.group(2), Option(m.group(3)), Option(m.group(4)))
    val v = streamView(name).get
    val qualifiers = Seq(alias.orNull, name)
    whereCl.foreach(requireNoSubquery(_, "SELECT DISTINCT"))
    val f = whereCl match {
      case None => v.df
      case Some(w) => v.df.filter(expr(strip(w, qualifiers)))
    }
    val items = SqlFrontend.splitTop(sel).map(strip(_, qualifiers))
    require(items != Seq("*"), "streaming SELECT DISTINCT needs explicit " +
      "projection items (the distinct key is the projected row)")
    val pdf = f.selectExpr(items: _*).withColumn("__kind", lit(Changelog.Insert))
    implicit val enc3: Encoder[(String, String, Changelog.Bin)] =
      ExpressionEncoder()
    decodeRowKeyed(
      Changelog.distinctChangelog(encodeRowKeyed(pdf), ttl).toDF(), pdf)
  }

  /**
   * `SELECT <items> FROM <view> [WHERE p] ORDER BY <s> [ASC|DESC]
   * [, <rowId>] LIMIT n` over a changelog view — the reference's
   * StreamExecSortLimit (`PLANNER/plan/nodes/physical/stream/
   * StreamExecSortLimit.scala`): a GLOBAL updating Top-N, i.e. the rank
   * operator with no PARTITION BY. Routed onto
   * [[Changelog.topNChangelog]] under one constant key — state is the
   * live (rowId → score) map capped at the top n, retractions re-admit
   * runners-up, exactly the partitioned route's machinery. The same
   * restrictions apply: the view declares its upsert key (rowId), the
   * optional explicit tiebreak must BE that rowId ascending, and
   * projection items may reference only the order expression and the
   * rowId (the rank state's columns).
   *
   * Scale shape: a global order is inherently a singleton — every
   * update converges on one key, as in the reference (SortLimit's
   * RetractableTopNFunction runs at parallelism 1). State stays O(live
   * rows) in the id→score map but only the top n produce emissions;
   * for large n or hot update rates, pre-aggregate or Top-N per
   * partition first (the partitioned ROW_NUMBER route), then LIMIT the
   * union — the same two-level pattern the reference plans for global
   * rank.
   *
   * Numeric note (shared with the partitioned Top-N route): the ORDER
   * BY expression is coerced to DOUBLE for the rank state, so the
   * emitted order column is DOUBLE and integral order values beyond
   * 2^53 lose precision (distinct BIGINTs could merge in the state) —
   * pre-scale or hash such values into ≤ 2^53 in the view. The ASC
   * path negates scores into state and restores them as `0.0 − s` on
   * exit, so a zero order value emits as +0.0, never -0.0.
   */
  private def sortLimit(spark: SparkSession, m: java.util.regex.Matcher,
                        ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (sel, vName, vAlias0, whereCl, orderBy, nStr) =
      (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5),
       m.group(6))
    val n = nStr.toInt
    val v = liftedView(vName).get
    val quals = Seq(vAlias0, vName)
    val rowIdCol = v.rowIdCol.getOrElse(throw new IllegalArgumentException(
      s"streaming ORDER BY … LIMIT over '$vName' needs its upsert key: " +
      "registerChangelog(..., rowId = Some(col)) — the reference's " +
      "SortLimit similarly requires the input's unique key"))
    requireIntegralRowId(v.df, rowIdCol, "ORDER BY … LIMIT")
    val f = whereCl match {
      case null | "" => v.df
      case w =>
        requireNoSubquery(w, "ORDER BY … LIMIT")
        Changelog.filterChangelog(v.df, rowIdCol, v.kindCol,
          expr(strip(w, quals)), ttl = ttl)
    }
    val ordParts = SqlFrontend.splitTop(orderBy)
    val dirRe = java.util.regex.Pattern
      .compile("(?is)^(.+?)(?:\\s+(ASC|DESC))?\\s*$")
    val m0 = dirRe.matcher(ordParts.head); require(m0.matches())
    val sExpr = m0.group(1).trim
    val desc = m0.group(2) != null && m0.group(2).equalsIgnoreCase("DESC")
    ordParts.tail.foreach { p =>
      val mi = dirRe.matcher(p); require(mi.matches())
      require(norm(strip(mi.group(1), quals)) == norm(rowIdCol) &&
              (mi.group(2) == null || mi.group(2).equalsIgnoreCase("ASC")),
        s"SortLimit tiebreak must be the rowId '$rowIdCol' ascending: " +
        orderBy)
    }
    implicit val enc4: Encoder[(Long, String, Double, Long)] =
      ExpressionEncoder()
    implicit val keyEnc: Encoder[Long] = ExpressionEncoder()
    val base = f
      .withColumn("__s", expr(strip(sExpr, quals)).cast("double"))
      .select(lit(0L).as("__g"), col(v.kindCol).cast("string"), col("__s"),
              col(rowIdCol).cast("long"))
      .as[(Long, String, Double, Long)]
    val top = Changelog.topNChangelog[Long, (Long, String, Double, Long)](
      base.groupByKey(_._1), n,
      kind = _._2, score = t => if (desc) t._3 else -t._3, rowId = _._4,
      ttl = ttl).toDF()
    val (ns, nid) = (norm(strip(sExpr, quals)), norm(rowIdCol))
    val named = SqlFrontend.splitTop(sel).map { item =>
      val (e, alias) = itemAlias(strip(item, quals))
      norm(e) match {
        case `nid` => col("rowId").as(alias)
        case `ns` =>
          // 0.0 - s, not -s: IEEE negation of +0.0 is -0.0, which would
          // surface a spurious negative zero on ASC zero-valued orders
          (if (desc) col("score") else lit(0.0) - col("score")).as(alias)
        case _ => throw new IllegalArgumentException(
          "SortLimit projection may reference only the order expression " +
          s"and the rowId (the rank state's columns): $item")
      }
    }
    top.select(named :+
      col("kind").as("row_kind") :+ col("ord").as("row_ord"): _*)
  }

  // ---- WHERE [NOT] EXISTS → semi/anti changelog join --------------------

  private def exists(spark: SparkSession, m: java.util.regex.Matcher,
                     ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (sel, lName, lAlias0, anti, rName, rAlias0, innerWhere) =
      (m.group(1), m.group(2), m.group(3), m.group(4) != null,
       m.group(5), m.group(6), m.group(7))
    val lv = liftedView(lName).get
    val rv = liftedView(rName).getOrElse(throw new IllegalArgumentException(
      s"EXISTS subquery over unregistered view '$rName' — both sides of a " +
      "streaming EXISTS must be registered views (changelog, or an " +
      "append stream view lifted to an insert-only changelog)"))
    val lAlias = Option(lAlias0).getOrElse(lName)
    val rAlias = Option(rAlias0).getOrElse(rName)
    // same disjointness contract as joinStmt: key-equality attribution
    // matches qualifiers case-insensitively, so a collision between the
    // outer alias and the inner view's name/alias could silently swap
    // lKey/rKey; a self-EXISTS on one registered view is just as
    // ambiguous — re-register the view under a second name instead
    require(!lName.equalsIgnoreCase(rName),
      s"streaming self-EXISTS on '$lName': register the view a second " +
      "time under a different name (qualifier attribution needs " +
      "distinct names per side)")
    val lQuals = Set(lAlias.toLowerCase, lName.toLowerCase)
    val rQuals = Set(rAlias.toLowerCase, rName.toLowerCase)
    require((lQuals & rQuals).isEmpty,
      s"streaming EXISTS qualifiers must be disjoint between the outer " +
      s"query and the subquery: {$lAlias, $lName} vs {$rAlias, $rName}")

    val conj = splitAnd(innerWhere)
    val qual = "(\\w+)\\.(\\w+)"
    val eqRe = s"(?s)^$qual\\s*=\\s*$qual$$".r
    // cross-side equalities form the (possibly COMPOSITE) state key —
    // the joinStmt discipline applied to the semi/anti route
    val keyPairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val residuals = scala.collection.mutable.ArrayBuffer.empty[String]
    conj.foreach {
      case c @ eqRe(q1, c1, q2, c2)
          if (q1.equalsIgnoreCase(lAlias) && q2.equalsIgnoreCase(rAlias)) ||
             (q1.equalsIgnoreCase(rAlias) && q2.equalsIgnoreCase(lAlias)) =>
        if (q1.equalsIgnoreCase(lAlias)) keyPairs += ((c1, c2))
        else keyPairs += ((c2, c1))
        val _ = c
      case resid => residuals += resid
    }
    require(keyPairs.nonEmpty,
      s"streaming EXISTS needs at least one <outer>.k = <inner>.k " +
      s"equality: $innerWhere")

    val lPayloadCols = lv.df.columns.filterNot(_ == lv.kindCol).toSeq
    val rPayloadCols = rv.df.columns.filterNot(_ == rv.kindCol).toSeq
    val lPaySchema = lv.df.select(lPayloadCols.map(col): _*).schema
    val rPaySchema = rv.df.select(rPayloadCols.map(col): _*).schema

    // Residual routing: an INNER-side-only predicate pre-filters the
    // right view (changelog-preserving, shrinks state — see object
    // doc); a residual referencing the OUTER row (alone or with inner
    // columns) CANNOT pre-filter either side — on NOT EXISTS a failing
    // outer row must still EMIT (the subquery is empty for it), and a
    // pre-filter would drop it — so it compiles into the semi/anti
    // operators' condition over the packed payloads (the reference's
    // generated JoinCondition in StreamingSemiAntiJoinOperator).
    def refsSide(e: String, a: String, n: String): Boolean =
      e.matches("(?is).*\\b(" + java.util.regex.Pattern.quote(a) + "|" +
        java.util.regex.Pattern.quote(n) + ")\\s*\\..*")
    var rFiltered = rv.df
    val condResiduals = scala.collection.mutable.ArrayBuffer.empty[String]
    residuals.foreach { resid =>
      val onL = refsSide(resid, lAlias, lName)
      val onR = refsSide(resid, rAlias, rName)
      require(onL || onR, s"EXISTS residual '$resid' references neither " +
        "side — qualify every column with its view alias")
      if (onR && !onL) rFiltered = rFiltered.filter(
        expr(strip(resid, Seq(rAlias, rName))))
      else condResiduals += resid
    }
    val cond: (Changelog.Bin, Changelog.Bin) => Boolean =
      if (condResiduals.isEmpty) (_, _) => true
      else compileResidualCond(spark, lPaySchema, rPaySchema,
        Seq(lAlias, lName), Seq(rAlias, rName), condResiduals.toSeq)

    // null keys: the inner side never matches (filter); a null-keyed
    // OUTER row flips the NOT EXISTS result, which the keyed operator
    // doesn't model — semi filters it (EXISTS is false anyway), anti
    // rejects it loudly. Composite keys guard EVERY key column.
    val lGuarded = keyPairs.foldLeft(lv.df)((d, p) =>
      nullKeyGuard(d, p._1, affectsOutput = anti, "EXISTS"))
    val rGuarded = keyPairs.foldLeft(rFiltered)((d, p) =>
      nullKeyGuard(d, p._2, affectsOutput = false, "EXISTS"))
    def run[K: scala.reflect.runtime.universe.TypeTag](
        lKeyC: Column, rKeyC: Column): DataFrame = {
      val lds = encodeViewKeyed[K](lGuarded, lv.kindCol, lKeyC)
      val rds = encodeViewKeyed[K](rGuarded, rv.kindCol, rKeyC)
      (if (anti) Changelog.joinChangelogAnti(lds, rds, cond, ttl)
       else Changelog.joinChangelogSemi(lds, rds, cond, ttl)).toDF()
    }
    val joined: DataFrame =
      if (keyPairs.length == 1) {
        val (lKey, rKey) = keyPairs.head
        joinKeyEnc(lv.df, lKey, rFiltered, rKey) match {
          case LongKey =>
            run[Long](col(lKey).cast("long"), col(rKey).cast("long"))
          case StringKey(pre) =>
            def k(c: String) =
              pre.foldLeft(col(c))(_.cast(_)).cast("string")
            run[String](k(lKey), k(rKey))
        }
      } else {
        val casts = keyPairs.map { case (lc, rc) =>
          pairCastType(lv.df.select(col(lc)).schema.head.dataType,
                       rFiltered.select(col(rc)).schema.head.dataType,
                       s"$lc = $rc")
        }
        def k(names: Seq[String]) = compositeKey(
          names.zip(casts).map { case (n, c) => c.foldLeft(col(n))(_.cast(_)) })
        run[String](k(keyPairs.map(_._1).toSeq), k(keyPairs.map(_._2).toSeq))
      }

    val lPayload = lv.df.columns.filterNot(_ == lv.kindCol).toSeq
    val schema = lv.df.select(lPayload.map(col): _*).schema
    val decoded = joined
      .select(Changelog.unpackPayload(col("left.bytes"), schema).as("__p"),
              col("kind").as("row_kind"), col("ord").as("row_ord"))
      .select(lPayload.map(c => col(s"__p.`$c`")) :+
              col("row_kind") :+ col("row_ord"): _*)
    val items = SqlFrontend.splitTop(sel).map(strip(_, Seq(lAlias, lName)))
    if (items == Seq("*")) decoded
    else decoded.selectExpr(items ++ Seq("row_kind", "row_ord"): _*)
  }

  // ---- A JOIN B ON → two-sided changelog join ---------------------------

  /** Resolve a JOIN side: a registered changelog view directly, or a
    * registered APPEND stream view LIFTED to a constant-+I changelog —
    * an insert-only input is a changelog that never retracts, exactly
    * the reference's changelog-mode inference for mixed joins
    * (FlinkChangelogModeInferenceProgram.scala). The lifted side's
    * state accumulates all rows per key (the stream-stream join's
    * normal bound); its event-time column rides along as payload. */
  /** A changelog view, or an APPEND stream view LIFTED to a constant-+I
    * changelog — an insert-only input is a changelog that never
    * retracts, the reference's changelog-mode inference
    * (FlinkChangelogModeInferenceProgram.scala). Shared by the join and
    * the unwindowed-aggregate routes; the stream view's rowId (if
    * declared) rides along as the lifted view's upsert key. */
  private def liftedView(name: String): Option[ChangelogView] =
    view(name).orElse(streamView(name).map { sv =>
      ChangelogView(sv.df.withColumn("__lift_kind", lit(Changelog.Insert)),
        "__lift_kind", sv.rowIdCol)
    })

  private def resolveJoinSide(name: String): ChangelogView =
    liftedView(name).getOrElse(throw new IllegalArgumentException(
      s"JOIN over unregistered view '$name' — each side of a streaming " +
      "join must be a registered changelog view (registerChangelog) or " +
      "an append stream view (registerStream, lifted to an insert-only " +
      "changelog); an updating view against a static/versioned table " +
      "is a lookup/temporal join — see LookupJoin / TemporalJoin"))

  private def joinStmt(spark: SparkSession, m: java.util.regex.Matcher,
                       ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (sel, lName, lAlias0, jt0, rName, rAlias0, onClause) =
      (m.group(1), m.group(2), m.group(3), m.group(4),
       m.group(5), m.group(6), m.group(7))
    val lv = resolveJoinSide(lName)
    val rv = resolveJoinSide(rName)
    val lAlias = Option(lAlias0).getOrElse(lName)
    val rAlias = Option(rAlias0).getOrElse(rName)
    // the two sides' qualifier sets must be disjoint, or column
    // references can't be attributed to a side: a self-join needs the
    // view registered twice under different names, and an alias that
    // collides with the OTHER side's view name is just as ambiguous
    require(!lName.equalsIgnoreCase(rName),
      s"streaming self-join on '$lName': register the view a second " +
      "time under a different name (qualifier attribution needs " +
      "distinct names per side)")
    val lQuals = Set(lAlias.toLowerCase, lName.toLowerCase)
    val rQuals = Set(rAlias.toLowerCase, rName.toLowerCase)
    require((lQuals & rQuals).isEmpty,
      s"streaming JOIN qualifiers must be disjoint between sides: " +
      s"{$lAlias, $lName} vs {$rAlias, $rName}")
    val jt = Option(jt0).map(_.toUpperCase).getOrElse("INNER")

    val conj = splitAnd(onClause)
    val qual = "(\\w+)\\.(\\w+)"
    val eqRe = s"(?s)^$qual\\s*=\\s*$qual$$".r
    def isL(q: String) = q.equalsIgnoreCase(lAlias) || q.equalsIgnoreCase(lName)
    def isR(q: String) = q.equalsIgnoreCase(rAlias) || q.equalsIgnoreCase(rName)
    // cross-side column equalities form the (possibly COMPOSITE) state
    // key — the reference's JoinInfo pair extraction; everything else
    // is a residual
    val keyPairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val residuals = scala.collection.mutable.ArrayBuffer.empty[String]
    conj.foreach {
      case c @ eqRe(q1, c1, q2, c2)
          if (isL(q1) && isR(q2)) || (isR(q1) && isL(q2)) =>
        if (isL(q1)) keyPairs += ((c1, c2)) else keyPairs += ((c2, c1))
        val _ = c
      case resid => residuals += resid
    }
    require(keyPairs.nonEmpty,
      s"streaming JOIN needs at least one <left>.k = <right>.k " +
      s"equality: $onClause")

    val lPayload = lv.df.columns.filterNot(_ == lv.kindCol).toSeq
    val rPayload = rv.df.columns.filterNot(_ == rv.kindCol).toSeq
    val lSchema = lv.df.select(lPayload.map(col): _*).schema
    val rSchema = rv.df.select(rPayload.map(col): _*).schema

    // Residual routing (the reference evaluates ALL residuals in the
    // generated JoinCondition inside the operator; this router keeps
    // the cheaper plan where semantics allow it):
    //  - a single-side residual on a NON-preserved side → a
    //    changelog-preserving pre-join filter on that view (a stateless
    //    deterministic predicate over the payload commutes with
    //    retraction — object doc), which also shrinks join state;
    //  - everything else — both-side residuals, and single-side
    //    residuals on a PRESERVED outer side (an ON predicate there
    //    disqualifies the MATCH while the row still emits null-padded,
    //    which no pre-join filter can express) — compiles into the join
    //    operators' `cond` lambda over the packed payloads
    //    ([[compileResidualCond]]), exactly the reference's semantics.
    def refs(e: String, a: String, n: String): Boolean =
      e.matches("(?is).*\\b(" + java.util.regex.Pattern.quote(a) + "|" +
        java.util.regex.Pattern.quote(n) + ")\\s*\\..*")
    val (padsLeft, padsRight) = jt match {
      case "LEFT" => (true, false)
      case "RIGHT" => (false, true)
      case "FULL" => (true, true)
      case _ => (false, false)
    }
    var lf = lv.df
    var rf = rv.df
    val condResiduals = scala.collection.mutable.ArrayBuffer.empty[String]
    residuals.foreach { resid =>
      val onL = refs(resid, lAlias, lName)
      val onR = refs(resid, rAlias, rName)
      require(onL || onR, s"JOIN residual '$resid' references neither " +
        "side — qualify every column with its view alias")
      if (onL && !onR && !padsLeft)
        lf = lf.filter(expr(strip(resid, Seq(lAlias, lName))))
      else if (onR && !onL && !padsRight)
        rf = rf.filter(expr(strip(resid, Seq(rAlias, rName))))
      else condResiduals += resid
    }
    val cond: (Changelog.Bin, Changelog.Bin) => Boolean =
      if (condResiduals.isEmpty) (_, _) => true
      else compileResidualCond(spark, lSchema, rSchema,
        Seq(lAlias, lName), Seq(rAlias, rName), condResiduals.toSeq)

    // null keys never match: filtered on non-preserved sides, rejected
    // loudly on preserved sides (a null-keyed preserved row should emit
    // null-padded, which the keyed-state operator doesn't model);
    // composite keys guard EVERY key column (SQL: one null field fails
    // the whole conjunction)
    val lg = keyPairs.foldLeft(lf)((d, p) =>
      nullKeyGuard(d, p._1, affectsOutput = padsLeft, s"$jt JOIN"))
    val rg = keyPairs.foldLeft(rf)((d, p) =>
      nullKeyGuard(d, p._2, affectsOutput = padsRight, s"$jt JOIN"))
    def run[K: scala.reflect.runtime.universe.TypeTag](
        lKeyC: Column, rKeyC: Column): DataFrame = {
      val lds = encodeViewKeyed[K](lg, lv.kindCol, lKeyC)
      val rds = encodeViewKeyed[K](rg, rv.kindCol, rKeyC)
      jt match {
        case "INNER" => Changelog.joinChangelog(lds, rds, cond, ttl).toDF()
        case "LEFT" =>
          Changelog.joinChangelogOuter(lds, rds, Changelog.LeftOuter,
            cond, ttl).toDF()
        case "RIGHT" =>
          Changelog.joinChangelogOuter(lds, rds, Changelog.RightOuter,
            cond, ttl).toDF()
        case _ =>
          Changelog.joinChangelogOuter(lds, rds, Changelog.FullOuter,
            cond, ttl).toDF()
      }
    }
    val joined: DataFrame =
      if (keyPairs.length == 1) {
        // single key: the classic typed path, bit-identical to prior
        // rounds (Long state keys for integral columns)
        val (lKey, rKey) = keyPairs.head
        joinKeyEnc(lf, lKey, rf, rKey) match {
          case LongKey =>
            run[Long](col(lKey).cast("long"), col(rKey).cast("long"))
          case StringKey(pre) =>
            def k(c: String) =
              pre.foldLeft(col(c))(_.cast(_)).cast("string")
            run[String](k(lKey), k(rKey))
        }
      } else {
        // composite key: per-pair normalization, one packed struct key
        val casts = keyPairs.map { case (lc, rc) =>
          pairCastType(lf.select(col(lc)).schema.head.dataType,
                       rf.select(col(rc)).schema.head.dataType,
                       s"$lc = $rc")
        }
        def k(names: Seq[String]) = compositeKey(
          names.zip(casts).map { case (n, c) => c.foldLeft(col(n))(_.cast(_)) })
        run[String](k(keyPairs.map(_._1).toSeq), k(keyPairs.map(_._2).toSeq))
      }

    // decode each side with its view schema; an outer side's padded row
    // decodes to a null struct, so its columns null-pad like batch SQL
    val decoded = joined.select(
      Changelog.unpackPayload(col("left.bytes"), lSchema).as("__l"),
      Changelog.unpackPayload(col("right.bytes"), rSchema).as("__r"),
      col("kind").as("row_kind"), col("ord").as("row_ord"))

    def requal(e: String): String =
      SqlFrontend.rewriteOutsideLiterals(e)(_
        .replaceAll("(?i)\\b(" + java.util.regex.Pattern.quote(lAlias) + "|" +
          java.util.regex.Pattern.quote(lName) + ")\\s*\\.", "__l.")
        .replaceAll("(?i)\\b(" + java.util.regex.Pattern.quote(rAlias) + "|" +
          java.util.regex.Pattern.quote(rName) + ")\\s*\\.", "__r."))
    val items = SqlFrontend.splitTop(sel)
    require(items != Seq("*"), "streaming JOIN needs explicit projection " +
      "items qualified by view alias — both sides may share column names")
    try decoded.selectExpr(items.map(requal) ++ Seq("row_kind", "row_ord"): _*)
    catch { case e: org.apache.spark.sql.AnalysisException =>
      throw new IllegalArgumentException(
        s"JOIN projection items must be qualified with a view alias " +
        s"('$lAlias.' / '$rAlias.'): $sel", e)
    }
  }

  // ---- ROW_NUMBER() <= k → retract-consuming Top-N ----------------------

  private def topn(spark: SparkSession, m: java.util.regex.Matcher,
                   ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (outerSel, innerSel, gExpr, orderBy, rnAlias, vName, tAlias0, whereRn, nStr) =
      (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5),
       m.group(6), m.group(7), m.group(8), m.group(9))
    require(whereRn.equalsIgnoreCase(rnAlias),
      s"Top-N WHERE must bound the ROW_NUMBER alias '$rnAlias', got '$whereRn'")
    val n = nStr.toInt
    val v = liftedView(vName).get
    val rowIdCol = v.rowIdCol.getOrElse(throw new IllegalArgumentException(
      s"streaming Top-N over '$vName' needs its upsert key: " +
      "registerChangelog(..., rowId = Some(col)) — the reference's rank " +
      "operator similarly requires the input's unique key"))
    requireIntegralRowId(v.df, rowIdCol, "Top-N")

    // ORDER BY <s> [ASC|DESC] [, <rowId> [ASC]] — the optional explicit
    // tiebreak must BE the rowId ascending (the operator's fixed
    // tiebreak, same as the reference's row-number comparator)
    val ordParts = SqlFrontend.splitTop(orderBy)
    val dirRe = java.util.regex.Pattern
      .compile("(?is)^(.+?)(?:\\s+(ASC|DESC))?\\s*$")
    val m0 = dirRe.matcher(ordParts.head); require(m0.matches())
    val sExpr = m0.group(1).trim
    val desc = m0.group(2) != null && m0.group(2).equalsIgnoreCase("DESC")
    ordParts.tail.foreach { p =>
      val mi = dirRe.matcher(p); require(mi.matches())
      require(norm(strip(mi.group(1), Seq(tAlias0, vName))) == norm(rowIdCol) &&
              (mi.group(2) == null || mi.group(2).equalsIgnoreCase("ASC")),
        s"Top-N tiebreak must be the rowId '$rowIdCol' ascending: $orderBy")
    }

    // ASC ranks by negated score (topNChangelog ranks desc); the sign
    // is restored in the projection below, so emitted scores are the
    // user's values either way
    def run[K: scala.reflect.runtime.universe.TypeTag](cast: String): DataFrame = {
      implicit val enc4: Encoder[(K, String, Double, Long)] = ExpressionEncoder()
      implicit val keyEnc: Encoder[K] = ExpressionEncoder()
      val base = v.df
        .withColumn("__g", expr(strip(gExpr, Seq(tAlias0, vName))).cast(cast))
        .withColumn("__s", expr(strip(sExpr, Seq(tAlias0, vName))).cast("double"))
        .select(col("__g"), col(v.kindCol).cast("string"), col("__s"),
                col(rowIdCol).cast("long"))
        .as[(K, String, Double, Long)]
      Changelog.topNChangelog[K, (K, String, Double, Long)](
        base.groupByKey(_._1), n,
        kind = _._2, score = t => if (desc) t._3 else -t._3, rowId = _._4,
        ttl = ttl).toDF()
    }
    val top =
      if (isIntegralKey(v.df, strip(gExpr, Seq(tAlias0, vName))))
        run[Long]("long")
      else run[String]("string")

    // compare stripped-vs-stripped: the inner items are stripped of
    // their view/alias qualifiers below, so the partition/order sides
    // must be too (`v.key % 6` and `key % 6` are the same expression)
    val (ng, ns, nid) = (norm(strip(gExpr, Seq(tAlias0, vName))),
                         norm(strip(sExpr, Seq(tAlias0, vName))),
                         norm(rowIdCol))
    val named = SqlFrontend.splitTop(innerSel).map { item =>
      val (e, alias) = itemAlias(strip(item, Seq(tAlias0, vName)))
      norm(e) match {
        case `ng` => col("key").as(alias)
        case `nid` => col("rowId").as(alias)
        case `ns` =>
          // 0.0 - s, not -s (see sortLimit: avoids -0.0 on ASC zeros)
          (if (desc) col("score") else lit(0.0) - col("score")).as(alias)
        case _ => throw new IllegalArgumentException(
          s"Top-N inner projection may reference only the partition key, " +
          s"the order expression and the rowId (the rank state's columns): $item")
      }
    }
    val out = top.select(named :+
      col("kind").as("row_kind") :+ col("ord").as("row_ord"): _*)
    val items = SqlFrontend.splitTop(outerSel)
      .map(strip(_, Seq(tAlias0)))
    require(!items.exists(i => i.matches(s"(?i).*\\b$rnAlias\\b.*")),
      s"'$rnAlias' is not projectable: the retractable rank runs in " +
      "no-rank-number mode (ranks derive at read over the ≤ n " +
      "materialized rows per key)")
    if (items == Seq("*")) out
    else out.selectExpr(items ++ Seq("row_kind", "row_ord"): _*)
  }

  // ---- COUNT(DISTINCT) → retract-capable distinct aggregate -------------

  private def distinct(spark: SparkSession, m: java.util.regex.Matcher,
                       ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (sel, vName, vAlias0, whereCl, groupBy, having) =
      (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5), m.group(6))
    val v = liftedView(vName).get
    val quals = Seq(vAlias0, vName)
    val vdf = whereFilter(v.df, whereCl, quals)
    val items = SqlFrontend.splitTop(sel).map(strip(_, quals))
    val cdRe = java.util.regex.Pattern.compile(
      "(?is)^COUNT\\s*\\(\\s*DISTINCT\\s+(.+)\\)\\s+(?:AS\\s+)?(\\w+)\\s*$")
    val cRe = java.util.regex.Pattern.compile(
      "(?is)^COUNT\\s*\\(\\s*\\*\\s*\\)\\s+(?:AS\\s+)?(\\w+)\\s*$")
    var gItem: Option[(String, String)] = None
    var dItem: Option[(String, String)] = None
    var cItem: Option[String] = None
    items.foreach { item =>
      val mcd = cdRe.matcher(item)
      val mc = cRe.matcher(item)
      if (mcd.matches()) {
        require(dItem.isEmpty, "one COUNT(DISTINCT …) per statement " +
          "(multiple distinct aggs: compose in the Scala API)")
        dItem = Some((mcd.group(1).trim, mcd.group(2)))
      } else if (mc.matches()) cItem = Some(mc.group(1))
      else {
        require(gItem.isEmpty, "streaming COUNT(DISTINCT) supports one " +
          "group-key item (derive a composite key column in the view)")
        gItem = Some(itemAlias(item))
      }
    }
    val (gExpr, gAlias) = gItem.getOrElse(throw new IllegalArgumentException(
      s"streaming COUNT(DISTINCT) needs the group key in the SELECT: $sel"))
    val (vExpr, dAlias) = dItem.getOrElse(throw new IllegalArgumentException(
      s"no COUNT(DISTINCT …) item in: $sel"))
    val gb = strip(groupBy, quals).trim
    require(norm(gb) == norm(gExpr) || gb == "1",
      s"GROUP BY must match the select's key expression '$gExpr': $groupBy")

    def run[K: scala.reflect.runtime.universe.TypeTag](cast: String): DataFrame = {
      implicit val enc3: Encoder[(K, String, Double)] = ExpressionEncoder()
      implicit val keyEnc: Encoder[K] = ExpressionEncoder()
      val base = vdf
        .withColumn("__g", expr(gExpr).cast(cast))
        .withColumn("__v", expr(vExpr).cast("double"))
        .select(col("__g"), col(v.kindCol).cast("string"), col("__v"))
        .as[(K, String, Double)]
      Changelog.aggregateChangelogDistinct[K, (K, String, Double)](
        base.groupByKey(_._1), kind = _._2, value = _._3, ttl = ttl).toDF()
    }
    val d = if (isIntegralKey(vdf, gExpr)) run[Long]("long")
            else run[String]("string")
    val withCount = cItem.map(ca => Seq(col("count").as(ca))).getOrElse(Nil)
    val res = d.select(
      Seq(col("key").as(gAlias), col("distinct").as(dAlias)) ++
      withCount :+ col("kind").as("row_kind"): _*)
    havingFilter(res, having, gAlias, quals, ttl)
  }

  // ---- FIRST_VALUE / LAST_VALUE / LISTAGG / COLLECT → ordered retract agg

  private def listagg(spark: SparkSession, m: java.util.regex.Matcher,
                      ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (sel, vName, vAlias0, whereCl, groupBy, having) =
      (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5), m.group(6))
    val v = liftedView(vName).get
    val rowIdCol = v.rowIdCol.getOrElse(throw new IllegalArgumentException(
      s"streaming FIRST_VALUE/LAST_VALUE/LISTAGG/COLLECT over '$vName' " +
      "needs its upsert key: registerChangelog(..., rowId = Some(col)) — " +
      "it is the aggregate's order, the way the reference's " +
      "order-sensitive retract aggs key their ListView"))
    val quals = Seq(vAlias0, vName)
    val items = SqlFrontend.splitTop(sel).map(strip(_, quals))
    val aggRe = java.util.regex.Pattern.compile(
      "(?is)^(FIRST_VALUE|LAST_VALUE|COLLECT)\\s*\\(\\s*(.+)\\)\\s+(?:AS\\s+)?(\\w+)\\s*$")
    val laRe = java.util.regex.Pattern.compile(
      "(?is)^LISTAGG\\s*\\(\\s*(.+?)(?:\\s*,\\s*'([^']*)')?\\s*\\)\\s+(?:AS\\s+)?(\\w+)\\s*$")
    val cRe = java.util.regex.Pattern.compile(
      "(?is)^COUNT\\s*\\(\\s*\\*\\s*\\)\\s+(?:AS\\s+)?(\\w+)\\s*$")
    var gItem: Option[(String, String)] = None
    var vExpr: Option[String] = None
    var delim = ","
    // output column of the operator → user alias, in item order
    val outCols = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def sameValue(e: String): Unit = {
      require(vExpr.forall(p => norm(p) == norm(e)),
        s"all value arguments must be the same expression (one live " +
        s"multiset per statement): '${vExpr.get}' vs '$e'")
      vExpr = Some(e.trim)
    }
    items.foreach { item =>
      val ma = aggRe.matcher(item)
      val ml = laRe.matcher(item)
      val mc = cRe.matcher(item)
      if (ma.matches()) {
        sameValue(ma.group(2))
        val out = ma.group(1).toUpperCase match {
          case "FIRST_VALUE" => "first"
          case "LAST_VALUE" => "last"
          case _ => "collect"
        }
        outCols += ((out, ma.group(3)))
      } else if (ml.matches()) {
        sameValue(ml.group(1))
        Option(ml.group(2)).foreach(delim = _)
        outCols += (("listagg", ml.group(3)))
      } else if (mc.matches()) outCols += (("count", mc.group(1)))
      else {
        require(gItem.isEmpty, "streaming ordered aggregates support one " +
          "group-key item (derive a composite key column in the view)")
        gItem = Some(itemAlias(item))
        outCols += (("key", itemAlias(item)._2))
      }
    }
    val (gExpr, _) = gItem.getOrElse(throw new IllegalArgumentException(
      s"streaming ordered aggregates need the group key in the SELECT: $sel"))
    val ve = vExpr.getOrElse(throw new IllegalArgumentException(
      s"no FIRST_VALUE/LAST_VALUE/LISTAGG/COLLECT item in: $sel"))
    val gb = strip(groupBy, quals).trim
    require(norm(gb) == norm(gExpr) || gb == "1",
      s"GROUP BY must match the select's key expression '$gExpr': $groupBy")

    val vdf = whereFilter(v.df, whereCl, quals)
    def run[K: scala.reflect.runtime.universe.TypeTag](cast: String): DataFrame = {
      implicit val enc4: Encoder[(K, String, Double, Long)] = ExpressionEncoder()
      implicit val keyEnc: Encoder[K] = ExpressionEncoder()
      val base = vdf
        .withColumn("__g", expr(gExpr).cast(cast))
        .withColumn("__v", expr(ve).cast("double"))
        .select(col("__g"), col(v.kindCol).cast("string"), col("__v"),
                col(rowIdCol).cast("long"))
        .as[(K, String, Double, Long)]
      Changelog.aggregateChangelogListAgg[K, (K, String, Double, Long)](
        base.groupByKey(_._1), kind = _._2, value = _._3, ord = _._4,
        delimiter = delim, ttl = ttl).toDF()
    }
    val d = if (isIntegralKey(vdf, gExpr)) run[Long]("long")
            else run[String]("string")
    val res = d.select(
      outCols.toSeq.map { case (c, a) => col(c).as(a) } :+
      col("kind").as("row_kind"): _*)
    havingFilter(res, having, gItem.get._2, quals, ttl)
  }

  // ---- SUM/COUNT/AVG/VAR/STDDEV and MIN/MAX → retract group aggregates

  private val MomentAggs =
    Set("SUM", "AVG", "VAR_POP", "VAR_SAMP", "STDDEV_POP", "STDDEV_SAMP")

  private def groupAgg(spark: SparkSession, m: java.util.regex.Matcher,
                       ttl: Option[Changelog.IdleStateTtl]): DataFrame = {
    val (sel, vName, vAlias0, whereCl, groupBy, having) =
      (m.group(1), m.group(2), m.group(3), m.group(4), m.group(5), m.group(6))
    val v = liftedView(vName).get
    val quals = Seq(vAlias0, vName)
    val items = SqlFrontend.splitTop(sel).map(strip(_, quals))
    val aggRe = java.util.regex.Pattern.compile(
      "(?is)^(SUM|AVG|VAR_POP|VAR_SAMP|STDDEV_POP|STDDEV_SAMP|MIN|MAX)" +
      "\\s*\\(\\s*(.+?)\\s*\\)\\s+(?:AS\\s+)?(\\w+)\\s*$")
    val cRe = java.util.regex.Pattern.compile(
      "(?is)^COUNT\\s*\\(\\s*\\*\\s*\\)\\s+(?:AS\\s+)?(\\w+)\\s*$")
    var gItem: Option[(String, String)] = None
    var vExpr: Option[String] = None
    val outCols = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    items.foreach { item =>
      val ma = aggRe.matcher(item)
      val mc = cRe.matcher(item)
      if (ma.matches()) {
        val e = ma.group(2).trim
        require(vExpr.forall(p => norm(p) == norm(e)),
          s"all value arguments must be the same expression (one " +
          s"accumulator per statement): '${vExpr.get}' vs '$e'")
        vExpr = Some(e)
        outCols += ((ma.group(1).toUpperCase, ma.group(3)))
      } else if (mc.matches()) outCols += (("COUNT", mc.group(1)))
      else {
        require(gItem.isEmpty, "streaming group aggregates support one " +
          "group-key item (derive a composite key column in the view)")
        gItem = Some(itemAlias(item))
        outCols += (("KEY", itemAlias(item)._2))
      }
    }
    val (gExpr, _) = gItem.getOrElse(throw new IllegalArgumentException(
      s"streaming group aggregates need the group key in the SELECT: $sel"))
    val gb = strip(groupBy, quals).trim
    require(norm(gb) == norm(gExpr) || gb == "1",
      s"GROUP BY must match the select's key expression '$gExpr': $groupBy")
    val fns = outCols.map(_._1).toSet
    val hasMinMax = fns.contains("MIN") || fns.contains("MAX")
    val hasMoment = fns.exists(MomentAggs)

    val vdf = whereFilter(v.df, whereCl, quals)
    val integral = isIntegralKey(vdf, gExpr)
    // one shared operand ORDER for the variance family so the oracle
    // dual `(ssq − s·s/n)/n` is reproducible bit-for-bit
    def varPop = (col("sumsq") - col("sum") * col("sum") / col("count")) /
      col("count")
    def varSamp = when(col("count") > 1,
      (col("sumsq") - col("sum") * col("sum") / col("count")) /
        (col("count") - lit(1L)))
    if (hasMinMax && hasMoment) {
      // heterogeneous families in ONE statement → the single
      // multi-accumulator operator (the reference's GroupAggFunction
      // hosting moment and Min/MaxWithRetract accumulators together)
      val rowIdCol = v.rowIdCol.getOrElse(throw new IllegalArgumentException(
        s"streaming MIN/MAX over '$vName' needs its upsert key: " +
        "registerChangelog(..., rowId = Some(col)) — retracting the " +
        "current extreme re-admits the runner-up from the live row set"))
      def run[K: scala.reflect.runtime.universe.TypeTag](cast: String): DataFrame = {
        implicit val enc4: Encoder[(K, String, Double, Long)] = ExpressionEncoder()
        implicit val keyEnc: Encoder[K] = ExpressionEncoder()
        val base = vdf
          .withColumn("__g", expr(gExpr).cast(cast))
          .withColumn("__v", expr(vExpr.get).cast("double"))
          .select(col("__g"), col(v.kindCol).cast("string"), col("__v"),
                  col(rowIdCol).cast("long"))
          .as[(K, String, Double, Long)]
        Changelog.aggregateChangelogMulti[K, (K, String, Double, Long)](
          base.groupByKey(_._1), kind = _._2, value = _._3, ord = _._4,
          ttl = ttl).toDF()
      }
      val d = if (integral) run[Long]("long") else run[String]("string")
      val res = d.select(outCols.toSeq.map {
        case ("KEY", a) => col("key").as(a)
        case ("SUM", a) => col("sum").as(a)
        case ("COUNT", a) => col("count").as(a)
        case ("AVG", a) => (col("sum") / col("count")).as(a)
        case ("VAR_POP", a) => varPop.as(a)
        case ("VAR_SAMP", a) => varSamp.as(a)
        case ("STDDEV_POP", a) => sqrt(varPop).as(a)
        case ("STDDEV_SAMP", a) => sqrt(varSamp).as(a)
        case ("MIN", a) => col("min").as(a)
        case ("MAX", a) => col("max").as(a)
        case (f, _) => throw new IllegalStateException(f) // unreachable
      } :+ col("kind").as("row_kind"): _*)
      havingFilter(res, having, gItem.get._2, quals, ttl)
    } else if (hasMinMax) {
      val rowIdCol = v.rowIdCol.getOrElse(throw new IllegalArgumentException(
        s"streaming MIN/MAX over '$vName' needs its upsert key: " +
        "registerChangelog(..., rowId = Some(col)) — retracting the " +
        "current extreme re-admits the runner-up from the live row set"))
      def run[K: scala.reflect.runtime.universe.TypeTag](cast: String): DataFrame = {
        implicit val enc4: Encoder[(K, String, Double, Long)] = ExpressionEncoder()
        implicit val keyEnc: Encoder[K] = ExpressionEncoder()
        val base = vdf
          .withColumn("__g", expr(gExpr).cast(cast))
          .withColumn("__v", expr(vExpr.get).cast("double"))
          .select(col("__g"), col(v.kindCol).cast("string"), col("__v"),
                  col(rowIdCol).cast("long"))
          .as[(K, String, Double, Long)]
        Changelog.aggregateChangelogMinMax[K, (K, String, Double, Long)](
          base.groupByKey(_._1), kind = _._2, value = _._3, ord = _._4,
          ttl = ttl).toDF()
      }
      val d = if (integral) run[Long]("long") else run[String]("string")
      val res = d.select(outCols.toSeq.map {
        case ("KEY", a) => col("key").as(a)
        case ("MIN", a) => col("min").as(a)
        case ("MAX", a) => col("max").as(a)
        case ("COUNT", a) => col("count").as(a)
        case (f, _) => throw new IllegalStateException(f) // unreachable
      } :+ col("kind").as("row_kind"): _*)
      havingFilter(res, having, gItem.get._2, quals, ttl)
    } else {
      def run[K: scala.reflect.runtime.universe.TypeTag](cast: String): DataFrame = {
        implicit val enc3: Encoder[(K, String, Double)] = ExpressionEncoder()
        implicit val keyEnc: Encoder[K] = ExpressionEncoder()
        val base = vdf
          .withColumn("__g", expr(gExpr).cast(cast))
          // COUNT(*)-only statements have no value argument: fold zeros
          .withColumn("__v", expr(vExpr.getOrElse("0")).cast("double"))
          .select(col("__g"), col(v.kindCol).cast("string"), col("__v"))
          .as[(K, String, Double)]
        Changelog.aggregateChangelogStats[K, (K, String, Double)](
          base.groupByKey(_._1), kind = _._2, value = _._3, ttl = ttl).toDF()
      }
      val d = if (integral) run[Long]("long") else run[String]("string")
      val res = d.select(outCols.toSeq.map {
        case ("KEY", a) => col("key").as(a)
        case ("SUM", a) => col("sum").as(a)
        case ("COUNT", a) => col("count").as(a)
        case ("AVG", a) => (col("sum") / col("count")).as(a)
        case ("VAR_POP", a) => varPop.as(a)
        case ("VAR_SAMP", a) => varSamp.as(a)
        case ("STDDEV_POP", a) => sqrt(varPop).as(a)
        case ("STDDEV_SAMP", a) => sqrt(varSamp).as(a)
        case (f, _) => throw new IllegalStateException(f) // unreachable
      } :+ col("kind").as("row_kind"): _*)
      havingFilter(res, having, gItem.get._2, quals, ttl)
    }
  }
}
