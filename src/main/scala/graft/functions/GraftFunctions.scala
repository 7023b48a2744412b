package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, IntegralDivide, Literal, Rand}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/**
 * Function-parity layer: the scalar/aggregate functions in the reference's
 * SQL surface (FlinkSqlOperatorTable.java, SURVEY §2.8) that Spark does not
 * ship. Everything here composes built-in codegen'd functions — no Scala
 * UDFs in the hot path — so Catalyst folds constants, pushes predicates and
 * keeps whole-stage codegen intact.
 *
 * Column API for Scala users; `registerAll` installs SQL names so
 * `spark.sql("SELECT split_index(...)")` works like the reference's SQL.
 */
object GraftFunctions {

  // ---- string ------------------------------------------------------------

  /**
   * SPLIT_INDEX(str, sep, index): index'th (0-based) field after splitting
   * on *literal* separator; NULL when out of range.
   * Ref: SqlFunctionUtils.splitIndex (flink-table-runtime-blink).
   */
  def splitIndex(str: Column, sep: String, index: Int): Column =
    get(split(str, java.util.regex.Pattern.quote(sep)), lit(index))

  /** Dynamic-separator variant: quotes the separator via regex \Q..\E. */
  def splitIndex(str: Column, sep: Column, index: Column): Column =
    get(split(str, concat(lit("\\Q"), sep, lit("\\E"))), index)

  /** IS_DECIMAL(str): parseable as a decimal number. Ref: SqlFunctionUtils.isDecimal. */
  def isDecimal(str: Column): Column =
    str.rlike("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$")

  /** IS_DIGIT(str): non-empty, all chars in [0-9]. Ref: SqlFunctionUtils.isDigit. */
  def isDigit(str: Column): Column = str.rlike("^[0-9]+$")

  /** IS_ALPHA(str): non-empty, all chars letters. Ref: SqlFunctionUtils.isAlpha. */
  def isAlpha(str: Column): Column = str.rlike("^[A-Za-z]+$")

  /** HASH_CODE(str): JVM String.hashCode (≠ Spark murmur3 `hash`). */
  def hashCode(str: Column): Column =
    Bridge.column(graft.plans.JavaHashCode(Bridge.expression(str)))

  // ---- vector --------------------------------------------------------------

  /** cosine_sim(a, b): fused single-pass cosine similarity of two
    * Array[Float] columns (codegen'd Catalyst expression; bit-equal to
    * the composed aggregate/zip_with form). */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(graft.plans.CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))

  // ---- collection ----------------------------------------------------------

  /**
   * ELEMENT(array): sole element of a 1-element array; NULL for empty,
   * error for >1 (Calcite ELEMENT semantics used by the reference).
   */
  def element(arr: Column): Column =
    when(size(arr) <= 1, get(arr, lit(0)))
      .otherwise(raise_error(lit("ELEMENT(): array has more than one element")))

  // ---- numeric -------------------------------------------------------------

  /** RAND_INTEGER(n): uniform int in [0, n). Ref: FlinkSqlOperatorTable RAND_INTEGER. */
  def randInteger(n: Column): Column = floor(rand() * n).cast("int")

  /** RAND_INTEGER(seed, n). */
  def randInteger(seed: Long, n: Column): Column = floor(rand(seed) * n).cast("int")

  /**
   * DIVIDE_INTEGER(a, b): exact integer division. Uses Catalyst
   * IntegralDivide (`div`), not `/` (which is double division on longs and
   * loses precision above 2^53).
   */
  def divideInteger(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(
      Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long"))))

  // ---- temporal ------------------------------------------------------------

  /**
   * CONVERT_TZ(ts_str, from, to) — reference semantics: interpret a
   * 'yyyy-MM-dd HH:mm:ss' string in zone `from`, render it in zone `to`.
   * Ref: SqlDateTimeUtils.convertTz.
   */
  def convertTz(ts: Column, from: Column, to: Column): Column =
    date_format(from_utc_timestamp(to_utc_timestamp(ts, from), to), "yyyy-MM-dd HH:mm:ss")

  // ---- JSON predicates -------------------------------------------------------

  /** IS JSON VALUE / OBJECT / ARRAY / SCALAR (reference JSON predicate family). */
  def isJsonValue(c: Column): Column = try_parse_json_ok(c)
  def isJsonObject(c: Column): Column = try_parse_json_ok(c) && trim(c).startsWith("{")
  def isJsonArray(c: Column): Column = try_parse_json_ok(c) && trim(c).startsWith("[")
  def isJsonScalar(c: Column): Column =
    try_parse_json_ok(c) && !trim(c).startsWith("{") && !trim(c).startsWith("[")

  private def try_parse_json_ok(c: Column): Column = try_parse_json(c).isNotNull

  // ---- registration ----------------------------------------------------------

  /**
   * Name → expression-builder table: the single source of truth for the
   * SQL surface, consumed by both `registerAll` (session-level temp
   * functions) and `graft.GraftExtensions` (cluster-wide injection via
   * `spark.sql.extensions`).
   */
  val builders: Seq[(String, PartialFunction[Seq[Expression], Expression])] = {
    // lift a Column-API builder to the Expression level
    def cols(builder: PartialFunction[Seq[Column], Column])
        : PartialFunction[Seq[Expression], Expression] = {
      case es if builder.isDefinedAt(es.map(Bridge.column)) =>
        Bridge.expression(builder(es.map(Bridge.column)))
    }
    Seq(
      "split_index" -> cols { case Seq(s, d, i) => splitIndex(s, d, i) },
      "is_decimal" -> cols { case Seq(s) => isDecimal(s) },
      "is_digit" -> cols { case Seq(s) => isDigit(s) },
      "is_alpha" -> cols { case Seq(s) => isAlpha(s) },
      "hash_code" -> { case Seq(s: Expression) => graft.plans.JavaHashCode(s) },
      "cosine_sim" -> { case Seq(a: Expression, b: Expression) =>
        graft.plans.CosineSimilarity(a, b) },
      "dot_codes" -> { case Seq(a: Expression, b: Expression) =>
        graft.plans.DotCodes(a, b) },
      "graft_element" -> cols { case Seq(a) => element(a) },
      // Seeded variant must pull the seed out of the *Literal* — stringifying
      // the Column yields SQL text, not the value (round-1 bug).
      "rand_integer" -> {
        case Seq(n: Expression) =>
          Bridge.expression(floor(Bridge.column(Rand(Literal(util.Random.nextLong()))) * Bridge.column(n)).cast("int"))
        case Seq(seed: Expression, n: Expression) =>
          Bridge.expression(floor(Bridge.column(Rand(seed)) * Bridge.column(n)).cast("int"))
      },
      "divide_integer" -> cols { case Seq(a, b) => divideInteger(a, b) },
      "convert_tz" -> cols { case Seq(t, f, z) => convertTz(t, f, z) },
      "is_json_value" -> cols { case Seq(s) => isJsonValue(s) },
      "is_json_object" -> cols { case Seq(s) => isJsonObject(s) },
      "is_json_array" -> cols { case Seq(s) => isJsonArray(s) },
      "is_json_scalar" -> cols { case Seq(s) => isJsonScalar(s) }
    )
  }

  /** Install SQL-facing names on a session (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) => Bridge.register(spark, name)(b) }
    // Mergeable sketches as SQL aggregate functions (the reference's
    // AggregateFunction registration surface, SURVEY §2.11): the typed
    // Aggregators in Sketches become `hll_distinct(col)` /
    // `cms_sketch(col)` in SQL — partial-aggregated map-side, merged at
    // the exchange, usable in streaming update mode as incremental
    // per-group sketch state. `cms_estimate(cells, tok)` reads a built
    // sketch; probe-side only (runs over the bounded candidate set, not
    // the stream).
    spark.udf.register("hll_distinct",
      udaf(new Sketches.HllDistinct, org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("cms_sketch",
      udaf(new Sketches.CmsSketch, org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("cms_estimate",
      (cells: Seq[Long], tok: String) => Sketches.cmsEstimate(cells.toArray, tok))
    spark.udf.register("kmv_distinct",
      udaf(new Sketches.KmvDistinct, org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("hist_quantile",
      udaf(new Sketches.HistQuantile,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Int)]()))
  }
}
