package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{AnalysisException, Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/**
 * Column <-> Catalyst Expression bridge for Spark 4.x.
 *
 * In Spark 4 the `Column` API is decoupled from Catalyst (`Column` wraps a
 * `ColumnNode`, not an `Expression`) and the conversion helpers in
 * `org.apache.spark.sql.classic.ExpressionUtils` are `private[sql]`. This
 * object lives under `org.apache.spark.sql` so the engine's custom Catalyst
 * expressions (graft.plans) can be exposed as `Column`s and registered as
 * SQL functions without copying any Spark internals.
 */
object Bridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /**
   * Convert a Column to a real Catalyst expression eagerly. (The lazy
   * `ExpressionUtils.expression` wrapper stays Unevaluable when embedded
   * via the function registry, so convert the node tree up front; any
   * UnresolvedFunction nodes become genuine catalyst UnresolvedFunctions
   * the analyzer then resolves.)
   */
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /**
   * Total arity-checked function builder from a partial one: mismatches
   * (builder not defined at the arg list) surface as a proper
   * WRONG_NUM_ARGS AnalysisException, not a MatchError. Shared by the
   * session-level registry path and the SparkSessionExtensions injector.
   */
  def builderFn(name: String,
      builder: PartialFunction[Seq[Expression], Expression])
      : Seq[Expression] => Expression =
    es =>
      if (builder.isDefinedAt(es)) builder(es)
      else throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> "a supported number of",
          "actualNum" -> es.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /**
   * Register a temp SQL function built from raw Catalyst expressions,
   * e.g. `register(spark, "hash_code") { case Seq(e) => JavaHashCode(e) }`.
   */
  def register(spark: SparkSession, name: String)(
      builder: PartialFunction[Seq[Expression], Expression]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builderFn(name, builder), "scala_udf")

  /**
   * Materialize the functions a `SparkSessionExtensions` instance would
   * inject at session build time into a standalone registry (test hook:
   * `registerFunctions` is private[sql], so sessions built over an
   * already-running SparkContext can't exercise the injection path
   * in-process — this applies the same code path the session builder runs).
   */
  def materializeInjectedFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(
      new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry)

  /**
   * Register a temp SQL function built with the Column API (so composed
   * built-ins can be used in the builder).
   */
  def registerCols(spark: SparkSession, name: String)(
      builder: PartialFunction[Seq[Column], Column]): Unit =
    register(spark, name) {
      case es if builder.isDefinedAt(es.map(column)) =>
        expression(builder(es.map(column)))
    }
}
