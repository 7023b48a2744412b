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
   * Register a temp SQL function built from raw Catalyst expressions,
   * e.g. `register(spark, "hash_code") { case Seq(e) => JavaHashCode(e) }`.
   * Arity mismatches (builder not defined at the arg list) surface as a
   * proper WRONG_NUM_ARGS AnalysisException, not a MatchError.
   */
  def register(spark: SparkSession, name: String)(
      builder: PartialFunction[Seq[Expression], Expression]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      es =>
        if (builder.isDefinedAt(es)) builder(es)
        else throw new AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name,
            "expectedNum" -> "a supported number of",
            "actualNum" -> es.size.toString,
            "docroot" -> "https://spark.apache.org/docs/latest")),
      "scala_udf")

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
