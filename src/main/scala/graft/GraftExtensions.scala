package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftbridge.Bridge

/**
 * Cluster-deployment entry point: activates the engine's SQL function
 * surface (functions/GraftFunctions.scala — the reference's
 * FlinkSqlOperatorTable parity layer, SURVEY §2.8) on every session of a
 * cluster with zero code changes:
 *
 * {{{
 * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * }}}
 *
 * This is the Spark analogue of the reference shipping its operator table
 * inside the planner module (every TableEnvironment sees the functions):
 * injection happens at session build time, before any user code runs, so
 * SQL text referencing `split_index`/`hash_code`/... resolves in
 * spark-sql, JDBC/Thrift sessions and notebooks alike — places where
 * calling `GraftSession.init(spark)` by hand is impossible or awkward.
 * `GraftSession.init` remains the library-embedding route; both feed from
 * the same `GraftFunctions.builders` table.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    functions.GraftFunctions.builders.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        Bridge.builderFn(name, builder)))
    }
    extensions.injectOptimizerRule(_ => plans.PreAggregateBeforeExpand)
  }
}
