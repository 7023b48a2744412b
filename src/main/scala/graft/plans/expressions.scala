package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions for reference functions Spark lacks.
 * These participate in whole-stage codegen (`doGenCode`), so they cost
 * the same as built-ins in the hot path — unlike Scala UDFs, which box
 * every row and break WSCG spans.
 */

/**
 * `HASH_CODE(str)` — the reference's HASH_CODE scalar returns the JVM
 * `String.hashCode` of its argument (reference:
 * flink-table/flink-table-runtime-blink/.../functions/SqlFunctionUtils.java
 * `hashCode(String)`), which differs from Spark's Murmur3 `hash()`.
 */
case class JavaHashCode(child: Expression) extends UnaryExpression {

  // Spark 4.x: the NullIntolerant marker trait was replaced by this flag
  // (null input => null output, enables null-check short-circuiting).
  override def nullIntolerant: Boolean = true

  // AbstractDataType is private[sql] in Spark 4, so input typing is
  // enforced here instead of via ExpectsInputTypes.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash_code requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hash_code"

  // Polynomial s[0]*31^(n-1)+...+s[n-1] over UTF-16 chars == String.hashCode.
  protected override def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")

  override protected def withNewChildInternal(newChild: Expression): JavaHashCode =
    copy(child = newChild)
}
