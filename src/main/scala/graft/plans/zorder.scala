package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * `zorder16(x, y)` — Morton/Z-order bit interleave of the low 16 bits of
 * two non-negative longs: bit i of x lands at position 2i, bit i of y at
 * 2i+1, producing a 32-bit clustering key whose sort order is the
 * space-filling Z-curve over the (x, y) grid.
 *
 * Why it matters at 100 TB: sorting a table by a single column bounds
 * per-file min/max ranges for THAT column only; sorting by the Z-value
 * bounds per-file ranges for BOTH dimensions simultaneously, so
 * min/max-based file skipping (parquet row-group stats, Delta/Iceberg
 * file pruning) works for predicates on either column. The layout cost
 * is one range exchange — the same price as any global sort.
 *
 * Codegen'd (doGenCode emits the 16-step interleave loop inline) so the
 * key computation rides inside WholeStageCodegen in the write path.
 */
case class ZOrder16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder16"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"zorder16 requires (bigint, bigint), got $other")
    }

  protected override def nullSafeEval(xa: Any, ya: Any): Any = {
    val x = xa.asInstanceOf[Long]
    val y = ya.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  ${ev.value} |= (($x >> $i) & 1L) << (2 * $i);
         |  ${ev.value} |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder16 =
    copy(left = newLeft, right = newRight)
}
