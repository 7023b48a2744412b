package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

/**
 * Partial-aggregation pushdown through Expand — the optimizer rule form
 * of the rewrite applied by hand to q05/q97/q98/q111: Catalyst plans
 * GROUPING SETS / ROLLUP / CUBE as `Aggregate(Expand(child))`, and the
 * Expand multiplies the FULL child by the number of grouping sets before
 * any aggregation happens (4x a 100 TB fact join for a 3-level rollup).
 * This rule inserts an Aggregate on the finest grouping key BELOW the
 * Expand, so the multiplication applies to |key domain| rows instead:
 *
 *   Aggregate(sets, [sum(x), count(*)], Expand(projs, out, child))
 *   ==> Aggregate(sets, [cast(sum(ps)), sum(pc)],
 *         Expand(projs', out', Aggregate(allKeys, [sum(x) ps, count(*) pc], child)))
 *
 * Applies only when every aggregate re-derives EXACTLY from partials:
 * SUM over decimal/integral (cast back to the original result type —
 * value-identical, only the intermediate widening differs), COUNT (sum
 * of partial counts), MIN/MAX. Float/double SUM/AVG are skipped (their
 * accumulation order would change), as are DISTINCT aggregates, FILTER
 * clauses, and plans whose Expand child is already an Aggregate (the
 * hand-optimized queries). Reference analogue: the Blink planner's
 * two-phase aggregate rules (`EnforceLocalHashAggRule`,
 * `TwoStageOptimizedAggregateRule` — SURVEY §4.1) which Spark applies
 * only ABOVE the Expand; this rule moves the first phase below it.
 *
 * Installed by `GraftSession.init` via `spark.experimental
 * .extraOptimizations` and by `GraftExtensions` via
 * `injectOptimizerRule`; kill switch: `spark.graft.preaggExpand` = false.
 */
object PreAggregateBeforeExpand extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.preaggExpand", "true").toBoolean) {
      return plan
    }
    plan.transformUp {
      case agg @ Aggregate(_, aggExprs,
          expand @ Expand(projections, output, child), _)
          if eligible(agg, expand) =>
        rewrite(agg, projections, output, child).getOrElse(agg)
    }
  }

  private def isAggregateLike(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case other => other.children.exists {
      case _: Aggregate => true
      case _ => false
    }
  }

  private def eligible(agg: Aggregate, expand: Expand): Boolean = {
    val aggFns = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae })
    aggFns.nonEmpty &&
      aggFns.forall(decomposable) &&
      !isAggregateLike(expand.child)
  }

  private def decomposable(ae: AggregateExpression): Boolean = {
    if (ae.isDistinct || ae.filter.isDefined || ae.mode != Complete) return false
    ae.aggregateFunction match {
      case s: Sum => s.dataType match {
        case DoubleType | FloatType => false // order-dependent accumulation
        case _ => true
      }
      case _: Count => true
      case _: Min => true
      case _: Max => true
      // decimal-only: integral/float averages accumulate their sum in
      // DOUBLE (Average.sumDataType), which is order-dependent
      case a: Average => a.child.dataType.isInstanceOf[DecimalType]
      case _ => false
    }
  }

  /** Partial aliases for one aggregate call + how to rebuild the final
    * expression from the re-aggregation of those partials. */
  private case class Decomp(partials: Seq[Alias],
                            rebuild: Seq[Attribute] => Expression)

  private def sumOf(attr: Attribute, target: org.apache.spark.sql.types.DataType): Expression = {
    val re = AggregateExpression(Sum(attr), Complete, isDistinct = false)
    if (re.dataType == target) re else Cast(re, target)
  }

  private def decompose(ae: AggregateExpression, i: Int): Option[Decomp] =
    ae.aggregateFunction match {
      case s: Sum =>
        val p = Alias(AggregateExpression(s, Complete, isDistinct = false),
          s"_graft_partial_${i}_0")()
        Some(Decomp(Seq(p), { case Seq(a) => sumOf(a, ae.dataType) }))
      case c: Count =>
        val p = Alias(AggregateExpression(c, Complete, isDistinct = false),
          s"_graft_partial_${i}_0")()
        Some(Decomp(Seq(p), { case Seq(a) => sumOf(a, ae.dataType) }))
      case m: Min =>
        val p = Alias(AggregateExpression(m, Complete, isDistinct = false),
          s"_graft_partial_${i}_0")()
        Some(Decomp(Seq(p), { case Seq(a) =>
          AggregateExpression(Min(a), Complete, isDistinct = false) }))
      case m: Max =>
        val p = Alias(AggregateExpression(m, Complete, isDistinct = false),
          s"_graft_partial_${i}_0")()
        Some(Decomp(Seq(p), { case Seq(a) =>
          AggregateExpression(Max(a), Complete, isDistinct = false) }))
      case avg: Average if avg.child.dataType.isInstanceOf[DecimalType] =>
        // decimal average decomposes to (sum, count) partials; the final
        // division reuses Spark's OWN Average.evaluateExpression tree
        // with the internal sum/count buffer attrs substituted by the
        // re-aggregations — bit-exact by construction
        val ps = Alias(AggregateExpression(Sum(avg.child), Complete,
          isDistinct = false), s"_graft_partial_${i}_0")()
        val pc = Alias(AggregateExpression(Count(avg.child), Complete,
          isDistinct = false), s"_graft_partial_${i}_1")()
        Some(Decomp(Seq(ps, pc), { case Seq(sAttr, cAttr) =>
          val finalSum = sumOf(sAttr, avg.sum.dataType)
          val finalCount = AggregateExpression(Sum(cAttr), Complete,
            isDistinct = false) // long, exact
          avg.evaluateExpression.transform {
            case r: AttributeReference if r.exprId == avg.sum.exprId =>
              finalSum
            case r: AttributeReference if r.exprId == avg.count.exprId =>
              finalCount
          }
        }))
      case _ => None
    }

  /** Position classes of the Expand output. */
  private def rewrite(
      agg: Aggregate,
      projections: Seq[Seq[Expression]],
      output: Seq[Attribute],
      child: LogicalPlan): Option[Aggregate] = {
    val childIds = child.outputSet
    // classify each Expand output position
    val isMeasure = output.indices.map { i =>
      childIds.exists(_.exprId == output(i).exprId) &&
        projections.forall { p =>
          p(i) match {
            case a: AttributeReference => a.exprId == output(i).exprId
            case _ => false
          }
        }
    }
    // non-measure positions must be grouping/gid shaped: each element an
    // attr from child or a (null/int) literal
    val groupingOk = output.indices.forall { i =>
      isMeasure(i) || projections.forall { p =>
        p(i) match {
          case a: AttributeReference => childIds.exists(_.exprId == a.exprId)
          case _: Literal => true
          case _ => false
        }
      }
    }
    if (!groupingOk) return None

    val measureAttrSet = AttributeSet(
      output.indices.filter(isMeasure).map(output(_)))
    // measure attrs may appear ONLY inside aggregate functions above —
    // exact walk (an attr used both inside AND outside an agg call must
    // still count as an outside use)
    def nonAggRefs(e: Expression): AttributeSet = e match {
      case _: AggregateExpression => AttributeSet.empty
      case a: Attribute => AttributeSet(a)
      case other =>
        other.children.foldLeft(AttributeSet.empty)(_ ++ nonAggRefs(_))
    }
    val topNonAggRefs =
      (agg.aggregateExpressions ++ agg.groupingExpressions)
        .foldLeft(AttributeSet.empty)(_ ++ nonAggRefs(_))
    if (topNonAggRefs.exists(a => measureAttrSet.contains(a))) return None

    // partial grouping key: every child attr referenced by a grouping
    // position of any projection
    val partialKeys: Seq[Attribute] = {
      val fromProjections = for {
        i <- output.indices if !isMeasure(i)
        p <- projections
        a <- p(i) match {
          case ar: AttributeReference => Some(ar)
          case _ => None
        }
      } yield a
      fromProjections.map(a => a.exprId -> a).toMap.values.toSeq
        .sortBy(_.exprId.id)
    }

    // one partial per distinct aggregate function call
    val topAggFns = agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae }).distinct
    // every agg function must read only measure attrs (or literals)
    if (!topAggFns.forall(_.references.subsetOf(measureAttrSet))) return None

    val decomps: Seq[(AggregateExpression, Decomp)] =
      topAggFns.zipWithIndex.map { case (ae, i) =>
        decompose(ae, i) match {
          case Some(d) => ae -> d
          case None => return None
        }
      }
    val partialAliases: Seq[Alias] = decomps.flatMap(_._2.partials)

    val partialAgg = Aggregate(partialKeys, partialKeys ++ partialAliases, child)
    val partialAttrs: Seq[Attribute] = partialAliases.map(_.toAttribute)

    // rebuild Expand: keep non-measure positions (original attrs/ids),
    // append the partial columns as passthroughs
    val keepIdx = output.indices.filterNot(isMeasure)
    val newOutput: Seq[Attribute] = keepIdx.map(output(_)) ++ partialAttrs
    val newProjections: Seq[Seq[Expression]] = projections.map { p =>
      keepIdx.map(p(_)) ++ partialAttrs
    }
    val newExpand = Expand(newProjections, newOutput, partialAgg)

    // final aggregate: replace each agg call with its re-aggregation over
    // its partial columns (result type preserved by each rebuild)
    val replacement: Map[AggregateExpression, Expression] =
      decomps.map { case (ae, d) =>
        ae -> d.rebuild(d.partials.map(_.toAttribute))
      }.toMap

    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transform {
        case ae: AggregateExpression if replacement.contains(ae) =>
          replacement(ae)
      }.asInstanceOf[NamedExpression]
    }
    Some(agg.copy(aggregateExpressions = newAggExprs, child = newExpand))
  }
}
