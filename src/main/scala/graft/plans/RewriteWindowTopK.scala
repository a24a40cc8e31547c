package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `Filter(row_number <= k)` directly above a
  * row_number-only Window collapses into [[TopKPerKeyNode]].
  *
  * The window form sorts every partition fully before the filter
  * discards all but k rows; the rewritten plan keeps a bounded k-heap
  * per key instead (Spark's own WindowGroupLimit pushes a limit into
  * the sort but still sorts). Fires on the standard user-written
  * pattern, so e.g. `etl_dedup_hour` (rn = 1 keep-first) gets the
  * heap operator with no code change — and its DuckDB oracle keeps
  * validating the rewrite.
  *
  * Guards: exactly one window expression and it is row_number with
  * the default running frame; non-empty partition spec (the exec
  * declares ClusteredDistribution); only rank-bounding conjuncts are
  * absorbed — anything else stays in a residual Filter.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private def rankLimit(e: Expression, rank: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rank) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rank) => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rank) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rank) => Some(k - 1)
    case _ => None
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
      case Literal(v: Long, org.apache.spark.sql.types.LongType) if v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(al @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(partSpec, orderSpec, _)), _)), _, _, child, _))
        if partSpec.nonEmpty && orderSpec.nonEmpty =>
      val rankAttr = al.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (rankConds, rest) = conjuncts.partition(c => rankLimit(c, rankAttr).isDefined)
      if (rankConds.isEmpty) f
      else {
        val k = rankConds.flatMap(rankLimit(_, rankAttr)).min
        if (k <= 0) f
        else {
          val topk = TopKPerKeyNode(partSpec, orderSpec, k, rankAttr, child)
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
        }
      }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }
}
