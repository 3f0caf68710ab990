package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §7.4: Rule[LogicalPlan] path): rewrite
  * "keep the first-ranked row per key" —
  *
  *   Filter(rn = 1, Window(rn ← row_number() OVER
  *     (PARTITION BY k ORDER BY o1 DESC, ..., on DESC), child))
  *
  * — into a max_by aggregation over a struct of the child's columns keyed
  * by a struct of the (all-descending) sort keys.
  *
  * Why it matters at scale: the window form shuffles and sorts EVERY row
  * of every key (WindowGroupLimit trims but still sorts within partitions
  * and shuffles one row per key per partition... as does the aggregate —
  * but the aggregate needs no sort at all and uses the hash-aggregate
  * partial/final machinery, so the per-partition state is one row per
  * key, unsorted). This is the dedup-latest-by-key semantics the
  * reference's pipeline relies on (SURVEY §2.4).
  *
  * Scoped conservatively: single row_number window expression, filter
  * exactly rn = 1 (or rn <= 1), non-empty partition keys that are plain
  * attributes, ALL sort directions descending (max_by's struct ordering
  * then matches row_number's), and a deterministic total order is the
  * caller's responsibility exactly as it is for the window form. Struct
  * comparison treats nulls as smallest, matching DESC NULLS LAST.
  */
object RewriteRankOneToMaxBy extends Rule[LogicalPlan] {

  private def isOne(e: Expression): Boolean = e match {
    case Literal(1, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      val rewritten = for {
        rnAttr <- cond match {
          case EqualTo(a: Attribute, l) if isOne(l) => Some(a)
          case LessThanOrEqual(a: Attribute, l) if isOne(l) => Some(a)
          case _ => None
        }
        alias <- w.windowExpressions match {
          case Seq(a @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(_, _, _)), _))
            if a.exprId == rnAttr.exprId => Some(a)
          case _ => None
        }
        spec = alias.child.asInstanceOf[WindowExpression].windowSpec
        if spec.partitionSpec.nonEmpty &&
          spec.partitionSpec.forall(_.isInstanceOf[Attribute]) &&
          spec.orderSpec.nonEmpty &&
          spec.orderSpec.forall(_.direction == Descending) &&
          // struct comparison in max_by treats nulls as smallest — that is
          // DESC NULLS LAST. An explicit DESC NULLS FIRST window would pick
          // a different row when sort keys contain nulls, so leave it alone.
          spec.orderSpec.forall(_.nullOrdering == NullsLast) &&
          spec.orderSpec.forall(_.child.deterministic)
      } yield {
        val child = w.child
        val valueStruct = CreateStruct(child.output)
        val keyStruct = CreateStruct(spec.orderSpec.map(_.child))
        val aggAlias = Alias(
          MaxBy(valueStruct, keyStruct).toAggregateExpression(), "__graft_top")()
        val groupAttrs = spec.partitionSpec.map(_.asInstanceOf[Attribute])
        val agg = Aggregate(groupAttrs,
          (groupAttrs: Seq[NamedExpression]) :+ aggAlias, child)
        // restore the original output attributes (same exprIds) so the
        // rest of the plan is untouched; rn collapses to the literal 1
        val structRef = aggAlias.toAttribute
        val restored: Seq[NamedExpression] =
          child.output.zipWithIndex.map { case (a, i) =>
            Alias(GetStructField(structRef, i, Some(a.name)), a.name)(
              exprId = a.exprId)
          } :+ Alias(Literal(1), rnAttr.name)(exprId = rnAttr.exprId)
        Project(restored, agg)
      }
      rewritten.getOrElse(f)
  }
}
