package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule generalizing the q43 re-plan — the one
  * fix in this codebase that was MEASURED before it was designed:
  * an `Aggregate` computing two-or-more DISTINCT aggregates over
  * different columns plans through `RewriteDistinctAggregates` as an
  * Expand that replicates EVERY input row once per distinct group —
  * ×N the fact table through the shuffle. On the 10× corpus q43's
  * first plan measured r = 10.1 (§6); the hand-fix — aggregate to
  * DISTINCT VALUE PAIRS first, so the Expand replicates |distinct
  * pairs| rows instead of |fact| rows — measured r = 4.8. This rule
  * performs that rewrite automatically:
  *
  * {{{
  *   Aggregate(g, [f1(DISTINCT a), f2(DISTINCT b)], child)
  * ⇒ Aggregate(g, [f1(DISTINCT a), f2(DISTINCT b)],
  *     Aggregate(g ++ [a, b], g ++ [a, b], child))   // distinct pairs
  * }}}
  *
  * Correct because a DISTINCT aggregate depends only on each group's
  * distinct VALUE SET, and the pair aggregate preserves exactly that
  * set per group (NULLs group together below and are skipped by the
  * distinct aggregate above — unchanged semantics; Count/Sum/Min/
  * Max/Avg DISTINCT all qualify). The downstream Expand still runs —
  * over the pair relation, whose cardinality is bounded by the
  * product of per-group distinct counts, not the corpus.
  *
  * GATED OFF by default (`spark.graft.distinctPairRewrite=true`
  * enables): the pair relation CAN exceed the fact table when the
  * distinct columns are near-unique keys (|pairs| → |rows| and the
  * extra aggregate is pure cost), so the rewrite is a deliberate
  * choice for the low-cardinality-distinct shapes it was measured
  * on — the same honesty rule as every other measured trade here.
  *
  * Bails (leaves the plan untouched) on: any non-DISTINCT aggregate
  * in the same Aggregate (it would then count pair rows — wrong),
  * FILTER clauses, multi-argument distincts, non-Attribute grouping
  * expressions, non-deterministic arguments, fewer than two distinct
  * argument expressions, and plans already in pair form (the
  * convergence guard — optimizer batches run to fixpoint). */
object DistinctPairRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.distinctPairRewrite", "false")
        .toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate if eligible(agg) => rewrite(agg)
    }

  private def aggExprsOf(agg: Aggregate): Seq[AggregateExpression] =
    agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })

  private def distinctArgs(agg: Aggregate): Seq[Expression] =
    aggExprsOf(agg).map(_.aggregateFunction.children.head)
      .foldLeft(Seq.empty[Expression]) { (acc, e) =>
        if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
      }

  private def eligible(agg: Aggregate): Boolean = {
    val aes = aggExprsOf(agg)
    agg.resolved &&
      aes.size >= 2 &&
      aes.forall(ae => ae.isDistinct && ae.filter.isEmpty &&
        ae.aggregateFunction.children.size == 1 &&
        ae.aggregateFunction.children.head.deterministic) &&
      agg.groupingExpressions.forall(_.isInstanceOf[Attribute]) &&
      distinctArgs(agg).size >= 2 &&
      !alreadyPaired(agg)
  }

  /** convergence guard: the rewrite's own output has every distinct
    * argument as an Attribute that the child Aggregate groups by —
    * rewriting it again would stack useless pair aggregates forever
    * under a fixpoint batch. */
  private def alreadyPaired(agg: Aggregate): Boolean = agg.child match {
    case ia: Aggregate =>
      val args = distinctArgs(agg)
      args.forall(_.isInstanceOf[Attribute]) &&
        (agg.groupingExpressions ++ args).forall(e =>
          ia.groupingExpressions.exists(_.semanticEquals(e)))
    case _ => false
  }

  private def rewrite(agg: Aggregate): LogicalPlan = {
    val groupAttrs = agg.groupingExpressions.map(_.asInstanceOf[Attribute])
    // (argument expression, its named form in the pair aggregate)
    val pairs: Seq[(Expression, NamedExpression)] = distinctArgs(agg).map {
      case a: Attribute => (a, a)
      case e => (e, Alias(e, "__darg")())
    }
    val inner = Aggregate(
      groupAttrs ++ pairs.map(_._1),
      (groupAttrs: Seq[NamedExpression]) ++ pairs.map(_._2),
      agg.child)
    def refFor(e: Expression): Attribute =
      pairs.find(_._1.semanticEquals(e)).get._2.toAttribute
    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          val f = ae.aggregateFunction
            .withNewChildren(Seq(refFor(ae.aggregateFunction.children.head)))
            .asInstanceOf[AggregateFunction]
          ae.copy(aggregateFunction = f)
      }.asInstanceOf[NamedExpression]
    }
    Aggregate(agg.groupingExpressions, newAggExprs, inner)
  }
}
