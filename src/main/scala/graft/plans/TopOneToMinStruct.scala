package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the "top-1 per key" window pattern
  *
  * {{{ Filter(rn = 1, [Project,] Window(row_number() over
  *     (partition by k order by o1 asc, ... asc), ...)) }}}
  *
  * into a single aggregation
  *
  * {{{ Aggregate(k, min(struct(o1, ..., <payload cols>))) }}}
  *
  * followed by a struct-field extraction Project.
  *
  * Why: the window form shuffles AND SORTS every row of every
  * partition (the heaviest shape in PLANS.md's scale-up smoke — 11×
  * at 16× data); the aggregate form is one partial+final hash
  * aggregate — map-side combining reduces each partition to one row
  * before the shuffle, and nothing is ever sorted. min over the
  * struct picks the lexicographically smallest (order-keys, payload)
  * row, i.e. exactly the rn=1 row; among order-key ties it picks the
  * payload-minimal row — deterministic, where row_number's tie choice
  * is arbitrary, so any query whose result was well-defined before is
  * unchanged.
  *
  * Scoped to be provably safe, bailing out otherwise:
  *  - exactly one window expression: row_number() with the default
  *    (UnboundedPreceding, CurrentRow) row frame;
  *  - non-empty partition spec of plain attributes (a global top-1
  *    over an empty input returns 0 rows for the filter but 1 row for
  *    an ungrouped aggregate — never rewritten);
  *  - every sort order ascending nulls-first (struct ordering);
  *  - every payload type orderable (no maps);
  *  - the filter keeps rank 1 only (rn = 1 / rn <= 1, plus the
  *    IsNotNull(rn) conjunct the optimizer infers); any conjunct not
  *    touching rn is preserved above the rewrite.
  *
  * Install per-session via `spark.experimental.extraOptimizations`
  * or cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object TopOneToMinStruct extends Rule[LogicalPlan] with PredicateHelper {

  /** Kill switch: set to "false" to disable the rewrite without
    * uninstalling the extensions (and their scalar functions). */
  val EnabledKey = "spark.graft.topOneToMinStruct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    applyEnabled(plan)
  }

  private def applyEnabled(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w, identity).getOrElse(f)
    case f @ Filter(cond, Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(cond, w, p => Project(projList, p)).getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window,
      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] = {
    // one window expression: row_number() with the default row frame
    val rnAlias = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame,
            UnboundedPreceding, CurrentRow))), _)) => a
      case _ => return None
    }
    val rnAttr = rnAlias.toAttribute

    // the filter must reduce to "rank 1 only" on rn
    val (rnConds, keepConds) =
      splitConjunctivePredicates(cond).partition(_.references.contains(rnAttr))
    val rankOne = rnConds.nonEmpty && rnConds.forall {
      case EqualTo(a: AttributeReference, Literal(1, IntegerType)) =>
        a.exprId == rnAttr.exprId
      case EqualTo(Literal(1, IntegerType), a: AttributeReference) =>
        a.exprId == rnAttr.exprId
      case LessThanOrEqual(a: AttributeReference, Literal(1, IntegerType)) =>
        a.exprId == rnAttr.exprId
      case IsNotNull(a: AttributeReference) => a.exprId == rnAttr.exprId
      case _ => false
    }
    if (!rankOne ||
        !rnConds.exists { case _: IsNotNull => false; case _ => true })
      return None

    val partAttrs = w.partitionSpec.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (partAttrs.isEmpty) return None
    if (!w.orderSpec.forall(so => so.direction == Ascending &&
        so.nullOrdering == NullsFirst && so.child.deterministic))
      return None

    // an InferWindowGroupLimit pre-pass may sit between — its child is
    // the real input (the limit becomes redundant after this rewrite)
    val child = w.child match {
      case WindowGroupLimit(_, _, _, _, c) => c
      case c => c
    }
    val sortKeys = w.orderSpec.map(_.child)
    val payload = child.output
    if (!(sortKeys.map(_.dataType) ++ payload.map(_.dataType))
        .forall(RowOrdering.isOrderable))
      return None

    val topAlias = Alias(AggregateExpression(
      Min(CreateStruct(sortKeys ++ payload)), Complete, isDistinct = false),
      "_graft_top1")()
    val agg = Aggregate(partAttrs, (partAttrs :+ topAlias).toSeq, child)
    val top = topAlias.toAttribute
    val partIds = partAttrs.map(_.exprId).toSet
    // rebuild the Window's output (payload ++ rn) with original exprIds
    val extracted: Seq[NamedExpression] = w.output.map { a =>
      if (partIds.contains(a.exprId)) a
      else if (a.exprId == rnAttr.exprId)
        Alias(Literal(1, IntegerType), rnAlias.name)(exprId = rnAlias.exprId)
      else {
        val i = payload.indexWhere(_.exprId == a.exprId)
        if (i < 0) return None
        Alias(GetStructField(top, sortKeys.length + i), a.name)(exprId = a.exprId)
      }
    }
    val project = Project(extracted, agg)
    val kept =
      if (keepConds.isEmpty) project
      else Filter(keepConds.reduce(And), project)
    Some(wrap(kept))
  }
}
