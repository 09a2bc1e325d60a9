package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a naive nearest-timestamp range join
  *
  *   `a JOIN b ON abs(a.e - b.e) <= d`
  *
  * — which Catalyst can only plan as a nested-loop/cartesian join —
  * into the bucketed equi-join the engine's own as-of operators use
  * (`TimeAxis.snapToGrid`, DESIGN §2 rule 3):
  *
  *   bucket each side by floor(e/d); a matching pair's buckets can
  *   differ by at most 1, so explode the left side over its three
  *   candidate buckets {bl−1, bl, bl+1}, equi-join on the candidate,
  *   and re-apply the original predicate. Each pair matches exactly
  *   one candidate bucket, so no dedup is needed; the physical plan
  *   becomes one hash shuffle per side instead of an O(n·m) loop.
  *
  * Scope: INNER joins whose entire condition is `abs(l − r) <= lit`
  * with one side referencing only the left child and the other only
  * the right. Register via `spark.experimental.extraOptimizations`
  * (session-local, no rebuild) or `GraftExtensions` (cluster deploys,
  * `spark.sql.extensions`).
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] =
    if (e.references.subsetOf(left.outputSet)) Some(true)
    else if (e.references.subsetOf(right.outputSet)) Some(false)
    else None

  /** `abs(x − y)`, tolerating an implicit numeric Cast around it. */
  private object AbsDiff {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Abs(Subtract(x, y, _), _) => Some((x, y))
      case Cast(Abs(Subtract(x, y, _), _), _, _, _) => Some((x, y))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      cond match {
        case LessThanOrEqual(AbsDiff(x, y), lit @ Literal(_, _))
            if lit.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
          val d = org.apache.spark.sql.catalyst.expressions.Cast(lit, DoubleType).eval(null)
          (sideOf(x, left, right), sideOf(y, left, right), d) match {
            case (Some(true), Some(false), dd: java.lang.Double) if dd > 0.0 =>
              rewrite(left, right, x, y, dd, cond, hint)
            case (Some(false), Some(true), dd: java.lang.Double) if dd > 0.0 =>
              // children swap sides, so the side-specific JoinHint must
              // swap with them (a broadcast hint on the original left
              // must still broadcast that child in the new join)
              // children swap, so the bucket EXPRESSIONS must follow
              // their own sides: x references the original right child
              // (the new left), y the original left (the new right).
              // Passing (y, x) here crossed them — each side's bucket
              // was computed from the OTHER side's column, leaving the
              // plan unresolved. Latent since the rule landed (the
              // spec only wrote abs(left − right)); exposed the day
              // the rule became session-default and met an
              // abs(right − left) join in the wild.
              rewrite(right, left, x, y, dd, cond, JoinHint(hint.rightHint, hint.leftHint)) match {
                // preserve original column order (left before right)
                case p => Project(j.output, p)
              }
            case _ => j
          }
        case _ => j
      }
  }

  private def bucketOf(e: Expression, d: Double): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      Floor(Divide(org.apache.spark.sql.catalyst.expressions.Cast(e, DoubleType), Literal(d))),
      LongType
    )

  /** Build: Filter(cond, Join(Generate(explode(candBuckets), leftB), rightB, cand = rb)). */
  private def rewrite(
      left: LogicalPlan,
      right: LogicalPlan,
      le: Expression,
      re: Expression,
      d: Double,
      cond: Expression,
      hint: JoinHint
  ): LogicalPlan = {
    val bl = Alias(bucketOf(le, d), "__rj_bl")()
    val leftB = Project(left.output :+ bl, left)
    val br = Alias(bucketOf(re, d), "__rj_br")()
    val rightB = Project(right.output :+ br, right)
    val cands = CreateArray(Seq(
      Subtract(bl.toAttribute, Literal(1L)),
      bl.toAttribute,
      Add(bl.toAttribute, Literal(1L))
    ))
    val candAttr = AttributeReference("__rj_cand", LongType, nullable = true)()
    val gen = Generate(Explode(cands), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(candAttr), child = leftB)
    val joined = Join(gen, rightB, Inner,
      Some(EqualTo(candAttr, br.toAttribute)), hint)
    val filtered = Filter(cond, joined)
    Project(left.output ++ right.output, filtered)
  }
}
