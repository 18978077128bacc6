package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: for any filter of the form
  *
  *   size(array_intersect(A, B)) / (size(A) + size(B) - size(array_intersect(A, B))) >= t
  *
  * (optionally wrapped in round/cast — the standard Jaccard-threshold
  * predicate), conjoin the cheap size-compatibility prune
  *
  *   least(size(A), size(B)) / greatest(size(A), size(B)) >= t
  *
  * which is implied by J(A,B) ≥ t (J ≤ min/max), so the rewrite is strictly
  * semantics-preserving — but it rejects most pairs BEFORE the
  * O(|A|+|B|) intersection is evaluated. This generalizes the hand-applied
  * prune in `DedupOps` to any user-written Jaccard filter; injected via
  * `graft.GraftExtensions`.
  */
object JaccardPrefilter extends Rule[LogicalPlan] {

  /** Matches a (possibly round/cast-wrapped) Jaccard expression, returning
    * the two set-valued operands.
    */
  private def asJaccard(e: Expression): Option[(Expression, Expression)] = e match {
    case Round(child, _, _) => asJaccard(child)
    case RoundCeil(child, _) => asJaccard(child)
    case RoundFloor(child, _) => asJaccard(child)
    case c: Cast => asJaccard(c.child)
    case Divide(num, den, _) =>
      (stripCast(num), stripCast(den)) match {
        case (Size(ArrayIntersect(a1, b1), _),
              Subtract(Add(Size(a2, _), Size(b2, _), _), Size(ArrayIntersect(a3, b3), _), _))
            if a1.semanticEquals(a2) && a1.semanticEquals(a3) &&
              b1.semanticEquals(b2) && b1.semanticEquals(b3) =>
          Some((a1, b1))
        case _ => None
      }
    case _ => None
  }

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  private def sizeRatioPrune(a: Expression, b: Expression, t: Expression): Expression = {
    val sa = Cast(Size(a, legacySizeOfNull = false), DoubleType)
    val sb = Cast(Size(b, legacySizeOfNull = false), DoubleType)
    GreaterThanOrEqual(
      new Divide(Least(Seq(sa, sb)), Greatest(Seq(sa, sb))), t)
  }

  /** Marker to avoid re-applying to an already-rewritten filter. */
  private def alreadyPruned(cond: Expression): Boolean =
    cond.exists {
      case GreaterThanOrEqual(Divide(_: Least, _: Greatest, _), _) => true
      case _ => false
    }

  private def rewriteCond(cond: Expression): Expression =
    cond.transformUp {
      case g @ GreaterThanOrEqual(jac, t @ Literal(_, DoubleType)) =>
        asJaccard(jac) match {
          case Some((a, b)) => And(sizeRatioPrune(a, b, t), g)
          case None => g
        }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // user-provided rules run AFTER predicate pushdown, so the threshold may
    // live either in a surviving Filter or inside a Join condition
    case f @ Filter(cond, child) if !alreadyPruned(cond) =>
      val rewritten = rewriteCond(cond)
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.isDefined && !alreadyPruned(j.condition.get) =>
      val rewritten = rewriteCond(j.condition.get)
      if (rewritten fastEquals j.condition.get) j
      else j.copy(condition = Some(rewritten))
  }
}
