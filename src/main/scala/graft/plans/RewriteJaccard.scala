package graft.plans

import graft.functions.JaccardSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule: rewrite the composable Jaccard formulation
  *
  *   size(array_intersect(a, b)) * 1.0
  *     / (size(a) + size(b) - size(array_intersect(a, b)))
  *
  * into the fused [[JaccardSimilarity]] — which counts hash-set hits in
  * one pass instead of materializing the intersection array (twice:
  * once for the numerator, once inside the denominator). Same
  * arithmetic (`common * 1.0 / (na + nb - common)`), so the rewrite is
  * value-identical wherever the inputs are element-distinct arrays —
  * the declared domain of the composed form in this engine
  * (shingle sets; see [[graft.functions.JaccardSimilarity]]).
  *
  * The match is deliberately narrow: exactly this shape over
  * ARRAY<STRING> inputs, with the three `array_intersect` occurrences
  * and both size operands semantically equal.
  */
object RewriteJaccard extends Rule[LogicalPlan] {

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  /** size(array_intersect(a, b)) — legacy or ANSI size. */
  private object IntersectSize {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Size(ArrayIntersect(a, b), _) if isStringArray(a) && isStringArray(b) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
          Multiply(Cast(IntersectSize(a, b), _, _, _), Literal(1.0, _), _),
          Cast(Subtract(Add(Size(a2, _), Size(b2, _), _), IntersectSize(a3, b3), _), _, _, _), _)
          if a.semanticEquals(a2) && b.semanticEquals(b2) &&
            a.semanticEquals(a3) && b.semanticEquals(b3) =>
        JaccardSimilarity(a, b)
    }
}
