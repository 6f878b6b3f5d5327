package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Optimizer rule: rewrite the composable higher-order-function cosine
  * (`aggregate(zip_with(a, b, *), 0.0, +) / (sqrt(aggregate(transform(a,
  * x²))) * sqrt(...))` — [[graft.operators.Similarity.cosine]]) into the
  * native codegen'd [[CosineSimilarity]].
  *
  * Users write the declarative form; the optimizer swaps in the fused
  * loop. Both sides perform the same left-to-right double fold, so the
  * rewrite is bit-exact (asserted in RewriteCosineSpec). The match is
  * deliberately narrow — the exact shape our API builds over
  * ARRAY<FLOAT> inputs — so no foreign expression can false-positive.
  */
object RewriteCosine extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** aggregate(zip_with(a, b, (x,y) => cast(x)*cast(y)), 0.0, +, id) */
  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(Cast(_: NamedLambdaVariable, _, _, _),
              Cast(_: NamedLambdaVariable, _, _, _), _), _, _)),
          Literal(0.0, _),
          LambdaFunction(Add(_, _, _), _, _), _) if isFloatArray(a) && isFloatArray(b) =>
        Some((a, b))
      case _ => None
    }
  }

  /** sqrt(aggregate(transform(a, x => cast(x)*cast(x)), 0.0, +, id)) */
  private object NormFold {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(
          ArrayTransform(a,
            LambdaFunction(Multiply(Cast(_: NamedLambdaVariable, _, _, _),
              Cast(_: NamedLambdaVariable, _, _, _), _), _, _)),
          Literal(0.0, _),
          LambdaFunction(Add(_, _, _), _, _), _)) if isFloatArray(a) =>
        Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotFold(a, b), Multiply(NormFold(a2), NormFold(b2), _), _)
          if a.semanticEquals(a2) && b.semanticEquals(b2) =>
        CosineSimilarity(a, b)
    }
}
