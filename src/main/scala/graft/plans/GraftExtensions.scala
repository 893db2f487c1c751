package graft.plans

import graft.functions.{VectorDot, VectorNorm}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the declarative dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * and rewrite it to the fused native [[VectorDot]] loop (and the
  * matching self-dot-under-sqrt to [[VectorNorm]]). Queries stay
  * written against stock `functions._` — the engine upgrades the plan,
  * the classic Catalyst division of labor (declare intent, let the
  * optimizer pick the machine shape). Accumulation order is identical,
  * so the rewrite is result-preserving bit-for-bit.
  *
  * Registered via `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object FuseVectorOps extends Rule[LogicalPlan] {

  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(_: NamedLambdaVariable,
              _: NamedLambdaVariable, _), _, _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
            LambdaFunction(fin: NamedLambdaVariable, _, _))
          if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) && fin != null =>
        Some((a, b))
      case _ => None
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Sqrt(DotFold(a, b)) if a.semanticEquals(b) => VectorNorm(a)
      case DotFold(a, b) => VectorDot(a, b)
    }
}

/** Session extension installing the graft optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FuseVectorOps)
  }
}
