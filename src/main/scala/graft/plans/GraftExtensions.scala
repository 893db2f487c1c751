package graft.plans

import graft.functions.{VectorDot, VectorNorm}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Optimizer rule: recognize the declarative dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * and rewrite it to the fused native [[VectorDot]] loop (and the
  * matching self-dot-under-sqrt to [[VectorNorm]]). Queries stay
  * written against stock `functions._` — the engine upgrades the plan,
  * the classic Catalyst division of labor (declare intent, let the
  * optimizer pick the machine shape).
  *
  * The match binds every lambda's own argument list and requires the
  * bound variables to be exactly the ones combined: `Multiply`'s
  * operands must be the zip_with lambda's two variables (as a set, so
  * `x*y` and `y*x` both fuse), `Add`'s operands the merge lambda's
  * `(acc, v)` pair, and the finish lambda must return its own bound
  * accumulator. Shapes like `(x, y) -> x * x` (sum of squares of one
  * side) or `(acc, v) -> acc + acc` therefore do NOT fuse — a
  * globally-registered rule must never rewrite a query it only
  * approximately recognizes. [[VectorDot]] reproduces the fold's null
  * semantics (length mismatch / null element → NULL), so the matched
  * rewrite is result-preserving on all inputs, not just clean ones.
  *
  * Registered via `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object FuseVectorOps extends Rule[LogicalPlan] {

  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(
              Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(
              Add(ax: NamedLambdaVariable, ay: NamedLambdaVariable, _),
              Seq(macc: NamedLambdaVariable, mv: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
          if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) &&
             Set(mx.exprId, my.exprId) == Set(zx.exprId, zy.exprId) &&
             Set(ax.exprId, ay.exprId) == Set(macc.exprId, mv.exprId) &&
             fin.exprId == facc.exprId =>
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

/** Optimizer rule: fuse `size(array_distinct(x))` over string arrays —
  * the type-token-ratio / repetition counter on the text-quality hot
  * path — into the allocation-free [[graft.functions.ArrayDistinctCount]]
  * probe loop. Matches only the non-legacy `Size` (legacySizeOfNull =
  * false): the fused expression returns NULL for a null array, which
  * is `size`'s non-legacy semantics; a legacy session's -1 must not be
  * rewritten. */
object FuseDistinctCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayDistinct(e), false)
          if e.dataType == ArrayType(StringType) ||
             e.dataType == ArrayType(StringType, containsNull = false) =>
        graft.functions.ArrayDistinctCount(e)
    }
}

/** Session extension installing the graft optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FuseVectorOps)
    e.injectOptimizerRule(_ => FuseDistinctCount)
  }
}
