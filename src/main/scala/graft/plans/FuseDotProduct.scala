package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen'd `graft_dot(a, b)` kernel. Spark's higher-order
  * functions are `CodegenFallback` — evaluated interpretively with a
  * per-row intermediate array — so on pair-join hot paths the idiom is
  * an order of magnitude slower than the fused loop. The rewrite is
  * semantics-preserving: DotProduct folds left-to-right in the same
  * IEEE order, returns null for a null array, and poisons the result
  * to null on a null element exactly as `x*y` / `acc+v` propagation
  * does (DotProductSpec proves bitwise equality).
  *
  * Matched conservatively: both lambdas must be the pure two-variable
  * shapes the DataFrame/SQL frontends produce, the zero literal must
  * be double 0.0, the finish lambda the identity, and both inputs
  * ARRAY<DOUBLE>.
  *
  * Injected by `graft.GraftExtensions` (spark.sql.extensions) as an
  * OPTIMIZER rule (injectOptimizerRule) — it must run after lambda
  * resolution so the NamedLambdaVariable shapes below exist. SQL and
  * DataFrame users get the kernel without code changes.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private object MulLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(xr: NamedLambdaVariable, yr: NamedLambdaVariable, _),
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
        xr.exprId == x.exprId && yr.exprId == y.exprId
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(ar: NamedLambdaVariable, vr: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
        ar.exprId == a.exprId && vr.exprId == v.exprId
      case _ => false
    }
  }

  private object IdentityLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(r: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        r.exprId == a.exprId
      case _ => false
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, mul),
          Literal(zero, DoubleType),
          add,
          finish)
        // bit-exact +0.0 check: a -0.0 seed flips the sign of all-zero
        // sums and must NOT fuse (kernel seeds at +0.0)
        if zero != null &&
          java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
          MulLambda.unapply(mul) && AddLambda.unapply(add) &&
          IdentityLambda.unapply(finish) && isDoubleArray(a) && isDoubleArray(b) =>
      DotProduct(a, b)
  }
}
