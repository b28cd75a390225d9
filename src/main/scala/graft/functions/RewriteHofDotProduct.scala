package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the higher-order-function dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[ArrayDot]] when both inputs are array<double>.
  * Semantics-preserving for EVERY input, not just equal-length non-null
  * arrays: ArrayDot folds left-to-right exactly like the HOF chain and
  * mirrors its null semantics (zip_with pads the shorter array with nulls,
  * so the HOF form is null on length mismatch or null elements — ArrayDot
  * returns null in exactly those cases; LlmSpec pins agreement on all
  * three regimes). The HOF form is interpreted (CodegenFallback) while
  * ArrayDot compiles to a primitive loop (measured 7× on pairwise cosine). Users who write the
  * natural declarative form get the fast plan automatically; this is the
  * classic "declare intent, let the optimizer pick the implementation"
  * Catalyst division of labor.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object MultiplyLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object IdentityLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        x.exprId == a.exprId
      case _ => false
    }
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0.0, DoubleType), DoubleType, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, MultiplyLambda()), zero, AddLambda(), IdentityLambda())
          if isZero(zero) && isDoubleArray(l) && isDoubleArray(r) =>
        ArrayDot(l, r)
    }
}
