// org.apache.spark.sql.graft for the same private[sql] access reasons as
// the expression files.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x) }}}
  *
  * into the native codegen [[DotProduct]] expression. Identical values —
  * same left-to-right IEEE summation, and both forms treat a null INPUT
  * array as null — with none of the per-element lambda interpretation or
  * the intermediate product array (measured ~4× on all-pairs cosine
  * joins).
  *
  * Null-element caveat: with a null ELEMENT the HOF form yields a null
  * product that nulls the whole sum, while DotProduct skips the element —
  * so the rewrite fires only when both array types have
  * `containsNull = false` (what `transform(_.cast("double"))` over
  * non-null float embeddings produces).
  *
  * Ragged-length caveat: `zip_with` null-pads the shorter side, so the
  * HOF form yields NULL for unequal lengths while DotProduct truncates to
  * min(len) — the rewrite must not turn a NULL into a number for any user
  * query the session-wide rule touches. Same-expression inputs (the
  * self-dot in norms) are trivially equal-length and rewrite directly;
  * otherwise the rewrite emits `if (size(a) = size(b)) dot(a, b) else
  * null`, which preserves the NULL exactly.
  *
  * Fires only on the exact shape (multiply-zip, 0.0 seed, add-merge,
  * identity finish, both sides `array<double>` without null elements) —
  * anything else is left untouched. Registered by [[GraftExtensions]] via
  * `injectOptimizerRule`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private object MulLambda {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(lf: LambdaFunction): Boolean = lf match {
      case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        x.exprId == a.exprId
      case _ => false
    }
  }

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
          ZipWith(left, right, MulLambda()),
          Literal(0.0, DoubleType),
          AddLambda(),
          IdentityFinish())
          if nonNullDoubleArray(left) && nonNullDoubleArray(right) =>
        if (left.semanticEquals(right)) DotProduct(left, right)
        else If(EqualTo(Size(left), Size(right)),
          DotProduct(left, right), Literal(null, DoubleType))
    }
}
