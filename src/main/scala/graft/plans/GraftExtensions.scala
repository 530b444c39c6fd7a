package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Cast, Expression, LambdaFunction,
  Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.DotExpr

/** Catalyst optimizer rule: recognize the higher-order-function dot
  * product `aggregate(zip_with(a, b, (x, y) -> x * y), 0d,
  * (acc, v) -> acc + v)` — the idiomatic Spark SQL spelling — and
  * rewrite it to the native [[graft.functions.DotExpr]] kernel.
  *
  * Why a Rule and not just the function: engine-authored SQL already
  * renders `graft_dot` directly (SparkDialect), but USER queries
  * against the same session keep writing the portable HOF form —
  * `ArrayAggregate` is `CodegenFallback` (interpreted, a zipped
  * allocation + two closure walks per row), so the rewrite transparently
  * upgrades any user dot product to the codegen'd loop. The rewrite is
  * exact, not approximate: DotExpr accumulates left-to-right over
  * double-widened elements — bit-identical results (DotExprSpec), and
  * GraftExtensionsSpec asserts the plan swap and value equality.
  *
  * Guards: the zero must be literal 0.0 (possibly under a cast), the
  * zip lambda a bare multiply of the two lambda variables (casts
  * allowed — analyzer-inserted for float arrays), the merge lambda a
  * bare add of accumulator and element, and the finish lambda the
  * identity. Anything else is left untouched.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other            => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _                       => false
    }

  private def isZeroDouble(e: Expression): Boolean = stripCast(e) match {
    case Literal(v, DoubleType) => v == 0.0d
    case Literal(v, _)          => v == 0
    case _                      => false
  }

  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mult: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(res: NamedLambdaVariable), _))
          if isZeroDouble(zero) &&
            ((isVar(mult.left, x) && isVar(mult.right, y)) ||
              (isVar(mult.left, y) && isVar(mult.right, x))) &&
            ((isVar(add.left, acc) && isVar(add.right, v)) ||
              (isVar(add.left, v) && isVar(add.right, acc))) &&
            isVar(fin, res) && e.dataType == DoubleType =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HofDot(a, b) => DotExpr(a, b)
    }
}

/** Session-extension entry point — the deployment hook:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) installs the engine's
  * optimizer rewrites into any session, including ones the engine does
  * not own. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => DotProductRewrite)
}
