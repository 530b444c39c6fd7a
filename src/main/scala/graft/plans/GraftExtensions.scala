package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, CaseWhen, Cast, ElementAt, Expression, GetArrayItem,
  GreaterThanOrEqual, If, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, Decimal, DoubleType, FloatType, IntegerType}

import graft.functions.{BucketExpr, DotExpr}

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

  /** Element-type gate: [[DotExpr]]/[[BucketExpr]] read elements with
    * getFloat/getDouble, so the rewrite must only fire on float/double
    * arrays — a DECIMAL-element array (e.g. a bare `array(0.1, …)`
    * literal, which Spark types as ARRAY<DECIMAL>) passes every
    * structural guard via the analyzer's inserted casts but crashes the
    * kernel at runtime with Decimal→Double ClassCastException. */
  private[plans] def isFloatArray(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    })

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
            isVar(fin, res) && e.dataType == DoubleType &&
            isFloatArray(a) && isFloatArray(b) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HofDot(a, b) => DotExpr(a, b)
    }
}

/** Catalyst optimizer rule: recognize the documented UNROLLED sign-LSH
  * bucket SQL form ([[graft.pipeline.Similarity.unrolledBucketExpr]] —
  * the portable rendering the DuckDB oracle executes and users copy
  * from it):
  *
  * {{{ (CASE WHEN e[1]*w00 + … + e[dim]*w0(dim-1) >= 0 THEN 1 ELSE 0 END)
  *   + (CASE WHEN … >= 0 THEN 2 ELSE 0 END) + … }}}
  *
  * and rewrite it to the native [[graft.functions.BucketExpr]] kernel.
  * The unrolled form carries nPlanes × dim arithmetic TERMS in the plan
  * (512 at the 8×64 defaults, ~6k at production dims) — it dominates
  * analysis time and blows the JVM's 64 KB generated-method limit at
  * real dims (the BucketExprSpec log shows exactly that failure), while
  * the native kernel is ONE compact call inside whole-stage codegen.
  *
  * Guard discipline mirrors [[DotProductRewrite]]: the rewrite fires
  * only when the match is EXACT — every plane a single-branch
  * `CASE WHEN <proj> >= 0 THEN 2^p ELSE 0` (or the optimizer's `If`
  * form), the plane bits a complete 2^0..2^(n-1) set, every projection
  * a left-to-right chain of `element_at(vec, j) * w` over j = 1..dim on
  * the SAME vector, and the weights bit-equal to the engine's fixed
  * hyperplane sequence ([[BucketExpr.planes]]). Anything else — a
  * different weight, a reordered element, a foreign bucket scheme — is
  * left untouched. BucketExpr accumulates each projection left-to-right
  * over double-widened elements, the unrolled chain's association
  * order, so buckets are bit-identical (BucketExprSpec).
  */
object BucketRewrite extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other            => other
  }

  /** Left-assoc `a + b + c` parses as Add(Add(a, b), c) — flatten to
    * the in-order term list. */
  private def flattenAdd(e: Expression): Seq[Expression] = e match {
    case a: Add => flattenAdd(a.left) ++ flattenAdd(a.right)
    case other  => Seq(other)
  }

  private def litNum(e: Expression): Option[Double] = stripCast(e) match {
    case Literal(v: Double, _)  => Some(v)
    case Literal(v: Float, _)   => Some(v.toDouble)
    case Literal(v: Int, _)     => Some(v.toDouble)
    case Literal(v: Long, _)    => Some(v.toDouble)
    case Literal(v: Decimal, _) => Some(v.toDouble)
    case _                      => None
  }

  private def litBit(e: Expression): Option[Int] = stripCast(e) match {
    case Literal(v: Int, _) => Some(v)
    case _                  => None
  }

  /** `element_at(vec, j)` (1-based) or the equivalent GetArrayItem
    * (0-based ordinal), possibly under analyzer casts. */
  private def element(e: Expression): Option[(Expression, Int)] =
    stripCast(e) match {
      case ea: ElementAt =>
        litBit(ea.right).filter(_ >= 1).map(j => (ea.left, j))
      case g: GetArrayItem =>
        litBit(g.right).map(j => (g.left, j + 1))
      case _ => None
    }

  /** One plane: condition `proj >= 0`, value 2^p, else 0. Returns the
    * vector expression, the plane's bit, and its weights in element
    * order — or None when the shape is anything else. */
  private def planeTerm(e: Expression): Option[(Expression, Int, Seq[Double])] = {
    val parts: Option[(Expression, Expression, Expression)] = e match {
      case cw: CaseWhen if cw.branches.size == 1 && cw.elseValue.isDefined =>
        Some((cw.branches.head._1, cw.branches.head._2, cw.elseValue.get))
      case iff: If =>
        Some((iff.predicate, iff.trueValue, iff.falseValue))
      case _ => None
    }
    parts.flatMap { case (cond, value, elseV) =>
      (stripCast(cond), litBit(value), litBit(elseV)) match {
        case (geq: GreaterThanOrEqual, Some(bit), Some(0))
            if bit >= 1 && litNum(geq.right).contains(0.0) =>
          val terms = flattenAdd(stripCast(geq.left)).map { t =>
            stripCast(t) match {
              case m: Multiply =>
                for { (vec, j) <- element(m.left); w <- litNum(m.right) }
                  yield (vec, j, w)
              case _ => None
            }
          }
          if (terms.exists(_.isEmpty) || terms.isEmpty) None
          else {
            val ts = terms.map(_.get)
            val vec = ts.head._1
            val inOrder = ts.zipWithIndex.forall { case ((v, j, _), i) =>
              j == i + 1 && v.semanticEquals(vec)
            }
            if (inOrder) Some((vec, bit, ts.map(_._3))) else None
          }
        case _ => None
      }
    }
  }

  private object UnrolledBucket {
    def unapply(e: Expression): Option[(Expression, Int, Int)] = {
      // Type-gate ONLY behind the Add match: `dataType` is not total —
      // e.g. WindowSpecDefinition throws INTERNAL_ERROR on it, and this
      // unapply runs against every expression node in every plan.
      val isIntAdd = e match {
        case a: Add => a.resolved && a.dataType == IntegerType
        case _      => false
      }
      if (!isIntAdd) return None
      val terms = flattenAdd(e)
      val n = terms.size
      if (n < 2 || n > 30) return None
      val parsed = terms.map(planeTerm)
      if (parsed.exists(_.isEmpty)) return None
      val ps = parsed.map(_.get)
      val vec = ps.head._1
      // same element-type gate as HofDot: BucketExpr reads float/double
      if (!DotProductRewrite.isFloatArray(vec)) return None
      if (!ps.forall(_._1.semanticEquals(vec))) return None
      val dim = ps.head._3.size
      if (dim < 1 || !ps.forall(_._3.size == dim)) return None
      if (ps.map(_._2).toSet != (0 until n).map(1 << _).toSet) return None
      val byPlane = ps.sortBy(t => Integer.numberOfTrailingZeros(t._2)).map(_._3)
      val expect = BucketExpr.planes(n, dim)
      val weightsMatch = byPlane.zip(expect.toSeq).forall {
        case (got, want) => got == want.toSeq
      }
      if (weightsMatch) Some((vec, n, dim)) else None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnrolledBucket(vec, n, dim) => BucketExpr(vec, n, dim)
    }
}

/** Session-extension entry point — the deployment hook:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) installs the engine's
  * optimizer rewrites into any session, including ones the engine does
  * not own. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectOptimizerRule(_ => BucketRewrite)
  }
}
