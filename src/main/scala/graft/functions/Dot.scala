package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product: `graft_dot(a, b)` over two numeric arrays,
  * bit-identical to the SQL higher-order-function rendering
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0d, (acc, v) -> acc + v)`
  * — the same left-to-right accumulation over the same
  * float→double-widened products — which remains the DuckDB oracle's
  * `list_dot_product` shape (DotExprSpec asserts the bit identity).
  *
  * Why an Expression: the HOF form allocates a zipped intermediate
  * array and walks two lambda closures PER PAIR — in the pair-join
  * dedup paths (semantic dedup, embedding near-dup) the dot product
  * runs once per candidate pair, so the closure overhead dominates the
  * whole operator. This is a tight primitive loop emitted straight
  * into the WholeStageCodegen span. Mismatched lengths and null
  * elements return NULL, mirroring zip_with's null padding through the
  * sum.
  */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // NULL on length mismatch / null elements even when children are
  // non-nullable (zip_with-padding semantics)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val box = ctx.freshName("dot")
      s"""java.lang.Double $box = graft.functions.DotExpr.compute(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($box == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $box.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

object DotExpr {

  /** Left-to-right `acc + (a_i * b_i)` over double-widened elements —
    * the exact association order of the SQL fold, so sums are
    * bit-identical. Boxed so length mismatch / null elements yield
    * NULL like the zip_with padding does. */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc = acc + x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Register `graft_dot`; idempotent per session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.core.SessionCache.getOrElseUpdate(spark, "dotfn", "reg") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot",
        (children: Seq[Expression]) => DotExpr(children(0), children(1)),
        "scala_udf")
      true
    }
}
