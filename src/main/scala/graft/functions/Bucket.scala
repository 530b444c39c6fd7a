package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native sign-LSH bucket: `graft_bucket(vec[, nPlanes, dim])` — the
  * same bucket id as the unrolled SQL rendering
  * ([[graft.pipeline.Similarity.unrolledBucketExpr]]): for each fixed
  * hyperplane, project the vector (left-to-right accumulation over
  * double-widened elements — the unrolled `a + b + c` chain's exact
  * association order) and set the plane's bit when the projection is
  * ≥ 0. Bit-identical to the SQL form (BucketExprSpec), which remains
  * the DuckDB oracle's rendering.
  *
  * Why an Expression: the unrolled form is nPlanes × dim arithmetic
  * TERMS in the plan — 512 at the 8×64 defaults, ~6k at production
  * dims — which dominates analysis/codegen time for every LSH consumer
  * (the ANN views, embedding dedup blocking, semantic decontamination).
  * Here the plan carries ONE compact call; the loop runs inside
  * whole-stage codegen via a static method, and the hyperplanes are
  * computed once per (nPlanes, dim) and cached.
  *
  * NULL semantics mirror the SQL: a NULL/missing/short array or a null
  * element makes every projection NULL, and `CASE WHEN NULL >= 0` is
  * false — so the bucket is 0, never NULL. That includes a NULL input
  * vector: eval/doGenCode bypass the default null propagation so the
  * expression is non-nullable, exactly like the unrolled CASE chain.
  */
case class BucketExpr(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bucket"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else BucketExpr.compute(v.asInstanceOf[ArrayData], nPlanes, dim, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        int ${ev.value} = ${childGen.isNull}
          ? 0
          : graft.functions.BucketExpr.compute(
              ${childGen.value}, $nPlanes, $dim, $isFloat);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketExpr =
    copy(child = newChild)
}

/** WIDE sign-LSH bucket: `graft_bucket_long(vec[, nPlanes, dim])` —
  * the LongType twin of [[BucketExpr]] for consumers whose PLANE
  * BUDGET outgrows the 31-bit integer bucket: the stacked (np, R)
  * paths key R disjoint plane ranges off ONE bucket value, so R tables
  * × an adaptively-elected per-table np need up to 63 planes
  * (3 × 21 here, vs the 3 × 10 / 3 × 8 the integer bucket capped —
  * the r13 advisor's "occupancy guarantee exhausts at ~8k vectors per
  * slice" headroom note, now retired as mechanism: per-table occupancy
  * holds to occ·2²¹ ≈ 16.7M vectors per slice). Same plane stream,
  * same NULL semantics, same left-to-right projection order; the low
  * `k` bits equal [[BucketExpr]]'s k-plane bucket (spec-pinned prefix
  * property), and the unrolled BIGINT SQL rendering stays the DuckDB
  * oracle's form. */
case class BucketLongExpr(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bucket_long"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else BucketExpr.computeLong(v.asInstanceOf[ArrayData], nPlanes, dim, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull}
          ? 0L
          : graft.functions.BucketExpr.computeLong(
              ${childGen.value}, $nPlanes, $dim, $isFloat);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketLongExpr =
    copy(child = newChild)
}

object BucketExpr {

  /** The shared deterministic hyperplane source (an LCG over
    * [-0.999, 0.999] thousandths) — [[graft.pipeline.Similarity
    * .hyperplanes]] renders the same sequence into the SQL forms. */
  def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    var s = 0x5DEECE66DL
    def next(): Double = {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      (((s >>> 33) % 1999).toInt - 999) / 1000.0
    }
    Array.fill(nPlanes)(Array.fill(dim)(next()))
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planesFor(nPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nPlanes, dim), _ => planes(nPlanes, dim))

  def compute(a: ArrayData, nPlanes: Int, dim: Int, aFloat: Boolean): Int = {
    // short array / null element ⇒ every projection is SQL-NULL ⇒ no
    // bit ever sets
    if (a.numElements() < dim) return 0
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return 0
      i += 1
    }
    val ws = planesFor(nPlanes, dim)
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      val w = ws(p)
      var proj = 0.0
      var j = 0
      while (j < dim) {
        val v = if (aFloat) a.getFloat(j).toDouble else a.getDouble(j)
        proj += v * w(j)
        j += 1
      }
      if (proj >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  def computeLong(a: ArrayData, nPlanes: Int, dim: Int, aFloat: Boolean): Long = {
    if (a.numElements() < dim) return 0L
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return 0L
      i += 1
    }
    val ws = planesFor(nPlanes, dim)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val w = ws(p)
      var proj = 0.0
      var j = 0
      while (j < dim) {
        val v = if (aFloat) a.getFloat(j).toDouble else a.getDouble(j)
        proj += v * w(j)
        j += 1
      }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.core.SessionCache.getOrElseUpdate(spark, "bucketfn", "reg") {
      def lit(children: Seq[Expression], i: Int, dflt: Int): Int =
        children.lift(i).map(_.eval().asInstanceOf[Number].intValue)
          .getOrElse(dflt)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bucket",
        (children: Seq[Expression]) =>
          BucketExpr(children.head, lit(children, 1, 8), lit(children, 2, 64)),
        "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bucket_long",
        (children: Seq[Expression]) =>
          BucketLongExpr(children.head, lit(children, 1, 63), lit(children, 2, 64)),
        "scala_udf")
      true
    }
}
