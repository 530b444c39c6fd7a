package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking expression: `graft_cdc_chunks(text)`
  * returns the document's chunk spans as ARRAY<BIGINT>, each element
  * packing `(chunk_start << 32) | chunk_len` (1-based start, both
  * < 2^31), in document order — bit-identical spans to the SQL chain in
  * `Chunker.cdcSql` (rolling md5 gram hash, cut where hash ≡ 0 mod
  * divisor, tail span to end of text; Round8OpsSpec asserts row-set
  * identity including the chunk hashes).
  *
  * Why an Expression: the SQL form explodes one row per character
  * position to find the cut points — ~length× row inflation through an
  * Exchange for a per-document value, exactly the shape the winnowing
  * expression already eliminates. Here the whole boundary walk stays
  * inside the row's projection (`doGenCode` emits one static call, the
  * operator stays in the WholeStageCodegen span) and the only rows
  * that ever exist are the ~length/divisor chunks themselves. The
  * DuckDB oracle keeps the SQL rendering, per the dual-render rule.
  */
case class CdcChunksExpr(child: Expression, divisor: Int = 32, k: Int = 8)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      CdcChunksExpr.compute(input.asInstanceOf[UTF8String].toString, divisor, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.CdcChunksExpr.compute($c.toString(), $divisor, $k))")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcChunksExpr {

  /** The boundary walk for one document; each step mirrors the SQL form
    * (same md5-prefix gram hash as the winnowing chain, cut after the
    * gram ending wherever hash % divisor == 0, tail to end of text;
    * empty text → no chunks, matching the SQL form's absent rows). */
  def compute(text: String, divisor: Int, k: Int): Array[Long] = {
    val len = text.length
    if (len == 0) return Array.emptyLongArray
    val n = len - k + 1
    val cuts = new java.util.ArrayList[Integer]()
    if (n >= 1) {
      val md = MessageDigest.getInstance("MD5")
      var i = 0
      while (i < n) {
        md.reset()
        val digest = md.digest(text.substring(i, i + k).getBytes("UTF-8"))
        var h = 0L
        var j = 0
        while (j < 15) {
          val b = digest(j / 2)
          val nib = if (j % 2 == 0) (b >> 4) & 0xf else b & 0xf
          h = (h << 4) | nib
          j += 1
        }
        // SQL: cut = pos + k - 1 with 1-based pos; 0-based i → i + k
        if (h % divisor == 0) cuts.add(i + k)
        i += 1
      }
    }
    val nOut = cuts.size + (if (cuts.isEmpty || cuts.get(cuts.size - 1) < len) 1 else 0)
    val out = new Array[Long](nOut)
    var prev = 0
    var o = 0
    val it = cuts.iterator()
    while (it.hasNext) {
      val c = it.next()
      out(o) = ((prev + 1).toLong << 32) | (c - prev).toLong
      prev = c
      o += 1
    }
    if (o < nOut) out(o) = ((prev + 1).toLong << 32) | (len - prev).toLong
    out
  }

  /** Register `graft_cdc_chunks`; idempotent per session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.core.SessionCache.getOrElseUpdate(spark, "cdcfn", "reg") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_cdc_chunks",
        (children: Seq[Expression]) => CdcChunksExpr(children.head),
        "scala_udf")
      true
    }
}
