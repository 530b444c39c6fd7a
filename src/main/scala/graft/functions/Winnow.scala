package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing-fingerprint expression: `winnow_fps(text)` returns
  * the document's DISTINCT window-minimum gram hashes as ARRAY<BIGINT>,
  * bit-identical to the SQL pipeline in `Dedup.winnowFpsSql` (normalize →
  * md5 char-grams → w-window minima → distinct; WinnowExprSpec asserts
  * the identity per row).
  *
  * Why an Expression and not the SQL form on the engine side: the SQL
  * pipeline EXPLODES one row per character position and then runs a
  * per-doc window sort — at 100 TB that is ~length× row inflation
  * through an Exchange+Sort just to compute a per-document value. This
  * expression keeps the whole computation inside the row's projection:
  * no explode, no sort, no shuffle, and `doGenCode` emits a plain static
  * call so the operator stays inside the WholeStageCodegen span. The
  * DuckDB oracle keeps the SQL rendering (single statement, set-identical
  * output), per the dual-render rule.
  */
case class WinnowFpsExpr(child: Expression, k: Int = 8, w: Int = 4)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      WinnowFpsExpr.compute(input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.WinnowFpsExpr.compute($c.toString(), $k, $w))")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

object WinnowFpsExpr {

  /** The full winnowing chain for one document; each step mirrors the
    * SQL form exactly (same normalization, same md5-prefix hash, same
    * window bound, same distinct), so engine and oracle fingerprint
    * identically. Returns a SORTED distinct array (set semantics — every
    * consumer treats fps as a relation). */
  def compute(text: String, k: Int, w: Int): Array[Long] = {
    // TRIM(regexp_replace(LOWER(text), '\s+', ' ')) — ASCII-safe
    // lowercase matches Spark's UTF8String simple casing for this
    // pipeline's md5-hex/whitespace handling
    val norm = text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ").trim()
    val n = norm.length - k + 1
    if (n < w) return Array.emptyLongArray
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      // first 15 hex chars of md5(gram), read base-16 — the SQL
      // hexToLong(SUBSTRING(MD5(gram), 1, 15))
      md.reset()
      val digest = md.digest(norm.substring(i, i + k).getBytes("UTF-8"))
      var h = 0L
      var j = 0
      while (j < 15) {
        val b = digest(j / 2)
        val nib = if (j % 2 == 0) (b >> 4) & 0xf else b & 0xf
        h = (h << 4) | nib
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    // w-window minima for pos >= w (1-based), i.e. index pos-1 >= w-1
    val set = new java.util.TreeSet[java.lang.Long]()
    var p = w - 1
    while (p < n) {
      var m = hashes(p)
      var q = p - w + 1
      while (q < p) {
        if (hashes(q) < m) m = hashes(q)
        q += 1
      }
      set.add(m)
      p += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  /** Register `graft_winnow_fps` in the session's function registry so
    * plain SQL can call it. Idempotent per session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.core.SessionCache.getOrElseUpdate(spark, "winnowfn", "reg") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_winnow_fps",
        (children: Seq[Expression]) => WinnowFpsExpr(children.head),
        "scala_udf")
      true
    }
}

/** Native 32-bit SimHash signature: `graft_simhash(text)` packs the
  * per-word md5-hex-digit parity majority votes into one BIGINT,
  * bit-identical to the SQL pipeline in `Dedup.simhashSigsSql` (word
  * explode → DISTINCT (doc, word) → 32 parity sums → pack) but computed
  * row-locally: the token stream never leaves the row, removing the
  * word explode and both per-doc aggregation shuffles. NULL when the
  * document has no words — the SQL form emits no row for such docs, and
  * the consumer filters IS NOT NULL to match.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val box = ctx.freshName("sh")
      s"""java.lang.Long $box = graft.functions.SimHashExpr.compute($c.toString());
         |if ($box == null) { ${ev.isNull} = true; } else { ${ev.value} = $box; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {

  /** Boxed so "no words" can be NULL (mirrors the SQL form's absent
    * row). Mirrors: LOWER → split \s+ → distinct words → per word
    * md5; bit i of the signature = majority of hex-digit-i parity. */
  def compute(text: String): java.lang.Long = {
    val words = new java.util.HashSet[String]()
    for (w <- text.toLowerCase(java.util.Locale.ROOT).split("\\s+"))
      if (w.nonEmpty) words.add(w)
    if (words.isEmpty) return null
    val md = MessageDigest.getInstance("MD5")
    val sums = new Array[Int](32)
    val it = words.iterator()
    while (it.hasNext) {
      md.reset()
      val digest = md.digest(it.next().getBytes("UTF-8"))
      var i = 0
      while (i < 32) {
        val b = digest(i / 2)
        val nib = if (i % 2 == 0) (b >> 4) & 0xf else b & 0xf
        sums(i) += (if ((nib & 1) == 1) 1 else -1)
        i += 1
      }
    }
    var v = 0L
    var i = 0
    while (i < 32) {
      if (sums(i) >= 0) v |= 1L << i
      i += 1
    }
    java.lang.Long.valueOf(v)
  }

  /** Register `graft_simhash`; idempotent per session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.core.SessionCache.getOrElseUpdate(spark, "simhashfn", "reg") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_simhash",
        (children: Seq[Expression]) => SimHashExpr(children.head),
        "scala_udf")
      true
    }
}
