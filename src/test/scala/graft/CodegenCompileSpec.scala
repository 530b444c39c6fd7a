package graft

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types.StringType

import graft.functions.{CdcChunksExpr, SimHashExpr, WinnowFpsExpr}

/** The native expressions must actually COMPILE under codegen — not just
  * produce correct values through the interpreted `eval` fallback. Round 9
  * shipped a wrong class FQN in the generated Java (`catalyst.util
  * .UnsafeArrayData` instead of `catalyst.expressions.UnsafeArrayData`),
  * so every winnow/cdc stage logged a Janino ERROR and silently ran
  * interpreted while the specs (which only pin values) stayed green.
  * This spec closes that hole at two layers:
  *
  *  1. `GenerateUnsafeProjection.generate` THROWS on a Janino compile
  *     failure (no fallback at this layer), so a bad FQN fails the test
  *     instead of degrading the plan.
  *  2. End-to-end queries run with `spark.sql.codegen.fallback=false`,
  *     which turns the silent WholeStageCodegen interpreted fallback into
  *     a loud failure on the production-shaped plans.
  */
class CodegenCompileSpec extends SparkSpec {

  private val in = BoundReference(0, StringType, nullable = true)

  test("WinnowFpsExpr generated code compiles (no Janino fallback)") {
    val proj = GenerateUnsafeProjection.generate(Seq(WinnowFpsExpr(in)))
    val row = proj(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "the quick brown fox jumps over the lazy dog")))
    assert(row.getArray(0).numElements() > 0)
  }

  test("CdcChunksExpr generated code compiles (no Janino fallback)") {
    val proj = GenerateUnsafeProjection.generate(Seq(CdcChunksExpr(in)))
    val row = proj(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("x" * 200)))
    assert(row.getArray(0).numElements() > 0)
  }

  test("SimHashExpr generated code compiles (no Janino fallback)") {
    val proj = GenerateUnsafeProjection.generate(Seq(SimHashExpr(in)))
    val row = proj(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("alpha beta gamma")))
    assert(!row.isNullAt(0))
  }

  private def withNoCodegenFallback[T](f: => T): T = {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("winnow and cdc queries execute inside whole-stage codegen with fallback disabled") {
    WinnowFpsExpr.register(spark)
    CdcChunksExpr.register(spark)
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("codegen_docs")
    withNoCodegenFallback {
      val winnow = spark.sql(
        """SELECT doc_id, fp FROM codegen_docs
          | LATERAL VIEW explode(graft_winnow_fps(text)) e AS fp""".stripMargin)
      // collect() (not count(), which builds a separate query execution)
      // so THIS df's AQE plan finalizes; a codegen compile failure throws
      // here because fallback is disabled.
      assert(winnow.collect().length > 0)
      // `*(n)` is the WholeStageCodegen marker in the finalized plan —
      // the Generate stage itself must carry it, not run interpreted.
      val genInCodegen = """\*\(\d+\) Generate""".r
      assert(genInCodegen.findFirstIn(
        winnow.queryExecution.executedPlan.toString).isDefined)

      val cdc = spark.sql(
        """SELECT doc_id, pos, v FROM codegen_docs
          | LATERAL VIEW posexplode(graft_cdc_chunks(text)) p AS pos, v""".stripMargin)
      assert(cdc.collect().length > 0)
      assert(genInCodegen.findFirstIn(
        cdc.queryExecution.executedPlan.toString).isDefined)
    }
  }
}
