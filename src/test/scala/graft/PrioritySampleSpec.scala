package graft

import graft.pipeline.PrioritySample
import graft.oracle.SparkDialect

/** Exact-k priority sample: stability, the bottom-k prefix property
  * (growing k only extends the sample), and the TakeOrdered plan shape
  * (no global sort of the corpus). */
class PrioritySampleSpec extends SparkSpec {

  private def sample(k: Int) = {
    graft.core.Tables.load(spark, sfDir, "documents", parallelize = false)
      .createOrReplaceTempView("__graft_prio_spec")
    spark.sql(PrioritySample.sql("__graft_prio_spec", k)(SparkDialect))
  }

  test("sample is reproducible and exactly k") {
    val a = sample(40).collect()
    val b = sample(40).collect()
    assert(a.length == 40)
    assert(a.toSeq == b.toSeq)
  }

  test("bottom-k prefix property: k=20 is the head of k=40") {
    val small = sample(20).collect().map(_.getLong(0)).toSeq
    val big = sample(40).collect().map(_.getLong(0)).toSeq
    assert(big.take(20) == small)
  }

  test("plans as TakeOrdered — no global sort of the corpus") {
    val plan = sample(PrioritySample.K).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }
}
