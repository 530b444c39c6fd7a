package graft

import graft.core.Materialize

/** The capped landed-relation helper (VERDICT r14 #8): under the cap a
  * relation lands as a LocalRelation (consumers see LocalTableScan);
  * past the cap it falls back to a distributed localCheckpoint with the
  * same rows — the "metadata-sized" claim is enforced, not argued. */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("under the cap: LocalRelation, same rows") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val view = Materialize.localView(spark, df, "__mat_small")
    val landed = spark.table(view)
    assert(landed.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(landed.collect().map(r => (r.getInt(0), r.getString(1))).sorted
      === Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("over the cap: distributed fallback, same rows, no driver relation") {
    val df = spark.range(0, 50).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    val view = Materialize.localView(spark, df, "__mat_big", cap = 10)
    val landed = spark.table(view)
    val plan = landed.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"expected checkpoint scan, got:\n$plan")
    assert(landed.count() === 50)
    assert(landed.selectExpr("SUM(k)").as[Long].head() === (0L until 50L).sum)
  }
}
