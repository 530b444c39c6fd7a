package graft
import org.apache.spark.sql.SparkSession

/** Dev-only attribution harness: `runMain graft.PlanTime q1 q2 …` splits
  * each named entry's wall clock into DataFrame construction (analysis),
  * physical planning (optimize + planning, via `executedPlan`), and
  * execution (the count action), after one untimed warm call — so
  * planning-bound entries (giant union SQL) are distinguishable from
  * execution-bound ones. Same session shape as Bench. */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.tunePerf(spark)
    for (n <- args) {
      SparkEntry.queries(n)(spark, sfDir).count() // warm: JIT + landings
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force optimization + physical planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"PLANTIME $n%-28s analyze=${(t1 - t0) / 1e9}%6.2f plan=${(t2 - t1) / 1e9}%6.2f exec=${(t3 - t2) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
