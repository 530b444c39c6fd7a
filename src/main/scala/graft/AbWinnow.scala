package graft
import org.apache.spark.sql.SparkSession

/** Dev-only A/B for the winnow hot-census forms (VERDICT r14 #4):
  * `runMain graft.AbWinnow` times the window rendering
  * (`winnowBodySparkSql`) against the census+join rendering
  * (`winnowBodySql`) over the SAME checkpointed fingerprint relation,
  * and prints each plan's Exchange / ReusedExchange census. Run with
  * `-Dspark.sql.autoBroadcastJoinThreshold=-1` and a scaled
  * SPARK_GRAFT_SF_DIR to exhibit the no-broadcast (sort-merge) regime
  * the asymptote argument is about. */
object AbWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.tunePerf(spark)
    println(s"autoBroadcastJoinThreshold=" +
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    val fps = graft.pipeline.Dedup.winnowFpsView(spark, sfDir)
    val forms = Seq(
      "window" -> graft.pipeline.Dedup.winnowBodySparkSql(fps),
      "census+join" -> graft.pipeline.Dedup.winnowBodySql(fps))
    for ((name, sql) <- forms) {
      val df = spark.sql(sql)
      df.collect() // warm, and drives THIS QueryExecution to its final plan
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      // census the FINAL adaptive plan (stage reuse only shows there)
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val nStage = "ShuffleQueryStage".r.findAllIn(plan).length
      val nReuse = ("ReusedExchange".r.findAllIn(plan).length
        + "ReusedQueryStage".r.findAllIn(plan).length)
      val nSmj = "SortMergeJoin".r.findAllIn(plan).length
      val nBhj = "BroadcastHashJoin".r.findAllIn(plan).length
      println(f"AB $name%-12s min=${times.min}%6.2f s  exchanges=$nEx stages=$nStage reused=$nReuse smj=$nSmj bhj=$nBhj")
      for (d <- args.headOption)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/winnow_ab_${name.replace("+", "_")}.txt"),
          s"-- FINAL adaptive plan (after execution), autoBroadcastJoinThreshold=" +
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold") +
            s", sf dir=$sfDir\n" + plan + "\n\n-- formatted (initial) --\n" +
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
