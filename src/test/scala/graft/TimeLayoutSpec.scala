package graft

import graft.core.TimeLayout

/** Date-partitioned layout: the day query must actually PRUNE — only the
  * target date's files are listed into the scan — and the rollup must
  * match the raw-table computation. */
class TimeLayoutSpec extends SparkSpec {

  test("day query scans only the target partition") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val allDates = spark.read
      .parquet(TimeLayout.layoutPath(spark, sfDir))
      .select("event_date").distinct().count()
    val day = graft.core.Tables.load(spark, sfDir, "events")
      .selectExpr("CAST(date_add(CAST(MIN(ts) AS DATE), 5) AS STRING)")
      .head().getString(0)
    val pruned = TimeLayout.dayFrame(spark, sfDir, day)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    // selectedPartitions applies the pushed partition filters at listing
    // time — the pruning the layout exists for
    assert(allDates > 1)
    assert(scan.selectedPartitions.partitionCount == 1,
      s"no pruning: ${scan.selectedPartitions.partitionCount} of $allDates partitions listed")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      plan.take(400))
  }

  test("appending a new day never rewrites existing date directories") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // a private copy of the layout (the memoized one is shared)
    val dir = java.nio.file.Files.createTempDirectory("graft_tl_app").toString + "/ev"
    val events = graft.core.Tables.load(spark, sfDir, "events")
    events.withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write.partitionBy("event_date").parquet(dir)
    def stats(d: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(d))
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = stats(dir)
    val nextDay = events.selectExpr("date_add(CAST(MAX(ts) AS DATE), 1)")
      .head().getDate(0)
    val batch = events.limit(50)
      .withColumn("ts", to_timestamp(lit(nextDay.toString + " 12:00:00")))
    graft.core.TimeLayout.appendBatch(spark, dir, batch)
    val after = stats(dir)
    // every pre-existing file is byte-identical; only the new date's
    // directory gained files
    before.foreach { case (p, s) => assert(after(p) == s, s"$p changed") }
    val newFiles = after.keySet.diff(before.keySet)
    assert(newFiles.nonEmpty &&
      newFiles.forall(_.contains(s"event_date=$nextDay")))
    assert(spark.read.parquet(dir)
      .where(col("event_date") === lit(nextDay)).count() == 50)
  }

  test("pruned rollup equals the raw-table computation") {
    val pruned = TimeLayout.runDayRollup(spark, sfDir).collect()
    graft.core.Tables.load(spark, sfDir, "events")
      .createOrReplaceTempView("__graft_tl_check")
    val raw = spark.sql(TimeLayout.daySql("__graft_tl_check",
      "(SELECT date_add(CAST(MIN(ts) AS DATE), 5) FROM __graft_tl_check)",
      "CAST(ts AS DATE)")(graft.oracle.SparkDialect)).collect()
    assert(pruned.nonEmpty)
    assert(pruned.toSeq == raw.toSeq)
  }
}
