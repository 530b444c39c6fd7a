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
