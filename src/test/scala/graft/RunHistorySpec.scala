package graft

import graft.core.RunStore
import graft.inference.SchemaDrift

/** Run-history semantics: landed snapshots, cross-run drift diffs, and
  * the LAG-based table-period classification. */
class RunHistorySpec extends SparkSpec {

  test("store file report counts files per relation and flags small files") {
    val root = java.nio.file.Files.createTempDirectory("graft_store").toString
    spark.range(1000).toDF("id").repartition(8)
      .write.parquet(s"$root/shattered")
    spark.range(1000).toDF("id").coalesce(1)
      .write.parquet(s"$root/compact")
    val rep = RunStore.fileReport(spark, root).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rep("shattered").getAs[Long]("file_ct") == 8)
    assert(rep("shattered").getAs[Boolean]("small_files"))
    assert(rep("compact").getAs[Long]("file_ct") == 1)
    assert(!rep("compact").getAs[Boolean]("small_files"))
    assert(rep("shattered").getAs[Long]("total_bytes") > 0)
  }

  test("RunStore lands run-stamped snapshots and orders them") {
    val root = java.nio.file.Files.createTempDirectory("graft_hist").toString
    val df = spark.range(3).toDF("id")
    RunStore.land(df, root, "run_001", "data_chars")
    RunStore.land(df, root, "run_000", "data_chars")
    RunStore.land(df, root, "run_002", "other_stage")
    assert(RunStore.runsWith(root, "data_chars") == Seq("run_000", "run_001"))
    val Some((prior, current)) = RunStore.latestTwo(root, "data_chars")
    assert(prior.endsWith("run_000/data_chars"))
    assert(current.endsWith("run_001/data_chars"))
    assert(RunStore.latestTwo(root, "missing").isEmpty)
  }

  test("default history root is namespaced per process") {
    // concurrent invocations (separate processes, possibly different data
    // dirs) must land under different roots — no cross-contamination
    if (!sys.env.contains("GRAFT_HISTORY_DIR"))
      assert(RunStore.root.endsWith(s"_p${ProcessHandle.current().pid()}"),
        RunStore.root)
    // stable within the process: oracle SQL rendered now addresses the
    // same files the Spark query lands later
    assert(RunStore.root == RunStore.root)
  }

  test("schema drift diffs two landed data_chars snapshots into A/D/M") {
    val rows = SchemaDrift.run(spark, sfDir).collect()
    val byType = rows.map(r =>
      (r.getAs[String]("table_name"), r.getAs[String]("column_name")) ->
        r.getAs[String]("change_type")).toMap
    assert(byType(("events", "props")) == "A")
    assert(byType(("orders", "o_comment")) == "D")
    assert(byType(("customer", "c_acctbal")) == "M")
    assert(rows.length == 3)
    // the snapshots really landed as parquet run history
    assert(RunStore.runsWith(RunStore.root, "data_chars")
      .containsSlice(Seq("run_000", "run_001")))
    // the schema-only contract run() relies on (it reuses the current
    // tables' row counts for the prior snapshot): a row-mutating edit
    // to mutateToPrior must trip this spot-check (ADVICE r14)
    val prior = SchemaDrift.priorRunTables(spark, sfDir).toMap
    val cur = graft.core.Tables.load(spark, sfDir, "events", parallelize = false)
    assert(prior("events").count() == cur.count(),
      "priorRunTables mutated row counts — run()'s shared-count shortcut is invalid")
  }

  test("diffLatest consumes genuine cross-invocation history") {
    val root = java.nio.file.Files.createTempDirectory("graft_hist2").toString
    // run 1: prior state; run 2: current state — as two separate landings
    SchemaDrift.landSnapshot(spark, root, "run_000",
      SchemaDrift.priorRunTables(spark, sfDir))
    assert(SchemaDrift.diffLatest(spark, root).isEmpty) // one run: no diff yet
    SchemaDrift.landSnapshot(spark, root, "run_001",
      graft.core.Tables.names.map(t => t -> graft.core.Tables.load(spark, sfDir, t)))
    val drift = SchemaDrift.diffLatest(spark, root).get.collect()
    assert(drift.length == 3)
  }

  test("monitor thresholds consume landed run history and tighten on re-run") {
    import graft.streaming.Monitors
    val root = java.nio.file.Files.createTempDirectory("graft_hist3").toString
    assert(Monitors.thresholdsFromHistory(spark, root).isEmpty) // nothing landed
    // run 1 lands its signals: one observation per series — no spread yet
    Monitors.landSignals(spark, sfDir, root, "run_000")
    val t1 = Monitors.thresholdsFromHistory(spark, root).get.collect()
      .map(r => r.getAs[String]("series") -> r).toMap
    assert(t1.nonEmpty)
    assert(t1.values.forall(_.getAs[Long]("n_signals") == 1L))
    // a single landed signal has no stddev -> no actionable band
    assert(t1.values.forall(_.isNullAt(t1.head._2.fieldIndex("sd_signal"))))
    // run 2 lands the same measurement again: the recalc now consumes
    // BOTH landed runs — bands become finite (avg ± 2·sd with sd = 0)
    Monitors.landSignals(spark, sfDir, root, "run_001")
    val t2 = Monitors.thresholdsFromHistory(spark, root).get.collect()
      .map(r => r.getAs[String]("series") -> r).toMap
    assert(t2.values.forall(_.getAs[Long]("n_signals") == 2L))
    t2.values.foreach { r =>
      val lo = r.getAs[Double]("lower_tolerance")
      val hi = r.getAs[Double]("upper_tolerance")
      val cur = r.getAs[Double]("current_value")
      assert(!lo.isNaN && !hi.isNaN && lo <= cur && cur <= hi,
        s"${r.getAs[String]("series")}: [$lo, $hi] vs $cur")
    }
  }

  test("table period classifies from the record-count LAG over run history") {
    val rows = graft.generation.TestGenerator.runTableType(spark, sfDir).collect()
      .map(r => r.getAs[String]("table_name") ->
        r.getAs[String]("functional_table_type")).toMap
    // events loads as a rolling window whose count fluctuates -> window
    assert(rows("events").startsWith("window-"), rows("events"))
    // cumulative to-date facts and static dims never decrease -> cumulative
    assert(rows("orders").startsWith("cumulative-"))
    assert(rows("lineitem").startsWith("cumulative-"))
    assert(rows("region").startsWith("cumulative-"))
  }

  test("PREDICT bands come from prior runs' LANDED signals via SARIMAX") {
    import graft.streaming.Monitors
    val root = java.nio.file.Files.createTempDirectory("graft_hist_pred").toString
    // 25 runs land their signals, each measuring the state as of its own
    // day — a genuine multi-run landed history, not a backfill
    for (k <- 24 to 0 by -1)
      Monitors.landSignals(spark, sfDir, root, f"run_${24 - k}%03d",
        cutoffDays = Some(k))
    val paths = graft.core.RunStore.runsWith(root, "monitor_signals")
      .map(r => graft.core.RunStore.runPath(root, r, "monitor_signals"))
    assert(paths.length == 25)
    // the LAST run's prediction consumes only what earlier runs landed
    val out = Monitors.predictThresholdsFrom(spark, paths).collect()
    assert(out.nonEmpty)
    val full = out.filter(_.getAs[Int]("n_signals") >= 20)
    assert(full.nonEmpty, "no series accumulated a >=20-run landed history")
    full.foreach { r =>
      assert(r.getAs[String]("method") == "sarimax", r.toString)
      val lo = r.getAs[Double]("lower_tolerance")
      val hi = r.getAs[Double]("upper_tolerance")
      val pred = r.getAs[Double]("predicted")
      assert(!lo.isNaN && !hi.isNaN && lo <= pred && pred <= hi, r.toString)
    }
  }
}
