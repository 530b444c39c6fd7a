package graft

import graft.core.RunStore
import graft.inference.SchemaDrift

/** Run-history semantics: landed snapshots, cross-run drift diffs, and
  * the LAG-based table-period classification. */
class RunHistorySpec extends SparkSpec {

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
}
