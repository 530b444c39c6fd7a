package graft

import graft.scoring.Observability

/** Observability export: queued-view join + threshold direction mapping,
  * the reference's input-parameter split walk (comma-packed values),
  * payload chunk math, the Ignore filter, and the Queued→Sent increment
  * (reference: testgen/commands/run_observability_exporter.py,
  * testgen/template/dbsetup/060_create_standard_views.sql:36-103). */
class ObservabilitySpec extends SparkSpec {

  private lazy val rows = Observability.run(spark, sfDir).collect()

  test("every exportable CAT test exports exactly once; Ignore types don't") {
    val defs = graft.cat.CatSuite.suites.toSeq.flatMap { case (t, ts) =>
      ts.map(x => (t, x.testType, x.column))
    }
    val exportable = defs.filterNot(_._2 == "Condition_Flag")
    val got = rows.map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSet == exportable.toSet)
    assert(got.length == exportable.length) // no fan-out from the joins
    assert(!rows.exists(_.getString(1) == "Condition_Flag"))
  }

  test("threshold maps to min or max by operator direction") {
    def row(ty: String, col: String) =
      rows.find(r => r.getString(1) == ty && r.getString(2) == col).get
    val recency = row("Recency", "l_shipdate") // op '>'
    assert(recency.getAs[Double]("min_threshold") == 30.0)
    assert(recency.isNullAt(recency.fieldIndex("max_threshold")))
    val alpha = row("Alpha_Trunc", "c_name") // op '<'
    assert(alpha.getAs[Double]("max_threshold") == 17.0)
    assert(alpha.isNullAt(alpha.fieldIndex("min_threshold")))
    val dvc = row("Distinct_Value_Ct", "c_mktsegment") // op '<>': neither
    assert(dvc.isNullAt(dvc.fieldIndex("min_threshold")))
    assert(dvc.isNullAt(dvc.fieldIndex("max_threshold")))
  }

  test("comma-packed parameter values reassemble through the split walk") {
    // LOV_Match stores a quoted comma-joined list (quotes → backticks);
    // the '='-split walk must re-attach every comma-word but the last,
    // which is the NEXT parameter's name
    val lov = rows.find(r =>
      r.getString(1) == "LOV_Match" && r.getString(2) == "c_mktsegment").get
    assert(lov.getAs[String]("test_parameters") ==
      "baseline_value=`AUTOMOBILE`,`BUILDING`,`FURNITURE`; threshold_value=0")
    // multi-param numeric definition keeps the dataclass field order
    // (threshold_value sits between baseline_value_ct and baseline_sum)
    val shift = rows.find(r =>
      r.getString(1) == "Avg_Shift" && r.getString(2) == "l_extendedprice").get
    assert(shift.getAs[String]("test_parameters") ==
      "baseline_ct=6000; threshold_value=0.5; baseline_avg=2400.0; baseline_sd=1300.0")
  }

  test("a value holding '=' splits the way the reference parser does") {
    // the reference walk on "a=b=c" drops the empty middle value and
    // yields only (b, c); inputParameters itself never emits one, so pin
    // the Scala-side rendering contract instead: quotes become backticks
    // and blank params vanish
    val t = graft.cat.CatTest("X", "c", ">", "1", _ => "COUNT(*)",
      baselineParams = Seq("baseline_value" -> "it's, fine", "baseline_ct" -> ""))
    assert(t.inputParameters == "baseline_ct=, baseline_value=it`s, fine, threshold_value=1"
      || t.inputParameters == "baseline_value=it`s, fine, threshold_value=1")
  }

  test("chunk math: one constant chunk size in [1,500], contiguous chunks") {
    val sizes = rows.map(_.getAs[Long]("chunk_size")).distinct
    assert(sizes.length == 1 && sizes.head >= 1 && sizes.head <= 500)
    val perChunk = rows.groupBy(_.getAs[Long]("chunk_no")).view.mapValues(_.length)
    val maxChunk = perChunk.keys.max
    assert(maxChunk == (rows.length - 1) / sizes.head)
    (0L until maxChunk).foreach(c => assert(perChunk(c) == sizes.head.toInt))
  }

  test("result message is 'uom: measure, Threshold: t'") {
    val rec = rows.find(r =>
      r.getString(1) == "Row_Ct" && r.getString(0) == "orders").get
    val msg = rec.getAs[String]("result")
    assert(msg.startsWith("Row count: "))
    assert(msg.endsWith(", Threshold: 100"))
  }

  test("an errored result row exports with status ERROR and a measureless message") {
    // the reference's isolation path lands an 'Error' row whose measures
    // are NULL; the export must carry it (status ERROR) without a NULL
    // result message
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("table_name", StringType), StructField("test_type", StringType),
      StructField("column_name", StringType), StructField("severity", StringType),
      StructField("measure_num", DoubleType), StructField("measure_str", StringType),
      StructField("result_code", IntegerType), StructField("result_status", StringType),
      StructField("query_error", StringType)))
    val rows = java.util.Arrays.asList(
      Row("lineitem", "Recency", "l_shipdate", null, null, null, null,
        "Error", "boom"))
    spark.createDataFrame(rows, schema)
      .createOrReplaceTempView("__graft_obs_err")
    val out = spark.sql(Observability.exportSql("__graft_obs_err")(
      graft.oracle.SparkDialect)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("status") == "ERROR")
    assert(out.head.getAs[String]("result") == "Days before test: , Threshold: 30")
    assert(out.head.isNullAt(out.head.fieldIndex("metric_value")))
  }

  test("queued→sent: re-exporting the same execution is empty; a new execution exports") {
    val hist = java.nio.file.Files
      .createTempDirectory("graft_obs_hist").toString
    val first = Observability.runQueued(spark, sfDir, hist, "run_1")
    assert(first.count() == rows.length)
    Observability.markSent(spark, first, hist, "run_1")
    // crashed/re-run export of the SAME execution: already Sent
    assert(Observability.runQueued(spark, sfDir, hist, "run_1").count() == 0)
    // a later execution's results are new Queued rows — they export in
    // full (the reference marks result rows, not definitions)
    assert(Observability.runQueued(spark, sfDir, hist, "run_2").count()
      == rows.length)
  }
}
