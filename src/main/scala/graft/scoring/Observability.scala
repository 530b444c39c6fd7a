package graft.scoring

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cat.CatSuite
import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Observability export — the reference's outbound test-outcome feed
  * re-expressed as a relation.
  *
  * The reference posts test results to an external "Observability" API
  * (reference: testgen/commands/run_observability_exporter.py:29-330). Its
  * computational content — everything short of the HTTP POST — is:
  *
  *  1. the queued-results view: test results joined to test-type metadata
  *     and the test definition, with the threshold mapped to a min or max
  *     bound by the test operator's direction (reference:
  *     testgen/template/dbsetup/060_create_standard_views.sql:36-103,
  *     `v_queued_observability_results`), result_message composed as
  *     `uom: measure, Threshold: t` (reference:
  *     testgen/template/execution/update_test_results.sql:24-43);
  *  2. the `input_parameters` string parsed back into name/value pairs by
  *     splitting on '=' and re-attaching comma-packed values — the last
  *     comma-word of each middle chunk is the NEXT parameter's name
  *     (reference: run_observability_exporter.py:252-281,
  *     `_get_input_parameters`);
  *  3. payload chunking: events batch into posts of
  *     `min(500, round(qty / (bytes/100000*2)))` events (reference:
  *     run_observability_exporter.py:25-32, `calculate_chunk_size`;
  *     restated with floor instead of Python's half-even round, and with
  *     the JSON byte size restated as the UTF-8 octets of the event's
  *     string fields + a fixed 256-byte envelope — both engines compute
  *     the identical integer);
  *  4. the Queued → Sent lifecycle: only queued results export, and an
  *     exported result never exports again (reference:
  *     run_observability_exporter.py:283-299 + the view's
  *     `observability_status = 'Queued'` filter; update template
  *     testgen/template/observability/update_test_results_exported_to_observability.sql).
  *
  * Spark shape: the CAT result relation is metadata-sized (one row per
  * test definition, independent of corpus rows), so the export is a
  * broadcast-joined projection over it — the global ROW_NUMBER/COUNT
  * windows below order test definitions, never data rows, and stay
  * metadata-sized at any corpus scale. The parameter parse is a bounded
  * lateral series (≤ #params per definition) re-aggregated in place.
  */
object Observability {

  /** Test-type metadata of every type the CAT suites use — transcribed
    * from the reference test-type YAMLs (reference:
    * testgen/template/dbsetup_test_types/test_types_<TYPE>.yaml:
    * test_name_short, test_name_long, measure_uom, dq_dimension). */
  private val typeMeta: Seq[(String, String, String, String, String)] = Seq(
    ("Alpha_Trunc", "Alpha Truncation", "Maximum character count consistent", "Values over max", "Validity"),
    ("Avg_Shift", "Average Shift", "Column mean is consistent with reference", "Difference Measure", "Consistency"),
    ("Condition_Flag", "Custom Condition", "Column values match pre-defined condition", "Values Failing", "Validity"),
    ("Constant", "Constant Match", "All column values match constant value", "Mismatched values", "Validity"),
    ("Daily_Record_Ct", "Daily Records", "All dates present within date range", "Missing dates", "Completeness"),
    ("Dec_Trunc", "Decimal Truncation", "Sum of fractional values at or above reference", "Fractional sum", "Validity"),
    ("Distinct_Date_Ct", "Date Count", "Count of distinct dates at or above reference", "Unique dates", "Timeliness"),
    ("Distinct_Value_Ct", "Value Count", "Count of distinct values has not dropped", "Unique Values", "Validity"),
    ("Email_Format", "Email Format", "Email is correctly formatted", "Invalid emails", "Validity"),
    ("Future_Date", "Past Dates", "Latest date is prior to test run date", "Future dates", "Timeliness"),
    ("Future_Date_1Y", "Future Year", "Future dates within year of test run date", "Future dates post 1 year", "Timeliness"),
    ("Incr_Avg_Shift", "New Shift", "New record mean is consistent with reference", "Z-score of mean shift", "Accuracy"),
    ("LOV_All", "Value Match All", "List of expected values all present in column", "Values found", "Validity"),
    ("LOV_Match", "Value Match", "All column values present in expected list", "Non-matching records", "Validity"),
    ("Min_Date", "Minimum Date", "All dates on or after set minimum", "Dates prior to limit", "Validity"),
    ("Min_Val", "Minimum Value", "All values at or above set minimum", "Values under limit", "Validity"),
    ("Missing_Pct", "Percent Missing", "Consistent ratio of missing values", "Difference measure", "Completeness"),
    ("Monthly_Rec_Ct", "Monthly Records", "At least one date per month present within date range", "Missing months", "Completeness"),
    ("Outlier_Pct_Above", "Outliers Above", "Consistent outlier counts over 2 SD above mean", "Pct records over limit", "Accuracy"),
    ("Outlier_Pct_Below", "Outliers Below", "Consistent outlier counts under 2 SD below mean", "Pct records under limit", "Accuracy"),
    ("Pattern_Match", "Pattern Match", "Column values match alpha-numeric pattern", "Pattern Mismatches", "Validity"),
    ("Recency", "Recency", "Latest date within expected range of test date", "Days before test", "Timeliness"),
    ("Required", "Required Entry", "Required non-null value present", "Missing values", "Completeness"),
    ("Row_Ct", "Row Count", "Number of rows is at or above threshold", "Row count", "Completeness"),
    ("Row_Ct_Pct", "Row Range", "Number of rows within percent range of threshold", "Percent of baseline", "Completeness"),
    ("Street_Addr_Pattern", "Street Address", "Enough street address entries match defined pattern", "Percent matches", "Validity"),
    ("US_State", "US State", "Column value is two-letter US state code", "Not US States", "Validity"),
    ("Unique", "Unique Values", "Each column value is unique", "Duplicate values", "Uniqueness"),
    ("Unique_Pct", "Percent Unique", "Consistent ratio of unique values", "Difference measure", "Uniqueness"),
    ("Valid_Characters", "Valid Characters", "Column contains no invalid characters", "Invalid records", "Validity"),
    ("Valid_Month", "Valid Month", "Valid calendar month in expected format", "Invalid months", "Validity"),
    ("Valid_US_Zip", "Valid US Zip", "Valid USA Postal Codes", "Invalid Zip Codes", "Validity"),
    ("Valid_US_Zip3", "Valid US Zip-3", "Valid USA Zip-3 Prefix", "Invalid Zip-3 Prefix", "Validity"),
    ("Variability_Decrease", "Variability Decrease", "Variability has decreased below threshold", "Pct SD shift", "Accuracy"),
    ("Variability_Increase", "Variability Increase", "Variability has increased above threshold", "Pct SD shift", "Accuracy"),
    ("Weekly_Rec_Ct", "Weekly Records", "At least one date per week present within date range", "Missing weeks", "Completeness"))

  /** Suite configuration: test types the suite does NOT export — the
    * view's `observability_status = 'Ignore'` branch
    * (update_test_results.sql:17-23, export_to_observability = 'N').
    * Custom-condition tests stay internal here, exercising the filter. */
  private val noExportTypes = Set("Condition_Flag")

  private def lit(s: String) = "'" + s.replace("'", "''") + "'"

  /** The test-definition relation as an inline table: key, operator,
    * threshold, and the rendered input_parameters string of every CAT
    * test (the app-DB `test_definitions` rows these suites stand for). */
  private def defsValues: String =
    CatSuite.suites.toSeq.sortBy(_._1).flatMap { case (table, tests) =>
      tests.map { t =>
        val exportFlag = if (noExportTypes(t.testType)) "N" else "Y"
        s"(${lit(table)}, ${lit(t.testType)}, ${lit(t.column)}, ${lit(t.op)}, " +
          s"${lit(t.threshold.stripPrefix("'").stripSuffix("'"))}, " +
          s"${lit(t.inputParameters)}, '$exportFlag')"
      }
    }.mkString(",\n    ")

  private def metaValues: String =
    typeMeta.map { case (ty, short, long, uom, dim) =>
      s"(${lit(ty)}, ${lit(short)}, ${lit(long)}, ${lit(uom)}, ${lit(dim)})"
    }.mkString(",\n    ")

  // the CAT suite's own 4-decimal text rendering — ONE definition, so the
  // exported result strings can never diverge from the CAT-side lookups
  private def decStr(d: Dialect, x: String) = graft.cat.CatMeasures.decStr(d, x)

  /** The full export relation over a CAT-results relation. `catRel` must
    * expose (table_name, test_type, column_name, result_status,
    * measure_num, measure_str). */
  def exportSql(catRel: String)(d: Dialect): String = {
    val t = d.textType
    // the reference's `_get_input_parameters` split walk, pair p of P:
    // name_p = whole item 1 when p=1, else the last comma-word of item p;
    // value_p = whole item P+1 when p=P, else item p+1 minus its last
    // comma-word — and '' (pair dropped) when that middle item holds no
    // comma at all (Python's ",".join(words[:-1]) of a 1-word list)
    val item = (i: String) => s"SPLIT_PART(ip, '=', $i)"
    val pname =
      s"""TRIM(CASE WHEN p.pos = 1 THEN ${item("1")}
         |          ELSE ${d.regexpExtract(item("p.pos"), "([^,]*)$", 1)} END)""".stripMargin
    val pvalue =
      s"""TRIM(CASE WHEN p.pos = np THEN ${item("p.pos + 1")}
         |          WHEN ${d.strpos(item("p.pos + 1"), ",")} = 0 THEN ''
         |          ELSE ${d.regexpReplace(item("p.pos + 1"), ",[^,]*$", "")} END)""".stripMargin
    val eventBytes = Seq("type_short", "name_long", "table_name",
      "column_name", "status", "result", "input_parameters")
      .map(c => d.byteLen(s"COALESCE($c, '')")).mkString(" + ")
    s"""WITH defs AS (
       |  SELECT * FROM (VALUES
       |    $defsValues
       |  ) AS defs(table_name, test_type, column_name, test_op,
       |            threshold_value, input_parameters, export_flag)),
       |tmeta AS (
       |  SELECT * FROM (VALUES
       |    $metaValues
       |  ) AS tmeta(test_type, type_short, name_long, test_uom, dq_dimension)),
       |catres AS (SELECT * FROM $catRel),
       |queued AS ${d.cteMaterialized}(
       |  SELECT c.table_name, c.test_type, c.column_name,
       |         m.type_short, m.name_long, m.dq_dimension,
       |         m.test_uom AS metric_name,
       |         CASE WHEN dd.test_op IN ('>', '>=')
       |              THEN TRY_CAST(dd.threshold_value AS DOUBLE) END AS min_threshold,
       |         CASE WHEN dd.test_op IN ('<', '<=')
       |              THEN TRY_CAST(dd.threshold_value AS DOUBLE) END AS max_threshold,
       |         UPPER(CAST(c.result_status AS $t)) AS status,
       |         CAST(c.measure_num AS DOUBLE) AS metric_value,
       |         m.test_uom || ': '
       |           || COALESCE(${decStr(d, "c.measure_num")},
       |                       CAST(c.measure_str AS $t), '')
       |           || ', Threshold: ' || dd.threshold_value AS result,
       |         dd.input_parameters
       |    FROM catres c
       |    JOIN defs dd ON dd.table_name = c.table_name
       |                AND dd.test_type = c.test_type
       |                AND dd.column_name = c.column_name
       |    JOIN tmeta m ON m.test_type = c.test_type
       |   WHERE dd.export_flag = 'Y'),
       |plist AS (
       |  SELECT table_name, test_type, column_name,
       |         input_parameters AS ip,
       |         ${d.regexpCount("input_parameters", "=")} AS np
       |    FROM queued),
       |pexp AS (
       |  ${d.seriesRel("plist", Seq("table_name", "test_type", "column_name", "ip", "np"), "np")}),
       |pairs AS (
       |  SELECT p.table_name, p.test_type, p.column_name, p.pos,
       |         $pname AS pname,
       |         $pvalue AS pvalue
       |    FROM pexp p),
       |parsed AS (
       |  SELECT table_name, test_type, column_name,
       |         ${d.stringAgg("pname || '=' || pvalue", "; ", "pos")} AS test_parameters
       |    FROM pairs WHERE pvalue <> ''
       |   GROUP BY table_name, test_type, column_name),
       |chunked AS (
       |  SELECT q.*,
       |         COUNT(*) OVER () AS export_qty,
       |         SUM($eventBytes + 256) OVER () AS export_bytes,
       |         ROW_NUMBER() OVER (ORDER BY table_name, test_type, column_name) AS event_seq
       |    FROM queued q)
       |SELECT c.table_name, c.test_type, c.column_name,
       |       c.type_short, c.name_long AS test_name, c.dq_dimension,
       |       c.metric_name, c.min_threshold, c.max_threshold,
       |       c.status, c.metric_value, c.result,
       |       COALESCE(p.test_parameters, '') AS test_parameters,
       |       CAST(LEAST(500, GREATEST(1, ${d.intDiv("c.export_qty * 50000", "c.export_bytes")})) AS BIGINT) AS chunk_size,
       |       CAST(${d.intDiv("c.event_seq - 1",
                          s"LEAST(500, GREATEST(1, ${d.intDiv("c.export_qty * 50000", "c.export_bytes")}))")} AS BIGINT) AS chunk_no
       |  FROM chunked c
       |  LEFT JOIN parsed p ON p.table_name = c.table_name
       |                    AND p.test_type = c.test_type
       |                    AND p.column_name = c.column_name
       | ORDER BY c.table_name, c.test_type, c.column_name""".stripMargin
  }

  /** The stateless full export of every queued result (the oracle-checked
    * entry). */
  def run(spark: SparkSession, dir: String): DataFrame =
    spark.sql(exportSql(Scoring.catResultsView(spark, dir))(SparkDialect))

  def duckSql(): String = exportSql(Scoring.duckCatRel())(DuckDialect)

  /** Incremental lifecycle: export only RESULT rows not yet marked Sent
    * (the view's `observability_status = 'Queued'` filter + the
    * post-export update template). The reference marks individual
    * result rows, not definitions — a later test EXECUTION inserts new
    * Queued rows that export in full — so the Sent identity here is
    * (execution run, definition key): `execRunId` names the execution
    * batch that produced the results (the Runner's invocation id), a
    * re-invoked export for the SAME execution sends nothing, and a new
    * execution's results always export. The sent-set is the landed key
    * relation of every prior `observability_sent` run — metadata-sized,
    * so the anti-join broadcasts. */
  def runQueued(spark: SparkSession, dir: String, historyRoot: String,
                execRunId: String): DataFrame = {
    val full = run(spark, dir).withColumn("exec_run_id",
      org.apache.spark.sql.functions.lit(execRunId))
    val sentRuns = graft.core.RunStore.runsWith(historyRoot, "observability_sent")
    if (sentRuns.isEmpty) full.drop("exec_run_id")
    else {
      val sent = sentRuns
        .map(r => spark.read.parquet(
          graft.core.RunStore.runPath(historyRoot, r, "observability_sent")))
        .reduce(_ unionByName _)
      full.join(
        org.apache.spark.sql.functions.broadcast(sent.distinct()),
        Seq("exec_run_id", "table_name", "test_type", "column_name"),
        "left_anti").drop("exec_run_id")
    }
  }

  /** Mark an exported batch Sent: land its result keys (under the
    * execution id that produced them) in the run history so a re-run of
    * the SAME execution's export sends nothing (the reference's
    * update_test_results_exported_to_observability.sql). */
  def markSent(spark: SparkSession, exported: DataFrame,
               historyRoot: String, execRunId: String): Unit = {
    graft.core.RunStore.land(
      exported.select("table_name", "test_type", "column_name")
        .withColumn("exec_run_id",
          org.apache.spark.sql.functions.lit(execRunId)),
      historyRoot, execRunId, "observability_sent")
    ()
  }
}
