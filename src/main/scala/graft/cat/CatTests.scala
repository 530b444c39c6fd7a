package graft.cat

import graft.functions.Patterns.{inList, sq}
import graft.oracle.{Dialect, DuckDialect, SparkDialect}
import graft.profiling.ProfileMetrics

/** Column-Aggregate-Test (CAT) measures.
  *
  * The reference fuses many per-column aggregate measures into one scan per
  * table by string-concatenating them and re-splitting the result
  * (reference: testgen/commands/queries/execute_tests_query.py:82-173,454-502,
  * bounded by max_query_chars). On Spark that mechanism collapses into a
  * single native multi-aggregate `SELECT m1, m2, … FROM table` — one scan,
  * no string packing, no size bound — followed by a zero-cost `stack`
  * unpivot into one row per test.
  *
  * Measure semantics are ported 1:1 from the postgres flavor of each
  * test-type definition (reference: testgen/template/dbsetup_test_types/
  * test_types_<TYPE>.yaml, `cat_test_conditions.measure`). `result_code`
  * uses the reference encoding: 0 = fail (condition holds), 1 = pass
  * (reference: testgen/template/execution/update_test_results.sql:10-14).
  */
final case class CatTest(
    testType: String,
    column: String,
    op: String,
    threshold: String,
    measure: Dialect => String,
    stringMeasure: Boolean = false,
    lookup: Option[(Dialect, String) => String] = None,
    baselineParams: Seq[(String, String)] = Nil) {
  def condition(d: Dialect): String = s"${measure(d)} $op $threshold"

  /** The reference's rendered `input_parameters` string for this test
    * definition: every populated InputParameters field as `name=value`,
    * quotes replaced with backticks (reference:
    * testgen/commands/queries/execute_tests_query.py:29-50,268-273 — note
    * the dataclass declares threshold_value BETWEEN baseline_value_ct and
    * baseline_sum, so the canonical order keeps it there). The reference
    * joins with "; " but its own Observability parser
    * (run_observability_exporter.py:252-281) splits values on commas —
    * the legacy ", "-joined format is the one it parses correctly, so
    * that is the format rendered here (the exporter entry documents the
    * quirk).
    */
  def inputParameters: String = {
    val order = Seq("baseline_ct", "baseline_unique_ct", "baseline_value",
      "baseline_value_ct", "threshold_value", "baseline_sum",
      "baseline_avg", "baseline_sd")
    val all = baselineParams :+ ("threshold_value" -> threshold)
    val unknown = all.map(_._1).filterNot(order.contains)
    require(unknown.isEmpty,
      s"$testType($column): parameters not in the InputParameters " +
        s"field set would be silently dropped: ${unknown.mkString(", ")}")
    order.flatMap(k => all.collectFirst { case (`k`, v) if v.nonEmpty => s"$k=$v" })
      .mkString(", ").replace("'", "`")
  }
}

object CatMeasures {
  private val runDate = ProfileMetrics.RunDate
  private def dbl(x: String) = s"CAST($x AS DOUBLE)"
  private def sumIf(cond: String) = s"SUM(CASE WHEN $cond THEN 1 ELSE 0 END)"
  private val runDateLit = s"DATE '$runDate'"

  // ---- drill-down lookup builders ------------------------------------
  // Every CAT test carries the lookup_query of its reference test-type
  // YAML (testgen/template/dbsetup_test_types/test_types_<TYPE>.yaml,
  // source_data_service.py:49-105 for the row limit), normalized to a
  // UNIFORM (v: text, ct: bigint) shape so DrillDown can union them into
  // one oracle-checkable drill-down relation. Two shapes cover the
  // inventory: offending values grouped with counts (ordered
  // deterministically before the 500-row limit — the documented
  // deviation from the reference's random sample), and single-row
  // "current measure" lookups for whole-table aggregates.
  private val LookupLimit = 500

  /** Offending-value group lookup: value + occurrence count. */
  private def groupLk(where: Dialect => String,
                      valExpr: (Dialect, String) => String = (d, c) => s"CAST($c AS ${d.textType})")
                     (c: String): (Dialect, String) => String =
    (d, tbl) =>
      s"""SELECT ${valExpr(d, c)} AS v, CAST(COUNT(*) AS BIGINT) AS ct
         |  FROM $tbl
         | WHERE ${where(d)}
         | GROUP BY 1
         | ORDER BY ct DESC, v
         | LIMIT $LookupLimit""".stripMargin

  /** Single-row current-measure lookup. */
  private def scalarLk(valExpr: Dialect => String): (Dialect, String) => String =
    (d, tbl) =>
      s"SELECT CAST(${valExpr(d)} AS ${d.textType}) AS v, CAST(COUNT(*) AS BIGINT) AS ct FROM $tbl"

  /** Exact 4-decimal text rendering of a numeric (identical on both
    * engines, unlike raw double-to-string). Shared with the
    * observability export's result-message rendering. */
  private[graft] def decStr(d: Dialect, x: String) =
    s"CAST(CAST(ROUND(${dbl(x)}, 4) AS DECIMAL(28,4)) AS ${d.textType})"

  def alphaTrunc(c: String, t: String) =
    CatTest("Alpha_Trunc", c, "<", t, _ => s"MAX(LENGTH($c))",
      lookup = Some((d, tbl) =>
        s"""SELECT CAST($c AS ${d.textType}) AS v, CAST(COUNT(*) AS BIGINT) AS ct
           |  FROM $tbl, (SELECT MAX(LENGTH($c)) AS ml FROM $tbl) m
           | WHERE LENGTH($c) = m.ml
           | GROUP BY 1 ORDER BY ct DESC, v LIMIT $LookupLimit""".stripMargin))

  def avgShift(c: String, bct: Long, bavg: Double, bsd: Double, t: String) =
    CatTest("Avg_Shift", c, ">=", t, _ =>
      s"""ABS((AVG(${dbl(c)}) - $bavg) / SQRT(((${dbl(s"COUNT($c)")} - 1) * POWER(STDDEV(${dbl(c)}), 2)
         | + ($bct - 1) * POWER($bsd, 2)) / NULLIF(${dbl(s"COUNT($c)")} + $bct, 0)))""".stripMargin.replace("\n", ""),
      lookup = Some(scalarLk(d => decStr(d, s"AVG(${dbl(c)})"))),
      baselineParams = Seq("baseline_ct" -> bct.toString,
        "baseline_avg" -> bavg.toString, "baseline_sd" -> bsd.toString))

  def conditionFlag(c: String, custom: String, t: String) =
    CatTest("Condition_Flag", c, ">", t, _ => sumIf(custom),
      lookup = Some(groupLk(_ => custom)(c)))

  def constant(c: String, baselineLit: String, t: String) =
    CatTest("Constant", c, ">", t, _ => sumIf(s"$c <> $baselineLit"),
      lookup = Some(groupLk(_ => s"$c <> $baselineLit")(c)),
      baselineParams = Seq("baseline_value" -> baselineLit))

  def dailyRecordCt(c: String, t: String) =
    CatTest("Daily_Record_Ct", c, ">", t, d =>
      s"${d.dateDiffDay(s"MIN($c)", s"MAX($c)")} + 1 - COUNT(DISTINCT CAST($c AS DATE))",
      lookup = Some(scalarLk(d =>
        s"${d.dateDiffDay(s"MIN($c)", s"MAX($c)")} + 1 - COUNT(DISTINCT CAST($c AS DATE))")))

  def decTrunc(c: String, t: String) =
    CatTest("Dec_Trunc", c, "<", t, _ => s"SUM(ROUND(ABS(${dbl(c)} % 1), 5)) + 1",
      lookup = Some(scalarLk(_ => s"SUM(ROUND(ABS(${dbl(c)} % 1), 5)) + 1")))

  def distinctDateCt(c: String, t: String) =
    CatTest("Distinct_Date_Ct", c, "<", t, _ => s"COUNT(DISTINCT $c)",
      lookup = Some(scalarLk(_ => s"COUNT(DISTINCT $c)")))

  def distinctValueCt(c: String, t: String) =
    CatTest("Distinct_Value_Ct", c, "<>", t, _ => s"COUNT(DISTINCT $c)",
      lookup = Some(groupLk(_ => s"$c IS NOT NULL")(c)))

  /** CAT flavor of the email regex includes an escaped apostrophe
    * (test_types_Email_Format.yaml pg measure). */
  val emailCat = """^[A-Za-z0-9._'%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"""
  def emailFormat(c: String, t: String) =
    CatTest("Email_Format", c, ">", t, d => sumIf(d.notRlike(c, emailCat)),
      lookup = Some(groupLk(d => s"$c IS NOT NULL AND ${d.notRlike(c, emailCat)}")(c)))

  def futureDate(c: String, t: String) =
    CatTest("Future_Date", c, ">", t, d =>
      s"SUM(GREATEST(0, SIGN(${d.dateDiffDay(runDateLit, c)})))",
      lookup = Some(groupLk(d => s"${d.dateDiffDay(runDateLit, c)} > 0",
        (d, col) => d.fmtTs(col))(c)))

  def futureDate1Y(c: String, t: String) =
    CatTest("Future_Date_1Y", c, ">", t, d =>
      s"SUM(GREATEST(0, SIGN(${d.dateDiffDay(d.dateAddDays(runDateLit, 365), c)})))",
      lookup = Some(groupLk(d => s"${d.dateDiffDay(d.dateAddDays(runDateLit, 365), c)} > 0",
        (d, col) => d.fmtTs(col))(c)))

  def incrAvgShift(c: String, bct: Long, bsum: Double, bavg: Double, bsd: Double, t: String) =
    CatTest("Incr_Avg_Shift", c, ">=", t, _ =>
      s"COALESCE(ABS(($bavg - (SUM(${dbl(c)}) - $bsum) / NULLIF(${dbl(s"COUNT($c)")} - $bct, 0)) / $bsd), 0)",
      lookup = Some(scalarLk(d => decStr(d,
        s"(SUM(${dbl(c)}) - $bsum) / NULLIF(${dbl(s"COUNT($c)")} - $bct, 0)"))),
      baselineParams = Seq("baseline_ct" -> bct.toString,
        "baseline_sum" -> bsum.toString, "baseline_avg" -> bavg.toString,
        "baseline_sd" -> bsd.toString))

  def lovAll(c: String, expected: String) =
    CatTest("LOV_All", c, "<>", sq(expected), d => d.stringAggDistinct(c, "|"),
      stringMeasure = true,
      lookup = Some(groupLk(_ => s"$c IS NOT NULL")(c)),
      baselineParams = Seq("baseline_value" -> expected))

  def lovMatch(c: String, allowed: Seq[String], t: String) =
    CatTest("LOV_Match", c, ">", t, _ =>
      sumIf(s"NULLIF($c, '') NOT IN ${inList(allowed)}"),
      lookup = Some(groupLk(_ => s"NULLIF($c, '') NOT IN ${inList(allowed)}")(c)),
      // the quoted comma-joined list form the reference stores — values
      // containing commas are what the Observability parameter parser's
      // words[:-1] reassembly path exists for
      baselineParams = Seq("baseline_value" -> allowed.map(sq).mkString(",")))

  def minDate(c: String, baseline: String, t: String) =
    CatTest("Min_Date", c, ">", t, _ => sumIf(s"$c < TIMESTAMP '$baseline'"),
      lookup = Some(groupLk(_ => s"$c < TIMESTAMP '$baseline'",
        (d, col) => d.fmtTs(col))(c)),
      baselineParams = Seq("baseline_value" -> baseline))

  def minVal(c: String, baseline: Double, t: String) =
    CatTest("Min_Val", c, ">", t, _ => sumIf(s"$c < $baseline - 1e-6"),
      lookup = Some(groupLk(_ => s"$c < $baseline - 1e-6",
        (d, col) => decStr(d, col))(c)),
      baselineParams = Seq("baseline_value" -> baseline.toString))

  def missingPct(c: String, bvc: Long, bct: Long, t: String) =
    CatTest("Missing_Pct", c, ">=", t, _ =>
      s"ABS(2.0 * ASIN(SQRT(${dbl(bvc.toString)} / $bct)) - 2 * ASIN(SQRT(${dbl(s"COUNT($c)")} / ${dbl(s"NULLIF(COUNT(*), 0)")})))",
      lookup = Some((d, tbl) =>
        s"""SELECT CAST($c AS ${d.textType}) AS v, CAST(COUNT(*) AS BIGINT) AS ct
           |  FROM $tbl
           | WHERE $c IS NULL OR CAST($c AS ${d.textType}) = ''
           | GROUP BY 1 ORDER BY ct DESC, v LIMIT $LookupLimit""".stripMargin),
      baselineParams = Seq("baseline_value_ct" -> bvc.toString,
        "baseline_ct" -> bct.toString))

  def monthlyRecCt(c: String, t: String) = {
    def m(d: Dialect) = {
      val dm = d.dateDiffMonth(c, runDateLit)
      s"(MAX($dm) - MIN($dm) + 1) - COUNT(DISTINCT $dm)"
    }
    CatTest("Monthly_Rec_Ct", c, ">", t, m(_), lookup = Some(scalarLk(m(_))))
  }

  def outlierPctAbove(c: String, bavg: Double, bsd: Double, t: String) =
    CatTest("Outlier_Pct_Above", c, ">", t, _ =>
      s"${dbl(sumIf(s"${dbl(c)} > $bavg + (2.0 * $bsd)"))} / ${dbl(s"NULLIF(COUNT($c), 0)")}",
      lookup = Some(groupLk(_ => s"${dbl(c)} > $bavg + (2.0 * $bsd)",
        (d, col) => decStr(d, col))(c)),
      baselineParams = Seq("baseline_avg" -> bavg.toString,
        "baseline_sd" -> bsd.toString))

  def outlierPctBelow(c: String, bavg: Double, bsd: Double, t: String) =
    CatTest("Outlier_Pct_Below", c, ">", t, _ =>
      s"${dbl(sumIf(s"${dbl(c)} < $bavg - (2.0 * $bsd)"))} / ${dbl(s"NULLIF(COUNT($c), 0)")}",
      lookup = Some(groupLk(_ => s"${dbl(c)} < $bavg - (2.0 * $bsd)",
        (d, col) => decStr(d, col))(c)),
      baselineParams = Seq("baseline_avg" -> bavg.toString,
        "baseline_sd" -> bsd.toString))

  def patternMatch(c: String, re: String, t: String) =
    CatTest("Pattern_Match", c, ">", t, d =>
      s"COUNT(NULLIF($c, '')) - ${sumIf(d.rlike(s"NULLIF($c, '')", re))}",
      lookup = Some(groupLk(d =>
        s"NULLIF($c, '') IS NOT NULL AND ${d.notRlike(s"NULLIF($c, '')", re)}")(c)),
      baselineParams = Seq("baseline_value" -> re))

  def recency(c: String, t: String) =
    CatTest("Recency", c, ">", t, d => d.dateDiffDay(s"MAX($c)", runDateLit),
      lookup = Some(scalarLk(d => d.fmtTs(s"MAX($c)"))))

  def required(c: String, t: String) =
    CatTest("Required", c, ">", t, _ => s"COUNT(*) - COUNT($c)",
      lookup = Some(scalarLk(_ => s"COUNT(*) - COUNT($c)")))

  def rowCt(anyCol: String, t: String) =
    CatTest("Row_Ct", anyCol, "<", t, _ => "COUNT(*)",
      lookup = Some(scalarLk(_ => "COUNT(*)")))

  def rowCtPct(anyCol: String, bct: Long, t: String) =
    CatTest("Row_Ct_Pct", anyCol, ">", t, _ =>
      s"ABS(ROUND(100.0 * (COUNT(*) - $bct) / ${dbl(bct.toString)}, 2))",
      lookup = Some(scalarLk(d =>
        decStr(d, s"ABS(ROUND(100.0 * (COUNT(*) - $bct) / ${dbl(bct.toString)}, 2))"))),
      baselineParams = Seq("baseline_ct" -> bct.toString))

  def streetAddrPattern(c: String, t: String) =
    CatTest("Street_Addr_Pattern", c, "<", t, d =>
      s"100.0 * ${dbl(sumIf(d.rlike(c, graft.functions.Patterns.streetAddr)))} / ${dbl(s"NULLIF(COUNT($c), 0)")}",
      lookup = Some(groupLk(d =>
        s"$c IS NOT NULL AND ${d.notRlike(c, graft.functions.Patterns.streetAddr)}")(c)))

  def usState(c: String, t: String) =
    CatTest("US_State", c, ">", t, _ =>
      sumIf(s"NULLIF($c, '') NOT IN ${inList(graft.functions.Patterns.usStates)}"),
      lookup = Some(groupLk(_ =>
        s"NULLIF($c, '') NOT IN ${inList(graft.functions.Patterns.usStates)}")(c)))

  def unique(c: String, t: String) =
    CatTest("Unique", c, ">", t, _ => s"COUNT(*) - COUNT(DISTINCT $c)",
      lookup = Some((d, tbl) =>
        s"""SELECT CAST($c AS ${d.textType}) AS v, CAST(COUNT(*) AS BIGINT) AS ct
           |  FROM $tbl
           | GROUP BY 1 HAVING COUNT(*) > 1
           | ORDER BY ct DESC, v LIMIT $LookupLimit""".stripMargin))

  def uniquePct(c: String, buc: Long, bvc: Long, t: String) =
    CatTest("Unique_Pct", c, ">=", t, _ =>
      s"ABS(2.0 * ASIN(SQRT(${dbl(buc.toString)} / $bvc)) - 2 * ASIN(SQRT(${dbl(s"COUNT(DISTINCT $c)")} / ${dbl(s"NULLIF(COUNT($c), 0)")})))",
      lookup = Some((d, tbl) =>
        s"""SELECT CAST($c AS ${d.textType}) AS v, CAST(COUNT(*) AS BIGINT) AS ct
           |  FROM $tbl
           | GROUP BY 1 HAVING COUNT(*) > 1
           | ORDER BY ct DESC, v LIMIT $LookupLimit""".stripMargin),
      baselineParams = Seq("baseline_unique_ct" -> buc.toString,
        "baseline_value_ct" -> bvc.toString))

  /** 7 invisible chars + leading space/quote checks
    * (test_types_Valid_Characters.yaml pg measure). */
  def validCharacters(c: String, t: String) = {
    val invis = "\u00a0\u200b\ufeff\u202f\u2009\u3000\u200c"
    val cond = s"TRANSLATE($c, ${sq(invis)}, 'XXXXXXX') <> $c OR $c LIKE ' %' OR $c LIKE '''%''' OR $c LIKE '\"%\"'"
    CatTest("Valid_Characters", c, ">", t, _ => sumIf(cond),
      lookup = Some(groupLk(_ => cond)(c)))
  }

  def validMonth(c: String, allowed: Seq[String], t: String) =
    CatTest("Valid_Month", c, ">", t, _ =>
      sumIf(s"NULLIF($c, '') NOT IN ${inList(allowed)}"),
      lookup = Some(groupLk(_ => s"NULLIF($c, '') NOT IN ${inList(allowed)}")(c)),
      baselineParams = Seq("baseline_value" -> allowed.map(sq).mkString(",")))

  def validUsZip(c: String, t: String) =
    CatTest("Valid_US_Zip", c, ">", t, _ =>
      sumIf(s"TRANSLATE($c, '012345678', '999999999') NOT IN ('99999', '999999999', '99999-9999')"),
      lookup = Some(groupLk(_ =>
        s"TRANSLATE($c, '012345678', '999999999') NOT IN ('99999', '999999999', '99999-9999')")(c)))

  def validUsZip3(c: String, t: String) =
    CatTest("Valid_US_Zip3", c, ">", t, _ =>
      sumIf(s"TRANSLATE($c, '012345678', '999999999') <> '999'"),
      lookup = Some(groupLk(_ =>
        s"TRANSLATE($c, '012345678', '999999999') <> '999'")(c)))

  def variabilityIncrease(c: String, bsd: Double, t: String) =
    CatTest("Variability_Increase", c, ">", t, _ =>
      s"100.0 * STDDEV(${dbl(c)}) / $bsd",
      lookup = Some(scalarLk(d => decStr(d, s"STDDEV(${dbl(c)})"))),
      baselineParams = Seq("baseline_sd" -> bsd.toString))

  def variabilityDecrease(c: String, bsd: Double, t: String) =
    CatTest("Variability_Decrease", c, "<", t, _ =>
      s"100.0 * STDDEV(${dbl(c)}) / $bsd",
      lookup = Some(scalarLk(d => decStr(d, s"STDDEV(${dbl(c)})"))),
      baselineParams = Seq("baseline_sd" -> bsd.toString))

  def weeklyRecCt(c: String, t: String) = {
    def m(d: Dialect) = {
      val dw = d.dateDiffWeek("DATE '1800-01-01'", c)
      s"MAX($dw) - MIN($dw) + 1 - COUNT(DISTINCT $dw)"
    }
    CatTest("Weekly_Rec_Ct", c, ">", t, m(_), lookup = Some(scalarLk(m(_))))
  }
}

object CatRunner {

  /** Test types whose reference default_severity is Warning (the
    * dbsetup_test_types YAMLs; all others default to Fail). */
  private val warningTypes = Set(
    "Avg_Shift", "Daily_Record_Ct", "Distribution_Shift", "Incr_Avg_Shift",
    "Missing_Pct", "Outlier_Pct_Above", "Outlier_Pct_Below", "Recency",
    "Unique_Pct", "Valid_Characters", "Valid_US_Zip", "Valid_US_Zip3",
    "Variability_Decrease", "Variability_Increase")

  private def severityOf(t: CatTest): String =
    if (warningTypes(t.testType)) "Warning" else "Fail"

  /** result_status per the reference's update_test_results.sql: pass ⇒
    * Passed; otherwise the definition's severity picks Warning/Failed. */
  private val statusCase =
    """CASE WHEN result_code = 1 THEN 'Passed'
      |     WHEN severity = 'Warning' THEN 'Warning'
      |     ELSE 'Failed' END AS result_status""".stripMargin

  /** The per-test output 5-tuple, rendered for one dialect. */
  private def testOutputs(t: CatTest, d: Dialect, i: Int): (String, String, String) = {
    val m = t.measure(d)
    val num = if (t.stringMeasure) d.nullOf("double") else s"CAST(ROUND($m, 4) AS DOUBLE)"
    val str = if (t.stringMeasure) m else d.nullOf("text")
    val code = s"CAST(CASE WHEN ${t.condition(d)} THEN 0 ELSE 1 END AS INT)"
    (s"$num AS n_$i", s"$str AS s_$i", s"$code AS c_$i")
  }

  /** Fused Spark SQL: ONE aggregate scan computing every test's measure +
    * result code, unpivoted to a row per test. */
  def sparkSql(table: String, tests: Seq[CatTest]): String = {
    val d: Dialect = SparkDialect
    val inner = tests.zipWithIndex.flatMap { case (t, i) =>
      val (n, s, c) = testOutputs(t, d, i)
      Seq(n, s, c)
    }
    val stackArgs = tests.zipWithIndex.map { case (t, i) =>
      s"${sq(t.testType)}, ${sq(t.column)}, ${sq(severityOf(t))}, n_$i, s_$i, c_$i"
    }
    s"""SELECT test_type, column_name, severity, measure_num, measure_str,
       |       result_code, $statusCase,
       |       CAST(NULL AS STRING) AS query_error
       |FROM (
       |  SELECT stack(${tests.length},
       |    ${stackArgs.mkString(",\n    ")}
       |  ) AS (test_type, column_name, severity, measure_num, measure_str, result_code)
       |  FROM (
       |    SELECT ${inner.mkString(",\n      ")}
       |    FROM $table
       |  )
       |)
       |ORDER BY test_type, column_name""".stripMargin
  }

  /** DuckDB oracle: one aggregate per test, UNION ALL'd (the oracle may
    * scan repeatedly; only the engine needs the fusion). */
  def duckSql(table: String, tests: Seq[CatTest]): String = {
    val d: Dialect = DuckDialect
    val selects = tests.map { t =>
      val m = t.measure(d)
      val num = if (t.stringMeasure) "CAST(NULL AS DOUBLE)" else s"CAST(ROUND($m, 4) AS DOUBLE)"
      val str = if (t.stringMeasure) m else "CAST(NULL AS VARCHAR)"
      s"""SELECT ${sq(t.testType)} AS test_type, ${sq(t.column)} AS column_name,
         |  ${sq(severityOf(t))} AS severity,
         |  $num AS measure_num, $str AS measure_str,
         |  CAST(CASE WHEN ${t.condition(d)} THEN 0 ELSE 1 END AS INT) AS result_code
         |FROM $table""".stripMargin
    }
    s"""SELECT test_type, column_name, severity, measure_num, measure_str,
       |       result_code, $statusCase,
       |       CAST(NULL AS VARCHAR) AS query_error
       |FROM (
       |${selects.mkString("\nUNION ALL\n")}
       |)
       |ORDER BY test_type, column_name""".stripMargin
  }
}
