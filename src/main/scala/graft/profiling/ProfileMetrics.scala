package graft.profiling

import org.apache.spark.sql.types._

import graft.functions.Patterns
import graft.functions.Patterns.{inList, sq}
import graft.oracle.Dialect

/** General type classification of a column (reference:
  * testgen/template/flavors/postgresql/data_chars/get_schema_ddf.sql:28-46):
  * A alpha, B boolean, D date/timestamp, N numeric, X other. On Spark this
  * derives from the parquet schema — no introspection query exists.
  */
object GeneralType {
  def of(dt: DataType): String = dt match {
    case _: StringType | _: CharType | _: VarcharType => "A"
    case _: BooleanType => "B"
    case _: DateType | _: TimestampType | _: TimestampNTZType => "D"
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
        _: FloatType | _: DoubleType | _: DecimalType => "N"
    case _ => "X"
  }
  /** is_decimal gates fractional_sum (ddf :43-46: scale > 0). Floating
    * types are fraction-capable, so they count as decimal here. */
  def isDecimal(dt: DataType): Boolean = dt match {
    case _: FloatType | _: DoubleType => true
    case d: DecimalType => d.scale > 0
    case _ => false
  }
}

/** One profiling metric, carried in one of four execution classes so the
  * engine can route it to the right physical job (see Profiler) while the
  * DuckDB oracle renders the whole set as one flat aggregate list:
  *
  *  - [[ConstM]]: per-column literals (position, types) — no data touched;
  *  - [[ScalarM]]: ordinary aggregate expressions (SUM/MIN/MAX/AVG/CASE
  *    votes) — all fuse into ONE full-codegen scan with no Expand;
  *  - [[DistinctM]]: COUNT(DISTINCT expr) — executed via the unpivoted
  *    two-phase group-by job (never the Expand-based multi-distinct plan);
  *  - [[PctM]]: exact interpolated percentiles — one ObjectHashAggregate
  *    pass over the numeric columns only.
  *
  * `render(dialect)` always produces the flat single-expression form used
  * by the oracle (and by tests); metrics that don't apply to the column's
  * general type render as typed NULLs, mirroring the reference template's
  * TG-IF/TG-ELSE NULL branches.
  */
sealed trait MetricEntry {
  def name: String
  def tpe: String // "bigint" | "int" | "double" | "text"
  def applies: Boolean
  def render(d: Dialect): String
}
final case class ConstM(name: String, tpe: String, sql: String, value: Any)
    extends MetricEntry {
  val applies = true
  def render(d: Dialect): String = sql
}
final case class ScalarM(name: String, tpe: String, applies: Boolean,
                         expr: Dialect => String) extends MetricEntry {
  def render(d: Dialect): String = if (applies) expr(d) else d.nullOf(tpe)
}
/** `cls` routes the inner value through the unpivot job's typed slots:
  * "S" string as-is, "T" cast-to-string (timestamps/booleans — the cast is
  * injective), "N" cast-to-double (exact for the int/date-diff inputs). */
final case class DistinctM(name: String, applies: Boolean,
                           inner: Dialect => String, cls: String) extends MetricEntry {
  val tpe = "bigint"
  def render(d: Dialect): String =
    if (applies) s"COUNT(DISTINCT ${inner(d)})" else d.nullOf(tpe)
}
final case class PctM(name: String, applies: Boolean, q: Double,
                      input: Dialect => String) extends MetricEntry {
  val tpe = "double"
  def render(d: Dialect): String =
    if (applies) s"CAST(ROUND(${d.quantileCont(input(d), q)}, 4) AS DOUBLE)"
    else d.nullOf(tpe)
}

/** Backwards-compatible flat view of a metric (name + dialect rendering). */
final case class Metric(name: String, render: Dialect => String)

/** The per-column wide-aggregate metric set — the Spark re-expression of
  * the reference's one-query-per-column profiling template (reference:
  * testgen/template/flavors/postgresql/profiling/project_profiling_query.sql:1-258).
  * Unlike the reference (one scan per column), all columns' metrics fuse
  * into a handful of whole-table jobs (see Profiler).
  *
  * Output-type discipline: every count is CAST to BIGINT (DuckDB SUM(int)
  * returns HUGEINT otherwise), every statistic is ROUND(...,4)::DOUBLE
  * computed from exact/deterministic inputs, dates are rendered as
  * strings — so both engines hash identically.
  */
object ProfileMetrics {
  val RunDate = "2026-08-01" // fixed profiling run date (parity constant)

  private def ts(lit: String) = s"CAST('$lit' AS TIMESTAMP)"

  /** SUM(CASE WHEN cond THEN 1 ELSE 0 END) as BIGINT. */
  private def sumIf(cond: String) =
    s"CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT)"

  private def round4(x: String) = s"CAST(ROUND($x, 4) AS DOUBLE)"

  /** IS_NUM validator (reference templated_functions.yaml IS_NUM). */
  def isNumCase(c: String)(d: Dialect): String =
    s"CASE WHEN ${d.rlike(c, Patterns.isNum)} THEN 1 ELSE 0 END"

  /** IS_DATE validator — full port of the multi-format date recognizer
    * (reference templated_functions.yaml IS_DATE): ISO datetime,
    * compact YYYYMMDD…, YYYY-MM(-or-MMM)-DD, MM/DD/YY(YY), DD-MMM-YYYY,
    * with year-range 1800-2200 and month-length/leap-day checks.
    */
  def isDateCase(c: String)(d: Dialect): String = {
    import Patterns._
    val yr4 = s"TRY_CAST(LEFT($c, 4) AS INT) BETWEEN 1800 AND 2200"
    // branch 1: ISO datetime — month at pos 6-7, day at pos 9-10
    val isoOk =
      s"""CASE WHEN $yr4 AND (
         |  (SUBSTRING($c, 6, 2) IN ${inList(months31)} AND TRY_CAST(SUBSTRING($c, 9, 2) AS INT) BETWEEN 1 AND 31)
         |  OR (SUBSTRING($c, 6, 2) IN ${inList(months30)} AND TRY_CAST(SUBSTRING($c, 9, 2) AS INT) BETWEEN 1 AND 30)
         |  OR (SUBSTRING($c, 6, 2) = '02' AND TRY_CAST(SUBSTRING($c, 9, 2) AS INT) BETWEEN 1 AND 29)
         |) THEN 1 ELSE 0 END""".stripMargin
    // branch 2: compact — month at pos 5-6, day at pos 7-8
    val compactOk =
      s"""CASE WHEN $yr4 AND (
         |  (SUBSTRING($c, 5, 2) IN ${inList(months31)} AND TRY_CAST(SUBSTRING($c, 7, 2) AS INT) BETWEEN 1 AND 31)
         |  OR (SUBSTRING($c, 5, 2) IN ${inList(months30)} AND TRY_CAST(SUBSTRING($c, 7, 2) AS INT) BETWEEN 1 AND 30)
         |  OR (SUBSTRING($c, 5, 2) = '02' AND TRY_CAST(SUBSTRING($c, 7, 2) AS INT) BETWEEN 1 AND 29)
         |) THEN 1 ELSE 0 END""".stripMargin
    // branch 3: YYYY-MM(-or-MMM)-DD via '-' split parts
    val p1 = s"SPLIT_PART($c, '-', 1)"
    val p2 = s"UPPER(SPLIT_PART($c, '-', 2))"
    val p3 = s"SPLIT_PART($c, '-', 3)"
    val ymdOk =
      s"""CASE WHEN TRY_CAST($p1 AS INT) BETWEEN 1800 AND 2200 AND (
         |  ($p2 IN ${inList(months31Loose)} AND TRY_CAST($p3 AS INT) BETWEEN 1 AND 31)
         |  OR ($p2 IN ${inList(months30Loose)} AND TRY_CAST($p3 AS INT) BETWEEN 1 AND 30)
         |  OR ($p2 IN ${inList(monthsFebLoose)} AND TRY_CAST($p3 AS INT) BETWEEN 1 AND 29)
         |) THEN 1 ELSE 0 END""".stripMargin
    // branch 4: MM/DD/YY(YY) after '-'→'/' normalization
    val sl = s"REPLACE($c, '-', '/')"
    val s1 = s"TRY_CAST(SPLIT_PART($sl, '/', 1) AS INT)"
    val s2 = s"TRY_CAST(SPLIT_PART($sl, '/', 2) AS INT)"
    val s3 = s"TRY_CAST('20' || RIGHT(SPLIT_PART($sl, '/', 3), 2) AS INT)"
    val mdyOk =
      s"""CASE WHEN $s1 BETWEEN 1 AND 12 AND (
         |  ($s1 IN (1, 3, 5, 7, 8, 10, 12) AND $s2 BETWEEN 1 AND 31)
         |  OR ($s1 IN (4, 6, 9, 11) AND $s2 BETWEEN 1 AND 30)
         |  OR ($s1 = 2 AND $s2 BETWEEN 1 AND 29)
         |) AND $s3 BETWEEN 1800 AND 2200 THEN 1 ELSE 0 END""".stripMargin
    // branch 5: DD-MMM-YYYY
    val d1 = s"TRY_CAST(SPLIT_PART($c, '-', 1) AS INT)"
    val dmyOk =
      s"""CASE WHEN TRY_CAST($p3 AS INT) BETWEEN 1800 AND 2200 AND (
         |  ($p2 IN ${inList(mon31)} AND $d1 BETWEEN 1 AND 31)
         |  OR ($p2 IN ${inList(mon30)} AND $d1 BETWEEN 1 AND 30)
         |  OR ($p2 = 'FEB' AND $d1 BETWEEN 1 AND 29)
         |) THEN 1 ELSE 0 END""".stripMargin
    val monRepl = d.regexpReplace(s"UPPER($c)", monthNames, "12")
    s"""CASE
       | WHEN ${d.rlike(c, isoDateTime)} THEN $isoOk
       | WHEN ${d.rlike(c, compactDateTime)} OR ${d.rlike(c, compactDateHour)} THEN $compactOk
       | WHEN LENGTH($c) > 11 THEN 0
       | WHEN ${d.rlike(monRepl, ymdLoose)} THEN $ymdOk
       | WHEN ${d.rlike(sl, mdySlash4)} OR ${d.rlike(sl, mdySlash2)} THEN $mdyOk
       | WHEN ${d.rlike(s"UPPER($c)", dmyMon)} THEN $dmyOk
       | ELSE 0
       |END""".stripMargin
  }

  /** a/A/N pattern generalization (project_profiling_query.sql:128-131). */
  def patternOf(c: String)(d: Dialect): String =
    d.regexpReplace(d.regexpReplace(d.regexpReplace(c, "[a-z]", "a"), "[A-Z]", "A"), "[0-9]", "N")

  /** 9-class std_pattern_match vote classifier, priority-ordered.
    * Ratios are expressed as SUM(match) > threshold * COUNT(col) to avoid
    * divide-by-zero drift between engines (project_profiling_query.sql:85-106). */
  def stdPatternMatch(c: String)(d: Dialect): String = {
    import Patterns._
    def votes(cond: String) = s"SUM(CASE WHEN $cond THEN 1 ELSE 0 END)"
    def cls(cond: String, threshold: Double, label: String) =
      s"WHEN ${votes(cond)} > $threshold * COUNT($c) THEN '$label'"
    val zipNorm = s"TRANSLATE($c, '012345678', '999999999')"
    s"""CASE
       | ${cls(d.rlike(c, streetAddr), 0.8, "STREET_ADDR")}
       | ${cls(s"$c IN ${inList(usStates)}", 0.9, "STATE_USA")}
       | ${cls(d.rlike(c, phoneUsa), 0.8, "PHONE_USA")}
       | ${cls(d.rlike(c, email), 0.9, "EMAIL")}
       | ${cls(s"$zipNorm IN ('99999', '999999999', '99999-9999')", 0.9, "ZIP_USA")}
       | ${cls(d.rlike(c, fileName), 0.9, "FILE_NAME")}
       | ${cls(d.rlike(c, creditCard), 0.8, "CREDIT_CARD")}
       | ${cls(s"${d.rlike(c, delimitedData)} AND ${d.notRlike(c, delimitedExcl)}", 0.8, "DELIMITED_DATA")}
       | ${cls(s"${d.rlike(c, ssn)} AND LEFT($c, 3) NOT BETWEEN '734' AND '749' AND LEFT($c, 3) <> '666'", 0.9, "SSN")}
       | ELSE ${d.nullOf("text")}
       |END""".stripMargin
  }

  /** The full metric entry list for one column, in canonical output order.
    * Metrics that don't apply to the column's general type render as typed
    * NULLs so every column's row has an identical schema. */
  def entries(col: String, position: Int, dt: DataType): Seq[MetricEntry] = {
    val g = GeneralType.of(dt)
    val dec = GeneralType.isDecimal(dt)
    val c = col
    val isA = g == "A"
    val isN = g == "N"
    val isD = g == "D"
    val isB = g == "B"
    val isADN = isA || isN || isD
    val runTs = ts(s"$RunDate 00:00:00")

    def m(name: String, applies: Boolean, tpe: String)(f: Dialect => String): ScalarM =
      ScalarM(name, tpe, applies, f)

    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    val upperAlpha = alpha.take(26)
    val lowerAlpha = alpha.drop(26)
    val np = Patterns.nonPrintingChars
    // distinct_value_ct value routing: strings as-is; INTEGRAL numerics
    // through the exact BIGINT slot (a DOUBLE cast collapses values above
    // 2^53 — snowflake-style surrogate ids at scale would silently
    // undercount); decimals through the injective string cast (fixed
    // scale ⇒ canonical text; > 18 digits overflows BIGINT); floating
    // numerics via DOUBLE (their native value, exact); dates/timestamps
    // via epoch micros (injective, exact in a double mantissa until
    // ~2112 — and far cheaper per row than the ISO timestamp formatter a
    // string cast invokes); everything else via an injective string cast.
    val isIntegral = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    val rawCls =
      if (isA) "S"
      else if (isIntegral) "I"
      else if (dt.isInstanceOf[DecimalType]) "T"
      else if (isN) "N"
      else if (isD) "D"
      else "T"
    // Parquet timestamps without tz info infer as timestamp_ntz on Spark;
    // report both variants as plain "timestamp" (one logical D type here).
    val colType = dt match {
      case _: TimestampNTZType => "timestamp"
      case other               => other.simpleString
    }

    Seq(
      ConstM("position", "int", s"CAST($position AS INT)", position),
      ConstM("column_type", "text", sq(colType), colType),
      ConstM("general_type", "text", sq(g), g),
      ScalarM("record_ct", "bigint", true, _ => "COUNT(*)"),
      ScalarM("value_ct", "bigint", true, _ => s"COUNT($c)"),
      DistinctM("distinct_value_ct", true, _ => c, rawCls),
      ScalarM("null_value_ct", "bigint", true, _ => sumIf(s"$c IS NULL")),
      m("min_length", isADN, "bigint")(d => s"CAST(MIN(LENGTH(${d.castText(c)})) AS BIGINT)"),
      m("max_length", isADN, "bigint")(d => s"CAST(MAX(LENGTH(${d.castText(c)})) AS BIGINT)"),
      m("avg_length", isADN, "double")(d =>
        round4(s"AVG(CAST(NULLIF(LENGTH(${d.castText(c)}), 0) AS DOUBLE))")),
      m("zero_value_ct", isA || isN, "bigint") { d =>
        if (isA) sumIf(d.rlike(s"TRIM($c)", Patterns.zeroString))
        else s"CAST(SUM(1 - ABS(SIGN($c))) AS BIGINT)"
      },
      DistinctM("distinct_std_value_ct", isA,
        _ => s"UPPER(TRANSLATE($c, ' '',.-', ''))", "S"),
      m("zero_length_ct", isA, "bigint")(_ => sumIf(s"$c = ''")),
      m("lead_space_ct", isA, "bigint")(_ => sumIf(s"$c BETWEEN ' !' AND '!'")),
      m("quoted_value_ct", isA, "bigint")(_ =>
        sumIf(s"""$c LIKE '"%"' OR $c LIKE '''%'''""")),
      m("includes_digit_ct", isA, "bigint")(d => sumIf(d.rlike(c, "[0-9]"))),
      m("filled_value_ct", isA, "bigint")(d => sumIf(
        s"${d.rlike(s"LOWER($c)", Patterns.filledPattern)} OR LOWER($c) IN ${inList(Patterns.filledWordsAll)}")),
      m("min_text", isA, "text")(_ => s"LEFT(MIN(NULLIF($c, '')), 100)"),
      m("max_text", isA, "text")(_ => s"LEFT(MAX(NULLIF($c, '')), 100)"),
      m("upper_case_ct", isA, "bigint")(_ => s"CAST(SUM(CASE WHEN TRANSLATE($c, '$alpha', '') = $c THEN 0 WHEN TRANSLATE($c, '$lowerAlpha', '') = $c THEN 1 ELSE 0 END) AS BIGINT)"),
      m("lower_case_ct", isA, "bigint")(_ => s"CAST(SUM(CASE WHEN TRANSLATE($c, '$alpha', '') = $c THEN 0 WHEN TRANSLATE($c, '$upperAlpha', '') = $c THEN 1 ELSE 0 END) AS BIGINT)"),
      m("non_alpha_ct", isA, "bigint")(_ => sumIf(s"TRANSLATE($c, '$alpha', '') = $c")),
      m("non_printing_ct", isA, "bigint")(_ =>
        sumIf(s"TRANSLATE($c, ${sq(np)}, 'XXXXXXXXXX') <> $c")),
      m("numeric_ct", isA, "bigint")(d => s"CAST(SUM(${isNumCase(s"LEFT($c, 31)")(d)}) AS BIGINT)"),
      m("date_ct", isA, "bigint")(d => s"CAST(SUM(${isDateCase(s"LEFT($c, 26)")(d)}) AS BIGINT)"),
      m("std_pattern_match", isA, "text")(d => stdPatternMatch(c)(d)),
      DistinctM("distinct_pattern_ct", isA,
        d => s"CASE WHEN $c > ' ' THEN ${patternOf(c)(d)} END", "S"),
      m("embedded_space_ct", isA, "bigint")(_ =>
        s"CAST(SUM(CAST(SIGN(LENGTH(TRIM($c)) - LENGTH(REPLACE(TRIM($c), ' ', ''))) AS BIGINT)) AS BIGINT)"),
      m("avg_embedded_spaces", isA, "double")(_ =>
        round4(s"AVG(CAST(LENGTH(TRIM($c)) - LENGTH(REPLACE(TRIM($c), ' ', '')) AS DOUBLE))")),
      m("min_value", isN, "double")(_ => s"CAST(MIN($c) AS DOUBLE)"),
      m("min_value_over_0", isN, "double")(_ => s"CAST(MIN(CASE WHEN $c > 0 THEN $c END) AS DOUBLE)"),
      m("max_value", isN, "double")(_ => s"CAST(MAX($c) AS DOUBLE)"),
      m("avg_value", isN, "double")(_ => round4(s"AVG(CAST($c AS DOUBLE))")),
      m("stdev_value", isN, "double")(_ => round4(s"STDDEV_SAMP(CAST($c AS DOUBLE))")),
      PctM("percentile_25", isN, 0.25, _ => s"CAST($c AS DOUBLE)"),
      PctM("percentile_50", isN, 0.50, _ => s"CAST($c AS DOUBLE)"),
      PctM("percentile_75", isN, 0.75, _ => s"CAST($c AS DOUBLE)"),
      m("fractional_sum", isN && dec, "double")(_ =>
        round4(s"SUM(ROUND(ABS(CAST($c AS DOUBLE) % 1), 5))")),
      m("min_date", isD, "text")(d =>
        s"CASE WHEN MIN($c) IS NULL THEN ${d.nullOf("text")} ELSE ${d.fmtTs(s"GREATEST(MIN($c), ${ts("0001-01-01 00:00:00")})")} END"),
      m("max_date", isD, "text")(d => d.fmtTs(s"MAX($c)")),
      m("before_1yr_date_ct", isD, "bigint")(d => sumIf(s"${d.dateDiffMonth(c, runTs)} > 12")),
      m("before_5yr_date_ct", isD, "bigint")(d => sumIf(s"${d.dateDiffMonth(c, runTs)} > 60")),
      m("before_20yr_date_ct", isD, "bigint")(d => sumIf(s"${d.dateDiffMonth(c, runTs)} > 240")),
      m("before_100yr_date_ct", isD, "bigint")(d => sumIf(s"${d.dateDiffMonth(c, runTs)} > 1200")),
      m("within_1yr_date_ct", isD, "bigint")(d => sumIf(s"${d.dateDiffDay(c, runTs)} BETWEEN 0 AND 365")),
      m("within_1mo_date_ct", isD, "bigint")(d => sumIf(s"${d.dateDiffDay(c, runTs)} BETWEEN 0 AND 30")),
      m("future_date_ct", isD, "bigint")(_ => sumIf(s"$c > $runTs")),
      m("distant_future_date_ct", isD, "bigint")(d => sumIf(s"${d.dateDiffMonth(runTs, c)} > 240")),
      DistinctM("date_days_present", isD, d => d.dateDiffDay(c, runTs), "N"),
      DistinctM("date_weeks_present", isD, d => d.dateDiffWeek(c, runTs), "N"),
      DistinctM("date_months_present", isD, d => d.dateDiffMonth(c, runTs), "N"),
      ScalarM("boolean_true_ct", "bigint", isB,
        _ => s"CAST(SUM(CAST($c AS INT)) AS BIGINT)")
    )
  }

  /** Flat (name, rendering) view — the oracle's and tests' interface. */
  def forColumn(col: String, position: Int, dt: DataType): Seq[Metric] =
    entries(col, position, dt).map(e => Metric(e.name, d => e.render(d)))

  /** Spark type of a metric's abstract `tpe`. */
  def sparkType(tpe: String): DataType = tpe match {
    case "bigint" => LongType
    case "int"    => IntegerType
    case "double" => DoubleType
    case _        => StringType
  }
}
