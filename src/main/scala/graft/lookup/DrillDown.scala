package graft.lookup

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Drill-down lookups + PII masking — per-test offending-row queries
  * with limits and redaction (reference: per-type `lookup_query` in
  * testgen/template/dbsetup_test_types YAMLs;
  * testgen/common/source_data_service.py:26,49-105 for the 500-row
  * limit; testgen/common/pii_masking.py for redaction).
  *
  * The reference samples randomly when over the limit; for determinism
  * both engines order by (count DESC, value) before limiting — the
  * documented deviation.
  */
object DrillDown {
  val Limit = 500
  val Redacted = "<PII_REDACTED>"

  /** Unique-test drill-down: duplicated values with counts
    * (test_types_Unique.yaml lookup_query shape). */
  def duplicatesSql(table: String, col: String)(d: Dialect): String =
    s"""SELECT $col AS value, COUNT(*) AS occurrence_ct
       |  FROM $table
       | GROUP BY $col HAVING COUNT(*) > 1
       | ORDER BY COUNT(*) DESC, $col
       | LIMIT $Limit""".stripMargin

  /** Alpha_Trunc drill-down: rows at the current maximum length
    * (test_types_Alpha_Trunc.yaml lookup_query shape). */
  def maxLengthRowsSql(table: String, col: String)(d: Dialect): String =
    s"""SELECT DISTINCT $col AS value, LENGTH($col) AS current_max_length
       |  FROM $table,
       |       (SELECT MAX(LENGTH($col)) AS max_length FROM $table) a
       | WHERE LENGTH($col) = a.max_length
       | ORDER BY value
       | LIMIT $Limit""".stripMargin

  /** Land the COMPUTED PII flags for `dir` — the engine's
    * data_column_chars.pii_flag surface that the reference's
    * mask-on-render reads (source_data_service.py:49-105,
    * pii_masking.py get_pii_columns: mask any column of the table whose
    * pii_flag IS NOT NULL). The flags come from the memoized enriched
    * profile (the PiiFlag cascade); landing them as parquet lets BOTH
    * engines' drill-down SQL decide redaction from the same computed
    * relation — data-driven masking, not a column-name heuristic. */
  def landPiiFlags(spark: SparkSession, dir: String): String =
    graft.core.SessionCache.getOrElseUpdate(spark, "pii_flags", dir) {
      val enr = graft.inference.HygieneScreens.enrichedView(spark, dir)
      graft.core.RunStore.land(
        spark.sql(s"""SELECT table_name, column_name, pii_flag
                     |  FROM $enr WHERE pii_flag IS NOT NULL""".stripMargin),
        graft.core.RunStore.root, "run_000", "pii_flags")
    }

  /** The oracle-side path of the landed PII flags (same process). */
  def piiFlagsPath: String =
    graft.core.RunStore.runPath(graft.core.RunStore.root, "run_000", "pii_flags")

  /** Redact `valExpr` iff (table, column) carries a computed pii_flag in
    * the landed flag relation. The flag relation is metadata-sized (one
    * row per flagged column), so the probe is a scalar subquery over a
    * tiny parquet footprint in both engines; a production run would
    * broadcast-join it once per lookup instead. */
  def piiRedactExpr(valExpr: String, table: String, column: String,
                    piiPath: String)(d: Dialect): String =
    s"""CASE WHEN (SELECT COUNT(*) FROM ${d.readParquet(piiPath)} pf
       |            WHERE pf.table_name = '$table'
       |              AND pf.column_name = '$column') > 0
       |     THEN '$Redacted' ELSE $valExpr END""".stripMargin

  /** Pattern-mismatch drill-down with PII masking applied to flagged
    * columns: offending rows, masked. Every projected column is eligible
    * for masking, so all are rendered as text (the reference's masked
    * frame is stringly-typed the same way — pii_masking.py
    * mask_source_data_pii assigns the token into the column). */
  def maskedMismatchSql(table: String, logicalTable: String, col: String,
                        re: String, piiPath: String,
                        otherCols: Seq[String])(d: Dialect): String = {
    val projected = otherCols.map { c =>
      s"${piiRedactExpr(d.castText(c), logicalTable, c, piiPath)(d)} AS $c"
    }.mkString(", ")
    s"""SELECT $projected, $col AS offending_value
       |  FROM $table
       | WHERE NOT ${d.rlike(col, re)}
       | ORDER BY $col
       | LIMIT $Limit""".stripMargin
  }

  /** Recency drill-down: the most recent rows for a monitored date
    * column (test_types_Recency.yaml lookup_query shape). */
  def recencyRowsSql(table: String, idCol: String, tsCol: String)(d: Dialect): String =
    s"""SELECT $idCol AS id, ${d.fmtTs(tsCol)} AS latest_ts
       |  FROM $table,
       |       (SELECT MAX(CAST($tsCol AS DATE)) AS mx FROM $table) m
       | WHERE CAST($tsCol AS DATE) = m.mx
       | ORDER BY id
       | LIMIT $Limit""".stripMargin

  /** Outlier drill-down: rows beyond mean ± 2σ
    * (test_types_Outlier_Pct_Above.yaml lookup_query shape). */
  def outlierRowsSql(table: String, idCol: String, col: String)(d: Dialect): String =
    s"""SELECT $idCol AS id, CAST($col AS DOUBLE) AS value,
       |       CAST(ROUND(s.avg_v, 4) AS DOUBLE) AS mean_value,
       |       CAST(ROUND(s.sd_v, 4) AS DOUBLE) AS sd_value
       |  FROM $table,
       |       (SELECT AVG(CAST($col AS DOUBLE)) AS avg_v,
       |               STDDEV(CAST($col AS DOUBLE)) AS sd_v FROM $table) s
       | WHERE CAST($col AS DOUBLE) > s.avg_v + 2 * s.sd_v
       |    OR CAST($col AS DOUBLE) < s.avg_v - 2 * s.sd_v
       | ORDER BY value DESC, id
       | LIMIT $Limit""".stripMargin

  def runRecency(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "events", parallelize = false).createOrReplaceTempView("__dd_events")
    spark.sql(recencyRowsSql("__dd_events", "event_id", "ts")(SparkDialect))
  }

  def runOutliers(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "events", parallelize = false).createOrReplaceTempView("__dd_events2")
    spark.sql(outlierRowsSql("__dd_events2", "event_id", "value")(SparkDialect))
  }

  def duckRecencySql(): String = recencyRowsSql("events", "event_id", "ts")(DuckDialect)
  def duckOutliersSql(): String = outlierRowsSql("events", "event_id", "value")(DuckDialect)

  def runDuplicates(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "orders", parallelize = false).createOrReplaceTempView("__dd_orders")
    spark.sql(duplicatesSql("__dd_orders", "o_custkey")(SparkDialect))
  }

  def runMaxLength(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "customer", parallelize = false).createOrReplaceTempView("__dd_customer")
    spark.sql(maxLengthRowsSql("__dd_customer", "c_name")(SparkDialect))
  }

  def runMasked(spark: SparkSession, dir: String): DataFrame = {
    val piiPath = landPiiFlags(spark, dir)
    graft.core.Tables.load(spark, dir, "customer", parallelize = false).createOrReplaceTempView("__dd_customer")
    spark.sql(maskedMismatchSql("__dd_customer", "customer", "c_mktsegment",
      "^[A-Z]+$", piiPath,
      otherCols = Seq("c_custkey", "c_name", "c_mktsegment"))(SparkDialect))
  }

  def duckDuplicatesSql(): String = duplicatesSql("orders", "o_custkey")(DuckDialect)
  def duckMaxLengthSql(): String = maxLengthRowsSql("customer", "c_name")(DuckDialect)
  def duckMaskedSql(): String = maskedMismatchSql("customer", "customer",
    "c_mktsegment", "^[A-Z]+$", piiFlagsPath,
    otherCols = Seq("c_custkey", "c_name", "c_mktsegment"))(DuckDialect)

  /** Dupe_Rows drill-down: full key-combination groups occurring more
    * than once (test_types_Dupe_Rows.yaml lookup_query shape). */
  def dupeRowsSql(table: String, cols: Seq[String])(d: Dialect): String = {
    val keys = cols.mkString(", ")
    s"""SELECT $keys, COUNT(*) AS occurrence_ct
       |  FROM $table
       | GROUP BY $keys HAVING COUNT(*) > 1
       | ORDER BY COUNT(*) DESC, $keys
       | LIMIT $Limit""".stripMargin
  }

  /** Email_Format drill-down: non-conforming values with counts
    * (test_types_Email_Format.yaml lookup_query shape). */
  def emailFormatSql(table: String, col: String)(d: Dialect): String = {
    val emailRe = """^[A-Za-z0-9._'%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"""
    s"""SELECT $col AS value, COUNT(*) AS occurrence_ct
       |  FROM $table
       | WHERE $col IS NOT NULL AND NOT ${d.rlike(col, emailRe)}
       | GROUP BY $col
       | ORDER BY COUNT(*) DESC, $col
       | LIMIT $Limit""".stripMargin
  }

  /** Min_Date drill-down: rows dated before the baseline minimum
    * (test_types_Min_Date.yaml lookup_query shape; the same query with
    * the run date as baseline serves Future_Date). */
  def minDateSql(table: String, idCol: String, dateCol: String,
                 baseline: String)(d: Dialect): String =
    s"""SELECT $idCol AS id, ${d.fmtTs(dateCol)} AS offending_value
       |  FROM $table
       | WHERE CAST($dateCol AS DATE) < DATE '$baseline'
       | ORDER BY offending_value, id
       | LIMIT $Limit""".stripMargin

  def runDupeRows(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "orders", parallelize = false).createOrReplaceTempView("__dd_orders2")
    spark.sql(dupeRowsSql("__dd_orders2",
      Seq("o_custkey", "o_orderstatus", "o_orderpriority"))(SparkDialect))
  }

  def runEmailFormat(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "events", parallelize = false).createOrReplaceTempView("__dd_events3")
    spark.sql(emailFormatSql("__dd_events3", "event_type")(SparkDialect))
  }

  def runMinDate(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "orders", parallelize = false).createOrReplaceTempView("__dd_orders3")
    spark.sql(minDateSql("__dd_orders3", "o_orderkey", "o_orderdate",
      "1995-06-01")(SparkDialect))
  }

  def duckDupeRowsSql(): String = dupeRowsSql("orders",
    Seq("o_custkey", "o_orderstatus", "o_orderpriority"))(DuckDialect)
  def duckEmailFormatSql(): String = emailFormatSql("events", "event_type")(DuckDialect)
  def duckMinDateSql(): String = minDateSql("orders", "o_orderkey", "o_orderdate",
    "1995-06-01")(DuckDialect)

  /** Masked profile view — the reference's mask_profiling_pii
    * (pii_masking.py PROFILING_PII_FIELDS): for PII-flagged columns the
    * value-revealing profile fields (top freq, min/max text, numeric
    * bounds, date bounds) are replaced by the redaction token on render;
    * the numeric/date fields are text-rendered so the token slots in,
    * exactly as the reference's masked frame becomes stringly-typed. */
  def profileMaskedSql(enrRel: String)(d: Dialect): String = {
    def fmtNum(x: String) =
      s"CAST(CAST(ROUND($x, 4) AS DECIMAL(28,4)) AS ${d.textType})"
    val fields = Seq(
      "top_freq_values" -> "top_freq_values",
      "min_text" -> "min_text",
      "max_text" -> "max_text",
      "min_value" -> fmtNum("min_value"),
      "min_value_over_0" -> fmtNum("min_value_over_0"),
      "max_value" -> fmtNum("max_value"),
      "min_date" -> d.fmtTs("CAST(min_date AS TIMESTAMP)"),
      "max_date" -> d.fmtTs("CAST(max_date AS TIMESTAMP)"))
    val proj = fields.map { case (n, e) =>
      s"CASE WHEN pii_flag IS NOT NULL THEN '$Redacted' ELSE $e END AS $n"
    }.mkString(",\n       ")
    s"""SELECT table_name, column_name, pii_flag,
       |       $proj
       |  FROM $enrRel
       | ORDER BY table_name, column_name""".stripMargin
  }

  def runProfileMasked(spark: SparkSession, dir: String): DataFrame =
    spark.sql(profileMaskedSql(
      graft.inference.HygieneScreens.enrichedView(spark, dir))(SparkDialect))

  def duckProfileMaskedSql(): String =
    profileMaskedSql(s"(${graft.inference.HygieneScreens.enrichSql(
      graft.inference.FunctionalType.duckProfileAllRel())(DuckDialect)})")(DuckDialect)

  /** Full test-type drill-down coverage: every CAT test in
    * [[graft.cat.CatSuite.suites]] carries its reference lookup_query
    * (normalized to (value, count)), unioned into ONE uniform relation —
    * the rows a user sees when clicking ANY failed test. Each branch
    * reads one table with its own pushed-down filter; the union is
    * metadata-bounded (<= 500 rows per test). Redaction is driven by the
    * COMPUTED pii_flag relation landed from the enriched profile — the
    * reference's mask-on-render reads the same computed flags from
    * data_column_chars (source_data_service.py:49-105, pii_masking.py)
    * — so a PII column is masked whatever it is named, and a synthetic
    * ID column named like "name" is not.
    *
    * Scale note: the union executes every lookup at once, so a table
    * with k tests is scanned k times — that is the VERIFICATION harness
    * shape (one oracle-checkable relation). In production the reference
    * (and this engine) runs ONE lookup on demand per clicked test
    * (`t.lookup.get(dialect, table)`) — a single filtered scan; the
    * union entry is never the hot path at 100 TB. */
  def lookupFailedTestsSql(tableRef: String => String,
                           piiPath: String)(d: Dialect): String = {
    val parts = for {
      (table, tests) <- graft.cat.CatSuite.suites.toSeq.sortBy(_._1)
      t <- tests
      lk <- t.lookup.toSeq
    } yield {
      s"""SELECT '$table' AS table_name, '${t.testType}' AS test_type,
         |       '${t.column}' AS column_name,
         |       v AS offending_value, ct AS occurrence_ct
         |  FROM (${lk(d, tableRef(table))}) lk""".stripMargin
    }
    // ONE probe of the metadata-sized flag relation for the whole union
    // (a broadcast join on Spark) instead of a scalar subquery per branch
    s"""SELECT u.table_name, u.test_type, u.column_name,
       |       CASE WHEN pf.pii_flag IS NOT NULL THEN '$Redacted'
       |            ELSE u.offending_value END AS offending_value,
       |       u.occurrence_ct
       |  FROM (
       |${parts.mkString("\nUNION ALL\n")}
       |) u
       |  LEFT JOIN (SELECT table_name, column_name, MAX(pii_flag) AS pii_flag
       |               FROM ${d.readParquet(piiPath)}
       |              GROUP BY table_name, column_name) pf
       |    ON pf.table_name = u.table_name AND pf.column_name = u.column_name
       | ORDER BY u.table_name, u.test_type, u.column_name,
       |          offending_value, u.occurrence_ct""".stripMargin
  }

  /** Per-anomaly-type hygiene drill-downs — the reference's
    * target_data_lookups (each anomaly type's lookup_query over the
    * flagged column; build_hygiene_query in source_data_service.py),
    * normalized to (anomaly_type, table_name, column_name, value,
    * count) and redacted through the same landed pii_flag relation.
    * Fixed exemplary instantiation per implemented lookup shape; in
    * production ONE lookup renders on demand per clicked finding. */
  def hygieneLookupSql(tableRef: String => String,
                       piiPath: String)(d: Dialect): String = {
    import graft.functions.Patterns
    def inList(xs: Seq[String]) = xs.map(w => s"'$w'").mkString("(", ", ", ")")
    // the Non_Standard_Blanks dummy-value predicate (same vocabulary the
    // profiler's filled_value_ct counts)
    def blanks(c: String) =
      s"""($c IS NULL OR $c = '' OR $c IN ('.', '?', ' ')
         | OR ${d.rlike(s"LOWER($c)", Patterns.filledPattern)}
         | OR LOWER($c) IN ${inList(Patterns.filledWordsAll)})""".stripMargin
    val branches = Seq(
      ("Non_Standard_Blanks", "events", "event_type",
        (c: String) => blanks(c), (c: String) => c),
      ("Leading_Spaces", "customer", "c_name",
        (c: String) => s"$c LIKE ' %'", (c: String) => c),
      ("Quoted_Values", "customer", "c_mktsegment",
        (c: String) => s"(LEFT($c, 1) = '\"' OR LEFT($c, 1) = '''')",
        (c: String) => c),
      ("Unlikely_Date_Values", "orders", "o_orderdate",
        (c: String) => s"CAST($c AS TIMESTAMP) < DATE '1900-01-01'",
        (c: String) => d.fmtTs(s"CAST($c AS TIMESTAMP)")))
    val parts = branches.map { case (anomaly, table, col, pred, valExpr) =>
      s"""SELECT '$anomaly' AS anomaly_type, '$table' AS table_name,
         |       '$col' AS column_name, ${valExpr(col)} AS value,
         |       COUNT(*) AS occurrence_ct
         |  FROM ${tableRef(table)}
         | WHERE ${pred(col)}
         | GROUP BY ${valExpr(col)}
         | ORDER BY occurrence_ct DESC, value
         | LIMIT $Limit""".stripMargin
    }.map(p => s"SELECT * FROM (\n$p\n) b")
    s"""SELECT u.anomaly_type, u.table_name, u.column_name,
       |       CASE WHEN pf.pii_flag IS NOT NULL THEN '$Redacted'
       |            ELSE u.value END AS value,
       |       u.occurrence_ct
       |  FROM (
       |${parts.mkString("\nUNION ALL\n")}
       |) u
       |  LEFT JOIN (SELECT table_name, column_name, MAX(pii_flag) AS pii_flag
       |               FROM ${d.readParquet(piiPath)}
       |              GROUP BY table_name, column_name) pf
       |    ON pf.table_name = u.table_name AND pf.column_name = u.column_name
       | ORDER BY u.anomaly_type, u.table_name, u.column_name,
       |          value, u.occurrence_ct""".stripMargin
  }

  def runHygieneLookup(spark: SparkSession, dir: String): DataFrame = {
    val piiPath = landPiiFlags(spark, dir)
    Seq("events", "customer", "orders").foreach { t =>
      graft.core.Tables.load(spark, dir, t, parallelize = false)
        .createOrReplaceTempView(s"__dd_hy_$t")
    }
    spark.sql(hygieneLookupSql(t => s"__dd_hy_$t", piiPath)(SparkDialect))
  }

  def duckHygieneLookupSql(): String =
    hygieneLookupSql(identity, piiFlagsPath)(DuckDialect)

  def runFailedTests(spark: SparkSession, dir: String): DataFrame = {
    val piiPath = landPiiFlags(spark, dir)
    graft.cat.CatSuite.suites.keys.foreach { t =>
      graft.core.Tables.load(spark, dir, t, parallelize = false)
        .createOrReplaceTempView(s"__dd_lk_$t")
    }
    spark.sql(lookupFailedTestsSql(t => s"__dd_lk_$t", piiPath)(SparkDialect))
  }

  def duckFailedTestsSql(): String =
    lookupFailedTestsSql(identity, piiFlagsPath)(DuckDialect)
}
