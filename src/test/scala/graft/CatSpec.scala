package graft

import org.apache.spark.sql.Row

import graft.cat.CatSuite

class CatSpec extends SparkSpec {

  private def results(table: String): Map[(String, String), Row] =
    CatSuite.run(spark, sfDir, table).collect()
      .map(r => (r.getAs[String]("test_type"), r.getAs[String]("column_name")) -> r)
      .toMap

  test("a poisoned measure is isolated: healthy tests still land, error row carries the message") {
    import graft.cat.CatMeasures._
    val suite = Seq(
      rowCt("o_orderkey", "100"),
      unique("o_orderkey", "0"),
      conditionFlag("o_orderkey", "no_such_column > 0", "0")) // analysis error
    graft.core.Tables.load(spark, sfDir, "orders")
      .createOrReplaceTempView("__graft_cat_poison")
    val rows = CatSuite.runIsolated(spark, "__graft_cat_poison", suite).collect()
    assert(rows.length == 3)
    val byType = rows.map(r => r.getString(0) -> r).toMap
    assert(byType("Row_Ct").getAs[String]("result_status") == "Passed")
    assert(byType("Unique").getAs[String]("result_status") == "Passed")
    val err = byType("Condition_Flag")
    assert(err.getAs[String]("result_status") == "Error")
    assert(err.getAs[String]("query_error") != null)
    assert(err.isNullAt(err.fieldIndex("result_code")))
  }

  test("one row per test, result codes are 0/1") {
    val rs = results("lineitem")
    assert(rs.size == CatSuite.suites("lineitem").size)
    assert(rs.values.forall(r => Set(0, 1).contains(r.getAs[Int]("result_code"))))
  }

  test("Row_Ct passes at sf0.001 (6000 >= 1000)") {
    val r = results("lineitem")(("Row_Ct", "l_orderkey"))
    assert(r.getAs[Double]("measure_num") == 6000.0)
    assert(r.getAs[Int]("result_code") == 1)
  }

  test("Unique fails on non-unique l_orderkey, passes on o_orderkey") {
    assert(results("lineitem")(("Unique", "l_orderkey")).getAs[Int]("result_code") == 0)
    assert(results("orders")(("Unique", "o_orderkey")).getAs[Int]("result_code") == 1)
  }

  test("LOV_All emits a string measure") {
    val r = results("customer")(("LOV_All", "c_mktsegment"))
    assert(r.getAs[String]("measure_str") ==
      "AUTOMOBILE|BUILDING|FURNITURE|HOUSEHOLD|MACHINERY")
    assert(r.getAs[Int]("result_code") == 1)
    assert(r.isNullAt(r.fieldIndex("measure_num")))
  }

  test("Pattern_Match passes on uniform Customer# names") {
    val r = results("customer")(("Pattern_Match", "c_name"))
    assert(r.getAs[Double]("measure_num") == 0.0)
    assert(r.getAs[Int]("result_code") == 1)
  }

  test("every CAT test carries a drill-down lookup and the union covers it") {
    import graft.cat.CatSuite
    val noLookup = CatSuite.suites.values.flatten
      .filter(_.lookup.isEmpty).map(_.testType).toSet
    assert(noLookup.isEmpty, s"test types without a lookup_query: $noLookup")
    // the unioned drill-down SQL has a branch for every suite test type
    val sql = graft.lookup.DrillDown.lookupFailedTestsSql(identity,
      "/tmp/__graft_pii_render_only")(graft.oracle.SparkDialect)
    val expected = CatSuite.suites.values.flatten.map(_.testType).toSet
    val missing = expected.filterNot(tt => sql.contains(s"'$tt' AS test_type"))
    assert(missing.isEmpty, s"types missing from the drill-down union: $missing")
  }

  test("drill-down redaction follows the COMPUTED pii_flag, not names") {
    // TPC-H-shaped testdata has no PII functional types (no Email /
    // Phone / Address / Person-name columns), so the flag relation is
    // empty and NOTHING is redacted — synthetic ID values named like
    // "name" (c_name = 'Customer#...') are correctly shown, matching the
    // reference's data_column_chars.pii_flag-driven mask-on-render.
    val rows = graft.lookup.DrillDown.runFailedTests(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[String]("offending_value") != graft.lookup.DrillDown.Redacted))
  }

  test("a PII column NOT named like 'name' is flagged and redacted") {
    import graft.oracle.SparkDialect
    // minimal enriched-profile row shapes for the PiiFlag cascade:
    // `contact` is an email column (fdt Email) — PII although its name
    // carries no hint; `c_name` is a synthetic unique ID — not PII.
    spark.sql(
      """SELECT * FROM VALUES
        |  ('t1', 'contact', 'A', 'Email', 20, 0.0, 'EMAIL', '', 'a@b.co', 12.0),
        |  ('t1', 'c_name', 'A', 'ID-Unique', 20, 0.0, '', '', 'Customer#1', 12.0)
        |AS t(table_name, column_name, general_type, functional_data_type,
        |     max_length, avg_embedded_spaces, std_pattern_match,
        |     top_patterns, min_text, avg_length)""".stripMargin)
      .createOrReplaceTempView("__pii_profile_rows")
    val flags = spark.sql(
      s"""SELECT table_name, column_name,
         |       ${graft.inference.PiiFlag.expr(SparkDialect)} AS pii_flag
         |  FROM __pii_profile_rows""".stripMargin)
      .collect().map(r => r.getString(1) -> r.getAs[String]("pii_flag")).toMap
    assert(flags("contact") == "B/CONTACT/Email")
    assert(flags("c_name") == null)

    // wire the flags through the landed relation into a real lookup
    val piiPath = "/tmp/graft_test_pii_flags"
    spark.sql("""SELECT 't1' AS table_name, 'contact' AS column_name,
                |       'B/CONTACT/Email' AS pii_flag""".stripMargin)
      .write.mode("overwrite").parquet(piiPath)
    spark.sql(
      """SELECT * FROM VALUES (1, 'a@b.co', 'ok1'), (2, 'c@d.co', 'bad')
        |AS t(id, contact, label)""".stripMargin)
      .createOrReplaceTempView("__pii_t1")
    val masked = spark.sql(graft.lookup.DrillDown.maskedMismatchSql(
      "__pii_t1", "t1", "label", "^[a-z]+[0-9]$", piiPath,
      otherCols = Seq("id", "contact", "label"))(SparkDialect)).collect()
    assert(masked.nonEmpty)
    assert(masked.forall(_.getAs[String]("contact") ==
      graft.lookup.DrillDown.Redacted))
    assert(masked.forall(_.getAs[String]("id") !=
      graft.lookup.DrillDown.Redacted))
  }

  test("masked profile view redacts the PII fields of flagged columns") {
    import graft.oracle.SparkDialect
    spark.sql(
      """SELECT * FROM VALUES
        |  ('t2', 'contact', 'B/CONTACT/Email', '| a@b.co | 3', 'a@b.co',
        |   'z@y.io', 1.0, 1.0, 9.0, DATE '2020-01-01', DATE '2021-01-01'),
        |  ('t2', 'amount', CAST(NULL AS STRING), '| 5 | 2', '5', '9',
        |   5.0, 5.0, 9.0, DATE '2020-01-01', DATE '2021-01-01')
        |AS t(table_name, column_name, pii_flag, top_freq_values, min_text,
        |     max_text, min_value, min_value_over_0, max_value, min_date,
        |     max_date)""".stripMargin)
      .createOrReplaceTempView("__pii_profile_mask")
    val rows = spark.sql(graft.lookup.DrillDown.profileMaskedSql(
      "__pii_profile_mask")(SparkDialect)).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val red = graft.lookup.DrillDown.Redacted
    for (f <- Seq("top_freq_values", "min_text", "max_text", "min_value",
      "min_value_over_0", "max_value", "min_date", "max_date")) {
      assert(rows("contact").getAs[String](f) == red, f)
      assert(rows("amount").getAs[String](f) != red, f)
    }
  }
}
