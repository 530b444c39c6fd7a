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
    val sql = graft.lookup.DrillDown.lookupFailedTestsSql(identity)(
      graft.oracle.SparkDialect)
    val expected = CatSuite.suites.values.flatten.map(_.testType).toSet
    val missing = expected.filterNot(tt => sql.contains(s"'$tt' AS test_type"))
    assert(missing.isEmpty, s"types missing from the drill-down union: $missing")
  }

  test("failed-test drill-down masks person-name values uniformly") {
    val rows = graft.lookup.DrillDown.runFailedTests(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nameRows = rows.filter(
      _.getAs[String]("column_name").toLowerCase.contains("name"))
    assert(nameRows.nonEmpty)
    assert(nameRows.forall(
      _.getAs[String]("offending_value") == graft.lookup.DrillDown.Redacted))
    // non-PII values are NOT masked
    assert(rows.exists(r =>
      r.getAs[String]("offending_value") != graft.lookup.DrillDown.Redacted))
  }
}
