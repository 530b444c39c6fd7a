package graft

import org.apache.spark.sql.Row

import graft.querytests.QueryTests

class QueryTestsSpec extends SparkSpec {

  private def result(name: String): Row =
    QueryTests.run(spark, sfDir, name).collect().head

  test("Combo_Match: every customer nation exists in nation table") {
    val r = result("combo_match")
    assert(r.getAs[Double]("result_measure") == 0.0)
    assert(r.getAs[Int]("result_code") == 1)
    assert(r.getAs[String]("result_message") == "No errors found.")
  }

  test("Aggregate_Balance flags order-total mismatches deterministically") {
    val r = result("aggregate_balance")
    assert(r.getAs[Double]("result_measure") >= 0.0)
    assert(Set(0, 1).contains(r.getAs[Int]("result_code")))
  }

  test("Distribution_Shift computes a JS divergence in [0, 1]") {
    val r = result("distribution_shift")
    val js = r.getAs[Double]("result_measure")
    assert(js >= 0.0 && js <= 1.0)
    assert(r.getAs[String]("result_message").startsWith("Divergence Level: "))
  }

  test("Timeframe combo tests run over the shipdate window") {
    val m = result("timeframe_combo_match")
    val g = result("timeframe_combo_gain")
    assert(m.getAs[Double]("result_measure") >= 0.0)
    assert(g.getAs[Double]("result_measure") >= 0.0)
  }

  test("Dupe_Rows counts total duplicated records") {
    val r = result("dupe_rows")
    assert(r.getAs[Double]("result_measure") >= 0.0)
  }

  test("every query test carries a drill-down lookup; union covers all") {
    import graft.querytests.QueryTests
    val noLookup = QueryTests.tests.filter(_.lookup.isEmpty).map(_.name)
    assert(noLookup.isEmpty, s"query tests without a lookup: $noLookup")
    val rows = QueryTests.runLookupAll(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the mismatch families return offending details (balance gaps exist
    // in the testdata: o_totalprice includes tax/discount)
    val types = rows.map(_.getAs[String]("test_type")).toSet
    assert(types.contains("aggregate_balance"), types)
    assert(types.contains("distribution_shift"), types)
  }
}
