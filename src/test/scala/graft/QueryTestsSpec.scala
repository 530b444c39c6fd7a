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
}
