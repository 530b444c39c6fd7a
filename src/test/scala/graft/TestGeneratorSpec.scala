package graft

import org.apache.spark.sql.Row

import graft.generation.TestGenerator

class TestGeneratorSpec extends SparkSpec {

  private lazy val gens: Map[(String, String, String), Row] =
    TestGenerator.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("test_type"), r.getAs[String]("table_name"),
        r.getAs[String]("column_name")) -> r).toMap

  test("Unique generated for unique high-count keys") {
    assert(gens.contains(("Unique", "orders", "o_orderkey")))
    assert(gens(("Unique", "orders", "o_orderkey")).getAs[Double]("threshold_value") == 0.0)
  }

  test("Avg_Shift generated for numeric measures with profiled baselines") {
    val r = gens(("Avg_Shift", "lineitem", "l_extendedprice"))
    assert(r.getAs[Double]("baseline_value_ct") > 0)
    assert(r.getAs[Double]("baseline_sd") > 0)
    assert(r.getAs[Double]("threshold_value") == 0.5)
  }

  test("LOV_Match baseline lists the frequent values quoted") {
    val r = gens(("LOV_Match", "orders", "o_orderstatus"))
    val bv = r.getAs[String]("baseline_value")
    assert(bv.startsWith("(") && bv.endsWith(")"))
    assert(bv.contains("'O'") || bv.contains("'F'"))
  }

  test("Required generated for fully-populated tables") {
    assert(gens.keys.exists(_._1 == "Required"))
  }

  test("Min_Date baseline carries the profiled minimum") {
    val r = gens(("Min_Date", "lineitem", "l_shipdate"))
    assert(r.getAs[String]("baseline_value").startsWith("199"))
  }
}
