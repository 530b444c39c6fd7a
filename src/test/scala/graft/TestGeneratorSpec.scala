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

class TestValidationSpec extends SparkSpec {
  test("validation deactivates tests referencing missing objects") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("test_type", StringType),
      StructField("table_name", StringType),
      StructField("column_name", StringType)))
    val defs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("Unique", "orders", "o_orderkey"),
        Row("Unique", "orders", "o_dropped_col"),
        Row("Row_Ct", "vanished_table", "x")),
      schema)
    val cat = graft.generation.TestValidation.catalog(spark, "/root/testdata/sf0.001")
    val out = graft.generation.TestValidation.validate(defs, cat)
      .select("test_type", "table_name", "column_name", "is_active", "validation_message")
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        (r.getBoolean(3), Option(r.getString(4)))).toMap
    assert(out(("orders", "o_orderkey")) == (true, None))
    assert(out(("orders", "o_dropped_col"))._1 == false)
    assert(out(("orders", "o_dropped_col"))._2.exists(_.contains("Column not found")))
    assert(out(("vanished_table", "x"))._1 == false)
    assert(out(("vanished_table", "x"))._2.exists(_.contains("Table not found")))
  }
}
