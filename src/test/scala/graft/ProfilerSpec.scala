package graft

import org.apache.spark.sql.Row

import graft.core.Tables
import graft.profiling.Profiler

class ProfilerSpec extends SparkSpec {

  private def profileMap(table: String): Map[String, Row] = {
    val df = Profiler.profile(spark, sfDir, table)
    df.collect().map(r => r.getAs[String]("column_name") -> r).toMap
  }

  test("profile emits one row per column") {
    val rows = profileMap("customer")
    assert(rows.keySet == Tables.schemas("customer").fieldNames.toSet)
  }

  test("record/value/null counts are consistent") {
    val n = Tables.load(spark, sfDir, "customer").count()
    for ((_, r) <- profileMap("customer")) {
      assert(r.getAs[Long]("record_ct") == n)
      assert(r.getAs[Long]("value_ct") + r.getAs[Long]("null_value_ct") == n)
    }
  }

  test("general types derive from the schema") {
    val rows = profileMap("lineitem")
    assert(rows("l_returnflag").getAs[String]("general_type") == "A")
    assert(rows("l_quantity").getAs[String]("general_type") == "N")
    assert(rows("l_shipdate").getAs[String]("general_type") == "D")
  }

  test("numeric metrics populated only for numeric columns") {
    val rows = profileMap("lineitem")
    assert(rows("l_quantity").getAs[Double]("min_value") >= 0.0)
    assert(rows("l_returnflag").isNullAt(rows("l_returnflag").fieldIndex("min_value")))
    assert(rows("l_returnflag").getAs[Long]("distinct_value_ct") > 0)
  }

  test("date metrics populated for timestamp columns, incl. nanos parquet") {
    val rows = profileMap("events") // events.ts is TIMESTAMP(NANOS) parquet
    val ts = rows("ts")
    assert(ts.getAs[String]("general_type") == "D")
    assert(ts.getAs[String]("min_date") != null)
    assert(ts.getAs[String]("max_date") >= ts.getAs[String]("min_date"))
  }
}
