package graft

import graft.inference.FunctionalType

class FunctionalTypeSpec extends SparkSpec {

  private lazy val types: Map[(String, String), String] =
    FunctionalType.infer(spark, sfDir).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[String]("column_name")) ->
        r.getAs[String]("functional_data_type"))
      .toMap

  test("every column gets a functional type (no NULLs)") {
    assert(types.values.forall(_ != null))
  }

  test("id-mask columns classify into the ID family") {
    assert(types(("events", "event_id")).startsWith("ID"))
    assert(types(("documents", "doc_id")).startsWith("ID"))
  }

  test("date columns classify into date functional types") {
    val t = types(("lineitem", "l_shipdate"))
    assert(t.contains("Date") || t.contains("Transactional"), t)
  }

  test("low-cardinality text classifies as Code/Category/Flag family") {
    val t = types(("customer", "c_mktsegment"))
    assert(Set("Code", "Category", "Flag").contains(t), t)
  }

  test("integer sequence detected") {
    assert(types(("lineitem", "l_linenumber")) == "Sequence")
  }

  test("numeric measures classify as Measurement family") {
    val t = types(("lineitem", "l_extendedprice"))
    assert(t.startsWith("Measurement") || t == "UNKNOWN", t)
  }

  test("datatype suggestion cascade branches fire on fixture columns") {
    // Fixture profile rows exercise every datatype_suggestions.sql branch
    // the real tables don't reach: string-numeric DECIMAL/INTEGER/BIGINT,
    // the DATE vs TIMESTAMP vs TIMESTAMP_NTZ split, zip/short/adaptive
    // VARCHAR buckets, the N-type int-width boundaries, and the
    // record_ct/%id gates (reference datatype_suggestions.sql:1-120).
    import org.apache.spark.sql.Row
    val rel = FunctionalType.registerProfileAll(spark, sfDir)
    val schema = spark.table(rel).schema
    def mk(name: String, over: Map[String, Any]) = {
      val base = Map[String, Any](
        "table_name" -> "fixture", "column_name" -> name,
        "general_type" -> "A", "column_type" -> "string", "position" -> 1,
        "record_ct" -> 1000L, "value_ct" -> 1000L, "zero_length_ct" -> 0L,
        "distinct_value_ct" -> 500L, "numeric_ct" -> 0L, "date_ct" -> 0L,
        "max_length" -> 8L, "min_length" -> 1L,
        "top_freq_values" -> "| alpha | 5")
      Row.fromSeq(schema.fields.map(f => (base ++ over).getOrElse(f.name, null)))
    }
    val rows = Seq(
      mk("str_dec", Map("numeric_ct" -> 1000L, "top_freq_values" -> "| 1.5 | 3")),
      mk("str_int", Map("numeric_ct" -> 1000L, "max_length" -> 4L,
        "top_freq_values" -> "| 42 | 3")),
      mk("str_big", Map("numeric_ct" -> 1000L, "max_length" -> 12L,
        "top_freq_values" -> "| 123456789012 | 3")),
      mk("str_tstz", Map("date_ct" -> 1000L,
        "top_freq_values" -> "| 2024-01-01 00:00:00+00:00 | 3")),
      mk("str_ts", Map("date_ct" -> 1000L,
        "top_freq_values" -> "| 2024-01-01 00:00:00 | 3")),
      mk("str_date", Map("date_ct" -> 1000L,
        "top_freq_values" -> "| 2024-01-01 | 3")),
      mk("cust_zip", Map("max_length" -> 5L)),
      mk("str_short", Map("max_length" -> 4L)),
      mk("str_medium", Map("max_length" -> 37L)),
      mk("str_wide", Map("max_length" -> 80L)),
      mk("n_small", Map("general_type" -> "N", "column_type" -> "decimal(12,2)",
        "fractional_sum" -> 0.0, "min_value" -> -50.0, "max_value" -> 50.0)),
      mk("n_int", Map("general_type" -> "N", "column_type" -> "decimal(12,2)",
        "fractional_sum" -> 0.0, "min_value" -> 0.0, "max_value" -> 1000000.0)),
      mk("n_big", Map("general_type" -> "N", "column_type" -> "decimal(19,2)",
        "fractional_sum" -> 0.0, "min_value" -> 0.0, "max_value" -> 2.0e8)),
      mk("n_frac", Map("general_type" -> "N", "column_type" -> "decimal(12,2)",
        "fractional_sum" -> 10.0, "min_value" -> 0.0, "max_value" -> 50.0)),
      mk("small_tbl", Map("record_ct" -> 400L)),
      mk("cust_id", Map()))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .createOrReplaceTempView("__graft_dsug_fixture")
    val out = spark.sql(
      FunctionalType.cascadeSql("__graft_dsug_fixture")(graft.oracle.SparkDialect))
      .collect().map(r => r.getAs[String]("column_name") ->
        r.getAs[String]("datatype_suggestion")).toMap
    assert(out("str_dec") == "DECIMAL(18,4)")
    assert(out("str_int") == "INTEGER")
    assert(out("str_big") == "BIGINT")
    assert(out("str_tstz") == "TIMESTAMP")     // '+' => with zone (databricks names)
    assert(out("str_ts") == "TIMESTAMP_NTZ")   // ':' without '+' => no zone
    assert(out("str_date") == "DATE")
    assert(out("cust_zip") == "VARCHAR(10)")
    assert(out("str_short") == "VARCHAR(10)")
    assert(out("str_medium") == "VARCHAR(50)", out("str_medium"))   // ceil((37+5)/10)*10
    assert(out("str_wide") == "VARCHAR(100)", out("str_wide")) // (1+floor(90/20))*20
    assert(out("n_small") == "SMALLINT")
    assert(out("n_int") == "INTEGER")
    assert(out("n_big") == "BIGINT")
    assert(out("n_frac") == "decimal(12,2)") // fractional values keep declared
    assert(out("small_tbl") == "string")     // record_ct <= 500 keeps declared
    assert(out("cust_id") == "string")       // %id mask keeps declared
  }
}
