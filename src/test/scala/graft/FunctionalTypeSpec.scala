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
}
