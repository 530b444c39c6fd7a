package graft

import org.apache.spark.sql.Row

import graft.profiling.FreqProfiler

class FreqProfilerSpec extends SparkSpec {

  private def rows(table: String): Map[String, Row] =
    FreqProfiler.profile(spark, sfDir, table).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap

  test("one row per A-column; ineligible columns have NULL metrics") {
    val r = rows("customer")
    assert(r.keySet == Set("c_name", "c_mktsegment"))
    // c_name: unique per customer → > 70 distinct → not freq-eligible
    assert(r("c_name").isNullAt(r("c_name").fieldIndex("top_freq_values")))
  }

  test("top_freq_values format matches reference layout") {
    val r = rows("orders")("o_orderpriority")
    val tf = r.getAs[String]("top_freq_values")
    assert(tf != null)
    val lines = tf.split("\n")
    assert(lines.forall(_.startsWith("| ")))
    // "| value | ct" → ct parses as a number
    assert(lines.forall(_.split("\\| ").last.trim.forall(_.isDigit)))
  }

  test("distinct_value_hash is a 32-char md5 for eligible columns") {
    val r = rows("lineitem")("l_returnflag")
    val h = r.getAs[String]("distinct_value_hash")
    assert(h != null && h.length == 32)
  }

  test("top_patterns emitted for short-valued columns, capped at 5") {
    val r = rows("orders")("o_orderpriority")
    val tp = r.getAs[String]("top_patterns")
    assert(tp != null)
    // "ct | pat | ct | pat ..." → odd number of " | "-separated tokens,
    // at most 5 pattern entries
    val parts = tp.split(" \\| ")
    assert(parts.length % 2 == 0 && parts.length <= 10)
  }
}
