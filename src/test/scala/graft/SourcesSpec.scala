package graft

import graft.sources.Sources

/** Multi-format source parity: every format must serve the SAME rows
  * the parquet path serves, schema enforced, timestamps exact. */
class SourcesSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"CAST(`$c` AS STRING)").toIndexedSeq: _*)
      .collect().map(_.mkString("")).sorted.toSeq
  }

  test("csv/json/orc round-trip the documents table bit-identical to parquet") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sources").toString
    val ref = graft.core.Tables.load(spark, sfDir, "documents", parallelize = false)
    val want = canon(ref)
    for (fmt <- Seq("csv", "json", "orc")) {
      Sources.write(ref, base, "documents", fmt)
      val got = Sources.load(spark, base, "documents", fmt)
      assert(got.schema == graft.core.Tables.schemas("documents"),
        s"$fmt schema drifted")
      assert(canon(got) == want, s"$fmt rows diverge from parquet")
    }
  }

  test("array columns ride csv as JSON strings and parse back exactly (embeddings)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sources_arr").toString
    val ref = graft.core.Tables.load(spark, sfDir, "embeddings", parallelize = false)
    Sources.write(ref, base, "embeddings", "csv")
    val got = Sources.load(spark, base, "embeddings", "csv")
    assert(got.schema("embedding").dataType ==
      graft.core.Tables.schemas("embeddings")("embedding").dataType)
    assert(canon(got) == canon(ref), "embedding arrays drifted through csv")
  }

  test("timestamp columns survive the text formats exactly (orders)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sources_ts").toString
    val ref = graft.core.Tables.load(spark, sfDir, "orders", parallelize = false)
    val want = canon(ref)
    for (fmt <- Seq("csv", "json")) {
      Sources.write(ref, base, "orders", fmt)
      assert(canon(Sources.load(spark, base, "orders", fmt)) == want,
        s"$fmt timestamps drifted")
    }
  }

  test("a converted text corpus profiles identically to the parquet original") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_sources_conv").toString
    val ref = graft.core.Tables.load(spark, sfDir, "documents", parallelize = false)
    Sources.write(ref, base, "documents", "json")
    Sources.convertToParquet(spark, base, "documents", "json", s"$base/landed")
    val a = spark.read.parquet(s"$base/landed/documents.parquet")
    assert(canon(a) == canon(ref))
  }

  test("quarantine ingest splits malformed rows out verbatim, good rows land typed") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_quarantine").toString
    // a json feed of the orders table with two poisoned lines: a type
    // violation and a truncated record — FAILFAST would kill the whole
    // landing; quarantine must land the clean rows and keep the
    // offenders' raw text
    val ref = graft.core.Tables.load(spark, sfDir, "orders", parallelize = false)
    Sources.write(ref, base, "orders", "json")
    val poisoned =
      """{"o_orderkey":"NOT_A_NUMBER","o_custkey":1,"o_orderstatus":"F"}""" + "\n" +
        """{"o_orderkey": 12, "o_custkey": """ + "\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/orders.json/part-poisoned.json"),
      poisoned.getBytes("UTF-8"))
    val (goodCt, badCt) = Sources.convertToParquetQuarantine(
      spark, base, "orders", "json", s"$base/landed")
    assert(goodCt == ref.count(), s"good=$goodCt want=${ref.count()}")
    assert(badCt == 2, s"quarantined=$badCt")
    val bad = spark.read.parquet(s"$base/landed/orders_quarantine.parquet")
      .collect().map(_.getString(0))
    assert(bad.exists(_.contains("NOT_A_NUMBER")))
    // landed rows parse back identical to the clean reference
    val landed = spark.read.parquet(s"$base/landed/orders.parquet")
    assert(canon(landed) == canon(ref))
  }

  test("unknown formats fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      Sources.load(spark, "/tmp", "documents", "avro")
    }
  }
}
