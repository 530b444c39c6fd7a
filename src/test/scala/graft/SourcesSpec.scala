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

  test("unknown formats fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      Sources.load(spark, "/tmp", "documents", "avro")
    }
  }
}
