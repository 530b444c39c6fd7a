package graft

import graft.oracle.SparkDialect
import graft.pipeline.Similarity

/** The native `graft_bucket` must be BIT-IDENTICAL to the unrolled SQL
  * rendering (the DuckDB oracle's form) — every LSH consumer's hash
  * parity rides on this. */
class BucketExprSpec extends SparkSpec {

  test("native bucket is bit-identical to the unrolled SQL form on the fixture") {
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("__bexpr_emb")
    for ((np, dim) <- Seq((8, 64), (4, 64))) {
      val mism = spark.sql(
        s"""SELECT COUNT(*) AS n FROM __bexpr_emb
           | WHERE graft_bucket(embedding, $np, $dim) <>
           |       ${Similarity.unrolledBucketExpr("embedding", np, dim)(SparkDialect)}""".stripMargin)
        .head().getAs[Long]("n")
      assert(mism == 0L, s"$mism mismatching buckets at nPlanes=$np")
    }
  }

  test("wide bucket is bit-identical to the unrolled BIGINT SQL form; low bits prefix the int bucket") {
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("__bexpr_emb")
    // full 63-plane parity with the oracle's unrolled BIGINT rendering
    val mism = spark.sql(
      s"""SELECT COUNT(*) AS n FROM __bexpr_emb
         | WHERE graft_bucket_long(embedding, 63, 64) <>
         |       ${Similarity.unrolledBucketLongExpr("embedding", 63, 64)(SparkDialect)}""".stripMargin)
      .head().getAs[Long]("n")
    assert(mism == 0L, s"$mism mismatching wide buckets")
    // the plane stream is shared, so the wide bucket's low 24 bits ARE
    // the int bucket — the property that makes the stacked keys pure
    // refinements of the single-table ones
    val pref = spark.sql(
      s"""SELECT COUNT(*) AS n FROM __bexpr_emb
         | WHERE MOD(graft_bucket_long(embedding, 63, 64), ${1 << 24}) <>
         |       CAST(graft_bucket(embedding, 24, 64) AS BIGINT)""".stripMargin)
      .head().getAs[Long]("n")
    assert(pref == 0L, s"$pref wide buckets whose low bits drift from the int bucket")
    // NULL/short semantics match the int form
    val r = spark.sql(
      """SELECT graft_bucket_long(array(CAST(1.0 AS FLOAT)), 63, 64) AS s,
        |       graft_bucket_long(CAST(NULL AS ARRAY<FLOAT>), 63, 64) AS w
        |""".stripMargin).head()
    assert(r.getAs[Long]("s") == 0L && r.getAs[Long]("w") == 0L)
  }

  test("native bucket spreads vectors over many buckets") {
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("__bexpr_emb")
    val n = spark.sql(
      "SELECT COUNT(DISTINCT graft_bucket(embedding, 8, 64)) AS n FROM __bexpr_emb")
      .head().getAs[Long]("n")
    assert(n > 16, s"only $n buckets used")
  }

  test("short, null-element and NULL arrays all bucket to 0 like the SQL NULL case") {
    // the unrolled CASE chain yields 0 for a NULL vector (CASE WHEN
    // NULL >= 0 is false) — the native form must match, not return NULL
    val r = spark.sql(
      """SELECT graft_bucket(array(CAST(1.0 AS FLOAT)), 8, 64) AS short,
        |       graft_bucket(CAST(NULL AS ARRAY<FLOAT>), 8, 64) AS whole_null
        |""".stripMargin).head()
    assert(r.getAs[Int]("short") == 0)
    assert(!r.isNullAt(r.fieldIndex("whole_null")) &&
      r.getAs[Int]("whole_null") == 0)
  }

  test("NULL vector matches the unrolled SQL form bit-for-bit") {
    val unrolled = Similarity.unrolledBucketExpr(
      "CAST(NULL AS ARRAY<FLOAT>)", 4, 8)(SparkDialect)
    val r = spark.sql(
      s"""SELECT graft_bucket(CAST(NULL AS ARRAY<FLOAT>), 4, 8) AS nat,
         |       $unrolled AS sql""".stripMargin).head()
    assert(r.getAs[Int]("nat") == r.getAs[Int]("sql"))
  }
}
