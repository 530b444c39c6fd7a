package graft

import graft.pipeline.{Dedup, Similarity, TextAnalysis}

class PipelineSpec extends SparkSpec {

  test("text analysis emits one row per document with sane metrics") {
    val rows = TextAnalysis.run(spark, sfDir).collect()
    assert(rows.length == 500)
    val r = rows.find(!_.isNullAt(1)).get
    assert(r.getAs[Long]("ws_token_ct") >= 0)
    assert(r.getAs[String]("fingerprint").length == 32)
  }

  test("exact dedup groups identical texts") {
    val rows = Dedup.runExact(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Long]("dupe_ct") > 1))
  }

  test("jaccard and minhash agree: minhash pairs are a subset") {
    val jac = Dedup.runJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.runMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(jac))
  }

  test("winnowing fingerprints recover the word-shingle near-dup pairs") {
    val winnow = Dedup.runWinnow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val jac = Dedup.runJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // char-gram winnowing samples ~2/(w+1) of the gram stream, so every
    // >=0.5-word-Jaccard pair should surface among its top pairs
    if (jac.nonEmpty) {
      val missed = jac -- winnow
      assert(missed.size <= jac.size / 5,
        s"winnowing missed ${missed.size} of ${jac.size} known near-dups")
    }
    // fingerprint Jaccard is a sane similarity in (0, 1]
    Dedup.runWinnow(spark, sfDir).collect().foreach { r =>
      val j = r.getAs[Double]("winnow_jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("simhash produces candidate near-dup pairs with small hamming") {
    val rows = Dedup.runSimhash(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Long]("hamming") <= 3L))
  }

  test("brute-force knn returns k ranked neighbors per query") {
    val rows = Similarity.runBruteForce(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5)
    assert(byQuery.values.forall(_.length == 10))
    assert(rows.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0001))
  }

  test("ivf knn probes one label partition per query") {
    val rows = Similarity.runIvf(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.values.forall(rs => rs.map(_.getAs[Int]("probed_label")).distinct.length == 1))
  }

  test("lsh fold form is bit-identical to the unrolled oracle form") {
    // same hyperplanes, same left-to-right addition order -> identical
    // buckets, neighbors, and cosines
    val unrolled = Similarity.runLsh(spark, sfDir).collect().map(_.toSeq)
    val fold = Similarity.runLshFold(spark, sfDir).collect().map(_.toSeq)
    assert(unrolled.nonEmpty)
    assert(unrolled.toSeq == fold.toSeq)
  }

  test("lsh fold form holds at production dims (768)") {
    // the unrolled form at 768 dims would emit 8×768 inline literal
    // terms; the fold form constant-folds each plane to one array
    // literal and stays codegen-compact — prove it plans and runs
    import spark.implicits._
    val dim = 768
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1), (i % 4).toInt))
    vecs.toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("__graft_emb768")
    val rows = spark.sql(
      Similarity.lshFoldSql("__graft_emb768", nQueries = 3, dim = dim)).collect()
    assert(rows.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0001))
    // every returned neighbor shares its query's bucket by construction
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length <= 3)
  }
}
