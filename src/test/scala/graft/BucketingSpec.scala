package graft

import graft.core.Bucketing

/** Storage-level co-location: a join of two same-bucketed tables must
  * plan without shuffle exchanges — the persisted-index join shape. */
class BucketingSpec extends SparkSpec {

  test("joining two same-bucketed tables plans without a shuffle") {
    // clear any leftover managed-table location from a prior JVM
    Seq("graft_bk_left", "graft_bk_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    Bucketing.writeBucketed(
      docs.selectExpr("doc_id", "source"), "graft_bk_left", "doc_id", 8)
    Bucketing.writeBucketed(
      docs.selectExpr("doc_id", "lang"), "graft_bk_right", "doc_id", 8)
    val joined = Bucketing.colocatedJoin(spark, "graft_bk_left",
      "graft_bk_right", "doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(800)}")
    assert(joined.count() == docs.count())
  }

  test("bucketed append keeps the probe partition-pruned (ann index)") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_idx_append").toString + "/idx"
    graft.pipeline.Similarity.writeIndex(spark, sfDir, out)
    val before = spark.read.parquet(out).count()
    // a fresh batch of vectors, ids beyond the corpus
    val dim = 64
    val rnd = new scala.util.Random(11)
    val batch = (100000L until 100040L).map(i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
    graft.pipeline.Similarity.appendIndex(spark, batch, out)
    val all = spark.read.parquet(out)
    assert(all.count() == before + 40)
    // appended rows carry seed assignments from the FROZEN seed sample
    val seedIds = spark.read.parquet(out + "_seeds")
      .select("seed_id").collect().map(_.getLong(0)).toSet
    val newRows = all.where("vec_id >= 100000")
    assert(newRows.count() == 40)
    newRows.select("seed_id").collect()
      .foreach(r => assert(seedIds.contains(r.getLong(0))))
    // probes stay partition-pruned over old + new files alike
    val probe = graft.pipeline.Similarity.readBucket(spark, out, 3)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(bucket"),
      s"bucket probe lost partition pruning:\n${p.take(600)}")
  }

  test("index compaction rewrites overgrown buckets only; probes stay pruned") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_idx_compact").toString + "/idx"
    graft.pipeline.Similarity.writeIndex(spark, sfDir, out)
    // several append batches accumulate files per touched bucket
    val dim = 64
    val rnd = new scala.util.Random(23)
    (0 until 4).foreach { b =>
      val batch = (200000L + b * 50 until 200000L + b * 50 + 50).map(i =>
        (i, Array.fill(dim)(rnd.nextFloat() * 2 - 1), (i % 10).toInt))
        .toDF("vec_id", "embedding", "label")
      graft.pipeline.Similarity.appendIndex(spark, batch, out)
    }
    val report = graft.pipeline.Similarity.indexFileReport(spark, out)
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("file_ct")).toMap
    assert(report.values.exists(_ > 1L), "appends produced no multi-file bucket")
    val rowsBefore = spark.read.parquet(out)
      .selectExpr("vec_id", "bucket", "seed_id").collect()
      .map(_.mkString(",")).sorted.toSeq
    // compact every bucket above 1 file down to a single file
    val compacted = graft.pipeline.Similarity.compactIndex(spark, out, maxFiles = 1)
    assert(compacted.nonEmpty)
    val after = graft.pipeline.Similarity.indexFileReport(spark, out)
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("file_ct")).toMap
    compacted.foreach(b => assert(after(b) == 1L, s"bucket $b still ${after(b)} files"))
    // untouched buckets keep their exact file sets
    report.filterNot { case (b, _) => compacted.contains(b) }
      .foreach { case (b, ct) => assert(after(b) == ct, s"bucket $b was touched") }
    // rows survive the swap bit-for-bit and probes stay partition-pruned
    val rowsAfter = spark.read.parquet(out)
      .selectExpr("vec_id", "bucket", "seed_id").collect()
      .map(_.mkString(",")).sorted.toSeq
    assert(rowsAfter == rowsBefore, "compaction changed the index rows")
    val p = graft.pipeline.Similarity.readBucket(spark, out, compacted.head)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(bucket"),
      s"compacted bucket probe lost partition pruning:\n${p.take(600)}")
  }
}
