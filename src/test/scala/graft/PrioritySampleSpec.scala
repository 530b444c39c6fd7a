package graft

import graft.pipeline.PrioritySample
import graft.oracle.SparkDialect

/** Exact-k priority sample: stability, the bottom-k prefix property
  * (growing k only extends the sample), and the TakeOrdered plan shape
  * (no global sort of the corpus). */
class PrioritySampleSpec extends SparkSpec {

  private def sample(k: Int) = {
    graft.core.Tables.load(spark, sfDir, "documents", parallelize = false)
      .createOrReplaceTempView("__graft_prio_spec")
    spark.sql(PrioritySample.sql("__graft_prio_spec", k)(SparkDialect))
  }

  test("sample is reproducible and exactly k") {
    val a = sample(40).collect()
    val b = sample(40).collect()
    assert(a.length == 40)
    assert(a.toSeq == b.toSeq)
  }

  test("bottom-k prefix property: k=20 is the head of k=40") {
    val small = sample(20).collect().map(_.getLong(0)).toSeq
    val big = sample(40).collect().map(_.getLong(0)).toSeq
    assert(big.take(20) == small)
  }

  test("streaming twin: the final emission equals the batch sample") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark2 = spark
    import spark2.implicits._
    val ids = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val (h1, h2) = ids.splitAt(ids.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val q = graft.streaming.StreamMonitors
      .ingestPrioritySample(input.toDF().toDF("doc_id"), k = 25)
      .writeStream.format("memory").queryName("prio_stream")
      .outputMode("append").start()
    val rows = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("prio_stream").collect()
    } finally q.stop()
    val lastEpoch = rows.map(_.getAs[Long]("epoch")).max
    val streamed = rows.filter(_.getAs[Long]("epoch") == lastEpoch)
      .map(r => (r.getAs[String]("priority"), r.getAs[Long]("doc_id")))
      .sorted.toSeq
    val batch = sample(25).collect()
      .map(r => (r.getAs[String]("priority"), r.getLong(0))).sorted.toSeq
    assert(streamed == batch)
  }

  test("bottom-k merge is duplicate-safe (at-least-once replay)") {
    // replaying a row already in the k-sample must not evict a member:
    // a duplicate of a current member is a TreeSet no-op and must not
    // pair with an eviction (the duplicate arrives LAST so a lost max
    // cannot be silently re-adopted)
    val members = (1 to 3).map(i => (f"$i%02d", i.toLong))
    val replayed = graft.pipeline.PrioritySample
      .bottomK((members :+ members.head).iterator, 3)
    assert(replayed == members)
    // and the state-merge shape: prev ++ rows with full overlap
    val merged = graft.pipeline.PrioritySample
      .bottomK((members ++ members).iterator, 3)
    assert(merged == members)
  }

  test("plans as TakeOrdered — no global sort of the corpus") {
    val plan = sample(PrioritySample.K).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }
}
