package graft

import org.apache.spark.sql.functions._

import graft.profiling.HeavyHitters
import graft.oracle.SparkDialect

/** Heavy hitters: the tree-merged Misra–Gries candidate pass must be a
  * superset of the true ≥1/K-support tokens (so the exact second pass
  * reproduces the global GROUP BY bit-for-bit), and the sketch state
  * must stay bounded regardless of partitioning. */
class HeavyHittersSpec extends SparkSpec {

  test("two-pass result equals the exact global group-by on the fixture") {
    val fast = HeavyHitters.run(spark, sfDir).collect()
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__graft_hh_docs")
    val exact = spark.sql(HeavyHitters.sql("__graft_hh_docs")(SparkDialect)).collect()
    assert(fast.nonEmpty, "fixture corpus should have ≥1/K-support tokens")
    assert(fast.toSeq == exact.toSeq)
  }

  test("pass 2 plans one corpus scan; the shuffle is the collapsed-key aggregate") {
    // sparkPlan, not executedPlan: an unexecuted AdaptiveSparkPlanExec
    // IS its own leaf and hides the scans
    val plan = HeavyHitters.run(spark, sfDir).queryExecution.sparkPlan
    // the rebalance guard serves documents as an RDD relation; either
    // way the final query must hold exactly ONE corpus scan leaf
    val scans = plan.collectWithSubqueries {
      case l if l.children.isEmpty && l.nodeName.contains("Scan") => l
    }
    assert(scans.length == 1,
      s"expected 1 corpus scan, got ${scans.length}: ${plan.toString.take(300)}")
    val tree = plan.toString
    assert(tree.contains("HashAggregate"), tree.take(300))
  }

  test("candidate set is bounded by the sketch size and is a superset") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val toks = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(col("word") =!= "")
    val cands = HeavyHitters.candidates(spark, toks)
    assert(cands.size <= HeavyHitters.SummarySize)
    val hh = HeavyHitters.run(spark, sfDir).collect().map(_.getString(0)).toSet
    assert(hh.subsetOf(cands.toSet))
  }

  test("streaming sketch twin: replayed corpus yields a bounded candidate superset") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark2 = spark
    import spark2.implicits._
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (h1, h2) = docs.splitAt(docs.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamMonitors
      .ingestHeavyHitters(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("append").start()
    val rows = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("hh_stream").collect()
    } finally q.stop()
    val lastEpoch = rows.map(_.getAs[Long]("epoch")).max
    val streamed = rows.filter(_.getAs[Long]("epoch") == lastEpoch)
      .map(_.getString(0)).toSet
    assert(streamed.size <= HeavyHitters.SummarySize)
    val batchHh = HeavyHitters.run(spark, sfDir).collect()
      .map(_.getString(0)).toSet
    assert(batchHh.subsetOf(streamed),
      s"streamed summary lost true heavy hitters: ${batchHh.diff(streamed)}")
  }

  test("a planted heavy token spread across partitions is found") {
    import spark.implicits._
    // 40 partitions, the hot token only 1/8 of each partition's stream —
    // no partition-local majority, only the merged summary sees it
    val rows = (1L to 4000L).map { i =>
      val w = if (i % 8 == 0) "hot" else s"noise_$i"
      (i, w)
    }
    val df = rows.toDF("doc_id", "text").repartition(40)
    df.createOrReplaceTempView("__graft_hh_planted")
    val toks = df.select(col("text").as("word"))
    val cands = HeavyHitters.candidates(spark, toks)
    assert(cands.contains("hot"),
      s"superset guarantee broken: 'hot' (support 1/8 ≥ 1/K) missing from ${cands.size} candidates")
  }
}
