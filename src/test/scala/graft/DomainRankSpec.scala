package graft

import graft.oracle.SparkDialect
import graft.pipeline.DomainRank

/** Link-graph domain rank: the unrolled SQL power iteration must match
  * the same integer recurrence run in plain Scala over the engine's own
  * edge relation — bit-identical, not approximately. */
class DomainRankSpec extends SparkSpec {

  private def docsView(): String = {
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__dr_docs")
    "__dr_docs"
  }

  private def docSiteSql(): String =
    DomainRank.siteExpr("doc_id", "source")(SparkDialect)

  private def nSrc(): Long =
    spark.sql(s"SELECT COUNT(DISTINCT source) FROM ${docsView()}")
      .collect()(0).getLong(0)

  test("rank equals the integer recurrence over the engine's own graph") {
    val edges = spark.sql(
      DomainRank.edgesSql(docsView(), Some(nSrc()))(SparkDialect))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val out = DomainRank.runDomainRank(spark, sfDir).collect()
    val nodes = out.map(_.getString(0))
    assert(nodes.nonEmpty && edges.nonEmpty)

    var rank = nodes.map(_ -> DomainRank.MicroBase).toMap
    for (_ <- 1 to DomainRank.Iters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      edges.foreach { case (src, dst, w, outW) =>
        contrib(dst) += rank(src) * w / outW
      }
      rank = nodes.map(n =>
        n -> (DomainRank.Teleport + DomainRank.DampPct * contrib(n) / 100)).toMap
    }
    out.foreach { r =>
      assert(r.getLong(4) == rank(r.getString(0)),
        s"rank mismatch for ${r.getString(0)}")
    }
  }

  test("graph shape: no self-edges, pruned dangling targets, consistent out-weights") {
    val edges = spark.sql(
      DomainRank.edgesSql(docsView(), Some(nSrc()))(SparkDialect))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val sites = DomainRank.runDomainRank(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    assert(edges.forall { case (s, d, _, _) => s != d })
    assert(edges.forall { case (_, d, _, _) => sites.contains(d) })
    edges.groupBy(_._1).foreach { case (_, es) =>
      assert(es.map(_._3).sum == es.head._4)
      assert(es.map(_._4).distinct.length == 1)
    }
  }

  test("mass invariants: teleport floor holds, total mass never exceeds the start") {
    val out = DomainRank.runDomainRank(spark, sfDir).collect()
    assert(out.forall(_.getLong(4) >= DomainRank.Teleport))
    assert(out.map(_.getLong(4)).sum <= out.length * DomainRank.MicroBase)
    // the ordering is the point of the report: the top site must
    // actually be cited, and ranks must not be degenerate-uniform
    assert(out.head.getLong(3) > 0, "top-ranked site has no in-links")
    assert(out.map(_.getLong(4)).distinct.length > 1)
  }

  test("landed graph memoizes: a second run is bit-identical") {
    val a = DomainRank.runDomainRank(spark, sfDir).collect().toSeq
    val b = DomainRank.runDomainRank(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("rank budget: allocation proportional, floored, capped; kept set exact") {
    val out = DomainRank.runRankBudget(spark, sfDir).collect()
    assert(out.nonEmpty)
    val totalDocs = out.map(_.getLong(1)).sum
    val sumRank = out.map(_.getLong(2)).sum
    val b = totalDocs * DomainRank.BudgetPct / 100
    out.foreach { r =>
      val (nDocs, rankU, alloc, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val expected = math.min(nDocs,
        math.max(DomainRank.FloorDocs, rankU * b / sumRank))
      assert(alloc == expected, s"alloc mismatch for ${r.getString(0)}")
      // every site has at least `alloc` docs by construction, so the
      // kept count is exactly the allocation
      assert(kept == alloc)
    }
    // the budget actually bites: some site is capped below its doc count
    assert(out.exists(r => r.getLong(3) < r.getLong(1)))
    // and rank moves allocation: kept share is not uniform across sites
    assert(out.map(r => r.getLong(3) * 100 / r.getLong(1)).distinct.length > 1)
  }

  test("rank budget kept-id checksum matches a plain-Scala recompute") {
    val out = DomainRank.runRankBudget(spark, sfDir).collect()
    val docs = spark.sql(
      s"""SELECT doc_id,
         |       ${docSiteSql()} AS site,
         |       SUBSTRING(MD5('rankbudget:' || CAST(doc_id AS STRING)), 1, 16) AS prio
         |  FROM ${docsView()}""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bySite = docs.groupBy(_._2)
    out.foreach { r =>
      val kept = bySite(r.getString(0)).sortBy(t => (t._3, t._1))
        .take(r.getLong(3).toInt)
      assert(kept.map(_._1).sum == r.getLong(5),
        s"kept-id sum mismatch for ${r.getString(0)}")
    }
  }

  test("streaming rank annotation replays to the batch budget relation") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val budget = DomainRank.runRankBudget(spark, sfDir)
      .localCheckpoint(true)
    val docRows = graft.core.Tables.load(spark2, sfDir, "documents",
        parallelize = false)
      .selectExpr("doc_id", "source").as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamMonitors.ingestDomainRank(
        in.toDF().toDF("doc_id", "source"), budget)
      .writeStream.format("memory").queryName("dr_stream")
      .outputMode("append").start()
    val out = try {
      in.addData(docRows.take(docRows.size / 2): _*); q.processAllAvailable()
      in.addData(docRows.drop(docRows.size / 2): _*); q.processAllAvailable()
      spark.table("dr_stream")
        .select("doc_id", "site", "rank_micro", "alloc_docs")
        .as[(Long, String, Long, Long)].collect().toSeq
    } finally q.stop()
    // every doc annotated exactly once, with its batch site + budget
    assert(out.size == docRows.size)
    val siteOf = spark.sql(
      s"""SELECT doc_id, ${docSiteSql()} AS site FROM ${docsView()}""")
      .as[(Long, String)].collect().toMap
    val batch = budget.collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    out.foreach { case (id, site, rank, alloc) =>
      assert(site == siteOf(id))
      assert((rank, alloc) == batch(site))
    }
  }

  test("streaming rank annotation keeps novel-domain docs with null rank") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val budget = DomainRank.runRankBudget(spark, sfDir)
      .localCheckpoint(true)
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamMonitors.ingestDomainRank(
        in.toDF().toDF("doc_id", "source"), budget)
      .writeStream.format("memory").queryName("dr_novel_stream")
      .outputMode("append").start()
    val rows = try {
      // a source the batch graph has never seen -> an unseen site key
      in.addData((999999999L, "never-crawled-source"))
      q.processAllAvailable()
      spark.table("dr_novel_stream").collect()
    } finally q.stop()
    assert(rows.length == 1, "novel-domain doc must NOT be dropped")
    assert(rows.head.getLong(0) == 999999999L)
    assert(rows.head.isNullAt(2) && rows.head.isNullAt(3),
      "novel domain carries null rank/alloc for the sink's cold-start policy")
  }

  test("iterated engine loop equals the oracle's one-statement unrolled form") {
    val oneShot = spark.sql(
      DomainRank.domainRankSql(docsView(), Some(nSrc()))(SparkDialect))
      .collect().toSeq
    val looped = DomainRank.runDomainRank(spark, sfDir).collect().toSeq
    assert(looped == oneShot)
  }
}
