package graft

import graft.oracle.SparkDialect
import graft.pipeline.{CoCitation, DomainRank}

/** Co-citation similarity: the engine relation must equal a plain-Scala
  * recompute over the engine's own edge relation, and the hub cutoff
  * must actually cut (exercised on a planted-hub relation — the
  * fixture's sources sit below the bound). */
class CoCitationSpec extends SparkSpec {

  private def docsView(): String = {
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__cc_docs")
    "__cc_docs"
  }

  private def nSrc(): Long =
    spark.sql(s"SELECT COUNT(DISTINCT source) FROM ${docsView()}")
      .collect()(0).getLong(0)

  test("pair relation equals a plain-Scala recompute over the engine's graph") {
    val ep = spark.sql(
      DomainRank.edgesSql(docsView(), Some(nSrc()))(SparkDialect))
      .collect().map(r => (r.getString(0), r.getString(1))).distinct
    val bySrc = ep.groupBy(_._1)
    val kept = bySrc.filter(_._2.length <= CoCitation.HubOutDegree)
    val ind = kept.values.flatten.groupBy(_._2).map { case (d, es) => d -> es.size }
    val cocite = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    kept.values.foreach { es =>
      val ds = es.map(_._2).sorted
      for (i <- ds.indices; j <- i + 1 until ds.length)
        cocite((ds(i), ds(j))) += 1
    }
    val expected = cocite.filter(_._2 >= CoCitation.MinCocite)
    val out = CoCitation.runCocitation(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.length == expected.size)
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val ct = expected(key)
      assert(r.getLong(2) == ct, s"cocite mismatch for $key")
      val (ia, ib) = (ind(key._1).toLong, ind(key._2).toLong)
      assert(r.getLong(3) == ia && r.getLong(4) == ib)
      assert(r.getLong(5) == ct * CoCitation.MicroBase / (ia + ib - ct))
      assert(r.getLong(6) == 0L, "fixture has no hub sources")
    }
  }

  test("hub cutoff excludes a planted mega-source and reports it") {
    // 1 hub citing 300 sites + 3 normal sources citing overlapping pairs
    val rows =
      (1 to 300).map(i => ("hub", s"s$i")) ++
      Seq(("a", "s1"), ("a", "s2"), ("b", "s1"), ("b", "s2"),
          ("c", "s1"), ("c", "s2"), ("c", "s3"))
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("src", "dst").createOrReplaceTempView("__cc_planted")
    val out = spark.sql(
      s"WITH ${graft.pipeline.CoCitation.cocitationTail("__cc_planted")(SparkDialect)}")
      .collect()
    // hub contributes no pairs: only (s1,s2) from a,b,c survives
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == ("s1", "s2"))
    assert(r.getLong(2) == 3)      // a, b, c co-cite
    assert(r.getLong(3) == 3 && r.getLong(4) == 3) // hub-filtered in-degrees
    assert(r.getLong(5) == 3L * CoCitation.MicroBase / 3L)
    assert(r.getLong(6) == 1L, "the cutoff must report the planted hub")
  }

  test("jaccard bounds and ordering hold on the fixture relation") {
    val out = CoCitation.runCocitation(spark, sfDir).collect()
    assert(out.forall(r => r.getLong(5) >= 0 && r.getLong(5) <= 1000000L))
    val cts = out.map(_.getLong(2)).toSeq
    assert(cts == cts.sortBy(-_: Long), "rows must order by cocite_ct desc")
    assert(out.forall(r => r.getLong(2) <= math.min(r.getLong(3), r.getLong(4))))
  }
}
