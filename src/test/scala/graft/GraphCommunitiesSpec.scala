package graft

import graft.oracle.SparkDialect
import graft.pipeline.{DomainRank, GraphCommunities}

/** Weakly-connected communities: the driver-converged label
  * propagation must equal a plain-Scala union-find over the engine's
  * own edge relation, and the community invariants must hold. */
class GraphCommunitiesSpec extends SparkSpec {

  private def docsView(): String = {
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__gc_docs")
    "__gc_docs"
  }

  private def nSrc(): Long =
    spark.sql(s"SELECT COUNT(DISTINCT source) FROM ${docsView()}")
      .collect()(0).getLong(0)

  test("communities equal a plain-Scala union-find over the engine's graph") {
    val edges = spark.sql(
      DomainRank.edgesSql(docsView(), Some(nSrc()))(SparkDialect))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val out = GraphCommunities.runCommunities(spark, sfDir).collect()
    assert(out.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.Ordering.String.max(ra, rb)) = math.Ordering.String.min(ra, rb)
    }
    out.foreach(r => find(r.getString(0))) // seed every site
    edges.foreach { case (a, b) => union(a, b) }
    val expectedComp = out.map(_.getString(0)).map(s => s -> find(s)).toMap
    val sizes = expectedComp.values.groupBy(identity).map { case (c, m) => c -> m.size }
    out.foreach { r =>
      assert(r.getString(1) == expectedComp(r.getString(0)),
        s"community mismatch for ${r.getString(0)}")
      assert(r.getLong(2) == sizes(r.getString(1)).toLong)
      assert((r.getInt(3) == 1) == (r.getString(0) == r.getString(1)))
    }
  }

  test("community id is the minimum member and every community has one rep") {
    val out = GraphCommunities.runCommunities(spark, sfDir).collect()
    val byComm = out.groupBy(_.getString(1))
    byComm.foreach { case (cid, members) =>
      assert(members.map(_.getString(0)).min == cid)
      assert(members.count(_.getInt(3) == 1) == 1)
      assert(members.forall(_.getLong(2) == members.length.toLong))
    }
  }

  test("memoized component view: a second run is bit-identical") {
    val a = GraphCommunities.runCommunities(spark, sfDir).collect().toSeq
    val b = GraphCommunities.runCommunities(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
