package graft

import org.apache.spark.sql.SparkSession

import graft.oracle.SparkDialect
import graft.pipeline.DomainRank

/** Scale measurement for the [[DomainRank]] power-iteration loop — the
  * claim under test is the scaladoc's "per-iteration shuffle volume is
  * O(nodes), the landed edge relation never re-sorts": wall per point
  * should grow ~linearly in the edge count, and the two join strategies
  * ([[DomainRank.RankBroadcastBound]]'s BROADCAST-below /
  * SHUFFLE_HASH-above election) should cross near the bound.
  *
  * Synthetic host graph: N nodes, 8 draws per node collapsed to a
  * weighted edge relation; 1/4 of draws land in an N/64 hot head so the
  * in-degree distribution is skewed the way real host graphs are (the
  * contribution aggregation must absorb a hub's fan-in through map-side
  * partials, not a single reducer). Both strategies run the identical
  * integer recurrence, so their final mass totals must agree exactly —
  * asserted per point.
  *
  *   SPARK_DRIVER_MEM=48g runMain graft.GraphScaleBench 1048576 4194304 16777216
  */
object GraphScaleBench {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(1L << 20, 1L << 22, 1L << 24)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tunePerf(spark)
    val s1 = Bench.sentinelSec()
    val sp = Bench.parallelSentinelSec(spark, cpus.toInt)

    val Deg = 8
    var landed: Seq[org.apache.spark.sql.DataFrame] = Nil
    def land(n: Long): (String, String, Long) = {
      landed.foreach(_.unpersist()); landed = Nil
      val draws =
        s"""SELECT CAST(id / $Deg AS BIGINT) AS src,
           |       CASE WHEN pmod(xxhash64(id * 13), 4) = 0
           |            THEN pmod(xxhash64(id * 7), ${math.max(n / 64, 1L)})
           |            ELSE pmod(xxhash64(id * 11), $n) END AS dst,
           |       1 + pmod(xxhash64(id * 17), 3) AS w
           |  FROM range(${n * Deg})""".stripMargin
      val edgesDf = spark.sql(
        s"""SELECT e.src, e.dst, e.w, o.out_w FROM (
           |  SELECT src, dst, SUM(w) AS w FROM ($draws) d
           |   WHERE src <> dst GROUP BY src, dst) e
           |JOIN (SELECT src, SUM(w) AS out_w FROM (
           |  SELECT src, dst, SUM(w) AS w FROM ($draws) d
           |   WHERE src <> dst GROUP BY src, dst) e2 GROUP BY src) o
           |  ON o.src = e.src""".stripMargin)
        .localCheckpoint(eager = true)
      edgesDf.createOrReplaceTempView("__gr_edges")
      val nodesDf = spark.sql(s"SELECT id AS site, 1 AS n_docs FROM range($n)")
        .localCheckpoint(eager = true)
      nodesDf.createOrReplaceTempView("__gr_nodes")
      landed = Seq(edgesDf, nodesDf)
      ("__gr_nodes", "__gr_edges", edgesDf.count())
    }

    /** The engine loop verbatim: r0 → 8 × iterSql → total-mass check. */
    def runLoop(nv: String, ev: String, hint: String): (Double, Long) = {
      val t0 = System.nanoTime()
      var prev = "__gr_r0"
      spark.sql(
        s"SELECT site, CAST(${DomainRank.MicroBase} AS BIGINT) AS rank_u FROM $nv")
        .createOrReplaceTempView(prev)
      var prevDf: Option[org.apache.spark.sql.DataFrame] = None
      for (i <- 1 to DomainRank.Iters) {
        val next = s"__gr_r$i"
        val nextDf = spark.sql(DomainRank.iterSql(nv, ev, prev, hint)(SparkDialect))
          .localCheckpoint(eager = true)
        nextDf.createOrReplaceTempView(next)
        prevDf.foreach(_.unpersist())
        prevDf = Some(nextDf)
        prev = next
      }
      val mass = spark.sql(s"SELECT SUM(rank_u) FROM $prev")
        .collect()(0).getLong(0)
      prevDf.foreach(_.unpersist())
      ((System.nanoTime() - t0) / 1e9, mass)
    }

    // UNTIMED warmup of both plan shapes
    { val (nv, ev, _) = land(1L << 14)
      runLoop(nv, ev, "BROADCAST"); runLoop(nv, ev, "SHUFFLE_HASH") }

    val out = new StringBuilder
    ns.foreach { n =>
      val (nv, ev, edges) = land(n)
      val (bSec, bMass) = Seq(1, 2).map(_ => runLoop(nv, ev, "BROADCAST")).minBy(_._1)
      val (hSec, hMass) = Seq(1, 2).map(_ => runLoop(nv, ev, "SHUFFLE_HASH")).minBy(_._1)
      assert(bMass == hMass, "strategies must compute identical integer mass")
      assert(bMass <= n * DomainRank.MicroBase, "mass invariant violated")
      out.append(
        s"""{"n":$n,"edges":$edges,"broadcast_sec":$bSec,""" +
        s""""shuffle_hash_sec":$hSec,"mass":$bMass}\n""")
      println(f"[graph] n=$n edges=$edges broadcast $bSec%.2f s " +
        f"shuffle_hash $hSec%.2f s")
    }
    println(s"""{"sentinel_sec":$s1,"par_sentinel_sec":$sp,"cpus":$cpus}""")
    print(out.result())
    spark.stop()
  }
}
