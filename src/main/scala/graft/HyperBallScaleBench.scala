package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.Harmonic

/** Scale measurement for the [[Harmonic.hyperBall]] sketch loop — the
  * claim under test is the scaladoc's "per-hop cost is one equi-join +
  * one node-grain aggregation, state O(V·sketch) whatever the edge
  * count": wall per point should grow ~linearly in nodes at fixed
  * degree, and the returned ball estimates must stay plausible (mean
  * ball ≥ 1 + out-degree lower bound is NOT guaranteed on a directed
  * skewed graph, so the asserted invariants are the cheap exact ones:
  * every ball ≥ 1, determinism across the two timed runs).
  *
  * Same synthetic skewed host graph as [[GraphScaleBench]] (8 draws
  * per node, 1/4 into an N/64 hot head) so the two artifacts compose.
  *
  *   SPARK_DRIVER_MEM=48g runMain graft.HyperBallScaleBench 1048576 4194304
  */
object HyperBallScaleBench {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(1L << 20, 1L << 22)
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
    def land(n: Long): Long = {
      landed.foreach(_.unpersist()); landed = Nil
      val draws =
        s"""SELECT CAST(id / $Deg AS BIGINT) AS src,
           |       CASE WHEN pmod(xxhash64(id * 13), 4) = 0
           |            THEN pmod(xxhash64(id * 7), ${math.max(n / 64, 1L)})
           |            ELSE pmod(xxhash64(id * 11), $n) END AS dst
           |  FROM range(${n * Deg})""".stripMargin
      val ep = spark.sql(
        s"""SELECT DISTINCT src, dst FROM ($draws) d
           | WHERE src <> dst""".stripMargin)
        .localCheckpoint(eager = true)
      ep.createOrReplaceTempView("__hb_ep")
      val nodes = spark.sql(s"SELECT id AS site, 1 AS n_docs FROM range($n)")
        .localCheckpoint(eager = true)
      nodes.createOrReplaceTempView("__hb_nodes")
      landed = Seq(ep, nodes)
      ep.count()
    }

    // sketch resolution is THE scale knob: lgK=12 ≈ 1.6% error at
    // 2 KB dense, lgK=8 ≈ 6.5% at 128 B — per-hop bytes scale with it
    val lgK = sys.env.getOrElse("SPARK_GRAFT_HB_LGK", Harmonic.LgK.toString).toInt
    def run(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val out = Harmonic.hyperBall(spark, "__hb_nodes", "__hb_ep", lgK)
      val agg = out.selectExpr(
        "SUM(ball_est) AS balls", "SUM(harmonic_est_micro) AS h",
        "MIN(ball_est) AS mn").collect()(0)
      assert(agg.getLong(2) >= 1L, "a ball estimate fell below the self-ball")
      ((System.nanoTime() - t0) / 1e9, agg.getLong(0), agg.getLong(1))
    }

    // UNTIMED warmup of the plan shape
    { land(1L << 14); run() }

    val out = new StringBuilder
    ns.foreach { n =>
      val edges = land(n)
      val (aSec, aBalls, aH) = run()
      val (bSec, bBalls, bH) = run()
      // dense-regime sketches are merge-order-dependent within the
      // HLL error bound (exact determinism holds only in the coupon
      // regime — HarmonicSpec pins that at fixture scale); the two
      // runs must agree to well inside lgK=12's ~1.6% std error
      val drift = math.abs(aBalls - bBalls).toDouble / aBalls
      assert(drift < 0.01, f"run-to-run ball drift $drift%.4f exceeds HLL error")
      val sec = math.min(aSec, bSec)
      out.append(
        s"""{"n":$n,"edges":$edges,"lgk":$lgK,"hyperball_sec":$sec,""" +
        s""""ball_sum":$aBalls,"harmonic_sum_micro":$aH}\n""")
      println(f"[hyperball] n=$n edges=$edges $sec%.2f s ball_sum=$aBalls")
    }
    println(s"""{"sentinel_sec":$s1,"par_sentinel_sec":$sp,"cpus":$cpus}""")
    print(out.result())
    spark.stop()
  }
}
