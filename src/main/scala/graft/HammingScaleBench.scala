package graft

import org.apache.spark.sql.SparkSession

/** Scale measurement for the 64-bit hamming candidate-scheme election
  * (VERDICT r13 #5 + advisor follow-up): runs BOTH schemes — the 4×16
  * pigeonhole bands and the AG(3,2) 14-hyperplane cover — over a
  * synthetic (id, hash) relation at several corpus sizes, timing each
  * and counting the candidate pairs each scheme admits. Hashes only,
  * no payloads (the media entries never shuffle payloads either), so
  * multi-million-id points are cheap to generate: base hashes are
  * `xxhash64(id)` (uniform 64-bit), and every 64th id plants a
  * hamming-3 variant whose dirty bits span three different byte-bands
  * (the cover's worst case) — both schemes must recover exactly the
  * planted pairs, asserted per point.
  *
  * Emits one JSON line per (n, scheme): wall seconds (min-of-2),
  * candidate-pair count, verified-pair count, plus both machine
  * sentinels so a calm-window comparison is machine-adjudicated
  * (scripts/bench_compare.py's reading order).
  *
  *   SPARK_GRAFT_CPUS=32 runMain graft.HammingScaleBench 1048576 2097152 4194304
  */
object HammingScaleBench {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(1L << 20, 1L << 21, 1L << 22)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.tunePerf(spark)
    // HAM_NO_BROADCAST=1: force shuffled joins — isolates the
    // auto-broadcast plan flip when the hash relation fits under the
    // threshold (a 14M-row exploded band side broadcast-builds on ONE
    // thread, which can cost more than the shuffle it avoids)
    if (sys.env.get("HAM_NO_BROADCAST").contains("1"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val s1 = Bench.sentinelSec()
    val sp = Bench.parallelSentinelSec(spark, cpus.toInt)
    // UNTIMED warmup of BOTH schemes at a small n: the first execution
    // of each plan shape carries its whole-stage-codegen + JIT warmup,
    // which polluted the r14 first cut (the cover "cost" 11.3 s at 1M
    // ids but 5.5 s at 2M — impossible on real scaling; the 1M point
    // was the cover's first-ever execution)
    spark.sql(
      s"""SELECT id, xxhash64(id) AS h FROM range(65536)""")
      .localCheckpoint(eager = true).createOrReplaceTempView("__ham_warm")
    Seq(1L, graft.pipeline.Multimodal.HammingElectBound + 1).foreach { f =>
      spark.sql(graft.pipeline.Multimodal
        .hammingPairsSql("__ham_warm", "h", f)).count()
    }
    spark.catalog.dropTempView("__ham_warm")
    val out = new StringBuilder
    ns.foreach { n =>
      // base ids [0, n); planted variants live at [n, n + n/64) with
      // hash = base ^ bits 2|21|58 (bands 0, 2, 7 — no two share a band)
      val nPlant = n / 64
      spark.sql(
        s"""SELECT id, xxhash64(id) AS h FROM range($n)
           |UNION ALL
           |SELECT id + $n AS id,
           |       xxhash64(id) ^ ${(1L << 2) | (1L << 21) | (1L << 58)}L AS h
           |  FROM range(0, $n, 64)""".stripMargin)
        .localCheckpoint(eager = true)
        .createOrReplaceTempView("__ham_bench")
      // the band scheme's candidate mass is ~4·N²/2¹⁶ (measured ×4.0
      // per doubling); past 2M ids it GC-thrashes a 24 GiB JVM, so the
      // bench extrapolates instead of running it (cap overridable)
      val bandsMax = sys.env.get("HAM_BANDS_MAX").map(_.toLong)
        .getOrElse(1L << 21)
      val schemes =
        (if (n <= bandsMax) Seq(("bands_4x16", 1L)) else Seq.empty) :+
        (("ag_cover_14", graft.pipeline.Multimodal.HammingElectBound + 1))
      schemes.foreach { case (scheme, force) =>
          def once(): (Double, Long) = {
            val t0 = System.nanoTime()
            val got = spark.sql(graft.pipeline.Multimodal
              .hammingPairsSql("__ham_bench", "h", force)).count()
            ((System.nanoTime() - t0) / 1e9, got)
          }
          val (t1, got1) = once(); val (t2, got2) = once()
          assert(got1 == got2)
          // every planted pair must verify at hamming 3; collisions in
          // the uniform remainder can only ADD pairs, so >= is the
          // correctness floor (equality holds unless xxhash64 collides)
          assert(got1 >= nPlant,
            s"$scheme at n=$n recovered $got1 < $nPlant planted pairs")
          val cands = spark.sql(
            s"""WITH ${graft.pipeline.Multimodal
                 .hammingCandsCtes("__ham_bench", "h", force)}
               |SELECT COUNT(*) FROM cands""".stripMargin)
            .collect()(0).getLong(0)
          out.append(
            s"""{"n":$n,"scheme":"$scheme","sec":${math.min(t1, t2)},""" +
            s""""cand_pairs":$cands,"verified_pairs":$got1,""" +
            s""""planted":$nPlant}\n""")
          println(f"[hamming] n=$n $scheme%-12s min ${math.min(t1, t2)}%.2f s " +
            f"cands=$cands verified=$got1")
        }
      spark.catalog.dropTempView("__ham_bench")
    }
    println(s"""{"sentinel_sec":$s1,"par_sentinel_sec":$sp,"cpus":$cpus}""")
    print(out.result())
    spark.stop()
  }
}
