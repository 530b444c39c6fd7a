package graft

import org.apache.spark.sql.SparkSession

import graft.oracle.SparkDialect
import graft.pipeline.{Dedup, Similarity}

/** Scale measurement for the adaptive sign-LSH blocking election
  * (SCALING.md round 13b/14): runs the SHIPPED embedding-dedup builders
  * — [[Dedup.embeddingLshSql]] (single bucket table, the occupancy half
  * of the (np, R) knob) and [[Dedup.embeddingStackSql]] (3 disjoint-
  * plane tables, the recall half) — over a synthetic vector relation at
  * multi-million-id corpus sizes, timing each and measuring RECALL of
  * planted near-duplicate pairs at the elected resolution.
  *
  * Synthetic corpus: 64-dim vectors with uniform components derived
  * row-locally from `xxhash64` (no data files, no payload shuffle to
  * generate); every 64th id plants a near-duplicate `v + 0.05·w`
  * (w an independent uniform vector), i.e. cosine ≈ 0.9988 and
  * plane-split angle θ ≈ 0.05 rad. At the verify gate 0.95 a random
  * candidate pair (cos ~ N(0, 1/64)) is ~7.6σ from passing, so the
  * verified set IS the caught planted set — `verified / planted` is the
  * measured pair recall, per scheme, at every corpus size:
  *
  *  - single table: recall ≈ (1 − θ/π)^np falls as the election raises
  *    np with log2(N) to pin occupancy — the documented trade;
  *  - R=3 stack: miss probability cubes, recall ≈ 1 − (1 − r₁)³ —
  *    the mechanism `decontaminate_semantic` ships.
  *
  * Emits one JSON line per (n, scheme) plus both machine sentinels
  * (scripts/bench_compare.py's reading order).
  *
  *   SPARK_DRIVER_MEM=48g runMain graft.LshScaleBench 1048576 4194304 16777216
  */
object LshScaleBench {
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

    // uniform [-0.5, 0.5) component from a 64-bit hash — row-local, no
    // data generation pass; Long.Min/MaxValue spans 2^64 exactly
    def comp(seed: String) =
      s"xxhash64($seed) / 1.8446744073709552e19"
    def vecSql(n: Long): String =
      s"""SELECT id AS vec_id,
         |       transform(sequence(0, 63),
         |                 j -> CAST(${comp("id * 64 + j")} AS FLOAT)) AS embedding
         |  FROM range($n)
         |UNION ALL
         |SELECT id + $n AS vec_id,
         |       transform(sequence(0, 63),
         |                 j -> CAST(${comp("id * 64 + j")}
         |                         + 0.05 * (${comp("(id + 7919) * 64 + j")})
         |                           AS FLOAT)) AS embedding
         |  FROM range(0, $n, 64)""".stripMargin

    // UNTIMED warmup of both plan shapes (the HammingScaleBench lesson:
    // first execution of a plan shape carries its codegen + JIT warmup)
    spark.sql(vecSql(4096)).localCheckpoint(eager = true)
      .createOrReplaceTempView("__lsh_warm")
    spark.sql(Dedup.embeddingLshSql("__lsh_warm", threshold = 0.95,
      nOverride = Some(4096 + 64))(SparkDialect)).count()
    spark.sql(Dedup.embeddingStackSql("__lsh_warm", threshold = 0.95,
      nOverride = Some(4096 + 64))(SparkDialect)).count()
    spark.catalog.dropTempView("__lsh_warm")

    val out = new StringBuilder
    ns.foreach { n =>
      val nPlant = n / 64
      val count = n + nPlant
      spark.sql(vecSql(n)).localCheckpoint(eager = true)
        .createOrReplaceTempView("__lsh_bench")

      // single table — the dedup_embedding_lsh entry's exact builder
      val npSingle = Integer.numberOfTrailingZeros(
        Similarity.adaptiveModFor(count, occ = 8))
      def onceSingle(): (Double, Long) = {
        val t0 = System.nanoTime()
        val got = spark.sql(Dedup.embeddingLshSql("__lsh_bench",
          threshold = 0.95, nOverride = Some(count))(SparkDialect)).count()
        ((System.nanoTime() - t0) / 1e9, got)
      }
      val (t1, got1) = onceSingle(); val (t2, got2) = onceSingle()
      assert(got1 == got2)
      assert(got1 <= nPlant,
        s"single at n=$n verified $got1 > $nPlant planted — gate leak")
      out.append(
        s"""{"n":$n,"scheme":"single","np":$npSingle,"sec":${math.min(t1, t2)},""" +
        s""""verified_pairs":$got1,"planted":$nPlant,""" +
        s""""recall":${got1.toDouble / nPlant}}\n""")
      println(f"[lsh] n=$n single   np=$npSingle min ${math.min(t1, t2)}%.2f s " +
        f"recall=${got1.toDouble / nPlant}%.4f")

      // R=3 stack — the decontaminate_semantic / dedup_embedding_stack
      // builder; pairs_cumulative(R) / planted is per-R recall
      val npTable = Integer.numberOfTrailingZeros(
        Similarity.adaptiveModFor(count, occ = 8,
          maxP = Dedup.StackPlanesPerTable))
      def onceStack(): (Double, Seq[(Int, Long)]) = {
        val t0 = System.nanoTime()
        val rows = spark.sql(Dedup.embeddingStackSql("__lsh_bench",
          threshold = 0.95, nOverride = Some(count))(SparkDialect))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (st1, cum1) = onceStack(); val (st2, cum2) = onceStack()
      assert(cum1 == cum2)
      cum1.foreach { case (r, cum) =>
        assert(cum <= nPlant,
          s"stack R=$r at n=$n verified $cum > $nPlant planted — gate leak")
      }
      val cumJson = cum1.map { case (r, c) =>
        s""""r$r":{"pairs":$c,"recall":${c.toDouble / nPlant}}"""
      }.mkString(",")
      out.append(
        s"""{"n":$n,"scheme":"stack3","np_per_table":$npTable,""" +
        s""""sec":${math.min(st1, st2)},"planted":$nPlant,$cumJson}\n""")
      println(f"[lsh] n=$n stack3   np=$npTable min ${math.min(st1, st2)}%.2f s " +
        f"recall(R=3)=${cum1.last._2.toDouble / nPlant}%.4f")
      spark.catalog.dropTempView("__lsh_bench")
    }
    println(s"""{"sentinel_sec":$s1,"par_sentinel_sec":$sp,"cpus":$cpus}""")
    print(out.result())
    spark.stop()
  }
}
