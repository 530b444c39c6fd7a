package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.Dedup

/** Scale measurement for the EXACT co-shingle intersection relation —
  * the `dedup_jaccard` / `dedup_containment` shape whose 11–14×
  * sf1→sf10 hop is adjudicated in SCALING.md as a FIXTURE-VOCABULARY
  * artifact (the driver fixture's 31-word vocabulary collides the
  * 5-gram shingle space, so nearly every shingle is a ≤50-doc hub and
  * the hub-bounded intersection carries maximal constant mass). This
  * bench measures the same pipeline — the verbatim shingle → hub-cutoff
  * → inverted-index intersection → Jaccard verify chain from
  * [[Dedup]] — over synthetic corpora with a REALISTIC vocabulary
  * (2¹⁸ content words + a 64-word stopword head at 20% of positions,
  * so all-stopword shingles still exercise the hub cutoff the way real
  * boilerplate does), with a planted near-duplicate per 64 docs
  * (~2% word flips → 5-gram Jaccard ≈ 0.8).
  *
  * If the adjudication is right, the exact relation's wall and row
  * counts scale ~linearly here — the quadratic-looking fixture hop is
  * the vocabulary, not the operator. Emits one JSON line per corpus
  * size plus the machine sentinels.
  *
  *   SPARK_DRIVER_MEM=48g runMain graft.JaccardScaleBench 65536 262144 1048576
  */
object JaccardScaleBench {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(1L << 16, 1L << 18, 1L << 20)
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

    val V = 1 << 18   // content vocabulary
    val W = 100       // words per document
    // word at (docBase, pos): 20% stopword head (64 words), else content
    def word(base: String, p: String) =
      s"""CASE WHEN pmod(xxhash64($base * 1000003 + $p), 5) = 0
         |     THEN concat('s', pmod(xxhash64($base * 611 + $p), 64))
         |     ELSE concat('w', pmod(xxhash64($base * 401 + $p), $V)) END""".stripMargin
    // word expressions expanded driver-side (no higher-order-function
    // lambdas: localCheckpoint fails to re-bind lambda variables over a
    // union-of-range plan — "key not found: id#N" — while the same
    // expressions as plain projections checkpoint fine)
    def docsSql(n: Long): String = {
      val base = (0 until W).map(p => word("id", p.toString)).mkString(",\n         ")
      val plant = (0 until W).map { p =>
        s"""CASE WHEN pmod(xxhash64(id * 7919 + $p), 50) = 0
           |     THEN concat('x', pmod(xxhash64(id * 31 + $p), $V))
           |     ELSE ${word("id", p.toString)} END""".stripMargin
      }.mkString(",\n         ")
      s"""SELECT id AS doc_id, concat_ws(' ',
         |         $base) AS text
         |  FROM range($n)
         |UNION ALL
         |SELECT id + $n AS doc_id, concat_ws(' ',
         |         $plant) AS text
         |  FROM range(0, $n, 64)""".stripMargin
    }

    // UNTIMED warmup of the plan shapes
    runPoint(spark, docsSql(4096), 4096 / 64, warm = true)

    val out = new StringBuilder
    ns.foreach { n =>
      val nPlant = n / 64
      val (sec, interRows, verified, caught) =
        Seq(1, 2).map { _ =>
          runPoint(spark, docsSql(n), nPlant, warm = false)
        }.minBy(_._1)
      assert(caught <= nPlant)
      out.append(
        s"""{"n":$n,"sec":$sec,"inter_rows":$interRows,""" +
        s""""verified_pairs":$verified,"planted":$nPlant,""" +
        s""""planted_recall":${caught.toDouble / nPlant}}\n""")
      println(f"[jaccard] n=$n min $sec%.2f s inter=$interRows " +
        f"verified=$verified recall=${caught.toDouble / nPlant}%.4f")
    }
    println(s"""{"sentinel_sec":$s1,"par_sentinel_sec":$sp,"cpus":$cpus}""")
    print(out.result())
    spark.stop()
  }

  /** One full cold run of the dedup_jaccard chain (the mat() sequence of
    * [[Dedup.registerShingleRels]] + [[Dedup.runJaccard]]'s verify, SQL
    * verbatim): shingles → ≤50-hub cutoff → sizes → exact intersection →
    * Jaccard ≥ 0.5. Returns (wall s, intersection rows, verified pairs,
    * planted pairs caught). */
  private def runPoint(spark: SparkSession, docsSql: String, nPlant: Long,
                       warm: Boolean): (Double, Long, Long, Long) = {
    import org.apache.spark.sql.DataFrame
    spark.sql(docsSql).localCheckpoint(eager = true)
      .createOrReplaceTempView("__jac_docs")
    val t0 = System.nanoTime()
    def mat(name: String, sql: String): DataFrame = {
      val df = spark.sql(sql).localCheckpoint(eager = true)
      df.createOrReplaceTempView(name)
      df
    }
    mat("__jac_sh", Dedup.shinglesSparkSql("__jac_docs"))
    mat("__jac_shf",
      s"""SELECT s.id, s.shingle FROM __jac_sh s
         |JOIN (SELECT shingle FROM __jac_sh
         |       GROUP BY shingle HAVING COUNT(*) <= 50) ok
         |  ON s.shingle = ok.shingle""".stripMargin)
    mat("__jac_sizes",
      "SELECT id, COUNT(*) AS sz FROM __jac_shf GROUP BY id")
    val inter = mat("__jac_inter",
      s"""SELECT a.id AS doc_a, b.id AS doc_b, COUNT(*) AS ict
         |  FROM __jac_shf a JOIN __jac_shf b
         |    ON a.shingle = b.shingle AND a.id < b.id
         | GROUP BY a.id, b.id""".stripMargin)
    val res = spark.sql(
      Dedup.jaccardBody("__jac_inter", "__jac_sizes", 0.5))
      .localCheckpoint(eager = true)
    val verified = res.count()
    val sec = (System.nanoTime() - t0) / 1e9
    res.createOrReplaceTempView("__jac_res")
    val caught =
      if (warm) 0L
      else spark.sql(
        s"""SELECT COUNT(*) FROM __jac_res
           | WHERE doc_b = doc_a + ${nPlant * 64} AND doc_a % 64 = 0"""
          .stripMargin).collect()(0).getLong(0)
    val interRows = inter.count()
    Seq("__jac_docs", "__jac_sh", "__jac_shf", "__jac_sizes",
      "__jac_inter", "__jac_res").foreach(spark.catalog.dropTempView)
    (sec, interRows, verified, caught)
  }
}
