package graft

/** Round-12 operators: PSI drift, chi-square homogeneity drift, and the
  * encoding-health (mojibake) screen. */
class DriftOpsSpec extends SparkSpec {

  test("psi drift: terms recompute from raw counts, total closes, signs") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.profiling.PsiDrift.run(spark, sfDir)
      .select("bucket", "ct_a", "ct_b", "psi_term_nano", "psi_nano_total")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length > 3, "need a multi-bucket value domain")
    // every PSI term is non-negative: (p-q) and ln(p/q) share sign
    rows.foreach { r => assert(r._4 >= 0L, s"negative term at bucket ${r._1}") }
    assert(rows.map(_._5).distinct.length == 1)
    assert(rows.head._5 == rows.map(_._4).sum, "total must be the term sum")
    // recompute each term naively from the counts the row itself carries
    val na = rows.map(_._2).sum; val nb = rows.map(_._3).sum
    val nbk = rows.length.toLong
    rows.foreach { case (bkt, ca, cb, nano, _) =>
      val pa = (ca + 1).toDouble / (na + nbk)
      val pb = (cb + 1).toDouble / (nb + nbk)
      val expect = math.round((pa - pb) * math.log(pa / pb) * 1e9)
      assert(nano == expect, s"bucket $bkt term $nano != naive $expect")
    }
    // buckets partition the corpus
    val total = graft.core.Tables.load(spark, sfDir, "lineitem").count()
    assert(na + nb == total)
  }

  test("psi drift plans one corpus scan; windows run over the bucket relation") {
    val p = graft.profiling.PsiDrift.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 1, s"psi re-scans the corpus: $scans scans")
  }

  test("chisq drift: cells recompute, marginals consistent, total closes") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.profiling.ChisqDrift.run(spark, sfDir)
      .select("category", "slice", "observed_ct", "expected_micro",
        "chisq_term_micro", "chisq_micro_total")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).distinct.sorted.toSeq == Seq("fulfilled", "open"))
    assert(rows.length == rows.map(_._1).distinct.length * 2,
      "every category must carry both slices on this fixture")
    assert(rows.map(_._6).distinct.length == 1)
    assert(rows.head._6 == rows.map(_._5).sum, "total must be the term sum")
    rows.foreach { r => assert(r._5 >= 0L, "chi-square terms are squares") }
    // recompute from the observed contingency table
    val o = rows.map(r => (r._1, r._2) -> r._3).toMap
    val n = rows.map(_._3).sum
    val rt = rows.groupBy(_._1).map { case (c, g) => c -> g.map(_._3).sum }
    val ct = rows.groupBy(_._2).map { case (s, g) => s -> g.map(_._3).sum }
    rows.foreach { case (c, s, obs, expMicro, termMicro, _) =>
      val e = rt(c).toDouble * ct(s) / n
      assert(expMicro == math.round(e * 1e6), s"expected drifted at ($c,$s)")
      val num = (obs * n - rt(c) * ct(s)).toDouble
      val expect = math.round(num * num / (rt(c).toDouble * ct(s) * n) * 1e6)
      assert(termMicro == expect, s"term drifted at ($c,$s)")
    }
  }

  test("encoding screen: exactly the injected residues fire, counts exact") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.pipeline.EncodingScreen.run(spark, sfDir)
      .select("doc_id", "repl_ct", "ctrl_ct", "zerowidth_ct", "mojibake_ct",
        "is_suspect")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._6), "output is the suspect set")
    val ids = graft.core.Tables.load(spark, sfDir, "documents")
      .select($"doc_id").as[Long].collect()
    assert(rows.map(_._1).toSet == ids.filter(_ % 13 <= 3).toSet,
      "flagged set must be exactly the injected residues")
    rows.foreach { case (id, repl, ctrl, zw, moji, _) =>
      (id % 13) match {
        case 0 => assert((repl, ctrl, zw, moji) == ((2L, 0L, 0L, 0L)), s"doc $id")
        case 1 => assert((repl, ctrl, zw, moji) == ((0L, 0L, 0L, 3L)), s"doc $id")
        case 2 => assert((repl, ctrl, zw, moji) == ((0L, 3L, 0L, 0L)), s"doc $id")
        case 3 => assert((repl, ctrl, zw, moji) == ((0L, 0L, 3L, 0L)), s"doc $id")
        case r => fail(s"doc $id residue $r should not be flagged")
      }
    }
  }

  test("encoding screen plans a single scan, no joins, no shuffles") {
    val p = graft.pipeline.EncodingScreen.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(p).length == 1)
    assert(!p.contains("Join"), "the screen is row-local")
  }

  test("streaming psi counts replay bit-identical to the batch bucket relation") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.core.Tables.load(spark, sfDir, "lineitem")
      .selectExpr("l_extendedprice", "l_returnflag")
      .as[(Double, String)].collect()
    val (h1, h2) = rows.splitAt(rows.length / 3)
    val input = MemoryStream[(Double, String)]
    val q = graft.streaming.StreamMonitors.ingestPsiCounts(
      input.toDF().toDF("l_extendedprice", "l_returnflag"))
      .writeStream.format("memory").queryName("psi_stream")
      .outputMode("append").start()
    val emitted = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("psi_stream")
        .as[(Long, Long, Long)].collect()
    } finally q.stop()
    // the last emission per bucket = the running counts after the whole
    // fixture streamed through; compare with the batch relation
    val last = emitted.groupBy(_._1)
      .map { case (b, g) => b -> g.map(r => (r._2, r._3)).maxBy(t => t._1 + t._2) }
    val batch = graft.profiling.PsiDrift.run(spark, sfDir)
      .select("bucket", "ct_a", "ct_b", "psi_term_nano")
      .as[(Long, Long, Long, Long)].collect()
    assert(last.keySet == batch.map(_._1).toSet)
    batch.foreach { case (b, ca, cb, _) =>
      assert(last(b) == ((ca, cb)), s"bucket $b counts drifted: ${last(b)}")
    }
    // the consumer derives the identical PSI terms from the emissions
    val na = batch.map(_._2).sum; val nb = batch.map(_._3).sum
    val nbk = batch.length.toLong
    batch.foreach { case (b, _, _, nano) =>
      val (ca, cb) = last(b)
      val pa = (ca + 1).toDouble / (na + nbk)
      val pb = (cb + 1).toDouble / (nb + nbk)
      assert(nano == math.round((pa - pb) * math.log(pa / pb) * 1e9),
        s"bucket $b psi term not derivable from the stream state")
    }
  }

  test("streaming ks counts replay bit-identical to the batch value-domain relation") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.core.Tables.load(spark, sfDir, "lineitem")
      .selectExpr("l_extendedprice", "l_returnflag")
      .as[(Double, String)].collect()
    val (h1, h2) = rows.splitAt(rows.length / 3)
    val input = MemoryStream[(Double, String)]
    val q = graft.streaming.StreamMonitors.ingestKsCounts(
      input.toDF().toDF("l_extendedprice", "l_returnflag"))
      .writeStream.format("memory").queryName("ks_stream")
      .outputMode("append").start()
    val emitted = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("ks_stream").as[(Long, Long, Long)].collect()
    } finally q.stop()
    // the last emission per value = the running counts after the whole
    // fixture streamed through; compare with the batch count relation
    // (the exact input of the batch entry's two-level prefix sum)
    val last = emitted.groupBy(_._1)
      .map { case (v, g) => v -> g.map(r => (r._2, r._3)).maxBy(t => t._1 + t._2) }
    graft.core.Tables.load(spark, sfDir, "lineitem")
      .createOrReplaceTempView("__ks_twin_li")
    val batch = spark.sql(graft.profiling.KsDrift.cntSql("__ks_twin_li"))
      .as[(Long, Long, Long)].collect()
    assert(last.keySet == batch.map(_._1).toSet)
    batch.foreach { case (v, ca, cb) =>
      assert(last(v) == ((ca, cb)), s"value $v counts drifted: ${last(v)}")
    }
    // the consumer derives the IDENTICAL KS verdict from the emitted
    // state: fold the cumulative sums over the value domain and compare
    // with the batch entry bit-for-bit
    val entry = graft.profiling.KsDrift.run(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().head
    var (ca, cb, num) = (0L, 0L, 0L)
    val na = batch.map(_._2).sum; val nb = batch.map(_._3).sum
    batch.sortBy(_._1).foreach { case (v, a, b) =>
      val (sa, sb) = last(v); ca += sa; cb += sb
      num = math.max(num, math.abs(nb * ca - na * cb))
    }
    assert(entry == ((na, nb, num, num * 1000000L / (na * nb))),
      s"KS verdict not derivable from the stream state: $entry")
  }

  test("streaming chisq counts replay bit-identical to the batch cells") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.core.Tables.load(spark, sfDir, "orders")
      .selectExpr("o_orderpriority", "o_orderstatus")
      .as[(String, String)].collect()
    val (h1, h2) = rows.splitAt(rows.length / 3)
    val input = MemoryStream[(String, String)]
    val q = graft.streaming.StreamMonitors.ingestChisqCounts(
      input.toDF().toDF("o_orderpriority", "o_orderstatus"))
      .writeStream.format("memory").queryName("chisq_stream")
      .outputMode("append").start()
    val emitted = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("chisq_stream")
        .as[(String, String, Long)].collect()
    } finally q.stop()
    // the last emission per cell = the running count after the whole
    // fixture streamed through; compare with the batch relation
    val last = emitted.groupBy(r => (r._1, r._2))
      .map { case (k, g) => k -> g.map(_._3).max }
    val batch = graft.profiling.ChisqDrift.run(spark, sfDir)
      .select("category", "slice", "observed_ct", "expected_micro",
        "chisq_term_micro")
      .as[(String, String, Long, Long, Long)].collect()
    assert(last.keySet == batch.map(r => (r._1, r._2)).toSet)
    batch.foreach { case (c, s, o, _, _) =>
      assert(last((c, s)) == o, s"cell ($c,$s) count drifted: ${last((c, s))}")
    }
    // the consumer derives the identical chi-square terms from the
    // emitted cells with the batch entry's integer-micro arithmetic
    val n = batch.map(_._3).sum
    val rt = batch.groupBy(_._1).map { case (c, g) => c -> g.map(_._3).sum }
    val ct = batch.groupBy(_._2).map { case (s, g) => s -> g.map(_._3).sum }
    batch.foreach { case (c, s, _, expMicro, termMicro) =>
      val o = last((c, s))
      assert(expMicro == math.round(rt(c).toDouble * ct(s) / n * 1e6),
        s"expected at ($c,$s) not derivable from the stream state")
      val num = (o * n - rt(c) * ct(s)).toDouble
      assert(termMicro ==
        math.round(num * num / (rt(c).toDouble * ct(s) * n) * 1e6),
        s"term at ($c,$s) not derivable from the stream state")
    }
  }
}
