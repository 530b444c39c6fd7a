package graft

import graft.oracle.SparkDialect

/** Round-9 regression pins for the advisor findings: Unicode-aware
  * canonicalization, wordless-candidate DSIR rows, NULL-vector bucket
  * parity, and streaming-ingest degenerate-input guards. */
class Round9OpsSpec extends SparkSpec {

  test("canonical dedup keeps non-Latin scripts distinct (Unicode classes)") {
    import spark.implicits._
    // an ASCII-only [^a-z0-9] strip would canonicalize all four
    // non-Latin docs to "" and report them as one duplicate group
    Seq(
      (1L, "你好，世界！"), (2L, "Привет, мир!"), (3L, "مرحبا بالعالم"),
      (4L, "こんにちは世界"), (5L, "你好世界！！"), (6L, "Héllo,  Wörld!"),
      (7L, "héllo wörld")
    ).toDF("doc_id", "text").createOrReplaceTempView("__graft_canon_uni")
    val rows = spark.sql(
      graft.pipeline.Dedup.canonicalSql("__graft_canon_uni")(SparkDialect))
      .collect()
    // exactly two groups collapse: the CJK pair (both punctuation-strip
    // to "你好世界") and the accented-Latin pair; other scripts stay apart
    assert(rows.length == 2, s"got ${rows.length} groups: ${rows.mkString(";")}")
    assert(rows.forall(_.getAs[Long]("dupe_ct") == 2))
    assert(rows.map(_.getAs[Long]("keep_id")).toSet == Set(1L, 6L))
  }

  test("dsir emits a token_ct=0 row for a wordless candidate document") {
    import spark.implicits._
    val tgt = graft.pipeline.Selection.TargetSource
    Seq(
      (1L, "the quick brown fox", tgt),
      (2L, "lazy dog sleeps here", "web"),
      (3L, "", "web"),
      (4L, "   ", "web")
    ).toDF("doc_id", "text", "source")
      .createOrReplaceTempView("__graft_dsir_empty")
    val rows = spark.sql(
      graft.pipeline.Selection.dsirSql("__graft_dsir_empty")(SparkDialect))
      .collect()
    // every candidate (non-target) doc appears, wordless ones included
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 3L, 4L))
    val empty = rows.filter(r => r.getAs[Long]("doc_id") >= 3L)
    empty.foreach { r =>
      assert(r.getAs[Long]("token_ct") == 0L)
      assert(r.getAs[Long]("dsir_score") == 0L)
      assert(r.getAs[Int]("selected") == 0)
    }
    assert(rows.find(_.getAs[Long]("doc_id") == 2L).get.getAs[Long]("token_ct") == 4L)
  }

  test("incremental profile merge equals the full recompute per source") {
    val inc = graft.pipeline.IncrementalProfile.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("doc_ct"), r.getAs[Long]("token_ct"),
          r.getAs[Long]("char_ct"), r.getAs[Double]("avg_chars"))).toMap
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__graft_incrprof_full")
    val full = spark.sql(graft.pipeline.IncrementalProfile
      .fullSql("__graft_incrprof_full")(SparkDialect)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("doc_ct"), r.getAs[Long]("token_ct"),
          r.getAs[Long]("char_ct"), r.getAs[Double]("avg_chars"))).toMap
    assert(inc == full,
      s"incremental merge drifted from full recompute:\ninc=$inc\nfull=$full")
    // the fixture CDC actually exercises every class: the prior corpus
    // has removed, changed AND missing (added-now) docs
    assert(inc.nonEmpty)
  }

  test("hard negatives: every mined pair crosses labels, ranked by cosine with margin") {
    val rows = graft.pipeline.Similarity.runHardNegatives(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("neg_label") != r.getAs[Int]("query_label"),
        "a same-label vector leaked into the negatives")
      // margin is vs the best SAME-label cosine — by definition
      // cosine - margin must be constant per query
      assert(r.getAs[Double]("cosine") >= -1.0 && r.getAs[Double]("cosine") <= 1.0)
    }
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      // cosine and margin round to 4dp independently, so the implied
      // anchor can wobble by up to 2e-4 across rows — never more
      val anchors = g.map(r =>
        r.getAs[Double]("cosine") - r.getAs[Double]("margin_vs_best_pos"))
      assert(anchors.max - anchors.min <= 2.1e-4,
        s"best-positive anchor drifted within a query: $anchors")
    }
  }

  test("ngram novelty: census identities hold per source") {
    val rows = graft.pipeline.NgramNovelty.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("gram_ct")
      val dist = r.getAs[Long]("distinct_gram_ct")
      val excl = r.getAs[Long]("exclusive_gram_ct")
      assert(dist <= total && excl <= dist)
      assert(r.getAs[Double]("novelty_ratio") > 0.0 &&
        r.getAs[Double]("novelty_ratio") <= 1.0)
      assert(r.getAs[Double]("exclusive_share") >= 0.0 &&
        r.getAs[Double]("exclusive_share") <= 1.0)
    }
  }

  test("minhash calibration: estimates are twelfths and errors reconcile") {
    val rows = graft.pipeline.Dedup.runMinhashCalibration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val tru = r.getAs[Double]("true_jaccard")
      val err = r.getAs[Double]("est_err")
      // the estimator only takes values k/12
      assert(math.abs(est * 12 - math.round(est * 12)) < 0.02, s"est $est not a twelfth")
      // every band candidate shares >= 3 minhash slots (one full band)
      assert(est >= 3.0 / 12 - 1e-9, s"candidate with est $est below the band bound")
      assert(tru > 0.0 && tru <= 1.0)
      assert(math.abs(err - (est - tru)) <= 2e-4, "err != est - true")
    }
  }

  test("as-of join attaches exactly the latest order at-or-before each event") {
    val rows = graft.operators.AsofJoin.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice").collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    import java.time.LocalDateTime
    implicit val ldtOrd: Ordering[LocalDateTime] = Ordering.fromLessThan(_ isBefore _)
    rows.take(500).foreach { r =>
      val ts = r.getAs[LocalDateTime]("ts")
      val cand = orders.getOrElse(r.getAs[Long]("user_id"), Array.empty)
        .filter(o => !o.getAs[LocalDateTime]("o_orderdate").isAfter(ts))
      assert(cand.nonEmpty, "as-of emitted an event with no prior order")
      val latestTs = cand.map(_.getAs[LocalDateTime]("o_orderdate")).max
      val expect = cand.filter(_.getAs[LocalDateTime]("o_orderdate") == latestTs)
        .maxBy(_.getAs[Long]("o_orderkey"))
      assert(r.getAs[Long]("order_key") == expect.getAs[Long]("o_orderkey"),
        s"event ${r.getAs[Long]("event_id")}: wrong as-of order")
      assert(r.getAs[Double]("order_price") == expect.getAs[Double]("o_totalprice"))
    }
  }

  test("range join burst counts match a driver-side recompute") {
    val rows = graft.operators.RangeJoin.run(spark, sfDir).collect()
    val all = graft.core.Tables.load(spark, sfDir, "events")
      .selectExpr("event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "event_type").collect()
    val allUs = all.map(_.getAs[Long]("us")).sorted
    val signups = all.filter(_.getAs[String]("event_type") == "signup")
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("us")).toMap
    assert(rows.length == signups.size, "one row per signup, always")
    rows.take(300).foreach { r =>
      val us = signups(r.getAs[Long]("event_id"))
      val expect = allUs.count(u => u > us && u <= us + graft.operators.RangeJoin.WindowUs)
      assert(r.getAs[Long]("burst_ct") == expect,
        s"signup ${r.getAs[Long]("event_id")}: ${r.getAs[Long]("burst_ct")} vs $expect")
    }
    // the fixture genuinely exercises both populated and empty windows
    assert(rows.exists(_.getAs[Long]("burst_ct") > 0))
  }

  test("streaming index ingest guards zero-norm and short vectors like the batch SQL") {
    import spark.implicits._
    val seeds = Seq(
      (10L, Seq.fill(64)(0.1f)),
      (20L, (0 until 64).map(i => if (i % 2 == 0) 0.2f else -0.1f)))
    val vecs = Seq(
      graft.pipeline.Similarity.VecIn(1L, 0, Seq.fill(64)(0.0f)),   // zero norm
      graft.pipeline.Similarity.VecIn(2L, 0, Seq.fill(3)(0.5f)),    // shorter than dim
      graft.pipeline.Similarity.VecIn(3L, 0, Seq.fill(64)(0.3f))    // healthy
    ).toDS()
    val out = graft.pipeline.Similarity
      .streamingIndexIngest(vecs, seeds).collect().sortBy(_.vec_id)
    // zero-norm: every cosine is NULL in the batch SQL, DESC NULLS LAST
    // falls through to seed_id ASC — lowest seed id, never -1
    assert(out(0).seed_id == 10L)
    // short vector: graft_bucket / the unrolled CASE chain yield 0
    assert(out(1).bucket == 0)
    // healthy vector still gets a genuine assignment
    assert(out(2).seed_id == 10L || out(2).seed_id == 20L)
  }
}
