package graft

/** Semantic + plan assertions for the corpus-screen additions: per-source
  * length outliers, readability, BPE merge pairs, embedding-space
  * outliers, semantic decontamination, and event-rate anomalies. */
class CurationOpsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("doc outliers sit outside their source's quartile fence") {
    val rows = graft.pipeline.DocStats.runOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_chars").toDouble
      val med = r.getAs[Double]("median_chars")
      val side = r.getAs[String]("side")
      // HIGH rows are above the median, LOW rows below — the fence is
      // strictly outside the box on the flagged side
      if (side == "HIGH") assert(n > med, s"HIGH outlier $n not above median $med")
      else assert(n < med, s"LOW outlier $n not below median $med")
      assert(r.getAs[Double]("iqr") >= 0)
    }
    // a screen that flags most of the corpus is not an outlier screen
    val total = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(rows.length < total / 5, s"${rows.length} of $total flagged")
  }

  test("doc outliers plan: broadcast fence join, no cartesian") {
    val p = plan(graft.pipeline.DocStats.runOutliers(spark, sfDir))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), "fence join should broadcast")
  }

  test("readability bands agree with the integer-exact ease value") {
    val rows = graft.pipeline.DocStats.runReadability(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fe = r.getAs[Double]("flesch_ease")
      val band = r.getAs[String]("band")
      val expect =
        if (fe >= 70) "EASY" else if (fe >= 50) "STANDARD" else "DIFFICULT"
      // the 2-dp rounded ease can only disagree with the integer-exact
      // band within half an ulp of the threshold itself
      if (math.abs(fe - 70) > 0.01 && math.abs(fe - 50) > 0.01)
        assert(band == expect, s"band $band vs ease $fe")
      assert(r.getAs[Long]("word_ct") > 0)
      assert(r.getAs[Long]("sentence_ct") >= 1)
      assert(r.getAs[Long]("syllable_ct") >= 1)
    }
  }

  test("bpe merge pairs are deterministically ranked and bounded") {
    val rows = graft.pipeline.BpeMerges.run(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= graft.pipeline.BpeMerges.TopK)
    val cts = rows.map(_.getAs[Long]("pair_ct"))
    assert(cts.zip(cts.tail).forall { case (a, b) => a >= b }, "not sorted by count")
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left_tok") + "_" + r.getAs[String]("right_tok"))
    }
  }

  test("bpe merge pairs plan has no self-join of the token stream") {
    // adjacency derives row-locally from the split array: no join, and
    // no window either — the token stream never shuffles
    val p = plan(graft.pipeline.BpeMerges.run(spark, sfDir))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"), "pair derivation should be join-free")
    assert(!p.contains("Window"), "pair derivation should be window-free")
  }

  test("row-local bpe pairs equal the dual-rendered window form") {
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__bpe_pairs_par")
    val rowLocal = spark.sql(
      graft.pipeline.BpeMerges.pairsSparkSql("__bpe_pairs_par"))
      .collect().map(_.toSeq).toSeq
    val windowed = spark.sql(graft.pipeline.BpeMerges
      .sql("__bpe_pairs_par")(graft.oracle.SparkDialect))
      .collect().map(_.toSeq).toSeq
    assert(rowLocal.nonEmpty && rowLocal == windowed,
      s"first diff: ${rowLocal.zip(windowed).find { case (a, b) => a != b }}")
  }

  test("embedding outliers fall below their cluster's p10 fence") {
    val rows = graft.pipeline.Similarity.runOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("cos_sim") < r.getAs[Double]("cluster_p10"))
    }
    // p10 fence ⇒ roughly a tenth of the corpus, never a majority
    val total = graft.core.Tables.load(spark, sfDir, "embeddings").count()
    assert(rows.length < total / 5, s"${rows.length} of $total flagged")
  }

  test("semantic decontamination respects the eval/train role split") {
    val rows = graft.pipeline.Dedup.runDecontaminateSemantic(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("eval_id") % 41 == 0)
      assert(r.getAs[Long]("train_id") % 41 != 0)
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.25 && c <= 1.0001)
    }
  }

  test("semantic decontamination plans a bucket equi-join, never all-pairs") {
    val p = plan(graft.pipeline.Dedup.runDecontaminateSemantic(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "decontamination pair join must stay bucket-blocked")
  }

  test("retrieval harness reads landed hit lists, not the corpus") {
    // prime the landed views, then assert the harness plan touches no
    // parquet at all — every consumer reads the checkpointed hit lists
    graft.pipeline.Retrieval.runBm25(spark, sfDir).collect()
    graft.pipeline.Retrieval.runHybrid(spark, sfDir).collect()
    val p = plan(graft.pipeline.Retrieval.runQuality(spark, sfDir))
    // the label-relevance oracle legitimately reads the (tiny)
    // embeddings table; the expensive side — the documents word-explode
    // inverted index — must come from the landed bm/kn/hy relations
    assert(!p.contains("documents.parquet"),
      "quality harness re-derives the inverted index instead of reading landed hits")
  }

  test("props extraction rollup is complete and integer-exact") {
    val rows = graft.streaming.EventAnalytics.runPropsStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("event_ct")).sum
    assert(total == graft.core.Tables.load(spark, sfDir, "events").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("k_present_ct") <= r.getAs[Long]("event_ct"))
      assert(r.getAs[Long]("k_min") <= r.getAs[Long]("k_max"))
      val avg = r.getAs[Double]("k_avg")
      assert(avg >= r.getAs[Long]("k_min") && avg <= r.getAs[Long]("k_max"))
    }
  }

  test("pq ADC hits are ranked by exact-integer distance and measured for recall") {
    val rows = graft.pipeline.Similarity.runPq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      val ds = sorted.map(_.getAs[Long]("dist_micro"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        "ADC distances not monotone in rank")
      assert(ds.forall(_ >= 0))
    }
    // the recall harness measures the pq path alongside the others
    val methods = graft.pipeline.Similarity.runRecall(spark, sfDir).collect()
      .map(_.getAs[String]("method")).toSet
    assert(methods.contains("pq_adc"), s"recall methods: $methods")
  }

  test("survivor audit: best member never scores below the survivor") {
    val rows = graft.pipeline.Dedup.runSurvivorAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("best_quality") >=
        r.getAs[Double]("survivor_quality") - 1e-9)
      assert(r.getAs[Double]("policy_loss") >= -1e-9)
      assert(r.getAs[Long]("cluster_sz") >= 2,
        "audit should only cover real duplicate clusters")
      val subopt = r.getAs[Int]("policy_suboptimal")
      if (subopt == 0)
        assert(r.getAs[Long]("best_id") == r.getAs[Long]("survivor_id"))
    }
  }

  test("correlation profile agrees with Spark's CORR to float tolerance") {
    val rows = graft.profiling.Correlations.run(spark, sfDir).collect()
    assert(rows.length ==
      graft.profiling.Correlations.Cols.size * (graft.profiling.Correlations.Cols.size - 1) / 2)
    val df = graft.core.Tables.load(spark, sfDir, "lineitem")
    rows.foreach { r =>
      val (x, y) = (r.getAs[String]("col_x"), r.getAs[String]("col_y"))
      val exact = r.getAs[Double]("r")
      assert(exact >= -1.0001 && exact <= 1.0001)
      // the built-in CORR over raw doubles is the (order-unstable)
      // estimator this entry replaces; the cents-grain exact form must
      // agree to well inside the scaling error
      val corr = df.selectExpr(s"corr($x, $y)").head().getDouble(0)
      assert(math.abs(exact - corr) < 1e-3, s"$x~$y: $exact vs corr $corr")
    }
  }

  test("bpe apply compresses with greedy non-overlapping semantics") {
    val rows = graft.pipeline.BpeMerges.runApply(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var anyApplied = false
    rows.foreach { r =>
      val before = r.getAs[Long]("tokens_before")
      val applied = r.getAs[Long]("merges_applied")
      val after = r.getAs[Long]("tokens_after")
      assert(after == before - applied)
      // non-overlapping merges can at most halve the stream
      assert(applied <= before / 2, s"applied $applied of $before tokens")
      if (applied > 0) anyApplied = true
      val c = r.getAs[Double]("compression")
      assert(c > 0 && c <= 1.0)
    }
    assert(anyApplied, "merge table never fired on its own corpus")
  }

  test("curriculum is an easy-to-hard permutation of the pack manifest") {
    val cur = graft.pipeline.Packer.runCurriculum(spark, sfDir).collect()
    assert(cur.nonEmpty)
    val grades = cur.map(_.getAs[Long]("avg_fk_x100"))
    assert(grades.zip(grades.tail).forall { case (a, b) => a <= b },
      "curriculum positions not monotone in difficulty")
    assert(cur.map(_.getAs[Long]("curriculum_pos")).toSeq ==
      (1L to cur.length).toSeq)
    val manifest = graft.pipeline.Packer.run(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("pack_id"))).toSet
    assert(cur.map(r => (r.getAs[Int]("shard"),
      r.getAs[Long]("pack_id"))).toSet == manifest,
      "curriculum drops or invents packs")
  }

  test("curriculum grade-rank decomposition equals the literal global window") {
    // the engine restates the global ROW_NUMBER as grade-offset +
    // grade-partitioned rank; pin it to the literal ordering computed
    // independently over the collected manifest
    val cur = graft.pipeline.Packer.runCurriculum(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("curriculum_pos"), r.getAs[Int]("shard"),
        r.getAs[Long]("pack_id"), r.getAs[Long]("avg_fk_x100")))
    val expected = cur.sortBy(r => (r._4, r._2, r._3)).zipWithIndex
      .map { case ((_, s, p, _), ix) => (s, p) -> (ix + 1L) }.toMap
    cur.foreach { case (pos, s, p, _) =>
      assert(pos == expected((s, p)),
        s"pack ($s,$p) pos $pos != literal ${expected((s, p))}")
    }
    // the pack-sized rank window partitions on the grade
    val plan = graft.pipeline.Packer.runCurriculum(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(avg_fk_x100"),
      "rank window must partition on the FK grade")
  }

  test("skew report advice is consistent with the measured distribution") {
    val rows = graft.core.SkewReport.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      val advice = r.getAs[String]("advice")
      val distinct = r.getAs[Long]("distinct_keys")
      assert(share > 0 && share <= 1.0)
      assert(r.getAs[Double]("skew_ratio") >= 0.99,
        "max/avg ratio cannot be below 1")
      if (r.getAs[Int]("rank") == 1) {
        if (share > 0.011) assert(advice == "SALT", s"share $share → $advice")
        if (advice == "BROADCAST") assert(distinct <= 1000)
      }
    }
    // every declared key reports, each with at most 5 heavy hitters
    val byKey = rows.groupBy(_.getAs[String]("join_key"))
    assert(byKey.keySet == graft.core.SkewReport.Keys.map(_._3).toSet)
    byKey.values.foreach(g => assert(g.length <= 5))
  }

  test("rate-anomaly drill-down rows sit inside their flagged hour") {
    val rows = graft.streaming.EventAnalytics
      .runLookupRateAnomaly(spark, "/root/testdata/sf0.001").collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("rn") <= graft.streaming.EventAnalytics.LookupRows)
      // the event's hour prefix matches the finding's hour
      val hr = r.getAs[String]("hour_ts").substring(0, 13)
      assert(r.getAs[String]("event_ts").startsWith(hr))
    }
  }

  test("event rate anomalies exceed the trailing z fence on the flagged side") {
    val rows = graft.streaming.EventAnalytics.runRateAnomaly(spark, sfDir).collect()
    rows.foreach { r =>
      val ct = r.getAs[Long]("event_ct").toDouble
      val mu = r.getAs[Double]("trail_avg")
      val sd = r.getAs[Double]("trail_sd")
      assert(sd > 0)
      assert(math.abs(ct - mu) > 2.9 * sd, s"|$ct - $mu| within ${2.9 * sd}")
      val dir = r.getAs[String]("direction")
      assert(if (ct > mu) dir == "SPIKE" else dir == "DROP")
    }
  }
}
