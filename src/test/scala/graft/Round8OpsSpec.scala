package graft

import graft.oracle.SparkDialect

/** Semantic assertions for the round-8 additions: containment dedup,
  * LSH blocking recall, SemDeDup-style semantic dedup, length
  * percentiles, corpus drift, epoch shuffling, the hashed linear
  * quality classifier, and content-defined chunking. */
class Round8OpsSpec extends SparkSpec {

  test("containment dominates jaccard and flags near-subset pairs") {
    val rows = graft.pipeline.Dedup.runContainment(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      val j = r.getAs[Double]("jaccard")
      assert(c >= 0.8 && c <= 1.0)
      // |A∩B| / min ≥ |A∩B| / union, always (rounding tolerance 1e-4)
      assert(c >= j - 1e-4, s"containment $c < jaccard $j")
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("lsh recall harness counts are mutually consistent") {
    val r = graft.pipeline.Dedup.runLshRecall(spark, sfDir).collect()
    assert(r.length == 1)
    val truth = r(0).getAs[Long]("truth_pair_ct")
    val cand = r(0).getAs[Long]("cand_pair_ct")
    val caught = r(0).getAs[Long]("caught_pair_ct")
    assert(caught <= truth && caught <= cand)
    if (truth > 0) {
      val recall = r(0).getAs[Double]("pair_recall")
      assert(math.abs(recall - caught.toDouble / truth) < 1e-3)
    }
    // banding with 4 bands × 3 rows at jaccard ≥ 0.5 is designed to
    // catch essentially every true pair on a near-dup fixture
    assert(truth == 0 || caught.toDouble / truth >= 0.5,
      s"LSH blocking lost most true pairs: $caught of $truth")
  }

  test("semantic dedup pairs are seed-blocked with bounded cosine") {
    val rows = graft.pipeline.Similarity.runSemantic(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.30 && c <= 1.0001)
    }
    // blocking really blocks: pair count far below the all-pairs count
    val n = graft.core.Tables.load(spark, sfDir, "embeddings").count()
    assert(rows.length < n * (n - 1) / 4)
  }

  test("per-source percentiles are monotone and bracket the mean") {
    val rows = graft.pipeline.CorpusStats.runPercentiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mn = r.getAs[Long]("token_min").toDouble
      val p10 = r.getAs[Double]("token_p10")
      val p50 = r.getAs[Double]("token_p50")
      val p90 = r.getAs[Double]("token_p90")
      val p99 = r.getAs[Double]("token_p99")
      val mx = r.getAs[Long]("token_max").toDouble
      assert(mn <= p10 && p10 <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
      val mean = r.getAs[Double]("token_mean")
      assert(mean >= mn - 1e-4 && mean <= mx + 1e-4)
      assert(r.getAs[Double]("char_p50") <= r.getAs[Double]("char_p90"))
    }
  }

  test("corpus drift classifies every change class over landed runs") {
    // sf0.01: the seeded prior (src19 removed → NEW, retired slice →
    // GONE, 1/7 docs dropped → GROWN, src0 doubled → SHRUNK) exercises
    // all classes; sf0.001's 50 docs are too sparse for every slice
    val rows = graft.pipeline.CorpusDrift.run(spark, "/root/testdata/sf0.01").collect()
    val classes = rows.map(_.getAs[String]("change_type")).toSet
    assert(Set("NEW", "GONE", "GROWN", "SHRUNK", "STABLE").subsetOf(classes),
      s"missing classes: ${Set("NEW", "GONE", "GROWN", "SHRUNK", "STABLE") -- classes}")
    rows.foreach { r =>
      r.getAs[String]("change_type") match {
        case "NEW"  => assert(r.getAs[Any]("token_pct") == null &&
          r.getAs[Long]("doc_delta") > 0)
        case "GONE" => assert(r.getAs[Long]("doc_ct") == 0)
        case "STABLE" =>
          assert(math.abs(r.getAs[Double]("token_pct")) <= 0.05 + 1e-9)
        case "GROWN"  => assert(r.getAs[Long]("token_delta") > 0)
        case "SHRUNK" => assert(r.getAs[Long]("token_delta") < 0)
      }
    }
  }

  test("epoch shuffle deals every pack once per epoch in a fresh order") {
    val rows = graft.pipeline.Packer.runEpochs(spark, sfDir).collect()
    val epochs = rows.map(_.getAs[Int]("epoch")).distinct.sorted
    assert(epochs.sameElements(Array(1, 2)))
    val perEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    val packSets = perEpoch.map { case (_, rs) =>
      rs.map(r => (r.getAs[Int]("shard"), r.getAs[Long]("pack_id"))).toSet
    }.toSeq
    // same pack universe each epoch, no pack dealt twice
    assert(packSets(0) == packSets(1))
    perEpoch.values.foreach { rs =>
      assert(rs.length == packSets.head.size)
      // per (worker) the seq numbers are contiguous from 1
      rs.groupBy(_.getAs[Int]("worker")).values.foreach { ws =>
        val seqs = ws.map(_.getAs[Long]("seq")).sorted
        assert(seqs.sameElements(1L to ws.length))
      }
    }
    // the reshuffle property: epoch orders differ
    def order(e: Int) = rows.filter(_.getAs[Int]("epoch") == e)
      .sortBy(r => (r.getAs[Int]("worker"), r.getAs[Long]("seq")))
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("pack_id"))).toSeq
    assert(order(1) != order(2), "epochs produced identical training order")
  }

  test("quality classifier score is the exact sum of md5 token weights") {
    import spark.implicits._
    Seq((1L, "alpha beta beta"), (2L, ""), (3L, "Alpha ALPHA"))
      .toDF("doc_id", "text").createOrReplaceTempView("__graft_qc_spec")
    val rows = spark.sql(
      graft.pipeline.QualityClassifier.sparkSql("__graft_qc_spec"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def w(word: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"qw:$word".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2001 - 1000
    }
    assert(rows(1L).getAs[Long]("score_milli") == w("alpha") + 2 * w("beta"))
    assert(rows(1L).getAs[Long]("token_ct") == 3)
    assert(rows(2L).getAs[Long]("score_milli") == 0 &&
      rows(2L).getAs[Long]("token_ct") == 0 &&
      rows(2L).getAs[Any]("mean_weight") == null)
    // lowercased before hashing: both casings share one weight
    assert(rows(3L).getAs[Long]("score_milli") == 2 * w("alpha"))
    rows.values.foreach { r =>
      val keep = r.getAs[Int]("keep")
      assert((r.getAs[Long]("score_milli") >= 0) == (keep == 1))
    }
  }

  test("cdc chunks tile each document exactly") {
    val chunks = graft.pipeline.Chunker.runCdc(spark, sfDir).collect()
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .selectExpr("doc_id", "length(text) AS len").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("len")).toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      assert(sorted.head.getAs[Int]("chunk_start") == 1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Int]("chunk_start") ==
            a.getAs[Int]("chunk_start") + a.getAs[Int]("chunk_len"))
        case _ =>
      }
      assert(sorted.map(_.getAs[Int]("chunk_len")).sum == docs(id),
        s"doc $id chunks do not tile its text")
    }
  }

  test("cdc native expression emits spans bit-identical to the SQL form") {
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__graft_cdc_id_docs")
    graft.functions.CdcChunksExpr.register(spark)
    def rows(sql: String) = spark.sql(sql).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("chunk_start"), r.getAs[Int]("chunk_len"),
        r.getAs[String]("chunk_hash"))).sorted.toSeq
    val native = rows(graft.pipeline.Chunker.cdcNativeSql("__graft_cdc_id_docs"))
    val sqlForm = rows(graft.pipeline.Chunker.cdcSql("__graft_cdc_id_docs")(SparkDialect))
    assert(native == sqlForm)
  }

  test("event sessions split when the gap exceeds 30 minutes") {
    val rows = graft.streaming.Sessions.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val idx = rs.map(_.getAs[Int]("session_idx")).sorted
      assert(idx.sameElements(1 to rs.length), "session idx not contiguous from 1")
      // sessions of one user never overlap and are separated by MORE
      // than the gap (exactly-at-bound merges, per session_window)
      val sorted = rs.sortBy(_.getAs[Int]("session_idx"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val endA = java.sql.Timestamp.valueOf(a.getAs[String]("session_end"))
          val startB = java.sql.Timestamp.valueOf(b.getAs[String]("session_start"))
          assert(startB.getTime - endA.getTime > 30L * 60 * 1000 - 1000,
            s"adjacent sessions closer than the gap: $endA .. $startB")
        case _ =>
      }
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("event_ct") >= 1)
      assert(r.getAs[Long]("duration_min") >= 0)
    }
  }

  test("vocab coverage partitions the token stream per source") {
    val rows = graft.pipeline.VocabCoverage.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var totalOov = 0L
    rows.foreach { r =>
      val tok = r.getAs[Long]("token_ct")
      val inv = r.getAs[Long]("in_vocab_ct")
      assert(inv <= tok)
      totalOov += tok - inv
      val oov = r.getAs[Double]("oov_rate")
      assert(oov >= 0.0 && oov <= 1.0)
      assert(math.abs(oov - (tok - inv).toDouble / tok) < 1e-3)
    }
    assert(totalOov > 0, "top-20 vocab should leave OOV mass on this corpus")
  }

  test("bm25 ranks each query's own document near the top") {
    val rows = graft.pipeline.Retrieval.runBm25(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to rs.length), "ranks not contiguous")
      assert(rs.forall(_.getAs[Long]("score_micro") > 0))
      // the query document contains every query term at full tf — it
      // must surface at the very top of its own ranking
      val self = rs.find(_.getAs[Long]("doc_id") == q)
      assert(self.isDefined && self.get.getAs[Int]("rank") <= 3,
        s"query doc $q missing from its own top ranks")
    }
  }

  test("hybrid rrf fuses exactly the lexical and vector top lists") {
    val fused = graft.pipeline.Retrieval.runHybrid(spark, sfDir).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      assert(r.getAs[Int]("in_lexical") + r.getAs[Int]("in_vector") >= 1)
    }
    // rrf scores decrease with rank inside each query
    fused.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("rrf_micro") >= b.getAs[Long]("rrf_micro"))
        case _ =>
      }
      // a doc on BOTH lists outranks a doc on one list at similar ranks:
      // rrf of (1 list, rank 1) = 1e6/61 < rrf of (2 lists, rank 10+10)
      // — just assert both membership classes are represented overall
      assert(rs.length <= 10)
    }
    val both = fused.count(r =>
      r.getAs[Int]("in_lexical") == 1 && r.getAs[Int]("in_vector") == 1)
    val single = fused.count(r =>
      r.getAs[Int]("in_lexical") + r.getAs[Int]("in_vector") == 1)
    assert(both + single == fused.length)
  }

  test("retrieval quality bounds hold and vector finds its own label") {
    val rows = graft.pipeline.Retrieval.runQuality(spark, sfDir).collect()
    val methods = rows.map(_.getAs[String]("method")).distinct.sorted
    assert(methods.sameElements(Array("hybrid", "lexical", "vector")))
    rows.foreach { r =>
      val mrr = r.getAs[Long]("mrr_micro")
      val ndcg = r.getAs[Long]("ndcg_micro")
      assert(mrr >= 0 && mrr <= 1000000)
      assert(ndcg >= 0 && ndcg <= 1000000, s"ndcg out of unit range: $ndcg")
      assert(r.getAs[Long]("rel_at_k") <= 10)
    }
    // mrr is 1e6/r for an integer rank r in 1..10, or 0 when no
    // relevant doc surfaced (the knn lists exclude the query itself,
    // so MRR=1 is NOT guaranteed even for the vector retriever)
    val valid = (1 to 10).map(r => math.rint(1e6 / r).toLong).toSet + 0L
    rows.foreach { r =>
      assert(valid.contains(r.getAs[Long]("mrr_micro")),
        s"mrr not a reciprocal rank: $r")
    }
  }

  test("funnel user counts are monotone down the steps") {
    val rows = graft.streaming.EventAnalytics.runFunnel(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("step_idx"))
    assert(rows.length == 3)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("user_ct") <= a.getAs[Long]("user_ct"),
          "a later funnel step cannot gain users")
      case _ =>
    }
    assert(rows.head.getAs[Double]("conversion") == 1.0)
    rows.foreach(r => assert(r.getAs[Double]("conversion") <= 1.0))
  }

  test("retention is 1.0 in the cohort week and bounded after") {
    val rows = graft.streaming.EventAnalytics.runRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Int]("week_n") == 0)
      .foreach(r => assert(r.getAs[Double]("retention") == 1.0))
    rows.foreach { r =>
      assert(r.getAs[Int]("week_n") >= 0)
      assert(r.getAs[Double]("retention") <= 1.0)
    }
  }

  test("filtered knn returns only corpus vectors passing the predicate") {
    val rows = graft.pipeline.Similarity.runFiltered(spark, sfDir).collect()
    val labels = graft.core.Tables.load(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("neighbor_id")
      assert(labels(n) % 2 == 0, s"neighbor $n fails the predicate")
    }
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to rs.length))
    }
  }

  test("pattern matches order steps and the clean flag excludes errors between") {
    val rows = graft.streaming.EventAnalytics.runPattern(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = java.sql.Timestamp.valueOf(r.getAs[String]("signup_ts"))
      val p = java.sql.Timestamp.valueOf(r.getAs[String]("purchase_ts"))
      assert(p.after(s), "purchase must follow signup")
      assert(r.getAs[Long]("minutes_to_convert") >= 0)
      assert(Set(0, 1).contains(r.getAs[Int]("clean")))
    }
    // cross-check one user's clean flag against the raw events
    val sample = rows.head
    val uid = sample.getAs[Long]("user_id")
    // second-formatted strings compare chronologically
    val evs = graft.core.Tables.load(spark, sfDir, "events")
      .where(s"user_id = $uid")
      .selectExpr("date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS t", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val s0 = sample.getAs[String]("signup_ts")
    val p0 = sample.getAs[String]("purchase_ts")
    val errBetween = evs.exists { case (t, ty) =>
      ty == "error" && t > s0 && t < p0
    }
    assert((sample.getAs[Int]("clean") == 1) == !errBetween)
  }

  test("cdc boundaries re-align after a prefix edit (the CDC property)") {
    import spark.implicits._
    val base = graft.core.Tables.load(spark, sfDir, "documents")
      .selectExpr("text").limit(1).collect()(0).getString(0)
    Seq((1L, base), (2L, "EDITED PREFIX >> " + base))
      .toDF("doc_id", "text").createOrReplaceTempView("__graft_cdc_spec")
    val rows = spark.sql(
      graft.pipeline.Chunker.cdcSql("__graft_cdc_spec")(SparkDialect)).collect()
    val h1 = rows.filter(_.getAs[Long]("doc_id") == 1L)
      .map(_.getAs[String]("chunk_hash")).toSet
    val h2 = rows.filter(_.getAs[Long]("doc_id") == 2L)
      .map(_.getAs[String]("chunk_hash")).toSet
    // all but the chunk(s) containing the edit survive: fixed-window
    // chunking would shift every boundary and share (almost) nothing
    val shared = (h1 & h2).size
    assert(shared >= h1.size - 2,
      s"edit destroyed chunk alignment: only $shared of ${h1.size} chunks survive")
  }

  test("dsir scores every candidate doc and selects exactly the top slice") {
    val rows = graft.pipeline.Selection.runDsir(spark, sfDir).collect()
    val nTarget = graft.core.Tables.load(spark, sfDir, "documents")
      .where(s"source = '${graft.pipeline.Selection.TargetSource}'").count()
    val nDocs = graft.core.Tables.load(spark, sfDir, "documents").count()
    // one row per candidate (non-target) doc
    assert(rows.length == (nDocs - nTarget).toInt)
    val selected = rows.filter(_.getAs[Int]("selected") == 1)
    assert(selected.length == math.min(graft.pipeline.Selection.SelectTop, rows.length))
    // the selection IS the top of the score order: every selected score
    // >= every unselected score
    val minSel = selected.map(_.getAs[Long]("dsir_score")).min
    val unsel = rows.filter(_.getAs[Int]("selected") == 0)
    assert(unsel.isEmpty || unsel.map(_.getAs[Long]("dsir_score")).max <= minSel)
    rows.foreach(r => assert(r.getAs[Long]("token_ct") > 0))
  }

  test("substring screen covers every doc with a consistent dup fraction") {
    val rows = graft.pipeline.Selection.runSubstringDup(spark, sfDir).collect()
    val nDocs = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(rows.length == nDocs.toInt)
    rows.foreach { r =>
      val g = r.getAs[Long]("gram_ct"); val d = r.getAs[Long]("dup_gram_ct")
      assert(d <= g)
      val f = r.getAs[Double]("dup_fraction")
      if (g == 0) assert(f == 0.0)
      else assert(math.abs(f - d.toDouble / g) < 1e-3)
    }
    // the near-dup fixture pairs share long spans — the screen must
    // light up somewhere
    assert(rows.exists(_.getAs[Long]("dup_gram_ct") > 0))
  }

  test("lloyd refinement conserves the corpus and only shrinks movement") {
    val rows = graft.pipeline.Similarity.runKmeansRefine(spark, sfDir).collect()
    assert(rows.length == graft.pipeline.Similarity.DefaultCentroids)
    val n = graft.core.Tables.load(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_iter1")).sum == n)
    assert(rows.map(_.getAs[Long]("n_iter2")).sum == n)
    rows.foreach { r =>
      val s = r.getAs[Long]("n_stayed")
      assert(s <= r.getAs[Long]("n_iter1") && s <= r.getAs[Long]("n_iter2"))
    }
    // refined centroids are the means of their members — most vectors
    // stay put after one Lloyd step on a clustered fixture
    val stayed = rows.map(_.getAs[Long]("n_stayed")).sum
    assert(stayed * 2 > n, s"Lloyd step moved most of the corpus: $stayed of $n stayed")
  }

  test("curation funnel stages shrink monotonically and reconcile per stage") {
    val rows = graft.pipeline.Selection.runFunnel(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("stage_ord"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("raw", "post_exact_dedup", "post_near_dedup", "post_quality_gate", "train_split"))
    val n = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(rows.head.getAs[Long]("doc_ct") == n)
    assert(math.abs(rows.head.getAs[Double]("token_share") - 1.0) < 1e-9)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("doc_ct") >= b.getAs[Long]("doc_ct"))
        assert(a.getAs[Long]("token_ct") >= b.getAs[Long]("token_ct"))
      case _ =>
    }
    // stage 2's drop reconciles with the cluster relation: every
    // non-survivor member (of a canonical keeper) leaves exactly there
    val survivors = graft.pipeline.Dedup.runClusters(spark, sfDir).collect()
      .filter(_.getAs[Int]("is_survivor") == 0).map(_.getAs[Long]("doc_id")).toSet
    val s1 = rows(1).getAs[Long]("doc_ct"); val s2 = rows(2).getAs[Long]("doc_ct")
    assert(s1 - s2 <= survivors.size)
  }

  test("index occupancy accounts for the whole corpus in both layouts") {
    val rows = graft.pipeline.Similarity.runOccupancy(spark, sfDir).collect()
    val n = graft.core.Tables.load(spark, sfDir, "embeddings").count()
    Seq("lsh", "ivf").foreach { layout =>
      val part = rows.filter(_.getAs[String]("layout") == layout)
      assert(part.nonEmpty, s"no $layout partitions")
      assert(part.map(_.getAs[Long]("vec_ct")).sum == n,
        s"$layout occupancy loses vectors")
      val share = part.map(_.getAs[Double]("corpus_share")).sum
      assert(math.abs(share - 1.0) < 0.01)
    }
    // ivf partitions = the seed count
    assert(rows.count(_.getAs[String]("layout") == "ivf") ==
      graft.pipeline.Similarity.DefaultCentroids)
  }

  test("dedup pair lookup serves the top verified pairs with evidence") {
    val rows = graft.pipeline.Dedup.runPairLookup(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val js = rows.map(_.getAs[Double]("jaccard"))
    assert(js.forall(_ >= 0.5))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("shared_shingle_ct") > 0)
      assert(r.getAs[String]("preview_a").nonEmpty)
      assert(r.getAs[String]("preview_b").nonEmpty)
    }
    // the served pairs ARE verified near-dups: subset of the minhash relation
    val mh = graft.pipeline.Dedup.runMinhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    rows.foreach { r =>
      assert(mh.contains((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))))
    }
  }

  test("embedding sweep is monotone and anchors to the lsh dedup entry at 0.30") {
    val rows = graft.pipeline.Dedup.runEmbeddingSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.map(_.getAs[Double]("threshold")).toSeq ==
      graft.pipeline.Dedup.EmbeddingSweepThresholds)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("pair_ct") >= b.getAs[Long]("pair_ct"))
        assert(a.getAs[Long]("affected_vec_ct") >= b.getAs[Long]("affected_vec_ct"))
      case _ =>
    }
    // the 0.30 row IS the oracle-checked LSH-blocked dedup relation
    val lsh = graft.pipeline.Dedup.runEmbeddingLsh(spark, sfDir).count()
    assert(rows.head.getAs[Long]("pair_ct") == lsh)
  }

  test("threshold sweep is monotone and anchors to the minhash entry at 0.5") {
    val rows = graft.pipeline.Dedup.runThresholdSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.map(_.getAs[Double]("threshold")).toSeq ==
      graft.pipeline.Dedup.SweepThresholds)
    // raising the bar can only lose pairs and docs
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("pair_ct") >= b.getAs[Long]("pair_ct"))
        assert(a.getAs[Long]("affected_doc_ct") >= b.getAs[Long]("affected_doc_ct"))
      case _ =>
    }
    // the 0.5 row IS the oracle-checked minhash relation's pair count
    val mh = graft.pipeline.Dedup.runMinhash(spark, sfDir).count()
    assert(rows.head.getAs[Long]("pair_ct") == mh)
  }

  test("simhash sweep is monotone and anchors to the simhash entry at h=3") {
    val rows = graft.pipeline.Dedup.runSimhashSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("max_hamming"))
    assert(rows.map(_.getAs[Int]("max_hamming")).toSeq ==
      graft.pipeline.Dedup.SimhashSweepThresholds.toSeq)
    // loosening the hamming bar can only add pairs and docs
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("pair_ct") <= b.getAs[Long]("pair_ct"))
        assert(a.getAs[Long]("affected_doc_ct") <= b.getAs[Long]("affected_doc_ct"))
      case _ =>
    }
    // the h=3 row IS the oracle-checked simhash relation
    val sh = graft.pipeline.Dedup.runSimhash(spark, sfDir).count()
    assert(rows.last.getAs[Long]("pair_ct") == sh)
    // the sweep reads the landed pair relation — no corpus re-derivation
    val p = graft.pipeline.Dedup.runSimhashSweep(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("FileScan parquet"),
      "sweep re-derived the banded join instead of reading the landed pairs")
  }

  test("ngram decontamination covers the eval split with bounded counts") {
    val rows = graft.pipeline.Selection.runNgramDecontaminate(spark, sfDir).collect()
    val evalCt = graft.core.Tables.load(spark, sfDir, "documents")
      .where(s"doc_id % ${graft.pipeline.Dedup.EvalMod} = 0").count()
    assert(rows.length == evalCt.toInt)
    rows.foreach { r =>
      assert(r.getAs[Long]("eval_doc_id") % graft.pipeline.Dedup.EvalMod == 0)
      val c = r.getAs[Long]("contaminated_gram_ct")
      assert(c <= r.getAs[Long]("gram_ct"))
      assert((r.getAs[Int]("contaminated") == 1) == (c > 0))
    }
  }

  test("leakage-free split never strands a dup cluster across the boundary") {
    val roll = graft.pipeline.Selection.runSplit(spark, sfDir).collect()
    val n = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(roll.map(_.getAs[Long]("doc_ct")).sum == n)
    assert(roll.map(_.getAs[String]("split")).sorted.toSeq == Seq("heldout", "train"))
    // the leakage property itself: every assignment unit lives on ONE side
    val assigns = graft.pipeline.Selection.splitAssignments(spark, sfDir).collect()
    val byUnit = assigns.groupBy(_.getAs[Long]("unit_id"))
    byUnit.foreach { case (u, docs) =>
      assert(docs.map(_.getAs[String]("split")).distinct.length == 1,
        s"unit $u straddles the split")
    }
    // and clusters really are multi-doc units somewhere on the fixture
    assert(byUnit.exists(_._2.length > 1))
  }

  test("doc drift classifies the synthetic prior's add/remove/change exactly") {
    val rows = graft.pipeline.DocDrift.run(spark, sfDir).collect()
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    import org.apache.spark.sql.functions.{col, expr}
    // derive the expected class counts from the same arithmetic the
    // prior derivation uses
    val added = docs.where("doc_id % 7 = 0").count()
    val removed = docs.where("source = 'src0'").count()
    val changed = docs.where("doc_id % 11 = 0 AND doc_id % 7 <> 0").count()
    assert(rows.map(_.getAs[Long]("added_ct")).sum == added)
    assert(rows.map(_.getAs[Long]("removed_ct")).sum == removed)
    assert(rows.map(_.getAs[Long]("changed_ct")).sum == changed)
    val total = rows.map(r => r.getAs[Long]("added_ct") + r.getAs[Long]("removed_ct") +
      r.getAs[Long]("changed_ct") + r.getAs[Long]("unchanged_ct")).sum
    assert(total == docs.count() + removed)
  }

  test("quality calibration fills ten deciles covering the whole corpus") {
    val rows = graft.pipeline.Selection.runCalibration(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("decile")).sorted.toSeq == (1 to 10))
    val n = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("doc_ct")).sum == n)
    rows.foreach { r =>
      val s = r.getAs[Double]("dup_share")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Long]("dup_doc_ct") <= r.getAs[Long]("doc_ct"))
      assert(r.getAs[Double]("min_quality") <= r.getAs[Double]("max_quality"))
    }
    // deciles are ordered by score: each decile's max <= the next's min
    // (ties can equalize, never invert)
    rows.sortBy(_.getAs[Int]("decile")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("max_quality") <= b.getAs[Double]("min_quality") + 1e-9)
      case _ =>
    }
  }

  test("calibration bucketed-rank deciles equal literal NTILE exactly") {
    // the engine decomposes the global NTILE into (bucket offset +
    // bucket-partitioned ROW_NUMBER) via the injective ROUND(score·1e4)
    // key — this pins the decomposition to the literal global window
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__calib_nt_docs")
    val comp = graft.pipeline.Dedup.clusterCompView(spark, sfDir)
    val d: graft.oracle.Dialect = graft.oracle.SparkDialect
    val lit = spark.sql(
      s"""WITH qx AS (
         |  SELECT doc_id, quality_score FROM (
         |${graft.pipeline.TextAnalysis.sql("__calib_nt_docs", ordered = false)(d)}
         |  ) tq
         |),
         |dq AS (
         |  SELECT q.doc_id, q.quality_score,
         |         CASE WHEN c.id IS NULL THEN 0 ELSE 1 END AS is_dup,
         |         NTILE(10) OVER (ORDER BY q.quality_score, q.doc_id) AS decile
         |    FROM qx q LEFT JOIN $comp c ON c.id = q.doc_id
         |)
         |SELECT CAST(decile AS INT) AS decile,
         |       CAST(COUNT(*) AS BIGINT) AS doc_ct,
         |       CAST(SUM(is_dup) AS BIGINT) AS dup_doc_ct,
         |       CAST(ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 4) AS DOUBLE)
         |         AS dup_share,
         |       CAST(MIN(quality_score) AS DOUBLE) AS min_quality,
         |       CAST(MAX(quality_score) AS DOUBLE) AS max_quality
         |  FROM dq
         | GROUP BY decile
         | ORDER BY decile""".stripMargin).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    val calib = graft.pipeline.Selection.runCalibration(spark, sfDir)
    val got = calib.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == lit, s"bucketed decomposition drifted from NTILE:\n$got\n$lit")
    // and the corpus-sized rank window is bucket-partitioned — the only
    // single-partition window runs over the bounded bucket-count relation
    val p = calib.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(qb"),
      "rank window must partition on the quantized score bucket")
  }

  test("substring rewrite keeps first occurrences and elides later spans") {
    import spark.implicits._
    val span = (1 to 13).map(i => s"shared$i").mkString(" ")
    Seq(
      (1L, s"alpha beta $span gamma"),
      (2L, s"unrelated words here $span trailing tail"),
      (3L, "totally distinct content with no duplication at all")
    ).toDF("doc_id", "text").createOrReplaceTempView("__graft_ssr_spec")
    val rows = spark.sql(graft.pipeline.Selection
        .substringRewriteSql("__graft_ssr_spec")(SparkDialect))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 holds the corpus-first occurrence — everything survives
    assert(rows(1L).getAs[Long]("removed_word_ct") == 0)
    // doc 2's copy of the span is elided: exactly the 13 shared words
    assert(rows(2L).getAs[Long]("removed_word_ct") == 13)
    assert(rows(2L).getAs[Long]("kept_word_ct") ==
      rows(2L).getAs[Long]("word_ct") - 13)
    // untouched doc: retained hash is the hash of its own word stream
    assert(rows(3L).getAs[Long]("removed_word_ct") == 0)
    // fixture ledger invariants: counts reconcile per doc, and the
    // near-dup fixture pairs make at least one span removal happen
    // (the rewrite also elides WITHIN-doc gram repeats the cross-doc
    // census cannot see, so census-zero does not imply removal-zero)
    val ledger = graft.pipeline.Selection.runSubstringRewrite(spark, sfDir).collect()
    ledger.foreach { r =>
      assert(r.getAs[Long]("kept_word_ct") + r.getAs[Long]("removed_word_ct") ==
        r.getAs[Long]("word_ct"))
    }
    assert(ledger.exists(_.getAs[Long]("removed_word_ct") > 0))
  }

  test("canonical dedup collapses formatting variants the exact pass misses") {
    import spark.implicits._
    Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "HELLO WORLD."),
      (4L, "something else"), (5L, "something else")
    ).toDF("doc_id", "text").createOrReplaceTempView("__graft_canon_spec")
    val rows = spark.sql(
      graft.pipeline.Dedup.canonicalSql("__graft_canon_spec")(SparkDialect))
      .collect()
    assert(rows.length == 2)
    val hello = rows.find(_.getAs[Long]("keep_id") == 1L).get
    assert(hello.getAs[Long]("dupe_ct") == 3)
    // three distinct raw texts collapsed — work exact md5 cannot do
    assert(hello.getAs[Long]("raw_variant_ct") == 3)
    val same = rows.find(_.getAs[Long]("keep_id") == 4L).get
    assert(same.getAs[Long]("dupe_ct") == 2 && same.getAs[Long]("raw_variant_ct") == 1)
  }

  test("tokenizer fertility covers every language with consistent ratios") {
    val rows = graft.pipeline.TokenizerFertility.run(spark, sfDir).collect()
    val langs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("lang").distinct().count()
    assert(rows.length == langs.toInt)
    rows.foreach { r =>
      val w = r.getAs[Long]("word_ct"); val t = r.getAs[Long]("subtoken_ct")
      // punct/number splitting only ever adds segments
      assert(t >= w, s"lang ${r.getString(0)}: subtokens $t < words $w")
      val f = r.getAs[Double]("fertility")
      assert(math.abs(f - t.toDouble / w) < 1e-3)
      assert(r.getAs[Double]("chars_per_subtoken") > 0)
    }
  }

  test("cluster-balanced sample draws a capped, deterministic slice per cluster") {
    val rows = graft.pipeline.Similarity.runClusterSample(spark, sfDir).collect()
    val byCluster = rows.groupBy(_.getAs[Long]("seed_id"))
    assert(byCluster.size == graft.pipeline.Similarity.DefaultCentroids)
    byCluster.values.foreach { c =>
      assert(c.length <= 5)
      assert(c.map(_.getAs[Int]("draw_rank")).sorted.toSeq == (1 to c.length))
    }
    // deterministic: a second run draws the identical rows
    val again = graft.pipeline.Similarity.runClusterSample(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
