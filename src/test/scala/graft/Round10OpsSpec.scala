package graft

import graft.oracle.SparkDialect
import graft.pipeline.Selection

/** Round-10 curation additions: token-budgeted DSIR selection and the
  * per-document curation ledger. */
class Round10OpsSpec extends SparkSpec {

  test("engine budget selection is row-identical to the direct windowed form") {
    // the oracle's rendering (global running-sum window) also runs on
    // Spark — the histogram-threshold engine path must reproduce it
    // bit-for-bit, boundary document and ties included
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__r10_budget_docs")
    val direct = spark.sql(Selection.budgetSql("__r10_budget_docs")(SparkDialect))
      .collect().map(_.toSeq).toSeq
    val engine = Selection.runBudget(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(engine.nonEmpty)
    assert(engine == direct,
      s"first diff: ${engine.zip(direct).find { case (a, b) => a != b }}")
  }

  test("budget selection is greedy: selected docs are a prefix in score order") {
    val rows = Selection.runBudget(spark, sfDir).collect()
      .filter(r => r.getAs[Long]("token_ct") > 0)
      .sortBy(r => (-r.getAs[Long]("dsir_score"), r.getAs[Long]("doc_id")))
    val firstUnselected = rows.indexWhere(_.getAs[Int]("selected_budget") == 0)
    if (firstUnselected >= 0)
      assert(rows.drop(firstUnselected).forall(_.getAs[Int]("selected_budget") == 0),
        "selection is not a prefix of the greedy order")
    val selTokens = rows.takeWhile(_.getAs[Int]("selected_budget") == 1)
      .map(_.getAs[Long]("token_ct")).sum
    // every selected doc STARTS before the budget: total minus the
    // boundary doc must be under it
    if (firstUnselected > 0)
      assert(selTokens - rows(firstUnselected - 1).getAs[Long]("token_ct")
        < Selection.TokenBudget)
  }

  test("rendered BMPs round-trip the real decoder with exact stats") {
    import graft.pipeline.Multimodal
    val vals = Array.tabulate(64)(i => (i * 37 + 11) % 256)
    val bmp = Multimodal.renderGrayBmp(vals)
    val stats = Multimodal.decodeBmp(bmp).get
    assert(stats.width == 8 && stats.height == 8)
    val mean = vals.sum / 64.0
    // gray pixels: every channel mean is the value mean
    assert(math.abs(stats.meanR - math.rint(mean * 10000) / 10000) < 1e-9)
    assert(stats.meanR == stats.meanG && stats.meanG == stats.meanB)
    // the 8x8 grid over an 8x8 image is the identity: aHash bits are
    // exactly the v*64 >= sum thresholds
    val grid = Multimodal.bmpGridLuma(bmp, 8).get
    val s = vals.sum
    val expect = vals.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
      if (v.toLong * 64 >= s) h | (1L << i) else h
    }
    assert(Multimodal.aHash(grid) == expect)
  }

  test("engine phash dedup (decode + band join) matches the all-pairs arithmetic oracle form") {
    import graft.pipeline.Multimodal
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__r10_phash_docs")
    val direct = spark.sql(Multimodal.phashPairsSql("__r10_phash_docs")(SparkDialect))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val engine = Multimodal.runPhashDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(engine.nonEmpty, "fixture corpus produced no near-dup image pairs")
    assert(engine == direct,
      s"missing=${(direct -- engine).take(5)} extra=${(engine -- direct).take(5)}")
  }

  test("rendered WAVs round-trip the real decoder with exact frame energies") {
    import graft.pipeline.Multimodal
    val samples = Array.tabulate(128)(i => ((i * 53 + 7) % 256 - 128) * 256)
    val wav = Multimodal.renderPcmWav(samples)
    val stats = Multimodal.decodeWav(wav).get
    assert(stats.sampleRate == 8000 && stats.nChannels == 1 && stats.nSamples == 128)
    assert(stats.peak == samples.map(math.abs).max)
    val energies = Multimodal.wavFrameEnergy(wav, 64).get
    assert(energies.length == 64)
    val expect = Array.tabulate(64)(f =>
      samples(2 * f).toLong * samples(2 * f) +
        samples(2 * f + 1).toLong * samples(2 * f + 1))
    assert(energies.sameElements(expect))
    val s = expect.sum
    val eh = expect.zipWithIndex.foldLeft(0L) { case (h, (e, f)) =>
      if (e * 64 >= s) h | (1L << f) else h
    }
    assert(Multimodal.eHash(energies) == eh)
  }

  test("rendered AVIs round-trip the real container parser with exact frame grids") {
    import graft.pipeline.Multimodal
    val frames = Array.tabulate(16)(f =>
      Array.tabulate(64)(i => (f * 37 + i * 11 + 3) % 256))
    val avi = Multimodal.renderDibAvi(frames, 8, 8)
    val st = Multimodal.decodeAvi(avi).get
    assert(st.width == 8 && st.height == 8 && st.nFrames == 16
      && st.usecPerFrame == 100000)
    // 8×8 gray frame → the 8×8 grid is the pixel bytes themselves
    (0 until 16).foreach { f =>
      val grid = Multimodal.aviFrameGrid(avi, st, f, 8)
      assert(grid.sameElements(frames(f).map(_.toDouble)), s"frame $f grid mismatch")
    }
    assert(Multimodal.sampleFrameIdx(16, 4).sameElements(Array(0, 4, 8, 12)))
    assert(Multimodal.sampleFrameIdx(3, 4).sameElements(Array(0, 1, 2)))
    val hashes = Multimodal.aviFrameHashes(avi, 4).get
    assert(hashes.map(_._1).sameElements(Array(0, 4, 8, 12)))
    hashes.foreach { case (f, h) =>
      assert(h == Multimodal.aHash(frames(f).map(_.toDouble)), s"frame $f hash")
    }
    // non-AVI payloads are rejected, not mis-parsed
    assert(Multimodal.decodeAvi(Multimodal.renderPcmWav(Array.fill(8)(0))).isEmpty)
  }

  test("engine video frame-sample and dedup match the arithmetic oracle forms") {
    import graft.pipeline.Multimodal
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__r10_video_docs")
    // materialize the bits relation first: the single-statement form
    // re-inlines the 64 pixel expressions through the self-join and
    // explodes at Spark plan time (DuckDB executes it fine)
    spark.sql(Multimodal.videoBitsSelectSql("__r10_video_docs")(SparkDialect))
      .localCheckpoint(eager = true).createOrReplaceTempView("__r10_video_bits")
    val directFrames = spark.sql(Multimodal.videoFramesTailSql("__r10_video_bits"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))).toSet
    val engineFrames = Multimodal.runVideoFrameSample(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))).toSet
    assert(engineFrames.nonEmpty)
    assert(engineFrames == directFrames,
      s"missing=${(directFrames -- engineFrames).take(3)} extra=${(engineFrames -- directFrames).take(3)}")
    val direct = spark.sql(Multimodal.videoPairsTailSql("__r10_video_bits"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val engine = Multimodal.runVideoDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(engine.nonEmpty, "fixture corpus produced no near-dup video pairs")
    assert(engine == direct,
      s"missing=${(direct -- engine).take(5)} extra=${(engine -- direct).take(5)}")
  }

  test("engine audio dedup (decode + band join) matches the all-pairs arithmetic oracle form") {
    import graft.pipeline.Multimodal
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__r10_audio_docs")
    val direct = spark.sql(Multimodal.audioPairsSql("__r10_audio_docs")(SparkDialect))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val engine = Multimodal.runAudioDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(engine.nonEmpty, "fixture corpus produced no near-dup audio pairs")
    assert(engine == direct,
      s"missing=${(direct -- engine).take(5)} extra=${(engine -- direct).take(5)}")
  }

  test("every queries entry has a matching oracleSql entry and vice versa") {
    // a missing oracle silently downgrades the driver's gate to a
    // rows-only check; a dangling oracle is dead weight
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("mixture sampling emits exactly the closed-form copy count per document") {
    import graft.pipeline.SourceMixture
    // recompute every doc's expected copies from the landed weights +
    // the md5 draw, independent of the SQL's lateral-series plumbing
    val uf = SourceMixture.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        math.round(r.getAs[Double]("upsample_factor") * 10000))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(docId: Long): Long = {
      md.reset()
      val hex = md.digest(s"mix:$docId".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 10000
    }
    val expected = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map { r =>
        val bp = uf(r.getString(1))
        r.getLong(0) -> (bp / 10000 + (if (draw(r.getLong(0)) < bp % 10000) 1 else 0))
      }.toMap
    val got = SourceMixture.runSample(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (id, g) =>
        // copies are a dense 0..n-1 series
        assert(g.map(_.getInt(2)).sorted.sameElements(0 until g.length), s"doc $id copies")
        id -> g.length.toLong
      }
    assert(got.values.sum > 0)
    expected.foreach { case (id, n) =>
      assert(got.getOrElse(id, 0L) == n, s"doc $id: expected $n copies, got ${got.getOrElse(id, 0L)}")
    }
  }

  test("curation ledger covers every document with a consistent first-cause") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val ledger = Selection.runLedger(spark, sfDir).collect()
    assert(ledger.length == docs.count())
    val byDisp = ledger.groupBy(_.getAs[String]("disposition"))
    assert(byDisp.keySet.subsetOf(
      Set("contaminated", "dup_loser", "gate_fail", "kept")))
    assert(byDisp.contains("kept"), "fixture corpus must keep something")
    // dup_loser rows are exactly the non-survivor cluster members not
    // already claimed by contamination
    val comp = spark.table(graft.pipeline.Dedup.clusterCompView(spark, sfDir))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cid")).toMap
    val contam = ledger.filter(_.getAs[String]("disposition") == "contaminated")
      .map(_.getAs[Long]("doc_id")).toSet
    val losers = ledger.filter(_.getAs[String]("disposition") == "dup_loser")
      .map(_.getAs[Long]("doc_id")).toSet
    val expectedLosers = comp.collect {
      case (id, cid) if id != cid && !contam.contains(id) => id
    }.toSet
    assert(losers == expectedLosers,
      s"missing=${(expectedLosers -- losers).take(5)} extra=${(losers -- expectedLosers).take(5)}")
    // kept rows pass the gate
    val gate = spark.table(graft.pipeline.QualityGate.outView(spark, sfDir))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("keep")).toMap
    ledger.filter(_.getAs[String]("disposition") == "kept").foreach { r =>
      assert(gate(r.getAs[Long]("doc_id")) == 1,
        s"kept doc ${r.getAs[Long]("doc_id")} fails the gate")
    }
  }
}
