package graft

/** Round-13 adaptive blocking: block resolution elected from corpus
  * size so bucket/block occupancy stays ~constant at any scale — the
  * fix for the fixed-resolution shapes the sf10 curve flagged
  * (embedding LSH planes, entity-match block digits, 64-bit hamming
  * candidate bands). Pins (1) the integer election boundaries,
  * bit-identical across the SQL and driver renderings, (2) the
  * plane-prefix property that makes the adaptive bucket a pure
  * refinement of the old fixed bucket, and (3) the output-invariance
  * of the hamming candidate scheme election. */
class AdaptiveBlockingSpec extends SparkSpec {

  test("adaptiveModCase elects the same modulus as the integer rule, at the boundaries") {
    import graft.pipeline.Similarity
    val probes = Seq[Long](0, 1, 500, 2000, 2048, 2049, 4096, 4097,
      100000, 1 << 20, 8L * (1L << 23), 8L * (1L << 23) + 1, Long.MaxValue / 4)
    val cases = probes.map { n =>
      s"SELECT $n AS n, ${Similarity.adaptiveModCase(n.toString)} AS bmod"
    }.mkString(" UNION ALL ")
    val got = spark.sql(cases).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    probes.foreach { n =>
      assert(got(n) == Similarity.adaptiveModFor(n),
        s"n=$n SQL elected ${got(n)}, driver rule says ${Similarity.adaptiveModFor(n)}")
    }
    // boundary semantics: occupancy target holds (n <= occ * bmod)
    // and the modulus is minimal above minP
    probes.filter(_ > 0).foreach { n =>
      val m = got(n)
      if (m < (1 << 24)) assert(n <= 8L * m, s"occupancy target violated at n=$n")
      if (m > (1 << 8)) assert(n > 8L * (m / 2), s"modulus not minimal at n=$n")
    }
  }

  test("the adaptive bucket is a pure refinement: low bits of the 24-plane bucket ARE the 8-plane bucket") {
    import graft.functions.BucketExpr
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val vec = Array.fill(64)(rnd.nextDouble() * 2 - 1)
      val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vec)
      val b24 = BucketExpr.compute(ad, 24, 64, aFloat = false)
      val b8 = BucketExpr.compute(ad, 8, 64, aFloat = false)
      assert((b24 & 255) == b8, "plane stream must be a sequential prefix")
    }
  }

  test("entity-match block digits: SQL CASE == driver rule across the boundaries") {
    import graft.pipeline.EntityMatch
    val probes = Seq[Long](0, 1, 1500, 15000, 80000, 80001, 800000,
      800001, 8000000L, 80000000L, 800000000L, 8000000000L, 8000000001L)
    val cases = probes.map { n =>
      s"SELECT CAST($n AS BIGINT) AS n, ${EntityMatch.blockDigitsCase(n.toString)} AS k"
    }.mkString(" UNION ALL ")
    val got = spark.sql(cases).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    probes.foreach { n =>
      assert(got(n) == EntityMatch.blockDigitsFor(n),
        s"n=$n SQL=${got(n)} driver=${EntityMatch.blockDigitsFor(n)}")
    }
    assert(EntityMatch.blockDigitsFor(1500) == 4, "oracle-scale width unchanged")
    assert(EntityMatch.blockDigitsFor(15000) == 4, "bench-scale width unchanged")
    assert(EntityMatch.blockDigitsFor(150000) == 5)
    assert(EntityMatch.blockDigitsFor(8000000001L) == 9, "cap at the digit tail")
  }

  test("minhash band geometry: SQL CASE == driver rule across the boundaries") {
    import graft.pipeline.Dedup
    val probes = Seq[Long](0, 1, 500, 5000, 50000, 1L << 18, (1L << 18) + 1,
      500000, 1L << 24, (1L << 24) + 1, 1L << 30, Long.MaxValue / 4)
    val cases = probes.map { n =>
      s"SELECT CAST($n AS BIGINT) AS n, ${Dedup.bandRowsCase(n.toString)} AS r, ${Dedup.bandCountCase(n.toString)} AS b"
    }.mkString(" UNION ALL ")
    val got = spark.sql(cases).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    probes.foreach { n =>
      assert(got(n) == Dedup.bandGeometryFor(n),
        s"n=$n SQL elected ${got(n)}, driver rule says ${Dedup.bandGeometryFor(n)}")
    }
    // fixture scales stay at the rung-0 design point (the oracle's form)
    assert(Dedup.bandGeometryFor(500) == ((3, 4)), "oracle-scale geometry unchanged")
    assert(Dedup.bandGeometryFor(50000) == ((3, 4)), "sf1-scale geometry unchanged")
    assert(Dedup.bandGeometryFor(500000) == ((4, 6)), "sf10 elects rung 1")
    assert(Dedup.bandGeometryFor(1L << 30) == ((5, 10)), "web scale elects the top rung")
    // every rung preserves the S-curve midpoint (1/b)^(1/r) within 2%
    // of the 0.5-threshold design point
    (Dedup.BandLadder.map(_._1) :+ Dedup.BandLadderTop).foreach { case (r, b) =>
      val mid = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(mid - 0.63) < 0.02, s"rung ($r,$b) midpoint $mid drifted")
    }
  }

  test("minhash at a forced higher rung: verified pairs stay within truth, recall measured") {
    import graft.pipeline.Dedup
    import graft.oracle.SparkDialect
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__adap_mh_docs")
    // truth = the exact-Jaccard pair relation (geometry-free)
    val truth = spark.sql(Dedup.jaccardSql("__adap_mh_docs")(SparkDialect))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def pairsAt(geom: (Int, Int)): Set[(Long, Long)] =
      spark.sql(Dedup.minhashSql("__adap_mh_docs", 0.5, geom)(SparkDialect))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rung0 = pairsAt((3, 4))
    val rung1 = pairsAt((4, 6))
    val rung2 = pairsAt(graft.pipeline.Dedup.BandLadderTop)
    // the verify gate means NO rung can emit a non-truth pair
    assert(rung0.subsetOf(truth) && rung1.subsetOf(truth) &&
      rung2.subsetOf(truth),
      "a banded candidate passed verification but is not a true pair")
    // recall holds at the deeper rung on the fixture: the wider-band
    // AND is compensated by more bands (the S-curve midpoint is pinned)
    val recall0 = if (truth.isEmpty) 1.0 else rung0.size.toDouble / truth.size
    val recall1 = if (truth.isEmpty) 1.0 else rung1.size.toDouble / truth.size
    assert(truth.nonEmpty, "fixture must plant true near-dup pairs")
    assert(recall1 >= recall0 - 0.1,
      s"rung-1 recall $recall1 collapsed vs rung-0 $recall0")
    // and the harness itself reports the same numbers (same geometry)
    val rep = spark.sql(Dedup.lshRecallSql("__adap_mh_docs", 0.5, (4, 6))(SparkDialect))
      .collect().head
    assert(rep.getLong(0) == truth.size.toLong,
      "recall harness truth count drifted from the exact pair relation")
  }

  test("LSH stack: marginal yield per table is consistent and cumulative counts are monotone") {
    val rows = graft.pipeline.Dedup.runEmbeddingStack(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1 to graft.pipeline.Dedup.StackTables),
      "one row per stacked table count")
    // cumulative = running sum of marginals, and never decreases
    var run = 0L
    rows.foreach { case (r, cum, marg) =>
      run += marg
      assert(cum == run, s"table $r cumulative $cum != running marginal sum $run")
      assert(marg >= 0)
    }
    // table 1 alone must find at least one pair on the fixture (the
    // entry is not vacuous) and equals the running total at r=1
    assert(rows.head._2 > 0, "stack entry surfaced no pairs at table 1")
    // stacking can only add pairs: engine result equals the dual-
    // rendered Spark SQL form with the same driver-elected modulus
    val n = graft.core.Tables.load(spark, sfDir, "embeddings").count()
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("__adap_stack_sql")
    val viaSql = spark.sql(graft.pipeline.Dedup.embeddingStackSql(
      "__adap_stack_sql", nOverride = Some(n))(graft.oracle.SparkDialect))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(viaSql.toSeq == rows.toSeq,
      "landed-relation body drifted from the single-statement rendering")
  }

  test("stacked semantic decontamination: R tables strictly contain table 1's pairs") {
    import graft.pipeline.Dedup
    import graft.oracle.SparkDialect
    graft.core.Tables.load(spark, sfDir, "embeddings")
      .createOrReplaceTempView("__adap_decon")
    val n = spark.table("__adap_decon").count()
    def pairsAt(tables: Int): Set[(Long, Long)] =
      spark.sql(Dedup.decontaminateSemanticSql("__adap_decon",
        nOverride = Some(n), tables = tables)(SparkDialect))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairsAt(1)
    val stacked = pairsAt(Dedup.DecontamTables)
    // stacking can only ADD leak pairs — that is the recall guarantee
    // the contamination gate ships with
    assert(one.subsetOf(stacked),
      s"stack lost ${(one -- stacked).size} of table 1's pairs")
    assert(one.nonEmpty, "fixture must surface leak candidates at table 1")
    assert(stacked.size >= one.size)
    // the disjoint plane ranges must fit the native WIDE bucket
    assert(Dedup.DecontamTables * Dedup.DecontamPlanesPerTable <=
      graft.pipeline.Similarity.AdaptiveMaxPlanesLong,
      "plane ranges overflow the wide bucket")
    // the yield-curve entry closes against the pair entry: cumulative
    // at table 1 = table-1 pairs, cumulative at R = the stacked total,
    // marginals sum to it
    val curve = Dedup.runDecontaminateStack(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(curve.map(_._1).toSeq == (1 to Dedup.DecontamTables))
    assert(curve.head._2 == one.size.toLong,
      s"curve table-1 cumulative ${curve.head._2} != table-1 pairs ${one.size}")
    assert(curve.last._2 == stacked.size.toLong,
      s"curve total ${curve.last._2} != stacked pairs ${stacked.size}")
    assert(curve.map(_._3).sum == curve.last._2, "marginals must sum to the total")
  }

  test("embedding index lands + reads back with its frozen modulus (the Runner index stage's contract)") {
    val spark2 = spark
    import spark2.implicits._
    val (index, bmod) = graft.pipeline.Dedup.embeddingIndex(spark, sfDir)
    // the modulus is the election over the corpus count — a property of
    // the index, recomputable by any later session from the meta row
    val n = graft.core.Tables.load(spark, sfDir, "embeddings").count()
    assert(bmod == graft.pipeline.Similarity.adaptiveModFor(n, occ = 8))
    val dir = java.nio.file.Files.createTempDirectory("graft_embidx").toString
    index.write.mode("overwrite").parquet(s"$dir/embedding_index")
    Seq((bmod, graft.pipeline.Similarity.AdaptiveMaxPlanes))
      .toDF("bmod", "max_planes")
      .write.mode("overwrite").parquet(s"$dir/embedding_index_meta")
    val back = spark.read.parquet(s"$dir/embedding_index")
    val metaBack = spark.read.parquet(s"$dir/embedding_index_meta")
      .as[(Int, Int)].collect().head
    assert(metaBack == ((bmod, graft.pipeline.Similarity.AdaptiveMaxPlanes)))
    // row-identical round trip: (vec_id, bucket) pairs survive landing
    val a = index.selectExpr("vec_id", "bucket")
      .as[(Long, Int)].collect().toSet
    val b = back.selectExpr("vec_id", "bucket")
      .as[(Long, Int)].collect().toSet
    assert(a == b && a.size == n, "landed index drifted from the session index")
  }

  test("streaming embedding dedup replays to the batch pair relation, symmetrized") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the landed index freezes the adaptive modulus; the full corpus
    // replayed as the stream must rediscover exactly the batch entry's
    // verified pairs — once per endpoint (stream probes only the
    // static corpus side)
    val (index, bmod) = graft.pipeline.Dedup.embeddingIndex(spark, sfDir)
    val vecRows = graft.core.Tables.load(spark2, sfDir, "embeddings",
        parallelize = false)
      .selectExpr("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toSeq
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.StreamMonitors.ingestEmbeddingDedup(
        in.toDF().toDF("vec_id", "embedding"), index, bmod)
      .writeStream.format("memory").queryName("emb_dedup_stream")
      .outputMode("append").start()
    val out = try {
      in.addData(vecRows.take(vecRows.size / 2): _*); q.processAllAvailable()
      in.addData(vecRows.drop(vecRows.size / 2): _*); q.processAllAvailable()
      spark.table("emb_dedup_stream")
        .select("batch_vec_id", "corpus_vec_id", "cosine")
        .as[(Long, Long, Double)].collect().toSeq
    } finally q.stop()
    val batch = graft.pipeline.Dedup.runEmbeddingLsh(spark, sfDir)
      .select("vec_a", "vec_b", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
    val streamPairs = out.map { case (a, b, c) =>
      (math.min(a, b), math.max(a, b), c)
    }
    assert(streamPairs.toSet == batch.toSet,
      s"stream found ${streamPairs.toSet.size} pairs, batch ${batch.size}")
    // symmetrized exactly: every unordered pair once per endpoint
    assert(out.size == 2 * batch.size,
      s"expected each pair twice (once per probing endpoint): ${out.size} vs 2×${batch.size}")
  }

  test("streaming entity match replays to the batch candidate relation") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.pipeline.EntityMatch
    graft.core.Tables.load(spark, sfDir, "customer")
      .createOrReplaceTempView("__adap_em_cust")
    val n = spark.table("__adap_em_cust").count()
    val digits = EntityMatch.blockDigitsFor(n)
    val clean = EntityMatch.cleanDf(spark, "__adap_em_cust", digits)
      .localCheckpoint(true)
    val dirtyRows = spark.sql(EntityMatch.dirtySql("__adap_em_cust"))
      .selectExpr("src_id", "c_nationkey", "variant_class", "dirty_name")
      .as[(Long, Int, Int, String)].collect().toSeq
    val in = MemoryStream[(Long, Int, Int, String)]
    val q = graft.streaming.StreamMonitors.ingestEntityMatch(
        in.toDF().toDF("src_id", "c_nationkey", "variant_class", "dirty_name"),
        clean, digits)
      .writeStream.format("memory").queryName("em_stream")
      .outputMode("append").start()
    val out = try {
      in.addData(dirtyRows.take(dirtyRows.size / 2): _*); q.processAllAvailable()
      in.addData(dirtyRows.drop(dirtyRows.size / 2): _*); q.processAllAvailable()
      spark.table("em_stream")
        .as[(Long, Int, Long, Long)].collect().toSeq
    } finally q.stop()
    // the batch path's pre-election candidate set, same frozen width
    val batch = EntityMatch.dirtyDf(spark, "__adap_em_cust", digits)
      .join(clean, Seq("blk_key"))
      .selectExpr("src_id", "variant_class", "c_custkey",
        "CAST(LEVENSHTEIN(LOWER(dirty_name), LOWER(c_name)) AS BIGINT) AS d")
      .where("d <= 2")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(out.toSet == batch.toSet && out.size == batch.size,
      s"stream candidates ${out.size} != batch ${batch.size}")
    // every dirty record's true match is among the streamed candidates
    assert(dirtyRows.map(_._1).forall(id => out.exists(c => c._1 == id && c._3 == id)),
      "a true match fell out of the streamed candidate set")
  }

  test("the 14 AG(3,2) hyperplanes cover every dirty-band triple (exhaustive)") {
    // dropped set of plane (a,b) = bands x with parity(a&x) == b; the
    // cover guarantee needs every ≤3-subset of {0..7} inside some
    // dropped set — exhaustively checked, not argued
    val planes = for (a <- 1 until 8; b <- 0 until 2)
      yield (0 until 8).filter(x => Integer.bitCount(a & x) % 2 == b).toSet
    assert(planes.size == 14 && planes.forall(_.size == 4))
    for (i <- 0 until 8; j <- i until 8; k <- j until 8) {
      val d = Set(i, j, k)
      assert(planes.exists(d.subsetOf(_)),
        s"dirty bands $d not covered by any hyperplane")
    }
  }

  test("hamming candidate schemes are output-identical; the AG(3,2) cover catches 3 dirty bits in 3 different bands") {
    val spark2 = spark
    import spark2.implicits._
    // planted relation: base hashes + variants at hamming 1..4, with
    // the hamming-3 case spreading its dirty bits across THREE
    // different byte-bands (bits 2, 21, 58 → bands 0, 2, 7) — the
    // worst case for a covering scheme (no two errors share a band;
    // covered by the a=5, b=0 hyperplane)
    val rnd = new scala.util.Random(13)
    val base = (0 until 40).map(i => (i * 10L, rnd.nextLong()))
    val variants = base.flatMap { case (id, h) =>
      Seq(
        (id + 1, h ^ 1L), // hamming 1
        (id + 2, h ^ ((1L << 2) | (1L << 21) | (1L << 58))), // hamming 3, 3 bands
        (id + 3, h ^ ((1L << 7) | (1L << 8) | (1L << 63) | (1L << 31))) // hamming 4: excluded
      )
    }
    (base ++ variants).toDF("id", "h").createOrReplaceTempView("__adap_ham")
    val small = spark.sql(
      graft.pipeline.Multimodal.hammingPairsSql("__adap_ham", "h", nIds = 100))
    val large = spark.sql(
      graft.pipeline.Multimodal.hammingPairsSql("__adap_ham", "h",
        nIds = graft.pipeline.Multimodal.HammingElectBound + 1))
    assert(small.queryExecution.executedPlan.toString != null)
    val a = small.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = large.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b, "candidate scheme must not change the verified output")
    base.foreach { case (id, _) =>
      assert(b.exists(p => p._1 == id && p._2 == id + 2 && p._3 == 3),
        s"worst-case 3-band hamming-3 pair ($id, ${id + 2}) missed")
      assert(!b.exists(p => p._2 == id + 3 && p._1 == id),
        s"hamming-4 pair ($id, ${id + 3}) must not pass the verify gate")
    }
  }
}
