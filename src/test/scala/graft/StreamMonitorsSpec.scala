package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamMonitors

/** Top-level so Spark can generate an Encoder without an outer scope. */
final case class Ev(event_id: Long, ts: Timestamp, event_type: String)
final case class SessEv(event_id: Long, user_id: Long, ts: Timestamp, value: Double)
final case class Doc(doc_id: Long, ts: Timestamp, text: String)
final case class GateDoc(doc_id: Long, text: String)

/** Structured Streaming monitors exercised through MemoryStream sources
  * and checked against their batch equivalents. */
class StreamMonitorsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming daily volume matches the batch aggregation") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = Seq(
      Ev(1, ts("2026-01-01 10:00:00"), "click"),
      Ev(2, ts("2026-01-01 11:00:00"), "click"),
      Ev(3, ts("2026-01-01 12:00:00"), "view"),
      Ev(4, ts("2026-01-02 09:00:00"), "click"),
      Ev(5, ts("2026-01-05 09:00:00"), "click")) // advances watermark past day 2
    val q = StreamMonitors.dailyVolume(input.toDF())
      .writeStream.format("memory").queryName("vol_stream")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // day 1 and 2 windows are closed by the day-5 watermark advance
      val streamed = spark.table("vol_stream")
        .select("series", "day", "ct").as[(String, java.sql.Date, Long)]
        .collect().toSet
      val batch = StreamMonitors.dailyVolume(events.toDF())
        .as[(String, java.sql.Date, Long)].collect()
        .filter(_._2.toString < "2026-01-05").toSet
      assert(batch.subsetOf(streamed) || streamed == batch)
      assert(streamed.contains(("click", java.sql.Date.valueOf("2026-01-01"), 2L)))
      assert(streamed.contains(("view", java.sql.Date.valueOf("2026-01-01"), 1L)))
    } finally q.stop()
  }

  test("streaming exact dedup drops repeated content within the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamMonitors.dedupExact(input.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, ts("2026-01-01 10:00:00"), "alpha"),
        Doc(2, ts("2026-01-01 10:05:00"), "beta"),
        Doc(3, ts("2026-01-01 10:10:00"), "alpha")) // dup inside watermark
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("text").as[String]
        .collect().sorted
      assert(kept.toSeq == Seq("alpha", "beta"))
      // batch path groups identically
      val batch = StreamMonitors.dedupExact(Seq(
        Doc(1, ts("2026-01-01 10:00:00"), "alpha"),
        Doc(2, ts("2026-01-01 10:05:00"), "beta"),
        Doc(3, ts("2026-01-01 10:10:00"), "alpha")).toDF())
      assert(batch.count() == 2)
    } finally q.stop()
  }

  test("streaming freshness fingerprint tracks the running max") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamMonitors.freshness(input.toDF())
      .writeStream.format("memory").queryName("fresh_stream")
      .outputMode("complete").start()
    try {
      input.addData(Ev(1, ts("2026-01-01 10:00:00"), "click"))
      q.processAllAvailable()
      val fp1 = spark.table("fresh_stream")
        .where($"series" === "click").select("fingerprint").as[String].head()
      input.addData(Ev(9, ts("2026-01-03 10:00:00"), "click"))
      q.processAllAvailable()
      val row = spark.table("fresh_stream").where($"series" === "click")
        .select("max_id", "fingerprint").as[(Long, String)].head()
      assert(row._1 == 9L)
      assert(row._2 != fp1) // new data ⇒ fingerprint changed
      // fingerprint formula matches the batch monitor's md5(concat)
      val expected = spark.sql(
        "SELECT md5(concat_ws('|', '9', '2026-01-03 10:00:00'))").as[String].head()
      assert(row._2 == expected)
    } finally q.stop()
  }

  test("gap alerts flag series whose update gap exceeds the threshold") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamMonitors.SeriesEvent]
    val q = StreamMonitors.gapAlerts(input.toDS(), thresholdMinutes = 60)
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode("append").start()
    try {
      input.addData(StreamMonitors.SeriesEvent("orders", ts("2026-01-01 10:00:00")))
      q.processAllAvailable()
      input.addData(StreamMonitors.SeriesEvent("orders", ts("2026-01-01 10:30:00")))
      q.processAllAvailable()
      input.addData(StreamMonitors.SeriesEvent("orders", ts("2026-01-01 14:00:00")))
      q.processAllAvailable()
      val alerts = spark.table("gap_stream")
        .select("series", "gap_minutes", "stale")
        .as[(String, Long, Boolean)].collect().toSeq
      assert(alerts.contains(("orders", 0L, false)))   // first sighting
      assert(alerts.contains(("orders", 30L, false)))  // within threshold
      assert(alerts.contains(("orders", 210L, true)))  // 3.5h gap > 60min
    } finally q.stop()
  }

  test("adaptive gap alerts learn per-series thresholds from keyed state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamMonitors.SeriesEvent]
    val q = StreamMonitors.adaptiveGapAlerts(input.toDS())
      .writeStream.format("memory").queryName("adaptive_gap_stream")
      .outputMode("append").start()
    try {
      // hourly cadence, one event per batch so state accumulates history
      val base = "2026-03-02"
      (10 to 16).foreach { h =>
        input.addData(StreamMonitors.SeriesEvent("orders", ts(f"$base $h%02d:00:00")))
        q.processAllAvailable()
      }
      // now an 8-hour silence — far beyond the learned ~60-minute cadence
      input.addData(StreamMonitors.SeriesEvent("orders", ts("2026-03-03 00:00:00")))
      q.processAllAvailable()
      val rows = spark.table("adaptive_gap_stream")
        .select("series", "gap_minutes", "threshold_minutes", "stage", "stale")
        .as[(String, Double, Option[Double], String, Boolean)].collect().toSeq
      // early sightings: not enough PRIOR completed gaps -> training
      assert(rows.take(6).forall(r => r._4 == "training" && r._3.isEmpty && !r._5))
      // once the prior history holds >= 5 gaps the series turns active
      // with a learned threshold: p95 of hourly gaps = 60, floor
      // 60 * 1.25 = 75 minutes — learned BEFORE the arriving event, so
      // a long gap cannot raise its own threshold
      val active = rows.filter(_._4 == "active")
      assert(active.nonEmpty)
      assert(active.forall(_._3.contains(75.0)), active)
      // the in-cadence active arrival is not stale; the 8-hour gap is
      assert(active.exists(r => r._2 == 60.0 && !r._5))
      assert(active.exists(r => r._2 == 480.0 && r._5), active)
    } finally q.stop()
  }

  /** Batch-parity oracle anchor: the streaming surface replayed over the
    * GATE FIXTURE must reproduce the oracle-checked batch relations —
    * dailyVolume vs the daily sub-relation the hash-green
    * monitor_volume_bands oracle aggregates (Monitors.volumeBandsSql's
    * `daily` CTE), and dedupExact vs the hash-green dedup_exact
    * duplicate groups — promoting the streaming extension from
    * spec-only to oracle-anchored. */
  test("streaming text quality gate matches the oracle-checked batch metrics") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docRows = graft.core.Tables.load(spark2, dir, "documents", parallelize = false)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = StreamMonitors.textQuality(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("tq_fixture")
      .outputMode("append").start()
    val streamed = try {
      input.addData(docRows: _*)
      q.processAllAvailable()
      spark.table("tq_fixture")
        .selectExpr("doc_id", "quality_score", "lang_guess", "fingerprint")
        .as[(Long, Double, String, String)].collect().toSet
    } finally q.stop()
    // the batch relation IS the hash-green text_analysis entry
    val batch = graft.pipeline.TextAnalysis.run(spark2, dir)
      .selectExpr("doc_id", "quality_score", "lang_guess", "fingerprint")
      .as[(Long, Double, String, String)].collect().toSet
    assert(streamed == batch,
      "streaming quality metrics differ from the oracle-checked batch")
  }

  test("streaming volume and dedup reproduce the oracle-checked batch relations") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"

    // ---- daily volume over the fixture events
    val evRows = graft.core.Tables.load(spark2, dir, "events", parallelize = false)
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
      .as[Ev].collect().toSeq
    val input = MemoryStream[Ev]
    val q = StreamMonitors.dailyVolume(input.toDF())
      .writeStream.format("memory").queryName("vol_fixture")
      .outputMode("append").start()
    val streamed = try {
      input.addData(evRows: _*)
      q.processAllAvailable()
      spark.table("vol_fixture").select("series", "day", "ct")
        .as[(String, java.sql.Date, Long)].collect().toSet
    } finally q.stop()
    val batch = StreamMonitors.dailyVolume(evRows.toDF())
      .as[(String, java.sql.Date, Long)].collect().toSet
    // the batch relation IS the oracle-checked daily shape
    graft.core.Tables.load(spark2, dir, "events", parallelize = false)
      .createOrReplaceTempView("__sm_events")
    val oracleDaily = spark.sql(
      """SELECT event_type AS series, CAST(ts AS DATE) AS day,
        |       COUNT(*) AS ct
        |  FROM __sm_events GROUP BY 1, 2""".stripMargin)
      .as[(String, java.sql.Date, Long)].collect().toSet
    assert(batch == oracleDaily)
    // every window the stream emitted matches the batch relation, and
    // every window safely past the 2-day watermark horizon was emitted
    assert(streamed.subsetOf(batch), "stream emitted a row batch lacks")
    val maxDay = evRows.map(_.ts.getTime).max
    val closed = batch.filter(_._2.getTime < maxDay - 3L * 86400 * 1000)
    assert(closed.nonEmpty && closed.subsetOf(streamed),
      "a closed window was never emitted")

    // ---- exact dedup over the fixture documents (ts synthesized inside
    // one watermark horizon so cross-corpus duplicates all collapse)
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val docRows = graft.core.Tables.load(spark2, dir, "documents", parallelize = false)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, text) => Doc(id, new Timestamp(base + id), text) }
    val dIn = MemoryStream[Doc]
    val dq = StreamMonitors.dedupExact(dIn.toDF())
      .writeStream.format("memory").queryName("dedup_fixture")
      .outputMode("append").start()
    val keptHashes = try {
      dIn.addData(docRows: _*)
      dq.processAllAvailable()
      spark.table("dedup_fixture").select("content_hash").as[String]
        .collect().toSeq
    } finally dq.stop()
    val batchKept = StreamMonitors.dedupExact(docRows.toDF())
      .select("content_hash").as[String].collect().toSeq
    assert(keptHashes.sorted == batchKept.sorted,
      "streaming kept set differs from the batch dedup")
    // oracle anchor: rows dropped == sum(dupe_ct - 1) over the
    // hash-green dedup_exact duplicate-group relation
    val dupExcess = graft.pipeline.Dedup.runExact(spark2, dir)
      .selectExpr("CAST(SUM(dupe_ct - 1) AS BIGINT)")
      .collect()(0)
    val dropped = docRows.size - keptHashes.size
    assert(dropped == (if (dupExcess.isNullAt(0)) 0L else dupExcess.getLong(0)),
      s"dropped $dropped rows but the dedup_exact relation implies ${dupExcess}")
  }

  test("streaming ingest gate matches the batch rules on a fixture replay") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => GateDoc(r.getLong(0), r.getString(1)))
    // eval-set fingerprints from the memoized (oracle-anchored) fps view
    val fpsV = graft.pipeline.Dedup.winnowFpsView(spark, sfDir)
    val evalFps = spark.sql(
      s"SELECT DISTINCT fp FROM $fpsV WHERE id % ${graft.pipeline.Dedup.EvalMod} = 0")
      .as[Long].collect()
    val input = MemoryStream[GateDoc]
    val q = StreamMonitors.ingestGate(input.toDF(), evalFps)
      .writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").start()
    val out = try {
      input.addData(docs.toIndexedSeq: _*)
      q.processAllAvailable()
      spark.table("gate_stream").collect()
    } finally q.stop()
    assert(out.length == docs.length)
    // contamination anchor: exactly the docs sharing >= 1 fingerprint
    // with the eval split, recomputed in batch from the same fps view
    val expectedContam = spark.sql(
      s"""SELECT DISTINCT a.id FROM $fpsV a JOIN $fpsV b
         |    ON a.fp = b.fp AND b.id % ${graft.pipeline.Dedup.EvalMod} = 0""".stripMargin)
      .as[Long].collect().toSet
    val streamedContam = out.filter(_.getAs[Int]("contaminated") == 1)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(streamedContam == expectedContam)
    // quality-flag anchor: identical to the hash-green batch gate
    val batchGate = graft.pipeline.QualityGate.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.foreach { r =>
      val b = batchGate(r.getAs[Long]("doc_id"))
      for (f <- Seq("too_short", "too_long", "low_quality"))
        assert(r.getAs[Int](f) == b.getAs[Int](f),
          s"flag $f drifted for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("streaming dsir scorer replays bit-identical to the batch relation") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val weights = graft.pipeline.Selection.dsirWeightMap(spark, sfDir)
    val cands = graft.core.Tables.load(spark, sfDir, "documents")
      .where(s"source <> '${graft.pipeline.Selection.TargetSource}'")
      .select("doc_id", "text").collect()
      .map(r => GateDoc(r.getLong(0), r.getString(1)))
    val input = MemoryStream[GateDoc]
    val q = StreamMonitors.ingestDsirScore(input.toDF(), weights)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    val out = try {
      input.addData(cands.toIndexedSeq: _*)
      q.processAllAvailable()
      spark.table("dsir_stream").collect()
    } finally q.stop()
    val batch = graft.pipeline.Selection.runDsir(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("token_ct"), r.getAs[Long]("dsir_score"))).toMap
    assert(out.length == batch.size)
    out.foreach { r =>
      val (tk, sc) = batch(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("token_ct") == tk)
      assert(r.getAs[Long]("dsir_score") == sc,
        s"score drifted for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("streaming incremental-ingest dedup matches the oracle near relation") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    // landed relations from the memoized (oracle-anchored) fps view —
    // run N-1's landed state; only the batch split streams in
    val fpsV = Dedup.winnowFpsView(spark, sfDir)
    val landedFps = spark.sql(
      s"SELECT id, fp FROM $fpsV WHERE id % ${Dedup.BatchMod} <> ${Dedup.BatchRem}")
    val batchDocs = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % Dedup.BatchMod === Dedup.BatchRem)
      .select("doc_id", "text").collect()
      .map(r => GateDoc(r.getLong(0), r.getString(1)))
    val input = MemoryStream[GateDoc]
    val q = StreamMonitors.ingestDedupIncremental(input.toDF(), landedFps)
      .writeStream.format("memory").queryName("inc_dedup_stream")
      .outputMode("complete").start()
    val streamed = try {
      input.addData(batchDocs.toIndexedSeq: _*)
      q.processAllAvailable()
      spark.table("inc_dedup_stream").collect()
        .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"),
          r.getAs[Long]("shared_fp_ct"))).toSet
    } finally q.stop()
    // anchor: the un-truncated near-hit relation behind the
    // oracle-checked dedup_incremental entry (which presents its top
    // slice), recomputed from the same landed fps view
    val expected = spark.sql(Dedup.incrementalHitsSql(fpsV)).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"),
        r.getAs[Long]("shared_fp_ct"))).toSet
    assert(expected.nonEmpty, "fixture produced no near hits to anchor on")
    assert(streamed == expected,
      s"streamed hits ${streamed.size} != batch near rows ${expected.size}")
  }

  test("streaming session windows match the batch gap sessions") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: one session — a gap of EXACTLY 30 min merges (the
    // session_window at-the-bound rule the batch SQL mirrors);
    // user 2: one session, events 29 min apart;
    // user 3: two sessions split by a 31-min gap (> bound)
    val evs = Seq(
      SessEv(1, 1, t("2026-01-01 10:00:00"), 1.25),
      SessEv(2, 1, t("2026-01-01 10:10:00"), 2.50),
      SessEv(3, 1, t("2026-01-01 10:40:00"), 4.00), // exactly +30 → merged
      SessEv(4, 2, t("2026-01-01 09:00:00"), 1.00),
      SessEv(5, 2, t("2026-01-01 09:29:00"), 1.00),
      SessEv(6, 3, t("2026-01-01 08:00:00"), 2.00),
      SessEv(7, 3, t("2026-01-01 08:31:00"), 3.00), // +31 → new session
      // sentinel far ahead advances the watermark so all windows close
      SessEv(8, 9, t("2026-01-02 10:00:00"), 0.0))
    val input = MemoryStream[SessEv]
    val q = graft.streaming.Sessions.streamingSessions(input.toDF())
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    val streamed = try {
      input.addData(evs.toIndexedSeq: _*)
      q.processAllAvailable()
      spark.table("sess_stream").collect()
        .filter(_.getAs[Long]("user_id") != 9L)
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start").toString.stripSuffix(".0"),
          r.getAs[Timestamp]("session_end").toString.stripSuffix(".0"),
          r.getAs[Long]("event_ct"), r.getAs[Long]("value_cents"))).toSet
    } finally q.stop()
    // anchor: the oracle-checked batch SQL over the same events
    evs.filter(_.user_id != 9).toDF()
      .createOrReplaceTempView("__graft_sess_spec")
    val batch = spark.sql(
      graft.streaming.Sessions.sql("__graft_sess_spec")(graft.oracle.SparkDialect))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("session_start"), r.getAs[String]("session_end"),
        r.getAs[Long]("event_ct"), r.getAs[Long]("value_cents"))).toSet
    assert(batch.size == 4, s"expected 4 batch sessions, got $batch")
    assert(streamed == batch,
      s"streaming sessions $streamed != batch sessions $batch")
  }

  test("streaming funnel advances match the batch step counts on replay") {
    import graft.streaming.EventAnalytics
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the real fixture, replayed in one ordered batch
    val evs = graft.core.Tables.load(spark, sfDir, "events")
      .selectExpr("user_id", "ts", "event_type").as[EventAnalytics.FunnelEvent]
      .collect().sortBy(_.ts.getTime)
    val input = MemoryStream[EventAnalytics.FunnelEvent]
    val q = EventAnalytics.streamingFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    val advances = try {
      input.addData(evs.toIndexedSeq: _*)
      q.processAllAvailable()
      spark.table("funnel_stream").collect()
    } finally q.stop()
    val streamedCounts = advances.groupBy(_.getAs[Int]("step_idx"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("user_id")).distinct.length }
    val batch = EventAnalytics.runFunnel(spark, sfDir).collect()
      .map(r => r.getAs[Int]("step_idx") -> r.getAs[Long]("user_ct").toInt)
      .toMap
    assert(batch.nonEmpty && batch(0) > 0)
    assert(streamedCounts == batch,
      s"streaming funnel $streamedCounts != batch $batch")
  }

  test("streaming index ingestion lands rows identical to the batch assignment") {
    import graft.pipeline.Similarity
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seeds = Similarity.indexSeeds(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("seed_id"),
        r.getAs[scala.collection.Seq[Float]]("centroid").toSeq)).toSeq
    assert(seeds.nonEmpty)
    val vecs = graft.core.Tables.load(spark, sfDir, "embeddings", parallelize = false)
      .selectExpr("vec_id", "label", "embedding").as[Similarity.VecIn]
      .collect().toSeq
    val (a, b) = vecs.splitAt(vecs.length / 2)
    val input = MemoryStream[Similarity.VecIn]
    val q = Similarity.streamingIndexIngest(input.toDS(), seeds)
      .writeStream.format("memory").queryName("ingest_stream")
      .outputMode("append").start()
    val streamed = try {
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      spark.table("ingest_stream")
        .select("vec_id", "seed_id", "bucket")
        .as[(Long, Long, Int)].collect().toSet
    } finally q.stop()
    val batch = Similarity.indexBase(spark, sfDir)
      .select("vec_id", "seed_id", "bucket")
      .as[(Long, Long, Int)].collect().toSet
    assert(batch.nonEmpty && streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size} assignments differ")
  }

  test("streaming rate anomalies match the batch screen on a two-chunk replay") {
    import graft.streaming.EventAnalytics
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // sf0.01 has a dense-enough hour grid to produce real anomalies
    val dir = "/root/testdata/sf0.01"
    val evs = graft.core.Tables.load(spark, dir, "events", parallelize = false)
      .selectExpr("ts", "event_type").as[EventAnalytics.RateEvent]
      .collect().sortBy(_.ts.getTime)
    val (first, second) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[EventAnalytics.RateEvent]
    val q = EventAnalytics.streamingRateAnomalies(input.toDS())
      .writeStream.format("memory").queryName("rate_stream")
      .outputMode("append").start()
    val streamed = try {
      input.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      spark.table("rate_stream").collect()
    } finally q.stop()
    val skey = streamed.map(r => (r.getAs[String]("event_type"),
      r.getAs[String]("hour_ts"), r.getAs[Long]("event_ct"),
      r.getAs[String]("direction"))).toSet
    // batch relation = the oracle-checked entry; drop each type's final
    // hour, which the stream cannot close without a later observation
    val batchRows = graft.streaming.EventAnalytics.runRateAnomaly(spark, dir).collect()
    def hourStr(epochHour: Long): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(epochHour * 3600000L))
    val lastHour = evs.groupBy(_.event_type).view
      .mapValues(es => hourStr(es.map(e =>
        Math.floorDiv(e.ts.getTime, 3600000L)).max)).toMap
    // 'yyyy-MM-dd HH:mm:ss' compares chronologically as a string
    val bkey = batchRows.filter { r =>
      r.getAs[String]("hour_ts") < lastHour(r.getAs[String]("event_type"))
    }.map(r => (r.getAs[String]("event_type"), r.getAs[String]("hour_ts"),
      r.getAs[Long]("event_ct"), r.getAs[String]("direction"))).toSet
    assert(bkey.nonEmpty, "fixture produced no batch anomalies")
    assert(skey == bkey, s"stream ${skey.size} vs batch ${bkey.size} alerts")
    // z-scores agree to rounding (batch uses Spark's STDDEV aggregate,
    // the stream a two-pass sample stddev — same estimator)
    val bz = batchRows.map(r => (r.getAs[String]("event_type"),
      r.getAs[String]("hour_ts")) -> r.getAs[Double]("z_score")).toMap
    streamed.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[String]("hour_ts"))
      assert(math.abs(r.getAs[Double]("z_score") - bz(k)) <= 0.011,
        s"z mismatch at $k")
    }
  }

  test("streaming profile totals replay bit-identical to the batch full recompute") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamMonitors.ProfileDoc
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => ProfileDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val (h1, h2) = docs.splitAt(docs.length / 3)
    val input = MemoryStream[ProfileDoc]
    val q = StreamMonitors.ingestProfileTotals(input.toDS())
      .writeStream.format("memory").queryName("profile_stream")
      .outputMode("append").start()
    val rows = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("profile_stream").collect()
    } finally q.stop()
    // the LAST emission per source is the running total after the
    // whole corpus streamed through
    val last = rows.groupBy(_.getAs[String]("source"))
      .map { case (s, g) => s -> g.maxBy(_.getAs[Long]("doc_ct")) }
    graft.core.Tables.load(spark, sfDir, "documents")
      .createOrReplaceTempView("__graft_profstream_full")
    val batch = spark.sql(graft.pipeline.IncrementalProfile
      .fullSql("__graft_profstream_full")(graft.oracle.SparkDialect)).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(last.keySet == batch.keySet)
    last.foreach { case (s, r) =>
      val b = batch(s)
      assert(r.getAs[Long]("doc_ct") == b.getAs[Long]("doc_ct"))
      assert(r.getAs[Long]("token_ct") == b.getAs[Long]("token_ct"),
        s"token drift for source $s")
      assert(r.getAs[Long]("char_ct") == b.getAs[Long]("char_ct"))
      assert(r.getAs[Double]("avg_chars") == b.getAs[Double]("avg_chars"))
    }
  }

  test("streaming gram maintenance replays bit-identical to the batch one-scan gram") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.EmbeddingAlgebra.VecRow
    val vecs = graft.core.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => VecRow(r.getLong(0), r.getSeq[Float](1)))
    val (h1, h2) = vecs.splitAt(vecs.length / 3)
    val input = MemoryStream[VecRow]
    val q = graft.streaming.StreamMonitors.ingestGram(input.toDS())
      .writeStream.format("memory").queryName("gram_stream")
      .outputMode("append").start()
    val rows = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("gram_stream").collect()
    } finally q.stop()
    // the LAST emission per cell is the running matrix after the whole
    // corpus streamed through
    val last = rows.groupBy(r => (r.getAs[Int]("i"), r.getAs[Int]("j")))
      .map { case (k, g) => k -> g.maxBy(_.getAs[Long]("n")) }
    val batch = graft.pipeline.EmbeddingAlgebra.runGram(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(last.keySet == batch.keySet,
      s"cells: stream ${last.size} vs batch ${batch.size}")
    last.foreach { case (k, r) =>
      val (sxy, sx, sy, n) = batch(k)
      assert(r.getAs[Long]("sxy") == sxy && r.getAs[Long]("sx") == sx &&
        r.getAs[Long]("sy") == sy && r.getAs[Long]("n") == n,
        s"cell $k drifted from the batch recompute")
    }
  }

  test("file-source job recovers from a mid-stream kill with exactly-once output") {
    // the durability shape MemoryStream can't exercise: a real file
    // source + file sink + checkpoint, killed between batches and
    // restarted on the SAME checkpoint — the offset log must skip the
    // already-committed input files and the sink's transaction log must
    // admit each output exactly once, landing bit-identical to batch
    val spark2 = spark
    import spark2.implicits._
    val weights = graft.pipeline.Selection.dsirWeightMap(spark, sfDir)
    val rows = graft.core.Tables.load(spark, sfDir, "documents")
      .where(s"source <> '${graft.pipeline.Selection.TargetSource}'")
      .select("doc_id", "text").collect()
      .map(r => GateDoc(r.getLong(0), r.getString(1)))
    val base = java.nio.file.Files
      .createTempDirectory("graft_stream_recovery").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    val (h1, h2) = rows.splitAt(rows.length / 2)
    h1.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(inDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def start() = StreamMonitors.ingestDsirScore(
      spark.readStream.schema(schema).parquet(inDir), weights)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // first incarnation processes the first half, then dies
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // the second half arrives while the job is down
    h2.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(inDir)
    // restart on the same checkpoint
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(outDir).collect()
    // exactly-once: every candidate exactly once, none reprocessed even
    // though the first incarnation's input files are still in the dir
    assert(out.length == rows.length,
      s"expected ${rows.length} rows exactly once, got ${out.length}")
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length,
      "restart reprocessed already-committed input")
    // and the recovered output is bit-identical to the batch relation
    val batch = graft.pipeline.Selection.runDsir(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("token_ct"), r.getAs[Long]("dsir_score"))).toMap
    out.foreach { r =>
      val (tk, sc) = batch(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("token_ct") == tk &&
        r.getAs[Long]("dsir_score") == sc,
        s"recovered score drifted for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("streaming perplexity gate is bit-identical to the batch scorer") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch relation first (also lands the model views the frozen
    // model reads); drop the corpus-relative tercile column — a stream
    // gates against a frozen cutoff instead
    val batch = graft.pipeline.Perplexity.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("oov_ct"),
         r.getAs[Long]("lp_micro"), r.getAs[Double]("ppl"))).toMap
    val (big, ctx, v) = graft.pipeline.Perplexity.frozenModel(spark, sfDir)
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[GateDoc].collect()
    val cutoff = batch.values.map(_._4).toSeq.sorted.apply(batch.size / 2)
    val input = MemoryStream[GateDoc]
    val q = StreamMonitors.ingestPerplexityScore(
      input.toDF(), big, ctx, v, cutoff)
      .writeStream.format("memory").queryName("ppl_stream")
      .outputMode("append").start()
    val out = try {
      input.addData(docs.toIndexedSeq: _*)
      q.processAllAvailable()
      spark.table("ppl_stream").collect()
    } finally q.stop()
    assert(out.length == docs.length)
    var admitted = 0
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, oov, lp, ppl) = batch(id)
      assert(r.getAs[Long]("n_tokens") == n && r.getAs[Long]("oov_ct") == oov,
        s"token/oov drift for doc $id")
      assert(r.getAs[Long]("lp_micro") == lp,
        s"micro-nat sum drifted for doc $id: ${r.getAs[Long]("lp_micro")} vs $lp")
      assert(r.getAs[Double]("ppl") == ppl, s"ppl drifted for doc $id")
      val adm = r.getAs[Int]("admitted")
      assert(adm == (if (ppl <= cutoff) 1 else 0), s"gate verdict wrong for doc $id")
      admitted += adm
    }
    // the median cutoff must admit roughly half — the gate actually gates
    assert(admitted > 0 && admitted < out.length)
  }

  test("streaming cusum replays the exact Page fold over closed days") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = graft.core.Tables.load(spark, sfDir, "events")
      .selectExpr("event_id", "ts", "event_type")
      .as[Ev].collect().sortBy(_.ts.getTime)
    // frozen reference: mean daily count per type over the whole fixture
    val daily = evs.groupBy(e => (e.event_type, e.ts.toLocalDateTime.toLocalDate))
      .view.mapValues(_.length.toLong).toMap
    val types = evs.map(_.event_type).distinct
    val params = types.map { t =>
      val cts = daily.collect { case ((tt, _), c) if tt == t => c }.toSeq
      val ref = cts.sum / cts.length
      t -> StreamMonitors.CusumParams(ref, math.max(1L, ref / 20), ref)
    }.toMap
    val (h1, h2) = evs.splitAt(evs.length / 3)
    val input = MemoryStream[Ev]
    val q = StreamMonitors.ingestCusum(input.toDF(), params)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    val out = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("cusum_stream")
        .as[StreamMonitors.CusumDay].collect()
    } finally q.stop()
    // expected: per type, EVERY calendar day from the first seen up to
    // (excluding) the last closes in order — gap days with zero events
    // included — through the identical integer Page recurrence
    types.foreach { t =>
      val days = daily.keys.collect { case (tt, d) if tt == t => d.toEpochDay.toInt }
        .toSeq.sorted
      val expectDays = (days.min until days.max).toSeq
      val got = out.filter(_.event_type == t).sortBy(_.epoch_day)
      assert(got.map(_.epoch_day).toSeq == expectDays,
        s"closed-day set drifted for $t")
      val p = params(t)
      var (hi, lo) = (0L, 0L)
      expectDays.zip(got).foreach { case (d, g) =>
        val ct = daily.getOrElse(
          (t, java.time.LocalDate.ofEpochDay(d.toLong)), 0L)
        hi = math.max(0L, hi + (ct - p.refCt) - p.slack)
        lo = math.min(0L, lo + (ct - p.refCt) + p.slack)
        val alert = hi > p.threshold || lo < -p.threshold
        assert(g.ct == ct && g.cusum_hi == hi && g.cusum_lo == lo &&
          g.alert == alert, s"$t day $d drifted: $g vs ($ct,$hi,$lo,$alert)")
        if (alert) { hi = 0L; lo = 0L }
      }
    }
  }

  test("streaming cusum closes silent days: a multi-day outage fires cusum_lo") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 5 normal days at 4/day, then a 4-day TOTAL outage, then one event
    // on day 10 — the outage days must close with ct=0 and drive the
    // lo side past the threshold even though no event ever arrives
    // inside the outage
    val evs = ((0 until 5).flatMap { day =>
      (0 until 4).map { i =>
        Ev(day * 100L + i, ts(f"2026-04-${day + 1}%02d 0${i + 1}:00:00"), "load")
      }
    } :+ Ev(1000L, ts("2026-04-10 05:00:00"), "load"))
    val input = MemoryStream[Ev]
    // refCt=4, slack=1: each silent day adds -(4-1) = -3 to lo;
    // threshold 8 crosses on the THIRD silent day (lo = -9)
    val params = Map("load" -> StreamMonitors.CusumParams(4L, 1L, 8L))
    val q = StreamMonitors.ingestCusum(input.toDF(), params)
      .writeStream.format("memory").queryName("cusum_outage")
      .outputMode("append").start()
    val out = try {
      input.addData(evs.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("cusum_outage")
        .as[StreamMonitors.CusumDay].collect().sortBy(_.epoch_day)
    } finally q.stop()
    assert(out.length == 9, s"days 1-9 close (10 stays open): ${out.length}")
    val silent = out.drop(5)
    assert(silent.map(_.ct).toSeq == Seq(0L, 0L, 0L, 0L),
      "outage days close with zero counts")
    assert(silent.map(_.cusum_lo).toSeq == Seq(-3L, -6L, -9L, -3L),
      s"lo recurrence drifted: ${silent.map(_.cusum_lo).toSeq}")
    assert(!silent(0).alert && !silent(1).alert && silent(2).alert,
      "the outage fires on the third silent day")
    assert(out.take(5).forall(d => !d.alert && d.ct == 4L))
  }

  test("streaming interval overlap replays row-identical to the batch join") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = graft.operators.IntervalJoin.BucketUs
    // static reference side: the same promo windows the batch operator derives
    val promos = graft.core.Tables.load(spark, sfDir, "events")
      .where($"event_type" === "signup")
      .selectExpr("event_id AS promo_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS s",
        s"unix_micros(CAST(ts AS TIMESTAMP)) + $w AS e")
      .localCheckpoint(true)
    val evs = graft.core.Tables.load(spark, sfDir, "events")
      .selectExpr("event_id", "ts", "event_type")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val (h1, h2) = evs.splitAt(evs.length / 2)
    val input = MemoryStream[Ev]
    val q = StreamMonitors.ingestIntervalOverlap(input.toDF(), promos)
      .writeStream.format("memory").queryName("iv_stream")
      .outputMode("append").start()
    val out = try {
      input.addData(h1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(h2.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("iv_stream").as[(Long, Long, Long)].collect()
    } finally q.stop()
    val batch = graft.operators.IntervalJoin.run(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(out.toSet == batch.toSet,
      s"stream emitted ${out.length} rows, batch has ${batch.length}")
    assert(out.length == batch.length, "duplicate emissions")
  }

  test("streaming cusum fires on a planted level shift and resets") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 10 quiet days at ~2/day then a regime shift to 8/day
    val evs = (0 until 20).flatMap { day =>
      val n = if (day < 10) 2 else 8
      (0 until n).map { i =>
        Ev(day * 100L + i, ts(f"2026-03-${day + 1}%02d 0${i % 9}:00:00"), "load")
      }
    }
    val input = MemoryStream[Ev]
    val params = Map("load" -> StreamMonitors.CusumParams(2L, 1L, 6L))
    val q = StreamMonitors.ingestCusum(input.toDF(), params)
      .writeStream.format("memory").queryName("cusum_plant")
      .outputMode("append").start()
    val out = try {
      input.addData(evs.toIndexedSeq: _*); q.processAllAvailable()
      spark.table("cusum_plant")
        .as[StreamMonitors.CusumDay].collect().sortBy(_.epoch_day)
    } finally q.stop()
    // quiet days accumulate nothing (dev - slack < 0); after the shift
    // each day adds 8-2-1 = 5, so the 6-threshold crosses on the SECOND
    // loud day, then the side resets and crosses again every 2 days
    assert(out.length == 19, "all days but the open last one close")
    assert(out.take(10).forall(d => d.cusum_hi == 0L && !d.alert))
    val loud = out.drop(10)
    assert(loud.head.cusum_hi == 5L && !loud.head.alert)
    assert(loud(1).cusum_hi == 10L && loud(1).alert, "second loud day fires")
    assert(loud(2).cusum_hi == 5L, "the side resets after the alert")
    assert(loud(3).alert, "and re-fires two days later")
  }
}
