package graft

import graft.pipeline.Multimodal
import graft.streaming.Monitors

class MonitorsSpec extends SparkSpec {

  test("volume bands bracket the daily signal after warmup") {
    val rows = Monitors.runVolumeBands(spark, sfDir).collect()
    assert(rows.length >= 20)
    val warm = rows.filter(_.getAs[Long]("n_obs") >= 5)
    assert(warm.forall { r =>
      r.getAs[Double]("lower_band") <= r.getAs[Double]("upper_band")
    })
    // breaches are rare for a stationary synthetic series
    assert(warm.count(_.getAs[Int]("breach") == 1) < warm.length / 2)
  }

  test("freshness fingerprints are stable 32-char hashes per table") {
    val rows = Monitors.runFreshness(spark, sfDir).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[String]("fingerprint").length == 32))
  }

  test("multimodal SQL features are deterministic and bounded") {
    val rows = Multimodal.run(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val f = r.getAs[Double]("feat_0"); f >= 0.0 && f <= 1.0
    })
  }

  test("typed mapPartitions feature extraction matches payload sizes") {
    val df = Multimodal.extractFeatures(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 500)
    // document text payloads are not BMP/WAV — all take the opaque path
    assert(rows.forall(_.getAs[String]("kind") == "opaque"))
    assert(rows.forall(_.getAs[Seq[Double]]("features").length == 4))
  }

  test("BMP and WAV payloads decode in-pipeline with exact stats") {
    import spark.implicits._
    // 2x2 24-bit BMP: rows padded to 4 bytes, BGR, bottom-up.
    // pixels: (255,0,0) red, (0,255,0) green / (0,0,255) blue, (10,20,30)
    def bmp(pixels: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
      val h = pixels.length; val w = pixels.head.length
      val rowSize = ((w * 3 + 3) / 4) * 4
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int) = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
      def le16(v: Int) = (0 until 2).foreach(i => out.write((v >> (8 * i)) & 0xff))
      out.write('B'); out.write('M'); le32(54 + rowSize * h)
      le16(0); le16(0); le32(54)                   // reserved, pixel offset
      le32(40); le32(w); le32(h); le16(1); le16(24) // DIB, planes, bpp
      le32(0); le32(rowSize * h); le32(2835); le32(2835); le32(0); le32(0)
      for (row <- pixels.reverse) {                 // bottom-up
        for ((r, g, b) <- row) { out.write(b); out.write(g); out.write(r) }
        (0 until rowSize - w * 3).foreach(_ => out.write(0))
      }
      out.toByteArray
    }
    // mono 16-bit PCM WAV at 8 kHz with samples 100, -200, 300
    def wav(samples: Seq[Int], rate: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int) = (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
      def le16(v: Int) = (0 until 2).foreach(i => out.write((v >> (8 * i)) & 0xff))
      def ascii(s: String) = s.foreach(c => out.write(c))
      ascii("RIFF"); le32(36 + samples.length * 2); ascii("WAVE")
      ascii("fmt "); le32(16); le16(1); le16(1); le32(rate)
      le32(rate * 2); le16(2); le16(16)
      ascii("data"); le32(samples.length * 2); samples.foreach(le16)
      out.toByteArray
    }
    val img = bmp(Seq(Seq((255, 0, 0), (0, 255, 0)),
      Seq((0, 0, 255), (10, 20, 30))))
    val snd = wav(Seq(100, -200, 300), 8000)
    val other = "not media".getBytes("UTF-8")
    val ds = Seq((1L, img), (2L, snd), (3L, other)).toDS()
    val rows = Multimodal.extractFrom(ds).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // image: means are exact quarters of the channel sums
    assert(rows(1L).getAs[String]("kind") == "bmp")
    val f = rows(1L).getAs[scala.collection.Seq[Double]]("features")
    assert(f.sameElements(Seq(2.0, 2.0, r4((255 + 10) / 4.0),
      r4((255 + 20) / 4.0), r4((255 + 30) / 4.0))), f.toString)
    // audio: peak 300; rms = sqrt((100^2+200^2+300^2)/3)
    assert(rows(2L).getAs[String]("kind") == "wav")
    val a = rows(2L).getAs[scala.collection.Seq[Double]]("features")
    assert(a.sameElements(Seq(8000.0, 1.0, 3.0, 300.0,
      r4(math.sqrt((100.0 * 100 + 200 * 200 + 300 * 300) / 3)))), a.toString)
    // anything else stays on the deterministic opaque path
    assert(rows(3L).getAs[String]("kind") == "opaque")
    // truncated/corrupt payloads decode to None, not garbage
    assert(Multimodal.decodeBmp(img.take(40)).isEmpty)
    assert(Multimodal.decodeWav(snd.take(20)).isEmpty)

    // video: the AVI container parses to (w, h, frames, fps)
    val vid = Multimodal.renderDibAvi(
      Array.tabulate(16)(f => Array.fill(64)(f * 10)), 8, 8)
    val vrows = Multimodal.extractFrom(Seq((4L, vid)).toDS()).collect()
    assert(vrows.head.getAs[String]("kind") == "avi")
    val vf = vrows.head.getAs[scala.collection.Seq[Double]]("features")
    assert(vf.sameElements(Seq(8.0, 8.0, 16.0, 10.0)), vf.toString)
    assert(Multimodal.decodeAvi(vid.take(60)).isEmpty)

    // resize step: 2x2 grid luma over the 2x2 image = one cell per
    // pixel; decode iterates bottom-up so grid row 0 is the image's
    // BOTTOM row. ITU-R 601 luma with integer weights /1000.
    val grid = Multimodal.bmpGridLuma(img, 2).get
    def luma(rc: (Int, Int, Int)) =
      r4((299L * rc._1 + 587L * rc._2 + 114L * rc._3) / 1000.0)
    assert(grid.sameElements(Array(
      luma((0, 0, 255)), luma((10, 20, 30)),   // bottom row
      luma((255, 0, 0)), luma((0, 255, 0)))),  // top row
      grid.mkString(","))
    // frame-sample step: 3 one-sample frames -> per-sample |RMS|
    val frames = Multimodal.wavFrameRms(snd, 3).get
    assert(frames.sameElements(Array(100.0, 200.0, 300.0)),
      frames.mkString(","))
    // more frames than samples clamps to one frame per sample
    assert(Multimodal.wavFrameRms(snd, 16).get.length == 3)
    assert(Multimodal.wavFrameRms(snd.take(20), 4).isEmpty)
  }

  test("PNG, JPEG and GIF payloads decode through the JDK ImageIO slot") {
    import spark.implicits._
    // the same 2x2 pixels as the BMP case, encoded by the JDK writers
    val px = Seq(Seq((255, 0, 0), (0, 255, 0)), Seq((0, 0, 255), (10, 20, 30)))
    def encode(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 2) {
        val (r, g, b) = px(y)(x)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    val png = encode("png"); val jpg = encode("jpg"); val gif = encode("gif")
    assert(Multimodal.imageFormat(png).contains("png"))
    assert(Multimodal.imageFormat(jpg).contains("jpeg"))
    assert(Multimodal.imageFormat(gif).contains("gif"))
    assert(Multimodal.imageFormat("not media".getBytes("UTF-8")).isEmpty)

    val ds = Seq((1L, png), (2L, jpg), (3L, gif)).toDS()
    val rows = Multimodal.extractFrom(ds).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // PNG is lossless: channel means are exact quarters of the sums
    assert(rows(1L).getAs[String]("kind") == "png")
    val pf = rows(1L).getAs[scala.collection.Seq[Double]]("features")
    assert(pf.sameElements(Seq(2.0, 2.0, r4((255 + 10) / 4.0),
      r4((255 + 20) / 4.0), r4((255 + 30) / 4.0))), pf.toString)
    // JPEG is lossy: exact dimensions, means within quantization error
    assert(rows(2L).getAs[String]("kind") == "jpeg")
    val jf = rows(2L).getAs[scala.collection.Seq[Double]]("features")
    assert(jf(0) == 2.0 && jf(1) == 2.0, jf.toString)
    assert((2 to 4).forall(i => (jf(i) - pf(i)).abs < 80.0), jf.toString)
    // GIF: the JDK writer quantizes to its default palette, so like
    // JPEG assert exact dimensions and palette-error-bounded means
    assert(rows(3L).getAs[String]("kind") == "gif")
    val gf = rows(3L).getAs[scala.collection.Seq[Double]]("features")
    assert(gf(0) == 2.0 && gf(1) == 2.0, gf.toString)
    assert((2 to 4).forall(i => (gf(i) - pf(i)).abs < 80.0), gf.toString)

    // resize step: natural top-down row order (unlike BMP's bottom-up)
    def luma(rc: (Int, Int, Int)) =
      r4((299L * rc._1 + 587L * rc._2 + 114L * rc._3) / 1000.0)
    val grid = Multimodal.imageIoGridLuma(png, 2).get
    assert(grid.sameElements(Array(
      luma((255, 0, 0)), luma((0, 255, 0)),
      luma((0, 0, 255)), luma((10, 20, 30)))), grid.mkString(","))
    // truncated payloads decode to None, not garbage
    assert(Multimodal.decodeImageIo(png.take(20)).isEmpty)
    assert(Multimodal.imageIoGridLuma(png.take(20), 2).isEmpty)
  }

  private def r4(x: Double) = math.rint(x * 10000) / 10000

  test("AIFF payloads decode through the JDK javax.sound slot") {
    import spark.implicits._
    // the same mono 16-bit samples as the WAV case, in an AIFF container
    // written by the JDK encoder (big-endian PCM)
    val samples = Seq(100, -200, 300)
    val pcm = samples.flatMap(s =>
      Seq(((s >> 8) & 0xff).toByte, (s & 0xff).toByte)).toArray
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    val aiff = out.toByteArray
    assert(Multimodal.audioFormat(aiff).contains("aiff"))
    assert(Multimodal.audioFormat("not media".getBytes("UTF-8")).isEmpty)

    val rows = Multimodal.extractFrom(Seq((1L, aiff)).toDS()).collect()
    assert(rows.head.getAs[String]("kind") == "aiff")
    val f = rows.head.getAs[scala.collection.Seq[Double]]("features")
    assert(f.sameElements(Seq(8000.0, 1.0, 3.0, 300.0,
      r4(math.sqrt((100.0 * 100 + 200 * 200 + 300 * 300) / 3)))), f.toString)
    // truncated payloads decode to None, not garbage
    assert(Multimodal.decodeAudioIo(aiff.take(16)).isEmpty)
  }

  test("daily active schedules get deadline-based upper thresholds") {
    val rows = Monitors.runSchedule(spark, sfDir).collect()
      .map(r => r.getAs[String]("series") -> r).toMap
    val li = rows("lineitem")
    assert(li.getAs[String]("stage") == "active")
    assert(li.getAs[String]("frequency") == "daily")
    // non-sub-daily active: upper = business minutes to the next
    // deadline — window end 0.0 + medium 3h buffer on the next active
    // day = 27h (test_thresholds_prediction.py:249-257 semantics)
    assert(li.getAs[Double]("upper_min") == 27 * 60.0, li)
    // sub-daily series keep the within-window gap threshold
    val ev = rows("events")
    assert(ev.getAs[String]("frequency") == "sub_daily")
    assert(ev.getAs[Double]("upper_min") < 27 * 60.0, ev)
  }

  test("per-series tz offsets flow through the schedule path unchanged elsewhere") {
    // the events fixture updates uniformly around the clock, so its own
    // schedule is tz-invariant — the hand-computed tz scenarios live in
    // FreshnessSpec; here we assert the plumbing leaves offset-free
    // series bit-identical and runs green with an offset present
    val utc = Monitors.runSchedule(spark, sfDir).collect()
      .map(r => r.getAs[String]("series") -> r.toString).toMap
    val tz = Monitors.runSchedule(spark, sfDir,
      tzOffsetsSec = Map("events" -> 10 * 3600L)).collect()
      .map(r => r.getAs[String]("series") -> r.toString).toMap
    assert(tz("orders") == utc("orders"))
    assert(tz("lineitem") == utc("lineitem"))
  }

  test("PREDICT tolerances from landed history match the SARIMAX port") {
    import graft.streaming.{HolidayCalendar, TimeSeries}
    import spark.implicits._
    // constructed daily signal history: linear trend, 30 points
    val n = 30
    val day0 = java.time.LocalDate.parse("2024-01-01").toEpochDay * 86400L
    val ts = (0 until n).map(i => day0 + i * 86400L)
    val vals = (0 until n).map(i => 100.0 + 2.0 * i)
    val path = java.nio.file.Files
      .createTempDirectory("graft_pred").toString + "/sig"
    ts.zip(vals).map { case (t, v) =>
      ("s1", f"run_${(t - day0) / 86400L}%03d",
        new java.sql.Timestamp(t * 1000L), v)
    }.toDF("series", "run_id", "run_ts", "value").write.parquet(path)

    val out = Monitors.predictThresholdsFrom(spark, Seq(path)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("method") == "sarimax")
    assert(r.getAs[Int]("n_signals") == n)
    // bit-parity with the direct port over the identical history
    val holidays = HolidayCalendar.dates(Seq("US"), HolidayCalendar.yearsOf(ts))
    val (expLo, expHi) = TimeSeries.computeThreshold(ts, vals, "medium",
      excludeWeekends = true, holidays = holidays).get
    def r4(x: Double) = math.rint(math.max(x, 0.0) * 10000) / 10000
    assert(r.getAs[Double]("lower_tolerance") == r4(expLo))
    assert(r.getAs[Double]("upper_tolerance") == r4(expHi))
    // a linear series forecasts its continuation
    assert(math.abs(r.getAs[Double]("predicted") - (100.0 + 2.0 * n)) < 5.0)
  }

  test("PREDICT falls back to the stats band on short landed history") {
    import spark.implicits._
    val day0 = java.time.LocalDate.parse("2024-03-04").toEpochDay * 86400L
    val path = java.nio.file.Files
      .createTempDirectory("graft_pred2").toString + "/sig"
    Seq(10.0, 12.0, 11.0, 13.0, 9.0).zipWithIndex.map { case (v, i) =>
      ("s1", f"run_$i%03d", new java.sql.Timestamp((day0 + i * 86400L) * 1000L), v)
    }.toDF("series", "run_id", "run_ts", "value").write.parquet(path)
    val r = Monitors.predictThresholdsFrom(spark, Seq(path)).collect().head
    assert(r.getAs[String]("method") == "stats_fallback")
    val vals = Seq(10.0, 12.0, 11.0, 13.0, 9.0)
    val mean = vals.sum / vals.length
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (vals.length - 1))
    def r4(x: Double) = math.rint(x * 10000) / 10000
    assert(r.getAs[Double]("lower_tolerance") == r4(math.max(mean - 2 * sd, 0.0)))
    assert(r.getAs[Double]("upper_tolerance") == r4(mean + 2 * sd))
  }
}
