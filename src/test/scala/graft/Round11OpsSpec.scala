package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventAnalytics

/** Round-11 operators: last-touch click attribution (join-free batch
  * form + watermarked stream-stream join twin) and URL
  * canonicalization / per-domain capping. */
class Round11OpsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def attrFixture: Seq[EventAnalytics.AttrEvent] = Seq(
    // user 1: click 30 min before purchase -> attributed
    EventAnalytics.AttrEvent(10, 1, ts("2026-01-01 10:00:00"), "click"),
    EventAnalytics.AttrEvent(11, 1, ts("2026-01-01 10:30:00"), "purchase"),
    // user 2: click 2 h before purchase -> NOT attributed (window 1 h)
    EventAnalytics.AttrEvent(20, 2, ts("2026-01-01 08:00:00"), "click"),
    EventAnalytics.AttrEvent(21, 2, ts("2026-01-01 10:00:00"), "purchase"),
    // user 3: no click at all
    EventAnalytics.AttrEvent(31, 3, ts("2026-01-01 09:00:00"), "purchase"),
    // user 4: click at the exact purchase instant -> attributed (>=)
    EventAnalytics.AttrEvent(40, 4, ts("2026-01-01 12:00:00"), "click"),
    EventAnalytics.AttrEvent(41, 4, ts("2026-01-01 12:00:00"), "purchase"),
    // user 5: two in-window clicks -> the LATEST wins last-touch
    EventAnalytics.AttrEvent(50, 5, ts("2026-01-01 13:00:00"), "click"),
    EventAnalytics.AttrEvent(51, 5, ts("2026-01-01 13:40:00"), "click"),
    EventAnalytics.AttrEvent(52, 5, ts("2026-01-01 13:50:00"), "purchase"),
    // user 6: click AFTER the purchase -> not attributed
    EventAnalytics.AttrEvent(60, 6, ts("2026-01-01 14:10:00"), "click"),
    EventAnalytics.AttrEvent(61, 6, ts("2026-01-01 14:00:00"), "purchase"))

  private def fixtureView(name: String): Unit = {
    val spark2 = spark
    import spark2.implicits._
    attrFixture.toDF()
      .withColumn("value", org.apache.spark.sql.functions.lit(10.0))
      .createOrReplaceTempView(name)
  }

  test("attribution semantics: window bound, ties, last-touch election") {
    val spark2 = spark
    import spark2.implicits._
    fixtureView("__attr_fix")
    val rows = spark.sql(EventAnalytics.attributionSql("__attr_fix"))
      .select("purchase_id", "click_id", "attributed")
      .as[(Long, Option[Long], Boolean)].collect()
      .map { case (p, c, a) => p -> ((c, a)) }.toMap
    assert(rows(11L) == (Some(10L), true), "30-min-prior click attributes")
    assert(rows(21L) == (None, false), "2-h-stale click must not attribute")
    assert(rows(31L) == (None, false), "no click -> unattributed")
    assert(rows(41L) == (Some(40L), true), "same-instant click attributes")
    assert(rows(52L) == (Some(51L), true), "latest in-window click wins")
    assert(rows(61L) == (None, false), "future click must not attribute")
  }

  test("attribution plans join-free: union + one window, no join operator") {
    val p = EventAnalytics.runAttribution(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"attribution planned a join:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"attribution shuffles $exchanges times, expected <= 2 (click dedupe + asof window)")
  }

  test("streaming attribution: stream-stream join replays to the batch candidates") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // fixture invariant the twin relies on (batch anchor dedups clicks
    // per (user, instant); the stream side must never see two)
    val clicks = attrFixture.filter(_.event_type == "click")
    assert(clicks.groupBy(e => (e.user_id, e.ts)).forall(_._2.size == 1))
    val input = MemoryStream[EventAnalytics.AttrEvent]
    val q = EventAnalytics.streamingAttribution(input.toDS())
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      // two chunks + a far-future watermark flush event
      val (a, b) = attrFixture.splitAt(6)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      input.addData(EventAnalytics.AttrEvent(999, 99, ts("2026-02-01 00:00:00"), "click"))
      q.processAllAvailable()
      val streamed = spark.table("attr_stream")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      fixtureView("__attr_fix")
      val batch = spark.sql(EventAnalytics.attributionCandidatesSql("__attr_fix"))
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        s"stream-stream candidates diverge: stream=$streamed batch=$batch")
      assert(batch.contains((52L, 50L)) && batch.contains((52L, 51L)),
        "both in-window clicks are candidates; last-touch election is batch-side")
    } finally q.stop()
  }

  test("url normalization rules on literal spellings") {
    import graft.oracle.SparkDialect
    def norm(u: String): String =
      spark.sql(s"SELECT ${graft.pipeline.UrlOps.normalizeSqlExpr(s"'$u'")(SparkDialect)} AS n")
        .collect().head.getString(0)
    // case fold on scheme+host only, www strip, default port strip,
    // fragment drop, tracking strip, trailing-slash collapse
    assert(norm("HTTP://WWW.Site.com:80/a/?utm_source=x&id=1#top")
      == "http://site.com/a?id=1")
    assert(norm("https://site.com:443/a?id=1") == "http" + "s://site.com/a?id=1")
    // non-default port survives; param order of survivors is preserved
    assert(norm("https://site.com:8080/a?b=2&utm_campaign=c&a=1")
      == "https://site.com:8080/a?b=2&a=1")
    // all params tracked -> dangling '?' collapses too
    assert(norm("https://site.com/a/?utm_source=x&gclid=z")
      == "https://site.com/a")
    // path case is NOT folded
    assert(norm("https://site.com/A/B?id=1") == "https://site.com/A/B?id=1")
  }

  test("url dedup groups by doc_id % 97 with a min-id survivor") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.pipeline.UrlOps.runNormalize(spark, sfDir)
      .select("doc_id", "url_norm", "dup_ct", "survivor")
      .as[(Long, String, Long, Boolean)].collect()
    val byNorm = rows.groupBy(_._2)
    byNorm.foreach { case (_, g) =>
      assert(g.forall(_._3 == g.length), "dup_ct must equal the group size")
      val survivors = g.filter(_._4)
      assert(survivors.map(_._1).toSeq == Seq(g.map(_._1).min),
        "exactly the min doc_id survives")
    }
    // the synthetic URL keys canonical identity on (doc_id % 97, source):
    // docs in one normalized group must agree on both
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._1 % 97).distinct.length == 1)
    }
  }

  test("domain cap keeps at most K per domain, deterministically") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.pipeline.UrlOps.runDomainCap(spark, sfDir)
      .select("doc_id", "domain", "kept").as[(Long, String, Boolean)].collect()
    val kept = rows.filter(_._3).groupBy(_._2)
    kept.foreach { case (d, g) =>
      assert(g.length <= graft.pipeline.UrlOps.CapK, s"domain $d over cap")
    }
    // deterministic: a second run elects the identical kept set
    val again = graft.pipeline.UrlOps.runDomainCap(spark, sfDir)
      .select("doc_id", "domain", "kept").as[(Long, String, Boolean)].collect()
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }
}
