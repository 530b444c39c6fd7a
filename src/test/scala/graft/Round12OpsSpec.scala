package graft

import java.sql.Timestamp

import graft.streaming.EventAnalytics

/** Round-12 operators: k-anonymity privacy screen, Benford first-digit
  * screen, and multi-touch (linear) attribution with exact integer-cents
  * revenue splitting. */
class Round12OpsSpec extends SparkSpec {

  test("k-anonymity: class counts, at-risk flag, exact ppm shares") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.inference.KAnonymity.run(spark, sfDir)
      .select("nation_key", "segment", "class_ct", "at_risk", "share_ppm")
      .as[(Long, String, Long, Boolean, Long)].collect()
    val total = graft.core.Tables.load(spark, sfDir, "customer").count()
    assert(rows.map(_._3).sum == total, "classes must partition the table")
    rows.foreach { case (_, _, ct, risk, ppm) =>
      assert(risk == (ct < graft.inference.KAnonymity.K),
        "at_risk must be exactly class_ct < k")
      assert(ppm == ct * 1000000L / total, "share must be exact integer ppm")
    }
    // classes are distinct quasi-identifier tuples
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("k-anonymity plans one scan with a map-side partial aggregate") {
    val p = graft.inference.KAnonymity.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(p).length
    assert(scans == 1, s"k-anonymity re-scans: $scans scans\n${p.take(600)}")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial + final aggregate (map-side combine)")
  }

  test("benford: expected ppm table matches the log10 law") {
    graft.profiling.Benford.ExpectedPpm.zipWithIndex.foreach { case (p, i) =>
      val d = i + 1
      assert(p == math.round(math.log10(1.0 + 1.0 / d) * 1e6),
        s"digit $d expected-ppm literal drifted from log10(1+1/d)")
    }
    assert(graft.profiling.Benford.ExpectedPpm.sum <= 1000000L)
  }

  test("benford: digit domain, share closure, deviation arithmetic") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.profiling.Benford.run(spark, sfDir)
      .select("column_name", "digit", "digit_ct", "observed_ppm",
        "benford_ppm", "deviation_ppm")
      .as[(String, Int, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, d, ct, obs, exp, dev) =>
      assert(d >= 1 && d <= 9, s"leading digit $d out of domain")
      assert(ct > 0)
      assert(exp == graft.profiling.Benford.ExpectedPpm(d - 1))
      assert(dev == obs - exp, "deviation must be pure integer difference")
    }
    rows.groupBy(_._1).foreach { case (cn, g) =>
      val s = g.map(_._4).sum
      // integer floor division loses at most 8 ppm across 9 digits
      assert(s <= 1000000L && s >= 1000000L - 8, s"$cn shares sum to $s")
    }
    // cross-check one cell against a direct computation
    val direct = graft.core.Tables.load(spark, sfDir, "lineitem")
      .selectExpr(
        "CAST(SUBSTRING(CAST(CAST(ROUND(ABS(l_extendedprice) * 100) AS BIGINT) AS STRING), 1, 1) AS INT) AS d")
      .where("d IS NOT NULL").groupBy("d").count()
      .as[(Int, Long)].collect().toMap
    rows.filter(_._1 == "l_extendedprice").foreach { case (_, d, ct, _, _, _) =>
      assert(direct(d) == ct, s"digit $d count drifted from direct groupBy")
    }
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("multi-touch attribution: exact integer-cents split, recency ranks") {
    val spark2 = spark
    import spark2.implicits._
    // purchase 52 has two in-window clicks and an odd cents amount, so
    // the largest-remainder rule is actually exercised (1001 -> 501+500)
    Seq(
      EventAnalytics.AttrEvent(10, 1, ts("2026-01-01 10:00:00"), "click"),
      EventAnalytics.AttrEvent(11, 1, ts("2026-01-01 10:30:00"), "purchase"),
      EventAnalytics.AttrEvent(20, 2, ts("2026-01-01 08:00:00"), "click"),
      EventAnalytics.AttrEvent(21, 2, ts("2026-01-01 10:00:00"), "purchase"),
      EventAnalytics.AttrEvent(50, 5, ts("2026-01-01 13:00:00"), "click"),
      EventAnalytics.AttrEvent(51, 5, ts("2026-01-01 13:40:00"), "click"),
      EventAnalytics.AttrEvent(52, 5, ts("2026-01-01 13:50:00"), "purchase"))
      .toDF()
      .withColumn("value", org.apache.spark.sql.functions.lit(10.01))
      .createOrReplaceTempView("__mt_fix")
    val rows = spark.sql(EventAnalytics.multiTouchSql("__mt_fix")(
      graft.oracle.SparkDialect))
      .select("purchase_id", "click_id", "touch_rank", "touch_ct", "credit_cents")
      .as[(Long, Long, Long, Long, Long)].collect()
    val byPurchase = rows.groupBy(_._1)
    // stale click (2 h) excluded: purchase 21 has no candidate rows
    assert(!byPurchase.contains(21L), "out-of-window click must not credit")
    assert(byPurchase(11L).map(r => (r._2, r._5)).toSeq == Seq((10L, 1001L)),
      "single touch takes the full cents")
    val p52 = byPurchase(52L).sortBy(_._3)
    assert(p52.map(_._2).toSeq == Seq(51L, 50L), "rank 1 must be the latest click")
    assert(p52.map(_._5).toSeq == Seq(501L, 500L),
      "largest-remainder: the extra cent goes to the most recent touch")
    assert(p52.forall(_._4 == 2L))
  }

  test("multi-touch credits always close to the purchase cents at sf") {
    val spark2 = spark
    import spark2.implicits._
    val credits = EventAnalytics.runMultiTouch(spark, sfDir)
      .groupBy("purchase_id")
      .agg(org.apache.spark.sql.functions.sum("credit_cents").as("c"))
      .as[(Long, Long)].collect().toMap
    assert(credits.nonEmpty)
    val actual = graft.core.Tables.load(spark, sfDir, "events")
      .where("event_type = 'purchase'")
      .selectExpr("event_id", "CAST(ROUND(value * 100) AS BIGINT)")
      .as[(Long, Long)].collect().toMap
    credits.foreach { case (pid, c) =>
      assert(c == actual(pid), s"purchase $pid credits $c != cents ${actual(pid)}")
    }
  }

  test("multi-touch windows partition by purchase — never a global sort") {
    val p = EventAnalytics.runMultiTouch(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(purchase_id"),
      s"ranking must shuffle on the purchase key:\n${p.take(600)}")
    assert(!p.contains("SinglePartition"),
      "a single-partition window would serialize the corpus through one task")
  }

  test("fk integrity: star edges resolve, invariants hold on the fixture") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.inference.Referential.run(spark, sfDir)
      .select("fk_edge", "child_ct", "orphan_ct", "orphan_val_ct",
        "null_key_ct", "child_val_ct", "parent_val_ct")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == graft.inference.Referential.Edges.length)
    // the declared star edges are clean in the synthetic data
    Seq("lineitem.l_orderkey -> orders.o_orderkey",
      "orders.o_custkey -> customer.c_custkey",
      "customer.c_nationkey -> nation.n_nationkey").foreach { e =>
      assert(rows(e)._3 == 0L && rows(e)._4 == 0L, s"$e has orphans")
    }
    rows.values.foreach { r =>
      assert(r._3 >= r._4, "orphan rows >= orphan values")
      assert(r._2 >= r._3 + r._5, "child_ct bounds orphans + nulls")
      // resolving values are a subset of the parent's key domain
      assert(r._6 - r._4 <= r._7, "resolved child values exceed parent domain")
    }
    // the unconstrained events edge: whatever the screen reports must
    // equal the direct anti-join (zero on the shipped fixture — the
    // generator happens to draw user_id inside the customer domain)
    val ev = rows("events.user_id -> customer.c_custkey")
    val direct = graft.core.Tables.load(spark, sfDir, "events")
      .join(graft.core.Tables.load(spark, sfDir, "customer")
        .select($"c_custkey".as("user_id")), Seq("user_id"), "left_anti")
      .count()
    assert(ev._3 == direct, s"orphan count ${ev._3} != anti-join $direct")
  }

  test("fk integrity FIRES on planted orphans (all count classes exact)") {
    val spark2 = spark
    import spark2.implicits._
    // a broken child: keys 1-2 resolve, 7 appears twice and never
    // resolves, 9 never resolves, two NULL keys
    Seq(Option(1L), Some(2L), Some(7L), Some(7L), Some(9L), None, None)
      .toDF("user_id").createOrReplaceTempView("__fk_child")
    // c_nationkey present because customer is itself the CHILD of the
    // nation edge in the same 8-edge union
    Seq((1L, 1), (2L, 1), (3L, 1)).toDF("c_custkey", "c_nationkey")
      .createOrReplaceTempView("__fk_parent")
    val tabs = graft.inference.Referential.Edges.flatMap {
      case (ct, _, pt, _) => Seq(ct, pt)
    }.distinct.map {
      case "events" => "events" -> "__fk_child"
      case "customer" => "customer" -> "__fk_parent"
      case t =>
        graft.core.Tables.load(spark, sfDir, t)
          .createOrReplaceTempView(s"__fk_$t")
        t -> s"__fk_$t"
    }.toMap
    val ev = spark.sql(graft.inference.Referential.sql(tabs))
      .where($"fk_edge" === "events.user_id -> customer.c_custkey")
      .select("child_ct", "orphan_ct", "orphan_val_ct", "null_key_ct",
        "child_val_ct", "parent_val_ct")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(ev == ((7L, 3L, 2L, 2L, 4L, 3L)),
      s"planted-orphan counts drifted: $ev")
  }

  test("fk integrity plans broadcast the small parents") {
    val p = graft.inference.Referential.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "dim-sized distinct parents should broadcast under the child scan")
  }

  test("scd2: version counts, current uniqueness, change classes") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.pipeline.Scd2.run(spark, sfDir)
      .select("c_custkey", "valid_from", "valid_to", "is_current", "change_type")
      .as[(Long, Int, Option[Int], Boolean, String)].collect()
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, g) =>
      assert(g.count(_._4) <= 1, s"key $k has two open versions")
      g.map(_._5).distinct.toSeq match {
        case Seq("CHANGED") =>
          assert(g.length == 2, s"key $k CHANGED must close + reopen")
          val old = g.find(_._2 == 1).get; val nw = g.find(_._2 == 2).get
          assert(old._3.contains(2) && !old._4 && nw._3.isEmpty && nw._4)
        case Seq("UNCHANGED") =>
          assert(g.length == 1 && g.head._4 && g.head._3.isEmpty)
        case Seq("REMOVED") =>
          assert(g.length == 1 && !g.head._4 && g.head._3.contains(2))
          assert(k % 50 == 13)
        case Seq("ADDED") =>
          assert(g.length == 1 && g.head._4 && g.head._2 == 2)
          assert(k % 50 == 7)
        case other => fail(s"key $k mixes change classes: $other")
      }
    }
    // every mutated surviving key classifies CHANGED
    byKey.foreach { case (k, g) =>
      if (k % 50 != 7 && k % 50 != 13 && (k % 10 == 3 || k % 17 == 5))
        assert(g.head._5 == "CHANGED", s"perturbed key $k not CHANGED")
    }
  }

  test("drift_ks: spark two-level prefix sum equals the naive KS") {
    val spark2 = spark
    import spark2.implicits._
    val row = graft.profiling.KsDrift.run(spark, sfDir)
      .select("n_a", "n_b", "ks_num", "ks_ppm")
      .as[(Long, Long, Long, Long)].collect().head
    // recompute naively from the grouped counts
    val cnt = graft.core.Tables.load(spark, sfDir, "lineitem")
      .selectExpr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v",
        "CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END AS a")
      .groupBy("v")
      .agg(org.apache.spark.sql.functions.expr("SUM(a)").as("ca"),
        org.apache.spark.sql.functions.expr("SUM(1 - a)").as("cb"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val na = cnt.map(_._2).sum; val nb = cnt.map(_._3).sum
    var (cma, cmb, best) = (0L, 0L, 0L)
    cnt.foreach { case (_, ca, cb) =>
      cma += ca; cmb += cb
      best = math.max(best, math.abs(nb * cma - na * cmb))
    }
    assert((row._1, row._2) == ((na, nb)))
    assert(row._3 == best, s"ks_num ${row._3} != naive $best")
    assert(row._4 == best * 1000000L / (na * nb))
    assert(row._3 > 0, "identical distributions make the spec vacuous")
  }

  test("drift_ks: the corpus-sized cumsum window partitions by bucket") {
    val p = graft.profiling.KsDrift.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(bucket"),
      s"value-domain cumsum must run per bucket:\n${p.take(800)}")
  }

  test("l-diversity: bounds, risk flag, direct cross-check") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.inference.LDiversity.run(spark, sfDir)
      .select("nation_key", "segment", "class_ct", "l_distinct", "at_risk")
      .as[(Long, String, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, ct, l, risk) =>
      assert(l >= 1 && l <= ct, "1 <= l <= class size")
      assert(risk == (l < graft.inference.LDiversity.L))
    }
    // same equivalence classes as the k-anonymity screen
    val kanon = graft.inference.KAnonymity.run(spark, sfDir)
      .select("nation_key", "segment").as[(Long, String)].collect().toSet
    assert(rows.map(r => (r._1, r._2)).toSet == kanon)
    val (nk, seg) = (rows.head._1, rows.head._2)
    val direct = graft.core.Tables.load(spark, sfDir, "customer")
      .where(s"c_nationkey = $nk AND c_mktsegment = '$seg'")
      .selectExpr("CAST(FLOOR(c_acctbal / 1000.0) AS INT)")
      .distinct().count()
    assert(rows.head._4 == direct)
  }

  test("changepoint: cusum closes at zero and peaks where the shift is") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.streaming.Changepoint.run(spark, sfDir)
      .select("day", "event_ct", "cusum_scaled", "is_changepoint")
      .as[(java.sql.Date, Long, Long, Boolean)].collect()
      .sortBy(_._1.toLocalDate.toEpochDay)
    assert(rows.length > 10, "need a real daily series")
    assert(rows.last._3 == 0L,
      "sum of scaled deviations over the whole period must telescope to 0")
    val d = rows.length.toLong; val t = rows.map(_._2).sum
    var c = 0L
    val expect = rows.map { r => c += d * r._2 - t; c }
    assert(rows.map(_._3).toSeq == expect.toSeq, "cusum recomputation drifted")
    val peak = expect.map(math.abs).max
    rows.zip(expect).foreach { case (r, e) =>
      assert(r._4 == (math.abs(e) == peak), s"flag wrong on ${r._1}")
    }
    assert(rows.count(_._4) >= 1)
  }

  test("reconcile: per-column verdicts close against the snapshot rules") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.pipeline.Reconcile.run(spark, sfDir)
      .select("column_name", "only_a_ct", "only_b_ct", "match_ct", "diff_ct")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet == graft.pipeline.Reconcile.Cols.toSet)
    val keys = graft.core.Tables.load(spark, sfDir, "customer")
      .select($"c_custkey").as[Long].collect()
    val onlyA = keys.count(_ % 50 == 13); val onlyB = keys.count(_ % 50 == 7)
    val both = keys.filter(k => k % 50 != 13 && k % 50 != 7)
    rows.values.foreach { r =>
      assert(r._2 == onlyA && r._3 == onlyB)
      assert(r._4 + r._5 == both.length, "matched + diff must cover the overlap")
    }
    assert(rows("c_acctbal")._5 == both.count(_ % 10 == 3))
    assert(rows("c_mktsegment")._5 == both.count(_ % 17 == 5))
  }

  test("reconcile + scd2 plan one snapshot join, not one join per column") {
    Seq(graft.pipeline.Reconcile.run(spark, sfDir),
      graft.pipeline.Scd2.run(spark, sfDir)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      val joins = "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
        .findAllIn(p).length
      assert(joins == 1, s"expected exactly the snapshot join, got $joins:\n${p.take(500)}")
    }
  }
}
