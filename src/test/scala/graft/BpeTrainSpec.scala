package graft

/** Iterative character-level BPE training. */
class BpeTrainSpec extends SparkSpec {

  test("bpe train: hand-computed merge sequence on a planted census") {
    val spark2 = spark
    import spark2.implicits._
    // census: aaab ×3, aab ×2, cd ×5
    Seq((1L, "aaab aab cd cd"), (2L, "aaab aab cd cd"), (3L, "aaab cd"))
      .toDF("doc_id", "text").createOrReplaceTempView("__bpe_fix")
    val got = graft.pipeline.BpeMerges.trainOn(spark, "__bpe_fix", 8)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // iter1: (a,a) = 2·3 + 1·2 = 8 beats (a,b)=5 and (c,d)=5
    // iter2: after [aa,a,b]/[aa,b]: (c,d)=5 beats (aa,a)=3, (a,b)=3, (aa,b)=2
    // iter3: tie (aa,a)=3 vs (a,b)=3 → lexicographic l: 'a' < 'aa' → (a,b)
    // iter4: (aa,ab)=3 beats (aa,b)=2
    // iter5: (aa,b)=2 — then every word is one symbol and training stops
    assert(got == Seq(
      (1, "a", "a", "aa", 8L),
      (2, "c", "d", "cd", 5L),
      (3, "a", "b", "ab", 3L),
      (4, "aa", "ab", "aaab", 3L),
      (5, "aa", "b", "aab", 2L)),
      s"merge sequence drifted: $got")
  }

  test("bpe train: leftmost-greedy non-overlap on a run (aaaa -> aa aa)") {
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "aaaa")).toDF("doc_id", "text")
      .createOrReplaceTempView("__bpe_fix2")
    val got = graft.pipeline.BpeMerges.trainOn(spark, "__bpe_fix2", 8)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // three (a,a) matches in one run → greedy applies positions 1 and 3
    assert(got == Seq((1, "a", "a", "aa", 3L), (2, "aa", "aa", "aaaa", 1L)),
      s"run handling drifted: $got")
  }

  test("bpe train: engine merges equal an independent Scala BPE on the census") {
    val spark2 = spark
    import spark2.implicits._
    val got = graft.pipeline.BpeMerges.runTrain(spark, sfDir)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // independent reimplementation over the word census
    var census = graft.core.Tables.load(spark, sfDir, "documents")
      .selectExpr("explode(filter(split(LOWER(text), '\\\\s+'), w -> w <> '')) AS w")
      .groupBy("w").count().as[(String, Long)].collect()
      .map { case (w, ct) => w.map(_.toString).toVector -> ct }.toSeq
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (step <- 1 to graft.pipeline.BpeMerges.TrainSteps
         if expect.length == step - 1) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      census.foreach { case (syms, ct) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + ct
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), ct) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        expect += ((step, l, r, l + r, ct))
        census = census.map { case (syms, wct) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toVector -> wct
        }
      }
    }
    assert(got == expect.toSeq, s"engine ${got}\n!= scala ${expect}")
  }

  test("bpe train compression: totals close against the independent BPE") {
    val spark2 = spark
    import spark2.implicits._
    val rows = graft.pipeline.BpeMerges.runTrainCompression(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= graft.pipeline.BpeMerges.CompressionTopK)
    val (before, after, ppm) = (rows.head._6, rows.head._7, rows.head._8)
    assert(rows.forall(r => r._6 == before && r._7 == after && r._8 == ppm))
    assert(after < before && ppm == after * 1000000L / before,
      "the merges must buy real compression")
    rows.foreach { case (w, wct, chars, ta, saved, _, _, _) =>
      assert(chars == w.length && ta >= 1 && ta <= chars)
      assert(saved == wct * (chars - ta))
    }
    // corpus totals from the independent Scala BPE over the census
    var census = graft.core.Tables.load(spark, sfDir, "documents")
      .selectExpr("explode(filter(split(LOWER(text), '\\\\s+'), w -> w <> '')) AS w")
      .groupBy("w").count().as[(String, Long)].collect()
      .map { case (w, ct) => w.map(_.toString).toVector -> ct }.toSeq
    val beforeSim = census.map { case (s, ct) => s.length * ct }.sum
    graft.pipeline.BpeMerges.runTrain(spark, sfDir)
      .as[(Int, String, String, String, Long)].collect().foreach { case (_, l, r, _, _) =>
        census = census.map { case (syms, wct) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toVector -> wct
        }
      }
    val afterSim = census.map { case (s, ct) => s.length * ct }.sum
    assert((before, after) == ((beforeSim, afterSim)),
      s"corpus totals drifted: ($before,$after) vs sim ($beforeSim,$afterSim)")
  }

  test("bpe train: Spark job count is independent of the merge count") {
    // the merge loop is driver-local over the collected census — the
    // ONLY Spark work is the one census scan, so training 300 merges
    // must cost exactly as many Spark jobs as training 2. This is the
    // property that makes a real tokenizer's ~30k merges reachable.
    val spark2 = spark
    import spark2.implicits._
    val words = (0 until 200).map { i =>
      val s = new StringBuilder; var x = i * 2654435761L
      (0 until 12).foreach { _ => s += ('a' + ((x >>> 7) % 26)).toChar; x = x * 6364136223846793005L + 1442695040888963407L }
      s.toString
    }
    words.grouped(20).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").createOrReplaceTempView("__bpe_jobs_fix")
    def jobsDuring(steps: Int): Int = {
      val group = s"bpe_jobs_$steps"
      spark.sparkContext.setJobGroup(group, "bpe job-count probe")
      try graft.pipeline.BpeMerges.trainOn(spark, "__bpe_jobs_fix", steps)
      finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val j2 = jobsDuring(2)
    val j300 = jobsDuring(300)
    assert(j300 == j2,
      s"per-merge Spark jobs detected: $j2 jobs at 2 merges vs $j300 at 300")
  }

  test("bpe census bound: floor=1 -> 2 leaves the merge table unchanged when counts allow") {
    val spark2 = spark
    import spark2.implicits._
    // same planted census as the hand-computed test: every word repeats
    // (aaab x3, aab x2, cd x5), so a minCount=2 floor drops nothing and
    // the election is bit-identical — the exactness boundary from below.
    Seq((1L, "aaab aab cd cd"), (2L, "aaab aab cd cd"), (3L, "aaab cd"))
      .toDF("doc_id", "text").createOrReplaceTempView("__bpe_floor_fix")
    val at1 = graft.pipeline.BpeMerges.trainOn(spark, "__bpe_floor_fix", 8)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val at2 = graft.pipeline.BpeMerges
      .trainOn(spark, "__bpe_floor_fix", 8, minCount = 2L)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(at1 == at2, s"floor changed an all-repeated census: $at1 vs $at2")
    // note "aaab" appears 3x but "aab" only 2x — counts straddle the
    // floor without crossing it, so this is not a trivial fixture.
    assert(at1.nonEmpty)
  }

  test("bpe census bound: a hapax word cannot outvote repeated pairs at floor=2") {
    val spark2 = spark
    import spark2.implicits._
    // "zzzzzz" is a hapax with 5 (z,z) slots — at floor=1 it WINS the
    // first election (5 > 3); at floor=2 it is census-dropped and the
    // repeated corpus elects (x,y). This is the documented exactness
    // boundary: the floor is an approximation exactly when hapax mass
    // could win, which is the web-noise case the bound exists for.
    Seq((1L, "xy xy"), (2L, "xy zzzzzz"))
      .toDF("doc_id", "text").createOrReplaceTempView("__bpe_hapax_fix")
    val at1 = graft.pipeline.BpeMerges.trainOn(spark, "__bpe_hapax_fix", 1)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val at2 = graft.pipeline.BpeMerges
      .trainOn(spark, "__bpe_hapax_fix", 1, minCount = 2L)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(at1 == Seq((1, "z", "z", "zz", 5L)), s"floor=1 drifted: $at1")
    assert(at2 == Seq((1, "x", "y", "xy", 3L)), s"floor=2 drifted: $at2")
  }

  test("bpe census bound: the collect plans as TakeOrderedAndProject, never a global sort") {
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "alpha beta beta")).toDF("doc_id", "text")
      .createOrReplaceTempView("__bpe_plan_fix")
    val plan = spark.sql(
      graft.pipeline.BpeMerges.censusSql("__bpe_plan_fix", 1L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"census bound must be a k-row heap, got:\n$plan")
    assert(!plan.contains("Sort ["), s"global sort in the census plan:\n$plan")
  }

  test("bpe train: a 1000-merge budget trains driver-locally") {
    val spark2 = spark
    import spark2.implicits._
    // 600 pseudo-random 14-char words: ~8.4k chars of pair mass, far
    // more than 1000 merges' worth
    val words = (0 until 600).map { i =>
      val s = new StringBuilder; var x = i * 0x9E3779B97F4A7C15L + 17
      (0 until 14).foreach { _ => s += ('a' + ((x >>> 11) % 26)).toChar; x = x * 6364136223846793005L + 1442695040888963407L }
      s.toString
    }
    words.grouped(30).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").createOrReplaceTempView("__bpe_big_fix")
    val t0 = System.nanoTime()
    val merges = graft.pipeline.BpeMerges.trainOn(spark, "__bpe_big_fix", 1000)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 1000, s"expected 1000 merges, got ${merges.length}")
    assert(secs < 60.0, s"1000 driver-local merges took $secs s")
  }
}
