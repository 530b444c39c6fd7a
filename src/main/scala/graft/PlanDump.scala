package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit artifact generator: dumps the formatted physical plan TREE
  * of the headline query shapes to PLANS.md, with a one-paragraph note
  * on why each plan is the one the 100 TB design wants. Run:
  * `sbt "runMain graft.PlanDump"` (SPARK_GRAFT_SF_DIR picks the data).
  */
object PlanDump {

  private val notes: Seq[(String, String)] = Seq(
    "dedup_winnow" -> ("Winnowing near-dup. The per-doc fingerprint set is ONE native " +
      "codegen'd expression (`graft_winnow_fps`) inside the scan projection — no " +
      "char-position explode, no window shuffle — then candidates come from a " +
      "fingerprint equi-join with a hot-fingerprint cutoff. Corpus text never " +
      "shuffles; only (doc_id, fp) rows move."),
    "dedup_minhash" -> ("MinHash LSH dedup. Signatures are computed in-scan, band keys " +
      "equi-join (never a doc-to-doc cross), and the verify join dispatches through " +
      "the two-tier salted-join path when the skew advisor flags hot bands. This " +
      "entry reads the landed verified-pair relation — the expensive joins ran once " +
      "per session at landing."),
    "boilerplate_ngrams" -> ("Cross-doc trigram document frequency. One gram census " +
      "groupBy with map-side partials over the exploded grams — the relation " +
      "materializes once and every boilerplate consumer reads it; no pair joins."),
    "skew_report" -> ("Join-key skew advisor. One column-pruned scan per declared key, " +
      "map-side-combined counts; raw rows never shuffle — the report is " +
      "metadata-sized whatever the corpus."),
    "event_asof_order" -> ("Distributed AS-OF join, join-free: both sides union, one " +
      "hash partition by key, a running LAST_VALUE window attributes each left row " +
      "to its latest right row. No join operator in the plan at all — the shape " +
      "that survives skewed keys and 100x row counts (oracle: DuckDB's native " +
      "ASOF JOIN, a different algorithm, same relation)."),
    "event_range_burst" -> ("Range join bucketized to an equi-join: intervals shred " +
      "into fixed-width buckets so the match is bucket-equality plus a residual " +
      "predicate — never a BroadcastNestedLoopJoin (PlanSpec tripwire)."),
    "freq_heavy_hitters" -> ("Heavy hitters, pass 2 (pass 1 — the tree-merged " +
      "Misra-Gries candidate sketch — already ran when this plan was built). " +
      "Non-candidate tokens collapse onto a NULL key in the map-side hash " +
      "aggregate, so the exchange carries <= m+1 keys per mapper; the window " +
      "runs over the metadata-sized aggregated relation."),
    "event_day_pruned" -> ("Date-partitioned layout consumer. PartitionFilters carries " +
      "the day literal, so the scan lists exactly one date directory " +
      "(TimeLayoutSpec asserts partitionCount == 1) — bytes read scale with the " +
      "window, not the corpus."),
    "quality_classifier" -> ("Hashed bag-of-words linear scorer. The whole model " +
      "score folds in ONE higher-order-function expression inside the scan " +
      "projection — zero shuffles, no exploded token rows (PlanSpec tripwire)."),
    "doc_signals" -> ("Bucketed co-located join: both per-doc signal tables are " +
      "bucketBy(doc_id) managed tables, so the equi-JOIN plans with zero shuffle " +
      "exchanges (BucketingSpec asserts the join subtree is exchange-free) — the " +
      "persisted-storage complement of in-session checkpoint memoization. The " +
      "shuffle bytes measured below are the entry's deterministic output ORDER BY " +
      "(a range exchange of the ~500 RESULT rows, not the join inputs)."),
    "sample_priority_k" -> ("Exact-k priority sample: TakeOrderedAndProject — a " +
      "k-row heap per task and a k*P driver merge, never a global sort of the " +
      "corpus."),
    "event_attribution" -> ("Last-touch click attribution, join-free (the as-of " +
      "shape): clicks and purchases union, one hash partition per user, a running " +
      "LAST_VALUE carries the latest click onto each purchase, and the 1-hour " +
      "window bound is checked row-locally after the window — no join operator, " +
      "linear in events per user where the naive spelling re-materializes every " +
      "click per purchase (oracle: DuckDB runs exactly that naive join-then-prune)."),
    "event_zorder_pruned" -> ("Z-order layout consumer. The 2-D rectangle " +
      "(user range x day range) maps driver-side to its covering Morton codes, " +
      "so PartitionFilters lists only those code directories — pruning multiplies " +
      "across dimensions; the exact predicate then filters inside the listed " +
      "files (Round11OpsSpec asserts both the pruned listing and zero lost rows)."),
    "dedup_semantic" -> ("SemDeDup over the landed index base, sub-blocked: " +
      "candidates must share (seed_id, sign-LSH bucket), so the pair join is " +
      "bounded per block instead of quadratic in cluster size (the round-11 sf1 " +
      "curve caught the unblocked form at 13.9x on 10x vectors; the fix holds it " +
      "at 1.4x)."),
    "sketch_distinct_union" -> ("Landed HLL sketch store. The per-source registers " +
      "land once (one word-explode scan); the GLOBAL distinct estimate is " +
      "hll_union_agg over those |sources| binary rows — the sketch side of the " +
      "plan touches no parquet (Round11OpsSpec tripwire). The corpus scans in " +
      "THIS entry's plan belong to the exact-count verdict the oracle checks."),
    "drift_ks" -> ("Two-sample KS distance, two-phase. This plan is phase 2 over " +
      "the per-call-landed value-domain count relation (the ONE corpus scan and " +
      "the driver-side bucket-offset fold already ran): per-bucket cumsum " +
      "windows — parallel across buckets, never a global ordered window — with " +
      "the offsets attached as a broadcast map literal. The single-statement " +
      "form planned THREE corpus scans through CTE inlining; this plans zero."),
    "drift_psi" -> ("Population Stability Index. One map-side-combined groupBy " +
      "(partial_sum under the exchange) collapses the corpus to the " +
      "price-range-bounded bucket grid; the share totals and the PSI sum are " +
      "windows OVER that metadata-sized relation, each bucket term LN-quantized " +
      "once to an integer nano unit so the total sums order-free. Most of the " +
      "measured shuffle records are the single-file fixture's load-time " +
      "rebalance round-robin (absent on multi-file production layouts), not " +
      "the aggregate exchange, which carries <= grid-size rows per mapper."),
    "text_encoding_screen" -> ("Encoding-health screen: four regexp counts per " +
      "row inside ONE codegen'd scan projection — no joins, no shuffle above " +
      "the deterministic output ordering."),
    "entity_match" -> ("Blocked record linkage: the dirty and clean sides meet in " +
      "ONE equi-join on the perturbation-stable (nationkey, last-4) block key — " +
      "never a cross product — with levenshtein verification inside the join " +
      "filter and a per-record ROW_NUMBER election."),
    "retrieval_mmr" -> ("MMR diversified rerank. The plan reads ONLY landed " +
      "relations (candidates, pairwise sims, the k staged pick relations — all " +
      "(queries x k)-bounded regardless of corpus size); no FileScan appears. " +
      "Each greedy step checkpointed before the next, severing Spark's 2^k " +
      "CTE-inlining re-plan (measured 5.0 s -> 0.29 s)."))

  /** Task-metric accumulator: measured bytes, not just claimed shapes. */
  private final class Acc extends org.apache.spark.scheduler.SparkListener {
    val input = new java.util.concurrent.atomic.AtomicLong
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    val shufRecords = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        ()
      }
    }
  }

  private def fmtBytes(b: Long): String =
    if (b >= (1L << 20)) f"${b / 1048576.0}%.1f MiB"
    else if (b >= 1024) f"${b / 1024.0}%.1f KiB"
    else s"$b B"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.tunePerf(spark)
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of the headline shapes\n\n")
    sb.append(s"Generated by `graft.PlanDump` at `$sfDir` (plan shapes are\n")
    sb.append("scale-independent; the data size only changes statistics).\n")
    sb.append("Each section: why this is the plan the 100 TB design wants, the\n")
    sb.append("MEASURED steady-state execution cost (task-metric totals of one\n")
    sb.append("execution after the session's shared relations landed — the\n")
    sb.append("numbers behind the \"corpus never shuffles\" claims), then the\n")
    sb.append("formatted physical plan TREE (node details elided).\n\n")
    sb.append("Note on the measured shuffle: every oracle entry ORDERs its\n")
    sb.append("output for the deterministic cross-engine compare, so the range\n")
    sb.append("exchange of the final RESULT rows (plus its sampling pass) shows\n")
    sb.append("up in the totals. \"Zero shuffles\" claims refer to the\n")
    sb.append("computation upstream of that output ordering — compare the\n")
    sb.append("shuffled record counts to the result-row counts.\n")
    for ((name, note) <- notes) {
      // building the frame lands the session's memoized shared relations
      // (those jobs are NOT counted — the entry's own cost is the claim)
      val df = SparkEntry.queries(name)(spark, sfDir)
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val tree = full.split("\n\n")(0)
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      // execute the entry's OWN plan (df.count() would let the optimizer
      // prune payload columns and understate the measured input)
      val rows = df.queryExecution.toRdd.count()
      // listener delivery is async; give the bus a moment to drain
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(acc)
      val measured =
        s"Measured: ${fmtBytes(acc.input.get)} input read, " +
          s"${fmtBytes(acc.shufBytes.get)} shuffled " +
          s"(${acc.shufRecords.get} records), $rows result rows."
      sb.append(s"\n## $name\n\n$note\n\n$measured\n\n```\n$tree\n```\n")
      println(s"[graft] $name: $measured")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("PLANS.md"),
      sb.toString.getBytes("UTF-8"))
    println(s"[graft] PLANS.md written (${notes.size} entries)")
    spark.stop()
  }
}
