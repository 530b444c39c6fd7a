package graft.profiling

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.oracle.{Dialect, DuckDialect}

/** Bounded-memory heavy hitters — the 100 TB shape of frequency analysis.
  *
  * The reference's frequency analysis materializes exact per-column value
  * counts (reference: testgen/commands/run_profiling.py:179-184 — one
  * top-frequency query per qualifying column), and [[FreqProfiler]] keeps
  * that exact shape. Over a token-grain corpus column that shape shuffles
  * one row per DISTINCT token; at web scale the distinct-token relation
  * is itself too large to want. This operator reports every token with
  * support ≥ 1/K exactly, with memory and shuffle bounded by the sketch
  * size — the classic two-pass scheme:
  *
  *  - pass 1: each partition summarizes its token stream with an
  *    m-counter Misra–Gries sketch (Misra & Gries 1982, "Finding repeated
  *    elements"; estimate error ≤ n/(m+1)), and the per-partition
  *    sketches tree-merge into ONE m-counter summary (sum counts, then
  *    subtract the (m+1)-th largest and drop the non-positive — merges
  *    preserve the n/(m+1) error bound, Agarwal et al. 2012, "Mergeable
  *    summaries"). With m = 2K, any token with global count ≥ N/K keeps
  *    a positive merged estimate (N/K > N/(m+1)), so the ≤ m candidate
  *    keys are a SUPERSET of the true heavy hitters at ANY partition
  *    count — the driver never sees more than m strings, no matter how
  *    many tasks scanned;
  *  - pass 2: one more scan counts ONLY the candidates exactly (every
  *    non-candidate token collapses onto a single NULL key at the map
  *    side, so the shuffle carries ≤ m+1 keys per mapper, while its
  *    count still lands in the grand total), and the support filter
  *    `ct·K ≥ total` keeps exactly the true heavy hitters.
  *
  * The output is therefore bit-identical to the exact global GROUP BY —
  * which is what the DuckDB oracle runs — with corpus-size-independent
  * state. The sketch pass is the one place the engine drops to RDD
  * (`treeAggregate`): genuinely per-partition imperative logic with a
  * non-algebraic merge, the case the DataFrame API cannot express.
  */
object HeavyHitters {

  /** Support threshold: a heavy hitter holds ≥ 1/K of all tokens. */
  val K = 200

  /** Misra–Gries counters; m ≥ K preserves the superset guarantee
    * through merges, 2K halves the spurious-candidate rate. */
  val SummarySize = 2 * K

  private type Sketch = java.util.HashMap[String, java.lang.Long]

  /** Weight-1 Misra–Gries insert: count if tracked, adopt if a slot is
    * free, else decrement every counter (dropping the exhausted). */
  private[profiling] def insert(sk: Sketch, w: String, m: Int): Sketch = {
    val cur = sk.get(w)
    if (cur != null) sk.put(w, cur + 1L)
    else if (sk.size < m) sk.put(w, 1L)
    else {
      val entries = sk.entrySet().iterator()
      while (entries.hasNext) {
        val e = entries.next()
        if (e.getValue == 1L) entries.remove() else e.setValue(e.getValue - 1L)
      }
    }
    sk
  }

  /** Merge two sketches: sum counts, then if over m counters subtract
    * the (m+1)-th largest sum from all and drop the non-positive —
    * at most m survive, error bounds add. */
  private[profiling] def merge(a: Sketch, b: Sketch, m: Int): Sketch = {
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    from.forEach { (w, c) =>
      val cur = into.get(w)
      into.put(w, if (cur != null) cur + c else c)
    }
    if (into.size > m) {
      val counts = into.values().asScala.map(_.longValue).toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (m + 1)) // (m+1)-th largest
      val entries = into.entrySet().iterator()
      while (entries.hasNext) {
        val e = entries.next()
        if (e.getValue <= cut) entries.remove() else e.setValue(e.getValue - cut)
      }
    }
    into
  }

  /** One partition's sketch as weighted entries — the shuffle-sized
    * relation the streaming twin moves (≤ m rows per task, never the
    * token stream). */
  private[graft] def partitionSketch(it: Iterator[String], m: Int): Iterator[(String, Long)] = {
    val sk = new Sketch()
    while (it.hasNext) insert(sk, it.next(), m)
    sk.entrySet().asScala.map(e => (e.getKey, e.getValue.longValue)).iterator
  }

  /** Fold a trigger's weighted sketch entries into the running summary
    * (mergeable-summaries merge + trim) — the streaming twin's state
    * transition; bounded by m keys whatever streamed before. */
  private[graft] def mergeInto(prev: Map[String, Long],
                               entries: Iterator[(String, Long)],
                               m: Int): Map[String, Long] = {
    val a = new Sketch()
    prev.foreach { case (w, c) => a.put(w, c) }
    val b = new Sketch()
    entries.foreach { case (w, c) =>
      val cur = b.get(w)
      b.put(w, if (cur != null) cur + c else c)
    }
    merge(a, b, m).asScala.map { case (w, c) => (w, c.longValue) }.toMap
  }

  /** Tokenization identical to the oracle's `wordsRel`: lowercase, split
    * on runs of whitespace, drop empties. */
  private def tokens(docs: DataFrame) =
    docs.select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .where(col("word") =!= "")

  /** Pass 1: the ≤ SummarySize global candidate keys. */
  private[graft] def candidates(spark: SparkSession, toks: DataFrame): Seq[String] = {
    import spark.implicits._
    val m = SummarySize
    toks.as[String].rdd
      .treeAggregate(new Sketch())(
        (sk, w) => insert(sk, w, m), (x, y) => merge(x, y, m), depth = 2)
      .keySet().asScala.toSeq.sorted
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val toks = tokens(docs)
    val cands = candidates(spark, toks)
    if (cands.isEmpty)
      return toks.groupBy("word").agg(count(lit(1)).as("ct"))
        .selectExpr("word", "ct", "CAST(NULL AS BIGINT) AS support_bp").limit(0)
    // pass 2: exact candidate counts; non-candidates collapse to one
    // NULL key map-side but still count toward the total
    val keyed = toks
      .groupBy(when($"word".isInCollection(cands), $"word").as("word"))
      .agg(count(lit(1)).as("ct"))
    keyed
      // the window runs over ≤ (SummarySize + 1) rows — metadata-sized
      .withColumn("total", sum($"ct").over(Window.partitionBy(lit(1))))
      .where($"word".isNotNull && $"ct" * K >= $"total")
      .selectExpr("word", "ct", "(ct * 10000) DIV total AS support_bp")
      .orderBy($"ct".desc, $"word")
  }

  /** The exact global form the two-pass scheme must reproduce. */
  def sql(table: String)(d: Dialect): String =
    s"""WITH w AS (${d.wordsRel(table, "doc_id", "text")}),
       |g AS (SELECT word, COUNT(*) AS ct FROM w GROUP BY word),
       |t AS (SELECT SUM(ct) AS total FROM g)
       |SELECT g.word, g.ct,
       |       CAST(${d.intDiv("g.ct * 10000", "t.total")} AS BIGINT) AS support_bp
       |  FROM g, t
       | WHERE g.ct * $K >= t.total
       | ORDER BY g.ct DESC, g.word""".stripMargin

  def duckSql(): String = sql("documents")(DuckDialect)
}
