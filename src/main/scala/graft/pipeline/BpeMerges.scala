package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Merge-candidate pair statistics — the corpus-side count a BPE /
  * WordPiece tokenizer-training run performs each merge iteration
  * (Sennrich et al. 2016): count every adjacent token pair, take the
  * most frequent as the next merge. This operator runs the count at
  * whitespace-token grain over the whole corpus and emits the top
  * [[TopK]] merge candidates with deterministic tie-breaks, so two runs
  * (and two engines) pick the identical merge table.
  *
  * Scale shape: pairs come from a per-document LEAD window (documents
  * are the partition key — no global sort, no self-join), the count is
  * a map-side-combined groupBy on the pair, and the top-K is a
  * TakeOrdered over the partial counts — at 100 TB nothing but the
  * (vocab² bounded, heavily combined) pair counts ever shuffles. An
  * actual multi-iteration BPE loop re-runs this with the previous
  * merges applied; each iteration is this same shape.
  */
object BpeMerges {

  val TopK = 30

  def sql(table: String, topK: Int = TopK)(d: Dialect): String =
    s"""WITH words AS (
       |  ${d.wordsRel(table, "doc_id", "text")}
       |),
       |pairs AS (
       |  SELECT word AS left_tok,
       |         LEAD(word) OVER (PARTITION BY id ORDER BY pos) AS right_tok
       |    FROM words
       |)
       |SELECT left_tok, right_tok,
       |       left_tok || '_' || right_tok AS merged,
       |       CAST(COUNT(*) AS BIGINT) AS pair_ct
       |  FROM pairs
       | WHERE right_tok IS NOT NULL
       | GROUP BY left_tok, right_tok
       | ORDER BY pair_ct DESC, left_tok, right_tok
       | LIMIT $topK""".stripMargin

  /** Spark-side pair counting, ROW-LOCAL: adjacent pairs derive from
    * the split array inside each document row, so the token stream is
    * never shuffled into the per-doc LEAD sort the dual-rendered [[sql]]
    * form (kept for the oracle) pays — a pure projection + explode
    * feeding one map-side-combined GROUP BY (spec-pinned identical;
    * the oracle compare re-proves it end-to-end). */
  private[graft] def pairsSparkSql(table: String, topK: Int = TopK): String =
    s"""SELECT left_tok, right_tok,
       |       left_tok || '_' || right_tok AS merged,
       |       CAST(COUNT(*) AS BIGINT) AS pair_ct
       |  FROM (
       |    SELECT ws[i] AS left_tok, ws[i + 1] AS right_tok
       |      FROM (SELECT ws FROM (
       |              SELECT filter(split(LOWER(text), '\\\\s+'), w -> w <> '') AS ws
       |                FROM $table) z0
       |             WHERE size(ws) >= 2) z
       |      LATERAL VIEW explode(sequence(0, size(ws) - 2)) e AS i) p
       | GROUP BY left_tok, right_tok
       | ORDER BY pair_ct DESC, left_tok, right_tok
       | LIMIT $topK""".stripMargin

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_bpe_docs")
    spark.sql(pairsSparkSql("__graft_bpe_docs"))
  }

  def duckSql(): String = sql("documents")(DuckDialect)

  /** The APPLY half of the BPE iteration: run the learned merge table
    * over the corpus with the tokenizer's leftmost-greedy,
    * non-overlapping semantics and report per-document compression.
    * Greedy application is sequential on paper; here it is closed-form:
    * two matches interact only when adjacent (they share a token), so
    * within each maximal run of CONSECUTIVE match positions the greedy
    * scan applies exactly the even offsets — a per-doc window over
    * match runs, no iteration, no state. (Non-adjacent matches are
    * separate runs and all apply.)
    *
    * Scale shape: the merge table is vocab-bounded (broadcast); match
    * detection is the same per-doc LEAD window as the counting pass;
    * run grouping is the standard gaps-and-islands ROW_NUMBER
    * difference, partitioned per document. Nothing but (doc, rollup)
    * rows shuffle. */
  def applySql(table: String, topK: Int = TopK)(d: Dialect): String =
    s"""WITH words AS (
       |  ${d.wordsRel(table, "doc_id", "text")}
       |),
       |apairs AS (
       |  SELECT id, pos, word AS l,
       |         LEAD(word) OVER (PARTITION BY id ORDER BY pos) AS r
       |    FROM words
       |),
       |merges AS (
       |  SELECT l, r FROM (
       |    SELECT l, r, COUNT(*) AS ct FROM apairs WHERE r IS NOT NULL
       |     GROUP BY l, r ORDER BY ct DESC, l, r LIMIT $topK) m
       |),
       |matches AS (
       |  SELECT /*+ BROADCAST(m) */ p.id, p.pos
       |    FROM apairs p JOIN merges m ON m.l = p.l AND m.r = p.r
       |),
       |runs AS (
       |  SELECT id, pos,
       |         pos - ROW_NUMBER() OVER (PARTITION BY id ORDER BY pos) AS grp
       |    FROM matches
       |),
       |applied AS (
       |  SELECT id, pos,
       |         pos - MIN(pos) OVER (PARTITION BY id, grp) AS off
       |    FROM runs
       |),
       |ac AS (
       |  SELECT id, COUNT(*) AS applied_ct FROM applied
       |   WHERE off % 2 = 0 GROUP BY id
       |),
       |tc AS (
       |  SELECT id, COUNT(*) AS token_ct FROM words GROUP BY id
       |)
       |SELECT t.id AS doc_id,
       |       CAST(t.token_ct AS BIGINT) AS tokens_before,
       |       CAST(COALESCE(a.applied_ct, 0) AS BIGINT) AS merges_applied,
       |       CAST(t.token_ct - COALESCE(a.applied_ct, 0) AS BIGINT)
       |         AS tokens_after,
       |       CAST(ROUND(CAST(t.token_ct - COALESCE(a.applied_ct, 0) AS DOUBLE)
       |                  / t.token_ct, 4) AS DOUBLE) AS compression
       |  FROM tc t
       |  LEFT JOIN ac a ON a.id = t.id
       | ORDER BY doc_id""".stripMargin

  def runApply(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_bpe_docs")
    spark.sql(applySql("__graft_bpe_docs")(SparkDialect))
  }

  def duckApplySql(): String = applySql("documents")(DuckDialect)

  // ---------------------------------------------------------------------
  // Iterative character-level BPE TRAINING
  // ---------------------------------------------------------------------

  /** Merge iterations the trainer runs. */
  val TrainSteps = 8

  /** Full BPE training (Sennrich et al. 2016) at character grain — the
    * piece [[sql]] (one pair count) and [[applySql]] (apply a learned
    * table) bracket but don't close: the ITERATIVE loop that actually
    * learns the merge table. The standard at-scale trick makes it
    * tractable: BPE trains on the WORD-FREQUENCY census, not the
    * corpus — one corpus scan lands (word, count), and every iteration
    * runs over the vocabulary-bounded symbol relation (word × symbols),
    * which only SHRINKS as merges apply. Each iteration: (1) count
    * adjacent symbol pairs weighted by word count (per-word LEAD
    * window — the census relation's word is the partition key);
    * (2) elect the top pair with deterministic ties (count DESC, then
    * lexicographic); (3) merge every non-overlapping occurrence
    * leftmost-greedily — the same gaps-and-islands trick as
    * [[applySql]]: within a run of consecutive match positions exactly
    * the odd ranks apply — and renumber positions.
    *
    * Engine-side, Spark runs exactly ONE job: the corpus scan that
    * builds and collects the word census. The census is
    * vocabulary-bounded — the same driver-fits argument every real BPE
    * trainer relies on (Sennrich's reference implementation holds it in
    * a dict) — so the merge election/apply loop runs driver-locally
    * over the collected census, costing microseconds per merge with NO
    * per-merge Spark job. That is what makes a real tokenizer's ~30k
    * merges reachable: wall time is one corpus scan + O(merges × vocab)
    * driver work, not O(merges) cluster round-trips. The learned merge
    * table and the final (word, wct, pos, sym) symbol relation land as
    * local DataFrames for corpus-scale consumers ([[applySql]] applies
    * the table at corpus grain). The DuckDB oracle unrolls
    * [[TrainSteps]] iterations in ONE statement (DuckDB materializes
    * CTEs, so it stays linear) and must elect the identical merges.
    * No end-of-word marker — the census is whitespace-tokenized, so
    * merges never cross word boundaries by construction; a production
    * tokenizer adds its marker in the census projection. */
  private def censusCtes(table: String)(d: Dialect): String =
    s"""words AS (
       |  ${d.wordsRel(table, "doc_id", "text")}
       |),
       |wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wct
       |         FROM words GROUP BY word),
       |syms0 AS ${d.cteMaterialized}(
       |  SELECT word, wct, pos, SUBSTRING(word, pos, 1) AS sym
       |    FROM (${d.seriesRel("wc", Seq("word", "wct"), "LENGTH(word)")}) s
       |)""".stripMargin

  /** Adjacent-pair relation over a symbol relation. */
  private def adjSql(prev: String): String =
    s"""SELECT word, wct, pos, sym,
       |       LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nsym
       |  FROM $prev""".stripMargin

  /** Top-pair election over a symbol relation (engine collects this —
    * one row). */
  private[graft] def bestPairSql(prev: String): String =
    s"""SELECT sym AS l, nsym AS r, CAST(SUM(wct) AS BIGINT) AS ct
       |  FROM (${adjSql(prev)}) adj
       | WHERE nsym IS NOT NULL
       | GROUP BY sym, nsym
       | ORDER BY ct DESC, l, r
       | LIMIT 1""".stripMargin

  /** Apply the merge (l, r) — given as relation `best(l, r)` — to a
    * symbol relation: leftmost-greedy non-overlapping via the islands
    * trick, then renumber. An EMPTY `best` relation degrades to a pure
    * renumbering no-op (the LEFT JOIN ON TRUE leaves hit = 0
    * everywhere), so the oracle's unrolled iterations past corpus
    * exhaustion carry the last real symbol relation forward — matching
    * the engine loop's early stop exactly. */
  private def applyStepSql(prev: String, best: String): String =
    s"""WITH adj AS (${adjSql(prev)}),
       |mt AS (
       |  SELECT a.word, a.wct, a.pos, a.sym, a.nsym,
       |         CASE WHEN a.sym = b.l AND a.nsym = b.r THEN 1 ELSE 0 END AS hit
       |    FROM adj a LEFT JOIN $best b ON TRUE),
       |isl AS (
       |  SELECT word, pos,
       |         pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
       |    FROM mt WHERE hit = 1),
       |keep AS (
       |  SELECT word, pos FROM (
       |    SELECT word, pos,
       |           ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY pos) AS rix
       |      FROM isl) z
       |   WHERE rix % 2 = 1)
       |SELECT word, wct,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS INT) AS pos,
       |       sym
       |  FROM (
       |    SELECT m.word, m.wct, m.pos,
       |           CASE WHEN k.pos IS NOT NULL THEN m.sym || m.nsym
       |                ELSE m.sym END AS sym
       |      FROM mt m
       |      LEFT JOIN keep k ON k.word = m.word AND k.pos = m.pos
       |      LEFT JOIN keep k2 ON k2.word = m.word AND k2.pos = m.pos - 1
       |     WHERE k2.pos IS NULL) r""".stripMargin

  /** The census + all `steps` unrolled iterations as one CTE list.
    * Every chain CTE is explicitly MATERIALIZED oracle-side: DuckDB
    * inlines single-reference CTEs, and the 8-deep syms chain would
    * otherwise multiply the parquet scan ~2^steps times (observed as
    * fd exhaustion before it was marked). */
  private def trainCtes(table: String, steps: Int)(d: Dialect): String = {
    val iters = (1 to steps).map { i =>
      val prev = if (i == 1) "syms0" else s"syms${i - 1}"
      s"""best$i AS ${d.cteMaterialized}(
         |${bestPairSql(prev)}
         |),
         |syms$i AS ${d.cteMaterialized}(
         |  SELECT * FROM (${applyStepSql(prev, s"best$i")}) a$i
         |)""".stripMargin
    }.mkString(",\n")
    s"""${censusCtes(table)(d)},
       |$iters""".stripMargin
  }

  /** Oracle form: all [[TrainSteps]] iterations unrolled in one
    * statement. */
  def trainSql(table: String, steps: Int = TrainSteps)(d: Dialect): String = {
    val union = (1 to steps)
      .map(i => s"SELECT $i AS step, l, r, ct FROM best$i")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH ${trainCtes(table, steps)(d)}
       |SELECT CAST(step AS INT) AS step, l AS left_sym, r AS right_sym,
       |       l || r AS merged, ct AS pair_ct
       |  FROM (
       |  $union
       |) u
       | ORDER BY step""".stripMargin
  }

  def runTrain(spark: SparkSession, dir: String,
               steps: Int = TrainSteps): DataFrame =
    trained(spark, dir, steps)._1

  /** Training result memoized per (session, dir, steps) — the landed
    * merge table plus the final symbol relation's view name. Both
    * `bpe_train` and `bpe_train_compression` (and the Runner `curate`
    * stage) read THIS, so the corpus is scanned once per session, not
    * once per consumer — the same landed-relation discipline as
    * `Retrieval`'s hit lists. */
  private def trained(spark: SparkSession, dir: String,
                      steps: Int): (DataFrame, String) =
    graft.core.SessionCache.getOrElseUpdate(spark, "bpe_trained", (dir, steps)) {
      graft.core.Tables.load(spark, dir, "documents")
        .createOrReplaceTempView("__graft_bpet_docs")
      trainOnRel(spark, "__graft_bpet_docs", steps)
    }

  /** Split `w` into single-codepoint symbols (SUBSTRING in both SQL
    * dialects is codepoint-addressed, so the driver loop must be too). */
  private def codepoints(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  /** Hard bound on the collected census: the driver never holds more
    * than this many (word, count) rows, whatever the corpus. 2^22 rows
    * (~hundreds of MB with symbol vectors) is far above any real BPE
    * vocabulary — standard trainers cap the word census well below
    * this — but it converts the collect from corpus-dependent to
    * bounded-by-construction, like every other driver collect in the
    * engine (≤1024-bucket histograms, 1-row elections, k-row heaps). */
  val CensusTopV: Int = 1 << 22

  /** The training loop over any (doc_id, text) relation — split out so
    * specs can train on inline fixtures. ONE Spark job (the census
    * scan/collect); the merge loop is pure driver-local Scala. Returns
    * the merge table and the FINAL symbol relation's view name.
    *
    * BOUNDED census: the collect keeps only words with
    * `COUNT(*) >= minCount`, top-[[CensusTopV]] by (count DESC, word) —
    * a TakeOrderedAndProject (k-row heap per task + driver merge, no
    * global sort), so driver memory is capped at any corpus size.
    * Exactness boundary: below both bounds (every word kept) the merge
    * table is bit-identical to the full-census election — the fixture
    * path, where the oracle's unrolled SQL training sees the identical
    * census. Above them it is the standard BPE min-count approximation:
    * a dropped word of length L and count c < minCount removes at most
    * c·(L-1) < minCount·(L-1) from any pair's electorate, so merges
    * whose winning margin exceeds the dropped mass are unchanged —
    * hapax web-text noise (typos, URLs, hex ids) cannot outvote any
    * repeated pair, which is why production BPE trainers floor the
    * census as a matter of course. */
  /** The bounded census statement the trainer collects — floor + top-V
    * as ORDER BY/LIMIT so Spark plans a TakeOrderedAndProject (k-row
    * heap per task + driver merge, never a global sort; spec-asserted). */
  private[graft] def censusSql(table: String, minCount: Long): String =
    s"""WITH words AS (
       |  ${SparkDialect.wordsRel(table, "doc_id", "text")}
       |)
       |SELECT word, CAST(COUNT(*) AS BIGINT) AS wct
       |  FROM words GROUP BY word
       |HAVING COUNT(*) >= $minCount
       | ORDER BY wct DESC, word
       | LIMIT $CensusTopV""".stripMargin

  private[graft] def trainOnRel(spark: SparkSession, table: String,
                                steps: Int,
                                minCount: Long = 1L): (DataFrame, String) = {
    import spark.implicits._
    // One corpus scan: collect the bounded word census (floor + top-V).
    var census: Array[(String, Long, Vector[String])] =
      spark.sql(censusSql(table, minCount))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), codepoints(r.getString(0))))
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      // Election: SUM(wct) over adjacent symbol pairs; deterministic
      // ties (count DESC, then lexicographic l, r) — byte-identical to
      // the oracle's `ORDER BY ct DESC, l, r LIMIT 1`.
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      census.foreach { case (_, wct, syms) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + wct)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), ct) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((step, l, r, l + r, ct))
        // Apply leftmost-greedy non-overlapping, per census word.
        census = census.map { case (w, wct, syms) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          (w, wct, out.result())
        }
        step += 1
      }
    }
    val finalRel =
      s"__graft_bpet_final_${java.lang.Integer.toHexString(table.hashCode)}"
    census.toSeq
      .flatMap { case (w, wct, syms) =>
        syms.zipWithIndex.map { case (s, i) => (w, wct, i + 1, s) } }
      .toDF("word", "wct", "pos", "sym")
      .createOrReplaceTempView(finalRel)
    (merges.toSeq.toDF("step", "left_sym", "right_sym", "merged", "pair_ct")
      .orderBy("step"), finalRel)
  }

  private[graft] def trainOn(spark: SparkSession, table: String,
                             steps: Int, minCount: Long = 1L): DataFrame =
    trainOnRel(spark, table, steps, minCount)._1

  def duckTrainSql(): String = trainSql("documents")(DuckDialect)

  /** What the learned merges BOUGHT — the report a tokenizer-fit run
    * reads after training: per census word, symbol count before
    * (characters) vs after the [[TrainSteps]] merges, weighted by word
    * frequency, with the corpus totals and the integer-ppm compression
    * ratio on every row; top [[CompressionTopK]] words by weighted
    * savings (deterministic ties). If the corpus exhausts before the
    * merge budget, both renderings agree by construction: the engine
    * loop stops early keeping the last symbol relation, and the
    * oracle's remaining unrolled [[applyStepSql]] steps are no-ops on
    * an empty best relation. */
  val CompressionTopK = 30

  private def compressionTail(symsRel: String)(d: Dialect): String =
    s"""pw AS (
       |  SELECT word, wct, CAST(COUNT(*) AS BIGINT) AS cnt
       |    FROM $symsRel GROUP BY word, wct
       |),
       |pt AS (
       |  SELECT word, wct, cnt,
       |         CAST(SUM(wct * LENGTH(word)) OVER () AS BIGINT) AS units_before,
       |         CAST(SUM(wct * cnt) OVER () AS BIGINT) AS units_after
       |    FROM pw
       |)
       |SELECT word, CAST(wct AS BIGINT) AS wct,
       |       CAST(LENGTH(word) AS BIGINT) AS chars,
       |       cnt AS tokens_after,
       |       CAST(wct * (LENGTH(word) - cnt) AS BIGINT) AS saved_weighted,
       |       units_before AS corpus_units_before,
       |       units_after AS corpus_units_after,
       |       CAST(${d.intDiv("units_after * 1000000", "units_before")} AS BIGINT)
       |         AS compression_ppm
       |  FROM pt
       | ORDER BY saved_weighted DESC, word
       | LIMIT $CompressionTopK""".stripMargin

  def runTrainCompression(spark: SparkSession, dir: String,
                          steps: Int = TrainSteps): DataFrame = {
    // Reads the memoized training result — NO re-train: the tail is a
    // census-sized aggregate over the already-landed symbol relation.
    val (_, finalRel) = trained(spark, dir, steps)
    spark.sql(s"WITH ${compressionTail(finalRel)(graft.oracle.SparkDialect)}")
  }

  def duckTrainCompressionSql(steps: Int = TrainSteps): String = {
    val d: Dialect = DuckDialect
    s"""WITH ${trainCtes("documents", steps)(d)},
       |${compressionTail(s"syms$steps")(d)}""".stripMargin
  }
}
