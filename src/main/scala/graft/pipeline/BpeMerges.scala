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

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_bpe_docs")
    spark.sql(sql("__graft_bpe_docs")(SparkDialect))
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
    * Engine-side the loop is a driver iteration: the top pair is a
    * ONE-ROW collect (TakeOrdered over the census-bounded pair counts),
    * each new symbol relation lands via checkpoint before the next
    * iteration reads it (the MMR staging discipline — Spark would
    * otherwise re-inline the whole CTE prefix at every reference). The
    * DuckDB oracle unrolls all [[TrainSteps]] iterations in ONE
    * statement (DuckDB materializes CTEs, so it stays linear) and must
    * elect the identical merges. No end-of-word marker — the census is
    * whitespace-tokenized, so merges never cross word boundaries by
    * construction; a production tokenizer adds its marker in the census
    * projection. */
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
    * trick, then renumber. */
  private def applyStepSql(prev: String, best: String): String =
    s"""WITH adj AS (${adjSql(prev)}),
       |mt AS (
       |  SELECT a.word, a.wct, a.pos, a.sym, a.nsym,
       |         CASE WHEN a.sym = b.l AND a.nsym = b.r THEN 1 ELSE 0 END AS hit
       |    FROM adj a CROSS JOIN $best b),
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
               steps: Int = TrainSteps): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_bpet_docs")
    trainOn(spark, "__graft_bpet_docs", steps)
  }

  /** The driver loop over any (doc_id, text) relation — split out so
    * specs can train on inline fixtures. Returns the merge table and
    * the FINAL landed symbol relation's view name. */
  private[graft] def trainOnRel(spark: SparkSession, table: String,
                                steps: Int): (DataFrame, String) = {
    import spark.implicits._
    def esc(s: String) = s.replace("'", "''")
    var prev = "__graft_bpet_syms0"
    spark.sql(s"WITH ${censusCtes(table)(SparkDialect)} " +
        "SELECT * FROM syms0")
      .localCheckpoint(eager = true).createOrReplaceTempView(prev)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= steps && !exhausted) {
      val top = spark.sql(bestPairSql(prev)).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, ct) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i, l, r, l + r, ct))
        val next = s"__graft_bpet_syms$i"
        spark.sql(applyStepSql(prev,
            s"(SELECT '${esc(l)}' AS l, '${esc(r)}' AS r)"))
          .localCheckpoint(eager = true).createOrReplaceTempView(next)
        prev = next
        i += 1
      }
    }
    (merges.toSeq.toDF("step", "left_sym", "right_sym", "merged", "pair_ct")
      .orderBy("step"), prev)
  }

  private[graft] def trainOn(spark: SparkSession, table: String,
                             steps: Int): DataFrame =
    trainOnRel(spark, table, steps)._1

  def duckTrainSql(): String = trainSql("documents")(DuckDialect)

  /** What the learned merges BOUGHT — the report a tokenizer-fit run
    * reads after training: per census word, symbol count before
    * (characters) vs after the [[TrainSteps]] merges, weighted by word
    * frequency, with the corpus totals and the integer-ppm compression
    * ratio on every row; top [[CompressionTopK]] words by weighted
    * savings (deterministic ties). Precondition shared with the oracle
    * rendering: the merge budget is smaller than the corpus's pair
    * mass (any real corpus; spec-pinned on the fixture), so all
    * [[TrainSteps]] iterations learn a merge. */
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
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_bpet_docs")
    val (_, finalRel) = trainOnRel(spark, "__graft_bpet_docs", steps)
    spark.sql(s"WITH ${compressionTail(finalRel)(graft.oracle.SparkDialect)}")
  }

  def duckTrainCompressionSql(steps: Int = TrainSteps): String = {
    val d: Dialect = DuckDialect
    s"""WITH ${trainCtes("documents", steps)(d)},
       |${compressionTail(s"syms$steps")(d)}""".stripMargin
  }
}
