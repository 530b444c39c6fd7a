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
}
