package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Token-length histogram — the doc-length distribution every packing /
  * context-window plan starts from: per (source, power-of-2 token
  * bucket) doc counts with token totals and the bucket's share of its
  * source. One scan, map-side-combinable rollup; the bucket id is
  * FLOOR(LOG2(tokens)), so the histogram stays ~30 rows per source at
  * any corpus size. */
object TokenHistogram {

  /** floor(log2(n)) as a pure integer comparison ladder — float LOG2
    * diverges between engines at exact powers of two; the ladder is
    * bit-identical everywhere and constant-folds into codegen. */
  private def log2Bucket(x: String, maxPow: Int = 40): String = {
    val whens = (1 to maxPow).map(p =>
      s"WHEN $x < ${1L << p} THEN ${p - 1}").mkString(" ")
    s"(CASE $whens ELSE $maxPow END)"
  }

  def sql(table: String)(d: Dialect): String = {
    val tokens = d.regexpCount("text", "\\S+")
    val bucket = log2Bucket("token_ct")
    s"""WITH t AS (
       |  SELECT source, GREATEST(1, CAST($tokens AS BIGINT)) AS token_ct
       |    FROM $table
       |)
       |SELECT source,
       |       CAST($bucket AS INT) AS log2_bucket,
       |       CAST(POWER(2, $bucket) AS BIGINT) AS bucket_min_tokens,
       |       CAST(COUNT(*) AS BIGINT) AS doc_ct,
       |       CAST(SUM(token_ct) AS BIGINT) AS token_ct,
       |       CAST(ROUND(CAST(COUNT(*) AS DOUBLE)
       |                  / SUM(COUNT(*)) OVER (PARTITION BY source), 4)
       |            AS DOUBLE) AS source_share
       |  FROM t
       | GROUP BY source, $bucket
       | ORDER BY source, log2_bucket""".stripMargin
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_tokhist_docs")
    spark.sql(sql("__graft_tokhist_docs")(SparkDialect))
  }

  def duckSql(): String = sql("documents")(DuckDialect)
}

/** Corpus-level token-budget accounting: the per-(source, language)
  * rollup a training-data curation run reports — document and token
  * counts, mean quality, the repetitive share from the Gopher-style
  * filters, and the exact-duplicate rate from content fingerprints.
  *
  * Composes the per-document signal relations ([[TextAnalysis]],
  * [[Repetition]]) and rolls them up to a handful of groups. The
  * repetition join is LEFT: a zero-token document has no repetition
  * row (wordsRel drops empty words), but it still counts toward the
  * budget and the dup rate (empty duplicates are a classic dedup
  * class) — means average only the documents that carry the signal.
  *
  * Scan discipline: text analysis carries source/lang through its one
  * scan, and the repetition side joins the memoized materialized
  * output ([[Repetition.outView]]) — the production shape where
  * signals land once per corpus pass and rollups read the landed
  * columns. The group-by itself moves only (source, lang) partials — a
  * broadcast-sized result at any corpus scale.
  *
  * Averages sum the 4-decimal signals as scaled BIGINTs (exactly
  * representable), not doubles — a floating AVG's partial-sum order
  * differs between Spark's parallel and DuckDB's sequential
  * aggregation and flips the last rounded digit — and the final
  * half-up rounding happens in integer arithmetic (intDiv of
  * 2·sum + n by 2·n): Spark's ROUND rounds the shortest decimal
  * rendering of a double, DuckDB's its binary value, and they disagree
  * one ulp below a .00005 boundary.
  */
object CorpusStats {

  /** The rollup over a text-analysis relation (which carries source and
    * lang through its single scan) and a repetition relation. */
  private def rollupSql(taRel: String, repRel: String)(d: Dialect): String =
    s"""SELECT ta.source, ta.lang,
       |  CAST(COUNT(*) AS BIGINT) AS doc_ct,
       |  CAST(SUM(COALESCE(ta.ws_token_ct, 0)) AS BIGINT) AS token_ct,
       |  CAST(${d.intDiv(
                 "2 * SUM(CAST(ROUND(ta.quality_score * 10000) AS BIGINT)) + COUNT(ta.quality_score)",
                 "NULLIF(2 * COUNT(ta.quality_score), 0)")} / 10000.0 AS DOUBLE) AS avg_quality,
       |  CAST(${d.intDiv(
                 "2 * SUM(CAST(ROUND(rep.distinct_ratio * 10000) AS BIGINT)) + COUNT(rep.distinct_ratio)",
                 "NULLIF(2 * COUNT(rep.distinct_ratio), 0)")} / 10000.0 AS DOUBLE) AS avg_distinct_ratio,
       |  CAST(SUM(COALESCE(rep.repetitive_flag, 0)) AS BIGINT) AS repetitive_ct,
       |  CAST(COUNT(DISTINCT ta.fingerprint) AS BIGINT) AS distinct_fingerprints,
       |  CAST(COUNT(*) - COUNT(DISTINCT ta.fingerprint) AS BIGINT) AS dup_doc_ct
       |FROM $taRel ta
       |LEFT JOIN $repRel rep ON rep.doc_id = ta.doc_id
       |GROUP BY ta.source, ta.lang
       |ORDER BY ta.source, ta.lang""".stripMargin

  def sql(table: String)(d: Dialect): String =
    rollupSql(s"(${TextAnalysis.sql(table, Seq("source", "lang"))(d)})",
      s"(${Repetition.sql(table)(d)})")(d)

  def run(spark: SparkSession, dir: String): DataFrame = {
    val docs = "__graft_corpus_docs"
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView(docs)
    // ONE corpus scan (text analysis with source/lang passthrough)
    // joined against the memoized repetition output — not the inline
    // CTE composition, which Spark would re-scan per reference
    spark.sql(rollupSql(
      s"(${TextAnalysis.sql(docs, Seq("source", "lang"))(SparkDialect)})",
      Repetition.outView(spark, dir))(SparkDialect))
  }

  def duckSql(): String = sql("documents")(DuckDialect)

  /** Post-gate corpus budget — what actually ships to training after
    * [[QualityGate]]: per (source, lang), surviving documents and tokens
    * next to the raw budget, with per-rule drop counts so a curation run
    * can see WHERE each slice lost mass. Same shape discipline as the
    * raw rollup: per-doc signal joins on doc_id, then a (source, lang)
    * group-by whose result is broadcast-sized at any corpus scale. */
  private def keptRollupSql(taRel: String, gateRel: String)(d: Dialect): String =
    s"""SELECT ta.source, ta.lang,
       |  CAST(COUNT(*) AS BIGINT) AS doc_ct,
       |  CAST(SUM(g.keep) AS BIGINT) AS kept_doc_ct,
       |  CAST(SUM(COALESCE(ta.ws_token_ct, 0)) AS BIGINT) AS token_ct,
       |  CAST(SUM(CASE WHEN g.keep = 1 THEN COALESCE(ta.ws_token_ct, 0)
       |           ELSE 0 END) AS BIGINT) AS kept_token_ct,
       |  CAST(SUM(g.low_quality) AS BIGINT) AS low_quality_ct,
       |  CAST(SUM(g.repetitive) AS BIGINT) AS repetitive_ct,
       |  CAST(SUM(g.boilerplate) AS BIGINT) AS boilerplate_ct,
       |  CAST(SUM(g.dup_dropped) AS BIGINT) AS dup_dropped_ct
       |FROM $taRel ta
       |JOIN $gateRel g ON g.doc_id = ta.doc_id
       |GROUP BY ta.source, ta.lang
       |ORDER BY ta.source, ta.lang""".stripMargin

  def runKept(spark: SparkSession, dir: String): DataFrame = {
    val docs = "__graft_corpus_docs"
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView(docs)
    spark.sql(keptRollupSql(
      s"(${TextAnalysis.sql(docs, Seq("source", "lang"))(SparkDialect)})",
      QualityGate.outView(spark, dir))(SparkDialect))
  }

  def duckKeptSql(): String =
    keptRollupSql(
      s"(${TextAnalysis.sql("documents", Seq("source", "lang"))(DuckDialect)})",
      s"(${QualityGate.duckSql()})")(DuckDialect)

  /** Language-ID confusion — the labeled `lang` against the n-gram
    * heuristic's `lang_guess`, with each cell's share of its labeled
    * row. Labels are frequently wrong or missing in crawled corpora;
    * the confusion matrix is how a curation run audits them before
    * trusting either side. Share rounding runs in integer arithmetic
    * (the scaled half-up intDiv trick) so both engines agree. */
  private def confusionSql(taRel: String)(d: Dialect): String =
    s"""SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS doc_ct,
       |  CAST(${d.intDiv(
                 "2 * 10000 * COUNT(*) + SUM(COUNT(*)) OVER (PARTITION BY lang)",
                 "2 * SUM(COUNT(*)) OVER (PARTITION BY lang)")} / 10000.0
       |       AS DOUBLE) AS lang_share
       |FROM $taRel
       |GROUP BY lang, lang_guess
       |ORDER BY lang, lang_guess""".stripMargin

  def runConfusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = "__graft_corpus_docs"
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView(docs)
    spark.sql(confusionSql(
      s"(${TextAnalysis.sql(docs, Seq("lang"))(SparkDialect)})")(SparkDialect))
  }

  def duckConfusionSql(): String =
    confusionSql(
      s"(${TextAnalysis.sql("documents", Seq("lang"))(DuckDialect)})")(DuckDialect)
}

/** Temperature-based source mixing weights — the standard multinomial
  * alpha-sampling of multilingual/multi-source pretraining (weight ∝
  * corpus_share^alpha, alpha = 0.5): flattens the source distribution
  * so small sources are upsampled relative to their share without
  * letting any dominate. Emits per source the token count, raw corpus
  * share, normalized mixture weight, and the implied upsample factor a
  * sampler applies. One scan + two metadata-sized scalar rollups.
  */
object SourceMixture {

  val Alpha = 0.5

  def sql(table: String)(d: Dialect): String = {
    val tokens = d.regexpCount("text", "\\S+")
    // the per-source weight is scaled to an integer BEFORE the
    // normalizing sum: a SUM over doubles is aggregation-order-dependent
    // and the two engines aggregate in different orders (the same
    // determinism discipline as the scaled-integer averages above);
    // integer sums are exact at any order
    s"""WITH d0 AS (
       |  SELECT source, CAST($tokens AS BIGINT) AS tk FROM $table
       |),
       |t AS (SELECT source, SUM(tk) AS tok FROM d0 GROUP BY source),
       |tot AS (SELECT SUM(tok) AS tt FROM t),
       |w AS (
       |  SELECT source, tok,
       |         CAST(ROUND(SQRT(CAST(tok AS DOUBLE) / tt) * 100000000) AS BIGINT) AS raw8
       |    FROM t CROSS JOIN tot
       |),
       |n AS (SELECT SUM(raw8) AS sw8 FROM w)
       |SELECT w.source, CAST(w.tok AS BIGINT) AS token_ct,
       |       CAST(ROUND(CAST(w.tok AS DOUBLE) / t2.tt, 4) AS DOUBLE) AS corpus_share,
       |       CAST(ROUND(CAST(w.raw8 AS DOUBLE) / n.sw8, 4) AS DOUBLE) AS mixture_weight,
       |       CAST(ROUND((CAST(w.raw8 AS DOUBLE) / n.sw8)
       |                  / (CAST(w.tok AS DOUBLE) / t2.tt), 4)
       |            AS DOUBLE) AS upsample_factor
       |  FROM w CROSS JOIN tot t2 CROSS JOIN n
       | ORDER BY source""".stripMargin
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_mix_docs")
    spark.sql(sql("__graft_mix_docs")(SparkDialect))
  }

  def duckSql(): String = sql("documents")(DuckDialect)
}
