package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

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
}
