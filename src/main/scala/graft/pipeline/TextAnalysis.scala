package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Text-analysis operators for large-scale training-data pipelines over
  * the `documents` table: token counting (whitespace + word/number/
  * punctuation regex), language identification (stopword-vote
  * heuristic), quality scoring (length / punctuation / stopword
  * composite), and document fingerprinting (normalized-content hash).
  *
  * All single-scan, codegen-friendly column expressions — no UDFs, no
  * shuffles; at 100 TB this runs embarrassingly parallel per partition.
  */
object TextAnalysis {

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "for", "on", "with", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "una", "para", "en", "que"))

  private def stopCount(lang: String, d: Dialect): String =
    stopCountOf("text", lang, d)

  private def stopCountOf(textExpr: String, lang: String, d: Dialect): String = {
    val alt = stopwords(lang).mkString("|")
    d.regexpCount(s"LOWER($textExpr)", s"\\b($alt)\\b")
  }

  /** The stopword-vote language guess of `textExpr` as a dialect-neutral
    * expression — the same CASE ladder the doc-level `lang_guess` column
    * uses, reusable at any grain (chunks, spans). */
  def langGuessExpr(textExpr: String)(d: Dialect): String = {
    val pairs = stopwords.keys.toSeq.sorted
    val votes = pairs.map(l => l -> stopCountOf(textExpr, l, d)).toMap
    val best = pairs.map { l =>
      val others = pairs.filterNot(_ == l)
        .map(o => s"${votes(l)} >= ${votes(o)}").mkString(" AND ")
      s"WHEN ${votes(l)} > 0 AND $others THEN '$l'"
    }
    s"CASE ${best.mkString(" ")} ELSE 'unknown' END"
  }

  /** One row per document with every text metric. `extraCols` pass
    * grouping columns (e.g. source, lang) through the single scan so a
    * downstream rollup needs no second read of the corpus; `ordered`
    * off renders the projection without the final sort (streaming
    * frames reject ORDER BY). */
  def sql(table: String, extraCols: Seq[String] = Nil,
          ordered: Boolean = true)(d: Dialect): String = {
    val extras = extraCols.map(c => s"$c,\n  ").mkString
    val wsTokens = d.regexpCount("text", "\\S+")
    val reTokens = d.regexpCount("text", "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
    val alphaCt = s"LENGTH(${d.regexpReplace("text", "[^A-Za-z]", "")})"
    val punctCt = s"LENGTH(text) - LENGTH(${d.regexpReplace("text", """[.,;:!?"'()\[\]{}]""", "")})"
    val norm = s"TRIM(${d.regexpReplace("LOWER(text)", "[^a-z0-9]+", " ")})"
    val langCase = langGuessExpr("text")(d)
    s"""SELECT doc_id,
       |  ${extras}CAST(LENGTH(text) AS BIGINT) AS char_ct,
       |  CAST($wsTokens AS BIGINT) AS ws_token_ct,
       |  CAST($reTokens AS BIGINT) AS re_token_ct,
       |  CAST(ROUND(CAST($alphaCt AS DOUBLE) / NULLIF(LENGTH(text), 0), 4) AS DOUBLE) AS alpha_ratio,
       |  CAST(ROUND(CAST($punctCt AS DOUBLE) / NULLIF(LENGTH(text), 0), 4) AS DOUBLE) AS punct_ratio,
       |  CAST(ROUND(CAST(${stopCount("en", d)} AS DOUBLE) / NULLIF($wsTokens, 0), 4) AS DOUBLE) AS stopword_ratio,
       |  CAST(ROUND(CAST($alphaCt AS DOUBLE) / NULLIF($wsTokens, 0), 4) AS DOUBLE) AS avg_word_len,
       |  CAST(ROUND(LEAST(1.0, $wsTokens / 50.0)
       |       * (1.0 - LEAST(1.0, 2.0 * CAST($punctCt AS DOUBLE) / NULLIF(LENGTH(text), 0)))
       |       * (0.25 + 0.75 * LEAST(1.0, 4.0 * CAST(${stopCount("en", d)} AS DOUBLE) / NULLIF($wsTokens, 0))), 4)
       |       AS DOUBLE) AS quality_score,
       |  $langCase AS lang_guess,
       |  MD5($norm) AS fingerprint
       |FROM $table${if (ordered) "\nORDER BY doc_id" else ""}""".stripMargin
  }

  /** Regexp-replace with the 'g' flag spelled per dialect (the shared
    * Dialect.regexpReplace already renders globally on both). */
  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_docs")
    spark.sql(sql("__graft_docs")(SparkDialect))
  }

  def duckSql(): String = sql("documents")(DuckDialect)
}
