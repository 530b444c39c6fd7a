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
}
