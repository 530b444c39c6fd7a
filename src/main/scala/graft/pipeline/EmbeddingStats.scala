package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Embedding-corpus health: the sanity pass before any ANN, dedup, or
  * clustering run touches an embedding table — per label: vector count,
  * dimension consistency (a ragged column breaks every kernel
  * downstream), zero-vector count (cosine is undefined on them), norm
  * spread, and dispersion as the mean cosine to the label centroid
  * (a collapsed label — all vectors near-identical — shows dispersion
  * near 1; random vectors near 0).
  *
  * Scale shape: one scan computes lengths and norms per row; the
  * centroid explode aggregates (label, pos) partials map-side — what
  * shuffles is labels × dims, not vectors × dims; centroids come back
  * as a broadcast-sized array relation joined into the per-row cosine
  * pass.
  *
  * Determinism: per-component centroid sums use scaled-BIGINT
  * accumulation and the means use the integer half-up rounding (see
  * [[CorpusStats]]) — float summation order differs between the
  * engines. Norms stay exact: [[Dialect.dotProduct]] guarantees
  * sequential summation on both sides.
  */
object EmbeddingStats {

  def sql(table: String)(d: Dialect): String = {
    val normExpr = s"SQRT(${d.dotProduct("embedding", "embedding")})"
    def scaledMean(x: String) = s"${d.intDiv(
      s"2 * SUM(CAST(ROUND(($x) * 10000) AS BIGINT)) + COUNT($x)",
      s"NULLIF(2 * COUNT($x), 0)")} / 10000.0"
    s"""WITH base AS (
       |  SELECT vec_id, label, embedding,
       |         ${d.arrayLen("embedding")} AS dim,
       |         $normExpr AS nrm
       |    FROM $table
       |),
       |comp AS (${d.arrayPosRel(table, "label", "embedding")}),
       |cent AS (
       |  SELECT label, pos,
       |         SUM(CAST(ROUND(val * 100000) AS BIGINT)) AS sval,
       |         COUNT(*) AS n
       |    FROM comp GROUP BY label, pos
       |),
       |centarr AS (
       |  SELECT label,
       |         ${d.arrayAggOrdered("CAST(sval AS DOUBLE) / (n * 100000.0)", "pos")} AS centroid
       |    FROM cent GROUP BY label
       |),
       |cosx AS (
       |  SELECT b.label, b.dim, b.nrm,
       |         CASE WHEN b.nrm > 0 THEN
       |           ${d.dotProduct("b.embedding", "c.centroid")}
       |             / (b.nrm * SQRT(${d.dotProduct("c.centroid", "c.centroid")}))
       |         END AS cosv
       |    FROM base b JOIN centarr c ON c.label = b.label
       |)
       |SELECT label,
       |  CAST(COUNT(*) AS BIGINT) AS vec_ct,
       |  CAST(MIN(dim) AS INT) AS min_dim,
       |  CAST(MAX(dim) AS INT) AS max_dim,
       |  CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_ct,
       |  CAST(ROUND(MIN(nrm), 4) AS DOUBLE) AS min_norm,
       |  CAST(ROUND(MAX(nrm), 4) AS DOUBLE) AS max_norm,
       |  CAST(${scaledMean("nrm")} AS DOUBLE) AS avg_norm,
       |  CAST(${scaledMean("cosv")} AS DOUBLE) AS avg_cos_centroid
       |FROM cosx
       |GROUP BY label
       |ORDER BY label""".stripMargin
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "embeddings", parallelize = false)
      .createOrReplaceTempView("__graft_emb_stats")
    spark.sql(sql("__graft_emb_stats")(SparkDialect))
  }

  def duckSql(): String = sql("embeddings")(DuckDialect)
}
