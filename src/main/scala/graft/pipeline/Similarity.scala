package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Similarity search over the `embeddings` table (vec_id,
  * embedding ARRAY<FLOAT>, label).
  *
  *  - Brute-force cosine top-k: exact baseline — query set × corpus dot
  *    products via `zip_with`/`aggregate` (Spark) / `list_dot_product`
  *    (DuckDB oracle), ranked per query. At scale the corpus side
  *    stays partitioned; only the (tiny) query set broadcasts.
  *  - IVF-style partitioned search: per-label centroids (element-wise
  *    mean via position explode + ordered re-assembly); each query
  *    probes its nearest centroid and searches ONLY that partition —
  *    the scale path that turns a full scan into one partition scan
  *    per query.
  */
object Similarity {

  private def cosine(d: Dialect, a: String, b: String): String =
    s"(${d.dotProduct(a, b)} / (SQRT(${d.dotProduct(a, a)}) * SQRT(${d.dotProduct(b, b)})))"

  /** Top-k neighbors for vec_id < `nQueries` by cosine similarity. */
  def bruteForceSql(table: String, nQueries: Int = 5, k: Int = 10)(d: Dialect): String = {
    val cos = cosine(d, "q.embedding", "c.embedding")
    s"""WITH q AS (SELECT vec_id, embedding FROM $table WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         $cos AS cos
       |    FROM q JOIN $table c ON c.vec_id <> q.vec_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM scored
       |)
       |SELECT query_id, neighbor_id, CAST(ROUND(cos, 4) AS DOUBLE) AS cosine, rank
       |  FROM ranked WHERE rank <= $k
       | ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-style: probe the nearest per-label centroid, search only that
    * partition. */
  def ivfSql(table: String, nQueries: Int = 5, k: Int = 5)(d: Dialect): String = {
    val qcCos = cosine(d, "q.embedding", "c.centroid")
    val cos = cosine(d, "q.embedding", "e.embedding")
    s"""WITH flat AS (
       |  SELECT label, pos, val FROM (
       |    ${d.arrayPosRel(table, "label", "embedding")}
       |  ) t
       |),
       |centroids AS (
       |  SELECT label, ${d.arrayAggOrdered("avgv", "pos")} AS centroid FROM (
       |    SELECT label, pos, AVG(val) AS avgv FROM flat GROUP BY label, pos
       |  ) g GROUP BY label
       |),
       |q AS (SELECT vec_id, embedding FROM $table WHERE vec_id < $nQueries),
       |probe AS (
       |  SELECT query_id, label FROM (
       |    SELECT q.vec_id AS query_id, c.label, $qcCos AS ccos,
       |           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY $qcCos DESC, c.label) AS rn
       |      FROM q CROSS JOIN centroids c
       |  ) p WHERE rn = 1
       |),
       |hits AS (
       |  SELECT q.vec_id AS query_id, p.label AS probed_label, e.vec_id AS neighbor_id,
       |         $cos AS cos
       |    FROM q JOIN probe p ON p.query_id = q.vec_id
       |    JOIN $table e ON e.label = p.label AND e.vec_id <> q.vec_id
       |)
       |SELECT query_id, probed_label, neighbor_id,
       |       CAST(ROUND(cos, 4) AS DOUBLE) AS cosine, rank
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |          FROM hits) r
       | WHERE rank <= $k
       | ORDER BY query_id, rank""".stripMargin
  }

  private def register(spark: SparkSession, dir: String): String = {
    graft.core.Tables.load(spark, dir, "embeddings")
      .createOrReplaceTempView("__graft_emb")
    "__graft_emb"
  }

  def runBruteForce(spark: SparkSession, dir: String): DataFrame =
    spark.sql(bruteForceSql(register(spark, dir))(SparkDialect))
  def runIvf(spark: SparkSession, dir: String): DataFrame =
    spark.sql(ivfSql(register(spark, dir))(SparkDialect))
}
