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

  /** Deterministic random hyperplanes (fixed LCG seed) for sign-LSH.
    * Components are short decimal literals so both engines parse the
    * exact same doubles. */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var s = 0x5DEECE66DL
    def next(): Double = {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      (((s >>> 33) % 1999).toInt - 999) / 1000.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** Sign-LSH bucketed ANN: each vector hashes to a `nPlanes`-bit bucket
    * by the signs of its projections onto fixed random hyperplanes
    * (hamming-cosine LSH); queries search ONLY their bucket, then rank
    * by exact cosine. The scale path beyond IVF: no centroid training,
    * bucket id is a pure per-row expression, and the candidate join is
    * an equi-join on bucket — at 100 TB the corpus shuffles once on
    * bucket (or is written bucket-partitioned) and each query touches
    * ~1/2^nPlanes of it. Projections are unrolled element sums so both
    * engines evaluate the same addition order — bit-identical buckets.
    */
  /** The sign-LSH bucket id of `vec` as a dialect-neutral expression
    * (unrolled element sums — both engines evaluate the same addition
    * order, so buckets are bit-identical). Shared by the ANN path below
    * and the LSH-blocked embedding dedup
    * ([[graft.pipeline.Dedup.embeddingLshSql]]). */
  def bucketExpr(vec: String, nPlanes: Int = 8, dim: Int = 64)(d: Dialect): String = {
    val planes = hyperplanes(nPlanes, dim)
    def proj(w: Seq[Double]): String =
      w.zipWithIndex.map { case (wv, i) =>
        s"${d.elementAt(vec, i + 1)} * ($wv)"
      }.mkString(" + ")
    planes.zipWithIndex.map { case (w, p) =>
      s"(CASE WHEN ${proj(w)} >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  def lshSql(table: String, nQueries: Int = 5, k: Int = 5,
             nPlanes: Int = 8, dim: Int = 64)(d: Dialect): String =
    lshBody(table, nQueries, k, bucketExpr("embedding", nPlanes, dim)(d))(d)

  /** Production-path bucket form: the SAME sign-LSH bucket as [[lshSql]]
    * but with each plane projection as an array-literal `zip_with` fold
    * instead of unrolled element sums. Catalyst constant-folds each
    * plane to ONE array literal, so the expression stays compact at
    * production dims (768+) where the unrolled form blows past codegen
    * limits; the fold adds left-to-right — the same order as the
    * unrolled `a + b + c` chain — so buckets are BIT-IDENTICAL to the
    * oracle-checked form. Spark-only (higher-order functions). */
  def lshFoldSql(table: String, nQueries: Int = 5, k: Int = 5,
                 nPlanes: Int = 8, dim: Int = 64): String = {
    val d: Dialect = SparkDialect
    val planes = hyperplanes(nPlanes, dim)
    def proj(vec: String, w: Seq[Double]): String =
      s"""aggregate(zip_with($vec, array(${w.mkString(", ")}),
         | (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE),
         | (acc, v) -> acc + v)""".stripMargin.replace("\n", "")
    val bucket = planes.zipWithIndex.map { case (w, p) =>
      s"(CASE WHEN ${proj("embedding", w)} >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    lshBody(table, nQueries, k, bucket)(d)
  }

  private def lshBody(table: String, nQueries: Int, k: Int,
                      bucket: String)(d: Dialect): String = {
    val cos = cosine(d, "q.embedding", "c.embedding")
    s"""WITH b AS (
       |  SELECT vec_id, embedding, $bucket AS bucket FROM $table
       |),
       |q AS (SELECT * FROM b WHERE vec_id < $nQueries),
       |hits AS (
       |  SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS neighbor_id, $cos AS cos
       |    FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
       |)
       |SELECT query_id, bucket, neighbor_id,
       |       CAST(ROUND(cos, 4) AS DOUBLE) AS cosine, rank
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |          FROM hits) r
       | WHERE rank <= $k
       | ORDER BY query_id, rank""".stripMargin
  }

  /** IVF for UNLABELED corpora: centroids are a deterministic md5-drawn
    * seed sample (single-iteration k-means — the standard IVF training
    * shortcut when no partition key exists), every vector is assigned to
    * its nearest seed in ONE broadcast pass (|corpus| × K comparisons,
    * K broadcast-sized), and each query probes only its nearest seed's
    * bucket. At 100 TB: the assignment is a map-side cross with K tiny
    * broadcast rows followed by one shuffle on the centroid id (or a
    * bucket-partitioned write), and the probe join is centroid-local —
    * the same partition-bound search as the labeled path, without
    * labels. Ties break on seed id, so both engines bucket identically. */
  def ivfSeededSql(table: String, nQueries: Int = 5, k: Int = 5,
                   nCentroids: Int = 8)(d: Dialect): String = {
    val esCos = cosine(d, "e.embedding", "s.centroid")
    val qsCos = cosine(d, "q.embedding", "s.centroid")
    val cos = cosine(d, "q.embedding", "a.embedding")
    s"""WITH seeds AS (
       |  SELECT vec_id AS seed_id, embedding AS centroid FROM $table
       |   ORDER BY MD5(${d.castText("vec_id")}), vec_id LIMIT $nCentroids
       |),
       |assign AS (
       |  SELECT vec_id, embedding, seed_id FROM (
       |    SELECT e.vec_id, e.embedding, s.seed_id,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |                              ORDER BY $esCos DESC, s.seed_id) AS rn
       |      FROM $table e CROSS JOIN seeds s
       |  ) a WHERE rn = 1
       |),
       |q AS (SELECT vec_id, embedding FROM $table WHERE vec_id < $nQueries),
       |probe AS (
       |  SELECT query_id, seed_id FROM (
       |    SELECT q.vec_id AS query_id, s.seed_id,
       |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |                              ORDER BY $qsCos DESC, s.seed_id) AS rn
       |      FROM q CROSS JOIN seeds s
       |  ) p WHERE rn = 1
       |),
       |hits AS (
       |  SELECT q.vec_id AS query_id, p.seed_id AS probed_centroid,
       |         a.vec_id AS neighbor_id, $cos AS cos
       |    FROM q JOIN probe p ON p.query_id = q.vec_id
       |    JOIN assign a ON a.seed_id = p.seed_id AND a.vec_id <> q.vec_id
       |)
       |SELECT query_id, probed_centroid, neighbor_id,
       |       CAST(ROUND(cos, 4) AS DOUBLE) AS cosine, rank
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |                                     ORDER BY cos DESC, neighbor_id) AS rank
       |          FROM hits) r
       | WHERE rank <= $k
       | ORDER BY query_id, rank""".stripMargin
  }

  /** ANN quality measurement — recall@k of each approximate method
    * against the exact brute-force baseline, per query and method: the
    * number every ANN deployment reports before trading exactness for
    * the bucket-bounded scale path. Composes the already-dual-rendered
    * method SQLs; the ground-truth side is tiny (nQueries × k), so the
    * comparison joins are broadcast-sized regardless of corpus scale. */
  def recallSql(table: String, k: Int = 5)(d: Dialect): String = {
    def hits(rel: String, method: String): String =
      s"""SELECT '$method' AS method, query_id, neighbor_id FROM ($rel) h"""
    s"""WITH truth AS (
       |  SELECT query_id, neighbor_id FROM (${bruteForceSql(table, k = k)(d)}) b
       |),
       |approx AS (
       |  ${hits(ivfSql(table, k = k)(d), "ivf")}
       |  UNION ALL
       |  ${hits(ivfSeededSql(table, k = k)(d), "ivf_seeded")}
       |  UNION ALL
       |  ${hits(lshSql(table, k = k)(d), "lsh")}
       |),
       |matched AS (
       |  SELECT a.method, a.query_id,
       |         COUNT(t.neighbor_id) AS hit_ct
       |    FROM approx a
       |    LEFT JOIN truth t ON t.query_id = a.query_id
       |                     AND t.neighbor_id = a.neighbor_id
       |   GROUP BY a.method, a.query_id
       |)
       |SELECT method, query_id, CAST(hit_ct AS BIGINT) AS hit_ct,
       |       CAST(${d.intDiv("2 * 10000 * hit_ct + " + k, s"2 * $k")} / 10000.0
       |            AS DOUBLE) AS recall_at_$k
       |  FROM matched
       | ORDER BY method, query_id""".stripMargin
  }

  def runRecall(spark: SparkSession, dir: String): DataFrame =
    spark.sql(recallSql(register(spark, dir))(SparkDialect))

  private def register(spark: SparkSession, dir: String): String = {
    graft.core.Tables.load(spark, dir, "embeddings")
      .createOrReplaceTempView("__graft_emb")
    "__graft_emb"
  }

  def runBruteForce(spark: SparkSession, dir: String): DataFrame =
    spark.sql(bruteForceSql(register(spark, dir))(SparkDialect))
  def runIvf(spark: SparkSession, dir: String): DataFrame =
    spark.sql(ivfSql(register(spark, dir))(SparkDialect))
  def runIvfSeeded(spark: SparkSession, dir: String): DataFrame =
    spark.sql(ivfSeededSql(register(spark, dir))(SparkDialect))
  def runLsh(spark: SparkSession, dir: String): DataFrame =
    spark.sql(lshSql(register(spark, dir))(SparkDialect))
  def runLshFold(spark: SparkSession, dir: String): DataFrame =
    spark.sql(lshFoldSql(register(spark, dir)))
}
