package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Multimodal-column plumbing: media payloads as opaque BINARY columns
  * with typed metadata, and a batched feature-extraction pipeline whose
  * decode step is STUBBED (no image/audio codecs in this environment)
  * behind a deterministic md5-derived fake — the Spark-side schema,
  * partition-parallel batching, and feature layout are real.
  *
  * At scale: the binary payloads never shuffle — metadata extraction
  * and featurization are per-partition map work; only the small
  * (id, features) output moves.
  */
object Multimodal {

  /** Media metadata + stub features via SQL over a binary cast of the
    * document text (the driver testdata ships no real media; any binary
    * column slots in unchanged). Fake dims decode deterministic bytes
    * of the content hash — stand-ins for a real decoder's output. */
  def sql(table: String)(d: Dialect): String = {
    def hex2int(pos: Int, len: Int) = d.hexToInt(s"SUBSTRING(MD5(text), $pos, $len)")
    s"""SELECT doc_id,
       |  CAST(LENGTH(text) AS BIGINT) AS n_bytes,
       |  MD5(text) AS content_hash,
       |  CAST(64 + ${hex2int(1, 2)} AS INT) AS fake_width,
       |  CAST(64 + ${hex2int(3, 2)} AS INT) AS fake_height,
       |  CAST(${d.intDiv(s"${hex2int(5, 4)} * 10000", "65535")} / 10000.0 AS DOUBLE) AS feat_0,
       |  CAST(${d.intDiv(s"${hex2int(9, 4)} * 10000", "65535")} / 10000.0 AS DOUBLE) AS feat_1,
       |  CAST(${d.intDiv(s"${hex2int(13, 4)} * 10000", "65535")} / 10000.0 AS DOUBLE) AS feat_2,
       |  CAST(${d.intDiv(s"${hex2int(17, 4)} * 10000", "65535")} / 10000.0 AS DOUBLE) AS feat_3
       |FROM $table
       |ORDER BY doc_id""".stripMargin
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_media")
    spark.sql(sql("__graft_media")(SparkDialect))
  }

  def duckSql(): String = sql("documents")(DuckDialect)

  /** The Dataset-typed side of the pipeline: binary payload column +
    * per-partition batched "decode" (stubbed as content-hash features).
    * This is the shape a real decoder plugs into via mapPartitions —
    * batch-local library initialization, bounded memory per batch. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, features: Array[Double])

  def extractFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    media.as[(Long, Array[Byte])].mapPartitions { batch =>
      // A real decoder would initialize its codec ONCE per partition
      // here (??? in production: image decode / resample / frame grab).
      val digest = java.security.MessageDigest.getInstance("MD5")
      batch.map { case (id, payload) =>
        val h = digest.digest(payload)
        MediaFeatures(id, payload.length,
          Array.tabulate(4)(i => (h(i) & 0xff) / 255.0))
      }
    }.toDF()
  }
}
