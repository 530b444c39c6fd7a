package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the storage-level join strategy for
  * relations two jobs keep joining on the same key (the inverted-index
  * relations: fingerprints, shingles, token postings; the run-history
  * signal tables). `bucketBy(n, key)` + `sortBy(key)` writes each
  * relation pre-hashed into `n` files per key-hash; a later equi-join
  * of two tables bucketed the same way plans WITHOUT either shuffle
  * exchange — at 100 TB that deletes the single largest cost of every
  * repeated join against a landed index (BucketingSpec asserts the
  * exchange-free plan).
  *
  * This is the persisted-table complement of the in-session
  * `localCheckpoint` memoization the pipeline modules use: checkpoints
  * serve one session; bucketed tables serve every subsequent job
  * against the same store. Spark bucketing needs a (any) catalog —
  * works with the default in-memory catalog + warehouse dir; on a real
  * cluster the metastore carries the bucket spec.
  */
object Bucketing {

  /** Land `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket key — plans
    * shuffle-free (and with matching sortBy, sort-free). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right),
      Seq(key))
}
