package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Sequence packing — the batch-assembly step between chunking and
  * tokenization: chunks are laid end-to-end into fixed-token-budget
  * packs (training sequences), greedily in (doc_id, chunk_idx) order.
  * A chunk belongs to the pack where its starting token offset lands
  * (`exclusive-cumsum DIV budget`), the standard document-packing
  * semantics where a sequence may spill its tail into the next pack
  * (the tokenizer truncates or continues at the sink).
  *
  * Packing is inherently sequential in the fill order, so the corpus is
  * SHARDED first (`doc_id % nShards`) and each shard packs
  * independently — one window sort per shard, all shards in parallel;
  * at 100 TB the shard count scales with the cluster and no global
  * order is ever materialized. Output is the per-pack summary
  * (chunk count, token fill, doc range) — the manifest a training
  * loader consumes.
  */
object Packer {

  val Budget = 512
  val Shards = 16

  def sql(table: String, budget: Int = Budget, shards: Int = Shards)
         (d: Dialect): String =
    s"""WITH chunks AS (
       |${Chunker.sql(table)(d)}
       |),
       |cum AS (
       |  SELECT doc_id, chunk_idx, token_ct,
       |    CAST(doc_id % $shards AS INT) AS shard,
       |    SUM(token_ct) OVER (PARTITION BY doc_id % $shards
       |                        ORDER BY doc_id, chunk_idx
       |                        ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM chunks
       |),
       |assigned AS (
       |  SELECT shard, ${d.intDiv("cum - token_ct", s"$budget")} AS pack_id,
       |         doc_id, token_ct
       |    FROM cum
       |)
       |SELECT shard, CAST(pack_id AS BIGINT) AS pack_id,
       |       CAST(COUNT(*) AS BIGINT) AS chunk_ct,
       |       CAST(SUM(token_ct) AS BIGINT) AS token_ct,
       |       MIN(doc_id) AS doc_min, MAX(doc_id) AS doc_max
       |  FROM assigned
       | GROUP BY shard, pack_id
       | ORDER BY shard, pack_id""".stripMargin

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("__graft_pack_docs")
    spark.sql(sql("__graft_pack_docs")(SparkDialect))
  }

  def duckSql(): String = sql("documents")(DuckDialect)
}
