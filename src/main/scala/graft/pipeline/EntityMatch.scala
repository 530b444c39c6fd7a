package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Blocked fuzzy record linkage — entity resolution for SHORT strings,
  * the data-quality op the engine's text near-dup stack doesn't cover
  * (shingles/minhash need word-scale content; a customer name is one
  * token). A dirty registry matches against the clean dimension the
  * standard two-stage way: (1) BLOCK on cheap stable keys — here
  * (nationkey, last-4-of-name) — so candidate pairs are block-local,
  * never the N×M cross product; (2) VERIFY with edit distance on the
  * case-folded names, keep distance ≤ 2, elect the best match per
  * dirty record by (distance, key) — deterministic ties.
  *
  * The dirty side derives from the clean table with deterministic
  * per-residue perturbations (head-char deletion / case flip /
  * mid-head insertion / unchanged), all head-of-string so the last-4
  * blocking key survives — exactly the property real blocking keys are
  * chosen for (perturbation-stable suffix, postcode, birth year).
  * Both engines render the same perturbations, levenshtein exists
  * natively in both, and every verdict is integer — hash-exact.
  *
  * Scale shape: one scan per side, a block-local equi-join (block
  * cardinality bounded by the key domain — the skew advisor's
  * dispatch applies if a block goes hot), a per-dirty-record
  * ROW_NUMBER window partitioned on the dirty key. Corpus-sized
  * relations shuffle once, on the block key. */
object EntityMatch {

  /** The deterministic dirty registry: residue class picks the
    * perturbation. */
  def dirtySql(table: String): String =
    s"""SELECT c_custkey AS src_id, c_nationkey,
       |       CAST(c_custkey % 4 AS INT) AS variant_class,
       |       CASE CAST(c_custkey % 4 AS INT)
       |         WHEN 0 THEN SUBSTRING(c_name, 1, 2) || SUBSTRING(c_name, 4)
       |         WHEN 1 THEN UPPER(c_name)
       |         WHEN 2 THEN SUBSTRING(c_name, 1, 4) || 'x' || SUBSTRING(c_name, 5)
       |         ELSE c_name END AS dirty_name
       |  FROM $table""".stripMargin

  def sql(table: String)(d: Dialect): String =
    s"""WITH dirty AS (${dirtySql(table)}),
       |clean AS (
       |  SELECT c_custkey, c_nationkey, c_name,
       |         RIGHT(c_name, 4) AS blk
       |    FROM $table
       |),
       |cand AS (
       |  SELECT dr.src_id, dr.variant_class, cl.c_custkey AS match_key,
       |         LEVENSHTEIN(LOWER(dr.dirty_name), LOWER(cl.c_name)) AS dist
       |    FROM dirty dr
       |    JOIN clean cl
       |      ON cl.c_nationkey = dr.c_nationkey
       |     AND cl.blk = RIGHT(dr.dirty_name, 4)
       |   WHERE LEVENSHTEIN(LOWER(dr.dirty_name), LOWER(cl.c_name)) <= 2
       |),
       |ranked AS (
       |  SELECT src_id, variant_class, match_key, dist,
       |         CAST(COUNT(*) OVER (PARTITION BY src_id) AS BIGINT)
       |           AS candidate_ct,
       |         ROW_NUMBER() OVER (PARTITION BY src_id
       |                            ORDER BY dist, match_key) AS rk
       |    FROM cand
       |)
       |SELECT src_id, variant_class, match_key,
       |       CAST(dist AS BIGINT) AS edit_distance,
       |       candidate_ct,
       |       CASE WHEN dist = 0 THEN 'EXACT' ELSE 'FUZZY' END AS match_class,
       |       match_key = src_id AS is_true_match
       |  FROM ranked
       | WHERE rk = 1
       | ORDER BY src_id""".stripMargin

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "customer")
      .createOrReplaceTempView("__graft_em_cust")
    spark.sql(sql("__graft_em_cust")(SparkDialect))
  }

  def duckSql(): String = sql("customer")(DuckDialect)
}
