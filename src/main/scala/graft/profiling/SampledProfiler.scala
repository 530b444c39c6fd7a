package graft.profiling

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Bernoulli-sampled profiling with estimate rescale — the reference's
  * big-table path (reference: TABLESAMPLE at
  * testgen/template/flavors/postgresql/profiling/project_profiling_query.sql:3,
  * sampling parameters at testgen/commands/queries/profiling_query.py:22-53,
  * rescale at testgen/template/profiling/project_update_profile_results_to_estimates.sql:1-31).
  *
  * The reference samples with `TABLESAMPLE BERNOULLI (pct) REPEATABLE (64)`
  * — engine-specific RNG that no two engines reproduce. Here the sample is
  * a DETERMINISTIC Bernoulli draw: a row is selected iff the first 8 hex
  * chars of md5(key) — a uniform 32-bit draw — fall under
  * `sample_count / record_ct`. Spark and the DuckDB oracle compute the
  * same draw bit-for-bit, so sampled estimates hash-match exactly, while
  * the statistical behavior (each row selected independently with
  * probability p) is the same as the reference's Bernoulli sampling.
  *
  * Sampling parameters mirror calculate_sampling_params: sample_count =
  * clamp(round(pct% of N), min_sample, 999000); sample_ratio =
  * N / sample_count; profiling runs over the sample and the counted
  * metrics listed in the rescale template are multiplied by sample_ratio
  * (distinct counts deliberately not rescaled — "already representative
  * in a random sample").
  *
  * Scale: the per-column branches prune to (key, column) in columnar
  * storage, and every aggregate runs over the sample, so at 100 TB the
  * dominant cost is one pruned scan of the key+column pairs — the same
  * bound as the reference's sampled scan.
  */
object SampledProfiler {

  val SamplePercent = 30.0
  val MinSampleCount = 1000L
  val MaxSampleCount = 999000L

  /** Metrics the estimate template rescales (sample → full-table). */
  private val rescaledMetrics = Set(
    "record_ct", "value_ct", "null_value_ct", "zero_value_ct",
    "lead_space_ct", "embedded_space_ct", "includes_digit_ct",
    "filled_value_ct", "numeric_ct", "date_ct", "boolean_true_ct")

  /** Representative unrescaled metrics carried through for comparison. */
  private val keptMetrics = Set(
    "distinct_value_ct", "min_length", "max_length", "avg_length",
    "min_value", "max_value", "avg_value", "min_text", "max_text")

  /** The full sampled-profile query (shared text shape; dialect-rendered). */
  def sql(table: String, schema: StructType, keyExpr: String)(d: Dialect): String = {
    val clampedCount =
      s"LEAST(GREATEST(ROUND($SamplePercent * n / 100.0, 0), $MinSampleCount), $MaxSampleCount)"
    val draw = d.hexToLong(s"SUBSTRING(MD5($keyExpr), 1, 8)")
    val ratioSub = "(SELECT sample_ratio FROM params)"
    val selects = schema.fields.zipWithIndex.map { case (f, i) =>
      val ms = ProfileMetrics.entries(f.name, i + 1, f.dataType)
        .filter(e => rescaledMetrics(e.name) || keptMetrics(e.name))
      val items = ms.map { e =>
        if (rescaledMetrics(e.name))
          s"CAST(ROUND(${e.render(d)} * $ratioSub, 0) AS BIGINT) AS ${e.name}"
        else s"${e.render(d)} AS ${e.name}"
      }.mkString(",\n  ")
      s"""SELECT '${f.name}' AS column_name,
         |  CAST(ROUND($ratioSub, 6) AS DOUBLE) AS sample_ratio,
         |  $items
         |FROM sampled""".stripMargin
    }
    s"""WITH full_ct AS (SELECT COUNT(*) AS n FROM $table),
       |params AS (
       |  SELECT n AS full_record_ct,
       |         $clampedCount AS sample_count,
       |         CAST(n AS DOUBLE) / $clampedCount AS sample_ratio
       |    FROM full_ct
       |),
       |sampled AS (
       |  SELECT t.* FROM $table t, params p
       |   WHERE CAST($draw AS DOUBLE) / 4294967296.0
       |         < CAST(p.sample_count AS DOUBLE) / p.full_record_ct
       |)
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY column_name""".stripMargin
  }

  /** lineitem's deterministic row key (orderkey, linenumber is unique). */
  private val lineitemKey =
    "CAST(l_orderkey AS STRING) || ':' || CAST(l_linenumber AS STRING)"

  def run(spark: SparkSession, dir: String): DataFrame = {
    val df = graft.core.Tables.load(spark, dir, "lineitem")
    df.createOrReplaceTempView("__graft_sampled_li")
    spark.sql(sql("__graft_sampled_li", df.schema, lineitemKey)(SparkDialect))
  }

  def duckSql(): String = {
    val key = "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
    sql("lineitem", graft.core.Tables.schemas("lineitem"), key)(DuckDialect)
  }
}
