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
  * Sampling parameters mirror calculate_sampling_params EXACTLY
  * (profiling_query.py:22-53): no sampling at all (ratio 1, full scan)
  * when the percent is outside (0, 100) or the table is at or under
  * `min_sample` rows; otherwise sample_count = clamp(round(pct% of N),
  * min_sample, 999000) and sample_ratio = N / sample_count. Profiling
  * runs over the sample and the counted metrics listed in the rescale
  * template are multiplied by sample_ratio (distinct counts deliberately
  * not rescaled — "already representative in a random sample").
  *
  * Scale: the Spark path is ONE aggregate pass over the sampled scan —
  * every column's metrics computed in a single wide aggregate (1 output
  * row, materialized, then unpivoted to per-column rows), never a scan
  * per column. The sample itself is never materialized: at 100 TB a 30%
  * sample is still tens of TB, so the filter stays fused into the scan.
  */
object SampledProfiler {

  val SamplePercent = 30.0
  val MinSampleCount = 1000L
  val MaxSampleCount = 999000L

  final case class Sampling(sampleCount: Long, sampleRatio: Double)

  /** Scala mirror of the reference's calculate_sampling_params
    * (profiling_query.py:22-53): None ⇒ sampling not applicable, profile
    * the full table. */
  def samplingParams(recordCount: Long,
                     samplePercent: Double = SamplePercent,
                     minSample: Long = MinSampleCount,
                     maxSample: Long = MaxSampleCount): Option[Sampling] = {
    if (!(samplePercent > 0 && samplePercent < 100)) None
    else if (recordCount <= minSample) None
    else {
      val calc = math.round(samplePercent * recordCount / 100.0)
      val count = math.min(math.max(calc, minSample), maxSample)
      Some(Sampling(count, recordCount.toDouble / count))
    }
  }

  /** Metrics the estimate template rescales (sample → full-table). */
  private val rescaledMetrics = Set(
    "record_ct", "value_ct", "null_value_ct", "zero_value_ct",
    "lead_space_ct", "embedded_space_ct", "includes_digit_ct",
    "filled_value_ct", "numeric_ct", "date_ct", "boolean_true_ct")

  /** Representative unrescaled metrics carried through for comparison. */
  private val keptMetrics = Set(
    "distinct_value_ct", "min_length", "max_length", "avg_length",
    "min_value", "max_value", "avg_value", "min_text", "max_text")

  private def metricsOf(schema: StructType) =
    schema.fields.zipWithIndex.map { case (f, i) =>
      (f, i, ProfileMetrics.entries(f.name, i + 1, f.dataType)
        .filter(e => rescaledMetrics(e.name) || keptMetrics(e.name)))
    }

  /** Per-column output select items over a relation whose columns are the
    * aggregated measures aliased c<i>_<name>; `ratioExpr` multiplies the
    * rescaled metrics. */
  private def branch(f: org.apache.spark.sql.types.StructField, i: Int,
                     ms: Seq[MetricEntry], ratioExpr: String,
                     from: String, rendered: String => String): String = {
    val items = ms.map { e =>
      if (rescaledMetrics(e.name))
        s"CAST(ROUND(${rendered(e.name)} * $ratioExpr, 0) AS BIGINT) AS ${e.name}"
      else s"${rendered(e.name)} AS ${e.name}"
    }.mkString(",\n  ")
    s"""SELECT '${f.name}' AS column_name,
       |  CAST(ROUND($ratioExpr, 6) AS DOUBLE) AS sample_ratio,
       |  $items
       |FROM $from""".stripMargin
  }

  /** Single-statement form (the DuckDB oracle; DuckDB materializes
    * multiply-referenced CTEs, so the sampled scan runs once there). The
    * params CTE carries the reference's applicability gate: at or under
    * MinSampleCount rows the "sample" is the whole table and the ratio
    * is exactly 1. */
  def sql(table: String, schema: StructType, keyExpr: String)(d: Dialect): String = {
    val clampedCount =
      s"LEAST(GREATEST(ROUND($SamplePercent * n / 100.0, 0), $MinSampleCount), $MaxSampleCount)"
    val draw = d.hexToLong(s"SUBSTRING(MD5($keyExpr), 1, 8)")
    val ratioSub = "(SELECT sample_ratio FROM params)"
    val selects = metricsOf(schema).map { case (f, i, ms) =>
      branch(f, i, ms, ratioSub, "sampled", name =>
        ms.find(_.name == name).get.render(d))
    }
    s"""WITH full_ct AS (SELECT COUNT(*) AS n FROM $table),
       |params AS (
       |  SELECT n AS full_record_ct,
       |         CASE WHEN n <= $MinSampleCount THEN n ELSE $clampedCount END AS sample_count,
       |         CAST(n AS DOUBLE)
       |           / CASE WHEN n <= $MinSampleCount THEN n ELSE $clampedCount END AS sample_ratio
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
    val d: Dialect = SparkDialect
    val df = graft.core.Tables.load(spark, dir, "lineitem")
    val view = "__graft_sampled_li"
    df.createOrReplaceTempView(view)
    val schema = df.schema
    // sampling params computed driver-side (reference: profiling_query.py:22-53)
    val n = df.count()
    val sampleCount = samplingParams(n).map(_.sampleCount).getOrElse(n)
    // identical arithmetic to the oracle's in-SQL params: integer literals
    // into the same double expressions, so estimates hash-match exactly
    val ratioExpr = s"(CAST($n AS DOUBLE) / $sampleCount)"
    val draw = d.hexToLong(s"SUBSTRING(MD5($lineitemKey), 1, 8)")
    val cols = metricsOf(schema)
    // The aggregate pass over the sampled scan is CHUNKED into bounded
    // groups of expressions (Profiler's compile-time discipline: a fused
    // ~190-expression codegen'd aggregate costs far more to compile than
    // to execute, while parquet's columnar layout means chunks read
    // disjoint column subsets — total I/O stays one-full-scan). Each
    // chunk is its own concurrent job; the sample filter stays fused into
    // every chunk's scan, so the sample itself is never materialized.
    val sampleFilter =
      s"""CAST($draw AS DOUBLE) / 4294967296.0
         |       < CAST($sampleCount AS DOUBLE) / $n""".stripMargin
    val perColItems: Seq[Seq[String]] = cols.map { case (_, i, ms) =>
      ms.map(e => s"${e.render(d)} AS c${i}_${e.name}")
    }
    val maxExprs = sys.env.get("GRAFT_PROFILE_CHUNK").map(_.toInt).getOrElse(48)
    val chunks: Seq[Seq[String]] = {
      val out = Seq.newBuilder[Seq[String]]
      var cur = Seq.empty[String]
      perColItems.filter(_.nonEmpty).foreach { sel =>
        if (cur.nonEmpty && cur.length + sel.length > maxExprs) {
          out += cur; cur = Seq.empty
        }
        cur = cur ++ sel
      }
      if (cur.nonEmpty) out += cur
      out.result()
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val chunkRows = Await.result(
      Future.sequence(chunks.map { sel =>
        Future(spark.sql(
          s"""SELECT ${sel.mkString(",\n  ")}
             |  FROM $view
             | WHERE $sampleFilter""".stripMargin).collect()(0))
      }), Duration.Inf)
    // Reassemble the chunk rows into the single wide 1-row local relation
    // the unpivot branches read for free.
    val aggSchema = StructType(chunkRows.flatMap(_.schema.fields))
    val aggRow = org.apache.spark.sql.Row.fromSeq(chunkRows.flatMap(_.toSeq))
    val aggView = "__graft_sampled_agg"
    spark.createDataFrame(java.util.Arrays.asList(aggRow), aggSchema)
      .createOrReplaceTempView(aggView)
    val selects = cols.map { case (f, i, ms) =>
      branch(f, i, ms, ratioExpr, aggView, name => s"c${i}_$name")
    }
    spark.sql(s"""${selects.mkString("\nUNION ALL\n")}
                 |ORDER BY column_name""".stripMargin)
  }

  def duckSql(): String = {
    val key = "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"
    sql("lineitem", graft.core.Tables.schemas("lineitem"), key)(DuckDialect)
  }
}
