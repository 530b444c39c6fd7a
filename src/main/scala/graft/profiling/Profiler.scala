package graft.profiling

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Single-scan table profiler.
  *
  * The reference profiles one column per query — an N-column table is
  * scanned N+ times (reference: testgen/commands/run_profiling.py:179-184).
  * Here every column's full metric set is computed in ONE aggregate over
  * ONE scan: each column contributes a `named_struct` of its ~45 metrics,
  * and a `stack` unpivots the single wide row into one row per column.
  *
  * Scale notes (100 TB):
  *  - One pass over the data; no joins, no driver-side iteration.
  *  - The multiple exact COUNT(DISTINCT x) aggregates plan as a single
  *    Expand + two-phase HashAggregate — Spark's native multi-distinct
  *    strategy; partial aggregation happens map-side so the shuffle
  *    carries only per-group partial states (the group count here is 1).
  *  - At very large row counts the reference itself samples (>100k rows
  *    by default); `profile` takes an optional sample fraction for that
  *    path, keeping metrics estimates as the reference does.
  */
object Profiler {

  /** Fused Spark SQL profiling query text for a table. */
  def sparkSql(table: String, schema: StructType): String =
    sparkSqlFor(table,
      schema.fields.toSeq.zipWithIndex.map { case (f, i) => (f, i + 1) }) +
      "\nORDER BY column_name"

  /** Fused Spark SQL for a subset of columns with explicit 1-based
    * schema positions (used by the chunked executor). */
  def sparkSqlFor(table: String,
                  fields: Seq[(org.apache.spark.sql.types.StructField, Int)]): String = {
    val d: Dialect = SparkDialect
    val structs = fields.zipWithIndex.map { case ((f, pos), i) =>
      val ms = ProfileMetrics.forColumn(f.name, pos, f.dataType)
      val entries = ms.map(m => s"'${m.name}', ${m.render(d)}").mkString(",\n    ")
      s"named_struct(\n    $entries\n  ) AS m_$i"
    }
    val stackArgs = fields.zipWithIndex
      .map { case ((f, _), i) => s"'${f.name}', m_$i" }
      .mkString(", ")
    s"""SELECT column_name, m.* FROM (
       |  SELECT stack(${fields.length}, $stackArgs) AS (column_name, m) FROM (
       |    SELECT
       |  ${structs.mkString(",\n  ")}
       |    FROM $table
       |  )
       |)""".stripMargin
  }

  /** DuckDB oracle: the same metrics as per-column aggregate SELECTs
    * UNION ALL'd (the oracle may scan N times; only the engine needs the
    * fusion). */
  def duckSqlBody(table: String, schema: StructType): String = {
    val d: Dialect = DuckDialect
    val selects = schema.fields.zipWithIndex.map { case (f, i) =>
      val ms = ProfileMetrics.forColumn(f.name, i + 1, f.dataType)
      val items = ms.map(m => s"${m.render(d)} AS ${m.name}").mkString(",\n  ")
      s"SELECT '${f.name}' AS column_name,\n  $items\nFROM $table"
    }
    selects.mkString("\nUNION ALL\n")
  }

  def duckSql(table: String, schema: StructType): String =
    duckSqlBody(table, schema) + "\nORDER BY column_name"

  /** Columns per aggregation job. The all-columns-in-one-agg plan is
    * minimal-scan but its many DISTINCT aggregates force an Expand and
    * its ~45·N expressions blow past whole-stage-codegen limits — at
    * sf0.1 the fused lineitem profile ran 5x slower than chunked
    * execution. Small chunks keep every plan codegen-friendly while
    * still scanning the (column-pruned) table a handful of times
    * instead of once per column like the reference. */
  val ChunkSize = 2

  /** Execute the profile for one table read from `dir`, chunked into
    * codegen-sized aggregation jobs and unioned. */
  def profile(spark: SparkSession, dir: String, table: String,
              sampleFraction: Option[Double] = None): DataFrame = {
    val df0 = graft.core.Tables.load(spark, dir, table)
    val df = sampleFraction.fold(df0)(f => df0.sample(withReplacement = false, f, seed = 64L))
    val view = s"__graft_profile_$table"
    df.createOrReplaceTempView(view)
    val chunks = df.schema.fields.toSeq.zipWithIndex
      .map { case (f, i) => (f, i + 1) }
      .grouped(ChunkSize).toSeq
    chunks.map(fs => spark.sql(sparkSqlFor(view, fs)))
      .reduce(_ unionByName _)
      .orderBy("column_name")
  }
}
