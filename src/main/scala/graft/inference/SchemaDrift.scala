package graft.inference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.core.{DataChars, RunStore, Tables}
import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Schema-drift detection — the reference's per-run diff of introspected
  * columns against the stored `data_column_chars`, producing A/D/M
  * (add/drop/modify) rows in `data_structure_log` that feed the
  * Schema_Drift METADATA test (reference:
  * testgen/commands/run_refresh_data_chars.py + data_chars templates;
  * log DDL testgen/template/dbsetup/030_initialize_new_schema_structure.sql:398).
  *
  * Unlike a hardcoded-baseline demo, the diff here consumes LANDED run
  * history: each run's `data_chars` introspection is written to the
  * [[RunStore]] as parquet, and the drift log is a FULL OUTER join of
  * the two most recent landed snapshots — exactly the reference's
  * `data_column_chars` vs fresh-introspection comparison, expressed as
  * a metadata-sized join over two parquet footprints (no data scan).
  *
  * The query entry seeds history deterministically: run_000 introspects
  * the PRIOR-run table state (the current tables with three schema
  * mutations a real prior run would have had — `events.props` absent ⇒
  * Added now, `orders.o_comment` present ⇒ Dropped now,
  * `customer.c_acctbal` still stringly-typed ⇒ Modified) and run_001
  * introspects the actual tables. Both snapshots flow through the real
  * introspect → land → diff machinery, and the DuckDB oracle reads the
  * SAME landed parquet and recomputes the identical diff.
  */
object SchemaDrift {

  /** The prior run's table state: real DataFrames whose schemas carry
    * the three seeded differences (every change class exercised).
    * SCHEMA-ONLY mutations by contract: drop / add / retype a column,
    * never filter rows — [[run]] reuses the current tables' row counts
    * for this state, and SchemaDriftSpec spot-checks the contract
    * (a row-mutating edit here trips the spec). */
  private[inference] def mutateToPrior(
      tables: Seq[(String, DataFrame)]): Seq[(String, DataFrame)] =
    tables.map { case (t, df) =>
      t -> (t match {
        case "events"   => df.drop("props")
        case "orders"   => df.withColumn("o_comment", lit("n/a"))
        case "customer" => df.withColumn("c_acctbal", col("c_acctbal").cast("string"))
        case _          => df
      })
    }

  def priorRunTables(spark: SparkSession, dir: String): Seq[(String, DataFrame)] =
    mutateToPrior(Tables.names.map { t =>
      t -> Tables.load(spark, dir, t, parallelize = false)
    })

  /** Diff two landed data_chars snapshots into A/D/M drift rows — the
    * `data_structure_log` computation, dual-rendered for Spark and the
    * DuckDB oracle. */
  def diffSql(priorPath: String, currentPath: String)(d: Dialect): String =
    s"""WITH prior AS (SELECT table_name, column_name, general_type
       |                 FROM ${d.readParquet(priorPath)}),
       |cur AS (SELECT table_name, column_name, general_type
       |          FROM ${d.readParquet(currentPath)})
       |SELECT COALESCE(p.table_name, c.table_name) AS table_name,
       |       COALESCE(p.column_name, c.column_name) AS column_name,
       |       CASE WHEN p.column_name IS NULL THEN 'A'
       |            WHEN c.column_name IS NULL THEN 'D'
       |            ELSE 'M' END AS change_type,
       |       p.general_type AS old_general_type,
       |       c.general_type AS new_general_type
       |  FROM prior p FULL OUTER JOIN cur c
       |    ON p.table_name = c.table_name AND p.column_name = c.column_name
       | WHERE p.column_name IS NULL OR c.column_name IS NULL
       |    OR p.general_type <> c.general_type
       | ORDER BY table_name, column_name""".stripMargin

  /** Land a data_chars snapshot for the given table state under a run id
    * and return the landed path. */
  def landSnapshot(spark: SparkSession, root: String, runId: String,
                   tables: Seq[(String, DataFrame)],
                   knownCounts: Map[String, Long] = Map.empty): String =
    RunStore.land(DataChars.fromTables(spark, tables, knownCounts),
      root, runId, "data_chars")

  /** Drift between the two most recent landed runs under `root` —
    * the Runner's cross-invocation path. */
  def diffLatest(spark: SparkSession, root: String): Option[DataFrame] =
    RunStore.latestTwo(root, "data_chars").map { case (prior, current) =>
      spark.sql(diffSql(prior, current)(SparkDialect))
    }

  /** Query entry: seed the deterministic two-run history, then diff the
    * landed snapshots (by explicit run id, so stray older runs under the
    * same root cannot shift which snapshots the oracle compares). */
  def run(spark: SparkSession, dir: String): DataFrame = {
    val root = RunStore.root
    val current = Tables.names.map(t =>
      t -> Tables.load(spark, dir, t, parallelize = false))
    // ONE count pass serves both snapshots (guide §1.2): the seeded
    // prior state mutates schemas only (drop / add / retype a column),
    // never row counts, so introspecting it re-counts the identical
    // tables. The landed record_ct values are unchanged. (A fused
    // union-of-aggregates single action was A/B-measured no better
    // than this parallel fan-out — the thread pool already overlaps
    // the jobs.)
    val counts: Map[String, Long] = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext =
        graft.core.Pools.actions
      Await.result(Future.sequence(current.map { case (t, df) =>
        Future(t -> df.count())
      }), Duration.Inf).toMap
    }
    // prior state derived from the SAME loaded frames (guide §1.2: ten
    // fewer parquet relation builds per run — the mutations are
    // schema-only, so reusing the scans is identity-preserving)
    val p0 = landSnapshot(spark, root, "run_000", mutateToPrior(current),
      counts)
    val p1 = landSnapshot(spark, root, "run_001", current, counts)
    spark.sql(diffSql(p0, p1)(SparkDialect))
  }

  /** DuckDB oracle: the identical diff over the same landed snapshots. */
  def duckSql(): String = {
    val root = RunStore.root
    diffSql(RunStore.runPath(root, "run_000", "data_chars"),
      RunStore.runPath(root, "run_001", "data_chars"))(DuckDialect)
  }
}
