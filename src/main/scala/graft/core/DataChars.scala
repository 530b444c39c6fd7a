package graft.core

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.profiling.GeneralType

/** Data-characteristics refresh — schema introspection + row counts, the
  * reference's per-flavor DDF query and chunked COUNT(*) batches
  * (reference: testgen/template/flavors/postgresql/data_chars/get_schema_ddf.sql:1-53,
  * testgen/commands/queries/refresh_data_chars_query.py:111-120).
  *
  * On Spark the parquet footer IS the catalog: general_type and
  * is_decimal derive from `df.schema` (no query), and row counts are
  * parallel `df.count()` actions — the reference's thread-pooled
  * `UNION ALL of SELECT COUNT(*)` becomes Spark jobs. The DuckDB oracle
  * introspects `information_schema.columns` with the reference's CASE
  * ladder, so the engine's schema-derived classification is verified
  * against a live catalog query.
  */
object DataChars {

  /** Optional include/exclude masks (the reference's `%` LIKE masks,
    * refresh_data_chars_query.py:67-101) as anchored regexes. */
  def tableNames(include: Option[String] = None,
                 exclude: Option[String] = None): Seq[String] = {
    def toRe(mask: String) = ("^" + mask.replace("%", ".*").replace("_", ".") + "$").r
    Tables.names
      .filter(t => include.forall(m => toRe(m).findFirstIn(t).isDefined))
      .filterNot(t => exclude.exists(m => toRe(m).findFirstIn(t).isDefined))
  }

  private def isDecimal(dt: DataType): Boolean = dt match {
    case d: DecimalType => d.scale > 0
    case _              => false // DOUBLE reports scale 0/NULL in both catalogs
  }

  def run(spark: SparkSession, dir: String,
          include: Option[String] = None,
          exclude: Option[String] = None): DataFrame = {
    val names = tableNames(include, exclude)
    fromTables(spark, names.map(t => t -> Tables.load(spark, dir, t, parallelize = false)))
  }

  /** Data chars over explicit (name, relation) pairs — the introspection
    * path for a historical run's table state (schemas come from the
    * DataFrames themselves, counts from parallel count() actions). */
  def fromTables(spark: SparkSession,
                 tables: Seq[(String, DataFrame)],
                 knownCounts: Map[String, Long] = Map.empty): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = Pools.actions
    // parallel row counts — the reference's chunked COUNT(*) fan-out.
    // `knownCounts` lets a caller that introspects the SAME table state
    // twice (SchemaDrift's seeded two-run history: only schemas differ,
    // row counts are identical by construction) pay the count jobs once.
    val counts: Map[String, Long] = Await.result(
      Future.sequence(tables.map { case (t, df) =>
        knownCounts.get(t)
          .fold(Future(t -> df.count()))(c => Future.successful(t -> c))
      }), Duration.Inf).toMap
    val rows = for {
      (t, df) <- tables
      (f, i) <- df.schema.fields.toSeq.zipWithIndex
    } yield Row(t, f.name, i + 1, GeneralType.of(f.dataType),
      if (isDecimal(f.dataType)) 1 else 0, counts(t))
    val schema = StructType(Seq(
      StructField("table_name", StringType),
      StructField("column_name", StringType),
      StructField("position", IntegerType),
      StructField("general_type", StringType),
      StructField("is_decimal", IntegerType),
      StructField("record_ct", LongType)))
    // Driver-side sort + single-partition relation (guide §6): the rows
    // are already built on the driver (one per column), so a Spark
    // `.orderBy` here paid a range-partition sampling job + a
    // shuffle.partitions-wide sort exchange per consumer, and the
    // SchemaDrift landings wrote one tiny parquet file PER SHUFFLE
    // PARTITION per snapshot. Sorting the driver rows and exposing one
    // partition makes each landing a single-task single-file write and
    // every downstream read a 1-split LocalTableScan. Same rows, same
    // order, same schema.
    val sorted = rows.sortBy(r => (r.getString(0), r.getInt(2)))
    spark.createDataFrame(sorted.asJava, schema).coalesce(1)
  }

  /** DuckDB oracle: live information_schema introspection with the
    * reference's type-classification CASE ladder. Masks resolve at
    * SQL-render time, exactly where the reference applies its LIKE
    * masks when building the introspection query
    * (refresh_data_chars_query.py:67-101). */
  def duckSql(include: Option[String] = None,
              exclude: Option[String] = None): String = {
    val names = tableNames(include, exclude)
    val inList = names.map(n => s"'$n'").mkString(", ")
    val counts = names
      .map(t => s"SELECT '$t' AS table_name, COUNT(*) AS record_ct FROM $t")
      .mkString("\nUNION ALL\n")
    s"""WITH counts AS (
       |$counts
       |)
       |SELECT c.table_name, c.column_name,
       |       CAST(c.ordinal_position AS INT) AS position,
       |       CASE WHEN c.data_type LIKE '%CHAR%' OR c.data_type = 'TEXT' THEN 'A'
       |            WHEN c.data_type = 'BOOLEAN' THEN 'B'
       |            WHEN c.data_type = 'DATE' OR c.data_type LIKE 'TIMESTAMP%' THEN 'D'
       |            WHEN c.data_type LIKE 'TIME WITH%' THEN 'T'
       |            WHEN c.data_type IN ('BIGINT', 'INTEGER', 'SMALLINT', 'TINYINT',
       |                                 'HUGEINT', 'DOUBLE', 'FLOAT', 'REAL')
       |              OR c.data_type LIKE 'DECIMAL%' THEN 'N'
       |            ELSE 'X' END AS general_type,
       |       CAST(CASE WHEN COALESCE(c.numeric_scale, 0) > 0 THEN 1 ELSE 0 END AS INT)
       |         AS is_decimal,
       |       ct.record_ct
       |  FROM information_schema.columns c
       |  JOIN counts ct ON ct.table_name = c.table_name
       | WHERE c.table_name IN ($inList)
       | ORDER BY c.table_name, position""".stripMargin
  }
}
