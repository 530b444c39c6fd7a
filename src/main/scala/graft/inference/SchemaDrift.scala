package graft.inference

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Tables
import graft.profiling.GeneralType

/** Schema-drift detection — the reference's per-run diff of introspected
  * columns against the stored `data_column_chars`, producing A/D/M
  * (add/drop/modify) rows in `data_structure_log` that feed the
  * Schema_Drift METADATA test (reference:
  * testgen/commands/run_refresh_data_chars.py + data_chars templates;
  * log DDL testgen/template/dbsetup/030_initialize_new_schema_structure.sql:398).
  *
  * On Spark the "introspection" is the parquet footer (`df.schema`), so
  * the diff is a pure metadata computation — no data scan at any scale.
  * The baseline snapshot plays the app-DB role; it ships with three
  * seeded differences so every change class is exercised:
  * `orders.o_comment` (baseline-only ⇒ Dropped), `events.props`
  * (actual-only ⇒ Added), `customer.c_acctbal` typed A in the baseline
  * (⇒ Modified).
  */
object SchemaDrift {

  /** Prior-run snapshot: (table, column) -> general_type. */
  val baseline: Map[(String, String), String] = {
    val fromSchemas = for {
      (t, st) <- Tables.schemas.toSeq
      f <- st.fields
    } yield (t, f.name) -> GeneralType.of(f.dataType)
    (fromSchemas.toMap
      - (("events", "props"))                       // Added in current run
      + ((("orders", "o_comment")) -> "A")          // Dropped in current run
      + ((("customer", "c_acctbal")) -> "A"))       // Modified (N in current)
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    val actual: Map[(String, String), String] = (for {
      t <- Tables.names
      f <- Tables.load(spark, dir, t).schema.fields
    } yield (t, f.name) -> GeneralType.of(f.dataType)).toMap
    val keys = (baseline.keySet ++ actual.keySet).toSeq.sorted
    val rows = keys.flatMap { k =>
      (baseline.get(k), actual.get(k)) match {
        case (None, Some(a)) =>
          Some(Row(k._1, k._2, "A", null, a))
        case (Some(b), None) =>
          Some(Row(k._1, k._2, "D", b, null))
        case (Some(b), Some(a)) if b != a =>
          Some(Row(k._1, k._2, "M", b, a))
        case _ => None
      }
    }
    val schema = StructType(Seq(
      StructField("table_name", StringType), StructField("column_name", StringType),
      StructField("change_type", StringType),
      StructField("old_general_type", StringType),
      StructField("new_general_type", StringType)))
    spark.createDataFrame(rows.asJava, schema)
  }
}
