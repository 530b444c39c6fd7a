package graft.generation

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Test-definition validation — the reference's pre-execution pass that
  * collects every (table, column) a test references, fetches the actual
  * identifiers from the target catalog, and deactivates tests that
  * reference missing objects (reference:
  * testgen/commands/run_test_validation.py:13-60,
  * testgen/template/execution/disable_invalid_test_definitions.sql;
  * flavor get_target_identifiers.sql becomes a broadcast join against
  * the parquet-footer catalog — no query).
  */
object TestValidation {

  /** The live catalog as a (table_name, column_name) relation. */
  def catalog(spark: SparkSession, dir: String): DataFrame = {
    val rows = for {
      t <- graft.core.Tables.names
      f <- graft.core.Tables.load(spark, dir, t, parallelize = false).schema.fields.toSeq
    } yield Row(t, f.name)
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("cat_table", StringType), StructField("cat_column", StringType))))
  }

  /** Annotate definitions with validation status; tests referencing a
    * missing table or column become inactive with a message, everything
    * else stays active — the reference's disable-don't-delete semantics.
    * The catalog is metadata-sized, so it folds into literal predicates
    * (the broadcast-join limit case): the definitions never shuffle. */
  def validate(defs: DataFrame, cat: DataFrame): DataFrame = {
    val entries = cat.collect().map(r => (r.getString(0), r.getString(1)))
    val tables = entries.map(_._1).distinct.toSeq
    val columns = entries.map { case (t, c) => s"$t.$c" }.toSeq
    defs
      .withColumn("validation_message",
        when(!col("table_name").isin(tables: _*),
          concat(lit("Table not found: "), col("table_name")))
          .when(!concat(col("table_name"), lit("."), col("column_name"))
            .isin(columns: _*),
            concat(lit("Column not found: "), col("table_name"),
              lit("."), col("column_name"))))
      .withColumn("is_active", col("validation_message").isNull)
  }

  def run(spark: SparkSession, dir: String): DataFrame =
    validate(TestGenerator.run(spark, dir), catalog(spark, dir))
}
