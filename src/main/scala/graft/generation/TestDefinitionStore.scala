package graft.generation

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, when}

/** Persistent test-definition store with the reference's locked-refresh
  * upsert lifecycle (reference:
  * testgen/template/generation/gen_selection_tests.sql:24-64 —
  * `ON CONFLICT (suite, test_type, schema, table, column) DO UPDATE …
  * WHERE test_definitions.lock_refresh = 'N'`):
  *
  *  - regenerated tests UPDATE their stored row's generated fields —
  *    unless a user locked it (`lock_refresh = 'Y'`), in which case the
  *    stored row survives regeneration untouched;
  *  - newly selected tests INSERT with `lock_refresh = 'N'`;
  *  - stored tests no longer selected are kept (the reference never
  *    deletes on generation; deactivation is a validation concern).
  *
  * The store is parquet + read-merge-overwrite: definitions are
  * metadata-sized (one row per generated test), so the merge
  * materializes via localCheckpoint before the overwrite — on a
  * transactional table format the same logic is a single MERGE INTO.
  */
object TestDefinitionStore {

  val mergeKey: Seq[String] = Seq("test_type", "table_name", "column_name")

  private def withLifecycle(generated: DataFrame): DataFrame =
    generated
      .withColumn("lock_refresh", lit("N"))
      .withColumn("test_active", lit("Y"))

  /** Re-read a just-overwritten store path (Spark caches file listings
    * per path; the refresh drops the stale index). */
  private def reread(spark: SparkSession, path: String): DataFrame = {
    spark.catalog.refreshByPath(path)
    spark.read.parquet(path)
  }

  /** First generation: land everything unlocked and active. */
  def initialize(spark: SparkSession, path: String, generated: DataFrame): DataFrame = {
    withLifecycle(generated).write.mode("overwrite").parquet(path)
    reread(spark, path)
  }

  /** Re-generation merge honoring `lock_refresh`. Returns the merged
    * store as re-read from disk. */
  def merge(spark: SparkSession, path: String, generated: DataFrame): DataFrame = {
    val stored = reread(spark, path)
    val gen = withLifecycle(generated)
    val s = stored.select(stored.columns.map(c => col(c).as(s"s_$c")).toSeq: _*)
    val g = gen.select(gen.columns.map(c => col(c).as(s"g_$c")).toSeq: _*)
    val cond = mergeKey.map(k => s.col(s"s_$k") <=> g.col(s"g_$k")).reduce(_ && _)
    val joined = s.join(g, cond, "full_outer")

    val inStore = joined.col(s"s_${mergeKey.head}").isNotNull
    val inGen = joined.col(s"g_${mergeKey.head}").isNotNull
    val locked = joined.col("s_lock_refresh") === "Y"

    def resolve(c: String): Column = c match {
      case k if mergeKey.contains(k) =>
        coalesce(joined.col(s"s_$k"), joined.col(s"g_$k")).as(k)
      case "lock_refresh" => // user lifecycle state always survives
        coalesce(joined.col("s_lock_refresh"), lit("N")).as("lock_refresh")
      case other => // generated fields: update unless locked or not regenerated
        when(!inStore, joined.col(s"g_$other"))
          .when(!inGen || locked, joined.col(s"s_$other"))
          .otherwise(joined.col(s"g_$other")).as(other)
    }

    val merged = joined.select(stored.columns.map(resolve).toSeq: _*)
      // the store is its own input: cut lineage before overwriting it
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(path)
    reread(spark, path)
  }

  /** Generate-and-land: initialize on first run, locked merge after. */
  def generateInto(spark: SparkSession, dir: String, path: String): DataFrame = {
    val generated = TestGenerator.run(spark, dir)
    if (new java.io.File(path).exists()) merge(spark, path, generated)
    else initialize(spark, path, generated)
  }
}
