package graft

import org.apache.spark.sql.functions.{col, lit, when}

import graft.generation.TestDefinitionStore

/** Locked-refresh MERGE semantics of the test-definition store
  * (reference gen_selection_tests.sql:24-64). */
class TestDefinitionStoreSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_defs").toString + "/defs"

  test("generation is idempotent: regenerating an unlocked store is a no-op") {
    val path = tmp()
    val first = TestDefinitionStore.generateInto(spark, sfDir, path).collect()
    val second = TestDefinitionStore.generateInto(spark, sfDir, path).collect()
    assert(first.length == second.length)
    assert(first.map(_.toString).sorted.sameElements(second.map(_.toString).sorted))
  }

  test("a locked edit survives regeneration; unlocked edits are refreshed") {
    val path = tmp()
    val store = TestDefinitionStore.generateInto(spark, sfDir, path)
    val storeCount = store.count() // before the overwrite deletes these files
    // user edits two thresholds, locking only the first
    val keys = store.select("test_type", "table_name", "column_name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(keys.length >= 2)
    val lockKey = keys.head
    val free = keys.find(_ != lockKey).get
    def isKey(k: (String, String, String)) =
      col("test_type") === k._1 && col("table_name") === k._2 && col("column_name") === k._3
    val edited = store
      .withColumn("threshold_value",
        when(isKey(lockKey) || isKey(free), lit(12345.0)).otherwise(col("threshold_value")))
      .withColumn("lock_refresh",
        when(isKey(lockKey), lit("Y")).otherwise(col("lock_refresh")))
      .localCheckpoint(true)
    edited.write.mode("overwrite").parquet(path)

    val merged = TestDefinitionStore.generateInto(spark, sfDir, path)
    val byKey = merged.collect().map { r =>
      (r.getAs[String]("test_type"), r.getAs[String]("table_name"),
        r.getAs[String]("column_name")) ->
        (r.getAs[Double]("threshold_value"), r.getAs[String]("lock_refresh"))
    }.toMap
    assert(byKey(lockKey)._1 == 12345.0, "locked edit must survive regeneration")
    assert(byKey(lockKey)._2 == "Y")
    assert(byKey(free)._1 != 12345.0, "unlocked edit must be refreshed")
    assert(merged.count() == storeCount)
  }

  test("stored tests no longer regenerated are kept; new tests insert unlocked") {
    val path = tmp()
    val store = TestDefinitionStore.generateInto(spark, sfDir, path)
    val storeCount = store.count() // before the overwrite deletes these files
    // drop one row from the store, then merge: it must be re-inserted with
    // lock_refresh = 'N'; add a synthetic stored-only row: it must be kept.
    val keys = store.select("test_type", "table_name", "column_name").collect()
    val dropped = (keys.head.getString(0), keys.head.getString(1), keys.head.getString(2))
    val syntheticKey = ("Custom_Retired", "orders", "o_orderkey")
    val synthetic = store.limit(1)
      .withColumn("test_type", lit(syntheticKey._1))
      .withColumn("table_name", lit(syntheticKey._2))
      .withColumn("column_name", lit(syntheticKey._3))
    val mutated = store
      .where(!(col("test_type") === dropped._1 &&
        col("table_name") === dropped._2 && col("column_name") === dropped._3))
      .unionByName(synthetic)
      .localCheckpoint(true)
    mutated.write.mode("overwrite").parquet(path)

    val merged = TestDefinitionStore.generateInto(spark, sfDir, path)
    val byKey = merged.collect().map { r =>
      (r.getAs[String]("test_type"), r.getAs[String]("table_name"),
        r.getAs[String]("column_name")) -> r.getAs[String]("lock_refresh")
    }.toMap
    assert(byKey.contains(dropped), "regenerated test must re-insert")
    assert(byKey(dropped) == "N")
    assert(byKey.contains(syntheticKey), "stored-only test must be kept")
    assert(merged.count() == storeCount + 1)
  }
}
