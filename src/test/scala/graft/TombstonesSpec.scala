package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Tombstones

/** Tombstone pass: deleted ids vanish, surviving rows are untouched, and
  * ONLY the files containing a tombstoned id get rewritten — every other
  * file stays byte-identical (the |tombstones|-not-|corpus| cost claim). */
class TombstonesSpec extends SparkSpec {

  private def fileStats(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
  }

  test("targeted delete rewrites only the affected files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tomb").toString + "/rel"
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    docs.repartition(8, col("doc_id")).write.parquet(dir)
    val ids = docs.select("doc_id").orderBy("doc_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    val before = fileStats(dir)
    val expectSurvivors = docs.where(!col("doc_id").isInCollection(ids)).count()

    val report = Tombstones.applyToRelation(spark, dir, "doc_id", ids)

    val after = spark.read.parquet(dir)
    assert(after.where(col("doc_id").isInCollection(ids)).count() == 0)
    assert(after.count() == expectSurvivors)
    assert(report.rowsDeleted == 3)
    assert(report.filesRewritten >= 1 && report.filesRewritten < report.filesTotal,
      s"rewrote ${report.filesRewritten} of ${report.filesTotal}")
    // rewrites swap in under the ORIGINAL paths; every file NOT in the
    // rewritten list is byte-identical (size + mtime unchanged)
    val afterStats = fileStats(dir)
    val rewritten = report.rewrittenFiles.toSet
    assert(afterStats.keySet == before.keySet)
    val untouched = before.keySet.diff(rewritten)
    assert(untouched.size == (report.filesTotal - report.filesRewritten))
    untouched.foreach(p => assert(before(p) == afterStats(p), s"$p changed"))
  }

  test("NULL-id rows survive a rewrite of their file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tomb_null").toString + "/rel"
    val spark2 = spark
    import spark2.implicits._
    // one file holding a tombstoned id AND NULL-id rows: the anti-filter
    // must not let NOT(NULL IN (...)) = NULL drop them
    Seq(Some(1L), Some(2L), None, None, Some(3L))
      .toDF("doc_id").coalesce(1).write.parquet(dir)
    val report = Tombstones.applyToRelation(spark, dir, "doc_id", Seq(2L))
    assert(report.rowsDeleted == 1)
    val after = spark.read.parquet(dir)
    assert(after.count() == 4)
    assert(after.where(col("doc_id").isNull).count() == 2)
  }

  test("a crashed swap (file renamed aside, not swapped in) self-heals") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tomb_cr").toString + "/rel"
    val spark2 = spark
    import spark2.implicits._
    (1L to 100L).toDF("doc_id").repartition(4).write.parquet(dir)
    val full = spark.read.parquet(dir).count()
    // simulate the crash window: one live file moved to its aside name,
    // nothing swapped in
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val aside = new java.io.File(s"${dir}__tomb_old_${f.getName}")
    assert(f.renameTo(aside))
    assert(spark.read.parquet(dir).count() < full) // rows silently absent
    val restored = Tombstones.recoverAsides(spark, dir)
    assert(restored.nonEmpty)
    assert(spark.read.parquet(dir).count() == full)
    // and applyToRelation runs the same recovery before touching anything
    assert(f.renameTo(aside))
    Tombstones.applyToRelation(spark, dir, "doc_id", Seq(1L))
    assert(spark.read.parquet(dir).count() == full - 1)
  }

  test("partitioned index delete leaves other partitions' files alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tomb_ix").toString + "/ix"
    val spark2 = spark
    import spark2.implicits._
    (0L until 200L).map(i => (i, (i % 8).toInt))
      .toDF("vec_id", "bucket")
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(dir)
    val before = fileStats(dir)
    val report = Tombstones.applyToIndex(spark, dir, Seq(5L, 13L)) // buckets 5, 5
    val after = spark.read.parquet(dir)
    assert(after.where($"vec_id".isin(5L, 13L)).count() == 0)
    assert(after.count() == 198)
    assert(report.rowsDeleted == 2)
    val afterStats = fileStats(dir)
    // only bucket=5's file was rewritten; every other bucket's files are
    // byte-identical, so probes over them read the same bytes
    assert(report.rewrittenFiles.forall(_.contains("bucket=5")))
    val untouched = before.keySet.diff(report.rewrittenFiles.toSet)
    untouched.foreach(p => assert(before(p) == afterStats(p), s"$p changed"))
    assert(untouched.count(_.contains("bucket=")) >= 7)
    // the partition column survives the in-place rewrite
    assert(after.where($"bucket" === 5).count() == 25 - 2)
  }
}
