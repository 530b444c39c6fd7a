package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten tombstones — targeted deletes over the landed
  * store.
  *
  * A takedown/GDPR request arrives as a list of document ids; the landed
  * parquet relations (and the ANN index) must stop serving those rows.
  * Rewriting whole relations for a handful of ids is the 100 TB failure
  * mode — this pass rewrites ONLY the files that actually contain a
  * tombstoned id:
  *
  *  1. one id-column scan (column-pruned; min/max row-group stats and
  *     dictionary filters prune most files before any row is read) maps
  *     each tombstoned id to the files holding it via
  *     `input_file_name()` — the affected-file list is bounded by the
  *     tombstone count, not the corpus;
  *  2. each affected file is rewritten alone (read file → anti-filter →
  *     write) and swapped in with the same crash-safe rename-aside
  *     protocol as the ANN index compaction ([[Similarity.compactIndex]]):
  *     the live file moves aside, the rewrite moves in, only then does
  *     the original delete — a crash never leaves the relation partially
  *     missing;
  *  3. every untouched file stays byte-identical (spec-asserted), so
  *     object-store costs scale with |tombstones|, not |corpus|.
  *
  * The reference has no deletion story at all (its app DB cascades
  * deletes of its own metadata only); on a data lake the engine owns it.
  */
object Tombstones {

  final case class Report(filesTotal: Long, rowsDeleted: Long,
                          rewrittenFiles: Seq[String]) {
    def filesRewritten: Long = rewrittenFiles.length.toLong
  }

  /** Delete `ids` from the parquet relation at `path` (id column
    * `idCol`), rewriting only the files that contain one. */
  def applyToRelation(spark: SparkSession, path: String, idCol: String,
                      ids: Seq[Long]): Report = {
    require(ids.nonEmpty, "empty tombstone list")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rel = spark.read.parquet(path)
    val filesTotal = rel.inputFiles.length.toLong
    // pass 1: which files hold a tombstoned row (id-column scan with
    // pushed-down IN filter; row-group stats prune clean files)
    val affected = rel.select(col(idCol))
      .where(col(idCol).isInCollection(ids))
      .select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0)).sorted
    var deleted = 0L
    affected.foreach { f =>
      val file = new Path(new java.net.URI(f))
      // staging lives OUTSIDE the relation root (sibling dirs, like the
      // index compaction) so discovery over the relation never sees it
      val tmpDir = new Path(s"${path}__tomb_tmp")
      val aside = new Path(s"${path}__tomb_old_${file.getName}")
      val kept = spark.read.parquet(file.toString)
        .where(!col(idCol).isInCollection(ids))
      val before = spark.read.parquet(file.toString).count()
      // one output file per rewritten input file, same directory
      kept.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val rewritten = fs.listStatus(tmpDir).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      require(rewritten.length == 1, s"expected 1 rewrite file, got ${rewritten.length}")
      deleted += before - spark.read.parquet(tmpDir.toString).count()
      // crash-safe swap (the compactIndex protocol): aside → in → delete
      if (fs.exists(aside) && !fs.delete(aside, true))
        sys.error(s"tombstones: cannot clear stale $aside")
      if (!fs.rename(file, aside))
        sys.error(s"tombstones: rename aside failed for $file")
      if (!fs.rename(rewritten.head, file)) {
        fs.rename(aside, file)
        sys.error(s"tombstones: swap-in failed for $file")
      }
      if (!fs.delete(aside, true) || !fs.delete(tmpDir, true))
        sys.error(s"tombstones: rewrite of $file live, but stale copies remain")
    }
    Report(filesTotal, deleted,
      affected.map(f => new Path(new java.net.URI(f)).toUri.getPath))
  }

  /** Delete vectors from a bucket-partitioned ANN index — the same
    * per-file rewrite; partition directories not holding a tombstoned
    * vector are never touched, so probes over other buckets read the
    * identical files. */
  def applyToIndex(spark: SparkSession, indexPath: String,
                   vecIds: Seq[Long]): Report =
    applyToRelation(spark, indexPath, "vec_id", vecIds)
}
