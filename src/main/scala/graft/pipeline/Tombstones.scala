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
  *     `input_file_name()`, counting the doomed rows per file in the
  *     same pass — the affected-file list is bounded by the tombstone
  *     count, not the corpus, and no extra counting reads happen later;
  *  2. each affected file is rewritten alone (read file → anti-filter,
  *     NULL ids preserved → write) and swapped in under its original
  *     path: the live file moves aside, the rewrite moves in, then the
  *     aside copy deletes. A crash between the two renames leaves the
  *     file ABSENT from the relation but PRESERVED in its `__tomb_old_`
  *     aside — [[recoverAsides]] restores any such orphan, and every
  *     apply call runs it first, so a re-run self-heals before touching
  *     anything (readers in the window see fewer rows; run deletes in a
  *     maintenance window or on a snapshot-isolated store for stronger
  *     guarantees — plain parquet directories have no atomic swap);
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

  /** Restore any `__tomb_old_` aside whose original file vanished (a
    * crash between the rename-aside and the swap-in): the aside name
    * encodes the file's path relative to the relation root, so recovery
    * is a direct rename back. Safe to run any time — an aside whose
    * original exists is a completed swap's leftover and is deleted
    * instead. [[applyToRelation]] runs this first on every call. */
  def recoverAsides(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(path, fs, root)
  }

  // encode the file's path RELATIVE to the relation root into the aside
  // name so partitioned files recover into the right directory
  private def asideName(root: Path, file: Path): String =
    file.toUri.getPath.stripPrefix(root.toUri.getPath)
      .stripPrefix("/").replace("/", "%2F")
  private def fromAsideName(root: Path, name: String): Path =
    new Path(root, name.replace("%2F", "/"))

  /** Delete `ids` from the parquet relation at `path` (id column
    * `idCol`), rewriting only the files that contain one. NULL ids are
    * never deleted. Runs [[recoverAsides]] first, so a crashed prior
    * pass self-heals before this one starts. */
  def applyToRelation(spark: SparkSession, path: String, idCol: String,
                      ids: Seq[Long]): Report = {
    require(ids.nonEmpty, "empty tombstone list")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(path, fs, root)
    val rel = spark.read.parquet(path)
    val filesTotal = rel.inputFiles.length.toLong
    // pass 1: which files hold tombstoned rows, and how many each (one
    // id-column scan with the pushed-down IN filter; row-group stats
    // prune clean files; also the only counting this pass ever does)
    val affected = rel.select(col(idCol))
      .where(col(idCol).isInCollection(ids))
      .groupBy(input_file_name().as("f")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    affected.foreach { case (f, _) =>
      val file = new Path(new java.net.URI(f))
      // staging lives OUTSIDE the relation root (sibling dirs, like the
      // index compaction) so discovery over the relation never sees it
      val tmpDir = new Path(s"${path}__tomb_tmp")
      val aside = new Path(s"${path}__tomb_old_${asideName(root, file)}")
      val kept = spark.read.parquet(file.toString)
        // NULL is not a tombstoned id: NOT(NULL IN (...)) is NULL and
        // would silently drop every NULL-id row
        .where(col(idCol).isNull || !col(idCol).isInCollection(ids))
      // one output file per rewritten input file, same directory
      kept.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val rewritten = fs.listStatus(tmpDir).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      require(rewritten.length == 1, s"expected 1 rewrite file, got ${rewritten.length}")
      // swap under the original path: aside → in → delete; recoverAsides
      // heals the crash window between the renames
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
    Report(filesTotal, affected.map(_._2).sum,
      affected.map { case (f, _) => new Path(new java.net.URI(f)).toUri.getPath })
  }

  // the aside names fully encode the relative path, so recovery is a
  // direct rename — no directory search needed
  private def recover(path: String, fs: org.apache.hadoop.fs.FileSystem,
                      root: Path): Seq[String] = {
    val parent = root.getParent
    val prefix = root.getName + "__tomb_old_"
    if (parent == null || !fs.exists(parent)) return Nil
    fs.listStatus(parent).map(_.getPath)
      .filter(_.getName.startsWith(prefix)).toSeq.flatMap { aside =>
        val orig = fromAsideName(root, aside.getName.stripPrefix(prefix))
        if (!fs.exists(orig)) {
          if (!fs.rename(aside, orig))
            sys.error(s"tombstones: recovery rename failed for $aside")
          println(s"[graft] tombstones: recovered ${orig.getName} from a crashed swap")
          Seq(orig.toUri.getPath)
        } else {
          fs.delete(aside, true) // completed swap's leftover
          Nil
        }
      }
  }

  /** Delete vectors from a bucket-partitioned ANN index — the same
    * per-file rewrite; partition directories not holding a tombstoned
    * vector are never touched, so probes over other buckets read the
    * identical files. */
  def applyToIndex(spark: SparkSession, indexPath: String,
                   vecIds: Seq[Long]): Report =
    applyToRelation(spark, indexPath, "vec_id", vecIds)
}
