package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run-stamped landing store — the Spark analogue of the reference's
  * app-DB run history (`profiling_runs`, `data_structure_log`;
  * reference: testgen/template/dbsetup/030_initialize_new_schema_structure.sql:136,398).
  * Each run's stage outputs land as parquet under `root/run_<id>/<name>`;
  * history consumers (schema drift, table-type classification, monitor
  * thresholds) read back the most recent landed runs. Append-only by
  * construction: a new run never rewrites a prior run's directory.
  */
object RunStore {

  /** Where run history lands. Namespaced by PROCESS by default: the
    * oracle SQL is rendered in the same JVM that lands the snapshots, so
    * a per-process root keeps the rendered paths addressable by the
    * DuckDB oracle while two CONCURRENT invocations (separate processes,
    * possibly different data dirs) can no longer cross-contaminate each
    * other's landed runs. Stable within a process; override per
    * deployment with GRAFT_HISTORY_DIR. */
  def root: String =
    sys.env.getOrElse("GRAFT_HISTORY_DIR",
      s"/tmp/graft_history_p${ProcessHandle.current().pid()}")

  def runPath(root: String, runId: String, name: String): String =
    s"$root/$runId/$name"

  /** Land one stage output under a run-stamped directory. */
  def land(df: DataFrame, root: String, runId: String, name: String): String = {
    val path = runPath(root, runId, name)
    df.write.mode("overwrite").parquet(path)
    path
  }

  /** Store health report over a landing directory: per relation, file
    * count / total bytes / mean file size, with a small-files flag —
    * the signal that a relation needs the per-directory compaction pass
    * (the ANN index already self-compacts; this surfaces the need for
    * every other landed relation). Listed through the Hadoop FileSystem
    * API so a non-local store (hdfs://, s3a://) reports identically;
    * driver-side fs metadata only — no data reads — so it is free to
    * run per lifecycle. The Runner's infra directories (warehouse, the
    * runs/ history tree, ingest staging) are not landed relations and
    * are excluded. */
  private val NonRelationDirs = Set("warehouse", "runs", "ingested")

  def fileReport(spark: SparkSession, dir: String,
                 targetMinBytes: Long = 8L << 20): DataFrame = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: Path): Seq[FileStatus] =
      fs.listStatus(p).toSeq.flatMap {
        case s if s.isDirectory => parquetFiles(s.getPath)
        case s if s.getPath.getName.endsWith(".parquet")
          && !s.getPath.getName.startsWith(".") => Seq(s)
        case _ => Nil
      }
    val rows = (if (fs.exists(root)) fs.listStatus(root).toSeq else Nil)
      .filter(s => s.isDirectory && !NonRelationDirs(s.getPath.getName))
      .map { rel =>
        val files = parquetFiles(rel.getPath)
        val bytes = files.map(_.getLen).sum
        val fileCt = files.length.toLong
        val mean = if (fileCt == 0) 0L else bytes / fileCt
        (rel.getPath.getName, fileCt, bytes, mean,
          fileCt > 1 && mean < targetMinBytes)
      }
      .sortBy(_._1)
    import spark.implicits._
    rows.toDF("relation", "file_ct", "total_bytes", "mean_file_bytes",
      "small_files")
  }

  /** Run ids that have landed `name`, oldest first (lexicographic — ids
    * are zero-padded or timestamp-shaped). Listing is driver-side fs
    * metadata only. */
  def runsWith(root: String, name: String): Seq[String] = {
    val base = new java.io.File(root)
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && new java.io.File(f, name).exists())
      .map(_.getName).sorted.toSeq
  }

  /** The two most recent landed paths for `name` (prior, current). */
  def latestTwo(root: String, name: String): Option[(String, String)] =
    runsWith(root, name).takeRight(2) match {
      case Seq(prior, current) =>
        Some((runPath(root, prior, name), runPath(root, current, name)))
      case _ => None
    }
}
