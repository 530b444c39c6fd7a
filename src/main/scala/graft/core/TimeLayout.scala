package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Date-partitioned landed layout — the storage-level strategy for
  * time-ranged event queries at 100 TB.
  *
  * The reference re-scans its full target tables per monitor run and
  * leaves layout to the target database. On a data lake the engine OWNS
  * layout: landing the event stream `partitionBy(event_date)` turns
  * every time-bounded query (a day's drill-down, a monitor window, an
  * incident replay) into a partition-PRUNED scan — the files outside
  * the predicate are never listed into the plan, so a one-day query
  * over a 10-year corpus reads ~1/3650th of the bytes, before any
  * row-group or column pruning stacks on top.
  *
  * Landing shape: one `repartition(event_date, salt)` shuffle bounds
  * each date directory at `WritersPerDay` files — co-located enough to
  * avoid the one-file-per-(task × date) small-files blowup of naive
  * partitionBy, parallel enough that a 100 TB day doesn't funnel
  * through a single writer (the failure mode of repartitioning on the
  * date alone). The landing is once-per-corpus; every later consumer
  * inherits pruning for free (the storage-level complement of the
  * in-session checkpoint memoization and the bucketed doc-signal
  * tables).
  */
object TimeLayout {

  /** Files (parallel writers) per date directory. */
  val WritersPerDay = 8

  // the ONE layout-landing shape (date derivation + salted co-location),
  // shared by the initial landing and the daily append so the two can
  // never fork
  private def landInto(df: DataFrame, path: String, mode: String): Unit =
    df.withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"),
        pmod(xxhash64(col("event_id")), lit(WritersPerDay)))
      .write.mode(mode).partitionBy("event_date").parquet(path)

  /** Land events date-partitioned (memoized per session+dir). */
  private[graft] def layoutPath(spark: SparkSession, dir: String): String =
    SessionCache.getOrElseUpdate(spark, "time_layout", dir) {
      val out = java.nio.file.Files
        .createTempDirectory("graft_events_by_day").toString
      landInto(Tables.load(spark, dir, "events"), out, "overwrite")
      out
    }

  /** The day queried: 5 days past the corpus's first event — derived in
    * SQL so the oracle (which sees only the raw parquet) elects the
    * same literal. */
  private def targetDay(d: Dialect, eventsRel: String): String =
    d.dateAddDays(s"(SELECT CAST(MIN(ts) AS DATE) FROM $eventsRel)", 5)

  /** One day's per-type rollup over the pruned layout. The engine's
    * scan carries the day in PartitionFilters (spec-asserted: only that
    * date's files are listed); the oracle computes the identical
    * relation from the raw unpartitioned parquet. */
  def daySql(rel: String, dayExpr: String, dateCol: String)(d: Dialect): String =
    s"""SELECT event_type,
       |       CAST(COUNT(*) AS BIGINT) AS ct,
       |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
       |  FROM $rel
       | WHERE $dateCol = $dayExpr
       | GROUP BY event_type
       | ORDER BY event_type""".stripMargin

  def runDayRollup(spark: SparkSession, dir: String): DataFrame = {
    val path = layoutPath(spark, dir)
    // elect the literal once per session (one min scan over the raw
    // table, memoized — it cannot change while the layout is frozen) so
    // the layout scan's predicate is a CONSTANT the planner prunes
    // partitions with statically
    val day = SessionCache.getOrElseUpdate(spark, "time_layout_day", dir) {
      Tables.load(spark, dir, "events").createOrReplaceTempView("__graft_tl_raw")
      spark.sql(
        s"SELECT ${SparkDialect.dateAddDays("CAST(MIN(ts) AS DATE)", 5)} FROM __graft_tl_raw")
        .head().getDate(0).toString
    }
    spark.read.parquet(path).createOrReplaceTempView("__graft_tl_layout")
    spark.sql(daySql("__graft_tl_layout", s"DATE '$day'", "event_date")(SparkDialect))
  }

  /** Daily maintenance: append a new batch of events into the layout.
    * `mode("append") + partitionBy(event_date)` only creates/extends the
    * date directories the batch actually touches — yesterday's files are
    * never rewritten (spec asserts byte-identity), so the daily ingest
    * cost scales with the batch, and consumers keep pruning over the
    * union of old and new days with no compaction step. */
  def appendBatch(spark: SparkSession, layoutPath: String,
                  batch: DataFrame): Unit =
    landInto(batch, layoutPath, "append")

  /** The filtered layout frame (for the pruning tripwire). */
  private[graft] def dayFrame(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(layoutPath(spark, dir))
      .where(col("event_date") === to_date(lit(day)))

  def duckSql(): String =
    daySql("events", targetDay(DuckDialect, "events"), "CAST(ts AS DATE)")(DuckDialect)
}
