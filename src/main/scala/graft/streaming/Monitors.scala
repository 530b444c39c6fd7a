package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Monitor machinery — the reference has no streaming runtime; monitors
  * are batch snapshots plus time series over run history (reference:
  * testgen/commands/test_thresholds_prediction.py:83-137,
  * testgen/template/execution/update_history_calc_thresholds.sql:22-51,
  * test_types_Freshness_Trend.yaml / gen_Freshness_Trend.sql).
  *
  * The `events` table stands in for run history: its daily volume
  * series drives the same computations the reference applies to signal
  * history.
  *
  *  - history thresholds: last-N window Min/Max/Avg/Stddev recalc per
  *    signal — the reference's non-PREDICT threshold refresh;
  *  - volume bands: mean ± z·sd tolerance bands over a trailing window
  *    with breach flags — the reference's SARIMAX bands replaced by the
  *    documented fallback (its own three-way SE floor makes the simple
  *    band the dominant term on short histories); a full
  *    Kalman/ARIMA(1,1,1) port is future work behind the same shape;
  *  - freshness fingerprint: MD5 over max-of-key/date columns, the
  *    change-detection signal of Freshness_Trend.
  */
object Monitors {

  /** Daily volume signal from events with trailing-window stats and
    * tolerance bands (z = 2, min 5 observations). */
  def volumeBandsSql(table: String, lookback: Int = 30)(d: Dialect): String =
    s"""WITH daily AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS ct
       |    FROM $table GROUP BY 1
       |),
       |w AS (
       |  SELECT day, ct,
       |         COUNT(*) OVER win AS n_obs,
       |         AVG(CAST(ct AS DOUBLE)) OVER win AS mean_ct,
       |         STDDEV(CAST(ct AS DOUBLE)) OVER win AS sd_ct,
       |         MIN(ct) OVER win AS min_ct,
       |         MAX(ct) OVER win AS max_ct
       |    FROM daily
       |  WINDOW win AS (ORDER BY day ROWS BETWEEN $lookback PRECEDING AND 1 PRECEDING)
       |)
       |SELECT day, ct, CAST(n_obs AS BIGINT) AS n_obs,
       |       CAST(ROUND(mean_ct, 4) AS DOUBLE) AS mean_ct,
       |       CAST(ROUND(sd_ct, 4) AS DOUBLE) AS sd_ct,
       |       CAST(min_ct AS BIGINT) AS min_ct, CAST(max_ct AS BIGINT) AS max_ct,
       |       CAST(ROUND(mean_ct - 2.0 * sd_ct, 4) AS DOUBLE) AS lower_band,
       |       CAST(ROUND(mean_ct + 2.0 * sd_ct, 4) AS DOUBLE) AS upper_band,
       |       CAST(CASE WHEN n_obs >= 5
       |                  AND (ct < mean_ct - 2.0 * sd_ct OR ct > mean_ct + 2.0 * sd_ct)
       |                 THEN 1 ELSE 0 END AS INT) AS breach
       |  FROM w
       | ORDER BY day""".stripMargin

  /** Freshness fingerprint per table: md5 over max id/date — equal
    * fingerprints across runs mean no new data
    * (test_types_Freshness_Trend.yaml MD5({CUSTOM_QUERY})). */
  def freshnessSql(d: Dialect): String = {
    def fp(table: String, idCol: String, tsCol: String) =
      s"""SELECT '$table' AS table_name,
         |  MD5(CAST(MAX($idCol) AS ${d.textType}) || '|' || ${d.fmtTs(s"MAX($tsCol)")}) AS fingerprint,
         |  ${d.fmtTs(s"MAX($tsCol)")} AS latest_update
         |FROM $table""".stripMargin
    Seq(
      fp("events", "event_id", "ts"),
      fp("orders", "o_orderkey", "o_orderdate"),
      fp("lineitem", "l_orderkey", "l_shipdate")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  def runVolumeBands(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "events").createOrReplaceTempView("__graft_events")
    spark.sql(volumeBandsSql("__graft_events")(SparkDialect))
  }

  def runFreshness(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.registerAll(spark, dir)
    spark.sql(freshnessSql(SparkDialect))
  }

  def duckVolumeBandsSql(): String = volumeBandsSql("events")(DuckDialect)
  def duckFreshnessSql(): String = freshnessSql(DuckDialect)
}
