package graft.profiling

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Two-sample Kolmogorov–Smirnov drift screen, exact in integers —
  * the numeric complement of the engine's categorical JS-divergence
  * drift (`query_distribution_shift`): compares the full SHAPE of two
  * numeric samples (here: `l_extendedprice` of returned vs kept line
  * items), not just moments. The KS statistic is
  * sup_x |F_A(x) − F_B(x)|; evaluated on the pooled support it equals
  * max_v |n_B·cumA(v) − n_A·cumB(v)| / (n_A·n_B) — the numerator is
  * pure BIGINT arithmetic on cents-exact values, so both engines
  * agree bit-for-bit (sound to n_A·n_B ≤ 2^63/10^6, i.e. ~3·10^9 rows
  * per side; past that the cross-multiplication moves to
  * DECIMAL(38,0) — at that n the ppm statistic is saturated anyway).
  *
  * Scale shape (Spark side): the ECDFs need a running sum over the
  * pooled value domain — the naive spelling is ONE global-sort window
  * (exactly what the DuckDB oracle runs, a different algorithm
  * checking the same relation). The Spark plan is a distributed
  * two-level prefix sum: per-value counts group once (map-side
  * combined), each 64 Ki-cent bucket cumsums independently
  * (`PARTITION BY bucket ORDER BY v` — parallel across buckets), the
  * per-bucket totals (a few hundred rows, price-range-bounded —
  * metadata-sized by construction) take the only ordered window, and
  * the bucket offsets broadcast back. No corpus-sized relation ever
  * sorts on one task (Round12OpsSpec asserts the plan). */
object KsDrift {

  /** Bucket width for the two-level prefix sum, in cents. */
  val BucketCents = 65536L

  private def centsCte(table: String): String =
    s"""pts AS (
       |  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
       |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS a
       |    FROM $table
       |),
       |cnt AS (
       |  SELECT v, SUM(a) AS ca, SUM(1 - a) AS cb FROM pts GROUP BY v
       |),
       |tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM cnt)""".stripMargin

  private def finalSelect(d: Dialect): String =
    s"""SELECT CAST(tot.na AS BIGINT) AS n_a, CAST(tot.nb AS BIGINT) AS n_b,
       |       CAST(MAX(ABS(tot.nb * cum.cma - tot.na * cum.cmb)) AS BIGINT)
       |         AS ks_num,
       |       CAST(${d.intDiv(
                 "MAX(ABS(tot.nb * cum.cma - tot.na * cum.cmb)) * 1000000",
                 "tot.na * tot.nb")} AS BIGINT) AS ks_ppm
       |  FROM cum CROSS JOIN tot
       | GROUP BY tot.na, tot.nb""".stripMargin

  /** Spark form: bucketed two-level prefix sum. */
  def sparkSql(table: String): String =
    s"""WITH ${centsCte(table)},
       |bk AS (SELECT v, ca, cb, v DIV $BucketCents AS bucket FROM cnt),
       |w AS (
       |  SELECT v, bucket,
       |         SUM(ca) OVER (PARTITION BY bucket ORDER BY v) AS wca,
       |         SUM(cb) OVER (PARTITION BY bucket ORDER BY v) AS wcb
       |    FROM bk
       |),
       |btot AS (SELECT bucket, SUM(ca) AS tca, SUM(cb) AS tcb FROM bk GROUP BY bucket),
       |boff AS (
       |  SELECT bucket,
       |         SUM(tca) OVER (ORDER BY bucket) - tca AS offa,
       |         SUM(tcb) OVER (ORDER BY bucket) - tcb AS offb
       |    FROM btot
       |),
       |cum AS (
       |  SELECT w.v, w.wca + boff.offa AS cma, w.wcb + boff.offb AS cmb
       |    FROM w JOIN boff ON boff.bucket = w.bucket
       |)
       |${finalSelect(SparkDialect)}""".stripMargin

  /** Oracle form: the naive single-window ECDF — a different algorithm
    * agreeing on the same relation. */
  def duckSql(table: String = "lineitem"): String =
    s"""WITH ${centsCte(table)},
       |cum AS (
       |  SELECT v, SUM(ca) OVER (ORDER BY v) AS cma,
       |         SUM(cb) OVER (ORDER BY v) AS cmb
       |    FROM cnt
       |)
       |${finalSelect(DuckDialect)}""".stripMargin

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.load(spark, dir, "lineitem")
      .createOrReplaceTempView("__graft_ks_li")
    spark.sql(sparkSql("__graft_ks_li"))
  }
}
