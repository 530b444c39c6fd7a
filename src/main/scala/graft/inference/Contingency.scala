package graft.inference

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Pairwise contingency rules — IF X=a THEN Y=b discovery over
  * low-cardinality category columns (reference:
  * testgen/template/contingency/contingency_counts.sql +
  * testgen/commands/run_pairwise_contingency_check.py:12-60; the
  * reference ships it disabled/pandas-pivoted; here it is one grouped
  * aggregation per column pair — the 100 TB path, since the group count
  * is bounded by the categorical domain product, and partial aggregation
  * collapses rows map-side).
  */
object Contingency {

  final case class Pair(table: String, x: String, y: String)

  /** The checked pairs over the driver testdata (Code/Category columns
    * with 2..N distinct values, the reference's eligibility). */
  val pairs: Seq[Pair] = Seq(
    Pair("lineitem", "l_returnflag", "l_linestatus"),
    Pair("orders", "o_orderstatus", "o_orderpriority"),
    Pair("events", "event_type", "CASE WHEN value >= 50 THEN 'high' ELSE 'low' END"))

  def sql(minSupport: Int = 100, minConfidence: Double = 0.6)(d: Dialect): String = {
    val branches = pairs.map { p =>
      s"""SELECT '${p.table}' AS table_name, '${p.x}' AS if_column,
         |       '${p.y.replace("'", "''")}' AS then_column,
         |       CAST(x AS ${d.textType}) AS if_value,
         |       CAST(y AS ${d.textType}) AS then_value,
         |       CAST(ct AS BIGINT) AS support,
         |       CAST(ROUND(CAST(ct AS DOUBLE) / xct, 4) AS DOUBLE) AS confidence
         |  FROM (
         |    SELECT x, y, ct, SUM(ct) OVER (PARTITION BY x) AS xct
         |      FROM (SELECT ${p.x} AS x, ${p.y} AS y, COUNT(*) AS ct
         |              FROM ${p.table} GROUP BY 1, 2) xy
         |  ) r
         | WHERE ct >= $minSupport AND CAST(ct AS DOUBLE) / xct >= $minConfidence""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n",
      "\nORDER BY table_name, if_column, if_value, then_value")
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.registerAll(spark, dir)
    spark.sql(sql()(SparkDialect))
  }

  def duckSql(): String = sql()(DuckDialect)
}
