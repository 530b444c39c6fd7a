package graft.querytests

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Standalone QUERY-type tests — the reference's templated multi-table
  * tests (reference: testgen/template/dbsetup_test_types/
  * test_types_<TYPE>.yaml `template` entries). Each renders the full
  * result-row contract: result_code (0=fail/1=pass), result_measure,
  * result_message.
  *
  * Spark-first notes:
  *  - Aggregate_Balance* keeps the reference's UNION ALL + re-group shape
  *    (not a join): both sides aggregate map-side, and the single shuffle
  *    key is the group-by column — the same plan a full-outer join would
  *    need, minus the join. At scale the two sides run as parallel
  *    partial aggregations into one exchange.
  *  - Combo_Match's EXCEPT compiles to a left-anti hash join on Spark;
  *    with a small match side Catalyst broadcasts it (no shuffle).
  *  - Distribution_Shift's pct-of-total windows are over *aggregated*
  *    category counts (tiny), not raw rows; the FULL JOIN on category is
  *    a join of two small aggregates.
  */
/** @param sparkSql optional ENGINE rendering (plan-shape rewrite with
  *   oracle-proven row identity — the winnow/hotFps discipline); the
  *   oracle always renders `sql`. `sparkLookup` likewise for the
  *   drill-down branch. */
final case class QueryTest(name: String, sql: Dialect => String,
                           lookup: Option[Dialect => String] = None,
                           sparkSql: Option[Dialect => String] = None,
                           sparkLookup: Option[Dialect => String] = None)

object QueryTests {

  // ---- drill-down lookups -------------------------------------------
  // Each QUERY test carries the lookup_query of its reference test-type
  // YAML, normalized to a UNIFORM (detail: text, measure: double) shape
  // so the query-test family unions into one drill-down relation beside
  // the CAT family's. Row sets are deterministic: ORDER BY before the
  // 500-row limit (the documented deviation from random sampling).
  private val LookupLimit = 500

  private def round4d(x: String) =
    s"CAST(CAST(ROUND($x, 4) AS DECIMAL(28,4)) AS DOUBLE)"

  /** Mismatching balance groups: order key, with the total-vs-match gap. */
  private def orderBalanceLookup(mismatch: String): Dialect => String = d =>
    s"""SELECT CAST(l_orderkey AS ${d.textType}) AS detail,
       |       ${round4d("total - match_total")} AS measure
       |  FROM (
       |  SELECT l_orderkey, SUM(total) AS total, SUM(match_total) AS match_total
       |    FROM ( SELECT l_orderkey, SUM(CAST(l_extendedprice AS DOUBLE)) AS total,
       |                  CAST(NULL AS DOUBLE) AS match_total
       |             FROM lineitem GROUP BY l_orderkey
       |           UNION ALL
       |           SELECT o_orderkey, CAST(NULL AS DOUBLE) AS total,
       |                  SUM(CAST(o_totalprice AS DOUBLE)) AS match_total
       |             FROM orders GROUP BY o_orderkey ) a
       |   GROUP BY l_orderkey ) s
       | WHERE $mismatch
       | ORDER BY detail
       | LIMIT $LookupLimit""".stripMargin

  private def countWrapper(
      testType: String, table: String, colNames: String, skipErrors: Long,
      inner: Dialect => String, noun: String = "error(s)",
      measure: String = "CAST(cnt AS DOUBLE)",
      lookup: Option[Dialect => String] = None,
      sparkInner: Option[Dialect => String] = None,
      sparkLookup: Option[Dialect => String] = None): QueryTest = {
    def render(in: Dialect => String)(d: Dialect): String = {
      val t = d.textType
      s"""SELECT '$testType' AS test_type,
         |       '$table' AS table_name,
         |       '$colNames' AS column_names,
         |       CAST(CASE WHEN cnt > $skipErrors THEN 0 ELSE 1 END AS INT) AS result_code,
         |       $measure AS result_measure,
         |       CASE WHEN cnt > 0 THEN
         |              CONCAT(CONCAT(CAST(cnt AS $t), ' $noun identified, '),
         |                     CONCAT(CASE WHEN cnt > $skipErrors THEN 'exceeding limit of '
         |                                 ELSE 'within limit of ' END, '$skipErrors.'))
         |            ELSE 'No errors found.' END AS result_message
         |FROM (${in(d)}) agg""".stripMargin
    }
    QueryTest(testType.toLowerCase, lookup = lookup, sql = render(inner),
      sparkSql = sparkInner.map(render), sparkLookup = sparkLookup)
  }

  /** Aggregate_Balance / _Minimum / _Percent / _Range share one inner
    * UNION-ALL-and-regroup shape with different mismatch predicates. */
  private def aggregateInner(
      groupBy: String, totalExpr: String, table: String, subset: String,
      matchGroupBy: String, matchTotalExpr: String, matchTable: String,
      matchSubset: String, mismatch: String): Dialect => String = _ =>
    s"""SELECT COUNT(*) AS cnt FROM (
       |  SELECT $groupBy, SUM(total) AS total, SUM(match_total) AS match_total
       |    FROM ( SELECT $groupBy, $totalExpr AS total, CAST(NULL AS DOUBLE) AS match_total
       |             FROM $table WHERE $subset GROUP BY $groupBy
       |           UNION ALL
       |           SELECT $matchGroupBy, CAST(NULL AS DOUBLE) AS total, $matchTotalExpr AS match_total
       |             FROM $matchTable WHERE $matchSubset GROUP BY $matchGroupBy ) a
       |   GROUP BY $groupBy ) s
       | WHERE $mismatch""".stripMargin

  /** ENGINE rendering of [[aggregateInner]] (guide §2.3/§2.4): the
    * reference shape aggregates each side behind its own exchange, then
    * regroups the union on the SAME key — three exchanges where one
    * suffices. Unioning the RAW projected rows and aggregating ONCE
    * ships each side's map-side partial sums into a single key
    * exchange: 3 exchanges → 1, and the exchanged rows drop from
    * (2 aggregates + regroup input) to one set of per-partition
    * partials. Value identity per key: both forms merge the SAME
    * multiset of per-scan-partition partial SUMs in a final hash
    * aggregate (the side-local inner SUM is itself partial-then-merge
    * over the identical scan splits), and SUM skips the other side's
    * NULLs identically — so every (total, match_total) pair is
    * bit-equal wherever the reference form is deterministic. The
    * oracle keeps the reference's two-level shape; the gate re-proves
    * value identity end-to-end and QueryTestsSpec pins the
    * engine-vs-oracle rendering pair. */
  private def aggregateInnerSpark(
      groupBy: String, rawTotalExpr: String, table: String, subset: String,
      matchGroupBy: String, rawMatchTotalExpr: String, matchTable: String,
      matchSubset: String, mismatch: String): Dialect => String = _ =>
    s"""SELECT COUNT(*) AS cnt FROM (
       |  SELECT $groupBy, SUM(total) AS total, SUM(match_total) AS match_total
       |    FROM ( SELECT $groupBy, $rawTotalExpr AS total, CAST(NULL AS DOUBLE) AS match_total
       |             FROM $table WHERE $subset
       |           UNION ALL
       |           SELECT $matchGroupBy, CAST(NULL AS DOUBLE) AS total, $rawMatchTotalExpr AS match_total
       |             FROM $matchTable WHERE $matchSubset ) a
       |   GROUP BY $groupBy ) s
       | WHERE $mismatch""".stripMargin

  private val balanceMismatch =
    """total <> match_total
      | OR (total IS NOT NULL AND match_total IS NULL)
      | OR (total IS NULL AND match_total IS NOT NULL)""".stripMargin
  private val minimumMismatch = "total < match_total"
  private def pctMismatch(lo: Double, hi: Double) =
    s"""(total IS NOT NULL AND match_total IS NULL)
       | OR (total IS NULL AND match_total IS NOT NULL)
       | OR (total NOT BETWEEN match_total * (1 + $lo/100.0) AND match_total * (1 + $hi/100.0))""".stripMargin
  private def rangeMismatch(lo: Double, hi: Double) =
    s"""(total IS NOT NULL AND match_total IS NULL)
       | OR (total IS NULL AND match_total IS NOT NULL)
       | OR (total NOT BETWEEN match_total + $lo AND match_total + $hi)""".stripMargin

  /** lineitem order totals vs orders.o_totalprice, grouped by order key.
    * (r14 audit note: a pre-aggregate + FULL OUTER JOIN engine rendering
    * was tried and measured NEUTRAL-to-worse at min-of-4 — the regroup's
    * third exchange only carries rows the map-side partials already
    * collapsed to key grain, while the join form pays two sort-merge
    * sorts; the reference's UNION-ALL shape stays.) */
  private def orderBalance(mismatch: String): Dialect => String =
    aggregateInner(
      groupBy = "l_orderkey", totalExpr = "SUM(CAST(l_extendedprice AS DOUBLE))",
      table = "(SELECT l_orderkey, l_extendedprice FROM lineitem) li",
      subset = "1=1",
      matchGroupBy = "o_orderkey", matchTotalExpr = "SUM(CAST(o_totalprice AS DOUBLE))",
      matchTable = "(SELECT o_orderkey, o_totalprice FROM orders) o",
      matchSubset = "1=1", mismatch = mismatch)

  /** [[orderBalance]]'s single-exchange engine rendering. */
  private def orderBalanceSpark(mismatch: String): Dialect => String =
    aggregateInnerSpark(
      groupBy = "l_orderkey", rawTotalExpr = "CAST(l_extendedprice AS DOUBLE)",
      table = "(SELECT l_orderkey, l_extendedprice FROM lineitem) li",
      subset = "1=1",
      matchGroupBy = "o_orderkey", rawMatchTotalExpr = "CAST(o_totalprice AS DOUBLE)",
      matchTable = "(SELECT o_orderkey, o_totalprice FROM orders) o",
      matchSubset = "1=1", mismatch = mismatch)

  /** [[orderBalanceLookup]]'s single-exchange engine rendering (same
    * fusion as [[aggregateInnerSpark]]; identical per-key pairs, so the
    * WHERE/ORDER BY/LIMIT tail sees the same rows). */
  private def orderBalanceLookupSpark(mismatch: String): Dialect => String = d =>
    s"""SELECT CAST(l_orderkey AS ${d.textType}) AS detail,
       |       ${round4d("total - match_total")} AS measure
       |  FROM (
       |  SELECT l_orderkey, SUM(total) AS total, SUM(match_total) AS match_total
       |    FROM ( SELECT l_orderkey, CAST(l_extendedprice AS DOUBLE) AS total,
       |                  CAST(NULL AS DOUBLE) AS match_total
       |             FROM lineitem
       |           UNION ALL
       |           SELECT o_orderkey, CAST(NULL AS DOUBLE) AS total,
       |                  CAST(o_totalprice AS DOUBLE) AS match_total
       |             FROM orders ) a
       |   GROUP BY l_orderkey ) s
       | WHERE $mismatch
       | ORDER BY detail
       | LIMIT $LookupLimit""".stripMargin

  private def comboInner(
      cols: String, table: String, subset: String,
      matchCols: String, matchTable: String, matchSubset: String): Dialect => String = _ =>
    s"""SELECT COUNT(*) AS cnt FROM (
       |  SELECT $cols FROM $table WHERE $subset GROUP BY $cols
       |  EXCEPT
       |  SELECT $matchCols FROM $matchTable WHERE $matchSubset GROUP BY $matchCols
       |) test""".stripMargin

  /** Shared single-scan window presence counts for the Timeframe family
    * (test_types_Timeframe_Combo_Match.yaml template semantics). The
    * reference template — and this engine through round 5 — evaluated
    * each EXCEPT branch and each window boundary as its own scan (4-6
    * full passes of the table). Here the max-date boundary is computed
    * ONCE (a column-pruned aggregate joined as a 1-row broadcast) and
    * both windows derive from ONE data scan via conditional aggregation:
    * a combo is "in the latest window" iff latest_ct > 0, "in the prior
    * window" iff prior_ct > 0 — exactly the EXCEPT-over-distinct-combos
    * set semantics, at 2 scans total regardless of branch count. */
  private def timeframeCounts(cols: String, table: String, dateCol: String,
                              days: Int)(d: Dialect): String = {
    val latestFrom = d.dateAddDays("b.mxd", -days)
    val priorFrom = d.dateAddDays("b.mxd", -2 * days)
    s"""SELECT $cols,
       |       COUNT(CASE WHEN $dateCol >= $latestFrom THEN 1 END) AS latest_ct,
       |       COUNT(CASE WHEN $dateCol < $latestFrom THEN 1 END) AS prior_ct
       |  FROM $table CROSS JOIN
       |       (SELECT CAST(MAX($dateCol) AS DATE) AS mxd FROM $table) b
       | WHERE $dateCol >= $priorFrom
       | GROUP BY $cols""".stripMargin
  }

  private def timeframeInner(cols: String, table: String, dateCol: String,
                             days: Int): Dialect => String = d =>
    s"""SELECT COUNT(*) AS cnt FROM (
       |${timeframeCounts(cols, table, dateCol, days)(d)}
       |) test WHERE (latest_ct > 0) <> (prior_ct > 0)""".stripMargin

  private def timeframeGainInner(cols: String, table: String, dateCol: String,
                                 days: Int): Dialect => String = d =>
    s"""SELECT COUNT(*) AS cnt FROM (
       |${timeframeCounts(cols, table, dateCol, days)(d)}
       |) test WHERE prior_ct > 0 AND latest_ct = 0""".stripMargin

  /** Jensen-Shannon divergence between category distributions of two
    * table subsets (test_types_Distribution_Shift.yaml template). */
  private def distributionShift(
      name: String, category: String, table: String,
      subset: String, matchSubset: String, threshold: Double): QueryTest =
    QueryTest(name, d => {
      val t = d.textType
      s"""WITH latest_ver AS (
         |  SELECT $category AS category,
         |         CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS pct_of_total
         |    FROM $table WHERE $subset GROUP BY $category ),
         |older_ver AS (
         |  SELECT $category AS category,
         |         CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS pct_of_total
         |    FROM $table WHERE $matchSubset GROUP BY $category ),
         |dataset AS (
         |  SELECT COALESCE(l.category, o.category) AS category,
         |         COALESCE(o.pct_of_total, 0.0000001) AS old_pct,
         |         COALESCE(l.pct_of_total, 0.0000001) AS new_pct,
         |         (COALESCE(o.pct_of_total, 0.0000001) + COALESCE(l.pct_of_total, 0.0000001)) / 2.0 AS avg_pct
         |    FROM latest_ver l FULL JOIN older_ver o ON (l.category = o.category) )
         |SELECT 'Distribution_Shift' AS test_type,
         |       '$table' AS table_name,
         |       '$category' AS column_names,
         |       CAST(CASE WHEN js_divergence > $threshold THEN 0 ELSE 1 END AS INT) AS result_code,
         |       CAST(ROUND(js_divergence, 4) AS DOUBLE) AS result_measure,
         |       CONCAT('Divergence Level: ',
         |              CONCAT(CAST(CAST(ROUND(js_divergence, 4) AS DECIMAL(10,4)) AS $t),
         |                     ', Threshold: $threshold.')) AS result_message
         |  FROM ( SELECT 0.5 * ABS(SUM(new_pct * LN(new_pct/avg_pct)/LN(2)))
         |              + 0.5 * ABS(SUM(old_pct * LN(old_pct/avg_pct)/LN(2))) AS js_divergence
         |           FROM dataset ) rslt""".stripMargin
    })

  private def dupeRowsInner(cols: String, table: String, subset: String): Dialect => String = _ =>
    s"""SELECT COUNT(*) AS cnt, COALESCE(SUM(record_ct), 0) AS dupe_total FROM (
       |  SELECT $cols, COUNT(*) AS record_ct FROM $table
       |   WHERE $subset GROUP BY $cols HAVING COUNT(*) > 1
       |) test""".stripMargin

  /** Missing combos (the EXCEPT result itself). */
  private def comboLookup(cols: String, colsConcat: Dialect => String,
                          table: String, subset: String,
                          matchCols: String, matchTable: String,
                          matchSubset: String): Dialect => String = d =>
    s"""SELECT ${colsConcat(d)} AS detail, CAST(NULL AS DOUBLE) AS measure
       |  FROM (
       |  SELECT $cols FROM $table WHERE $subset GROUP BY $cols
       |  EXCEPT
       |  SELECT $matchCols FROM $matchTable WHERE $matchSubset GROUP BY $matchCols
       |) t ORDER BY detail LIMIT $LookupLimit""".stripMargin

  private def timeframeLookup(cols: String, concat: String, table: String,
                              dateCol: String, days: Int): Dialect => String = d =>
    // a combo is missing from exactly one side, so one CASE labels it —
    // the counts relation is referenced once (no CTE re-inlining)
    s"""SELECT CASE WHEN latest_ct > 0 THEN 'Prior Timeframe: '
       |            ELSE 'Latest Timeframe: ' END || $concat AS detail,
       |       CAST(NULL AS DOUBLE) AS measure
       |  FROM (
       |${timeframeCounts(cols, table, dateCol, days)(d)}
       |) t WHERE (latest_ct > 0) <> (prior_ct > 0)
       | ORDER BY detail LIMIT $LookupLimit""".stripMargin

  private def timeframeGainLookup(cols: String, concat: String, table: String,
                                  dateCol: String, days: Int): Dialect => String = d =>
    s"""SELECT $concat AS detail, CAST(NULL AS DOUBLE) AS measure
       |  FROM (
       |${timeframeCounts(cols, table, dateCol, days)(d)}
       |) t WHERE prior_ct > 0 AND latest_ct = 0
       | ORDER BY detail LIMIT $LookupLimit""".stripMargin

  /** Per-category distribution comparison (the dataset the JS divergence
    * aggregates over — what a user inspects on a shift alert). */
  private def distShiftLookup(category: String, table: String, subset: String,
                              matchSubset: String): Dialect => String = _ =>
    s"""SELECT CAST(category AS STRING) AS detail,
       |       ${round4d("new_pct - old_pct")} AS measure
       |  FROM (
       |  SELECT COALESCE(l.category, o.category) AS category,
       |         COALESCE(o.pct_of_total, 0.0000001) AS old_pct,
       |         COALESCE(l.pct_of_total, 0.0000001) AS new_pct
       |    FROM ( SELECT $category AS category,
       |                  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS pct_of_total
       |             FROM $table WHERE $subset GROUP BY $category ) l
       |    FULL JOIN ( SELECT $category AS category,
       |                  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS pct_of_total
       |             FROM $table WHERE $matchSubset GROUP BY $category ) o
       |      ON (l.category = o.category)
       |) t ORDER BY detail LIMIT $LookupLimit""".stripMargin

  private def dupeRowsLookup(cols: String, concat: String, table: String,
                             subset: String): Dialect => String = _ =>
    s"""SELECT $concat AS detail, CAST(COUNT(*) AS DOUBLE) AS measure
       |  FROM $table WHERE $subset GROUP BY $cols HAVING COUNT(*) > 1
       | ORDER BY measure DESC, detail LIMIT $LookupLimit""".stripMargin

  /** The instantiated suite over the driver testdata. */
  val tests: Seq[QueryTest] = Seq(
    countWrapper("Aggregate_Balance", "lineitem", "SUM(l_extendedprice) per order",
      0L, orderBalance(balanceMismatch),
      lookup = Some(orderBalanceLookup(balanceMismatch)),
      sparkInner = Some(orderBalanceSpark(balanceMismatch)),
      sparkLookup = Some(orderBalanceLookupSpark(balanceMismatch))),
    countWrapper("Aggregate_Minimum", "lineitem", "SUM(l_extendedprice) per order",
      0L, orderBalance(minimumMismatch),
      lookup = Some(orderBalanceLookup(minimumMismatch)),
      sparkInner = Some(orderBalanceSpark(minimumMismatch)),
      sparkLookup = Some(orderBalanceLookupSpark(minimumMismatch))),
    countWrapper("Aggregate_Balance_Percent", "lineitem", "SUM(l_extendedprice) per order",
      0L, orderBalance(pctMismatch(-5, 5)),
      lookup = Some(orderBalanceLookup(pctMismatch(-5, 5))),
      sparkInner = Some(orderBalanceSpark(pctMismatch(-5, 5))),
      sparkLookup = Some(orderBalanceLookupSpark(pctMismatch(-5, 5)))),
    countWrapper("Aggregate_Balance_Range", "lineitem", "SUM(l_extendedprice) per order",
      0L, orderBalance(rangeMismatch(-100, 100)),
      lookup = Some(orderBalanceLookup(rangeMismatch(-100, 100))),
      sparkInner = Some(orderBalanceSpark(rangeMismatch(-100, 100))),
      sparkLookup = Some(orderBalanceLookupSpark(rangeMismatch(-100, 100)))),
    countWrapper("Combo_Match", "customer", "c_nationkey",
      0L, comboInner("c_nationkey", "customer", "1=1",
        "n_nationkey", "nation", "1=1"),
      lookup = Some(comboLookup("c_nationkey",
        d => s"CAST(c_nationkey AS ${d.textType})",
        "customer", "1=1", "n_nationkey", "nation", "1=1"))),
    countWrapper("Timeframe_Combo_Match", "lineitem", "l_returnflag,l_linestatus",
      0L, timeframeInner("l_returnflag, l_linestatus", "lineitem", "l_shipdate", 90),
      lookup = Some(timeframeLookup("l_returnflag, l_linestatus",
        "l_returnflag || '|' || l_linestatus", "lineitem", "l_shipdate", 90))),
    countWrapper("Timeframe_Combo_Gain", "lineitem", "l_returnflag,l_linestatus",
      0L, timeframeGainInner("l_returnflag, l_linestatus", "lineitem", "l_shipdate", 90),
      lookup = Some(timeframeGainLookup("l_returnflag, l_linestatus",
        "l_returnflag || '|' || l_linestatus", "lineitem", "l_shipdate", 90))),
    distributionShift("distribution_shift", "o_orderpriority", "orders",
      "o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'",
      "o_orderdate < TIMESTAMP '1999-01-01 00:00:00'", 0.25)
      .copy(lookup = Some(distShiftLookup("o_orderpriority", "orders",
        "o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'",
        "o_orderdate < TIMESTAMP '1999-01-01 00:00:00'"))),
    countWrapper("Dupe_Rows", "orders", "o_custkey,o_orderdate",
      0L, dupeRowsInner("o_custkey, o_orderdate", "orders", "1=1"),
      noun = "duplicate row(s)", measure = "CAST(dupe_total AS DOUBLE)",
      lookup = Some(dupeRowsLookup("o_custkey, o_orderdate",
        "CAST(o_custkey AS STRING) || '|' || CAST(CAST(o_orderdate AS DATE) AS STRING)",
        "orders", "1=1"))),
    // CUSTOM test type: user-supplied SQL returning error rows, wrapped
    // in the standard count contract (test_types_CUSTOM.yaml template).
    countWrapper("CUSTOM", "lineitem", "l_discount,l_tax",
      0L, _ =>
        s"""SELECT COUNT(*) AS cnt FROM (
           |  SELECT l_orderkey FROM lineitem
           |   WHERE l_discount < 0 OR l_discount > 0.5 OR l_tax < 0
           |) custom_errors""".stripMargin,
      // CUSTOM lookup = the user's error rows themselves
      lookup = Some(d =>
        s"""SELECT CAST(l_orderkey AS ${d.textType}) AS detail,
           |       CAST(NULL AS DOUBLE) AS measure
           |  FROM lineitem
           | WHERE l_discount < 0 OR l_discount > 0.5 OR l_tax < 0
           | ORDER BY detail LIMIT $LookupLimit""".stripMargin))
  )

  /** All query-test drill-downs unioned into one uniform relation.
    * The Spark dialect takes each test's engine lookup rendering when
    * one exists (row-identical by construction; the oracle keeps the
    * reference shape). */
  def lookupAllSql(d: Dialect): String = {
    val parts = tests.flatMap { t =>
      val chosen =
        if (d == SparkDialect) t.sparkLookup.orElse(t.lookup) else t.lookup
      chosen.map { lk =>
        s"""SELECT '${t.name}' AS test_type, detail, measure
           |  FROM (${lk(d)}) lk""".stripMargin
      }
    }
    parts.mkString("", "\nUNION ALL\n",
      "\nORDER BY test_type, detail, measure")
  }

  def runLookupAll(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Tables.registerAll(spark, dir)
    spark.sql(lookupAllSql(SparkDialect))
  }

  def duckLookupAllSql(): String = lookupAllSql(DuckDialect)

  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.core.Tables.registerAll(spark, dir)
    val t = tests.find(_.name == name).get
    spark.sql(t.sparkSql.getOrElse(t.sql)(SparkDialect))
  }

  def duckSql(name: String): String =
    tests.find(_.name == name).get.sql(DuckDialect)
}
