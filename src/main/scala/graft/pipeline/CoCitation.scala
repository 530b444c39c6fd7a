package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.oracle.{Dialect, DuckDialect, SparkDialect}

/** Co-citation domain similarity over the [[DomainRank]] site graph —
  * the third member of the link-graph family: two sites are related
  * when the SAME sources cite both (co-citation, the classic
  * link-structure similarity used for related-domain discovery and
  * crawl-frontier grouping). Where [[DomainRank]] ranks by mass and
  * [[Harmonic]] by distance, this scores PAIRS:
  * `cocite(u,v) = |{w : w→u ∧ w→v}|`, normalized by the in-neighbor
  * Jaccard `cocite/(in(u)+in(v)-cocite)` in integer micro-units.
  *
  * Scale shape: one self-join of the distinct-edge relation on its
  * SOURCE key. A source of out-degree k contributes C(k,2) pairs, so
  * — exactly like the shingle hubs in `dedup_jaccard` — hub sources
  * are cut at [[HubOutDegree]] before the join (a mega-portal citing
  * everything asserts nothing about relatedness; the standard
  * co-citation practice, and the cutoff is reported as data in the
  * `hub_ct` column of every row). Candidate mass is then
  * Σ C(min(k,H),2) — output-linear in the edge count at fixed H,
  * never |V|². In-degrees and the pair relation live at host grain
  * (hosts ≪ docs); the corpus is never touched — the graph lands once
  * per session ([[Harmonic.landedPairs]]) and this entry reads it.
  * Pairs below [[MinCocite]] shared citers are noise and dropped.
  */
object CoCitation {

  /** Sources with out-degree above this are excluded from pairing —
    * the `dedup_jaccard` hub-cutoff pattern at source grain. */
  val HubOutDegree = 256
  /** Minimum shared citers for a pair to be reported. */
  val MinCocite = 2
  /** Micro-unit scale shared with [[DomainRank.MicroBase]]. */
  val MicroBase = 1000000L

  /** The pair tail over a distinct-edge relation `epRel(src, dst)`:
    * hub census → filtered edges → in-degrees → source self-join →
    * integer Jaccard report. `hub_ct` (how many sources the cutoff
    * removed) rides every row so the filtered-graph semantics are
    * visible in the result, not a silent cap. */
  private[graft] def cocitationTail(epRel: String)(d: Dialect): String =
    s"""deg AS (
       |  SELECT src, COUNT(*) AS outd FROM $epRel GROUP BY src
       |),
       |hub AS (
       |  SELECT COUNT(*) AS hub_ct FROM deg WHERE outd > $HubOutDegree
       |),
       |pe AS ${d.cteMaterialized}(
       |  SELECT e.src, e.dst FROM $epRel e
       |    JOIN deg g ON g.src = e.src
       |   WHERE g.outd <= $HubOutDegree
       |),
       |ind AS (
       |  SELECT dst, COUNT(*) AS ind FROM pe GROUP BY dst
       |),
       |cc AS (
       |  SELECT e1.dst AS site_a, e2.dst AS site_b, COUNT(*) AS cocite_ct
       |    FROM pe e1 JOIN pe e2
       |      ON e1.src = e2.src AND e1.dst < e2.dst
       |   GROUP BY e1.dst, e2.dst
       |  HAVING COUNT(*) >= $MinCocite
       |)
       |SELECT c.site_a, c.site_b,
       |       CAST(c.cocite_ct AS BIGINT) AS cocite_ct,
       |       CAST(ia.ind AS BIGINT) AS in_a,
       |       CAST(ib.ind AS BIGINT) AS in_b,
       |       CAST(${d.intDiv(s"c.cocite_ct * $MicroBase",
                              "ia.ind + ib.ind - c.cocite_ct")} AS BIGINT)
       |         AS jaccard_micro,
       |       CAST(h.hub_ct AS BIGINT) AS hub_ct
       |  FROM cc c
       |  JOIN ind ia ON ia.dst = c.site_a
       |  JOIN ind ib ON ib.dst = c.site_b
       |  CROSS JOIN hub h
       | ORDER BY cocite_ct DESC, site_a, site_b""".stripMargin

  def cocitationSql(table: String, nSrcOverride: Option[Long] = None)
                   (d: Dialect): String = {
    val nSrc = nSrcOverride.map(_.toString).getOrElse(
      s"SELECT COUNT(DISTINCT source) FROM $table")
    s"""WITH ${DomainRank.graphCtes(table, nSrc)(d)},
       |ep AS ${d.cteMaterialized}(
       |  SELECT DISTINCT src, dst FROM edges
       |),
       |${cocitationTail("ep")(d)}""".stripMargin
  }

  /** Engine path over the session's landed distinct-edge relation. */
  def runCocitation(spark: SparkSession, dir: String): DataFrame = {
    val (_, pv) = Harmonic.landedPairs(spark, dir)
    spark.sql(s"WITH ${cocitationTail(pv)(SparkDialect)}")
  }

  def duckSql(): String = cocitationSql("documents")(DuckDialect)
}
