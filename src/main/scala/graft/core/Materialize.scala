package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Land a shared relation behind a temp view for plan reuse.
  *
  * Metadata-sized relations (one row per column / per test / per
  * source) collect to a LocalRelation: every consumer sees a
  * LocalTableScan — zero scan, truncated plan (the repo's
  * landed-relation discipline). The "metadata-sized" claim is ENFORCED
  * here, not assumed (guide §5: the driver should do almost no data
  * work): the collect is capped, and a relation that outgrows the cap
  * falls back to a distributed `localCheckpoint` — same reuse
  * semantics for consumers, no unbounded driver collect.
  */
object Materialize {

  /** Default row cap for a driver-side LocalRelation. Every relation
    * landed this way is a few hundred rows at any SF (one row per
    * column / per test type / per source); the cap is ~3 orders of
    * magnitude above that and well inside driver heap for the narrow
    * schemas involved. */
  val DefaultCap = 1000000

  /** Materialize `df` behind `view`: LocalRelation when it fits under
    * `cap` rows, distributed localCheckpoint otherwise (with a stderr
    * note — a metadata-sized relation crossing the cap is a modeling
    * surprise worth surfacing, not an error). Returns `view`. */
  def localView(spark: SparkSession, df: DataFrame, view: String,
                cap: Int = DefaultCap): String = {
    // one probe action: all rows when under the cap, cap+1 as the
    // tripwire signal otherwise
    val probe = df.limit(cap + 1).collect()
    if (probe.length > cap) {
      System.err.println(
        s"[graft] $view exceeded the $cap-row LocalRelation cap; " +
          "falling back to a distributed localCheckpoint")
      df.localCheckpoint(eager = true).createOrReplaceTempView(view)
    } else {
      spark.createDataFrame(java.util.Arrays.asList(probe: _*), df.schema)
        .createOrReplaceTempView(view)
    }
    view
  }
}
