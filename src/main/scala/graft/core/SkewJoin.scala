package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted joins for skewed keys — the manual complement to AQE's
  * skew-split: AQE only rebalances SORT-MERGE join partitions at
  * runtime; when the hot key feeds a shuffled hash join, a grouped
  * aggregate, or a stream-static join, one task still receives the
  * whole hot key's rows. Salting rewrites the join so the hot side's
  * key fans out over `salt` sub-keys (a deterministic per-row draw)
  * and the dimension side replicates `salt` ways — every sub-key is a
  * 1/salt slice, so the straggler task disappears at the cost of
  * replicating the (small) dimension rows.
  *
  * The salt draw hashes the SKEWED side's whole row (`xxhash64` over
  * all columns) rather than using `rand()` — re-running the job, or
  * recomputing a lost partition at 100 TB, lands every row in the same
  * sub-key, so the join is deterministic and retry-safe (a `rand()`
  * salt changes answers under partition replay for non-deduplicating
  * consumers).
  *
  * `saltedJoin` salts EVERY key (uniform fan-out — right when the key
  * histogram is unknown); `saltedJoinHot` salts only the keys listed
  * as hot and routes the rest through the plain 1-sub-key path, so the
  * dimension side replicates only for the keys that need it — the
  * standard two-tier treatment when a key histogram (e.g. from
  * `FreqProfiler`) is available.
  */
object SkewJoin {

  private def saltCol(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int")

  /** Inner-join `big` (skewed) to `small` (dimension) on `key`,
    * fanning every key over `salt` sub-keys. Row-multiset-identical to
    * the plain join (SkewJoinSpec). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    val b = big.withColumn("__salt", saltCol(big, salt))
    val s = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    b.join(s, b(key) === s(key) && b("__salt") === s("__salt"))
      .drop(s(key)).drop(b("__salt")).drop(s("__salt"))
  }

  /** Two-tier salted join: keys in `hotKeys` fan out `salt` ways, all
    * other keys keep one sub-key (salt 0) — the dimension side grows by
    * only `hotKeys.size * (salt - 1)` rows. */
  def saltedJoinHot(big: DataFrame, small: DataFrame, key: String,
                    hotKeys: Seq[Any], salt: Int = 16): DataFrame = {
    if (hotKeys.isEmpty) return big.join(small, Seq(key))
    val hot = array(hotKeys.map(lit): _*)
    val b = big.withColumn("__salt",
      when(array_contains(hot, col(key)), saltCol(big, salt)).otherwise(lit(0)))
    val s = small.withColumn("__salt",
      explode(when(array_contains(hot, col(key)),
        array((0 until salt).map(lit): _*)).otherwise(array(lit(0)))))
    b.join(s, b(key) === s(key) && b("__salt") === s("__salt"))
      .drop(s(key)).drop(b("__salt")).drop(s("__salt"))
  }

  /** The hot-key list itself: keys holding more than `threshold` of the
    * rows — the FreqProfiler-shaped scan a caller runs once before
    * picking the two-tier path. */
  def hotKeys(df: DataFrame, key: String, threshold: Double = 0.01): Seq[Any] = {
    val total = df.count().toDouble
    df.groupBy(col(key)).count()
      .where(col("count") > lit(threshold * total))
      .select(col(key)).collect().map(_.get(0)).toIndexedSeq
  }
}
