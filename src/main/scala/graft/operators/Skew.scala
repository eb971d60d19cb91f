package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => sf}

/** Skew mitigation for shuffle joins. AQE's skew-join handling covers
  * sort-merge joins at runtime; explicit salting is the declarative
  * fallback when a handful of hot keys dominate (power-law fact keys)
  * or when AQE is unavailable (streaming joins, forced shuffle-hash).
  *
  * `saltedJoin` splits every hot key into `saltFactor` sub-keys: the
  * big side gets a random-but-deterministic salt per row, the small
  * side is exploded saltFactor-fold. Join output is identical to the
  * unsalted join; the shuffle partitions for a hot key shrink by
  * 1/saltFactor.
  */
object Skew {

  /** Inner equi-join of `big` and `small` on bigKey == smallKey with
    * `saltFactor`-way salting. Deterministic: the salt is a hash of the
    * big side's whole row key plus a monotonic disambiguator is NOT
    * needed — any per-row spread works, we use pmod(hash of all big
    * key cols + a uniform row hash), so repeated runs produce identical
    * partitioning. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 saltFactor: Int = 8, spreadCol: Option[Column] = None): DataFrame = {
    val salt = spreadCol.getOrElse(sf.pmod(sf.hash(big.columns.map(sf.col).toIndexedSeq: _*),
      sf.lit(saltFactor)))
    val bigS = big.withColumn("__salt", salt)
    val smallS = small.withColumn("__salt",
      sf.explode(sf.sequence(sf.lit(0), sf.lit(saltFactor - 1))))
    bigS.join(smallS,
        bigS(bigKey) === smallS(smallKey) && bigS("__salt") === smallS("__salt"))
      .drop("__salt")
  }

  /** `saltedJoin` restricted to the keys that actually skew: keys whose
    * big-side frequency exceeds `hotKeyThreshold` are salted, everything
    * else takes the plain equi-join. Where `saltedJoin` replicates the
    * ENTIRE small side `saltFactor`-fold (a 100 TB small side becomes
    * saltFactor x 100 TB of shuffle), here the explode is bounded by
    * |hot keys| x saltFactor rows — and |hot keys| <= n/hotKeyThreshold
    * by definition, so the hot set always broadcasts.
    *
    * Cost: one extra partial-aggregated pass over `big` for the
    * frequency count (output: one row per key over threshold). Callers
    * that already know their hot keys (historical stats, a heavy-hitter
    * sketch) pass them via `hotKeys` (single-column DataFrame) and skip
    * that pass. Inner-join semantics, output identical to the unsalted
    * join. */
  def saltedJoinHotKeys(big: DataFrame, small: DataFrame,
                        bigKey: String, smallKey: String,
                        saltFactor: Int = 8, hotKeyThreshold: Long = 1000000L,
                        hotKeys: Option[DataFrame] = None,
                        spreadCol: Option[Column] = None): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(hotKeyThreshold >= 1, "hotKeyThreshold must be >= 1")
    val hot = sf.broadcast(hotKeys.getOrElse(
      big.groupBy(sf.col(bigKey)).agg(sf.count(sf.lit(1)).as("__freq"))
        .filter(sf.col("__freq") > hotKeyThreshold)
        .select(sf.col(bigKey))).toDF("__hotkey"))
    def split(df: DataFrame, key: String): (DataFrame, DataFrame) = (
      df.join(hot, df(key) === sf.col("__hotkey"), "left_semi"),
      df.join(hot, df(key) === sf.col("__hotkey"), "left_anti"))
    val (bigHot, bigCold) = split(big, bigKey)
    val (smallHot, smallCold) = split(small, smallKey)
    saltedJoin(bigHot, smallHot, bigKey, smallKey, saltFactor, spreadCol)
      .unionByName(bigCold.join(smallCold,
        bigCold(bigKey) === smallCold(smallKey)))
  }
}
