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
}
