package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{functions => sf}

/** Bloom-filter runtime prefilter for semi/anti joins — the
  * "build a filter on the small side, drop big-side rows at scan
  * speed" pattern (the explicit, any-source form of the runtime
  * filters engines inject for shuffle joins; cf. Spark's own
  * `spark.sql.optimizer.runtimeFilter.bloomFilter`).
  *
  * The filter is built DISTRIBUTED (a combinable typed Aggregator whose
  * partial buffers OR together), then carried to the big side as a plan
  * literal of `numBits/64` longs — bounded by construction (`numBits`,
  * capped at 64 MiB), never by data volume, exactly like the IVF
  * codebook literal. The membership probe is pure built-in column
  * arithmetic (`element_at` + `getbit`), stays inside whole-stage
  * codegen, and reaches the scan as a regular filter.
  *
  * A Bloom positive may be false (P = (1-e^(-kn/m))^k), a negative never
  * is, so:
  *  - SEMI join: bloom-negative rows are safely dropped; positives are
  *    exact-verified by the real join. Result exact; shuffle carries
  *    only the survivors.
  *  - ANTI join: bloom-negative rows are kept DIRECTLY (no join at
  *    all); only positives go through the exact anti join. Result
  *    exact; the join input shrinks to the (tiny) positive slice.
  *
  * Hashing: h1/h2 = xxhash64 with distinct salts, both folded to 31
  * bits (pmod 2^31, h2 forced odd) before the double-hashing combine
  * h1f + j·h2f — max value < 2^35, so the arithmetic never overflows a
  * long in either the JVM builder or the ANSI-mode column probe, and
  * the two sides agree bit-for-bit (BloomSpec pins no-false-negatives).
  */
object Bloom {

  /** Raw 64-bit key hashes, pre-fold (builder input). */
  case class HashPair(h1: Long, h2: Long)

  /** h1/h2 column pair for a key column — the single definition both
    * the builder aggregation and the probe use. */
  private def hashCols(key: Column): (Column, Column) =
    (sf.xxhash64(key), sf.xxhash64(sf.lit("graft_bloom"), key))

  private val Fold = 2147483648L // 2^31

  /** j-th bit index, JVM side. Must mirror `bitIndexCol`. */
  private def bitIndex(h1: Long, h2: Long, j: Int, numBits: Int): Int = {
    val h1f = ((h1 % Fold) + Fold) % Fold
    val h2f = (((h2 % Fold) + Fold) % Fold) | 1L
    ((h1f + j * h2f) % numBits).toInt
  }

  /** j-th bit index, column side. Must mirror `bitIndex`. */
  private def bitIndexCol(h1: Column, h2: Column, j: Int, numBits: Int): Column =
    (sf.pmod(h1, sf.lit(Fold)) +
      sf.lit(j) * (sf.pmod(h2, sf.lit(Fold)).bitwiseOR(sf.lit(1L)))) % numBits

  /** Combinable Bloom builder: partial bit arrays OR together, so the
    * build is one map-side-combined pass over the key column — the
    * shuffle carries at most `partitions` buffers of numBits/64 longs. */
  class BloomAgg(numBits: Int, numHashes: Int)
      extends Aggregator[HashPair, Array[Long], Array[Long]] {
    require(numBits > 0 && numBits % 64 == 0 && numBits <= (1 << 29),
      s"numBits must be a positive multiple of 64 <= 2^29 (64 MiB), got $numBits")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1, 16], got $numHashes")
    def zero: Array[Long] = new Array[Long](numBits >> 6)
    def reduce(b: Array[Long], a: HashPair): Array[Long] = {
      var j = 0
      while (j < numHashes) {
        val i = bitIndex(a.h1, a.h2, j, numBits)
        b(i >> 6) |= 1L << (i & 63)
        j += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /** Build the filter over `keys`'s `keyCol` values. The only driver
    * materialization is the finished numBits-bit array. */
  def build(keys: DataFrame, keyCol: String, numBits: Int,
            numHashes: Int = 4): Array[Long] = {
    val spark = keys.sparkSession
    import spark.implicits._
    val (h1, h2) = hashCols(sf.col(keyCol))
    keys.select(h1.as("h1"), h2.as("h2")).as[HashPair]
      .select(new BloomAgg(numBits, numHashes).toColumn)
      .head()
  }

  /** Membership probe column: true iff every probed bit is set. False
    * negatives are impossible for inserted keys. */
  def mightContain(key: Column, bits: Array[Long], numHashes: Int = 4): Column = {
    val numBits = bits.length * 64
    val lit = sf.lit(bits)
    val (h1, h2) = hashCols(key)
    (0 until numHashes).map { j =>
      val idx = bitIndexCol(h1, h2, j, numBits) // long in [0, numBits)
      // integer word index: idx div 64 (Column `/` is double division)
      val word = sf.floor(idx / sf.lit(64L)).cast("int")
      sf.call_function("getbit",
        sf.element_at(lit, word + 1), (idx % 64).cast("int")) === 1
    }.reduce(_ && _)
  }

  /** Exact left-semi join with a Bloom prefilter on the big side:
    * negatives drop at scan speed, positives are verified by the real
    * join — the shuffle (or broadcast probe) sees survivors only. */
  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String,
               smallKey: String, numBits: Int = 1 << 20,
               numHashes: Int = 4): DataFrame = {
    val bits = build(small, smallKey, numBits, numHashes)
    big.filter(mightContain(sf.col(bigKey), bits, numHashes))
      .join(small.select(sf.col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }

  /** Exact left-anti join, Bloom-accelerated: bloom-negative rows are
    * DEFINITELY absent from `small` and bypass the join entirely; only
    * the positive slice pays the exact anti join. */
  def antiJoin(big: DataFrame, small: DataFrame, bigKey: String,
               smallKey: String, numBits: Int = 1 << 20,
               numHashes: Int = 4): DataFrame = {
    val bits = build(small, smallKey, numBits, numHashes)
    val contains = mightContain(sf.col(bigKey), bits, numHashes)
    val definiteMiss = big.filter(!contains)
    val candidates = big.filter(contains)
      .join(small.select(sf.col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_anti")
    definiteMiss.unionAll(candidates)
  }
}
