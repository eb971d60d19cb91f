package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{functions => sf}

/** Count–Min sketch: the fixed-memory frequency estimator that
  * complements the exact-recount Misra–Gries pipeline
  * ([[CorpusStats.heavyHitterTerms]]). MG answers "which items are
  * frequent"; CM answers point queries "about how often did X occur"
  * for ARBITRARY items after one pass, in width·depth longs of state —
  * the shape needed for per-key rate limiting, join-size estimation,
  * and streaming frequency monitors where the query set is unknown
  * until after the scan.
  *
  * Estimates never undercount (every cell an item hashes to receives
  * all of its increments, plus collisions); with width w and depth d
  * the overcount exceeds 2n/w with probability at most 2^-d (Cormode &
  * Muthukrishnan 2005, via Markov on each row's independent collision
  * mass).
  *
  * Scale/determinism shape: the buffer is a flat `Array[Long]` of
  * width·depth cells; `reduce` touches d cells, `merge` is elementwise
  * addition — associative and commutative, so map-side partials and
  * ANY merge tree give the bit-identical sketch, independent of
  * partitioning. Row hashes are splitmix64 finalizations of
  * (itemHash + row), cheap and dependency-free.
  */
object Sketch {

  private[operators] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Cell index of `itemHash` in sketch row `row` (width `w`). */
  private[operators] def cell(itemHash: Long, row: Int, w: Int): Int =
    (java.lang.Long.remainderUnsigned(mix64(itemHash + row), w)).toInt

  class CountMinAgg(width: Int, depth: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(width >= 1, s"width must be >= 1, got $width")
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    def zero: Array[Long] = new Array[Long](width * depth)
    def reduce(buf: Array[Long], itemHash: Long): Array[Long] = {
      var r = 0
      while (r < depth) {
        buf(r * width + cell(itemHash, r, width)) += 1L
        r += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** One-pass sketch of `col`'s value frequencies (values identified by
    * `xxhash64`, the house item-identity convention). The returned
    * array is the row-major width·depth cell grid. */
  def countMin(df: DataFrame, col: Column, width: Int, depth: Int): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(sf.xxhash64(col).as("h")).as[Long]
      .select(new CountMinAgg(width, depth).toColumn)
      .head()
  }

  /** Point estimate for the value whose xxhash64 is `itemHash`:
    * min over the d cells the item hashes to — an UPPER bound on the
    * true count, tight up to collision mass. */
  def estimate(sketch: Array[Long], width: Int, depth: Int, itemHash: Long): Long = {
    require(sketch.length == width * depth,
      s"sketch length ${sketch.length} != width*depth ${width * depth}")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sketch(r * width + cell(itemHash, r, width))
      if (v < best) best = v
      r += 1
    }
    best
  }
}
