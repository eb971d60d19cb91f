package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{functions => sf}
import graft.{functions => gf}

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

  /** k-bounded min-k Aggregator over already-hashed longs with
    * in-buffer dedup: keeps the k SMALLEST DISTINCT values sorted
    * ascending. reduce is one binary-search membership probe + sorted
    * insert (common case: reject above the k-th, zero allocation);
    * merge is a linear dedup-merge of two sorted buffers. Map-side
    * partials never exceed k entries and duplicates collapse BEFORE
    * the shuffle, so no distinct pre-shuffle exists in the plan —
    * the property that makes the KMV scan one pass at any scale. */
  class MinKAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")
    def zero: Seq[Long] = Nil
    def reduce(b: Seq[Long], x: Long): Seq[Long] = {
      if (b.length >= k && x >= b.last) b
      else {
        val out = Vector.newBuilder[Long]
        var inserted = false
        var dup = false
        var kept = 0
        val it = b.iterator
        while (it.hasNext && kept < k && !dup) {
          val e = it.next()
          if (e == x) dup = true
          else {
            if (!inserted && x < e) { out += x; kept += 1; inserted = true }
            if (kept < k) { out += e; kept += 1 }
          }
        }
        if (dup) b
        else {
          while (it.hasNext && kept < k) { out += it.next(); kept += 1 }
          if (!inserted && kept < k) out += x
          out.result()
        }
      }
    }
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      val out = Vector.newBuilder[Long]
      val ia = a.iterator.buffered
      val ib = b.iterator.buffered
      var n = 0
      var last = Long.MinValue
      var first = true
      while (n < k && (ia.hasNext || ib.hasNext)) {
        val v = if (!ib.hasNext) ia.next()
                else if (!ia.hasNext) ib.next()
                else if (ib.head < ia.head) ib.next()
                else ia.next()
        if (first || v != last) { out += v; n += 1; last = v; first = false }
      }
      out.result()
    }
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** KMV (k-minimum-values, Bar-Yossef et al. 2002 / Beyer et al.
    * SIGMOD 2007) distinct-cardinality and SET-OPERATION estimates
    * between every pair of sets — the sketch that answers "how many
    * distinct users does each segment have, how many do segments A
    * and B SHARE, and what's their Jaccard" from ONE pass holding k
    * longs per set, where the exact answer needs a full distinct
    * shuffle per question. HLL (row 54) only unions; KMV's uniform
    * minima support INTERSECTIONS: K(A ∪ B) = the k smallest of
    * K(A) ∪ K(B), and the share of union-sketch members present in
    * both sides estimates Jaccard (Beyer's ρ), so est_intersection =
    * ρ · est_union.
    *
    * Estimator: with h_k the k-th smallest of D distinct uniform
    * hashes on [0, M), est = (k−1)·M/h_k (unbiased); a set with
    * FEWER than k distinct hashes is stored exactly and its estimate
    * IS its size — both branches pinned 1e-4. The output carries the
    * exact distinct/Jaccard/intersection columns beside every
    * estimate as the certification twin (the row 54 convention:
    * exactness is checked at gate scale, the sketch is what survives
    * 100 TB).
    *
    * Determinism: the hash is the row 105 multiply-shift (sampleHash
    * — uniform, overflow-safe, engine-replayable); min-k sets are
    * value-defined (no ties: values are distinct by construction);
    * every estimate is one pinned double division of exact integers.
    *
    * Scale shape: ONE map-side-combinable min-k pass (MinKAgg dedups
    * in-buffer — no distinct pre-shuffle) + set-level array algebra
    * on broadcast-sized k-vectors; the exact certification columns
    * are the only corpus-sized joins and drop out of the 100 TB call
    * path (`withExact = false`). */
  def kmvSetOverlap(df: DataFrame, setCol: String, itemCol: String,
                    k: Int = 64, withExact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val M = 4294967296.0 // the sampleHash range, 2^32
    val raw = df.filter(sf.col(setCol).isNotNull && sf.col(itemCol).isNotNull)
      .select(sf.col(setCol).cast("string").as("s"), sf.col(itemCol).as("i"))
    val rows = raw.select(sf.col("s"), Similarity.sampleHash(sf.col("i")).as("h"))
    // Exact columns come from RAW item values, never from sampleHash:
    // the hash truncates ids mod 2^31 before the multiply, so two ids
    // congruent mod 2^31 are guaranteed collisions — hash-distinct
    // counts would silently diverge from true distincts on large or
    // adversarial id domains (fine for the ESTIMATES, wrong for the
    // certification twin).
    lazy val itemsEx = raw.distinct()
      .localCheckpoint(true) // exact counts + both intersection sides read it
    val minks = rows.as[(String, Long)].groupByKey(_._1)
      .mapValues(_._2).agg(new MinKAgg(k).toColumn.name("mk"))
      .toDF("s", "mk")
    def estOf(arr: Column, nDistinctHashes: Column): Column =
      sf.when(nDistinctHashes < k, nDistinctHashes.cast("double"))
        .otherwise(gf.roundAt(sf.lit((k - 1).toDouble * M) /
          sf.element_at(arr, k).cast("double"), 4))
    val perSet0 = minks.select(sf.col("s"), sf.col("mk"),
      estOf(sf.col("mk"), sf.size(sf.col("mk"))).as("est_distinct"))
    val perSet = (if (withExact) {
      val exact = itemsEx.groupBy("s")
        .agg(sf.count(sf.lit(1)).as("exact_distinct"))
      perSet0.join(exact, "s")
    } else perSet0.withColumn("exact_distinct", sf.lit(null).cast("long")))
      .localCheckpoint(true) // both sides of the pair cross read it
    val pairs = perSet.select(sf.col("s").as("set_a"), sf.col("mk").as("ka"),
        sf.col("est_distinct").as("est_distinct_a"),
        sf.col("exact_distinct").as("exact_distinct_a"))
      .crossJoin(sf.broadcast(perSet.select(sf.col("s").as("set_b"),
        sf.col("mk").as("kb"), sf.col("est_distinct").as("est_distinct_b"),
        sf.col("exact_distinct").as("exact_distinct_b"))))
      .filter(sf.col("set_a") < sf.col("set_b"))
      // union sketch: k smallest of the merged distinct minima
      .withColumn("ku", sf.slice(sf.array_sort(
        sf.array_union(sf.col("ka"), sf.col("kb"))), 1, k))
      // rho: union-sketch members present in BOTH side sketches
      .withColumn("__c", sf.size(sf.array_intersect(
        sf.array_intersect(sf.col("ku"), sf.col("ka")), sf.col("kb"))))
      .withColumn("__nu", sf.size(sf.col("ku")))
      .withColumn("est_union",
        sf.when(sf.col("__nu") < k, sf.col("__nu").cast("double"))
          .otherwise(gf.roundAt(sf.lit((k - 1).toDouble * M) /
            sf.element_at(sf.col("ku"), k).cast("double"), 4)))
      .withColumn("est_jaccard",
        gf.roundAt(sf.col("__c").cast("double") / sf.col("__nu").cast("double"), 6))
      .withColumn("est_intersection",
        gf.roundAt(sf.col("__c").cast("double") * sf.col("est_union") /
          sf.col("__nu").cast("double"), 4))
    val out = if (withExact) {
      val inter = itemsEx.select(sf.col("s").as("__ia"), sf.col("i").as("__va"))
        .join(itemsEx.select(sf.col("s").as("__ib"), sf.col("i").as("__vb")),
          sf.col("__va") === sf.col("__vb") && sf.col("__ia") < sf.col("__ib"))
        .groupBy(sf.col("__ia"), sf.col("__ib"))
        .agg(sf.count(sf.lit(1)).as("exact_intersection"))
      pairs.join(inter, sf.col("set_a") === sf.col("__ia") &&
          sf.col("set_b") === sf.col("__ib"), "left")
        .withColumn("exact_intersection",
          sf.coalesce(sf.col("exact_intersection"), sf.lit(0L)))
        .withColumn("exact_jaccard", gf.roundAt(
          sf.col("exact_intersection").cast("double") /
            (sf.col("exact_distinct_a") + sf.col("exact_distinct_b") -
              sf.col("exact_intersection")).cast("double"), 6))
    } else pairs
      .withColumn("exact_intersection", sf.lit(null).cast("long"))
      .withColumn("exact_jaccard", sf.lit(null).cast("double"))
    out.select(sf.col("set_a"), sf.col("set_b"), sf.lit(k).as("k_used"),
        sf.col("est_distinct_a"), sf.col("exact_distinct_a"),
        sf.col("est_distinct_b"), sf.col("exact_distinct_b"),
        sf.col("est_jaccard"), sf.col("exact_jaccard"),
        sf.col("est_intersection"), sf.col("exact_intersection"))
      .orderBy("set_a", "set_b")
  }
}
