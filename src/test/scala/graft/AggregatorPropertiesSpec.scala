package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusStats, Sampling, Similarity}

/** Merge-tree property tests for the typed Aggregators whose 100 TB
  * claims rest on being COMBINABLE: partial buffers reduced in any
  * partition split and merged in any tree order must produce the same
  * final answer (CapAgg, TopKAgg — exact), or an answer whose
  * guarantee survives (Misra-Gries — heavy-hitter superset). Seeded
  * random inputs, random splits, random merge association: exactly
  * the degrees of freedom Spark's partial aggregation exercises.
  */
class AggregatorPropertiesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260813)

  /** Split `xs` into 1..maxParts runs, reduce each, merge in a random
    * binary-tree order. */
  private def mergeTree[A, B](xs: Seq[A], zero: B, reduce: (B, A) => B,
                              merge: (B, B) => B): B = {
    val nParts = 1 + rnd.nextInt(6)
    val parts = xs.grouped(math.max(1, xs.size / nParts + 1)).toBuffer
    var bufs = parts.map(p => p.foldLeft(zero)(reduce))
    if (bufs.isEmpty) bufs += zero
    while (bufs.size > 1) {
      val i = rnd.nextInt(bufs.size - 1)
      val merged = merge(bufs(i), bufs(i + 1))
      bufs.remove(i + 1)
      bufs(i) = merged
    }
    bufs.head
  }

  test("CapAgg: any merge tree equals the sorted-take model (200 cases)") {
    for (_ <- 1 to 200) {
      val cap = 1 + rnd.nextInt(8)
      val rows = Seq.fill(rnd.nextInt(40))(
        Sampling.CapRow("k", rnd.nextInt(1000).toLong, rnd.nextInt(20).toLong))
      val agg = new Sampling.CapAgg(cap)
      val got = agg.finish(mergeTree(rows, agg.zero, agg.reduce, agg.merge))
      val want = rows.map(r => (r.h, r.id)).sorted.take(cap)
      assert(got == want, s"cap=$cap rows=${rows.take(8)}")
    }
  }

  test("TopKAgg: any merge tree equals the sort-by-(-cos, id) model (200 cases)") {
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(6)
      val rows = Seq.fill(rnd.nextInt(40))(Similarity.Scored(0L,
        rnd.nextInt(1000).toLong, (rnd.nextInt(9) + 1) / 10.0)) // ties likely
      val agg = new Similarity.TopKAgg(k)
      val got = agg.finish(mergeTree(rows, agg.zero, agg.reduce, agg.merge))
      // model over the same multiset: k best under (cos desc, id asc)
      val want = rows.map(r => (r.cosine, r.nId))
        .sortBy { case (c, id) => (-c, id) }.take(k)
      assert(got == want, s"k=$k got=$got want=$want rows=${rows.take(8)}")
    }
  }

  test("MisraGries: heavy hitters survive any merge tree (100 cases)") {
    for (_ <- 1 to 100) {
      val capacity = 2 + rnd.nextInt(8)
      // skewed stream: a few hot tokens + noise tail
      val hot = Seq.fill(3)(s"hot${rnd.nextInt(3)}")
      val stream = Seq.fill(30 + rnd.nextInt(200))(
        if (rnd.nextInt(3) > 0) hot(rnd.nextInt(hot.size))
        else s"t${rnd.nextInt(50)}")
      val agg = new CorpusStats.MisraGriesAgg(capacity)
      val kept = agg.finish(
        mergeTree(stream, agg.zero, agg.reduce, agg.merge)).toSet
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      val threshold = stream.size.toDouble / (capacity + 1)
      val mustSurvive = counts.filter(_._2 > threshold).keys.toSet
      assert(mustSurvive.subsetOf(kept),
        s"capacity=$capacity lost=${mustSurvive -- kept} n=${stream.size}")
    }
  }

  test("CountMin: never undercounts, merge-tree invariant, bounded overcount (100 cases)") {
    import graft.operators.Sketch
    for (_ <- 1 to 100) {
      val width = 16 + rnd.nextInt(64)
      val depth = 2 + rnd.nextInt(4)
      val universe = 1 + rnd.nextInt(200)
      val stream = Seq.fill(100 + rnd.nextInt(2000))(rnd.nextInt(universe).toLong)
      val agg = new Sketch.CountMinAgg(width, depth)
      // clone buffers at merge boundaries: the aggregator mutates in place
      val sk = mergeTree[Long, Array[Long]](stream, agg.zero,
        (b, x) => agg.reduce(b.clone(), x), (a, b) => agg.merge(a.clone(), b))
      // flat reduce must give the bit-identical sketch (commutative +
      // associative elementwise adds)
      val flat = stream.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      assert(sk.toSeq == flat.toSeq, "merge tree changed the sketch")
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.size.toLong
      for ((x, c) <- truth) {
        val est = Sketch.estimate(sk, width, depth, x)
        assert(est >= c, s"undercount: $est < $c")
        // depth rows each overcount by < n; the MIN is within the row
        // bound even in the worst case measured here
        assert(est <= c + n, s"estimate $est beyond trivial bound")
      }
      // aggregate error behaves like collisions, not like noise: the
      // average overcount across queried items stays within a few
      // row-collision masses (2n/width per row, Markov-expected)
      val avgOver = truth.iterator.map { case (x, c) =>
        Sketch.estimate(sk, width, depth, x) - c }.sum.toDouble / truth.size
      assert(avgOver <= 8.0 * n / width + 1.0,
        s"avg overcount $avgOver vs bound ${8.0 * n / width + 1.0}")
    }
  }
}
