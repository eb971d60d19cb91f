package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.Kernels

/* Top-level case classes (Catalyst encoder + Janino constraint). */
case class StreamDoc(doc_id: Long, text: String)
case class DupPair(a_id: Long, b_id: Long, jaccard: Double)
case class BucketMember(id: Long, sh: Array[String], bands: Array[Int])
case class BucketState(members: List[BucketMember])

/** Streaming near-duplicate detection: the MinHash+LSH dedup operator
  * under Structured Streaming. Incoming documents are shingled and
  * band-hashed with the SAME kernels as the batch path; each LSH
  * bucket is a keyed state holding its members' shingle sets, and a new
  * arrival is exact-Jaccard-verified against the bucket's members —
  * emitting (a_id, b_id, jaccard) pairs the moment the duplicate
  * arrives.
  *
  * Exactly-once pair output WITHOUT a downstream dedup: a pair
  * colliding in several buckets is emitted only at its minimal
  * agreeing band — the batch pipeline's first-witness test
  * (Dedup.lshCore), applied in-state. Each member's full band array
  * rides its bucket entry; before verifying against a member in band
  * i, the operator checks the two band arrays differ at every index
  * below i. Both arrays are pure functions of document content, so
  * exactly one bucket — the first — wins, deterministically, with no
  * watermark-bounded `dropDuplicates` state downstream. (A stateful
  * dedup would either hold every emitted pair forever or silently
  * re-admit duplicates past its watermark; the witness test needs
  * neither.)
  *
  * Scale notes: state is per (band, bandHash) bucket and bounded by
  * `maxBucketSize` — degenerate buckets stop ADMITTING members rather
  * than growing without bound (an arrival is still verified against
  * the capped bucket's members, it just isn't stored).
  *
  * Recall under capping — explicit contract: with the first-witness
  * test, a capped bucket LOSES pairs rather than duplicating them.
  * If doc A was refused admission at band k (bucket full) and doc B
  * later agrees with A at both k and a higher band j, band k never
  * tests the pair (A isn't among its members) while band j defers to
  * k and stays silent — the pair is dropped entirely, where the
  * pre-witness pipeline would have emitted it at j as a duplicate.
  * The witness would have to defer only to bands where BOTH docs were
  * actually admitted, but admission is decided independently per
  * bucket key within a micro-batch, so no single-pass stateful
  * operator can see it. Uncapped buckets (maxBucketSize = MaxValue)
  * keep exactly-once emission with full recall; under a cap, treat
  * emission as exactly-once with recall bounded by bucket occupancy.
  */
object StreamingDedup {

  private def shingle(text: String): Array[String] =
    text.trim.toLowerCase match {
      case "" => Array.empty[String]
      case t => t.split("\\s+").distinct.sorted
    }

  private def jaccardSorted(a: Array[String], b: Array[String]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    Kernels.jaccardSorted(
      new GenericArrayData(a.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(b.map(UTF8String.fromString).toArray[Any]))
  }

  def nearDupPairs(spark: SparkSession, docs: Dataset[StreamDoc],
                   threshold: Double = 0.9, numHashes: Int = 48,
                   rowsPerBand: Int = 3, maxBucketSize: Int = 1024): Dataset[DupPair] = {
    import spark.implicits._
    val banded = docs.flatMap { d =>
      val sh = shingle(d.text)
      val safe = if (sh.isEmpty) Array("") else sh
      val bandsData = Kernels.minHashBands(
        new GenericArrayData(safe.map(UTF8String.fromString).toArray[Any]),
        numHashes, rowsPerBand)
      val bands = Array.tabulate(bandsData.numElements())(bandsData.getInt)
      bands.indices.map(b => (b, bands(b), d.doc_id, sh, bands))
    }
    banded
      .groupByKey { case (band, bh, _, _, _) => (band, bh) }
      .flatMapGroupsWithState[BucketState, DupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Int), rows: Iterator[(Int, Int, Long, Array[String], Array[Int])],
         state: GroupState[BucketState]) =>
          val band = key._1
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = List.newBuilder[DupPair]
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, sh, bands) =>
            if (!members.exists(_.id == id)) {
              members.foreach { m =>
                // first-witness: only the minimal agreeing band emits
                var first = true
                var k = 0
                while (first && k < band) {
                  if (m.bands(k) == bands(k)) first = false
                  k += 1
                }
                if (first) {
                  val j = jaccardSorted(m.sh, sh)
                  if (j >= threshold) {
                    val (a, b) = if (m.id < id) (m.id, id) else (id, m.id)
                    out += DupPair(a, b, math.rint(j * 10000) / 10000)
                  }
                }
              }
              if (members.size < maxBucketSize)
                members = BucketMember(id, sh, bands) :: members
            }
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }
}
