package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.Kernels

/* Top-level case classes (Catalyst encoder + Janino constraint). */
case class StreamDoc(doc_id: Long, text: String)
case class DupPair(a_id: Long, b_id: Long, jaccard: Double)
case class BucketMember(id: Long, sh: Array[String])
case class BucketState(members: List[BucketMember])

/** Streaming near-duplicate detection: the MinHash+LSH dedup operator
  * under Structured Streaming. Incoming documents are shingled and
  * band-hashed with the SAME kernels as the batch path; each LSH
  * bucket is a keyed state holding its members' shingle sets, and a new
  * arrival is exact-Jaccard-verified against the bucket's members —
  * emitting (a_id, b_id, jaccard) pairs the moment the duplicate
  * arrives.
  *
  * Scale notes: state is per (band, bandHash) bucket and bounded by
  * `maxBucketSize` (degenerate buckets stop absorbing members rather
  * than growing without bound); a pair colliding in several buckets can
  * be emitted more than once — in-bucket emission cannot see other
  * buckets, so exactly-once pair output requires a downstream
  * `dropDuplicates` (bounded by a watermark in production).
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
      val bands = Kernels.minHashBands(
        new GenericArrayData(safe.map(UTF8String.fromString).toArray[Any]),
        numHashes, rowsPerBand)
      (0 until bands.numElements()).map(b =>
        (b, bands.getInt(b), d.doc_id, sh))
    }
    banded
      .groupByKey { case (band, bh, _, _) => (band, bh) }
      .flatMapGroupsWithState[BucketState, DupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Int), rows: Iterator[(Int, Int, Long, Array[String])],
         state: GroupState[BucketState]) =>
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = List.newBuilder[DupPair]
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, sh) =>
            if (!members.exists(_.id == id)) {
              members.foreach { m =>
                val j = jaccardSorted(m.sh, sh)
                if (j >= threshold) {
                  val (a, b) = if (m.id < id) (m.id, id) else (id, m.id)
                  out += DupPair(a, b, math.rint(j * 10000) / 10000)
                }
              }
              if (members.size < maxBucketSize)
                members = BucketMember(id, sh) :: members
            }
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }
}
