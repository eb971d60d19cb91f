package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => sf}
import graft.{functions => gf}

/** Training-sequence assembly: concatenate the corpus in id order and
  * cut fixed-capacity token sequences ("concatenate and chunk" — the
  * standard LM pretraining packing). Each document is tagged with the
  * sequence index its first token lands in and its token offset within
  * that sequence.
  *
  * The core is a DISTRIBUTED PREFIX SUM, which a naive
  * `sum over (order by id)` window would compute on a single reducer
  * (a global-order window is one partition — the canonical scale
  * anti-pattern). Two-level scan instead:
  *   1. coarse buckets of `bucketSize` ids; per-bucket token totals
  *      via a combinable groupBy (shuffle carries one row per bucket
  *      per map task);
  *   2. exclusive cumsum of the totals — a window over the SMALL
  *      per-bucket table (rows = ids/bucketSize; size the bucket so
  *      this table is driver-trivial, and nest another level if a
  *      corpus ever outgrows it), broadcast back;
  *   3. per-row prefix = bucket offset + within-bucket running sum —
  *      a window PARTITIONED by bucket, so no partition exceeds
  *      `bucketSize` rows.
  * Every stage is bounded; nothing orders the full corpus on one task.
  */
object Packing {

  /** Output: (doc_id, n_tokens, seq_id, seq_offset), ordered by id.
    * seq_id = floor(prefix / capacity), seq_offset = prefix %
    * capacity, where prefix counts all tokens of lower-id docs. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    capacity: Long = 2048, bucketSize: Long = 4096): DataFrame = {
    require(capacity > 0 && bucketSize > 0, "capacity and bucketSize must be positive")
    val base = docs.select(sf.col(idCol).cast("long").as("doc_id"),
        gf.tokenCount(sf.col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", sf.floor(sf.col("doc_id") / bucketSize))
    val bucketTotals = base.groupBy("bucket").agg(sf.sum("n_tokens").as("btot"))
    val wBuckets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("boff", sf.coalesce(sf.sum("btot").over(wBuckets), sf.lit(0L)))
      .select("bucket", "boff")
    val wInBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(sf.broadcast(offsets), "bucket")
      .withColumn("pre",
        sf.col("boff") + sf.coalesce(sf.sum("n_tokens").over(wInBucket), sf.lit(0L)))
      .select(sf.col("doc_id"), sf.col("n_tokens"),
        sf.expr(s"pre DIV $capacity").as("seq_id"),
        sf.pmod(sf.col("pre"), sf.lit(capacity)).as("seq_offset"))
      .orderBy("doc_id")
  }
}
