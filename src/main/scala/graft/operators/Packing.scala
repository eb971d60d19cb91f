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
  * anti-pattern). Multi-level scan instead:
  *   1. coarse buckets of `bucketSize` ids; per-bucket token totals
  *      via a combinable groupBy (shuffle carries one row per bucket
  *      per map task);
  *   2. exclusive cumsum of the totals via [[exclusivePrefix]] — a
  *      global-order window ONLY when the table is at most `scanBound`
  *      rows; larger tables recurse over sqrt-span super-buckets, so
  *      no single window task ever orders more than `scanBound` rows
  *      at any level, whatever the corpus size;
  *   3. per-row prefix = bucket offset + within-bucket running sum —
  *      a window PARTITIONED by bucket, so no partition exceeds
  *      `bucketSize` rows.
  *
  * With the default auto bucket sizing (`bucketSize <= 0`) the bucket
  * width is ceil(sqrt(maxId+1)), which balances levels 1 and 3 at
  * ~sqrt(n) rows each: at n = 10^12 ids that is ~10^6 rows per window
  * task (a few MB) and a single level-2 scan — nothing is unbounded.
  * [[planLevels]] is the pure-arithmetic mirror of the level sizing so
  * the scale behavior is testable without materializing 10^12 rows.
  */
object Packing {

  /** Cap on rows a single global-order window task may scan (level 2+).
    * ~1M (key,total) pairs is a few tens of MB in one sort task. */
  val DefaultScanBound: Long = 1L << 20

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** bucketSize = ceil(sqrt(maxId+1)) balances the per-bucket-totals
    * table (level 2 input) and the within-bucket window partitions
    * (level 3) at ~sqrt(n) rows each. */
  private[operators] def autoBucketSize(maxId: Long): Long =
    math.max(1L, math.ceil(math.sqrt((maxId + 1).toDouble)).toLong)

  /** Row counts of every prefix-scan level for ids in [0, maxId]: the
    * head entry is the per-bucket totals table, each further entry one
    * recursion level of [[exclusivePrefix]]. Pure arithmetic mirror of
    * what [[packSequences]] executes — specs assert the 10^12-id case
    * stays bounded without creating any data. */
  def planLevels(maxId: Long, bucketSize: Long = -1,
                 scanBound: Long = DefaultScanBound): Seq[Long] = {
    val bs = if (bucketSize > 0) bucketSize else autoBucketSize(maxId)
    def levels(keys: Long): List[Long] =
      if (keys <= scanBound) List(keys)
      else keys :: levels(ceilDiv(keys, prefixSpan(keys, scanBound)))
    levels(ceilDiv(maxId + 1, bs))
  }

  /** Super-bucket width for one recursion level: sqrt of the key range
    * balances this level's partitions against the next level's table,
    * capped at scanBound so partitions stay bounded too. */
  private def prefixSpan(keyRange: Long, scanBound: Long): Long =
    math.max(2L, math.min(scanBound,
      math.ceil(math.sqrt(keyRange.toDouble)).toLong))

  /** Exclusive running sum of `valCol` in `keyCol` order (keys are
    * non-negative longs, one row per key). Output: (keyCol, `offName`).
    *
    * Scale-safe: when the key RANGE exceeds `scanBound` the scan
    * recurses — keys fold into sqrt-span super-buckets, the per-super
    * totals are prefix-scanned one level up, and the within-super
    * running sum is a window PARTITIONED by super-bucket (≤ span rows
    * per partition). A global-order window only ever runs over a table
    * whose key range — hence row count — is ≤ scanBound. */
  private[operators] def exclusivePrefix(totals: DataFrame, keyCol: String,
                                         valCol: String, offName: String,
                                         scanBound: Long): DataFrame = {
    val m = totals.agg(sf.max(sf.col(keyCol))).head()
    val maxKey = if (m.isNullAt(0)) -1L else m.getLong(0)
    if (maxKey + 1 <= scanBound) {
      // Single-partition by CONSTRUCTION (the table is <= scanBound rows
      // — the recursion above guarantees it). The constant partition key
      // makes that bound explicit in the plan instead of tripping
      // WindowExec's "No Partition Defined" warning, which flags
      // unbounded global windows — this one is not. pmod(key, 1) is 0
      // for every row but non-foldable, so EliminateWindowPartitions
      // leaves the spec in place (a literal would be stripped).
      val w = Window.partitionBy(sf.pmod(sf.col(keyCol), sf.lit(1)))
        .orderBy(keyCol).rowsBetween(Window.unboundedPreceding, -1)
      totals
        .withColumn(offName, sf.coalesce(sf.sum(valCol).over(w), sf.lit(0L)))
        .select(keyCol, offName)
    } else {
      val span = prefixSpan(maxKey + 1, scanBound)
      val withSuper = totals.withColumn("__sb",
        sf.floor(sf.col(keyCol) / span))
      val superTotals = withSuper.groupBy("__sb")
        .agg(sf.sum(valCol).as(valCol))
        .withColumnRenamed("__sb", keyCol)
      val superOff = exclusivePrefix(superTotals, keyCol, valCol, "__sboff", scanBound)
        .withColumnRenamed(keyCol, "__sb")
      val wIn = Window.partitionBy("__sb").orderBy(keyCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      withSuper.join(superOff, "__sb")
        .withColumn(offName,
          sf.col("__sboff") + sf.coalesce(sf.sum(valCol).over(wIn), sf.lit(0L)))
        .select(keyCol, offName)
    }
  }

  /** Output: (doc_id, n_tokens, seq_id, seq_offset), ordered by id.
    * seq_id = floor(prefix / capacity), seq_offset = prefix %
    * capacity, where prefix counts all tokens of lower-id docs.
    * `bucketSize <= 0` (the default) derives ceil(sqrt(maxId+1)) from
    * a cheap column-pruned max over the id column. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    capacity: Long = 2048, bucketSize: Long = -1,
                    scanBound: Long = DefaultScanBound): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    globalTokenOffsets(docs, idCol, textCol, bucketSize, scanBound)
      .select(sf.col("doc_id"), sf.col("n_tokens"),
        sf.expr(s"pre DIV $capacity").as("seq_id"),
        sf.pmod(sf.col("pre"), sf.lit(capacity)).as("seq_offset"))
      .orderBy("doc_id")
  }

  /** (doc_id, n_tokens, pre) with `pre` = exclusive global token
    * prefix in doc-id order — the two-level bucketed prefix pass
    * [[packSequences]] and [[packManifest]] share. */
  private def globalTokenOffsets(docs: DataFrame, idCol: String, textCol: String,
                                 bucketSize: Long, scanBound: Long): DataFrame = {
    require(scanBound > 0, "scanBound must be positive")
    val maxRow = docs.agg(sf.max(sf.col(idCol).cast("long"))).head()
    val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val bs = if (bucketSize > 0) bucketSize else autoBucketSize(maxId)
    val base = docs.select(sf.col(idCol).cast("long").as("doc_id"),
        gf.tokenCount(sf.col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", sf.floor(sf.col("doc_id") / bs))
    val bucketTotals = base.groupBy("bucket").agg(sf.sum("n_tokens").as("btot"))
    val offsets = exclusivePrefix(bucketTotals, "bucket", "btot", "boff", scanBound)
    // Broadcast the per-bucket offsets only when provably small; at auto
    // sizing that is ~sqrt(n) rows. Otherwise a plain equi join — AQE
    // picks the strategy, and the shuffle it may need is the same
    // bucket-keyed one the within-bucket window needs anyway.
    val numBuckets = ceilDiv(maxId + 1, bs)
    val joined =
      if (numBuckets <= scanBound) base.join(sf.broadcast(offsets), "bucket")
      else base.join(offsets, "bucket")
    val wInBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    joined.withColumn("pre",
      sf.col("boff") + sf.coalesce(sf.sum("n_tokens").over(wInBucket), sf.lit(0L)))
  }

  /** Per-sequence packing manifest — what a dataloader actually needs
    * to serve [[packSequences]]' layout: for each packed sequence, the
    * ordered document spans inside it (span-start offsets = the
    * attention-reset / position-id-reset boundaries), the fill level,
    * and the pad tail. Documents larger than `capacity` span several
    * sequences and contribute one span to each — concatenate-and-chunk
    * semantics, nothing truncated.
    *
    * Exactness: pure integer interval arithmetic on the shared global
    * prefix; span arrays sort by in-sequence offset (unique within a
    * sequence — a total order).
    *
    * Scale shape: the span explode fans out ceil(n_tokens/capacity)
    * rows per doc (bounded by doc length), then ONE seq-keyed
    * combinable aggregation; spans-per-sequence is bounded by
    * capacity, so collected span arrays are small by construction. */
  def packManifest(docs: DataFrame, idCol: String, textCol: String,
                   capacity: Long = 2048, bucketSize: Long = -1,
                   scanBound: Long = DefaultScanBound): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val c = capacity
    val off = globalTokenOffsets(docs, idCol, textCol, bucketSize, scanBound)
      .filter(sf.col("n_tokens") > 0)
    val spans = off.select(sf.col("doc_id"), sf.col("n_tokens"), sf.col("pre"),
        sf.explode(sf.sequence(sf.expr(s"pre DIV $c"),
          sf.expr(s"(pre + n_tokens - 1) DIV $c"))).as("seq_id"))
      .select(sf.col("seq_id"), sf.col("doc_id"),
        (sf.greatest(sf.col("pre"), sf.col("seq_id") * c) - sf.col("seq_id") * c).as("off"),
        (sf.least(sf.col("pre") + sf.col("n_tokens"), (sf.col("seq_id") + 1) * c) -
          sf.greatest(sf.col("pre"), sf.col("seq_id") * c)).as("len"))
    spans.groupBy("seq_id")
      .agg(sf.count(sf.lit(1)).as("n_spans"), sf.sum("len").as("fill_tokens"),
        sf.sort_array(sf.collect_list(sf.struct(sf.col("off"), sf.col("doc_id")))).as("__sp"))
      .select(sf.col("seq_id"), sf.col("n_spans"), sf.col("fill_tokens"),
        (sf.lit(c) - sf.col("fill_tokens")).as("pad_tokens"),
        sf.expr("transform(__sp, x -> x.off)").as("boundaries"),
        sf.expr("transform(__sp, x -> x.doc_id)").as("doc_ids"))
      .orderBy("seq_id")
  }

  /** Sequence-length bucketing efficiency report — the dynamic-batching
    * datasheet beside [[packSequences]]'s concatenate-and-chunk: each
    * document rounds UP to the next multiple of `multiple` (capped at
    * `maxLen`, the training context window), and the report says, per
    * bucket, how many pad tokens that batching strategy wastes and how
    * many real tokens the cap truncates. pad_frac per bucket is the
    * number a pipeline tunes bucket boundaries against; truncated > 0
    * rows say the cap is eating data.
    *
    * Exactness: token counts, bucket arithmetic, pad/truncation sums
    * are all integers; pad_frac is one exact division rounded 1e-4.
    * Scale shape: one map-only pass per doc (fused token-count
    * kernel), then a map-side-combined groupBy onto the BOUNDED
    * bucket domain (≤ maxLen/multiple rows). Empty docs drop. */
  def lengthBucketing(docs: DataFrame, idCol: String, textCol: String,
                      multiple: Int = 128, maxLen: Int = 2048): DataFrame = {
    require(multiple >= 1, s"multiple must be >= 1, got $multiple")
    require(maxLen >= multiple && maxLen % multiple == 0,
      s"maxLen must be a positive multiple of multiple, got $maxLen/$multiple")
    val n = gf.tokenCount(sf.col("__t")).cast("long")
    val kept = sf.least(sf.col("__n"), sf.lit(maxLen.toLong))
    val bucket = sf.least(
      ((sf.col("__n") + (multiple - 1)) / multiple).cast("long") * multiple,
      sf.lit(maxLen.toLong))
    Par.spread(docs.select(sf.col(idCol).cast("long").as("doc_id"),
        sf.col(textCol).as("__t")))
      .select(sf.col("doc_id"), n.as("__n"))
      .filter(sf.col("__n") > 0)
      .select(sf.col("doc_id"), sf.col("__n"), kept.as("__kept"),
        bucket.as("bucket_len"))
      .groupBy("bucket_len")
      .agg(sf.count(sf.lit(1)).as("n_docs"),
        sf.sum("__n").as("total_tokens"),
        sf.sum(sf.col("bucket_len") - sf.col("__kept")).as("pad_tokens"),
        sf.sum(sf.col("__n") - sf.col("__kept")).as("truncated_tokens"))
      .select(sf.col("bucket_len"), sf.col("n_docs"), sf.col("total_tokens"),
        sf.col("pad_tokens"), sf.col("truncated_tokens"),
        gf.roundAt(sf.col("pad_tokens").cast("double") /
          (sf.col("n_docs") * sf.col("bucket_len")).cast("double"), 4)
          .as("pad_frac"))
      .orderBy("bucket_len")
  }
}
