package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.{functions => sf}

/** Streaming twin of the batch curation funnel's gate + dedup stages
  * (operators.Pipeline.curationPlan): a stateless quality gate feeding
  * the keyed LSH near-dup state, so a document's KEEP/DROP fate is
  * decided the moment it arrives instead of in a nightly batch.
  *
  * Parity contract with the batch funnel (StreamingSpec pins it):
  * - The gate is the same expression both sides (functions.tokenCount)
  *   — stateless, so stream ≡ batch trivially.
  * - Exact duplicates need no separate streaming stage: an identical
  *   pair verifies at jaccard 1.0 >= any threshold inside the near-dup
  *   state, so the greedy drop below subsumes the batch `Dedup.exact`
  *   stage (which exists for efficiency, not semantics).
  * - Near-dup survivorship is GREEDY-ORDERED: an arrival is dropped
  *   iff it pairs (>= threshold, exact-verified) with ANY earlier
  *   arrival — dropped docs still witness later arrivals, so chains
  *   (a-b, b-c similar, a-c not) resolve like batch CC. The batch
  *   funnel instead keeps the min-id representative of each connected
  *   CLUSTER. With id-ordered arrivals the two agree on cliques and
  *   chains; they diverge only when a doc's every edge points at
  *   HIGHER ids — edges (2,9),(5,9): CC keeps 2 alone, the stream
  *   keeps 2 and 5 (5 saw no earlier partner) and drops 9. That
  *   difference is inherent to single-pass streaming (a cluster isn't
  *   known until all members arrived) and is the documented trade for
  *   on-arrival decisions.
  */
object StreamingCuration {

  /** Quality-gated stream: documents whose token count clears
    * `minTokens` — the same `functions.tokenCount` expression the
    * batch gate uses, applied stateless per arrival. */
  def qualityGate(spark: SparkSession, docs: Dataset[StreamDoc],
                  minTokens: Int): Dataset[StreamDoc] = {
    import spark.implicits._
    docs.toDF()
      .filter(graft.functions.tokenCount(sf.col("text")) >= minTokens)
      .as[StreamDoc]
  }

  /** Gate + near-dup state composed: emits (a_id, b_id, jaccard) the
    * moment a gated document duplicates an earlier gated one. The
    * survivor set at any point is {gated arrivals} minus {the later
    * member of every emitted pair} — derivable downstream without
    * additional state because greedy survivorship is decided at
    * arrival. */
  def gatedNearDupPairs(spark: SparkSession, docs: Dataset[StreamDoc],
                        minTokens: Int, threshold: Double = 0.9,
                        numHashes: Int = 48, rowsPerBand: Int = 3,
                        maxBucketSize: Int = 1024): Dataset[DupPair] =
    StreamingDedup.nearDupPairs(spark, qualityGate(spark, docs, minTokens),
      threshold, numHashes, rowsPerBand, maxBucketSize)
}
