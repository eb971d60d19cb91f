package graft

import org.apache.spark.sql.{functions => sf}
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

class DedupSimilaritySpec extends SparkFunSuite {
  import spark.implicits._

  test("Dedup.exact groups identical content, keeps min id") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("id", "t")
    val got = Dedup.exact(df, "id", Seq("t")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (3L, 1L)))
  }

  test("minHashLsh equals exhaustive jaccard pairs at the threshold (recall check)") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 120)
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exhaustive = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .filter($"jaccard" >= 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh == exhaustive)
  }

  test("minHashLsh bucket cap bounds skew (documented recall trade)") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 60)
    val capped = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.9, maxBucketSize = 2)
    val uncapped = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.9)
    assert(capped.count() <= uncapped.count())
  }

  test("simHashNearDup finds the planted near-duplicate only") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten")).toDF("id", "t")
    val pairs = Dedup.simHashNearDup(df, "id", "t", maxHamming = 12)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("aggTopK (k-bounded Aggregator) equals window-rank bruteForceTopK") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val a = Similarity.aggTopK(spark, emb, "vec_id", "embedding", sf.col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val b = Similarity.bruteForceTopK(emb, "vec_id", "embedding", sf.col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(a.sameElements(b))
  }

  test("lshTopK returns a subset ranking consistent with brute force on its candidates") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val got = Similarity.lshTopK(emb, "vec_id", "embedding", sf.col("vec_id") < 5, 5)
    // every query id present, ranks start at 1 and are dense per query
    val byQ = got.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to rows.length))
    }
  }

  test("connectedComponents labels every node with its component's min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("ivfTopK with nProbe == nCentroids equals exact brute force") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        sf.col("vec_id") < 5, k = 5, nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        sf.col("vec_id") < 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(ivf.sameElements(brute))
  }

  test("ivfTopK with partial probing returns dense ranks per query") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val got = Similarity.ivfTopK(emb, "vec_id", "embedding",
      sf.col("vec_id") < 5, k = 5, nCentroids = 8, nProbe = 2)
    val byQ = got.collect().groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to rows.length))
    }
  }

  test("cosineNearDup is symmetric-free (a<b) and thresholded") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val got = Similarity.cosineNearDup(emb, "vec_id", "embedding", 0.3, idMax = 200)
    val rows = got.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.3))
  }
}
