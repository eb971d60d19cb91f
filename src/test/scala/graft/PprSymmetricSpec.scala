package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Graph

/** r14 optimization pin: the mining wrappers run a symmetric-graph
  * fast loop (the per-round `nodes LEFT JOIN contrib` merge is dropped
  * because a mined edge list carries both directions of every pair, so
  * every node receives contributions every round). These tests pin the
  * fast loops row-for-row against the general `*FromEdges` paths —
  * which keep the merge join for arbitrary (possibly asymmetric) edge
  * lists — over the same mined edges. */
class PprSymmetricSpec extends SparkFunSuite {
  import spark.implicits._

  // a small irregular graph: degree spread, a pendant node, two seeds
  private def baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "b"), (3L, "c"),
    (4L, "c"), (4L, "d"),
    (5L, "a"), (5L, "d"),
    (6L, "a"), (6L, "b"), (6L, "d"),
    (7L, "d"), (7L, "e")).toDF("basket", "item")

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSeq

  test("personalizedPageRank fast loop == general FromEdges path") {
    val seed = (i: org.apache.spark.sql.Column) => i.isin("a", "c")
    val fast = Graph.personalizedPageRank(baskets, "basket", "item",
      seed, minPairCount = 1, iters = 3)
    val gen = Graph.personalizedPageRankFromEdges(
      Graph.minedEdges(baskets, "basket", "item", 1), seed, iters = 3)
    assert(rows(fast) == rows(gen))
  }

  test("eigenvectorCentrality fast loop == general FromEdges path") {
    val fast = Graph.eigenvectorCentrality(baskets, "basket", "item",
      minPairCount = 1, iters = 3)
    val gen = Graph.eigenvectorCentralityFromEdges(
      Graph.minedEdges(baskets, "basket", "item", 1), iters = 3)
    assert(rows(fast) == rows(gen))
  }

  test("katzCentrality fast loop == general FromEdges path") {
    val fast = Graph.katzCentrality(baskets, "basket", "item",
      minPairCount = 1, iters = 3)
    val gen = Graph.katzCentralityFromEdges(
      Graph.minedEdges(baskets, "basket", "item", 1), iters = 3)
    assert(rows(fast) == rows(gen))
  }
}
