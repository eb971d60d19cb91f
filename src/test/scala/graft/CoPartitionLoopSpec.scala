package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.operators.Graph

/** r15 optimization pin for the scale-gated loop-edge co-partitioning
  * (`coPartitionLoopEdges`): above `spark.graft.loop.broadcastNodeCap`
  * the loop-invariant edge table is persisted repartitioned+sorted on
  * the per-round join key, so no round re-shuffles or re-sorts |E|
  * rows. The r14 gate read `optimizedPlan.stats.rowCount`, which is
  * None for parquet/join-derived frames in every reachable
  * configuration — dead code. The gate now counts the materialized
  * cache, and these tests force it LOW to pin both halves of the
  * contract: (i) results are row-identical with the gate forced into
  * the big branch, (ii) the per-round sort-merge join consumes the
  * cached edge partitioning+ordering with no fresh Exchange or Sort. */
class CoPartitionLoopSpec extends SparkFunSuite {
  import spark.implicits._

  // irregular graph: degree spread, a pendant node (PprSymmetricSpec's)
  // numeric items (labelPropagation's argmax negates the label)
  private def baskets = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L),
    (2L, 10L), (2L, 11L),
    (3L, 11L), (3L, 12L),
    (4L, 12L), (4L, 13L),
    (5L, 10L), (5L, 13L),
    (6L, 10L), (6L, 11L), (6L, 13L),
    (7L, 13L), (7L, 14L)).toDF("basket", "item")

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSeq

  private def withConfs(pairs: (String, String)*)(f: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("forced-low cap: loop outputs are row-identical") {
    val expected = Seq(
      rows(Graph.pageRank(baskets, "basket", "item", 1, 3)),
      rows(Graph.labelPropagation(baskets, "basket", "item", 1, 3)),
      rows(Graph.bfsHops(baskets, "basket", "item", _.isin(10L), 1, 3)),
      rows(Graph.sssp(baskets, "basket", "item", _.isin(10L), 1, 3)),
      rows(Graph.hitsBipartite(baskets, "basket", "item", 2)),
      rows(Graph.closenessCentrality(baskets, "basket", "item",
        _.isin(10L, 13L), 1, 3)))
    withConfs("spark.graft.loop.broadcastNodeCap" -> "1") {
      val got = Seq(
        rows(Graph.pageRank(baskets, "basket", "item", 1, 3)),
        rows(Graph.labelPropagation(baskets, "basket", "item", 1, 3)),
        rows(Graph.bfsHops(baskets, "basket", "item", _.isin(10L), 1, 3)),
        rows(Graph.sssp(baskets, "basket", "item", _.isin(10L), 1, 3)),
        rows(Graph.hitsBipartite(baskets, "basket", "item", 2)),
        rows(Graph.closenessCentrality(baskets, "basket", "item",
          _.isin(10L, 13L), 1, 3)))
      assert(got == expected)
    }
  }

  /** True when `p` reaches a cached edge scan without crossing a
    * ShuffleExchange or Sort — i.e. the side reuses the cache's
    * partitioning AND sort order as-is. */
  private def cacheReachedUnshuffled(p: SparkPlan): Boolean = p match {
    case _: ShuffleExchangeExec => false
    case _: SortExec => false
    case _: InMemoryTableScanExec => true
    case other => other.children.exists(cacheReachedUnshuffled)
  }

  test("forced-low cap: per-round SMJ consumes the cached edge " +
    "partitioning with no fresh Exchange or Sort") {
    withConfs(
      "spark.graft.loop.broadcastNodeCap" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.enabled" -> "false") { // static, inspectable plan
      val labels = Graph.labelPropagationFromEdges(
        Graph.minedEdges(baskets, "basket", "item", 1), rounds = 3)
      val plan = labels.queryExecution.executedPlan
      val smjs = plan.collect { case j: SortMergeJoinExec => j }
      // one per-round votes join per round
      assert(smjs.size >= 3, s"expected >=3 SMJ rounds, got ${smjs.size}:\n$plan")
      smjs.foreach { j =>
        assert(Seq(j.left, j.right).exists(cacheReachedUnshuffled),
          s"no SMJ side reuses the cached edge partitioning+ordering:\n$j")
      }
      assert(labels.count() > 0)
    }
  }
}
