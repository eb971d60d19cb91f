package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => sf}
import graft.{functions => gf}

/** Group-limit ("top-k per key") at scale. The textbook
  * `row_number() OVER (PARTITION BY key ORDER BY score)` shuffles and
  * SORTS every row of every group; this operator reduces with the
  * k-bounded typed Aggregator instead (Similarity.TopKAgg — sorted
  * buffer, O(1) reject of below-k rows), so partial buffers combine
  * map-side and the shuffle carries at most partitions × keys × k
  * entries, independent of group size. The window shape remains the
  * SQL-oracle twin. */
object TopK {

  /** Top `k` rows per key by (score desc, id asc).
    * Output: (key, rank, id, score), ordered. */
  def perKey(spark: SparkSession, df: DataFrame, keyCol: String, idCol: String,
             scoreCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import spark.implicits._
    val scored = df.select(sf.col(keyCol).cast("long").as("qId"),
        sf.col(idCol).cast("long").as("nId"),
        sf.col(scoreCol).cast("double").as("cosine"))
      .as[Similarity.Scored]
    val agg = new Similarity.TopKAgg(k).toColumn
    scored.groupByKey(_.qId).agg(agg.name("topk"))
      .toDF("key", "topk")
      .select(sf.col("key"), sf.posexplode(sf.col("topk")).as(Seq("i", "sn")))
      .select(sf.col("key"), (sf.col("i") + 1).as("rank"),
        sf.col("sn._2").as("id"), gf.roundAt(sf.col("sn._1"), 4).as("score"))
      .orderBy("key", "rank")
  }

}
