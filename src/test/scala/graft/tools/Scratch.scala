package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only timing scratchpad (not a spec; run via Test/runMain). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q33_dedup_clusters", "q34_repetition", "q38_tfidf")
    for (round <- 1 to 3; n <- names) {
      val fn = SparkEntry.queries.filter(_._1.startsWith(n)).head._2
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[t] round$round $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(200)
    }
    spark.stop()
  }
}
