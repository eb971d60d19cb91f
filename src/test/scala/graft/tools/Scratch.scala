package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only plan/timing scratchpad (not a spec; run via Test/runMain). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 3) {
      t(s"r$r q68")(graft.SparkEntry.queries("q68_dup_ngram_frac")(spark, "/root/testdata/sf0.1").collect())
      t(s"r$r q74")(graft.SparkEntry.queries("q74_pmi")(spark, "/root/testdata/sf0.1").collect())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
