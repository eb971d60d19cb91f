package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: wall-time named queries INCLUDING their eager plan-build
  * work (Explain builds the frame before its clock starts, so queries
  * that materialize eagerly — checkpointed loops — read near-zero
  * there). No warmup, no second pass: for cold comparative A/B runs
  * under forced confs (-Dspark.graft.*, -Dspark.sql.*), not for pin
  * numbers. Usage: runMain graft.QTime <sfDir> <name> [name...] */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[qtime] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
