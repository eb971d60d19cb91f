package graft.tools
import org.apache.spark.sql.{SparkSession, functions => sf}
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Dev-only timing scratchpad (not a spec; run via Test/runMain). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.windowExec.buffer.in.memory.threshold", 1048576)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables.load(spark, dir, "lineitem")
    for (r <- 1 to 3) {
      val counts = li.select(sf.col("l_returnflag"), sf.col("l_extendedprice").cast("double").as("__v"))
        .filter(sf.col("__v").isNotNull)
        .groupBy("l_returnflag", "__v").agg(sf.count(sf.lit(1)).as("__c"))
      t(s"r$r counts agg")(println(counts.count()))
      val cumW = Window.partitionBy("l_returnflag").orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = counts.withColumn("__hi", sf.sum("__c").over(cumW))
      t(s"r$r window cumsum")(println(ranked.count()))
      t(s"r$r full q35")(graft.dq.QualityChecks.quantileProfile(li, "l_returnflag", "l_extendedprice")
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
