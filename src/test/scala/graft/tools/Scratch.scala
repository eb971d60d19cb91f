package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => sf}
import graft.{functions => gf}

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
    val dir = "/root/testdata/sf0.1"
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val planes = graft.operators.Similarity.lshPlanes(64, 120, 42)
    def banded(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Par.spread(
        df.select(sf.col("vec_id").cast("long").as("id"),
          sf.col("embedding").cast("array<double>").as("v")))
      .withColumn("bv", sf.array((0 until 24).map { b =>
        graft.operators.Similarity.lshBucket(sf.col("v"),
          planes.slice(b * 5, (b + 1) * 5)).cast("int")
      }: _*))
    for (r <- 1 to 3) {
      val ev = banded(e.filter(sf.col("vec_id") % 10 === 0))
        .select(sf.col("id").as("eval_id"), sf.col("v").as("ev"), sf.col("bv").as("bv_e"))
        .select(sf.col("eval_id"), sf.col("ev"), sf.col("bv_e"),
          sf.posexplode(sf.col("bv_e")).as(Seq("band_e", "bh_e")))
      // one-generator payload: nothing computed is carried past the
      // Generate, so bv evaluates once per corpus row
      val co = banded(e.filter(sf.col("vec_id") % 10 =!= 0))
        .select(sf.col("id").as("corpus_id"), sf.col("v"),
          sf.explode(sf.expr(
            "transform(bv, (bh, b) -> struct(b AS band, bh AS bh, slice(bv, 1, b) AS pfx))"))
            .as("e"))
        .select(sf.col("corpus_id"), sf.col("v"),
          sf.col("e.band").as("band"), sf.col("e.bh").as("bh"), sf.col("e.pfx").as("pfx"))
      t(s"r$r payload-full") {
        println("  rows=" + co.join(sf.broadcast(ev),
            sf.col("band") === sf.col("band_e") && sf.col("bh") === sf.col("bh_e"))
          .filter(gf.prefixAllDiffer(sf.col("pfx"), sf.col("bv_e"), sf.col("band")))
          .withColumn("cosine", gf.roundAt(gf.cosineSim(sf.col("v"), sf.col("ev")), 4))
          .filter(sf.col("cosine") >= 0.4)
          .select("corpus_id", "eval_id", "cosine")
          .orderBy("corpus_id", "eval_id").count())
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
