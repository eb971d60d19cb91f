package graft.tools
import org.apache.spark.sql.{SparkSession, functions => sf}
import graft.operators._
import graft.sources.Tables
import graft.{functions => gf}

/** Dev-only timing scratchpad (not a spec; run via Test/runMain). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    for (round <- 1 to 3) {
      t(s"r$round q22 full")(
        Dedup.minHashLsh(docs, "doc_id", "text", 0.9)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
    }
    // stage profile (round 4, warm)
    val threshold = 0.9
    val base = Par.spread(docs.select(
      sf.col("doc_id").cast("long").as("id"),
      gf.wordShingles(sf.col("text")).as("sh0")))
      .select(sf.col("id"),
        gf.minHashBands(sf.col("sh0"), 144, 6).as("bands"),
        gf.hashShingles(sf.col("sh0")).as("shh"))
      .withColumn("sz", sf.size(sf.col("shh")))
      .persist()
    t("signatures")(base.count())
    val buckets = base.select(sf.col("id"), sf.col("bands"), sf.col("sz"),
      sf.posexplode(sf.col("bands")).as(Seq("band", "bh"))).persist()
    t("buckets")(buckets.count())
    val ba = buckets.select(sf.col("band"), sf.col("bh"),
      sf.col("id").as("a_id"), sf.col("bands").as("bands_a"), sf.col("sz").as("sz_a"))
    val bb = buckets.select(sf.col("band").as("band_b"), sf.col("bh").as("bh_b"),
      sf.col("id").as("b_id"), sf.col("bands").as("bands_b"), sf.col("sz").as("sz_b"))
    val candidates = ba.join(bb.hint("shuffle_hash"),
        sf.col("band") === sf.col("band_b") && sf.col("bh") === sf.col("bh_b") &&
          sf.col("a_id") < sf.col("b_id"))
      .filter(sf.least(sf.col("sz_a"), sf.col("sz_b")).cast("double") >=
        sf.greatest(sf.col("sz_a"), sf.col("sz_b")).cast("double") * threshold)
      .filter(gf.prefixAllDiffer(sf.col("bands_a"), sf.col("bands_b"), sf.col("band")))
      .select("a_id", "b_id").persist()
    t("candidates")(candidates.count())
    val shA = base.select(sf.col("id").as("a_id"), sf.col("shh").as("sh_a"))
    val shB = base.select(sf.col("id").as("b_id"), sf.col("shh").as("sh_b"))
    val ver = candidates.join(shA, "a_id").join(shB, "b_id")
      .select(sf.col("a_id"), sf.col("b_id"),
        sf.round(gf.jaccardSortedLongGeq(sf.col("sh_a"), sf.col("sh_b"),
          threshold - 0.00005), 4).as("jaccard"))
      .filter(sf.col("jaccard") >= threshold)
    t("verify")(ver.count())
    t("sort+emit")(ver.orderBy("a_id", "b_id").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
