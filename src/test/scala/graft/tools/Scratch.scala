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
    val hashed = Par.spread(docs.select(
      sf.col("doc_id").cast("long").as("id"),
      gf.wordShingles(sf.col("text")).as("sh0")))
      .select(sf.col("id"), gf.hashShingles(sf.col("sh0")).as("shh"))
      .withColumn("setkey", sf.xxhash64(sf.col("shh")))
      .persist()
    val groups = hashed.groupBy("setkey")
      .agg(sf.min("id").as("rep"), sf.count(sf.lit(1)).as("cnt"), sf.first("shh").as("shh"))
      .persist()
    val base = groups.select(sf.col("setkey"), sf.col("rep").as("id"), sf.col("shh"),
        gf.minHashBandsFromHashes(sf.col("shh"), 144, 6).as("bands"),
        sf.size(sf.col("shh")).as("sz"))
      .persist()
    val buckets = base.select(sf.col("id"), sf.col("bands"), sf.col("sz"),
      sf.posexplode(sf.col("bands")).as(Seq("band", "bh"))).persist()
    t("materialize")(buckets.count())
    val ba = buckets.select(sf.col("band"), sf.col("bh"),
      sf.col("id").as("a_id"), sf.col("bands").as("bands_a"), sf.col("sz").as("sz_a"))
    val bb = buckets.select(sf.col("band").as("band_b"), sf.col("bh").as("bh_b"),
      sf.col("id").as("b_id"), sf.col("bands").as("bands_b"), sf.col("sz").as("sz_b"))
    def candidates = ba.join(bb.hint("shuffle_hash"),
        sf.col("band") === sf.col("band_b") && sf.col("bh") === sf.col("bh_b") &&
          sf.col("a_id") < sf.col("b_id"))
      .filter(sf.least(sf.col("sz_a"), sf.col("sz_b")).cast("double") >=
        sf.greatest(sf.col("sz_a"), sf.col("sz_b")).cast("double") * 0.9)
      .filter(gf.prefixAllDiffer(sf.col("bands_a"), sf.col("bands_b"), sf.col("band")))
      .select("a_id", "b_id")
    val shA = base.select(sf.col("id").as("a_id"), sf.col("shh").as("sh_a"))
    val shB = base.select(sf.col("id").as("b_id"), sf.col("shh").as("sh_b"))
    for (r <- 1 to 2) {
      t(s"r$r verify plain")(println(candidates.join(shA, "a_id").join(shB, "b_id")
        .select(sf.round(gf.jaccardSortedLongGeq(sf.col("sh_a"), sf.col("sh_b"), 0.89995), 4).as("j"))
        .filter(sf.col("j") >= 0.9).count()))
      t(s"r$r verify bcast")(println(candidates.join(sf.broadcast(shA), "a_id").join(sf.broadcast(shB), "b_id")
        .select(sf.round(gf.jaccardSortedLongGeq(sf.col("sh_a"), sf.col("sh_b"), 0.89995), 4).as("j"))
        .filter(sf.col("j") >= 0.9).count()))
    }
    spark.stop()
  }
}
