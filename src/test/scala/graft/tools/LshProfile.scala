package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => sf}
import graft.{functions => gf}
import graft.operators.{Dedup, Par}
import graft.sources.Tables

/** Dev-only stage profiler for the LSH pipeline (not a test). */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("lsh-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - s) / 1e9}%.3f s"); r
    }
    // warm up codegen etc.
    docs.count()
    val hashed = t("hashed(tokenize+group)") {
      val h = Par.spread(docs.select(sf.col("doc_id").cast("long").as("id"),
          sf.col("text").as("__t")))
        .select(sf.col("id"), gf.hashedWsShingles(sf.col("__t")).as("shh"))
        .withColumn("setkey", sf.xxhash64(sf.col("shh")))
        .persist()
      h.count(); h
    }
    val base = t("base(sig+bands+sketch)") {
      val b = hashed.groupBy("setkey")
        .agg(sf.min("id").as("rep"), sf.count(sf.lit(1)).as("cnt"),
          sf.first("shh").as("shh"))
        .select(sf.col("setkey"), sf.col("rep"), sf.col("cnt"), sf.col("shh"),
          gf.minHashBandsFromHashes(sf.col("shh"), 144, 6).as("bands"),
          sf.size(sf.col("shh")).as("sz"),
          gf.minHashBitSketch(sf.col("shh"), 256).as("skb"))
        .persist()
      b.count(); b
    }
    val buckets = base.select(sf.col("rep").as("id"), sf.col("bands"), sf.col("sz"),
      sf.col("skb"), sf.posexplode(sf.col("bands")).as(Seq("band", "bh")))
    val ba = buckets.select(sf.col("band"), sf.col("bh"),
      sf.col("id").as("a_id"), sf.col("bands").as("bands_a"), sf.col("sz").as("sz_a"),
      sf.col("skb").as("skb_a"))
    val bb = buckets.select(sf.col("band").as("band_b"), sf.col("bh").as("bh_b"),
      sf.col("id").as("b_id"), sf.col("bands").as("bands_b"), sf.col("sz").as("sz_b"),
      sf.col("skb").as("skb_b"))
    val joined = ba.join(bb.hint("shuffle_hash"),
      sf.col("band") === sf.col("band_b") && sf.col("bh") === sf.col("bh_b") &&
        sf.col("a_id") < sf.col("b_id"))
    val nColl = t("bucket join (collisions)") { joined.count() }
    val sized = joined.filter(sf.least(sf.col("sz_a"), sf.col("sz_b")).cast("double") >=
      sf.greatest(sf.col("sz_a"), sf.col("sz_b")).cast("double") * 0.9)
    val nSize = t(" + size filter") { sized.count() }
    val sk = sized.filter(gf.sketchMatchBits(sf.col("skb_a"), sf.col("skb_b")) >=
      sf.lit(Dedup.sketchCutoff(256, 0.9)))
    val nSk = t(" + sketch filter") { sk.count() }
    val wit = sk.filter(gf.prefixAllDiffer(sf.col("bands_a"), sf.col("bands_b"), sf.col("band")))
    val nWit = t(" + witness") { wit.count() }
    val shA = base.select(sf.col("rep").as("a_id"), sf.col("shh").as("sh_a"))
    val shB = base.select(sf.col("rep").as("b_id"), sf.col("shh").as("sh_b"))
    val verified = wit.select("a_id", "b_id").join(shA, "a_id").join(shB, "b_id")
      .select(sf.col("a_id"), sf.col("b_id"),
        gf.roundAt(gf.jaccardSortedLongGeq(sf.col("sh_a"), sf.col("sh_b"), 0.89995), 4).as("jaccard"))
      .filter(sf.col("jaccard") >= 0.9)
    val nVer = t("verify join") { verified.count() }
    println(s"collisions=$nColl afterSize=$nSize afterSketch=$nSk afterWitness=$nWit verified=$nVer")
    val full = t("full minHashLsh") { Dedup.minHashLsh(docs, "doc_id", "text", 0.9).count() }
    println(s"pairs=$full")
    spark.stop()
  }
}
