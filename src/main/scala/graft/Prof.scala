package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => sf}
import graft.operators.Par

/** Dev tool: stage-by-stage wall times for the MinHash-LSH pipeline.
  * Usage: runMain graft.Prof [sfDir]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.{functions => gf}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = sources.Tables.load(spark, sfDir, "documents")
    // warmup the stack
    docs.select(sf.md5(sf.col("text"))).write.format("noop").mode("overwrite").save()

    val base = Par.spread(docs.select(
      sf.col("doc_id").cast("long").as("id"),
      gf.wordShingles(sf.col("text")).as("sh0")))
      .select(sf.col("id"),
        gf.minHashBands(sf.col("sh0"), 144, 6).as("bands"),
        gf.hashShingles(sf.col("sh0")).as("shh"))
      .withColumn("sz", sf.size(sf.col("shh")))
      .persist()
    time("base materialize")(base.count())

    val buckets = base.select(sf.col("id"), sf.col("bands"), sf.col("sz"),
      sf.posexplode(sf.col("bands")).as(Seq("band", "bh"))).persist()
    time("buckets materialize")(buckets.count())

    val ba = buckets.select(sf.col("band"), sf.col("bh"),
      sf.col("id").as("a_id"), sf.col("bands").as("bands_a"), sf.col("sz").as("sz_a"))
    val bb = buckets.select(sf.col("band").as("band_b"), sf.col("bh").as("bh_b"),
      sf.col("id").as("b_id"), sf.col("bands").as("bands_b"), sf.col("sz").as("sz_b"))
    val joined = ba.join(bb,
      sf.col("band") === sf.col("band_b") && sf.col("bh") === sf.col("bh_b") &&
        sf.col("a_id") < sf.col("b_id"))
    println("[prof] raw collisions: " + time("raw collision count")(joined.count()))

    val sized = joined.filter(sf.least(sf.col("sz_a"), sf.col("sz_b")).cast("double") >=
      sf.greatest(sf.col("sz_a"), sf.col("sz_b")).cast("double") * 0.9)
    println("[prof] size-filtered: " + time("size filter count")(sized.count()))

    val candidates = sized
      .filter(gf.prefixAllDiffer(sf.col("bands_a"), sf.col("bands_b"), sf.col("band")))
      .select("a_id", "b_id")
    println("[prof] candidates: " + time("first-witness candidates")(candidates.count()))

    val shA = base.select(sf.col("id").as("a_id"), sf.col("shh").as("sh_a"))
    val shB = base.select(sf.col("id").as("b_id"), sf.col("shh").as("sh_b"))
    val verified = candidates.join(shA, "a_id").join(shB, "b_id")
      .select(sf.col("a_id"), sf.col("b_id"),
        sf.round(gf.jaccardSortedLong(sf.col("sh_a"), sf.col("sh_b")), 4).as("jaccard"))
      .filter(sf.col("jaccard") >= 0.9)
    println("[prof] verified: " + time("verify")(verified.count()))

    time("full pipeline incl. sort")(
      verified.orderBy("a_id", "b_id").write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
