package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source readers. Parquet is the primary format (reference reads
  * SAS-parquet via spark.read.load, etl.py:145); CSV with configurable
  * header/delimiter mirrors the demographics/temperatures reads
  * (etl.py:194, 406). All reads are plain DataSource V2 scans so column
  * pruning and predicate pushdown reach the files.
  */
object Tables {

  /** Test-corpus table names (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One analyzed relation per (session, path): re-loading a table
  // otherwise re-lists the directory and re-reads parquet footers on
  // EVERY query — pure driver-side fixed cost, multiplied by the
  // benchmark's 40+ queries. The cached DataFrame is immutable; reusing
  // it shares the resolved FileIndex + schema across queries.
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    relationCache.computeIfAbsent((spark, dir, name), { _ =>
      if (name == "events") loadEvents(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a long (legacy conf) and convert to a
    * microsecond timestamp with integer `div` (a double division would
    * lose precision past 2^53 ns). */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.{functions => sf}
    raw.withColumn("ts", sf.timestamp_micros(sf.expr("ts div 1000")))
  }

  def csv(spark: SparkSession, path: String,
          delimiter: String = ",", header: Boolean = true,
          inferSchema: Boolean = false): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  /** Tiny in-memory dimension (reference dim_I94visa, etl.py:259-283). */
  def fromPairs(spark: SparkSession, pairs: Seq[(Int, String)],
                keyCol: String, valCol: String): DataFrame = {
    import spark.implicits._
    pairs.toDF(keyCol, valCol)
  }
}
