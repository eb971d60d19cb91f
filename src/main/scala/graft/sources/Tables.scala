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
  //
  // Lifetime: entries are evicted when their owning CONTEXT stops (the
  // onApplicationEnd listener below — Spark has no per-session stop
  // event), plus a sweep on every load that drops entries whose
  // context has since stopped, so dead sessions can't accumulate
  // cached relations across a long-lived process that cycles
  // sessions/contexts. Staleness: the cached FileIndex
  // snapshots the file listing at first load — a path REWRITTEN within
  // the same session (compact / writeClustered / writePartitioned over
  // a previously-loaded dir) must be `invalidate`d before reloading.
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private val cleanupHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    relationCache.keySet.removeIf(_._1.sparkContext.isStopped)
    cleanupHooked.removeIf((s: SparkSession) => s.sparkContext.isStopped)
    if (cleanupHooked.add(spark)) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            relationCache.keySet.removeIf(_._1 eq spark)
            cleanupHooked.remove(spark)
          }
        })
    }
    relationCache.computeIfAbsent((spark, dir, name), { _ =>
      if (name == "events") loadEvents(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    })
  }

  /** Drop cached relations under `dir` (all sessions; optionally one
    * table). Call after rewriting a path in-session so the next `load`
    * re-lists files instead of serving the stale FileIndex. */
  def invalidate(dir: String, name: String = null): Unit =
    relationCache.keySet.removeIf(k => k._2 == dir && (name == null || k._3 == name))

  /** events.ts layout varies by producer: TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects, so it's read as a long (legacy
    * conf) and converted with integer `div` (a double division would
    * lose precision past 2^53 ns) — or plain TIMESTAMP(MICROS),
    * which lands as TIMESTAMP_NTZ and only needs the session-timezone
    * cast to the TimestampType the operators expect. Dispatch on the
    * LOADED schema, not an assumed one, so both vintages read. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.{functions => sf}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long vintage
        raw.withColumn("ts", sf.timestamp_micros(sf.expr("ts div 1000")))
      case TimestampNTZType => // micros vintage: same wall time, LTZ type
        raw.withColumn("ts", sf.col("ts").cast("timestamp"))
      case _ => raw
    }
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

  /** JSON-lines corpus source — the interchange format most raw text
    * dumps arrive in. An explicit schema skips Spark's whole-file
    * inference pass (a full extra scan at 100 TB) and pins types the
    * way a production pipeline must; pass null only for ad-hoc
    * exploration. Line-delimited JSON splits like any text file, so
    * parallelism is byte-range-based exactly as for CSV. */
  def jsonl(spark: SparkSession, path: String,
            schema: org.apache.spark.sql.types.StructType = null): DataFrame = {
    val r = spark.read
    (if (schema != null) r.schema(schema) else r).json(path)
  }

  /** JSON-lines sink (one object per line, gzip-splittable upstream
    * tooling reads it anywhere). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL ingestion with per-line fault capture: malformed lines land
    * in a `_corrupt_record` column instead of failing the job (raw
    * dumps ALWAYS contain a few broken lines, and at 100 TB a fail-on-
    * first-error read is unusable). PERMISSIVE is Spark's scan-level
    * behavior — no driver-side row handling anywhere. */
  def jsonlPermissive(spark: SparkSession, path: String,
                      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Schema-evolution read: parquet batches written over time gain
    * columns; `mergeSchema` unions the file footers so old files
    * surface the new columns as nulls. Footer merging costs a distrib-
    * uted footer read — enable per-path like this, not globally. */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** ORC source/sink — second columnar format (bridges Hive-side
    * producers); same predicate-pushdown + column-pruning contract as
    * parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** XML source via Spark 4's built-in `xml` format (the spark-xml
    * package folded into core as of 4.0) — the remaining interchange
    * format a real ingestion edge still meets (B2B feeds, sitemaps,
    * legacy exports) that parquet/CSV/JSONL/ORC/Avro/fixed-width
    * don't cover. One row per `rowTag` element; schema is inferred
    * (or pass a read schema upstream for production contracts). */
  def xml(spark: SparkSession, path: String, rowTag: String = "row"): DataFrame =
    spark.read.format("xml").option("rowTag", rowTag).load(path)

  /** XML sink — one `rowTag` element per row under `rootTag`,
    * overwrite semantics matching the other sinks here. */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row",
               rootTag: String = "rows"): Unit =
    df.write.mode("overwrite").format("xml")
      .option("rowTag", rowTag).option("rootTag", rootTag).save(path)

  /** Fixed-width file parse — the mainframe/legacy-export format the
    * reference's SAS-adjacent world ships (column positions, no
    * delimiters). `colSpecs` gives (name, 1-based start, width, type);
    * each column is one `substring` + `trim` + cast, all codegen'd
    * scan-side expressions — the file splits by byte ranges like any
    * text source, so parallelism and scale behavior match CSV.
    * Non-castable and blank cells go NULL (`try_cast`, not ANSI
    * fail-on-first-error — legacy exports ALWAYS contain a few
    * mangled cells; validate with dq.QualityChecks). Short lines
    * yield NULL for columns past the end. */
  def fixedWidth(spark: SparkSession, path: String,
                 colSpecs: Seq[(String, Int, Int, String)]): DataFrame = {
    import org.apache.spark.sql.{functions => sf}
    require(colSpecs.nonEmpty, "need at least one column spec")
    require(colSpecs.forall { case (_, s, w, _) => s >= 1 && w >= 1 },
      "column starts are 1-based, widths >= 1")
    require(colSpecs.forall { case (n, _, _, _) => n.matches("[A-Za-z_][A-Za-z0-9_]*") },
      "column names must be plain identifiers")
    val raw = spark.read.text(path)
    raw.select(colSpecs.map { case (name, start, width, _) =>
      val cell = sf.trim(sf.substring(sf.col("value"), start, width))
      sf.when(sf.length(cell) === 0, sf.lit(null))
        .otherwise(cell).as(name)
    }: _*)
      .selectExpr(colSpecs.map { case (name, _, _, tpe) =>
        s"try_cast($name AS $tpe) AS $name"
      }: _*)
  }
}
