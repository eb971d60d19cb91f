package graft.operators

import org.apache.spark.sql.DataFrame

/** Adaptive parallelism guard for CPU-bound map stages. Local test
  * corpora are single-row-group parquet files — one scan task — which
  * serializes per-row compute (signatures, scoring, regex passes). At
  * production scale inputs have thousands of splits and this is a
  * no-op; the repartition only fires when the incoming data is small
  * enough that the scan cannot reach the cluster's parallelism —
  * i.e. exactly when the shuffled volume is small.
  *
  * The probe reads the OPTIMIZED LOGICAL plan's size statistics (file
  * sources report exact byte counts) instead of `df.rdd`'s partition
  * count: materializing the RDD compiles a physical plan outside AQE
  * for that subtree, while the stats probe stops at the logical layer
  * and leaves planning to the real execution.
  */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    // under maxPartitionBytes * target bytes the scan yields fewer
    // than `target` splits — spread it; above, splits already abound
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size < BigInt(maxSplit) * target) df.repartition(target) else df
  }
}
