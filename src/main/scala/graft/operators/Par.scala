package graft.operators

import org.apache.spark.sql.DataFrame

/** Adaptive parallelism guard for CPU-bound map stages. Local test
  * corpora are single-row-group parquet files — one scan task — which
  * serializes per-row compute (signatures, scoring, regex passes). At
  * production scale inputs have thousands of splits and this is a
  * no-op; the repartition only fires when the incoming partition count
  * is far below the cluster's parallelism, i.e. exactly when the
  * shuffled volume is small.
  */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
