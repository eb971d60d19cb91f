package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => sf}

/** Event-table analytics. `windowedAgg` is written so the identical
  * transform runs in batch here and under Structured Streaming in
  * graft.streaming.EventStream (same groupBy(window(...)) plan).
  */
object EventOps {

  /** Tumbling-window aggregate per event_type. window_start is emitted
    * as a formatted string: stable across engines and timezone-naive
    * oracles. */
  def windowedAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(sf.window(sf.col("ts"), width).as("w"), sf.col("event_type"))
      .agg(
        sf.count(sf.lit(1)).as("n_events"),
        // Exact decimal sum -> double: a plain double sum depends on
        // partition merge order and drifts in the last ulp at scale.
        sf.sum(sf.col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        sf.count(sf.col("user_id")).as("n_user_rows"))
      .select(
        sf.date_format(sf.col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        sf.col("event_type"), sf.col("n_events"), sf.col("sum_value"), sf.col("n_user_rows"))
      .orderBy("window_start", "event_type")
}
