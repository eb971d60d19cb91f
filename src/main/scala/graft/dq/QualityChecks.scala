package graft.dq

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => sf}
import graft.sources.Tables

/** Data-quality checks (reference etl.py:490-594) as *queries* returning
  * DataFrames rather than driver-side booleans — composable, and the
  * counts are distributed aggregations (no collect of data rows).
  */
object QualityChecks {

  /** (table_name, row_count) for each table — reference
    * validate_model_row_count. */
  def rowCounts(spark: SparkSession, dir: String,
                tables: Seq[String] = Tables.names): DataFrame =
    tables.map { t =>
      Tables.load(spark, dir, t)
        .agg(sf.count(sf.lit(1)).as("row_count"))
        .select(sf.lit(t).as("table_name"), sf.col("row_count"))
    }.reduce(_ union _).orderBy("table_name")

  /** Unique-key audit: total vs distinct key count per table — reference
    * validate_model_unique_keys. */
  def uniqueKey(spark: SparkSession, dir: String,
                specs: Seq[(String, Seq[String])]): DataFrame =
    specs.map { case (t, keys) =>
      Tables.load(spark, dir, t)
        .agg(
          sf.count(sf.lit(1)).as("total_rows"),
          sf.count_distinct(sf.col(keys.head), keys.tail.map(sf.col): _*)
            .as("distinct_keys"))
        .select(
          sf.lit(t).as("table_name"), sf.col("total_rows"), sf.col("distinct_keys"),
          (sf.col("total_rows") === sf.col("distinct_keys")).cast("int").as("is_unique"))
    }.reduce(_ union _).orderBy("table_name")

  /** Single-pass column profile: null count and distinct count per
    * column. One scan regardless of column count (all aggregates in one
    * HashAggregate), then the wide row is exploded to one row per
    * column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sf.sum(sf.col(c).isNull.cast("long")).as(s"__n_$c"),
      sf.count_distinct(sf.col(c)).as(s"__d_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(sf.explode(sf.array(cols.map(c => sf.struct(
        sf.lit(c).as("column_name"),
        sf.col(s"__n_$c").as("n_nulls"),
        sf.col(s"__d_$c").as("n_distinct"))): _*)).as("s"))
      .select("s.*")
      .orderBy("column_name")
  }

  /** Exact quantile profile of a numeric column per group: min, p25,
    * median, p75, p95, max. Exact percentiles sort within groups — for
    * 100 TB profiling prefer `approxDistinct`-style sketches; this is
    * the audit-grade variant. */
  def quantileProfile(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // One percentile aggregate with an array of requested points: a
    // single value buffer per group, not one per percentile (4x less
    // buffer merging); the scan is spread so partial aggregation isn't
    // serialized on few-split local inputs.
    val ps = sf.percentile(sf.col(valueCol),
      sf.lit(Array(0.25, 0.5, 0.75, 0.95)))
    graft.operators.Par.spread(df.select(groupCol, valueCol))
      .groupBy(sf.col(groupCol))
      .agg(
        sf.round(sf.min(valueCol), 4).as("v_min"),
        ps.as("__ps"),
        sf.round(sf.max(valueCol), 4).as("v_max"))
      .select(sf.col(groupCol),
        sf.col("v_min"),
        sf.round(sf.col("__ps").getItem(0), 4).as("p25"),
        sf.round(sf.col("__ps").getItem(1), 4).as("p50"),
        sf.round(sf.col("__ps").getItem(2), 4).as("p75"),
        sf.round(sf.col("__ps").getItem(3), 4).as("p95"),
        sf.col("v_max"))
      .orderBy(groupCol)
  }

  /** Sketch-based distinct counts (HyperLogLog++): the 100 TB-scale
    * variant of the unique-key audit — constant memory per column. */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    val aggs = cols.map(c => sf.approx_count_distinct(sf.col(c), rsd).as(s"__$c"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(sf.explode(sf.array(cols.map(c => sf.struct(
        sf.lit(c).as("column_name"), sf.col(s"__$c").as("approx_distinct"))): _*)).as("s"))
      .select("s.*")
      .orderBy("column_name")
  }

  /** Referential-integrity audit: rows of the child table whose foreign
    * key has no match in the parent (left_anti join — at scale this is
    * the same shuffle as the equi-join itself; a broadcast parent makes
    * it map-only). One row per declared relationship. */
  def fkOrphans(spark: SparkSession, dir: String,
                specs: Seq[(String, String, String, String)]): DataFrame =
    specs.map { case (child, fk, parent, pk) =>
      Tables.load(spark, dir, child)
        .join(Tables.load(spark, dir, parent),
          sf.col(fk) === sf.col(pk), "left_anti")
        .agg(sf.count(sf.lit(1)).as("orphans"))
        .select(sf.lit(s"$child.$fk -> $parent.$pk").as("relationship"),
          sf.col("orphans"))
    }.reduce(_ union _).orderBy("relationship")

  /** Count of rows violating an invariant — reference
    * validate_country_data (expects 0). */
  def predicateViolations(df: DataFrame, checkName: String, invariant: Column): DataFrame =
    df.filter(!invariant)
      .agg(sf.count(sf.lit(1)).as("violations"))
      .select(sf.lit(checkName).as("check_name"), sf.col("violations"))
}
