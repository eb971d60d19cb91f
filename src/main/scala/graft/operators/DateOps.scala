package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => sf}
import graft.{functions => gf}

/** Date-dimension construction (reference dim_Date, etl.py:447-487).
  *
  * Scale notes: each input is projected to the single date column
  * *before* union/distinct so the parquet scan reads one column
  * (ReadSchema pruning); the distinct then runs over at most a few
  * thousand distinct days regardless of fact size, with map-side
  * partial aggregation absorbing almost everything pre-shuffle.
  */
object DateOps {

  /** Expand a DATE column into the reference's dim_Date attributes. */
  def expandDate(df: DataFrame, dateCol: String): DataFrame = {
    val d = sf.col(dateCol)
    df.withColumn("date_key", gf.dateToSasDays(d))
      .withColumn("year", sf.year(d))
      .withColumn("month", sf.month(d))
      .withColumn("day", sf.dayofmonth(d))
      .withColumn("week", sf.weekofyear(d))
      .withColumn("dow", sf.dayofweek(d))
      .withColumn("is_weekend", gf.isWeekend(d))
      .withColumn("season", gf.season(sf.month(d)))
  }

  /** Union-distinct several (df, dateExpr) inputs into one date dim
    * (reference: arrdate ∪ depdate, etl.py:450-453). */
  def dateDimension(inputs: Seq[(DataFrame, Column)]): DataFrame = {
    val dates = inputs
      .map { case (df, c) => df.select(c.cast("date").as("d")) }
      .reduce(_ union _)
      .where(sf.col("d").isNotNull)
      .distinct()
    expandDate(dates, "d")
  }
}
