package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => sf}

/** Pivot (reference dim_Demographics race pivot, etl.py:216).
  *
  * The pivot values are passed explicitly: Spark then plans a single
  * aggregate pass with conditional sums (no extra distinct-values job —
  * one scan instead of two at 100 TB).
  */
object PivotOps {

  /** groupBy(groupCols).pivot(pivotCol, values).sum(valueCol), with
    * stable lowercase column aliases and nulls filled with `fill`. */
  def pivotSum(df: DataFrame, groupCols: Seq[String], pivotCol: String,
               values: Seq[String], valueCol: String,
               fill: Option[Double] = Some(0.0)): DataFrame = {
    val wide = df.groupBy(groupCols.map(sf.col): _*)
      .pivot(pivotCol, values)
      .sum(valueCol)
    val renamed = values.foldLeft(wide)((d, v) =>
      d.withColumnRenamed(v, s"${pivotCol.toLowerCase}_${v.toLowerCase}"))
    fill.map(f => renamed.na.fill(f)).getOrElse(renamed)
  }
}
