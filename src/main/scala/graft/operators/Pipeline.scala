package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => sf}
import graft.dq.QualityChecks
import graft.sources.Tables

/** The reference's end-to-end ETL orchestration (etl.py main, 598-631):
  * build every dimension and the fact, write them as partitioned
  * parquet, then run the three data-quality checks. Returns the check
  * results as a DataFrame so callers (or schedulers) can gate on them —
  * no driver-side booleans, no collects of data rows.
  */
object Pipeline {

  case class StarSchemaTables(factSales: DataFrame, dimCustomer: DataFrame,
                              dimDate: DataFrame, dimPart: DataFrame,
                              dimSupplier: DataFrame)

  def buildStarSchema(spark: SparkSession, dir: String): StarSchemaTables =
    StarSchemaTables(
      factSales = StarSchema.factSales(spark, dir),
      dimCustomer = StarSchema.dimCustomer(spark, dir),
      dimDate = DateOps.dateDimension(Seq(
        Tables.load(spark, dir, "orders") -> sf.to_date(sf.col("o_orderdate")),
        Tables.load(spark, dir, "lineitem") -> sf.to_date(sf.col("l_shipdate")))),
      dimPart = Tables.load(spark, dir, "part"),
      dimSupplier = Tables.load(spark, dir, "supplier"))

  /** Build, write (facts partitioned by return flag — the reference
    * partitions every sink, etl.py:251/485), and quality-check.
    * Returns one row per check: (check_name, passed 0/1). */
  def runStarSchema(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val t = buildStarSchema(spark, dir)
    StarSchema.writePartitioned(t.factSales, s"$outDir/fact_sales", Seq("l_returnflag"))
    StarSchema.writePartitioned(t.dimCustomer, s"$outDir/dim_customer", Seq("region"))
    t.dimDate.write.mode("overwrite").parquet(s"$outDir/dim_date")
    t.dimPart.write.mode("overwrite").parquet(s"$outDir/dim_part")
    t.dimSupplier.write.mode("overwrite").parquet(s"$outDir/dim_supplier")

    val written = Seq("fact_sales", "dim_customer", "dim_date", "dim_part", "dim_supplier")
      .map(n => n -> spark.read.parquet(s"$outDir/$n"))

    // Check 1: every table non-empty (validate_model_row_count).
    val rowChecks = written.map { case (n, df) =>
      df.agg((sf.count(sf.lit(1)) > 0).cast("int").as("passed"))
        .select(sf.lit(s"rowcount_$n").as("check_name"), sf.col("passed"))
    }
    // Check 2: unique keys on the dims (validate_model_unique_keys).
    val keyOf = Map("dim_customer" -> "c_custkey", "dim_date" -> "d",
      "dim_part" -> "p_partkey", "dim_supplier" -> "s_suppkey")
    val keyChecks = written.collect { case (n, df) if keyOf.contains(n) =>
      df.agg((sf.count(sf.lit(1)) === sf.count_distinct(sf.col(keyOf(n))))
          .cast("int").as("passed"))
        .select(sf.lit(s"unique_$n").as("check_name"), sf.col("passed"))
    }
    // Check 3: invariant on the fact (validate_country_data analog).
    val factOk = QualityChecks.predicateViolations(
        written.toMap.apply("fact_sales"), "fact_quantity_positive",
        sf.col("quantity") > 0)
      .select(sf.col("check_name"),
        (sf.col("violations") === 0).cast("int").as("passed"))

    (rowChecks ++ keyChecks :+ factOk).reduce(_ union _).orderBy("check_name")
  }
}
