package graft

import org.apache.spark.sql.SparkSession

/** r14 optimization-round dev audit: sweep EVERY declared query and
  * emit one CSV row of physical-plan shape counters — Exchange / Sort
  * / join strategies / Generate / Window / ObjectHashAggregate nodes,
  * scan count, and whether any scan reports PushedFilters — so the
  * whole 499-query surface can be triaged for shuffle/join/pushdown
  * outliers without running 499 hand explains.
  *
  * Counts come from the FORMATTED explain string of the pre-execution
  * physical plan (AQE initial plan: join strategies may still improve
  * at runtime, so treat SMJ counts as upper bounds — the point is
  * finding cartesians, unexpected exchange stacks, and non-codegen
  * aggregates, which AQE does not remove).
  *
  * Usage: runMain graft.PlanAudit [sfDir] [outCsv] [nameFilter,csv]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outCsv = if (args.length > 1) args(1) else "/tmp/plan_audit.csv"
    val filter: String => Boolean =
      if (args.length > 2) { val s = args(2).split(",").toSet; s.contains }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", 10000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cols = Seq("query", "exchange", "reused_exchange", "sort", "smj",
      "bhj", "shj", "bnlj", "cartesian", "generate", "window",
      "objhashagg", "hashagg", "sortagg", "scans", "pushed_filters",
      "inmem", "error")
    val sb = new StringBuilder(cols.mkString(",") + "\n")
    def count(s: String, token: String): Int = {
      var n = 0; var i = s.indexOf(token)
      while (i >= 0) { n += 1; i = s.indexOf(token, i + token.length) }
      n
    }
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if filter(name)) {
      val row = try {
        val df = fn(spark, sfDir)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val ex = count(p, ") Exchange") + count(p, "- Exchange")
        Seq(name,
          ex,
          count(p, "ReusedExchange"),
          count(p, ") Sort ") + count(p, "- Sort "),
          count(p, "SortMergeJoin"),
          count(p, "BroadcastHashJoin"),
          count(p, "ShuffledHashJoin"),
          count(p, "BroadcastNestedLoopJoin"),
          count(p, "CartesianProduct"),
          count(p, "Generate"),
          count(p, ") Window") + count(p, "- Window"),
          count(p, "ObjectHashAggregate"),
          count(p, "HashAggregate") - count(p, "ObjectHashAggregate"),
          count(p, "SortAggregate"),
          count(p, "Scan parquet"),
          count(p, "PushedFilters: ["),
          count(p, "InMemoryTableScan"),
          "").mkString(",")
      } catch {
        case e: Throwable =>
          (Seq(name) ++ Seq.fill(16)("") :+
            e.getClass.getSimpleName).mkString(",")
      }
      sb.append(row + "\n")
      spark.catalog.clearCache()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outCsv), sb.toString)
    println(s"[plan-audit] wrote $outCsv")
    spark.stop()
  }
}
