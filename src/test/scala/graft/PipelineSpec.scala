package graft

import java.nio.file.Files

import graft.operators.Pipeline

class PipelineSpec extends SparkFunSuite {

  test("end-to-end star-schema ETL: build, write partitioned, quality-check") {
    val out = Files.createTempDirectory("graft_etl").toString
    val checks = Pipeline.runStarSchema(spark, sf001, out)
    val rows = checks.collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(rows.size == 10)
    assert(rows.values.forall(_ == 1), s"failed checks: ${rows.filter(_._2 == 0).keys}")
    // partitioned layout on disk
    val factDirs = new java.io.File(s"$out/fact_sales").listFiles()
      .map(_.getName).filter(_.startsWith("l_returnflag="))
    assert(factDirs.nonEmpty)
  }
}
