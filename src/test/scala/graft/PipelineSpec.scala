package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => sf}
import graft.operators.Pipeline
import graft.sources.Tables

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

  test("end-to-end curation: funnel report, stage effects, split-partitioned write") {
    import spark.implicits._
    val docs = Tables.load(spark, sf001, "documents")
    // benchmark = a slice of the corpus itself -> guaranteed contamination
    val benchmark = docs.filter(sf.col("doc_id") % 10 === 0)
      .select("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft_curation").toString
    val report = Pipeline.runCuration(spark, docs, benchmark, out,
      budgets = Map("src0" -> 1000L), defaultBudget = 2000L,
      qualityFrac = 0.5, nearDupThreshold = 0.9)
    val funnel = report.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(funnel.map(_._1) == Seq("00_input", "01_normalize", "02_pii_scrub",
      "03_quality_gate", "04_exact_dedup", "05_near_dedup", "06_decontaminated",
      "07_mixture", "08_split"), s"stages ${funnel.map(_._1)}")
    val counts = funnel.map(_._2)
    // normalize and scrub preserve rows; every later stage only removes
    assert(counts(1) == counts(0) && counts(2) == counts(1))
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a })
    // the gates actually fire on this corpus: quality cut, dedup, and
    // decontamination each drop something; everything stays non-empty
    assert(counts(3) < counts(2) && counts(5) < counts(3) && counts(6) < counts(5))
    assert(counts.last > 0)
    // the written corpus is split-partitioned and matches the final count
    val written = spark.read.parquet(s"$out/corpus")
    assert(written.count() == counts.last)
    val splitDirs = new java.io.File(s"$out/corpus").listFiles()
      .map(_.getName).filter(_.startsWith("split="))
    assert(splitDirs.nonEmpty && splitDirs.forall(
      Seq("split=train", "split=val", "split=test").contains(_)))
    // the COMPOSED one-plan variant is stage-for-stage equivalent: same
    // params -> its per-(split, source) rollup totals the same docs the
    // eager runCuration funnel kept at 08_split
    val composed = Pipeline.curationPlan(spark, docs, benchmark,
      budgets = Map("src0" -> 1000L), defaultBudget = 2000L,
      qualityFrac = 0.5, nearDupThreshold = 0.9,
      splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val rollup = composed.collect()
    assert(rollup.map(_.getAs[Long]("n_docs")).sum == counts.last,
      s"composed total != runCuration 08_split: ${rollup.mkString("; ")}")
    // and it carries real token mass per cell
    assert(rollup.forall(r => r.getAs[Long]("n_tokens") > 0))
    spark.catalog.clearCache() // release curationPlan's lazy persists
  }
}
