package graft

import java.nio.file.Files

import graft.sources.{LabelFile, Tables}

class SourcesSpec extends SparkFunSuite {

  test("parquet load of every corpus table") {
    Tables.names.foreach { t =>
      assert(Tables.load(spark, sf001, t).count() > 0, s"table $t empty")
    }
  }

  test("csv with custom delimiter and header") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "demo.csv")
    Files.writeString(f.toPath, "City;State;Count\nAtlanta;GA;10\nBoston;MA;20\n")
    val df = Tables.csv(spark, f.getAbsolutePath, delimiter = ";")
    assert(df.columns.toSeq == Seq("City", "State", "Count"))
    assert(df.count() == 2)
  }

  test("jsonl roundtrip preserves rows and explicit schema skips inference") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl").toFile.getAbsolutePath + "/docs"
    val src = Seq((1L, "alpha text", "en"), (2L, "beta text", "de"))
      .toDF("doc_id", "text", "lang")
    Tables.writeJsonl(src, dir)
    val back = Tables.jsonl(spark, dir, src.schema)
    // JSON sources force nullable; names and types must carry verbatim
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      "explicit schema names/types must be used verbatim")
    assert(back.orderBy("doc_id").collect().toSeq ==
      src.orderBy("doc_id").collect().toSeq)
    // inference path still reads the same rows (types may widen)
    assert(Tables.jsonl(spark, dir).count() == 2)
  }

  test("label-file section parse (SAS-labels style)") {
    val content =
      """value i94cntyl
        |   582 = 'MEXICO'
        |   236 = 'AFGHANISTAN'
        |   687 = 'INVALID: ARGENTINA' ;
        |value i94prtl
        |   'ALC' = 'ALCAN, AK' ;
        |""".stripMargin
    val pairs = LabelFile.section(content, "i94cntyl")
    assert(pairs == Seq("582" -> "MEXICO", "236" -> "AFGHANISTAN", "687" -> "INVALID: ARGENTINA"))
    val ports = LabelFile.section(content, "i94prtl")
    assert(ports == Seq("ALC" -> "ALCAN, AK"))
    assert(LabelFile.section(content, "missing").isEmpty)
    val df = LabelFile.toDF(spark, content, "i94cntyl", "code", "country")
    assert(df.count() == 3 && df.columns.toSeq == Seq("code", "country"))
  }

  test("fromPairs builds a typed two-column dim") {
    val df = Tables.fromPairs(spark, Seq(1 -> "Business", 2 -> "Pleasure"), "id", "type")
    assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq(1 -> "Business", 2 -> "Pleasure"))
  }
}
