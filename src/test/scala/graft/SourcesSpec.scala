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

  test("jsonlPermissive captures malformed lines, parses the rest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl_bad").toFile
    val f = new java.io.File(dir, "part-0.json")
    Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "ok one"}
        |{"doc_id": 2 "text": "missing comma"}
        |{"doc_id": 3, "text": "ok two"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val df = Tables.jsonlPermissive(spark, f.getAbsolutePath, schema).collect()
    val good = df.filter(_.isNullAt(2))
    val bad = df.filter(!_.isNullAt(2))
    assert(good.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(bad.length == 1 && bad(0).getString(2).contains("missing comma"))
  }

  test("parquetMerged unions evolving schemas; old files surface nulls") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toFile.getAbsolutePath + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.mode("append").parquet(dir)
    val merged = Tables.parquetMerged(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2")), "old file must null new col")
    assert(rows(1).getDouble(rows(1).fieldIndex("v2")) == 9.5)
    // a plain read without mergeSchema keeps ONE footer's schema
    assert(spark.read.parquet(dir).columns.length <= 3)
  }

  test("ORC round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft_orc").toFile.getAbsolutePath + "/docs"
    val src = Tables.load(spark, sf001, "documents").limit(50)
    Tables.writeOrc(src, dir)
    val back = Tables.orc(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 50)
    // pushdown contract: a doc_id filter reaches the ORC scan
    val plan = back.filter(org.apache.spark.sql.functions.col("doc_id") < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]") ||
      plan.contains("LessThan(doc_id,10)"), s"filter not pushed:\n$plan")
  }

  test("XML round-trip preserves rows; rowTag honored") {
    val dir = Files.createTempDirectory("graft_xml").toFile.getAbsolutePath + "/docs"
    val src = Tables.load(spark, sf001, "documents").limit(25)
      .select("doc_id", "source", "lang") // scalar columns: XML-safe
    Tables.writeXml(src, dir, rowTag = "doc")
    val back = Tables.xml(spark, dir, rowTag = "doc")
    assert(back.count() == 25)
    assert(back.columns.sorted.toSeq == Seq("doc_id", "lang", "source"))
    // values carry: the id set survives the round trip exactly
    val ids = back.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = src.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == want, s"ids diverged: ${ids.size} vs ${want.size}")
  }

  test("parquet compression-codec matrix round-trips and tags files") {
    // the three codecs a real lake mixes: snappy (default, fast),
    // gzip (legacy interchange), zstd (modern ratio/speed) — identical
    // rows back regardless of codec, and the codec visible in the
    // file name (the partition-inventory contract)
    val src = Tables.load(spark, sf001, "documents").limit(40)
      .orderBy("doc_id")
    val expected = src.collect().map(_.getLong(0)).toSeq
    for ((codec, tag) <- Seq("snappy" -> "snappy", "gzip" -> ".gz.",
        "zstd" -> "zstd")) {
      val dir = Files.createTempDirectory(s"graft_codec_$codec").toFile
        .getAbsolutePath + "/docs"
      src.write.option("compression", codec).parquet(dir)
      val files = new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.getName)
      assert(files.nonEmpty && files.forall(_.contains(tag)),
        s"$codec not in file names: ${files.toSeq}")
      val back = spark.read.parquet(dir).orderBy("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(back == expected, s"$codec round-trip mismatch")
    }
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

  test("fixedWidth parses positions, trims, casts, and NULLs short lines") {
    val dir = java.nio.file.Files.createTempDirectory("fw").toFile
    val f = new java.io.File(dir, "data.txt")
    java.nio.file.Files.write(f.toPath, java.util.Arrays.asList(
      "001ALICE     2024-01-15 42.5",
      "002BOB       2024-02-20 -1.0",
      "003          2024-03-01  7.25", // blank name -> NULL
      "004CAROL",                      // short line -> NULLs past the end
      "005DAVE      20XX-BAD-9   1.5")) // mangled date -> try_cast NULL
    val df = Tables.fixedWidth(spark, f.getAbsolutePath, Seq(
      ("id", 1, 3, "int"), ("name", 4, 10, "string"),
      ("d", 14, 10, "date"), ("v", 24, 6, "double")))
    val got = df.orderBy("id").collect().map { r =>
      (r.getInt(0), Option(r.get(1)), Option(r.get(2)).map(_.toString),
        Option(r.get(3)))
    }.toSeq
    assert(got == Seq(
      (1, Some("ALICE"), Some("2024-01-15"), Some(42.5)),
      (2, Some("BOB"), Some("2024-02-20"), Some(-1.0)),
      (3, None, Some("2024-03-01"), Some(7.25)),
      (4, Some("CAROL"), None, None),
      (5, Some("DAVE"), None, Some(1.5))), s"got $got")
  }

  test("Avro: typed round-trip across partitions (null/deflate codecs)") {
    import graft.sources.Avro
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("ok", BooleanType),
      StructField("blob", BinaryType), StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("amt", DecimalType(12, 2)),
      StructField("tags", ArrayType(StringType)),
      StructField("props", MapType(StringType, LongType)),
      StructField("nested", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    val rows = Seq(
      Row(1L, "alice", 2.5, true, Array[Byte](1, 2), java.sql.Date.valueOf("2024-01-15"),
        java.sql.Timestamp.valueOf("2024-01-15 10:30:00.123456"),
        new java.math.BigDecimal("12345.67"), Seq("x", "y"),
        Map("k" -> 9L), Row(7, "inner")),
      Row(2L, null, null, null, null, null, null, null, null, null, null),
      Row(3L, "bob", -1.0, false, Array.empty[Byte], java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        new java.math.BigDecimal("-0.01"), Seq.empty[String],
        Map.empty[String, Long], Row(0, "")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    for (codec <- Seq("null", "deflate")) {
      val dir = Files.createTempDirectory(s"avro_$codec").toString
      Avro.write(df, dir, codec = codec)
      val back = Avro.read(spark, dir)
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq, back.schema.treeString)
      def norm(r: Row) = r.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      }.toString
      val a = df.orderBy("id").collect().map(norm).toSeq
      val b = back.orderBy("id").collect().map(norm).toSeq
      assert(a == b, s"codec=$codec\n$a\n$b")
      // one container file per non-empty partition, deterministic names
      val parts = new java.io.File(dir).list().filter(_.endsWith(".avro")).sorted
      assert(parts.length == 2 && parts.forall(_.startsWith("part-")), parts.toSeq)
    }
  }

  test("Avro: interop read of a library-written file incl. timestamp-millis") {
    import graft.sources.Avro
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // hand-built writer schema: proves the reader handles files graft
    // did NOT write — non-nullable fields, enum, timestamp-MILLIS
    val s = SchemaBuilder.record("ev").fields()
      .requiredLong("id")
      .requiredString("kind")
      .name("at").`type`(org.apache.avro.LogicalTypes.timestampMillis()
        .addToSchema(Schema.create(Schema.Type.LONG))).noDefault()
      .endRecord()
    val dir = Files.createTempDirectory("avro_interop").toFile
    val f = new java.io.File(dir, "ext.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](s))
    w.create(s, f)
    val r1 = new GenericData.Record(s)
    r1.put("id", 10L); r1.put("kind", "click"); r1.put("at", 1705314600123L)
    w.append(r1); w.close()
    val back = Avro.read(spark, dir.toString).collect()
    assert(back.length == 1)
    val row = back.head
    assert(row.getAs[Long]("id") == 10L && row.getAs[String]("kind") == "click")
    assert(row.getAs[java.sql.Timestamp]("at").getTime == 1705314600123L, row)
    // general (non-null) unions: rejected up front, never guessed
    val bad = Schema.createUnion(java.util.Arrays.asList(
      Schema.create(Schema.Type.INT), Schema.create(Schema.Type.STRING)))
    val e = intercept[IllegalArgumentException](Avro.sparkType(bad))
    assert(e.getMessage.contains("union"), e.getMessage)
  }

  test("Config: reference-shaped INI round-trips to Spark props + OS env") {
    import graft.sources.Config
    // the reference's config.cfg shape (etl.py:16-33): [OS] env keys
    // for the launcher, [Spark] Memory / Broadcast_Timeout aliases
    val cfg = java.io.File.createTempFile("graft", ".cfg")
    java.nio.file.Files.writeString(cfg.toPath,
      """; session knobs
        |[OS]
        |JAVA_HOME = /usr/lib/jvm/java-17
        |PATH = /usr/bin:/bin
        |
        |[Spark]
        |Memory = 15g
        |Broadcast_Timeout  = 36000s
        |# a dotted property passes through verbatim
        |spark.sql.shuffle.partitions : 64
        |Memory = 16g
        |""".stripMargin)
    val ini = Config.parseIniFile(cfg.getAbsolutePath)
    assert(Config.sparkConf(ini) == Map(
      "spark.driver.memory" -> "16g", // later duplicate wins
      "spark.sql.broadcastTimeout" -> "36000s",
      "spark.sql.shuffle.partitions" -> "64"), Config.sparkConf(ini))
    assert(Config.osEnv(ini) == Map(
      "java_home" -> "/usr/lib/jvm/java-17", "path" -> "/usr/bin:/bin"))
    // unknown non-dotted [Spark] key: rejected, not silently dropped
    val bad = Config.parseIni("[Spark]\nMemroy = 15g")
    val e = intercept[IllegalArgumentException](Config.sparkConf(bad))
    assert(e.getMessage.contains("memroy"), e.getMessage)
    // malformed line: parse error with the line number
    val p = intercept[IllegalArgumentException](Config.parseIni("[S]\nnope"))
    assert(p.getMessage.contains("line 2"), p.getMessage)
    // sessionFromIni applies the conf and getOrCreates — against the
    // suite's live context, runtime-settable props must land
    val rt = java.io.File.createTempFile("graft", ".cfg")
    java.nio.file.Files.writeString(rt.toPath,
      "[Spark]\nspark.sql.cbo.enabled = true")
    val s = Config.sessionFromIni(rt.getAbsolutePath)
    assert(s.conf.get("spark.sql.cbo.enabled") == "true")
    s.conf.set("spark.sql.cbo.enabled", "false") // restore default
  }
}
