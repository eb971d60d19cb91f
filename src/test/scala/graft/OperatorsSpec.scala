package graft

import java.nio.file.Files

import org.apache.spark.sql.{functions => sf}
import graft.operators._
import graft.dq.QualityChecks
import graft.sources.Tables

class OperatorsSpec extends SparkFunSuite {
  import spark.implicits._

  test("TopK.perKey equals the window-rank model and plans without a window") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 7.0), (1L, 12L, 7.0), (1L, 13L, 1.0),
      (2L, 20L, 3.0), (3L, 30L, 9.0)).toDF("k", "id", "s")
    val got = TopK.perKey(spark, df, "k", "id", "s", k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // ties on score break by id asc: (1, 11) before (1, 12)
    assert(got.toSeq == Seq(
      (1L, 1, 11L, 7.0), (1L, 2, 12L, 7.0),
      (2L, 1, 20L, 3.0), (3L, 1, 30L, 9.0)))
    val plan = TopK.perKey(spark, df, "k", "id", "s", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"group-limit must not sort per group:\n$plan")
  }

  test("Cleaning: dropNulls / fill / dedup / exclude / casts") {
    val df = Seq(
      (Some(1), Some("a"), Some("keep me")),
      (None, Some("b"), Some("has SLOW word")),
      (Some(3), None, None),
      (Some(1), Some("a"), Some("keep me"))).toDF("id", "tag", "text")
    assert(Cleaning.dropNullsAny(df, "id", "tag").count() == 2)
    assert(Cleaning.dropNullsAll(df).count() == 4)
    assert(Cleaning.fillNulls(df, 0, Seq("id")).filter($"id" === 0).count() == 1)
    assert(Cleaning.dedupRows(df).count() == 3)
    assert(Cleaning.dedupRows(df, Seq("tag")).count() == 3)
    val kept = Cleaning.excludePatterns(df.na.drop(), "text", Seq("slow"))
    assert(kept.count() == 2 && kept.filter($"text".contains("SLOW")).count() == 0)
    val casted = Cleaning.castCols(df, "id" -> "double")
    assert(casted.schema("id").dataType.typeName == "double")
  }

  test("DateOps: expansion attributes on a known date") {
    val r = DateOps.expandDate(Seq("2024-01-06").toDF("s")
      .select(sf.to_date($"s").as("d")), "d").collect().head
    val m = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getInt(m("date_key")) == 23381)
    assert(r.getInt(m("year")) == 2024 && r.getInt(m("month")) == 1 && r.getInt(m("day")) == 6)
    assert(r.getInt(m("dow")) == 7 && r.getInt(m("is_weekend")) == 1)
    assert(r.getString(m("season")) == "Winter")
  }

  test("DateOps: dateDimension unions distinct dates from multiple frames") {
    val a = Seq("2024-01-01", "2024-01-02").toDF("x")
    val b = Seq("2024-01-02", "2024-01-03").toDF("y")
    val dim = DateOps.dateDimension(Seq(a -> sf.to_date($"x"), b -> sf.to_date($"y")))
    assert(dim.count() == 3)
  }

  test("PivotOps: explicit values, stable aliases, fill") {
    val df = Seq(("x", "A", 1.0), ("x", "B", 2.0), ("y", "A", 3.0)).toDF("g", "p", "v")
    val wide = PivotOps.pivotSum(df, Seq("g"), "p", Seq("A", "B"), "v")
    assert(wide.columns.toSeq == Seq("g", "p_a", "p_b"))
    val y = wide.filter($"g" === "y").collect().head
    assert(y.getDouble(1) == 3.0 && y.getDouble(2) == 0.0) // filled null
  }

  test("StarSchema: flagship revenue matches a manual recomputation") {
    val got = StarSchema.revenueByRegion(spark, sf001)
    val manual = spark.read.parquet(s"$sf001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf001/orders.parquet"), $"l_orderkey" === $"o_orderkey")
      .join(spark.read.parquet(s"$sf001/customer.parquet"), $"o_custkey" === $"c_custkey")
      .agg(sf.sum($"l_extendedprice".cast("decimal(18,2)") *
        (sf.lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)"))))
      .head().getDecimal(0)
    // revenue is DOUBLE (each group value exact in e4 cents); summing the
    // 25 group doubles reintroduces <=25 ulp of error vs the exact total.
    val summed = got.agg(sf.sum($"revenue")).head().getDouble(0)
    assert(math.abs(summed - manual.doubleValue()) / manual.doubleValue() < 1e-12)
    assert(got.count() == 25)
  }

  test("StarSchema: surrogate keys dense per partition") {
    val df = Seq((1, "n1"), (2, "n1"), (3, "n2")).toDF("id", "nk")
    val got = StarSchema.withSurrogateKey(df, Seq("nk"), Seq("id"))
    assert(got.filter($"nk" === "n1").select("sk").as[Int].collect().sorted.sameElements(Array(1, 2)))
  }

  test("StarSchema.dimAirport: splits, casts, type filter, dense keys by ident") {
    // raw CSV shape (all strings), reference notebook dim_Airport cell
    val raw = Seq(
      ("KSFO", "large_airport", "San Francisco Intl", "13", "NA", "US",
        "US-CA", "San Francisco", "KSFO", "SFO", "SFO", "37.618, -122.375"),
      ("00AK", "small_airport", "Lowell Field", "450", "NA", "US",
        "US-AK", "Anchor Point", "00AK", null, "00AK", "59.947, -151.692"),
      ("EHAM", "heliport", "Pad", "-11", "EU", "NL",
        "NL-NH", "Amsterdam", "EHAM", null, "EHAM", "52.308, 4.763"))
      .toDF("ident", "type", "name", "elevation_ft", "continent",
        "iso_country", "iso_region", "municipality", "gps_code",
        "iata_code", "local_code", "coordinates")
    val got = StarSchema.dimAirport(raw,
      keepTypes = Seq("small_airport", "medium_airport", "large_airport"))
      .collect()
    assert(got.length == 2) // heliport filtered
    val byIdent = got.map(r => r.getAs[String]("ident") -> r).toMap
    val ak = byIdent("00AK")
    assert(ak.getAs[Long]("airport_key") == 1L && // dense 1..n by ident
      byIdent("KSFO").getAs[Long]("airport_key") == 2L)
    assert(ak.getAs[String]("country") == "US" && ak.getAs[String]("state") == "AK")
    assert(ak.getAs[Int]("elevation_ft") == 450)
    assert(ak.getAs[Double]("latitude") == 59.947 &&
      ak.getAs[Double]("longitude") == -151.692)
    // iata_code (mostly-null in the source) is dropped from the dim
    assert(!got.head.schema.fieldNames.contains("iata_code"))
  }

  test("Geo: haversine textbook distance; grid radius join = quadratic twin") {
    import spark.implicits._
    // Paris <-> London great-circle ~343.5 km
    val pl = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(sf.col("a"), sf.col("b"), sf.col("c"), sf.col("d")))
      .head().getDouble(0)
    assert(math.abs(pl - 343.5) < 1.5, s"got $pl km")
    // radius join: boundary-inclusive, cross-cell neighbors found
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 0.5), (3L, 3.0, 4.0),
      (4L, 10.0, 10.0)).toDF("id", "lat", "lon")
    val got = Geo.withinRadiusPairs(pts, "id", "lat", "lon", radiusDeg = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), got.toString)
    assert(got((1L, 2L)) == 0.5 && got((1L, 3L)) == 5.0, got.toString) // <= r inclusive
    // adjacent-cell pair straddling a cell boundary must be found
    val edge = Seq((1L, 0.99, 0.0), (2L, 1.01, 0.0)).toDF("id", "lat", "lon")
    val ge = Geo.withinRadiusPairs(edge, "id", "lat", "lon", radiusDeg = 1.0)
      .collect()
    assert(ge.length == 1 && ge.head.getDouble(2) == 0.02, ge.mkString(";"))
  }

  test("StarSchema.abcClassification: hand 80/15/5 split, integer boundaries") {
    import spark.implicits._
    val df = Seq((1L, 0.5), (1L, 0.3), (2L, 0.15), (3L, 0.05))
      .toDF("k", "amt")
    val got = StarSchema.abcClassification(df, "k", "amt").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getString(4))).toMap
    assert(got(1L) == ((0.8, 0.8, 0.8, "A")), got.toString)   // cum = exactly 80%
    assert(got(2L) == ((0.15, 0.15, 0.95, "B")), got.toString) // cum = exactly 95%
    assert(got(3L) == ((0.05, 0.05, 1.0, "C")), got.toString)
  }

  test("StarSchema: partitioned parquet write round-trips") {
    val out = Files.createTempDirectory("graft_w").toString + "/fact"
    val df = Seq((1, "A", 2.0), (2, "B", 3.0)).toDF("id", "flag", "v")
    StarSchema.writePartitioned(df, out, Seq("flag"))
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("flag="))
    assert(dirs.toSet == Set("flag=A", "flag=B"))
    val back = spark.read.parquet(out)
    assert(back.count() == 2 && back.columns.contains("flag"))
  }

  test("StarSchema: compact bounds output file count; clustered write narrows file ranges") {
    val base = Files.createTempDirectory("graft_c").toString
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("v", sf.col("id") % 97)
      .repartition(37) // simulate the small-files problem
    StarSchema.compact(df, s"$base/compact", numFiles = 4)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$base/compact").length == 4)
    assert(spark.read.parquet(s"$base/compact").count() == 10000)
    StarSchema.writeClustered(df, s"$base/clustered", Seq("id"), numFiles = 4)
    val files = parquetFiles(s"$base/clustered")
    assert(files.length == 4)
    // each clustered file must cover a narrow, non-overlapping id range
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(sf.min("id"), sf.max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.toSeq.sliding(2).forall {
      case Seq((_, hi), (lo2, _)) => hi < lo2
      case _ => true
    }, ranges.mkString(","))
  }

  test("Tables.load caches the relation; invalidate picks up an in-session rewrite") {
    val base = Files.createTempDirectory("graft_stale").toString
    spark.range(0, 100).toDF("id").repartition(8)
      .write.parquet(s"$base/t.parquet")
    val first = graft.sources.Tables.load(spark, base, "t")
    assert(first.count() == 100 && first.inputFiles.length == 8)
    // the cache serves the SAME analyzed relation on a repeat load
    assert(graft.sources.Tables.load(spark, base, "t") eq first)
    // rewrite the path in-session (the compact-after-load shape)
    StarSchema.compact(spark.range(0, 50).toDF("id"), s"$base/t.parquet", numFiles = 2)
    graft.sources.Tables.invalidate(base, "t")
    val fresh = graft.sources.Tables.load(spark, base, "t")
    assert(!(fresh eq first), "invalidate must evict the cached relation")
    assert(fresh.count() == 50 && fresh.inputFiles.length == 2,
      s"stale file listing survived invalidate: ${fresh.inputFiles.toSeq}")
  }

  test("writeZOrdered shrinks per-file ranges on BOTH dimensions; range clustering cannot") {
    val base = Files.createTempDirectory("graft_zorder").toString
    // two independent uniform dimensions (deterministic hash spread)
    val df = spark.range(10000).select(
      (sf.pmod(sf.xxhash64($"id"), sf.lit(10000L))).as("x"),
      (sf.pmod(sf.xxhash64($"id" + 7), sf.lit(10000L))).as("y"))
    def meanRange(dir: String, c: String): Double = {
      val files = new java.io.File(dir).listFiles
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      val spans = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(sf.min(c), sf.max(c)).head()
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }
    StarSchema.writeZOrdered(df, s"$base/z", Seq("x", "y"), numFiles = 16)
    StarSchema.writeClustered(df, s"$base/r", Seq("x", "y"), numFiles = 16)
    // 16 z-files over 2 dims = a 4x4 grid: each file should cover a
    // fraction of BOTH ranges (boundary files may straddle two cells)
    assert(meanRange(s"$base/z", "x") < 0.6 * 10000, meanRange(s"$base/z", "x"))
    assert(meanRange(s"$base/z", "y") < 0.6 * 10000, meanRange(s"$base/z", "y"))
    // range clustering nails x but leaves y at ~the global range
    assert(meanRange(s"$base/r", "x") < 0.2 * 10000)
    assert(meanRange(s"$base/r", "y") > 0.8 * 10000, meanRange(s"$base/r", "y"))
  }

  test("EventOps: windowed agg equals manual hour bucketing") {
    val events = graft.sources.Tables.load(spark, sf001, "events")
    val got = EventOps.windowedAgg(events)
    val manual = events.groupBy(
        sf.date_format(sf.date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        $"event_type")
      .count()
    assert(got.count() == manual.count())
    assert(got.agg(sf.sum("n_events")).head().getLong(0) == events.count())
  }

  test("QualityChecks: approx distinct within tolerance of exact") {
    val cust = graft.sources.Tables.load(spark, sf001, "customer")
    val approx = graft.dq.QualityChecks.approxDistinct(cust,
      Seq("c_custkey", "c_mktsegment")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactKeys = cust.select("c_custkey").distinct().count()
    val exactSeg = cust.select("c_mktsegment").distinct().count()
    assert(math.abs(approx("c_custkey") - exactKeys).toDouble / exactKeys < 0.05)
    assert(approx("c_mktsegment") == exactSeg) // tiny cardinality: exact
  }

  test("QualityChecks: approx quantile profile tracks the exact one") {
    val li = graft.sources.Tables.load(spark, sf001, "lineitem")
    val exact = graft.dq.QualityChecks.quantileProfile(li, "l_returnflag", "l_extendedprice")
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.dq.QualityChecks.approxQuantileProfile(li, "l_returnflag", "l_extendedprice")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    for (k <- exact.keys; c <- Seq("v_min", "v_max")) // extremes are exact in both
      assert(exact(k).getAs[Double](c) == approx(k).getAs[Double](c))
    for (k <- exact.keys; c <- Seq("p25", "p50", "p75", "p95")) {
      val e = exact(k).getAs[Double](c)
      val a = approx(k).getAs[Double](c)
      assert(math.abs(a - e) / math.max(math.abs(e), 1.0) < 0.05,
        s"$k/$c: approx $a vs exact $e")
    }
  }

  test("QualityChecks: predicate violations count") {
    val df = Seq(1, 2, -3, 4).toDF("v")
    val got = graft.dq.QualityChecks.predicateViolations(df, "positive", $"v" > 0)
    assert(got.head().getLong(1) == 1)
  }

  test("EventOps: asOfJoin picks the latest right row at or before ts") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, t("2024-01-01 10:00:00")),   // matches right id 101 (09:59)
      (2L, 10L, t("2024-01-01 11:00:00")),   // matches right id 103 (11:00, inclusive)
      (3L, 20L, t("2024-01-01 08:00:00")),   // no earlier right row -> dropped
      (4L, 30L, t("2024-01-01 09:00:00")))   // key absent on right -> dropped
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, t("2024-01-01 09:59:00"), 1.0),
      (102L, 10L, t("2024-01-01 10:30:00"), 2.0),
      (103L, 10L, t("2024-01-01 11:00:00"), 3.0),
      (104L, 20L, t("2024-01-01 09:00:00"), 4.0))
      .toDF("rid", "user_id", "ts", "rv")
    val got = EventOps.asOfJoin(left, right, "user_id", "ts",
        Seq("rid", "rv"), tieBreak = Some("rid"))
      .orderBy("event_id")
      .select("event_id", "rid").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 101L), (2L, 103L)))
  }

  test("EventOps: sessionize splits on gaps > gap and aggregates") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 7L, t("2024-01-01 10:00:00"), 1.0),
      (2L, 7L, t("2024-01-01 10:10:00"), 2.0),  // same session (10 min gap)
      (3L, 7L, t("2024-01-01 11:10:01"), 3.0),  // gap 3601s > 3600 -> new session
      (4L, 8L, t("2024-01-01 00:00:00"), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = EventOps.sessionize(ev, gapSec = 3600).collect()
    assert(got.length == 3)
    val first = got.head
    assert(first.getLong(0) == 7L && first.getInt(1) == 1)
    assert(first.getLong(3) == 2)                       // n_events
    assert(first.getDouble(4) == 3.0)                   // sum_value
    assert(first.getLong(5) == 600)                     // duration_sec
  }

  test("Sampling: hash sample is deterministic and stratified respects fractions") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.05).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(7), "id", 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "membership must not depend on partitioning")
    assert(math.abs(a.size - 500) < 150, s"~5% of 10k expected, got ${a.size}")
    val strat = df.withColumn("lang", sf.when($"id" % 2 === 0, "en").otherwise("fr"))
    val kept = Sampling.stratifiedHashSample(strat, "id", "lang",
      Map("en" -> 0.0, "fr" -> 1.0))
    assert(kept.filter($"lang" === "en").count() == 0)
    assert(kept.filter($"lang" === "fr").count() == 5000)
  }

  test("Sampling: hashBucket is overflow-free and portable past 2^32 ids") {
    // ids straddling every overflow hazard: 32-bit, the ~3.47e9 signed-
    // multiply wrap of the unmasked form, and Long.MaxValue itself.
    val big = Seq(0L, 1L, (1L << 31) - 1, 1L << 31, 1L << 32, 3_470_000_000L,
      5_000_000_000L, (1L << 62) + 12345L, Long.MaxValue)
    val got = big.toDF("id")
      .select(Sampling.hashBucket($"id").as("b")).collect().map(_.getLong(0))
    // BigInt reference model of the same pipeline — the Scala side must
    // agree exactly (no wrap, no negative buckets).
    val want = big.map { k =>
      ((BigInt(k).mod(BigInt(1L << 31)) * BigInt(2654435761L))
        .mod(BigInt(1L << 32)).mod(BigInt(10000))).toLong
    }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    assert(got.forall(b => b >= 0 && b < 10000))
  }

  test("QualityChecks: quantileProfile keeps a NULL group as its own row") {
    val df = Seq(("a", 1.0), ("a", 3.0), (null, 5.0), (null, 7.0), (null, 9.0))
      .toDF("g", "v")
    val got = graft.dq.QualityChecks.quantileProfile(df, "g", "v")
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(3)).toMap // p50
    assert(got(Some("a")) == 2.0 && got(None) == 7.0, s"got $got")
  }

  test("QualityChecks: fkOrphans treats NULL foreign keys as absent, not orphans") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_fk").toString
    Seq((1L, Some(10L)), (2L, None), (3L, Some(99L)))
      .toDF("id", "fk").write.parquet(s"$dir/child.parquet")
    Seq(Tuple1(10L)).toDF("pk").write.parquet(s"$dir/parent.parquet")
    val got = graft.dq.QualityChecks.fkOrphans(spark, dir,
      Seq(("child", "fk", "parent", "pk"))).collect()
    assert(got.head.getLong(1) == 1, // only fk=99 is an orphan; NULL is not
      s"got ${got.mkString(",")}")
  }

  test("QualityChecks: fkOrphans counts unmatched foreign keys") {
    val got = graft.dq.QualityChecks.fkOrphans(spark, sf001, Seq(
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("lineitem", "l_orderkey", "orders", "o_orderkey")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0), s"TPC-H FKs must hold: $got")
  }

  test("TextAnalysis: tfIdfTopTerms ranks rare terms above common ones") {
    val docs = Seq(
      (1L, "apple apple zebra common common"),
      (2L, "common zebra"),
      (3L, "common common banana"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // doc 1: apple (tf=2, df=1) must outrank common (tf=2, df=3)
    assert(got.contains((1L, 1, "apple")))
    // every doc emits at most k rows
    assert(got.groupBy(_._1).values.forall(_.length <= 2))
  }

  test("QualityChecks: winsorizedStats clips at nearest-rank thresholds") {
    import spark.implicits._
    // 1..20 in one group: p05 -> rank ceil(1)=1 -> 1.0; p95 -> rank 19 -> 19.0
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val r = QualityChecks.winsorizedStats(df, "grp", "v", 0.05, 0.95).head()
    assert(r.getAs[Double]("p_lo") == 1.0 && r.getAs[Double]("p_hi") == 19.0)
    assert(r.getAs[Long]("n_clipped") == 1L) // only 20 > 19
    // clipped values: 1..19 plus 19 -> mean = (190 + 19) / 20
    assert(r.getAs[Double]("winsorized_mean") == 10.45)
    // outlier resistance: a wild value moves the clipped mean only to the cap
    val df2 = df.union(Seq(("g", 1e9)).toDF("grp", "v"))
    val r2 = QualityChecks.winsorizedStats(df2, "grp", "v", 0.05, 0.95).head()
    assert(r2.getAs[Double]("p_hi") == 20.0) // rank ceil(21*.95)=20 -> value 20
    assert(r2.getAs[Double]("winsorized_mean") < 12.0,
      s"mean ${r2.getAs[Double]("winsorized_mean")} dragged by the outlier")
  }

  test("QualityChecks: weightedQuantile picks the exact mass threshold value") {
    import spark.implicits._
    // group g: values 1(w=1), 2(w=1), 10(w=8). total=10, half=5 ->
    // weighted median = 10 (row median would say 2); duplicates of the
    // same value pool their weight
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 10L, 5L), ("g", 10L, 3L),
      ("h", 7L, 2L), ("h", 9L, 2L),     // even split: cum(7)*2 = 4 = tot -> 7
      ("z", 5L, 0L), ("z", 6L, 1L))     // zero weights drop
      .toDF("grp", "v", "w")
    val got = QualityChecks.weightedQuantile(df, "grp", "v", "w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("g", 10L, 10L), ("h", 4L, 7L), ("z", 1L, 6L)), s"got $got")
    // p75 (num=3, den=4): g's cum at 10 is the first reaching 7.5
    val p75 = QualityChecks.weightedQuantile(df, "grp", "v", "w", num = 3, den = 4)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(p75 == Map("g" -> 10L, "h" -> 9L, "z" -> 6L), s"got $p75")
  }

  test("StarSchema.globalPrefixSums equals a local cumulative sum at any parallelism") {
    import spark.implicits._
    val rows = (1L to 257L).map(i => (i, i % 13 + 1))
    val df = rows.toDF("v", "w").repartition(7)
    for (nPart <- Seq(1, 3, 16)) {
      val got = StarSchema.globalPrefixSums(df, Seq("v"), "w", "cum", nPart)
        .select("v", "cum").as[(Long, Long)].collect().toMap
      var acc = 0L
      rows.sortBy(_._1).foreach { case (v, w) =>
        acc += w
        assert(got(v) == acc, s"nPart=$nPart v=$v got ${got(v)} want $acc")
      }
    }
  }

  test("Sampling.quantileNormalize maps group quantiles onto the global distribution") {
    import spark.implicits._
    // A=[1,2,3,4], B=[10,20]; global sorted = 1,2,3,4,10,20 (N=6)
    // A: k=ceil(cum*6/4) -> ranks 2,3,5,6 -> 2,3,10,20
    // B: k=ceil(cum*6/2) -> ranks 3,6   -> 3,20
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L), ("B", 10L), ("B", 20L))
      .toDF("g", "v")
    val got = Sampling.quantileNormalize(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    assert(got == Seq(("A", 1L, 2L), ("A", 2L, 3L), ("A", 3L, 10L), ("A", 4L, 20L),
      ("B", 10L, 3L), ("B", 20L, 20L)), s"got $got")
    // one group: the map is the identity (every quantile maps to itself)
    val one = Sampling.quantileNormalize(
      Seq(("x", 5L), ("x", 5L), ("x", 9L), ("x", 11L)).toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(one.forall { case (v, nv) => v == nv }, s"got ${one.toSeq}")
    // plan shape: the rank lookup is a binned EQUI join — the only
    // nested-loop allowed is the bounded 1-row N-scalar broadcast
    val qe = Sampling.quantileNormalize(df, "g", "v").queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no cartesian product allowed")
    assert(plan.contains("__pbin") && plan.contains("__ibin"),
      s"rank lookup must ride the binned interval equi join:\n$plan")
  }

  test("QualityChecks.joinSizeProfile: exact pair counts, hot key first, nulls drop") {
    import spark.implicits._
    val left = (Seq.fill(5)("hot") ++ Seq("a", "a", "b") ++ Seq(null.asInstanceOf[String]))
      .map(Tuple1(_)).toDF("k")
    val right = (Seq.fill(4)("hot") ++ Seq("a", "c") ++ Seq(null.asInstanceOf[String]))
      .map(Tuple1(_)).toDF("k")
    val got = QualityChecks.joinSizeProfile(left, "k", right, "k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // b and c have no partner; nulls never pair
    assert(got == Seq(("hot", 5L, 4L, 20L), ("a", 2L, 1L, 2L)), s"got $got")
  }

  test("EventOps.conversionLatency: first-to-first seconds, pre-exposure excluded") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-05-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(5), "view"), (1L, ts(90), "purchase"),
      (2L, ts(10), "purchase"), (2L, ts(20), "view"),   // converted pre-exposure
      (3L, ts(0), "view"),                              // never converted
      (4L, ts(7), "view"), (4L, ts(7), "purchase"))     // same instant -> 0
      .toDF("user_id", "ts", "event_type")
    val got = EventOps.conversionLatency(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 5400L), (4L, 0L)), s"got $got")
  }

  test("EventOps.sequenceNgrams: ordered contiguous n-grams with support floor") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-05-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // three users with view->click->purchase; one with a different path;
    // one too short to contribute any trigram
    val ev = (for {
      (u, off) <- Seq((1L, 0), (2L, 100), (3L, 200))
      (i, t) <- Seq((0, "view"), (1, "click"), (2, "purchase"))
    } yield (u * 10 + i, u, ts(off + i), t)) ++ Seq(
      (91L, 9L, ts(500), "view"), (92L, 9L, ts(501), "view"), (93L, 9L, ts(502), "error"),
      (41L, 4L, ts(300), "view"), (42L, 4L, ts(301), "click"))
    val df = ev.toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.sequenceNgrams(df, minCount = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("view->click->purchase", 3L)), s"got $got")
    // ties in ts order by event_id: swap order within a tie and re-check
    val tie = Seq((2L, 1L, ts(0), "b"), (1L, 1L, ts(0), "a"), (3L, 1L, ts(1), "c"),
      (12L, 2L, ts(9), "a"), (11L, 2L, ts(9), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val tg = EventOps.sequenceNgrams(tie, n = 2, minCount = 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tg == Seq(("a->b", 1L), ("b->a", 1L), ("b->c", 1L)), s"got $tg")
  }

  test("QualityChecks.fdViolations: distinct-dep and minority-row accounting") {
    import spark.implicits._
    val df = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"),            // det 1: 2 deps, 1 minority row
      (2L, "A"), (2L, "B"), (2L, "B"), (2L, "C"), // det 2: 3 deps, 2 minority rows
      (3L, "A"), (3L, "A"))                       // det 3: clean -> absent
      .toDF("det", "dep")
    val got = QualityChecks.fdViolations(df, "det", "dep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((2L, 3L, 4L, 2L), (1L, 2L, 3L, 1L)), s"got $got")
  }

  test("QualityChecks.benfordAudit: cents-string digits, Benford expectations") {
    import spark.implicits._
    val df = Seq(1.23, 1.99, 0.25, 9.0, 0.004, -5.0, 30.0).map(Tuple1(_)).toDF("v")
    // cents: 123, 199, 25, 900, (0.4 -> 0 drops), (negative drops), 3000
    val got = QualityChecks.benfordAudit(df, "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    def ben(d: Int) = math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e4 + 0.5) / 1e4
    assert(got == Seq((1, 2L, 0.4, ben(1)), (2, 1L, 0.2, ben(2)),
      (3, 1L, 0.2, ben(3)), (9, 1L, 0.2, ben(9))), s"got $got")
  }

  test("QualityChecks: kAnonymity counts under-k groups and rows at risk") {
    import spark.implicits._
    val df = (Seq.fill(12)(("94103", "F")) ++ Seq.fill(3)(("94103", "M")) ++
      Seq.fill(1)(("02139", "F"))).toDF("zip", "gender")
    val r = QualityChecks.kAnonymity(df, Seq("zip", "gender"), k = 5).head()
    assert(r.getAs[Long]("n_groups") == 3 && r.getAs[Long]("n_small_groups") == 2)
    assert(r.getAs[Long]("rows_at_risk") == 4 && r.getAs[Long]("min_group_size") == 1)
  }

  test("QualityChecks: lDiversity flags homogeneous groups k-anonymity passes") {
    import spark.implicits._
    // group A: 6 rows but only 2 distinct diagnoses (k-anonymous at
    // k=5, yet l=3-violating); group B: 3 rows, 3 distinct (passes)
    val df = (Seq.fill(4)(("94103", "flu")) ++ Seq.fill(2)(("94103", "cold")) ++
      Seq(("02139", "flu"), ("02139", "cold"), ("02139", "covid")))
      .toDF("zip", "dx")
    val r = QualityChecks.lDiversity(df, Seq("zip"), sf.col("dx"), l = 3).head()
    assert(r.getAs[Long]("n_groups") == 2 && r.getAs[Long]("n_violating") == 1,
      r.toString)
    assert(r.getAs[Long]("rows_at_risk") == 6 &&
      r.getAs[Long]("min_diversity") == 2, r.toString)
  }

  test("QualityChecks: cmhTest pools two hand-computed strata") {
    import spark.implicits._
    // stratum X: a=4 b=1 c=2 d=3 -> diff=1.0, V=2/3, ad/N=1.2, bc/N=0.2
    // stratum Y: a=3 b=3 c=1 d=3 -> diff=0.6, V=0.64, ad/N=0.9, bc/N=0.3
    def rows(k: String, ga: Boolean, sc: Boolean, n: Int) =
      Seq.fill(n)((k, ga, sc))
    val df = (rows("X", true, true, 4) ++ rows("X", true, false, 1) ++
      rows("X", false, true, 2) ++ rows("X", false, false, 3) ++
      rows("Y", true, true, 3) ++ rows("Y", true, false, 3) ++
      rows("Y", false, true, 1) ++ rows("Y", false, false, 3))
      .toDF("k", "ga", "sc")
    val r = QualityChecks.cmhTest(df, "k", sf.col("ga"), sf.col("sc")).head()
    assert(r.getAs[Long]("n_strata") == 2 && r.getAs[Long]("n_rows") == 20)
    // replay the snapped-fx assembly exactly
    val sd = 1000000L + 600000L
    val sv = 666667L + 640000L
    val t = sd.toDouble / 1e6
    val cmh = math.floor((t * t) / (sv.toDouble / 1e6) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("cmh_stat") == cmh, r.toString)
    // MH OR = (1.2 + 0.9)/(0.2 + 0.3) = 4.2
    assert(r.getAs[Double]("mh_odds_ratio") == 4.2, r.toString)
  }

  test("QualityChecks: cliffsDelta hand-computed wins/ties/losses") {
    import spark.implicits._
    // A={3,3,4}, B={1,2,3}: wins 7, ties 2, losses 0 over 9 pairs
    // -> delta = 7/9, U = 8 -> AUC = 8/9, magnitude large
    val a = Seq(3.0, 3.0, 4.0).toDF("value")
    val b = Seq(1.0, 2.0, 3.0).toDF("value")
    val r = QualityChecks.cliffsDelta(a, b, "value").head()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("delta") == r6(7.0 / 9), r.toString)
    assert(r.getAs[Double]("auc") == r6(8.0 / 9), r.toString)
    assert(r.getAs[String]("magnitude") == "large", r.toString)
    // identical samples -> delta 0, AUC 0.5, negligible
    val r0 = QualityChecks.cliffsDelta(a, a, "value").head()
    assert(r0.getAs[Double]("delta") == 0.0 && r0.getAs[Double]("auc") == 0.5 &&
      r0.getAs[String]("magnitude") == "negligible", r0.toString)
  }

  test("EventOps: ewmaSeries hand-computed over a gap-filled window") {
    import spark.implicits._
    // hourly counts [2, 0, 1]: ewma = 2.0, (0.5*0+0.25*2)/0.75 = 2/3,
    // (0.5*1+0.25*0+0.125*2)/0.875 = 6/7
    val rows = Seq(
      (1L, "2024-01-01 00:10:00", 7L, "view", 1.0),
      (2L, "2024-01-01 00:20:00", 7L, "view", 1.0),
      (3L, "2024-01-01 02:30:00", 7L, "view", 1.0))
    val df = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"), sf.col("value"))
    val got = EventOps.ewmaSeries(df).collect()
      .map(r => (r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((2L, 2.0), (0L, 0.666667), (1L, 0.857143)), s"got $got")
  }

  test("EventOps.windowFunnel: 24h anchored chain, timeout kills depth") {
    import spark.implicits._
    // u1 completes within 24h; u2's click lands outside the window;
    // u3 clicks in time but purchases after the anchor + 24h
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 01:00:00", 1L, "click"),
      (3L, "2024-01-01 02:00:00", 1L, "purchase"),
      (4L, "2024-01-01 00:00:00", 2L, "view"),
      (5L, "2024-01-02 01:00:00", 2L, "click"),
      (6L, "2024-01-01 00:00:00", 3L, "view"),
      (7L, "2024-01-01 01:00:00", 3L, "click"),
      (8L, "2024-01-02 02:00:00", 3L, "purchase"))
    val df = rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"))
    val got = EventOps.windowFunnel(df, Seq("view", "click", "purchase"),
      windowS = 86400L).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L), got.toString)
    // boundary: exactly at anchor + window is INSIDE (<=)
    val edge = Seq(
      (1L, "2024-01-01 00:00:00", 9L, "view"),
      (2L, "2024-01-02 00:00:00", 9L, "click"))
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"))
    val ge = EventOps.windowFunnel(edge, Seq("view", "click"), windowS = 86400L)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(ge == Map("view" -> 1L, "click" -> 1L), ge.toString)
  }

  test("EventOps: markovAttribution removal effects on a hand-solved chain") {
    import spark.implicits._
    // u1: view->CONV; u2: view->click->CONV; u3: click->NULL
    // fixed point: p(click)=.5, p(view)=.75, p(START)=2/3
    // remove click: p=1/3 -> effect 1/3; remove view: p=1/6 -> effect 1/2
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-01 10:01:00", 2L, "purchase"),
      (2L, "2024-01-01 11:00:00", 3L, "view"),
      (2L, "2024-01-01 11:01:00", 4L, "click"),
      (2L, "2024-01-01 11:02:00", 5L, "purchase"),
      (3L, "2024-01-01 12:00:00", 6L, "click"))
    val df = rows.toDF("user_id", "ts_s", "event_id", "event_type")
      .select(sf.col("user_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("event_id"), sf.col("event_type"))
    val got = EventOps.markovAttribution(df).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("click", 0.666667, 0.333333, 0.5, 0.4),
      ("view", 0.666667, 0.166667, 0.75, 0.6)), s"got $got")
  }

  test("EventOps: markovAttribution refuses a high-cardinality channel column") {
    import spark.implicits._
    // 2049 distinct event types would mean a ~2052^2-cell driver collect;
    // the guard must fail fast with an actionable message, not OOM.
    val df = spark.range(2100)
      .select(sf.col("id").as("event_id"),
        sf.to_timestamp(sf.lit("2024-01-01 00:00:00")).as("ts"),
        sf.lit(1L).as("user_id"),
        sf.concat(sf.lit("t"), sf.col("id")).as("event_type"))
    val e = intercept[IllegalArgumentException] {
      EventOps.markovAttribution(df)
    }
    assert(e.getMessage.contains("distinct"), e.getMessage)
  }

  test("EventOps: cupedLift hand-computed theta, adjusted lift, rho2") {
    import spark.implicits._
    def bucket(id: Long) = (id % 2147483648L) * 2654435761L % 4294967296L % 10000
    val aIds = (1L to 200L).filter(bucket(_) < 5000).take(2)
    val bIds = (1L to 200L).filter(bucket(_) >= 5000).take(2)
    // X: (10,20) per variant; Y = X+1 in A, X+3 in B -> theta=1,
    // lift_raw=2, lift_adj=2, rho2=100^2/(100*104)=0.961538...
    val pre = "2024-01-10 00:00:00"
    val post = "2024-01-20 00:00:00"
    val rows = Seq(
      (aIds(0), pre, 10.0), (aIds(0), post, 11.0),
      (aIds(1), pre, 20.0), (aIds(1), post, 21.0),
      (bIds(0), pre, 10.0), (bIds(0), post, 13.0),
      (bIds(1), pre, 20.0), (bIds(1), post, 23.0))
    val df = rows.toDF("user_id", "ts_s", "value")
      .select(sf.col("user_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("value"))
    val r = EventOps.cupedLift(df, cutoff = "2024-01-16 00:00:00").head()
    assert(r.getAs[Long]("n_users") == 4 &&
      r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2, r.toString)
    assert(r.getAs[Double]("theta") == 1.0, r.toString)
    assert(r.getAs[Double]("mean_a") == 16.0 && r.getAs[Double]("mean_b") == 18.0)
    assert(r.getAs[Double]("lift_raw") == 2.0 && r.getAs[Double]("lift_adj") == 2.0)
    assert(r.getAs[Double]("rho2") == 0.961538, r.toString)
  }

  test("QualityChecks: jsonKeyProfile classifies every JSON value kind") {
    import spark.implicits._
    val df = Seq(
      """{"k": 69, "s": "abc"}""",
      """{"k": 7, "f": 1.5, "b": true}""",
      """{"k": "oops", "n": null, "o": {"x":1}, "a": [1,2]}""",
      "not json at all").toDF("j")
    val got = QualityChecks.jsonKeyProfile(df, "j").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("a", "array", 1L, 0.333333),
      ("b", "bool", 1L, 0.333333),
      ("f", "float", 1L, 0.333333),
      ("k", "int", 2L, 0.666667),
      ("k", "string", 1L, 0.333333), // the int->string drift signal
      ("n", "null", 1L, 0.333333),
      ("o", "object", 1L, 0.333333),
      ("s", "string", 1L, 0.333333)), s"got $got")
  }

  test("QualityChecks: brierDecomposition satisfies the Murphy identity by hand") {
    import spark.implicits._
    // bin 0: conf .05 x4 (one positive); bin 9: conf .95 x4 (one negative)
    val df = (Seq.fill(3)((0.05, 0)) ++ Seq((0.05, 1)) ++
      Seq.fill(3)((0.95, 1)) ++ Seq((0.95, 0))).toDF("conf", "y")
    val r = QualityChecks.brierDecomposition(df, "conf", "y").head()
    assert(r.getAs[Long]("n_rows") == 8)
    assert(r.getAs[Double]("brier") == 0.2275, r.toString)
    assert(r.getAs[Double]("reliability") == 0.04, r.toString)
    assert(r.getAs[Double]("resolution") == 0.0625, r.toString)
    assert(r.getAs[Double]("uncertainty") == 0.25, r.toString)
    // constant-per-bin forecasts -> Brier = REL - RES + UNC exactly
    assert(math.abs(0.2275 - (0.04 - 0.0625 + 0.25)) < 1e-12)
  }

  test("QualityChecks: skewProfile reports the heaviest key's dominance") {
    import spark.implicits._
    val df = (Seq.fill(90)(1L) ++ (2L to 11L)).toDF("k")
    val r = QualityChecks.skewProfile(df, "k").head()
    assert(r.getAs[Long]("n_rows") == 100 && r.getAs[Long]("n_keys") == 11)
    assert(r.getAs[Long]("max_key_rows") == 90 && r.getAs[Double]("top_share") == 0.9)
    // mean count = 100/11; ratio = 90 / (100/11) = 9.9
    assert(r.getAs[Double]("skew_ratio") == 9.9)
  }

  test("EventOps: latestSnapshot equals the window-rank model, ties by id") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val events = Seq(
      (1L, t0, 10L, "a", 1.0), (1L, t1, 11L, "b", 2.0), // latest by ts
      (2L, t1, 20L, "c", 3.0), (2L, t1, 21L, "d", 4.0), // ts tie -> max id
      (3L, t0, 30L, "e", 5.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventOps.latestSnapshot(events).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq((1L, 11L, "b"), (2L, 21L, "d"), (3L, 30L, "e")))
  }

  test("EventOps: applyChangeset — delete drops, resurrect wins, stale change no-ops") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-03 00:00:00")
    val base = Seq(
      (1L, t1, 10L, "a", 1.0),  // key 1: deleted by changeset
      (2L, t1, 20L, "b", 2.0),  // key 2: stale change arrives (t0 < t1) -> base wins
      (3L, t1, 30L, "c", 3.0),  // key 3: deleted then resurrected at t2
      (4L, t1, 40L, "d", 4.0))  // key 4: untouched
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val changes = Seq(
      (1L, t2, 11L, "delete", "x", 0.0),
      (2L, t0, 21L, "upsert", "stale", 9.0),
      (3L, t1, 31L, "delete", "x", 0.0),   // same ts, higher id -> beats base
      (3L, t2, 32L, "upsert", "c2", 6.0),  // later upsert resurrects
      (5L, t2, 50L, "upsert", "new", 7.0)) // brand-new key
      .toDF("user_id", "ts", "event_id", "op", "event_type", "value")
    val got = EventOps.applyChangeset(base, changes).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (2L, 20L, "b", 2.0), (3L, 32L, "c2", 6.0),
      (4L, 40L, "d", 4.0), (5L, 50L, "new", 7.0)))
  }

  test("EventOps: aggState merge of any split equals the full recompute") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, t, 1L, "a", 1.5), (1L, t, 2L, "a", -2.25), (1L, t, 3L, "a", null),
      (2L, t, 4L, "b", 7.0), (2L, t, 5L, "a", 0.0001), (1L, t, 6L, "b", null))
      .map { case (u, ts, id, et, v) =>
        (u, ts, id, et, Option(v).map(_.asInstanceOf[Double])) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    def read(df: org.apache.spark.sql.DataFrame) =
      EventOps.readAggState(df).collect().map(_.toSeq).toSeq
    val full = read(EventOps.aggState(rows))
    // 3-way uneven split, including an empty shard
    val s1 = EventOps.aggState(rows.filter(sf.col("event_id") <= 2))
    val s2 = EventOps.aggState(rows.filter(sf.col("event_id") > 2))
    val s3 = EventOps.aggState(rows.filter(sf.lit(false)))
    assert(read(EventOps.mergeAggStates(Seq(s1, s2, s3))) == full)
    // all-null value group surfaces null sum/min/max/mean, exact counts
    val g = full.find(r => r == Seq(1L, "b", 1L, 0L, null, null, null, null))
    assert(g.isDefined, s"got $full")
  }

  test("Sampling.classWeights: inverse-frequency vs effective-number on a 90/10 skew") {
    import spark.implicits._
    val df = (Seq.fill(90)(1) ++ Seq.fill(10)(2)).toDF("label")
    val got = Sampling.classWeights(df, "label", beta = 0.9).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    // inverse frequency boosts the tail 9x; effective-number (beta=0.9,
    // saturating at 1/(1-beta)=10 effective samples) only ~1.5x
    assert(got == Seq((1, 90L, 0.5556, 0.789), (2, 10L, 5.0, 1.211)), s"got $got")
    // balanced classes: both weights are exactly 1
    val bal = Sampling.classWeights(
      (Seq.fill(5)(1) ++ Seq.fill(5)(2)).toDF("label"), "label", beta = 0.9)
      .collect().map(r => (r.getDouble(2), r.getDouble(3))).toSeq
    assert(bal == Seq((1.0, 1.0), (1.0, 1.0)))
  }

  test("EventOps.changePoint: finds the planted level shift with exact segment means") {
    import spark.implicits._
    // type "a": 4 quiet hours (1 event) then 4 loud hours (5 events) —
    // the split after hour 4 maximizes |n*S_i - i*S_n|
    val rows = (for {
      h <- 0 until 8
      k <- 0 until (if (h < 4) 1 else 5)
    } yield (1L, java.sql.Timestamp.valueOf(f"2024-01-01 0$h:00:00"),
      (h * 10 + k).toLong, "a", 1.0)).toDF(
      "user_id", "ts", "event_id", "event_type", "value")
    val r = EventOps.changePoint(rows).collect()(0)
    assert(r.getString(0) == "a" && r.getLong(1) == 8L)
    assert(r.getString(2) == "2024-01-01 03:00") // last quiet bin
    // S_4 = 4, S_8 = 24: d = |8*4 - 4*24| = 64; means 1.0 and 5.0
    assert(r.getLong(3) == 64L)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 5.0)
  }

  test("EventOps.botScore: metronomic cadence flags, bursty cadence doesn't") {
    import spark.implicits._
    def ev(u: Long, secs: Seq[Long]) = secs.zipWithIndex.map { case (s, i) =>
      (u, new java.sql.Timestamp(1704067200000L + s * 1000), (u * 100 + i).toLong,
        "click", 1.0)
    }
    // user 1: exact 60s metronome (cv = 0); user 2: bursty gaps
    val rows = (ev(1L, (0L to 6L).map(_ * 60)) ++
      ev(2L, Seq(0L, 1L, 2L, 300L, 301L, 900L, 903L)))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventOps.botScore(rows).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6))).toSeq
    assert(got.size == 2)
    val (u1, u2) = (got(0), got(1))
    assert(u1 == (1L, 6L, 60.0, 0.0, true), s"got $u1")
    assert(u2._1 == 2L && u2._2 == 6L && !u2._5 && u2._4 > 1.0, s"got $u2")
  }

  test("EventOps.attributionUShape: 40/20/40 split, 50/50 pair, 100% single, direct") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // conv 100 ($10): click,click,click,view in order -> click 4+1+1, view 4
      (1L, ts("2024-01-01 01:00:00"), 1L, "click", 0.0),
      (1L, ts("2024-01-01 02:00:00"), 2L, "click", 0.0),
      (1L, ts("2024-01-01 03:00:00"), 3L, "click", 0.0),
      (1L, ts("2024-01-01 04:00:00"), 4L, "view", 0.0),
      (1L, ts("2024-01-01 05:00:00"), 100L, "purchase", 10.0),
      // conv 200 ($8): two views -> 50/50
      (2L, ts("2024-01-01 01:00:00"), 5L, "view", 0.0),
      (2L, ts("2024-01-01 02:00:00"), 6L, "view", 0.0),
      (2L, ts("2024-01-01 03:00:00"), 200L, "purchase", 8.0),
      // conv 300 ($5): no touches -> direct
      (3L, ts("2024-01-01 03:00:00"), 300L, "purchase", 5.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventOps.attributionUShape(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("click", 3L, 6.0), ("direct", 1L, 5.0), ("view", 3L, 12.0)),
      s"got $got")
  }

  test("QualityChecks.duplicationSpectrum: hand histogram with shares and savings") {
    import spark.implicits._
    // contents: a x3, b x2, c x2, d x1, e x1, f x1 -> m=1:3, m=2:2, m=3:1
    val df = Seq("a", "a", "a", "b", "b", "c", "c", "d", "e", "f").toDF("t")
    val got = QualityChecks.duplicationSpectrum(df, sf.col("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 0.3, 0L), (2L, 2L, 4L, 0.4, 2L), (3L, 1L, 3L, 0.3, 2L)),
      s"got $got")
  }

  test("QualityChecks.embeddingHealth: each pathology lands in its counter") {
    import spark.implicits._
    val emb = Seq(
      Option(Array(3.0f, 4.0f)),           // norm 5
      Option(Array(0.0f, 0.0f)),           // zero norm
      Option(Array(1.0f, 2.0f, 2.0f)),     // wrong dim (norm 3, still counted)
      Option(Array(Float.NaN, 1.0f)),      // non-finite -> excluded from norms
      None)                                // null vector
      .toDF("embedding")
    val r = QualityChecks.embeddingHealth(emb, "embedding", expectedDim = 2)
      .collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L)
    assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 5.0)
    // mean over norms {5, 0, 3} = 2.6667
    assert(r.getDouble(7) == 2.6667, s"mean ${r.getDouble(7)}")
  }

  test("QualityChecks.bestF1Threshold: picks the hand-computable operating point") {
    import spark.implicits._
    // scores: positives at {0.9, 0.8, 0.3}, negatives at {0.7, 0.2}
    // t=0.8: P=1, R=2/3, F1=0.8 (the max); t=0.3: P=3/4, R=1, F1=6/7
    val df = Seq((0.9, 1), (0.8, 1), (0.7, 0), (0.3, 1), (0.2, 0))
      .toDF("score", "y")
    val r = QualityChecks.bestF1Threshold(
      QualityChecks.prCurve(df, "score", "y")).collect()(0)
    // 6/7 = 0.857143 > 0.8 -> threshold 0.3 wins
    assert(r.getDouble(0) == 0.3 && r.getDouble(1) == 0.857143, s"got $r")
    assert(r.getLong(4) == 3L && r.getLong(5) == 1L && r.getLong(6) == 0L)
    // tie-break: equal-F1 points resolve to the higher threshold
    val tie = Seq((0.9, 1), (0.5, 0), (0.4, 1), (0.1, 0)).toDF("score", "y")
    val t = QualityChecks.bestF1Threshold(
      QualityChecks.prCurve(tie, "score", "y")).collect()(0)
    // t=0.9: P=1 R=.5 F1=2/3; t=0.4: P=2/3 R=1 F1=0.8 -> 0.4 wins outright
    assert(t.getDouble(0) == 0.4 && t.getDouble(1) == 0.8, s"got $t")
  }

  test("Sampling.waterfillBudgets: caps bind, freed budget re-flows, fixpoint holds") {
    import spark.implicits._
    // capacities a:10 b:20 c:100; budget 60: r1 share 20 -> a,b saturate,
    // c=20; r2 share 10 -> c=30; r3 share 0 (budget exhausted)
    val df = (Seq.fill(10)("a") ++ Seq.fill(20)("b") ++ Seq.fill(100)("c"))
      .toDF("source")
    val got = Sampling.waterfillBudgets(df, "source", sf.lit(1L),
      budget = 60L, rounds = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      ("a", 10L, 10L, true, 1.0), ("b", 20L, 20L, true, 1.0),
      ("c", 100L, 30L, false, 0.3)), s"got $got")
    // budget above total capacity: everything saturates
    val full = Sampling.waterfillBudgets(df, "source", sf.lit(1L),
      budget = 1000L, rounds = 3).collect().map(_.getBoolean(3))
    assert(full.forall(identity))
  }

  test("QualityChecks.conformalThreshold: matches the brute-force order statistic") {
    import spark.implicits._
    def bucket(id: Long): Long =
      ((id % 2147483648L) * 2654435761L) % 4294967296L % 10000
    val rows = (0L until 60L).map(i => (i, i * 0.1, (i % 2).toInt))
    val df = rows.toDF("doc_id", "score", "y")
    val alpha = 0.25
    val got = QualityChecks.conformalThreshold(df, "score", "y", "doc_id",
      alpha = alpha, calBuckets = 5000).collect()(0)
    // brute-force replay of the contract
    val calPos = rows.filter { case (id, _, y) => y == 1 && bucket(id) < 5000 }
      .map(_._2).sorted
    val k = math.floor(alpha * (calPos.size + 1)).toLong
    val thr = calPos(k.toInt - 1)
    val eval = rows.filter { case (id, _, _) => bucket(id) >= 5000 }
    val evalPos = eval.filter(_._3 == 1)
    assert(got.getLong(0) == calPos.size && got.getLong(1) == k)
    assert(got.getDouble(2) == thr, s"thr ${got.getDouble(2)} != $thr")
    assert(got.getLong(3) == eval.size &&
      got.getLong(5) == evalPos.size)
    assert(got.getLong(6) == evalPos.count(_._2 >= thr))
  }

  test("EventOps.theilSenTrend: spike-immune where OLS is not") {
    import spark.implicits._
    // type "a": 1,2,3,4,100,6 events across six days — the day-5 spike
    // would wreck OLS; the pairwise-slope median stays at the true +1/day
    val rows = (for {
      (d, n) <- Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 100), (5, 6))
      k <- 0 until n
    } yield (1L, java.sql.Timestamp.valueOf(f"2024-01-0${d + 1} 12:00:00"),
      (d * 1000 + k).toLong, "a", 1.0)).toDF(
      "user_id", "ts", "event_id", "event_type", "value")
    val r = EventOps.theilSenTrend(rows).collect()(0)
    assert(r.getString(0) == "a" && r.getLong(1) == 15L) // C(6,2) pairs
    assert(r.getDouble(2) == 1.0, s"slope ${r.getDouble(2)}")
  }

  test("Packing.packManifest: spans, boundaries, and pad tail at capacity 10") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map("w" + _).mkString(" ")
    // token counts 4, 8, 6, 1 -> pre = 0, 4, 12, 18
    val df = Seq((1L, words(4)), (2L, words(8)), (3L, words(6)), (4L, "z"))
      .toDF("doc_id", "text")
    val got = Packing.packManifest(df, "doc_id", "text", capacity = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[Long](4).toList, r.getSeq[Long](5).toList)).toSeq
    assert(got == Seq(
      // seq0: doc1 [0,4), doc2 [4,10) -- doc2 SPANS into seq1
      (0L, 2L, 10L, 0L, List(0L, 4L), List(1L, 2L)),
      // seq1: doc2 tail [0,2), doc3 [2,8), doc4 [8,9) -> pad 1
      (1L, 3L, 9L, 1L, List(0L, 2L, 8L), List(2L, 3L, 4L))), s"got $got")
  }

  test("EventOps.abBalance: balanced covariate passes, shifted one flags") {
    import spark.implicits._
    def bucket(id: Long): Long =
      ((id % 2147483648L) * 2654435761L) % 4294967296L % 10000
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ids = (1L to 40L)
    val (armA, armB) = ids.partition(bucket(_) < 5000)
    // "even": identical distribution in both arms -> SMD 0, balanced;
    // "shift": arm B values shifted by +10 -> |SMD| >> 0.1
    val rows =
      armA.zipWithIndex.map { case (u, i) => (u, t, u * 10, "even", (i % 3).toDouble) } ++
      armB.zipWithIndex.map { case (u, i) => (u, t, u * 10 + 1, "even", (i % 3).toDouble) } ++
      armA.zipWithIndex.map { case (u, i) => (u, t, u * 10 + 2, "shift", (i % 3).toDouble) } ++
      armB.zipWithIndex.map { case (u, i) => (u, t, u * 10 + 3, "shift", (i % 3).toDouble + 10.0) }
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventOps.abBalance(df).collect()
      .map(r => r.getString(0) -> (r.getDouble(5), r.getBoolean(6))).toMap
    assert(got("even")._2, s"even should balance: ${got("even")}")
    assert(!got("shift")._2 && got("shift")._1 < -1.0, s"shift: ${got("shift")}")
  }

  test("EventOps.sprtReadout: all-failure stream rejects fast, clean stream accepts") {
    import spark.implicits._
    def ev(n: Int, failEvery: Int) = (0 until n).map { i =>
      (1L, new java.sql.Timestamp(1704067200000L + i * 1000L), i.toLong,
        if (failEvery > 0 && i % failEvery == 0) "error" else "click", 1.0)
    }
    def run(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) =
      EventOps.sprtReadout(rows.toDF("user_id", "ts", "event_id", "event_type",
        "value")).collect()(0)
    // every event fails -> LLR climbs ln(3)/event, upper bound
    // ln(0.8/0.05)=2.77 crosses at event 3
    val rej = run(ev(20, 1))
    assert(rej.getString(3) == "reject_h0" && rej.getLong(4) == 3L, s"got $rej")
    // no failures -> LLR falls ln(0.85/0.95) = -0.111/event; lower bound
    // ln(0.2/0.95) = -1.558 crosses at event 15
    val acc = run(ev(40, 0))
    assert(acc.getString(3) == "accept_h0" && acc.getLong(4) == 15L, s"got $acc")
    // short clean stream stays in the continue band
    val cont = run(ev(5, 0))
    assert(cont.getString(3) == "continue" && cont.isNullAt(4), s"got $cont")
  }

  test("EventOps.markovBacktest: held-out accuracy against a planted transition rule") {
    import spark.implicits._
    def bucket(id: Long): Long =
      ((id % 2147483648L) * 2654435761L) % 4294967296L % 10000
    val trainU = (1L to 60L).filter(bucket(_) < 5000).take(3)
    val testU = (1L to 60L).filter(bucket(_) >= 5000).take(1)
    assert(trainU.size == 3 && testU.size == 1)
    def seq(u: Long, types: Seq[String]) = types.zipWithIndex.map { case (t, i) =>
      (u, new java.sql.Timestamp(1704067200000L + i * 1000L), u * 100 + i, t, 1.0)
    }
    // train users always follow a -> b; the test user goes a->b, a->b, a->c
    val rows = trainU.flatMap(u => seq(u, Seq("a", "b", "a", "b"))) ++
      seq(testU.head, Seq("a", "b", "a", "b", "a", "c"))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventOps.markovBacktest(df).collect()
      .map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // 'a' predicts 'b': test transitions a->b,a->b,a->c -> 2/3
    assert(got("a") == (Some("b"), 3L, 2L, 0.6667), s"got ${got("a")}")
    // 'b' predicts 'a' (train b->a twice per user): test b->a twice -> 1.0
    assert(got("b") == (Some("a"), 2L, 2L, 1.0), s"got ${got("b")}")
  }

  test("Similarity: pqTopK recalls planted neighborhoods through 4-int codes") {
    import spark.implicits._
    // planted clusters (the workload PQ exists for — random vectors have
    // no codable structure): center c along dims (2c, 2c+1) + noise
    val dim = 8
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val rows = for (c <- 0 until 4; i <- 0 until 100) yield {
      val id = (c * 100 + i).toLong
      val v = Seq.tabulate(dim) { d =>
        val base = if (d == 2 * c || d == 2 * c + 1) 1.0 else 0.0
        base + ((mix(id * 31 + d) >>> 40).toDouble / (1L << 24).toDouble - 0.5) * 0.2
      }
      (id, v)
    }
    val embDf = rows.toDF("vec_id", "embedding")
    val pred = sf.col("vec_id") % 37 === 0
    val got = Similarity.pqTopK(embDf, "vec_id", "embedding", pred, k = 10,
        nSubspaces = 4, centroidsPerSub = 16)
      .select("q_id", "n_id").as[(Long, Long)].collect()
    // same-code reconstructions tie, so PQ cannot rank WITHIN a cluster
    // (inherent at this compression); the contract is neighborhood
    // purity — retrieved neighbors come from the query's cluster
    // (random retrieval would score ~0.25 here)
    val purity = got.count { case (q, n) => n / 100 == q / 100 }.toDouble / got.length
    assert(purity > 0.9, s"PQ neighborhood purity $purity on planted clusters")
    // dims must divide into subspaces
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(embDf, "vec_id", "embedding", pred, k = 2, nSubspaces = 7)
    }
  }

  test("EventOps: funnel requires strict in-order step completion") {
    val ev = Seq(
      // user 1: clean view -> click -> purchase
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:00:10"),
      (3L, 1L, "purchase", "2024-01-01 10:01:10"),
      // user 2: click BEFORE view — converts on view only
      (4L, 2L, "click", "2024-01-01 09:00:00"),
      (5L, 2L, "view", "2024-01-01 09:30:00"),
      // user 3: click at the SAME instant as view — not strictly after
      (6L, 3L, "view", "2024-01-01 08:00:00"),
      (7L, 3L, "click", "2024-01-01 08:00:00"),
      // user 4: two clicks; only the one after the view qualifies, and
      // the EARLIEST qualifying one is the completion time
      (8L, 4L, "click", "2024-01-01 11:00:00"),
      (9L, 4L, "view", "2024-01-01 12:00:00"),
      (10L, 4L, "click", "2024-01-01 12:00:30"),
      (11L, 4L, "click", "2024-01-01 12:01:00")).toDF(
        "event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", sf.to_timestamp(sf.col("ts_s")))
    val got = EventOps.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0, "view", 4L, 0L),
      (1, "click", 2L, 40000000L),   // user 1: 10s, user 4: 30s
      (2, "purchase", 1L, 70000000L))) // user 1: 70s from funnel start
  }

  test("EventOps: retentionCohorts keys users by first-activity week") {
    // 2024-01-01 is a Monday; weeks truncate to it
    val ev = Seq(
      (1L, 1L, "2024-01-02 10:00:00"), (2L, 1L, "2024-01-16 10:00:00"),
      (3L, 2L, "2024-01-03 10:00:00"),
      (4L, 3L, "2024-01-09 10:00:00"), (5L, 3L, "2024-01-17 10:00:00"),
      (6L, 3L, "2024-01-18 10:00:00")) // same user+week twice: one row
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", sf.to_timestamp(sf.col("ts_s")))
    val got = EventOps.retentionCohorts(ev)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("QualityChecks: histogram clamps out-of-range, skips empty bins and nulls") {
    val df = Seq(Some(-5.0), Some(0.5), Some(1.5), Some(25.0), None).toDF("x")
    val got = QualityChecks.histogram(df, "x", nBins = 2, lo = 0.0, hi = 2.0)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    // -5 clamps into bin 0, 25 into the top bin; v_min/v_max are the
    // OBSERVED values, so the clamp is visible in the bin stats
    assert(got.toSeq == Seq(
      (0, 0.0, 1.0, 2L, -5.0, 0.5),
      (1, 1.0, 2.0, 2L, 1.5, 25.0)))
    // a bin with no values is absent, not zero-filled
    val sparse = QualityChecks.histogram(df.filter(sf.col("x") < 1.0), "x", 2, 0.0, 2.0)
    assert(sparse.collect().map(_.getInt(0)).toSeq == Seq(0))
  }

  test("QualityChecks: correlationMatrix exact r, constant column -> NULL") {
    val df = Seq(
      (1.0, 2.0, 7.0, -1.0), (2.0, 4.0, 7.0, -2.0),
      (3.0, 6.0, 7.0, -3.0), (4.0, 8.0, 7.0, -4.0)).toDF("x", "y", "c", "w")
    val got = QualityChecks.correlationMatrix(df, Seq("x", "y", "c", "w"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got(("x", "y")) == (4L, Some(1.0)))
    assert(got(("x", "w")) == (4L, Some(-1.0)))
    assert(got(("x", "c")) == (4L, None)) // zero variance
    // per-pair null handling: a null x drops the row from x-pairs only
    val withNull = df.union(Seq((Double.NaN, 0.0, 0.0, 0.0)).toDF)
      .withColumn("x", sf.when(!sf.isnan(sf.col("x")), sf.col("x")))
    val n2 = QualityChecks.correlationMatrix(withNull, Seq("x", "y", "w"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(n2(("x", "y")) == 4L && n2(("y", "w")) == 5L)
  }

  test("Cleaning: normalizeText strips controls, collapses runs, is idempotent") {
    val raw = "  a\u0000b\tc   d \n\n\n\n e\u0007 \nf  "
    val df = Seq((1L, raw), (2L, null: String)).toDF("doc_id", "text")
    val got = Cleaning.normalizeText(df, "doc_id", "text").collect()
    val clean = got(0).getString(1)
    assert(clean == "ab c d\n\ne\nf")
    assert(got(0).getLong(2) == raw.length && got(0).getLong(3) == clean.length)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
    val again = Cleaning.normalizeText(
      Seq((1L, clean)).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0).getString(1)
    assert(again == clean, "normalizeText must be idempotent")
  }

  test("QualityChecks: psiDrift is ~0 for identical sides, positive under shift") {
    val a = (1 to 100).map(i => i % 10.0).toDF("x")
    val same = QualityChecks.psiDrift(a, a, "x", nBins = 5, lo = 0.0, hi = 10.0)
      .agg(sf.sum("psi_term")).collect()(0).getDouble(0)
    assert(math.abs(same) < 1e-9)
    // push all of side B into the top bins: a real shift, psi > 0.25
    val b = (1 to 100).map(i => 8.0 + (i % 2)).toDF("x")
    val drift = QualityChecks.psiDrift(a, b, "x", nBins = 5, lo = 0.0, hi = 10.0)
    val psi = drift.agg(sf.sum("psi_term")).collect()(0).getDouble(0)
    assert(psi > 0.25, s"expected drift, psi=$psi")
    // counts line up per occupied bin
    val row0 = drift.filter(sf.col("bin_idx") === 0).collect()(0)
    assert(row0.getLong(1) == 20L && row0.getLong(2) == 0L)
  }

  test("Sampling: capPerKey equals the window-rank twin and bounds per key") {
    val df = (1L to 200L).map(i => (s"src${i % 3}", i)).toDF("source", "doc_id")
    val got = Sampling.capPerKey(spark, df, "source", "doc_id", cap = 10)
    val counts = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 10L) && counts.size == 3)
    // window-rank twin on the same portable hash
    import org.apache.spark.sql.expressions.Window
    val twin = df.withColumn("__h", Sampling.hashBucket(sf.col("doc_id")))
      .withColumn("rank", sf.row_number().over(
        Window.partitionBy("source").orderBy(sf.col("__h"), sf.col("doc_id"))))
      .filter(sf.col("rank") <= 10)
      .select("source", "rank", "doc_id")
    assert(got.collect().map(_.toSeq).toSet == twin.collect().map(_.toSeq).toSet)
    // a key with fewer rows than cap keeps them all
    val small = Sampling.capPerKey(spark,
      Seq(("a", 1L), ("a", 2L)).toDF("source", "doc_id"), "source", "doc_id", 10)
    assert(small.count() == 2)
  }

  test("EventOps: intervalJoin pairs each point once, plans as an equi join") {
    val pts = Seq(0L, 5L, 33L, 40L, 100L).toDF("p")
    val iv = Seq(
      (1L, 0L, 4L),   // contains 0
      (2L, 3L, 36L),  // spans two 32-wide bins: contains 5 and 33
      (3L, 40L, 40L), // single-point interval: contains 40
      (4L, 50L, 45L)  // inverted (hi < lo): drops entirely
    ).toDF("iv_id", "lo", "hi")
    val got = EventOps.intervalJoin(pts, iv, "p", "lo", "hi", binWidth = 32)
    val pairs = got.select("p", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // multiset equality: interval 2 overlaps two bins but each pair
    // emits exactly once (the point lives in a single bin)
    assert(pairs.sorted.toSeq == Seq((0L, 1L), (5L, 2L), (33L, 2L), (40L, 3L)))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "interval join must plan as a bin-keyed equi join")
  }

  test("EventOps: trailingWindow inclusive 24h boundary, value-based frame") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (2L, 1L, "2024-01-01 12:00:00", 2.0),
      (3L, 1L, "2024-01-02 00:00:00", 4.0),  // exactly 24h after e1: in
      (4L, 1L, "2024-01-02 12:00:01", 8.0),  // 24h1s after e2: e2 out, e3 in
      (5L, 2L, "2024-01-01 00:00:00", 16.0)) // other key unaffected
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", sf.to_timestamp(sf.col("ts_s")))
    val got = EventOps.trailingWindow(ev).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 1.0), (2L, 2L, 3.0), (3L, 3L, 7.0), (4L, 2L, 12.0),
      (5L, 1L, 16.0)))
  }

  test("EventOps: activeUsers trailing window includes day+6, excludes day+7") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 15:00:00"), // same user+day: one contribution
      (3L, 2L, "2024-01-07 09:00:00"), // user 1's Jan 1 still in 7d window
      (4L, 3L, "2024-01-08 09:00:00")) // Jan 1 now out (day+7)
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", sf.to_timestamp(sf.col("ts_s")))
    val got = EventOps.activeUsers(ev, windowDays = 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // only observed days are reported (no empty Jan 2-6 rows)
    assert(got.toSeq == Seq(
      ("2024-01-01", 1L, 1L),
      ("2024-01-07", 1L, 2L),   // user 2 active, user 1 in window
      ("2024-01-08", 1L, 2L)))  // users 2 & 3 in window, user 1 aged out
  }

  test("EventOps: abLift exact moments match a direct computation") {
    val ev = (1L to 400L).map(u => (u, u % 7 + 0.25)).toDF("user_id", "value")
    val got = EventOps.abLift(ev).collect()(0)
    // reference computation with the same variant hash + fixed-point sums
    def bucket(u: Long) = ((u % 2147483648L) * 2654435761L % 4294967296L) % 10000
    val (a, b) = (1L to 400L).map(u => (u, u % 7 + 0.25))
      .partition { case (u, _) => bucket(u) < 5000 }
    def m(xs: Seq[Double]) = {
      val x4 = xs.map(v => math.floor(v * 1e4 + 0.5).toLong)
      val n = x4.length.toDouble
      val mean = (x4.map(BigDecimal(_)).sum.toDouble / 1e4) / n
      val ss = x4.map(x => BigDecimal(x) * BigDecimal(x)).sum.toDouble / 1e8
      (n.toLong, mean, (ss - n * mean * mean) / (n - 1))
    }
    val (na, ma, va) = m(a.map(_._2)); val (nb, mb, vb) = m(b.map(_._2))
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(got.getLong(0) == na && got.getLong(1) == nb)
    assert(got.getDouble(2) == r4(ma) && got.getDouble(3) == r4(mb))
    assert(got.getDouble(4) == r4((mb - ma) / ma * 100))
    assert(got.getDouble(5) == r4((mb - ma) / math.sqrt(va / na + vb / nb)))
    assert(na + nb == 400L && na > 100 && nb > 100, "split should be near-even")
  }

  test("QualityChecks: fileStats proves clustered layouts tighten per-file ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fstats").toFile.getAbsolutePath
    val df = (1L to 4000L).map(i => (i, (i * 2654435761L) % 4000)).toDF("k", "v")
    // unclustered baseline: round-robin shuffle spreads every file
    // across the full k range
    df.repartition(8).write.mode("overwrite").parquet(s"$dir/flat")
    StarSchema.writeClustered(df, s"$dir/clust", Seq("k"), numFiles = 8)
    def spanSum(path: String): Long =
      QualityChecks.fileStats(spark, path, Seq("k")).collect()
        .map(r => r.getLong(r.fieldIndex("max_k")) - r.getLong(r.fieldIndex("min_k")))
        .sum
    val (flat, clust) = (spanSum(s"$dir/flat"), spanSum(s"$dir/clust"))
    // 8 range-clustered files cover ~1/8 of the range each; the flat
    // layout's every file spans ~the whole range
    assert(clust * 4 < flat, s"clustered=$clust flat=$flat")
    // row counts in the manifest account for every row
    val total = QualityChecks.fileStats(spark, s"$dir/clust", Seq("k"))
      .agg(sf.sum("n_rows")).collect()(0).getLong(0)
    assert(total == 4000L)
  }

  test("CorpusStats: corpusCard metrics on a hand-built corpus") {
    val docs = Seq(
      (1L, "one two three four", "en", "web"),
      (2L, "one two three four", "en", "web"),   // exact dup of doc 1
      (3L, "eins zwei", "de", "book"),
      (4L, "", "en", "web"))                     // empty (and short)
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusStats.corpusCard(docs, "doc_id", "text", "lang", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("n_docs") == 4.0)
    assert(got("exact_dup_rate") == 0.25)    // 4 docs, 3 distinct texts
    assert(got("empty_rate") == 0.25 && got("short_rate") == 1.0)
    assert(got("tokens_per_doc") == 2.5)     // (4+4+2+0)/4
    assert(got("lang_share_en") == 0.75 && got("lang_share_de") == 0.25)
    assert(got("source_share_web") == 0.75 && got("source_share_book") == 0.25)
  }

  test("StarSchema: globalDenseIds equals the one-window twin at forced parallelism") {
    val df = (1L to 500L).map(i => (i, (i * 2654435761L) % 1000)).toDF("id", "v")
    val got = StarSchema.globalDenseIds(df, Seq("v", "id"), numPartitions = 7)
    // heavy ties on v: the id tiebreak makes the order total, so every
    // partition boundary placement yields the same ids
    val gotMap = got.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    import org.apache.spark.sql.expressions.Window
    val twin = df.withColumn("sk", sf.row_number().over(
        Window.partitionBy(sf.pmod(sf.col("id"), sf.lit(1))).orderBy("v", "id")))
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    assert(gotMap == twin)
    // dense: ids are exactly 1..n
    assert(gotMap.values.toSeq.sorted == (1L to 500L))
  }

  test("EventOps: transitionMatrix per-key sequences, last event emits nothing") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (2L, 1L, "2024-01-01 10:01:00", "b"),
      (3L, 1L, "2024-01-01 10:02:00", "a"),  // user 1: a->b->a
      (4L, 2L, "2024-01-01 09:00:00", "a"),
      (5L, 2L, "2024-01-01 09:30:00", "b"))  // user 2: a->b
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", sf.to_timestamp(sf.col("ts_s")))
      .withColumn("value", sf.lit(0.0))
    val got = EventOps.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("EventOps: eventDeltas lag/lead features with total tie order") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 5.0),
      (2L, 1L, "2024-01-01 10:00:30", 7.5),  // +2.5, 30s
      (3L, 1L, "2024-01-01 10:00:30", 6.0),  // same ts: id breaks tie, -1.5, 0s
      (4L, 2L, "2024-01-01 09:00:00", 1.0))  // other key: no prev
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", sf.to_timestamp(sf.col("ts_s")))
      .withColumn("event_type", sf.concat(sf.lit("t"), sf.col("event_id")))
    val got = EventOps.eventDeltas(ev).collect()
    def row(i: Int) = (got(i).getLong(1),
      if (got(i).isNullAt(3)) None else Some(got(i).getDouble(3)),
      if (got(i).isNullAt(4)) None else Some(got(i).getLong(4)),
      if (got(i).isNullAt(5)) None else Some(got(i).getString(5)))
    assert(row(0) == (1L, None, None, Some("t2")))
    assert(row(1) == (2L, Some(2.5), Some(30L), Some("t3")))
    assert(row(2) == (3L, Some(-1.5), Some(0L), None))
    assert(row(3) == (4L, None, None, None))
  }

  test("QualityChecks: ksTest exact statistic, argmax tie-break, identical -> 0") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("x")
    val r = QualityChecks.ksTest(a, b, "x").collect()(0)
    // cum gaps (x4x4 scale): v=1:4, v=2:8, v=3:8, v=4:8, v=5:4, v=6:0
    // -> ks = 8/16 = 0.5 at the SMALLEST attaining value, v=2
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      (4L, 4L, 0.5, 2.0))
    val same = QualityChecks.ksTest(a, a, "x").collect()(0)
    assert(same.getDouble(2) == 0.0)
  }

  test("QualityChecks: chiSquared exact on hand tables; empty cells contribute") {
    // perfect independence -> 0
    val indep = Seq(("a","x"),("a","x"),("a","y"),("a","y"),
      ("b","x"),("b","x"),("b","y"),("b","y")).toDF("r", "c")
    val r0 = QualityChecks.chiSquared(indep, "r", "c").collect()(0)
    assert(r0.getDouble(0) == 0.0 && r0.getLong(1) == 1L && r0.getLong(2) == 8L)
    // fully concentrated 2x2: observed only (a,x) and (b,y); the two
    // EMPTY cells have e=2 and contribute 2 each -> chi2 = 8
    val dep = Seq.fill(4)(("a","x")).++(Seq.fill(4)(("b","y"))).toDF("r", "c")
    val r1 = QualityChecks.chiSquared(dep, "r", "c").collect()(0)
    assert(r1.getDouble(0) == 8.0 && r1.getLong(1) == 1L && r1.getLong(2) == 8L)
  }

  test("QualityChecks: mannWhitneyU exact U with midranked ties; sigma=0 -> NULL z") {
    // complete separation: every B above every A -> U = 0
    val a = Seq(1.0, 2.0, 3.0).toDF("x")
    val b = Seq(4.0, 5.0, 6.0).toDF("x")
    val r = QualityChecks.mannWhitneyU(a, b, "x").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == (3L, 3L, 0.0))
    assert(r.getDouble(3) < -1.9, s"z should be strongly negative: ${r.getDouble(3)}")
    // all values tie: midranks make U = n1*n2/2 and the tie-corrected
    // variance collapses to 0 -> z is NULL, not a division blowup
    val t1 = Seq(1.0, 1.0).toDF("x")
    val t2 = Seq(1.0).toDF("x")
    val rt = QualityChecks.mannWhitneyU(t1, t2, "x").collect()(0)
    assert(rt.getDouble(2) == 1.0 && rt.isNullAt(3))
  }

  test("QualityChecks: robustOutliers flags k*MAD deviants; MAD=0 degrades") {
    // 1..9 plus a 1000 spike: median 5.5, MAD 2.5, k=3 cut 7.5 —
    // only the spike (dev 994.5, score 397.8) survives
    val df = ((1L to 9L).map(i => (i, i.toDouble)) :+ (10L, 1000.0)).toDF("id", "v")
    val got = QualityChecks.robustOutliers(df, "id", "v", k = 3.0).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(10L))
    assert(got(0).getDouble(1) == 1000.0 && got(0).getDouble(2) == 397.8)
    // majority-constant column: MAD = 0, any deviating row flags with
    // NULL score (a finite k*MAD test is undefined)
    val const = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 7.0)).toDF("id", "v")
    val g2 = QualityChecks.robustOutliers(const, "id", "v").collect()
    assert(g2.map(_.getLong(0)).toSeq == Seq(4L) && g2(0).isNullAt(2))
  }

  test("Packing.lengthBucketing: round-up buckets, cap truncation, pad accounting") {
    // multiple=4, maxLen=8: 3 toks -> bucket 4 pad 1; 5 -> 8 pad 3;
    // 11 -> capped: bucket 8, pad 0, truncated 3; empty doc drops
    val df = Seq(
      (1L, "a b c"), (2L, "a b c d e"),
      (3L, (1 to 11).map(_ => "w").mkString(" ")), (4L, "  ")).toDF("id", "t")
    val got = Packing.lengthBucketing(df, "id", "t", multiple = 4, maxLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      (4L, 1L, 3L, 1L, 0L, 0.25),
      (8L, 2L, 16L, 3L, 3L, 0.1875)))
  }

  test("QualityChecks.cohensKappa: hand table, perfect agreement, degenerate NULL") {
    // cells: yy=6, yn=2, ny=2, nn=10 -> po=0.8, pe=0.52, kappa=0.5833
    val pairs = Seq.fill(6)(("y", "y")) ++ Seq.fill(2)(("y", "n")) ++
      Seq.fill(2)(("n", "y")) ++ Seq.fill(10)(("n", "n"))
    val r = QualityChecks.cohensKappa(pairs.toDF("a", "b"), "a", "b").collect()(0)
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((20L, 0.8, 0.52, 0.5833)))
    // identical labelings -> kappa exactly 1
    val perfect = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(QualityChecks.cohensKappa(perfect, "a", "b").collect()(0).getDouble(3) == 1.0)
    // both sides constant: pe = 1, kappa undefined -> NULL
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(QualityChecks.cohensKappa(const, "a", "b").collect()(0).isNullAt(3))
  }

  test("QualityChecks.prCurve: hand confusion table at every threshold") {
    // scores desc: 0.9(+) 0.8(-) 0.7(+) 0.6(+) 0.5(-)  => P=3, N=2
    val df = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 1), (0.5, 0))
      .toDF("score", "y")
    val got = QualityChecks.prCurve(df, "score", "y")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got.length == 5)
    assert(got(0) == ((0.9, 1L, 0L, 1.0, 0.333333, 0.5)))
    assert(got(1) == ((0.8, 1L, 1L, 0.5, 0.333333, 0.4)))
    assert(got(2) == ((0.7, 2L, 1L, 0.666667, 0.666667, 0.666667)))
    assert(got(3) == ((0.6, 3L, 1L, 0.75, 1.0, 0.857143)))
    assert(got(4) == ((0.5, 3L, 2L, 0.6, 1.0, 0.75)))
  }

  test("QualityChecks.prCurve: perfect separator reaches P=R=F1=1 at its threshold") {
    val df = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("score", "y")
    val rows = QualityChecks.prCurve(df, "score", "y").collect()
    val at08 = rows.find(_.getDouble(0) == 0.8).get
    assert(at08.getDouble(5) == 1.0 && at08.getDouble(6) == 1.0 &&
      at08.getDouble(7) == 1.0)
  }

  test("QualityChecks.kaplanMeier: hand product-limit table with censoring") {
    // classic worked example: events at t=1 (1 of 5), t=3 (1 of 3);
    // censored at t=2 and t=4; event+censor at nothing shared
    val df = Seq((1L, true), (2L, false), (3L, true), (4L, false), (5L, true))
      .toDF("d", "e")
    // durations: 1 e, 2 c, 3 e, 4 c, 5 e
    val got = QualityChecks.kaplanMeier(df, "d", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // t=1: n=5 d=1 -> S=0.8 ; t=2: censor only S stays 0.8
    // t=3: n=3 d=1 -> S=0.8*(2/3)=0.533333 ; t=4 censor S same
    // t=5: n=1 d=1 = wipe-out -> S=0.0
    assert(got(0) == ((1L, 5L, 1L, 0L, 0.8)))
    assert(got(1) == ((2L, 4L, 0L, 1L, 0.8)))
    assert(got(2) == ((3L, 3L, 1L, 0L, 0.533333)))
    assert(got(3) == ((4L, 2L, 0L, 1L, 0.533333)))
    assert(got(4) == ((5L, 1L, 1L, 0L, 0.0)))
  }

  test("QualityChecks.kaplanMeier: censor-only data keeps survival flat at 1") {
    val df = Seq((3L, false), (7L, false)).toDF("d", "e")
    val got = QualityChecks.kaplanMeier(df, "d", "e").collect()
    assert(got.forall(_.getDouble(4) == 1.0))
  }

  test("EventOps.timeToEvent: observed duration to first target; censored at last seen") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 00:00:30", "purchase"),
      (1L, "2024-01-01 00:05:00", "purchase"), // later target ignored
      (2L, "2024-01-01 00:00:00", "view"),
      (2L, "2024-01-01 00:02:00", "click"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("ts", sf.col("ts").cast("timestamp"))
    val got = EventOps.timeToEvent(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 30L, true), (2L, 120L, false)))
  }

  test("EventOps.mergeIntervals: overlap and touch merge, gaps split, containment absorbs") {
    val df = Seq(
      (1L, 0L, 10L),   // island 1: [0,10] ∪ [5,20] ∪ [20,25] = [0,25]
      (1L, 5L, 20L),
      (1L, 20L, 25L),  // touching merges
      (1L, 30L, 40L),  // island 2 after a gap
      (2L, 0L, 100L),  // island 1: containment absorbs [10,20]
      (2L, 10L, 20L)).toDF("k", "s", "e")
    val got = EventOps.mergeIntervals(df, "k", "s", "e").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (1L, 1L, 0L, 25L, 3L, 25L),
      (1L, 2L, 30L, 40L, 1L, 10L),
      (2L, 1L, 0L, 100L, 2L, 100L)), s"got $got")
  }

  test("QualityChecks.mcnemarTest: hand 2x2 cells, cc floor, zero-discordance NULL") {
    import spark.implicits._
    // 10 pairs: both right x4, both wrong x1, only-A x4, only-B x1
    val df = (Seq.fill(4)((true, true)) ++ Seq((false, false)) ++
      Seq.fill(4)((true, false)) ++ Seq((false, true))).toDF("a", "b")
    val r = QualityChecks.mcnemarTest(df, "a", "b").head()
    assert(r.getAs[Long]("n_pairs") == 10 && r.getAs[Long]("n_both") == 4 &&
      r.getAs[Long]("n_neither") == 1 && r.getAs[Long]("n_only_a") == 4 &&
      r.getAs[Long]("n_only_b") == 1)
    assert(r.getAs[Double]("acc_a") == 0.8 && r.getAs[Double]("acc_b") == 0.5)
    // stat = (4-1)^2/5 = 1.8; cc = (|3|-1)^2/5 = 0.8
    assert(r.getAs[Double]("mcnemar_stat") == 1.8 &&
      r.getAs[Double]("mcnemar_cc") == 0.8, r.toString)
    // |diff| < 1 -> cc floors at 0, not negative
    val tiny = Seq((true, false), (false, true)).toDF("a", "b")
    val rt = QualityChecks.mcnemarTest(tiny, "a", "b").head()
    assert(rt.getAs[Double]("mcnemar_stat") == 0.0 &&
      rt.getAs[Double]("mcnemar_cc") == 0.0)
    // no discordant pairs -> NULL statistics (no evidence either way)
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val ra = QualityChecks.mcnemarTest(agree, "a", "b").head()
    assert(ra.isNullAt(ra.fieldIndex("mcnemar_stat")) &&
      ra.isNullAt(ra.fieldIndex("mcnemar_cc")))
  }

  test("QualityChecks.brownForsythe: planted spread difference drives F up") {
    import spark.implicits._
    // group a: tight around 10; group b: same center, 10x the spread
    val a = Seq(9.0, 9.5, 10.0, 10.5, 11.0).map(("a", _))
    val b = Seq(5.0, 7.5, 10.0, 12.5, 15.0).map(("b", _))
    val f1 = QualityChecks.brownForsythe((a ++ b).toDF("g", "v"), "g", "v")
      .head().getAs[Double]("f_stat")
    // equal spreads (b shifted but same shape): deviations identical -> F = 0
    val b2 = Seq(99.0, 99.5, 100.0, 100.5, 101.0).map(("b", _))
    val f2 = QualityChecks.brownForsythe((a ++ b2).toDF("g", "v"), "g", "v")
      .head().getAs[Double]("f_stat")
    assert(f1 > 5.0, s"spread difference should drive F up, got $f1")
    assert(f2 == 0.0, s"identical shapes should give F = 0, got $f2")
    // a MEAN shift alone must not trip the variance test (that's ANOVA's job)
    val shifted = a ++ Seq(29.0, 29.5, 30.0, 30.5, 31.0).map(("b", _))
    val f3 = QualityChecks.brownForsythe(shifted.toDF("g", "v"), "g", "v")
      .head().getAs[Double]("f_stat")
    assert(f3 == 0.0, s"pure location shift must not trigger, got $f3")
  }

  test("EventOps.runsTest: alternating maximizes runs, clumping minimizes, exact z") {
    import spark.implicits._
    def ev(tp: String, counts: Seq[Int]): Seq[(Long, java.sql.Timestamp, String)] = {
      var id = 0L
      counts.zipWithIndex.flatMap { case (c, day) =>
        (1 to c).map { _ =>
          id += 1
          (id, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"), tp)
        }
      }
    }
    // count multiset {1,1,1,3,3,5,5,5}: nearest-rank lower median = 3
    // -> the two 3-count days DROP, leaving 3 below (1s) + 3 above (5s).
    // alt: 1,5,1,5,1,5,[3,3] -> 6 runs; clump: 1,1,1,5,5,5,[3,3] -> 2.
    // mu = 1 + 2*3*3/6 = 4; sig2 = 18*(18-6)/(36*5) = 1.2
    // z_alt = (6-4)/sqrt(1.2) = 1.825742; z_clump = (2-4)/sqrt(1.2)
    val df = (ev("alt", Seq(1, 5, 1, 5, 1, 5, 3, 3)) ++
      ev("clump", Seq(1, 1, 1, 5, 5, 5, 3, 3)))
      .toDF("event_id", "ts", "event_type")
      .withColumn("value", sf.lit(1.0)).withColumn("user_id", sf.lit(1L))
    val got = EventOps.runsTest(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val alt = got("alt"); val cl = got("clump")
    assert(alt.getAs[Long]("n_above") == 3 && alt.getAs[Long]("n_below") == 3 &&
      alt.getAs[Long]("n_runs") == 6, alt.toString)
    assert(cl.getAs[Long]("n_above") == 3 && cl.getAs[Long]("n_below") == 3 &&
      cl.getAs[Long]("n_runs") == 2, cl.toString)
    val zExp = math.floor(2.0 / math.sqrt(1.2) * 1e6 + 0.5) / 1e6
    assert(alt.getAs[Double]("z") == zExp, s"${alt.getAs[Double]("z")} vs $zExp")
    assert(cl.getAs[Double]("z") == math.floor(-2.0 / math.sqrt(1.2) * 1e6 + 0.5) / 1e6)
    // one-sided series: median = 5 (nearest-rank), the seven 5-count
    // days drop as median-equal, the lone 1 sits below -> NULL z
    val oneSided = ev("one", Seq(1, 5, 5, 5, 5, 5, 5, 5))
      .toDF("event_id", "ts", "event_type")
      .withColumn("value", sf.lit(1.0)).withColumn("user_id", sf.lit(1L))
    val r1 = EventOps.runsTest(oneSided).collect().head
    assert(r1.getAs[Long]("n_above") == 0 && r1.getAs[Long]("n_below") == 1 &&
      r1.isNullAt(r1.fieldIndex("z")), r1.toString)
  }

  test("EventOps.mannKendall: monotone ramp exact z, tied-flat series NULL") {
    import spark.implicits._
    def ev(tp: String, counts: Seq[Int]): Seq[(Long, java.sql.Timestamp, String)] = {
      var id = 0L
      counts.zipWithIndex.flatMap { case (c, day) =>
        (1 to c).map { _ =>
          id += 1
          (id, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"), tp)
        }
      }
    }
    // up: 1,2,3,4,5 -> S = C(5,2) = 10 concordant, no ties:
    // Var = 5*4*15/18; z = (10-1)/sqrt(Var)
    // flat: 2,2,2,2,2 -> S = 0, the 5-way tie cancels Var exactly -> NULL
    val df = (ev("up", Seq(1, 2, 3, 4, 5)) ++ ev("flat", Seq(2, 2, 2, 2, 2)))
      .toDF("event_id", "ts", "event_type")
      .withColumn("value", sf.lit(1.0)).withColumn("user_id", sf.lit(1L))
    val got = EventOps.mannKendall(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val up = got("up"); val fl = got("flat")
    assert(up.getAs[Long]("n_bins") == 5 && up.getAs[Long]("s_stat") == 10,
      up.toString)
    val zExp = math.floor(9.0 / math.sqrt((5.0 * 4.0 * 15.0 - 0.0) / 18.0)
      * 1e6 + 0.5) / 1e6
    assert(up.getAs[Double]("z") == zExp,
      s"${up.getAs[Double]("z")} vs $zExp")
    assert(fl.getAs[Long]("s_stat") == 0 && fl.isNullAt(fl.fieldIndex("z")),
      fl.toString)
  }

  test("QualityChecks.wassersteinDistance: hand CDF area, identical samples 0") {
    import spark.implicits._
    // a = {0, 1}, b = {1, 2}: merged domain 0,1,2; F_a = .5,1,1;
    // F_b = 0,.5,1 -> |gap| = .5 at both unit steps -> W1 = 1.0
    val a = Seq(0.0, 1.0).toDF("v")
    val b = Seq(1.0, 2.0).toDF("v")
    val r = QualityChecks.wassersteinDistance(a, b, "v").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("w1") == 1.0, r.toString)
    // identical samples -> exactly 0
    val same = QualityChecks.wassersteinDistance(a, a, "v").head()
    assert(same.getAs[Double]("w1") == 0.0)
    // unequal sizes: a={0}, b={0,10}: gap |1*2-1*1|=1 over [0,10]
    // -> 1*100000*1/(1*2*1e4) = 5.0
    val r2 = QualityChecks.wassersteinDistance(
      Seq(0.0).toDF("v"), Seq(0.0, 10.0).toDF("v"), "v").head()
    assert(r2.getAs[Double]("w1") == 5.0, r2.toString)
  }

  test("QualityChecks.gainsChart: perfect separation, ties in one bucket") {
    import spark.implicits._
    // 10 rows, scores 10..1, positives = top 3 scorers
    val df = (1 to 10).map(i => (i.toDouble, if (i >= 8) 1 else 0))
      .toDF("score", "y")
    val got = QualityChecks.gainsChart(df, "score", "y", nBuckets = 5)
      .collect()
    assert(got.length == 5)
    val b0 = got.head
    // bucket 0 = scores {10, 9}: both positive; base rate 0.3 -> lift 10/3
    assert(b0.getAs[Long]("n") == 2 && b0.getAs[Long]("n_pos") == 2)
    assert(b0.getAs[Double]("pos_rate") == 1.0 &&
      b0.getAs[Double]("gain") == math.floor(2.0 / 3.0 * 1e6 + 0.5) / 1e6 &&
      b0.getAs[Double]("lift") == math.floor(1.0 / 0.3 * 1e6 + 0.5) / 1e6)
    // full population captured by the last bucket
    assert(got.last.getAs[Double]("gain") == 1.0)
    // all-tied scores: every row lands in ONE bucket (no ntile split)
    val tied = (1 to 10).map(_ => (1.0, 1)).toDF("score", "y")
    val tg = QualityChecks.gainsChart(tied, "score", "y", nBuckets = 5).collect()
    assert(tg.length == 1 && tg.head.getAs[Int]("bucket") == 0 &&
      tg.head.getAs[Long]("n") == 10, tg.mkString(";"))
  }

  test("QualityChecks.welchTTest: hand t/df/d/g, zero-variance and tiny-side NULLs") {
    val a = Seq(1.0, 2.0, 3.0).map(("x", _)).toDF("t", "v")
    val b = Seq(2.0, 4.0, 6.0).map(("x", _)).toDF("t", "v")
    val r = QualityChecks.welchTTest(a, b, "v").head()
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 4.0)
    // va=1 vb=4: t = -2/sqrt(5/3), df = (5/3)^2/((1/9)/2+(16/9)/2) = 450/153
    assert(r.getAs[Double]("t_stat") ==
      math.floor(-2.0 / math.sqrt(5.0 / 3.0) * 1e4 + 0.5) / 1e4)
    assert(r.getAs[Double]("dof") == math.floor(450.0 / 153.0 * 1e4 + 0.5) / 1e4)
    // pooled = (2*1+2*4)/4 = 2.5; d = -2/sqrt(2.5); g = d*(1 - 3/15)
    val d = -2.0 / math.sqrt(2.5)
    assert(r.getAs[Double]("cohens_d") == math.floor(d * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("hedges_g") ==
      math.floor(d * (1.0 - 3.0 / 15.0) * 1e6 + 0.5) / 1e6)
    // both sides constant -> zero pooled/se -> NULL stats, means intact
    val c1 = Seq(5.0, 5.0).map(("x", _)).toDF("t", "v")
    val c2 = Seq(7.0, 7.0).map(("x", _)).toDF("t", "v")
    val rc = QualityChecks.welchTTest(c1, c2, "v").head()
    assert(rc.isNullAt(rc.fieldIndex("t_stat")) &&
      rc.isNullAt(rc.fieldIndex("cohens_d")) &&
      rc.getAs[Double]("mean_a") == 5.0)
    // a one-row side can't carry a variance -> NULL everything but means
    val r1 = QualityChecks.welchTTest(
      Seq(("x", 1.0)).toDF("t", "v"), b, "v").head()
    assert(r1.isNullAt(r1.fieldIndex("t_stat")) &&
      r1.isNullAt(r1.fieldIndex("dof")))
  }

  test("QualityChecks.kruskalWallis: hand H, tie-degenerate NULL") {
    // a = {1,2}, b = {3,4}: R_a = 3, R_b = 7 -> H = 12/20*(9/2+49/2)-15 = 2.4
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val r = QualityChecks.kruskalWallis(df, "g", "v").head()
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 4 &&
      r.getAs[Long]("dof") == 1)
    assert(r.getAs[Double]("h_stat") == 2.4, r.toString)
    // all values tied: the correction hits 0 -> NULL H
    val tied = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)).toDF("g", "v")
    val rt = QualityChecks.kruskalWallis(tied, "g", "v").head()
    assert(rt.isNullAt(rt.fieldIndex("h_stat")))
    // one group -> NULL (k < 2)
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(QualityChecks.kruskalWallis(one, "g", "v").head()
      .isNullAt(3))
  }

  test("QualityChecks.jarqueBera: symmetric skew 0, hand kurtosis, constant NULL") {
    val df = (Seq(1.0, 2.0, 3.0).map(("sym", _)) ++
      Seq(0.0, 0.0, 0.0, 10.0).map(("skewed", _)) ++
      Seq(4.0, 4.0).map(("flat", _))).toDF("g", "v")
    val rows = QualityChecks.jarqueBera(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val sym = rows("sym")
    // m2 = 2/3, m4 = 2/3 -> kurt = 1.5, jb = 0.5*(0 + 2.25/4) = 0.28125;
    // replay the PINNED double pipeline for jb (the exact 0.28125 sits on
    // a snap boundary the IEEE assembly lands a few ulps under)
    assert(sym.getAs[Double]("skewness") == 0.0)
    assert(sym.getAs[Double]("kurtosis") == 1.5)
    val jbExp = {
      val n = 3.0; val m1 = 2e4
      val r2 = (1e8 + 4e8 + 9e8) / n; val r3 = (1e12 + 8e12 + 27e12) / n
      val r4 = (1e16 + 16e16 + 81e16) / n
      val m2 = r2 - m1 * m1
      val m3 = r3 - m1 * 3 * r2 + m1 * 2 * m1 * m1
      val m4 = r4 - m1 * 4 * r3 + m1 * 6 * m1 * r2 - m1 * 3 * m1 * m1 * m1
      val skew = m3 / (math.sqrt(m2) * m2); val kurt = m4 / (m2 * m2)
      val jb = n / 6 * (skew * skew + (kurt - 3) * (kurt - 3) / 4)
      math.floor(jb * 1e4 + 0.5) / 1e4
    }
    assert(sym.getAs[Double]("jb_stat") == jbExp &&
      math.abs(jbExp - 0.28125) < 2e-4, sym.toString)
    assert(rows("skewed").getAs[Double]("skewness") > 1.0)
    assert(rows("flat").isNullAt(rows("flat").fieldIndex("jb_stat")))
  }

  test("QualityChecks.cramersV: perfect association 1, independence 0") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("r", "c")
    val rp = QualityChecks.cramersV(perfect, "r", "c").head()
    assert(rp.getAs[Double]("chi2") == 4.0 &&
      rp.getAs[Double]("cramers_v") == 1.0 &&
      rp.getAs[Double]("phi") == 1.0 &&
      rp.getAs[Double]("tschuprow_t") == 1.0)
    assert(rp.getAs[Double]("contingency_c") ==
      math.floor(math.sqrt(0.5) * 1e6 + 0.5) / 1e6)
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("r", "c")
    val ri = QualityChecks.cramersV(indep, "r", "c").head()
    assert(ri.getAs[Double]("chi2") == 0.0 &&
      ri.getAs[Double]("cramers_v") == 0.0)
    // a single-level column carries no association to measure
    val degen = Seq(("a", "x"), ("a", "y")).toDF("r", "c")
    val rd = QualityChecks.cramersV(degen, "r", "c").head()
    assert(rd.isNullAt(rd.fieldIndex("cramers_v")))
  }

  test("TextAnalysis.lexicalRichness: hand K/D/C/TTR/hapax on a tiny source") {
    // source s1: tokens {a:2, b:1} -> N=3 V=2 V1=1 sum m^2=5 sum m(m-1)=2
    val df = Seq(("s1", "a a b"), ("s2", "")).toDF("source", "text")
    val got = TextAnalysis.lexicalRichness(df, "source", "text").collect()
    assert(got.length == 1) // the empty doc contributes no source row
    val r = got.head
    assert(r.getAs[String]("source") == "s1" &&
      r.getAs[Long]("n_tokens") == 3 && r.getAs[Long]("vocab") == 2 &&
      r.getAs[Long]("hapax") == 1)
    assert(r.getAs[Double]("yule_k") ==
      math.floor(1e4 * (5.0 - 3.0) / 9.0 * 1e4 + 0.5) / 1e4)
    assert(r.getAs[Double]("simpson_d") ==
      math.floor(2.0 / 6.0 * 1e6 + 0.5) / 1e6)
    val c = math.floor(math.log(2.0) * 1e9 + 0.5) /
      math.floor(math.log(3.0) * 1e9 + 0.5)
    assert(r.getAs[Double]("herdan_c") == math.floor(c * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("ttr") == math.floor(2.0 / 3.0 * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("hapax_ratio") == 0.5)
    // single-token source: N < 2 -> K/D/C NULL, TTR still defined
    val one = Seq(("s1", "word")).toDF("source", "text")
    val ro = TextAnalysis.lexicalRichness(one, "source", "text").head()
    assert(ro.isNullAt(ro.fieldIndex("yule_k")) &&
      ro.isNullAt(ro.fieldIndex("simpson_d")) &&
      ro.getAs[Double]("ttr") == 1.0)
  }

  test("TextAnalysis.colemanLiau: hand letter/char/sentence counts, pinned CLI/ARI") {
    val df = Seq((1L, "The cat. A dog!"), (2L, " ")).toDF("doc_id", "text")
    val got = TextAnalysis.colemanLiau(df, "doc_id", "text").collect()
    assert(got.length == 1) // blank doc filtered
    val r = got.head
    assert(r.getAs[Long]("n_letters") == 10 && r.getAs[Long]("n_chars") == 10 &&
      r.getAs[Long]("n_words") == 4 && r.getAs[Long]("n_sentences") == 2)
    val cli = math.floor((0.0588 * (10.0 * 100 / 4) -
      0.296 * (2.0 * 100 / 4) - 15.8) * 1e4 + 0.5) / 1e4
    val ari = math.floor((4.71 * (10.0 / 4) +
      0.5 * (4.0 / 2) - 21.43) * 1e4 + 0.5) / 1e4
    assert(r.getAs[Double]("cli") == cli, r.toString)
    assert(r.getAs[Double]("ari") == ari, r.toString)
    // digits count as chars (ARI) but not letters (CLI)
    val dig = Seq((1L, "a1 b2")).toDF("doc_id", "text")
    val rd = TextAnalysis.colemanLiau(dig, "doc_id", "text").head()
    assert(rd.getAs[Long]("n_letters") == 2 && rd.getAs[Long]("n_chars") == 4)
  }

  test("CorpusStats.distributionDistances: hand TV/H/BD, identical-source zeros, disjoint absent") {
    val df = Seq(("s1", "a a b"), ("s2", "a c"), ("s3", "zzz"))
      .toDF("source", "text")
    val got = CorpusStats.distributionDistances(df, "source", "text").collect()
    // s3 shares nothing with anyone -> only the (s1, s2) pair appears
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("src_a") == "s1" && r.getAs[String]("src_b") == "s2" &&
      r.getAs[Long]("n_shared_terms") == 1)
    // p = {a: 2/3, b: 1/3}, q = {a: 1/2, c: 1/2}; replay the pinned chain
    val pa = (2.0 / 3.0); val pb = 0.5
    def s12(x: Double) = math.floor(x * 1e12 + 0.5)
    val tv = s12(0.5 * math.abs(pa - pb)) / 1e12 + 0.5 * (1.0 / 3.0 + 0.5)
    assert(r.getAs[Double]("tv") == math.floor(tv * 1e6 + 0.5) / 1e6)
    val h2 = s12(0.5 * (math.sqrt(pa) - math.sqrt(pb)) *
      (math.sqrt(pa) - math.sqrt(pb))) / 1e12 + 0.5 * (1.0 / 3.0 + 0.5)
    assert(r.getAs[Double]("hellinger") ==
      math.floor(math.sqrt(h2) * 1e6 + 0.5) / 1e6)
    val bc = s12(math.sqrt(pa * pb)) / 1e12
    assert(r.getAs[Double]("bhattacharyya") ==
      math.floor(-math.log(bc) * 1e6 + 0.5) / 1e6)
    // identical sources: every distance reads 0 after the 1e-6 round
    val same = Seq(("x", "a b c"), ("y", "a b c")).toDF("source", "text")
    val rs = CorpusStats.distributionDistances(same, "source", "text").head()
    assert(rs.getAs[Double]("tv") == 0.0 &&
      rs.getAs[Double]("hellinger") == 0.0 &&
      rs.getAs[Double]("bhattacharyya") == 0.0, rs.toString)
  }

  test("QualityChecks.wilsonInterval: extremes stay in [0,1], hand middle case") {
    val df = (Seq.fill(12)(("none", false)) ++ Seq.fill(12)(("all", true)) ++
      (Seq.fill(1)(("mid", true)) ++ Seq.fill(3)(("mid", false))))
      .toDF("g", "ok")
    val got = QualityChecks.wilsonInterval(df, "g", "ok").collect()
      .map(r => r.getString(0) -> r).toMap
    // p = 0: lower pins to exactly 0, upper stays well above 0
    val z = got("none")
    assert(z.getAs[Double]("rate") == 0.0 && z.getAs[Double]("wilson_lo") == 0.0)
    assert(z.getAs[Double]("wilson_hi") > 0.1 && z.getAs[Double]("wilson_hi") < 0.3)
    // p = 1: upper pins to exactly 1
    val o = got("all")
    assert(o.getAs[Double]("rate") == 1.0 && o.getAs[Double]("wilson_hi") == 1.0)
    assert(o.getAs[Double]("wilson_lo") > 0.7 && o.getAs[Double]("wilson_lo") < 0.9)
    // n = 4, k = 1: replay the pinned assembly
    val m = got("mid")
    val zz = 1.959964; val z2 = zz * zz; val n = 4.0; val p = 0.25
    val denom = 1.0 + z2 / n
    val center = (p + z2 / (n * 2)) / denom
    val half = zz * math.sqrt(p * (1.0 - p) / n + z2 / (n * n * 4)) / denom
    assert(m.getAs[Double]("wilson_lo") ==
      math.floor((center - half) * 1e6 + 0.5) / 1e6)
    assert(m.getAs[Double]("wilson_hi") ==
      math.floor((center + half) * 1e6 + 0.5) / 1e6)
  }

  test("EventOps.periodogram: planted 7-day cadence dominates; flat series NULL share") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(day: Int) = new java.sql.Timestamp(t0.getTime + day.toLong * 86400000L)
    // burst: 8 events every 7th day, 1 otherwise, 28 days; flat: 1/day
    val rows = (0 until 28).flatMap { d =>
      val n = if (d % 7 == 0) 8 else 1
      Seq.fill(n)((d.toLong, ts(d), 1L, "burst", 0.0))
    } ++ (0 until 28).map(d => (100L + d, ts(d), 2L, "flat", 0.0))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.periodogram(ev).collect()
    val burst = got.filter(_.getString(0) == "burst")
    assert(burst.length == 13) // periods 2..14
    val best = burst.maxBy(_.getAs[Long]("power"))
    // centered signal: C_7 = 28, S_7 = 0 -> power 784; divisor
    // periods 2/4/14 cancel exactly
    assert(best.getAs[Int]("period") == 7, burst.mkString(";"))
    assert(best.getAs[Long]("power") == 784)
    assert(best.getAs[Double]("share") > 0.3)
    assert(burst.filter(r => Set(2, 4, 14)(r.getAs[Int]("period")))
      .forall(_.getAs[Long]("power") == 0))
    // flat series: zero power everywhere, shares NULL
    val flat = got.filter(_.getString(0) == "flat")
    assert(flat.forall(r => r.getAs[Long]("power") == 0 &&
      r.isNullAt(r.fieldIndex("share"))))
  }

  test("QualityChecks.fleissKappa: hand kappa 1/3, perfect = 1, single-category NULL") {
    // items: (x,x), (x,y), (y,y) with 2 raters -> P-bar = 2/3, Pe = 1/2
    val df = Seq((1L, "x", "x"), (2L, "x", "y"), (3L, "y", "y"))
      .toDF("id", "a", "b")
    val r = QualityChecks.fleissKappa(df, "id", Seq("a", "b")).head()
    assert(r.getAs[Long]("n_items") == 3 && r.getAs[Int]("n_raters") == 2 &&
      r.getAs[Long]("n_categories") == 2)
    assert(r.getAs[Double]("p_observed") == math.floor(2.0 / 3.0 * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("p_expected") == 0.5)
    assert(r.getAs[Double]("kappa") == math.floor(1.0 / 3.0 * 1e4 + 0.5) / 1e4)
    // perfect agreement across TWO categories: kappa exactly 1
    val perfect = Seq((1L, "x", "x"), (2L, "y", "y")).toDF("id", "a", "b")
    assert(QualityChecks.fleissKappa(perfect, "id", Seq("a", "b")).head()
      .getAs[Double]("kappa") == 1.0)
    // all ratings one category: Pe = 1 -> undefined -> NULL
    val mono = Seq((1L, "x", "x"), (2L, "x", "x")).toDF("id", "a", "b")
    val rm = QualityChecks.fleissKappa(mono, "id", Seq("a", "b")).head()
    assert(rm.isNullAt(rm.fieldIndex("kappa")))
    // an item with a missing rating drops entirely (complete-case)
    val gappy = Seq((1L, "x", "x"), (2L, null.asInstanceOf[String], "y"))
      .toDF("id", "a", "b")
    assert(QualityChecks.fleissKappa(gappy, "id", Seq("a", "b")).head()
      .getAs[Long]("n_items") == 1)
  }

  test("QualityChecks.kendallTau: hand tau-b with ties, constant margin NULL") {
    // (1,1) (1,2) (2,1) (2,3) (3,3): nc=5, nd=1, n1=n2=2 -> tau=4/8=0.5
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 3L)).toDF("x", "y")
    val r = QualityChecks.kendallTau(df, "x", "y").head()
    assert(r.getAs[Long]("n") == 5 && r.getAs[Long]("n_cells") == 5)
    assert(r.getAs[Long]("concordant") == 5 && r.getAs[Long]("discordant") == 1)
    assert(r.getAs[Double]("tau_b") == 0.5, r.toString)
    // duplicated rows ride cell counts: doubling every row keeps tau
    val dd = df.union(df)
    val r2 = QualityChecks.kendallTau(dd, "x", "y").head()
    // nc=4*5+... every cross-cell pair product is 2*2=4; within-cell
    // pairs are double-ties and enter only the margins
    assert(r2.getAs[Long]("concordant") == 20 && r2.getAs[Long]("discordant") == 4)
    // constant x margin: every pair tied on x -> denominator 0 -> NULL
    val const = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    val rc = QualityChecks.kendallTau(const, "x", "y").head()
    assert(rc.isNullAt(rc.fieldIndex("tau_b")))
    // string-typed ordinals would order lexicographically ('10' < '2')
    // and corrupt nc/nd — the type guard must reject them up front
    val str = Seq(("2", 1L), ("10", 2L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      QualityChecks.kendallTau(str, "x", "y")
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }

  test("QualityChecks.cochranQ: hand Q = 3.0, NULL flag drops, degenerate NULL") {
    val df = Seq(
      (true, true, false), (true, false, false),
      (true, true, true), (false, false, false)).toDF("a", "b", "c")
    val r = QualityChecks.cochranQ(df, Seq("a", "b", "c")).head()
    // C=(3,2,1) N=6 R2=14: Q = 2*(3*14-36)/(18-14) = 3.0
    assert(r.getAs[Long]("n_subjects") == 4 && r.getAs[Int]("k") == 3 &&
      r.getAs[Long]("n_successes") == 6)
    assert(r.getAs[Double]("q_stat") == 3.0, r.toString)
    // a NULL flag drops the subject (complete-case)
    val gappy = df.union(Seq((null.asInstanceOf[java.lang.Boolean], true, true))
      .toDF("a", "b", "c").select(sf.col("a").cast("boolean"),
        sf.col("b").cast("boolean"), sf.col("c").cast("boolean")))
    assert(QualityChecks.cochranQ(gappy, Seq("a", "b", "c")).head()
      .getAs[Long]("n_subjects") == 4)
    // every subject all-1: denominator 0 -> NULL
    val allOn = Seq((true, true, true), (true, true, true)).toDF("a", "b", "c")
    val rd = QualityChecks.cochranQ(allOn, Seq("a", "b", "c")).head()
    assert(rd.isNullAt(rd.fieldIndex("q_stat")))
  }

  test("QualityChecks.friedman: clean ranks chi2=6, ties average, incomplete drops") {
    // three blocks, identical ordering A < B < C -> chi2_F = 6.0
    val df = Seq(
      ("b1", "A", 1.0), ("b1", "B", 2.0), ("b1", "C", 3.0),
      ("b2", "A", 1.0), ("b2", "B", 2.0), ("b2", "C", 3.0),
      ("b3", "A", 1.0), ("b3", "B", 2.0), ("b3", "C", 3.0)).toDF("b", "tr", "v")
    val r = QualityChecks.friedman(df, "b", "tr", "v").head()
    assert(r.getAs[Long]("n_blocks") == 3 && r.getAs[Long]("k") == 3)
    assert(r.getAs[Double]("chi2_f") == 6.0, r.toString)
    // an incomplete block drops; result unchanged
    val plus = df.union(Seq(("b4", "A", 9.0)).toDF("b", "tr", "v"))
    assert(QualityChecks.friedman(plus, "b", "tr", "v").head()
      .getAs[Double]("chi2_f") == 6.0)
    // ties average: one block, A=B tie at rank 1.5, C rank 3
    // R2 = (3, 3, 6): chi2 = 3*(9+9+36)/(1*3*4) - 3*1*4 = 13.5 - 12 = 1.5
    val tied = Seq(("b1", "A", 1.0), ("b1", "B", 1.0), ("b1", "C", 2.0))
      .toDF("b", "tr", "v")
    assert(QualityChecks.friedman(tied, "b", "tr", "v").head()
      .getAs[Double]("chi2_f") == 1.5)
  }

  test("QualityChecks.pageTrend: perfect order z=2, reversal negates, string rejected") {
    // two blocks, values increase WITH the treatment order 0<1<2:
    // R_j = (2,4,6), L = 1*2+2*4+3*6 = 28; mu = 24, sigma = 2 -> z = 2
    val df = Seq(
      ("b1", 0L, 1.0), ("b1", 1L, 2.0), ("b1", 2L, 3.0),
      ("b2", 0L, 1.0), ("b2", 1L, 2.0), ("b2", 2L, 3.0)).toDF("b", "tr", "v")
    val r = QualityChecks.pageTrend(df, "b", "tr", "v").head()
    assert(r.getAs[Long]("n_blocks") == 2 && r.getAs[Long]("k") == 3)
    assert(r.getAs[Double]("l_stat") == 28.0 &&
      r.getAs[Double]("z_trend") == 2.0, r.toString)
    // perfectly reversed order: L = 3*2+2*4+1*6 = 20 -> z = -2
    val rev = Seq(
      ("b1", 0L, 3.0), ("b1", 1L, 2.0), ("b1", 2L, 1.0),
      ("b2", 0L, 3.0), ("b2", 1L, 2.0), ("b2", 2L, 1.0)).toDF("b", "tr", "v")
    val rr = QualityChecks.pageTrend(rev, "b", "tr", "v").head()
    assert(rr.getAs[Double]("z_trend") == -2.0, rr.toString)
    // incomplete block drops; result unchanged
    val plus = df.union(Seq(("b3", 0L, 9.0)).toDF("b", "tr", "v"))
    assert(QualityChecks.pageTrend(plus, "b", "tr", "v").head()
      .getAs[Double]("z_trend") == 2.0)
    // k = 2 is below Page's minimum: L reported, z NULL
    val two = Seq(("b1", 0L, 1.0), ("b1", 1L, 2.0)).toDF("b", "tr", "v")
    val rt = QualityChecks.pageTrend(two, "b", "tr", "v").head()
    assert(rt.isNullAt(rt.fieldIndex("z_trend")), rt.toString)
    // string treatment codes rejected (lexicographic order would lie)
    val e = intercept[IllegalArgumentException] {
      QualityChecks.pageTrend(Seq(("b", "s1", 1.0)).toDF("b", "tr", "v"),
        "b", "tr", "v")
    }
    assert(e.getMessage.contains("INTEGER"), e.getMessage)
  }

  test("EventOps.siegelTrend: linear slope exact, one huge outlier ignored") {
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-06-${10 + d}%02d 12:00:00")
    // daily counts (1,2,3,4): every pair slope is 1 -> siegel 1.0
    val lin = (0 until 4).flatMap(d => Seq.fill(d + 1)(("x", day(d), 1.0)))
      .toDF("event_type", "ts", "value")
    val r = EventOps.siegelTrend(lin).head()
    assert(r.getAs[Long]("n_bins") == 4 &&
      r.getAs[Double]("siegel_slope_per_day") == 1.0, r.toString)
    // counts (1,2,3,4,100): the outlier owns only point 4's inner
    // median (32.6667); the outer median over (1,1,1,1,32.6667) is 1.0
    val out = ((0 until 4).flatMap(d => Seq.fill(d + 1)(("x", day(d), 1.0))) ++
      Seq.fill(100)(("x", day(4), 1.0))).toDF("event_type", "ts", "value")
    val ro = EventOps.siegelTrend(out).head()
    assert(ro.getAs[Long]("n_bins") == 5 &&
      ro.getAs[Double]("siegel_slope_per_day") == 1.0, ro.toString)
  }

  test("EventOps.ljungBox: hand Q from the lag-1..3 ACF of a 4-bin series") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-06-10 $h%02d:00:00")
    // hourly counts 1,2,1,2: r1=-0.75, r2=0.5, r3=-0.25
    // Q = 4*6*(0.5625/3 + 0.25/2 + 0.0625/1) = 9.0
    val ev = Seq(
      ("x", ts(0), 1.0), ("x", ts(1), 1.0), ("x", ts(1), 1.0),
      ("x", ts(2), 1.0), ("x", ts(3), 1.0), ("x", ts(3), 1.0))
      .toDF("event_type", "ts", "value")
    val r = EventOps.ljungBox(ev).head()
    assert(r.getAs[Long]("n_bins") == 4 && r.getAs[Long]("n_lags") == 3)
    assert(r.getAs[Double]("q_stat") == 9.0, r.toString)
    // constant series: every acf NULL -> no output row for the type
    val const = Seq(("c", ts(0), 1.0), ("c", ts(1), 1.0))
      .toDF("event_type", "ts", "value")
    assert(EventOps.ljungBox(const).collect().isEmpty)
  }

  test("EventOps.durbinWatson: alternating residuals DW=3.4, exact fit NULL") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-06-10 $h%02d:00:00")
    // y = 1,2,1,2 over bins 0..3: fit y = 1.2 + 0.2x,
    // e = (-0.2, 0.6, -0.6, 0.2) -> DW = 2.72/0.8 = 3.4
    val ev = Seq(("x", ts(0), 1.0), ("x", ts(1), 2.0),
      ("x", ts(2), 1.0), ("x", ts(3), 2.0)).toDF("event_type", "ts", "value")
    val r = EventOps.durbinWatson(ev).head()
    assert(r.getAs[Long]("n_bins") == 4 && r.getAs[Long]("n_diffs") == 3)
    assert(r.getAs[Double]("dw") == 3.4, r.toString)
    // exactly linear series: zero residual sum -> NULL dw
    val lin = Seq(("x", ts(0), 1.0), ("x", ts(1), 2.0),
      ("x", ts(2), 3.0), ("x", ts(3), 4.0)).toDF("event_type", "ts", "value")
    val rl = EventOps.durbinWatson(lin).head()
    assert(rl.isNullAt(rl.fieldIndex("dw")))
  }

  test("EventOps.forecastBacktest: perfect period-2 pattern has MASE 0; flat NULL") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-06-10 $h%02d:00:00")
    def evts(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)(("x", ts(h), 1.0))
    }.toDF("event_type", "ts", "value")
    // counts 1,2,1,2,1,2: lag-2 forecast is exact; naive walk errs 1/bin
    val r = EventOps.forecastBacktest(evts(Seq(1, 2, 1, 2, 1, 2)), season = 2).head()
    assert(r.getAs[Long]("n_naive") == 5 && r.getAs[Long]("n_forecasts") == 4)
    assert(r.getAs[Double]("mae") == 0.0 && r.getAs[Double]("mase") == 0.0 &&
      r.getAs[Double]("smape") == 0.0, r.toString)
    // flat series: zero naive denominator -> NULL MASE, zero sMAPE
    val rf = EventOps.forecastBacktest(evts(Seq(2, 2, 2, 2)), season = 2).head()
    assert(rf.isNullAt(rf.fieldIndex("mase")) && rf.getAs[Double]("smape") == 0.0)
  }

  test("EventOps.seasonalStrength: planted period-2 pattern scores 0.8; flat NULL") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-06-10 $h%02d:00:00")
    def evts(counts: Seq[Int]) = counts.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)(("x", ts(h), 1.0))
    }.toDF("event_type", "ts", "value")
    // counts 1,3,1,3: trend y=1.4+0.4x, detrended +-(0.4,1.2) pattern,
    // phase means +-0.8 -> Var(r)/Var(d) = 256/1280 -> F_s = 0.8
    val r = EventOps.seasonalStrength(evts(Seq(1, 3, 1, 3)), period = 2).head()
    assert(r.getAs[Long]("n_bins") == 4)
    assert(r.getAs[Double]("seasonal_strength") == 0.8, r.toString)
    // constant series: zero detrended variance -> NULL
    val rf = EventOps.seasonalStrength(evts(Seq(2, 2, 2, 2)), period = 2).head()
    assert(rf.isNullAt(rf.fieldIndex("seasonal_strength")))
  }

  test("TextAnalysis.compressibility: templated/noise tails split by group") {
    val rep = "spam spam spam spam. " * 100
    val noise = (0 until 100).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString
    val df = Seq(("tpl", rep), ("tpl", rep), ("mix", rep), ("mix", noise))
      .toDF("source", "text")
    val got = TextAnalysis.compressibility(df, "text", "source",
      loThreshold = 0.3, hiThreshold = 0.95)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("tpl").getAs[Long]("n_docs") == 2 &&
      got("tpl").getAs[Double]("share_templated") == 1.0 &&
      got("tpl").getAs[Double]("share_noise") == 0.0)
    assert(got("mix").getAs[Double]("share_templated") == 0.5)
    assert(got("mix").getAs[Double]("mean_ratio") >
      got("tpl").getAs[Double]("mean_ratio"))
  }

  test("CorpusStats.captureRecapture: hand counts, zero overlap NULL LP") {
    // A = {1..6}, B = {4..9}: n1=6, n2=6, m=3 -> LP = 12, Chapman =
    // 49/4 - 1 = 11.25, rates 0.5
    val a = (1L to 6L).toDF("id")
    val b = (4L to 9L).toDF("id")
    val r = CorpusStats.captureRecapture(a, b, "id").head()
    assert(r.getAs[Long]("n1") == 6 && r.getAs[Long]("n2") == 6 &&
      r.getAs[Long]("overlap") == 3)
    assert(r.getAs[Double]("lincoln_petersen") == 12.0)
    assert(r.getAs[Double]("chapman") == 11.25)
    assert(r.getAs[Double]("overlap_rate_a") == 0.5 &&
      r.getAs[Double]("overlap_rate_b") == 0.5)
    // disjoint captures: LP undefined, Chapman still defined
    val r0 = CorpusStats.captureRecapture(a,
      (10L to 12L).toDF("id"), "id").head()
    assert(r0.isNullAt(r0.fieldIndex("lincoln_petersen")))
    assert(r0.getAs[Double]("chapman") == 27.0)
    // duplicate rows collapse: captures are SETS
    assert(CorpusStats.captureRecapture(a.union(a), b, "id").head()
      .getAs[Long]("n1") == 6)
  }

  test("EventOps.dispersionProfile: hand Fano=1, zero shares vs Poisson") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-06-10 $h%02d:00:00")
    val ev = (Seq.fill(1)(("x", ts(0), 1.0)) ++ Seq.fill(3)(("x", ts(1), 1.0)) ++
      Seq(("y", ts(0), 1.0))).toDF("event_type", "ts", "value")
    val got = EventOps.dispersionProfile(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    // x: counts (1,3): mean 2, var 2 -> dispersion 1, chi2 1, no zeros
    val x = got("x")
    assert(x.getAs[Long]("n_bins") == 2 && x.getAs[Double]("mean_per_bin") == 2.0)
    assert(x.getAs[Double]("dispersion") == 1.0 && x.getAs[Double]("chi2") == 1.0)
    assert(x.getAs[Double]("zero_share") == 0.0)
    assert(x.getAs[Double]("poisson_zero_share") ==
      math.floor(math.exp(-2.0) * 1e6 + 0.5) / 1e6)
    // y: counts (1,0) over the global grid: one zero bin; mean 0.5,
    // sample var 0.5 -> Fano exactly 1 (a Bernoulli thin series)
    val y = got("y")
    assert(y.getAs[Double]("zero_share") == 0.5 &&
      y.getAs[Double]("dispersion") == 1.0, y.toString)
  }

  test("CorpusStats.dunningCollocations: hand G2 replay, degenerate zero") {
    val docs = Seq("a b", "a b", "c d", "c b").toDF("text")
    val got = CorpusStats.dunningCollocations(docs, "text",
      minCount = 1, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("g2")).toMap
    // (a,b): k1=2 n1=2 k2=1 n2=2, p=3/4 p1=1 p2=1/2
    def ell(k: Long, n: Long, x: Double) =
      (if (k > 0 && x > 0) k * math.log(x) else 0.0) +
        (if (n - k > 0 && x < 1) (n - k) * math.log(1 - x) else 0.0)
    val g2ab = 2.0 * (ell(2, 2, 1.0) + ell(1, 2, 0.5) -
      ell(2, 2, 0.75) - ell(1, 2, 0.75))
    assert(got(("a", "b")) == math.floor(g2ab * 1e4 + 0.5) / 1e4, got.toString)
    // a corpus where every bigram starts with the same token: p = p1
    // exactly for its only pair -> evidence cancels to 0
    val deg = Seq("x y", "x y").toDF("text")
    val g0 = CorpusStats.dunningCollocations(deg, "text", minCount = 1, topK = 10)
      .collect()
    assert(g0.length == 1 && g0.head.getAs[Double]("g2") == 0.0, g0.toSeq.toString)
  }

  test("EventOps.ccf: planted lag-1 lead detected; constant series NULL") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-06-10 $h%02d:00:00")
    // x spikes at h1, y at h2: x = (0,1,0,0), y = (0,0,1,0)
    val ev = (Seq(("x", ts(1), 1.0), ("y", ts(2), 1.0)) ++
      // anchor the global grid to [0, 3] via a third type
      Seq(("z", ts(0), 1.0), ("z", ts(3), 1.0)))
      .toDF("event_type", "ts", "value")
    val got = EventOps.ccf(ev, "x", "y", maxLag = 1).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == 3 && got(0L).getAs[Long]("n_bins") == 4)
    // centered x = (-1,3,-1,-1), y = (-1,-1,3,-1), den = 12
    assert(got(1L).getAs[Double]("ccf") ==
      math.floor(11.0 / 12 * 1e6 + 0.5) / 1e6, got.toString)
    assert(got(0L).getAs[Double]("ccf") ==
      math.floor(-4.0 / 12 * 1e6 + 0.5) / 1e6)
    assert(got(-1L).getAs[Double]("ccf") ==
      math.floor(-5.0 / 12 * 1e6 + 0.5) / 1e6)
    // constant series on either side: zero variance -> NULL
    val const = (Seq(("x", ts(0), 1.0), ("x", ts(1), 1.0)) ++
      Seq(("y", ts(0), 1.0))).toDF("event_type", "ts", "value")
    val rc = EventOps.ccf(const, "x", "y", maxLag = 1).collect()
    assert(rc.forall(_.isNullAt(2)), rc.toSeq.toString)
  }

  test("EventOps.spectralEntropy: replays its own periodogram; flat NULL") {
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-06-${10 + d}%02d $h%02d:00:00")
    // 8 daily bins alternating 1 vs 7 events: a strong period-2 cadence
    val ev = (0 until 8).flatMap { d =>
      Seq.fill(if (d % 2 == 0) 1 else 7)(("x", ts(d, 0), 1.0))
    }.toDF("event_type", "ts", "value")
    val r = EventOps.spectralEntropy(ev).head()
    assert(r.getAs[Int]("dominant_period") == 2 &&
      r.getAs[Long]("n_periods") == 13, r.toString)
    // composition: entropy must equal the replay over the operator's
    // own periodogram shares, snap-then-sum at 1e-9, ln(13) normalizer
    val shares = EventOps.periodogram(ev).collect()
      .map(x => Option(x.getAs[java.lang.Double]("share")).map(_.doubleValue))
    val s9 = shares.flatten.filter(_ > 0)
      .map(p => math.floor(-p * math.log(p) * 1e9 + 0.5)).sum
    assert(r.getAs[Double]("spectral_entropy") ==
      math.floor(s9 / 1e9 / math.log(13.0) * 1e6 + 0.5) / 1e6)
    // constant series: flat band -> NULL entropy and NULL dominant
    val flat = (0 until 4).map(d => ("c", ts(d, 0), 1.0))
      .toDF("event_type", "ts", "value")
    val rf = EventOps.spectralEntropy(flat).head()
    assert(rf.isNullAt(rf.fieldIndex("spectral_entropy")) &&
      rf.isNullAt(rf.fieldIndex("dominant_period")))
  }

  test("CorpusStats.theilDecomposition: between-only corpus; decomposition holds") {
    def snap12(v: Double) = math.floor(v * 1e12 + 0.5)
    def r6(v: Double) = math.floor(v / 1e12 * 1e6 + 0.5) / 1e6
    // equal docs inside each source: ALL inequality is between-source
    val flat = Seq(("a", "w w"), ("a", "w w"), ("b", "w w w w"))
      .toDF("source", "text")
    val rf = CorpusStats.theilDecomposition(flat, "text", "source").head()
    assert(rf.getAs[Long]("n_docs") == 3 && rf.getAs[Long]("n_sources") == 2)
    val tTot = snap12(0.25 * math.log(0.75)) * 2 + snap12(0.5 * math.log(1.5))
    assert(rf.getAs[Double]("theil_total") == r6(tTot), rf.toString)
    assert(rf.getAs[Double]("theil_between") == rf.getAs[Double]("theil_total"))
    assert(rf.getAs[Double]("theil_within") == 0.0 &&
      rf.getAs[Double]("residual") == 0.0)
    // unequal docs inside a: total = between + within up to snapping
    val mix = Seq(("a", "w"), ("a", "w w w"), ("b", "w w w w"))
      .toDF("source", "text")
    val rm = CorpusStats.theilDecomposition(mix, "text", "source").head()
    assert(rm.getAs[Double]("theil_within") > 0.0)
    assert(math.abs(rm.getAs[Double]("theil_total") -
      rm.getAs[Double]("theil_between") - rm.getAs[Double]("theil_within"))
      <= 2e-6, rm.toString)
    assert(math.abs(rm.getAs[Double]("residual")) <= 2e-6)
  }

  test("CorpusStats.termBurstiness: clumped term outranks spread term") {
    val docs = Seq((1L, "x x x"), (2L, "y"), (3L, "y")).toDF("doc_id", "text")
    val got = CorpusStats.termBurstiness(docs, "doc_id", "text",
      minCount = 1, topK = 10).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("x", "y"))
    // x: N=3, tf=3, sq=9 -> (27-9)/9 = 2; y: tf=2, sq=2 -> 2/6
    assert(got(0).getAs[Double]("burstiness") == 2.0)
    assert(got(1).getAs[Double]("burstiness") ==
      math.floor(2.0 / 6.0 * 1e6 + 0.5) / 1e6)
    assert(got(0).getAs[Long]("df") == 1 && got(1).getAs[Long]("df") == 2)
  }

  test("EventOps.diffInDiff: hand cells, did=2.5, unpooled se; empty cell NULL") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val pre = ts("2024-01-10 00:00:00"); val post = ts("2024-01-20 00:00:00")
    val df = Seq(
      (1L, pre, 1.0), (1L, pre, 2.0), (1L, post, 4.0), (1L, post, 6.0),
      (2L, pre, 1.0), (2L, pre, 1.0), (2L, post, 2.0), (2L, post, 2.0))
      .toDF("user_id", "ts", "value")
    val r = EventOps.diffInDiff(df, "2024-01-16 00:00:00", _ % 2 === 1).head()
    assert(r.getAs[Long]("n_t_pre") == 2 && r.getAs[Long]("n_c_post") == 2)
    assert(r.getAs[Double]("mean_t_post") == 5.0 &&
      r.getAs[Double]("mean_c_pre") == 1.0)
    // did = (5 - 1.5) - (2 - 1) = 2.5; se^2 = 0.5/2 + 2/2 = 1.25
    assert(r.getAs[Double]("did") == 2.5, r.toString)
    assert(r.getAs[Double]("se") == math.floor(math.sqrt(1.25) * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("t_stat") ==
      math.floor(2.5 / math.sqrt(1.25) * 1e6 + 0.5) / 1e6)
    // an empty cell (no control post rows) -> NULL did
    val gap = df.filter(!(sf.col("user_id") === 2L && sf.col("ts") === post))
    val rg = EventOps.diffInDiff(gap, "2024-01-16 00:00:00", _ % 2 === 1).head()
    assert(rg.isNullAt(rg.fieldIndex("did")))
  }

  test("QualityChecks.logRank: hand O/E/V replay; single-cohort NULL") {
    // A: events at t=1,3; B: event at t=2, censored at t=3
    val df = Seq((1L, true, "a"), (3L, true, "a"), (2L, true, "b"),
      (3L, false, "b")).toDF("dur", "ev", "g")
    val r = QualityChecks.logRank(df, "dur", "ev", "g", "a", "b").head()
    assert(r.getAs[Long]("n_event_times") == 3 && r.getAs[Long]("o1") == 2)
    // E terms: 1*2/4, 1*1/3, 1*1/2 snapped 1e-9; V: 1/4, 2/9, 1/4
    val e9 = math.floor(0.5 * 1e9 + 0.5) + math.floor(1.0 / 3 * 1e9 + 0.5) +
      math.floor(0.5 * 1e9 + 0.5)
    // t2: dt=1, n1t=1, n2t=2, n=3 -> (1/3)(2/3)(3-1)/(3-1) = 2/9
    val v9 = math.floor(0.25 * 1e9 + 0.5) +
      math.floor(1.0 / 3 * (2.0 / 3) * 2.0 / 2.0 * 1e9 + 0.5) +
      math.floor(0.25 * 1e9 + 0.5)
    assert(r.getAs[Double]("e1") == math.floor(e9 / 1e9 * 1e6 + 0.5) / 1e6)
    val chi = (2.0 - e9 / 1e9) * (2.0 - e9 / 1e9) / (v9 / 1e9)
    assert(r.getAs[Double]("chi2") == math.floor(chi * 1e6 + 0.5) / 1e6, r.toString)
    // one empty cohort: zero variance -> NULL chi2
    val solo = Seq((1L, true, "a"), (2L, false, "a")).toDF("dur", "ev", "g")
    val rs = QualityChecks.logRank(solo, "dur", "ev", "g", "a", "b").head()
    assert(rs.isNullAt(rs.fieldIndex("chi2")))
  }

  test("QualityChecks.nelsonAalen: hand hazard increments accumulate") {
    val df = Seq((1L, true), (2L, false), (3L, true)).toDF("dur", "ev")
    val rows = QualityChecks.nelsonAalen(df, "dur", "ev").collect()
      .map(r => r.getLong(0) -> r).toMap
    // t=1: 1/3 of hazard; t=2 censor adds none; t=3: + 1/1
    val h1 = math.floor(1.0 / 3 * 1e9 + 0.5)
    assert(rows(1L).getAs[Double]("cum_hazard") ==
      math.floor(h1 / 1e9 * 1e6 + 0.5) / 1e6)
    assert(rows(2L).getAs[Double]("cum_hazard") ==
      rows(1L).getAs[Double]("cum_hazard"))
    assert(rows(3L).getAs[Long]("n_risk") == 1)
    assert(rows(3L).getAs[Double]("cum_hazard") ==
      math.floor((h1 + 1e9) / 1e9 * 1e6 + 0.5) / 1e6)
    val v3 = math.floor(1.0 / 9 * 1e9 + 0.5) + 1e9
    assert(rows(3L).getAs[Double]("hazard_var") ==
      math.floor(v3 / 1e9 * 1e6 + 0.5) / 1e6)
    assert(rows(3L).getAs[Double]("fh_survival") ==
      math.floor(math.exp(-(h1 + 1e9) / 1e9) * 1e6 + 0.5) / 1e6)
  }

  test("QualityChecks.aalenJohansen: CIFs sum to 1 - S, censor adds nothing") {
    val df = Seq((1L, Option("a")), (2L, Option("b")),
      (3L, Option.empty[String]), (4L, Option("a"))).toDF("dur", "cause")
    val got = QualityChecks.aalenJohansen(df, "dur", "cause", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    assert(got.size == 8)
    // t1: S(1-)=1, inc_a = 1/4
    assert(got((1L, "a")).getAs[Double]("cif") == 0.25 &&
      got((1L, "a")).getAs[Long]("n_risk") == 4)
    assert(got((1L, "b")).getAs[Double]("cif") == 0.0)
    // t2: S(2-)=3/4, inc_b = (3/4)(1/3) = 1/4
    assert(got((2L, "b")).getAs[Double]("cif") == 0.25)
    // t3 is a pure censor row: both CIFs unchanged
    assert(got((3L, "a")).getAs[Double]("cif") == 0.25 &&
      got((3L, "b")).getAs[Double]("cif") == 0.25 &&
      got((3L, "a")).getAs[Long]("n_event") == 0)
    // t4: S(4-)=1/2, last 'a' claims it all: cif_a = 3/4; sum = 1 - S(4) = 1
    assert(got((4L, "a")).getAs[Double]("cif") == 0.75 &&
      got((4L, "b")).getAs[Double]("cif") == 0.25, got.toString)
  }

  test("QualityChecks.hodgesLehmann: pairwise-difference medians by hand") {
    def df(vs: Long*) = vs.toSeq.toDF("v")
    // A={1,3}, B={2}: diffs {-1, 1} -> lower median -1
    val r = QualityChecks.hodgesLehmann(df(1, 3), df(2), "v").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 1 &&
      r.getAs[Long]("hl_shift") == -1, r.toString)
    // A={1,2,3}, B={1}: diffs {0,1,2} -> true median 1
    assert(QualityChecks.hodgesLehmann(df(1, 2, 3), df(1), "v").head()
      .getAs[Long]("hl_shift") == 1)
    // duplicates carry weight: A={5,5}, B={1} -> single diff 4
    assert(QualityChecks.hodgesLehmann(df(5, 5), df(1), "v").head()
      .getAs[Long]("hl_shift") == 4)
  }

  test("QualityChecks.rmst: step-curve areas by hand, horizon clamps") {
    // KM from events at t=1,3 (n=2): S=[0.5 on [1,3), 0 after 3)
    val df = Seq((1L, true), (3L, true)).toDF("dur", "ev")
    // tau=5: 1*[0,1) + 0.5*[1,3) + 0*[3,5) = 2.0
    val r5 = QualityChecks.rmst(df, "dur", "ev", tau = 5L).head()
    assert(r5.getAs[Long]("tau") == 5 && r5.getAs[Long]("n_times") == 2)
    assert(r5.getAs[Double]("rmst") == 2.0, r5.toString)
    // tau=2 clamps the middle segment: 1 + 0.5*[1,2) = 1.5
    assert(QualityChecks.rmst(df, "dur", "ev", tau = 2L).head()
      .getAs[Double]("rmst") == 1.5)
    // tau before the first event: the whole area is the S=1 head
    assert(QualityChecks.rmst(df, "dur", "ev", tau = 1L).head()
      .getAs[Double]("rmst") == 1.0)
  }

  test("QualityChecks.pairwiseContrasts: hand Welch pair, singleton NULLs") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 5.0), ("c", 9.0))
      .toDF("g", "v")
    val got = QualityChecks.pairwiseContrasts(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == 3)
    val ab = got(("a", "b"))
    // a: mean 1.5 var .5; b: mean 4 var 2 -> se2 = .25 + 1 = 1.25
    assert(ab.getAs[Double]("diff") == -2.5)
    assert(ab.getAs[Double]("se") == math.floor(math.sqrt(1.25) * 1e6 + 0.5) / 1e6)
    assert(ab.getAs[Double]("t_stat") ==
      math.floor(-2.5 / math.sqrt(1.25) * 1e6 + 0.5) / 1e6)
    // Welch df = 1.25^2 / (.25^2/1 + 1/1) = 1.470588...
    assert(ab.getAs[Double]("welch_df") ==
      math.floor(1.5625 / 1.0625 * 1e4 + 0.5) / 1e4)
    // singleton group c: means print, inference is NULL
    val ac = got(("a", "c"))
    assert(ac.getAs[Double]("mean_b") == 9.0 &&
      ac.isNullAt(ac.fieldIndex("t_stat")) && ac.isNullAt(ac.fieldIndex("se")))
  }

  test("QualityChecks.spiegelhalterZ: hand z, degenerate half-probs NULL") {
    // (p=.25, y=0), (p=.75, y=1): num = -2.5e7/1e8 = -0.25,
    // den = 9.375e14/1e16 -> z = -0.25/sqrt(0.09375) = -0.816497
    val df = Seq((0.25, 0), (0.75, 1)).toDF("conf", "y")
    val r = QualityChecks.spiegelhalterZ(df, "conf", "y").head()
    assert(r.getAs[Long]("n") == 2 && r.getAs[Long]("n_pos") == 1)
    assert(r.getAs[Double]("z") == -0.816497, r.toString)
    // p = 0.5 everywhere: every (1-2p) term is 0 -> den 0 -> NULL
    val half = Seq((0.5, 1), (0.5, 0)).toDF("conf", "y")
    val rh = QualityChecks.spiegelhalterZ(half, "conf", "y").head()
    assert(rh.isNullAt(rh.fieldIndex("z")), rh.toString)
  }

  test("EventOps.conditionalEntropy: hand chain nats, memoryless zero") {
    import spark.implicits._
    // u1: a->b, b->a, a->b; u2: a->c
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a"), (2L, "2024-01-01 10:01:00", 1L, "b"),
      (3L, "2024-01-01 10:02:00", 1L, "a"), (4L, "2024-01-01 10:03:00", 1L, "b"),
      (5L, "2024-01-01 11:00:00", 2L, "a"), (6L, "2024-01-01 11:01:00", 2L, "c"))
    val df = rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"))
    val r = EventOps.conditionalEntropy(df).head()
    def s12(x: Double) = math.floor(x * 1e12 + 0.5).toLong
    def r6(l: Long) = math.floor(l / 1e12 * 1e6 + 0.5) / 1e6
    // H(next|cur): cells (a,b,2) (b,a,1) (a,c,1), nf a=3 b=1, N=4
    val hc = s12(-(2.0 / 4) * math.log(2.0 / 3)) +
      s12(-(1.0 / 4) * math.log(1.0)) + s12(-(1.0 / 4) * math.log(1.0 / 3))
    // H(next): nt b=2 a=1 c=1
    val hn = s12(-(2.0 / 4) * math.log(2.0 / 4)) +
      s12(-(1.0 / 4) * math.log(1.0 / 4)) * 2
    assert(r.getAs[Long]("n_transitions") == 4 &&
      r.getAs[Long]("n_from_types") == 2, r.toString)
    assert(r.getAs[Double]("h_next") == r6(hn) &&
      r.getAs[Double]("h_next_given_cur") == r6(hc), r.toString)
    assert(r.getAs[Double]("info_gain") ==
      math.floor((hn - hc) / 1e12 * 1e6 + 0.5) / 1e6, r.toString)
    // single-type chain: both entropies exactly 0
    val mono = Seq((1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:01:00", 1L, "a"))
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"))
    val rm = EventOps.conditionalEntropy(mono).head()
    assert(rm.getAs[Double]("h_next") == 0.0 &&
      rm.getAs[Double]("info_gain") == 0.0, rm.toString)
  }

  test("TextAnalysis.piiAudit: typed detectors and Luhn on hand text") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "mail bob@x.io ip 10.0.0.1 bad 1.2.3.256 ph 0123456789"),
      ("s1", "card 4111111111111111 long 12345678901234567 fake 4111111111111112"),
      ("s2", "nothing a@b a@b@c.com 1.2.3 here")).toDF("source", "text")
    val got = TextAnalysis.piiAudit(docs, "text", "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // s1 doc1: 1 email, 1 ipv4 (256 rejects), 1 phone; doc2: 2 card
    // candidates, 1 Luhn-valid (4111...1111), 17-digit run ignored
    assert(got("s1") == ((2L, 1L, 1L, 1L, 2L, 1L, 2L)), got.toString)
    // s2: a@b domain too short, a@b@c.com two @s, 1.2.3 only 3 parts
    assert(got("s2") == ((1L, 0L, 0L, 0L, 0L, 0L, 0L)), got.toString)
  }

  test("QualityChecks.cramerVonMises: full separation T = 0.375 by hand") {
    import spark.implicits._
    val r = QualityChecks.cramerVonMises(
      Seq(1.0, 2.0).toDF("v"), Seq(3.0, 4.0).toDF("v"), "v").head()
    // grid terms t*(cumA*n - cumB*m)^2 = 4+16+4+0 -> 24/(2*2*16)
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2 &&
      r.getAs[Long]("n_values") == 4, r.toString)
    assert(r.getAs[Double]("cvm_t") == 0.375, r.toString)
    // identical samples: every gap 0
    val ri = QualityChecks.cramerVonMises(
      Seq(1.0, 2.0).toDF("v"), Seq(1.0, 2.0).toDF("v"), "v").head()
    assert(ri.getAs[Double]("cvm_t") == 0.0, ri.toString)
  }

  test("QualityChecks.brunnerMunzel: symmetric tails p=0.5 w=0 df=1") {
    import spark.implicits._
    // A = {1,4}, B = {2,3}: equal rank means -> w = 0; S1=2, S2=0 -> df=1
    val r = QualityChecks.brunnerMunzel(
      Seq(1.0, 4.0).toDF("v"), Seq(2.0, 3.0).toDF("v"), "v").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("p_hat") == 0.5 && r.getAs[Double]("w_stat") == 0.0 &&
      r.getAs[Double]("df") == 1.0, r.toString)
    // B stochastically above A: p_hat = 1, variance degenerate -> NULL w
    val rs = QualityChecks.brunnerMunzel(
      Seq(1.0, 2.0).toDF("v"), Seq(5.0, 6.0).toDF("v"), "v").head()
    assert(rs.getAs[Double]("p_hat") == 1.0 &&
      rs.isNullAt(rs.fieldIndex("w_stat")), rs.toString)
  }

  test("QualityChecks.ansariBradley: textbook no-tie z = -sqrt(3); midrank ties") {
    import spark.implicits._
    // A = {1,4} (the tails), B = {2,3}: scores 1,2,2,1 -> AB = 2,
    // mean = 3, var = 1/3 -> z = -1.732051
    val a = Seq(1.0, 4.0).toDF("v")
    val b = Seq(2.0, 3.0).toDF("v")
    val r = QualityChecks.ansariBradley(a, b, "v").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("ab_stat") == 2.0 && r.getAs[Double]("ab_mean") == 3.0,
      r.toString)
    assert(r.getAs[Double]("z") == -1.732051, r.toString)
    // tie at 2: midrank 2.5 scores 2.5 -> AB(A={1,2}) = 1 + 2.5 = 3.5
    val rt = QualityChecks.ansariBradley(
      Seq(1.0, 2.0).toDF("v"), Seq(2.0, 3.0).toDF("v"), "v").head()
    assert(rt.getAs[Double]("ab_stat") == 3.5, rt.toString)
  }

  test("QualityChecks.ordinalAssociation: hand gamma/Somers/tau-c; string rejected") {
    import spark.implicits._
    // cells (1,1):1 (1,2):1 (2,1):1 (2,2):2 -> nc=2 nd=1; ties: both
    // margins {2,3} -> d = 10-4 = 6; domains 2x2 -> m=2
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (2L, 2L)).toDF("x", "y")
    val r = QualityChecks.ordinalAssociation(df, "x", "y").head()
    assert(r.getAs[Long]("concordant") == 2 && r.getAs[Long]("discordant") == 1)
    assert(r.getAs[Double]("gamma") == 0.333333, r.toString)
    assert(r.getAs[Double]("somers_d_yx") == 0.166667 &&
      r.getAs[Double]("somers_d_xy") == 0.166667, r.toString)
    assert(r.getAs[Double]("tau_c") == 0.16, r.toString) // 2*2*1/(25*1)
    // the kendallTau ordering guard carries over
    val bad = Seq(("1", 1L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      QualityChecks.ordinalAssociation(bad, "x", "y")
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }

  test("QualityChecks.dagostinoK2: skewed hand sample; degenerate NULLs") {
    import spark.implicits._
    // [1..8, 20]: the 1990 transformations replayed by hand (pinned
    // IEEE order) give z1 = 2.80228, z2 = 2.53722, K2 = 14.2903
    val df = (1 to 8).map(_.toDouble).toSeq :+ 20.0
    val r = QualityChecks.dagostinoK2(
      df.map(("g", _)).toDF("g", "v"), "g", "v").head()
    assert(r.getAs[Long]("n") == 9, r.toString)
    assert(r.getAs[Double]("z_skew") == 2.80228, r.toString)
    assert(r.getAs[Double]("z_kurt") == 2.53722, r.toString)
    assert(r.getAs[Double]("k2_stat") == 14.2903, r.toString)
    // n = 8 below the validity floor -> NULLs; constant group -> NULLs
    val rs = QualityChecks.dagostinoK2(
      (1 to 8).map(i => ("s", i.toDouble)).toDF("g", "v"), "g", "v").head()
    assert(rs.isNullAt(rs.fieldIndex("z_skew")), rs.toString)
    val rc = QualityChecks.dagostinoK2(
      (1 to 12).map(_ => ("c", 5.0)).toDF("g", "v"), "g", "v").head()
    assert(rc.isNullAt(rc.fieldIndex("k2_stat")), rc.toString)
  }

  test("QualityChecks.andersonDarling: full separation 19/11 by hand; identical 0") {
    import spark.implicits._
    // A={1,2} B={3,4}: per-value inner terms 1/3, 9/11, 9/11, 1/3 ->
    // sum 76/33, A2 = 3/4 * 76/33 = 19/11 = 1.727273
    val r = QualityChecks.andersonDarling(
      Seq(1.0, 2.0).toDF("v"), Seq(3.0, 4.0).toDF("v"), "v").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2 &&
      r.getAs[Long]("n_values") == 4, r.toString)
    assert(r.getAs[Double]("ad_stat") == 1.727273, r.toString)
    // identical samples: every midrank gap 0
    val ri = QualityChecks.andersonDarling(
      Seq(1.0, 2.0).toDF("v"), Seq(1.0, 2.0).toDF("v"), "v").head()
    assert(ri.getAs[Double]("ad_stat") == 0.0, ri.toString)
  }

  test("EventOps.pacf: hand [1,2,3,2,1] hourly series via Durbin-Levinson") {
    import spark.implicits._
    // counts [1,2,3,2,1]: r = [4/70, -47/70, -8/70] rounded 1e-6 ->
    // pacf_1 = 0.057143, pacf_2 = -0.676905, pacf_3 = -0.020864
    val rows = Seq.tabulate(5)(identity).flatMap { b =>
      val cnt = Seq(1, 2, 3, 2, 1)(b)
      (0 until cnt).map(i => (f"2024-01-01 $b%02d:0$i:00", "a", 1.0))
    }
    val ev = rows.toDF("ts_s", "event_type", "value")
      .select(sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("event_type"), sf.col("value"))
    val r = EventOps.pacf(ev).head()
    assert(r.getAs[Long]("n_bins") == 5, r.toString)
    assert(r.getAs[Double]("pacf_1") == 0.057143, r.toString)
    assert(r.getAs[Double]("pacf_2") == -0.676905, r.toString)
    assert(r.getAs[Double]("pacf_3") == -0.020864, r.toString)
  }

  test("QualityChecks.icc: two-group hand case 53/56; k0 = 3") {
    import spark.implicits._
    // a: [1,2,3], b: [7,8,9] -> SSB = 54, SSW = 4, MSB = 54, MSW = 1,
    // k0 = 3 -> ICC = 53/56 = 0.946429
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 7.0), ("b", 8.0), ("b", 9.0)).toDF("g", "v")
    val r = QualityChecks.icc(df, "g", "v").head()
    assert(r.getAs[Long]("n_groups") == 2 && r.getAs[Long]("n") == 6)
    assert(r.getAs[Double]("k0") == 3.0 &&
      r.getAs[Double]("ms_between") == 54.0 &&
      r.getAs[Double]("ms_within") == 1.0, r.toString)
    assert(r.getAs[Double]("icc1") == 0.946429, r.toString)
    // one group: degenerate -> NULLs
    val r1 = QualityChecks.icc(df.filter(sf.col("g") === "a"), "g", "v").head()
    assert(r1.isNullAt(r1.fieldIndex("icc1")), r1.toString)
  }

  test("QualityChecks.linsCcc: identity 1; unit shift 4/7 with r = 1") {
    import spark.implicits._
    val id = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "y")
    val r = QualityChecks.linsCcc(id, "x", "y").head()
    assert(r.getAs[Double]("ccc") == 1.0 && r.getAs[Double]("pearson_r") == 1.0 &&
      r.getAs[Double]("bias_factor") == 1.0, r.toString)
    // y = x + 1: perfect correlation, pure location bias -> ccc = 4/7
    val sh = Seq((1.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val rs = QualityChecks.linsCcc(sh, "x", "y").head()
    assert(rs.getAs[Double]("pearson_r") == 1.0 &&
      rs.getAs[Double]("ccc") == 0.571429 &&
      rs.getAs[Double]("bias_factor") == 0.571429, rs.toString)
  }

  test("QualityChecks.weightedKappa: hand 10/26; perfect 1; string rejected") {
    import spark.implicits._
    // cells (0,0) (1,1) (2,2) (0,2): obs penalty 4, expected 26 ->
    // kappa_w = 1 - 4*4/26 = 10/26
    val df = Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 2L)).toDF("a", "b")
    val r = QualityChecks.weightedKappa(df, "a", "b").head()
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("obs_penalty") == 4)
    assert(r.getAs[Double]("kappa_w") == 0.384615, r.toString)
    val rp = QualityChecks.weightedKappa(
      Seq((0L, 0L), (2L, 2L)).toDF("a", "b"), "a", "b").head()
    assert(rp.getAs[Double]("kappa_w") == 1.0, rp.toString)
    val e = intercept[IllegalArgumentException] {
      QualityChecks.weightedKappa(Seq(("x", 1L)).toDF("a", "b"), "a", "b")
    }
    assert(e.getMessage.contains("integer-coded"), e.getMessage)
  }

  test("QualityChecks.cochranArmitage: perfect trend z = 8/sqrt(5); string rejected") {
    import spark.implicits._
    // rates 0.1 / 0.5 / 0.9 across scores 0,1,2: T = 8, Var = 5
    val rows = Seq((0L, 1), (1L, 5), (2L, 9)).flatMap { case (s, a) =>
      Seq.fill(a)((s, true)) ++ Seq.fill(10 - a)((s, false))
    }
    val r = QualityChecks.cochranArmitage(rows.toDF("s", "y"), "s", "y").head()
    assert(r.getAs[Long]("n") == 30 && r.getAs[Long]("n_groups") == 3)
    assert(r.getAs[Double]("rate_overall") == 0.5 &&
      r.getAs[Double]("z_trend") == 3.577709, r.toString)
    // all-success labels: degenerate -> NULL
    val rd = QualityChecks.cochranArmitage(
      Seq((0L, true), (1L, true)).toDF("s", "y"), "s", "y").head()
    assert(rd.isNullAt(rd.fieldIndex("z_trend")), rd.toString)
    val e = intercept[IllegalArgumentException] {
      QualityChecks.cochranArmitage(Seq(("a", true)).toDF("s", "y"), "s", "y")
    }
    assert(e.getMessage.contains("INTEGER codes"), e.getMessage)
    // fractional scores rejected too: the long cast would floor-truncate
    // (0.25-spaced buckets all collapse to 0) and corrupt the trend
    val ef = intercept[IllegalArgumentException] {
      QualityChecks.cochranArmitage(
        Seq((0.25, true), (0.5, false)).toDF("s", "y"), "s", "y")
    }
    assert(ef.getMessage.contains("INTEGER codes"), ef.getMessage)
  }

  test("QualityChecks.poissonRateTest: hand conditional z = sqrt(3); ratio 4") {
    import spark.implicits._
    // arm A: 4 errors in 10 events; arm B: 2 in 20 -> p = 1/3,
    // z = 2/sqrt(4/3) = 1.732051
    val df = (Seq.fill(4)((true, true)) ++ Seq.fill(6)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(18)((false, false)))
      .toDF("arm", "err")
    val r = QualityChecks.poissonRateTest(df, sf.col("arm"), sf.col("err")).head()
    assert(r.getAs[Long]("t_a") == 10 && r.getAs[Long]("t_b") == 20)
    assert(r.getAs[Double]("rate_a") == 0.4 && r.getAs[Double]("rate_b") == 0.1)
    assert(r.getAs[Double]("rate_ratio") == 4.0 &&
      r.getAs[Double]("z_stat") == 1.732051, r.toString)
  }

  test("QualityChecks.quadeTest: hand range-weighted F = 9; perfect agreement NULL") {
    import spark.implicits._
    // block A (range 2) outweighs block B (range 0.5): S4 by hand ->
    // A = 2.5, B = 2.25, F = 9 with df (1, 1)
    val df = Seq(("A", "t1", 1.0), ("A", "t2", 3.0),
      ("B", "t1", 2.0), ("B", "t2", 2.5)).toDF("b", "tr", "v")
    val r = QualityChecks.quadeTest(df, "b", "tr", "v").head()
    assert(r.getAs[Long]("n_blocks") == 2 && r.getAs[Long]("k") == 2)
    assert(r.getAs[Double]("f_quade") == 9.0, r.toString)
    assert(r.getAs[Long]("df1") == 1 && r.getAs[Long]("df2") == 1, r.toString)
    // equal ranges + identical orderings: A = B -> NULL (F infinite)
    val rp = QualityChecks.quadeTest(
      Seq(("A", "t1", 1.0), ("A", "t2", 3.0),
        ("B", "t1", 2.0), ("B", "t2", 4.0)).toDF("b", "tr", "v"),
      "b", "tr", "v").head()
    assert(rp.isNullAt(rp.fieldIndex("f_quade")), rp.toString)
  }

  test("QualityChecks.plattScaling: 4 hand-replayed Newton steps; degenerate NULL") {
    import spark.implicits._
    // symmetric separable core + mixed midpoint: the pinned trajectory
    // lands at a = 5.504127, b = 0 exactly; NLL 0.43989 -> 0.233757
    val df = (Seq.fill(2)((-1.0, 0)) ++ Seq.fill(2)((1.0, 1)) ++
      Seq((0.0, 0), (0.0, 1))).toDF("s", "y")
    val r = QualityChecks.plattScaling(df, "s", "y", iters = 4).head()
    assert(r.getAs[Long]("n") == 6, r.toString)
    assert(r.getAs[Double]("a") == 5.504127 && r.getAs[Double]("b") == 0.0,
      r.toString)
    assert(r.getAs[Double]("nll_before") == 0.43989 &&
      r.getAs[Double]("nll_after") == 0.233757, r.toString)
    // calibration must not hurt on its own training data
    assert(r.getAs[Double]("nll_after") < r.getAs[Double]("nll_before"))
    // one-class labels: no fit
    val r1 = QualityChecks.plattScaling(
      Seq((1.0, 1), (2.0, 1)).toDF("s", "y"), "s", "y").head()
    assert(r1.isNullAt(r1.fieldIndex("a")), r1.toString)
  }

  test("EventOps.qiniDeciles: 10 one-user deciles replay the contract formulas") {
    import spark.implicits._
    // user u gets u views; even users purchase once. Ranks by view
    // count desc -> user 11-u sits alone in decile u.
    val rows = (1 to 10).flatMap { u =>
      (1 to u).map(i => (u * 100L + i, "view", u.toLong)) ++
        (if (u % 2 == 0) Seq((u * 100L + 99, "purchase", u.toLong)) else Nil)
    }
    val ev = rows.toDF("event_id", "event_type", "user_id")
      .select(sf.col("event_id"),
        sf.lit("2024-01-01 00:00:00").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"), sf.lit(1.0).as("value"))
    val out = EventOps.qiniDeciles(ev).collect()
    assert(out.map(_.getAs[Int]("decile")).toSeq == (1 to 10), out.mkString(";"))
    // derive each user's arm with the same portable hash, then replay
    // the decile/uplift/qini contract in plain Scala
    val treated = ev.select(sf.col("user_id"),
        (Sampling.hashBucket(sf.col("user_id")) < 5000).as("t"))
      .distinct().collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val byDecile = (1 to 10).map { d => val u = 11L - d; (treated(u), u % 2 == 0L) }
    var (cnt, cct, cnc, ccc) = (0L, 0L, 0L, 0L)
    out.zip(byDecile).foreach { case (r, (t, conv)) =>
      if (t) { cnt += 1; if (conv) cct += 1 } else { cnc += 1; if (conv) ccc += 1 }
      assert(r.getAs[Long]("n_treated") == (if (t) 1L else 0L), r.toString)
      if (cnc > 0) {
        val qini = cct.toDouble - ccc.toDouble * cnt.toDouble / cnc.toDouble
        assert(r.getAs[Double]("qini") ==
          math.floor(qini * 1e4 + 0.5) / 1e4, s"$r vs $qini")
      } else assert(r.isNullAt(r.fieldIndex("qini")), r.toString)
    }
  }

  test("QualityChecks.energyDistance: hand all-pairs 3.0; identical 0") {
    import spark.implicits._
    // A={1,2} B={3,4}: sum|x-y| = 8 -> e_xy = 2; within sums 1 each ->
    // e_xx = e_yy = 0.5; D^2 = 4 - 1 = 3
    val r = QualityChecks.energyDistance(
      Seq(1.0, 2.0).toDF("v"), Seq(3.0, 4.0).toDF("v"), "v").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("e_xy") == 2.0 && r.getAs[Double]("e_xx") == 0.5 &&
      r.getAs[Double]("e_yy") == 0.5, r.toString)
    assert(r.getAs[Double]("energy_dist") == 3.0, r.toString)
    val ri = QualityChecks.energyDistance(
      Seq(1.0, 2.0).toDF("v"), Seq(1.0, 2.0).toDF("v"), "v").head()
    assert(ri.getAs[Double]("energy_dist") == 0.0, ri.toString)
  }

  test("QualityChecks.gpdTail: hand PWM fit over 1..20 at q90; constant NULLs") {
    import spark.implicits._
    // u = 18 (exact type-1 p90), exceedances y = {1, 2}: b0 = 1.5,
    // b1 = 1 -> xi = 2 - 1.5/(-0.5) = 5, sigma = -6 (exact pins)
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = QualityChecks.gpdTail(df, "g", "v", tailQ = 0.9).head()
    assert(r.getAs[Long]("n") == 20 && r.getAs[Double]("threshold") == 18.0)
    assert(r.getAs[Long]("n_exceed") == 2 &&
      r.getAs[Double]("mean_excess") == 1.5, r.toString)
    assert(r.getAs[Double]("xi") == 5.0 && r.getAs[Double]("sigma") == -6.0,
      r.toString)
    // constant group: threshold = the single value, no exceedances
    val rc = QualityChecks.gpdTail(
      Seq.fill(10)(("c", 7.0)).toDF("g", "v"), "g", "v", tailQ = 0.9).head()
    assert(rc.getAs[Long]("n_exceed") == 0 &&
      rc.isNullAt(rc.fieldIndex("xi")), rc.toString)
  }

  test("QualityChecks.yuenTTest: outlier-contaminated hand case t = -5.940885") {
    import spark.implicits._
    // 20% trim discards the planted 0/100 and 30 outliers entirely:
    // trimmed means 5.5 vs 15.5, Winsorized d's equal, df = 10
    val a = Seq(0.0, 2, 3, 4, 5, 6, 7, 8, 9, 100).toDF("v")
    val b = Seq(10.0, 12, 13, 14, 15, 16, 17, 18, 19, 30).toDF("v")
    val r = QualityChecks.yuenTTest(a, b, "v", trim = 0.2).head()
    assert(r.getAs[Long]("n_a") == 10 && r.getAs[Long]("h_a") == 6)
    assert(r.getAs[Double]("tmean_a") == 5.5 &&
      r.getAs[Double]("tmean_b") == 15.5, r.toString)
    assert(r.getAs[Double]("t_yuen") == -5.940885, r.toString)
    assert(r.getAs[Double]("df") == 10.0, r.toString)
  }

  test("QualityChecks.breslowDay: heterogeneous strata 2.7747; homogeneous ~0") {
    import spark.implicits._
    // stratum s1 OR=1, s2 OR=4 -> pooled psi = 2.2, BD = 2.7747 (hand
    // replay of the quadratic + harmonic variance)
    def stratum(k: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((k, true, true)) ++ Seq.fill(b)((k, true, false)) ++
        Seq.fill(c)((k, false, true)) ++ Seq.fill(d)((k, false, false))
    val df = (stratum("s1", 10, 10, 10, 10) ++ stratum("s2", 20, 10, 10, 20))
      .toDF("k", "ga", "sc")
    val r = QualityChecks.breslowDay(df, "k", sf.col("ga"), sf.col("sc")).head()
    assert(r.getAs[Long]("n_strata") == 2 && r.getAs[Long]("dof") == 1)
    assert(r.getAs[Double]("mh_odds_ratio") == 2.2, r.toString)
    assert(r.getAs[Double]("bd_stat") == 2.7747, r.toString)
    // identical strata: psi matches every stratum -> BD = 0
    val rh = QualityChecks.breslowDay(
      (stratum("s1", 20, 10, 10, 20) ++ stratum("s2", 20, 10, 10, 20))
        .toDF("k", "ga", "sc"), "k", sf.col("ga"), sf.col("sc")).head()
    assert(rh.getAs[Double]("bd_stat") == 0.0, rh.toString)
  }

  test("QualityChecks.welchAnova: hand two-group F* and df2") {
    import spark.implicits._
    // a: [1,2,3] (w=3), b: [10,12,14,16] (w=0.6): F* = 60.5, df2 = 4.0755
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(10.0, 12.0, 14.0, 16.0).map(("b", _))).toDF("g", "v")
    val r = QualityChecks.welchAnova(df, "g", "v").head()
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 7)
    assert(r.getAs[Double]("f_welch") == 60.5, r.toString)
    assert(r.getAs[Double]("df2") == 4.0755, r.toString)
    // a constant group is excluded (zero variance) -> k drops to 2
    val dfc = df.union(Seq(("c", 5.0), ("c", 5.0)).toDF("g", "v"))
    val rc = QualityChecks.welchAnova(dfc, "g", "v").head()
    assert(rc.getAs[Long]("k") == 2, rc.toString)
  }

  test("QualityChecks.cronbachAlpha: perfectly correlated 1; independent 0") {
    import spark.implicits._
    val perfect = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("i1", "i2")
    val r = QualityChecks.cronbachAlpha(perfect, Seq("i1", "i2")).head()
    assert(r.getAs[Double]("alpha") == 1.0, r.toString)
    // var sums: items 1/3 each, total 2/3 -> alpha = 2(1 - 1) = 0
    val indep = Seq((1.0, 1.0), (2.0, 1.0), (1.0, 2.0), (2.0, 2.0)).toDF("i1", "i2")
    val ri = QualityChecks.cronbachAlpha(indep, Seq("i1", "i2")).head()
    assert(ri.getAs[Double]("alpha") == 0.0, ri.toString)
    // fewer than 2 items rejected
    val e = intercept[IllegalArgumentException] {
      QualityChecks.cronbachAlpha(perfect, Seq("i1"))
    }
    assert(e.getMessage.contains(">= 2"), e.getMessage)
  }

  test("QualityChecks.blandAltman: hand limits; single outlier share 1/21") {
    import spark.implicits._
    // diffs 0 x20 and 100: mean 4.7619, sd 21.8218, limits by hand;
    // the 100 sits outside -> share 1/21
    val df = (Seq.fill(20)((1.0, 1.0)) :+ (101.0, 1.0)).toDF("x", "y")
    val r = QualityChecks.blandAltman(df, "x", "y").head()
    assert(r.getAs[Long]("n") == 21, r.toString)
    assert(r.getAs[Double]("mean_diff") == 4.7619 &&
      r.getAs[Double]("sd_diff") == 21.8218, r.toString)
    assert(r.getAs[Double]("loa_lo") == -38.008 &&
      r.getAs[Double]("loa_hi") == 47.5318, r.toString)
    assert(r.getAs[Double]("share_outside") == 0.047619, r.toString)
    // identical columns: zero variance -> NULL limits, share 0
    val rz = QualityChecks.blandAltman(
      Seq((1.0, 1.0), (2.0, 2.0)).toDF("x", "y"), "x", "y").head()
    assert(rz.getAs[Double]("mean_diff") == 0.0 &&
      rz.isNullAt(rz.fieldIndex("loa_lo")) &&
      rz.getAs[Double]("share_outside") == 0.0, rz.toString)
  }

  test("QualityChecks.gwetAC1: skewed-prevalence hand case beats kappa") {
    import spark.implicits._
    // cells (a,a) x8, (b,b) x1, (a,b) x1: p_o = 0.9, pi = (0.85, 0.15),
    // p_e = 0.255 -> AC1 = 0.645/0.745 = 0.8658 (kappa here is 0.6154)
    val df = (Seq.fill(8)(("a", "a")) :+ ("b", "b") :+ ("a", "b"))
      .toDF("r1", "r2")
    val r = QualityChecks.gwetAC1(df, "r1", "r2").head()
    assert(r.getAs[Long]("n") == 10 && r.getAs[Long]("n_categories") == 2)
    assert(r.getAs[Double]("p_observed") == 0.9 &&
      r.getAs[Double]("p_chance") == 0.255, r.toString)
    assert(r.getAs[Double]("ac1") == 0.8658, r.toString)
    // one category only: C < 2 -> NULL
    val r1c = QualityChecks.gwetAC1(
      Seq(("a", "a"), ("a", "a")).toDF("r1", "r2"), "r1", "r2").head()
    assert(r1c.isNullAt(r1c.fieldIndex("ac1")), r1c.toString)
  }

  test("QualityChecks.twoProportionEffects: hand z/RR/OR CIs; 3-arm NULLs") {
    import spark.implicits._
    // a: 4/10, b: 2/10 -> z = 0.9759, RR = 2 [0.467479, 8.556536],
    // OR = 32/12 [0.360757, 19.711636] (hand Katz/Woolf replays)
    val df = (Seq.fill(4)(("a", true)) ++ Seq.fill(6)(("a", false)) ++
      Seq.fill(2)(("b", true)) ++ Seq.fill(8)(("b", false))).toDF("g", "s")
    val r = QualityChecks.twoProportionEffects(df, "g", "s").head()
    assert(r.getAs[String]("group_a") == "a" && r.getAs[Long]("k_a") == 4)
    assert(r.getAs[Double]("risk_diff") == 0.2 &&
      r.getAs[Double]("z_pooled") == 0.9759, r.toString)
    assert(r.getAs[Double]("risk_ratio") == 2.0 &&
      r.getAs[Double]("rr_lo") == 0.467479 &&
      r.getAs[Double]("rr_hi") == 8.556536, r.toString)
    assert(r.getAs[Double]("odds_ratio") == 2.666667 &&
      r.getAs[Double]("or_lo") == 0.360757 &&
      r.getAs[Double]("or_hi") == 19.711636, r.toString)
    // three arms: counts still print, every effect NULL
    val r3 = QualityChecks.twoProportionEffects(
      Seq(("a", true), ("b", false), ("c", true)).toDF("g", "s"), "g", "s").head()
    assert(r3.isNullAt(r3.fieldIndex("z_pooled")) &&
      r3.isNullAt(r3.fieldIndex("risk_ratio")), r3.toString)
  }

  test("EventOps.interEventBurstiness: hand gaps 1..4s -> B and perfect memory") {
    import spark.implicits._
    // gaps 1,2,3,4 s: mu = 2.5, sigma = sqrt(1.25) -> B = -0.381966;
    // consecutive pairs strictly increasing -> M = 1
    val ev = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:00:01"),
      (3L, "2024-01-01 00:00:03"), (4L, "2024-01-01 00:00:06"),
      (5L, "2024-01-01 00:00:10"))
      .toDF("event_id", "ts_s")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1L).as("user_id"), sf.lit("a").as("event_type"))
    val r = EventOps.interEventBurstiness(ev).head()
    assert(r.getAs[Long]("n_gaps") == 4 && r.getAs[Long]("n_pairs") == 3)
    assert(r.getAs[Double]("mean_gap_s") == 2.5, r.toString)
    assert(r.getAs[Double]("b_coef") == -0.381966, r.toString)
    assert(r.getAs[Double]("memory_coef") == 1.0, r.toString)
    // single gap: B needs >= 2 gaps -> NULL
    val r1 = EventOps.interEventBurstiness(ev.limit(2)).head()
    assert(r1.getAs[Long]("n_gaps") == 1 &&
      r1.isNullAt(r1.fieldIndex("b_coef")), r1.toString)
  }

  test("QualityChecks.krippendorffAlpha: hand alpha 0.5333; single-rating item excluded") {
    import spark.implicits._
    // items (a,a) (a,b) (b,b) (b,b): D_o = 2/8; margins a=3 b=5 ->
    // D_e = (64-34)/56; alpha = 1 - 0.466667 = 0.5333. Item 5 has one
    // rating -> not pairable, must change nothing.
    val df = Seq(
      (1L, "a", "a"), (2L, "a", "b"), (3L, "b", "b"), (4L, "b", "b"),
      (5L, "a", null)).toDF("id", "r1", "r2")
    val r = QualityChecks.krippendorffAlpha(df, "id", Seq("r1", "r2")).head()
    assert(r.getAs[Long]("n_items") == 4 && r.getAs[Long]("n_pairable") == 8,
      r.toString)
    assert(r.getAs[Double]("d_observed") == 0.25 &&
      r.getAs[Double]("d_expected") == 0.535714, r.toString)
    assert(r.getAs[Double]("alpha") == 0.5333, r.toString)
    // all one category: D_e = 0 -> NULL alpha
    val ru = QualityChecks.krippendorffAlpha(
      Seq((1L, "a", "a"), (2L, "a", "a")).toDF("id", "r1", "r2"),
      "id", Seq("r1", "r2")).head()
    assert(ru.isNullAt(ru.fieldIndex("alpha")), ru.toString)
  }

  test("QualityChecks.hosmerLemeshow: hand two-bin HL = 1.0, degenerate bin 0") {
    import spark.implicits._
    // bin2: n=2 e=0.5 o=1 -> .25/.375 = 2/3; bin7: n=1 e=.75 o=1 -> 1/3
    val df = Seq((0.25, 0), (0.25, 1), (0.75, 1)).toDF("conf", "y")
    val r = QualityChecks.hosmerLemeshow(df, "conf", "y").head()
    assert(r.getAs[Long]("n_bins") == 2 && r.getAs[Long]("n") == 3 &&
      r.getAs[Long]("dof") == 0, r.toString)
    assert(r.getAs[Double]("hl_chi2") == 1.0, r.toString)
    // an all-zero-confidence bin has E = 0 and contributes 0
    val z = Seq((0.0, 0), (0.25, 1)).toDF("conf", "y")
    val rz = QualityChecks.hosmerLemeshow(z, "conf", "y").head()
    assert(rz.getAs[Long]("n_bins") == 2, rz.toString)
  }

  test("TextAnalysis.langIdConfusion: cells, shares, global accuracy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the of and to", "en"), (2L, "der die und ist", "de"),
      (3L, "the the the of", "de")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langIdConfusion(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(("en", "en")) == ((1L, 1.0, 0.666667)), got.toString)
    assert(got(("de", "de")) == ((1L, 0.5, 0.666667)), got.toString)
    assert(got(("de", "en")) == ((1L, 0.5, 0.666667)), got.toString)
    assert(got.size == 3, got.toString)
  }

  test("QualityChecks.moodsMedian: perfect separation chi2 = 6, exact pooled median") {
    import spark.implicits._
    // pooled {1..6}: lower median 3; A all <=, B all > -> chi2 = 6
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 4L), ("B", 5L), ("B", 6L))
      .toDF("g", "v")
    val r = QualityChecks.moodsMedian(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("n_groups") == 2 &&
      r.getAs[Long]("pooled_median") == 3 && r.getAs[Double]("chi2") == 6.0 &&
      r.getAs[Long]("dof") == 1, r.toString)
    // identical groups: every term 0
    val same = Seq(("A", 1L), ("A", 9L), ("B", 1L), ("B", 9L)).toDF("g", "v")
    val rs = QualityChecks.moodsMedian(same, "g", "v").head()
    assert(rs.getAs[Double]("chi2") == 0.0 &&
      rs.getAs[Long]("pooled_median") == 1, rs.toString)
  }

  test("EventOps.turningPoints: strict extrema only, ties break the pattern") {
    import spark.implicits._
    // one type, counts [1,3,2,2,4]: only bin 1 (1<3>2) turns; the
    // plateau (2,2) and its edges are tie-broken
    val rows = Seq(1, 3, 2, 2, 4).zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map(i => (s"e${h}_$i", f"2024-01-01 0$h%d:15:00")) }
    val df = rows.toDF("eid", "ts_s")
      .select(sf.hash(sf.col("eid")).cast("long").as("event_id"),
        sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1L).as("user_id"), sf.lit("error").as("event_type"),
        sf.lit(1.0).as("value"))
    val r = EventOps.turningPoints(df).head()
    assert(r.getAs[Long]("n_bins") == 5 && r.getAs[Long]("n_turning") == 1,
      r.toString)
    val mean = (5.0 - 2) * 2 / 3
    val z = math.floor((1.0 - mean) / math.sqrt((5.0 * 16 - 29) / 90) * 1e6
      + 0.5) / 1e6
    assert(r.getAs[Double]("expected") == 2.0 && r.getAs[Double]("z") == z,
      r.toString)
  }

  test("QualityChecks.jonckheereTerpstra: hand J=11, tie-corrected z; type guard") {
    import spark.implicits._
    // groups 1:{1,2} 2:{2,3} 3:{3,4}: U_12=3.5, U_13=4, U_23=3.5 -> J=11
    // mean=(36-12)/4=6; A=510-54-36=420, B=0, C=6*4=24
    val df = Seq((1, 1L), (1, 2L), (2, 2L), (2, 3L), (3, 3L), (3, 4L))
      .toDF("g", "v")
    val r = QualityChecks.jonckheereTerpstra(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("n_groups") == 3)
    assert(r.getAs[Double]("j_stat") == 11.0 && r.getAs[Double]("j_mean") == 6.0,
      r.toString)
    val nD = 6.0
    val variance = 420.0 / 72 + 0.0 / (nD * 36 * 5 * 4) + 24.0 / (nD * 8 * 5)
    val zExp = math.floor((11.0 - 6.0) / math.sqrt(variance) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("z") == zExp, s"want $zExp: $r")
    // one group -> NULL z
    val one = Seq((1, 1L), (1, 2L)).toDF("g", "v")
    val ro = QualityChecks.jonckheereTerpstra(one, "g", "v").head()
    assert(ro.isNullAt(ro.fieldIndex("z")), ro.toString)
    // string group labels rejected (lexicographic order trap)
    val e = intercept[IllegalArgumentException] {
      QualityChecks.jonckheereTerpstra(
        Seq(("10", 1L), ("2", 2L)).toDF("g", "v"), "g", "v")
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }

  test("EventOps.grangerLag1: hand moments/F on a 5-bin series; constant-lag NULL") {
    import spark.implicits._
    // hourly counts x=[2,1,3,1,2], y=[1,3,2,5,4] -> 4 usable bins
    def rows(t: String, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, h) => (1 to c).map(i =>
        (t + h + "_" + i, f"2024-01-01 0$h%d:30:00", t))
    }
    val df = (rows("error", Seq(2, 1, 3, 1, 2)) ++
        rows("purchase", Seq(1, 3, 2, 5, 4)))
      .toDF("eid", "ts_s", "event_type")
      .select(sf.hash(sf.col("eid")).cast("long").as("event_id"),
        sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1L).as("user_id"), sf.col("event_type"),
        sf.lit(1.0).as("value"))
    val r = EventOps.grangerLag1(df, "error", "purchase").head()
    assert(r.getAs[Long]("n_bins") == 4, r.toString)
    // replay the moment algebra: M's from exact sums
    val (mpp, mqq, mpq, mpy, mqy, myy) = (35.0, 11.0, -13.0, 2.0, 10.0, 20.0)
    val d = mpp * mqq - mpq * mpq
    val bp = (mpy * mqq - mqy * mpq) / d
    val bq = (mqy * mpp - mpy * mpq) / d
    val rssU = (myy - bp * mpy - bq * mqy) / 4.0
    val rssR = (myy - mpy * mpy / mpp) / 4.0
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(r.getAs[Double]("beta_ylag") == r6(bp) &&
      r.getAs[Double]("beta_xlag") == r6(bq), r.toString)
    assert(r.getAs[Double]("rss_u") == r4(rssU) &&
      r.getAs[Double]("rss_r") == r4(rssR), r.toString)
    assert(r.getAs[Double]("f_stat") == r4((rssR - rssU) / (rssU / 1.0)),
      r.toString)
    // constant effect series -> mpp = 0 -> NULL inference
    val const = (rows("error", Seq(2, 1, 3)) ++ rows("purchase", Seq(1, 1, 1)))
      .toDF("eid", "ts_s", "event_type")
      .select(sf.hash(sf.col("eid")).cast("long").as("event_id"),
        sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1L).as("user_id"), sf.col("event_type"),
        sf.lit(1.0).as("value"))
    val rc = EventOps.grangerLag1(const, "error", "purchase").head()
    assert(rc.isNullAt(rc.fieldIndex("f_stat")), rc.toString)
  }

  test("QualityChecks.tCloseness: skewed classes t=0.5, balanced class 0") {
    // global {a:2, b:2}; class 1 all-a, class 2 all-b -> TV = 0.5 each
    val skew = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")).toDF("q", "s")
    val r = QualityChecks.tCloseness(skew, Seq("q"), sf.col("s"), t = 0.4).head()
    assert(r.getAs[Long]("n_groups") == 2 && r.getAs[Long]("n_violating") == 2 &&
      r.getAs[Long]("rows_at_risk") == 4 && r.getAs[Double]("max_t") == 0.5,
      r.toString)
    // every class mirrors the global distribution -> t = 0 everywhere
    val bal = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")).toDF("q", "s")
    val rb = QualityChecks.tCloseness(bal, Seq("q"), sf.col("s"), t = 0.4).head()
    assert(rb.getAs[Long]("n_violating") == 0 && rb.getAs[Double]("max_t") == 0.0)
    // absent-value mass counts: class {a:1} vs global {a:1, b:3}
    // TV = max-style check: p_c = {a:1}, p_g = {a:.25, b:.75} -> 0.75
    val gap = Seq((1L, "a"), (2L, "b"), (2L, "b"), (2L, "b")).toDF("q", "s")
    val rg = QualityChecks.tCloseness(gap, Seq("q"), sf.col("s"), t = 0.9).head()
    assert(rg.getAs[Double]("max_t") == 0.75 && rg.getAs[Long]("n_violating") == 0,
      rg.toString)
    // COMPLETE-CASE semantics: NULL-sensitive rows leave classes AND
    // margins (class 3 is all-NULL and must vanish from n_groups; the
    // NULL row in class 1 must not count as "absent" mass)
    val withNull = Seq((1L, Some("a")), (1L, Some("a")), (1L, None),
      (2L, Some("b")), (2L, Some("b")), (3L, None)).toDF("q", "s")
    val rn = QualityChecks.tCloseness(withNull, Seq("q"), sf.col("s"), t = 0.4)
      .head()
    assert(rn.getAs[Long]("n_groups") == 2 && rn.getAs[Double]("max_t") == 0.5,
      rn.toString)
  }

  test("QualityChecks.wilcoxonSignedRank: hand midranks, zero drop, unpaired drop") {
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // per-subject diffs a-b: {+1, +2, +3, -1, 0}; subject 6 has no b side
    val df = Seq(
      (1L, "a", 2.0), (1L, "b", 1.0), (2L, "a", 4.0), (2L, "b", 2.0),
      (3L, "a", 6.0), (3L, "b", 3.0), (4L, "a", 1.0), (4L, "b", 2.0),
      (5L, "a", 7.0), (5L, "b", 7.0), (6L, "a", 9.0)).toDF("s", "c", "v")
    val r = QualityChecks.wilcoxonSignedRank(df, "s", "c", "v", "a", "b").head()
    // |d| = {1,1,2,3}: midranks 1.5,1.5,3,4; W+ = 1.5+3+4 = 8.5
    assert(r.getAs[Long]("n_pairs") == 4 && r.getAs[Long]("n_zero") == 1 &&
      r.getAs[Double]("w_plus") == 8.5, r.toString)
    val sigma = math.sqrt(4.0 * 5 * 9 / 24 - 6.0 / 48)
    assert(r.getAs[Double]("z") == r6((8.5 - 5.0) / sigma), r.toString)
    // all diffs zero -> no nonzero pairs, NULL z
    val zero = Seq((1L, "a", 3.0), (1L, "b", 3.0)).toDF("s", "c", "v")
    val rz = QualityChecks.wilcoxonSignedRank(zero, "s", "c", "v", "a", "b").head()
    assert(rz.getAs[Long]("n_pairs") == 0 && rz.getAs[Long]("n_zero") == 1 &&
      rz.isNullAt(rz.fieldIndex("z")), rz.toString)
  }

  test("QualityChecks.bartlettTest: hand two-group T, zero-variance NULL") {
    // a: {1,2,3} s2=1; b: {2,4,6} s2=4 -> sp2=2.5, C=1.25
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "v")
    val r = QualityChecks.bartlettTest(df, "g", "v").head()
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n_total") == 6 &&
      r.getAs[Long]("df") == 1, r.toString)
    // replicate the pinned chain: 1e-9-snapped per-group ln terms
    def ln9(s2: Double) = math.floor(math.log(s2) * 1e9 + 0.5) / 1e9
    val t0 = 4.0 * math.log(2.5) - (2.0 * ln9(1.0) + 2.0 * ln9(4.0))
    val c = 1.0 + (math.floor(1e9 / 2 + 0.5) * 2 / 1e9 - 1.0 / 4) / 3.0
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("chi2_bartlett") == r6(t0 / c), r.toString)
    // one constant group -> ln(0) undefined -> NULL statistic
    val const = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val rc = QualityChecks.bartlettTest(const, "g", "v").head()
    assert(rc.isNullAt(rc.fieldIndex("chi2_bartlett")), rc.toString)
    // n=1 groups drop entirely
    val tiny = Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 9.0)).toDF("g", "v")
    assert(QualityChecks.bartlettTest(tiny, "g", "v").head().getAs[Long]("k") == 1)
  }

  test("QualityChecks.kuiperTest: V adds both one-sided sups where KS reads one") {
    // A={1,4}, B={2,3}: F_A-F_B walks +.5 then -.5 -> D+=D-=.5, V=1
    val a = Seq(1.0, 4.0).toDF("v")
    val b = Seq(2.0, 3.0).toDF("v")
    val r = QualityChecks.kuiperTest(a, b, "v").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2 &&
      r.getAs[Double]("v_stat") == 1.0, r.toString)
    val ks = QualityChecks.ksTest(a, b, "v").head()
    assert(ks.getAs[Double]("ks_stat") == 0.5, ks.toString)
    // pure one-sided shift: V equals D
    val r2 = QualityChecks.kuiperTest(
      Seq(1.0, 2.0).toDF("v"), Seq(3.0, 4.0).toDF("v"), "v").head()
    assert(r2.getAs[Double]("v_stat") == 1.0, r2.toString)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val ne = 1.0 // 2*2/4
    assert(r.getAs[Double]("lambda_stat") ==
      r4((math.sqrt(ne) + 0.155 + 0.24 / math.sqrt(ne)) * 1.0), r.toString)
  }

  test("QualityChecks.tukeyHsd: hand q panel on one shared MSE") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0),
      ("c", 1.0), ("c", 3.0), ("c", 5.0)).toDF("g", "v")
    // SSW = 2+2+8 = 12, MSE = 12/6 = 2, se = sqrt(2/2*(2/3)) for all pairs
    val rows = QualityChecks.tukeyHsd(df, "g", "v").collect()
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val se = math.sqrt(2.0 / 3.0)
    val got = rows.map(r => (r.getString(0), r.getString(1),
      r.getAs[Double]("mean_diff"), r.getAs[Double]("q_stat"))).toSeq
    assert(got == Seq(
      ("a", "b", -3.0, r4(3.0 / se)),
      ("a", "c", -1.0, r4(1.0 / se)),
      ("b", "c", 2.0, r4(2.0 / se))), got.toString)
    // all-constant groups -> MSE = 0 -> NULL q, diffs still exact
    val flat = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("g", "v")
    val rf = QualityChecks.tukeyHsd(flat, "g", "v").head()
    assert(rf.getAs[Double]("mean_diff") == -1.0 &&
      rf.isNullAt(rf.fieldIndex("q_stat")), rf.toString)
  }

  test("QualityChecks.grubbsTest: hand G, value tie-break, n<3 NULL") {
    val df = Seq(("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 10.0))
      .toDF("grp", "v")
    val r = QualityChecks.grubbsTest(df, "grp", "v").head()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // mean 2.8, sd = sqrt(324/20); maxdev/n = 7.2
    assert(r.getAs[Double]("extreme_value") == 10.0 &&
      r.getAs[Double]("g_stat") == r6(7.2 / math.sqrt(16.2)), r.toString)
    // equal deviations 2 both sides -> larger value wins the tie
    val tie = Seq(("t", 0.0), ("t", 2.0), ("t", 4.0)).toDF("grp", "v")
    assert(QualityChecks.grubbsTest(tie, "grp", "v").head()
      .getAs[Double]("extreme_value") == 4.0)
    // n = 2 -> statistic NULL (never significant; classic n >= 3 rule)
    val two = Seq(("s", 1.0), ("s", 5.0)).toDF("grp", "v")
    val rt = QualityChecks.grubbsTest(two, "grp", "v").head()
    assert(rt.isNullAt(rt.fieldIndex("g_stat")), rt.toString)
  }

  test("EventOps.hurstExponent: pinned R/S chain model, ramp>alt, size guards") {
    // 16 hourly bins; ramp counts 1..16 (persistent), alt 1/3/1/3 (anti)
    val series = Map(
      "ramp" -> Array.tabulate(16)(k => (k + 1).toLong),
      "alt" -> Array.tabulate(16)(k => if (k % 2 == 0) 1L else 3L))
    val rows = series.toSeq.flatMap { case (t, v) =>
      v.zipWithIndex.flatMap { case (c, hour) =>
        Seq.fill(c.toInt)((t, hour * 3600L)) }
    }
    val df = rows.toDF("event_type", "ts_s")
      .select(sf.col("event_type"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1.0).as("value"))
    val got = EventOps.hurstExponent(df, sizes = Seq(4, 8)).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hurst")).toMap
    // replicate the operator's pinned chain exactly
    def model(v: Array[Long], sizes: Seq[Int]): Double = {
      val pts = sizes.sorted.flatMap { s =>
        val rs9s = (0 until v.length / s).flatMap { b =>
          val blk = v.slice(b * s, b * s + s)
          val s1 = blk.sum
          val den = s.toLong * blk.map(x => x * x).sum - s1 * s1
          if (den <= 0) None else {
            var cum = 0L
            val devs = blk.zipWithIndex.map { case (x, j) =>
              cum += x; s * cum - (j + 1) * s1 }
            Some(math.floor((devs.max - devs.min) /
              math.sqrt(den.toDouble) * 1e9 + 0.5).toLong)
          }
        }
        if (rs9s.isEmpty) None else {
          val m9 = math.floor(rs9s.sum.toDouble / rs9s.size + 0.5)
          Some((math.floor(math.log(s.toDouble) * 1e9 + 0.5),
            math.floor(math.log(m9 / 1e9) * 1e9 + 0.5)))
        }
      }
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      math.floor(slope * 1e6 + 0.5) / 1e6
    }
    assert(got("ramp") == model(series("ramp"), Seq(4, 8)), got.toString)
    assert(got("alt") == model(series("alt"), Seq(4, 8)), got.toString)
    assert(got("ramp") > 0.8 && got("alt") < got("ramp"), got.toString)
    intercept[IllegalArgumentException] {
      EventOps.hurstExponent(df, sizes = Seq(8))
    }
    intercept[IllegalArgumentException] {
      EventOps.hurstExponent(df, sizes = Seq(2, 8192))
    }
  }

  test("QualityChecks.uncertaintyCoefficient: refinement asymmetry, constant NULL") {
    // y in 1..4 uniform; x = y mod 2 -> knowing y pins x (U(x|y)=1),
    // knowing x halves y's uncertainty (U(y|x) = ln2/ln4 = 0.5)
    val df = Seq((0, 1), (1, 2), (0, 3), (1, 4)).toDF("x", "y")
    val r = QualityChecks.uncertaintyCoefficient(df, "x", "y").head()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Long]("n") == 4 &&
      r.getAs[Double]("h_x") == r6(math.log(2)) &&
      r.getAs[Double]("h_y") == r6(math.log(4)) &&
      r.getAs[Double]("u_x_given_y") == 1.0 &&
      r.getAs[Double]("u_y_given_x") == 0.5 &&
      r.getAs[Double]("u_symmetric") == r6(2 * math.log(2) / (3 * math.log(2))),
      r.toString)
    // constant x: H(x)=0 -> that ratio NULL, the other 0
    val const = Seq((1, 1), (1, 2)).toDF("x", "y")
    val rc = QualityChecks.uncertaintyCoefficient(const, "x", "y").head()
    assert(rc.isNullAt(rc.fieldIndex("u_x_given_y")) &&
      rc.getAs[Double]("u_y_given_x") == 0.0, rc.toString)
  }

  test("QualityChecks.linearRegression2: exact recovery, collinear NULL, n<4 NULL") {
    // y = 1 + 2*x1 + 3*x2 exactly
    val df = Seq((0.0, 0.0, 1.0), (1.0, 0.0, 3.0), (0.0, 1.0, 4.0),
      (1.0, 1.0, 6.0), (2.0, 1.0, 8.0)).toDF("x1", "x2", "y")
    val r = QualityChecks.linearRegression2(df, "y", "x1", "x2").head()
    assert(r.getAs[Long]("n") == 5 && r.getAs[Double]("b0") == 1.0 &&
      r.getAs[Double]("b1") == 2.0 && r.getAs[Double]("b2") == 3.0 &&
      r.getAs[Double]("r2") == 1.0 && r.getAs[Double]("adj_r2") == 1.0 &&
      r.getAs[Double]("se_b1") == 0.0 && r.getAs[Double]("se_b2") == 0.0,
      r.toString)
    // x2 = 2*x1 -> singular design -> NULL inference
    val col = Seq((1.0, 2.0, 1.0), (2.0, 4.0, 2.0), (3.0, 6.0, 2.0),
      (4.0, 8.0, 5.0)).toDF("x1", "x2", "y")
    val rc = QualityChecks.linearRegression2(col, "y", "x1", "x2").head()
    assert(rc.isNullAt(rc.fieldIndex("b1")), rc.toString)
    // n = 3 -> zero residual df -> NULL
    val tiny = Seq((0.0, 0.0, 1.0), (1.0, 0.0, 2.0), (0.0, 1.0, 3.0))
      .toDF("x1", "x2", "y")
    val rt = QualityChecks.linearRegression2(tiny, "y", "x1", "x2").head()
    assert(rt.isNullAt(rt.fieldIndex("b1")), rt.toString)
  }

  test("QualityChecks.hoeffdingsD: point-level model parity, U-shape vs tau, guards") {
    // independent per-point implementation of the SAS tied-data form
    def modelD(pts: Seq[(Double, Double)]): Double = {
      def u(t: Double) = if (t > 0) 1.0 else if (t == 0) 0.5 else 0.0
      val n = pts.size.toDouble
      var (d1, d2, d3) = (0.0, 0.0, 0.0)
      for ((xi, yi) <- pts) {
        val r = pts.map(p => u(xi - p._1)).sum + 0.5
        val s = pts.map(p => u(yi - p._2)).sum + 0.5
        val q = 1.0 + pts.filter(p => p._1 != xi || p._2 != yi)
          .map(p => u(xi - p._1) * u(yi - p._2)).sum +
          0.25 * (pts.count(p => p._1 == xi && p._2 == yi) - 1)
        d1 += (q - 1) * (q - 2)
        d2 += (r - 1) * (r - 2) * (s - 1) * (s - 2)
        d3 += (r - 2) * (s - 2) * (q - 1)
      }
      val d = 30 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3) /
        (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
      math.floor(d * 1e6 + 0.5) / 1e6
    }
    // U-shape with ties: rho/tau blind, D sees it
    val uPts = (1 to 9).flatMap(x =>
      Seq.fill(3)((x.toDouble, (x - 5.0) * (x - 5.0))))
    val uDf = uPts.toDF("x", "y")
    val r = QualityChecks.hoeffdingsD(uDf, "x", "y").head()
    assert(r.getAs[Long]("n") == 27 &&
      r.getAs[Double]("d_stat") == modelD(uPts), r.toString)
    assert(r.getAs[Double]("d_stat") > 0.05, r.toString)
    val tau = QualityChecks.kendallTau(uDf, "x", "y").head()
    assert(math.abs(tau.getAs[Double]("tau_b")) < 0.05, tau.toString)
    // exact 12x12 product grid: independence reads ~0 (the tied-data
    // form carries a small-sample negative bias that shrinks with n)
    val ind = (for (x <- 1 to 12; y <- 1 to 12)
      yield (x.toDouble, y.toDouble))
    val ri = QualityChecks.hoeffdingsD(ind.toDF("x", "y"), "x", "y").head()
    assert(ri.getAs[Double]("d_stat") == modelD(ind), ri.toString)
    assert(math.abs(ri.getAs[Double]("d_stat")) < 0.01, ri.toString)
    // n = 4 -> NULL; string buckets rejected
    val four = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0)).toDF("x", "y")
    assert(QualityChecks.hoeffdingsD(four, "x", "y").head()
      .isNullAt(2))
    intercept[IllegalArgumentException] {
      QualityChecks.hoeffdingsD(Seq(("a", 1.0)).toDF("x", "y"), "x", "y")
    }
  }

  test("TextAnalysis.stripMarkup: tags, entity order, multiline attrs") {
    val df = Seq(
      (1L, "<p>a &amp; b</p>"),
      (2L, "x &amp;lt; y"),               // double-escaped stays literal
      (3L, "<div\nclass='x'>hi</div>\t there "),
      (4L, "plain")).toDF("doc_id", "text")
    val got = TextAnalysis.stripMarkup(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tags"), r.getAs[String]("text")))
    assert(got.toSeq == Seq(
      (1L, 2L, "a & b"),
      (2L, 0L, "x &lt; y"),
      (3L, 2L, "hi there"),
      (4L, 0L, "plain")), got.mkString("; "))
    val r1 = TextAnalysis.stripMarkup(df, "doc_id", "text").head()
    assert(r1.getAs[Long]("n_chars_before") == 16 &&
      r1.getAs[Long]("n_chars_after") == 5, r1.toString)
  }

  test("EventOps.cusumChart: reset identity vs pinned model, burst alarm") {
    // 30 calm hourly bins of 5 events, then a 2-bin burst of 50
    val counts = Array.fill(30)(5L) ++ Array(50L, 50L)
    val rows = counts.zipWithIndex.flatMap { case (c, hour) =>
      Seq.fill(c.toInt)(("b", hour * 3600L)) }
    val df = rows.toSeq.toDF("event_type", "ts_s")
      .select(sf.col("event_type"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1.0).as("value"))
    val got = EventOps.cusumChart(df).collect()
    // pinned-chain model: snapped mu/sigma, prefix minus running min
    val n = counts.length
    val s1 = counts.sum
    val s2 = counts.map(c => c * c).sum
    val mu9 = math.floor(s1.toDouble / n * 1e9 + 0.5).toLong
    val sig9 = math.floor(
      math.sqrt((n * s2 - s1 * s1).toDouble) / n * 1e9 + 0.5).toLong
    val k9 = math.floor(0.5 * sig9 + 0.5).toLong
    val h9 = math.floor(4.0 * sig9 + 0.5).toLong
    var (pp, runMin, pm, runMax) = (0L, 0L, 0L, 0L)
    val model = counts.map { v =>
      pp += v * 1000000000L - mu9 - k9; runMin = math.min(runMin, pp)
      pm += v * 1000000000L - mu9 + k9; runMax = math.max(runMax, pm)
      (math.floor((pp - runMin) / 1e9 * 1e6 + 0.5) / 1e6,
        math.floor((runMax - pm) / 1e9 * 1e6 + 0.5) / 1e6)
    }
    assert(got.length == n)
    got.zip(model).foreach { case (r, (sp, sm)) =>
      assert(r.getAs[Double]("cusum_pos") == sp &&
        r.getAs[Double]("cusum_neg") == sm, s"$r vs ($sp, $sm)")
    }
    // the second burst bin crosses 4 sigma; calm bins never alarm
    assert(got.last.getAs[Int]("alarm_up") == 1, got.last.toString)
    assert(got.take(30).forall(_.getAs[Int]("alarm_up") == 0))
    assert(got.forall(_.getAs[Int]("alarm_down") == 0))
  }

  test("EventOps.holtSmoothing: ramp trend ~1, forecast = level + trend, guards") {
    // 80 hourly bins of a clean ramp: hour k has k+1 events
    val rows = (0 until 80).flatMap(k => Seq.fill(k + 1)(("r", k * 3600L)))
    val df = rows.toDF("event_type", "ts_s")
      .select(sf.col("event_type"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1.0).as("value"))
    val got = EventOps.holtSmoothing(df).collect()
    assert(got.length == 80 - 63, s"full-history bins only: ${got.length}")
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("trend") - 1.0) < 0.01, r.toString)
      assert(math.abs(r.getAs[Double]("forecast_next") -
        r.getAs[Double]("level") - r.getAs[Double]("trend")) < 2e-6, r.toString)
      // steady-state level tracks the ramp closely (counts are k+1)
      assert(math.abs(r.getAs[Double]("level") -
        (r.getAs[Long]("n_events"))) < 2.0, r.toString)
    }
    // weights sum to (1, 0): the steady-state sanity identity
    val ws = EventOps.holtWeights(0.5, 0.3, 64)
    assert(math.abs(ws.map(_._2).sum / 1e9 - 1.0) < 1e-6)
    assert(math.abs(ws.map(_._3).sum / 1e9) < 1e-6)
    intercept[IllegalArgumentException] {
      EventOps.holtSmoothing(df, alpha = 1.0)
    }
    intercept[IllegalArgumentException] {
      EventOps.holtSmoothing(df, lags = 1)
    }
  }

  private def hourlyCounts(byType: Seq[(String, Array[Long])]) = {
    val rows = byType.flatMap { case (t, counts) =>
      counts.zipWithIndex.flatMap { case (c, hour) =>
        Seq.fill(c.toInt)((t, hour * 3600L)) } }
    rows.toDF("event_type", "ts_s")
      .select(sf.col("event_type"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1.0).as("value"))
  }

  test("EventOps.permutationEntropy: patterns, ramp zero, tie convention") {
    val df = hourlyCounts(Seq(
      "m" -> Array(1L, 2L, 3L, 2L, 1L, 2L), // 012, 021, 210, 102 -> 4 distinct
      "r" -> Array(1L, 2L, 3L, 4L, 5L, 6L), // all 012 -> zero entropy
      "c" -> Array(2L, 2L, 2L, 2L, 2L, 2L))) // ties -> earlier-first: all 012
    val got = EventOps.permutationEntropy(df).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_patterns"),
          r.getAs[Double]("perm_entropy"), r.getAs[Double]("perm_entropy_norm")))
      .toMap
    assert(got("r") == ((4L, 1L, 0.0, 0.0)), got("r").toString)
    assert(got("c") == ((4L, 1L, 0.0, 0.0)), got("c").toString)
    // 4 equiprobable patterns: H = ln 4 on the snapped grid
    val ln4_9 = math.floor(math.log(4.0) * 1e9 + 0.5)
    assert(got("m")._1 == 4L && got("m")._2 == 4L)
    assert(got("m")._3 == math.floor(ln4_9 / 1e9 * 1e6 + 0.5) / 1e6)
    assert(got("m")._4 == math.floor(4 * ln4_9 / (4 * 1791759469.0) * 1e6 + 0.5) / 1e6)
  }

  test("EventOps.hjorthParameters: hand moments, constant-series guards") {
    val df = hourlyCounts(Seq(
      "h" -> Array(1L, 3L, 2L, 4L),
      "k" -> Array(2L, 2L, 2L, 2L))) // constant -> zero activity, NULL rest
    val got = EventOps.hjorthParameters(df).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val h = got("h")
    // var = 20/16; mobility = sqrt(18*16/(20*9)); complexity =
    // sqrt(36*9/(18*4)) / mobility
    assert(h.getAs[Long]("n_bins") == 4L)
    assert(h.getAs[Double]("activity") == 1.25)
    assert(h.getAs[Double]("mobility") ==
      math.floor(math.sqrt(288.0 / 180.0) * 1e6 + 0.5) / 1e6)
    assert(h.getAs[Double]("complexity") ==
      math.floor(math.sqrt(324.0 / 72.0) / math.sqrt(288.0 / 180.0) * 1e6 + 0.5) / 1e6)
    val k = got("k")
    assert(k.getAs[Double]("activity") == 0.0 && k.isNullAt(k.fieldIndex("mobility"))
      && k.isNullAt(k.fieldIndex("complexity")))
  }

  test("EventOps.ar2YuleWalker: alternating series recovers -10/11, -1/11") {
    val df = hourlyCounts(Seq(
      "a" -> Array(3L, 1L, 3L, 1L, 3L, 1L),
      "k" -> Array(2L, 2L, 2L, 2L, 2L, 2L))) // constant -> NULLs
    val got = EventOps.ar2YuleWalker(df).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = got("a")
    // r1 = -180/216, r2 = 144/216; YW: phi1 = -10/11, phi2 = -1/11,
    // innovation = 10/33
    assert(math.abs(a.getAs[Double]("r1") - (-0.833333)) < 2e-6, a.toString)
    assert(math.abs(a.getAs[Double]("r2") - 0.666667) < 2e-6, a.toString)
    assert(math.abs(a.getAs[Double]("phi1") - (-10.0 / 11)) < 2e-6, a.toString)
    assert(math.abs(a.getAs[Double]("phi2") - (-1.0 / 11)) < 2e-6, a.toString)
    assert(math.abs(a.getAs[Double]("innovation_ratio") - 10.0 / 33) < 2e-6)
    val k = got("k")
    assert(k.isNullAt(k.fieldIndex("r1")) && k.isNullAt(k.fieldIndex("phi1")))
  }

  test("EventOps.varianceRatio: alternating -> 0, ramp hand ratios") {
    val df = hourlyCounts(Seq(
      "a" -> Array(1L, 2L, 1L, 2L, 1L, 2L, 1L, 2L, 1L, 2L),
      "t" -> (1L to 10L).toArray))
    val got = EventOps.varianceRatio(df).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // alternating: every q-window sums to the same value -> VR = 0
    val a = got("a")
    assert(a.getAs[Double]("vr2") == 0.0 && a.getAs[Double]("vr4") == 0.0 &&
      a.getAs[Double]("vr8") == 0.0, a.toString)
    // ramp: A2 = 24000, A4 = 44800, A8 = 12800, B = 8250 (hand sums)
    val t = got("t")
    assert(t.getAs[Double]("vr2") ==
      math.floor(240000.0 / 148500.0 * 1e6 + 0.5) / 1e6, t.toString)
    assert(t.getAs[Double]("vr4") ==
      math.floor(448000.0 / 231000.0 * 1e6 + 0.5) / 1e6, t.toString)
    assert(t.getAs[Double]("vr8") ==
      math.floor(128000.0 / 198000.0 * 1e6 + 0.5) / 1e6, t.toString)
  }

  test("QualityChecks.fisherExact: lady-tasting-tea tails, guards") {
    // a=3 b=1 / c=1 d=3: p_greater = 17/70, two-sided = 34/70, OR = 9
    val df = (Seq.fill(3)(("a", true)) ++ Seq.fill(1)(("a", false)) ++
      Seq.fill(1)(("b", true)) ++ Seq.fill(3)(("b", false)))
      .toDF("arm", "success")
    val r = QualityChecks.fisherExact(df, "arm", "success").head()
    assert(r.getAs[Long]("a") == 3 && r.getAs[Long]("b") == 1 &&
      r.getAs[Long]("c") == 1 && r.getAs[Long]("d") == 3)
    assert(math.abs(r.getAs[Double]("p_two_sided") - 34.0 / 70) < 2e-6, r.toString)
    assert(math.abs(r.getAs[Double]("p_greater") - 17.0 / 70) < 2e-6, r.toString)
    assert(r.getAs[Double]("odds_ratio") == 9.0)
    intercept[IllegalArgumentException] {
      QualityChecks.fisherExact(df, "arm", "success", maxN = 4)
    }
    intercept[IllegalArgumentException] {
      QualityChecks.fisherExact(
        df.union(Seq(("c", true)).toDF("arm", "success")), "arm", "success")
    }
    // observed count in the LOWER tail: a=0 b=10 / c=10 d=0 — the
    // greater tail spans the whole support and holds tables up to
    // C(10,5)^2 = 63504x more probable than the observed one, which
    // overflowed the old observed-anchored 1e-15 long grid; anchored
    // at its own max the sum is exactly the full mass, p_greater = 1
    val lo = (Seq.fill(10)(("a", false)) ++ Seq.fill(10)(("b", true)))
      .toDF("arm", "success")
    val rl = QualityChecks.fisherExact(lo, "arm", "success").head()
    assert(math.abs(rl.getAs[Double]("p_greater") - 1.0) < 2e-6, rl.toString)
    // two-sided tail at the most extreme table: only the two corner
    // tables k=0, k=10 are <= P(obs): p = 2/C(20,10)
    assert(math.abs(rl.getAs[Double]("p_two_sided") - 2.0 / 184756) < 2e-6,
      rl.toString)
  }

  test("QualityChecks.gTest: perfect 2x2 diagonal gives 40 ln 2") {
    val df = (Seq.fill(10)(("1", "p")) ++ Seq.fill(10)(("2", "q")))
      .toDF("x", "y")
    val r = QualityChecks.gTest(df, "x", "y").head()
    // snapped-grid model: 20*ln20_9 - 20*ln10_9, doubled
    val ln10_9 = math.floor(math.log(10.0) * 1e9 + 0.5)
    val ln20_9 = math.floor(math.log(20.0) * 1e9 + 0.5)
    val g = (20 * ln20_9 - 20 * ln10_9) * 2 / 1e9
    assert(r.getAs[Long]("n") == 20 && r.getAs[Long]("df") == 1)
    assert(r.getAs[Double]("g_statistic") ==
      math.floor(g * 1e6 + 0.5) / 1e6, r.toString)
  }

  test("QualityChecks.gkLambda: hand 2x2 halves errors both ways") {
    val df = (Seq.fill(6)(("1", "p")) ++ Seq.fill(2)(("1", "q")) ++
      Seq.fill(2)(("2", "p")) ++ Seq.fill(6)(("2", "q"))).toDF("x", "y")
    val r = QualityChecks.gkLambda(df, "x", "y").head()
    // sum_x max_y = 12, max column = 8: (12-8)/(16-8) = 0.5 each way
    assert(r.getAs[Long]("n") == 16)
    assert(r.getAs[Double]("lambda_y_given_x") == 0.5 &&
      r.getAs[Double]("lambda_x_given_y") == 0.5 &&
      r.getAs[Double]("lambda_symmetric") == 0.5, r.toString)
    // dominant-class margin: lambda can be 0 under real dependence
    val skew = (Seq.fill(8)(("1", "p")) ++ Seq.fill(1)(("1", "q")) ++
      Seq.fill(7)(("2", "p"))).toDF("x", "y")
    val rs = QualityChecks.gkLambda(skew, "x", "y").head()
    assert(rs.getAs[Double]("lambda_y_given_x") == 0.0, rs.toString)
  }

  test("StarSchema.modePerGroup: counts, share, smallest-value tiebreak") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c"),
      (3L, "y"), (3L, "x")).toDF("k", "v")
    val got = StarSchema.modePerGroup(df, "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      (1L, "a", 2L, 3L, 2L, 0.666667),
      (2L, "c", 1L, 1L, 1L, 1.0),
      (3L, "x", 1L, 2L, 2L, 0.5)), got.toString) // tie -> smallest value
  }

  test("StarSchema.topNPlusOther: ranked cut, residual row, shares sum") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("c", 1.0), ("d", 0.5))
      .toDF("dim", "amt")
    val got = StarSchema.topNPlusOther(df, "dim", "amt", n = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (1L, "a", 3.0, math.floor(30000.0 / 65000 * 1e6 + 0.5) / 1e6),
      (2L, "b", 2.0, math.floor(20000.0 / 65000 * 1e6 + 0.5) / 1e6),
      (3L, "(other)", 1.5, math.floor(15000.0 / 65000 * 1e6 + 0.5) / 1e6)),
      got.toString)
    // n >= members: no residual row
    assert(StarSchema.topNPlusOther(df, "dim", "amt", n = 9).collect()
      .length == 4)
  }

  test("StarSchema.periodOverPeriod: MoM/YoY deltas, gap months NULL") {
    val df = Seq(("2024-01-15 00:00:00", 100.0), ("2024-02-10 00:00:00", 150.0),
      ("2025-01-05 00:00:00", 120.0))
      .toDF("ts_s", "amt")
      .select(sf.col("ts_s").cast("timestamp").as("ts"), sf.col("amt"))
    val got = StarSchema.periodOverPeriod(df, "ts", "amt").collect()
    assert(got.length == 3)
    val feb = got(1)
    assert(feb.getAs[String]("month") == "2024-02" &&
      feb.getAs[Double]("mom_delta") == 50.0 &&
      feb.getAs[Double]("mom_pct") == 0.5, feb.toString)
    val jan25 = got(2)
    assert(jan25.isNullAt(jan25.fieldIndex("mom_delta")) &&
      jan25.getAs[Double]("yoy_delta") == 20.0 &&
      jan25.getAs[Double]("yoy_pct") == 0.2, jan25.toString)
    assert(got(0).isNullAt(got(0).fieldIndex("mom_pct")))
  }

  test("EventOps.attributionTimeDecay: 2:1 recency split, direct fallback") {
    val day = 86400L
    val df = Seq(
      (1L, 2 * day + 100, 1L, "purchase", 10.0),
      (2L, 2 * day + 50, 1L, "click", 1.0),   // same bin: weight 1e9
      (3L, day + 50, 1L, "view", 1.0),        // 1 bin back: weight 5e8
      (4L, 2 * day + 100, 2L, "purchase", 5.0) // no touches -> direct
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"), sf.col("value"))
    val got = EventOps.attributionTimeDecay(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // click: floor(1e9 * 1e9 / 1.5e9) = 666666666 -> 6.67; view -> 3.33
    assert(got == Seq(
      ("click", 1L, 6.67), ("direct", 1L, 5.0), ("view", 1L, 3.33)),
      got.toString)
  }

  test("EventOps.cohortLtv: dense offsets, cumulative per-member curve") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-02 10:00:00", 1L, "purchase", 10.0),
      (3L, "2024-01-09 10:00:00", 1L, "purchase", 5.5),
      (4L, "2024-01-08 09:00:00", 2L, "signup", 0.0),
      (5L, "2024-01-10 09:00:00", 2L, "purchase", 2.0),
      (6L, "2024-01-10 12:00:00", 2L, "click", 99.0)) // not revenue
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"), sf.col("value"))
    val got = EventOps.cohortLtv(df).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    // cohort 01-01 (u1): 10.00 then 5.50; cohort 01-08 (u2): 2.00 only
    assert(got == Seq(
      ("2024-01-01", 0, 1L, 10.0, 10.0, 10.0),
      ("2024-01-01", 1, 1L, 5.5, 15.5, 15.5),
      ("2024-01-08", 0, 1L, 2.0, 2.0, 2.0)), got.toString)
  }

  test("StarSchema.priceVolumeBridge: effects sum to delta, one-period NULL") {
    val df = Seq(
      ("A", "2024-01-01 00:00:00", 10.0, 100.0), // p0: pbar 10
      ("A", "2024-01-20 00:00:00", 5.0, 75.0),   // p1: pbar 15
      ("B", "2024-01-19 00:00:00", 2.0, 30.0),   // p1 only
      ("A", null, 1.0, 1.0),                     // null ts drops
      ("A", "2024-01-02 00:00:00", 0.0, 50.0))   // zero qty drops
      .toDF("brand", "ts_s", "qty", "amt")
      .select(sf.col("brand"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("qty"), sf.col("amt"))
    val got = StarSchema.priceVolumeBridge(df, "brand", "ts", "qty", "amt")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("A")
    assert(a.getAs[Double]("revenue_p0") == 100.0 &&
      a.getAs[Double]("revenue_p1") == 75.0 &&
      a.getAs[Double]("delta_revenue") == -25.0, a.toString)
    // dp = 5, q0 = 10, dq = -5: +50 - 50 - 25 = -25 = delta exactly
    assert(a.getAs[Double]("price_effect") == 50.0 &&
      a.getAs[Double]("volume_effect") == -50.0 &&
      a.getAs[Double]("cross_effect") == -25.0, a.toString)
    val b = got("B")
    assert(b.getAs[Double]("revenue_p0") == 0.0 &&
      b.getAs[Double]("delta_revenue") == 30.0 &&
      b.isNullAt(b.fieldIndex("price_effect")), b.toString)
  }

  test("EventOps.shewhartChart: exact zones, WE rule counts on 8x1+9") {
    val ts = (1 to 9).map(d => s"2024-01-0$d 12:00:00")
    // type a: one event/day for 8 days, then a 9-event day;
    // type b: constant one event/day (MR sum 0 -> nothing flags)
    val rows = ts.take(8).map(t => (t, "a", 0.0)) ++
      Seq.fill(9)((ts(8), "a", 0.0)) ++ ts.map(t => (t, "b", 0.0))
    val df = rows.toDF("ts_s", "event_type", "value")
      .select(sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("event_type"), sf.col("value"))
    val got = EventOps.shewhartChart(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val ra = got("a")
    // the 1-days sit JUST beyond 1 sigma low: 8*1128*8 = 72192 > 72000
    // - the zone call is decided by exact integers, not floats
    assert(ra.getAs[Long]("n_bins") == 9 &&
      ra.getAs[Long]("r1_beyond_3sigma") == 1 &&
      ra.getAs[Long]("r2_2of3_beyond_2sigma") == 0 &&
      ra.getAs[Long]("r3_4of5_beyond_1sigma") == 5 &&
      ra.getAs[Long]("r4_8_same_side") == 1 &&
      ra.getAs[Long]("n_flagged") == 6, ra.toString)
    assert(ra.getAs[Double]("mean") == math.floor(17.0 / 9 * 1e6 + 0.5) / 1e6)
    assert(ra.getAs[Double]("sigma_hat") ==
      math.floor(8.0 / 8 / 1.128 * 1e6 + 0.5) / 1e6, ra.toString)
    val rb = got("b")
    assert(rb.getAs[Double]("sigma_hat") == 0.0 &&
      rb.getAs[Double]("ucl") == 1.0 &&
      rb.getAs[Long]("n_flagged") == 0, rb.toString)
  }

  test("QualityChecks.signTestExact: binomial(4,1/2) tails, ties dropped") {
    val df = Seq(
      (1L, "click", 2.0), (1L, "view", 1.0),  // +
      (2L, "click", 3.0), (2L, "view", 1.0),  // +
      (3L, "click", 1.0), (3L, "view", 2.0),  // -
      (4L, "click", 1.0), (4L, "view", 1.0),  // tie: dropped
      (5L, "click", 5.0), (5L, "view", 1.0))  // +
      .toDF("user_id", "event_type", "value")
    val r = QualityChecks.signTestExact(df, "user_id", "event_type", "value",
      "click", "view").head()
    assert(r.getAs[Long]("n_untied") == 4 && r.getAs[Long]("n_pos") == 3 &&
      r.getAs[Long]("n_ties") == 1, r.toString)
    // P(j) = C(4,j)/16: p_greater = 5/16; small-P two-sided = 10/16
    assert(math.abs(r.getAs[Double]("p_greater") - 5.0 / 16) < 2e-6, r.toString)
    assert(math.abs(r.getAs[Double]("p_two_sided") - 10.0 / 16) < 2e-6,
      r.toString)
    assert(math.abs(r.getAs[Double]("ln_p_observed") - math.log(0.25)) < 2e-6)
    intercept[IllegalArgumentException] { // all ties: m = 0
      QualityChecks.signTestExact(
        Seq((1L, "click", 1.0), (1L, "view", 1.0)).toDF(
          "user_id", "event_type", "value"),
        "user_id", "event_type", "value", "click", "view")
    }
  }

  test("EventOps.sampleEntropy: periodic series scores 0, no-match NULL") {
    def days(tpe: String, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (v, i) => Seq.fill(v)((s"2024-01-0${i + 1} 12:00:00", tpe, 0.0)) }
    // a: period-2 series (r = 0.1, matches = exact equality): B = A = 2
    // b: aperiodic, all first-2 diffs exceed r: B = 0 -> NULL
    val df = (days("a", Seq(1, 2, 1, 2, 1, 2)) ++
      days("b", Seq(1, 5, 2, 9, 3, 7)))
      .toDF("ts_s", "event_type", "value")
      .select(sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("event_type"), sf.col("value"))
    val got = EventOps.sampleEntropy(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getAs[Long]("n_bins") == 6 && a.getAs[Double]("r") == 0.1 &&
      a.getAs[Long]("b_pairs") == 2 && a.getAs[Long]("a_pairs") == 2 &&
      a.getAs[Double]("sampen") == 0.0, a.toString)
    val b = got("b")
    assert(b.getAs[Long]("b_pairs") == 0 &&
      b.isNullAt(b.fieldIndex("sampen")), b.toString)
  }

  test("QualityChecks.hbosOutliers: thin-bin score, constant feature inert") {
    val df = Seq(
      (1L, Some(0.0), 7.0), (2L, Some(0.0), 7.0), (3L, Some(0.0), 7.0),
      (4L, Some(0.0), 7.0), (5L, Some(10.0), 7.0),
      (6L, None: Option[Double], 7.0))
      .toDF("k", "f0", "f1") // null row drops (complete-case)
    val got = QualityChecks.hbosOutliers(df, "k", Seq("f0", "f1"),
      nBins = 2, topK = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // f0 bins: {0,0,0,0} vs {10}; f1 constant -> bin 0 for all, inert
    val ln4 = math.floor(math.log(4.0) * 1e9 + 0.5) / 1e9
    assert(got == Seq(
      (5L, math.floor(ln4 * 1e6 + 0.5) / 1e6), (1L, 0.0)), got.toString)
  }

  test("QualityChecks.bestSplits: clean split gain 100, constant NULL") {
    val df = Seq((10.0, 1.0, 7.0), (10.0, 2.0, 7.0),
      (20.0, 8.0, 7.0), (20.0, 9.0, 7.0)).toDF("y", "x", "c")
    val got = QualityChecks.bestSplits(df, "y", Seq("x", "c"), nBins = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val x = got("x")
    // parent SSE 100, children 0: gain = 100 at the bin-0 boundary
    assert(x.getAs[Long]("n_rows") == 4 && x.getAs[Long]("best_bin") == 0 &&
      x.getAs[Double]("threshold") == 5.0 && x.getAs[Long]("n_left") == 2 &&
      x.getAs[Long]("n_right") == 2 && x.getAs[Double]("gain") == 100.0,
      x.toString)
    val c = got("c")
    assert(c.getAs[Long]("n_rows") == 4 &&
      c.isNullAt(c.fieldIndex("best_bin")) &&
      c.isNullAt(c.fieldIndex("gain")), c.toString)
  }

  test("QualityChecks.iccTwoWay: consistency 1, agreement 8/9, incomplete drops") {
    val df = Seq(
      (1L, "A", 1.0), (1L, "B", 2.0),
      (2L, "A", 3.0), (2L, "B", 4.0),
      (3L, "A", 5.0), (3L, "B", 6.0),
      (4L, "A", 9.0)) // incomplete subject: dropped
      .toDF("subj", "rater", "v")
    val r = QualityChecks.iccTwoWay(df, "subj", "rater", "v").head()
    // MSR 8, MSC 1.5, MSE 0: ICC(3,1) = 1, ICC(2,1) = 8/(8+1)
    assert(r.getAs[Long]("n_subjects") == 3 && r.getAs[Long]("k_raters") == 2)
    assert(r.getAs[Double]("msr") == 8.0 && r.getAs[Double]("msc") == 1.5 &&
      r.getAs[Double]("mse") == 0.0, r.toString)
    assert(r.getAs[Double]("icc31") == 1.0 &&
      r.getAs[Double]("icc21") == math.floor(8.0 / 9 * 1e6 + 0.5) / 1e6,
      r.toString)
  }

  test("EventOps.demandProfile: all four Syntetos-Boylan quadrants") {
    def days(tpe: String, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (v, i) => Seq.fill(v)((s"2024-01-0${i + 1} 12:00:00", tpe, 0.0)) }
    val df = (days("s", Seq(2, 2, 2, 2)) ++ days("i", Seq(3, 0, 0, 3)) ++
      days("l", Seq(1, 0, 9, 0)) ++ days("e", Seq(1, 9, 1, 9)))
      .toDF("ts_s", "event_type", "value")
      .select(sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("event_type"), sf.col("value"))
    val byType = EventOps.demandProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(byType("s").getAs[String]("pattern") == "smooth" &&
      byType("s").getAs[Double]("adi") == 1.0 &&
      byType("s").getAs[Double]("cv2") == 0.0, byType("s").toString)
    assert(byType("i").getAs[String]("pattern") == "intermittent" &&
      byType("i").getAs[Double]("adi") == 2.0, byType("i").toString)
    assert(byType("l").getAs[String]("pattern") == "lumpy" &&
      byType("l").getAs[Double]("cv2") == 0.64, byType("l").toString)
    assert(byType("e").getAs[String]("pattern") == "erratic" &&
      byType("e").getAs[Double]("cv2") == 0.64, byType("e").toString)
  }

  test("Dedup.lshPlanner: S-curve recall over a staged pair set") {
    val pairs = Seq((1L, 2L, 1.0), (3L, 4L, 0.5)).toDF("a_id", "b_id", "jaccard")
    val got = Dedup.lshPlanner(pairs, "jaccard", sketchBits = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    def p9(r: Int, b: Int, s: Double): Long =
      if (s >= 1.0) 1000000000L
      else math.floor((1.0 - math.exp(
        b * math.log(1.0 - math.exp(r * math.log(s))))) * 1e9 + 0.5).toLong
    Dedup.lshPlannerConfigs(4).foreach { case (r, b, s50) =>
      val row = got((r, b))
      val expect = math.floor(
        (p9(r, b, 1.0) + p9(r, b, 0.5)).toDouble / 2.0 / 1e9 * 1e6 + 0.5) / 1e6
      assert(row.getAs[Long]("n_pairs") == 2 &&
        row.getAs[Double]("expected_recall") == expect &&
        row.getAs[Double]("s50") == math.floor(s50 * 1e6 + 0.5) / 1e6,
        row.toString)
    }
    // more rows per band = sharper curve = lower recall at s = 0.5
    assert(got((1, 4)).getAs[Double]("expected_recall") >
      got((4, 1)).getAs[Double]("expected_recall"))
  }

  test("QualityChecks.demingRegression: 2x line, inverse slope, degenerate") {
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    val r = QualityChecks.demingRegression(df, "x", "y").head()
    assert(r.getAs[Long]("n") == 3 && r.getAs[Double]("slope") == 2.0 &&
      r.getAs[Double]("intercept") == 0.0, r.toString)
    // symmetry the OLS pair can't have: slope(y~x) * slope(x~y) = 1
    val inv = QualityChecks.demingRegression(df, "y", "x").head()
    assert(inv.getAs[Double]("slope") == 0.5, inv.toString)
    val dg = QualityChecks.demingRegression(
      Seq((1.0, 1.0), (1.0, 2.0)).toDF("x", "y"), "x", "y").head()
    assert(dg.isNullAt(dg.fieldIndex("slope")), dg.toString) // S_xy = 0
  }

  test("QualityChecks.bayesianAB: closed-form 0.7, means, 3-arm guard") {
    // A ~ Beta(2,2), B ~ Beta(2,1): P(B > A) = 6(1/2 - 1/3 - 1/4 + 1/5) = 0.7
    val df = Seq(("a", true), ("a", false), ("b", true)).toDF("arm", "success")
    val r = QualityChecks.bayesianAB(df, "arm", "success").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("succ_a") == 1 &&
      r.getAs[Long]("n_b") == 1 && r.getAs[Long]("succ_b") == 1, r.toString)
    assert(math.abs(r.getAs[Double]("p_b_beats_a") - 0.7) < 2e-6, r.toString)
    assert(r.getAs[Double]("posterior_mean_a") == 0.5 &&
      math.abs(r.getAs[Double]("posterior_mean_b") - 2.0 / 3) < 2e-6, r.toString)
    intercept[IllegalArgumentException] {
      QualityChecks.bayesianAB(
        df.union(Seq(("c", true)).toDF("arm", "success")), "arm", "success")
    }
  }

  test("TextAnalysis.formatCensus: chat needs 2 role lines, share 3/5") {
    val df = Seq(
      ("s", "User: hi\nAssistant: yo"),
      ("s", "Q: why\nA: because"),
      ("s", "### Instruction\nx\n### Response\ny"),
      ("s", "plain prose"),
      ("s", "User: only one role line")) // 1 role line: NOT chat
      .toDF("source", "text")
    val r = TextAnalysis.formatCensus(df, "source", "text").head()
    assert(r.getAs[Long]("n_docs") == 5 && r.getAs[Long]("n_chat") == 1 &&
      r.getAs[Long]("n_qa") == 1 && r.getAs[Long]("n_alpaca") == 1 &&
      r.getAs[Double]("dialog_share") == 0.6, r.toString)
  }

  test("EventOps.absorptionProbability: multi-hop reach, loop stays 0") {
    val df = Seq(
      (1L, 10L, 1L, "a"), (2L, 20L, 1L, "purchase"),
      (3L, 10L, 2L, "a"), (4L, 20L, 2L, "b"), (5L, 30L, 2L, "purchase"),
      (6L, 10L, 3L, "c"), (7L, 20L, 3L, "c")) // c -> c loop: never converts
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"))
    val got = EventOps.absorptionProbability(df).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p_convert")).toMap
    // a: half direct, half via b (which converts surely) -> 1.0 by step 2
    assert(got == Map("a" -> 1.0, "b" -> 1.0, "purchase" -> 1.0, "c" -> 0.0),
      got.toString)
  }

  test("EventOps.holtWintersSmoothing: constant reproduces coverage, JVM twin") {
    val ws = EventOps.holtWintersWeights(0.3, 0.05, 0.2, 24, 96)
    val coverage9 = ws.map(_._2).sum
    // the truncated sum legitimately overshoots 1 (documented unit
    // mode + slow trend decay); it must be priced, not hidden
    assert(coverage9 > 1000000000L && coverage9 < 1200000000L,
      coverage9.toString)
    // hourly series over 97 bins: type k constant 1; type p spikes at
    // midnight (hour % 24 == 0): 4 extra events
    def hour(h: Int) = f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:30:00"
    val rows = (0 to 96).flatMap { h =>
      val base = Seq((hour(h), "k", 0.0), (hour(h), "p", 0.0))
      if (h % 24 == 0) base ++ Seq.fill(4)((hour(h), "p", 0.0)) else base
    }
    val df = rows.toDF("ts_s", "event_type", "value")
      .select(sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("event_type"), sf.col("value"))
    val got = EventOps.holtWintersSmoothing(df).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(got.size == 4, got.keys.toString) // 2 full-history bins x 2 types
    val k = got.filter(_._1._1 == "k").values.head
    val cov = math.floor(coverage9.toDouble / 1e9 * 1e6 + 0.5) / 1e6
    assert(k.getAs[Double]("forecast_next") == cov &&
      k.getAs[Double]("weight_coverage") == cov, k.toString)
    // periodic type: exact JVM twin of the long-integer convolution
    val vs = (0 to 96).map(h => if (h % 24 == 0) 5L else 1L)
    val lastBin = got.keys.filter(_._1 == "p").map(_._2).max
    val f9 = ws.map { case (l, w9) => w9 * vs(96 - l) }.sum
    val p = got(("p", lastBin))
    assert(p.getAs[Double]("forecast_next") ==
      math.floor(f9.toDouble / 1e9 * 1e6 + 0.5) / 1e6, p.toString)
  }

  test("QualityChecks.ebShrinkage: pull toward prior, degenerate NULL") {
    val rows = Seq.fill(1)(("g1", true)) ++ Seq.fill(1)(("g1", false)) ++
      Seq.fill(120)(("g2", true)) ++ Seq.fill(280)(("g2", false)) ++
      Seq.fill(10)(("g3", true)) ++ Seq.fill(90)(("g3", false)) ++
      Seq.fill(50)(("g4", true)) ++ Seq.fill(150)(("g4", false))
    val got = QualityChecks.ebShrinkage(rows.toDF("grp", "ok"), "grp", "ok")
      .collect().map(r => r.getString(0) -> r).toMap
    // JVM twin of the moment fit on snapped 1e-6 rates
    val p6 = Seq(500000L, 300000L, 100000L, 250000L)
    val g = p6.size.toDouble
    val mu = p6.sum.toDouble / g / 1e6
    val v = (p6.size.toLong * p6.map(x => BigInt(x) * x).sum.toDouble -
      p6.sum.toDouble * p6.sum.toDouble) / (g * g) / 1e12
    val common = mu * (1.0 - mu) / v - 1.0
    val (alpha, beta) = (mu * common, (1.0 - mu) * common)
    val g1 = got("g1")
    val want = math.floor((1.0 + alpha) / (2.0 + alpha + beta) * 1e6 + 0.5) / 1e6
    assert(g1.getAs[Double]("shrunken_rate") == want, g1.toString)
    // tiny sample pulled hard toward mu; big sample barely moves
    assert(math.abs(g1.getAs[Double]("shrunken_rate") - mu) <
      math.abs(g1.getAs[Double]("raw_rate") - mu), g1.toString)
    val g2 = got("g2")
    assert(math.abs(g2.getAs[Double]("shrunken_rate") -
      g2.getAs[Double]("raw_rate")) < 0.02, g2.toString)
    // identical rates: zero variance, no Beta fit
    val dg = QualityChecks.ebShrinkage(
      (Seq.fill(2)(("a", true)) ++ Seq.fill(2)(("b", true)))
        .toDF("grp", "ok"), "grp", "ok").collect()
    assert(dg.forall(_.isNullAt(dg.head.fieldIndex("shrunken_rate"))))
  }

  test("QualityChecks.orderReconciliation: exact recompute, drift ranking") {
    val lines = Seq(
      (1L, 100.00, 0.05, 0.10), // 10000 * 95 * 110 = 104.50 exactly
      (2L, 50.00, 0.0, 0.0))    // 50.00
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val heads = Seq((1L, 104.50), (2L, 60.00), (3L, 9.99)) // 3: no lines
      .toDF("o_orderkey", "o_totalprice")
    val got = QualityChecks.orderReconciliation(lines, heads).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((2L, 60.0, 50.0, -10.0), (1L, 104.5, 104.5, 0.0)),
      got.toSeq.toString)
  }

  test("EventOps.activityStreaks: islands split on gaps, max per user") {
    val rows = Seq((1L, 1), (1L, 2), (1L, 3), (1L, 5), (1L, 6),
      (2L, 1), (2L, 2))
      .map { case (u, d) => (u, s"2024-01-0$d 10:00:00") }
    val df = rows.toDF("user_id", "ts_s")
      .select(sf.col("user_id"), sf.col("ts_s").cast("timestamp").as("ts"))
    val got = EventOps.activityStreaks(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // u1: runs 3 and 2; u2: run 2 -> len 2 has 2 runs, 1 user-max
    assert(got == Seq((2L, 2L, 1L), (3L, 1L, 1L)), got.toString)
  }

  test("Graph.attackTolerance: star collapses on hub removal, empty rung") {
    val pairs = Seq((10L, 1L), (10L, 2L), (10L, 3L), (4L, 5L))
      .toDF("item_a", "item_b")
    val got = Graph.attackToleranceFromPairs(pairs, Seq(0, 1)).collect()
      .map(r => r.getInt(0) -> r).toMap
    val k0 = got(0)
    assert(k0.getAs[Long]("n_nodes") == 6 && k0.getAs[Long]("n_components") == 2
      && k0.getAs[Long]("gcc_size") == 4 &&
      k0.getAs[Double]("gcc_share") == math.floor(4.0 / 6 * 1e6 + 0.5) / 1e6,
      k0.toString)
    val k1 = got(1) // hub 10 (deg 3) removed: only (4,5) survives
    assert(k1.getAs[Long]("n_nodes") == 2 && k1.getAs[Long]("gcc_size") == 2 &&
      k1.getAs[Double]("gcc_share") == 1.0, k1.toString)
    // a rung that empties the edge list reports zeros, NULL share
    val star = Seq((10L, 1L), (10L, 2L)).toDF("item_a", "item_b")
    val e = Graph.attackToleranceFromPairs(star, Seq(1)).head()
    assert(e.getAs[Long]("n_nodes") == 0 && e.getAs[Long]("gcc_size") == 0 &&
      e.isNullAt(e.fieldIndex("gcc_share")), e.toString)
  }

  test("Sampling.mixtureInterleave: 2:1 weights pace a,a,b in every prefix") {
    val df = Seq(("a", 101L), ("a", 102L), ("a", 103L), ("a", 104L),
      ("b", 201L), ("b", 202L)).toDF("source", "doc_id")
    val got = Sampling.mixtureInterleave(df, "source", "doc_id",
      Seq("a" -> 0.666667, "b" -> 0.333333)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // slots: a -> 2,3,5,6 and b -> 4,7 (1333332 = 4 * 333333 exactly)
    assert(got == Seq(
      (101L, "a", 1L, 2L, 1L), (102L, "a", 2L, 3L, 2L),
      (201L, "b", 1L, 4L, 3L), (103L, "a", 3L, 5L, 4L),
      (104L, "a", 4L, 6L, 5L), (202L, "b", 2L, 7L, 6L)), got.toString)
  }

  test("QualityChecks.chiSquaredCells: residuals on a clean 2x2, zero cell") {
    val df = (Seq.fill(8)(("a", "p")) ++ Seq.fill(2)(("a", "q")) ++
      Seq.fill(2)(("b", "p")) ++ Seq.fill(8)(("b", "q"))).toDF("x", "y")
    val got = QualityChecks.chiSquaredCells(df, "x", "y").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ap = got(("a", "p")) // e = 5, pearson 3/sqrt(5), adjusted x2
    val pres = math.floor(3.0 / math.sqrt(5.0) * 1e6 + 0.5) / 1e6
    assert(ap.getAs[Long]("observed") == 8 && ap.getAs[Double]("expected") == 5.0
      && ap.getAs[Double]("pearson_resid") == pres, ap.toString)
    assert(ap.getAs[Double]("adjusted_resid") ==
      math.floor(3.0 / math.sqrt(5.0) / 0.5 * 1e6 + 0.5) / 1e6, ap.toString)
    // a category pair never observed together materializes as a 0 cell
    val z = QualityChecks.chiSquaredCells(
      (Seq.fill(2)(("a", "p")) ++ Seq.fill(2)(("b", "q"))).toDF("x", "y"),
      "x", "y").collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(z(("a", "q")).getAs[Long]("observed") == 0 &&
      z(("a", "q")).getAs[Double]("expected") == 1.0, z(("a", "q")).toString)
  }

  test("QualityChecks.decileShift: uniform halves shift by exactly 10") {
    val rows = (1 to 10).map(v => ("2024-01-01 00:00:00", v.toDouble)) ++
      (11 to 20).map(v => ("2024-01-20 00:00:00", v.toDouble))
    val df = rows.toDF("ts_s", "amt")
      .select(sf.col("ts_s").cast("timestamp").as("ts"), sf.col("amt"))
    val got = QualityChecks.decileShift(df, "ts", "amt").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == (1 to 9).map(d =>
      (d, d.toDouble, d + 10.0, 10.0)), got.toSeq.toString)
  }

  test("EventOps.pageHinkley: level shift alarms, constant silent") {
    def days(tpe: String, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (v, i) => Seq.fill(v)(
        (f"2024-01-${i + 1}%02d 12:00:00", tpe, 0.0)) }
    val seriesA = Seq.fill(10)(1) ++ Seq.fill(10)(9)
    val df = (days("a", seriesA) ++ days("b", Seq.fill(20)(1)))
      .toDF("ts_s", "event_type", "value")
      .select(sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("event_type"), sf.col("value"))
    // JVM twin: lambda9 = 5 * sigma * 1e9 with sigma = 4 exactly
    var s = 0L; var m = BigInt(0); var mn = BigInt(0); var mx = BigInt(0)
    var nAl = 0L; var first = -1
    seriesA.map(_.toLong).zipWithIndex.foreach { case (x, idx) =>
      s += x
      val term = math.floor(
        (x.toDouble - s.toDouble / (idx + 1) - 0.0) * 1e9 + 0.5).toLong
      m += term; if (m < mn) mn = m
      val ph = m - mn; if (ph > mx) mx = ph
      if (ph > 20000000000L) { nAl += 1; if (first < 0) first = idx }
    }
    val got = EventOps.pageHinkley(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    val epoch0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    assert(a.getAs[Double]("threshold") == 20.0 &&
      a.getAs[Double]("max_ph") ==
        math.floor(mx.toDouble / 1e9 * 1e6 + 0.5) / 1e6 &&
      a.getAs[Long]("n_alarms") == nAl &&
      a.getAs[Long]("first_alarm_bin") == epoch0 + first, a.toString)
    val b = got("b")
    assert(b.isNullAt(b.fieldIndex("threshold")) &&
      b.getAs[Long]("n_alarms") == 0, b.toString)
  }

  test("Similarity.fisherRatio: separating dim F=50, constant dim NULL") {
    val df = Seq(
      (1L, Array(0.0f, 0.5f), "a"), (2L, Array(0.2f, 0.5f), "a"),
      (3L, Array(1.0f, 0.5f), "b"), (4L, Array(1.2f, 0.5f), "b"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.fisherRatio(df, "label", "embedding").collect()
      .map(r => r.getInt(0) -> r).toMap
    val d0 = got(0)
    // SSB = 1.0 (df 1), SSW = 0.04 (df 2): F = 50
    assert(d0.getAs[Long]("k_classes") == 2 && d0.getAs[Long]("n") == 4 &&
      d0.getAs[Double]("f_ratio") == 50.0, d0.toString)
    val d1 = got(1) // zero within variance: NULL
    assert(d1.isNullAt(d1.fieldIndex("f_ratio")), d1.toString)
  }

  test("EventOps.itsExcess: pre-trend projection, exact excess") {
    def days(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (v, i) => Seq.fill(v)((s"2024-01-0${i + 1} 12:00:00", "a", 0.0)) }
    val df = days(Seq(1, 2, 3, 10)).toDF("ts_s", "event_type", "value")
      .select(sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("event_type"), sf.col("value"))
    val r = EventOps.itsExcess(df).head()
    // pre (1, 2): slope 1 -> projected post = 3 + 4 = 7; actual 13
    assert(r.getAs[Long]("n_pre") == 2 && r.getAs[Long]("n_post") == 2 &&
      r.getAs[Double]("pre_slope") == 1.0 &&
      r.getAs[Long]("actual_post") == 13 &&
      r.getAs[Double]("projected_post") == 7.0 &&
      r.getAs[Double]("excess") == 6.0 &&
      r.getAs[Double]("excess_share") ==
        math.floor(6.0 / 7.0 * 1e6 + 0.5) / 1e6, r.toString)
  }

  test("QualityChecks.orderShipLag: week buckets, negative lag flagged") {
    val lines = Seq(
      (1L, "2024-01-10"), (1L, "2024-01-24"), (1L, "2024-01-04"),
      (2L, "2024-01-02"))
      .toDF("l_orderkey", "sd")
      .select(sf.col("l_orderkey"), sf.col("sd").cast("date").as("l_shipdate"))
    val heads = Seq((1L, "2024-01-10"), (2L, "2024-01-01"))
      .toDF("o_orderkey", "od")
      .select(sf.col("o_orderkey"), sf.col("od").cast("date").as("o_orderdate"))
    val got = QualityChecks.orderShipLag(lines, heads).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // lags 0, 14, -6, 1 -> buckets -1 (violation), 0 x2, 2
    assert(got.toSeq == Seq(
      (-1L, 1L, 0.25, true), (0L, 2L, 0.5, false), (2L, 1L, 0.25, false)),
      got.toSeq.toString)
  }

  test("EventOps.shapleyAttribution: exact coalition values on 2 channels") {
    var id = 0L
    def ev(u: Long, types: String*) = types.map { t => id += 1; (id, u, t) }
    val rows = ev(1, "click", "purchase") ++ ev(2, "click") ++
      ev(3, "view") ++ ev(4, "view") ++ ev(5, "click", "view", "purchase") ++
      ev(6, "click", "view", "purchase") ++ ev(7, "purchase")
    val df = rows.toDF("event_id", "user_id", "event_type")
      .select(sf.col("event_id"),
        sf.lit("2024-01-01 10:00:00").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"))
    val got = EventOps.shapleyAttribution(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // v(0)=1, v(A)=1/2, v(B)=0, v(AB)=1:
    // phi_click = (.5-1)/2 + (1-0)/2 = .25; phi_view = (0-1)/2 + (1-.5)/2
    assert(got("click").getAs[Long]("n_users_touched") == 4 &&
      got("click").getAs[Double]("shapley_value") == 0.25, got("click").toString)
    assert(got("view").getAs[Long]("n_users_touched") == 4 &&
      got("view").getAs[Double]("shapley_value") == -0.25, got("view").toString)
  }

  test("EventOps.runLengthProfile: runs split on interruptions") {
    val df = Seq((1L, 1L, "a"), (2L, 2L, "a"), (3L, 3L, "a"),
      (4L, 4L, "b"), (5L, 5L, "a"))
      .toDF("event_id", "ts_s", "event_type")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1L).as("user_id"), sf.col("event_type"))
    val got = EventOps.runLengthProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a") // runs 3 and 1
    assert(a.getAs[Long]("n_events") == 4 && a.getAs[Long]("n_runs") == 2 &&
      a.getAs[Double]("mean_run") == 2.0 && a.getAs[Long]("max_run") == 3 &&
      a.getAs[Double]("repeat_share") == 0.5, a.toString)
    val b = got("b")
    assert(b.getAs[Long]("n_runs") == 1 &&
      b.getAs[Double]("repeat_share") == 0.0, b.toString)
  }

  test("StarSchema.basketDiversity: entropy by basket size, snapped terms") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "z"), (2L, "z"))
      .toDF("l_orderkey", "p_brand")
    val got = StarSchema.basketDiversity(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val h9 = math.floor(-(2.0 / 3) * math.log(2.0 / 3) * 1e9 + 0.5).toLong +
      math.floor(-(1.0 / 3) * math.log(1.0 / 3) * 1e9 + 0.5).toLong
    val s3 = got(3L)
    assert(s3.getAs[Long]("n_orders") == 1 &&
      s3.getAs[Double]("mean_entropy") ==
        math.floor(h9.toDouble / 1 / 1e9 * 1e6 + 0.5) / 1e6 &&
      s3.getAs[Double]("mean_brands") == 2.0, s3.toString)
    val s2 = got(2L) // single brand: entropy exactly 0
    assert(s2.getAs[Double]("mean_entropy") == 0.0 &&
      s2.getAs[Double]("mean_brands") == 1.0, s2.toString)
  }


  test("StarSchema.weibullFit: median-rank regression, exclusions counted") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 0.0), (5L, -1.0))
      .toDF("k", "t")
    val r = StarSchema.weibullFit(df, "k", "t").head()
    assert(r.getAs[Long]("n_observations") == 3L)
    assert(r.getAs[Long]("n_excluded") == 2L)
    // replicate the snapped pipeline: F_i = (i-.3)/3.4
    def s9(x: Double) = math.floor(x * 1e9 + 0.5)
    val xs = Seq(1.0, 2.0, 3.0).map(t => s9(math.log(t)))
    val ys = (1 to 3).map(i => s9(math.log(-math.log(1.0 - (i - 0.3) / 3.4))))
    val n = 3.0
    val (sx, sxx, sy, sxy) = (xs.sum, xs.map(x => x * x).sum, ys.sum,
      xs.zip(ys).map { case (a, b) => a * b }.sum)
    val k = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - k * sx) / n / 1e9
    assert(r.getAs[Double]("shape_k") == math.floor(k * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("scale_lambda") ==
      math.floor(math.exp(-icept / k) * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("b10_life") < r.getAs[Double]("scale_lambda"))
  }

  test("StarSchema.eoqPolicy: hand demand history replays the (Q,R) formulas") {
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    // horizon = 3 calendar days (global min..max). P1 demands 10 and
    // 20 on the outer days (silent middle day counts as zero); P2 has
    // one 5-unit day.
    val df = Seq(
      (1L, ts("2024-01-01"), 10.0), (1L, ts("2024-01-03"), 20.0),
      (2L, ts("2024-01-02"), 5.0)).toDF("pk", "sd", "qty")
    val got = StarSchema.eoqPolicy(df, "pk", "sd", "qty",
        orderingCost = 100.0, holdingCostPerYear = 2.5, leadTimeDays = 7)
      .collect().map(r => r.getLong(0) -> r).toMap
    def snap(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val cEoq = 2.0 * 100.0 * 365.0 / 2.5
    val zSqrtL = 1.6448536269514722 * math.sqrt(7.0)
    for ((k, s, ssq) <- Seq((1L, 30.0, 500.0), (2L, 5.0, 25.0))) {
      val mu = s * 1e4 / 3.0 / 1e4 // the 1e-4-grid shape, exact here
      val sd = math.sqrt((3.0 * ssq * 1e8 - s * 1e4 * s * 1e4) / (3.0 * 2.0)) / 1e4
      val r = got(k)
      assert(r.getAs[Double]("mean_daily") == snap(mu), s"mu $k")
      assert(r.getAs[Double]("eoq") == snap(math.sqrt(cEoq * mu)), s"eoq $k")
      assert(r.getAs[Double]("orders_per_year") ==
        snap(mu * 365.0 / math.sqrt(cEoq * mu)), s"opy $k")
      assert(r.getAs[Double]("safety_stock") == snap(zSqrtL * sd), s"ss $k")
      assert(r.getAs[Double]("reorder_point") ==
        snap(mu * 7.0 + zSqrtL * sd), s"rop $k")
    }
  }

  test("StarSchema.bullwhip: steady ships vs lumpy orders amplify") {
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    // one brand, 3-week horizon. Ship-dated weekly qty: 10, 10, 10
    // (CV^2 = 0 -> ratio NULL-guarded ... use 10, 10, 16 instead so
    // cs > 0); order-dated weekly qty: 0, 0, 36 (everything ordered
    // in the last week) -> amplification > 1.
    val w0 = "2024-01-01"; val w1 = "2024-01-08"; val w2 = "2024-01-15"
    val orders = Seq((1L, ts(w2))).toDF("o_orderkey", "o_orderdate")
    val lines = Seq(
      (1L, "B1", ts(w0), 10.0), (1L, "B1", ts(w1), 10.0),
      (1L, "B1", ts(w2), 16.0)).toDF("l_orderkey", "p_brand", "l_shipdate",
      "l_quantity")
    val r = StarSchema.bullwhip(lines, orders, "p_brand").head()
    assert(r.getString(0) == "B1" && r.getAs[Long]("n_weeks") == 3L)
    def snap(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def cv2(s: Double, ssq: Double, n: Double) =
      ((n * ssq - s * s) / (n * (n - 1.0))) / ((s / n) * (s / n))
    val co = cv2(36e4, 36e4 * 36e4, 3.0) // 0, 0, 36 on the 1e-4 grid
    val cs = cv2(36e4, (1e10 + 1e10 + 2.56e10), 3.0) // 10, 10, 16
    assert(r.getAs[Double]("cv2_orders") == snap(co), r.toString)
    assert(r.getAs[Double]("cv2_shipments") == snap(cs), r.toString)
    assert(r.getAs[Double]("bullwhip_ratio") == snap(co / cs), r.toString)
    assert(r.getAs[Double]("bullwhip_ratio") > 1.0)
  }

  test("StarSchema.fillRate: hand lags split on the 7-day boundary") {
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    val orders = Seq((1L, "P1", ts("2024-01-01"))).toDF(
      "o_orderkey", "o_orderpriority", "o_orderdate")
    val lines = Seq(
      (1L, ts("2024-01-05"), 6.0),  // lag 4: on time
      (1L, ts("2024-01-08"), 3.0),  // lag 7: on time (boundary)
      (1L, ts("2024-01-12"), 1.0))  // lag 11: late by 4
      .toDF("l_orderkey", "l_shipdate", "l_quantity")
    val r = StarSchema.fillRate(lines, orders, "o_orderpriority").head()
    assert(r.getString(0) == "P1" && r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Double]("fill_rate") == 0.9) // 9 of 10 units on time
    assert(r.getAs[Long]("n_late_lines") == 1L)
    assert(r.getAs[Double]("late_line_share") == 0.333333)
    assert(r.getAs[Double]("mean_late_days") == 4.0)
  }

  test("StarSchema.abcXyzMatrix: revenue Pareto x demand variability cells") {
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    val df = Seq(
      // P1: 70% revenue, steady (cv 0 -> X)
      (1L, ts("2024-01-01"), 10.0, 35.0), (1L, ts("2024-01-02"), 10.0, 35.0),
      // P2: 15%, sample cv sqrt(16/2)/5 = 0.5657 -> Y
      (2L, ts("2024-01-01"), 3.0, 7.5), (2L, ts("2024-01-02"), 7.0, 7.5),
      // P3: 10%, sample cv sqrt(64/2)/5 = 1.1314 -> Z
      (3L, ts("2024-01-01"), 1.0, 5.0), (3L, ts("2024-01-02"), 9.0, 5.0),
      // P4: 5%, sample cv sqrt(25/2)/9.5 = 0.3722 -> X; the sqrt(n)-
      // inflated formula (variance over n-1 instead of n*(n-1)) gave
      // 0.5263 -> Y: this key pins the corrected denominator.
      (4L, ts("2024-01-01"), 7.0, 2.5), (4L, ts("2024-01-02"), 12.0, 2.5))
      .toDF("pk", "sd", "qty", "amt")
    val got = StarSchema.abcXyzMatrix(df, "pk", "sd", "qty", "amt")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_keys"), r.getAs[Double]("revenue_share"))).toList
    assert(got == List(("A", "X", 1L, 0.7), ("B", "Y", 1L, 0.15),
      ("B", "Z", 1L, 0.1), ("C", "X", 1L, 0.05)), got.toString)
  }

  test("EventOps.transferEntropy: lag-coupled series, exact nats both directions") {
    // Y's up-moves are pseudo-random; X copies Y with lag 1 (X is NOT
    // predictable from its own past alone) -> TE(Y->X) large, TE(X->Y)
    // whatever the replication says; both replayed exactly.
    def ts(h: Int, i: Int) = new java.sql.Timestamp(3600000L * h + i)
    val xCounts = Seq(2, 1, 2, 3, 2, 3, 2, 1, 2, 3)
    val yCounts = Seq(1, 2, 3, 2, 3, 2, 1, 2, 3, 1)
    val rows = (for (b <- 0 until 10; i <- 0 until xCounts(b))
        yield ("X", ts(b, i), 1.0)) ++
      (for (b <- 0 until 10; i <- 0 until yCounts(b)) yield ("Y", ts(b, i), 1.0))
    val got = EventOps.transferEntropy(rows.toDF("event_type", "ts", "value"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // replicate the operator's pinned arithmetic from the state seqs
    def states(c: Seq[Int]) = (1 until c.length).map(b => if (c(b) > c(b - 1)) 1 else 0)
    def te(dst: Seq[Int], src: Seq[Int]): Double = {
      val trip = (1 until dst.length).map(i => (dst(i), dst(i - 1), src(i - 1)))
      val c3 = trip.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cxx = trip.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toLong).toMap
      val cxy = trip.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
      val cx = trip.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = trip.size.toLong
      val s9 = c3.map { case (t, c) =>
        math.floor(c.toDouble * math.log((c * cx(t._2)).toDouble /
          (cxy((t._2, t._3)) * cxx((t._1, t._2))).toDouble) * 1e9 + 0.5).toLong
      }.sum
      math.floor(s9.toDouble / 1e9 / n.toDouble * 1e6 + 0.5) / 1e6
    }
    val (xs, ys) = (states(xCounts), states(yCounts))
    assert(got(("Y", "X")) == (8L, te(xs, ys)), got.toString)
    assert(got(("X", "Y")) == (8L, te(ys, xs)), got.toString)
    // the lag-1 copy is informative: Y's past buys real nats about X
    assert(got(("Y", "X"))._2 > 0.5, got.toString)
  }

  test("EventOps.grangerMatrix: closed-form OLS replayed on the coupled series") {
    def ts(h: Int, i: Int) = new java.sql.Timestamp(3600000L * h + i)
    // near-copy of Y with one broken bin (a perfect linear fit would
    // make SSE_u exactly 0 and the F guard returns NULL — this series
    // keeps genuine residual noise)
    val xCounts = Seq(2, 1, 2, 3, 2, 3, 2, 1, 2, 4)
    val yCounts = Seq(1, 2, 3, 2, 3, 2, 1, 2, 3, 1)
    val rows = (for (b <- 0 until 10; i <- 0 until xCounts(b))
        yield ("X", ts(b, i), 1.0)) ++
      (for (b <- 0 until 10; i <- 0 until yCounts(b)) yield ("Y", ts(b, i), 1.0))
    val got = EventOps.grangerMatrix(rows.toDF("event_type", "ts", "value"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    def snap(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // replicate: n-scaled covariances + 2x2 solve + F on (dst=X, src=Y)
    def rep(dst: Seq[Int], src: Seq[Int]) = {
      val tr = (1 until dst.length).map(i =>
        (dst(i).toDouble, dst(i - 1).toDouble, src(i - 1).toDouble))
      val n = tr.size.toDouble
      def s(f: ((Double, Double, Double)) => Double) = tr.map(f).sum
      val (sy, s1, s2) = (s(_._1), s(_._2), s(_._3))
      val cyy = n * s(t => t._1 * t._1) - sy * sy
      val c11 = n * s(t => t._2 * t._2) - s1 * s1
      val c22 = n * s(t => t._3 * t._3) - s2 * s2
      val c1y = n * s(t => t._2 * t._1) - s1 * sy
      val c2y = n * s(t => t._3 * t._1) - s2 * sy
      val c12 = n * s(t => t._2 * t._3) - s1 * s2
      val det = c11 * c22 - c12 * c12
      val b = (c1y * c22 - c2y * c12) / det
      val c = (c2y * c11 - c1y * c12) / det
      val sseU = cyy - b * c1y - c * c2y
      val sseR = cyy - c1y * c1y / c11
      (b, c, (sseR - sseU) / (sseU / (n - 3.0)))
    }
    val (b, c, f) = rep(xCounts, yCounts)
    val r = got(("Y", "X"))
    assert(r.getAs[Long]("n_transitions") == 9L)
    assert(r.getAs[Double]("beta_self") == snap(b), r.toString)
    assert(r.getAs[Double]("beta_cross") == snap(c), r.toString)
    assert(r.getAs[Double]("f_stat") == snap(f), r.toString)
    // the lag-1 copy: Y's past is decisive for X -> a large F
    assert(r.getAs[Double]("f_stat") > 10.0, r.toString)
  }

  test("EventOps.thetaForecast: SES + half-drift on a hand linear series") {
    def ts(h: Int, i: Int) =
      new java.sql.Timestamp(3600000L * h + i) // hour h, i ms offset
    // counts 1,2,3,4 across 4 consecutive hours: OLS slope exactly 1
    val rows = for (h <- 0 until 4; i <- 0 to h) yield ("click", ts(h, i), 1.0)
    val df = rows.toDF("event_type", "ts", "value")
    val r = EventOps.thetaForecast(df, alpha = 0.3).head()
    assert(r.getAs[Long]("n_bins") == 4L)
    assert(r.getAs[Double]("half_drift") == 0.5)
    // replicate the snapped SES: weights .3,.3*.7,.3*.49 and init .343
    val ses = Seq(0.3 * 4, 0.3 * 0.7 * 3, 0.3 * 0.49 * 2, 0.343 * 1)
      .map(x => math.floor(x * 1e9 + 0.5)).sum / 1e9
    assert(r.getAs[Double]("ses_level") == math.floor(ses * 1e6 + 0.5) / 1e6)
    val theta = ses + 0.5 * (1.0 - math.pow(0.7, 4)) / 0.3
    assert(r.getAs[Double]("theta_forecast") == math.floor(theta * 1e6 + 0.5) / 1e6)
  }

  test("EventOps.ipsOffPolicy: greedy per-context replay value and uplift") {
    // ctx 0: A mean 1 (n 2), B mean 3 (n 1) -> best B; ctx 1: A 5
    val df = Seq(
      (0L, "A", 1.0), (0L, "A", 1.0), (0L, "B", 3.0),
      (1L, "A", 5.0)).toDF("ctx", "event_type", "value")
    val r = EventOps.ipsOffPolicy(df, sf.col("ctx")).head()
    assert(r.getAs[Long]("n_events") == 4L && r.getAs[Long]("n_contexts") == 2L)
    assert(r.getAs[Double]("v_logging") == 2.5)
    // V = (3*3 + 5*1)/4 = 3.5 (best-arm mean x context mass)
    assert(r.getAs[Double]("v_ips") == 3.5)
    assert(r.getAs[Double]("uplift") == 1.0)
  }

  test("EventOps.trackingSignal: hand errors 1, 2, -1") {
    def ts(h: Int, i: Int) = new java.sql.Timestamp(3600000L * h + i)
    val rows = (for (i <- 0 until 1) yield ("c", ts(0, i), 1.0)) ++
      (for (i <- 0 until 2) yield ("c", ts(1, i), 1.0)) ++
      (for (i <- 0 until 4) yield ("c", ts(2, i), 1.0)) ++
      (for (i <- 0 until 3) yield ("c", ts(3, i), 1.0))
    val r = EventOps.trackingSignal(rows.toDF("event_type", "ts", "value")).head()
    assert(r.getAs[Long]("n_errors") == 3L)
    assert(r.getAs[Long]("sum_error") == 2L)
    assert(r.getAs[Double]("mad") == 1.333333)
    assert(r.getAs[Double]("tracking_signal") == 1.5)
    assert(r.getAs[Double]("signed_error_share") == 0.333333)
  }

  test("StarSchema.skyline2D: staircase keeps undominated points and duplicates") {
    val df = Seq((1L, 1.0, 5.0), (2L, 2.0, 3.0), (3L, 3.0, 3.0),
      (4L, 2.0, 7.0), (5L, 0.0, 9.0), (6L, 2.0, 3.0))
      .toDF("id", "x", "y")
    val got = StarSchema.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    // (3,3) dominated by (2,3); (2,7) dominated at its own x;
    // the exact duplicate of (2,3) stays (no strict edge)
    assert(got == Set(5L, 1L, 2L, 6L), got.toString)
  }

  test("StarSchema.chainLadder: hand triangle, factor projects the young cohort") {
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    // Jan cohort ships 100 at age 0 and 50 at age 1 (f0 = 1.5);
    // Feb cohort has only age 0 (200) -> ultimate 300, reserve 100
    val df = Seq(
      (ts("2024-01-10"), ts("2024-01-15"), 100.0),
      (ts("2024-01-10"), ts("2024-02-15"), 50.0),
      (ts("2024-02-10"), ts("2024-02-20"), 200.0)).toDF("od", "sd", "amt")
    val got = StarSchema.chainLadder(df, "od", "sd", "amt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList
    val jan = (2024 - 1970) * 12 + 0
    assert(got == List(
      (jan.toLong, 1L, 150.0, 150.0, 0.0),
      (jan + 1L, 0L, 200.0, 300.0, 100.0)), got.toString)
  }

  test("StarSchema.chainLadder: fully-filtered input returns empty, not NPE") {
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    // all rows null-amount or age outside [0, maxAge]: zero cells
    // survive and the max-cohort aggregate is a NULL row
    val df = Seq(
      (ts("2024-01-10"), ts("2024-01-15"), Option.empty[Double]),
      (ts("2024-01-10"), ts("2023-06-15"), Some(50.0))).toDF("od", "sd", "amt")
    val got = StarSchema.chainLadder(df, "od", "sd", "amt")
    assert(got.columns.toList ==
      List("cohort_month", "latest_age", "observed", "ultimate", "reserve"))
    assert(got.count() == 0L)
  }

  test("StarSchema.kpiLmdi: contributions are additive to the revenue delta") {
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    val df = Seq(
      (ts("2024-01-01"), 1L, 100.0), (ts("2024-01-02"), 1L, 100.0),
      (ts("2024-03-01"), 1L, 150.0), (ts("2024-03-02"), 2L, 150.0))
      .toDF("od", "cust", "amt")
    val rows = StarSchema.kpiLmdi(df, "od", "cust", "amt").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getAs[Double]("contribution"))).toMap
    assert(rows("customers")._1 == 1.0 && rows("customers")._2 == 2.0)
    assert(rows("orders_per_customer")._1 == 2.0 &&
      rows("orders_per_customer")._2 == 1.0)
    // LMDI additivity: contributions sum to rb - ra = 100 (rounding only)
    val total = rows.values.map(_._3).sum
    assert(math.abs(total - 100.0) < 0.05, rows.toString)
    assert(rows("customers")._3 > 0 && rows("orders_per_customer")._3 < 0)
  }

  test("StarSchema.crostonForecast: hand-unrolled smoothing of sizes and gaps") {
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    // demand 2, 4, 6 on days 1, 4, 6: z = .1(6) + .1(.9*4) + .81*2 =
    // 2.58; gaps 3, 2: p = .1(2) + .9*3 = 2.9
    val df = Seq(
      (7L, ts("2024-01-01"), 2.0), (7L, ts("2024-01-04"), 4.0),
      (7L, ts("2024-01-06"), 6.0)).toDF("pk", "sd", "qty")
    val r = StarSchema.crostonForecast(df, "pk", "sd", "qty", alpha = 0.1).head()
    assert(r.getAs[Long]("n_demand_points") == 3L)
    assert(r.getAs[Double]("z_smooth") == 2.58, r.toString)
    assert(r.getAs[Double]("p_smooth") == 2.9, r.toString)
    assert(r.getAs[Double]("croston_forecast") == 0.889655)
    assert(r.getAs[Double]("sba_forecast") == 0.845172)
  }

  test("StarSchema.priceVolumeMix: three-way identity reconciles per group") {
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    // A: X 10 @ 2, Y 10 @ 4 (pbar = 3); B: X 20 @ 3, Y 5 @ 4
    val df = Seq(
      ("X", ts("2024-01-01"), 10.0, 20.0), ("Y", ts("2024-01-01"), 10.0, 40.0),
      ("X", ts("2024-03-01"), 20.0, 60.0), ("Y", ts("2024-03-01"), 5.0, 20.0))
      .toDF("brand", "sd", "qty", "amt")
    val got = StarSchema.priceVolumeMix(df, "brand", "sd", "qty", "amt")
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("price_effect"),
        r.getAs[Double]("volume_effect"), r.getAs[Double]("mix_effect"),
        r.getAs[Double]("delta_revenue"))).toMap
    assert(got("X") == ((20.0, 30.0, -10.0, 40.0)), got.toString)
    assert(got("Y") == ((0.0, -15.0, -5.0, -20.0)), got.toString)
    // identity: effects sum to the revenue delta exactly
    got.values.foreach { case (p, v, m, d) => assert(p + v + m == d) }
  }

  test("TextAnalysis.dialogProfile: turns, violations, role balance") {
    val df = Seq(
      ("s", "User: a\nAssistant: b\nUser: c\nUser: d\nplain tail"),
      ("s", "no roles in this one"),
      ("s", "User: lone role line")).toDF("source", "text")
    val r = TextAnalysis.dialogProfile(df, "source", "text").head()
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_dialog_docs") == 1L)
    assert(r.getAs[Double]("mean_turns") == 4.0)
    // one same-role adjacency (User,User) of three adjacent pairs
    assert(r.getAs[Double]("violation_share") == 0.333333)
    assert(r.getAs[Double]("user_assistant_ratio") == 3.0)
  }

  test("EventOps.erlangStaffing: offered load 2 erlangs, textbook P_wait") {
    // two users, each one 3600s session over a 3600s horizon:
    // lambda = 2/h, W = 3600s -> a = 2.0; Erlang C(3, 2) = 4/9
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(3600), 2L),
      (2L, ts(0), 3L), (2L, ts(3600), 4L)).toDF("user_id", "ts", "event_id")
    val rows = EventOps.erlangStaffing(df, gapSec = 7200)
      .collect().map(r => r.getAs[Long]("agents") ->
        (r.getAs[Double]("utilization"), r.getAs[Double]("p_wait"),
          r.getAs[Int]("meets_target"))).toMap
    assert(rows.keySet == (3L to 18L).toSet, rows.keySet.toString)
    assert(rows(4L)._1 == 0.5)
    assert(math.abs(rows(3L)._2 - 4.0 / 9) < 1e-5, rows(3L).toString)
    // P_wait is non-increasing in agents (the 1e-6 grid floors the
    // far tail to 0); the target is eventually met
    val ps = (3L to 18L).map(rows(_)._2)
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a }, ps.toString)
    assert(rows(3L)._3 == 0 && rows(18L)._3 == 1)
  }

  test("StarSchema.newsvendorStock: fractile 0.8 picks the 4th of 5 demand days") {
    val df = (1 to 5).map { d =>
      ("B1", java.sql.Timestamp.valueOf(f"2024-01-0$d%d 00:00:00"), d.toDouble)
    }.toDF("brand", "ship", "qty")
    val r = StarSchema.newsvendorStock(df, "brand", "ship", "qty",
      cu = 4.0, co = 1.0).head()
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Double]("mean_daily_demand") == 3.0)
    assert(r.getAs[Double]("critical_fractile") == 0.8)
    assert(r.getAs[Double]("stock_level") == 4.0)
    assert(r.getAs[Double]("achieved_service_level") == 0.8)
  }

  test("EventOps.bassDiffusion: 3-point exact quadratic, p*m recovers the intercept") {
    // first-seen adopters 4, 6, 2 in three consecutive weeks: the OLS
    // through 3 points is the exact quadratic; c < 0 so a root exists
    val wUs = 604800000000L
    def ts(week: Int, i: Int) =
      new java.sql.Timestamp((week * wUs + i * 1000000L) / 1000)
    val users = (1 to 4).map(u => (u.toLong, ts(100, u))) ++
      (5 to 10).map(u => (u.toLong, ts(101, u))) ++
      (11 to 12).map(u => (u.toLong, ts(102, u)))
    val df = users.toDF("user_id", "ts")
    val r = EventOps.bassDiffusion(df).head()
    assert(r.getAs[Long]("n_weeks") == 3L && r.getAs[Long]("n_adopters") == 12L)
    val (pv, qv, mv) = (r.getAs[Double]("p_innovation"),
      r.getAs[Double]("q_imitation"), r.getAs[Double]("m_market_size"))
    assert(pv > 0 && qv > 0 && mv > 10.0 && mv < 12.0, (pv, qv, mv).toString)
    // p = a/m with a = S(Y=0) = 4 exactly: p*m == 4 up to the 1e-6 grid
    assert(math.abs(pv * mv - 4.0) < 1e-4, (pv, mv).toString)
    assert(!r.isNullAt(r.fieldIndex("peak_week")))
  }

  test("Sketch.kmvSetOverlap: below-k sets are exact; estimates certified") {
    import graft.operators.Sketch
    val rows = ((1 to 10).map(i => ("A", i.toLong)) ++
      (6 to 15).map(i => ("B", i.toLong))).toDF("grp", "item")
    val r = Sketch.kmvSetOverlap(rows, "grp", "item", k = 64).head()
    // both sets have < k distinct values: the sketch IS the set and
    // every estimate equals its exact twin
    assert(r.getAs[String]("set_a") == "A" && r.getAs[String]("set_b") == "B")
    assert(r.getAs[Double]("est_distinct_a") == 10.0 &&
      r.getAs[Long]("exact_distinct_a") == 10L)
    assert(r.getAs[Double]("est_distinct_b") == 10.0)
    assert(r.getAs[Long]("exact_intersection") == 5L)
    assert(r.getAs[Double]("est_intersection") == 5.0)
    assert(r.getAs[Double]("est_jaccard") == r.getAs[Double]("exact_jaccard"))
  }

  test("Sketch.kmvSetOverlap: exact columns survive sampleHash collisions") {
    import graft.operators.Sketch
    // ids 1 and 1 + 2^31 are guaranteed sampleHash collisions (the
    // hash truncates mod 2^31 first). Exact columns must count RAW
    // items: A holds both colliding ids (2 distinct, not 1) and B
    // holds only the small one, so the true intersection is 1 even
    // though every hash in A matches a hash in B.
    val big = 1L + 2147483648L
    val rows = Seq(("A", 1L), ("A", big), ("A", 7L),
      ("B", 1L), ("B", 7L)).toDF("grp", "item")
    val r = Sketch.kmvSetOverlap(rows, "grp", "item", k = 64).head()
    assert(r.getAs[Long]("exact_distinct_a") == 3L, r.toString)
    assert(r.getAs[Long]("exact_distinct_b") == 2L)
    assert(r.getAs[Long]("exact_intersection") == 2L)
    // 2 shared of 3-distinct union
    assert(r.getAs[Double]("exact_jaccard") == 0.666667, r.toString)
  }

  test("Sketch.kmvSetOverlap: k-bounded estimates track exact on big sets") {
    import graft.operators.Sketch
    val rows = ((1 to 800).map(i => ("A", i.toLong)) ++
      (401 to 1200).map(i => ("B", i.toLong))).toDF("grp", "item")
    val r = Sketch.kmvSetOverlap(rows, "grp", "item", k = 64).head()
    assert(r.getAs[Long]("exact_distinct_a") == 800L)
    // KMV relative error ~ 1/sqrt(k) = 12.5%; allow 3x that
    def close(est: Double, exact: Double) =
      math.abs(est - exact) <= 0.375 * exact
    assert(close(r.getAs[Double]("est_distinct_a"), 800.0), r.toString)
    assert(close(r.getAs[Double]("est_distinct_b"), 800.0), r.toString)
    assert(close(r.getAs[Double]("est_intersection"),
      r.getAs[Long]("exact_intersection").toDouble), r.toString)
  }

  test("EventOps.concurrencyProfile: hand sweep, Little identity gap 0") {
    // user 1: one 600s session; user 2: one zero-duration session at
    // +300s. Levels: 1 across [0, 600) (the +-1 at 300 cancels) ->
    // l_time_avg 1.0; n=2, W=300s, lambda=12/h; littles = 1.0.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val df = Seq(
      (1L, ts(0), 10L), (1L, ts(600), 11L),
      (2L, ts(300), 20L)).toDF("user_id", "ts", "event_id")
    val r = EventOps.concurrencyProfile(df, gapSec = 3600).head()
    assert(r.getAs[Long]("n_sessions") == 2L)
    assert(r.getAs[Double]("horizon_s") == 600.0)
    assert(r.getAs[Double]("w_mean_s") == 300.0)
    assert(r.getAs[Double]("lambda_per_hour") == 12.0)
    assert(r.getAs[Double]("l_time_avg") == 1.0)
    assert(r.getAs[Double]("l_littles") == 1.0)
    assert(r.getAs[Double]("identity_gap") == 0.0)
    assert(r.getAs[Long]("l_max") == 1L && r.getAs[Long]("l_p95") == 1L)
  }

  test("EventOps.concurrencyProfile: overlapping sessions raise the peak") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    // three sessions: [0,400], [100,300], [200,600] -> peak 3 during
    // [200,300); p95 threshold 570s of 600 -> level 2 (cum time at
    // level<=1 is 300s, <=2 is 500s, <=3 is 600s)
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(400), 2L),
      (2L, ts(100), 3L), (2L, ts(300), 4L),
      (3L, ts(200), 5L), (3L, ts(600), 6L)).toDF("user_id", "ts", "event_id")
    val r = EventOps.concurrencyProfile(df, gapSec = 3600).head()
    assert(r.getAs[Long]("l_max") == 3L)
    assert(r.getAs[Long]("l_p95") == 3L)
    // time-average: (1*100 + 2*100 + 3*100 + 2*100 + 1*200)/600 = 1.666667
    assert(r.getAs[Double]("l_time_avg") == 1.666667, r.toString)
  }

  test("Recsys.bradleyTerry: transitive strengths from local duels") {
    // a beats b 3x, b beats c 3x, a beats c once: strength a > b > c
    val df = Seq(
      (1L, "a", 2.0), (1L, "b", 1.0),
      (2L, "a", 2.0), (2L, "b", 1.0),
      (3L, "a", 2.0), (3L, "b", 1.0),
      (4L, "b", 2.0), (4L, "c", 1.0),
      (5L, "b", 2.0), (5L, "c", 1.0),
      (6L, "b", 2.0), (6L, "c", 1.0),
      (7L, "a", 2.0), (7L, "c", 1.0)).toDF("contest", "entity", "score")
    val got = Recsys.bradleyTerry(df, "contest", "entity", "score")
      .collect().map(r => (r.getString(0), r.getAs[Long]("wins"),
        r.getAs[Long]("losses"), r.getAs[Double]("strength")))
    assert(got.map(_._1).toSeq == Seq("a", "b", "c"), got.mkString(";"))
    assert(got.map(x => (x._1, x._2, x._3)).toSet ==
      Set(("a", 4L, 0L), ("b", 3L, 3L), ("c", 0L, 4L)))
    val s = got.map(x => x._1 -> x._4).toMap
    assert(s("a") > s("b") && s("b") > s("c"), s.toString)
    // zero-win entity pins to 0; renormalized strengths average ~1
    assert(s("c") == 0.0)
    assert(math.abs(got.map(_._4).sum - 3.0) < 0.01, s.toString)
  }

  test("Recsys.bradleyTerry: ties contribute nothing; opponent strength counts") {
    // x and y both 2-1 against z, but x also beat y: x must rank above
    // y despite equal records vs z; the tied contest (8) is ignored
    val df = Seq(
      (1L, "x", 2.0), (1L, "z", 1.0),
      (2L, "x", 2.0), (2L, "z", 1.0),
      (3L, "z", 2.0), (3L, "x", 1.0),
      (4L, "y", 2.0), (4L, "z", 1.0),
      (5L, "y", 2.0), (5L, "z", 1.0),
      (6L, "z", 2.0), (6L, "y", 1.0),
      (7L, "x", 2.0), (7L, "y", 1.0),
      (8L, "x", 1.5), (8L, "y", 1.5)).toDF("contest", "entity", "score")
    val got = Recsys.bradleyTerry(df, "contest", "entity", "score")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(got("x") > got("y"), got.toString)
  }

  test("Recsys.popularityHitRate: hash split, top-N membership metrics") {
    def bucket(b: Long) = ((b % 2147483648L) * 2654435761L) % 4294967296L % 10000
    // basket 7 hashes into the 20% test fold; 1-4 train
    assert(bucket(7L) < 2000 && Seq(1L, 2L, 3L, 4L).forall(bucket(_) >= 2000))
    val df = Seq((1L, 101L), (1L, 102L), (2L, 101L), (2L, 103L),
      (3L, 101L), (4L, 102L), (7L, 101L), (7L, 104L))
      .toDF("l_orderkey", "l_partkey")
    val r = Recsys.popularityHitRate(df, "l_orderkey", "l_partkey", topN = 2)
      .head()
    // train counts: 101 x3, 102 x2, 103 x1 -> top2 {101, 102}
    assert(r.getAs[Long]("n_train_baskets") == 4 &&
      r.getAs[Long]("n_test_baskets") == 1 && r.getAs[Int]("top_n") == 2 &&
      r.getAs[Double]("item_hit_rate") == 0.5 &&
      r.getAs[Double]("basket_hit_rate") == 1.0, r.toString)
  }

  test("Recsys.coPurchaseHitRate: neighbor-list hits on held-out baskets") {
    val df = Seq((1L, 201L), (1L, 202L), (2L, 201L), (2L, 202L),
      (3L, 201L), (3L, 203L), (7L, 201L), (7L, 202L), (7L, 204L))
      .toDF("l_orderkey", "l_partkey")
    val r = Recsys.coPurchaseHitRate(df, "l_orderkey", "l_partkey").head()
    // train pair (201, 202) survives minPairCount 2; (201, 203) drops.
    // test basket 7: (7,201) hits via 202, (7,202) via 201, (7,204) no
    assert(r.getAs[Long]("n_train_pairs") == 1 &&
      r.getAs[Long]("n_candidates") == 3 && r.getAs[Long]("n_hits") == 2 &&
      r.getAs[Double]("hit_rate") ==
        math.floor(2.0 / 3 * 1e6 + 0.5) / 1e6, r.toString)
  }

  test("EventOps.tenureHazard: reverse at-risk, final-week censoring") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-15 10:00:00"), // tenure 2
      (2L, "2024-01-01 10:00:00"),                              // tenure 0
      (3L, "2024-01-01 10:00:00"), (3L, "2024-01-22 10:00:00")) // 3, censored
      .toDF("user_id", "ts_s")
      .select(sf.col("user_id"), sf.col("ts_s").cast("timestamp").as("ts"))
    val got = EventOps.tenureHazard(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      (0L, 3L, 1L, 0L, math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6),
      (2L, 2L, 1L, 0L, 0.5),
      (3L, 1L, 0L, 1L, 0.0)), got.toString)
  }

  test("TextAnalysis.boilerplateLines: df census, short lines drop") {
    val df = Seq(
      (1L, "s1", "Hello world line\nCommon footer line here"),
      (2L, "s2", "Other text body\nCommon footer line here"),
      (3L, "s1", "short\nxy")) // both lines under 10 chars: dropped
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.boilerplateLines(df, "doc_id", "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      ("Common footer line here", 2L, 2L, 2L),
      ("Hello world line", 1L, 1L, 1L),
      ("Other text body", 1L, 1L, 1L)), got.toString)
  }

  test("EventOps.transitionLatency: exact gap seconds per edge") {
    val df = Seq((1L, "2024-01-01 10:00:00", "a"),
      (2L, "2024-01-01 10:00:30", "b"), (3L, "2024-01-01 10:01:30", "b"))
      .toDF("event_id", "ts_s", "event_type")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.lit(1L).as("user_id"), sf.col("event_type"))
    val got = EventOps.transitionLatency(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(("a", "b", 1L, 30L, 30L, 30.0),
      ("b", "b", 1L, 60L, 60L, 60.0)), got.toString)
  }

  test("StarSchema.segmentMigration: churn and acquisition are cells") {
    val df = Seq(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-01", 30.0), (4L, "2024-01-01", 40.0),
      (3L, "2024-01-20", 5.0), (5L, "2024-01-20", 50.0))
      .toDF("o_custkey", "od", "o_totalprice")
      .select(sf.col("o_custkey"), sf.col("od").cast("date").as("o_orderdate"),
        sf.col("o_totalprice"))
    val got = StarSchema.segmentMigration(df, nSegments = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    // h1 segs: {1,2}->1, {3,4}->2; h2: 3->1, 5->2
    assert(got == Seq(
      (0, 2, 1L, 1.0),   // cust 5: new whale
      (1, 0, 2L, 1.0),   // custs 1,2: churned
      (2, 0, 1L, 0.5),   // cust 4: churned whale
      (2, 1, 1L, 0.5)),  // cust 3: slid
      got.toString)
  }

  test("Recsys.itemSimilarity: integer-decided ranks, exact cosine") {
    val df = Seq((1L, 11L), (1L, 12L), (2L, 11L), (2L, 12L), (3L, 11L),
      (3L, 12L), (4L, 11L), (4L, 13L), (5L, 11L), (5L, 13L), (6L, 12L),
      (6L, 13L)).toDF("l_orderkey", "l_partkey")
    val got = Recsys.itemSimilarity(df, "l_orderkey", "l_partkey",
      k = 5, minPairCount = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // pairs: (11,12) x3, (11,13) x2; (12,13) x1 drops. margins 5/4/3
    def cos(c: Long, ma: Long, mb: Long) =
      math.floor(c / math.sqrt(ma.toDouble * mb) * 1e6 + 0.5) / 1e6
    assert(got == Seq(
      (11L, 1, 12L, 3L, cos(3, 5, 4)), (11L, 2, 13L, 2L, cos(2, 5, 3)),
      (12L, 1, 11L, 3L, cos(3, 4, 5)), (13L, 1, 11L, 2L, cos(2, 3, 5))),
      got.toString)
  }

  test("StarSchema.repeatRevenueSplit: first-month dollars are new") {
    val df = Seq((1L, "2024-01-05", 100.0), (1L, "2024-02-10", 50.0),
      (2L, "2024-02-15", 70.0))
      .toDF("o_custkey", "od", "o_totalprice")
      .select(sf.col("o_custkey"), sf.col("od").cast("date").as("o_orderdate"),
        sf.col("o_totalprice"))
    val got = StarSchema.repeatRevenueSplit(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("2024-01", 1L, 100.0, 100.0, 0.0, 0.0),
      ("2024-02", 2L, 120.0, 70.0, 50.0,
        math.floor(50.0 / 120 * 1e6 + 0.5) / 1e6)), got.toString)
  }

  test("Similarity.meanDotMatrix: pair-free within/between exact dots") {
    val df = Seq((1L, Array(1.0f, 0.0f), "a"), (2L, Array(3.0f, 0.0f), "a"),
      (3L, Array(0.0f, 2.0f), "b"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.meanDotMatrix(df, "label", "embedding").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val aa = got(("a", "a")) // <(1,0),(3,0)> = 3, self-pairs excluded
    assert(aa.getAs[Long]("n_a") == 2 && aa.getAs[Double]("mean_dot") == 3.0,
      aa.toString)
    assert(got(("a", "b")).getAs[Double]("mean_dot") == 0.0)
    val bb = got(("b", "b")) // n = 1: undefined
    assert(bb.isNullAt(bb.fieldIndex("mean_dot")), bb.toString)
  }

  test("EventOps.activityGini: rank-sum identity, equal counts = 0") {
    var id = 0L
    def ev(u: Long, t: String, n: Int) = Seq.fill(n) { id += 1; (id, u, t) }
    val rows = ev(1, "a", 1) ++ ev(2, "a", 1) ++ ev(3, "a", 2) ++
      ev(4, "b", 5) ++ ev(5, "c", 2) ++ ev(6, "c", 2)
    val df = rows.toDF("event_id", "user_id", "event_type")
      .select(sf.col("event_id"),
        sf.lit("2024-01-01 10:00:00").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"))
    val got = EventOps.activityGini(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // a: counts (1,1,2): G = (2*9 - 4*4)/(3*4) = 1/6
    val a = got("a")
    assert(a.getAs[Long]("n_users") == 3 && a.getAs[Long]("total_events") == 4
      && a.getAs[Double]("gini") == math.floor(1.0 / 6 * 1e6 + 0.5) / 1e6,
      a.toString)
    assert(got("b").isNullAt(got("b").fieldIndex("gini"))) // n = 1
    assert(got("c").getAs[Double]("gini") == 0.0) // perfectly even
  }

  test("EventOps.touchDepthConversion: depth table, purchase-only is depth 0") {
    val df = Seq((1L, "click"), (1L, "purchase"), (2L, "click"),
      (3L, "purchase"), (4L, "click"), (4L, "view"))
      .toDF("user_id", "event_type")
    val got = EventOps.touchDepthConversion(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((0L, 1L, 1L, 1.0), (1L, 2L, 1L, 0.5),
      (2L, 1L, 0L, 0.0)), got.toString)
  }

  test("QualityChecks.sketchQuantileAudit: exact at high accuracy, bounded low") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val hi = QualityChecks.sketchQuantileAudit(df, "v").collect()
    assert(hi.length == 9)
    hi.foreach { r =>
      assert(r.getAs[Double]("exact_q") == r.getInt(0) * 10.0 &&
        r.getAs[Double]("abs_err") == 0.0, r.toString)
    }
    val lo = QualityChecks.sketchQuantileAudit(df, "v", accuracy = 100)
      .collect()
    lo.foreach(r => assert(r.getAs[Double]("abs_err") <= 1.0, r.toString))
  }

  test("EventOps.sbgRetention: JVM twin of the linear fit, gap in grid") {
    val durations = (Seq.fill(5)(0L) ++ Seq.fill(3)(1L) ++ Seq.fill(2)(2L) ++
      Seq(4L)).toDF("duration") // gap at 3: dense grid must carry it
    val got = EventOps.sbgRetention(durations, "duration").collect()
      .map(r => r.getLong(0) -> r).toMap
    // twin: ns = 11,6,3,1,1
    val ns = Map(0L -> 11L, 1L -> 6L, 2L -> 3L, 3L -> 1L, 4L -> 1L)
    val pts = (1 to 4).map { t =>
      val r9 = math.floor(ns(t).toDouble / ns(t - 1) * 1e9 + 0.5).toLong
      (r9, (t - 1).toLong * (r9 - 1000000000L))
    }
    val m = pts.size
    val (sx, sy) = (pts.map(p => BigInt(p._1)).sum, pts.map(p => BigInt(p._2)).sum)
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val det = (BigInt(m) * sxx - sx * sx).toDouble
    val a = (BigInt(m) * sxy - sx * sy).toDouble / det
    val b = (a * sx.toDouble - sy.toDouble) / m / 1e9
    assert(b > 0 && a - b > 0) // the staged data must exercise the fit
    assert(got(0L).getAs[Long]("n_surviving") == 11 &&
      got(3L).getAs[Long]("n_surviving") == 1, got(3L).toString)
    assert(got(0L).getAs[Double]("alpha") ==
      math.floor((a - b) * 1e6 + 0.5) / 1e6, got(0L).toString)
    var c9 = 0L
    (1 to 4).foreach { t =>
      c9 += math.floor((math.log(b + t - 1) - math.log(a + t - 1)) * 1e9 + 0.5)
        .toLong
      assert(got(t.toLong).getAs[Double]("projected_survival") ==
        math.floor(math.exp(c9.toDouble / 1e9) * 1e6 + 0.5) / 1e6,
        got(t.toLong).toString)
    }
    // all-zero durations: no ratio points, NULL fit
    val dg = EventOps.sbgRetention(
      Seq(0L, 0L).toDF("duration"), "duration").head()
    assert(dg.isNullAt(dg.fieldIndex("projected_survival")), dg.toString)
  }

  test("StarSchema.basketSizeFit: ZTP shares from the JVM twin") {
    val df = Seq((1L, 1), (2L, 1), (3L, 2), (4L, 3)).flatMap { case (o, k) =>
      Seq.fill(k)((o, 1)) }.toDF("l_orderkey", "x")
    val got = StarSchema.basketSizeFit(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val lambda = 7.0 / 4
    val lnl = math.log(lambda)
    val lnden = math.log(math.exp(lambda) - 1.0)
    var lf9 = 0L
    (1 to 3).foreach { k =>
      lf9 += math.floor(math.log(k.toDouble) * 1e9 + 0.5).toLong
      val want = math.floor(
        math.exp(k * lnl - lf9.toDouble / 1e9 - lnden) * 1e6 + 0.5) / 1e6
      assert(got(k.toLong).getAs[Double]("ztp_share") == want,
        got(k.toLong).toString)
    }
    assert(got(1L).getAs[Double]("share") == 0.5 &&
      got(2L).getAs[Double]("share") == 0.25, got(1L).toString)
  }

  test("EventOps.monthlyBalances: carry-forward, late joiner, tiebreak") {
    val df = Seq(
      (1L, "2024-01-10 00:00:00", 1L, 99.0),  // superseded same month
      (2L, "2024-01-20 00:00:00", 1L, 10.0),  // u1 Jan closing
      (3L, "2024-03-05 00:00:00", 1L, 20.0),  // u1 Mar (Feb carried 10)
      (4L, "2024-02-15 00:00:00", 2L, 5.0),   // u2 joins in Feb
      (5L, "2024-02-15 00:00:00", 2L, 7.0))   // same ts: larger id wins
      .toDF("event_id", "ts_s", "user_id", "value")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("value"))
    val got = EventOps.monthlyBalances(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      ("2024-01", 1L, 10.0, 10.0),
      ("2024-02", 2L, 17.0, 8.5),   // u1 carries 10, u2 closes at 7
      ("2024-03", 2L, 27.0, 13.5)), got.toString)
  }

  test("QualityChecks.candidateKeys: singles and pairs, null sentinel") {
    val df = Seq((1L, "a", Some("x")), (2L, "a", None), (3L, "b", None))
      .toDF("id", "v", "n")
    val got = QualityChecks.candidateKeys(df, Seq("id", "v", "n")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(got("id") == ((3L, true)) && got("v") == ((2L, false)) &&
      got("n") == ((2L, false)), got.toString)
    assert(got("id,v") == ((3L, true)) && got("id,n") == ((3L, true)))
    assert(got("v,n") == ((3L, true))) // (a,x),(a,NULL),(b,NULL) distinct
    assert(got.size == 6)
    intercept[IllegalArgumentException] {
      QualityChecks.candidateKeys(df, Seq("id", "id"))
    }
  }

  test("QualityChecks.gesdOutliers: remove-and-retest order, exhausted NULL") {
    val df = (Seq.fill(4)(("a", 1.0)) ++ Seq(("a", 100.0), ("a", 50.0)))
      .toDF("g", "v")
    val got = QualityChecks.gesdOutliers(df, "g", "v", rounds = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    // round 1 removes 100 (n=6), round 2 removes 50 (n=5), round 3
    // sees a constant set (n=4): removal still reported, R NULL
    assert(got.map(x => (x._1, x._2, x._3)) ==
      Seq((1L, 6L, 100.0), (2L, 5L, 50.0), (3L, 4L, 1.0)), got.toString)
    assert(got(0)._4.isDefined && got(1)._4.isDefined && got(2)._4.isEmpty)
    // tied duplicates leave ONE at a time
    val dup = (Seq.fill(3)(("b", 5.0)) ++ Seq.fill(2)(("b", 9.0))).toDF("g", "v")
    val g2 = QualityChecks.gesdOutliers(dup, "g", "v", rounds = 2).collect()
    assert(g2.map(_.getDouble(3)).toSeq == Seq(9.0, 9.0) &&
      g2.map(_.getLong(2)).toSeq == Seq(5L, 4L), g2.mkString(";"))
  }

  test("EventOps.interarrivalExpFit: hand KS vs Exp, degenerate type drops") {
    val df = Seq(
      (1L, 0L, 1L, "a", 1.0), (2L, 1L, 1L, "a", 1.0), (3L, 3L, 1L, "a", 1.0),
      (4L, 10L, 2L, "z", 1.0), (5L, 10L, 2L, "z", 1.0)) // zero gap -> sg=0
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"), sf.col("value"))
    val got = EventOps.interarrivalExpFit(df).collect()
    assert(got.length == 1 && got(0).getAs[String]("event_type") == "a")
    val r = got(0)
    // gaps 1s, 2s: mean 1.5, lambda 2400/h, D = 1 - exp(-2/3) at g = 1s
    assert(r.getAs[Long]("n_gaps") == 2L)
    assert(r.getAs[Double]("mean_gap_sec") == 1.5)
    assert(r.getAs[Double]("lambda_per_hour") == 2400.0)
    assert(math.abs(r.getAs[Double]("ks_stat") -
      (1.0 - math.exp(-2.0 / 3))) < 2e-6, r.toString)
    assert(r.getAs[Double]("ks_at_sec") == 1.0)
  }

  test("Geo.moransI: clustered 1, checkerboard -1, isolated in n only") {
    // two tight clusters with matching values: perfect autocorrelation
    val clustered = Seq((1L, 0.0, 0.0, 1.0), (2L, 0.0, 1.0, 1.0),
      (3L, 0.0, 10.0, 5.0), (4L, 0.0, 11.0, 5.0))
      .toDF("id", "lat", "lon", "x")
    val rc = Geo.moransI(clustered, "id", "lat", "lon", "x", radiusDeg = 2.0)
      .head()
    assert(rc.getAs[Long]("n_points") == 4 &&
      rc.getAs[Long]("n_neighbor_pairs") == 2, rc.toString)
    assert(rc.getAs[Double]("morans_i") == 1.0, rc.toString)
    assert(rc.getAs[Double]("expected_i") == -0.333333, rc.toString)
    // one adjacent opposite-value pair: perfect negative
    val alt = Seq((1L, 0.0, 0.0, 1.0), (2L, 0.0, 1.0, 5.0))
      .toDF("id", "lat", "lon", "x")
    val ra = Geo.moransI(alt, "id", "lat", "lon", "x", radiusDeg = 2.0).head()
    assert(ra.getAs[Double]("morans_i") == -1.0 &&
      ra.getAs[Double]("expected_i") == -1.0, ra.toString)
    // no neighbors: NULL I, n still counted
    val iso = Seq((1L, 0.0, 0.0, 1.0), (2L, 0.0, 50.0, 5.0))
      .toDF("id", "lat", "lon", "x")
    val ri = Geo.moransI(iso, "id", "lat", "lon", "x", radiusDeg = 2.0).head()
    assert(ri.getAs[Long]("n_points") == 2 &&
      ri.getAs[Long]("n_neighbor_pairs") == 0 &&
      ri.isNullAt(ri.fieldIndex("morans_i")), ri.toString)
  }

  test("QualityChecks.bowkerSymmetry: hand chi2, symmetric zero, df count") {
    val df = (Seq.fill(3)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(2)(("a", "a"))).toDF("r1", "r2")
    val r = QualityChecks.bowkerSymmetry(df, "r1", "r2").head()
    // pair {a,b}: (3-1)^2/(3+1) = 1.0, one nonzero discordant pair
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("n_categories") == 2 &&
      r.getAs[Long]("df") == 1 && r.getAs[Double]("bowker_chi2") == 1.0,
      r.toString)
    // balanced migration: chi2 exactly 0
    val bal = (Seq.fill(2)(("a", "b")) ++ Seq.fill(2)(("b", "a"))).toDF("r1", "r2")
    assert(QualityChecks.bowkerSymmetry(bal, "r1", "r2").head()
      .getAs[Double]("bowker_chi2") == 0.0)
  }

  test("QualityChecks.kendallW: perfect concordance 1, reversal 0") {
    val same = Seq(("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 10.0), ("b2", "t2", 20.0), ("b2", "t3", 30.0))
      .toDF("b", "t", "v")
    val rs = QualityChecks.kendallW(same, "b", "t", "v").head()
    assert(rs.getAs[Long]("n_blocks") == 2 &&
      rs.getAs[Double]("kendall_w") == 1.0 &&
      rs.getAs[Double]("mean_spearman_rho") == 1.0, rs.toString)
    val rev = Seq(("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 3.0), ("b2", "t2", 2.0), ("b2", "t3", 1.0))
      .toDF("b", "t", "v")
    val rr = QualityChecks.kendallW(rev, "b", "t", "v").head()
    assert(rr.getAs[Double]("kendall_w") == 0.0 &&
      rr.getAs[Double]("mean_spearman_rho") == -1.0, rr.toString)
  }

  test("TextAnalysis.unicodeAudit: hand densities over staged damage") {
    val df = Seq(("s", "ab"), ("s", "a\u0301\u200B\u0001\u00e9"))
      .toDF("source", "text")
    val r = TextAnalysis.unicodeAudit(df, "source", "text").head()
    // 7 chars, 11 utf-8 bytes; one of each damage class
    assert(r.getAs[Long]("n_docs") == 2 && r.getAs[Long]("n_chars") == 7)
    assert(r.getAs[Double]("bytes_per_char") ==
      math.floor(11.0 / 7 * 1e6 + 0.5) / 1e6, r.toString)
    val d10k = math.floor(1e4 / 7 * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("combining_per_10k") == d10k &&
      r.getAs[Double]("zero_width_per_10k") == d10k &&
      r.getAs[Double]("control_per_10k") == d10k, r.toString)
  }

  test("TextAnalysis.markdownProfile: structure counts, code verdict") {
    val md = "# T\n- a\n- b\n```x{;}```\n[l](u) text"
    val df = Seq((1L, md), (2L, "plain prose with no structure"),
      (3L, "aaaa{;}")).toDF("doc_id", "text")
    val got = TextAnalysis.markdownProfile(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val m = got(1L)
    assert(m.getAs[Long]("n_headers") == 1 && m.getAs[Long]("n_fence_marks") == 2
      && m.getAs[Long]("n_list_items") == 2 && m.getAs[Long]("n_links") == 1
      && m.getAs[Boolean]("looks_like_code"), m.toString)
    val p = got(2L)
    assert(p.getAs[Long]("n_headers") == 0 && !p.getAs[Boolean]("looks_like_code"))
    // density rule: 3 punct in 7 chars > 2%
    assert(got(3L).getAs[Boolean]("looks_like_code"), got(3L).toString)
  }

  test("EventOps.runsUpDown: hand runs, ties dropped, z zero at expectation") {
    val df = hourlyCounts(Seq("r" -> Array(1L, 2L, 1L, 2L, 2L, 3L)))
    val r = EventOps.runsUpDown(df).head()
    // diffs +,-,+,0,+ -> nonzero m=4, runs 3 = E[R] -> z = 0
    assert(r.getAs[Long]("n_diffs") == 4 && r.getAs[Long]("n_runs") == 3,
      r.toString)
    assert(r.getAs[Double]("expected_runs") == 3.0 && r.getAs[Double]("z") == 0.0)
  }

  test("QualityChecks.partialCorrelation: additive recovery, collinear NULL") {
    val df = Seq((11.0, 1.0, 10.0), (21.0, 1.0, 20.0),
      (12.0, 2.0, 10.0), (22.0, 2.0, 20.0)).toDF("x", "y", "z")
    val r = QualityChecks.partialCorrelation(df, "x", "y", "z").head()
    // x = y + z with y orthogonal to z: controlling z makes x track y exactly
    assert(r.getAs[Double]("r_yz") == 0.0, r.toString)
    assert(r.getAs[Double]("partial_r_xy_given_z") == 1.0, r.toString)
    // y == z: |r_yz| = 1 -> NULL partial, raw correlations still report
    val col = Seq((1.0, 1.0, 1.0), (2.0, 3.0, 3.0), (3.0, 2.0, 2.0))
      .toDF("x", "y", "z")
    val rc = QualityChecks.partialCorrelation(col, "x", "y", "z").head()
    assert(rc.getAs[Double]("r_yz") == 1.0 &&
      rc.isNullAt(rc.fieldIndex("partial_r_xy_given_z")), rc.toString)
  }

  test("Sampling.neymanAllocation: variable stratum takes the budget") {
    val df = (Seq.fill(4)(("a", 0.0)) ++ Seq(("b", 0.0), ("b", 200.0)))
      .toDF("src", "v")
    val got = Sampling.neymanAllocation(df, "src", "v", budget = 1000L)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    // constant stratum: sd 0 -> zero Neyman budget despite 2x the rows
    assert(a.getAs[Long]("n_rows") == 4 && a.getAs[Double]("stratum_sd") == 0.0
      && a.getAs[Double]("neyman_share") == 0.0 &&
      a.getAs[Long]("n_neyman") == 0L, a.toString)
    assert(a.getAs[Long]("n_prop") == 666L)
    val b = got("b")
    // {0, 200}: population sd = 100
    assert(b.getAs[Double]("stratum_sd") == 100.0 &&
      b.getAs[Double]("neyman_share") == 1.0 &&
      b.getAs[Long]("n_neyman") == 1000L, b.toString)
  }

  test("QualityChecks.logLogElasticity: recovers y = 2 x^3") {
    val xs = Seq(math.E, math.E * math.E, math.E * math.E * math.E)
    val df = xs.map(x => ("g", 2.0 * x * x * x, x)).toDF("g", "y", "x")
    val r = QualityChecks.logLogElasticity(df, "g", "y", "x").head()
    assert(math.abs(r.getAs[Double]("elasticity") - 3.0) < 1e-4, r.toString)
    assert(math.abs(r.getAs[Double]("intercept") - 2.0) < 1e-3, r.toString)
    assert(r.getAs[Double]("r2") >= 0.999999, r.toString)
    // non-positive values drop; constant x -> NULL
    val const = Seq(("g", 1.0, 5.0), ("g", 2.0, 5.0), ("g", 3.0, 5.0))
      .toDF("g", "y", "x")
    val rcst = QualityChecks.logLogElasticity(const, "g", "y", "x").head()
    assert(rcst.isNullAt(rcst.fieldIndex("elasticity")), rcst.toString)
  }

  test("EventOps.gumbelBlockMaxima: two-block hand moments") {
    val day1 = Array.fill(24)(1L); day1(3) = 5L
    val day2 = Array.fill(24)(1L); day2(6) = 9L
    val df = hourlyCounts(Seq("g" -> (day1 ++ day2)))
    val r = EventOps.gumbelBlockMaxima(df).head()
    // maxima {5, 9}: mean 7, population sd 2
    val beta = 2.0 * (math.sqrt(6.0) / math.Pi)
    val mu = 7.0 - 0.5772156649015329 * beta
    def snap6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Long]("n_blocks") == 2 &&
      r.getAs[Double]("mean_block_max") == 7.0, r.toString)
    assert(r.getAs[Double]("gumbel_beta") == snap6(beta), r.toString)
    assert(r.getAs[Double]("gumbel_mu") == snap6(mu), r.toString)
    assert(r.getAs[Double]("return_level_30") ==
      snap6(mu - beta * math.log(-math.log(1.0 - 1.0 / 30))), r.toString)
  }

  test("EventOps.sessionStats: bounce rate and per-user rollups") {
    val df = Seq(
      (1L, 0L, 1L, "view", 1.0), (2L, 10L, 1L, "view", 1.0), // session 1
      (3L, 4000L, 1L, "view", 1.0),                          // session 2: bounce
      (4L, 0L, 2L, "view", 1.0))                             // session 3: bounce
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"), sf.col("value"))
    val r = EventOps.sessionStats(df).head()
    assert(r.getAs[Long]("n_sessions") == 3 && r.getAs[Long]("n_users") == 2 &&
      r.getAs[Long]("n_bounces") == 2, r.toString)
    assert(r.getAs[Double]("bounce_rate") == 0.666667 &&
      r.getAs[Double]("avg_events_per_session") == 1.333333 &&
      r.getAs[Double]("avg_duration_sec") == 3.333333 &&
      r.getAs[Double]("sessions_per_user") == 1.5, r.toString)
  }

  test("Graph.eccentricity: path worst-case distances, horizon truncation") {
    val path = Seq((1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L),
      (3L, 30L), (3L, 40L)).toDF("basket", "item")
    val r3 = Graph.eccentricity(path, "basket", "item",
        item => item === 10L || item === 40L, minPairCount = 1, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r3 == Seq((10L, 3L, 3L), (40L, 3L, 3L)), r3.toString)
    val r2 = Graph.eccentricity(path, "basket", "item",
        item => item === 10L, minPairCount = 1, rounds = 2).head()
    assert(r2.getAs[Long]("n_reached") == 2 &&
      r2.getAs[Long]("eccentricity") == 2, r2.toString)
  }

  test("EventOps.regressionInfluence: perfect fit NULLs, outlier dominates") {
    val perfect = hourlyCounts(Seq("p" -> Array(1L, 2L, 3L, 4L)))
    val gp = EventOps.regressionInfluence(perfect).collect()
    assert(gp.length == 4)
    gp.foreach { r =>
      assert(r.getAs[Double]("residual") == 0.0 &&
        r.isNullAt(r.fieldIndex("cooks_d")), r.toString) // SSE = 0
    }
    val out = hourlyCounts(Seq("o" -> Array(1L, 2L, 3L, 10L)))
    val go = EventOps.regressionInfluence(out).collect()
    val maxCook = go.maxBy(r => r.getAs[Double]("cooks_d"))
    assert(maxCook.getAs[Long]("bin") == go.map(_.getAs[Long]("bin")).max,
      go.mkString(";")) // the spike carries the largest influence
  }

  test("EventOps.breuschPagan: homoscedastic NULL, fanning detected") {
    val flat = hourlyCounts(Seq("f" -> Array(1L, 2L, 3L, 4L)))
    val rf = EventOps.breuschPagan(flat).head()
    assert(rf.isNullAt(rf.fieldIndex("bp_stat")), rf.toString) // zero residuals
    val fan = hourlyCounts(Seq("v" ->
      Array(3L, 3L, 4L, 2L, 5L, 1L, 6L, 0L))) // growing swings, flat mean
    val rv = EventOps.breuschPagan(fan).head()
    assert(!rv.isNullAt(rv.fieldIndex("bp_stat")) &&
      rv.getAs[Double]("bp_stat") > 0.0 &&
      rv.getAs[Double]("aux_slope") > 0.0, rv.toString)
  }

  test("EventOps.seasonalMannKendall: within-stratum trend, cycle removed") {
    // season 2: even bins ramp 1,2,3; odd bins ramp 10,20,30
    val df = hourlyCounts(Seq("s" -> Array(1L, 10L, 2L, 20L, 3L, 30L)))
    val r = EventOps.seasonalMannKendall(df, season = 2).head()
    assert(r.getAs[Long]("s_stat") == 6 && r.getAs[Long]("n_seasons") == 2,
      r.toString)
    // var18 = 2 * (3*2*11 - 0) = 132
    val z = math.floor((6.0 - 1.0) / math.sqrt(132.0 / 18.0) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("z") == z, r.toString)
    // pure cycle: no within-stratum movement -> S = 0, z = 0
    val cyc = hourlyCounts(Seq("c" -> Array(1L, 10L, 1L, 10L, 1L, 10L)))
    val rc = EventOps.seasonalMannKendall(cyc, season = 2).head()
    assert(rc.getAs[Long]("s_stat") == 0 && rc.getAs[Double]("z") == 0.0,
      rc.toString)
  }

  test("StarSchema.priceIndices: hand L/P/F, unmatched items drop") {
    val df = Seq(
      (1L, 10L, 10.0, 10.0), (1L, 90L, 1.0, 2.0),   // unit 1 -> 2
      (2L, 10L, 1.0, 1.0), (2L, 90L, 10.0, 10.0),   // unit 1 -> 1
      (3L, 10L, 1.0, 5.0))                          // period-1 only: drops
      .toDF("item", "ts_s", "qty", "amt")
      .select(sf.col("item"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("qty"), sf.col("amt"))
    val r = StarSchema.priceIndices(df, "item", "ts", "qty", "amt").head()
    assert(r.getAs[Long]("n_matched_items") == 2, r.toString)
    // L = (2*10 + 1*1)/(1*10 + 1*1) = 21/11; P = (2*1 + 1*10)/11 = 12/11
    assert(r.getAs[Double]("laspeyres") ==
      math.floor(21.0 / 11 * 1e6 + 0.5) / 1e6, r.toString)
    assert(r.getAs[Double]("paasche") ==
      math.floor(12.0 / 11 * 1e6 + 0.5) / 1e6, r.toString)
    assert(math.abs(r.getAs[Double]("fisher") -
      math.sqrt(252.0 / 121)) < 2e-6, r.toString)
  }

  test("EventOps.negativeBinomialFit: hand moments, underdispersed NULL") {
    val df = hourlyCounts(Seq(
      "n" -> Array(0L, 1L, 5L), // mean 2, var 14/3 > mean
      "x" -> Array(2L, 2L, 2L))) // constant: var 0 -> no NB
    val got = EventOps.negativeBinomialFit(df).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val n = got("n")
    assert(n.getAs[Double]("mean") == 2.0 &&
      math.abs(n.getAs[Double]("variance") - 14.0 / 3) < 2e-6, n.toString)
    assert(math.abs(n.getAs[Double]("nb_r") - 4.0 / (14.0 / 3 - 2)) < 2e-6)
    assert(math.abs(n.getAs[Double]("nb_p") - 2.0 / (14.0 / 3)) < 2e-6)
    assert(n.getAs[Double]("zero_frac_observed") == 0.333333)
    val p0 = math.pow(2.0 / (14.0 / 3), 4.0 / (14.0 / 3 - 2))
    assert(math.abs(n.getAs[Double]("zero_frac_nb") - p0) < 1e-5, n.toString)
    val x = got("x")
    assert(x.getAs[Double]("variance") == 0.0 &&
      x.isNullAt(x.fieldIndex("nb_r")), x.toString)
  }

  test("QualityChecks.hashUniformityCvm: hand W2 over four known buckets") {
    val df = Seq(0L, 1L, 2L, 3L, 1L).toDF("user_id") // dup key dedups
    val r = QualityChecks.hashUniformityCvm(df, "user_id").head()
    assert(r.getAs[Long]("n_keys") == 4, r.toString)
    def bucket(k: Long) = ((k % 2147483648L) * 2654435761L) % 4294967296L % 10000
    val us = Seq(0L, 1L, 2L, 3L).map(k => (2 * bucket(k) + 1) / 20000.0).sorted
    val expected = 1.0 / 48 +
      us.zipWithIndex.map { case (u, i) =>
        val d = u - (2 * i + 1) / 8.0; d * d }.sum
    assert(math.abs(r.getAs[Double]("cvm_w2") - expected) < 1e-8,
      s"${r.getAs[Double]("cvm_w2")} vs $expected")
  }

  test("QualityChecks.simpsonsParadox: reversal fires, aligned does not") {
    def rows(s: String, t: Boolean, o: Boolean, k: Int) =
      Seq.fill(k)((s, t, o))
    val df = (rows("s1", true, true, 1) ++ rows("s1", true, false, 9) ++
      rows("s1", false, true, 3) ++ rows("s1", false, false, 17) ++
      rows("s2", true, true, 60) ++ rows("s2", true, false, 20) ++
      rows("s2", false, true, 8) ++ rows("s2", false, false, 2))
      .toDF("st", "t", "o")
    val r = QualityChecks.simpsonsParadox(df, "st", sf.col("t"), sf.col("o"))
      .head()
    // both strata negative, pooled det = 61*19 - 29*11 > 0: reversal
    assert(r.getAs[Long]("n_positive") == 0 && r.getAs[Long]("n_negative") == 2
      && r.getAs[Int]("pooled_sign") == 1 && r.getAs[Boolean]("paradox"),
      r.toString)
    val single = (rows("s1", true, true, 9) ++ rows("s1", true, false, 1) ++
      rows("s1", false, true, 1) ++ rows("s1", false, false, 9)).toDF("st", "t", "o")
    val rs = QualityChecks.simpsonsParadox(single, "st", sf.col("t"), sf.col("o"))
      .head()
    assert(!rs.getAs[Boolean]("paradox") && rs.getAs[Int]("pooled_sign") == 1)
  }

  test("QualityChecks.classificationPanel: hand confusion, MCC = 5/12") {
    val df = (Seq.fill(2)((1.0, 1)) ++ Seq((1.0, 0)) ++
      Seq.fill(3)((-1.0, 0)) ++ Seq((-1.0, 1))).toDF("score", "y")
    val r = QualityChecks.classificationPanel(df, "score", "y").head()
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("tn") == 3 && r.getAs[Long]("fn") == 1)
    assert(r.getAs[Double]("accuracy") ==
      math.floor(5.0 / 7 * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("f1") == 0.666667 &&
      r.getAs[Double]("balanced_accuracy") == 0.708333 &&
      r.getAs[Double]("youden_j") == 0.416667, r.toString)
    assert(r.getAs[Double]("mcc") == math.floor(5.0 / 12 * 1e6 + 0.5) / 1e6,
      r.toString)
  }

  test("QualityChecks.anovaEffects: hand eta/omega/f2") {
    val df = Seq(("a", 0.0), ("a", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "v")
    val r = QualityChecks.anovaEffects(df, "g", "v").head()
    // SSB 16, SSW 4: eta 0.8, omega = 14/22, f2 = 4
    assert(r.getAs[Double]("eta_squared") == 0.8, r.toString)
    assert(r.getAs[Double]("omega_squared") ==
      math.floor(14.0 / 22 * 1e6 + 0.5) / 1e6, r.toString)
    assert(r.getAs[Double]("cohens_f2") == 4.0, r.toString)
  }

  test("QualityChecks.fiveNumber: exact type-1 quartiles, trimean") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)).toDF("g", "v")
    val r = QualityChecks.fiveNumber(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 4 && r.getAs[Double]("min_v") == 1.0 &&
      r.getAs[Double]("q1") == 1.0 && r.getAs[Double]("median") == 2.0 &&
      r.getAs[Double]("q3") == 3.0 && r.getAs[Double]("max_v") == 4.0, r.toString)
    assert(r.getAs[Double]("iqr") == 2.0 && r.getAs[Double]("trimean") == 2.0 &&
      r.getAs[Double]("midhinge") == 2.0, r.toString)
  }

  test("EventOps.loadConcentration: PAR, top-decile share, hand Gini") {
    val df = hourlyCounts(Seq("l" -> Array(8L, 0L, 0L, 2L)))
    val r = EventOps.loadConcentration(df).head()
    // counts {0,0,2,8}: mean 2.5, PAR 3.2, top hour 8/10, Gini 0.65
    assert(r.getAs[Long]("n_bins") == 4 && r.getAs[Long]("peak") == 8)
    assert(r.getAs[Double]("mean_per_bin") == 2.5 &&
      r.getAs[Double]("peak_to_avg") == 3.2, r.toString)
    assert(r.getAs[Double]("top_decile_share") == 0.8, r.toString)
    assert(r.getAs[Double]("gini") == 0.65, r.toString)
  }

  test("EventOps.weeklyHeatProfile: dow/hour cells and shares") {
    val df = Seq("2024-01-07 00:30:00", "2024-01-07 00:45:00",
      "2024-01-08 01:15:00") // Sunday x2, Monday x1
      .toDF("ts_s").select(sf.col("ts_s").cast("timestamp").as("ts"))
    val got = EventOps.weeklyHeatProfile(df).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      (1, 0, 2L, 0.666667, 1.0),  // Sunday 00h
      (2, 1, 1L, 0.333333, 1.0)), got.toString) // Monday 01h
  }

  test("EventOps.churnStats: 7-day churn horizon, resurrection gaps") {
    val day = 86400L
    val df = Seq(
      (1L, 0L, 1L), (2L, 20 * day, 1L), // u1: 20-day gap -> resurrection
      (3L, day, 2L))                    // u2: silent 19 days -> churned
      .toDF("event_id", "ts_s", "user_id")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"))
    val r = EventOps.churnStats(df).head()
    assert(r.getAs[Long]("n_users") == 2 && r.getAs[Long]("n_churned") == 1 &&
      r.getAs[Double]("churn_rate") == 0.5, r.toString)
    assert(r.getAs[Long]("n_resurrections") == 1 &&
      r.getAs[Long]("n_resurrected_users") == 1 &&
      r.getAs[Double]("resurrection_rate") == 0.5, r.toString)
  }

  test("TextAnalysis.shoutingAudit: caps share, bursts, ellipses") {
    val df = Seq(("s", "Hello WORLD AND you!!! wait... ok"),
      ("s", "calm plain text here")).toDF("source", "text")
    val r = TextAnalysis.shoutingAudit(df, "source", "text").head()
    assert(r.getAs[Long]("n_docs") == 2 && r.getAs[Long]("n_words") == 10)
    assert(r.getAs[Double]("caps_word_share") == 0.2, r.toString) // 2/10
    assert(r.getAs[Double]("punct_bursts_per_10k") == 1000.0 &&
      r.getAs[Double]("ellipses_per_10k") == 1000.0, r.toString)
  }

  test("StarSchema.dailyBacklog: open/close flows integrate to a level") {
    val orders = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-02 00:00:00"))
      .toDF("o_orderkey", "od")
      .select(sf.col("o_orderkey"), sf.col("od").cast("timestamp").as("o_orderdate"))
    val lines = Seq((1L, "2024-01-03 00:00:00")).toDF("l_orderkey", "sd")
      .select(sf.col("l_orderkey"), sf.col("sd").cast("timestamp").as("l_shipdate"))
    val got = StarSchema.dailyBacklog(orders, lines).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("2024-01-01", 1L, 0L, 1L),
      ("2024-01-02", 1L, 0L, 2L),
      ("2024-01-03", 0L, 1L, 1L)), got.toString) // order 2 never closes
  }

  test("Graph.pageRankWeighted: strength splits rank, unweighted doesn't") {
    val baskets = Seq((1L, "c"), (1L, "a"), (2L, "c"), (2L, "a"),
      (3L, "c"), (3L, "a"), (4L, "c"), (4L, "b")).toDF("basket", "item")
    val w = Graph.pageRankWeighted(baskets, "basket", "item",
        minPairCount = 1, iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("a") > w("b"), w.toString) // 3/4 of c's endorsement vs 1/4
    val u = Graph.pageRank(baskets, "basket", "item",
        minPairCount = 1, iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(u("a") == u("b"), u.toString) // uniform split can't tell them apart
  }

  test("Similarity.labelMargin: violated anchor, missing-side NULL") {
    val df = Seq(
      (0L, Array(1f, 0f), "a"),
      (1L, Array(0.99f, 0.14f), "b"),  // wrong-label nearest neighbor
      (2L, Array(0.9f, 0.44f), "a"))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.labelMargin(df, "vec_id", "embedding", "label",
      sf.col("vec_id") < 1).head()
    assert(r.getAs[Boolean]("violated") && r.getAs[Double]("margin") < 0,
      r.toString)
    // anchor whose label has no second member: NULL same side
    val solo = Seq((0L, Array(1f, 0f), "a"), (1L, Array(0f, 1f), "b"),
      (2L, Array(0.5f, 0.5f), "b")).toDF("vec_id", "embedding", "label")
    val rs = Similarity.labelMargin(solo, "vec_id", "embedding", "label",
      sf.col("vec_id") < 1).head()
    assert(rs.isNullAt(rs.fieldIndex("best_same")) &&
      rs.isNullAt(rs.fieldIndex("margin")), rs.toString)
  }

  test("EventOps.sampleSizeCalculator: hand two-proportion power n") {
    val df = (1 to 10).map(i =>
      (i.toLong, "2024-01-01 00:00:00", i.toLong,
        if (i <= 2) "purchase" else "view", if (i <= 2) 95.0 else 1.0))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"), sf.col("value"))
    val r = EventOps.sampleSizeCalculator(df, "user_id",
      sf.col("event_type") === "purchase" && sf.col("value") >= 90.0).head()
    assert(r.getAs[Double]("p0") == 0.2 && r.getAs[Double]("p1") == 0.22)
    val (p0, p1) = (0.2, 0.22)
    val pbar = (p0 + p1) / 2
    val num = 1.959963984540054 * math.sqrt(2 * pbar * (1 - pbar)) +
      0.8416212335729143 * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
    assert(r.getAs[Long]("n_per_arm") ==
      math.ceil(num * num / ((p1 - p0) * (p1 - p0))).toLong, r.toString)
  }

  test("QualityChecks.duplicateTransactions: business-key collisions only") {
    val df = Seq(
      (1L, 7L, "2024-01-01 10:00:00", 99.99),
      (2L, 7L, "2024-01-01 16:00:00", 99.99),  // same cust/amount/day
      (3L, 7L, "2024-01-02 10:00:00", 99.99),  // next day: no collision
      (4L, 8L, "2024-01-01 10:00:00", 99.99))  // other customer
      .toDF("o_orderkey", "cust", "od", "amt")
      .select(sf.col("o_orderkey"), sf.col("cust"),
        sf.col("od").cast("timestamp").as("odate"), sf.col("amt"))
    val got = QualityChecks.duplicateTransactions(df, "cust", "odate", "amt",
      "o_orderkey").collect()
    assert(got.length == 1, got.mkString(";"))
    val r = got(0)
    assert(r.getAs[Long]("entity") == 7L && r.getAs[String]("date") == "2024-01-01"
      && r.getAs[Double]("amount") == 99.99 && r.getAs[Long]("n_records") == 2
      && r.getAs[Long]("first_id") == 1L && r.getAs[Long]("last_id") == 2L,
      r.toString)
  }

  test("QualityChecks.pairedTTest: hand diffs 1,2,3 give t = 2 sqrt(3)") {
    val rows = Seq(
      (1L, "click", 5.0), (1L, "view", 4.0),
      (2L, "click", 5.0), (2L, "view", 3.0),
      (3L, "click", 5.0), (3L, "view", 2.0),
      (4L, "error", 9.0)) // non-condition rows drop
      .toDF("user_id", "event_type", "value")
    val r = QualityChecks.pairedTTest(rows, "user_id", "event_type", "value",
      "click", "view").head()
    assert(r.getAs[Long]("n_pairs") == 3 && r.getAs[Double]("mean_diff") == 2.0)
    assert(math.abs(r.getAs[Double]("t_stat") - 2 * math.sqrt(3.0)) < 2e-6,
      r.toString)
    assert(r.getAs[Double]("cohens_dz") == 2.0, r.toString)
  }

  test("EventOps.growthAccounting: ledger identity and quick ratio") {
    val wk = 604800L
    val df = Seq( // u1: weeks 0,1,2; u2: 0,2 (resurrects); u3: 1 (churns)
      (1L, 10L, 1L), (2L, wk + 10, 1L), (3L, 2 * wk + 10, 1L),
      (4L, 20L, 2L), (5L, 2 * wk + 20, 2L),
      (6L, wk + 30, 3L))
      .toDF("event_id", "ts_s", "user_id")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"))
    val got = EventOps.growthAccounting(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 0L, 0L, 0L),
      (1L, 2L, 1L, 1L, 0L, 1L),  // u2 churns out of week 0
      (2L, 2L, 0L, 1L, 1L, 1L)), got.toString) // u2 resurrects, u3 churns
    got.foreach { case (_, a, n, re, rs, _) => assert(a == n + re + rs) }
  }

  test("TextAnalysis.caseCollisions: variant census, folded singletons drop") {
    val df = Seq((1L, "The the THE cat cat"), (2L, "dog Dog"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.caseCollisions(df, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSeq
    assert(got == Seq(
      ("the", 3L, 3L, "the", 0.333333), // count tie: largest form wins
      ("dog", 2L, 2L, "dog", 0.5)), got.toString) // "cat" single-form drops
  }

  test("Graph.numericAssortativity: homophily 1, anti -1, complete-case") {
    val homo = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val vals = Seq((1L, 10.0), (2L, 10.0), (3L, 1.0), (4L, 1.0))
      .toDF("node", "price")
    val rh = Graph.numericAssortativity(homo, vals, "node", "price").head()
    assert(rh.getAs[Long]("n_directed_edges") == 4 &&
      rh.getAs[Double]("assortativity") == 1.0, rh.toString)
    val anti = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val va = Seq((1L, 0.0), (2L, 10.0)).toDF("node", "price")
    val ra = Graph.numericAssortativity(anti, va, "node", "price").head()
    assert(ra.getAs[Double]("assortativity") == -1.0, ra.toString)
    // unlabeled endpoint drops the edge (complete-case)
    val rc = Graph.numericAssortativity(homo,
      vals.filter(sf.col("node") =!= 4L), "node", "price").head()
    assert(rc.getAs[Long]("n_directed_edges") == 2, rc.toString)
    // a node with two distinct values collapses to its MIN — each edge
    // still joins exactly once (no per-value edge duplication)
    val rd = Graph.numericAssortativity(homo,
      vals.union(Seq((1L, 99.0)).toDF("node", "price")), "node", "price").head()
    assert(rd.getAs[Long]("n_directed_edges") == 4 &&
      rd.getAs[Double]("assortativity") == 1.0, rd.toString)
  }

  test("StarSchema.supplierConcentration: HHI, top share, single source") {
    val df = Seq(
      (1L, 10L, 3.0), (1L, 11L, 1.0),  // part 1: shares 3/4, 1/4
      (2L, 10L, 5.0))                  // part 2: single source
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val rows = StarSchema.supplierConcentration(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val p1 = rows(1L)
    // HHI = (9 + 1)/16 = 0.625, top share 0.75
    assert(p1.getAs[Long]("n_suppliers") == 2 &&
      p1.getAs[Double]("total_qty") == 4.0 &&
      p1.getAs[Double]("hhi") == 0.625 &&
      p1.getAs[Double]("top_supplier_share") == 0.75 &&
      !p1.getAs[Boolean]("single_source"), p1.toString)
    val p2 = rows(2L)
    assert(p2.getAs[Double]("hhi") == 1.0 && p2.getAs[Boolean]("single_source"))
  }

  test("EventOps.audienceOverlap: Jaccard and both conditional reaches") {
    val df = Seq(
      (1L, 1L, "click"), (2L, 1L, "view"),
      (3L, 2L, "click"), (4L, 2L, "view"),
      (5L, 3L, "click"))
      .toDF("event_id", "user_id", "event_type")
    val r = EventOps.audienceOverlap(df).head()
    // click audience {1,2,3}, view {1,2}: both 2
    assert(r.getAs[String]("type_a") == "click" &&
      r.getAs[String]("type_b") == "view")
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 2 &&
      r.getAs[Long]("n_both") == 2, r.toString)
    assert(r.getAs[Double]("jaccard") == 0.666667 &&
      r.getAs[Double]("share_of_a") == 0.666667 &&
      r.getAs[Double]("share_of_b") == 1.0, r.toString)
  }
}
