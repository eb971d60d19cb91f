package graft

import org.apache.spark.sql.{functions => sf}
import graft.operators._
import graft.sources.Tables

/** Corpus-statistics operators: Misra–Gries heavy hitters (sketch
  * guarantees + exactness of the two-pass plan), unigram-LM scoring,
  * per-source KL divergence, centroid-distance outliers. */
class CorpusStatsSpec extends SparkFunSuite {
  import spark.implicits._

  test("MisraGriesAgg never exceeds capacity and keeps every guaranteed heavy hitter") {
    val rnd = new scala.util.Random(42)
    // heavy items h0..h4 at ~8% each, noise over 2000 rare terms
    val stream = rnd.shuffle(
      (0 until 5).flatMap(h => Seq.fill(800)(s"h$h")) ++
      (0 until 6000).map(_ => s"noise${rnd.nextInt(2000)}"))
    val n = stream.size
    val capacity = 24
    val agg = new CorpusStats.MisraGriesAgg(capacity)
    // sequential reduce
    val seqSummary = stream.foldLeft(agg.zero)(agg.reduce)
    // chunked reduce + pairwise merge (the partial-aggregation shape)
    val merged = stream.grouped(977).toSeq
      .map(chunk => chunk.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    for (summary <- Seq(seqSummary, merged)) {
      assert(summary.size <= capacity)
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      val mustSurvive = exact.filter(_._2 > n / (capacity + 1)).keySet
      assert(mustSurvive.subsetOf(agg.finish(summary).toSet),
        s"lost ${mustSurvive -- agg.finish(summary).toSet}")
    }
  }

  test("heavyHitterTerms equals the exact groupBy-count at the threshold") {
    val docs = Tables.load(spark, sf001, "documents")
    val phi = 0.005
    val got = CorpusStats.heavyHitterTerms(docs, "text", phi)
      .select("term", "cnt").as[(String, Long)].collect().toSeq
    val toks = docs.select(
      sf.explode(functions.wsTokens(sf.lower($"text"))).as("term"))
    val n = toks.count()
    val exact = toks.groupBy("term").agg(sf.count(sf.lit(1)).as("cnt"))
      .filter($"cnt" >= math.ceil(phi * n))
      .orderBy($"cnt".desc, $"term")
      .as[(String, Long)].collect().toSeq
    assert(got == exact)
    assert(got.nonEmpty)
  }

  test("heavyHitterTerms recount joins the candidate set as a broadcast semi join") {
    val docs = Tables.load(spark, sf001, "documents")
    val plan = CorpusStats.heavyHitterTerms(docs, "text", 0.005)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi recount, got:\n$plan")
  }

  test("unigramLmScore matches the hand-computed add-one-smoothed NLL") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = CorpusStats.unigramLmScore(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().toSeq
    // counts a=2 b=2 c=1, N=5, V=3; p(a)=p(b)=3/8, p(c)=2/8
    // doc1 = -ln(3/8) = 0.9808 over 3 tokens; doc2 = mean(-ln 3/8, -ln 2/8)
    assert(got == Seq((1L, 0.9808, 3L), (2L, 1.1836, 2L)))
  }

  test("sourceKlDivergence matches the hand-computed divergences") {
    val docs = Seq(("s1", "a a b"), ("s2", "b c")).toDF("source", "text")
    val got = CorpusStats.sourceKlDivergence(docs, "source", "text")
      .as[(String, Double, Long, Long)].collect().toSeq
    // q(a)=q(b)=3/8, q(c)=2/8; s1: 2/3·ln(16/9)+1/3·ln(8/9)=0.3443
    // s2: ½·ln(4/3)+½·ln(2)=0.4904
    assert(got == Seq(("s1", 0.3443, 3L, 2L), ("s2", 0.4904, 2L, 2L)))
  }

  test("centroidDistances computes own-label distance and flags outliers") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), "A"),
      (2L, Array(0.0f, 1.0f), "A"),
      (3L, Array(2.0f, 2.0f), "B")).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidDistances(emb, "vec_id", "embedding",
        "label", outlierThreshold = 0.5)
      .select("vec_id", "centroid_dist", "is_outlier")
      .as[(Long, Double, Int)].collect().toSeq
    // A centroid (0.5, 0.5): dist = sqrt(0.5) = 0.7071; B centroid = itself
    assert(got == Seq((1L, 0.7071, 1), (2L, 0.7071, 1), (3L, 0.0, 0)))
  }

  test("centroidDistances corpus side joins the centroids by broadcast, no explode") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val df = Similarity.centroidDistances(emb, "vec_id", "embedding", "label", 1.01)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    // exactly one generator (the centroid build); the scored corpus rows
    // themselves never explode
    assert(plan.split("Generate\\b").length - 1 <= 1,
      s"corpus side must not explode:\n$plan")
  }

  test("classifierScore is additive in token weights, bias-anchored at empty") {
    val w = Similarity.lshPlanes(64, 1, seed = 3)(0)
    val docs = Seq((1L, ""), (2L, "alpha"), (3L, "alpha alpha"),
      (4L, "ALPHA")).toDF("doc_id", "text")
    val got = TextAnalysis.classifierScore(docs, "doc_id", "text", w, bias = 0.25)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getInt(3)))).toMap
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(got(1L)._1 == 0.25, "empty doc scores the bias")
    // two copies of a token add its weight twice; weights are dyadic
    // multiples of 2^-10, so snap the rounded single-token score back
    // to the exact weight before doubling
    val wAlpha = math.round((got(2L)._1 - 0.25) * 1024.0) / 1024.0
    assert(got(3L)._1 == r4(0.25 + 2 * wAlpha), s"got $got")
    // tokenization lowercases: ALPHA == alpha
    assert(got(4L)._1 == got(2L)._1)
    // flag thresholds the rounded score at zero
    got.values.foreach { case (s, f) => assert(f == (if (s > 0) 1 else 0)) }
  }

  test("pmiCollocations computes ln-ratio PMI over adjacent pairs with support floor") {
    val docs = (1 to 6).map(i => (i.toLong, "a b")) ++
      (7 to 9).map(i => (i.toLong, "z")) ++
      Seq((10L, "q r")) // support 1 < minCount -> filtered
    val got = CorpusStats.pmiCollocations(docs.toDF("doc_id", "text"), "text",
      minCount = 5).collect()
    assert(got.length == 1)
    val r = got.head
    // p(a,b) = 6/7 bigrams; p(a) = p(b) = 6/17 unigrams
    val want = math.floor(math.log((6.0 / 7.0) / ((6.0 / 17.0) * (6.0 / 17.0))) * 10000.0 + 0.5) / 10000.0
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)) ==
      (("a", "b", 6L, want)), s"got ${got.toSeq}")
  }

  test("sourceOverlap matches hand-computed pairwise gram Jaccard, zero pairs included") {
    // 3-grams — A: {"a b c","b c d"}; B: {"a b c","b c x"}; C (short
    // doc): {"z z"}; D duplicates A exactly across two docs
    val docs = Seq(
      ("A", "a b c d"), ("B", "a b c x"), ("C", "z z"),
      ("D", "a b c d"), ("D", "a b c")).toDF("source", "text")
    val got = CorpusStats.sourceOverlap(docs, "source", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    // D's grams: {"a b c d" docs give "a b c","b c d"} ∪ {"a b c"} = same 2
    assert(got == Seq(
      ("A", "B", 2L, 2L, 1L, 0.3333),  // {abc,bcd} vs {abc,bcx}
      ("A", "C", 2L, 1L, 0L, 0.0),
      ("A", "D", 2L, 2L, 2L, 1.0),
      ("B", "C", 2L, 1L, 0L, 0.0),
      ("B", "D", 2L, 2L, 1L, 0.3333),
      ("C", "D", 1L, 2L, 0L, 0.0)), s"got $got")
  }

  test("dimensionProfile: exact fixed-point moments; non-finite counted, not aggregated") {
    val emb = Seq((1L, Seq(0.0, 2.0)), (2L, Seq(1.0, 3.0)), (3L, Seq(2.0, 4.0)),
      (4L, Seq(Double.NaN, Double.PositiveInfinity))) // polluted row
      .toDF("vec_id", "embedding")
    val got = Similarity.dimensionProfile(emb, "embedding").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    // moments over the 3 finite values only; the bad row is counted
    assert(got == Seq((0, 3L, 1L, 1.0, 1.0, 0.0, 2.0),
      (1, 3L, 1L, 3.0, 1.0, 2.0, 4.0)), s"got $got")
  }

  test("standardizeEmbeddings: exact z-scores, constant dimension NULLs") {
    // dim 0: values 1,2,3 -> mean 2, std 1 -> z = -1, 0, 1
    // dim 1: constant 5 -> std 0 -> NULL z
    val emb = Seq((1L, Seq(1.0, 5.0)), (2L, Seq(2.0, 5.0)), (3L, Seq(3.0, 5.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.standardizeEmbeddings(emb, "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSeq
    assert(got == Seq(
      (1L, 0L, Some(-1.0)), (1L, 1L, None),
      (2L, 0L, Some(0.0)), (2L, 1L, None),
      (3L, 0L, Some(1.0)), (3L, 1L, None)), s"got $got")
  }

  test("knnLabelEval: planted clusters classify right, mislabel detected") {
    // two tight clusters; vec 9 sits in cluster A but is labeled 1 —
    // its 3-NN majority says 0, flagging the label as suspect
    val a = Seq(1.0, 0.0); val b = Seq(0.0, 1.0)
    def jig(v: Seq[Double], e: Double) = Seq(v(0) + e, v(1) + e / 2)
    val emb = (Seq((1L, jig(a, 0.01), 0), (2L, jig(a, 0.02), 0), (3L, jig(a, 0.03), 0),
      (5L, jig(b, 0.01), 1), (6L, jig(b, 0.02), 1), (7L, jig(b, 0.03), 1),
      (9L, jig(a, 0.04), 1)))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabelEval(spark, emb, "vec_id", "embedding", "label",
      k = 3, sampleMod = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 1), (2L, 0L, 0L, 1), (3L, 0L, 0L, 1),
      (5L, 1L, 1L, 1), (6L, 1L, 1L, 1), (7L, 1L, 1L, 1),
      (9L, 1L, 0L, 0)), s"got $got")
  }

  test("invertedIndex: df floor, ascending id-capped postings, truncation flag") {
    // "the" in all 30 docs (truncates at cap 5), "rare" in docs 3,7
    // (passes minDf 2), "once" in one doc (filtered), duplicate tokens
    // within a doc count once
    val docs = (1L to 30L).map { i =>
      val extra = (if (i == 3 || i == 7) " rare rare" else "") +
        (if (i == 9) " once" else "")
      (i, s"the the quick$extra")
    }.toDF("doc_id", "text")
    val got = CorpusStats.invertedIndex(spark, docs, "doc_id", "text",
        minDf = 2, maxPostings = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getInt(4))).toSeq
    assert(got == Seq(
      ("quick", 30L, 5L, "1,2,3,4,5", 1),
      ("rare", 2L, 2L, "3,7", 0),
      ("the", 30L, 5L, "1,2,3,4,5", 1)), s"got $got")
  }

  test("CorpusStats.bm25Score matches the hand-computed Okapi formula") {
    val docs = Seq(
      (1L, "a a b"),   // tf(a)=2, dl=3
      (2L, "b c"),     // tf(c)=1, dl=2
      (3L, "c c c"),   // tf(c)=3, dl=3
      (4L, "b b")      // no query term -> absent from output
    ).toDF("doc_id", "text")
    val k1 = 1.2; val b = 0.75
    val n = 4.0; val avgdl = (3 + 2 + 3 + 2).toDouble / 4
    def idf(df: Long) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def s(df: Long, tf: Long, dl: Long) =
      idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val got = CorpusStats.bm25Score(docs, "doc_id", "text", Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((1L, r4(s(df = 1, tf = 2, dl = 3)))))
    assert(got(2L) == ((1L, r4(s(df = 2, tf = 1, dl = 2)))))
    assert(got(3L) == ((1L, r4(s(df = 2, tf = 3, dl = 3)))))
    // scores order the docs as retrieval would: rare 'a' beats common 'c'
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("distinctiveTerms: concentrated term scores positive in its source, formula exact") {
    import spark.implicits._
    // 'spam' lives almost only in source b; 'the' is background everywhere
    val docs = Seq(
      ("a", Array.fill(20)("the").mkString(" ")),
      ("a", "the quick fox " + Array.fill(5)("runs").mkString(" ")),
      ("b", Array.fill(12)("spam").mkString(" ") + " the the"),
      ("b", Array.fill(8)("spam").mkString(" ") + " " + Array.fill(6)("the").mkString(" ")))
      .toDF("source", "text")
    val got = CorpusStats.distinctiveTerms(docs, "source", "text",
        a0 = 100.0, minCount = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // token totals: a = 20 + 8 = 28, b = 14 + 14 = 28, corpus = 56;
    // spam: b-only = 20; the: a = 21, b = 8; runs: a = 5
    val (nIn, nRest, delta, z) = got(("b", "spam"))
    assert(nIn == 20L && nRest == 0L)
    assert(delta > 0 && z > 0, s"spam in b must be positive: $delta $z")
    // replay the operator's own double assembly for one cell
    val (ySw, yW, nS, nTot, a0v) = (20.0, 20.0, 28.0, 56.0, 100.0)
    val aw = a0v * yW / nTot
    val d = math.log((ySw + aw) / (nS + a0v - ySw - aw)) -
      math.log((yW - ySw + aw) / ((nTot - nS) + a0v - (yW - ySw) - aw))
    val v = 1.0 / (ySw + aw) + 1.0 / (yW - ySw + aw)
    assert(delta == math.floor(d * 10000.0 + 0.5) / 10000.0, s"got $delta want $d")
    assert(z == math.floor(d / math.sqrt(v) * 10000.0 + 0.5) / 10000.0)
    // background term scores NEGATIVE where it is underrepresented
    assert(got(("a", "the"))._3 * got(("b", "the"))._3 <= 0.0 ||
      math.abs(got(("a", "the"))._3 - got(("b", "the"))._3) > 0,
      "a shared term cannot be maximally distinctive of both sources")
  }

  test("zipfSlope: exact 1/rank frequencies fit slope -1") {
    import spark.implicits._
    // counts 6/3/2 at ranks 1/2/3 = 6/rank: ln c = ln 6 - 1 * ln rank
    val docs = Seq((Array.fill(6)("aa") ++ Array.fill(3)("bb") ++
      Array.fill(2)("cc")).mkString(" ")).toDF("text")
    val r = CorpusStats.zipfSlope(docs, "text").collect()(0)
    assert(r.getLong(0) == 3L)
    // replay the snapped-ln pipeline
    val pts = Seq((1, 6), (2, 3), (3, 2)).map { case (rk, c) =>
      (math.floor(math.log(rk.toDouble) * 1e6 + 0.5) / 1e6,
        math.floor(math.log(c.toDouble) * 1e6 + 0.5) / 1e6) }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(1) - slope) < 2e-4, s"got ${r.getDouble(1)} want $slope")
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-3, "6/3/2 at ranks 1/2/3 is slope -1")
  }

  test("zipfSlope: single-term vocabulary yields NULL slope") {
    import spark.implicits._
    val r = CorpusStats.zipfSlope(Seq("x x x").toDF("text"), "text").collect()(0)
    assert(r.getLong(0) == 1L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("ngramCoverage: hand-computed coverage curve incl. short-doc whole grams") {
    import spark.implicits._
    val corpus = Seq("a b c", "x y").toDF("text")
    val eval = Seq("a b c d", "b c").toDF("text")
    val got = CorpusStats.ngramCoverage(corpus, eval, "text", maxN = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1, 4L, 3L, 0.75),     // {a,b,c,d} vs {a,b,c,x,y}
      (2, 3L, 2L, 0.6667),   // {a b, b c, c d} vs {a b, b c, x y}
      (3, 3L, 1L, 0.3333)),  // {a b c, b c d, b c} vs {a b c, x y}
      s"got $got")
  }

  test("rrfFuse: hand-computed reciprocal ranks, single-list items included") {
    import spark.implicits._
    // list A ranks: x(1), y(2), z(3); list B ranks: y(1), x(2) — z absent
    val a = Seq(("x", 9.0), ("y", 5.0), ("z", 1.0)).toDF("id", "score")
    val b = Seq(("y", 8.0), ("x", 2.0)).toDF("id", "score")
    val got = CorpusStats.rrfFuse(Seq(a, b), "id", k = 60).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    def c(r: Int) = math.floor(1e9 / (60.0 + r) + 0.5)
    def rrf(rs: Int*) = math.floor(rs.map(c).sum / 1e9 * 1e6 + 0.5) / 1e6
    // x: 1/(61) + 1/(62); y: 1/(62) + 1/(61) — identical sums; tie
    // breaks by id, z trails with one list
    assert(got == Seq(("x", 2L, rrf(1, 2)), ("y", 2L, rrf(2, 1)),
      ("z", 1L, rrf(3))), s"got $got")
  }

  test("Sketch.countMin end-to-end: estimates upper-bound exact counts") {
    import spark.implicits._
    val df = (Seq.fill(50)("hot") ++ Seq.fill(7)("warm") ++
      (1 to 40).map(i => s"cold$i")).toDF("w")
    val (width, depth) = (64, 4)
    val sk = Sketch.countMin(df, sf.col("w"), width, depth)
    val hashes = df.select(sf.col("w"), sf.xxhash64(sf.col("w")).as("h"))
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = (w: String) => Sketch.estimate(sk, width, depth, hashes(w))
    assert(est("hot") >= 50L && est("hot") <= 97L)
    assert(est("warm") >= 7L)
    // partitioning invariance: the sketch is bit-identical at any split
    val sk7 = Sketch.countMin(df.repartition(7), sf.col("w"), width, depth)
    assert(sk.toSeq == sk7.toSeq)
  }

  test("EventOps.denseSeries: silent bins materialize as zero rows") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-03-01 10:00:00")
    def ts(h: Int) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    val events = Seq(
      ("click", ts(0), Some(1.5)), ("click", ts(0), Some(2.5)),
      ("click", ts(2), None),            // null value: counted, sums 0
      ("view", ts(1), Some(4.0)))
      .toDF("event_type", "ts", "value")
    val got = EventOps.denseSeries(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    val lo = got.map(_._2).min
    val want = Seq(
      ("click", lo, 2L, 4.0), ("click", lo + 1, 0L, 0.0), ("click", lo + 2, 1L, 0.0),
      ("view", lo, 0L, 0.0), ("view", lo + 1, 1L, 4.0), ("view", lo + 2, 0L, 0.0))
    assert(got.toSeq == want, s"got ${got.toSeq}")
  }

  test("EventOps.denseSeries: outlier timestamp beyond maxBins raises, not OOMs") {
    import spark.implicits._
    // one epoch-1970 corrupt row against a 2026 corpus: ~491k hourly
    // bins, far over maxBins=1000 — must fail fast with a diagnostic
    val events = Seq(
      ("click", java.sql.Timestamp.valueOf("2026-03-01 10:00:00"), Some(1.0)),
      ("click", new java.sql.Timestamp(0L), Some(1.0)))
      .toDF("event_type", "ts", "value")
    val e = intercept[Exception] {
      EventOps.denseSeries(events, maxBins = 1000).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exceeds maxBins")), s"got $e")
  }

  test("EventOps.bursts: spike after quiet baseline flags; warmup bins never flag") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    // type x: 1 event/hour for hours 0..23 (baseline 24), then 9 at
    // hour 24 (9 > 3 * 24/24 -> burst), 2 at hour 25 (not a burst:
    // trailing sum 32, 10*2*24=480 <= 30*32=960)
    val rows = (0 to 23).map(h => ("x", ts(h), 1.0)) ++
      Seq.fill(9)(("x", ts(24), 1.0)) ++ Seq(("x", ts(25), 1.0), ("x", ts(25), 1.0))
    val got = EventOps.bursts(rows.toDF("event_type", "ts", "value"),
      window = 24, factor = 3.0).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(("x", 9L, 24L, 9.0)), s"got ${got.toSeq}")
  }

  test("TextAnalysis.bpeTrain: the classic low/lower merge sequence") {
    import spark.implicits._
    // words: low x3, lower x1 -> merges: (l,o) 4, (lo,w) 4, then the
    // cnt-1 ties break by left symbol: ("e","r") before ("low","er")
    val docs = Seq("low low low lower").toDF("text")
    val got = TextAnalysis.bpeTrain(docs, "text", nMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "l", "o", "lo", 4L), (2, "lo", "w", "low", 4L),
      (3, "e", "r", "er", 1L), (4, "low", "er", "lower", 1L)), s"got ${got.toSeq}")
  }

  test("TextAnalysis.bpeTrain: merge exhaustion stops early") {
    import spark.implicits._
    val got = TextAnalysis.bpeTrain(Seq("ab ab").toDF("text"), "text", nMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(3)))
    assert(got.toSeq == Seq((1, "ab")), s"got ${got.toSeq}")
  }

  test("CorpusStats.windowedPmi: window pairs, margins, and window=1 ≡ adjacency") {
    import spark.implicits._
    // "a b c d": window=2 directional pairs: ab ac bc bd cd
    val docs = Seq.fill(5)("a b c d").toDF("text")
    val got = CorpusStats.windowedPmi(docs, "text", window = 2, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSet ==
      Set(("a", "b", 5L), ("a", "c", 5L), ("b", "c", 5L), ("b", "d", 5L), ("c", "d", 5L)),
      s"got ${got.toSeq}")
    // replay one PMI: pair (a,b): c=5, out(a)=10, in(b)=5, N=25
    val want = math.floor(math.log(5.0 * 25 / (10 * 5)) * 1e4 + 0.5) / 1e4
    assert(got.find(t => t._1 == "a" && t._2 == "b").get._4 == want)
    // window=1 reduces to adjacent bigram pairs only
    val adj = CorpusStats.windowedPmi(docs, "text", window = 1, minCount = 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(adj == Set(("a", "b"), ("b", "c"), ("c", "d")), s"got $adj")
  }

  test("TextAnalysis.charClassProfile: exact class fractions, other as remainder") {
    import spark.implicits._
    // "ab 12!" -> n=6, alpha=2, digit=2, space=1, other=1
    val got = TextAnalysis.charClassProfile(
      Seq(("s1", "ab 12!"), ("s2", "ABC"), ("s3", "")).toDF("source", "text"),
      "source", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(got == Seq(
      ("s1", 6L, Some(0.3333), Some(0.3333), Some(0.1667), Some(0.1667)),
      ("s2", 3L, Some(1.0), Some(0.0), Some(0.0), Some(0.0)), // case-folded alpha
      ("s3", 0L, None, None, None, None)), s"got $got")       // empty -> NULL fracs
  }

  test("TextAnalysis.backoffLmScore: every backoff branch scores its formula") {
    import spark.implicits._
    def bucket(id: Long) = (id % 2147483648L) * 2654435761L % 4294967296L % 10000
    val evalIds = (1L to 500L).filter(bucket(_) >= 9000).take(5)
    val trainIds = (1L to 500L).filter(bucket(_) < 9000).take(2)
    assert(evalIds.size == 5 && trainIds.size == 2)
    // train: 2 copies of "a b c a b d" -> N=12; c(a)=c(b)=4, c(c)=c(d)=2;
    // bigrams ab=4 bc=2 ca=2 bd=2; trigrams abc=bca=cab=abd=2
    val docs = (trainIds.map(id => (id, "a b c a b d")) ++ Seq(
      (evalIds(0), "a b c"), // trigram seen:      2/4
      (evalIds(1), "b a b"), // bigram backoff:    .4 * 4/4
      (evalIds(2), "b b c"), // bigram backoff:    .4 * 2/4
      (evalIds(3), "z z d"), // unigram backoff:   .16 * 2/12
      (evalIds(4), "z z z")  // unseen-word floor: .16 * 1/12
    )).toDF("doc_id", "text")
    def expect(s: Double) = {
      val snapped = math.floor(math.log(s) * 1e6 + 0.5) / 1e6
      math.floor(snapped * 1e4 + 0.5) / 1e4
    }
    val got = TextAnalysis.backoffLmScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == evalIds.toSet, s"scored ${got.keySet}, want $evalIds")
    assert(got(evalIds(0)) == ((1L, expect(2.0 / 4))), s"got ${got(evalIds(0))}")
    assert(got(evalIds(1)) == ((1L, expect(0.4 * 4 / 4))), s"got ${got(evalIds(1))}")
    assert(got(evalIds(2)) == ((1L, expect(0.4 * 2 / 4))), s"got ${got(evalIds(2))}")
    assert(got(evalIds(3)) == ((1L, expect(0.4 * 0.4 * 2 / 12))), s"got ${got(evalIds(3))}")
    assert(got(evalIds(4)) == ((1L, expect(0.4 * 0.4 / 12))), s"got ${got(evalIds(4))}")
  }

  test("TextAnalysis.knLmScore: discount, continuation, and floor branches") {
    import spark.implicits._
    def bucket(id: Long) = (id % 2147483648L) * 2654435761L % 4294967296L % 10000
    val evalIds = (1L to 500L).filter(bucket(_) >= 9000).take(5)
    val trainIds = (1L to 500L).filter(bucket(_) < 9000).take(2)
    // train: 2 copies of "a b c a b" -> c(ab)=4, c(bc)=2, c(ca)=2;
    // B=3 bigram types, R=3 continuation words -> pc denominator 7;
    // pc(seen w)=2/7, pc(unseen)=1/7; c_ctx(a)=4, c_ctx(b)=c_ctx(c)=2,
    // every context has fan-out 1
    val docs = (trainIds.map(id => (id, "a b c a b")) ++ Seq(
      (evalIds(0), "a b"), // seen bigram:     (4-.75 + .75*1*(2/7))/4
      (evalIds(1), "a c"), // unseen, ctx a:   (.75*1*(2/7))/4
      (evalIds(2), "z b"), // unseen context:  pc(b) = 2/7
      (evalIds(3), "z z"), // both unseen:     pc floor = 1/7
      (evalIds(4), "b a")  // unseen, ctx b:   (.75*1*(2/7))/2
    )).toDF("doc_id", "text")
    def expect(p: Double) = {
      val snapped = math.floor(math.log(p) * 1e6 + 0.5) / 1e6
      math.floor(-snapped * 1e4 + 0.5) / 1e4
    }
    val got = TextAnalysis.knLmScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == evalIds.toSet, s"scored ${got.keySet}, want $evalIds")
    val pcSeen = 2.0 / 7
    assert(got(evalIds(0)) == ((1L, expect((4 - 0.75 + 0.75 * 1 * pcSeen) / 4))))
    assert(got(evalIds(1)) == ((1L, expect(0.75 * 1 * pcSeen / 4))))
    assert(got(evalIds(2)) == ((1L, expect(pcSeen))))
    assert(got(evalIds(3)) == ((1L, expect(1.0 / 7))))
    assert(got(evalIds(4)) == ((1L, expect(0.75 * 1 * pcSeen / 2))))
  }

  test("CorpusStats.naiveBayesEval: separable vocab classifies; unseen word falls to prior") {
    import spark.implicits._
    def bucket(id: Long) = (id % 2147483648L) * 2654435761L % 4294967296L % 10000
    val evalIds = (1L to 500L).filter(bucket(_) >= 9000).take(3)
    val trainIds = (1L to 500L).filter(bucket(_) < 9000).take(3)
    // train: A = {"x x x", "x x x"}, B = {"y y y"}; priors 2/3 vs 1/3
    val docs = Seq(
      (trainIds(0), "A", "x x x"), (trainIds(1), "A", "x x x"),
      (trainIds(2), "B", "y y y"),
      (evalIds(0), "A", "x x"), // -> A (likelihood)
      (evalIds(1), "B", "y"),   // -> B (likelihood beats prior)
      (evalIds(2), "B", "z")    // unseen word -> prior argmax = A
    ).toDF("doc_id", "lbl", "text")
    val got = CorpusStats.naiveBayesEval(docs, "doc_id", "text", "lbl")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", "A", 1L), ("B", "A", 1L), ("B", "B", 1L)),
      s"got $got")
  }

  test("TextAnalysis.textRankKeywords: exact integer recurrence on a path graph") {
    import spark.implicits._
    // "a b a b c": undirected graph a-b, b-c; n=3; outdeg a=1 b=2 c=1.
    // Hand-unrolled 3 rounds of the 1e12 fixed-point recurrence:
    // r3(b)=580541666666, r3(a)=r3(c)=209729166666 (tie -> token asc)
    val docs = Seq((1L, "a b a b c"), (2L, "solo"), (3L, "x x x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.textRankKeywords(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    // doc 2 has one token (no edges), doc 3 only self-loops -> no rows
    assert(got == Seq(
      (1L, 1, "b", 580541666666L),
      (1L, 2, "a", 209729166666L),
      (1L, 3, "c", 209729166666L)), s"got $got")
  }

  test("CorpusStats.goodTuring: S(r), adjusted counts, and missing mass") {
    import spark.implicits._
    // counts: a=3 b=2 c=1 -> N=6, S(1)=S(2)=S(3)=1
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = CorpusStats.goodTuring(docs, "doc_id", "text", maxR = 3).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      (0L, None, None, 0.166667),            // missing mass S(1)/N = 1/6
      (1L, Some(1L), Some(2.0), 0.333333),   // r* = 2*S(2)/S(1)
      (2L, Some(1L), Some(3.0), 0.5),
      (3L, Some(1L), Some(0.0), 0.0)),       // S(4)=0 -> r* floor 0
      s"got $got")
  }

  test("CorpusStats.itemEmbeddings: distributionally identical tokens share a vector") {
    import spark.implicits._
    // x and y occur in IDENTICAL contexts (only ever beside c) with
    // identical counts -> identical PPMI rows -> identical projections
    val docs = (Seq.fill(5)("c x c") ++ Seq.fill(5)("c y c")).toDF("text")
    val got = CorpusStats.itemEmbeddings(docs, "text").collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(got.keySet == Set("c", "x", "y"), s"tokens ${got.keySet}")
    assert(got("x") == got("y"), s"x=${got("x")} y=${got("y")}")
    assert(got("x").exists(_ != 0L), "embedding must be non-trivial")
    assert(got("x") != got("c"), "different contexts must separate")
    assert(got("x").size == 16)
  }

  test("CorpusStats.sourceEntropy: uniform vs constant source datasheets") {
    import spark.implicits._
    // s1: 4 distinct tokens once each -> H = ln 4, ppl = 4, TTR = 1
    // s2: one token x4 -> H = 0, ppl = 1, TTR = 0.25
    val docs = Seq(("s1", "a b c d"), ("s2", "e e e e")).toDF("source", "text")
    val got = CorpusStats.sourceEntropy(docs, "source", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    def fx(p: Double) = math.floor(p * math.log(p) * 1e9 + 0.5).toLong
    val h1 = -(4 * fx(0.25)).toDouble / 1e9
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(got == Seq(
      ("s1", 4L, 4L, 1.0, r6(h1), r4(math.exp(h1))),
      ("s2", 4L, 1L, 0.25, 0.0, 1.0)), s"got $got")
    assert(math.abs(got.head._5 - math.log(4)) < 1e-6)
  }

  test("TextAnalysis.subsampleFrequent: frequent tokens thin, rare survive") {
    import spark.implicits._
    val n = 1000
    val df = Seq((1L, Seq.fill(n)("a").mkString(" ")), (2L, "z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.subsampleFrequent(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // replay the exact keep rule: f(a) ~ 1 -> keep_prob ~ 3%; f(z) rare -> 1
    val kp = math.min(1.0, math.sqrt(0.001 * (n + 1).toDouble / n))
    val expect1 = (0 until n).count { pos =>
      val h = (1L * 1315423911L + pos) % 2147483648L * 2654435761L % 4294967296L
      (h + 1).toDouble / 4294967296.0 <= kp
    }.toLong
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got == Seq(
      (1L, n.toLong, expect1, r6(expect1.toDouble / n)),
      (2L, 1L, 1L, 1.0)), s"got $got, expect1=$expect1")
    assert(expect1 > 0 && expect1 < 200, s"subsampling off: $expect1")
  }

  test("CorpusStats.hillTailIndex: exact MLE over a known count tail") {
    import spark.implicits._
    // counts a=8 b=4 c=2 d=1: top-3 = [8,4,2], threshold 2,
    // alpha = 2 / (ln 4 + ln 2)
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = CorpusStats.hillTailIndex(docs, "text", k = 2).head()
    def fx(x: Double) = math.floor(math.log(x) * 1e9 + 0.5).toLong
    val sfx = fx(4.0) + fx(2.0) + fx(1.0)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("c_threshold") == 2)
    assert(r.getAs[Double]("hill_alpha") == r6(2.0 / (sfx.toDouble / 1e9)),
      r.toString)
  }

  test("TextAnalysis.applyBpe: learned merges tokenize exactly as training did") {
    import spark.implicits._
    val docs = Seq((1L, "low low low lower"), (2L, "slowest"), (3L, "")).toDF("id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 4).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    // corpus pairs: (l,o) 5, (lo,w) 5, (low,e) 2 (lower+slowest), then
    // the all-count-1 tie breaks by (left, right): (lowe, r)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r")),
      s"merges $merges")
    val got = TextAnalysis.applyBpe(docs, "id", "text", merges).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(got(1L) == Seq("low", "low", "low", "lower"), s"got ${got(1L)}")
    // "slowest": s|l|o|w|e|s|t -> s|lo|w|e|s|t -> s|low|e|s|t -> s|lowe|s|t
    assert(got(2L) == Seq("s", "lowe", "s", "t"), s"got ${got(2L)}")
    assert(got(3L) == Seq.empty, s"empty doc must give zero tokens: ${got(3L)}")
  }

  test("TextAnalysis.applyBpe: merges never cross a word boundary") {
    import spark.implicits._
    // train on a corpus where (a,b) merges; then a doc whose words END
    // in a and START with b — "xa by" must stay 4 symbols, not fuse ab
    // across the boundary.
    val got = TextAnalysis.applyBpe(
      Seq((1L, "xa by")).toDF("id", "text"), "id", "text", Seq(("a", "b")))
      .collect().map(_.getSeq[String](1)).head
    assert(got == Seq("x", "a", "b", "y"), s"got $got")
  }

  test("EventOps.sessionPaths: gap splits journeys, counts order the table") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-03-01 10:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val events = Seq(
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(5), "click"),      // session 1: view->click
      (3L, 1L, ts(120), "view"), (4L, 1L, ts(125), "click"),  // session 2: view->click
      (5L, 2L, ts(0), "view"), (6L, 2L, ts(1), "click"),      // view->click
      (7L, 3L, ts(0), "purchase"))                            // purchase
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.sessionPaths(events, minCount = 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("view->click", 3L), ("purchase", 1L)), s"got $got")
  }

  test("CorpusStats.minhashSourceSignatures: mergeable by elementwise min; identical vocab -> estimate 1") {
    import spark.implicits._
    def sigMap(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.minhashSourceSignatures(df, "source", "text", k = 8)
        .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    // the union sketch must equal the elementwise min of shard sketches
    val shard1 = Seq(("s", "alpha beta gamma")).toDF("source", "text")
    val shard2 = Seq(("s", "delta beta epsilon zeta")).toDF("source", "text")
    val whole = Seq(("s", "alpha beta gamma"), ("s", "delta beta epsilon zeta"))
      .toDF("source", "text")
    val (m1, m2, mw) = (sigMap(shard1), sigMap(shard2), sigMap(whole))
    (0 until 8).foreach { i =>
      assert(mw(("s", i)) == math.min(m1(("s", i)), m2(("s", i))),
        s"slot $i: union != min of shards")
    }
    // identical vocabularies (order/duplication-invariant) -> all slots
    // agree, estimate 1.0; disjoint vocabularies -> 0 matches
    val docs = Seq(("a", "x y z"), ("b", "z y x x"), ("c", "p q r")).toDF("source", "text")
    val sim = CorpusStats.minhashSourceSimilarity(docs, "source", "text", k = 8)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(4)))).toMap
    assert(sim(("a", "b")) == ((8L, 1.0)), s"got ${sim(("a", "b"))}")
    assert(sim(("a", "c"))._1 == 0L && sim(("b", "c"))._1 == 0L)
  }

  test("CorpusStats.heavyHittersPerGroup: exact per-group thresholds, capacity-stressed") {
    import spark.implicits._
    // a: x is 5/10 (passes ceil(0.4*10)=4); fillers are 1 each.
    // b: y is 3/5 (passes ceil(0.4*5)=2); x appears once (must NOT leak
    // from a's dominance). capacity = ceil(2/0.4) = 5 < 7 distinct in a.
    val docs = Seq(
      ("a", "x x x x x f1 f2 f3 f4 f5"),
      ("b", "y y y x f6")).toDF("source", "text")
    val got = CorpusStats.heavyHittersPerGroup(docs, "source", "text", phi = 0.4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("a", "x", 5L, 10L), ("b", "y", 3L, 5L)), s"got $got")
    // brute-force parity on a wider corpus: the recount makes the
    // output independent of sketch internals
    val wide = (1 to 50).map(i => ("g" + (i % 3), s"t${i % 7} t${i % 5} t${i % 11}"))
      .toDF("source", "text")
    val hh = CorpusStats.heavyHittersPerGroup(wide, "source", "text", phi = 0.1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val brute = wide.collect().flatMap(r => r.getString(1).split(" ").map((r.getString(0), _)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .groupBy(_._1._1)
    val expected = brute.flatMap { case (g, terms) =>
      val n = terms.map(_._2).sum
      terms.collect { case ((_, t), c) if c >= math.ceil(0.1 * n) => (g, t, c) }
    }.toSet
    assert(hh == expected, s"missing=${expected -- hh} extra=${hh -- expected}")
  }

  test("CorpusStats.heapsLawFit: exact V = N^0.5 recovery, degenerate one-source NULL") {
    import spark.implicits._
    // three sources on the exact law V = N^0.5: (N,V) = (4,2), (16,4), (64,8)
    def src(name: String, n: Int, v: Int) =
      (name, ((0 until v).map(i => s"w$i") ++ Seq.fill(n - v)("w0")).mkString(" "))
    val docs = Seq(src("a", 4, 2), src("b", 16, 4), src("c", 64, 8))
      .toDF("source", "text")
    val r = CorpusStats.heapsLawFit(docs, "source", "text").collect()(0)
    assert(r.getLong(0) == 3L && r.getDouble(1) == 0.5 && r.getDouble(2) == 0.0,
      s"got $r")
    // a single source cannot pin a slope -> NULL beta
    val one = Seq(("a", "x y z")).toDF("source", "text")
    assert(CorpusStats.heapsLawFit(one, "source", "text").collect()(0).isNullAt(1))
  }

  test("CorpusStats.noveltyCurve: first-occurrence buckets, duplicate buckets add nothing") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b c d"),   // grams: "a b c", "b c d"
      (1L, "a b c d"),   // exact dup: occurrences yes, novelty no
      (2L, "a b c d"),   // later bucket, all grams old
      (3L, "x y z w"),   // 2 brand-new grams
      (4L, "p q"),       // short doc: whole-sequence gram
      (5L, "   ")).toDF("doc_id", "text") // empty: dropped
    val got = CorpusStats.noveltyCurve(df, "doc_id", "text", n = 3, bucketSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      (0L, 2L, 4L, 2L, 2L, 0.5),   // 2 docs, 4 gram-occurrences, 2 new
      (1L, 2L, 4L, 2L, 4L, 0.5),   // doc2 adds nothing, doc3 adds 2
      (2L, 1L, 1L, 1L, 5L, 1.0)))  // short doc's whole-seq gram is new
  }

  test("CorpusStats.dsirWeights: target-like docs outscore source-like; weights add per token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good clean prose here", true),
      (2L, "good clean prose here", true),
      (3L, "spam junk noise mess", false),
      (4L, "spam junk noise mess", false),
      (5L, "good clean junk mess", false)) // mixed raw doc
      .toDF("doc_id", "text", "is_en")
    val got = CorpusStats.dsirWeights(docs, "doc_id", "text",
      isTarget = sf.col("is_en"), nBuckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // target vocabulary scores positive, source vocabulary negative,
    // and the mixed doc sits strictly between
    assert(got(1L) > 0 && got(3L) < 0)
    assert(got(5L) > got(3L) && got(5L) < got(1L))
    // identical docs get identical weights
    assert(got(1L) == got(2L) && got(3L) == got(4L))
  }

  test("CorpusStats.jsdSourcePairs: hand value, identical -> 0, disjoint pair absent") {
    import spark.implicits._
    // A = {x}, B = {x, y}: JSD = H(m) - (H(p)+H(q))/2 = 0.215762
    val ab = Seq(("A", "x"), ("B", "x y")).toDF("source", "text")
    val r = CorpusStats.jsdSourcePairs(ab, "source", "text").collect()(0)
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("A", "B", 1L)))
    assert(r.getDouble(3) == 0.215762, s"got ${r.getDouble(3)}")
    // identical distributions -> exactly 0
    val same = Seq(("A", "x y x"), ("B", "x y x")).toDF("source", "text")
    assert(CorpusStats.jsdSourcePairs(same, "source", "text")
      .collect()(0).getDouble(3) == 0.0)
    // disjoint vocabularies share no term -> pair absent by contract
    // (its JSD is exactly ln 2)
    val disj = Seq(("A", "x"), ("B", "y")).toDF("source", "text")
    assert(CorpusStats.jsdSourcePairs(disj, "source", "text").count() == 0)
  }

  test("CorpusStats.chao1: hand multiset, S2=0 stays defined") {
    import spark.implicits._
    // tokens: a x3, b x2, c x1, d x1 -> N=7 D=4 S1=2 S2=1
    // chao1 = 4 + 2*1/(2*2) = 4.5; coverage = 1 - 2/7
    val docs = Seq((1L, "a a a b b c d")).toDF("doc_id", "text")
    val r = CorpusStats.chao1(docs, "text").head()
    assert(r.getAs[Long]("n_tokens") == 7 && r.getAs[Long]("n_distinct") == 4 &&
      r.getAs[Long]("s1") == 2 && r.getAs[Long]("s2") == 1)
    assert(r.getAs[Double]("chao1") == 4.5, r.toString)
    assert(r.getAs[Double]("coverage") ==
      math.floor((1.0 - 2.0 / 7.0) * 1e6 + 0.5) / 1e6)
    // no doubletons: denominator's +1 keeps the estimate finite
    // tokens: a x3, b c d singletons -> chao1 = 4 + 3*2/2 = 7
    val r2 = CorpusStats.chao1(Seq((1L, "a a a b c d")).toDF("doc_id", "text"),
      "text").head()
    assert(r2.getAs[Long]("s2") == 0 && r2.getAs[Double]("chao1") == 7.0,
      r2.toString)
  }

  test("CorpusStats.burrowsDelta: clone sources at 0, styled source far") {
    import spark.implicits._
    // A and B are the same generator (identical token shares); C leans
    // hard on 'the'. Delta(A,B) = 0 < Delta(A,C).
    val docs = Seq(
      ("A", "the of and the of the x"), ("B", "the of and the of the y"),
      ("C", "the the the the the the z")).toDF("source", "text")
    val got = CorpusStats.burrowsDelta(docs, "source", "text", topK = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Double]("delta"))).toMap
    assert(got(("A", "B")) == 0.0, s"clones must score 0: $got")
    assert(got(("A", "C")) > 0.5 && got(("B", "C")) > 0.5, got.toString)
    assert(got(("A", "C")) == got(("B", "C")),
      "identical shares must give identical distances")
    // a token with zero cross-source variance drops from every pair:
    // 'same' has share 1/2 in all three sources -> only 'diff' varies
    val zv = Seq(("A", "same diff"), ("B", "same diff"), ("C", "same blah"))
      .toDF("source", "text")
    val zr = CorpusStats.burrowsDelta(zv, "source", "text", topK = 2).collect()
    assert(zr.nonEmpty && zr.forall(_.getAs[Long]("n_terms") == 1),
      zr.mkString(";"))
  }

  test("CorpusStats.rankBiasedOverlap: identity, disjoint, hand swap 0.375") {
    import spark.implicits._
    def ranks(items: Seq[String]) =
      items.zipWithIndex.map { case (s, i) => (s, (i + 1).toLong) }
        .toDF("id", "rank")
    val abc = ranks(Seq("x", "y", "z"))
    // swap of the top two at p=0.5: (1-p)[0 + p*2/2 + p^2*3/3] = 0.375
    val r = CorpusStats.rankBiasedOverlap(abc, ranks(Seq("y", "x", "z")),
      "id", "rank", k = 3, p = 0.5).head()
    assert(r.getAs[Long]("n_common") == 3 && r.getAs[Double]("rbo") == 0.375,
      r.toString)
    // identical lists: agree_d = d, so truncated RBO = 1 - p^k = 0.875
    val ri = CorpusStats.rankBiasedOverlap(abc, abc, "id", "rank", k = 3, p = 0.5)
      .head()
    assert(ri.getAs[Double]("rbo") == 0.875, ri.toString)
    // disjoint lists: zero overlap, zero rbo
    val rd = CorpusStats.rankBiasedOverlap(abc, ranks(Seq("p", "q", "r")),
      "id", "rank", k = 3, p = 0.5).head()
    assert(rd.getAs[Long]("n_common") == 0 && rd.getAs[Double]("rbo") == 0.0,
      rd.toString)
  }

  test("CorpusStats.selfBleuNovelty: hand clipped bigram precisions") {
    import spark.implicits._
    // A: doc1 "a b a b" (ab x2, ba x1), doc2 "a b c" (ab, bc)
    // pool: ab 3, ba 1, bc 1 -> P1 = min(2,1)/3 = 1/3, P2 = min(1,2)/2 = 1/2
    // B: single doc -> pool is itself -> clip 0 -> novelty 1
    val docs = Seq(("A", 1L, "a b a b"), ("A", 2L, "a b c"),
      ("B", 3L, "x y"), ("B", 4L, "z")).toDF("source", "doc_id", "text")
    val got = CorpusStats.selfBleuNovelty(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val sp = math.floor(1.0 / 3 * 1e6 + 0.5) + math.floor(0.5 * 1e6 + 0.5)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got("A") == ((2L, r6(sp / 2 / 1e6), r6(1.0 - sp / 2 / 1e6))),
      got.toString)
    // doc 4 has no bigram and is excluded; doc 3 is novel
    assert(got("B") == ((1L, 0.0, 1.0)), got.toString)
  }

  test("CorpusStats.hillDiversity: uniform source 2/2/2, skewed 0.75/0.25") {
    import spark.implicits._
    val docs = Seq(("A", "a a b b"), ("B", "a a a b")).toDF("source", "text")
    val got = CorpusStats.hillDiversity(docs, "text", "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // uniform 2-type source: all three Hill numbers = 2 exactly
    assert(got("A") == ((4L, 2L, 2.0, 2.0)), got.toString)
    // skewed 3:1 source: 1D = exp(snapped H), 2D = 16/10 exactly
    val h = Seq(0.75, 0.25)
      .map(p => math.floor(-p * math.log(p) * 1e12 + 0.5).toLong).sum
    val d1 = math.floor(math.exp(h / 1e12) * 1e6 + 0.5) / 1e6
    assert(got("B") == ((4L, 2L, d1, 1.6)), s"expected 1D=$d1: $got")
  }

  test("CorpusStats.lorenzGini: equal source 0, {0,2} source 0.5, (all) 0.375") {
    import spark.implicits._
    // A = {1, 1} tokens -> G 0; B = {0, 2} -> G 0.5;
    // (all) = {0, 1, 1, 2} -> G = 12/(2*16*1) = 0.375 (hand MAD form)
    val docs = Seq(("A", "x"), ("A", "y"), ("B", ""), ("B", "x y"))
      .toDF("source", "text")
    val got = CorpusStats.lorenzGini(docs, "text", "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got("A") == ((2L, 2L, 0.0)), got.toString)
    assert(got("B") == ((2L, 2L, 0.5)), got.toString)
    assert(got("(all)") == ((4L, 4L, 0.375)), got.toString)
    // an all-empty source has zero mass -> NULL gini, rows still emitted
    val z = CorpusStats.lorenzGini(
      Seq(("Z", ""), ("Z", " ")).toDF("source", "text"), "text", "source")
      .collect().map(r => r.getString(0) -> r.isNullAt(3)).toMap
    assert(z == Map("Z" -> true, "(all)" -> true), z.toString)
  }
}
