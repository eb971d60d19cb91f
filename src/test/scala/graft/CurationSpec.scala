package graft

import org.apache.spark.sql.{functions => sf}
import graft.operators._
import graft.sources.Tables

/** Specs for the curation operators added on top of the dedup/similarity
  * families: PII scrubbing, line-level dedup, stopword ratio, SCD2
  * history, label centroids, dedup-survivor corpus. */
class CurationSpec extends SparkFunSuite {
  import spark.implicits._

  test("Cleaning.scrubPii replaces emails/phones/ips and counts matches") {
    val df = Seq(
      (1L, "contact bob@example.com or 555-123-4567 now"),
      (2L, "server at 10.1.2.3 and mirror at 192.168.0.1"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = Cleaning.scrubPii(df, "text").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == "contact <EMAIL> or <PHONE> now")
    assert(out(0).getAs[Int]("n_email") == 1 && out(0).getAs[Int]("n_phone") == 1)
    assert(out(1).getAs[String]("text") == "server at <IP> and mirror at <IP>")
    assert(out(1).getAs[Int]("n_ip") == 2)
    assert(out(2).getAs[String]("text") == "nothing sensitive here")
    assert(out(2).getAs[Int]("n_email") + out(2).getAs[Int]("n_phone") +
      out(2).getAs[Int]("n_ip") == 0)
  }

  test("TextAnalysis.decontaminate flags only docs sharing an n-gram with the benchmark") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"), // 3 shared 8-grams
      (2L, "totally unrelated text with completely different words here now"),
      (3L, "short overlap")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "one two three four five six seven eight nine ten"),
      (101L, "short overlap")).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminate(docs, bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 3L -> 1L), s"got $got") // doc 2 clean
  }

  test("Dedup.crossCorpusNearDup equals the brute cross join at the threshold") {
    val d = Tables.load(spark, sf001, "documents").filter($"doc_id" < 150)
    val a = d.filter($"doc_id" % 2 === 1)
    val b = d.filter($"doc_id" % 2 === 0)
    val lsh = Dedup.crossCorpusNearDup(a, b, "doc_id", "text", threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val sh = (df: org.apache.spark.sql.DataFrame, t: String) => df.select(
      sf.col("doc_id").as(t + "_id"),
      graft.functions.hashedWsShingles(sf.col("text")).as("sh_" + t))
    val brute = sh(a, "a").join(sh(b, "b"))
      .filter(graft.functions.roundAt(
        graft.functions.jaccardSortedLong($"sh_a", $"sh_b"), 4) >= 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh == brute, s"missing=${(brute -- lsh).take(5)} extra=${(lsh -- brute).take(5)}")
    assert(lsh.nonEmpty, "corpus slice produced no cross pairs — test is vacuous")
  }

  test("Packing.packSequences two-level scan equals the global-window model") {
    val docs = Tables.load(spark, sf001, "documents")
    val got = Packing.packSequences(docs, "doc_id", "text",
      capacity = 512, bucketSize = 16).collect().map(_.toSeq)
    // model: plain global-order cumsum (the thing that doesn't scale)
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val model = docs.select(sf.col("doc_id"),
        graft.functions.tokenCount(sf.col("text")).cast("long").as("n_tokens"))
      .withColumn("pre", sf.coalesce(sf.sum("n_tokens").over(w), sf.lit(0L)))
      .select(sf.col("doc_id"), sf.col("n_tokens"),
        sf.expr("pre DIV 512").as("seq_id"),
        sf.pmod(sf.col("pre"), sf.lit(512L)).as("seq_offset"))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.sameElements(model))
    // a doc never starts past its sequence's capacity
    assert(got.forall(r => r(3).asInstanceOf[Long] < 512))
    // auto bucket sizing and a scanBound small enough to force the
    // recursive prefix levels must give the identical packing
    val rec = Packing.packSequences(docs, "doc_id", "text",
      capacity = 512, bucketSize = 2, scanBound = 16).collect().map(_.toSeq)
    assert(rec.sameElements(model), "recursive exclusivePrefix diverged")
    val auto = Packing.packSequences(docs, "doc_id", "text",
      capacity = 512).collect().map(_.toSeq)
    assert(auto.sameElements(model), "auto bucket sizing diverged")
  }

  test("Packing.planLevels bounds every scan level at 10^12 ids") {
    // pure arithmetic mirror of packSequences' level sizing: at a
    // trillion ids with auto bucketing, every table a global-order
    // window might scan stays within the scan bound, and auto
    // bucketing needs no recursion at all (one ~sqrt(n) level)
    val n = 1000L * 1000L * 1000L * 1000L
    val auto = Packing.planLevels(n - 1)
    assert(auto.forall(_ <= Packing.DefaultScanBound),
      s"auto levels exceed bound: $auto")
    assert(auto.size == 1, s"auto sizing should scan one level, got $auto")
    // a pathologically small explicit bucket recurses instead of
    // putting n/bucketSize rows on one task — every level bounded by
    // scanBound (global windows) or the sqrt span (partitioned windows)
    val forced = Packing.planLevels(n - 1, bucketSize = 64, scanBound = 1L << 20)
    assert(forced.size > 1, "expected recursion for tiny explicit buckets")
    assert(forced.last <= (1L << 20), s"final level unbounded: $forced")
    forced.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"levels must shrink: $forced")
    case _ => () }
  }

  test("Dedup.lineDedupKeepFirst keeps first occurrence of each line") {
    val df = Seq(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "beta\ndelta"),
      (3L, "alpha\ndelta\nbeta")).toDF("doc_id", "text")
    val out = Dedup.lineDedupKeepFirst(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 3 && out(1L).getAs[Long]("n_kept") == 3)
    assert(out(1L).getAs[String]("kept_text") == "alpha\nbeta\ngamma")
    assert(out(2L).getAs[Long]("n_kept") == 1 &&
      out(2L).getAs[String]("kept_text") == "delta")
    assert(out(3L).getAs[Long]("n_kept") == 0 &&
      out(3L).getAs[String]("kept_text") == "")
  }

  test("TextAnalysis.stopwordRatio counts lang-specific stopwords with multiplicity") {
    val df = Seq(
      (1L, "the cat and the dog", "en"),   // the, and, the -> 3/5
      (2L, "der hund ist gut", "de"),      // der, ist -> 2/4
      (3L, "", "en"),
      (4L, "xyz", "xx")).toDF("doc_id", "text", "lang")
    val m = TextAnalysis.stopwordRatio(df, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("stopword_ratio")).toMap
    assert(m(1L) == 0.6 && m(2L) == 0.5 && m(3L) == 0.0 && m(4L) == 0.0)
  }

  test("EventOps.scdType2 builds validity intervals over attribute runs") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "bronze", 1.0),
      (2L, "2024-01-02 00:00:00", 10L, "bronze", 1.0),
      (3L, "2024-01-03 00:00:00", 10L, "gold", 1.0),
      (4L, "2024-01-04 00:00:00", 10L, "bronze", 1.0),
      (5L, "2024-01-01 00:00:00", 20L, "silver", 1.0))
      .toDF("event_id", "s", "user_id", "event_type", "value")
      .withColumn("ts", sf.to_timestamp($"s")).drop("s")
    val rows = EventOps.scdType2(df).collect()
    val u10 = rows.filter(_.getLong(0) == 10L)
    assert(u10.map(_.getAs[String]("event_type")).toSeq == Seq("bronze", "gold", "bronze"))
    assert(u10.head.getAs[String]("valid_from") == "2024-01-01 00:00:00")
    assert(u10.head.getAs[String]("valid_to") == "2024-01-03 00:00:00")
    assert(u10.head.getAs[Int]("is_current") == 0 && u10.head.getAs[Long]("n_events") == 2)
    assert(u10.last.getAs[Int]("is_current") == 1 && u10.last.getAs[String]("valid_to") == null)
    val u20 = rows.filter(_.getLong(0) == 20L)
    assert(u20.length == 1 && u20.head.getAs[Int]("is_current") == 1)
  }

  test("Similarity.labelCentroids averages per (label, dim)") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(3.0f, 2.0f), 0),
      (3L, Array(5.0f, 5.0f), 1)).toDF("vec_id", "embedding", "label")
    val m = Similarity.labelCentroids(df, "label", "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Double]("centroid")).toMap
    assert(m((0, 0)) == 2.0 && m((0, 1)) == 1.0 && m((1, 0)) == 5.0)
  }

  test("minHashLshPairs exact-collapse edge cases") {
    // all-identical corpus: every pair, J = 1.0
    val same = (1L to 5L).map(i => (i, "a b c d e f g h")).toDF("doc_id", "text")
    val p1 = Dedup.minHashLshPairs(same, "doc_id", "text", 0.9).collect()
    assert(p1.length == 10 && p1.forall(_.getAs[Double]("jaccard") == 1.0))
    // same word SET through different word ORDER/multiplicity: still J=1
    val sameSet = Seq((1L, "x y z"), (2L, "z y x x"), (3L, "y z x")).toDF("doc_id", "text")
    val p2 = Dedup.minHashLshPairs(sameSet, "doc_id", "text", 0.9).collect()
    assert(p2.length == 3 && p2.forall(_.getAs[Double]("jaccard") == 1.0))
    // empty-text docs are mutual exact duplicates (empty set vs empty set)
    val empties = Seq((1L, ""), (2L, "   "), (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "text")
    val p3 = Dedup.minHashLshPairs(empties, "doc_id", "text", 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
    assert(p3 == Set((1L, 2L, 1.0)))
    // clusters over the same corpora inherit group connectivity
    val c1 = Dedup.nearDupClusters(same, "doc_id", "text", 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c1 == (1L to 5L).map(_ -> 1L).toMap)
    val c3 = Dedup.nearDupClusters(empties, "doc_id", "text", 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c3 == Map(1L -> 1L, 2L -> 1L))
    // single doc / no pairs: empty outputs, no crashes
    val solo = Seq((7L, "only doc here")).toDF("doc_id", "text")
    assert(Dedup.minHashLshPairs(solo, "doc_id", "text", 0.9).count() == 0)
    assert(Dedup.nearDupClusters(solo, "doc_id", "text", 0.9).count() == 0)
    assert(Dedup.dedupCorpus(solo, "doc_id", "text", 0.9).count() == 1)
  }

  test("Sampling.mixtureSample applies exact per-source budget thresholds") {
    // 'a': 20 rows x 5 = 100 weight, budget 1000 -> kept whole
    // 'b': zero budget -> dropped
    // 'c': 160 rows x 5 = 800 weight, default budget 200 -> 1/4 of buckets
    val df = (1L to 200L).map { i =>
      val src = if (i <= 20) "a" else if (i <= 40) "b" else "c"
      (i, src, 5L)
    }.toDF("id", "source", "w")
    val kept = Sampling.mixtureSample(df, "id", "source", $"w",
        Map("a" -> 1000L, "b" -> 0L), defaultBudget = 200L)
      .select("id").as[Long].collect().toSet
    assert((1L to 20L).forall(kept), "under-budget source must be kept whole")
    assert((21L to 40L).forall(i => !kept(i)), "zero-budget source must be dropped")
    // 'c' membership is the pure hash rule at threshold 200*10000 div 800
    def bucket(id: Long) = (((id % 2147483648L) * 2654435761L) % 4294967296L) % 10000
    val expectC = (41L to 200L).filter(i => bucket(i) < 2500).toSet
    assert(kept.filter(_ >= 41L) == expectC, "downsampled source must follow the hash rule")
    assert(expectC.nonEmpty && expectC.size < 160, "threshold must actually partition 'c'")
  }

  test("TextAnalysis.oovRate counts occurrences outside the deterministic top-V vocab") {
    // counts: x:4 y:3 a:1 b:1 -> V=2 vocab {x, y}; doc2's a b are OOV
    val df = Seq(
      (1L, "x x y y"),
      (2L, "x y a b"),
      (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 0L, 0.0)))
    assert(got(2L) == ((4L, 2L, 0.5)))
    assert(got(3L) == ((1L, 0L, 0.0)))
    // tie at the V boundary cuts by term text: with V=3, tie a/b at
    // count 1 resolves to 'a' -> only 'b' is OOV
    val got3 = TextAnalysis.oovRate(df, "doc_id", "text", vocabSize = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got3(2L) == 1L)
  }

  test("TextAnalysis.bigramLmScore equals the hand-computed add-one conditional NLL") {
    // corpus unigrams: a:3 b:2 c:1 solo:1 -> V=4 (the 1-token doc has no
    // bigram POSITION but its token still enters the vocabulary);
    // bigrams: (a,b):2 (b,a):1 (a,c):1
    val df = Seq(
      (1L, "a b a b"),
      (2L, "a c"),
      (3L, "solo")).toDF("doc_id", "text") // 1 token -> no bigram -> absent
    val got = TextAnalysis.bigramLmScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L))
    // doc1: -(2 ln((2+1)/(3+4)) + 1 ln((1+1)/(2+4))) / 3
    val d1 = -(2 * math.log(3.0 / 7) + math.log(2.0 / 6)) / 3
    assert(got(1L)._1 == 3L && got(1L)._2 == math.floor(d1 * 10000 + 0.5) / 10000)
    // doc2: -ln((1+1)/(3+4)) = ln 3.5
    assert(got(2L)._1 == 1L &&
      got(2L)._2 == math.floor(math.log(3.5) * 10000 + 0.5) / 10000)
  }

  test("Sampling.weightedHashSample follows the exact hash*W < 10000*budget*w rule") {
    // weights 1..100, W = 5050; budget 10 -> p_i = 10*w_i/5050
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "w")
    val kept = Sampling.weightedHashSample(df, "id", $"w", budget = 10L)
      .select("id").as[Long].collect().toSet
    def bucket(id: Long) = (((id % 2147483648L) * 2654435761L) % 4294967296L) % 10000
    val expect = (1L to 100L).filter(i => BigInt(bucket(i)) * 5050 < BigInt(100000) * i).toSet
    assert(kept == expect)
    assert(kept.nonEmpty && kept.size < 100, "rule must actually partition the rows")
    // p=1 cap is automatic: budget*w >= W keeps the row at every bucket
    val heavy = Seq((1L, 1L), (2L, 10000L)).toDF("id", "w")
    val keptHeavy = Sampling.weightedHashSample(heavy, "id", $"w", budget = 2L)
      .select("id").as[Long].collect().toSet
    assert(keptHeavy.contains(2L), "budget*w >= W must force inclusion")
    // zero weight is never kept, any budget
    val zw = Seq((1L, 0L), (2L, 5L)).toDF("id", "w")
    assert(!Sampling.weightedHashSample(zw, "id", $"w", budget = 1000000L)
      .select("id").as[Long].collect().contains(1L))
    // membership is partition-invariant
    val repart = Sampling.weightedHashSample(df.repartition(7), "id", $"w", budget = 10L)
      .select("id").as[Long].collect().toSet
    assert(repart == kept)
  }

  test("Dedup.dedupCorpus keeps unclustered docs plus one rep per cluster") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),        // dup of 1 -> dropped
      (3L, "totally different words here x y z q w")).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(df, "doc_id", "text", 0.9)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))
    // precomputed labels reuse: one funnel pass serves clusters AND corpus
    val labels = Dedup.nearDupClusters(df, "doc_id", "text", 0.9)
    val kept2 = Dedup.dedupCorpus(df, "doc_id", "text", 0.9, Some(labels))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 == kept, "clusterLabels reuse diverged from the direct path")
  }

  test("Sampling.topFractionByScore keeps the rank-defined top slice, ties included") {
    val df = Seq(
      // group a: 8 distinct scores; ceil(8 * .25) = 2 -> top 2 rows
      ("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3), ("a", 4L, 0.4),
      ("a", 5L, 0.5), ("a", 6L, 0.6), ("a", 7L, 0.7), ("a", 8L, 0.8),
      // group b: boundary tie at 0.5 — threshold lands on it, ALL ties kept
      ("b", 11L, 0.9), ("b", 12L, 0.5), ("b", 13L, 0.5), ("b", 14L, 0.5),
      ("b", 15L, 0.1), ("b", 16L, 0.1), ("b", 17L, 0.1), ("b", 18L, 0.1))
      .toDF("grp", "id", "score")
    val kept = Sampling.topFractionByScore(df, "grp", "score", 0.25)
      .select("id").as[Long].collect().toSet
    // a: ceil(2) -> scores {0.8, 0.7}; b: ceil(2) -> cum reaches 2 at 0.5,
    // every 0.5 tie kept
    assert(kept == Set(7L, 8L, 11L, 12L, 13L, 14L), s"got $kept")
  }

  test("TextAnalysis.dupNgramFraction measures corpus-shared n-grams per doc") {
    val ten = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10" // 3 distinct 8-grams
    val df = Seq(
      (1L, ten),                              // all 3 grams shared with doc 2
      (2L, ten),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"), // 3 grams, none shared
      (4L, "hello world"),                    // short -> whole text, shared w/ 5
      (5L, "hello world")).toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramFraction(df, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)) && got(2L) == ((3L, 3L, 1.0)), s"got $got")
    assert(got(3L) == ((3L, 0L, 0.0)))
    assert(got(4L) == ((1L, 1L, 1.0)) && got(5L) == ((1L, 1L, 1.0)))
  }

  test("Sampling.hashSplit is disjoint, exhaustive, and growth-stable") {
    val df = (1L to 2000L).toDF("id")
    val got = Sampling.hashSplit(df, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 2000, "every row gets exactly one split")
    val bySplit = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 1400 && bySplit("train") < 1800, s"$bySplit")
    // growth stability: rows keep their split when the corpus doubles
    val grown = Sampling.hashSplit((1L to 4000L).toDF("id"), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert((1L to 2000L).forall(i => grown(i) == got(i)),
      "existing rows must not migrate between splits")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4)) // sums to 0.9
    }
  }

  test("Cleaning.corpusDiff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new"),
      (5L, "text appeared")).toDF("doc_id", "text")
    val got = Cleaning.corpusDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 5: PRESENT in both with null -> non-null text — changed, not
    // added (digest nullity must not masquerade as row absence)
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added", 5L -> "changed"), s"got $got")
  }

  test("Cleaning.dedupDocLines keeps the first occurrence of each line, in order") {
    val df = Seq(
      (1L, "nav\nbody one\nnav\nbody two\nnav"),
      (2L, "a\n\nb\n\na"),   // repeated empty lines collapse too
      (3L, "unique"),
      (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Cleaning.dedupDocLines(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.get(1), r.get(2), r.getAs[String]("clean_text"))).toMap
    assert(got(1L) == ((5L, 3L, "nav\nbody one\nbody two")), s"got ${got(1L)}")
    assert(got(2L) == ((5L, 3L, "a\n\nb")), s"got ${got(2L)}")
    assert(got(3L) == ((1L, 1L, "unique")))
    // empty text is one (empty) line, kept; null text stays null
    assert(got(4L) == ((1L, 1L, "")))
    assert(got(5L) == ((null, null, null)), s"got ${got(5L)}")
  }

  test("TextAnalysis.chunkDocuments covers every token with the configured overlap") {
    val doc10 = (1 to 10).map("t" + _).mkString(" ")
    val df = Seq((1L, doc10), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, "doc_id", "text",
        chunkSize = 4, overlap = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 1: stride 3 -> chunks at 0,3,6 then tail at 9 -> nc = 1+ceil(6/3)=3
    val d1 = got.filter(_._1 == 1L).map(c => (c._2, c._4))
    assert(d1.toSeq == Seq((0, "t1 t2 t3 t4"), (1, "t4 t5 t6 t7"),
      (2, "t7 t8 t9 t10")), s"got ${d1.toSeq}")
    // doc 2 fits one window; the empty doc yields no chunks
    assert(got.filter(_._1 == 2L).map(_._4).toSeq == Seq("a b c"))
    assert(!got.exists(_._1 == 3L))
    // consecutive chunks share exactly `overlap` tokens
    d1.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(a.split(" ").takeRight(1).sameElements(b.split(" ").take(1)))
    }
  }

  test("TextAnalysis.blocklistTag counts token hits case-insensitively") {
    val df = Seq(
      (1L, "Buy now buy FREE stuff"),   // buy x2, free x1
      (2L, "clean document text"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistTag(df, "doc_id", "text",
        Seq("buy", "free", "winner"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) == ((3, 2, 1)), s"got $got") // 3 hits, 2 distinct terms
    assert(got(2L) == ((0, 0, 0)) && got(3L) == ((0, 0, 0)))
  }

  test("TextAnalysis.entropyStats equals hand-computed Shannon entropy") {
    val df = Seq(
      (1L, "a a a a"),       // one token type -> H_tok = 0
      (2L, "a b a b"),       // uniform over 2 -> H_tok = ln 2
      (3L, "aa ab"),         // chars (trimmed): a:3 b:1 space:1 over n=5
      (4L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.entropyStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "blank doc filtered")
    assert(got(1L)._1 == 4L && got(1L)._2 == 0.0)
    assert(got(2L)._2 == math.floor(math.log(2) * 10000 + 0.5) / 10000)
    // doc 3 tokens: aa, ab -> uniform over 2 -> ln 2; chars of "aa ab":
    // n=5, a:3, space:1, b:1 -> H = ln 5 - (3 ln 3)/5
    assert(got(3L)._2 == math.floor(math.log(2) * 10000 + 0.5) / 10000)
    val hch = math.log(5) - 3 * math.log(3) / 5
    assert(got(3L)._3 == 5L &&
      got(3L)._4 == math.floor(hch * 10000 + 0.5) / 10000)
  }

  test("TextAnalysis.bpePairCounts counts within-token adjacent pairs, deterministic cut") {
    val df = Seq(
      (1L, "ABC abc x"),   // lowercased: ab, bc twice; single-char token skipped
      (2L, "abd")          // ab again, bd once
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairCounts(df, "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // counts: ab=3, bc=2, bd=1 -> top-2 is ab, bc
    assert(got == List(("ab", 3L), ("bc", 2L)))
    // tie region: k=3 must cut deterministically by pair text
    val got3 = TextAnalysis.bpePairCounts(df, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got3 == List(("ab", 3L), ("bc", 2L), ("bd", 1L)))
  }

  test("TextAnalysis.gopherGate: each rule fires on its planted violation") {
    val good = (Seq.fill(6)("the quick brown foxes jumped over lazy dogs and cats")
      .mkString(" "))                       // 60 words, stopwords, all-alpha
    val df = Seq(
      (1L, good),
      (2L, good + " " + Seq.fill(20)("###").mkString(" ")), // symbol soup
      (3L, "- item one\n- item two\n- item three"),          // bullet lines
      (4L, good.replace("the", "zzz").replace("and", "yyy")), // no stopwords
      (5L, "too short")).toDF("doc_id", "text")
    val got = TextAnalysis.gopherGate(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(15), "good doc must pass") // pass col
    assert(!got(2L).getBoolean(10) && !got(2L).getBoolean(15)) // r_symbol
    assert(!got(3L).getBoolean(11) && !got(3L).getBoolean(15)) // r_bullet
    assert(!got(4L).getBoolean(14) && !got(4L).getBoolean(15)) // r_stopwords
    assert(!got(5L).getBoolean(8) && !got(5L).getBoolean(15))  // r_word_count
  }

  test("TextAnalysis.langMixture: code-switched doc splits into its chunk languages") {
    import spark.implicits._
    // 16 en-stopword tokens then 16 es-stopword tokens -> exactly 2 chunks
    val en = Seq.fill(8)("the is").mkString(" ")
    val es = Seq.fill(8)("el no").mkString(" ")
    val df = Seq(
      (1L, en + " " + es),  // mixed: en chunk + es chunk
      (2L, en),             // pure en, one chunk
      (3L, "")).toDF("doc_id", "text") // empty drops
    val got = TextAnalysis.langMixture(df, "doc_id", "text", chunkTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, "es", 0.5, true), // tie 1-1 -> lexicographically larger code
      (2L, 1L, 1L, "en", 1.0, false)), s"got $got")
  }

  test("TextAnalysis.readability: hand-computed FK grade and Reading Ease") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat. it ran!"), // 5 words, 5 syllables, 2 sentences
      (2L, "xyz zz."),              // vowel-less word floors at 1 syllable
      (3L, "   ")).toDF("doc_id", "text") // blank drops
    val got = TextAnalysis.readability(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    // doc1: wps=2.5 spw=1 -> fk = .39*2.5+11.8-15.59 = -2.815;
    //       ease = 206.835-1.015*2.5-84.6 = 119.6975
    // doc2: 2 words ("xyz" has y; "zz." floors), 1 sentence -> fk = -3.01,
    //       ease = 120.205
    assert(got == Seq(
      (1L, 5L, 2L, 5L, -2.815, 119.6975),
      (2L, 2L, 1L, 2L, -3.01, 120.205)))
  }

  test("TextAnalysis.readability2: hand-computed fog/SMOG/LIX/RIX") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat. it ran!"),      // 5 words, 2 sentences, 0 complex, 0 long
      (2L, "considerable effort again."), // 1 complex (5 syl), 1 long (12 ch)
      (3L, "   ")).toDF("doc_id", "text") // blank drops
    val got = TextAnalysis.readability2(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8))).toSeq
    // doc1: fog = .4*2.5 = 1.0, smog = 3.1291 (sqrt 0), lix = 2.5, rix = 0
    // doc2: fog = .4*(3 + 100/3) = 14.5333, smog = 1.0430*sqrt(30)+3.1291
    //       = 8.8418, lix = 3 + 100/3 = 36.3333, rix = 1.0
    assert(got == Seq(
      (1L, 5L, 2L, 0L, 0L, 1.0, 3.1291, 2.5, 0.0),
      (2L, 3L, 1L, 1L, 1L, 14.5333, 8.8418, 36.3333, 1.0)), s"got $got")
  }

  test("TextAnalysis.c4Gate: line rules drop, page rules fail") {
    import spark.implicits._
    val goodLine = "this line has at least five words."
    val df = Seq(
      // 3 good lines -> 3 sentences, passes
      (1L, s"$goodLine\n$goodLine\n$goodLine"),
      // js line + no-terminal line + short line all dropped -> 2 kept
      (2L, s"$goodLine\nenable JavaScript to view this content.\n" +
        s"no terminal punctuation on this line\nshort line.\n$goodLine"),
      // page rules: lorem ipsum / curly brace fail despite good lines
      (3L, s"$goodLine\n$goodLine\nlorem ipsum dolor sit amet goes here.\n$goodLine"),
      (4L, s"$goodLine\n$goodLine\nfunction f() { return 1; }\n$goodLine"),
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.c4Gate(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("pass") &&
      got(1L).getAs[Long]("n_kept_lines") == 3L &&
      got(1L).getAs[Long]("n_sentences") == 3L)
    val d2 = got(2L)
    assert(d2.getAs[Long]("n_kept_lines") == 2L &&
      d2.getAs[Long]("n_js_lines") == 1L &&
      !d2.getAs[Boolean]("pass")) // only 2 sentences survive
    assert(got(3L).getAs[Boolean]("has_lorem_ipsum") && !got(3L).getAs[Boolean]("pass"))
    assert(got(4L).getAs[Boolean]("has_curly") && !got(4L).getAs[Boolean]("pass"))
    assert(got(5L).getAs[Long]("n_kept_lines") == 0L && !got(5L).getAs[Boolean]("pass"))
    // transform identity: doc2's kept page is exactly the two good lines
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$goodLine\n$goodLine".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d2.getAs[String]("kept_md5") == expectMd5)
  }

  test("TextAnalysis.compressionRatio: repetition compresses, diverse text doesn't") {
    import spark.implicits._
    val spam = Seq.fill(200)("buy cheap meds now").mkString(" ")
    // high-entropy "prose": md5 hex blocks (deterministic, incompressible)
    val md = java.security.MessageDigest.getInstance("MD5")
    val prose = (1 to 150).map(i =>
      md.digest(s"block$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .mkString(" ")
    val df = Seq((1L, spam), (2L, prose), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val spamRatio = got(1L).getAs[Double]("compression_ratio")
    val proseRatio = got(2L).getAs[Double]("compression_ratio")
    assert(spamRatio < 0.1, s"pure repetition must compress hard: $spamRatio")
    assert(proseRatio > 5 * spamRatio && proseRatio > 0.4,
      s"high-entropy text must compress far less: $proseRatio vs $spamRatio")
    assert(got(3L).getAs[Long]("n_bytes") == 0L && got(3L).isNullAt(3))
    // determinism: same input, same length
    val again = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again(1L) == got(1L).getLong(2))
  }

  test("QualityChecks.hllSketches: estimate near exact; merge == full-corpus sketch") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (s"s${i % 3}", i % 700)).toDF("src", "v")
    val exact = df.groupBy("src").agg(sf.countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = graft.dq.QualityChecks.hllEstimates(
      graft.dq.QualityChecks.hllSketches(df, "src", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / n < 0.05,
        s"estimate off >5% for $k: ${est(k)} vs $n")
    }
    // incremental maintenance: sketch(half1) merged with sketch(half2)
    // stays within the sketch's error bounds of the exact count (the
    // union operator is algebraic but not state-identical to a
    // one-shot sketch, so estimate-level parity is the contract)
    val h1 = graft.dq.QualityChecks.hllSketches(df.filter($"v" % 2 === 0), "src", "v")
    val h2 = graft.dq.QualityChecks.hllSketches(df.filter($"v" % 2 =!= 0), "src", "v")
    val merged = graft.dq.QualityChecks.hllEstimates(
      graft.dq.QualityChecks.hllMerge(h1, h2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n).toDouble / n < 0.05,
        s"merged estimate off >5% for $k: ${merged(k)} vs $n")
    }
  }

  test("Cleaning.encodingAudit: planted damage flags, clean text doesn't") {
    import spark.implicits._
    val df = Seq(
      (1L, "perfectly clean ascii text."),
      (2L, "broken \uFFFD char and bell \u0007 here"),
      (3L, "caf\u00C3\u00A9 and \u00E2\u20AC\u0153quoted\u00E2\u20AC\u009D"),
      (4L, "nbsp\u00A0separated\u00A0words"),
      // legitimate Latin-1 letters followed by ASCII: NOT mojibake \u2014
      // the two-byte signature (lead + continuation char) must gate
      (5L, "S\u00C3o Paulo: \u00C2ge et libert\u00E9")).toDF("doc_id", "text")
    val got = Cleaning.encodingAudit(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got(1L).getAs[Boolean]("flag_encoding") &&
      got(1L).getAs[Double]("suspect_ratio") == 0.0)
    assert(got(2L).getAs[Long]("n_replacement") == 1L &&
      got(2L).getAs[Long]("n_control") == 1L &&
      got(2L).getAs[Boolean]("flag_encoding"))
    assert(got(3L).getAs[Long]("n_mojibake") == 3L &&
      got(3L).getAs[Boolean]("flag_encoding"))
    assert(got(4L).getAs[Long]("n_nbsp") == 2L &&
      !got(4L).getAs[Boolean]("flag_encoding")) // nbsp alone is residue, not damage
    assert(got(5L).getAs[Long]("n_mojibake") == 0L &&
      !got(5L).getAs[Boolean]("flag_encoding"),
      s"clean Portuguese/French must not flag: ${got(5L)}")
  }

  test("Cleaning.hostProfile: registered-domain rollup with malformed bucket") {
    import spark.implicits._
    val df = Seq(
      "https://a.example.com/1", "https://b.example.com/2",
      "http://a.example.com/3", "https://shop.example.co.uk/x",
      "https://192.168.0.1/ip", "garbage").toDF("url")
    val got = Cleaning.hostProfile(df, "url").collect()
      .map(r => (Option(r.getString(0)).getOrElse("NULL"), r.getLong(1),
        r.getLong(2), r.getDouble(3))).toSeq
    // volume desc, then domain; IP + garbage both land in the NULL row
    assert(got == Seq(
      ("example.com", 3L, 2L, 0.666667),
      ("NULL", 2L, 1L, 0.5),
      ("example.co.uk", 1L, 1L, 1.0)), s"got $got")
  }

  test("Cleaning.urlBlocklistFlag: domain OR host match, malformed never blocked") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://spam.example.com/x"),   // domain blocked
      (2L, "https://Bad-Host.evil.net/y"),  // exact host blocked (case-insens)
      (3L, "https://fine.example.org/z"),
      (4L, "not a url")).toDF("id", "url")
    val got = Cleaning.urlBlocklistFlag(df, "url",
        Seq("example.com", "bad-host.evil.net")).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("flag_blocked")).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false),
      got.toString)
  }

  test("Cleaning.urlDedup: normalization collapses equivalent URLs, keeps min id") {
    import spark.implicits._
    val df = Seq(
      (5L, "https://Example.com:443/a?q=1#frag1"),
      (2L, "https://example.com/a?q=1#frag2"),   // same after norm -> survivor
      (3L, "https://example.com/a?q=2"),          // different query survives
      (4L, "http://example.com:80"),              // default port + empty path
      (6L, "http://example.com/"),
      (7L, "broken url"), (8L, "broken url"),     // malformed dedup among selves
      (9L, "also broken")).toDF("id", "url")
    val got = Cleaning.urlDedup(df, "id", "url").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got == Seq(
      (2L, "https://example.com/a?q=1"),
      (3L, "https://example.com/a?q=2"),
      (4L, "http://example.com/"),
      (7L, "broken url"),
      (9L, "also broken")), s"got $got")
  }

  test("TextAnalysis.boilerplatePrefixes: case/space-folded threshold; empty drops") {
    val df = Seq(("s1", "Hello World foo"), ("s1", "hello   world bar"),
      ("s1", "other text"), ("s1", "   ")).toDF("source", "text")
    val out = TextAnalysis.boilerplatePrefixes(df, "source", "text",
      nTokens = 2, phi = 0.5).collect()
    // 3 counted docs (blank drops); only "hello world" clears 50%
    assert(out.length == 1, out.mkString(";"))
    val r = out(0)
    assert(r.getAs[String]("prefix") == "hello world" &&
      r.getAs[Long]("n_docs") == 2 && r.getAs[Long]("n_source_docs") == 3 &&
      r.getAs[Double]("share") == 0.666667, r.toString)
    // exact-boundary share == phi must PASS (>= semantics)
    val half = Seq(("s2", "a b c"), ("s2", "a b d")).toDF("source", "text")
    val rh = TextAnalysis.boilerplatePrefixes(half, "source", "text",
      nTokens = 2, phi = 1.0).head()
    assert(rh.getAs[Long]("n_docs") == 2 && rh.getAs[Double]("share") == 1.0)
  }

  test("Dedup.effectiveSampleSize: sum_weight = group count; Kish prices dispersion") {
    val docs = Seq(
      (1L, "s1", "alpha beta gamma"), (2L, "s1", "alpha beta gamma"),
      (3L, "s1", "unique text here"),
      (4L, "s2", "dup dup"), (5L, "s2", "dup dup")).toDF("doc_id", "source", "text")
    val got = Dedup.effectiveSampleSize(docs, "doc_id", "text", "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    // s1 weights (0.5, 0.5, 1): sum_w = 2 groups, ESS = 4/1.5 = 2.6667,
    // deff = 1.125 (dispersion); s2 (0.5, 0.5): uniform weights ->
    // ESS = n = 2, deff = 1 even though everything is duplicated —
    // the group count (sum_weight = 1) carries the dedup story there
    assert(got("s1") == ((3L, 2.0, 2.6667, 0.888889, 1.125)), got.toString)
    assert(got("s2") == ((2L, 1.0, 2.0, 1.0, 1.0)), got.toString)
    assert(got("(all)") == ((5L, 3.0, 4.5, 0.9, 1.111111)), got.toString)
  }

  test("Dedup.dedupSavings: duplicate pair charges the non-canonical doc's tokens") {
    val docs = Seq(
      (1L, "s1", "alpha beta gamma delta"),
      (2L, "s1", "alpha beta gamma delta"), // exact dup of doc 1
      (3L, "s1", "unrelated totally different words here"),
      (4L, "s2", "lonely single doc")).toDF("doc_id", "source", "text")
    val got = Dedup.dedupSavings(docs, "doc_id", "text", "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    // s1: 13 tokens, doc 2 (4 tokens) charged as removed -> 4/13
    assert(got("s1") == ((3L, 13L, 1L, 4L, 0.307692)), got.toString)
    assert(got("s2") == ((1L, 3L, 0L, 0L, 0.0)), got.toString)
  }

  test("TextAnalysis.scriptMixing: homoglyph words flagged, cross-word bilingual not") {
    val df = Seq(
      ("s1", "login to pаypal now"), // Cyrillic а INSIDE a Latin word
      ("s1", "чисто русский текст here"), // bilingual ACROSS words: legitimate
      ("s1", "plain english text"),
      ("s2", "αlpha test"), // Greek-Latin word
      // extended-Cyrillic homoglyphs OUTSIDE а-я (the classic evasion
      // set the narrow class passed): і U+0456, ѕ U+0455, ё U+0451
      ("s3", "vіsa card"), // Ukrainian і inside "visa"
      ("s3", "microѕoft login"), // Cyrillic ѕ inside "microsoft"
      ("s3", "aktionёn page")) // ё inside a Latin word
      .toDF("source", "text")
    val got = TextAnalysis.scriptMixing(df, "source", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(got("s1") == ((3L, 1L, 1L, 0.333333)), got.toString)
    assert(got("s2") == ((1L, 1L, 1L, 1.0)), got.toString)
    assert(got("s3") == ((3L, 3L, 3L, 1.0)), got.toString)
  }

  test("TextAnalysis.homoglyphSkeletonDedup: spoofed copies collapse, case folds") {
    val df = Seq(
      (1L, "login to paypal portal"),
      (2L, "login to pаypal portal"), // Cyrillic а -> same group
      (3L, "LOGIN TO PAYPAL PORTAL"), // case folds, not spoofed
      (4L, "vіsa card"), // Cyrillic і
      (5L, "visa card"),
      (6L, "unrelated text")).toDF("doc_id", "text")
    val got = TextAnalysis.homoglyphSkeletonDedup(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 1L), (4L, 2L, 1L), (6L, 1L, 0L)), got.toString)
  }

  test("TextAnalysis.stripBoilerplatePrefixes: flagged prefix removed, short doc empties") {
    val df = Seq(
      (1L, "s1", "SUBSCRIBE NOW to read the article body one"),
      (2L, "s1", "subscribe now to read the article body two"),
      (3L, "s1", "an organic document body"),
      (4L, "s1", "subscribe now"), // flagged prefix IS the whole doc
      (5L, "s2", "subscribe now but unique in s2")) // share < 2 docs in s2
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.stripBoilerplatePrefixes(df, "doc_id", "source",
        "text", nTokens = 2, phi = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getAs[String]("text"))).toMap
    // case-insensitive prefix match, original case kept in the body
    assert(got(1L) == ((true, "to read the article body one")), got.toString)
    assert(got(2L) == ((true, "to read the article body two")), got.toString)
    assert(got(3L) == ((false, "an organic document body")), got.toString)
    assert(got(4L) == ((true, "")), got.toString)
    assert(got(5L) == ((false, "subscribe now but unique in s2")), got.toString)
  }

  test("EventOps.rfmSegments: hand 3-user quintile codes and segments") {
    val rows = Seq(
      (1L, "2024-01-10 00:00:00", 1L, "purchase", 10.0),
      (2L, "2024-01-10 01:00:00", 1L, "purchase", 20.0),
      (3L, "2024-01-09 00:00:00", 2L, "purchase", 100.0),
      (4L, "2024-01-10 00:00:00", 3L, "purchase", 5.0),
      (5L, "2024-01-10 02:00:00", 3L, "view", 1.0)) // non-purchase ignored
    val ev = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(sf.col("event_id"), sf.col("ts_s").cast("timestamp").as("ts"),
        sf.col("user_id"), sf.col("event_type"), sf.col("value"))
    val got = EventOps.rfmSegments(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Double]("monetary"), r.getAs[String]("segment"))).toMap
    // ranks (metric, user) asc; q = (rk-1)*5 div 3 + 1; R flipped
    assert(got(1L) == ((0L, 2L, 30.0, "542")), got.toString)
    assert(got(2L) == ((1L, 1L, 100.0, "214")), got.toString)
    assert(got(3L) == ((0L, 1L, 5.0, "421")), got.toString)
  }
}
