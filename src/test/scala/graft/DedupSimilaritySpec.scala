package graft

import org.apache.spark.sql.{functions => sf}
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

class DedupSimilaritySpec extends SparkFunSuite {
  import spark.implicits._

  test("Dedup.exact groups identical content, keeps min id") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("id", "t")
    val got = Dedup.exact(df, "id", Seq("t")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (3L, 1L)))
  }

  test("minHashLsh equals exhaustive jaccard pairs at the threshold (recall check)") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 120)
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exhaustive = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .filter($"jaccard" >= 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh == exhaustive)
  }

  test("minHashLsh bucket cap bounds skew (documented recall trade)") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 60)
    val capped = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.9, maxBucketSize = 2)
    val uncapped = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.9)
    assert(capped.count() <= uncapped.count())
  }

  test("simHashNearDup finds the planted near-duplicate only") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten")).toDF("id", "t")
    val pairs = Dedup.simHashNearDup(df, "id", "t", maxHamming = 12)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("hammingNearDup: exact budget boundary on hand signatures") {
    // base 0b0; 3 bits flipped (in, at the budget); 4 bits (out);
    // high-slice-only difference exercises the top (signed) slice
    val sigs = Seq(
      (1L, 0L), (2L, 7L /* hamming 3 */), (3L, 0xF0L /* hamming 4 */),
      (4L, 1L << 63 /* hamming 1, bit 63 */)).toDF("sid", "sig")
    val got = Dedup.hammingNearDup(sigs, "sid", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 3), (1L, 4L, 1)), got.toString)
  }

  test("matryoshkaRecall: full dim is exact, prefixes degrade gracefully") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val got = Similarity.matryoshkaRecall(emb, "vec_id", "embedding",
        sf.col("vec_id") < 8, k = 5, dims = Seq(4, 16, 64)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(4, 16, 64))
    assert(got.values.forall(_._1 == 8L)) // all 8 queries scored per dim
    // dim 64 IS the full vector: the sliced path must reproduce the
    // ground truth exactly
    assert(got(64)._2 == 1.0, got.toString)
    assert(got(4)._2 <= got(64)._2 && got(4)._2 >= 0.0)
    // a 4-dim prefix of a 64-dim embedding cannot be a perfect index
    // on this corpus — the curve must actually measure something
    assert(got(4)._2 < 1.0, got.toString)
  }

  test("aggTopK (k-bounded Aggregator) equals window-rank bruteForceTopK") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val a = Similarity.aggTopK(spark, emb, "vec_id", "embedding", sf.col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val b = Similarity.bruteForceTopK(emb, "vec_id", "embedding", sf.col("vec_id") < 5, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(a.sameElements(b))
  }

  test("lshTopK returns a subset ranking consistent with brute force on its candidates") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val got = Similarity.lshTopK(emb, "vec_id", "embedding", sf.col("vec_id") < 5, 5)
    // every query id present, ranks start at 1 and are dense per query
    val byQ = got.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to rows.length))
    }
  }

  test("connectedComponents labels every node with its component's min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents equals a union-find model on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // reference union-find
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x; while (parent.getOrElse(c, c) != c) { val t = parent(c); parent(c) = r; c = t }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // component label = min node id of the component
      val minOf = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
      val want = nodes.map(x => x -> minOf(find(x))).toMap
      val got = Dedup.connectedComponents(edges.toDF("a_id", "b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("connectedComponents past-bound parity: distributed finish + shuffle joins") {
    // bounded-specialization audit: force BOTH general paths on a graph
    // that needs several contraction rounds (one-hop min contraction
    // shortens a path by ~1 node per round — O(diameter), which this
    // spec pins) plus cliques, and require label-identical output.
    //  - localFinish = 0: the driver union-find exit never fires; the
    //    distributed contraction loop must converge on its own
    //  - broadcastCutoff = 0: label tables shuffle-join instead of
    //    broadcasting into the contraction
    val path = (0L until 8L).map(i => (i * 3, (i + 1) * 3)) // ids spread out
    val cliques = for (c <- 0 until 5; a <- 0 until 4; b <- a + 1 until 4)
      yield (1000L + c * 10 + a, 1000L + c * 10 + b)
    val edges = (path ++ cliques).toDF("a_id", "b_id")
    val fast = Dedup.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val general = Dedup.connectedComponents(edges, maxIter = 20,
        broadcastCutoff = 0L, localFinish = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(general == fast, "general path labels diverged from fast path")
    assert(fast(24L) == 0L && fast(1033L) == 1030L) // sanity: real components
    // non-convergence is LOUD, never silently under-merged labels
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, maxIter = 2,
        broadcastCutoff = 0L, localFinish = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("quantileProfile equals a sorted-list interpolation model") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(500)(i =>
      (s"g${i % 3}", math.floor(rnd.nextDouble() * 1000) / 10))
    val df = rows.toDF("g", "v")
    val got = graft.dq.QualityChecks.quantileProfile(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    for ((g, vsAll) <- rows.groupBy(_._1)) {
      val vs = vsAll.map(_._2).sorted
      val n = vs.length
      def q(p: Double): Double = {
        val pos = (n - 1) * p
        val lo = vs(pos.toInt)
        val hi = vs(math.ceil(pos).toInt)
        r4(lo + (hi - lo) * (pos - math.floor(pos)))
      }
      val row = got(g)
      assert(row.getAs[Double]("v_min") == r4(vs.head) &&
        row.getAs[Double]("v_max") == r4(vs.last), g)
      for ((c, p) <- Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95))
        assert(row.getAs[Double](c) == q(p), s"$g/$c")
    }
  }

  test("ivfTopK with nProbe == nCentroids equals exact brute force") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
        sf.col("vec_id") < 5, k = 5, nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        sf.col("vec_id") < 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(ivf.sameElements(brute))
  }

  test("containmentPairs multi-word mask path: vocab in (64, 256] verifies exactly") {
    // 100-token vocabulary forces the W=2 bitmask branch (the r13
    // widening); expected pairs computed by brute force in the test
    val words = (0 until 100).map(i => s"w$i")
    val docs = Seq(
      (1L, words.take(80).mkString(" ")),            // big set
      (2L, words.slice(10, 30).mkString(" ")),       // subset of 1
      (3L, words.slice(70, 100).mkString(" ")),      // straddles word 2 boundary
      (4L, (words.slice(76, 80) ++ words.slice(90, 96)).mkString(" ")), // partial
      (5L, words.slice(90, 96).mkString(" "))        // subset of 3 only
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val sets = Map(1L -> words.take(80).toSet, 2L -> words.slice(10, 30).toSet,
      3L -> words.slice(70, 100).toSet,
      4L -> (words.slice(76, 80) ++ words.slice(90, 96)).toSet,
      5L -> words.slice(90, 96).toSet)
    val want = (for {
      a <- sets.keys; b <- sets.keys if a != b
      if sets(a).subsetOf(sets(b))
    } yield (a, b)).toSet
    assert(got == want, s"got $got want $want")
    assert(want.contains((2L, 1L)) && want.contains((5L, 3L))) // the planted pairs
  }

  // 4 tight clusters of 12 vectors each (dim 8): members of a cluster
  // are near-parallel (cosine ~1 to each other), near-orthogonal to
  // the rest — every query's true top-k are its cluster mates.
  private def plantedClusters: org.apache.spark.sql.DataFrame =
    Seq.tabulate(48) { i =>
      val c = i % 4
      val v = Array.fill(8)(0.0f)
      v(c * 2) = 1.0f
      v(c * 2 + 1) = 0.01f * (i / 4 + 1)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")

  test("ivfPqTopK with full probing and corpus-wide rerank equals brute force") {
    val emb = plantedClusters
    def tup(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "rank", "n_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val ivfpq = tup(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      sf.col("vec_id") < 4, k = 5, nCentroids = 4, nProbe = 4,
      nSubspaces = 4, centroidsPerSub = 16, rerank = 48))
    val brute = tup(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      sf.col("vec_id") < 4, k = 5))
    assert(ivfpq.sameElements(brute))
  }

  test("ivfPqTopK recall on the planted clusters is 1.0 at nProbe = 1") {
    // cluster mates are near-identical vectors, so they all assign to
    // the same coarse cell as the query — one probe finds every true
    // neighbor, and the exact re-rank orders them like brute force
    val emb = plantedClusters
    val got = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        sf.col("vec_id") < 4, k = 5, nCentroids = 4, nProbe = 1,
        nSubspaces = 4, centroidsPerSub = 16, rerank = 20)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        sf.col("vec_id") < 4, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(got == truth)
    // and the neighbors really are the query's cluster mates
    assert(got.forall { case (q, n) => n % 4 == q % 4 })
  }

  test("ivfPqTopK returns dense ranks and the adc column on real embeddings") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val got = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      sf.col("vec_id") < 5, k = 5)
    val rows = got.collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { qr =>
      assert(qr.map(_.getInt(1)).sorted.sameElements(1 to qr.length))
    }
    assert(rows.forall(r => !r.isNullAt(4))) // adc present for every row
  }

  test("annRecall: full probing reads 1.0; partial probing stays in [0, 1]") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val full = Similarity.annRecall(emb, "vec_id", "embedding",
      sf.col("vec_id") < 5, k = 5, nCentroids = 8, nProbe = 8).collect()
    assert(full.length == 5)
    assert(full.forall(r => r.getAs[Long]("n_truth") == 5 &&
      r.getAs[Long]("n_hits") == 5 && r.getAs[Double]("recall") == 1.0),
      full.mkString(";"))
    val part = Similarity.annRecall(emb, "vec_id", "embedding",
      sf.col("vec_id") < 5, k = 5, nCentroids = 8, nProbe = 1).collect()
    assert(part.length == 5)
    assert(part.forall(r => r.getAs[Double]("recall") >= 0.0 &&
      r.getAs[Double]("recall") <= 1.0 &&
      r.getAs[Long]("n_hits") <= r.getAs[Long]("n_truth")))
  }

  test("ivfTopK with partial probing returns dense ranks per query") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val got = Similarity.ivfTopK(emb, "vec_id", "embedding",
      sf.col("vec_id") < 5, k = 5, nCentroids = 8, nProbe = 2)
    val byQ = got.collect().groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to rows.length))
    }
  }

  test("cosineNearDup is symmetric-free (a<b) and thresholded") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val got = Similarity.cosineNearDup(emb, "vec_id", "embedding", 0.3, idMax = 200)
    val rows = got.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.3))
  }

  test("TopKAgg sorted-insertion reduce/merge equals the sort-take model (100 cases)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val k = 1 + rnd.nextInt(6)
      val agg = new Similarity.TopKAgg(k)
      val xs = Seq.fill(1 + rnd.nextInt(50))(
        Similarity.Scored(0, rnd.nextInt(1000), rnd.nextInt(10) / 10.0))
      val (l, r) = xs.splitAt(rnd.nextInt(xs.length + 1))
      val got = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val want = xs.map(s => (s.cosine, s.nId))
        .sortBy { case (c, id) => (-c, id) }.take(k)
      assert(got == want, s"k=$k got $got want $want")
    }
  }

  test("distributed codebook path equals the literal path and keeps it off the driver") {
    val emb = Tables.load(spark, sf001, "embeddings").filter($"vec_id" < 300)
    // same parameters, both sides of the literal ceiling — the
    // DataFrame codebook (sample -> broadcast-join assignment ->
    // TopKAgg ranking) must reproduce the plan-literal kernel exactly
    val litTopK = Similarity.ivfTopK(emb, "vec_id", "embedding",
      sf.col("vec_id") < 5, k = 4, nCentroids = 12, nProbe = 3)
      .collect().map(_.toSeq)
    val dfTopK = Similarity.ivfTopK(emb, "vec_id", "embedding",
      sf.col("vec_id") < 5, k = 4, nCentroids = 12, nProbe = 3,
      maxLiteralCentroids = 4)
    assert(!dfTopK.queryExecution.executedPlan.toString.contains("nearestCentroids"),
      "distributed path still embeds a literal codebook")
    assert(dfTopK.collect().map(_.toSeq).sameElements(litTopK))
    // Lloyd refinement, both paths
    val litLloyd = Similarity.ivfTopK(emb, "vec_id", "embedding",
      sf.col("vec_id") < 5, k = 4, nCentroids = 8, nProbe = 2, lloydIters = 2)
      .collect().map(_.toSeq)
    val dfLloyd = Similarity.ivfTopK(emb, "vec_id", "embedding",
      sf.col("vec_id") < 5, k = 4, nCentroids = 8, nProbe = 2, lloydIters = 2,
      maxLiteralCentroids = 4).collect().map(_.toSeq)
    assert(dfLloyd.sameElements(litLloyd), "Lloyd-refined codebooks diverged")
    // pair enumeration
    val litPairs = Similarity.ivfNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.3, nCentroids = 12, nProbe = 3).collect().map(_.toSeq)
    val dfPairs = Similarity.ivfNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.3, nCentroids = 12, nProbe = 3, maxLiteralCentroids = 4)
      .collect().map(_.toSeq)
    assert(dfPairs.sameElements(litPairs))
    assert(litTopK.nonEmpty && litPairs.nonEmpty, "vacuous parity test")
  }

  test("ivfTopK Lloyd-refined codebook: recall >= sampling codebook on planted clusters") {
    val dim = 8
    val nClusters = 4
    val perCluster = 100
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // center c points along dims (2c, 2c+1); vectors = center + noise
    val rows = for (c <- 0 until nClusters; i <- 0 until perCluster) yield {
      val id = (c * perCluster + i).toLong
      val v = Seq.tabulate(dim) { d =>
        val base = if (d == 2 * c || d == 2 * c + 1) 1.0 else 0.0
        base + ((mix(id * 31 + d) >>> 40).toDouble / (1L << 24).toDouble - 0.5) * 0.2
      }
      (id, v)
    }
    val embDf = rows.toDF("vec_id", "embedding")
    val pred = sf.col("vec_id") % 37 === 0
    val truth = Similarity.bruteForceTopK(embDf, "vec_id", "embedding", pred, k = 10)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(lloyd: Int): Double = {
      val got = Similarity.ivfTopK(embDf, "vec_id", "embedding", pred, k = 10,
          nCentroids = nClusters, nProbe = 1, lloydIters = lloyd)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val r0 = recall(0)
    val r2 = recall(2)
    assert(r2 >= r0, s"refined recall $r2 < sampling recall $r0")
    assert(r2 > 0.9, s"refined recall $r2 too low on planted clusters")
  }

  test("bucketed near-dup pairs are an exact-verified subset of the brute answer") {
    val emb = Tables.load(spark, sf001, "embeddings")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairSet(
      Similarity.cosineNearDup(emb, "vec_id", "embedding", 0.4, idMax = Long.MaxValue))
    val srp = pairSet(Similarity.cosineNearDupBucketed(
      emb, "vec_id", "embedding", 0.4, bands = 24, bitsPerBand = 5))
    val ivf = pairSet(Similarity.ivfNearDupPairs(
      emb, "vec_id", "embedding", 0.4, nCentroids = 16, nProbe = 4))
    // every emitted pair is a true pair with the exact verified cosine
    assert(srp.subsetOf(exact), s"SRP emitted non-pairs: ${srp.diff(exact).take(3)}")
    assert(ivf.subsetOf(exact), s"IVF emitted non-pairs: ${ivf.diff(exact).take(3)}")
    // and recall is substantial at the tuned parameters (not vacuous)
    assert(exact.nonEmpty)
    assert(srp.size >= exact.size * 3 / 4, s"SRP recall ${srp.size}/${exact.size}")
    assert(ivf.size >= exact.size * 3 / 4, s"IVF recall ${ivf.size}/${exact.size}")
  }

  test("hardNegatives returns nearest neighbors excluding the query's own label") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val labels = emb.select(sf.col("vec_id").cast("long"), sf.col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Similarity.hardNegatives(spark, emb, "vec_id", "embedding",
      "label", sf.col("vec_id") < 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // no returned neighbor shares the query's label
    got.foreach { case (q, n, _) =>
      assert(labels(q) != labels(n), s"neighbor $n shares label with query $q")
    }
    // and each is the filtered slice of the unrestricted ranking: every
    // hard negative's cosine <= the same query's best unrestricted cosine
    val best = Similarity.aggTopK(spark, emb, "vec_id", "embedding",
      sf.col("vec_id") < 10, k = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    got.foreach { case (q, _, c) => assert(c <= best(q) + 1e-9) }
  }

  test("retrievalMetrics: planted geometry yields hand-computed MRR/recall/nDCG") {
    import spark.implicits._
    // query 0 (label 1); nearest = mislabeled X (label 2), then Y (label 1,
    // the only relevant), then Z. top-2 pattern [miss, hit]:
    // mrr = 1/2, recall = 1/1, nDCG = (1/log2(3)) / (1/log2(2)) = 0.6309
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.99f, 0.01f), 2), // X
      (2L, Array(0.95f, 0.05f), 1), // Y
      (3L, Array(0.0f, 1.0f), 2))   // Z
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.retrievalMetrics(spark, emb, "vec_id", "embedding",
      "label", sf.col("vec_id") === 0, k = 2).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) == 0L && row.getLong(1) == 1L)
    assert(row.getLong(2) == 1L && row.getLong(3) == 1L) // rel_total, hits
    assert(row.getDouble(4) == 0.5 && row.getDouble(5) == 1.0)
    assert(row.getDouble(6) == 0.6309, s"ndcg ${row.getDouble(6)}")
    // query 1 (label 2, at (0.99, 0.01)): nearest is query-0's (1,0) — a
    // miss — then Y (miss), relevant Z=(0,1) is OUTSIDE the top-2 window:
    // hits 0, mrr 0, recall 0, nDCG 0
    val p = Similarity.retrievalMetrics(spark, emb, "vec_id", "embedding",
      "label", sf.col("vec_id") === 1, k = 2).collect()(0)
    assert(p.getLong(2) == 1L && p.getLong(3) == 0L)
    assert(p.getDouble(4) == 0.0 && p.getDouble(5) == 0.0 && p.getDouble(6) == 0.0)
  }

  test("blockingQuality: hand-computed pairs, reduction, hot-block share") {
    import spark.implicits._
    // blocks: A x4 (6 pairs), B x2 (1 pair), C x1 (singleton), null x2
    val df = Seq("A", "A", "A", "A", "B", "B", "C", null, null).toDF("blk")
    val r = graft.operators.Dedup.blockingQuality(df, sf.col("blk")).collect()(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == 2L) // n_rows, n_unblocked
    assert(r.getLong(2) == 3L && r.getLong(3) == 1L) // n_blocks, n_singletons
    assert(r.getLong(4) == 4L && r.getLong(5) == 7L) // max_block, cand_pairs
    // all-pairs = 21; reduction = 1 - 7/21 = 0.666667; hot share = 6/7
    assert(r.getDouble(6) == 0.666667 && r.getDouble(7) == 0.857143, s"got $r")
  }

  test("truncationFidelity: planted tail flips the prefix ranking, full prefix is exact") {
    import spark.implicits._
    // query (1,0,0,0); E's tail mass demotes it in full-dim cosine but its
    // 2-prefix outranks C, so the d=2 top-2 swaps C for E: overlap 1 of 2
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)),   // A
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // C
      (3L, Array(0.95f, 0.05f, 1.0f, 1.0f))) // E
      .toDF("vec_id", "embedding")
    val got = Similarity.truncationFidelity(spark, emb, "vec_id", "embedding",
      sf.col("vec_id") === 0, k = 2, dims = Seq(2, 4)).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((2, 1L, 0.5), (4, 2L, 1.0)), s"got $got")
  }

  test("semanticDedup flags exactly the vectors with a lower-id cluster-mate above tau") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val tau = 0.35
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      nCentroids = 8, lloydIters = 1, tau = tau)
    // no cartesian anywhere: the pair scan must be the cluster-keyed join
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      "semanticDedup pair scan degenerated to a cartesian")
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // independently recompute the within-cluster witness from raw vectors
    val vecs = emb.select(sf.col("vec_id").cast("long"), sf.col("embedding")
        .cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val byCluster = rows.groupBy(_._2)
    rows.foreach { case (id, cl, isDup) =>
      val witness = byCluster(cl).exists { case (o, _, _) =>
        o < id && r4(cos(vecs(o), vecs(id))) >= tau
      }
      assert(witness == (isDup == 1), s"vec $id cluster $cl: flag $isDup, witness $witness")
    }
    // the run must actually exercise both outcomes
    assert(rows.exists(_._3 == 1) && rows.exists(_._3 == 0))
  }

  test("semanticDedup maxCellSize cap: bounded sub-cells, flags a subset of uncapped") {
    val emb = Tables.load(spark, sf001, "embeddings")
    def flags(cap: Int) = Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCentroids = 2, lloydIters = 0, tau = 0.3, maxCellSize = cap)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    val uncapped = flags(Int.MaxValue)
    val capped = flags(20) // 500 docs in ~2 cells -> heavy splitting
    // capping only LOSES witnesses (cross-sub-cell pairs), never invents
    assert(capped.count(_._2 == 1) < uncapped.count(_._2 == 1))
    capped.foreach { case (id, f) =>
      if (f == 1) assert(uncapped(id) == 1, s"vec $id flagged only under the cap")
    }
  }

  test("crossCorpusEmbedNearDup finds planted paraphrases, broadcast-only plan") {
    import spark.implicits._
    val dim = 16
    def basis(k: Int): Seq[Double] = Seq.tabulate(dim)(i => if (i == k) 1.0 else 0.0)
    val e0 = basis(0)
    // corpus 100 = near-copy of eval 10 (tiny perturbation, cosine ~1);
    // corpus 101..115 = orthogonal basis vectors (cosine 0 to eval)
    val near = e0.zipWithIndex.map { case (x, i) => x + (if (i == 1) 0.01 else 0.0) }
    val corpus = ((100L, near) +: (101L to 115L).map(i =>
      (i, basis((i % 15 + 1).toInt))).toSeq).toDF("vec_id", "embedding")
    val eval = Seq((10L, e0)).toDF("vec_id", "embedding")
    val got = Similarity.crossCorpusEmbedNearDup(corpus, eval, "vec_id", "embedding",
      threshold = 0.95, bands = 16, bitsPerBand = 4)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.contains((100L, 10L)), s"planted near-copy missed: ${rows.toSeq}")
    assert(rows.forall(_._1 == 100L), s"false positives above 0.95: ${rows.toSeq}")
    // scale contract: the probe join must broadcast the eval side — no
    // shuffle of the corpus, no cartesian
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"corpus must not shuffle or cross:\n$plan")
  }

  test("selectCanonical keeps the max (score, id) member per cluster") {
    import spark.implicits._
    val df = Seq(
      ("c1", 1L, 100L), ("c1", 2L, 300L), ("c1", 3L, 300L), // tie -> id 3
      ("c2", 7L, 50L)).toDF("cluster", "id", "len")
    val got = Dedup.selectCanonical(df, "cluster", "id", "len").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("c1", 3L, 3L, 300L), ("c2", 1L, 7L, 50L)))
  }

  test("prefixJaccardPairs generic prefix path (vocab > 64): equals brute force") {
    // 120 distinct words force the rarity-ordered prefix funnel (the
    // small-vocab corpora below exercise the 64-bit bitmask path)
    val rnd = new scala.util.Random(20260814)
    val vocab = Vector.tabulate(120)(i => s"w$i")
    val texts = scala.collection.mutable.ArrayBuffer[String]()
    for (i <- 0 until 40) {
      if (i > 0 && rnd.nextInt(4) == 0) texts += texts(rnd.nextInt(i))
      else if (i > 0 && rnd.nextInt(3) == 0) // near-dup: mutate one word
        texts += (texts(rnd.nextInt(i)).split(" ").toVector
          .updated(0, vocab(rnd.nextInt(vocab.size)))).mkString(" ")
      else texts += Seq.fill(6 + rnd.nextInt(12))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toSeq.toDF("doc_id", "text")
    val all = Dedup.ngramJaccardPairs(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val got = Dedup.prefixJaccardPairs(df, "doc_id", "text", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = all.filter(_._3 >= t).toSet
      assert(got == want, s"t=$t missing=${(want -- got).take(4)} " +
        s"extra=${(got -- want).take(4)}")
    }
  }

  test("prefixJaccardPairs completeness property: equals brute force on random corpora x thresholds") {
    val rnd = new scala.util.Random(20260813)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
    for (trial <- 1 to 3) {
      // duplicate-heavy: ~1/3 of docs copy an earlier doc's text exactly
      val texts = scala.collection.mutable.ArrayBuffer[String]()
      for (i <- 0 until 30) {
        if (i > 0 && rnd.nextInt(3) == 0) texts += texts(rnd.nextInt(i))
        else texts += Seq.fill(3 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toSeq.toDF("doc_id", "text")
      val all = Dedup.ngramJaccardPairs(df, "doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      for (t <- Seq(0.3, 0.5, 0.7, 0.85, 1.0)) {
        val got = Dedup.prefixJaccardPairs(df, "doc_id", "text", threshold = t)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val want = all.filter(_._3 >= t).toSet
        assert(got == want, s"trial=$trial t=$t missing=${(want -- got).take(4)} " +
          s"extra=${(got -- want).take(4)}")
      }
    }
  }

  test("prefixJaccardPairs is EXACT: equals the brute-force join, equi-join plan") {
    val docs = Tables.load(spark, sf001, "documents").filter($"doc_id" < 120)
    // a threshold low enough that candidate pruning has real work to do
    val t = 0.6
    val got = Dedup.prefixJaccardPairs(docs, "doc_id", "text", threshold = t)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "prefix filtering must plan as token-keyed equi joins")
    val gotRows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute-force reference over the same corpus slice (string sets;
    // xxhash64 collisions are impossible at this corpus size)
    val want = Dedup.ngramJaccardPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._3 >= t).toSet
    assert(gotRows == want,
      s"missing=${(want -- gotRows).take(5)} extra=${(gotRows -- want).take(5)}")
    assert(gotRows.nonEmpty, "slice should contain near-dup pairs")
  }

  test("editDistanceJoin: complete vs brute force at k=1 and k=2, equi-join plan") {
    import spark.implicits._
    val rows = Seq(
      (1L, "kitten"), (2L, "sitten"),  // ed 1 (substitution)
      (3L, "sittin"),                  // ed(2,3)=1, ed(1,3)=2
      (4L, "kitte"),                   // ed(1,4)=1 (deletion)
      (5L, "kittens"),                 // ed(1,5)=1 (insertion), ed(4,5)=2
      (6L, "banana"), (7L, "banana"),  // ed 0 duplicates still pair
      (8L, "zzzzzz"))                  // isolated
      .toDF("id", "s")
    def brute(k: Int) = {
      val local = Seq((1L, "kitten"), (2L, "sitten"), (3L, "sittin"), (4L, "kitte"),
        (5L, "kittens"), (6L, "banana"), (7L, "banana"), (8L, "zzzzzz"))
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      (for { (i, si) <- local; (j, sj) <- local if i < j
             d = lev(si, sj) if d <= k } yield (i, j, d.toLong)).toSet
    }
    for (k <- Seq(1, 2)) {
      val df = Dedup.editDistanceJoin(rows, "id", sf.col("s"), maxDist = k)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"k=$k must plan as a variant-hash equi join")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute(k), s"k=$k missing=${brute(k) -- got} extra=${got -- brute(k)}")
    }
  }

  test("dlDistanceJoin: transposition pairs at distance 1, full-DL kernel") {
    import spark.implicits._
    // the kernel is FULL Lowrance-Wagner DL, not OSA
    assert(graft.plans.Kernels.damerauLevenshtein(
      org.apache.spark.unsafe.types.UTF8String.fromString("CA"),
      org.apache.spark.unsafe.types.UTF8String.fromString("ABC")) == 2L)
    assert(graft.plans.Kernels.damerauLevenshtein(
      org.apache.spark.unsafe.types.UTF8String.fromString("teh"),
      org.apache.spark.unsafe.types.UTF8String.fromString("the")) == 1L)
    assert(graft.plans.Kernels.damerauLevenshtein(
      org.apache.spark.unsafe.types.UTF8String.fromString(""),
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")) == 3L)
    val rows = Seq(
      (1L, "teh cat"), (2L, "the cat"),  // adjacent swap: dl 1, lev 2
      (3L, "the bat"),                   // dl(2,3)=1 substitution
      (4L, "zzzzzz")).toDF("id", "s")
    val got = Dedup.dlDistanceJoin(rows, "id", sf.col("s"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L)), got.toString)
    // plain Levenshtein misses the swap pair at k=1
    val lev = Dedup.editDistanceJoin(rows, "id", sf.col("s"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lev == Set((2L, 3L)), lev.toString)
  }

  test("hashedWsNgramSeq keeps order and multiplicity; set variant sorts distinct") {
    val df = Seq(
      ("a b c a b c", 2),  // grams: ab bc ca ab bc — repeats kept, in order
      ("x y", 3),          // short doc: one whole-sequence gram
      ("   ", 2)           // empty after trim: no grams
    ).toDF("t", "n")
    val seqs = df.select(graft.functions.hashedWsNgramSeq($"t", 2).as("g"))
      .as[Seq[Long]].collect()
    assert(seqs(0).length == 5 && seqs(0)(0) == seqs(0)(3) && seqs(0)(1) == seqs(0)(4))
    assert(seqs(0).distinct.length == 3)
    val short = df.filter($"t" === "x y")
      .select(graft.functions.hashedWsNgramSeq($"t", 3)).as[Seq[Long]].head()
    assert(short.length == 1)
    val empty = df.filter(sf.trim($"t") === "")
      .select(graft.functions.hashedWsNgramSeq($"t", 2)).as[Seq[Long]].head()
    assert(empty.isEmpty)
    // the sorted-set variant of the same text: distinct and ascending
    val set = df.filter($"t".startsWith("a"))
      .select(graft.functions.hashedWsNgrams($"t", 2)).as[Seq[Long]].head()
    assert(set == seqs(0).distinct.sorted)
  }

  test("removeDupSpans cuts exactly the tokens covered by corpus-repeated n-grams") {
    // "p q r s" appears in docs 1 and 2 (cross-doc dup); doc 3 repeats
    // "m n" within itself (multiplicity dup); doc 4 is clean.
    val df = Seq(
      (1L, "p q r s unique1 tail1"),
      (2L, "head2 p q r s tail2"),
      (3L, "m n filler m n closer"),
      (4L, "completely novel text here")).toDF("id", "t")
    val got = Dedup.removeDupSpans(df, "id", "t", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4))).toList
    // n=4 grams of doc1: [p q r s][q r s unique1][r s unique1 tail1] — only
    // the first is repeated (doc2 has [p q r s]), covering tokens 0..3.
    assert(got(0) == ((1L, 6L, 4L, "unique1 tail1")))
    // doc2: dup gram starts at token 1, covers 1..4 -> head2 + tail2 survive
    assert(got(1) == ((2L, 6L, 4L, "head2 tail2")))
    // doc3: its 4-grams [m n filler m][n filler m n][filler m n closer] are
    // all unique in the corpus -> nothing cut (span dedup is n-gram-scoped;
    // the bigram repeat is below the gram width)
    assert(got(2) == ((3L, 6L, 0L, "m n filler m n closer")))
    assert(got(3) == ((4L, 4L, 0L, "completely novel text here")))
  }

  test("removeDupSpans within-doc multiplicity: a doc repeating its own n-gram is cut") {
    val df = Seq(
      (1L, "a b c d mid a b c d end"),
      (2L, "other words entirely distinct")).toDF("id", "t")
    val got = Dedup.removeDupSpans(df, "id", "t", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(4))).toList
    // gram [a b c d] occurs twice WITHIN doc 1: starts 0 and 5, covering
    // 0..3 and 5..8 -> "mid" (pos 4) and "end" (pos 9) survive
    assert(got(0) == ((1L, 8L, "mid end")))
    assert(got(1) == ((2L, 0L, "other words entirely distinct")))
  }

  test("jaroWinklerJoin: blocking bounds the pair space; threshold filters") {
    val df = Seq(
      (1L, "jonathan smith", "A"),
      (2L, "jonathon smith", "A"),  // near-dup of 1, same block
      (3L, "jonathan smith", "B"),  // identical to 1 but WRONG block: unseen
      (4L, "zzz completely other", "A")).toDF("id", "name", "blk")
    val got = Dedup.jaroWinklerJoin(df, "id", sf.col("name"), sf.col("blk"),
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("centroidSilhouette: separated clusters score high; a mislabeled point flags") {
    val good = Seq(
      (1L, 0, Seq(10f, 0f)), (2L, 0, Seq(10f, 1f)),
      (3L, 1, Seq(0f, 10f)), (4L, 1, Seq(1f, 10f)))
      .toDF("vec_id", "label", "embedding")
    val g = Similarity.centroidSilhouette(good, "label", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(g.forall(t => t._2 > 0.8 && t._3 == 0.0), g.mkString(";"))
    // swap one point's label: it is now far from its own centroid
    val bad = Seq(
      (1L, 0, Seq(10f, 0f)), (2L, 1, Seq(10f, 1f)), // 2 mislabeled
      (3L, 1, Seq(0f, 10f)), (4L, 1, Seq(1f, 10f)),
      (5L, 0, Seq(9f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val b = Similarity.centroidSilhouette(bad, "label", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    // exactly the mislabeled point (1 of label 1's 3 points) flags
    assert(b(0L) == 0.0 && b(1L) == 0.3333, s"neg_frac per label: $b")
  }

  test("cdcDuplicateChunks: shared content found despite a shifting prefix insertion") {
    // 600 varied chars shared; doc 2 inserts a prefix, shifting every
    // byte offset — fixed-size blocks would all differ, CDC re-syncs
    val shared = (1 to 120).map(i => s"tok${i * 7 % 97}").mkString(" ")
    val df = Seq(
      (1L, shared),
      (2L, "completely different preamble text first " + shared),
      (3L, "zz")) // shorter than the window: one whole-doc chunk
    .toDF("id", "t")
    val got = Dedup.cdcDuplicateChunks(df, "id", "t",
      window = 8, avgChunk = 64, minOcc = 2).collect()
    // at least one chunk of the shared region appears in BOTH docs
    assert(got.exists(_.getLong(3) == 2L),
      s"no cross-doc chunk found: ${got.mkString("; ")}")
    // chunks-per-doc sanity: chunk text re-assembles to the doc (no
    // gaps/overlaps) — checked via total lengths
    val fps = Dedup.cdcDuplicateChunks(df, "id", "t", minOcc = 1)
    val totalLen = fps.agg(sf.sum(sf.col("chunk_len") * sf.col("n_occ"))).collect()(0).getLong(0)
    assert(totalLen == df.collect().map(_.getString(1).length.toLong).sum)
  }

  test("kCenterSelect: farthest-point order on planted geometry, ties to smaller id") {
    val df = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 10f)), (3L, Seq(10f, 0f)),
      (4L, Seq(0f, 10f)), (5L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(df, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    // seed = min id; then the far corner (d2=200); then the 100-tie
    // breaks to id 3; the near-cluster point 5 is never picked
    assert(got == Seq((0, 1L, -1.0), (1, 2L, 200.0), (2, 3L, 100.0), (3, 4L, 100.0)))
  }

  test("winnowingFingerprints: identical docs share ALL fingerprints; short/empty docs degrade") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "just two"), // shorter than k=4: whole-sequence gram
      (4L, "   ")).toDF("id", "t") // empty after trim: nothing
    val fps = Dedup.winnowingFingerprints(df, "id", "t", k = 4, w = 2)
      .collect().groupBy(_.getLong(0)).map { case (k2, v) => (k2, v.map(_.getLong(1)).toSet) }
    assert(fps(1L) == fps(2L) && fps(1L).nonEmpty)
    assert(fps(3L).size == 1) // single whole-sequence gram -> one fingerprint
    assert(!fps.contains(4L))
  }

  test("winnowingPairs: planted shared span pairs; guarantee holds for spans >= k+w-1 tokens") {
    // docs 1 and 2 share a 9-token span (k=4, w=2 -> guarantee at 5);
    // doc 3 is disjoint vocabulary
    val df = Seq(
      (1L, "p q r s t u v w x one two three four five six"),
      (2L, "nine eight seven p q r s t u v w x ten eleven"),
      (3L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo")).toDF("id", "t")
    val pairs = Dedup.winnowingPairs(df, "id", "t", k = 4, w = 2,
      minShared = 1, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("winnowingPairs: df cap drops a boilerplate fingerprint before pairing") {
    // four identical boilerplate docs -> every fingerprint has df=4 >
    // maxDf=3 and must produce NO pairs (with the cap lifted, all
    // C(4,2) pairs appear)
    val boiler = "this page is auto generated content for testing only"
    val df = (1L to 4L).map(i => (i, boiler)).toDF("id", "t")
    val capped = Dedup.winnowingPairs(df, "id", "t", k = 4, w = 2,
      minShared = 1, maxDf = 3).count()
    val uncapped = Dedup.winnowingPairs(df, "id", "t", k = 4, w = 2,
      minShared = 1, maxDf = 50).count()
    assert(capped == 0 && uncapped == 6) // all C(4,2) pairs without the cap
  }

  test("Similarity.linearCka: zero-padded tail gives 1, orthogonal block < 1") {
    import spark.implicits._
    // all variance inside the first 2 dims: prefix-2 CKA is exactly 1
    val padded = (0 until 20).map { i =>
      (i.toLong, Array((i % 5 - 2).toFloat, (i % 3 - 1).toFloat, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val p = Similarity.linearCka(padded, "embedding", dims = 4,
      prefixes = Seq(2)).collect()
    assert(p.length == 1 && p(0).getAs[Double]("cka") == 1.0, p.mkString)
    assert(p(0).getAs[Long]("n_rows") == 20 && p(0).getAs[Long]("n_excluded") == 0)
    // independent variance in dims 3-4: the prefix misses geometry
    val split = (0 until 20).map { i =>
      (i.toLong, Array((i % 5 - 2).toFloat, 0f, (i % 7 - 3).toFloat,
        (i % 2).toFloat))
    }.toDF("vec_id", "embedding")
    val s = Similarity.linearCka(split, "embedding", dims = 4,
      prefixes = Seq(2)).collect()
    val cka = s(0).getAs[Double]("cka")
    assert(cka > 0.0 && cka < 0.9, s"expected partial similarity, got $cka")
    intercept[IllegalArgumentException] {
      Similarity.linearCka(padded, "embedding", dims = 4, prefixes = Seq(4))
    }
  }

  test("Similarity.pcaTopComponent recovers a planted dominant direction") {
    import spark.implicits._
    // direction d ∝ (3, 1, 0, 2) planted with large spread; small
    // deterministic noise on the other axes
    val dir = Array(3.0, 1.0, 0.0, 2.0)
    val rows = (0 until 40).map { i =>
      val t = (i - 20) * 0.1 // spread along dir
      val noise = Array(0.01 * (i % 3 - 1), 0.01 * (i % 5 - 2),
        0.01 * (i % 7 - 3), 0.01 * (i % 2))
      (i.toLong, (0 until 4).map(j => (t * dir(j) + noise(j)).toFloat).toArray)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.pcaTopComponent(df, "embedding", dims = 4)
      .collect()
    val v = got.map(_.getAs[Double]("loading"))
    val norm = math.sqrt(v.map(x => x * x).sum)
    val dNorm = math.sqrt(dir.map(x => x * x).sum)
    val cos = math.abs(v.zip(dir).map { case (a, b) => a * b }.sum / (norm * dNorm))
    assert(cos > 0.999, s"direction not recovered: cos=$cos v=${v.toSeq}")
    assert(got.head.getAs[Double]("explained_share") > 0.99,
      s"planted dominant direction must explain ~all variance: ${got.head}")
    assert(got.head.getAs[Long]("n_rows") == 40L)
    // a NaN row is excluded and counted, not propagated
    val withNaN = (rows :+ ((99L,
      Array(Float.NaN, 1f, 2f, 3f)))).toDF("vec_id", "embedding")
    val g2 = Similarity.pcaTopComponent(withNaN, "embedding", dims = 4).collect()
    assert(g2.head.getAs[Long]("n_rows") == 40L &&
      g2.head.getAs[Long]("n_excluded") == 1L)
  }

  test("Similarity.removeTopComponent strips a planted dominant direction") {
    import spark.implicits._
    // same planted geometry as the pcaTopComponent spec: vectors lie on
    // t·dir + tiny noise, so projecting out the recovered component
    // must remove ~all energy from the well-spread rows
    val dir = Array(3.0, 1.0, 0.0, 2.0)
    val rows = (0 until 40).map { i =>
      val t = (i - 20) * 0.1
      val noise = Array(0.01 * (i % 3 - 1), 0.01 * (i % 5 - 2),
        0.01 * (i % 7 - 3), 0.01 * (i % 2))
      (i.toLong, (0 until 4).map(j => (t * dir(j) + noise(j)).toFloat).toArray)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.removeTopComponent(df, "vec_id", "embedding", dims = 4)
      .collect()
    assert(got.length == 40)
    val byId = got.map(r => r.getAs[Long]("vec_id") -> r).toMap
    // the farthest-out vector (t = -2.0) is essentially pure component
    val far = byId(0L)
    assert(far.getAs[Double]("removed_frac") > 0.999,
      s"dominant direction not removed: $far")
    assert(far.getAs[Double]("n2_after") < 0.01 * far.getAs[Double]("n2_before"))
    // norms are non-negative, after <= before everywhere
    got.foreach { r =>
      assert(r.getAs[Double]("n2_after") >= 0.0 &&
        r.getAs[Double]("n2_after") <= r.getAs[Double]("n2_before") + 1e-9, r.toString)
    }
    // a NaN row is excluded from BOTH the component fit and the output
    val withNaN = (rows :+ ((99L,
      Array(Float.NaN, 1f, 2f, 3f)))).toDF("vec_id", "embedding")
    val g2 = Similarity.removeTopComponent(withNaN, "vec_id", "embedding", dims = 4)
    assert(g2.count() == 40L && !g2.collect().exists(_.getLong(0) == 99L))
  }

  test("Similarity.daviesBouldin: invariants and consistency of the index") {
    import spark.implicits._
    // two tight blobs along e1 and e2 (cosine-separable)
    val rows = (0 until 20).map { i =>
      val blob = i % 2
      val eps = 0.01f * (i / 2)
      val v = Array.fill(4)(0.0f)
      v(blob) = 1.0f
      v(2 + blob) = eps
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.daviesBouldin(df, "vec_id", "embedding",
      dims = 4, nCentroids = 2).collect()
    assert(got.nonEmpty && got.length <= 2)
    assert(got.map(_.getAs[Long]("n_members")).sum == 20)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rs = got.map(_.getAs[Double]("r"))
    assert(rs.forall(_ > 0.0), got.mkString(","))
    got.foreach { row =>
      assert(row.getAs[Double]("s_mean") >= 0.0)
      // db_index is the mean of the per-cluster r values, snapped
      assert(row.getAs[Double]("db_index") == r6(rs.sum / rs.length), row.toString)
    }
    // pure function of the data
    val again = Similarity.daviesBouldin(df, "vec_id", "embedding",
      dims = 4, nCentroids = 2).collect().map(_.toString).toSeq
    assert(again == got.map(_.toString).toSeq)
  }

  test("Similarity.hopkinsStatistic: clustered data scores high, grid data lower") {
    import spark.implicits._
    // two tight blobs far apart: real points have near-zero NN
    // distances, uniform probes in the bounding box land in the void
    val blobs = (0 until 40).map { i =>
      val c = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Array(c + 0.001f * (i / 2), c, c, c))
    }.toDF("vec_id", "embedding")
    val hb = Similarity.hopkinsStatistic(blobs, "vec_id", "embedding",
      dims = 4, m = 5).head()
    assert(hb.getAs[Long]("n_sample") == 5)
    val hStat = hb.getAs[Double]("hopkins")
    assert(hStat > 0.8, s"clustered corpus must score high: $hb")
    // an evenly spread grid has no structure: probes look like data
    val grid = (0 until 40).map { i =>
      (i.toLong, Array((i % 8).toFloat, (i / 8).toFloat,
        (i % 5).toFloat, (i % 7).toFloat))
    }.toDF("vec_id", "embedding")
    val hg = Similarity.hopkinsStatistic(grid, "vec_id", "embedding",
      dims = 4, m = 5).head().getAs[Double]("hopkins")
    assert(hg < hStat, s"grid ($hg) must score below blobs ($hStat)")
    // pure function of the data
    val again = Similarity.hopkinsStatistic(blobs, "vec_id", "embedding",
      dims = 4, m = 5).head().getAs[Double]("hopkins")
    assert(again == hStat)
  }

  test("Similarity.jlDistortion: exact norms, near-1 estimates, NaN exclusion") {
    import spark.implicits._
    val rows = (0 until 30).map { i =>
      (i.toLong, (0 until 16).map(j =>
        (math.sin(i * 16 + j + 1.0) * 2.0).toFloat).toArray)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.jlDistortion(df, "vec_id", "embedding",
      dims = 16, k = 8).collect()
    assert(got.length == 30)
    got.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val x = rows(id.toInt)._2
      val n2 = x.map(v => v.toDouble * v.toDouble).sum
      // n2_x is the exact squared norm (same fold order as the kernel)
      assert(math.abs(r.getAs[Double]("n2_x") - n2) < 1e-4, r.toString)
      // the 3/k-scaled estimate is a norm estimate, not garbage: the
      // uniform-plane estimator at k=8 stays within a loose band
      val d = r.getAs[Double]("distortion")
      assert(d > 0.05 && d < 5.0, s"distortion off the rails: $r")
    }
    // a NaN row is excluded, not propagated
    val withNaN = (rows :+ ((99L, Array.fill(16)(Float.NaN)))).toDF("vec_id", "embedding")
    val g2 = Similarity.jlDistortion(withNaN, "vec_id", "embedding", dims = 16, k = 8)
    assert(g2.count() == 30L)
    // determinism: the seeded planes make the whole output a pure function
    val again = Similarity.jlDistortion(df, "vec_id", "embedding", dims = 16, k = 8)
      .collect().map(_.toString).toSeq
    assert(again == got.map(_.toString).toSeq)
  }

  test("Dedup.fellegiSunter: multi-field evidence combines; weak pairs drop") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => sf}
    val df = Seq(
      (1L, 7, "cust aaa111", 500.00),
      (2L, 7, "cust bbb111", 500.40),  // vs 1: sfx+bal+cent all agree
      (3L, 7, "cust ccc222", 100.00),  // vs 1: only cent agrees -> dropped
      (4L, 8, "cust ddd111", 500.00))  // other block: never compared
      .toDF("id", "blk", "name", "bal")
    val fields = Seq(
      Dedup.LinkField("sfx", "name",
        (a, b) => sf.substring(a, -3, 3) === sf.substring(b, -3, 3), 0.9, 0.01),
      Dedup.LinkField("bal", "bal",
        (a, b) => sf.abs(sf.floor(a.cast("double") * 100 + 0.5) -
          sf.floor(b.cast("double") * 100 + 0.5)) <= 10000, 0.9, 0.15),
      Dedup.LinkField("cent", "bal",
        (a, b) => sf.pmod(sf.floor(a.cast("double") * 100 + 0.5), sf.lit(10)) ===
          sf.pmod(sf.floor(b.cast("double") * 100 + 0.5), sf.lit(10)), 0.95, 0.1))
    val got = Dedup.fellegiSunter(df, "id", Seq("blk"), fields).collect()
    assert(got.length == 1, s"only the full-evidence pair survives: ${got.toSeq}")
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getAs[Boolean]("agree_sfx") && r.getAs[Boolean]("agree_bal") &&
      r.getAs[Boolean]("agree_cent"))
    assert(r.getAs[String]("decision") == "match")
    // ln(90)+ln(6)+ln(9.5) = 8.542861...
    assert(math.abs(r.getAs[Double]("weight") - 8.542861) < 1e-4, r.toString)
  }

  test("Similarity.mmdLinear: hand 1-d value, identical groups 0, odd sample drops") {
    import spark.implicits._
    // A = {0,0,1,1}, B = {2,2,3,3}, gamma=0.25: within-pair kernels 1,
    // cross kernels exp(-1) -> h6 = 2e6 - 2*367879 per pair, mmd = 1.264242
    val df = (Seq((1L, "a", 0.0), (2L, "a", 0.0), (3L, "a", 1.0), (4L, "a", 1.0),
      (11L, "b", 2.0), (12L, "b", 2.0), (13L, "b", 3.0), (14L, "b", 3.0)))
      .toDF("id", "g", "x").select(sf.col("id"), sf.col("g"),
        sf.array(sf.col("x")).as("v"))
    val r = Similarity.mmdLinear(df, "id", "v", "g", "a", "b", gamma = 0.25).head()
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 4 &&
      r.getAs[Long]("n_pairs") == 2)
    assert(r.getAs[Double]("mmd2_linear") == 1.264242, r.toString)
    // identical distributions: h = k(x1,x2)+k(y1,y2)-k(x1,y2)-k(x2,y1) = 0
    val same = df.union(df.filter(sf.col("g") === "a")
      .select(sf.col("id") + 100L, sf.lit("c"), sf.col("v")))
    val r0 = Similarity.mmdLinear(same, "id", "v", "g", "a", "c", gamma = 0.25).head()
    assert(r0.getAs[Double]("mmd2_linear") == 0.0, r0.toString)
    // a trailing odd sample contributes to n_a but not to any pair
    val odd = df.union(Seq((5L, "a", 9.0)).toDF("id", "g", "x")
      .select(sf.col("id"), sf.col("g"), sf.array(sf.col("x")).as("v")))
    val ro = Similarity.mmdLinear(odd, "id", "v", "g", "a", "b", gamma = 0.25).head()
    assert(ro.getAs[Long]("n_a") == 5 && ro.getAs[Long]("n_pairs") == 2)
  }

  test("Similarity.mipsTopK: magnitude ranks where cosine would not") {
    import spark.implicits._
    // query [1,0]: dots 3 (id1), 0 (id2), 2 (id3) — id1 wins on
    // MAGNITUDE; under cosine id1 and id3x would tie-break differently
    val df = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(3.0f, 0.0f)),
      (2L, Seq(0.0f, 5.0f)), (3L, Seq(2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mipsTopK(spark, df, "vec_id", "embedding",
      sf.col("vec_id") === 0, k = 2).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("n_id"),
        r.getAs[Double]("dot")))
    assert(got.toSeq == Seq((1, 1L, 3.0), (2, 3L, 2.0)), got.mkString(";"))
  }

  test("Similarity.anisotropy: orthogonal 0, parallel 1, pooled 0.5 by identity") {
    import spark.implicits._
    // label a: [[1,0],[0,1]] orthogonal; label b: [[2,0],[1,0]] parallel
    val df = Seq(("a", Seq(1.0f, 0.0f)), ("a", Seq(0.0f, 1.0f)),
      ("b", Seq(2.0f, 0.0f)), ("b", Seq(1.0f, 0.0f)))
      .toDF("label", "embedding")
    val got = Similarity.anisotropy(df).collect()
      .map(r => r.getAs[String]("label") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Double]("mean_norm"),
          r.getAs[Double]("mean_cos"))).toMap
    assert(got("a") == ((2L, 1.0, 0.0)), got.toString)
    assert(got("b") == ((2L, 1.5, 1.0)), got.toString)
    // pooled: sum u = (3,1)e9 -> (10 - 4)/(4*3) = 0.5
    assert(got("(all)") == ((4L, 1.25, 0.5)), got.toString)
    // single-vector label: mean_cos NULL
    val one = Similarity.anisotropy(
      Seq(("c", Seq(1.0f, 1.0f))).toDF("label", "embedding")).head()
    assert(one.isNullAt(one.fieldIndex("mean_cos")), one.toString)
  }
}
