package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Kernels

/** Model-based property tests for the JVM kernels: each kernel checked
  * against a straightforward Scala reimplementation over seeded random
  * inputs (deterministic — no flakes). JVM-level (GenericArrayData);
  * the codegen/StaticInvoke integration is covered by the query suite.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "tok", "longer")

  private def strArray(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def dblArray(xs: Seq[Double]) =
    new GenericArrayData(xs.toArray[Any])
  private def randWords(n: Int) = Seq.fill(rnd.nextInt(n + 1))(vocab(rnd.nextInt(vocab.size)))

  test("jaccard kernel equals set-model Jaccard (200 random cases)") {
    for (_ <- 1 to 200) {
      val xs = randWords(12)
      val ys = randWords(12)
      val (sx, sy) = (xs.toSet, ys.toSet)
      val expected =
        if (sx.isEmpty && sy.isEmpty) 1.0
        else (sx & sy).size.toDouble / (sx | sy).size
      assert(Kernels.jaccard(strArray(xs), strArray(ys)) == expected,
        s"xs=$xs ys=$ys")
    }
  }

  test("hashedWsShingles equals hashSetSorted over regex-split tokens (200 cases)") {
    val wsChars = Seq(' ', '\t', '\n', '', '\f', '\r')
    for (_ <- 1 to 200) {
      val parts = randWords(10)
      val text = parts.map(w =>
        (" " * rnd.nextInt(2)) + w + wsChars(rnd.nextInt(wsChars.size))).mkString +
        (if (rnd.nextBoolean()) "  " else "")
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val expected = Kernels.hashSetSorted(strArray(toks.distinct))
      val got = Kernels.hashedWsShingles(UTF8String.fromString(text))
      assert(got.toLongArray.toSeq == expected.toLongArray.toSeq, s"text=${text.map(_.toInt)}")
    }
    // empty / all-whitespace inputs -> empty set
    assert(Kernels.hashedWsShingles(UTF8String.fromString("")).numElements() == 0)
    assert(Kernels.hashedWsShingles(UTF8String.fromString(" \t\n ")).numElements() == 0)
  }

  test("hashedWsNgrams: gram-set size and identity match the string model (200 cases)") {
    def stringGrams(toks: Seq[String], n: Int): Set[Seq[String]] =
      if (toks.size < n) Set(toks)
      else toks.sliding(n).map(_.toSeq).toSet
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(4)
      val toksA = randWords(10)
      val text = toksA.mkString(if (rnd.nextBoolean()) " " else "  ")
      val got = Kernels.hashedWsNgrams(UTF8String.fromString(text), n)
      // distinct-count parity with the string-built gram set
      assert(got.numElements() == stringGrams(toksA, n).size,
        s"toks=$toksA n=$n")
      // identity: same token sequence under different whitespace -> same hashes
      val got2 = Kernels.hashedWsNgrams(
        UTF8String.fromString(toksA.mkString("\t") + "\n"), n)
      assert(got.toLongArray.toSeq == got2.toLongArray.toSeq, s"toks=$toksA n=$n")
    }
    // cross-text identity: shared grams hash equal, so set intersection
    // sizes match the string model too
    val a = Kernels.hashedWsNgrams(UTF8String.fromString("a b c d"), 3).toLongArray.toSet
    val b = Kernels.hashedWsNgrams(UTF8String.fromString("a b c x"), 3).toLongArray.toSet
    assert((a & b).size == 1) // "a b c"
    // short/empty docs collapse to one whole-text gram
    assert(Kernels.hashedWsNgrams(UTF8String.fromString("z z"), 3).numElements() == 1)
    assert(Kernels.hashedWsNgrams(UTF8String.fromString(""), 3).numElements() == 1)
    assert(Kernels.hashedWsNgrams(UTF8String.fromString(""), 3).toLongArray.toSeq ==
      Kernels.hashedWsNgrams(UTF8String.fromString(" \t "), 3).toLongArray.toSeq)
  }

  test("jaccardSorted equals jaccard on sorted distinct input (200 cases)") {
    for (_ <- 1 to 200) {
      val dx = randWords(12).distinct.sorted
      val dy = randWords(12).distinct.sorted
      assert(Kernels.jaccardSorted(strArray(dx), strArray(dy)) ==
        Kernels.jaccard(strArray(dx), strArray(dy)), s"dx=$dx dy=$dy")
    }
  }

  test("cosine kernel: bounded, symmetric, self-similarity 1 (100 cases)") {
    for (_ <- 1 to 100) {
      val a = Seq.fill(16)(rnd.nextDouble() * 10 - 5)
      val b = Seq.fill(16)(rnd.nextDouble() * 10 - 5)
      val c = Kernels.cosine(dblArray(a), dblArray(b))
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
      assert(c == Kernels.cosine(dblArray(b), dblArray(a)))
      assert(math.abs(Kernels.cosine(dblArray(a), dblArray(a)) - 1.0) < 1e-12)
    }
  }

  test("minhash slot-agreement approximates Jaccard (statistical, k=512)") {
    // |A∩B| = 8 of |A∪B| = 12 -> j = 2/3; agreement rate ~ Binomial(512, j).
    val a = (1 to 10).map(i => s"w$i")
    val b = (3 to 14).map(i => s"w$i")
    val j = (a.toSet & b.toSet).size.toDouble / (a.toSet | b.toSet).size
    val k = 512
    val sa = Kernels.minHashSignature(strArray(a), k)
    val sb = Kernels.minHashSignature(strArray(b), k)
    val agree = (0 until k).count(i => sa.getLong(i) == sb.getLong(i))
    assert(math.abs(agree.toDouble / k - j) < 0.08,
      s"slot agreement ${agree.toDouble / k} far from jaccard $j")
  }

  test("simhash is order-insensitive and deterministic (100 cases)") {
    for (_ <- 1 to 100) {
      val xs = randWords(12)
      val h1 = Kernels.simHash(strArray(xs))
      val h2 = Kernels.simHash(strArray(rnd.shuffle(xs)))
      assert(h1 == h2) // bit votes are a sum over tokens — order-free
    }
  }

  test("prefixAllDiffer model (200 cases)") {
    for (_ <- 1 to 200) {
      val a = Seq.fill(6)(rnd.nextInt(4))
      val b = Seq.fill(6)(rnd.nextInt(4))
      val n = rnd.nextInt(7).min(6)
      val expected = (0 until n).forall(i => a(i) != b(i))
      assert(Kernels.prefixAllDiffer(
        new GenericArrayData(a.toArray[Any]),
        new GenericArrayData(b.toArray[Any]), n) == expected, s"a=$a b=$b n=$n")
    }
  }

  test("revenueE4 is the exact cents product (200 cases)") {
    for (_ <- 1 to 200) {
      val c = 1L + rnd.nextInt(10000000).toLong
      val d = rnd.nextInt(11).toLong
      assert(Kernels.revenueE4(c / 100.0, d / 100.0) == c * (100 - d),
        s"cents=$c disc=$d")
    }
  }

  test("sketchMatchBits equals the per-bit popcount model (200 cases)") {
    for (_ <- 1 to 200) {
      val w = 1 + rnd.nextInt(4)
      val a = Seq.fill(w)(rnd.nextLong())
      val b = Seq.fill(w)(rnd.nextLong())
      val expected = a.zip(b).map { case (x, y) =>
        64 - java.lang.Long.bitCount(x ^ y) }.sum
      assert(Kernels.sketchMatchBits(
        new GenericArrayData(a.toArray[Any]),
        new GenericArrayData(b.toArray[Any])) == expected)
    }
  }

  test("minHashBitSketch: identical sets agree on every bit; match rate tracks (1+j)/2") {
    def sketch(xs: Seq[Long]) = Kernels.minHashBitSketchFromHashes(
      new GenericArrayData(xs.toArray[Any]), 256)
    def matches(a: Seq[Long], b: Seq[Long]): Int =
      Kernels.sketchMatchBits(sketch(a), sketch(b))
    val base = Seq.tabulate(200)(i => (i * 2654435761L) & 0x7FFFFFFFL)
    // identical sets -> all 256 bits agree (the J=1 diagonal)
    assert(matches(base, base) == 256)
    // disjoint sets (J=0): expected match rate 1/2; 4+ sigma bounds
    val other = Seq.tabulate(200)(i => ((i + 1000) * 40503L) & 0x7FFFFFFFL)
    val m0 = matches(base, other)
    assert(m0 > 96 && m0 < 160, s"J=0 match count $m0 far from 128")
    // ~90% overlap (J~0.82): expected ~(1+0.82)/2*256 ~ 233
    val near = base.take(180) ++ Seq.tabulate(20)(i => ((i + 5000) * 97L) & 0x7FFFFFFFL)
    val j = 180.0 / 220.0
    val m1 = matches(base, near)
    val mean = 256 * (1 + j) / 2
    assert(math.abs(m1 - mean) < 30, s"match count $m1 far from binomial mean $mean")
  }

  test("sketchCutoff: monotone in threshold, bounded, admits the j=t binomial mean") {
    import graft.operators.Dedup
    val cuts = Seq(0.5, 0.7, 0.8, 0.9, 0.95).map(t => t -> Dedup.sketchCutoff(256, t))
    assert(cuts.sliding(2).forall { case Seq((_, a), (_, b)) => a <= b })
    cuts.foreach { case (t, m0) =>
      assert(m0 >= 0 && m0 <= 256)
      // the binomial mean at j=t must clear the cutoff comfortably
      assert(256 * (1 + t) / 2 > m0, s"t=$t m0=$m0 rejects the mean")
    }
  }
}
