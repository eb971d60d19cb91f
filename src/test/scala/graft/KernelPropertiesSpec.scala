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
}
