package graft

import org.apache.spark.sql.{functions => sf}
import graft.{functions => gf}
import graft.operators.TextAnalysis

class FunctionsSpec extends SparkFunSuite {
  import spark.implicits._

  test("sas date roundtrip and epoch") {
    val df = Seq(0, 1, 23376).toDF("days")
      .select(gf.sasDaysToDate(sf.col("days")).as("d"))
    val got = df.as[java.sql.Date].collect().map(_.toString)
    assert(got.sameElements(Array("1960-01-01", "1960-01-02", "2024-01-01")))
    val back = df.select(gf.dateToSasDays(sf.col("d"))).as[Int].collect()
    assert(back.sameElements(Array(0, 1, 23376)))
  }

  test("season covers all months") {
    val got = (1 to 12).toDF("m").select(gf.season(sf.col("m"))).as[String].collect()
    assert(got.sameElements(Array("Winter", "Winter", "Spring", "Spring", "Spring",
      "Summer", "Summer", "Summer", "Autumn", "Autumn", "Autumn", "Winter")))
  }

  test("isWeekend on known dates") {
    // 2024-01-06 Sat, 2024-01-07 Sun, 2024-01-08 Mon
    val got = Seq("2024-01-06", "2024-01-07", "2024-01-08").toDF("s")
      .select(gf.isWeekend(sf.to_date(sf.col("s")))).as[Int].collect()
    assert(got.sameElements(Array(1, 1, 0)))
  }

  test("tokens: empty text yields empty array, not ['']") {
    val got = Seq("", "  ", "a  b\tc").toDF("t")
      .select(gf.tokenCount(sf.col("t"))).as[Int].collect()
    assert(got.sameElements(Array(0, 0, 3)))
  }

  test("bpe-ish tokens split alnum runs and punctuation") {
    val got = Seq("Hi, there 42!").toDF("t")
      .select(gf.bpeTokens(sf.col("t"))).as[Seq[String]].collect().head
    assert(got == Seq("hi", ",", "there", "42", "!"))
  }

  test("charNgrams on short and normal text") {
    val got = Seq("ab", "hello").toDF("t")
      .select(gf.charNgrams(sf.col("t"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("ab"))
    assert(got(1) == Seq("hel", "ell", "llo"))
  }

  test("jaccard identical=1, disjoint=0, empty-vs-empty=1") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val got = df.select(gf.jaccard(sf.col("x"), sf.col("y"))).as[Double].collect()
    assert(got(0) == 1.0 && got(1) == 0.0 && got(2) == 1.0 && got(3) == 0.5)
  }

  test("minhash: identical inputs -> identical signatures; signature similarity tracks jaccard") {
    val df = Seq(
      ("a b c d e f g h", "a b c d e f g h"),
      ("a b c d e f g h", "a b c d e f x y")).toDF("x", "y")
      .select(
        gf.minHashSignature(gf.wordShingles(sf.col("x")), 64).as("sx"),
        gf.minHashSignature(gf.wordShingles(sf.col("y")), 64).as("sy"))
      .select(sf.size(sf.filter(sf.zip_with(sf.col("sx"), sf.col("sy"), (a, b) =>
        sf.when(a === b, 1).otherwise(0)), v => v === 1)).as("eq"))
    val eq = df.as[Int].collect()
    assert(eq(0) == 64)                 // identical docs agree on every slot
    assert(eq(1) > 25 && eq(1) < 60)    // j=0.6 pair agrees on ~38/64
  }

  test("simhash: identical texts equal; similar texts close in hamming") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over the lazy dog"),
      ("the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over the lazy cat"),
      ("the quick brown fox jumps over the lazy dog", "completely different words entirely unrelated content here now"))
      .toDF("x", "y")
      .select(gf.hamming64(gf.simHash(gf.wsTokens(sf.col("x"))),
        gf.simHash(gf.wsTokens(sf.col("y")))).as("h"))
    val h = df.as[Int].collect()
    assert(h(0) == 0)
    assert(h(1) < h(2))
  }

  test("cosine on known vectors") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0, 3.0), Seq(2.0, 3.0, 4.0))).toDF("x", "y")
    val got = df.select(sf.round(gf.cosineSim(sf.col("x"), sf.col("y")), 4)).as[Double].collect()
    assert(got(0) == 1.0 && got(1) == 0.0 && got(2) == 0.9926)
  }

  test("rollingHash is order-sensitive; fingerprint is whitespace/case-insensitive") {
    val df = Seq(("a b c", "c b a", "A  b   C")).toDF("x", "y", "z")
    val r = df.select(
      gf.rollingHash(gf.wsTokens(sf.col("x"))).as("rx"),
      gf.rollingHash(gf.wsTokens(sf.col("y"))).as("ry"),
      gf.fingerprint(sf.col("x")).as("fx"),
      gf.fingerprint(sf.col("z")).as("fz")).collect().head
    assert(r.getLong(0) != r.getLong(1))
    assert(r.getString(2) == r.getString(3))
  }

  test("langId picks the language with most stopword hits") {
    val got = Seq(
      "the cat is on the mat and it was good",
      "der hund ist nicht in das haus und zu mit",
      "el gato es uno de los animales que no come").toDF("t")
      .select(gf.langId(sf.col("t"))).as[String].collect()
    assert(got.sameElements(Array("en", "de", "es")))
  }

  test("minHashBitSketch rejects bit widths that are not multiples of 64") {
    // the kernel packs into nBits/64 longs; 32 would size a zero-length
    // array and 100 would overflow word 1 inside codegen
    for (bad <- Seq(0, -64, 32, 100))
      intercept[IllegalArgumentException](gf.minHashBitSketch(sf.col("x"), bad))
    gf.minHashBitSketch(sf.col("x"), 256) // multiples construct fine
  }

  test("jaroWinkler: textbook values, boost threshold, empty/identical conventions") {
    val df = Seq(
      ("martha", "marhta"),   // jaro 0.944444, prefix 3 -> 0.961111
      ("dixon", "dicksonx"),  // jaro 0.766667, prefix 2 -> 0.813333
      ("abcd", "abzz"),       // jaro 0.666667 < 0.7 -> NO boost
      ("abc", "abc"),         // identical -> 1
      ("", "abc"),            // empty -> 0
      ("ab", "ba")            // window 0, no positional match -> 0
    ).toDF("a", "b")
    val got = df.select(gf.roundAt(gf.jaroWinkler(sf.col("a"), sf.col("b")), 4))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.9611, 0.8133, 0.6667, 1.0, 0.0, 0.0))
  }

  test("TopKAgg and TopK.perKey reject k < 1 at construction") {
    intercept[IllegalArgumentException](new graft.operators.Similarity.TopKAgg(0))
    intercept[IllegalArgumentException](
      graft.operators.TopK.perKey(spark, Seq((1L, 2L, 0.5)).toDF("k", "i", "s"),
        "k", "i", "s", k = 0))
  }

  test("urlParts decomposes URLs; malformed input is all-null, never a throw") {
    import spark.implicits._
    val urls = Seq(
      "https://User:Pw@WWW.Example.CO.UK:8443/A/b%20c?q=1&r=2#Frag",
      "http://example.com",
      "https://sub.deep.example.com/path",
      "http://192.168.0.1:8080/x",
      "https://[2001:db8::1]:443/v6",
      "mailto:someone@example.org",
      "ftp://files.example.net/pub?x=1",
      "https://localhost/only",
      "https://co.uk/",          // bare public suffix as host
      "not a url at all",
      "://missing.scheme/x",
      "https://",                 // empty authority
      "")
      .toDF("u")
    val got = urls.select(gf.urlParts(sf.col("u"))).collect()
      .map(_.getSeq[String](0))
    // [scheme, host, port, path, query, fragment, registered_domain]
    assert(got(0) == Seq("https", "www.example.co.uk", "8443", "/A/b%20c",
      "q=1&r=2", "Frag", "example.co.uk"), got(0).toString)
    assert(got(1) == Seq("http", "example.com", null, null, null, null,
      "example.com"))
    assert(got(2) == Seq("https", "sub.deep.example.com", null, "/path",
      null, null, "example.com"))
    assert(got(3) == Seq("http", "192.168.0.1", "8080", "/x", null, null,
      null), "IPv4 has no registered domain")
    assert(got(4) == Seq("https", "[2001:db8::1]", "443", "/v6", null,
      null, null), "IPv6 literal keeps brackets, no registered domain")
    assert(got(5) == Seq("mailto", null, null, "someone@example.org",
      null, null, null), "no authority -> null host, rest is path")
    assert(got(6) == Seq("ftp", "files.example.net", null, "/pub", "x=1",
      null, "example.net"))
    assert(got(7) == Seq("https", "localhost", null, "/only", null, null,
      null), "single-label host has no registered domain")
    assert(got(8) == Seq("https", "co.uk", null, "/", null, null, null),
      "bare two-level suffix is not registrable")
    assert(got(9) == null || got(9).forall(_ == null), s"malformed: ${got(9)}")
    assert(got(10) == null || got(10).forall(_ == null))
    assert(got(11).take(2) == Seq("https", null), "empty authority -> null host")
    assert(got(12) == null || got(12).forall(_ == null))
    // urlPart named accessor + unknown-part guard
    val h = urls.limit(1).select(gf.urlPart(sf.col("u"), "host")).head.getString(0)
    assert(h == "www.example.co.uk")
    intercept[IllegalArgumentException](gf.urlPart(sf.col("u"), "tld"))
  }

  test("functions.multiMatch: AC counts all end positions, overlaps included") {
    import spark.implicits._
    val pats = sf.lit(Array("a", "aa"))
    def run(t: String) = Seq(t).toDF("t")
      .select(gf.multiMatch(sf.col("t"), pats)).head().getSeq[Long](0)
    // "aaa": 'a' x3 + 'aa' x2 (overlapping) = 5 hits, 2 distinct
    assert(run("aaa") == Seq(5L, 2L))
    assert(run("bbb") == Seq(0L, 0L))
    assert(run("xax") == Seq(1L, 1L))
    // non-foldable patterns are rejected at construction: a per-row
    // patterns column would rebuild the automaton per row and risk
    // stale identity-cache hits on re-pointed row buffers
    val ee = intercept[IllegalArgumentException] {
      gf.multiMatch(sf.col("t"), sf.array(sf.col("t")))
    }
    assert(ee.getMessage.contains("foldable"), ee.getMessage)
    // self-overlapping multi-word phrase: "a a" twice inside "a a a"
    val p2 = sf.lit(Array("a a"))
    assert(Seq("a a a").toDF("t").select(gf.multiMatch(sf.col("t"), p2))
      .head().getSeq[Long](0) == Seq(2L, 1L))
    // operator wrapper: flag + counts on a hand corpus
    val docs = Seq((1L, "fast key fast key"), (2L, "nothing here"),
      (3L, "SLOW FAST")).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistPhrases(docs, "doc_id", "text",
      Seq("fast key", "slow fast")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(got(1L) == (2L, 1L, 1))
    assert(got(2L) == (0L, 0L, 0))
    assert(got(3L) == (1L, 1L, 1)) // case-insensitive via lower()
  }

  test("functions.deflateRatio: repetition compresses, noise doesn't, empty pins 1") {
    import spark.implicits._
    val rep = "the cat sat on the mat. " * 200
    // a deterministic high-entropy string: md5 hex chunks
    val noise = (0 until 200).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString
    val df = Seq(("rep", rep), ("noise", noise), ("empty", ""))
      .toDF("k", "t")
    val got = df.select(sf.col("k"), gf.deflateRatio(sf.col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("rep") < 0.1, s"repetitive ratio ${got("rep")}")
    assert(got("noise") > 0.5, s"noise ratio ${got("noise")}")
    assert(got("noise") > got("rep") * 5)
    assert(got("empty") == 1.0)
    // pure function: a second evaluation is bit-identical
    val again = df.select(gf.deflateRatio(sf.col("t")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(again == df.select(gf.deflateRatio(sf.col("t")).as("r"))
      .collect().map(_.getDouble(0)).toSeq)
    // null text -> null ratio (StaticInvoke null propagation)
    val rn = Seq(Option.empty[String]).toDF("t")
      .select(gf.deflateRatio(sf.col("t"))).head()
    assert(rn.isNullAt(0))
  }
}
