package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Murmur3HashFunction, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop JVM kernels for the numeric hot paths, invoked from
  * Catalyst codegen via StaticInvoke (see graft.functions). Spark's
  * higher-order functions (transform/aggregate/zip_with) evaluate
  * interpreted — per-element lambda dispatch and boxing made these
  * kernels 10-100x slower as expression trees; as static JVM methods
  * inside whole-stage codegen they run at array-scan speed.
  *
  * Every kernel is a pure function of its arguments (registered
  * deterministic), so Catalyst remains free to push, reorder, and
  * common-subexpression them.
  */
object Kernels {

  /** Largest prime below 2^31 (see functions.minHashSignature notes). */
  private val Prime = 2147483629L
  private val Seed = 42L

  /** Canonical stopword lists (also the language-ID candidate lists —
    * graft.functions.stopwords aliases this map, keeping the Spark
    * expressions and this kernel on one source of truth). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que", "pas", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "uno", "una", "por", "no", "como"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  private val stopwordSets: java.util.HashMap[UTF8String, java.util.HashSet[UTF8String]] = {
    val m = new java.util.HashMap[UTF8String, java.util.HashSet[UTF8String]]()
    stopwords.foreach { case (lang, ws) =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      m.put(UTF8String.fromString(lang), s)
    }
    m
  }

  /** Number of tokens (with multiplicity) that are stopwords of `lang`;
    * unknown language -> 0. */
  def stopwordCount(tokens: ArrayData, lang: UTF8String): Int = {
    val set = stopwordSets.get(lang)
    if (set == null) return 0
    val n = tokens.numElements()
    var i = 0
    var c = 0
    while (i < n) {
      if (set.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Cosine similarity over two double arrays (same accumulation order
    * as a sequential fold — keeps parity with double-precision oracles). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975, CACM
    * 18(6)): goto trie + BFS failure links + dictionary-suffix links,
    * built once per distinct pattern-array literal and memoized per
    * JVM (identity-keyed — a plan's literal array is one shared object
    * across rows and tasks). Matching a document is then O(chars +
    * matches) REGARDLESS of list size — the property that makes a
    * 100k-phrase blocklist a single scan instead of 100k contains()
    * probes. */
  private final class AhoCorasick(patterns: Array[String]) {
    private val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val failB = scala.collection.mutable.ArrayBuffer(0)
    private val endPatB = scala.collection.mutable.ArrayBuffer(-1) // pattern id ending here
    // trie
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        s = if (gotoMaps(s).containsKey(c)) gotoMaps(s).get(c) else {
          gotoMaps += new java.util.HashMap[Char, Int]()
          failB += 0; endPatB += -1
          val ns = gotoMaps.size - 1
          gotoMaps(s).put(c, ns); ns
        }
        i += 1
      }
      endPatB(s) = id
    }
    private val fail = failB.toArray
    private val endPat = endPatB.toArray
    private val dict = Array.fill(gotoMaps.size)(0) // nearest emitting suffix state
    // BFS failure + dictionary links
    locally {
      val q = new java.util.ArrayDeque[Int]()
      val rootIt = gotoMaps(0).values().iterator()
      while (rootIt.hasNext) { val v = rootIt.next(); fail(v) = 0; q.add(v) }
      while (!q.isEmpty) {
        val u = q.poll()
        dict(u) = if (endPat(fail(u)) >= 0) fail(u) else dict(fail(u))
        val it = gotoMaps(u).entrySet().iterator()
        while (it.hasNext) {
          val en = it.next()
          val c: Char = en.getKey
          val v: Int = en.getValue
          var f = fail(u)
          while (f != 0 && !gotoMaps(f).containsKey(c)) f = fail(f)
          fail(v) = if (gotoMaps(f).containsKey(c) && gotoMaps(f).get(c) != v)
            gotoMaps(f).get(c) else 0
          q.add(v)
        }
      }
    }
    /** [total match occurrences, distinct patterns matched]. */
    def count(text: String): Array[Long] = {
      var s = 0
      var hits = 0L
      val seen = new java.util.HashSet[Int]()
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !gotoMaps(s).containsKey(c)) s = fail(s)
        if (gotoMaps(s).containsKey(c)) s = gotoMaps(s).get(c)
        var e = if (endPat(s) >= 0) s else dict(s)
        while (e != 0) {
          hits += 1
          seen.add(endPat(e))
          e = dict(e)
        }
        i += 1
      }
      Array(hits, seen.size.toLong)
    }
  }

  /** Two-level per-JVM automaton memo. Fast path: identity on the
    * pattern ArrayData — sound because [[graft.functions.multiMatch]]
    * REQUIRES a foldable patterns expression, so the object a task sees
    * is a stable plan literal, never a row buffer re-pointed per row.
    * Identity misses (one per deserialized plan copy / task) fall back
    * to a CONTENT-keyed LRU (access-ordered, evicts eldest past 32), so
    * a 100k-phrase automaton is built once per JVM per distinct pattern
    * list — not once per task, and no clear-all thrash when many plans
    * are live. The identity alias map holds no automaton not already in
    * the content LRU, so its occasional clear-all costs only a re-probe. */
  private val acByContent = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[List[String], AhoCorasick](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[List[String], AhoCorasick]): Boolean = size > 32
    })
  private val acIdentity = java.util.Collections.synchronizedMap(
    new java.util.IdentityHashMap[AnyRef, AhoCorasick]())

  /** [n_match_occurrences, n_distinct_patterns] of every pattern in
    * `patterns` over `text`, ALL end positions counted (overlapping
    * and nested matches included — the Aho–Corasick semantics; the
    * oracle twin is the naive per-position substring scan). Matching
    * is case-sensitive on the already-normalized inputs — callers
    * lowercase both sides. */
  def multiMatch(text: UTF8String, patterns: ArrayData): ArrayData = {
    var ac = acIdentity.get(patterns)
    if (ac == null) {
      val arr = Array.tabulate(patterns.numElements())(i =>
        patterns.getUTF8String(i).toString)
      require(arr.forall(_.nonEmpty), "multiMatch: empty pattern")
      val key = arr.toList
      ac = acByContent.get(key)
      if (ac == null) {
        ac = new AhoCorasick(arr)
        acByContent.put(key, ac)
      }
      if (acIdentity.size > 1024) acIdentity.clear()
      acIdentity.put(patterns, ac)
    }
    UnsafeArrayData.fromPrimitiveArray(ac.count(text.toString))
  }

  /** Typed PII signals of a text, by PORTABLE structural definitions
    * (no regex dialects — whitespace tokens and ASCII digit runs, so a
    * SQL oracle replays them with splits and list comprehensions):
    * [n_email_tokens, n_ipv4_tokens, n_phone_runs(len 10),
    * n_card_candidates(len 13–16), n_luhn_valid].
    * email token = exactly one '@', nonempty local, domain ≥ 3 chars
    * containing '.'; ipv4 token = exactly 4 dot-separated 1–3-digit
    * parts each ≤ 255 (empty parts / other chars reject); digit runs
    * are maximal [0-9]+ spans of the RAW text; Luhn doubles every
    * second digit from the right (ISO/IEC 7812). */
  def piiSignals(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    var email = 0L; var ipv4 = 0L; var phone = 0L
    var cand = 0L; var valid = 0L
    def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(str.charAt(i))) i += 1
      if (i > start) {
        val tok = str.substring(start, i)
        val at = tok.indexOf('@')
        if (at > 0 && tok.indexOf('@', at + 1) < 0) {
          val dom = tok.substring(at + 1)
          if (dom.length >= 3 && dom.indexOf('.') >= 0) email += 1
        }
        // ipv4: single left-to-right scan, empty/long/large parts reject
        var ok = true
        var parts = 0
        var partLen = 0
        var partVal = 0
        var j = 0
        while (ok && j < tok.length) {
          val c = tok.charAt(j)
          if (c == '.') {
            if (partLen < 1 || partVal > 255) ok = false
            parts += 1; partLen = 0; partVal = 0
          } else if (c >= '0' && c <= '9') {
            partLen += 1
            if (partLen > 3) ok = false
            partVal = partVal * 10 + (c - '0')
          } else ok = false
          j += 1
        }
        if (ok && partLen >= 1 && partVal <= 255 && parts == 3) ipv4 += 1
      }
    }
    i = 0
    while (i < n) {
      if (str.charAt(i) >= '0' && str.charAt(i) <= '9') {
        val start = i
        while (i < n && str.charAt(i) >= '0' && str.charAt(i) <= '9') i += 1
        val len = i - start
        if (len == 10) phone += 1
        if (len >= 13 && len <= 16) {
          cand += 1
          var sum = 0
          var j = start
          while (j < i) {
            val d = str.charAt(j) - '0'
            // position from the right: odd positions double
            val dd = if ((i - 1 - j) % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t }
                     else d
            sum += dd
            j += 1
          }
          if (sum % 10 == 0) valid += 1
        }
      } else i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array(email, ipv4, phone, cand, valid))
  }

  /** zlib-deflate compressed-size ratio of a string's UTF-8 bytes
    * (compressed/original, Deflater level 6, raw deflate stream) — the
    * classic Gopher/RefinedWeb compressibility quality signal: heavily
    * templated or repeated text compresses far below organic prose
    * (ratio < ~0.3 flags boilerplate/spam; near 1.0 flags high-entropy
    * noise like base64 blobs). Deterministic for a fixed JDK zlib
    * (pure function of the bytes: fixed level, fixed strategy, raw
    * stream); there is no SQL-engine twin, so the gate check for this
    * signal is rows-only + property spec — the documented exception
    * alongside the multimodal decode stubs. Empty/blank input pins to
    * 1.0 (nothing to compress ≠ compressible). */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    d.end()
    compressed.toDouble / bytes.length.toDouble
  }

  /** Dot product of two double arrays, sequential accumulation order
    * (parity with a left-fold in any double-precision oracle). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  // ------------------------------------------------------------------
  // SRP (sign-random-projection) banding
  // ------------------------------------------------------------------

  /** splitmix64 finalizer — the deterministic pseudo-randomness behind
    * the SRP hyperplanes (one source of truth;
    * graft.operators.Similarity.lshPlanes delegates here). */
  private def srpMix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val srpPlaneCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** Deterministic SRP hyperplanes: component (j, i) from
    * splitmix64(seed, j, i), quantized to multiples of 2^-10 in
    * [-1, 1) — dyadic values print as short exact decimals, so the
    * same planes embed verbatim as literals in oracle SQL and parse
    * back bit-identical. Memoized per (dim, bits, seed): the payload
    * kernel below rebuilds nothing per row. */
  def srpPlanes(dim: Int, bits: Int, seed: Int): Array[Array[Double]] =
    srpPlaneCache.computeIfAbsent((dim, bits, seed), _ =>
      Array.tabulate(bits, dim)((j, i) =>
        ((srpMix64(seed.toLong * 0x100000001L + j.toLong * 65537L + i) >>> 11)
          % 2048L).toDouble / 1024.0 - 1.0))

  /** All `bands` SRP bucket values of `v` in ONE pass: bucket b has
    * bit j set iff dot(v, plane_{b·bits+j}) > 0 — bit-identical to
    * folding `functions.dot` over the same quantized planes
    * (sequential ascending accumulation). */
  private def srpBandValues(v: ArrayData, bands: Int, bits: Int,
                            seed: Int): Array[Int] = {
    val d = v.numElements()
    val planes = srpPlanes(d, bands * bits, seed)
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var acc = 0
      var j = 0
      while (j < bits) {
        val p = planes(b * bits + j)
        var dot = 0.0
        var i = 0
        while (i < d) { dot += v.getDouble(i) * p(i); i += 1 }
        if (dot > 0) acc |= (1 << j)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  /** SRP band array [bucket_0 .. bucket_{bands-1}] of `v` — the
    * broadcast-side signature (small frames where carrying the full
    * array is free). */
  def srpBands(v: ArrayData, bands: Int, bits: Int, seed: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(srpBandValues(v, bands, bits, seed))

  /** Fused SRP band-explode payload: one struct (band, bh, pfx) per
    * band, where pfx = the bucket values of all EARLIER bands — the
    * first-witness prefix. The whole payload is ONE kernel call, so
    * the banding runs exactly once per row; carrying a computed band
    * array past a Generate instead re-evaluates it per EXPLODED row
    * (24 bands = 24x the dot products — measured 2.7x on q91's whole
    * runtime), and a materialization barrier would checkpoint the
    * corpus. Explode this and carry nothing computed. */
  def srpBandPayload(v: ArrayData, bands: Int, bits: Int,
                     seed: Int): ArrayData = {
    val bv = srpBandValues(v, bands, bits, seed)
    val rows = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      rows(b) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](b, bv(b), UnsafeArrayData.fromPrimitiveArray(
          java.util.Arrays.copyOfRange(bv, 0, b))))
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Jaccard similarity of two string arrays as distinct sets
    * (array_distinct + intersect/union semantics; both-empty -> 1.0). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    val n = a.numElements()
    while (i < n) { sa.add(a.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[UTF8String]()
    var inter = 0
    var bDistinct = 0
    i = 0
    val m = b.numElements()
    while (i < m) {
      val s = b.getUTF8String(i)
      if (seenB.add(s)) {
        bDistinct += 1
        if (sa.contains(s)) inter += 1
      }
      i += 1
    }
    val union = sa.size + bDistinct - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Sorted distinct xxhash64 values of a string array: the compact
    * verification form of a shingle set. Jaccard over these longs equals
    * Jaccard over the strings up to 64-bit hash collisions (~1e-16 per
    * pair) while the pair merge scan compares primitive longs instead of
    * chasing UTF8String bytes. */
  def hashSetSorted(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = XxHash64Function.hash(a.getUTF8String(i), StringType, Seed)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || out(w - 1) != out(r)) { out(w) = out(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(if (w == n) out else java.util.Arrays.copyOf(out, w))
  }

  /** Fused whitespace-tokenize + hash + sort + dedup: the sorted
    * distinct xxhash64 values of a text's whitespace tokens, hashing
    * each token's byte range IN PLACE (no substring or array
    * allocation; equals hashSetSorted∘split exactly, because a token's
    * bytes are contiguous in the UTF8String). Whitespace = the ASCII
    * class [ \t\n\x0B\f\r] — identical to Java regex \s and RE2 \s
    * (both ASCII-only by default), so the token set matches a
    * regexp_split on '\s+' in either engine. */
  def hashedWsShingles(t: UTF8String): ArrayData = {
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val n = t.numBytes()
    var out = new Array[Long](8)
    var w = 0
    var i = 0
    def isWs(b: Byte): Boolean =
      b == 0x20 || (b >= 0x09 && b <= 0x0d)
    while (i < n) {
      while (i < n && isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      val start = i
      while (i < n && !isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i > start) {
        if (w == out.length) out = java.util.Arrays.copyOf(out, w * 2)
        out(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          base, off + start, i - start, Seed)
        w += 1
      }
    }
    java.util.Arrays.sort(out, 0, w)
    var d = 0
    var r = 0
    while (r < w) {
      if (d == 0 || out(d - 1) != out(r)) { out(d) = out(r); d += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, d))
  }

  /** Fused whitespace-tokenize + word-n-gram hash: sorted distinct
    * 64-bit hashes of a text's word n-grams under the wordShingles
    * convention (n-token windows; fewer than n tokens — including the
    * empty text — make the whole text the ONE gram). A gram's hash
    * chains xxhash64 over its tokens' hashes, so gram identity is
    * exactly token-SEQUENCE identity — the same equivalence as
    * building the single-space-joined gram string — but no gram
    * string is ever allocated: at corpus scale gram text must not
    * ride an explode, only fixed-width hashes. Distinct-count users
    * inherit 64-bit collision odds ~G²/2^65 over G distinct grams:
    * zero in practice at verification SFs and a count shift of a few
    * units in 10^10 at 100 TB — fine for redundancy audits. */
  def hashedWsNgrams(t: UTF8String, n: Int): ArrayData = {
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val len = t.numBytes()
    var toks = new Array[Long](8)
    var w = 0
    var i = 0
    def isWs(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    while (i < len) {
      while (i < len && isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      val start = i
      while (i < len && !isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i > start) {
        if (w == toks.length) toks = java.util.Arrays.copyOf(toks, w * 2)
        toks(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          base, off + start, i - start, Seed)
        w += 1
      }
    }
    val out =
      if (w < n) { // short doc: the whole token sequence is one gram
        var h = Seed
        var j = 0
        while (j < w) {
          h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(toks(j), h)
          j += 1
        }
        Array(h)
      } else {
        val g = new Array[Long](w - n + 1)
        var s = 0
        while (s <= w - n) {
          var h = Seed
          var j = s
          while (j < s + n) {
            h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(toks(j), h)
            j += 1
          }
          g(s) = h
          s += 1
        }
        java.util.Arrays.sort(g)
        var d = 0
        var r = 0
        while (r < g.length) {
          if (d == 0 || g(d - 1) != g(r)) { g(d) = g(r); d += 1 }
          r += 1
        }
        if (d == g.length) g else java.util.Arrays.copyOf(g, d)
      }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** One-pass ladder of [[hashedWsNgrams]]: slot k holds the sorted
    * distinct gram hashes for n = k+1, for n = 1..maxN. Tokenizes (and
    * hashes tokens) ONCE and reuses the token-hash array for every
    * width — coverage-style consumers that need all widths previously
    * paid one full text scan + tokenization per n. Each slot is
    * bit-identical to hashedWsNgrams(t, n). */
  def hashedWsNgramsLadder(t: UTF8String, maxN: Int): ArrayData = {
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val len = t.numBytes()
    var toks = new Array[Long](8)
    var w = 0
    var i = 0
    def isWs(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    while (i < len) {
      while (i < len && isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      val start = i
      while (i < len && !isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i > start) {
        if (w == toks.length) toks = java.util.Arrays.copyOf(toks, w * 2)
        toks(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          base, off + start, i - start, Seed)
        w += 1
      }
    }
    val slots = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      val out =
        if (w < n) { // short doc: the whole token sequence is one gram
          var h = Seed
          var j = 0
          while (j < w) {
            h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(toks(j), h)
            j += 1
          }
          Array(h)
        } else {
          val g = new Array[Long](w - n + 1)
          var s = 0
          while (s <= w - n) {
            var h = Seed
            var j = s
            while (j < s + n) {
              h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(toks(j), h)
              j += 1
            }
            g(s) = h
            s += 1
          }
          java.util.Arrays.sort(g)
          var d = 0
          var r = 0
          while (r < g.length) {
            if (d == 0 || g(d - 1) != g(r)) { g(d) = g(r); d += 1 }
            r += 1
          }
          if (d == g.length) g else java.util.Arrays.copyOf(g, d)
        }
      slots(n - 1) = UnsafeArrayData.fromPrimitiveArray(out)
      n += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(slots)
  }

  /** Positional variant of hashedWsNgrams: gram hashes IN TEXT ORDER,
    * duplicates kept — index i is the hash of the n-gram starting at
    * token i (one whole-sequence gram when the doc is shorter than n;
    * empty array for an empty doc). Span-level operators need the
    * start positions and within-doc multiplicity that the sorted-set
    * variant deliberately discards. */
  def hashedWsNgramSeq(t: UTF8String, n: Int): ArrayData = {
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val len = t.numBytes()
    var toks = new Array[Long](8)
    var w = 0
    var i = 0
    def isWs(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    while (i < len) {
      while (i < len && isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      val start = i
      while (i < len && !isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i > start) {
        if (w == toks.length) toks = java.util.Arrays.copyOf(toks, w * 2)
        toks(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          base, off + start, i - start, Seed)
        w += 1
      }
    }
    val out =
      if (w == 0) new Array[Long](0)
      else if (w < n) {
        var h = Seed
        var j = 0
        while (j < w) {
          h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(toks(j), h)
          j += 1
        }
        Array(h)
      } else {
        val g = new Array[Long](w - n + 1)
        var s = 0
        while (s <= w - n) {
          var h = Seed
          var j = s
          while (j < s + n) {
            h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(toks(j), h)
            j += 1
          }
          g(s) = h
          s += 1
        }
        g
      }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Shannon entropy (nats) of the whitespace-token distribution:
    * H = ln(n) − (Σ c·ln c)/n over per-token counts. One byte pass +
    * one hash map — O(len); tokens are counted by 64-bit hash (a
    * collision can only merge two counts, nudging H down — same
    * conservative family as every other hashed-gram kernel). Summation
    * order is the map's iteration order: deterministic for identical
    * text, reconciled cross-engine by the caller's 4-decimal round
    * (the q62 ln convention). Empty text -> 0.0. */
  def tokenEntropy(t: UTF8String): Double = {
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val len = t.numBytes()
    val m = new java.util.HashMap[Long, Int]()
    var n = 0
    var i = 0
    def isWs(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    while (i < len) {
      while (i < len && isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      val start = i
      while (i < len && !isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i > start) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          base, off + start, i - start, Seed)
        m.merge(h, 1, Integer.sum _)
        n += 1
      }
    }
    if (n == 0) 0.0
    else {
      var s = 0.0
      val it = m.values().iterator()
      while (it.hasNext) { val c = it.next().toDouble; s += c * Math.log(c) }
      Math.log(n.toDouble) - s / n
    }
  }

  /** Shannon entropy (nats) of the code-point distribution of the
    * space-trimmed text (SQL `trim` semantics — spaces only, so an
    * oracle replays the same character multiset). Empty -> 0.0. */
  def charEntropy(t: UTF8String): Double = {
    val s = t.trim().toString
    val m = new java.util.HashMap[Int, Int]()
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      m.merge(cp, 1, Integer.sum _)
      i += Character.charCount(cp)
      n += 1
    }
    if (n == 0) 0.0
    else {
      var acc = 0.0
      val it = m.values().iterator()
      while (it.hasNext) { val c = it.next().toDouble; acc += c * Math.log(c) }
      Math.log(n.toDouble) - acc / n
    }
  }

  /** Jaccard over sorted distinct long arrays (see hashSetSorted);
    * both-empty -> 1.0. */
  def jaccardSortedLong(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  /** Threshold-aware variant of `jaccardSortedLong` for verification
    * paths that only keep pairs with J >= t: maintains the upper bound
    * J_max = (inter + min(remaining_a, remaining_b)) / (union so far)
    * and abandons the merge scan (returning -1.0) the moment the bound
    * drops below t. The bound only decreases on mismatch steps, so the
    * check costs nothing on the match path. For surviving pairs the
    * returned value is the exact Jaccard. */
  def jaccardSortedLongGeq(a: ArrayData, b: ArrayData, t: Double): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return 1.0
    // best*(1+t) < t*(n+m)  <=>  best/(n+m-best) < t, all in exact doubles
    val tnm = t * (n + m)
    val t1 = 1.0 + t
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else {
        if (x < y) i += 1 else j += 1
        val best = inter + math.min(n - i, m - j)
        if (best * t1 < tnm) return -1.0
      }
    }
    inter.toDouble / (n + m - inter)
  }

  /** Jaccard over DISTINCT, SORTED string arrays: allocation-free merge
    * scan (the generic `jaccard` builds two hash sets per pair — at
    * millions of candidate pairs that allocation dominates). Inputs must
    * be array_sort(array_distinct(...)); same value as `jaccard`. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  // Multiply-shift family coefficients: a_i a full-width ODD 64-bit
  // multiplier (the product then wraps mod 2^64 — a narrow multiplier
  // would leave a_i*h+b monotone in h, i.e. no permutation at all) and
  // b_i a 64-bit offset; derived from chained murmur3/xxhash like the
  // SQL hash() functions; cached per k so they are computed once per
  // executor, not per row.
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coefs(k: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(k, (kk: Int) => {
      val seedA = Murmur3HashFunction.hash(UTF8String.fromString("mh_a"), StringType, Seed)
      val seedB = Murmur3HashFunction.hash(UTF8String.fromString("mh_b"), StringType, Seed)
      val as = new Array[Long](kk)
      val bs = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        as(i) = XxHash64Function.hash(i, IntegerType, seedA) | 1L
        bs(i) = XxHash64Function.hash(i, IntegerType, seedB)
        i += 1
      }
      (as, bs)
    })

  /** 31-bit non-negative murmur3 base hash per shingle; [""] if empty. */
  private def baseHashes(shingles: ArrayData): Array[Long] = {
    val n = shingles.numElements()
    if (n == 0)
      Array(Murmur3HashFunction.hash(UTF8String.fromString(""), StringType, Seed) & 0x7FFFFFFFL)
    else {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = Murmur3HashFunction.hash(shingles.getUTF8String(i), StringType, Seed) & 0x7FFFFFFFL
        i += 1
      }
      out
    }
  }

  private def signature(shingles: ArrayData, k: Int): Array[Long] =
    signatureFromBase(baseHashes(shingles), k)

  private def signatureFromBase(hs: Array[Long], k: Int): Array[Long] = {
    val (as, bs) = coefs(k)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = as(i)
      val b = bs(i)
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        // Multiply-xorshift permutation slot (odd multiplier + finalizer
        // xorshift): the standard multiply-shift universal family — a
        // single IMUL+XOR+SHR instead of the 20-cycle 64-bit modulo of
        // the classic (a*x+b) mod p form. The hash family only shapes
        // CANDIDATE generation; any family change is absorbed by exact
        // verification, so this is a free constant-factor choice.
        val u = a * hs(j) + b
        val v = u ^ (u >>> 29)
        if (v < m) m = v
        j += 1
      }
      sig(i) = m
      i += 1
    }
    sig
  }

  /** k-wide MinHash signature via h_i(x) = (a_i*x + b_i) mod p. */
  def minHashSignature(shingles: ArrayData, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(signature(shingles, k))

  /** LSH band hashes: signature folded in bands of rowsPerBand slots.
    * 32-bit values: the bucket join key and the first-witness array both
    * ride every collision row, so width is the dominant byte cost; a
    * chance 32-bit bucket collision only adds a candidate that exact
    * verification discards (never drops a pair). */
  def minHashBands(shingles: ArrayData, k: Int, rowsPerBand: Int): ArrayData = {
    val sig = signature(shingles, k)
    val nBands = k / rowsPerBand
    val out = new Array[Int](nBands)
    var bi = 0
    while (bi < nBands) {
      var h = 1125899906842597L
      var j = bi * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) { h = h * 31 + sig(j); j += 1 }
      out(bi) = (h ^ (h >>> 32)).toInt
      bi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** `minHashBands` over an ALREADY-HASHED shingle set (the sorted
    * xxhash64 longs of `hashSetSorted`): skips re-hashing the strings —
    * used after exact-duplicate collapse, where one signature serves
    * every doc sharing the set. Base hashes are the low 31 bits of the
    * xxhash64 values (the permutation family needs non-negative
    * < 2^31 inputs); a low-bit collision can only ADD a candidate,
    * which exact verification discards. */
  def minHashBandsFromHashes(shh: ArrayData, k: Int, rowsPerBand: Int): ArrayData = {
    val n = shh.numElements()
    val hs =
      if (n == 0) Array(XxHash64Function.hash(UTF8String.fromString(""), StringType, Seed) & 0x7FFFFFFFL)
      else {
        val out = new Array[Long](n)
        var i = 0
        while (i < n) { out(i) = shh.getLong(i) & 0x7FFFFFFFL; i += 1 }
        out
      }
    val sig = signatureFromBase(hs, k)
    val nBands = k / rowsPerBand
    val out = new Array[Int](nBands)
    var bi = 0
    while (bi < nBands) {
      var h = 1125899906842597L
      var j = bi * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) { h = h * 31 + sig(j); j += 1 }
      out(bi) = (h ^ (h >>> 32)).toInt
      bi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // Independent multiply-xorshift coefficients for the b-bit sketch
  // permutations — seeded differently from the band family (`coefs`) so
  // sketch bits stay independent of band collisions: the candidate set
  // is CONDITIONED on "all rowsPerBand minhashes of some band agree",
  // and reusing those permutations would hand every candidate ~r free
  // agreeing bits, biasing the estimate exactly where it must
  // discriminate.
  private val sketchCoefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def sketchCoefs(k: Int): (Array[Long], Array[Long]) =
    sketchCoefCache.computeIfAbsent(k, (kk: Int) => {
      val seedA = Murmur3HashFunction.hash(UTF8String.fromString("sk_a"), StringType, Seed)
      val seedB = Murmur3HashFunction.hash(UTF8String.fromString("sk_b"), StringType, Seed)
      val as = new Array[Long](kk)
      val bs = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        as(i) = XxHash64Function.hash(i, IntegerType, seedA) | 1L
        bs(i) = XxHash64Function.hash(i, IntegerType, seedB)
        i += 1
      }
      (as, bs)
    })

  /** b-bit minwise sketch (Li & König): parity bit of each of nBits
    * extra minhash permutations, packed into nBits/64 longs. Two sets
    * with Jaccard j agree on each bit with probability (1+j)/2 — the
    * minimizer is shared with probability j, else parities are
    * independent fair coins — so the match count over nBits bits is
    * Binomial(nBits, (1+j)/2): a compact J estimator for candidate
    * prefiltering that never touches the shingle arrays. Same
    * empty-set pseudo-hash convention as minHashBandsFromHashes. */
  def minHashBitSketchFromHashes(shh: ArrayData, nBits: Int): ArrayData = {
    val n = shh.numElements()
    val hs =
      if (n == 0) Array(XxHash64Function.hash(UTF8String.fromString(""), StringType, Seed) & 0x7FFFFFFFL)
      else {
        val out = new Array[Long](n)
        var i = 0
        while (i < n) { out(i) = shh.getLong(i) & 0x7FFFFFFFL; i += 1 }
        out
      }
    val (as, bs) = sketchCoefs(nBits)
    val out = new Array[Long](nBits >> 6)
    var i = 0
    while (i < nBits) {
      val a = as(i)
      val b = bs(i)
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val u = a * hs(j) + b
        val v = u ^ (u >>> 29)
        if (v < m) m = v
        j += 1
      }
      if ((m & 1L) == 1L) out(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Number of agreeing bits between two equal-length packed bit
    * sketches: sum of 64 - popcount(xor) per word. */
  def sketchMatchBits(a: ArrayData, b: ArrayData): Int = {
    val w = a.numElements()
    var matches = 0
    var i = 0
    while (i < w) {
      matches += 64 - java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    matches
  }

  /** Exact fixed-point revenue in 1e-4 units: price and discount are
    * 2-decimal money values stored as doubles; Math.round recovers the
    * exact cent values, and cents*(100-disc100) is the exact scale-4
    * product as a long — decimal-exact math at long-arithmetic speed
    * (a decimal(18,2)x(4,2) multiply leaves Spark's compact-long path
    * and costs a BigDecimal per row). */
  def revenueE4(price: Double, discount: Double): Long =
    Math.round(price * 100) * (100L - Math.round(discount * 100))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(token) as a 60-bit non-negative long.
    * This is the engine-portable token hash: any system with an md5()
    * function (DuckDB, Trino, Postgres, Python) derives the identical
    * value from the hex string — unlike xxhash64/murmur3, whose seeds
    * and variants differ across engines. */
  private def md5Hash60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Fused winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken
    * MOSS): whitespace-tokenize the (already lowercased) text, md5-60
    * each k-gram's space-joined string (the engine-portable gram hash
    * — DuckDB replays it from md5's hex), take w-window minima, and
    * return the distinct selected fingerprints — ONE JVM pass per
    * document. The previous chained-array-expression formulation
    * re-evaluated the gram array per window under projection collapse
    * (~k·w× re-hash per doc: 334s at sf0.1 for what this kernel + the
    * posting join do in seconds). Semantics identical: short docs one
    * whole-sequence gram; fewer grams than w -> their single minimum;
    * empty docs -> empty. */
  def winnowingFps(t: UTF8String, k: Int, w: Int): ArrayData = {
    val base = t.getBaseObject
    val off = t.getBaseOffset
    val len = t.numBytes()
    def isWs(b: Byte): Boolean = b == 0x20 || (b >= 0x09 && b <= 0x0d)
    // token byte slices
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    var nt = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      val s = i
      while (i < len && !isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i > s) {
        if (nt == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nt * 2)
          ends = java.util.Arrays.copyOf(ends, nt * 2)
        }
        starts(nt) = s; ends(nt) = i; nt += 1
      }
    }
    if (nt == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val md = md5Local.get()
    def gramHash(from: Int, until: Int): Long = {
      var size = until - from - 1 // separators
      var j = from
      while (j < until) { size += ends(j) - starts(j); j += 1 }
      val buf = new Array[Byte](size)
      var p = 0
      j = from
      while (j < until) {
        if (j > from) { buf(p) = 0x20; p += 1 }
        var b = starts(j)
        while (b < ends(j)) {
          buf(p) = org.apache.spark.unsafe.Platform.getByte(base, off + b)
          p += 1; b += 1
        }
        j += 1
      }
      md.reset()
      val d = md.digest(buf)
      var v = 0L
      var x = 0
      while (x < 7) { v = (v << 8) | (d(x) & 0xffL); x += 1 }
      (v << 4) | ((d(7) & 0xf0L) >>> 4)
    }
    val grams =
      if (nt < k) Array(gramHash(0, nt))
      else {
        val g = new Array[Long](nt - k + 1)
        var s = 0
        while (s <= nt - k) { g(s) = gramHash(s, s + k); s += 1 }
        g
      }
    val mins =
      if (grams.length < w) Array(grams.min)
      else {
        val m = new Array[Long](grams.length - w + 1)
        var s = 0
        while (s <= grams.length - w) {
          var mn = grams(s)
          var j = s + 1
          while (j < s + w) { if (grams(j) < mn) mn = grams(j); j += 1 }
          m(s) = mn; s += 1
        }
        m
      }
    // distinct, selection-order irrelevant downstream (set semantics)
    java.util.Arrays.sort(mins)
    var d = 0
    var r = 0
    while (r < mins.length) {
      if (d == 0 || mins(d - 1) != mins(r)) { mins(d) = mins(r); d += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (d == mins.length) mins else java.util.Arrays.copyOf(mins, d))
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Fused content-defined chunking kernel (LBFS/rsync boundary rule):
    * slide a `window`-char context over the text, cut where
    * md5-60(context) ≡ 0 mod `avgChunk` (positions are 1-based CHARACTER
    * positions, skipping position 1, so the oracle's substr() replays
    * exactly), and return each non-empty chunk encoded as
    * "md5hex:charLen" — ONE JVM pass per document. The previous
    * array-expression formulation evaluated a full substr→md5→conv
    * expression tree per character position under interpreted HOFs
    * (the q171 pathology); here one reused MessageDigest walks the
    * byte buffer directly. Empty text -> empty array. */
  def cdcChunkIds(t: UTF8String, window: Int, avgChunk: Int): ArrayData = {
    val bytes = t.getBytes
    val nBytes = bytes.length
    if (nBytes == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    // char index -> starting byte offset (UTF-8 aware)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      b += UTF8String.numBytesForFirstByte(bytes(b)); nChars += 1
    }
    val charOff = new Array[Int](nChars + 1)
    b = 0
    var c = 0
    while (b < nBytes) {
      charOff(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b)); c += 1
    }
    charOff(nChars) = nBytes
    val md = md5Local.get()
    // boundaries: 1-based char positions i in [2, nChars - window + 1]
    // where the 60-bit md5 of the window starting at i divides avgChunk
    var cuts = new Array[Int](8)
    var nCuts = 0
    def pushCut(p: Int): Unit = {
      if (nCuts == cuts.length) cuts = java.util.Arrays.copyOf(cuts, nCuts * 2)
      cuts(nCuts) = p; nCuts += 1
    }
    pushCut(1)
    val hi = nChars - (window - 1)
    var i = 2
    while (i <= hi) {
      md.reset()
      md.update(bytes, charOff(i - 1), charOff(i - 1 + window) - charOff(i - 1))
      val d = md.digest()
      var v = 0L
      var x = 0
      while (x < 7) { v = (v << 8) | (d(x) & 0xffL); x += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      if (v % avgChunk == 0) pushCut(i)
      i += 1
    }
    pushCut(nChars + 1)
    val out = new Array[Any](nCuts - 1)
    var nOut = 0
    var j = 0
    while (j < nCuts - 1) {
      val c1 = cuts(j)
      val c2 = cuts(j + 1)
      if (c2 > c1) {
        md.reset()
        md.update(bytes, charOff(c1 - 1), charOff(c2 - 1) - charOff(c1 - 1))
        val d = md.digest()
        val lenStr = java.lang.Integer.toString(c2 - c1)
        val enc = new Array[Byte](33 + lenStr.length)
        var x = 0
        while (x < 16) {
          enc(2 * x) = HexDigits((d(x) >> 4) & 0xf).toByte
          enc(2 * x + 1) = HexDigits(d(x) & 0xf).toByte
          x += 1
        }
        enc(32) = ':'
        var p = 0
        while (p < lenStr.length) { enc(33 + p) = lenStr.charAt(p).toByte; p += 1 }
        out(nOut) = UTF8String.fromBytes(enc)
        nOut += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (nOut == out.length) out else out.take(nOut))
  }

  /** DEFLATE-compressed length of the text's UTF-8 bytes (zlib level
    * 6, raw stream) — the compression-ratio quality signal
    * (DataComp-LM / Dolma family): boilerplate and generated spam
    * compress far below natural text, already-compressed or random
    * payloads approach 1.0. JVM-deterministic (same input -> same
    * length); no SQL oracle exists for DEFLATE, so the operator is
    * spec-gated (the streaming/sink convention). */
  def deflateLen(t: UTF8String): Long = {
    val bytes = t.getBytes
    if (bytes.isEmpty) return 0L
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Per-document TextRank, entire graph + iteration in ONE kernel
    * call (the q171/q179 fusion lesson: a per-doc graph is
    * partition-local by construction — building it with corpus-wide
    * joins pays 2·iters shuffles for work a tight loop finishes in
    * microseconds). Adjacency = distinct undirected consecutive-token
    * pairs, self-loops dropped; nodes = edge endpoints; then `iters`
    * rounds of EXACTLY the q119 1e12 integer recurrence
    * (r0 = S/n; r' = 15S/(100n) + 85·Σ(r_src/outdeg_src)/100, all
    * integer divisions) — bit-identical to the unrolled SQL oracle.
    * Returns the top `topK` nodes by (rank desc, token asc) encoded
    * "token\trank" (tokens are whitespace-split upstream, so TAB can't
    * occur); empty array when the doc has no non-loop adjacency. */
  def textRankTopK(toks: ArrayData, iters: Int, topK: Int): ArrayData = {
    val n = toks.numElements()
    def empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
    if (n < 2) return empty
    val SCALE = 1000000000000L
    val idx = new java.util.HashMap[UTF8String, Integer]
    val words = new scala.collection.mutable.ArrayBuffer[UTF8String]
    def wordId(w: UTF8String): Int = {
      val got = idx.get(w)
      if (got != null) got.intValue()
      else { val v = words.length; idx.put(w, v); words += w; v }
    }
    val edgeSet = new java.util.HashSet[java.lang.Long]
    var prev = wordId(toks.getUTF8String(0))
    var i = 1
    while (i < n) {
      val cur = wordId(toks.getUTF8String(i))
      if (cur != prev) {
        edgeSet.add((prev.toLong << 32) | cur)
        edgeSet.add((cur.toLong << 32) | prev)
      }
      prev = cur
      i += 1
    }
    if (edgeSet.isEmpty) return empty
    val edges = new Array[Long](edgeSet.size)
    val it = edgeSet.iterator()
    i = 0
    while (it.hasNext) { edges(i) = it.next().longValue(); i += 1 }
    val v = words.length
    val outdeg = new Array[Int](v)
    i = 0
    while (i < edges.length) { outdeg((edges(i) >>> 32).toInt) += 1; i += 1 }
    var nNodes = 0
    i = 0
    while (i < v) { if (outdeg(i) > 0) nNodes += 1; i += 1 }
    val base = (15L * SCALE) / (100L * nNodes)
    var rank = new Array[Long](v)
    i = 0
    while (i < v) { if (outdeg(i) > 0) rank(i) = SCALE / nNodes; i += 1 }
    var round = 0
    while (round < iters) {
      val contrib = new Array[Long](v)
      i = 0
      while (i < edges.length) {
        val s = (edges(i) >>> 32).toInt
        contrib((edges(i) & 0xffffffffL).toInt) += rank(s) / outdeg(s)
        i += 1
      }
      val next = new Array[Long](v)
      i = 0
      while (i < v) {
        if (outdeg(i) > 0) next(i) = base + (85L * contrib(i)) / 100L
        i += 1
      }
      rank = next
      round += 1
    }
    val nodeIds = Array.range(0, v).filter(outdeg(_) > 0)
    val top = nodeIds.sortWith { (a, b) =>
      if (rank(a) != rank(b)) rank(a) > rank(b)
      else words(a).compareTo(words(b)) < 0
    }.take(topK)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      top.map(w => UTF8String.fromString(
        words(w).toString + "\t" + rank(w)): Any))
  }

  /** Squared L2 distances from x to each of the m reference vectors
    * flattened row-major into `flat` (index-order accumulation — the
    * list_reduce oracle convention). Non-finite x returns an empty
    * array (row excluded + countable). Powers the Hopkins pass: one
    * kernel call per corpus row instead of an m-way explode join. */
  def dist2ToSet(x: ArrayData, flat: ArrayData, m: Int): ArrayData = {
    val d = x.numElements()
    var i = 0
    while (i < d) {
      val xi = x.getDouble(i)
      if (java.lang.Double.isNaN(xi) || java.lang.Double.isInfinite(xi))
        return UnsafeArrayData.fromPrimitiveArray(Array.empty[Double])
      i += 1
    }
    val out = new Array[Double](m)
    var j = 0
    while (j < m) {
      val base = j * d
      var s = 0.0
      i = 0
      while (i < d) {
        val diff = x.getDouble(i) - flat.getDouble(base + i)
        s += diff * diff
        i += 1
      }
      out(j) = s
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Johnson-Lindenstrauss projection norms in one pass: with the k
    * hyperplanes flattened row-major into `planes` (k·d doubles),
    * y_j = Σ_i x_i·p_{j,i} (index order), and the result is
    * [|x|², Σ_j y_j²] with BOTH sums left-folded in index order (the
    * list_reduce oracle convention). Any non-finite component of x
    * returns an empty array (row excluded + countable). */
  def jlStats(x: ArrayData, planes: ArrayData, k: Int): ArrayData = {
    val d = x.numElements()
    var i = 0
    while (i < d) {
      val xi = x.getDouble(i)
      if (java.lang.Double.isNaN(xi) || java.lang.Double.isInfinite(xi))
        return UnsafeArrayData.fromPrimitiveArray(Array.empty[Double])
      i += 1
    }
    var n2x = 0.0
    i = 0
    while (i < d) { val xi = x.getDouble(i); n2x += xi * xi; i += 1 }
    var n2y = 0.0
    var j = 0
    while (j < k) {
      var y = 0.0
      val base = j * d
      i = 0
      while (i < d) { y += x.getDouble(i) * planes.getDouble(base + i); i += 1 }
      n2y += y * y
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(n2x, n2y))
  }

  /** Norms before/after projecting out a component: one pass computes
    * dot(x,l), dot(l,l), |x|² in index order (left folds — the
    * list_reduce oracle convention), then |x − (dot/ll)·l|². Returns
    * [n2_before, n2_after]; any non-finite component returns an empty
    * array (row excluded + countable, the gramUpperE6 contract). */
  def removeComponentStats(x: ArrayData, l: ArrayData): ArrayData = {
    val d = x.numElements()
    var i = 0
    while (i < d) {
      val xi = x.getDouble(i)
      if (java.lang.Double.isNaN(xi) || java.lang.Double.isInfinite(xi))
        return UnsafeArrayData.fromPrimitiveArray(Array.empty[Double])
      i += 1
    }
    var dot = 0.0
    var ll = 0.0
    var n2b = 0.0
    i = 0
    while (i < d) {
      val xi = x.getDouble(i)
      val li = l.getDouble(i)
      dot += xi * li; ll += li * li; n2b += xi * xi
      i += 1
    }
    val c = if (ll > 0) dot / ll else 0.0
    var n2a = 0.0
    i = 0
    while (i < d) {
      val ai = x.getDouble(i) - c * l.getDouble(i)
      n2a += ai * ai
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(n2b, n2a))
  }

  /** Poisson(1) bootstrap multiplicities for all `b` resamples in ONE
    * pass: per resample i, the multiplicative hash
    * u = pmod(id·41 + i, 2^31)·2654435761 mod 2^32 walks the
    * cumulative-CDF `thresholds` (first index with u < t, else
    * len(thresholds)) — identical to the q167 CASE-chain semantics,
    * but the 2·b independent agg expressions (each re-hashing and
    * re-walking the chain per row) collapse to b cheap element_at
    * reads of one precomputed array. */
  def poissonMults(id: Long, b: Int, thresholds: ArrayData): ArrayData = {
    val k = thresholds.numElements()
    val out = new Array[Long](b)
    var i = 0
    while (i < b) {
      var u = (id * 41 + i) % 2147483648L
      if (u < 0) u += 2147483648L
      u = (u * 2654435761L) % 4294967296L
      var m = 0
      while (m < k && u >= thresholds.getLong(m)) m += 1
      out(i) = m
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Fused Gram-matrix row contribution for the PCA corpus pass:
    * snap every component to a 1e6 fixed-point integer (the q75
    * embedding convention) and emit [e_1..e_d, e_1e_1, e_1e_2, ...,
    * e_de_d] — the d first-moment terms followed by the d(d+1)/2
    * upper-triangle second-moment products — as ONE long array per
    * row. Downstream a single posexplode + groupBy(pos) accumulates
    * every moment sum exactly (DECIMAL), map-side combined; the
    * alternative (a per-row nested transform over d² pair structs)
    * evaluates interpreted. Any non-finite component returns an empty
    * array (the row is excluded and countable, never a poisoned sum —
    * ANSI cast(NaN as long) would kill the job, the q75 lesson). */
  def gramUpperE6(v: ArrayData): ArrayData = {
    val d = v.numElements()
    val e = new Array[Long](d)
    var i = 0
    while (i < d) {
      val x = v.getDouble(i)
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
        return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
      e(i) = Math.floor(x * 1e6 + 0.5).toLong
      i += 1
    }
    val out = new Array[Long](d + d * (d + 1) / 2)
    System.arraycopy(e, 0, out, 0, d)
    var p = d
    i = 0
    while (i < d) {
      var j = i
      while (j < d) { out(p) = e(i) * e(j); p += 1; j += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Order-sensitive Rabin-Karp rolling fingerprint: polynomial fold
    * acc' = (acc*31 + h) mod p over md5-60-bit token hashes reduced
    * mod p (largest prime below 2^31). Seeded with the first token's
    * hash; empty input -> 0. Every intermediate fits comfortably in a
    * signed 64-bit int, so the identical fold runs in any SQL engine. */
  /** REAL image-container header parse (no codec): detect PNG / JPEG /
    * GIF / BMP / WEBP / TIFF from magic bytes and read the pixel
    * dimensions straight out of the container header — the metadata
    * pass a media-curation pipeline runs before any expensive decode
    * (drop tiny images, bucket by aspect ratio) at scan speed. WEBP
    * covers all three layouts (lossy VP8 sync-coded 14-bit dims,
    * lossless VP8L packed 14-bit+1 dims, extended VP8X 24-bit+1
    * canvas); TIFF walks the first IFD in either byte order for tags
    * 256/257 (SHORT or LONG, inline values). Returns [format, width,
    * height] with format 1=PNG 2=JPEG 3=GIF 4=BMP 5=WEBP 6=TIFF
    * 0=unknown (width/height -1 when unknown or truncated);
    * bounds-checked byte arithmetic only — corrupt sizes terminate
    * the walk, they never throw. */
  def imageMeta(bytes: Array[Byte]): ArrayData = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (be16(i) << 16) | be16(i + 2)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    val n = bytes.length
    var fmt = 0; var w = -1; var h = -1
    if (n >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G') {
      fmt = 1; w = be32(16); h = be32(20)
    } else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      fmt = 2
      // walk the marker chain to the first frame header (SOFn)
      var p = 2
      var done = false
      while (!done && p + 3 < n && u8(p) == 0xff) {
        val marker = u8(p + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) p += 2
        else if (marker >= 0xc0 && marker <= 0xcf &&
                 marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (p + 8 < n) { h = be16(p + 5); w = be16(p + 7) }
          done = true
        } else {
          if (p + 3 >= n) done = true
          else p += 2 + be16(p + 2)
        }
      }
    } else if (n >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8') {
      fmt = 3; w = le16(6); h = le16(8)
    } else if (n >= 26 && u8(0) == 'B' && u8(1) == 'M') {
      fmt = 4; w = le32(18); h = math.abs(le32(22)) // height may be top-down negative
    } else if (n >= 16 && u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' &&
               u8(3) == 'F' && u8(8) == 'W' && u8(9) == 'E' && u8(10) == 'B' &&
               u8(11) == 'P') {
      fmt = 5
      val cc = new String(Array(bytes(12), bytes(13), bytes(14), bytes(15)),
        java.nio.charset.StandardCharsets.US_ASCII)
      if (cc == "VP8 " && n >= 30 &&
          u8(23) == 0x9d && u8(24) == 0x01 && u8(25) == 0x2a) {
        // lossy: 14-bit dims after the 3-byte frame tag + sync code
        w = le16(26) & 0x3fff; h = le16(28) & 0x3fff
      } else if (cc == "VP8L" && n >= 25 && u8(20) == 0x2f) {
        // lossless: width-1 / height-1 packed in 14-bit fields
        val b = le32(21)
        w = (b & 0x3fff) + 1; h = ((b >> 14) & 0x3fff) + 1
      } else if (cc == "VP8X" && n >= 30) {
        // extended: 24-bit little-endian canvas minus one
        w = (u8(24) | (u8(25) << 8) | (u8(26) << 16)) + 1
        h = (u8(27) | (u8(28) << 8) | (u8(29) << 16)) + 1
      }
    } else if (n >= 8 &&
               ((u8(0) == 'I' && u8(1) == 'I' && u8(2) == 42 && u8(3) == 0) ||
                (u8(0) == 'M' && u8(1) == 'M' && u8(2) == 0 && u8(3) == 42))) {
      fmt = 6
      val le = u8(0) == 'I'
      def r16(i: Int): Int = if (le) le16(i) else be16(i)
      def r32(i: Int): Int = if (le) le32(i) else be32(i)
      val ifd = r32(4)
      if (ifd >= 8 && ifd + 2 <= n) {
        val cnt = r16(ifd)
        var e = 0
        while (e < cnt && ifd + 2 + 12 * (e + 1) <= n) {
          val off = ifd + 2 + 12 * e
          val tag = r16(off)
          val typ = r16(off + 2)
          // inline SHORT (first 2 bytes of the value field) or LONG
          val value =
            if (typ == 3) r16(off + 8)
            else if (typ == 4) r32(off + 8)
            else -1
          if (tag == 256 && value >= 0) w = value
          if (tag == 257 && value >= 0) h = value
          e += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(Array(fmt, w, h))
  }

  /** FastSS deletion neighborhood (Bocek et al. 2007): every DISTINCT
    * string obtained by deleting up to `k` characters. Two strings are
    * within Levenshtein distance k only if their k-deletion
    * neighborhoods intersect, which turns an edit-distance similarity
    * join into an equi-join on variants — candidates are verified with
    * the exact distance afterwards, so hash/neighborhood collisions
    * only cost work, never correctness. Neighborhood size is
    * C(L, <=k) (L+1 variants at k=1), which is why callers join on
    * SHORT keys (titles, prefixes), never document bodies. UTF-16-unit
    * deletions: supplementary-plane text should be normalized
    * upstream, same caveat as bpeTrain. */
  def deletionVariants(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val all = new scala.collection.mutable.LinkedHashSet[String]
    all += str
    var frontier: Set[String] = Set(str)
    var round = 0
    while (round < k) {
      frontier = frontier.flatMap(v =>
        (0 until v.length).map(i => v.substring(0, i) + v.substring(i + 1)))
      all ++= frontier
      round += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      all.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** REAL audio/video container-header parse (no codec): WAV/RIFF
    * fmt+data chunk walk, MP4/ISO-BMFF box walk (moov/mvhd for
    * timescale+duration, moov/trak/tkhd for visual track dims), FLAC
    * STREAMINFO bit unpack, and MP3 first-frame-header decode (with
    * ID3v2 syncsafe skip) — the pre-decode curation metadata (drop
    * sub-second clips, bucket by resolution/sample rate) at scan
    * speed. Returns
    * [format, duration_ms, sample_rate, channels, width, height]
    * with format 0=unknown 1=wav 2=mp4 3=flac 4=mp3 and -1 for fields
    * the container doesn't carry or a truncated/corrupt header can't
    * supply (MP3 duration assumes CBR at the first frame's bitrate —
    * the honest header-only estimate). Bounds-checked byte arithmetic
    * only — corrupt sizes terminate the walk, they never throw. */
  def mediaMeta(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (le16(i) | (le16(i + 2).toLong << 16)) & 0xffffffffL
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= n && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    var fmt = 0L; var durMs = -1L; var rate = -1L; var ch = -1L
    var w = -1L; var h = -1L
    if (n >= 12 && tag(0, "RIFF") && tag(8, "WAVE")) {
      fmt = 1
      var p = 12
      var byteRate = -1L; var dataLen = -1L
      while (p + 8 <= n) {
        val sz = le32(p + 4)
        if (tag(p, "fmt ") && p + 24 <= n) {
          ch = le16(p + 10); rate = le32(p + 12); byteRate = le32(p + 16)
        } else if (tag(p, "data")) dataLen = sz
        // chunks are word-aligned: odd sizes carry a pad byte
        val step = 8L + sz + (sz & 1)
        p = if (p + step > n) n else (p + step).toInt
      }
      if (dataLen >= 0 && byteRate > 0) durMs = dataLen * 1000L / byteRate
    } else if (n >= 12 && tag(4, "ftyp")) {
      fmt = 2
      // top-level box walk to moov, then one recursion level at a time;
      // box = size(4 BE) + type(4), size==1 -> 64-bit largesize
      def walk(from: Long, to: Long, name: String): (Long, Long) = {
        var p = from
        while (p + 8 <= to) {
          val sz0 = be32(p.toInt)
          val (sz, hdr) =
            if (sz0 == 1 && p + 16 <= to) (be64(p.toInt + 8), 16L)
            else if (sz0 == 0) (to - p, 8L) // box extends to end
            else (sz0, 8L)
          if (sz < hdr) return (-1, -1)
          if ((0 until 4).forall(j => u8(p.toInt + 4 + j) == name.charAt(j)))
            return (p + hdr, math.min(p + sz, to))
          p += sz
        }
        (-1, -1)
      }
      val (moovS, moovE) = walk(0, n, "moov")
      if (moovS >= 0) {
        val (mvhdS, mvhdE) = walk(moovS, moovE, "mvhd")
        if (mvhdS >= 0 && mvhdS + 4 <= mvhdE) {
          val v = u8(mvhdS.toInt)
          if (v == 1 && mvhdS + 28 <= mvhdE) {
            val timescale = be32(mvhdS.toInt + 20)
            val duration = be64(mvhdS.toInt + 24)
            if (timescale > 0) durMs = duration * 1000L / timescale
          } else if (v == 0 && mvhdS + 20 <= mvhdE) {
            val timescale = be32(mvhdS.toInt + 12)
            val duration = be32(mvhdS.toInt + 16)
            if (timescale > 0) durMs = duration * 1000L / timescale
          }
        }
        // first trak with non-zero tkhd dims = the visual track
        var tS = moovS
        var found = false
        while (!found && tS >= 0 && tS < moovE) {
          val (trakS, trakE) = walk(tS, moovE, "trak")
          if (trakS < 0) tS = -1
          else {
            val (tkhdS, tkhdE) = walk(trakS, trakE, "tkhd")
            if (tkhdS >= 0 && tkhdS + 4 <= tkhdE) {
              val v = u8(tkhdS.toInt)
              val dimOff = if (v == 1) 4 + 8 + 8 + 4 + 4 + 8 + 52 else 4 + 4 + 4 + 4 + 4 + 4 + 52
              if (tkhdS + dimOff + 8 <= tkhdE) {
                val tw = be32((tkhdS + dimOff).toInt) >> 16    // 16.16 fixed
                val th = be32((tkhdS + dimOff + 4).toInt) >> 16
                if (tw > 0 && th > 0) { w = tw; h = th; found = true }
              }
            }
            tS = trakE // continue past this trak
          }
        }
      }
    } else if (n >= 26 && tag(0, "fLaC") && (u8(4) & 0x7f) == 0) {
      // FLAC STREAMINFO (block type 0): sample rate 20 bits, channels
      // 3 bits, bps 5 bits, total samples 36 bits, packed at offset 18
      fmt = 3
      val sr = (u8(18) << 12) | (u8(19) << 4) | (u8(20) >> 4)
      if (sr > 0) {
        rate = sr
        ch = ((u8(20) >> 1) & 0x7) + 1
        val total = ((u8(21) & 0xf).toLong << 32) | be32(22)
        if (total > 0) durMs = total * 1000L / sr
      }
    } else {
      // MP3: optional ID3v2 tag (syncsafe 28-bit size), then a frame
      // sync; decode version/layer/bitrate/samplerate/mode tables
      var off = 0
      if (n >= 10 && u8(0) == 'I' && u8(1) == 'D' && u8(2) == '3') {
        val sz = (u8(6) & 0x7f) << 21 | (u8(7) & 0x7f) << 14 |
          (u8(8) & 0x7f) << 7 | (u8(9) & 0x7f)
        off = 10 + sz
      }
      if (off + 4 <= n && u8(off) == 0xff && (u8(off + 1) & 0xe0) == 0xe0) {
        val ver = (u8(off + 1) >> 3) & 3   // 3=MPEG1 2=MPEG2 0=MPEG2.5
        val layer = (u8(off + 1) >> 1) & 3 // 1=Layer III
        val brIdx = (u8(off + 2) >> 4) & 0xf
        val srIdx = (u8(off + 2) >> 2) & 3
        val mode = (u8(off + 3) >> 6) & 3
        val srBase = srIdx match {
          case 0 => 44100L; case 1 => 48000L; case 2 => 32000L; case _ => -1L
        }
        val brL3M1 = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128,
          160, 192, 224, 256, 320, -1)
        val brL3M2 = Array(-1, 8, 16, 24, 32, 40, 48, 56, 64, 80,
          96, 112, 128, 144, 160, -1)
        if (layer == 1 && srBase > 0 && ver != 1) {
          fmt = 4
          rate = ver match {
            case 3 => srBase; case 2 => srBase / 2; case _ => srBase / 4
          }
          ch = if (mode == 3) 1 else 2
          val kbps = if (ver == 3) brL3M1(brIdx) else brL3M2(brIdx)
          if (kbps > 0) durMs = (n - off).toLong * 8L / kbps
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(Array(fmt, durMs, rate, ch, w, h))
  }

  /** Engine-portable 60-bit token hash (md5 first 15 hex nibbles —
    * the fold every SQL engine derives from md5's hex string; see
    * md5Hash60). Exposed for operators that need per-token sign bits
    * replayable in an oracle (q233's projection). */
  def tokenHash60(s: UTF8String): Long = md5Hash60(s)

  /** Hashing-trick linear model score: Σ weights[(md5Hash60(tok) %
    * Prime) % d] over the tokens in order. The per-token MD5 fold is
    * the same one rollingHashMd5 uses, so a SQL oracle replays indices
    * verbatim; left-to-right summation matches a SQL list_reduce. */
  def linearScore(tokens: ArrayData, weightsFlat: ArrayData, d: Int): Double = {
    val n = tokens.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val idx = ((md5Hash60(tokens.getUTF8String(i)) % Prime) % d).toInt
      s += weightsFlat.getDouble(idx)
      i += 1
    }
    s
  }

  def rollingHashMd5(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    var acc = md5Hash60(tokens.getUTF8String(0)) % Prime
    var i = 1
    while (i < n) {
      acc = (acc * 31 + md5Hash60(tokens.getUTF8String(i)) % Prime) % Prime
      i += 1
    }
    acc
  }

  /** First-witness test for LSH pair emission: true iff the two band
    * arrays differ at every index below n — i.e. band n is the FIRST
    * band where the pair collides, so the pair is emitted exactly once
    * across all its matching bands (no pair-dedup shuffle needed). */
  def prefixAllDiffer(a: ArrayData, b: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if (a.getInt(i) == b.getInt(i)) return false
      i += 1
    }
    true
  }

  /** Fraction of the array taken by its most frequent element
    * (repetition signal, e.g. top-bigram fraction); 0.0 for empty. */
  /** Fraction of a token array's bigram multiset taken by the most
    * frequent bigram; <2 tokens -> 0.0. Fused kernel: building the
    * bigram strings with Spark's `transform` would route the whole
    * projection through the interpreted HigherOrderFunction path —
    * here the pairs are counted directly off the token array inside
    * whole-stage codegen. */
  def maxBigramFraction(tokens: ArrayData): Double = {
    val n = tokens.numElements()
    if (n < 2) return 0.0
    val counts = new java.util.HashMap[UTF8String, Integer]()
    val space = UTF8String.fromString(" ")
    var i = 0
    var mx = 0
    while (i < n - 1) {
      val bg = UTF8String.concat(tokens.getUTF8String(i), space, tokens.getUTF8String(i + 1))
      val prev = counts.get(bg)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(bg, c)
      if (c > mx) mx = c
      i += 1
    }
    mx.toDouble / (n - 1)
  }

  def maxFreqFraction(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    var mx = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val prev = counts.get(s)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(s, c)
      if (c > mx) mx = c
      i += 1
    }
    mx.toDouble / n
  }

  /** Indices of the nProbe centroids nearest (by cosine) to v.
    * centroidsFlat is nC concatenated dim-wide double vectors (a
    * foldable literal — the coarse quantizer codebook). Selection sort
    * over nC scores: nC is small by construction. */
  /** As nearestCentroids but ranked by EUCLIDEAN distance (asc, ties to
    * the lower index) — the metric product-quantization sub-codebooks
    * need: near-zero sub-vectors must map to near-zero centroids, which
    * scale-invariant cosine cannot express. */
  def nearestCentroidsL2(v: ArrayData, centroidsFlat: ArrayData, dim: Int, nProbe: Int): ArrayData = {
    val nC = centroidsFlat.numElements() / dim
    val scores = new Array[Double](nC)
    var c = 0
    while (c < nC) {
      var ss = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        val d = v.getDouble(i) - centroidsFlat.getDouble(off + i)
        ss += d * d
        i += 1
      }
      scores(c) = -ss // negate: shared best-first selection below
      c += 1
    }
    pickTop(scores, math.min(nProbe, nC))
  }

  /** Indices of the nProbe best scores, best-first, ties to the lower
    * index (shared by the cosine and L2 centroid rankers). */
  private def pickTop(scores: Array[Double], n: Int): ArrayData = {
    val nC = scores.length
    val out = new Array[Int](n)
    val taken = new Array[Boolean](nC)
    var r = 0
    while (r < n) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < nC) {
        if (!taken(c) && (scores(c) > bestScore || (scores(c) == bestScore && (best < 0 || c < best)))) {
          best = c; bestScore = scores(c)
        }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def nearestCentroids(v: ArrayData, centroidsFlat: ArrayData, dim: Int, nProbe: Int): ArrayData = {
    val nC = centroidsFlat.numElements() / dim
    val scores = new Array[Double](nC)
    var c = 0
    while (c < nC) {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        val x = v.getDouble(i)
        val y = centroidsFlat.getDouble(off + i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      scores(c) = dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    pickTop(scores, math.min(nProbe, nC))
  }

  /** 60-bit SimHash: md5-60-bit hash per token, +/-1 vote per bit,
    * strictly-positive vote -> bit set. 60 bits (not 64) so the per-token
    * hash is the engine-portable md5 prefix — any md5-capable engine
    * reproduces the signature bit-for-bit. */
  def simHash(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = md5Hash60(tokens.getUTF8String(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Jaro–Winkler similarity (Winkler 1990), the record-linkage
    * standard: Jaro's match/transposition ratio plus the common-prefix
    * boost l·0.1·(1 − jaro) (prefix capped at 4), applied only when
    * jaro ≥ 0.7 (the canonical boost threshold). Matches DuckDB's
    * `jaro_winkler_similarity` bit-for-bit on ASCII/BMP input (the
    * empty-string and identical-string conventions included: empty →
    * 0, identical → 1), which is what makes a SQL oracle replayable.
    * Works on UTF-16 code units — identical to byte semantics for
    * ASCII keys, the record-linkage use case. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val mw = math.max(n1, n2) / 2 - 1
    val f1 = new Array[Boolean](n1)
    val f2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - mw)
      val hi = math.min(n2 - 1, i + mw)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!f2(j) && s2.charAt(j) == s1.charAt(i)) {
          f1(i) = true; f2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < n1) {
      if (f1(i)) {
        while (!f2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / n1 + md / n2 + (md - t) / md) / 3.0
    if (jaro < 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(n1, n2))
    while (l < lMax && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Two-level public suffixes for registered-domain extraction — the
    * common ccTLD second-level registries (the heuristic core of the
    * public-suffix list; a production deployment would broadcast the
    * full Mozilla PSL as a config table, same code path). */
  private val twoLevelSuffixes: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
      "com.au", "net.au", "org.au", "edu.au", "gov.au",
      "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
      "com.br", "net.br", "org.br", "gov.br",
      "com.cn", "net.cn", "org.cn", "gov.cn",
      "com.mx", "org.mx", "com.ar", "com.tr", "com.sg", "com.hk",
      "com.tw", "co.in", "net.in", "org.in", "co.kr", "or.kr",
      "co.za", "org.za", "co.nz", "net.nz", "org.nz",
      "com.ru", "com.pl", "com.ua", "co.il", "org.il",
      "com.sa", "com.eg", "com.my", "com.ph", "com.vn", "co.th",
      "com.id", "co.id").foreach(s.add)
    s
  }

  /** URL decomposition: [scheme, host, port, path, query, fragment,
    * registered_domain] — the host-level-curation primitive
    * (DataComp/RefinedWeb-style first pass: host rollups, domain
    * blocklists, URL dedup keys). RFC-3986-lite: requires an absolute
    * URL (`scheme:`); a URL without an authority (`mailto:`) gets a
    * null host; userinfo strips at the last '@' of the authority;
    * IPv6 bracket literals keep their brackets as the host and split
    * the port after ']'. scheme and host lowercase (they're
    * case-insensitive; path/query are not). registered_domain is the
    * eTLD+1 under the embedded two-level-suffix table, null for IP
    * literals and single-label hosts. Malformed input → all-null
    * array, never a throw — the nulls ARE the malformed-URL flag.
    * Pure char arithmetic, zero regex, zero allocation beyond the
    * output slices. */
  def urlParts(u: UTF8String): ArrayData = {
    val nulls = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](7))
    if (u == null) return nulls
    val s = u.toString
    val n = s.length
    // scheme: ALPHA *(ALPHA / DIGIT / + / - / .) ":"
    var i = 0
    if (n == 0 || !Character.isLetter(s.charAt(0))) return nulls
    while (i < n && {
      val c = s.charAt(i)
      Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.'
    }) i += 1
    if (i >= n || s.charAt(i) != ':') return nulls
    val scheme = s.substring(0, i).toLowerCase(java.util.Locale.ROOT)
    i += 1
    var host: String = null; var port: String = null
    var regDomain: String = null
    if (i + 1 < n && s.charAt(i) == '/' && s.charAt(i + 1) == '/') {
      i += 2
      var e = i
      while (e < n && { val c = s.charAt(e); c != '/' && c != '?' && c != '#' }) e += 1
      var auth = s.substring(i, e)
      val at = auth.lastIndexOf('@')
      if (at >= 0) auth = auth.substring(at + 1)
      if (auth.nonEmpty && auth.charAt(0) == '[') {
        val rb = auth.indexOf(']')
        if (rb < 0) return nulls // unterminated IPv6 literal
        host = auth.substring(0, rb + 1).toLowerCase(java.util.Locale.ROOT)
        if (rb + 1 < auth.length) {
          if (auth.charAt(rb + 1) != ':') return nulls
          port = auth.substring(rb + 2)
        }
      } else {
        val c = auth.lastIndexOf(':')
        if (c >= 0) { host = auth.substring(0, c); port = auth.substring(c + 1) }
        else host = auth
        host = host.toLowerCase(java.util.Locale.ROOT)
      }
      if (host.isEmpty) host = null
      if (port != null && (port.isEmpty || !port.forall(Character.isDigit)))
        port = null
      // registered domain: dns names only (not IPv6 brackets, not IPv4)
      if (host != null && host.charAt(0) != '[') {
        val lastDot = host.lastIndexOf('.')
        val tld = if (lastDot < 0) host else host.substring(lastDot + 1)
        val isV4 = tld.nonEmpty && tld.forall(Character.isDigit)
        if (lastDot > 0 && !isV4) {
          val prevDot = host.lastIndexOf('.', lastDot - 1)
          val lastTwo = host.substring(prevDot + 1)
          if (twoLevelSuffixes.contains(lastTwo)) {
            if (prevDot > 0) {
              val prev2 = host.lastIndexOf('.', prevDot - 1)
              regDomain = host.substring(prev2 + 1)
            } // bare two-level suffix as host: no registrable domain
          } else regDomain = lastTwo
        }
      }
      i = e
    }
    // path / query / fragment from the remainder
    var path: String = null; var query: String = null; var frag: String = null
    if (i < n) {
      val q = s.indexOf('?', i)
      val h = s.indexOf('#', i)
      val pathEnd = if (q >= 0 && (h < 0 || q < h)) q else if (h >= 0) h else n
      if (pathEnd > i) path = s.substring(i, pathEnd)
      if (q >= 0 && (h < 0 || q < h)) query = s.substring(q + 1, if (h >= 0) h else n)
      if (h >= 0) frag = s.substring(h + 1)
    }
    def u8(x: String): UTF8String = if (x == null) null else UTF8String.fromString(x)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
      u8(scheme), u8(host), u8(port), u8(path), u8(query), u8(frag),
      u8(regDomain)))
  }

  /** FULL Damerau–Levenshtein distance (Lowrance & Wagner 1975): the
    * minimum number of insertions, deletions, substitutions, and
    * transpositions of adjacent characters — UNRESTRICTED, so
    * dl("CA","ABC") = 2 where the common OSA restriction says 3. The
    * alphabet-indexed DP over UTF-16 code units; intended for SHORT
    * blocked keys (quadratic in length), ASCII-safe for engine parity
    * (DuckDB's damerau_levenshtein computes the same metric). */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString; val b = ub.toString
    val n = a.length; val m = b.length
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = n + m
    // d is (n+2) x (m+2) with the Lowrance–Wagner sentinel border
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k: Int = { val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        var best = d(i)(j) + cost                      // substitution / match
        val ins = d(i + 1)(j) + 1                      // insertion
        if (ins < best) best = ins
        val del = d(i)(j + 1) + 1                      // deletion
        if (del < best) best = del
        val tr = d(k)(l) + (i - k - 1) + 1 + (j - l - 1) // transposition
        if (tr < best) best = tr
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1).toLong
  }

  // --------------------------------------------------------------------
  // Real uncompressed-media decode (PGM pixels, WAV-PCM samples)
  // --------------------------------------------------------------------

  /** Synthesize a binary (P5) PGM payload with the deterministic pixel
    * formula p(r, c) = (docId*31 + r*7 + c*13) mod 256 — TEST/DEMO
    * plumbing standing in for payloads read from object storage, so
    * the REAL decoder below has bytes to parse and a SQL oracle can
    * recompute the pixels independently from the same formula. */
  def pgmSynth(docId: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var r = 0
    var p = header.length
    while (r < h) {
      var c = 0
      while (c < w) {
        out(p) = ((docId * 31L + r * 7L + c * 13L) % 256L).toByte
        p += 1
        c += 1
      }
      r += 1
    }
    out
  }

  /** REAL binary-PGM (netpbm P5) decode + box-filter resize — an
    * actual byte-level image decoder, no library: parses the PGM
    * header per the netpbm spec (whitespace-separated tokens, `#`
    * comments to end-of-line, maxval <= 255 single-byte samples),
    * reads the raw row-major pixel plane, and downscales to tw x th
    * with exact integer block means floor(blockSum / blockSize).
    * REQUIRES w % tw == 0 and h % th == 0 (uniform blocks — the
    * contract that keeps the result a pure integer function of the
    * pixels, replayable bit-exactly by a SQL oracle). Returns the
    * tw*th resized pixels row-major; an empty array marks any
    * malformed/truncated/unsupported payload (never throws). */
  def pgmResizePixels(bytes: Array[Byte], tw: Int, th: Int): ArrayData = {
    val empty = ArrayData.toArrayData(Array.empty[Int])
    val n = bytes.length
    if (tw <= 0 || th <= 0 || n < 7 || bytes(0) != 'P' || bytes(1) != '5')
      return empty
    var p = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r' ||
      b == 0x0b || b == 0x0c
    // read the next ASCII unsigned int, skipping whitespace + comments
    def nextInt(): Int = {
      while (p < n && (isWs(bytes(p)) || bytes(p) == '#')) {
        if (bytes(p) == '#') { while (p < n && bytes(p) != '\n') p += 1 }
        else p += 1
      }
      var v = -1
      while (p < n && bytes(p) >= '0' && bytes(p) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (bytes(p) - '0')
        if (v > (1 << 24)) return -1 // corrupt size: bail, never allocate it
        p += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return empty
    if (w % tw != 0 || h % th != 0) return empty
    p += 1 // exactly one whitespace byte separates maxval from the plane
    if (p + w * h > n) return empty
    val bw = w / tw; val bh = h / th; val bs = bw * bh
    val sums = new Array[Int](tw * th)
    var r = 0
    while (r < h) {
      val or = r / bh
      var c = 0
      val rowBase = p + r * w
      while (c < w) {
        sums(or * tw + c / bw) += bytes(rowBase + c) & 0xff
        c += 1
      }
      r += 1
    }
    val out = new Array[Int](tw * th)
    var i = 0
    while (i < out.length) { out(i) = sums(i) / bs; i += 1 }
    ArrayData.toArrayData(out)
  }

  /** Synthesize a binary (P5) PGM payload with a MIXING pixel formula
    * p(pos) = (docId·(pos+13) + pos²·7) mod 256 (pos = r·w + c): the
    * docId·pos cross-term makes documents within an id window of 256
    * mutually uncorrelated (unlike [[pgmSynth]]'s affine formula,
    * where every doc is a constant brightness shift of every other —
    * gradient hashes of such a family all but coincide), while ids
    * CONGRUENT mod 256 repeat the image exactly — free deterministic
    * exact-duplicate families on larger corpora, which is what a real
    * scraped image corpus looks like. With `perturb` set,
    * pixels in the top-left region (r < 2, c < 3 — exactly one 3x2
    * resize block of a 24x16 -> 8x8 downscale) flip by +128 mod 256,
    * planting a NEAR-duplicate: the perturbation reaches only the
    * wraparound-dHash bits adjacent to resize block (0,0), so the
    * planted copy is within Hamming 2 of its original by
    * construction. TEST/DEMO plumbing; the SQL oracle recomputes the
    * same pixels from the formula, never from the bytes. */
  def pgmSynthMix(docId: Long, w: Int, h: Int, perturb: Boolean): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var r = 0
    var p = header.length
    while (r < h) {
      var c = 0
      while (c < w) {
        val pos = r.toLong * w + c
        var v = java.lang.Math.floorMod(docId * (pos + 13L) + pos * pos * 7L, 256L)
        if (perturb && r < 2 && c < 3) v = (v + 128L) % 256L
        out(p) = v.toByte
        p += 1
        c += 1
      }
      r += 1
    }
    out
  }

  /** Wraparound difference hash (dHash) over a row-major w x h pixel
    * grid (the [[pgmResizePixels]] output): bit r·w+c is set iff
    * px(r, c) > px(r, (c+1) mod w) — the horizontal-gradient sign
    * map, the classic perceptual image hash, integer-only and so
    * bit-replayable by a SQL oracle. The wraparound column (vs the
    * usual (w+1)-wide grid) keeps the grid a divisor-constrained
    * box resize AND localizes damage: a perturbation confined to one
    * resize block moves at most the 2 bits whose comparisons touch
    * that block's column in its rows. Requires w·h <= 64; a grid of
    * the wrong size (the malformed-payload empty array) returns 0 —
    * callers null-guard on the array size. */
  def dhash64(px: ArrayData, w: Int, h: Int): Long = {
    if (w <= 0 || h <= 0 || w * h > 64 || px.numElements() != w * h) return 0L
    var bits = 0L
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val a = px.getInt(r * w + c)
        val b = px.getInt(r * w + (c + 1) % w)
        if (a > b) bits |= 1L << (r * w + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Synthesize a 16-bit mono PCM WAV payload with the deterministic
    * sample formula s(i) = ((docId*7919 + i*104729) mod 65536) − 32768
    * — the audio twin of [[pgmSynth]] (test/demo plumbing; the real
    * decoder is [[wavPcmStats]]). Canonical 44-byte RIFF header. */
  def wavSynth(docId: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    def le32(p: Int, v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
      out(p + 2) = ((v >> 16) & 0xff).toByte; out(p + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(p: Int, v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(p: Int, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, out, p, 4)
    }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1) /* PCM */ ; le16(22, 1) /* mono */
    le32(24, sampleRate); le32(28, sampleRate * 2); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < nSamples) {
      val s = (((docId * 7919L + i * 104729L) % 65536L) - 32768L).toInt
      le16(44 + i * 2, s & 0xffff)
      i += 1
    }
    out
  }

  /** REAL WAV-PCM decode — an actual byte-level audio decoder, no
    * library: walks the RIFF chunk list to `fmt ` (requires
    * audioFormat 1 = uncompressed PCM, 16-bit) and `data`, then
    * iterates the little-endian int16 samples (all channels
    * interleaved) computing exact integer aggregates. Returns
    * [n_samples, sample_rate, channels, peak, sum_sq]: peak =
    * max |s|, sum_sq = sum of s^2 as a long (10^15 at a million
    * samples — no overflow until ~10^9 samples per payload, i.e.
    * hours of audio; payloads are chunked long before that). RMS =
    * sqrt(sum_sq / n) stays a caller-side pinned expression so a SQL
    * oracle reproduces it from the same two integers. Empty array
    * marks malformed/truncated/non-PCM16 payloads (never throws). */
  def wavPcmStats(bytes: Array[Byte]): ArrayData = {
    val empty = ArrayData.toArrayData(Array.empty[Long])
    val n = bytes.length
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = le16(i) | (le16(i + 2) << 16)
    def tagIs(i: Int, s: String) =
      bytes(i) == s.charAt(0) && bytes(i + 1) == s.charAt(1) &&
        bytes(i + 2) == s.charAt(2) && bytes(i + 3) == s.charAt(3)
    if (n < 44 || !tagIs(0, "RIFF") || !tagIs(8, "WAVE")) return empty
    var p = 12
    var sampleRate = -1L; var channels = -1L; var bits = -1; var fmtOk = false
    var dataOff = -1; var dataLen = -1
    while (p + 8 <= n && (dataOff < 0 || !fmtOk)) {
      val size = le32(p + 4)
      if (size < 0 || p + 8 + size > n) return empty
      if (tagIs(p, "fmt ") && size >= 16) {
        fmtOk = le16(p + 8) == 1 // uncompressed PCM only
        channels = le16(p + 10)
        sampleRate = le32(p + 12)
        bits = le16(p + 22)
      } else if (tagIs(p, "data")) {
        dataOff = p + 8; dataLen = size
      }
      p += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || bits != 16 || channels < 1 || dataOff < 0) return empty
    val nSamples = dataLen / 2
    var peak = 0L; var ssq = 0L
    var i = 0
    while (i < nSamples) {
      val s = (le16(dataOff + i * 2) << 16) >> 16 // sign-extend int16
      val a = if (s < 0) -s.toLong else s.toLong
      if (a > peak) peak = a
      ssq += s.toLong * s
      i += 1
    }
    ArrayData.toArrayData(Array(nSamples.toLong, sampleRate, channels, peak, ssq))
  }

  /** Popcount of the AND of two equal-width bitmask arrays — the
    * multi-word generalization of the single-long popcount
    * verification (set-intersection size when sets are encoded as
    * vocabulary bitmasks). One tight loop, zero allocation: the
    * designated inner verifier for containment/Jaccard candidate
    * streams on bounded vocabularies (<= 64·W tokens). */
  def maskAndPopcount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      c += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    c
  }

  /** [[wavSynth]] with a PERTURBATION knob — same PCM16 layout and
    * sample formula s(i) = ((docId·7919 + i·104729 + (perturb and
    * i < 8 ? 12345 : 0)) mod 65536) − 32768; with `perturb` set the
    * first 8 samples (exactly ONE frame of the 60-frame 480-sample
    * profile) shift, planting an audio NEAR-duplicate that reaches
    * only the wraparound-gradient bits adjacent to frame 0 — within
    * Hamming 2 of its original by construction. TEST/DEMO plumbing;
    * the SQL oracle recomputes samples from the formula, never the
    * bytes. */
  def wavSynthMix(docId: Long, nSamples: Int, sampleRate: Int,
                  perturb: Boolean): Array[Byte] = {
    val base = wavSynth(docId, nSamples, sampleRate)
    if (!perturb) return base
    var i = 0
    while (i < 8 && i < nSamples) {
      val s = ((docId * 7919L + i * 104729L + 12345L) % 65536L - 32768L).toInt
      base(44 + i * 2) = (s & 0xff).toByte
      base(44 + i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    base
  }

  /** REAL WAV-PCM decode to per-frame MEAN ABSOLUTE AMPLITUDES — the
    * same RIFF chunk walk and int16 sample scan as [[wavPcmStats]],
    * but folded into `nFrames` equal frames of floor(Σ|s| / frameLen)
    * each (interleaved channels ride the flat sample stream; the
    * envelope is what matters, not channel separation). Integer-only,
    * so a SQL oracle replays every frame value exactly — the audio
    * twin of [[pgmResizePixels]]' block means, and the input to the
    * wraparound gradient hash ([[dhash64]] with h = 1) for perceptual
    * audio dedup. Requires nSamples % nFrames == 0 (uniform frames);
    * malformed/unsupported/indivisible payloads return the empty
    * array (never throw). */
  def wavFrameAbsMeans(bytes: Array[Byte], nFrames: Int): ArrayData = {
    val empty = ArrayData.toArrayData(Array.empty[Int])
    if (nFrames <= 0) return empty
    val n = bytes.length
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = le16(i) | (le16(i + 2) << 16)
    def tagIs(i: Int, s: String) =
      bytes(i) == s.charAt(0) && bytes(i + 1) == s.charAt(1) &&
        bytes(i + 2) == s.charAt(2) && bytes(i + 3) == s.charAt(3)
    if (n < 44 || !tagIs(0, "RIFF") || !tagIs(8, "WAVE")) return empty
    var p = 12
    var bits = -1; var fmtOk = false
    var dataOff = -1; var dataLen = -1
    while (p + 8 <= n && (dataOff < 0 || !fmtOk)) {
      val size = le32(p + 4)
      if (size < 0 || p + 8 + size > n) return empty
      if (tagIs(p, "fmt ") && size >= 16) {
        fmtOk = le16(p + 8) == 1 // uncompressed PCM only
        bits = le16(p + 22)
      } else if (tagIs(p, "data")) {
        dataOff = p + 8; dataLen = size
      }
      p += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || bits != 16 || dataOff < 0) return empty
    val nSamples = dataLen / 2
    if (nSamples == 0 || nSamples % nFrames != 0) return empty
    val frameLen = nSamples / nFrames
    val out = new Array[Int](nFrames)
    var k = 0
    var i = 0
    while (k < nFrames) {
      var sum = 0L
      var j = 0
      while (j < frameLen) {
        val s = (le16(dataOff + i * 2) << 16) >> 16 // sign-extend int16
        sum += (if (s < 0) -s.toLong else s.toLong)
        i += 1
        j += 1
      }
      out(k) = (sum / frameLen).toInt
      k += 1
    }
    ArrayData.toArrayData(out)
  }
}
