package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers kernels as SQL functions") {
    // Extensions bind at session construction; getOrCreate would reuse a
    // prior suite's default session and silently skip them, so clear the
    // default first and restore it after. (Do NOT stop the new session —
    // all sessions in the JVM share one SparkContext.)
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT round(graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), 4) AS c,
          |       graft_jaccard(array('a','b'), array('b','c')) AS j,
          |       graft_simhash(array('x','y')) AS s""".stripMargin).head()
      assert(r.getDouble(0) == 1.0)
      assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-12)
      assert(r.getLong(2) != 0L)
      // hashing-trick scorer from SQL: both tokens hash somewhere in the
      // 4-entry table; equal tokens hit the same weight twice
      val ls = spark.sql(
        """SELECT graft_linear_score(array('a','a'), array(0.5d, 0.25d, 0.125d, -1.0d), 4) AS s1,
          |       graft_linear_score(array('a'), array(0.5d, 0.25d, 0.125d, -1.0d), 4) AS s2""".stripMargin)
        .head()
      assert(ls.getDouble(0) == 2 * ls.getDouble(1))
      // FoldGraftKernels: all-literal kernel calls fold at plan time
      val folded = spark.sql("SELECT graft_jaccard(array('a','b'), array('a','b')) AS j")
        .queryExecution.optimizedPlan
      val invokes = folded.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke => s })
      assert(invokes.isEmpty, s"kernel call not constant-folded:\n$folded")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }

  test("CosineSimilarity native expression: codegen path, kernel parity") {
    import SparkSpec.spark
    import spark.implicits._
    // non-literal inputs, or constant folding collapses the whole plan
    // (which is itself the `foldable` contract working)
    val sfn = org.apache.spark.sql.functions
    val df = spark.range(1)
      .select(
        sfn.array(sfn.col("id") + 1.0, sfn.col("id") + 2.0, sfn.col("id") + 3.0).as("a"),
        sfn.array(sfn.col("id") + 3.0, sfn.col("id") + 2.0, sfn.col("id") + 1.0).as("b"))
      .select(graft.functions.cosineSim($"a", $"b").as("c"))
    // value parity with the interpreted kernel
    val expected = graft.plans.Kernels.cosine(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0, 2.0, 3.0)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(3.0, 2.0, 1.0)))
    assert(df.head().getDouble(0) == expected)
    // the expression stays inside whole-stage codegen
    val hasWsc = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    // null-safe: null input -> null output
    val withNull = Seq((Option.empty[Array[Double]], Option(Array(1.0))))
      .toDF("a", "b")
      .select(graft.functions.cosineSim($"a", $"b").as("c"))
    assert(withNull.head().isNullAt(0))
  }

  test("UnicodeNormalize: NFC recomposes, NFKC folds compatibility forms, codegen path") {
    import SparkSpec.spark
    import spark.implicits._
    val sfn = org.apache.spark.sql.functions
    // decomposed a + combining acute, the fi ligature, a fullwidth A --
    // explicit escapes so no editor can silently renormalize the source
    val raw = "a\u0301 \ufb01 \uff21"
    // non-literal input so the expression runs in the generated stage
    val df = spark.range(1).select(
      sfn.concat(sfn.lit(raw), sfn.col("id").cast("string")).as("t"))
    val out = df.select(
      graft.functions.unicodeNormalize($"t", "NFC").as("nfc"),
      graft.functions.unicodeNormalize($"t", "NFKC").as("nfkc")).head()
    assert(out.getString(0) == "\u00e1 \ufb01 \uff210") // NFC: recompose only
    assert(out.getString(1) == "\u00e1 fi A0")            // NFKC: + compatibility folds
    // idempotent; null-safe
    val again = Seq(Option(out.getString(1)), None).toDF("t")
      .select(graft.functions.unicodeNormalize($"t", "NFKC").as("n")).collect()
    assert(again(0).getString(0) == out.getString(1) && again(1).isNullAt(0))
    // invalid form fails fast at construction
    intercept[IllegalArgumentException] {
      graft.functions.unicodeNormalize($"t", "NFX")
    }
  }

  test("SQL join on graft_jaccard >= t compiles to the banded-LSH plan, answer exact") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-simjoin-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      spark.read.parquet(SparkSpec.sf001 + "/documents.parquet")
        .filter(org.apache.spark.sql.functions.col("doc_id") < 150)
        .createOrReplaceTempView("simdocs")
      val q = spark.sql(
        """SELECT a.doc_id AS a_id, b.doc_id AS b_id
          |FROM simdocs a JOIN simdocs b
          |  ON graft_jaccard(split(trim(a.text), '\\s+'),
          |                   split(trim(b.text), '\\s+')) >= 0.9d
          | AND a.doc_id < b.doc_id
          |ORDER BY a_id, b_id""".stripMargin)
      // plan shape: the banded equi-join, not a quadratic join
      val phys = q.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoop"),
        s"similarity join planned quadratic:\n$phys")
      assert(phys.contains("Generate") || phys.contains("posexplode"),
        s"banded explode missing from plan:\n$phys")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // ground truth: all-pairs with the same tokenization, compared
      // through jaccardSorted (a different kernel entry point, so this
      // join is NOT rewritten and stays brute-force)
      val sfn = org.apache.spark.sql.functions
      val toks = spark.read.parquet(SparkSpec.sf001 + "/documents.parquet")
        .filter(sfn.col("doc_id") < 150)
        .select(sfn.col("doc_id"),
          sfn.array_sort(sfn.array_distinct(
            sfn.split(sfn.trim(sfn.col("text")), "\\s+"))).as("t"))
      val brute = toks.select(sfn.col("doc_id").as("a_id"), sfn.col("t").as("ta"))
        .join(toks.select(sfn.col("doc_id").as("b_id"), sfn.col("t").as("tb")),
          sfn.col("a_id") < sfn.col("b_id"))
        .filter(graft.functions.jaccardSorted(sfn.col("ta"), sfn.col("tb")) >= 0.9)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute,
        s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
      assert(got.nonEmpty, "corpus slice produced no near-dup pairs — test is vacuous")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }

  test("low-threshold graft_jaccard joins: rpb=1 tier keeps recall, sub-floor stays exact") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-simjoin-lowt-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      val sfn = org.apache.spark.sql.functions
      spark.read.parquet(SparkSpec.sf001 + "/documents.parquet")
        .filter(sfn.col("doc_id") < 80)
        .createOrReplaceTempView("lowdocs")
      def join(t: Double) = spark.sql(
        s"""SELECT a.doc_id AS a_id, b.doc_id AS b_id
           |FROM lowdocs a JOIN lowdocs b
           |  ON graft_jaccard(split(trim(a.text), '\\\\s+'),
           |                   split(trim(b.text), '\\\\s+')) >= ${t}d
           | AND a.doc_id < b.doc_id
           |ORDER BY a_id, b_id""".stripMargin)
      // ground truth through a different kernel entry point (not rewritten)
      val toks = spark.read.parquet(SparkSpec.sf001 + "/documents.parquet")
        .filter(sfn.col("doc_id") < 80)
        .select(sfn.col("doc_id"),
          sfn.array_sort(sfn.array_distinct(
            sfn.split(sfn.trim(sfn.col("text")), "\\s+"))).as("t"))
      def brute(t: Double) = toks.select(sfn.col("doc_id").as("a_id"), sfn.col("t").as("ta"))
        .join(toks.select(sfn.col("doc_id").as("b_id"), sfn.col("t").as("tb")),
          sfn.col("a_id") < sfn.col("b_id"))
        .filter(graft.functions.jaccardSorted(sfn.col("ta"), sfn.col("tb")) >= t)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // t=0.2: rewritten (rpb=1 tier, miss (1-0.2)^144 ~ 1e-14) and exact
      val q2 = join(0.2)
      val phys2 = q2.queryExecution.executedPlan.toString
      assert(!phys2.contains("CartesianProduct") && !phys2.contains("BroadcastNestedLoop"),
        s"t=0.2 join planned quadratic:\n$phys2")
      val got2 = q2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want2 = brute(0.2)
      assert(got2 == want2,
        s"missing=${(want2 -- got2).take(5)} extra=${(got2 -- want2).take(5)}")
      assert(got2.nonEmpty, "t=0.2 slice produced no pairs — test is vacuous")
      // t=0.05 (below the rewrite floor): NOT rewritten — stays exact/quadratic
      val q05 = join(0.05)
      val phys05 = q05.queryExecution.executedPlan.toString
      assert(phys05.contains("CartesianProduct") || phys05.contains("BroadcastNestedLoop"),
        s"sub-floor join unexpectedly rewritten:\n$phys05")
      assert(q05.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == brute(0.05))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }

  test("salted join equals the plain join") {
    import SparkSpec.spark
    import spark.implicits._
    val big = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val small = Seq((1, "A"), (2, "B")).toDF("sk", "name")
    val salted = graft.operators.Skew.saltedJoin(big, small, "k", "sk", saltFactor = 4)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val plain = big.join(small, $"k" === $"sk")
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}
