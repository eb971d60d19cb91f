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
