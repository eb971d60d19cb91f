package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers kernels as SQL functions") {
    // Needs its own session: extensions bind at session construction.
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
    } finally {
      // leave the shared SparkSpec session (if any) intact
      spark.sql("SELECT 1").collect()
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
