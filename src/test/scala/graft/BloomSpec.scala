package graft

import org.apache.spark.sql.{functions => sf}
import graft.operators.Bloom
import graft.sources.Tables

/** Bloom-prefiltered join specs: the builder/probe hash agreement (no
  * false negatives — the property the whole design rests on), exactness
  * of the semi/anti variants vs the plain joins, and probe selectivity. */
class BloomSpec extends SparkFunSuite {
  import spark.implicits._

  private def orders = Tables.load(spark, sf001, "orders")
  private def lineitem = Tables.load(spark, sf001, "lineitem")

  test("mightContain never rejects an inserted key (no false negatives)") {
    val keys = orders.select(sf.col("o_orderkey"))
    val bits = Bloom.build(keys, "o_orderkey", numBits = 1 << 14)
    // every builder key must probe positive — bit-for-bit hash agreement
    assert(keys.filter(!Bloom.mightContain(sf.col("o_orderkey"), bits)).count() == 0)
  }

  test("mightContain is selective on non-members (FPR sanity)") {
    val members = orders.select(sf.col("o_orderkey"))
      .filter(sf.col("o_orderkey") % 2 === 0)
    val nonMembers = orders.select(sf.col("o_orderkey"))
      .filter(sf.col("o_orderkey") % 2 === 1)
    val bits = Bloom.build(members, "o_orderkey", numBits = 1 << 17)
    val n = nonMembers.count()
    val fp = nonMembers.filter(Bloom.mightContain(sf.col("o_orderkey"), bits)).count()
    // m/n ~ 175 bits per key at sf0.001 -> theoretical FPR ~ 1e-6; allow 1%
    assert(fp.toDouble / n < 0.01, s"false-positive rate ${fp.toDouble / n}")
  }

  test("semiJoin equals the plain left-semi join") {
    val urgent = orders.filter(sf.col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val got = Bloom.semiJoin(lineitem, urgent, "l_orderkey", "o_orderkey",
      numBits = 1 << 14).select("l_orderkey", "l_linenumber")
    val want = lineitem.join(urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").select("l_orderkey", "l_linenumber")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("antiJoin equals the plain left-anti join") {
    val urgent = orders.filter(sf.col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val got = Bloom.antiJoin(lineitem, urgent, "l_orderkey", "o_orderkey",
      numBits = 1 << 14).select("l_orderkey", "l_linenumber")
    val want = lineitem.join(urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_anti").select("l_orderkey", "l_linenumber")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("antiJoin joins only the bloom-positive slice") {
    // with a tiny small side, the anti join's join input must be far
    // smaller than the big side: the definite-miss slice bypasses it
    val small = orders.filter(sf.col("o_orderkey") < 10).select("o_orderkey")
    val bits = Bloom.build(small, "o_orderkey", numBits = 1 << 14)
    val positives = lineitem.filter(
      Bloom.mightContain(sf.col("l_orderkey"), bits)).count()
    assert(positives < lineitem.count() / 10,
      s"bloom passes $positives of ${lineitem.count()} rows — not selective")
  }

  test("builder validates numBits and numHashes") {
    intercept[IllegalArgumentException] {
      new Bloom.BloomAgg(100, 4) // not a multiple of 64
    }
    intercept[IllegalArgumentException] {
      new Bloom.BloomAgg(64, 0)
    }
  }
}
