package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join: identical results to the plain join, hot key scattered. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join; hot key spread over factor sub-keys") {
    // heavily skewed left: 10k rows of key "hot", a handful of others
    val left = ((1 to 10000).map(i => ("hot", i)) ++ Seq(("a", 1), ("b", 2)))
      .toDF("k", "v")
    val right = Seq(("hot", "H"), ("a", "A"), ("c", "C")).toDF("k", "tag")

    val plain = left.join(right, Seq("k")).select("k", "v", "tag")
      .as[(String, Int, String)].collect().sorted
    val salted = Skew.saltedJoin(left, right, Seq("k"), factor = 8)
      .select("k", "v", "tag")
      .as[(String, Int, String)].collect().sorted
    assert(salted.toSeq === plain.toSeq)

    val hot = Skew.hotKeys(left, col("k"), 1)
    assert(hot.head._1 === "hot" && hot.head._2 === 10000L)
  }
}
