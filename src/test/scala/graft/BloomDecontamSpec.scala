package graft

import org.apache.spark.sql.functions._

import graft.functions.vfn
import graft.operators.Decontam

/** Bloom kernel semantics (no false negatives, bounded false positives,
  * codegen + interpreted parity) and the bloom-pruned decontamination
  * operator's exactness against a brute-force gram join.
  */
class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def bloomOf(items: Seq[String]): Array[Byte] =
    org.apache.spark.sql.graft.BloomMightContain.serialize(
      items.toDF("s").stat.bloomFilter("s", 10000, 0.01))

  test("every inserted value probes true — the no-false-negative contract") {
    val items = (0 until 2000).map(i => s"gram-$i-payload")
    val bytes = bloomOf(items)
    val hits = items.toDF("s").filter(vfn.bloomMightContain(col("s"), bytes)).count()
    assert(hits === items.size.toLong)
  }

  test("false-positive rate on disjoint probes stays near the configured fpp") {
    val bytes = bloomOf((0 until 2000).map(i => s"in-$i"))
    val fp = (0 until 5000).map(i => s"out-$i").toDF("s")
      .filter(vfn.bloomMightContain(col("s"), bytes)).count()
    assert(fp < 250, s"false positives $fp / 5000 — far above fpp=0.01") // 5% guard
  }

  test("interpreted eval matches codegen") {
    val bytes = bloomOf(Seq("alpha", "beta"))
    val probes = Seq("alpha", "beta", "gamma", "delta").toDF("s")
    val gen = probes.filter(vfn.bloomMightContain(col("s"), bytes))
      .collect().map(_.getString(0)).toSet
    // force interpreted path through the expression's eval
    val e = org.apache.spark.sql.graft.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = false), bytes)
    val interp = Seq("alpha", "beta", "gamma", "delta").filter { s =>
      e.eval(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))).asInstanceOf[Boolean]
    }.toSet
    assert(gen.contains("alpha") && gen.contains("beta"))
    assert(interp === Set("alpha", "beta") ++ (gen -- Set("alpha", "beta")))
  }

  test("contamination pairs are exact — equal to the unpruned gram join") {
    val corpus = Seq(
      (100L, "a b c d e f g h"),      // shares 5-gram "b c d e f" with eval 1
      (101L, "x y z w v u t"),        // no overlap
      (102L, "a b c d e f zz"),       // shares "a b c d e" + "b c d e f"
      (103L, "short"),                // whole-text fallback, matches eval 3
      (104L, "q r s t u v w x y z")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "p p b c d e f q q"),
      (2L, "never matching text here at all"),
      (3L, "short")).toDF("doc_id", "text")
    val got = Decontam.ngramContamination(corpus, "doc_id", "text",
        eval, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((100L, 1L, 1L), (102L, 1L, 1L), (103L, 3L, 1L)))
  }

  test("the bloom filter prunes before the join — plan carries the kernel") {
    val corpus = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val eval = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Decontam.ngramContamination(corpus, "doc_id", "text",
      eval, "doc_id", "text", n = 5).queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
  }
}
