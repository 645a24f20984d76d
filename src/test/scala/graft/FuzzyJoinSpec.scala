package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Edit-distance join: blocking completeness (≡ brute force — the property
  * that matters, since the chunk-signature join is only correct if the
  * pigeonhole candidate set has NO false negatives), short-string buckets,
  * randomized edit clouds, and plan shape (equi-join, never cartesian).
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val (m, n) = (a.length, b.length)
    val d = Array.tabulate(m + 1)(i => Array.tabulate(n + 1)(j => if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to m; j <- 1 to n)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(m)(n)
  }

  private def brute(strs: Seq[String], k: Int): Set[(String, String, Int)] = {
    val ds = strs.distinct.sorted
    (for {
      i <- ds.indices; j <- (i + 1) until ds.size
      d = lev(ds(i), ds(j)) if d <= k
    } yield (ds(i), ds(j), d)).toSet
  }

  private def run(strs: Seq[String], k: Int): Set[(String, String, Int)] =
    FuzzyJoin.editDistanceSelfJoin(strs.toDF("s"), "s", k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("crafted pairs: substitutions, inserts, deletes, transposes at k=1,2") {
    val strs = Seq("widget", "wadget", "widgets", "idget", "wigdet", // 2 subs away
      "red bolt", "red bolts", "blue bolt", "red colt", "anchor")
    for (k <- 1 to 3) assert(run(strs, k) === brute(strs, k), s"k=$k")
  }

  test("short strings route through the shared bucket (len <= k)") {
    val strs = Seq("", "a", "b", "ab", "ba", "abc", "abcd", "xyz")
    for (k <- 1 to 3) assert(run(strs, k) === brute(strs, k), s"k=$k")
  }

  test("randomized edit clouds over a small alphabet match brute force") {
    val rnd = new scala.util.Random(42)
    val bases = Seq.fill(12)((0 until (3 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    def mutate(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => val p = rnd.nextInt(s.length); s.patch(p, "", 1) // delete
      case 1 => val p = rnd.nextInt(s.length + 1); s.patch(p, ('a' + rnd.nextInt(3)).toChar.toString, 0)
      case _ if s.nonEmpty => val p = rnd.nextInt(s.length); s.patch(p, ('a' + rnd.nextInt(3)).toChar.toString, 1)
      case _ => s + "a"
    }
    val strs = bases ++ bases.map(mutate) ++ bases.map(s => mutate(mutate(s)))
    for (k <- 1 to 2) assert(run(strs, k) === brute(strs, k), s"k=$k")
  }

  test("unicode multi-byte strings compare by codepoint edits") {
    val strs = Seq("café", "cafe", "cafés", "日本", "日本語")
    assert(run(strs, 1) === brute(strs, 1))
  }

  test("plan is an equi-join on signatures — no cartesian product") {
    val plan = FuzzyJoin.editDistanceSelfJoin(
      Seq("aa", "ab", "bb").toDF("s"), "s", 1).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("rejects k outside [1, 9]") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceSelfJoin(Seq("a").toDF("s"), "s", 0)
    }
  }

  test("signature-bucket cap drops hot-chunk candidates; off by default") {
    // 40 strings sharing the FULL common prefix chunk; pairwise distances
    // are small only between adjacent ids
    val strs = (0 until 40).map(i => f"commonprefix-$i%02d")
    // uncapped: exact
    assert(run(strs, 1) === brute(strs, 1))
    // cap of 8: the shared-prefix chunk's bucket holds all 40 strings
    // (over-cap, dropped) while the per-string suffix chunks are singleton
    // buckets that match nothing — so qualifying pairs, which share ONLY
    // the prefix chunk, all vanish: the explicit trade, never a hang
    val capped = FuzzyJoin.editDistanceSelfJoin(
      strs.toDF("s"), "s", 1, maxSigBucket = Some(8))
    assert(capped.count() === 0)
    // a cap above the group size changes nothing
    val loose = FuzzyJoin.editDistanceSelfJoin(
      strs.toDF("s"), "s", 1, maxSigBucket = Some(100))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(loose === brute(strs, 1))
  }
}
