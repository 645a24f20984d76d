package graft

import org.apache.spark.sql.functions._

import graft.operators.Outliers

/** Exact-arithmetic z-score flags: equivalence with the naive float form
  * away from the boundary, exactness past long-overflow magnitudes, and
  * per-group isolation.
  */
class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("flags match the naive float z-score away from the boundary") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i =>
      ("g" + (i % 3), i.toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("g", "id", "v")
    val got = Outliers.zScoreFlags(df, "g", "v", 3, 2)
      .select("id", "is_outlier").as[(Long, Long)].collect().toMap
    // naive driver-side recompute (population sigma)
    val byG = rows.groupBy(_._1)
    val want = rows.map { case (g, id, v) =>
      val vs = byG(g).map(_._3.toDouble)
      val mu = vs.sum / vs.size
      val sd = math.sqrt(vs.map(x => (x - mu) * (x - mu)).sum / vs.size)
      id -> (if (math.abs(v - mu) > 1.5 * sd) 1L else 0L)
    }.toMap
    assert(got === want)
    assert(got.values.sum > 0, "fixture should flag some outliers")
    assert(got.values.sum < rows.size, "fixture should keep some inliers")
  }

  test("exact past long range: squares that overflow Long still flag correctly") {
    // values ~1e9 over ~1e3 rows: (n·x − S1)² ~ 1e24 — far past Long.Max;
    // a long-arithmetic implementation wraps and misflags
    val base = 1000000000L
    val vals = (0 until 1000).map(i => base + (i % 10)) :+ (base + 1000000L)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "id", "v")
    val flagged = Outliers.zScoreFlags(df, "g", "v", 3, 1)
      .filter(col("is_outlier") === 1L)
      .select("v").as[Long].collect().toSet
    assert(flagged === Set(base + 1000000L))
  }

  test("groups are independent; singleton groups never flag") {
    val df = Seq(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1000L), ("a", 4L, 0L),
      ("b", 5L, 999999L)).toDF("g", "id", "v")
    val got = Outliers.zScoreFlags(df, "g", "v", 3, 2)
      .select("id", "is_outlier").as[(Long, Long)].collect().toMap
    assert(got(3L) === 1L) // the spike in a's tight cluster
    assert(got(5L) === 0L) // singleton: sigma 0, never an outlier
    assert(got(1L) === 0L && got(2L) === 0L && got(4L) === 0L)
  }

  test("null values don't skew the moments and are never flagged") {
    // group stats must come from OBSERVED values only: with 98 null rows,
    // a count(*)-based n would drag the mean to ~1 and misflag v=100
    val rows = Seq(("a", 1L, Some(0L)), ("a", 2L, Some(100L))) ++
      (3 to 100).map(i => ("a", i.toLong, None: Option[Long]))
    val df = rows.toDF("g", "id", "v")
    val got = Outliers.zScoreFlags(df, "g", "v", 3, 2)
      .select("id", "is_outlier").as[(Long, Long)].collect().toMap
    // observed {0, 100}: sigma = 50, |v - 50| = 50 < 1.5*50 — no outliers
    assert(got.values.forall(_ == 0L))
    assert(got.size === rows.size, "null-value rows must still come back")
  }

  test("overflow errors loudly instead of misflagging") {
    // two rows near Long.Max: n*S2 exceeds decimal(38,0) in the variance
    // product — the contract is exact-or-error, never a silent wrong flag
    val df = Seq(("g", 1L, 0L), ("g", 2L, 9000000000000000000L))
      .toDF("g", "id", "v")
    val e = intercept[Exception] {
      Outliers.zScoreFlags(df, "g", "v", 3, 1).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("overflow") || msg.contains("38"), msg)
  }

  test("rejects non-positive thresholds") {
    val df = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Outliers.zScoreFlags(df, "g", "v", 0, 2)
    }
    intercept[IllegalArgumentException] {
      Outliers.zScoreFlags(df, "g", "v", 3, 0)
    }
    intercept[IllegalArgumentException] {
      Outliers.iqrFlags(df, "g", "v", 3, 0)
    }
  }

  test("flags are exactly affine-invariant (x -> a·x + b): both operators") {
    // z-score: dev' = a·dev, varN' = a²·varN — both sides of the test
    // scale by a², so flags are IDENTICAL, not approximately so; same for
    // the quartile fences. Exact arithmetic makes this hold to the bit —
    // a float implementation would drift on the transformed copy.
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map(i =>
      ("g" + (i % 2), i.toLong, rnd.nextInt(2000).toLong - 700))
    val df = rows.toDF("g", "id", "v")
    val dfT = rows.map { case (g, id, v) => (g, id, 7L * v - 300L) }
      .toDF("g", "id", "v")
    def flagsOf(d: org.apache.spark.sql.DataFrame,
        f: (org.apache.spark.sql.DataFrame, String, String, Int, Int) => org.apache.spark.sql.DataFrame) =
      f(d, "g", "v", 3, 2).select("id", "is_outlier")
        .as[(Long, Long)].collect().toMap
    assert(flagsOf(df, Outliers.zScoreFlags) === flagsOf(dfT, Outliers.zScoreFlags))
    assert(flagsOf(df, Outliers.iqrFlags) === flagsOf(dfT, Outliers.iqrFlags))
  }

  test("iqrFlags matches a naive quartile-fence recount on random data") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map(i =>
      ("g" + (i % 3), i.toLong, rnd.nextInt(100).toLong)) ++
      Seq(("g0", 9001L, 100000L), ("g1", 9002L, -100000L)) // planted spikes
    val df = rows.toDF("g", "id", "v")
    val got = Outliers.iqrFlags(df, "g", "v", 3, 2)
      .select("id", "is_outlier").as[(Long, Long)].collect().toMap
    val byG = rows.groupBy(_._1)
    val want = rows.map { case (g, id, v) =>
      val vs = byG(g).map(_._3).sorted
      val n = vs.size
      def kth(q: Int) = vs((n * q + 3) / 4 - 1) // ceil(q/4 * n), 1-indexed
      val (p25, p75) = (kth(1), kth(3))
      val out = 2 * v > 2 * p75 + 3 * (p75 - p25) ||
        2 * v < 2 * p25 - 3 * (p75 - p25)
      id -> (if (out) 1L else 0L)
    }.toMap
    assert(got === want)
    assert(got(9001L) === 1L && got(9002L) === 1L)
  }

  test("iqrFlags is robust where zScoreFlags is dragged by the spike") {
    // one huge spike inflates sigma enough to hide itself at 3-sigma in a
    // tight cluster? no — but it DOES hide a second, smaller spike: the
    // classic masking failure the quartile fence is immune to
    val base = (0 until 200).map(i => ("g", i.toLong, 100L + (i % 5)))
    val rows = base ++ Seq(("g", 9001L, 10000000L), ("g", 9002L, 2000L))
    val df = rows.toDF("g", "id", "v")
    val z = Outliers.zScoreFlags(df, "g", "v", 3, 1)
      .select("id", "is_outlier").as[(Long, Long)].collect().toMap
    val iqr = Outliers.iqrFlags(df, "g", "v", 3, 2)
      .select("id", "is_outlier").as[(Long, Long)].collect().toMap
    assert(z(9002L) === 0L, "sigma dragged by the big spike masks the small one")
    assert(iqr(9002L) === 1L && iqr(9001L) === 1L, "quartile fence catches both")
    assert(base.forall { case (_, id, _) => iqr(id) === 0L })
  }

  test("iqrFlags: singleton and tiny groups never flag; nulls pass through") {
    val df = Seq(("a", 1L, Some(5L)), ("b", 2L, Some(1L)), ("b", 3L, Some(100L)),
      ("b", 4L, None: Option[Long])).toDF("g", "id", "v")
    val got = Outliers.iqrFlags(df, "g", "v", 3, 2)
      .select("id", "is_outlier").as[(Long, Long)].collect().toMap
    // a: singleton (p25=p75=5, IQR 0, v inside). b: n=2 -> k25=1, k75=2,
    // fence = [1 - 148.5, 100 + 148.5] — both inside. null row: never flagged
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    assert(got.size === 4)
  }
}
