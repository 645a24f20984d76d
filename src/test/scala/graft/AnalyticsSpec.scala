package graft

import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQueries

/** Semantics gates for the analytics/retrieval operators — brute-force Scala
  * recounts at sf0.001 (the Verify hash gate covers DuckDB parity at sf0.01).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def eventRows = {
    graft.core.Tables.events(spark, sf0001)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .as[(Long, Long, Long, String, Double, String)].collect()
  }

  private def docRows =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

  test("retention_cohorts ≡ brute-force cohort recount") {
    val ev = eventRows.map(e => (e._3, e._2 / 86400000000L))
    val cohort = ev.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val want = ev.map { case (u, d) => (cohort(u), d - cohort(u), u) }
      .distinct.groupBy(t => (t._1, t._2)).map { case (k, g) => (k._1, k._2, g.size.toLong) }
      .toSet
    val got = AnalyticsQueries.retentionCohorts(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("value_histogram ≡ brute-force binning") {
    val vs = eventRows.map(_._5)
    val want = vs.groupBy(v => math.floor(v / 25.0).toLong).map {
      case (b, g) => (b, g.length.toLong, g.min, g.max)
    }.toSet
    val got = AnalyticsQueries.valueHistogram(spark, sf0001)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got === want)
  }

  test("json_props_stats ≡ brute-force JSON recount") {
    val ks = eventRows.map(e =>
      (e._4, """"k": (-?\d+)""".r.findFirstMatchIn(e._6).get.group(1).toLong))
    val want = ks.groupBy(_._1).map { case (t, g) =>
      val v = g.map(_._2)
      (t, v.length.toLong, v.min, v.max, v.sum, v.distinct.length.toLong)
    }.toSet
    val got = AnalyticsQueries.jsonPropsStats(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("inverted_index ≡ brute-force posting recount (top-5 terms, 1-based pos)") {
    val posts = docRows.flatMap { case (id, text) =>
      text.split(" ").zipWithIndex.map { case (t, i) => (t, id, i + 1L) }
    }
    val top = posts.groupBy(_._1).toSeq.map { case (t, g) => (t, g.length) }
      .sortBy { case (t, c) => (-c, t) }.take(5).map(_._1).toSet
    val want = posts.filter(p => top(p._1)).groupBy(p => (p._1, p._2)).map {
      case ((t, id), g) => (t, id, g.map(_._3).min, g.length.toLong)
    }.toSet
    val got = AnalyticsQueries.invertedIndex(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("bm25_keyword ≡ brute-force BM25 (k1=5/4, b=3/4) recount") {
    val docs = docRows.map { case (id, text) => (id, text.split(" ")) }
    val n = docs.length.toLong
    val tTok = docs.map(_._2.length.toLong).sum
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (t, id, g.length.toLong, ts.length.toLong) }
    }
    val dfm = tf.groupBy(_._1).map { case (t, g) => t -> g.length.toLong }
    val qTerms = dfm.toSeq.sortBy { case (t, d) => (-d, t) }.take(5).map(_._1).toSet
    val scored = tf.filter(r => qTerms(r._1)).map { case (t, id, f, dl) =>
      val df = dfm(t)
      val score = (36L * tTok * f * (2 * n - 2 * df + 1)).toDouble /
        ((2 * df + 1) * (16 * f * tTok + 5 * tTok + 15 * dl * n))
      (t, id, f, df, score)
    }
    val want = scored.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (-r._5, r._2)).zipWithIndex.take(10).map {
        case ((t, id, f, df, s), i) => (t, id, f, df, s, i + 1L)
      }
    }.toSet
    val got = AnalyticsQueries.bm25Keyword(spark, sf0001)
      .as[(String, Long, Long, Long, Double, Long)].collect().toSet
    assert(got === want)
    // the rank cut is a per-term top-k: every term has exactly 10 rows
    // (sf0.001 has >10 docs per common term)
    assert(got.groupBy(_._1).forall(_._2.size == 10))
  }

  test("funnel_steps ≡ brute-force first-view/first-click-after/first-error-after") {
    val ev = eventRows.map(e => (e._3, e._4, e._2))
    val want = ev.filter(_._2 == "view").groupBy(_._1).map { case (u, vs) =>
      val t1 = vs.map(_._3).min
      val t2 = ev.filter(e => e._1 == u && e._2 == "click" && e._3 > t1)
        .map(_._3).minOption
      val t3 = t2.flatMap(t => ev.filter(e => e._1 == u && e._2 == "error" && e._3 > t)
        .map(_._3).minOption)
      (u, t1, t2, t3)
    }.toSet
    val got = AnalyticsQueries.funnelSteps(spark, sf0001)
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got === want)
    // mid-funnel stalls must survive the left joins
    assert(want.exists(_._4.isEmpty) === got.exists(_._4.isEmpty))
  }

  test("concurrent_sessions ≡ brute-force overlap recount") {
    import graft.queries.RelationalQueries
    val sessions = RelationalQueries.sessionizeBatch(spark, sf0001)
      .select(col("user_id"), col("session_idx"), col("start_ms"), col("end_ms"))
      .as[(Long, Long, Long, Long)].collect()
    val want = sessions.map { a =>
      val n = sessions.count(b => a._3 <= b._4 && b._3 <= a._4) - 1L
      (a._1, a._2, n)
    }.toSet
    val got = AnalyticsQueries.concurrentSessions(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("RangeJoin.intervalInterval ≡ cross-join overlap filter, once per pair") {
    val a = Seq((1L, 0L, 10L), (2L, 5L, 5L), (3L, -20L, -1L), (4L, 90L, 200L))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 10L, 12L), (11L, -5L, 0L), (12L, 6L, 7L), (13L, 300L, 301L))
      .toDF("bid", "blo", "bhi")
    val got = graft.operators.RangeJoin
      .intervalInterval(a, "alo", "ahi", b, "blo", "bhi", 10L)
      .select("aid", "bid").as[(Long, Long)].collect().sorted
    val want = (for {
      x <- Seq((1L, 0L, 10L), (2L, 5L, 5L), (3L, -20L, -1L), (4L, 90L, 200L))
      y <- Seq((10L, 10L, 12L), (11L, -5L, 0L), (12L, 6L, 7L), (13L, 300L, 301L))
      if x._2 <= y._3 && y._2 <= x._3
    } yield (x._1, y._1)).sorted
    assert(got.toSeq === want)
    assert(got.length === got.distinct.length, "no pair may meet twice")
  }

  test("cube_doc_counts ≡ brute-force grouping-sets recount") {
    val rows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("lang"), col("source"), col("n_chars"))
      .as[(String, String, Long)].collect()
    def agg(key: (Option[String], Option[String])) = {
      val g = rows.filter(r => key._1.forall(_ == r._1) && key._2.forall(_ == r._2))
      (key._1, key._2, g.length.toLong, g.map(_._3).sum)
    }
    val keys =
      rows.map(r => (Option(r._1), Option(r._2))).distinct ++
      rows.map(r => (Option(r._1), None: Option[String])).distinct ++
      rows.map(r => (None: Option[String], Option(r._2))).distinct ++
      Seq((None, None))
    val want = keys.distinct.map(agg).toSet
    val got = AnalyticsQueries.cubeDocCounts(spark, sf0001)
      .as[(Option[String], Option[String], Long, Long)].collect().toSet
    assert(got === want)
  }
}
