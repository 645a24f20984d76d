package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries

/** Semantics gates for the training-pipeline curation operators (the hash
  * gate in Verify covers engine-vs-DuckDB parity; these pin the *intended*
  * behavior: split stability, packing boundaries, as-of alignment vs a
  * brute-force reference, passage-dedup vs a naive recount).
  */
class PipelineQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("train_split: deterministic, exhaustive, ~80/10/10, stable across runs") {
    val a = PipelineQueries.trainSplit(spark, sf001).collect()
    val b = PipelineQueries.trainSplit(spark, sf001).collect()
    assert(a.sortBy(_.getLong(0)).sameElements(b.sortBy(_.getLong(0))),
      "split assignment must be a pure function of doc_id")
    val n = a.length
    val counts = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.06,
      s"train frac ${counts("train").toDouble / n}")
    assert(counts.values.sum === n, "every doc gets exactly one split")
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 100))
  }

  test("sample_sources: kept fraction tracks the per-source weight") {
    val total = spark.read.parquet(s"$sf001/documents.parquet")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val kept = PipelineQueries.sampleSources(spark, sf001)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    def fracOf(srcs: Seq[String]): Double =
      srcs.map(s => kept.getOrElse(s, 0L)).sum.toDouble / srcs.map(total).sum
    assert(math.abs(fracOf((0 to 4).map(i => s"src$i")) - 0.9) < 0.1)
    assert(math.abs(fracOf((5 to 9).map(i => s"src$i")) - 0.5) < 0.15)
    assert(math.abs(fracOf((10 to 19).map(i => s"src$i")) - 0.2) < 0.12)
  }

  test("dsir_select: top-K matches a brute-force importance recount") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val B = 1024
    def bucket(bg: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % B
    }
    val high = (0 to 4).map(i => s"src$i").toSet
    val occ = docs.flatMap { case (id, src, text) =>
      val t = text.split(" ", -1)
      if (t.length < 2) Nil
      else (0 until t.length - 1).map(i => (id, src, bucket(t(i) + " " + t(i + 1))))
    }
    val tF = occ.filter(o => high(o._2)).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rF = occ.filterNot(o => high(o._2)).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (tt, rt) = (tF.values.sum, rF.values.sum)
    def w(f: Int): BigInt =
      BigInt(tF.getOrElse(f, 0L) + 1) * (rt + B) -
        BigInt(rF.getOrElse(f, 0L) + 1) * (tt + B)
    val scores = occ.groupBy(_._1).view
      .mapValues(os => os.map(o => w(o._3)).sum.toDouble).toMap
    val expect = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(200)
    val got = PipelineQueries.dsirSelect(spark, sf0001).collect()
    assert(got.length === 200)
    assert(got.map(_.getLong(0)).toSet === expect.map(_._1).toSet,
      "selected doc set must match the brute-force top-K")
    got.foreach(r => assert(scores(r.getLong(0)) === r.getDouble(2),
      s"score mismatch for doc ${r.getLong(0)}"))
  }

  test("mix_allocate: sums exactly to the budget; matches a brute-force largest-remainder") {
    val rows = PipelineQueries.mixAllocate(spark, sf001)
      .select("source", "n_tok", "w", "alloc")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._4).sum === 100000L, "allocations must sum exactly to the budget")
    // brute-force recount from the raw table
    val nTok = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("n")).as[(String, Long)].collect().toMap
    val w = nTok.view.mapValues(n => math.floor(math.sqrt(n.toDouble) * 1e6).toLong).toMap
    val tw = w.values.sum
    val q = w.view.mapValues(x => 100000L * x / tw).toMap
    val left = 100000L - q.values.sum
    val byRem = w.toSeq.map { case (s, x) => (s, 100000L * x % tw) }
      .sortBy { case (s, r) => (-r, s) }.map(_._1).zipWithIndex.toMap
    val want = q.map { case (s, qq) => s -> (qq + (if (byRem(s) < left) 1L else 0L)) }
    rows.foreach { case (s, n, ww, a) =>
      assert(n === nTok(s) && ww === w(s) && a === want(s),
        s"$s: got (n=$n w=$ww alloc=$a), want (n=${nTok(s)} w=${w(s)} alloc=${want(s)})")
    }
    // bigger source never gets a smaller scaled weight (monotone in n)
    val sorted = rows.sortBy(_._2)
    sorted.zip(sorted.drop(1)).foreach { case (lo, hi) =>
      assert(lo._3 <= hi._3, s"weight not monotone: $lo vs $hi")
    }
  }

  test("quality_rules: flags match a scala recount on a sample") {
    val rows = PipelineQueries.qualityRules(spark, sf001).limit(50).collect()
    val texts = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val t = texts(r.getLong(0)).split(" ", -1)
      assert(r.getLong(1) === t.length.toLong)
      assert(r.getLong(2) === t.map(_.length.toLong).sum)
      assert(r.getLong(3) === t.groupBy(identity).values.map(_.length).max.toLong)
      assert((r.getLong(4) === 1L) === (t.length >= 20 && t.length <= 1000))
    }
  }

  test("passage_dedup: agrees with a naive passage recount") {
    val naive = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        t.grouped(8).filter(_.length == 8).map(c => (id, c.mkString(" ")))
      }
    val expected = naive.groupBy(_._2).collect {
      case (_, occ) if occ.map(_._1).distinct.length >= 2 =>
        (occ.map(_._1).distinct.length.toLong, occ.length.toLong, occ.map(_._1).min)
    }.toSeq.sorted
    val got = PipelineQueries.passageDedup(spark, sf001)
      .select("n_docs", "n_occur", "keep_doc").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    assert(got.nonEmpty, "sf0.01 corpus must contain cross-doc duplicate passages")
    assert(got === expected)
  }

  test("token_pack: hierarchical prefix sum == single-pass cumsum; bins respect the budget") {
    val got = PipelineQueries.tokenPack(spark, sf001)
      .select("doc_id", "n_tokens", "bin_id").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    var before = 0L
    got.foreach { case (_, n, bin) =>
      assert(bin === before / 2000L, "bin must be floor(tokens_before / budget)")
      before += n
    }
    // bins are contiguous and non-decreasing in doc order
    assert(got.map(_._3).sliding(2).forall(p => p.last - p.head >= 0))
  }

  test("repetition_stats: matches a scala recount; a repeated phrase is flagged") {
    val rows = PipelineQueries.repetitionStats(spark, sf001).limit(40).collect()
    val texts = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val t = texts(r.getLong(0)).split(" ", -1)
      val grams = t.sliding(3).map(_.mkString(" ")).toSeq
      assert(r.getLong(1) === grams.length.toLong)
      assert(r.getLong(2) === (grams.length - grams.distinct.length).toLong)
      assert(r.getLong(3) === grams.groupBy(identity).values.map(_.length).max.toLong)
    }
    // a synthetic all-repetition doc would fail the rule these stats feed
    val spam = Seq((1L, ("spam ham eggs " * 20).trim)).toDF("doc_id", "text")
    val s = PipelineQueries.repetitionStats(spark, sf001)
    assert(s.columns.toSeq ===
      Seq("doc_id", "n_3grams", "n_dup_3grams", "max_3gram_freq"))
    val spamGrams = ("spam ham eggs " * 20).trim.split(" ").sliding(3).toSeq
    assert(spamGrams.length - spamGrams.map(_.mkString(" ")).distinct.length > 50)
  }

  test("norm_dedup: normalization merges trivially-mutated duplicates") {
    import graft.queries.PipelineQueries
    // same content modulo case/punct/whitespace must share one norm group
    val texts = Seq(
      (0L, "The quick brown fox"),
      (1L, "the  quick   brown fox!!"),
      (2L, "THE QUICK, BROWN. FOX"),
      (3L, "a different document"))
    val tmp = java.nio.file.Files.createTempDirectory("normdedup").toString
    texts.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = PipelineQueries.normDedup(spark, tmp)
      .select("keep_id", "n_dups").as[(Long, Long)].collect().sortBy(_._1)
    assert(got === Array((0L, 3L), (3L, 1L)))
  }

  test("asof_join: matches brute-force most-recent-prior-view per purchase") {
    val ev = graft.core.Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val views = ev.filter(_._4 == "view").groupBy(_._2)
    // µs ticks — the precision both engines share (see asofJoin's scaladoc)
    val expected = ev.filter(_._4 == "purchase").map { case (pid, u, pts, _) =>
      val prior = views.getOrElse(u, Array.empty).filter(_._3 / 1000 <= pts / 1000)
      if (prior.isEmpty) (pid, u, None, None)
      else {
        val best = prior.maxBy(v => (v._3 / 1000, v._1))
        (pid, u, Some(best._1), Some(pts / 1000 - best._3 / 1000))
      }
    }.sortBy(_._1)
    val got = PipelineQueries.asofJoin(spark, sf001)
      .select("event_id", "user_id", "view_id", "gap_us")
      .as[(Long, Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(got.length === expected.length)
    assert(got === expected)
    assert(got.exists(_._3.isEmpty), "some purchases should have no prior view")
    assert(got.exists(_._3.nonEmpty))
  }
}
