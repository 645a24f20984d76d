package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{DocStore, Document}
import graft.streaming.Ingest

/** Streaming ingest → LWW store, and watermark window aggregation, driven
  * synchronously with AvailableNow + processAllAvailable.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming DSIR scoring: micro-batch scores ≡ the batch twin, bit-exact") {
    val src = Files.createTempDirectory("dsir-src").toString
    val ck = Files.createTempDirectory("dsir-ck").toString
    val out = Files.createTempDirectory("dsir-out").toString
    val ref = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").as("id"), col("source"), col("text"))
    // model trained ONCE on the reference snapshot (curated sources = target)
    val model = graft.operators.Selection.dsirTrain(ref, "text",
      col("source").isin((0 to 4).map(i => s"src$i").map(lit(_)): _*))
    // the firehose: the same docs arriving as two micro-batches
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val all = ref.select(col("id"), col("text")).as[(Long, String)].collect()
    val (b1, b2) = all.splitAt(all.length / 2)
    b1.toSeq.toDF("id", "text").write.mode("append").parquet(src)
    Ingest.streamDsirScoreInto(spark.readStream.schema(schema).parquet(src),
      model, out, ck).awaitTermination()
    b2.toSeq.toDF("id", "text").write.mode("append").parquet(src)
    Ingest.streamDsirScoreInto(spark.readStream.schema(schema).parquet(src),
      model, out, ck).awaitTermination()
    val got = spark.read.parquet(s"$out/scores")
      .select(col("id"), col("score")).as[(Long, Double)].collect().toSet
    val want = graft.operators.Selection.dsirScore(
        ref.select(col("id"), col("text")), "id", "text", model)
      .as[(Long, Double)].collect().toSet
    assert(got === want, "streamed scores must equal the batch twin bit-exactly")
    assert(new java.io.File(s"$out/scores")
      .listFiles().count(_.getName.startsWith("batch=")) === 2)

    // disjoint-stream smoothing: a doc whose bigrams the training snapshot
    // NEVER saw still scores — each unseen feature carries the add-one
    // weight (1)(R+B) − (1)(T+B), not a silent drop (inner-join-over-
    // observed-buckets would lose it; the firehose case is exactly
    // training-disjoint data)
    val unseen = Seq((999L, "zzqx1 zzqx2 zzqx3")).toDF("id", "text")
    val sc = graft.operators.Selection.dsirScore(unseen, "id", "text", model)
      .as[(Long, Double)].collect()
    assert(sc.length === 1, "unseen-feature doc must still emit a score row")
    val B = model.buckets
    val perUnseen = (BigInt(1) * (model.rTot + B) - BigInt(1) * (model.tTot + B))
    assert(!sc(0)._2.isNaN)
    // exact check when both buckets are unobserved in the model (hash
    // collisions with observed buckets would legitimately shift the score)
    val bucketOf = (bg: String) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % B
    }
    val obs = model.cnts.map(_._1).toSet
    val bgs = Seq("zzqx1 zzqx2", "zzqx2 zzqx3").map(bucketOf(_).toLong)
    if (bgs.forall(!obs.contains(_)))
      assert(sc(0)._2 === (perUnseen * 2).toDouble,
        "unseen-bucket features must carry the add-one smoothing weight")
  }

  test("streaming dedup: batches dedup against accumulated state, ≡ batch twin") {
    val src = Files.createTempDirectory("dedup-src").toString
    val ck = Files.createTempDirectory("dedup-ck").toString
    val state = Files.createTempDirectory("dedup-state").toString
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet hill before dawn breaks"
    val docs1 = Seq(
      (0L, base),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu omicron"), // ≈ 1
      (3L, "one two three four five six seven eight nine ten eleven twelve"),
      (4L, "completely different words about spark shuffles and parquet row groups here"))
    val docs2 = Seq(
      (10L, base.replace("dawn", "dusk")), // ≈ 0 (cross-batch edit)
      (11L, "one two three four five six seven eight nine ten eleven twelve"), // == 3
      (12L, "neural networks learn token embeddings from massive corpora very very quickly today"),
      (13L, "neural networks learn token embeddings from massive corpora very very quickly now"), // ≈ 12
      (14L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu pi")) // joins batch-1 cluster {1,2}
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))

    docs1.toDF("id", "text").write.mode("append").parquet(src)
    Ingest.streamDedupInto(spark.readStream.schema(schema).parquet(src),
      state, ck, threshold = 0.6).awaitTermination()
    docs2.toDF("id", "text").write.mode("append").parquet(src)
    Ingest.streamDedupInto(spark.readStream.schema(schema).parquet(src),
      state, ck, threshold = 0.6).awaitTermination()

    val got = spark.read.parquet(s"$state/pairs")
      .select(least(col("ia"), col("ib")).as("lo"),
        greatest(col("ia"), col("ib")).as("hi"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    val want = graft.operators.Dedup.minHashLshPairs(
        (docs1 ++ docs2).toDF("id", "text"), "id", "text", threshold = 0.6)
      .select(least(col("ia"), col("ib")).as("lo"),
        greatest(col("ia"), col("ib")).as("hi"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got === want, "incremental pairs must equal the batch-twin pair set")
    assert(want.map(p => (p._1, p._2)) ===
      Set((0L, 10L), (1L, 2L), (3L, 11L), (12L, 13L), (1L, 14L), (2L, 14L)))
    // state grew one partition per batch
    assert(new java.io.File(s"$state/bands").listFiles().count(_.getName.startsWith("batch=")) === 2)

    // incremental cluster labels ≡ full-corpus CC: doc 14 (batch 2) joined
    // batch 1's {1,2} cluster THROUGH the prior labels' star edges
    val labelParts = new java.io.File(s"$state/labels").listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
    val gotLabels = spark.read.parquet(s"$state/labels/batch=${labelParts.max}")
      .as[(Long, Long)].collect().toMap
    val wantLabels = graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.minHashLshPairs(
          (docs1 ++ docs2).toDF("id", "text"), "id", "text", threshold = 0.6)
          .select(col("ia"), col("ib")))
      .as[(Long, Long)].collect().toMap
    assert(gotLabels === wantLabels)
    assert(gotLabels(14L) === 1L && gotLabels(2L) === 1L,
      s"doc 14 must merge into the batch-1 cluster: $gotLabels")

    // a pair-free batch must not recompute or rewrite labels
    Seq((99L, "entirely novel third batch text with no duplicate partner anywhere at all"))
      .toDF("id", "text").write.mode("append").parquet(src)
    Ingest.streamDedupInto(spark.readStream.schema(schema).parquet(src),
      state, ck, threshold = 0.6).awaitTermination()
    val partsAfter = new java.io.File(s"$state/labels").listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
    assert(partsAfter.max === labelParts.max,
      s"pair-free batch must not write a labels partition: ${partsAfter.toSeq.sorted}")
    val labelsAfter = spark.read.parquet(s"$state/labels/batch=${partsAfter.max}")
      .as[(Long, Long)].collect().toMap
    assert(labelsAfter === wantLabels)
  }

  test("streaming dedup compaction: bounded partitions, same pairs, stale state deleted") {
    val src = Files.createTempDirectory("cdedup-src").toString
    val ck = Files.createTempDirectory("cdedup-ck").toString
    val state = Files.createTempDirectory("cdedup-state").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    // 4 batches; near-dups span batches 0↔2 and 1↔3 so PRE-compaction state
    // must survive the folds for the pairs to come out
    val batches = Seq(
      Seq((0L, "aa bb cc dd ee ff gg hh ii jj kk ll")),
      Seq((10L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen")),
      Seq((20L, "aa bb cc dd ee ff gg hh ii jj kk zz")), // ≈ 0
      Seq((30L, "one two three four five six seven eight nine ten eleven twelve thirteen zz"))) // ≈ 10
    def runStream(): Unit =
      Ingest.streamDedupInto(spark.readStream.schema(schema).parquet(src),
        state, ck, threshold = 0.5, compactEvery = 2).awaitTermination()
    batches.foreach { b =>
      b.toDF("id", "text").write.mode("append").parquet(src)
      runStream()
    }
    val got = spark.read.parquet(s"$state/pairs")
      .select(least(col("ia"), col("ib")).as("lo"),
        greatest(col("ia"), col("ib")).as("hi"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 20L), (10L, 30L)),
      "cross-batch pairs must survive state compaction")
    // marker advanced and superseded partitions were physically deleted
    val marker = java.nio.file.Paths.get(s"$state/compacted_through")
    val t = graft.core.AtomicFiles.readLongSafe(marker)
    assert(t.nonEmpty && t.get >= 1L, s"marker should have advanced, got $t")
    val live = new java.io.File(s"$state/bands").listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
    assert(live.forall(_ >= t.get - 2), s"stale partitions linger: ${live.toSeq.sorted}")
    assert(live.length <= 3, s"compaction must bound partitions: ${live.toSeq.sorted}")
  }

  test("streaming decontamination: per-batch pairs union ≡ full-corpus scan") {
    val src = Files.createTempDirectory("decon-src").toString
    val ck = Files.createTempDirectory("decon-ck").toString
    val out = Files.createTempDirectory("decon-out").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val ref = Seq(
      (900L, "held out evaluation question about gradient descent convergence rates in deep networks"),
      (901L, "completely unrelated benchmark prompt concerning medieval trade routes and taxation"))
      .toDF("id", "text")
    val batches = Seq(
      Seq((1L, "held out evaluation question about gradient descent convergence rates in deep nets"), // ≈ 900
        (2L, "fresh original writing about cooking pasta with garlic and olive oil tonight")),
      Seq((3L, "completely unrelated benchmark prompt concerning medieval trade routes and tariffs"), // ≈ 901
        (4L, "more clean text describing a mountain hike in early autumn weather")))
    def run(): Unit =
      Ingest.streamDecontamInto(spark.readStream.schema(schema).parquet(src),
        ref, out, ck, threshold = 0.6).awaitTermination()
    batches.foreach { b =>
      b.toDF("id", "text").write.mode("append").parquet(src); run()
    }
    val got = spark.read.parquet(s"$out/pairs")
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    val want = graft.operators.Dedup.crossCorpusNearDup(
        batches.flatten.toDF("id", "text"), "id", "text", ref, "id", "text",
        threshold = 0.6)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(got === want, "per-batch union must equal the batch twin")
    assert(got === Set((1L, 900L), (3L, 901L)))
  }

  test("file stream ingests into DocStore with LWW across batches") {
    val src = Files.createTempDirectory("stream-src").toString
    val ck = Files.createTempDirectory("stream-ck").toString
    val storeDir = Files.createTempDirectory("stream-store").toString
    val store = new DocStore(spark, storeDir)
    store.init("c")

    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType, containsNull = false)),
      StructField("params", MapType(StringType, StringType))))

    // batch 1
    Seq(("1", Seq(1f, 0f), Map("v" -> "old")), ("2", Seq(2f, 0f), Map("v" -> "a")))
      .toDF("id", "vector", "params").write.mode("append").parquet(src)
    val stream = spark.readStream.schema(schema).parquet(src)
    val q1 = Ingest.streamInto(stream, store, "c", ck)
    q1.awaitTermination()

    // batch 2 overwrites id 1
    Seq(("1", Seq(9f, 0f), Map("v" -> "new")))
      .toDF("id", "vector", "params").write.mode("append").parquet(src)
    val q2 = Ingest.streamInto(spark.readStream.schema(schema).parquet(src),
      store, "c", ck)
    q2.awaitTermination()

    assert(store.read("c").count() === 2)
    assert(store.get("c", "1").get.params("v") === "new") // LWW across micro-batches
  }

  test("indexed ingest stream maintains the IVF layout: no re-assign, search stays pruned") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    val src = Files.createTempDirectory("istream-src").toString
    val ck = Files.createTempDirectory("istream-ck").toString
    val root = Files.createTempDirectory("istream-root").toString
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 4, IndexType.IvfFlat))
    // two separated clusters, then buildIndex materializes the layout
    val seed = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0f else 100f
      Document(i.toString, Array(base + i * 0.01f, 0f, 0f, 0f))
    }
    e.batchUpsertDocuments("c", seed)
    e.buildIndex("c", nlist = 2)
    def stampOf = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/c/index/layout_version")).trim.toLong
    val stamp0 = stampOf
    assert(stamp0 === 1L)

    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType, containsNull = false)),
      StructField("params", MapType(StringType, StringType))))
    // stream two micro-batches of NEW ids near cluster A
    Seq(("100", Seq(0.5f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params").write.mode("append").parquet(src)
    Ingest.streamIntoIndexed(spark.readStream.schema(schema).parquet(src),
      e, "c", ck).awaitTermination()
    Seq(("101", Seq(0.6f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params").write.mode("append").parquet(src)
    Ingest.streamIntoIndexed(spark.readStream.schema(schema).parquet(src),
      e, "c", ck).awaitTermination()

    // the layout stamp tracked BOTH writes — the index is still current, so
    // searches take the materialized partition-pruned path (no re-assign)
    assert(stampOf === stamp0 + 2,
      "layout stamp did not advance with the stream (index went stale)")
    val hits = e.searchDocuments("c", Array(0.55f, 0f, 0f, 0f), 2)
    assert(hits.map(_.id).toSet === Set("100", "101"),
      s"streamed docs not found via the indexed path: ${hits.map(_.id)}")
    // a batch with DUPLICATE ids falls back too (in-batch LWW order is not
    // reproducible across evaluations, so the layout must not guess)
    e.ingestBatchIndexed("c",
      Seq(("200", Seq(1f, 0f, 0f, 0f), Map.empty[String, String]),
          ("200", Seq(2f, 0f, 0f, 0f), Map.empty[String, String]))
        .toDF("id", "vector", "params"))
    assert(stampOf === stamp0 + 2, "duplicate-id batch must not advance the stamp")
    // the layout is now STALE (the duplicate batch bumped the store past the
    // stamp), so even an update batch takes the staling path — and stays
    // correct via the live-corpus fallback
    e.ingestBatchIndexed("c",
      Seq(("100", Seq(90f, 0f, 0f, 0f), Map.empty[String, String]))
        .toDF("id", "vector", "params"))
    assert(stampOf === stamp0 + 2, "a stale layout must not re-stamp on an update")
    val moved = e.searchDocuments("c", Array(90f, 0f, 0f, 0f), 1)
    assert(moved.head.id === "100", "post-update search must see the new vector")
  }

  test("indexed ingest maintains the quantized-flat (sq/bq) code layouts too") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    val root = Files.createTempDirectory("qflat-root").toString
    val e = new Engine(spark, root)
    for ((coll, it, codeCol) <- Seq(("s", IndexType.Sq, "sq_code"),
        ("b", IndexType.Bq, "bq_code"),
        // mrl is a flat "code" layout too — its encode column is the prefix
        ("m", IndexType.Mrl, "mrl_prefix"))) {
      e.createCollection(CollectionConfig(coll, 4, it))
      e.batchUpsertDocuments(coll, (0 until 30).map { i =>
        Document(i.toString, Array(i * 1f, (i % 7) * 1f, 0f, 0f))
      })
      e.buildIndex(coll)
      def stampOf = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$root/$coll/index/layout_version")).trim.toLong
      val stamp0 = stampOf
      val layoutPath = e.layoutDir(coll).get // generation-resolved
      // insert-only batch: codes for the new rows are APPENDED with the
      // frozen model (≡ what a full re-encode would produce), stamp advances
      e.ingestBatchIndexed(coll,
        Seq(("100", Seq(5.5f, 2f, 0f, 0f), Map.empty[String, String]))
          .toDF("id", "vector", "params"),
        assumeNewIds = true, batchId = Some(0L))
      assert(stampOf === stamp0 + 1,
        s"$coll: insert-only batch must keep the code layout current")
      val appended = spark.read.parquet(layoutPath).filter(col("id") === "100")
      assert(appended.count() === 1L, s"$coll: appended row missing from layout")
      assert(appended.schema.fieldNames.contains(codeCol),
        s"$coll: appended row carries no $codeCol")
      val hits = e.searchDocuments(coll, Array(5.5f, 2f, 0f, 0f), 1)
      assert(hits.head.id === "100", s"$coll: streamed doc not served")
      // an UPDATE batch is maintained too: the re-encoded row appends, a
      // tombstone shadows the old incarnation, and the stamp stays current
      e.ingestBatchIndexed(coll,
        Seq(("100", Seq(20f, 1f, 0f, 0f), Map.empty[String, String]))
          .toDF("id", "vector", "params"), batchId = Some(1L))
      assert(stampOf === stamp0 + 2,
        s"$coll: update batch must keep the code layout current")
      assert(e.searchDocuments(coll, Array(20f, 1f, 0f, 0f), 1).head.id === "100")
      // the superseded incarnation at the OLD location no longer surfaces
      assert(e.searchDocuments(coll, Array(5.5f, 2f, 0f, 0f), 1).head.id !== "100",
        s"$coll: tombstoned incarnation still served")
    }
  }

  test("indexed ingest maintains the graph (hnsw) layout via a delta sidecar — no rebuild per batch") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    val root = Files.createTempDirectory("hnsw-delta-root").toString
    val e = new Engine(spark, root)
    for ((coll, params) <- Seq(("g", Map.empty[String, String]),
        ("gr", Map("routeNlist" -> "4")))) {
      e.createCollection(CollectionConfig(coll, 4, IndexType.Hnsw, params = params))
      e.batchUpsertDocuments(coll, (0 until 40).map { i =>
        Document(i.toString, Array(i * 1f, (i % 5) * 1f, 0f, 0f))
      })
      e.buildIndex(coll)
      if (params.nonEmpty) e.setParams(coll, Map("routeNprobe" -> 2))
      def stampOf = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$root/$coll/index/layout_version")).trim.toLong
      def epochOf = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$root/$coll/index/hnsw_epoch")).trim.toLong
      def deltaDir = java.nio.file.Paths.get(s"${e.layoutDir(coll).get}/_delta")
      val stamp0 = stampOf; val epoch0 = epochOf
      // insert-only batch: rows land in the delta sidecar; the layout stays
      // CURRENT (stamp advances — no fallback to a live rebuild) while the
      // adjacency epoch is untouched (executor graph caches stay hot)
      e.ingestBatchIndexed(coll,
        Seq(("100", Seq(7.5f, 100f, 0f, 0f), Map.empty[String, String]))
          .toDF("id", "vector", "params"),
        assumeNewIds = true, batchId = Some(0L))
      assert(stampOf === stamp0 + 1,
        s"$coll: insert-only batch must keep the graph layout current")
      assert(epochOf === epoch0,
        s"$coll: a delta append must not re-epoch the adjacency")
      assert(java.nio.file.Files.exists(deltaDir), s"$coll: no delta sidecar")
      // the streamed doc is served: exact scan over the delta merges with
      // the graph beams
      assert(e.searchDocuments(coll, Array(7.5f, 100f, 0f, 0f), 1).head.id === "100",
        s"$coll: streamed doc not served from the delta")
      // pre-existing docs still come from the graph
      assert(e.searchDocuments(coll, Array(12f, 2f, 0f, 0f), 1).head.id === "12")
      // buildIndex folds the delta into fresh adjacency and clears it
      e.buildIndex(coll)
      assert(!java.nio.file.Files.exists(deltaDir),
        s"$coll: buildIndex must fold the delta away")
      assert(epochOf > epoch0, s"$coll: rebuild must advance the graph epoch")
      assert(e.searchDocuments(coll, Array(7.5f, 100f, 0f, 0f), 1).head.id === "100")
      // an UPDATE batch is maintained: the new row lands in the delta, a
      // tombstone shadows the adjacency node — the layout stays CURRENT
      // (no stale fallback) and both locations resolve correctly
      val stampU = stampOf
      e.ingestBatchIndexed(coll,
        Seq(("100", Seq(20f, 1f, 0f, 0f), Map.empty[String, String]))
          .toDF("id", "vector", "params"), batchId = Some(1L))
      assert(stampOf === stampU + 1,
        s"$coll: update batch must keep the graph layout current")
      assert(e.searchDocuments(coll, Array(20f, 1f, 0f, 0f), 1).head.id === "100")
      assert(e.searchDocuments(coll, Array(7.5f, 100f, 0f, 0f), 1).head.id !== "100",
        s"$coll: tombstoned adjacency node still served")
    }
  }

  test("deltaCompactRows folds the hnsw delta into fresh adjacency once the threshold is met") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    val root = Files.createTempDirectory("delta-compact").toString
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 4, IndexType.Hnsw,
      params = Map("routeNlist" -> "4", "deltaCompactRows" -> "3")))
    e.batchUpsertDocuments("c", (0 until 30).map { i =>
      Document(i.toString, Array(i * 1f, (i % 5) * 1f, 0f, 0f))
    })
    e.buildIndex("c")
    e.setParams("c", Map("routeNprobe" -> 2))
    def epochOf = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/c/index/hnsw_epoch")).trim.toLong
    def deltaDir = java.nio.file.Paths.get(s"${e.layoutDir("c").get}/_delta")
    val epoch0 = epochOf
    // 2 streamed rows: below the threshold — delta persists, no rebuild
    e.ingestBatchIndexed("c",
      Seq(("100", Seq(50f, 50f, 0f, 0f), Map.empty[String, String]),
          ("101", Seq(51f, 50f, 0f, 0f), Map.empty[String, String]))
        .toDF("id", "vector", "params"),
      assumeNewIds = true, batchId = Some(0L))
    assert(java.nio.file.Files.exists(deltaDir), "sub-threshold delta must persist")
    assert(epochOf === epoch0, "sub-threshold batch must not rebuild")
    // one more row crosses the threshold: the batch folds the delta itself
    e.ingestBatchIndexed("c",
      Seq(("102", Seq(52f, 50f, 0f, 0f), Map.empty[String, String]))
        .toDF("id", "vector", "params"),
      assumeNewIds = true, batchId = Some(1L))
    assert(!java.nio.file.Files.exists(deltaDir),
      "threshold batch must fold the delta into the adjacency")
    assert(epochOf > epoch0, "the fold must advance the graph epoch")
    // every streamed row is served from the REBUILT graph (no delta left)
    for (id <- Seq("100", "101", "102"))
      assert(e.searchDocuments("c", Array(50f + (id.toInt - 100), 50f, 0f, 0f), 1)
        .head.id === id, s"streamed doc $id not served post-fold")
  }

  test("replayed micro-batches never append layout rows twice (at-least-once foreachBatch)") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    val root = Files.createTempDirectory("replay-root").toString
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 4, IndexType.IvfFlat))
    e.batchUpsertDocuments("c", (0 until 20).map { i =>
      Document(i.toString, Array(if (i % 2 == 0) 0f else 100f, i * 0.01f, 0f, 0f))
    })
    e.buildIndex("c", nlist = 2)
    def stampOf = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/c/index/layout_version")).trim.toLong
    def layoutRows(id: String) = spark.read.parquet(e.layoutDir("c").get)
      .filter(col("id") === id).count()
    val b1 = Seq(("100", Seq(0.5f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params")

    // normal apply, then a FULL replay of the same batch id (checkpoint not
    // yet committed when the function returned): the replay must be a no-op
    e.ingestBatchIndexed("c", b1, assumeNewIds = true, batchId = Some(0L))
    val stamp1 = stampOf
    assert(layoutRows("100") === 1L)
    e.ingestBatchIndexed("c", b1, assumeNewIds = true, batchId = Some(0L))
    assert(layoutRows("100") === 1L,
      "full replay appended the batch's rows to the layout a second time")
    assert(stampOf === stamp1, "full replay must not advance the stamp")
    val hits = e.searchDocuments("c", Array(0.5f, 0f, 0f, 0f), 1)
    assert(hits.head.id === "100")

    // crash-interrupted attempt: intent marker present, ledger not written —
    // the previous try may have committed layout rows, so the replay must
    // NOT append again; it re-upserts the store and leaves the layout stale
    val b2 = Seq(("101", Seq(0.6f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/c/index/layout_batch_intent"), "default\n1")
    e.ingestBatchIndexed("c", b2, assumeNewIds = true, batchId = Some(1L))
    assert(layoutRows("101") === 0L,
      "replay after a partial append must not append layout rows")
    assert(stampOf === stamp1, "partial-append replay must leave the stamp behind")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/c/index/layout_last_batch")) === "default\n1")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/c/index/layout_batch_intent")))
    // stale layout ⇒ live-corpus fallback still serves the doc (correctness
    // never depends on the layout)
    val h2 = e.searchDocuments("c", Array(0.6f, 0f, 0f, 0f), 1)
    assert(h2.head.id === "101")
    // a SECOND replay of the settled batch id is a pure no-op
    val before = e.documents("c").count()
    e.ingestBatchIndexed("c", b2, assumeNewIds = true, batchId = Some(1L))
    assert(e.documents("c").count() === before)

    // stale layout ⇒ later batches keep falling back (correct, unpruned)
    // until buildIndex re-currents it — then maintenance resumes
    val b3 = Seq(("102", Seq(0.7f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params")
    e.ingestBatchIndexed("c", b3, assumeNewIds = true, batchId = Some(2L))
    assert(layoutRows("102") === 0L, "stale layout must not be appended to")
    e.buildIndex("c", nlist = 2)
    val b4 = Seq(("103", Seq(0.8f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params")
    e.ingestBatchIndexed("c", b4, assumeNewIds = true, batchId = Some(3L))
    assert(layoutRows("103") === 1L, "rebuilt layout must resume maintenance")
  }

  test("ledger edge cases: unbuilt collection, checkpoint reset, corrupt ledger") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    val root = Files.createTempDirectory("ledger-edge").toString
    val e = new Engine(spark, root)
    // streaming with batchId into an UNBUILT ivf collection (no index dir
    // yet): must not throw and must land in the store (plain staling upsert)
    e.createCollection(CollectionConfig("u", 4, IndexType.IvfFlat))
    val b = Seq(("1", Seq(1f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params")
    e.ingestBatchIndexed("u", b, assumeNewIds = true, batchId = Some(0L),
      streamId = "ckA")
    assert(e.documents("u").count() === 1L)
    // checkpoint reset: stream ckA applied batch 5; a NEW stream ckB
    // restarting at batch 0 must be APPLIED, not skipped as a replay
    val b5 = Seq(("2", Seq(2f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params")
    e.ingestBatchIndexed("u", b5, assumeNewIds = true, batchId = Some(5L),
      streamId = "ckA")
    val b0 = Seq(("3", Seq(3f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params")
    e.ingestBatchIndexed("u", b0, assumeNewIds = true, batchId = Some(0L),
      streamId = "ckB")
    assert(e.documents("u").filter(col("id") === "3").count() === 1L,
      "fresh checkpoint's batch 0 must never read as already-applied")
    // same stream replay of the settled id is still a no-op
    val n = e.documents("u").count()
    e.ingestBatchIndexed("u", b0, assumeNewIds = true, batchId = Some(0L),
      streamId = "ckB")
    assert(e.documents("u").count() === n)
    // corrupt ledger (crash mid-write of an older engine): reads as absent,
    // the batch applies instead of throwing
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/u/index/layout_last_batch"), "")
    val b9 = Seq(("4", Seq(4f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("id", "vector", "params")
    e.ingestBatchIndexed("u", b9, assumeNewIds = true, batchId = Some(9L),
      streamId = "ckB")
    assert(e.documents("u").filter(col("id") === "4").count() === 1L,
      "corrupt ledger must degrade to 'absent', not wedge ingestion")
  }

  test("stream-stream interval join aligns purchases to in-window views; composed latest == batch asof within the gap") {
    import java.sql.Timestamp
    import graft.streaming.Align
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // user 1: view@2, view@5, purchase@7 (both views in a 10-min window;
    // latest = view 11), purchase@20 (no view within 10 min)
    // user 2: purchase@3 (no prior view at all), view@4, purchase@8
    val views = Seq(
      (1L, 10L, t(2)), (1L, 11L, t(5)), (2L, 20L, t(4)))
    val purchases = Seq(
      (1L, 100L, t(7)), (1L, 101L, t(20)), (2L, 200L, t(3)), (2L, 201L, t(8)))
    val vDir = Files.createTempDirectory("align-views").toString
    val pDir = Files.createTempDirectory("align-purch").toString
    views.toDF("user_id", "event_id", "ts").write.mode("append").parquet(vDir)
    purchases.toDF("user_id", "event_id", "ts").write.mode("append").parquet(pDir)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    val q = Align.intervalCandidates(
        spark.readStream.schema(schema).parquet(vDir),
        spark.readStream.schema(schema).parquet(pDir),
        maxGap = "10 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("align_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val cand = spark.table("align_out")
      .select("event_id", "user_id", "view_id", "gap_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    // candidates: every view within [p_ts - 10min, p_ts]
    assert(cand === Set(
      (100L, 1L, 10L, 5L * 60 * 1000000), // view@2 before purchase@7
      (100L, 1L, 11L, 2L * 60 * 1000000), // view@5 before purchase@7
      (201L, 2L, 20L, 4L * 60 * 1000000)), // view@4 before purchase@8
      "interval join must emit exactly the in-window pairs")
    // compose reduce-to-latest (min gap) — must equal the batch as-of
    // restricted to in-window matches
    val latest = cand.groupBy(_._1).map { case (pid, vs) =>
      pid -> vs.minBy(v => (v._4, -v._3))._3
    }
    assert(latest === Map(100L -> 11L, 201L -> 20L),
      "latest-in-window must pick the most recent view")
  }

  test("indexed ingest maintains ivfpq and opq layouts too (encode with existing codebooks)") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    val rnd = new scala.util.Random(17)
    for ((name, it) <- Seq(("pqs", IndexType.IvfPq), ("opqs", IndexType.Opq))) {
      val root = Files.createTempDirectory(s"istream-$name").toString
      val e = new Engine(spark, root)
      e.createCollection(CollectionConfig(name, 8, it, params = Map("m" -> "2")))
      e.batchUpsertDocuments(name, (0 until 80).map { i =>
        Document(i.toString, Array.tabulate(8)(j =>
          (if (j == (i % 4) * 2) 6f else 0.3f) + rnd.nextGaussian().toFloat * 0.3f))
      })
      e.buildIndex(name, nlist = 4)
      def stampOf = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$root/$name/index/layout_version")).trim.toLong
      val stamp0 = stampOf
      // insert-only batch: encoded with the EXISTING codebooks, stamp advances
      e.ingestBatchIndexed(name,
        Seq(("500", Seq(6.05f, 0.3f, 0.3f, 0.3f, 0.3f, 0.3f, 0.3f, 0.3f),
            Map.empty[String, String]))
          .toDF("id", "vector", "params"), assumeNewIds = true)
      assert(stampOf === stamp0 + 1, s"$name: stamp did not track the insert batch")
      val hits = e.searchDocuments(name,
        Array(6.05f, 0.3f, 0.3f, 0.3f, 0.3f, 0.3f, 0.3f, 0.3f), 1)
      assert(hits.head.id === "500",
        s"$name: streamed doc not found via the maintained quantized layout")
    }
  }

  test("stateful sessionization via flatMapGroupsWithState closes sessions on gap + watermark") {
    import graft.streaming.Sessionize
    import graft.streaming.Sessionize.{Event, Session}
    val src = Files.createTempDirectory("sess-src").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(m: Long) = new java.sql.Timestamp(base + m * 60000L)
    // user 1: two sessions separated by a 60-min gap; user 2: one session
    Seq(
      Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0), Event(1L, ts(10), 3.0),
      Event(1L, ts(70), 4.0), Event(1L, ts(75), 5.0),
      Event(2L, ts(0), 10.0),
      Event(3L, ts(500), 0.0)) // late sentinel advances the watermark far enough
      .toDF("userId", "eventTime", "value").write.mode("overwrite").parquet(src)

    val schema = StructType(Seq(
      StructField("userId", LongType), StructField("eventTime", TimestampType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(src)
      .withWatermark("eventTime", "1 minute")
      .as[Event]
    val q = Sessionize.sessions(stream, gapMillis = 30 * 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("sessions").as[Session].collect()
      .map(s => (s.userId, (s.startMillis - base) / 60000, (s.endMillis - base) / 60000,
        s.nEvents, s.sumValue)).toSet
    // sessions closed by in-stream gap AND by watermark timeout
    assert(got.contains((1L, 0L, 10L, 3L, 6.0)), s"missing user1 first session in $got")
    assert(got.contains((1L, 70L, 75L, 2L, 9.0)), s"missing user1 second session in $got")
    assert(got.contains((2L, 0L, 0L, 1L, 10.0)), s"missing user2 session in $got")
  }

  test("windowed counts with watermark match the batch equivalent") {
    val src = Files.createTempDirectory("wstream").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 100).map { i =>
      (new java.sql.Timestamp(base.getTime + i * 60000L), s"t${i % 3}", i.toDouble)
    }
    rows.toDF("ts", "event_type", "value").write.mode("overwrite").parquet(src)

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val agg = Ingest.windowedCounts(
      spark.readStream.schema(schema).parquet(src), "ts", "event_type")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("wout").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("wout")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val want = rows.toDF("ts", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("streaming z-score flags ≡ batch-twin prefix computation across micro-batches") {
    // Spark 4.1 moved MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Monitor
    import graft.streaming.Monitor.{Flag, Obs}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Obs]
    val q = Monitor.zScoreFlags(src.toDS(), 3, 2)
      .writeStream.outputMode("append").format("memory").queryName("zflags").start()
    val b1 = Seq(Obs("a", 1, 10), Obs("a", 2, 12), Obs("a", 3, 11), Obs("b", 4, 5))
    val b2 = Seq(Obs("a", 5, 1000), Obs("a", 6, 11), Obs("b", 7, 5))
    val b3 = Seq(Obs("a", 8, 11)) // judged with the spike already in-state
    for (b <- Seq(b1, b2, b3)) { src.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.table("zflags").as[Flag].collect()
      .map(f => f.id -> f.isOutlier).toMap
    // contract: an event's flag depends only on the stream PREFIX ending
    // with its own micro-batch — replay it directly
    val want = Seq(b1, b2, b3).zipWithIndex.flatMap { case (batch, i) =>
      val pre = Seq(b1, b2, b3).take(i + 1).flatten
      batch.map { e =>
        val vs = pre.filter(_.key == e.key).map(o => BigInt(o.value))
        val n = BigInt(vs.size); val s1 = vs.sum
        val s2 = vs.map(v => v * v).sum
        val dev = n * e.value - s1
        e.id -> (if (BigInt(4) * dev * dev > BigInt(9) * (n * s2 - s1 * s1)) 1L
                 else 0L)
      }
    }.toMap
    assert(got === want)
    assert(got.values.sum > 0 && got.values.sum < got.size,
      s"fixture should mix flags: $got")
  }

  test("streaming IQR flags ≡ batch-twin prefix quartile fences across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Monitor
    import graft.streaming.Monitor.{Flag, Obs}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[Obs]
    val q = Monitor.iqrFlags(src.toDS(), 3, 2)
      .writeStream.outputMode("append").format("memory").queryName("iqrflags").start()
    val b1 = (1 to 20).map(i => Obs("a", i.toLong, 100L + (i % 5)))
    val b2 = Seq(Obs("a", 100L, 5000L), Obs("a", 101L, 102L))
    val b3 = Seq(Obs("a", 102L, 5000L)) // spike repeats; quartiles unmoved
    for (b <- Seq(b1, b2, b3)) { src.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.table("iqrflags").as[Flag].collect()
      .map(f => f.id -> f.isOutlier).toMap
    val want = Seq(b1, b2, b3).zipWithIndex.flatMap { case (batch, i) =>
      val pre = Seq(b1, b2, b3).take(i + 1).flatten.filter(_.key == "a")
      val vs = pre.map(_.value).sorted
      val n = vs.size
      def kth(q: Int) = vs((n * q + 3) / 4 - 1)
      val (p25, p75) = (kth(1), kth(3))
      batch.map { e =>
        val out = 2 * e.value > 2 * p75 + 3 * (p75 - p25) ||
          2 * e.value < 2 * p25 - 3 * (p75 - p25)
        e.id -> (if (out) 1L else 0L)
      }
    }.toMap
    assert(got === want)
    assert(got(100L) === 1L && got(102L) === 1L, s"spikes must flag: $got")
    assert(got(101L) === 0L)
  }

  test("layoutCompactFiles folds the appended code layouts into few files") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    def partFiles(dir: String): Int = {
      val base = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(base)) return 0
      val st = java.nio.file.Files.walk(base)
      try st.filter { p =>
        p.getFileName.toString.startsWith("part-") &&
          !base.relativize(p).toString.split('/').dropRight(1)
            .exists(_.startsWith("_"))
      }.count().toInt
      finally st.close()
    }
    for ((it, tier, clustered) <- Seq((IndexType.IvfFlat, "ivf", true),
        (IndexType.Sq, "sq", false))) {
      val root = Files.createTempDirectory(s"compact-$tier").toString
      val e = new Engine(spark, root)
      // "c" auto-compacts at 4 files; "ctl" is the no-knob control
      e.createCollection(CollectionConfig("c", 4, it,
        params = Map("layoutCompactFiles" -> "4")))
      e.createCollection(CollectionConfig("ctl", 4, it))
      for (coll <- Seq("c", "ctl")) {
        e.batchUpsertDocuments(coll, (0 until 30).map { i =>
          Document(i.toString, Array(if (i % 2 == 0) 0f else 100f, i * 0.01f, 0f, 0f))
        })
        e.buildIndex(coll, nlist = 2)
        for (b <- 0 until 6)
          e.ingestBatchIndexed(coll,
            Seq((s"${100 + b}", Seq(0.5f + b, 0f, 0f, 0f), Map.empty[String, String]))
              .toDF("id", "vector", "params"),
            assumeNewIds = true, batchId = Some(b.toLong))
      }
      def layoutDir(coll: String) = e.layoutDir(coll).get // generation-resolved
      // every single-row batch appends ≥1 file to the control; the knobbed
      // collection folded along the way
      assert(partFiles(layoutDir("ctl")) >= 6,
        s"$tier: control should accumulate appended files")
      assert(partFiles(layoutDir("c")) < partFiles(layoutDir("ctl")),
        s"$tier: auto-compaction never fired")
      // compaction preserved the full row set and kept the layout CURRENT:
      // streamed docs are still served, and one more explicit pass lands the
      // minimal file count (one per cluster / one per size chunk)
      val idsBefore = spark.read.parquet(layoutDir("c"))
        .select("id").collect().map(_.getString(0)).sorted
      assert(e.compactLayout("c"), s"$tier: compactLayout on a current layout must run")
      val idsAfter = spark.read.parquet(layoutDir("c"))
        .select("id").collect().map(_.getString(0)).sorted
      assert(idsAfter === idsBefore, s"$tier: compaction changed the row set")
      assert(partFiles(layoutDir("c")) <= (if (clustered) 2 else 1),
        s"$tier: compacted layout still fragmented")
      val stamp = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$root/c/index/layout_version")).trim.toLong
      assert(stamp > 0, s"$tier: layout must stay stamped current after compaction")
      for (b <- 0 until 6)
        assert(e.searchDocuments("c", Array(0.5f + b, 0f, 0f, 0f), 1)
          .head.id === s"${100 + b}", s"$tier: streamed doc ${100 + b} not served")
      // a stale layout has nothing to compact (the next buildIndex
      // rewrites). REST upserts are MAINTAINED now, so stale via the
      // documented staling path: in-batch duplicate ids force the
      // store-only fallback, leaving the stamp behind
      e.ingestBatchIndexed("c",
        Seq(("100", Seq(9f, 9f, 9f, 9f), Map.empty[String, String]),
            ("100", Seq(9f, 9f, 9f, 9f), Map.empty[String, String]))
          .toDF("id", "vector", "params"))
      assert(!e.compactLayout("c"), s"$tier: compaction must no-op on a stale layout")
    }
  }

  test("CDC stream (upserts + deletes) keeps the indexed layout current and serving") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    val src = Files.createTempDirectory("cdc-src").toString
    val ck = Files.createTempDirectory("cdc-ck").toString
    val root = Files.createTempDirectory("cdc-root").toString
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 4, IndexType.IvfFlat))
    e.batchUpsertDocuments("c", (0 until 30).map { i =>
      Document(i.toString, Array(i * 1f, (i % 7) * 1f, 0f, 0f))
    })
    e.buildIndex("c", nlist = 2)
    def stampOf = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$root/c/index/layout_version")).trim.toLong
    val s0 = stampOf
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("vector", ArrayType(FloatType, containsNull = false)),
      StructField("params", MapType(StringType, StringType)),
      StructField("is_deleted", BooleanType)))
    // batch 1: one update (id 3 moves far away) + one delete (id 5)
    Seq(("3", Seq(50f, 50f, 0f, 0f), Map.empty[String, String], false),
        ("5", Seq(0f, 0f, 0f, 0f), Map.empty[String, String], true))
      .toDF("id", "vector", "params", "is_deleted")
      .write.mode("append").parquet(src)
    Ingest.streamCdcInto(spark.readStream.schema(schema).parquet(src),
      e, "c", ck).awaitTermination()
    // upsert bumped one version, delete another — and BOTH maintained
    assert(stampOf === s0 + 2,
      "CDC batch staled the layout (maintenance did not run)")
    assert(e.searchDocuments("c", Array(50f, 50f, 0f, 0f), 1).head.id === "3")
    val nearOld = e.searchDocuments("c", Array(4.9f, 4f, 0f, 0f), 5).map(_.id)
    assert(!nearOld.contains("5"), s"streamed delete still served: $nearOld")
    assert(!nearOld.contains("3"), s"updated id's old incarnation served: $nearOld")
    // batch 2: a fresh insert — same stream, layout stays current
    Seq(("100", Seq(90f, 0f, 0f, 0f), Map.empty[String, String], false))
      .toDF("id", "vector", "params", "is_deleted")
      .write.mode("append").parquet(src)
    Ingest.streamCdcInto(spark.readStream.schema(schema).parquet(src),
      e, "c", ck).awaitTermination()
    assert(stampOf === s0 + 3, "insert batch staled the layout")
    assert(e.searchDocuments("c", Array(90f, 0f, 0f, 0f), 1).head.id === "100")
  }

  test("an in-flight compaction marker makes a racing ingest stale the layout, not stamp it") {
    import graft.api.Engine
    import graft.core.{CollectionConfig, IndexType}
    val root = Files.createTempDirectory("compact-race").toString
    val e = new Engine(spark, root)
    e.createCollection(CollectionConfig("c", 4, IndexType.Sq))
    e.batchUpsertDocuments("c", (0 until 20).map { i =>
      Document(i.toString, Array(i * 0.1f, 0f, 0f, 0f))
    })
    e.buildIndex("c", nlist = 2)
    val stampPath = java.nio.file.Paths.get(s"$root/c/index/layout_version")
    assert(java.nio.file.Files.exists(stampPath), "setup: layout must be current")
    // simulate the advisor's window: a compaction has read the layout (its
    // intent marker is down) when an ingest batch appends — the ingest's
    // rows may be destroyed by the compaction's delete+rename swap, so the
    // ingest must leave the layout STALE instead of certifying it current
    // (compaction never bumps versions, so the ingest's currentVersion==v
    // guard alone cannot see the race)
    val intent = java.nio.file.Paths.get(s"$root/c/index/compact_intent")
    java.nio.file.Files.writeString(intent, "1")
    val stampBefore = java.nio.file.Files.readString(stampPath).trim.toLong
    e.ingestBatchIndexed("c",
      Seq(("100", Seq(0.5f, 0f, 0f, 0f), Map.empty[String, String]))
        .toDF("id", "vector", "params"),
      assumeNewIds = true, batchId = Some(0L))
    // the ingest bumped the store version but must NOT have advanced the
    // layout stamp past the pre-race value — stamp != live version ⇒ stale
    assert(java.nio.file.Files.readString(stampPath).trim.toLong === stampBefore,
      "ingest stamped the layout current while a compaction was in flight")
    // the batch itself landed in the store — only the layout staled
    assert(e.searchDocuments("c", Array(0.5f, 0f, 0f, 0f), 1).head.id === "100")
    // a full rebuild supersedes the crashed/raced compaction: the marker is
    // cleared and the layout stamps current again
    e.buildIndex("c", nlist = 2)
    assert(!java.nio.file.Files.exists(intent),
      "buildIndex must clear a leftover compaction marker")
    assert(java.nio.file.Files.exists(stampPath),
      "buildIndex must restore the layout stamp")
  }
}
