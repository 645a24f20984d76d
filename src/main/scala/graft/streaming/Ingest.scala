package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.DocStore

/** Structured Streaming ingest (SURVEY §2.7's optional stretch): a document
  * stream lands in the LWW store via `foreachBatch` — each micro-batch is one
  * versioned append, so the streaming checkpoint + atomic batch commit play
  * the role of the reference's WAL (`internal/index/index_manager.go:579-630`):
  * recovery = resume from checkpoint; durability = committed batches.
  */
object Ingest {

  /** Start streaming `source` (schema: id STRING, vector ARRAY<FLOAT>,
    * params MAP<STRING,STRING>) into a DocStore collection. Late/duplicate
    * records are harmless: LWW resolution picks the max version.
    */
  def streamInto(
      source: DataFrame,
      store: DocStore,
      coll: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.upsertDf(coll, batch)
      }
      .start()

  /** Streaming ingest that keeps the collection's IVF layout CURRENT: each
    * micro-batch lands via `Engine.ingestBatchIndexed`, so an insert-only
    * stream never stales the index — searches between batches stay
    * partition-pruned with no full re-assignment (the reference rebuilds via
    * its buildindex endpoint; here maintenance is incremental and free with
    * the batch). `assumeNewIds = true` (default) is the streaming contract:
    * fresh ids per record; pass false to pay a per-batch existence check.
    * The micro-batch id is forwarded so crash-replayed batches (foreachBatch
    * is at-least-once) never append the same rows to the index layout twice
    * — see `Engine.ingestBatchIndexed`'s ledger/intent protocol.
    */
  def streamIntoIndexed(
      source: DataFrame,
      engine: graft.api.Engine,
      coll: String,
      checkpoint: String,
      assumeNewIds: Boolean = true,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the checkpoint path identifies the STREAM: batch ids restart at 0
        // under a new/reset checkpoint, so the replay ledger must never
        // treat a fresh stream's low ids as already-applied
        engine.ingestBatchIndexed(coll, batch, assumeNewIds, Some(batchId),
          streamId = checkpoint)
      }
      .start()

  /** CDC stream (upserts + deletes) that keeps the index layouts SERVING:
    * records carry `is_deleted BOOLEAN`; each micro-batch applies its
    * upserts through `ingestBatchIndexed` (insert/update tombstone
    * maintenance) and its deletes through `deleteDocuments` (tombstone
    * maintenance), so a mutating stream never stales the index to an
    * exact-scan fallback.
    *
    * Contract: one micro-batch must not carry BOTH an upsert and a delete
    * for the same id — a distributed batch has no total record order to
    * arbitrate them (the split below applies upserts first, so deletes win
    * deterministically, but relying on that couples the caller to this
    * implementation). Replay safety: the upsert half rides the
    * ledger/intent protocol; the delete half is idempotent by construction
    * (store deletes are LWW tombstones, layout tombstones aggregate
    * max-per-id — a replayed delete changes nothing a reader can see).
    * Delete ids are micro-batch-sized by definition, so the driver-side
    * collect is bounded by the trigger, not the corpus.
    */
  def streamCdcInto(
      source: DataFrame,
      engine: graft.api.Engine,
      coll: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // null is_deleted reads as upsert: both raw filters would drop a
        // null row (null is neither true nor !true), silently losing every
        // record of a CDC source that encodes "upsert" as absent/null
        val flag = coalesce(col("is_deleted"), lit(false))
        val ups = batch.filter(!flag)
          .select(col("id"), col("vector"), col("params"))
        if (!ups.isEmpty)
          engine.ingestBatchIndexed(coll, ups, assumeNewIds = false,
            Some(batchId), streamId = checkpoint)
        val dels = batch.filter(flag)
          .select(col("id")).collect().map(_.getString(0))
        if (dels.nonEmpty) engine.deleteDocuments(coll, dels.toSeq)
      }
      .start()

  /** Streaming corpus deduplication: every arriving micro-batch is deduped
    * against ALL previously ingested documents, the way a production
    * training-data pipeline ingests — incrementally, never re-shingling the
    * accumulated corpus (state = the banded signature table; cross-batch
    * verification re-shingles only colliding partner docs — see
    * `Dedup.incrementalNearDup`).
    *
    * State layout under `stateDir`: `bands/batch=<id>` (signature bands),
    * `texts/batch=<id>` (id, text), `pairs/batch=<id>` (the batch's emitted
    * near-dup pairs). Everything is written per-batch with OVERWRITE, and
    * reads exclude the current batch id, so an at-least-once foreachBatch
    * replay rewrites byte-identical state instead of duplicating it — no
    * ledger needed.
    */
  /** `compactEvery`: once the live state spans that many per-batch
    * partitions, the current batch folds ALL prior state into its own
    * partition and advances an atomic `compacted_through` marker; stale
    * partitions are physically deleted only by a LATER batch (a replay of
    * the compacting batch still finds the raw partitions it read — the
    * marker only redirects reads once a newer batch is processing). State
    * reads therefore stay O(compactEvery) partitions for any stream
    * length, and every step is replay-idempotent: decisions are a
    * deterministic function of (marker, partition set, batchId), and all
    * writes are per-batch overwrites or atomic marker renames.
    */
  def streamDedupInto(
      source: DataFrame, // schema: id LONG (or string), text STRING
      stateDir: String,
      checkpoint: String,
      idCol: String = "id",
      textCol: String = "text",
      threshold: Double = 0.8,
      compactEvery: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val bandsDir = s"$stateDir/bands"
        val textsDir = s"$stateDir/texts"
        // state control IO goes through the Hadoop FS of `stateDir` — the
        // state lives WITH the data (hdfs://, s3a://, or local); java.io
        // listings would silently return empty on any non-local FS, so every
        // batch would dedup only against itself and cross-batch pairs would
        // be dropped with no error
        val hconf = spark.sessionState.newHadoopConf()
        val marker = new org.apache.hadoop.fs.Path(s"$stateDir/compacted_through")
        val fs = new org.apache.hadoop.fs.Path(stateDir).getFileSystem(hconf)
        // compacted-through as of THIS batch's read view (never this batch)
        val t0 = graft.core.AtomicFiles.readLongSafeHadoop(hconf, marker)
          .filter(_ < batchId)
        def batchDirs(dir: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
          val d = new org.apache.hadoop.fs.Path(dir)
          if (!fs.exists(d)) Seq.empty
          else fs.listStatus(d).toSeq.map(_.getPath)
            .filter(_.getName.startsWith("batch="))
            .map(p => p.getName.stripPrefix("batch=").toLong -> p)
        }
        def livePartitions(dir: String): Seq[Long] =
          batchDirs(dir).map(_._1).filter(b => b < batchId && t0.forall(b >= _))
        def priorState(dir: String): Option[DataFrame] =
          if (livePartitions(dir).isEmpty) None
          else Some(spark.read.parquet(dir)
            .filter(col("batch") < batchId &&
              t0.map(col("batch") >= _).getOrElse(lit(true))))
        // delete partitions superseded by an EARLIER batch's compaction —
        // safe: any replayable batch reads only partitions >= t0
        t0.foreach { t =>
          for (dir <- Seq(bandsDir, textsDir);
               (b, p) <- batchDirs(dir) if b < t) fs.delete(p, true)
        }
        // batch may be empty on some triggers — nothing to dedup or record
        if (!batch.isEmpty) {
          val b = batch.persist()
          val bands0 = priorState(bandsDir)
            .map(_.select(col("__did"), col("band"), col("bh")))
          val texts0 = priorState(textsDir).map(_.select(col(idCol), col(textCol)))
          val (pairs, newBands, release) = graft.operators.Dedup.incrementalNearDup(
            b, idCol, textCol, bands0, texts0, threshold = threshold)
          // release in finally: a failed state write retries the whole batch
          // (at-least-once), and each attempt persists a fresh shingle cache
          // — skipping release on failure would leak one corpus-scale cache
          // per retry into the session CacheManager
          try {
            pairs.write.mode("overwrite").parquet(s"$stateDir/pairs/batch=$batchId")
            // incremental duplicate-CLUSTER labels: components of (prior
            // labels replayed as star edges ∪ this batch's pairs) — the
            // standard incremental-CC construction. Cost per batch is
            // linear in the ACCUMULATED DUP GRAPH (≪ corpus; no
            // re-shingling, no full recluster), and a batch that bridges
            // two old clusters merges them through their label edges.
            // Replay-safe like everything here: the read view is the
            // newest partition STRICTLY BEFORE this batch, the write is a
            // per-batch overwrite, and only partitions older than that
            // read view are deleted — a replay of THIS batch still finds
            // its input.
            val labelsDir = s"$stateDir/labels"
            val priorLabelParts = batchDirs(labelsDir).map(_._1).filter(_ < batchId)
            // a pair-free batch changes NO labels — skip the CC entirely
            // (the prior partition stays the newest read view; at scale
            // most batches are pair-free and would otherwise pay a full
            // label-graph CC + rewrite each). The emptiness probe reads
            // the just-written parquet footers, not the pair plan again.
            val hasNewPairs = spark.read
              .parquet(s"$stateDir/pairs/batch=$batchId").limit(1).count() > 0
            if (hasNewPairs) {
              val labelEdges =
                if (priorLabelParts.isEmpty) None
                else Some(spark.read.parquet(s"$labelsDir/batch=${priorLabelParts.max}")
                  .select(col("node").as("ia"), col("component").as("ib")))
              val newPairEdges = pairs.select(col("ia"), col("ib"))
              val labels = graft.operators.Dedup.connectedComponents(
                labelEdges.fold(newPairEdges)(_.union(newPairEdges)))
              labels.write.mode("overwrite").parquet(s"$labelsDir/batch=$batchId")
              priorLabelParts.sorted.lastOption.foreach { keep =>
                for ((bb, p) <- batchDirs(labelsDir) if bb < keep) fs.delete(p, true)
              }
            }
            // deterministic compaction decision: fold prior state into this
            // batch's partition once the live span reaches compactEvery
            val compact = compactEvery > 0 &&
              livePartitions(bandsDir).size + 1 >= compactEvery
            val bandsOut = if (compact) bands0.fold(newBands)(newBands.union) else newBands
            val textsOut0 = b.select(col(idCol), col(textCol))
            val textsOut = if (compact) texts0.fold(textsOut0)(textsOut0.union) else textsOut0
            bandsOut.write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")
            textsOut.write.mode("overwrite").parquet(s"$textsDir/batch=$batchId")
            // marker semantics survive non-atomic renames (object stores do
            // copy+delete — see AtomicFiles.atomicWriteHadoop's contract):
            // it is MONOTONE (only ever advances), readers treat corrupt or
            // absent as "no compaction yet" (readLongSafeHadoop), and a
            // stale value only widens the read span — correctness never
            // depends on the rename being transactional, only liveness of
            // eventual compaction, which the next compact batch restores
            if (compact)
              graft.core.AtomicFiles.atomicWriteHadoop(hconf, marker, batchId.toString)
          } finally {
            release()
            b.unpersist()
          }
          ()
        }
      }
      .start()

  /** Streaming decontamination at the ingest edge: every micro-batch is
    * scanned against a FIXED eval/reference corpus (`crossCorpusNearDup` —
    * bucketed A×B band join, exact Jaccard verify) and the contaminated
    * pairs append to `outDir/pairs`. Stateless across batches by
    * construction — contamination is a property of (doc, eval set), not of
    * the stream prefix — so the union of per-batch pair sets IS the batch
    * twin's answer; replays overwrite their own partition. The eval side's
    * banded signatures are recomputed per batch: bounded (eval sets are
    * small) and cheap next to the batch scan; a long-lived deployment
    * would snapshot them once via `signatureBands`.
    */
  def streamDecontamInto(
      source: DataFrame, // schema: id, text
      ref: DataFrame, // static eval/reference corpus: id, text
      outDir: String,
      checkpoint: String,
      idCol: String = "id",
      textCol: String = "text",
      threshold: Double = 0.8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Dedup.crossCorpusNearDup(
              batch, idCol, textCol, ref, idCol, textCol, threshold = threshold)
            .write.mode("overwrite").parquet(s"$outDir/pairs/batch=$batchId")
          ()
        }
      }
      .start()

  /** Streaming DSIR scoring — the firehose deployment of `dsir_select`'s
    * selection step: the model is trained ONCE on a reference snapshot
    * (curated-vs-raw, `Selection.dsirTrain`) and arriving micro-batches
    * score STATELESSLY against the broadcast weight table
    * (`Selection.dsirScore` — the exact batch plan per micro-batch, so the
    * streamed scores are bit-identical to a batch pass over the same rows).
    * Scores land per batch under `outDir/scores/batch=N`; the keep-cut is a
    * periodic batch top-K over the accumulated scores (selection needs the
    * global ordering, which no single micro-batch can decide).
    */
  def streamDsirScoreInto(
      source: DataFrame, // schema: id, text
      model: graft.operators.Selection.DsirModel,
      outDir: String,
      checkpoint: String,
      idCol: String = "id",
      textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Selection.dsirScore(batch, idCol, textCol, model)
            .write.mode("overwrite").parquet(s"$outDir/scores/batch=$batchId")
          ()
        }
      }
      .start()

  /** Streaming tumbling-window aggregation with a watermark (the canonical
    * events_hourly shape as a live query; late rows beyond the watermark are
    * dropped deterministically).
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))
}
