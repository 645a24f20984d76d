package graft.core

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.io.api.Binary

/** Driver-local LWW point lookups over a DocStore data directory — NO Spark
  * job. The serving-path complement to `DocStore.get`: a REST
  * `documents/search` or `GET .../documents/{id}` request should cost
  * row-group-pruned local parquet reads (µs–ms), not a Spark scan job
  * (~100–300 ms of scheduling floor even on a warm local[32]).
  *
  * Reads go through parquet-mr's filter2 machinery with an `in(id, …)`
  * predicate, so row groups are pruned by footer min/max stats (and
  * dictionary pages) before any record materializes — on a store compacted
  * with `clusterById = true` (disjoint per-file id ranges, the sorted-SSTable
  * shape) a point read touches exactly one file's one row group. This is the
  * reference's skiplist point-Get re-expressed against immutable columnar
  * runs (`internal/storage/tree/tree.go` Get; SURVEY §2.1 S3).
  *
  * LWW semantics are IDENTICAL to `DocStore.latestWins`: max (version, seq)
  * row per id wins, tombstone winners read as absent. (version, seq) pairs
  * are unique per row by construction — version is the per-batch counter,
  * seq the in-batch order — so the max is well-defined and both paths agree
  * on every interleaving.
  *
  * Concurrency: batch files are immutable once committed, so a read races
  * only `compact()`'s directory swap. Any IO failure (file deleted under us)
  * propagates — callers (`DocStore.getMany`) fall back to the always-correct
  * Spark path. At real cluster scale the same reads run against the object
  * store through a manifest; the footer-stat pruning story is unchanged.
  */
object LocalPointReader {

  // resolved from the active session so spark.hadoop.* settings
  // (object-store credentials/endpoints) reach the driver-direct reads;
  // memoized only once a SESSION is present — newHadoopConf() copies the
  // whole conf (too hot for the point path), but a plain lazy val would
  // freeze a session-less bare Configuration forever if the first read
  // raced session startup, splitting control reads from the data plane
  // (ADVICE r11)
  @volatile private var cachedConf: Configuration = null
  private def conf: Configuration = {
    val c = cachedConf
    if (c != null) c
    else {
      val fresh = ControlFs.hadoopConf()
      if (org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).isDefined)
        cachedConf = fresh
      fresh
    }
  }

  // java.nio parquet reads for plain local runs — the read-side twin of
  // LocalRunWriter's LocalOutputFile: opening a run through the Hadoop
  // LocalFileSystem stack (FS resolution + ChecksumFileSystem stream +
  // crc verification) costs 10-45 ms of fixed setup per reader, which IS
  // the probe cost on a maintained update (the existing id's bloom hits,
  // so the big run must actually be opened). Scheme'd paths keep the
  // Hadoop reader — that stack IS the remote store.
  private class GroupReaderBuilder(in: org.apache.parquet.io.InputFile)
      extends ParquetReader.Builder[Group](in) {
    override protected def getReadSupport()
        : org.apache.parquet.hadoop.api.ReadSupport[Group] =
      new GroupReadSupport()
  }

  private def readerBuilder(f: String): ParquetReader.Builder[Group] =
    if (ControlFs.isLocalRoot(f))
      new GroupReaderBuilder(
        new org.apache.parquet.io.LocalInputFile(Paths.get(f)))
    else ParquetReader.builder(new GroupReadSupport(), new Path(f))

  /** LWW winners for `ids` (absent / tombstoned ids omitted). Runs are
    * bloom-pruned (see below): only files that might contain one of `ids`
    * are opened — a point GET on a many-run store opens 1-2 files, not
    * all of them.
    */
  def readDocs(dataDir: String, ids: Set[String],
      maxVersion: Long = Long.MaxValue): Map[String, Document] = {
    if (ids.isEmpty) return Map.empty
    val files = listRuns(dataDir, maxVersion)
    if (files.isEmpty) return Map.empty
    val pred = FilterApi.in(
      FilterApi.binaryColumn("id"),
      ids.map(Binary.fromString).asJava.asInstanceOf[java.util.Set[Binary]])
    // (version, seq) max per id across every run — the LWW resolution
    val best = scala.collection.mutable.HashMap
      .empty[String, (Long, Long, Document, Boolean)]
    val hashes = idHashes(ids)
    files.withFilter(f => mightContainAny(f, hashes)).foreach { f =>
      val reader: ParquetReader[Group] = readerBuilder(f)
        .withConf(conf)
        .withFilter(FilterCompat.get(pred))
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          val id = g.getString("id", 0)
          val version = g.getLong("version", 0)
          val seq = g.getLong("seq", 0)
          val better = best.get(id).forall { case (v, s, _, _) =>
            version > v || (version == v && seq > s)
          }
          if (better) {
            val deleted = g.getBoolean("is_deleted", 0)
            val doc =
              if (deleted) Document(id, null)
              else Document(id, readVector(g), readParams(g))
            best(id) = (version, seq, doc, deleted)
          }
          g = reader.read()
        }
      } finally reader.close()
    }
    best.collect { case (id, (_, _, doc, deleted)) if !deleted => id -> doc }.toMap
  }

  /** Which of `ids` are LIVE (LWW winner is not a tombstone) — the
    * existence probe behind the maintained write path. Same LWW
    * resolution as `readDocs`, but the scan is bloom-pruned (below) and
    * the read schema is PROJECTED to (id, version, seq, is_deleted) —
    * the vector/params pages, the overwhelming majority of the bytes,
    * are never decoded.
    */
  def liveIds(dataDir: String, ids: Set[String],
      maxVersion: Long = Long.MaxValue): Set[String] = {
    if (ids.isEmpty) return Set.empty
    val files = listRuns(dataDir, maxVersion)
    if (files.isEmpty) return Set.empty
    val pred = FilterApi.in(
      FilterApi.binaryColumn("id"),
      ids.map(Binary.fromString).asJava.asInstanceOf[java.util.Set[Binary]])
    val best = scala.collection.mutable.HashMap.empty[String, (Long, Long, Boolean)]
    val hashes = idHashes(ids)
    files.withFilter(f => mightContainAny(f, hashes)).foreach { f =>
      scanProjected(f, pred) { g =>
        val id = g.getString("id", 0)
        val version = g.getLong("version", 0)
        val seq = g.getLong("seq", 0)
        val better = best.get(id).forall { case (v, s, _) =>
          version > v || (version == v && seq > s)
        }
        if (better) best(id) = (version, seq, g.getBoolean("is_deleted", 0))
      }
    }
    best.collect { case (id, (_, _, deleted)) if !deleted => id }.toSet
  }

  /** Data files of a run directory (Spark's listing convention) — THE
    * definition of "which files count as data", shared with the engine's
    * delta-dir probes so the two can never drift. Scheme-aware: plain
    * local dirs list via java.nio (the serving-latency path); scheme'd
    * dirs (hdfs://, s3a://, test schemes) list through their Hadoop FS —
    * parquet-mr reads the files through the same FS, so the whole
    * driver-direct point path works against a remote store unchanged.
    * An absent dir reads as "no runs".
    */
  private[graft] def listRuns(dirStr: String,
      maxVersion: Long = Long.MaxValue): Vector[String] = {
    // visibility: a name-versioned run ABOVE the committed counter is an
    // uncommitted in-flight/crashed batch — never readable (RunNames)
    def isRun(n: String) = RunNames.isRun(n) &&
      RunNames.version(n).forall(_ <= maxVersion)
    if (ControlFs.isLocalRoot(dirStr)) {
      val dir = Paths.get(dirStr)
      if (!Files.exists(dir)) return Vector.empty
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.toString)
        .filter(p => isRun(p.substring(p.lastIndexOf('/') + 1))).toVector
      finally s.close()
    } else {
      val p = new Path(dirStr)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return Vector.empty
      fs.listStatus(p).iterator
        .filter(s => s.isFile && isRun(s.getPath.getName))
        .map(_.getPath.toString).toVector
    }
  }

  // ---- per-run id blooms (the SSTable bloom, driver-side) ---------------
  //
  // The dominant point-read cost is OPENING each run (footer parse +
  // reader setup, ~10 ms/file) — random ids defeat min/max row-group
  // pruning, so every run is opened even though at most a couple contain
  // the probed ids. Classic LSM answer: a bloom per immutable run, built
  // once from a projected id-column pass and memoized forever (runs never
  // change; deleted runs simply stop being listed). No false negatives ⇒
  // skipping a bloom-negative run can never change the LWW outcome. A
  // fresh-id existence probe (the common maintained-insert case) then
  // opens ZERO files. Runs beyond `BloomMaxRows` don't get a bloom (an
  // unbounded driver-side build; such runs come from compaction, where
  // clusterById gives them disjoint id ranges the min/max stats prune
  // instead) — at object-store scale the same bits live in a manifest.

  private val BloomMaxRows = 4L * 1024 * 1024
  private val BloomBitsPerId = 10
  // residency bound is BYTES, not entries — one 4M-row bloom is ~5 MB, so
  // an entry cap alone could still hold tens of GB of bitsets
  private val BloomMaxBytes = 256L * 1024 * 1024
  private val bloomBytes = new java.util.concurrent.atomic.AtomicLong(0L)
  private val blooms = scala.collection.concurrent.TrieMap.empty[String, IdBloom]

  // serving observability: run opens vs bloom-pruned skips — the counter
  // pair that tells an operator the per-run blooms are actually pruning
  // (opens ≈ runs-touched would mean the blooms never fire). Exposed with
  // the bloom residency/budget gauges over GET /v1/metrics.
  private val runOpens = new java.util.concurrent.atomic.AtomicLong(0L)
  private val runsBloomPruned = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Point-serve reader gauges/counters (process-lifetime). */
  def metrics: Map[String, Long] = Map(
    "point_run_opens" -> runOpens.get(),
    "point_runs_bloom_pruned" -> runsBloomPruned.get(),
    "point_blooms" -> blooms.size.toLong,
    "point_bloom_bytes" -> bloomBytes.get(),
    "point_bloom_max_bytes" -> BloomMaxBytes)

  private class IdBloom(nBits: Int) {
    val words = new Array[Long]((nBits + 63) / 64)
    private val mask = nBits - 1 // nBits is a power of two
    def add(id: String): Unit = {
      val h1 = hash1(id); val h2 = hash2(id)
      var i = 0
      while (i < 4) {
        val bit = (h1 + i * h2) & mask
        words(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    // hash-pair probe: the (h1, h2) pair depends only on the id, so a
    // multi-file probe hashes each id ONCE, not once per candidate run
    def mightContainHashed(h1: Int, h2: Int): Boolean = {
      var i = 0
      while (i < 4) {
        val bit = (h1 + i * h2) & mask
        if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }
  private def hash1(id: String): Int =
    scala.util.hashing.MurmurHash3.stringHash(id, 0x9747b28c)
  private def hash2(id: String): Int =
    scala.util.hashing.MurmurHash3.stringHash(id, 0x85ebca6b) | 1
  private val AlwaysMight = new IdBloom(64) { // oversized runs: never prune
    override def mightContainHashed(h1: Int, h2: Int): Boolean = true
  }

  private def idHashes(ids: Set[String]): Array[Long] =
    ids.iterator.map(id =>
      (hash1(id).toLong << 32) | (hash2(id) & 0xffffffffL)).toArray

  private def mightContainAny(f: String, hashes: Array[Long]): Boolean = {
    val b = bloomFor(f)
    var i = 0
    while (i < hashes.length) {
      if (b.mightContainHashed((hashes(i) >>> 32).toInt, hashes(i).toInt)) {
        runOpens.incrementAndGet()
        return true
      }
      i += 1
    }
    runsBloomPruned.incrementAndGet()
    false
  }

  /** Footer-derived per-run metadata, read once per immutable run: row
    * count, the id-only bloom-build projection, and (when the run has the
    * store probe columns) the (id, version, seq, is_deleted) projection
    * used by `liveIds` — so neither the bloom decision nor the projected
    * probe re-opens a footer it has already seen.
    */
  private val runMeta = scala.collection.concurrent.TrieMap
    .empty[String, (Long, org.apache.parquet.schema.MessageType)]
  private val projSchemas = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.parquet.schema.MessageType]
  private val ProbeCols = Array("id", "version", "seq", "is_deleted")

  private def metaFor(f: String): (Long, org.apache.parquet.schema.MessageType) =
    runMeta.get(f).getOrElse {
      val (rows, fileSchema) = {
        val in: org.apache.parquet.io.InputFile =
          if (ControlFs.isLocalRoot(f))
            new org.apache.parquet.io.LocalInputFile(Paths.get(f))
          else org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try (r.getRecordCount, r.getFileMetaData.getSchema) finally r.close()
      }
      if (ProbeCols.forall(fileSchema.containsField))
        projSchemas.putIfAbsent(f, new org.apache.parquet.schema.MessageType(
          fileSchema.getName,
          ProbeCols.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*))
      val meta = (rows, new org.apache.parquet.schema.MessageType(
        fileSchema.getName, fileSchema.getType(fileSchema.getFieldIndex("id"))))
      runMeta.putIfAbsent(f, meta)
      meta
    }

  /** Pre-populate the bloom for a JUST-WRITTEN run from the ids the writer
    * already holds — the write path's half of the bloom discipline: without
    * this, the NEXT point probe pays a projected id-column scan to build
    * the new run's bloom (~10-20 ms of parquet reader setup), i.e. every
    * maintained point write taxes its successor. Sizing/accounting
    * identical to `bloomFor`; runs are immutable so the two can never
    * disagree on content.
    */
  private[core] def registerBloom(f: String, ids: Iterable[String]): Unit = {
    if (blooms.contains(f)) return
    if (bloomBytes.get() > BloomMaxBytes) sweepDeadBlooms()
    if (bloomBytes.get() > BloomMaxBytes) return // admission-denied: bloomFor retries later
    val n = ids.size
    if (n > BloomMaxRows) { blooms.putIfAbsent(f, AlwaysMight); return }
    val nBits = math.max(1024, Integer.highestOneBit(n * BloomBitsPerId) * 2)
    val b = new IdBloom(nBits)
    ids.foreach(b.add)
    if (blooms.putIfAbsent(f, b).isEmpty)
      bloomBytes.addAndGet(8L * b.words.length)
  }

  private def bloomFor(f: String): IdBloom = blooms.get(f).getOrElse {
    val (rows, idOnly) = metaFor(f)
    // ADMISSION bound, never a wholesale clear: a clear would make a
    // store whose total bloom footprint exceeds the budget rebuild
    // hundreds of MB of bitsets on every probe (worse than no blooms at
    // all). Over budget: first sweep entries whose runs no longer exist
    // (compaction replaces run sets, and dead files' bytes must not pin
    // the budget forever).
    if (bloomBytes.get() > BloomMaxBytes) sweepDeadBlooms()
    if (rows > BloomMaxRows) {
      // permanently oversized: an unbounded driver-side build — memoize
      // the never-prune answer (such runs come from compaction, where
      // clusterById's disjoint id ranges prune via min/max instead)
      blooms.putIfAbsent(f, AlwaysMight)
      AlwaysMight
    } else if (bloomBytes.get() > BloomMaxBytes) {
      // budget-denied, NOT memoized: a transient over-budget moment (e.g.
      // just before compaction's sweep reclaims replaced runs) must not
      // pin this run bloom-less forever — the next probe retries, and the
      // row count is already memoized so the retry costs no footer open
      AlwaysMight
    } else {
      val nBits = math.max(1024,
        Integer.highestOneBit(rows.toInt * BloomBitsPerId) * 2)
      val b = new IdBloom(nBits)
      scanWith(f, null, idOnly)(g => b.add(g.getString("id", 0)))
      blooms.putIfAbsent(f, b) match {
        case Some(winner) => winner // a racing builder landed first
        case None => bloomBytes.addAndGet(8L * b.words.length); b
      }
    }
  }

  private def sweepDeadBlooms(): Unit = blooms.synchronized {
    def stillExists(k: String): Boolean =
      if (ControlFs.isLocalRoot(k)) Files.exists(Paths.get(k))
      else {
        val p = new Path(k)
        scala.util.Try(p.getFileSystem(conf).exists(p)).getOrElse(false)
      }
    blooms.keys.foreach { k =>
      if (!stillExists(k)) {
        blooms.remove(k).foreach { b =>
          if (b ne AlwaysMight) bloomBytes.addAndGet(-8L * b.words.length)
        }
        runMeta.remove(k); projSchemas.remove(k)
      }
    }
  }

  /** Drop every memoized per-run structure under a path prefix — called on
    * collection drop: the version counter resets there, and a recreated
    * collection may reuse run paths, so bitsets and schemas keyed on the
    * old incarnation must not survive (nor pin the byte budget).
    */
  // test hook: resident bloom count under a prefix + the bytes they pin in
  // the global budget ledger (prefix-scoped so concurrent suites' entries
  // don't race the assertion)
  private[graft] def bloomStats(prefix: String): (Int, Long) = {
    val mine = blooms.filter(_._1.startsWith(prefix))
    (mine.size, mine.valuesIterator
      .map(b => if (b eq AlwaysMight) 0L else 8L * b.words.length).sum)
  }

  private[graft] def invalidateUnder(prefix: String): Unit = {
    blooms.keys.filter(_.startsWith(prefix)).foreach { k =>
      blooms.remove(k).foreach { b =>
        if (b ne AlwaysMight) bloomBytes.addAndGet(-8L * b.words.length)
      }
    }
    runMeta.keys.filter(_.startsWith(prefix)).foreach(runMeta.remove)
    projSchemas.keys.filter(_.startsWith(prefix)).foreach(projSchemas.remove)
  }

  /** Filtered scan of one run projected to (id, version, seq, is_deleted)
    * — no vector/params page decode. The projection is clipped from the
    * file's own footer schema so repetition/type always match its writer.
    */
  private def scanProjected(f: String,
      pred: org.apache.parquet.filter2.predicate.FilterPredicate)(
      each: Group => Unit): Unit = {
    // the projection is memoized per immutable run (populated by the bloom
    // path's footer read, or here on first touch) — the hot maintained-
    // write probe must not pay a second footer open per file
    val projected = projSchemas.get(f).orElse { metaFor(f); projSchemas.get(f) }
      .getOrElse(throw new IllegalStateException(
        s"run $f lacks the store probe columns (id/version/seq/is_deleted)"))
    scanWith(f, pred, projected)(each)
  }

  /** Filtered scan of one run under an explicit projected schema (clipped
    * from the file's own footer by the caller).
    */
  private def scanWith(f: String,
      pred: org.apache.parquet.filter2.predicate.FilterPredicate,
      projected: org.apache.parquet.schema.MessageType)(
      each: Group => Unit): Unit = {
    val fconf = new Configuration(conf)
    fconf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projected.toString)
    var builder = readerBuilder(f).withConf(fconf)
    if (pred != null) builder = builder.withFilter(FilterCompat.get(pred))
    val reader = builder.build()
    try {
      var g = reader.read()
      while (g != null) { each(g); g = reader.read() }
    } finally reader.close()
  }

  /** `ARRAY<FLOAT>` from the parquet list encoding (3-level standard shape
    * `vector.list.element`; tolerate a 2-level repeated-primitive writer).
    */
  private def readVector(g: Group): Array[Float] = {
    if (g.getFieldRepetitionCount("vector") == 0) return null
    val vg = g.getGroup("vector", 0)
    val n = vg.getFieldRepetitionCount(0)
    val out = new Array[Float](n)
    val threeLevel = !vg.getType.getType(0).isPrimitive
    var i = 0
    while (i < n) {
      out(i) = if (threeLevel) vg.getGroup(0, i).getFloat(0, 0) else vg.getFloat(0, i)
      i += 1
    }
    out
  }

  /** `MAP<STRING,STRING>` from the parquet key_value encoding. */
  private def readParams(g: Group): Map[String, String] = {
    if (g.getFieldRepetitionCount("params") == 0) return Map.empty
    val pg = g.getGroup("params", 0)
    val n = pg.getFieldRepetitionCount(0)
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < n) {
      val kv = pg.getGroup(0, i)
      val key = kv.getString("key", 0)
      val value = if (kv.getFieldRepetitionCount("value") == 0) null
        else kv.getString("value", 0)
      out += key -> value
      i += 1
    }
    out.result()
  }
}
