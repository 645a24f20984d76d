package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.SpaceType
import graft.kernels.VecKernels

/** ZERO-SPARK-JOB point serving over the IVF inverted-list layout — the
  * `GraphAnn.searchPointLocal` architecture applied to the ivf_flat tier
  * (reference `internal/index/ivf.go` Search semantics, served like the
  * driver-local tiers): probe lists come from the driver-resident coarse
  * centroids, probed CELLS are collected once per (layout, stamp) into a
  * budget-bounded driver cache, and warm single/few-query requests rank
  * entirely in-JVM — the ~100–300 ms per-request Spark stage-scheduling
  * floor the latency harness measures on the distributed pruned path
  * disappears.
  *
  * Results are IDENTICAL to `IvfIndex.search`/`searchDistributed` at equal
  * knobs, by construction: the same `Model.probe` (same coarse metric and
  * (distance, index) centroid tie-break), distances through the SAME
  * `VecKernels` arithmetic the codegen expressions inline, ranking by
  * (distance asc, id asc) with the UTF-8-byte id order the distributed
  * ties use (`GraphAnn.idLt`), and cells loaded from the SAME
  * tombstone-applied layout frame the distributed plan scans — so
  * tombstone/version shadowing semantics are literally the one Catalyst
  * plan, not a re-implementation (`LocalIvfParitySpec` gates equality,
  * including ties, deletes, and filtered serving).
  *
  * Scale: the cache holds probed cells only, bounded by resident BYTES
  * (dim-aware) and entry count with insertion-order eviction; a cell whose
  * parquet footprint says it cannot fit the whole budget is never
  * collected — the request declines (returns None) and the caller serves
  * it through the distributed partition-pruned plan instead. In-flight
  * requests hold direct references, so concurrent eviction is a reload
  * cost, never a correctness event.
  */
object LocalIvfServe {

  /** One cached cell: the cell's rows as parallel driver arrays. */
  private final case class Cell(ids: Array[Any], vecs: Array[Array[Float]]) {
    def residentBytes: Long = {
      val dim = if (vecs.nonEmpty && vecs(0) != null) vecs(0).length else 0
      // float payload + array/object headers + boxed id estimate per row
      ids.length.toLong * (dim.toLong * 4L + 96L)
    }
  }

  private val cells = scala.collection.concurrent.TrieMap
    .empty[(String, Long, Int), (Option[Cell], Long)] // (rows-or-empty, bytes)
  private val cellOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]
  private val cellBytes = new java.util.concurrent.atomic.AtomicLong(0)
  private val idTypes = scala.collection.concurrent.TrieMap
    .empty[(String, Long), DataType]
  private val MaxCells = 256
  /** Driver-heap bound in resident BYTES (the same reasoning as
    * `GraphAnn.maxLocalServeBytes`); operable knob, default 1 GiB.
    */
  @volatile var maxLocalIvfBytes: Long = 1L << 30

  // serving-cache metrics (GET /v1/metrics companion to the graph tier's)
  val cellLoads = new java.util.concurrent.atomic.AtomicInteger(0)
  val cellHits = new java.util.concurrent.atomic.AtomicLong(0)
  val cellMisses = new java.util.concurrent.atomic.AtomicLong(0)
  val cellEvictions = new java.util.concurrent.atomic.AtomicLong(0)
  val oversizedDeclines = new java.util.concurrent.atomic.AtomicLong(0)

  def metrics: Map[String, Long] = Map(
    "ivf_local_cells" -> cells.size.toLong,
    "ivf_local_bytes" -> cellBytes.get(),
    "ivf_local_max_bytes" -> maxLocalIvfBytes,
    "ivf_local_loads" -> cellLoads.get().toLong,
    "ivf_local_hits" -> cellHits.get(),
    "ivf_local_misses" -> cellMisses.get(),
    "ivf_local_evictions" -> cellEvictions.get(),
    "ivf_local_oversized_declines" -> oversizedDeclines.get())

  private def removeCell(key: (String, Long, Int)): Unit = {
    cells.remove(key).foreach { case (_, b) => cellBytes.addAndGet(-b) }
    cellOrder.remove(key)
  }

  private def insertCell(key: (String, Long, Int), cell: Option[Cell]): Unit = {
    // empty cells cache as tombstones (probing one must not re-collect)
    val bytes = cell.map(_.residentBytes).getOrElse(64L)
    if (cells.putIfAbsent(key, (cell, bytes)).isEmpty) {
      cellOrder.add(key)
      cellBytes.addAndGet(bytes)
      // superseded stamps of this layout die on insert
      cells.keys.filter(kk => kk._1 == key._1 && kk._2 != key._2)
        .foreach { kk => removeCell(kk); cellEvictions.incrementAndGet() }
      var evicting = cells.size > MaxCells || cellBytes.get() > maxLocalIvfBytes
      while (evicting) {
        val oldest = cellOrder.poll()
        if (oldest == null) evicting = false
        else {
          cells.remove(oldest).foreach { case (_, b) =>
            cellBytes.addAndGet(-b); cellEvictions.incrementAndGet()
          }
          evicting = cells.size > MaxCells || cellBytes.get() > maxLocalIvfBytes
        }
      }
    }
  }

  private[graft] def dropCells(layoutIdPrefix: String): Unit = {
    cells.keys.filter(_._1.startsWith(layoutIdPrefix)).foreach(removeCell)
    idTypes.keys.filter(_._1.startsWith(layoutIdPrefix)).foreach(idTypes.remove)
  }

  private[graft] def clearCells(): Unit = {
    cells.clear(); cellOrder.clear(); idTypes.clear(); cellBytes.set(0)
  }

  private def dist(q: Array[Float], v: Array[Float], space: SpaceType): Double =
    space match {
      case SpaceType.Ip => VecKernels.negDot(q, v)
      case SpaceType.Cos => VecKernels.cosDist(q, v)
      case SpaceType.Hamming => VecKernels.hammingNe(q, v).toDouble
      case _ => VecKernels.l2sq(q, v)
    }

  /** Serve `queries` (driver pairs of (qid, vector)) from driver-cached
    * cells of the layout at `path`/`stamp`. `layoutFrame` is the
    * TOMBSTONE-APPLIED layout frame the distributed plan would scan (the
    * caller's stamp-keyed handle) — cold cells load from it with ONE
    * partition-pruned collect; warm requests launch no job. `eligible`
    * mirrors the distributed semi-join restriction (probe lists stay
    * geometry-pruned, rows filter by id — the ivf tier's filtered
    * semantics, unlike the graph tier's full fan-out). Returns None —
    * caller falls back to the distributed plan — when a probed cell's disk
    * footprint says it cannot fit the byte budget.
    */
  def searchPointLocal(
      spark: SparkSession,
      path: String,
      stamp: Long,
      layoutFrame: => DataFrame,
      model: IvfIndex.Model,
      queries: Seq[(Any, Array[Float])],
      k: Int,
      nprobe: Int,
      qidType: DataType,
      eligible: Option[Set[Any]] = None,
      maxQueries: Int = 64): Option[DataFrame] =
    searchPointLocalRows(spark, path, stamp, layoutFrame, model, queries, k,
      nprobe, eligible, maxQueries).map { rows =>
      val idType = idTypes.getOrElseUpdate((path, stamp), {
        idTypes.keys.filter(kk => kk._1 == path && kk._2 != stamp)
          .foreach(idTypes.remove)
        layoutFrame.schema("id").dataType
      })
      val schema = StructType(Seq(
        StructField("query_id", qidType),
        StructField("id", idType),
        StructField("distance", DoubleType),
        StructField("rnk", LongType)))
      spark.createDataFrame(java.util.Arrays.asList(
        rows.map(r => Row(r._1, r._2, r._3, r._4)): _*), schema)
    }

  /** Driver-rows twin of `searchPointLocal` — (qid, id, distance, rnk)
    * tuples with no DataFrame wrapper, for driver-side consumers (the local
    * MaxSim serve composes per-token shortlists from it without ever
    * constructing a plan).
    */
  def searchPointLocalRows(
      spark: SparkSession,
      path: String,
      stamp: Long,
      layoutFrame: => DataFrame,
      model: IvfIndex.Model,
      queries: Seq[(Any, Array[Float])],
      k: Int,
      nprobe: Int,
      eligible: Option[Set[Any]] = None,
      maxQueries: Int = 64): Option[Seq[(Any, Any, Double, Long)]] = {
    require(k > 0, s"k must be positive, got $k")
    require(queries.length <= maxQueries,
      s"searchPointLocal is the driver-serve path (${queries.length} queries > " +
        s"$maxQueries); use IvfIndex.search/searchDistributed for batches")
    // validation lives in Model.probe (same require as every distributed
    // path — the two must reject identical inputs identically)
    val probed: Array[Seq[Int]] =
      queries.toArray.map(q => model.probe(q._2, nprobe))
    val needed = probed.flatten.distinct.sorted
    // per-request direct references (eviction = reload cost, never
    // correctness — same discipline as the graph cell cache)
    val held = scala.collection.mutable.Map.empty[Int, Option[Cell]]
    needed.foreach { c =>
      cells.get((path, stamp, c)).foreach(v => held(c) = v._1)
    }
    val missing = needed.filterNot(held.contains)
    cellHits.addAndGet(held.size.toLong)
    cellMisses.addAndGet(missing.length.toLong)
    if (missing.nonEmpty) {
      // transient-bound pre-check from the parquet listing (driver-side, no
      // job): a cell whose estimated resident bytes exceed the WHOLE budget
      // is never collected — decline, the distributed plan serves this one
      val fsBase = new org.apache.hadoop.fs.Path(path)
      val fsys = fsBase.getFileSystem(spark.sessionState.newHadoopConf())
      val oversized = missing.exists { c =>
        val dir = new org.apache.hadoop.fs.Path(fsBase, s"cluster_id=$c")
        val disk = if (fsys.exists(dir)) fsys.getContentSummary(dir).getLength else 0L
        disk * GraphAnn.LocalServeDiskExpansion > maxLocalIvfBytes
      }
      if (oversized) { oversizedDeclines.incrementAndGet(); return None }
      // one partition-pruned collect loads every missing probed cell;
      // rows come from the SAME tombstone-applied plan the distributed
      // search scans, so shadowing semantics are shared, not re-derived
      val byCell = layoutFrame
        .filter(col("cluster_id").isin(missing.map(Int.box): _*))
        .select(col("cluster_id").cast("int"), col("id"),
          col("vector").cast("array<float>"))
        .collect().groupBy(_.getInt(0))
      cellLoads.incrementAndGet()
      missing.foreach { c =>
        val cell = byCell.get(c).map { rs =>
          Cell(rs.map(_.get(1): Any),
            rs.map(r => r.getAs[scala.collection.Seq[Float]](2).toArray))
        }
        held(c) = cell
        insertCell((path, stamp, c), cell)
      }
    }
    val out = Seq.newBuilder[(Any, Any, Double, Long)]
    var qi = 0
    while (qi < queries.length) {
      val (qid, qv) = queries(qi)
      val hits = scala.collection.mutable.ArrayBuffer.empty[(Any, Double)]
      probed(qi).foreach { c =>
        held.getOrElse(c, None).foreach { cell =>
          var i = 0
          while (i < cell.ids.length) {
            val id = cell.ids(i)
            if (eligible.forall(_.contains(id)))
              hits += ((id, dist(qv, cell.vecs(i), model.space)))
            i += 1
          }
        }
      }
      // the distributed paths rank via (distance asc, id asc) with UTF-8
      // byte order on string ids — GraphAnn.idLt IS that order
      val ranked = hits.toArray
        .sortWith((a, b) => a._2 < b._2 || (a._2 == b._2 && GraphAnn.idLt(a._1, b._1)))
        .take(k)
      var r = 0
      while (r < ranked.length) {
        out += ((qid, ranked(r)._1, ranked(r)._2, (r + 1).toLong))
        r += 1
      }
      qi += 1
    }
    Some(out.result())
  }
}
