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

  private val conf = new Configuration()

  /** LWW winners for `ids` (absent / tombstoned ids omitted). */
  def readDocs(dataDir: String, ids: Set[String]): Map[String, Document] = {
    val dir = Paths.get(dataDir)
    if (ids.isEmpty || !Files.exists(dir)) return Map.empty
    val files = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.toString)
        .filter { p =>
          val n = p.substring(p.lastIndexOf('/') + 1)
          n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
        }.toVector
      finally s.close()
    }
    if (files.isEmpty) return Map.empty
    val pred = FilterApi.in(
      FilterApi.binaryColumn("id"),
      ids.map(Binary.fromString).asJava.asInstanceOf[java.util.Set[Binary]])
    // (version, seq) max per id across every run — the LWW resolution
    val best = scala.collection.mutable.HashMap
      .empty[String, (Long, Long, Document, Boolean)]
    files.foreach { f =>
      val reader: ParquetReader[Group] = ParquetReader
        .builder(new GroupReadSupport(), new Path(f))
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
