package graft.core

import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Driver-local parquet run writer — the WRITE-side twin of
  * `LocalPointReader`: a driver-sized batch (a REST point write, a small
  * delete) lands as one immutable run file with NO Spark job (~5 ms vs the
  * ~100 ms per-job floor). The files are ordinary parquet with Spark's
  * standard logical types (3-level LIST, key_value MAP), so every existing
  * reader — Spark scans, the driver-local point reader, the bloom builder,
  * the delta/tombstone aggregations — consumes them exactly like
  * Spark-written runs; `LocalRunWriterSpec` asserts byte-level read
  * equivalence against a Spark-written twin.
  *
  * Crash safety mirrors the store protocol: the file is written under a
  * dot-prefixed temp name (invisible to every run listing — Spark's and
  * `listRuns`' conventions both skip dotfiles), then ATOMIC_MOVE'd to its
  * final name; a crash mid-write leaves only an ignored dotfile. Callers
  * sequence the move before any version-counter/stamp advance, same as the
  * Spark write path.
  */
object LocalRunWriter {

  /** "Driver-sized": batches at or under this row count write locally;
    * larger ones take the distributed Spark write (a single-threaded
    * driver serialization of an unbounded batch would stall the caller).
    * Shared by every local-write gate (store appends, delta/tombstone
    * runs) so the invariant has one definition.
    */
  val MaxLocalRows = 1024

  /** The DocStore row schema (`DocStore.schema`) in parquet form. All
    * fields optional: Spark reads parquet columns as nullable regardless,
    * and tombstone rows carry null vector/params.
    */
  private val storeSchema: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional binary id (STRING);
      |  optional group vector (LIST) {
      |    repeated group list {
      |      optional float element;
      |    }
      |  }
      |  optional group params (MAP) {
      |    repeated group key_value {
      |      required binary key (STRING);
      |      optional binary value (STRING);
      |    }
      |  }
      |  optional int64 version;
      |  optional int64 seq;
      |  optional boolean is_deleted;
      |}""".stripMargin)

  /** The hnsw `_delta` sidecar schema (id, vector, version). */
  private val deltaSchema: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional binary id (STRING);
      |  optional group vector (LIST) {
      |    repeated group list {
      |      optional float element;
      |    }
      |  }
      |  optional int64 version;
      |}""".stripMargin)

  /** The `_tombstones` sidecar schema (id, ver). */
  private val tombSchema: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional binary id (STRING);
      |  optional int64 ver;
      |}""".stripMargin)

  /** One store run: (id, vector|null, params|null, is_deleted) rows, all
    * stamped `version`, seq = position in the batch (the sequential-put
    * winner rule, identical to `DocStore.appendRows`).
    */
  def writeStoreRun(dataDir: String,
      rows: Seq[(String, Seq[Float], Map[String, String], Boolean)],
      version: Long): Unit =
    writeRun(dataDir, storeSchema) { record =>
      rows.zipWithIndex.foreach { case ((id, vec, params, deleted), i) =>
        record { r =>
        r.add("id", id)
        if (vec != null) {
          val vg = r.addGroup("vector")
          vec.foreach(f => vg.addGroup("list").add("element", f))
        }
        if (params != null) {
          val pg = r.addGroup("params")
          params.foreach { case (k, v) =>
            val kv = pg.addGroup("key_value")
            kv.add("key", k)
            if (v != null) kv.add("value", v)
          }
        }
        r.add("version", version)
        r.add("seq", i.toLong)
        r.add("is_deleted", deleted)
        }
      }
    }

  /** One delta run: (id, vector) rows stamped `version`. */
  def writeDeltaRun(deltaDir: String, rows: Seq[(String, Seq[Float])],
      version: Long): Unit =
    writeRun(deltaDir, deltaSchema) { record =>
      rows.foreach { case (id, vec) =>
        record { r =>
          r.add("id", id)
          val vg = r.addGroup("vector")
          vec.foreach(f => vg.addGroup("list").add("element", f))
          r.add("version", version)
        }
      }
    }

  /** One tombstone-sidecar run: (id, ver) rows. */
  def writeTombstoneRun(tombDir: String, ids: Seq[String], ver: Long): Unit =
    writeRun(tombDir, tombSchema) { record =>
      ids.foreach { id =>
        record { r =>
          r.add("id", id)
          r.add("ver", ver)
        }
      }
    }

  private def writeRun(dir: String, schema: MessageType)(
      emit: ((SimpleGroup => Unit) => Unit) => Unit): Unit = {
    val dirPath = Paths.get(dir)
    Files.createDirectories(dirPath)
    val name = s"part-local-${java.util.UUID.randomUUID().toString}.parquet"
    val tmpName = s".$name.tmp"
    val tmp: JPath = dirPath.resolve(tmpName)
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter.builder(new Path(tmp.toString))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try {
      // populate-then-write per record: ParquetWriter.write serializes the
      // group's content at call time
      emit { fill =>
        val g = new SimpleGroup(schema)
        fill(g)
        writer.write(g)
      }
    } finally writer.close()
    Files.move(tmp, dirPath.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    // the Hadoop local fs writes a checksum sidecar for the TEMP name;
    // harmless (dotfile) but pointless after the rename — drop it
    Files.deleteIfExists(dirPath.resolve(s".$tmpName.crc"))
  }
}
