package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque BINARY columns
  * with typed metadata, plus partition-batched decode / feature-extraction /
  * frame-sampling plumbing.
  *
  * The Spark side (schema, partition batching, output shapes) is real and
  * tested; the codec itself is a STUB — `FakeDecoder` derives deterministic
  * bytes→features so the pipeline is exercisable in this container. A real
  * deployment swaps `Decoder` for a JNI/FFI codec (libjpeg/ffmpeg) without
  * touching the Spark plumbing: decode stays a per-partition batch call so
  * codec init cost amortizes across each task's rows, exactly like the
  * embedding provider (SURVEY S9).
  */
object Multimodal {

  /** Pluggable codec boundary. */
  trait Decoder extends Serializable {
    /** bytes → fixed-dim feature vector ("decode + embed"). */
    def features(payload: Array[Byte], dim: Int): Array[Float]
    /** bytes → up to n frame payloads ("video frame-sample"). */
    def frames(payload: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** STUB codec: deterministic md5-nibble features and even byte-slicing —
    * NOT a real media decoder (none available in this container); the
    * deterministic output is what makes the plumbing testable. Feature i is
    * nibble i of md5(payload) mapped to [-0.5, 0.4375] — every value is an
    * exact dyadic rational (n/16), so an external SQL oracle reproduces the
    * floats bit-for-bit and the driver gate can hash-match the pipeline.
    */
  object FakeDecoder extends Decoder {
    override def features(payload: Array[Byte], dim: Int): Array[Float] = {
      require(dim <= 32, s"FakeDecoder supports dim <= 32 (md5 nibbles), got $dim")
      val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
      Array.tabulate(dim) { i =>
        val b = digest(i / 2) & 0xff
        val nib = if (i % 2 == 0) b >>> 4 else b & 0xf
        nib / 16.0f - 0.5f
      }
    }
    override def frames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (payload.isEmpty) return Seq.empty
      val step = math.max(1, payload.length / n)
      (0 until math.min(n, payload.length)).map { i =>
        payload.slice(i * step, math.min(i * step + step, payload.length))
      }
    }
  }

  /** Typed metadata for an opaque payload column: byte length + digest
    * (pure built-in expressions — stays in whole-stage codegen).
    */
  def withMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(binCol)).cast("long"))
      .withColumn("digest", md5(col(binCol)))

  /** Partition-batched decode+featurize: adds `features ARRAY<FLOAT>(dim)`.
    * mapPartitions (not a per-row UDF) so a real codec initializes once per
    * task; rows stream through in arrival order — no shuffle.
    */
  def decodeFeatures(df: DataFrame, binCol: String, dim: Int,
      decoder: Decoder = FakeDecoder): DataFrame = {
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val rdd = df.rdd.mapPartitions { it =>
      // codec init would happen here, once per task
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ decoder.features(bytes, dim).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: one row per sampled frame, `(… , frame_idx INT,
    * frame BINARY)` — the video→frames explode shape.
    */
  def sampleFrames(df: DataFrame, binCol: String, n: Int,
      decoder: Decoder = FakeDecoder): DataFrame = {
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        decoder.frames(bytes, n).zipWithIndex.map { case (f, i) =>
          Row.fromSeq(r.toSeq ++ Seq(i, f))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
