package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: binary columns, partition-batched stub decode,
  * frame sampling shapes.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "fake-jpeg-payload-AAAA".getBytes),
    (2L, "fake-jpeg-payload-BBBB".getBytes),
    (3L, "fake-jpeg-payload-AAAA".getBytes))
    .toDF("media_id", "payload")

  test("metadata: byte length + digest; identical payloads share digests") {
    val out = Multimodal.withMetadata(media, "payload")
      .select("media_id", "n_bytes", "digest")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.forall(_._2 === 22L))
    assert(out(0)._3 === out(2)._3)
    assert(out(0)._3 !== out(1)._3)
  }

  test("decodeFeatures: fixed-dim deterministic features per payload") {
    val out = Multimodal.decodeFeatures(media, "payload", dim = 16)
    assert(out.schema("features").dataType.typeName === "array")
    val feats = out.select("media_id", "features").as[(Long, Seq[Float])]
      .collect().toMap
    assert(feats.values.forall(_.length === 16))
    assert(feats(1L) === feats(3L)) // same bytes → same features
    assert(feats(1L) !== feats(2L))
  }

  test("sampleFrames: one row per frame with index and payload slice") {
    val out = Multimodal.sampleFrames(media.filter(col("media_id") === 1), "payload", n = 4)
      .select("media_id", "frame_idx", "frame")
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    assert(out.length === 4)
    assert(out.map(_._2).toSeq === Seq(0, 1, 2, 3))
    assert(out.map(_._3.length).sum <= 22)
  }
}
