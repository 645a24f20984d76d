package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text→vector embedding source (reference `internal/embedding/embedding.go:4-7`
  * + DashScope HTTP provider `provider/aliyun.go:82-141` — SURVEY S9/F10).
  *
  * The trait is the extension point; the deterministic fake is what tests and
  * the zero-egress environment use. A production HTTP provider implements
  * `embedBatch` with a pooled client and is invoked per-partition (batch per
  * partition — the reference's EmbedBatch), never per-row from the driver.
  */
trait EmbeddingProvider extends Serializable {
  def dimension: Int
  /** Batch embed; providers return doubles, narrowed to float32 at the
    * boundary (reference `document.go:349-356`).
    */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  final def embed(text: String): Array[Float] = embedBatch(Seq(text)).head
}

/** Deterministic fake: hash-derived pseudo-random unit vector per text
  * (FIXTURES F-5: "deterministic fake provider (hash-of-text → fixed dim)").
  */
final class FakeEmbeddingProvider(val dimension: Int) extends EmbeddingProvider {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    var h = t.hashCode.toLong & 0xffffffffL
    val v = new Array[Float](dimension)
    var i = 0
    var norm = 0.0
    while (i < dimension) {
      h = h * 6364136223846793005L + 1442695040888963407L // splitmix-ish LCG
      val x = ((h >>> 33).toDouble / (1L << 31).toDouble) - 0.5
      v(i) = x.toFloat
      norm += x * x
      i += 1
    }
    val inv = if (norm == 0.0) 1.0f else (1.0 / math.sqrt(norm)).toFloat
    v.map(_ * inv)
  }
}

object EmbeddingProvider {

  /** Distributed embedding of a text column: mapPartitions with one provider
    * batch call per partition (SURVEY S9's Spark mapping). The provider is
    * serialized to executors; HTTP impls open their client lazily per task.
    */
  def embedColumn(df: DataFrame, textCol: String, outCol: String,
      provider: EmbeddingProvider, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val idx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val vecs = provider.embedBatch(rows.map(_.getString(idx)))
        rows.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
