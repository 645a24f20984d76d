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

/** Production HTTP embedding provider — the generic form of the reference's
  * DashScope client (`internal/embedding/provider/aliyun.go:82-141`): one
  * batch POST per `embedBatch` call with a Bearer token, bounded retries
  * with exponential backoff on transient failures (429/5xx/IO), and strict
  * dimension validation on every returned vector.
  *
  * Wire shape (the de-facto embedding-API convention the reference also
  * speaks): request `{"model": m, "input": {"texts": [...]}}`, response
  * `{"output": {"embeddings": [{"text_index": i, "embedding": [...]}]}}`.
  * Embeddings arrive float64 and are narrowed to float32 at this boundary
  * (SURVEY F10, reference `document.go:349-356`).
  *
  * Executor mechanics: the provider is serialized into tasks
  * (`EmbeddingProvider.embedColumn` batches per partition); the pooled
  * `java.net.http.HttpClient` is `@transient lazy`, so each executor JVM
  * opens exactly one connection pool on first use rather than shipping
  * driver state. The API key is read from `apiKeyEnv` at CALL time on the
  * executor (keys never ride in the closure). Zero-egress environments test
  * this class against a loopback stub server (HttpEmbeddingSpec).
  */
final class HttpEmbeddingProvider(
    endpoint: String,
    val dimension: Int,
    model: String = "text-embedding-v1",
    apiKeyEnv: String = "GRAFT_EMBEDDING_API_KEY",
    maxRetries: Int = 3,
    requestTimeoutMs: Long = 30000L,
    retryBackoffMs: Long = 200L) extends EmbeddingProvider {
  import graft.core.Json

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(requestTimeoutMs))
      .build()

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val body = Json.write(Json.Obj.of(
      "model" -> Json.Str(model),
      "input" -> Json.Obj.of("texts" -> Json.Arr(texts.map(Json.Str(_))))))
    val req = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      sys.env.get(apiKeyEnv).filter(_.nonEmpty)
        .fold(b)(k => b.header("Authorization", s"Bearer $k"))
        .build()
    }
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(retryBackoffMs << (attempt - 1))
      var fatal = false
      try {
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code == 200) return parseResponse(resp.body(), texts.length)
        // 429/5xx are transient (the reference retries these too); other
        // 4xx are caller bugs — fail loud immediately, outside the catch
        lastErr = new java.io.IOException(
          s"embedding endpoint $endpoint returned HTTP $code: ${resp.body().take(200)}")
        fatal = code != 429 && code < 500
      } catch {
        case e: java.io.IOException => lastErr = e
        case e: InterruptedException => throw e
      }
      if (fatal) throw lastErr
      attempt += 1
    }
    throw new java.io.IOException(
      s"embedding request failed after ${maxRetries + 1} attempts", lastErr)
  }

  /** Parse `{"output":{"embeddings":[{"text_index":i,"embedding":[...]}]}}`,
    * reassembling by text_index (providers may reorder), validating count
    * and dimension, narrowing float64 → float32.
    */
  private def parseResponse(body: String, expected: Int): Seq[Array[Float]] = {
    val embs = Json.parse(body).asObj("output").asObj("embeddings").asArr
    require(embs.length == expected,
      s"embedding response has ${embs.length} vectors for $expected texts")
    val out = new Array[Array[Float]](expected)
    embs.foreach { e =>
      val o = e.asObj
      val i = o("text_index").asInt
      require(i >= 0 && i < expected, s"text_index $i out of range [0, $expected)")
      val v = o("embedding").asArr.map(_.asDouble.toFloat).toArray
      require(v.length == dimension,
        s"embedding dimension ${v.length} != configured $dimension") // P3 at the source
      out(i) = v
    }
    require(out.forall(_ != null), "embedding response missing a text_index")
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
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
