package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.core.Json
import graft.sources.{EmbeddingProvider, FakeEmbeddingProvider, HttpEmbeddingProvider}

/** HttpEmbeddingProvider against a loopback stub (zero-egress): wire shape,
  * out-of-order reassembly, retry/backoff on transient failures, loud
  * failure on caller errors, dimension validation, auth forwarding, and the
  * distributed per-partition batch path.
  */
class HttpEmbeddingSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8
  private val fake = new FakeEmbeddingProvider(Dim)

  /** Loopback embedding endpoint: answers with the deterministic fake's
    * vectors, embeddings listed in REVERSE text order (providers may
    * reorder — text_index is the contract). `failFirst` N requests get 500.
    */
  private def withStub(failFirst: Int = 0, status: Int = 500, dim: Int = Dim)
      (f: (String, AtomicInteger, java.util.Queue[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    val authHeaders = new java.util.concurrent.ConcurrentLinkedQueue[String]
    server.createContext("/v1/embed", (ex: HttpExchange) => {
      val n = hits.incrementAndGet()
      authHeaders.add(Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (n <= failFirst) {
        val msg = "transient".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, msg.length)
        ex.getResponseBody.write(msg)
      } else {
        val texts = Json.parse(body).asObj("input").asObj("texts").asArr.map(_.asStr)
        val vecs = new FakeEmbeddingProvider(dim).embedBatch(texts)
        val embs = texts.indices.reverse.map { i =>
          Json.Obj.of(
            "text_index" -> Json.Num(i.toDouble),
            "embedding" -> Json.Arr(vecs(i).toSeq.map(x => Json.Num(x.toDouble))))
        }
        val resp = Json.write(Json.Obj.of(
          "output" -> Json.Obj.of("embeddings" -> Json.Arr(embs))))
          .getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
      }
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/embed", hits, authHeaders)
    finally server.stop(0)
  }

  test("batch embed round-trip: out-of-order text_index reassembled; float32 narrowing") {
    withStub() { (url, hits, _) =>
      val p = new HttpEmbeddingProvider(url, Dim)
      val texts = Seq("alpha", "beta", "gamma", "delta")
      val got = p.embedBatch(texts)
      val want = fake.embedBatch(texts)
      assert(got.length === 4)
      texts.indices.foreach { i =>
        assert(got(i).toSeq === want(i).toSeq, s"vector $i diverged from the fake")
      }
      assert(hits.get() === 1, "one batch call must be one HTTP request")
      assert(p.embedBatch(Seq.empty).isEmpty, "empty batch must not hit the wire")
      assert(hits.get() === 1)
    }
  }

  test("transient 5xx retried with backoff; success on a later attempt") {
    withStub(failFirst = 2) { (url, hits, _) =>
      val p = new HttpEmbeddingProvider(url, Dim, retryBackoffMs = 1L)
      val got = p.embed("retry me")
      assert(got.toSeq === fake.embed("retry me").toSeq)
      assert(hits.get() === 3, s"expected 2 failures + 1 success, got ${hits.get()} requests")
    }
  }

  test("retries exhausted surfaces the last transient error") {
    withStub(failFirst = 100) { (url, hits, _) =>
      val p = new HttpEmbeddingProvider(url, Dim, maxRetries = 2, retryBackoffMs = 1L)
      val e = intercept[java.io.IOException](p.embed("never"))
      assert(e.getMessage.contains("after 3 attempts"))
      assert(hits.get() === 3)
    }
  }

  test("non-transient 4xx fails immediately, no retry") {
    withStub(failFirst = 100, status = 400) { (url, hits, _) =>
      val p = new HttpEmbeddingProvider(url, Dim, maxRetries = 5, retryBackoffMs = 1L)
      val e = intercept[java.io.IOException](p.embed("bad request"))
      assert(e.getMessage.contains("HTTP 400"))
      assert(hits.get() === 1, "4xx must not be retried")
    }
  }

  test("dimension mismatch from the endpoint fails loud (P3 at the source)") {
    withStub(dim = Dim + 1) { (url, _, _) =>
      val p = new HttpEmbeddingProvider(url, Dim)
      val e = intercept[IllegalArgumentException](p.embed("wrong dim"))
      assert(e.getMessage.contains(s"${Dim + 1} != configured $Dim"))
    }
  }

  test("api key env forwarded as Bearer; absent env sends no header") {
    withStub() { (url, _, auths) =>
      // HOME is guaranteed in the test env; the header must carry its value
      new HttpEmbeddingProvider(url, Dim, apiKeyEnv = "HOME").embed("авторизация")
      assert(auths.poll() === s"Bearer ${sys.env("HOME")}")
      new HttpEmbeddingProvider(url, Dim, apiKeyEnv = "GRAFT_NO_SUCH_ENV").embed("anon")
      assert(auths.poll() === "")
    }
  }

  test("engine server-side embedding path runs through the HTTP provider (S9 complete)") {
    withStub() { (url, hits, _) =>
      import graft.api.Engine
      import graft.core.{CollectionConfig, IndexType}
      val root = java.nio.file.Files.createTempDirectory("http-embed").toString
      val e = new Engine(spark, root,
        embedder = Some(new HttpEmbeddingProvider(url, Dim)))
      e.createCollection(CollectionConfig("c", Dim, IndexType.Flat))
      e.upsertWithEmbedding("c", "d1", "the quick brown fox")
      assert(hits.get() === 1)
      val got = e.getDocument("c", "d1").get
      assert(got.vector.toSeq === fake.embed("the quick brown fox").toSeq,
        "stored vector must be the HTTP endpoint's embedding")
    }
  }

  test("distributed embedColumn batches per partition through the HTTP provider") {
    withStub() { (url, hits, _) =>
      val p = new HttpEmbeddingProvider(url, Dim)
      val df = (0 until 40).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
        .repartition(4)
      val out = EmbeddingProvider.embedColumn(df, "text", "emb", p, batchSize = 10)
      val got = out.select(col("id"), col("emb")).as[(Long, Seq[Float])]
        .collect().toMap
      assert(got.size === 40)
      (0 until 40).foreach { i =>
        assert(got(i.toLong) === fake.embed(s"doc $i").toSeq, s"doc $i diverged")
      }
      val reqs = hits.get()
      assert(reqs >= 4 && reqs <= 8,
        s"expected one request per partition batch (4 partitions x <=10 rows), got $reqs")
    }
  }
}
