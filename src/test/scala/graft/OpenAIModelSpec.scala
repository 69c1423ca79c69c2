package graft

import java.net.InetSocketAddress
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ml.{MLPredict, OpenAIChatModel, OpenAIConfig, OpenAIEmbeddingModel}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** OpenAI-compatible HTTP providers ([[graft.ml.OpenAIModel]]) against an
  * in-process JDK HttpServer standing in for the API (the sandbox has no
  * network): request/response wire shapes, batch embedding with
  * out-of-order indices, retry on 5xx, fail-fast on 4xx, request timeout,
  * and the end-to-end ML_PREDICT paths (DSL + SQL TVF).
  */
class OpenAIModelSpec extends SparkSpecBase {

  private def readBody(ex: HttpExchange): JValue =
    JsonMethods.parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Stub API: chat echoes the user message; embeddings return
    * [length(input), 42.5] per input WITH the data array reversed (the
    * API does not guarantee index order); `failFirst` initial requests
    * per path get a 503; `/slow` sleeps past any test timeout. */
  private def withServer(failFirst: Int = 0)(
      run: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(Executors.newFixedThreadPool(8))
    val requests = new AtomicInteger(0)
    val failures = new AtomicInteger(failFirst)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      requests.incrementAndGet()
      if (failures.getAndDecrement() > 0) respond(ex, 503, """{"error":"busy"}""")
      else {
        val JString(user) = (readBody(ex) \ "messages")(1) \ "content"
        respond(ex, 200,
          JsonMethods.compact(JsonMethods.render(JObject(List(
            "choices" -> JArray(List(JObject(List(
              "message" -> JObject(List(
                "role" -> JString("assistant"),
                "content" -> JString(s"echo:$user"))))))))))))
      }
    })
    server.createContext("/v1/embeddings", (ex: HttpExchange) => {
      requests.incrementAndGet()
      if (failures.getAndDecrement() > 0) respond(ex, 503, """{"error":"busy"}""")
      else {
        val JArray(inputs) = readBody(ex) \ "input"
        val data = inputs.zipWithIndex.map { case (JString(s), i) =>
          JObject(List(
            "index" -> JInt(i),
            "embedding" -> JArray(List(JDouble(s.length.toDouble),
              JDouble(42.5)))))
        }.reverse // out-of-order on purpose
        respond(ex, 200, JsonMethods.compact(JsonMethods.render(
          JObject(List("data" -> JArray(data))))))
      }
    })
    server.createContext("/bad/v1/embeddings", (ex: HttpExchange) =>
      respond(ex, 400, """{"error":"bad request"}"""))
    server.createContext("/slow/v1/embeddings", (ex: HttpExchange) => {
      Thread.sleep(5000)
      respond(ex, 200, "{}")
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}/v1", requests)
    finally server.stop(0)
  }

  private def cfg(endpoint: String, retries: Int = 2) = OpenAIConfig(
    endpoint = endpoint, model = "test-model", apiKey = "test-key",
    maxRetries = retries, retryBackoffMs = 10)

  test("chat provider round-trips through MLPredict") {
    withServer() { (url, _) =>
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang")).limit(10)
      val out = MLPredict(docs, new OpenAIChatModel(cfg(url), "lang"),
        batchSize = 4)
        .select(col("doc_id"), col("lang"), col("response"))
        .collect()
      assert(out.length == 10)
      out.foreach { case Row(_, lang: String, resp: String) =>
        assert(resp == s"echo:$lang")
      }
    }
  }

  test("embedding provider: one request per batch, indices re-ordered") {
    withServer() { (url, requests) =>
      val m = new OpenAIEmbeddingModel(cfg(url), "t")
      m.open()
      val rows = Seq("a", "bbb", "cc").map(s => rowOf(s))
      val out = m.predictBatch(rows)
      // reversed data array must still land on the right rows
      assert(out.map(_.getAs[Array[Float]](0).head.toInt) == Seq(1, 3, 2))
      assert(out.forall(_.getAs[Array[Float]](0)(1) == 42.5f))
      assert(requests.get() == 1, "a batch must be ONE http request")
      m.close()
    }
  }

  private def rowOf(s: String): Row = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.StringType)))
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](s), schema)
  }

  test("5xx retries then succeeds; exhausted retries surface the error") {
    withServer(failFirst = 2) { (url, requests) =>
      val m = new OpenAIEmbeddingModel(cfg(url, retries = 3), "t")
      m.open()
      val out = m.predictBatch(Seq(rowOf("xyz")))
      assert(out.head.getAs[Array[Float]](0).head == 3.0f)
      assert(requests.get() == 3, "two 503s then one success")
      m.close()
    }
    withServer(failFirst = 99) { (url, _) =>
      val m = new OpenAIEmbeddingModel(cfg(url, retries = 1), "t")
      m.open()
      intercept[java.io.IOException](m.predictBatch(Seq(rowOf("x"))))
      m.close()
    }
  }

  test("4xx fails fast without retry; request timeout is an IOException") {
    withServer() { (url, requests) =>
      val bad = new OpenAIEmbeddingModel(
        cfg(url.replace("/v1", "/bad/v1"), retries = 3), "t")
      bad.open()
      val before = requests.get()
      intercept[IllegalStateException](bad.predictBatch(Seq(rowOf("x"))))
      assert(requests.get() == before, "4xx must not retry")
      bad.close()
      val slow = new OpenAIEmbeddingModel(
        cfg(url.replace("/v1", "/slow/v1"), retries = 0)
          .copy(requestTimeoutMs = 200), "t")
      slow.open()
      intercept[java.io.IOException](slow.predictBatch(Seq(rowOf("x"))))
      slow.close()
    }
  }

  test("embedding provider through the ML_PREDICT SQL TVF") {
    withServer() { (url, _) =>
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang")).limit(8)
      val out = graft.sql.FlinkSql.sql(spark,
        """SELECT doc_id, embedding
          |FROM ML_PREDICT(TABLE docs, MODEL emb, DESCRIPTOR(lang),
          |                MAP['batch-size', '4'])
          |ORDER BY doc_id""".stripMargin,
        Map("docs" -> docs),
        Map("emb" -> new OpenAIEmbeddingModel(cfg(url), "lang")))
        .collect()
      assert(out.length == 8)
      out.foreach { r =>
        val vec = r.getAs[scala.collection.Seq[Float]]("embedding")
        assert(vec.length == 2 && vec(1) == 42.5f && vec(0) >= 1.0f)
      }
    }
  }

  test("CREATE MODEL 'openai' dispatches chat vs embedding on the " +
      "endpoint suffix") {
    withServer() { (url, _) =>
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang")).limit(5)
      // chat/completions suffix → chat provider
      val chat = graft.sql.FlinkDdl.run(spark,
        s"""CREATE MODEL chat
           |  INPUT (lang STRING) OUTPUT (response STRING)
           |  WITH ('provider'='openai', 'endpoint'='$url/chat/completions',
           |        'model'='test-model', 'api-key'='k');
           |SELECT doc_id, lang, response
           |FROM ML_PREDICT(TABLE docs, MODEL chat, DESCRIPTOR(lang))
           |ORDER BY doc_id""".stripMargin,
        Map("docs" -> docs)).collect()
      assert(chat.length == 5)
      chat.foreach(r => assert(r.getString(2) == s"echo:${r.getString(1)}"))
      // embeddings suffix → embedding provider; OUTPUT renames the column
      val emb = graft.sql.FlinkDdl.run(spark,
        s"""CREATE MODEL emb
           |  INPUT (lang STRING) OUTPUT (vec ARRAY<FLOAT>)
           |  WITH ('provider'='openai', 'endpoint'='$url/embeddings',
           |        'model'='test-model', 'api-key'='k');
           |SELECT doc_id, lang, vec
           |FROM ML_PREDICT(TABLE docs, MODEL emb, DESCRIPTOR(lang))
           |ORDER BY doc_id""".stripMargin,
        Map("docs" -> docs)).collect()
      assert(emb.length == 5)
      emb.foreach { r =>
        val vec = r.getAs[scala.collection.Seq[Float]]("vec")
        assert(vec.length == 2 && vec(1) == 42.5f &&
          vec(0) == r.getString(1).length.toFloat)
      }
      // an unknown suffix is rejected, as in the reference factory
      val e = intercept[UnsupportedOperationException] {
        graft.sql.FlinkDdl.run(spark,
          s"""CREATE MODEL bad WITH ('provider'='openai',
             |  'endpoint'='$url/images', 'model'='m', 'api-key'='k');
             |SELECT doc_id FROM ML_PREDICT(TABLE docs, MODEL bad,
             |                              DESCRIPTOR(lang))""".stripMargin,
          Map("docs" -> docs)).collect()
      }
      assert(e.getMessage.contains("Unsupported endpoint"))
    }
  }
}
