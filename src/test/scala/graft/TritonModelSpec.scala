package graft

import java.net.InetSocketAddress
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.ml.{CircuitBreakerOpenException, MLPredict, TritonConfig, TritonModel}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Triton provider ([[graft.ml.TritonModel]]) against an in-process JDK
  * HttpServer speaking the KServe v2 inference protocol: batched tensor
  * request/response shapes, scalar + string inputs, retry/backoff, the
  * default-value fallback, the circuit breaker's three states, and the
  * CREATE MODEL → ML_PREDICT SQL path.
  */
class TritonModelSpec extends SparkSpecBase {

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Stub Triton: `/v2/models/sum/infer` returns, per row, the FP32 pair
    * [rowSum, 2*rowSum] (shape [batch, 2]); `/v2/models/scalar/infer`
    * echoes each INT64 scalar + 100 (shape [batch, 1]); failFirst initial
    * requests get 503. */
  private def withServer(failFirst: Int = 0)(
      run: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(Executors.newFixedThreadPool(8))
    val requests = new AtomicInteger(0)
    val failures = new AtomicInteger(failFirst)
    def body(ex: HttpExchange): JValue =
      JsonMethods.parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
    def nums(j: JValue): List[Double] = j match {
      case JArray(vs) => vs.map {
        case JDouble(d) => d
        case JInt(n) => n.toDouble
        case JLong(n) => n.toDouble
        case JDecimal(d) => d.toDouble
        case other => fail(s"non-numeric $other")
      }
      case other => fail(s"not an array: $other")
    }
    server.createContext("/v2/models/sum/infer", (ex: HttpExchange) => {
      requests.incrementAndGet()
      if (failures.getAndDecrement() > 0) respond(ex, 503, """{"error":"down"}""")
      else {
        val in = (body(ex) \ "inputs")(0)
        assert((in \ "datatype") == JString("FP32"))
        val List(batch, dim) = nums(in \ "shape").map(_.toInt)
        val data = nums(in \ "data")
        val out = (0 until batch).flatMap { i =>
          val s = data.slice(i * dim, (i + 1) * dim).sum
          Seq(s, 2 * s)
        }
        respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(List(
          "outputs" -> JArray(List(JObject(List(
            "name" -> JString("scores"),
            "datatype" -> JString("FP32"),
            "shape" -> JArray(List(JInt(batch), JInt(2))),
            "data" -> JArray(out.map(JDouble(_)).toList))))))))))
      }
    })
    server.createContext("/v2/models/scalar/versions/3/infer",
      (ex: HttpExchange) => {
        requests.incrementAndGet()
        val in = (body(ex) \ "inputs")(0)
        assert((in \ "datatype") == JString("INT64"))
        val data = nums(in \ "data")
        respond(ex, 200, JsonMethods.compact(JsonMethods.render(JObject(List(
          "outputs" -> JArray(List(JObject(List(
            "name" -> JString("out"),
            "datatype" -> JString("INT64"),
            "shape" -> JArray(List(JInt(data.length), JInt(1))),
            "data" -> JArray(data.map(d => JLong(d.toLong + 100L)).toList))))))))))
      })
    server.createContext("/v2/models/bad/infer", (ex: HttpExchange) => {
      requests.incrementAndGet()
      respond(ex, 400, """{"error":"unexpected shape for input"}""")
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}", requests)
    finally server.stop(0)
  }

  private def rowOf(schema: StructType, vs: Any*): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      vs.toArray, schema)

  private val vecSchema = StructType(Seq(
    StructField("vec", ArrayType(FloatType))))

  test("vector batch is ONE request; response tensor sliced per row") {
    withServer() { (url, requests) =>
      val m = new TritonModel(
        TritonConfig(endpoint = url, modelName = "sum", outputName = "scores"),
        "vec", outputCol = "scores")
      m.open()
      val out = m.predictBatch(Seq(
        rowOf(vecSchema, Array(1.0f, 2.0f)),
        rowOf(vecSchema, Array(10.0f, 0.5f)),
        rowOf(vecSchema, null))) // null row → zero-filled tensor slot
      assert(requests.get() == 1, "a batch must be ONE http request")
      assert(out.map(_.getAs[Array[Float]](0).toSeq) ==
        Seq(Seq(3.0f, 6.0f), Seq(10.5f, 21.0f), Seq(0.0f, 0.0f)))
      m.close()
    }
  }

  test("INT64 scalar input, scalar OUTPUT type, explicit model version") {
    withServer() { (url, _) =>
      val schema = StructType(Seq(StructField("n", LongType)))
      val m = new TritonModel(
        TritonConfig(endpoint = url, modelName = "scalar", modelVersion = "3"),
        "n", outputCol = "out", outputType = LongType)
      assert(m.url.endsWith("/v2/models/scalar/versions/3/infer"))
      m.open()
      val out = m.predictBatch(Seq(rowOf(schema, 7L), rowOf(schema, 40L)))
      assert(out.map(_.getLong(0)) == Seq(107L, 140L))
      m.close()
    }
  }

  test("5xx retries with backoff; default-value fallback after exhaustion") {
    withServer(failFirst = 2) { (url, requests) =>
      val m = new TritonModel(
        TritonConfig(endpoint = url, modelName = "sum", outputName = "scores",
          maxRetries = 3, retryInitialBackoffMs = 10),
        "vec")
      m.open()
      val out = m.predictBatch(Seq(rowOf(vecSchema, Array(2.0f))))
      assert(out.head.getAs[Array[Float]](0).toSeq == Seq(2.0f, 4.0f))
      assert(requests.get() == 3, "two 503s then one success")
      m.close()
    }
    // retries exhausted + default-value → every row gets the fallback
    withServer(failFirst = 99) { (url, _) =>
      val m = new TritonModel(
        TritonConfig(endpoint = url, modelName = "sum", maxRetries = 1,
          retryInitialBackoffMs = 10, defaultValue = Some("[0.0, 0.0]")),
        "vec")
      m.open()
      val out = m.predictBatch(Seq(rowOf(vecSchema, Array(1.0f))))
      assert(out.head.getAs[Array[Float]](0).toSeq == Seq(0.0f, 0.0f))
      m.close()
    }
    // retries exhausted + NO default → the error surfaces
    withServer(failFirst = 99) { (url, _) =>
      val m = new TritonModel(
        TritonConfig(endpoint = url, modelName = "sum", maxRetries = 0),
        "vec")
      m.open()
      intercept[java.io.IOException](
        m.predictBatch(Seq(rowOf(vecSchema, Array(1.0f)))))
      m.close()
    }
  }

  test("4xx fails fast, never retried, never masked by default-value") {
    withServer() { (url, requests) =>
      val m = new TritonModel(
        TritonConfig(endpoint = url, modelName = "bad", maxRetries = 3,
          defaultValue = Some("[1.0]")),
        "vec")
      m.open()
      val before = requests.get()
      intercept[IllegalStateException](
        m.predictBatch(Seq(rowOf(vecSchema, Array(1.0f)))))
      assert(requests.get() == before + 1, "4xx must not retry")
      m.close()
    }
  }

  test("circuit breaker: opens on failures, fails fast, half-open recovers") {
    withServer(failFirst = 2) { (url, requests) =>
      val m = new TritonModel(
        TritonConfig(endpoint = url, modelName = "sum", outputName = "scores",
          maxRetries = 0, breakerEnabled = true,
          breakerFailureThreshold = 0.5, breakerMinRequests = 2,
          breakerOpenMs = 150, breakerHalfOpenRequests = 2),
        "vec")
      m.open()
      val row = rowOf(vecSchema, Array(1.0f))
      // two failures trip the breaker (rate 1.0 >= 0.5 at min requests)
      intercept[java.io.IOException](m.predictBatch(Seq(row)))
      intercept[java.io.IOException](m.predictBatch(Seq(row)))
      val afterTrip = requests.get()
      // OPEN: fails fast WITHOUT a request
      intercept[CircuitBreakerOpenException](m.predictBatch(Seq(row)))
      assert(requests.get() == afterTrip, "open breaker must not call out")
      // after the cool-off it half-opens; the server is healthy again
      Thread.sleep(250)
      assert(m.predictBatch(Seq(row)).head
        .getAs[Array[Float]](0).toSeq == Seq(1.0f, 2.0f))
      assert(m.predictBatch(Seq(row)).nonEmpty) // second success → CLOSED
      assert(m.predictBatch(Seq(row)).nonEmpty)
      m.close()
    }
  }

  test("breaker OPEN + default-value degrades instead of failing") {
    withServer(failFirst = 99) { (url, requests) =>
      val m = new TritonModel(
        TritonConfig(endpoint = url, modelName = "sum", maxRetries = 0,
          defaultValue = Some("[9.0]"), breakerEnabled = true,
          breakerFailureThreshold = 0.5, breakerMinRequests = 2,
          breakerOpenMs = 60000),
        "vec")
      m.open()
      val row = rowOf(vecSchema, Array(1.0f))
      (1 to 2).foreach(_ => assert(
        m.predictBatch(Seq(row)).head.getAs[Array[Float]](0).head == 9.0f))
      val afterTrip = requests.get()
      // breaker now OPEN: fallback continues with no outbound requests
      assert(m.predictBatch(Seq(row)).head
        .getAs[Array[Float]](0).head == 9.0f)
      assert(requests.get() == afterTrip)
      m.close()
    }
  }

  test("CREATE MODEL 'triton' end-to-end through ML_PREDICT SQL") {
    withServer() { (url, _) =>
      val emb = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).limit(6)
      val out = graft.sql.FlinkDdl.run(spark,
        s"""CREATE MODEL scorer
           |  INPUT (embedding ARRAY<FLOAT>) OUTPUT (scores ARRAY<FLOAT>)
           |  WITH ('provider'='triton', 'endpoint'='$url',
           |        'model-name'='sum', 'output-name'='scores',
           |        'timeout'='10s', 'max-retries'='2',
           |        'retry-initial-backoff'='10ms');
           |SELECT vec_id, scores
           |FROM ML_PREDICT(TABLE embs, MODEL scorer, DESCRIPTOR(embedding))
           |ORDER BY vec_id""".stripMargin,
        Map("embs" -> emb)).collect()
      assert(out.length == 6)
      val expected = emb.orderBy("vec_id").collect().map(r =>
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).sum)
      out.zip(expected).foreach { case (r, s) =>
        val v = r.getAs[scala.collection.Seq[Float]]("scores")
        assert(v.length == 2)
        assert(math.abs(v.head - s) < 1e-3, s"row $r vs sum $s")
        assert(math.abs(v(1) - 2 * s) < 1e-3)
      }
    }
  }

  test("async MLPredict path works against the Triton provider") {
    withServer() { (url, _) =>
      val emb = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding")).limit(12)
      val m = new TritonModel(
        TritonConfig(endpoint = url, modelName = "sum", outputName = "scores"),
        "embedding", outputCol = "scores")
      val out = MLPredict.async(emb, m, batchSize = 4, maxInFlight = 3)
        .select("vec_id", "scores").collect()
      assert(out.length == 12)
      assert(out.forall(_.getAs[scala.collection.Seq[Float]]("scores")
        .length == 2))
    }
  }
}
