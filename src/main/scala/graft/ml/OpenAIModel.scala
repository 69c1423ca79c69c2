package graft.ml

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{ArrayType, DataTypes, FloatType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** OpenAI-compatible HTTP model providers for ML_PREDICT — the real
  * network-backed providers the reference ships
  * (flink-models/flink-model-openai/…/OpenAIChatModelFunction.java:41,
  * OpenAIEmbeddingModelFunction.java:40, factory
  * OpenAIModelProviderFactory.java:31), re-expressed over the
  * [[ModelProvider]] SPI so the per-partition lifecycle, batching and
  * async in-flight window of [[MLPredict]] apply unchanged.
  *
  * Transport is the JDK's `java.net.http.HttpClient` (no extra jars);
  * JSON via json4s (already on Spark's classpath). The client is created
  * in `open()` — one per partition, the analog of the reference's
  * per-subtask OpenAI client — and requests retry on IOException, 429 and
  * 5xx with linear backoff, which is the retryable set the OpenAI API
  * documents. 4xx other than 429 fail fast (a bad request never heals).
  *
  * Scale: chat is one request per row (the API has no chat batch);
  * embeddings send ONE request per micro-batch (the API takes an input
  * array) — with `MLPredict(batchSize = n)` that amortizes HTTP overhead
  * n× exactly like the reference's batched embedding calls.
  */
final case class OpenAIConfig(
    endpoint: String, // base URL ('…/v1') or full URL incl. the suffix
    model: String,
    apiKey: String = "",
    systemPrompt: String = "You are a helpful assistant.",
    temperature: Option[Double] = None,
    maxTokens: Option[Long] = None,
    dimensions: Option[Long] = None,
    requestTimeoutMs: Long = 30000,
    maxRetries: Int = 2,
    retryBackoffMs: Long = 100)

private[ml] abstract class OpenAIModelBase(cfg: OpenAIConfig)
    extends ModelProvider {

  /** `chat/completions` or `embeddings`. */
  protected def endpointSuffix: String

  @transient private var client: java.net.http.HttpClient = _

  override def open(): Unit = {
    client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(cfg.requestTimeoutMs))
      .build()
  }

  override def close(): Unit = client = null

  protected def url: String = {
    val base = cfg.endpoint.stripSuffix("/")
    if (base.endsWith(endpointSuffix)) base else s"$base/$endpointSuffix"
  }

  /** POST the JSON body; retry IOException/429/5xx up to `maxRetries`
    * times with linear backoff; fail fast on other 4xx. */
  protected def post(body: JValue): JValue = {
    val payload = JsonMethods.compact(JsonMethods.render(body))
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= cfg.maxRetries) {
      if (attempt > 0) Thread.sleep(cfg.retryBackoffMs * attempt)
      try {
        val b = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(cfg.requestTimeoutMs))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
        if (cfg.apiKey.nonEmpty)
          b.header("Authorization", s"Bearer ${cfg.apiKey}")
        val resp = client.send(b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case ok if ok / 100 == 2 => return JsonMethods.parse(resp.body())
          case retryable if retryable == 429 || retryable / 100 == 5 =>
            lastErr = new java.io.IOException(
              s"$url returned $retryable: ${resp.body().take(200)}")
          case bad => throw new IllegalStateException(
            s"$url returned $bad: ${resp.body().take(500)}")
        }
      } catch {
        case e: java.io.IOException => lastErr = e
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"$url failed after ${cfg.maxRetries + 1} attempts", lastErr)
  }

  protected def inputString(r: Row, idx: Int): String = {
    val v = r.get(idx)
    if (v == null) "" else v.toString
  }
}

/** Chat-completion provider: appends one STRING column (default name
  * `response`) with the first choice's message content per row. One
  * request per row, as the chat API requires; pair with
  * [[MLPredict.async]] for in-flight concurrency. */
class OpenAIChatModel(
    cfg: OpenAIConfig,
    inputCol: String,
    outputCol: String = "response") extends OpenAIModelBase(cfg) {

  override def name: String = s"openai-chat:${cfg.model}"
  override protected def endpointSuffix: String = "chat/completions"

  override val outputSchema: StructType = StructType(Seq(
    StructField(outputCol, DataTypes.StringType, nullable = true)))

  override def predictBatch(rows: Seq[Row]): Seq[Row] = {
    if (rows.isEmpty) return Nil
    val idx = rows.head.fieldIndex(inputCol)
    rows.map { r =>
      val req = JObject(List(
        "model" -> JString(cfg.model),
        "messages" -> JArray(List(
          JObject(List("role" -> JString("system"),
            "content" -> JString(cfg.systemPrompt))),
          JObject(List("role" -> JString("user"),
            "content" -> JString(inputString(r, idx))))))) ++
        cfg.temperature.map(t => "temperature" -> JDouble(t)).toList ++
        cfg.maxTokens.map(m => "max_tokens" -> JLong(m)).toList)
      post(req) \ "choices" match {
        case JArray(choice :: _) =>
          choice \ "message" \ "content" match {
            case JString(s) => Row(s)
            case _ => Row(null)
          }
        case _ => Row(null)
      }
    }
  }
}

/** Embedding provider: appends one ARRAY&lt;FLOAT&gt; column (default name
  * `embedding`). The whole micro-batch goes out as ONE request (the
  * embeddings API takes an input array); responses are re-ordered by the
  * API's `index` field, which the API does not guarantee sorted. */
class OpenAIEmbeddingModel(
    cfg: OpenAIConfig,
    inputCol: String,
    outputCol: String = "embedding") extends OpenAIModelBase(cfg) {

  override def name: String = s"openai-embedding:${cfg.model}"
  override protected def endpointSuffix: String = "embeddings"

  override val outputSchema: StructType = StructType(Seq(
    StructField(outputCol, ArrayType(FloatType), nullable = true)))

  override def predictBatch(rows: Seq[Row]): Seq[Row] = {
    if (rows.isEmpty) return Nil
    val idx = rows.head.fieldIndex(inputCol)
    val req = JObject(List(
      "model" -> JString(cfg.model),
      "encoding_format" -> JString("float"),
      "input" -> JArray(rows.map(r =>
        JString(inputString(r, idx))).toList)) ++
      cfg.dimensions.map(d => "dimensions" -> JLong(d)).toList)
    val data = post(req) \ "data" match {
      case JArray(items) => items
      case other => throw new IllegalStateException(
        s"embeddings response has no data array: $other")
    }
    require(data.length == rows.length,
      s"embeddings response has ${data.length} items for ${rows.length} inputs")
    val byIndex = data.map { item =>
      val i = item \ "index" match {
        case JInt(n) => n.toInt
        case JLong(n) => n.toInt
        case _ => throw new IllegalStateException("embedding item lacks index")
      }
      val vec = item \ "embedding" match {
        case JArray(vs) => vs.map {
          case JDouble(d) => d.toFloat
          case JInt(n) => n.toFloat
          case JDecimal(d) => d.toFloat
          case JLong(n) => n.toFloat
          case other => throw new IllegalStateException(
            s"non-numeric embedding element: $other")
        }.toArray
        case _ => null
      }
      i -> vec
    }.toMap
    rows.indices.map(i => Row(byIndex.getOrElse(i, null)))
  }
}
