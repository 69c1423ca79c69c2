package graft.ml

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StructType}

/** Catalog-declared model metadata — the repo's face of the reference's
  * `CREATE MODEL` DDL (flink-sql-parser/…/ddl/model/SqlCreateModel.java:49:
  * name, INPUT/OUTPUT column lists, comment, WITH options). A spec is pure
  * metadata; [[ModelFactories]] turns it into a runnable [[ModelProvider]]
  * once the feature column is known (from the declared INPUT list or an
  * ML_PREDICT DESCRIPTOR).
  */
final case class ModelSpec(
    name: String,
    inputs: Seq[(String, DataType)],
    outputs: Seq[(String, DataType)],
    options: Map[String, String],
    comment: Option[String] = None,
    temporary: Boolean = false) {

  /** The factory identifier, like a table's 'connector' option
    * (reference: ModelProviderFactory.factoryIdentifier). */
  def provider: String = options.getOrElse("provider",
    throw new IllegalArgumentException(
      s"model $name has no 'provider' option"))
}

/** Factory SPI mirroring the reference's `ModelProviderFactory`
  * (flink-table-common/…/factories/ModelProviderFactory.java): a
  * `'provider'='<identifier>'` option picks the factory, which builds a
  * provider from the model's WITH options bound to concrete feature
  * columns. Register custom factories via [[ModelFactories.register]].
  */
trait ModelProviderFactory extends Serializable {
  def identifier: String
  def create(spec: ModelSpec, features: Seq[String]): ModelProvider
}

/** Built-in factories + registry. */
object ModelFactories {

  /** `'provider'='openai'` — the reference's OpenAI-compatible provider
    * (flink-model-openai/…/OpenAIModelProviderFactory.java:31): the
    * endpoint suffix picks chat vs embedding, exactly as the reference
    * dispatches on ENDPOINT_SUFFIX. Option keys follow OpenAIOptions.java:
    * `endpoint`, `model`, `api-key`, `system-prompt`, `temperature`,
    * `max-tokens`, `dimension`, `retry-num`. */
  private object OpenAIFactory extends ModelProviderFactory {
    override def identifier: String = "openai"

    override def create(spec: ModelSpec, features: Seq[String]): ModelProvider = {
      require(features.size == 1,
        s"openai models take exactly one feature column, got $features")
      val o = spec.options
      val endpoint = o.getOrElse("endpoint", throw new IllegalArgumentException(
        s"model ${spec.name}: 'endpoint' is required")).replaceAll("/*$", "")
      val cfg = OpenAIConfig(
        endpoint = endpoint,
        model = o.getOrElse("model", throw new IllegalArgumentException(
          s"model ${spec.name}: 'model' is required")),
        apiKey = o.getOrElse("api-key", ""),
        systemPrompt = o.getOrElse("system-prompt",
          "You are a helpful assistant."),
        temperature = o.get("temperature").map(_.toDouble),
        maxTokens = o.get("max-tokens").map(_.toLong),
        dimensions = o.get("dimension").map(_.toLong),
        maxRetries = o.get("retry-num").map(_.toInt).getOrElse(2))
      val lower = endpoint.toLowerCase
      if (lower.endsWith("/embeddings"))
        new OpenAIEmbeddingModel(cfg, features.head,
          outputCol = spec.outputs.headOption.map(_._1).getOrElse("embedding"))
      else if (lower.endsWith("/chat/completions"))
        new OpenAIChatModel(cfg, features.head,
          outputCol = spec.outputs.headOption.map(_._1).getOrElse("response"))
      else throw new UnsupportedOperationException(
        s"Unsupported endpoint: $endpoint (expect …/chat/completions " +
          "or …/embeddings)")
    }
  }

  /** `'provider'='hash-score'` — the deterministic scoring provider
    * (oracle-expressible; see [[HashScoreModel]]). */
  private object HashScoreFactory extends ModelProviderFactory {
    override def identifier: String = "hash-score"
    override def create(spec: ModelSpec, features: Seq[String]): ModelProvider = {
      require(features.size == 1,
        s"hash-score takes exactly one feature column, got $features")
      new HashScoreModel(features.head)
    }
  }

  /** `'10s' | '1500ms' | '2min' | '500'`-style duration → millis (the
    * reference's Duration-typed options accept the same spellings). */
  private def durationMs(s: String): Long = {
    val t = s.trim.toLowerCase
    if (t.endsWith("ms")) t.dropRight(2).trim.toLong
    else if (t.endsWith("min")) t.dropRight(3).trim.toLong * 60000L
    else if (t.endsWith("s")) t.dropRight(1).trim.toLong * 1000L
    else t.toLong
  }

  /** `'provider'='triton'` — the Triton Inference Server provider
    * (flink-model-triton/…/TritonModelProviderFactory.java:99; option
    * keys follow TritonOptions.java: `endpoint`, `model-name`,
    * `model-version`, `timeout`, `auth-token`, `custom-headers`
    * (`k1:v1;k2:v2`), `max-retries`, `retry-initial-backoff`,
    * `retry-max-backoff`, `default-value` (JSON),
    * `circuit-breaker-enabled` / `-failure-threshold` / `-timeout` /
    * `-half-open-requests`). The request/response tensor names come from
    * `input-name` / `output-name`, defaulting to the model DDL's INPUT /
    * OUTPUT column names; the OUTPUT type picks the Spark-side landing
    * type (ARRAY<FLOAT> by default). */
  private object TritonFactory extends ModelProviderFactory {
    override def identifier: String = "triton"

    override def create(spec: ModelSpec, features: Seq[String]): ModelProvider = {
      require(features.size == 1,
        s"triton models take exactly one feature column, got $features")
      val o = spec.options
      def req(k: String): String = o.getOrElse(k,
        throw new IllegalArgumentException(
          s"model ${spec.name}: '$k' is required"))
      val headers = o.get("custom-headers").map(_.split(";").iterator
        .map(_.trim).filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf(':')
          require(i > 0, s"malformed custom-headers entry '$kv' (want k:v)")
          kv.substring(0, i).trim -> kv.substring(i + 1).trim
        }.toMap).getOrElse(Map.empty[String, String])
      val cfg = TritonConfig(
        endpoint = req("endpoint").replaceAll("/*$", ""),
        modelName = req("model-name"),
        modelVersion = o.getOrElse("model-version", "latest"),
        inputName = o.getOrElse("input-name",
          spec.inputs.headOption.map(_._1).getOrElse("input")),
        outputName = o.getOrElse("output-name",
          spec.outputs.headOption.map(_._1).getOrElse("")),
        authToken = o.getOrElse("auth-token", ""),
        customHeaders = headers,
        requestTimeoutMs = o.get("timeout").map(durationMs).getOrElse(30000L),
        maxRetries = o.get("max-retries").map(_.toInt).getOrElse(0),
        retryInitialBackoffMs =
          o.get("retry-initial-backoff").map(durationMs).getOrElse(100L),
        retryMaxBackoffMs =
          o.get("retry-max-backoff").map(durationMs).getOrElse(10000L),
        defaultValue = o.get("default-value"),
        breakerEnabled =
          o.get("circuit-breaker-enabled").exists(_.toBoolean),
        breakerFailureThreshold = o.get("circuit-breaker-failure-threshold")
          .map(_.toDouble).getOrElse(0.5),
        breakerMinRequests = o.get("circuit-breaker-min-requests")
          .map(_.toInt).getOrElse(10),
        breakerOpenMs =
          o.get("circuit-breaker-timeout").map(durationMs).getOrElse(60000L),
        breakerHalfOpenRequests = o.get("circuit-breaker-half-open-requests")
          .map(_.toInt).getOrElse(3))
      new TritonModel(cfg, features.head,
        outputCol = spec.outputs.headOption.map(_._1).getOrElse("output"),
        outputType = spec.outputs.headOption.map(_._2)
          .getOrElse(ArrayType(FloatType)))
    }
  }

  private val reg =
    scala.collection.concurrent.TrieMap[String, ModelProviderFactory](
      OpenAIFactory.identifier -> OpenAIFactory,
      HashScoreFactory.identifier -> HashScoreFactory,
      TritonFactory.identifier -> TritonFactory)

  def register(factory: ModelProviderFactory): Unit =
    reg(factory.identifier) = factory

  def create(spec: ModelSpec, features: Seq[String]): ModelProvider = {
    if (spec.inputs.nonEmpty)
      require(features.size == spec.inputs.size,
        s"model ${spec.name} declares ${spec.inputs.size} INPUT column(s) " +
          s"but is invoked with ${features.size} feature(s): $features")
    reg.getOrElse(spec.provider, throw new IllegalArgumentException(
      s"unknown model provider '${spec.provider}'; registered: " +
        reg.keys.toSeq.sorted.mkString(", "))).create(spec, features)
  }
}

/** A DDL-declared model flowing through the `Map[String, ModelProvider]`
  * plumbing: stays unbound until ML_PREDICT supplies its DESCRIPTOR
  * column(s) ([[bind]]); used directly (programmatic MLPredict), it binds
  * to the spec's declared INPUT columns. */
final class UnboundModel(val spec: ModelSpec) extends ModelProvider {

  def bind(features: Seq[String]): ModelProvider =
    ModelFactories.create(spec, features)

  private lazy val default: ModelProvider = {
    require(spec.inputs.nonEmpty,
      s"model ${spec.name} has no declared INPUT columns — invoke it " +
        "through ML_PREDICT(…, DESCRIPTOR(col)) to name the feature")
    bind(spec.inputs.map(_._1))
  }

  override def name: String = s"model:${spec.name}"
  override def outputSchema: StructType = default.outputSchema
  override def predictBatch(rows: Seq[Row]): Seq[Row] =
    default.predictBatch(rows)
  override def open(): Unit = default.open()
  override def close(): Unit = default.close()
}
