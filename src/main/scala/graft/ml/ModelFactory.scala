package graft.ml

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DataType, StructType}

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

  private val reg =
    scala.collection.concurrent.TrieMap[String, ModelProviderFactory](
      OpenAIFactory.identifier -> OpenAIFactory,
      HashScoreFactory.identifier -> HashScoreFactory)

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
