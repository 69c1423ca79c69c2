package graft.ml

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Triton Inference Server provider for ML_PREDICT — the second real
  * network-backed provider family the reference ships
  * (flink-models/flink-model-triton/…/TritonInferenceModelFunction.java:67,
  * factory TritonModelProviderFactory.java, options TritonOptions.java),
  * re-expressed over the [[ModelProvider]] SPI.
  *
  * Wire protocol: the KServe/Triton v2 REST inference API (public spec —
  * POST `{endpoint}/v2/models/{name}[/versions/{v}]/infer` with
  * `{"inputs":[{"name",…,"datatype","shape":[batch,…],"data":[flat]}]}`,
  * response `{"outputs":[{…,"shape","data"}]}`). Unlike the chat API, the
  * protocol is batch-native: the whole micro-batch goes out as ONE request
  * with a leading batch dimension — `MLPredict(batchSize = n)` feeds
  * Triton's dynamic batcher exactly like the reference does.
  *
  * Resilience mirrors the reference feature set:
  *  - retry with exponential backoff on IOException / 5xx
  *    (TritonOptions `max-retries`, `retry-initial-backoff`,
  *    `retry-max-backoff`); other 4xx fail fast — a bad shape or model
  *    name never heals (AbstractTritonModelFunction.java:470);
  *  - an optional per-partition three-state circuit breaker
  *    (TritonCircuitBreaker.java:68 — CLOSED tracks the failure rate,
  *    OPEN fails fast for a cool-off measured on nanoTime so wall-clock
  *    jumps can't wedge it, HALF_OPEN lets a few probes through);
  *  - an optional `default-value` JSON fallback returned when a request
  *    ultimately fails (TritonDefaultValueFallbackTest.java) so one dead
  *    endpoint degrades instead of failing the stage.
  *
  * Scale: one HTTP client per partition (`open()`), no cross-partition
  * state, responses sized `batch × dim` — the operator scales linearly
  * with partition count like every other MLPredict provider.
  */
final case class TritonConfig(
    endpoint: String,
    modelName: String,
    modelVersion: String = "latest", // "latest" → no /versions/ segment
    inputName: String = "input",
    outputName: String = "", // empty → first output tensor in the response
    authToken: String = "",
    customHeaders: Map[String, String] = Map.empty,
    requestTimeoutMs: Long = 30000,
    maxRetries: Int = 0,
    retryInitialBackoffMs: Long = 100,
    retryMaxBackoffMs: Long = 10000,
    defaultValue: Option[String] = None,
    breakerEnabled: Boolean = false,
    breakerFailureThreshold: Double = 0.5,
    breakerMinRequests: Int = 10,
    breakerOpenMs: Long = 60000,
    breakerHalfOpenRequests: Int = 3)

/** Minimal three-state breaker (reference: TritonCircuitBreaker.java:68).
  * Per-provider-instance (= per partition), so no cross-task coordination
  * is needed — the same scope as the reference's per-subtask breaker. */
private[ml] final class CircuitBreaker(cfg: TritonConfig) {
  private var state: Int = 0 // 0 CLOSED, 1 OPEN, 2 HALF_OPEN
  private var requests = 0
  private var failures = 0
  private var halfOpenOk = 0
  private var openedAtNanos = 0L

  /** True when the call may proceed; false → fail fast (or fallback). */
  def allow(): Boolean = synchronized {
    if (!cfg.breakerEnabled) return true
    state match {
      case 0 => true
      case 1 =>
        if (System.nanoTime() - openedAtNanos >= cfg.breakerOpenMs * 1000000L) {
          state = 2; halfOpenOk = 0; true
        } else false
      case _ => true
    }
  }

  def onSuccess(): Unit = synchronized {
    if (!cfg.breakerEnabled) return
    state match {
      case 2 =>
        halfOpenOk += 1
        if (halfOpenOk >= cfg.breakerHalfOpenRequests) {
          state = 0; requests = 0; failures = 0
        }
      case _ =>
        requests += 1
        // decay so one old burst of failures can't trip a healthy breaker
        if (requests > 10000) { requests /= 2; failures /= 2 }
    }
  }

  def onFailure(): Unit = synchronized {
    if (!cfg.breakerEnabled) return
    state match {
      case 2 => trip() // any half-open failure re-opens
      case _ =>
        requests += 1; failures += 1
        if (requests >= cfg.breakerMinRequests &&
            failures.toDouble / requests >= cfg.breakerFailureThreshold)
          trip()
    }
  }

  private def trip(): Unit = {
    state = 1
    openedAtNanos = System.nanoTime()
    requests = 0; failures = 0
  }

  def isOpen: Boolean = synchronized { state == 1 }
}

/** Thrown when the breaker is OPEN and no default value is configured
  * (reference: exception/TritonCircuitBreakerOpenException.java). */
final class CircuitBreakerOpenException(msg: String)
    extends RuntimeException(msg)

/** Generic tensor in / tensor out inference over one feature column.
  *
  * Input datatype is derived from the column's runtime value (the
  * reference's TritonTypeMapper.java:316 role): numeric arrays → FP32
  * `[batch, dim]`, numeric scalars → FP32/INT32/INT64 `[batch, 1]`,
  * strings → BYTES `[batch, 1]`. `outputType` (the model DDL's OUTPUT
  * type) picks how the response tensor lands per row: ARRAY<FLOAT> takes
  * the row's slice, scalar types take its first element.
  */
class TritonModel(
    cfg: TritonConfig,
    inputCol: String,
    outputCol: String = "output",
    outputType: DataType = ArrayType(FloatType)) extends ModelProvider {

  override def name: String = s"triton:${cfg.modelName}"

  override val outputSchema: StructType = StructType(Seq(
    StructField(outputCol, outputType, nullable = true)))

  @transient private var client: java.net.http.HttpClient = _
  @transient private var breaker: CircuitBreaker = _

  override def open(): Unit = {
    client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(cfg.requestTimeoutMs))
      .build()
    breaker = new CircuitBreaker(cfg)
  }

  override def close(): Unit = { client = null; breaker = null }

  /** `/v2/models/{name}[/versions/{v}]/infer` (KServe v2 path; reference
    * normalizes the same way in TritonUtils.buildInferenceUrl). */
  def url: String = {
    val base = cfg.endpoint.stripSuffix("/")
    val version =
      if (cfg.modelVersion.isEmpty || cfg.modelVersion == "latest") ""
      else s"/versions/${cfg.modelVersion}"
    s"$base/v2/models/${cfg.modelName}$version/infer"
  }

  override def predictBatch(rows: Seq[Row]): Seq[Row] = {
    if (rows.isEmpty) return Nil
    if (!breaker.allow()) return fallbackOr(rows, new CircuitBreakerOpenException(
      s"circuit breaker OPEN for ${cfg.modelName} — failing fast"))
    val idx = rows.head.fieldIndex(inputCol)
    val body = buildRequest(rows, idx)
    try {
      val resp = postWithRetry(body)
      breaker.onSuccess()
      parseResponse(resp, rows.length)
    } catch {
      case e: IllegalStateException => throw e // deterministic 4xx: no mask
      case scala.util.control.NonFatal(e) =>
        breaker.onFailure()
        fallbackOr(rows, e)
    }
  }

  private def fallbackOr(rows: Seq[Row], e: Throwable): Seq[Row] =
    cfg.defaultValue match {
      case Some(json) =>
        val v = parseDefault(json)
        rows.map(_ => Row(v))
      case None => throw e
    }

  private def parseDefault(json: String): Any =
    jsonToSpark(JsonMethods.parse(json), outputType)

  private def jsonToSpark(j: JValue, t: DataType): Any = (j, t) match {
    case (JArray(vs), ArrayType(et, _)) =>
      val items = vs.map(v => jsonToSpark(v, et))
      et match { // element-typed arrays, as the row encoder expects
        case FloatType => items.map(_.asInstanceOf[Float]).toArray
        case DoubleType => items.map(_.asInstanceOf[Double]).toArray
        case IntegerType => items.map(_.asInstanceOf[Int]).toArray
        case LongType => items.map(_.asInstanceOf[Long]).toArray
        case _ => items.toArray
      }
    case (JNull, _) => null
    case (v, FloatType) => num(v).toFloat
    case (v, DoubleType) => num(v)
    case (v, IntegerType) => num(v).toInt
    case (v, LongType) => num(v).toLong
    case (JString(s), StringType) => s
    case (v, StringType) => JsonMethods.compact(JsonMethods.render(v))
    case (v, other) => throw new IllegalArgumentException(
      s"cannot read default value $v as $other")
  }

  private def num(j: JValue): Double = j match {
    case JDouble(d) => d
    case JInt(n) => n.toDouble
    case JLong(n) => n.toDouble
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalStateException(s"non-numeric $other")
  }

  // ------------------------------------------------------------- request

  /** One KServe v2 request for the whole micro-batch. */
  private[ml] def buildRequest(rows: Seq[Row], idx: Int): JValue = {
    val sample = rows.iterator.map(_.get(idx)).find(_ != null).getOrElse(
      throw new IllegalArgumentException(
        s"ML_PREDICT input column $inputCol is null for the whole batch"))
    val (datatype, dim, data): (String, Int, List[JValue]) = sample match {
      case _: scala.collection.Seq[_] | _: Array[_] =>
        val vecs = rows.map { r =>
          val v = r.get(idx)
          val s: Seq[Any] = v match {
            case null => null
            case a: Array[_] => a.toSeq
            case s: scala.collection.Seq[_] => s.toSeq
          }
          s
        }
        val d = vecs.find(_ != null).get.length
        vecs.foreach(v => require(v == null || v.length == d,
          s"ragged input tensor: expected dim $d"))
        ("FP32", d, vecs.flatMap { v =>
          // nulls can't be encoded in a dense tensor — zero-fill the row
          val s = if (v == null) Seq.fill[Any](d)(0.0f) else v
          s.map(x => JDouble(x.asInstanceOf[Number].doubleValue()))
        }.toList)
      case _: java.lang.Integer =>
        ("INT32", 1, rows.map(r =>
          if (r.isNullAt(idx)) JInt(0) else JInt(r.getInt(idx))).toList)
      case _: java.lang.Long =>
        ("INT64", 1, rows.map(r =>
          if (r.isNullAt(idx)) JLong(0L) else JLong(r.getLong(idx))).toList)
      case _: java.lang.Float | _: java.lang.Double =>
        ("FP32", 1, rows.map(r => JDouble(
          if (r.isNullAt(idx)) 0.0
          else r.get(idx).asInstanceOf[Number].doubleValue())).toList)
      case _: String =>
        ("BYTES", 1, rows.map(r =>
          JString(if (r.isNullAt(idx)) "" else r.getString(idx))).toList)
      case other => throw new IllegalArgumentException(
        s"unsupported ML_PREDICT input type ${other.getClass.getName} " +
          "for a Triton tensor (numeric array, numeric scalar, or string)")
    }
    JObject(List(
      "inputs" -> JArray(List(JObject(List(
        "name" -> JString(cfg.inputName),
        "datatype" -> JString(datatype),
        "shape" -> JArray(List(JInt(rows.length), JInt(dim))),
        "data" -> JArray(data)))))))
  }

  // ------------------------------------------------------------ response

  /** Slice the response tensor back into one value per input row. */
  private[ml] def parseResponse(resp: JValue, batch: Int): Seq[Row] = {
    val outputs = resp \ "outputs" match {
      case JArray(os) => os
      case other => throw new IllegalStateException(
        s"inference response has no outputs array: $other")
    }
    val out = (if (cfg.outputName.isEmpty) outputs.headOption
    else outputs.find(o => (o \ "name") == JString(cfg.outputName)))
      .getOrElse(throw new IllegalStateException(
        s"response lacks output tensor '${cfg.outputName}' " +
          s"(present: ${outputs.map(o => o \ "name").mkString(", ")})"))
    val shape = out \ "shape" match {
      case JArray(dims) => dims.map(d => num(d).toInt)
      case _ => Nil
    }
    require(shape.headOption.contains(batch),
      s"response shape $shape does not lead with batch size $batch")
    val per = shape.drop(1).product max 1
    val data = out \ "data" match {
      case JArray(vs) => vs
      case other => throw new IllegalStateException(s"no data array: $other")
    }
    require(data.length == batch * per,
      s"response data has ${data.length} elements for shape $shape")
    (0 until batch).map { i =>
      val slice = data.slice(i * per, (i + 1) * per)
      val v: Any = outputType match {
        case ArrayType(FloatType, _) => slice.map(x => num(x).toFloat).toArray
        case ArrayType(DoubleType, _) => slice.map(num).toArray
        case FloatType => num(slice.head).toFloat
        case DoubleType => num(slice.head)
        case IntegerType => num(slice.head).toInt
        case LongType => num(slice.head).toLong
        case StringType => slice.head match {
          case JString(s) => s
          case other => JsonMethods.compact(JsonMethods.render(other))
        }
        case other => throw new IllegalArgumentException(
          s"unsupported Triton OUTPUT type $other")
      }
      Row(v)
    }
  }

  // ----------------------------------------------------------- transport

  /** POST with exponential backoff; IOException/5xx retry, 429 retries
    * too (throttling), other 4xx throw IllegalStateException (fail fast,
    * never masked by the default value — a deterministic client bug). */
  private def postWithRetry(body: JValue): JValue = {
    val payload = JsonMethods.compact(JsonMethods.render(body))
    var attempt = 0
    var backoff = cfg.retryInitialBackoffMs
    var lastErr: Throwable = null
    while (attempt <= cfg.maxRetries) {
      if (attempt > 0) {
        Thread.sleep(backoff)
        backoff = (backoff * 2) min cfg.retryMaxBackoffMs
      }
      try {
        val b = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(cfg.requestTimeoutMs))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
        if (cfg.authToken.nonEmpty)
          b.header("Authorization", s"Bearer ${cfg.authToken}")
        cfg.customHeaders.foreach { case (k, v) => b.header(k, v) }
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
}
