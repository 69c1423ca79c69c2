package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DataTypes, StructField, StructType}

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Model-inference operator: ML_PREDICT as a Spark-first table function
  * (reference: flink-table-planner/…/exec/stream/
  * StreamExecMLPredictTableFunction.java:55; provider SPI
  * flink-table-common/…/table/ml/ModelProvider.java:37).
  *
  * Execution shape: `mapPartitions` with a per-partition provider lifecycle
  * (open → batched predict → close) — the distributed analog of the
  * reference's per-subtask model client. Rows are fed in micro-batches so a
  * real provider can amortize an RPC/session per batch; no state crosses
  * partitions, so the operator scales linearly with partition count and
  * works identically on a 1000-executor cluster.
  *
  * The async variant mirrors AsyncScalarFunction/AsyncTableFunction
  * (flink-table-common/…/functions/AsyncScalarFunction.java:93): it keeps
  * `maxInFlight` batch futures open per partition and emits in submission
  * order (the reference's ORDERED async mode).
  */
trait ModelProvider extends Serializable {

  /** Model name (for logs/metrics). */
  def name: String

  /** Schema of the appended prediction columns. */
  def outputSchema: StructType

  /** Score one micro-batch; must return one output Row of `outputSchema`
    * per input Row, in order. */
  def predictBatch(rows: Seq[Row]): Seq[Row]

  /** Per-partition setup (connect client, load session). */
  def open(): Unit = ()

  /** Per-partition teardown. */
  def close(): Unit = ()
}

object MLPredict {

  private def appended(
      df: DataFrame,
      p: ModelProvider,
      forceNullable: Boolean = false): StructType = {
    // under the Nulls timeout policy the appended columns can legitimately
    // be null even if the provider declares them non-nullable — keep the
    // declared nullability honest or the row encoder rejects the fallback
    // rows (ADVICE r3)
    val extra =
      if (forceNullable) p.outputSchema.fields.map(_.copy(nullable = true))
      else p.outputSchema.fields
    StructType(df.schema.fields ++ extra)
  }

  /** Append `provider`'s prediction columns to every row. */
  def apply(df: DataFrame, provider: ModelProvider, batchSize: Int = 64): DataFrame = {
    val outSchema = appended(df, provider)
    df.mapPartitions { it =>
      provider.open()
      val out = it.grouped(batchSize).flatMap { batch =>
        val preds = provider.predictBatch(batch)
        batch.lazyZip(preds).map((r, p) =>
          Row.fromSeq(r.toSeq ++ p.toSeq))
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) provider.close(); h }
        def next(): Row = out.next()
      }
    }(Encoders.row(outSchema))
  }

  /** Async variant: up to `maxInFlight` batches scored concurrently per
    * partition, results emitted in submission order. A batch exceeding
    * `timeoutMs` fails the task ([[graft.operators.AsyncWait.Fail]]) or
    * emits null predictions ([[graft.operators.AsyncWait.Nulls]]). */
  def async(
      df: DataFrame,
      provider: ModelProvider,
      batchSize: Int = 64,
      maxInFlight: Int = 4,
      timeoutMs: Long = graft.operators.AsyncWait.DefaultTimeoutMs,
      onTimeout: graft.operators.AsyncWait.Policy =
        graft.operators.AsyncWait.Fail,
      retry: graft.operators.AsyncWait.Retry =
        graft.operators.AsyncWait.NoRetry): DataFrame = {
    val outSchema = appended(df, provider,
      forceNullable = onTimeout == graft.operators.AsyncWait.Nulls)
    val nulls = provider.outputSchema.fields.map(_ => null).toSeq
    df.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      provider.open()
      val batches = it.grouped(batchSize)
      // Sliding window of in-flight futures: submit eagerly, await oldest.
      val inFlight = scala.collection.mutable.Queue
        .empty[(Seq[Row], Future[Seq[Row]], () => Future[Seq[Row]])]
      def submit(): Unit =
        while (inFlight.size < maxInFlight && batches.hasNext) {
          val batch = batches.next()
          def run(): Future[Seq[Row]] = Future {
            val preds = provider.predictBatch(batch)
            batch.lazyZip(preds).map((r, p) =>
              Row.fromSeq(r.toSeq ++ p.toSeq)).toSeq
          }
          inFlight.enqueue((batch, run(), () => run()))
        }
      new Iterator[Seq[Row]] {
        def hasNext: Boolean = {
          submit()
          val h = inFlight.nonEmpty
          if (!h) provider.close()
          h
        }
        def next(): Seq[Row] = {
          val (batch, fut, rerun) = inFlight.dequeue()
          graft.operators.AsyncWait.retrying(fut, rerun, retry, timeoutMs,
            onTimeout, batch.map(r => Row.fromSeq(r.toSeq ++ nulls)))
        }
      }.flatten
    }(Encoders.row(outSchema))
  }
}

/** Stub provider standing in for a real model endpoint (the container has
  * no model runtime): a deterministic integer-hash "score". The Spark-side
  * plumbing — partition lifecycle, batching, schema append — is the real
  * operator; only this arithmetic is fake.
  */
class HashScoreModel(inputCol: String) extends ModelProvider {
  override def name: String = "hash_score"

  override val outputSchema: StructType = StructType(Seq(
    StructField("score", DataTypes.DoubleType, nullable = false),
    StructField("pred_label", DataTypes.StringType, nullable = false)))

  override def predictBatch(rows: Seq[Row]): Seq[Row] = rows.map { r =>
    val v = r.getLong(r.fieldIndex(inputCol))
    val score = ((v * 2654435761L) % 1000L).toDouble / 1000.0
    Row(score, if (score >= 0.5) "high" else "low")
  }
}
