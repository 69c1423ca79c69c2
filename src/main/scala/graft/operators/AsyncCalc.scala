package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StructField, StructType}

import scala.concurrent.{Await, ExecutionContext, Future}

/** AsyncCalc: asynchronous scalar function invocation with bounded
  * in-flight work per partition and ORDERED emission — the reference's
  * async scalar tier (StreamExecAsyncCalc.java,
  * AsyncScalarFunction.java:93). Use for scalar functions that do I/O
  * (HTTP enrichment, KMS decrypt): the partition keeps `maxInFlight`
  * batches running while earlier results emit in input order.
  *
  * The function itself must be pure/deterministic per row for results to
  * be retry-safe (same contract as the reference).
  *
  * Timeout policy (the reference's AsyncScalarFunction carries a timeout +
  * failure strategy; VERDICT r2 #5): each batch waits at most `timeoutMs`;
  * `AsyncWait.Fail` fails the task (Spark retries it), `AsyncWait.Nulls`
  * emits the batch with a null result column — a hung endpoint can no
  * longer wedge the task forever.
  */
object AsyncCalc {

  def apply(
      df: DataFrame,
      f: Row => Any,
      outField: StructField,
      batchSize: Int = 64,
      maxInFlight: Int = 4,
      timeoutMs: Long = AsyncWait.DefaultTimeoutMs,
      onTimeout: AsyncWait.Policy = AsyncWait.Fail): DataFrame = {
    // the Nulls policy emits null results on timeout, so the declared
    // output field must admit them regardless of what the caller passed
    val outF =
      if (onTimeout == AsyncWait.Nulls) outField.copy(nullable = true)
      else outField
    val outSchema = StructType(df.schema.fields :+ outF)
    df.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      val batches = it.grouped(batchSize)
      val inFlight =
        scala.collection.mutable.Queue.empty[(Seq[Row], Future[Seq[Row]])]
      def submit(): Unit =
        while (inFlight.size < maxInFlight && batches.hasNext) {
          val batch = batches.next()
          inFlight.enqueue(batch -> Future {
            batch.map(r => Row.fromSeq(r.toSeq :+ f(r)))
          })
        }
      new Iterator[Seq[Row]] {
        def hasNext: Boolean = { submit(); inFlight.nonEmpty }
        def next(): Seq[Row] = {
          val (batch, fut) = inFlight.dequeue()
          AsyncWait(fut, timeoutMs, onTimeout,
            batch.map(r => Row.fromSeq(r.toSeq :+ null)))
        }
      }.flatten
    }(Encoders.row(outSchema))
  }
}

/** Shared async wait-with-timeout for the async operator tier. */
object AsyncWait {
  val DefaultTimeoutMs = 30000L

  sealed trait Policy extends Serializable
  /** Fail the task on timeout (Spark's retry machinery takes over). */
  case object Fail extends Policy
  /** Emit the timeout fallback (null-padded / miss-treated) and move on. */
  case object Nulls extends Policy

  def apply[A](
      fut: Future[A], timeoutMs: Long, policy: Policy, fallback: => A): A =
    try Await.result(fut, scala.concurrent.duration.Duration(
      timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
    catch {
      case _: concurrent.TimeoutException => policy match {
        case Fail => throw new java.util.concurrent.TimeoutException(
          s"async batch exceeded ${timeoutMs}ms (policy=Fail)")
        case Nulls => fallback
      }
    }
}
