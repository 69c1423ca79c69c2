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
      onTimeout: AsyncWait.Policy = AsyncWait.Fail,
      retry: AsyncWait.Retry = AsyncWait.NoRetry): DataFrame = {
    // the Nulls policy emits null results on timeout, so the declared
    // output field must admit them regardless of what the caller passed
    val outF =
      if (onTimeout == AsyncWait.Nulls) outField.copy(nullable = true)
      else outField
    val outSchema = StructType(df.schema.fields :+ outF)
    df.mapPartitions { it =>
      AsyncWait.orderedBatched(it, batchSize, maxInFlight,
        run = _.map(r => Row.fromSeq(r.toSeq :+ f(r))),
        fallback = _.map(r => Row.fromSeq(r.toSeq :+ null)),
        timeoutMs, onTimeout, retry)
    }(Encoders.row(outSchema))
  }
}

/** Shared async wait-with-timeout for the async operator tier. */
object AsyncWait {
  val DefaultTimeoutMs = 30000L

  /** The shared bounded ORDERED async per-partition pipeline
    * ([[AsyncCalc]] and [[AsyncCorrelate]] differ only in the per-batch
    * expansion and the timeout fallback shape): keeps up to
    * `maxInFlight` batches of `batchSize` rows running while earlier
    * results emit in input order, each batch under the timeout policy
    * and retry schedule.
    */
  def orderedBatched(
      it: Iterator[Row],
      batchSize: Int,
      maxInFlight: Int,
      run: Seq[Row] => Seq[Row],
      fallback: Seq[Row] => Seq[Row],
      timeoutMs: Long,
      onTimeout: Policy,
      retry: Retry): Iterator[Row] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val batches = it.grouped(batchSize)
    val inFlight = scala.collection.mutable.Queue
      .empty[(Seq[Row], Future[Seq[Row]], () => Future[Seq[Row]])]
    def submit(): Unit =
      while (inFlight.size < maxInFlight && batches.hasNext) {
        val batch = batches.next()
        def go(): Future[Seq[Row]] = Future { run(batch) }
        inFlight.enqueue((batch, go(), () => go()))
      }
    new Iterator[Seq[Row]] {
      def hasNext: Boolean = { submit(); inFlight.nonEmpty }
      def next(): Seq[Row] = {
        val (batch, fut, rerun) = inFlight.dequeue()
        retrying(fut, rerun, retry, timeoutMs, onTimeout, fallback(batch))
      }
    }.flatten
  }

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

  /** Retry strategy for FAILED async attempts — the reference's
    * AsyncRetryStrategies tier (flink-runtime/…/streaming/util/retryable/
    * AsyncRetryStrategies.java: FixedDelayRetryStrategy,
    * ExponentialBackoffDelayRetryStrategy). Exceptions thrown by the
    * client are retried per the delay schedule then rethrown; TIMEOUTS
    * follow the timeout [[Policy]] per attempt and are never retried (a
    * hung endpoint should not multiply its own hang). */
  sealed trait Retry extends Serializable { def delaysMs: Seq[Long] }

  case object NoRetry extends Retry { val delaysMs: Seq[Long] = Nil }

  final case class FixedDelay(retries: Int, delayMs: Long) extends Retry {
    require(retries >= 1 && delayMs >= 0, "retries >= 1, delayMs >= 0")
    val delaysMs: Seq[Long] = Seq.fill(retries)(delayMs)
  }

  final case class ExpBackoff(
      retries: Int,
      initialMs: Long,
      multiplier: Double = 2.0,
      capMs: Long = 10000L) extends Retry {
    require(retries >= 1 && initialMs >= 1 && multiplier >= 1.0 &&
      capMs >= initialMs, "bad backoff parameters")
    val delaysMs: Seq[Long] =
      Iterator.iterate(initialMs.toDouble)(_ * multiplier)
        .take(retries).map(d => math.min(d.toLong, capMs)).toSeq
  }

  /** Await `first`; on client failure re-submit via `resubmit` per the
    * retry schedule. Each attempt gets the full `timeoutMs` budget. */
  def retrying[A](
      first: Future[A],
      resubmit: () => Future[A],
      retry: Retry,
      timeoutMs: Long,
      policy: Policy,
      fallback: => A): A = {
    var remaining = retry.delaysMs
    var fut = first
    while (true) {
      try return apply(fut, timeoutMs, policy, fallback)
      catch {
        case e: java.util.concurrent.TimeoutException => throw e
        case scala.util.control.NonFatal(e) =>
          if (remaining.isEmpty) throw e
          Thread.sleep(remaining.head)
          remaining = remaining.tail
          fut = resubmit()
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
