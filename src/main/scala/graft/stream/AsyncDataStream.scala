package graft.stream

import org.apache.spark.sql.Encoder

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit, TimeoutException}
import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

import graft.operators.AsyncWait

/** The reference's async I/O surface on the typed face
  * (flink-streaming-java/…/datastream/AsyncDataStream.java:115-307
  * unorderedWait / orderedWait / *WithRetry; AsyncFunction.java
  * asyncInvoke completing a ResultFuture with a COLLECTION of results,
  * and its `timeout(input, resultFuture)` hook).
  *
  * Per partition, up to `capacity` elements are in flight at once —
  * the reference's queue-capacity contract. `orderedWait` emits
  * results in input order; `unorderedWait` emits each element's
  * results as soon as they complete (watermark-order preservation is
  * moot here: Spark re-establishes event-time semantics at the next
  * watermarked operator, so unordered is pure completion order).
  *
  * The per-element timeout budget starts at SUBMISSION (the
  * reference's register-timer-on-entry), spans all retry attempts,
  * and on expiry calls `onTimeout` — default: fail the task, the
  * reference's AsyncFunction#timeout default (Spark's task retry
  * takes over); pass a fallback to emulate an overriding timeout()
  * that completes the future. Client FAILURES retry per the
  * [[graft.operators.AsyncWait.Retry]] schedule (the
  * AsyncRetryStrategies tier shared with AsyncCalc), each attempt
  * still bounded by the one element deadline.
  *
  * The DataFrame tier's equivalent is
  * [[graft.operators.AsyncCalc]] (StreamExecAsyncCalc); this face
  * exists so ported DataStream programs keep their shape.
  */
object AsyncDataStream {

  private val DefaultCapacity = 100

  private def defaultTimeout[T, U](t: T): Seq[U] =
    throw new TimeoutException(
      s"async element exceeded its timeout budget: $t (override " +
        "onTimeout to complete timed-out elements instead)")

  /** AsyncDataStream.java:165 `orderedWait`: results emit in input
    * order — an element's results wait for all earlier elements. */
  def orderedWait[T, U: Encoder](
      in: DataStream[T],
      asyncF: T => Future[Seq[U]],
      timeoutMs: Long,
      capacity: Int = DefaultCapacity,
      onTimeout: T => Seq[U] = (t: T) => defaultTimeout[T, U](t),
      retry: AsyncWait.Retry = AsyncWait.NoRetry): DataStream[U] = {
    require(timeoutMs > 0 && capacity >= 1, "timeoutMs > 0, capacity >= 1")
    val (f, toF, rt, cap, tms) = (asyncF, onTimeout, retry, capacity, timeoutMs)
    new DataStream(in.ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      // (element, future spanning retries, absolute deadline ns)
      val inFlight = mutable.Queue.empty[(T, Future[Seq[U]], Long)]
      def submit(): Unit =
        while (inFlight.size < cap && it.hasNext) {
          val t = it.next()
          inFlight.enqueue((t, attempt(f, t, rt.delaysMs), deadline(tms)))
        }
      new Iterator[Seq[U]] {
        def hasNext: Boolean = { submit(); inFlight.nonEmpty }
        def next(): Seq[U] = {
          val (t, fut, dl) = inFlight.dequeue()
          val waitMs = math.max(0L, (dl - System.nanoTime()) / 1000000L)
          try Await.result(fut, scala.concurrent.duration.Duration(
            waitMs, TimeUnit.MILLISECONDS))
          catch { case _: concurrent.TimeoutException => toF(t) }
        }
      }.flatten
    })
  }

  /** AsyncDataStream.java:115 `unorderedWait`: each element's results
    * emit as soon as its future completes, regardless of input order —
    * the lowest-latency mode. */
  def unorderedWait[T, U: Encoder](
      in: DataStream[T],
      asyncF: T => Future[Seq[U]],
      timeoutMs: Long,
      capacity: Int = DefaultCapacity,
      onTimeout: T => Seq[U] = (t: T) => defaultTimeout[T, U](t),
      retry: AsyncWait.Retry = AsyncWait.NoRetry): DataStream[U] = {
    require(timeoutMs > 0 && capacity >= 1, "timeoutMs > 0, capacity >= 1")
    val (f, toF, rt, cap, tms) = (asyncF, onTimeout, retry, capacity, timeoutMs)
    new DataStream(in.ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      val done = new LinkedBlockingQueue[(Long, Try[Seq[U]])]()
      val inFlight = mutable.LinkedHashMap.empty[Long, (T, Long)] // id → (elem, deadline ns)
      val timedOut = mutable.Set.empty[Long] // ids whose late results must drop
      var nextId = 0L
      def submit(): Unit =
        while (inFlight.size < cap && it.hasNext) {
          val t = it.next()
          val id = nextId; nextId += 1
          inFlight(id) = (t, deadline(tms))
          attempt(f, t, rt.delaysMs).onComplete(r => done.put((id, r)))
        }
      new Iterator[Seq[U]] {
        def hasNext: Boolean = { submit(); inFlight.nonEmpty }
        def next(): Seq[U] = {
          while (true) {
            // wait no longer than the earliest in-flight deadline, so an
            // overdue element surfaces even while others still run
            val now = System.nanoTime()
            val earliest = inFlight.valuesIterator.map(_._2).min
            val r = done.poll(math.max(0L, earliest - now),
              TimeUnit.NANOSECONDS)
            r match {
              case null => // an element crossed its deadline unfinished
                val overdue = System.nanoTime()
                val (id, (t, _)) = inFlight.minBy(_._2._2)
                if (inFlight(id)._2 <= overdue) {
                  inFlight.remove(id); timedOut += id
                  return toF(t)
                } // else a completion raced the poll; loop and drain it
              case (id, res) =>
                if (timedOut.remove(id)) () // late result of a timed-out element
                else {
                  inFlight.remove(id)
                  res match {
                    case Success(us) => return us
                    case Failure(e) => throw e
                  }
                }
            }
          }
          throw new IllegalStateException("unreachable")
        }
      }.flatten
    })
  }

  /** AsyncDataStream.java:277 `orderedWaitWithRetry` — [[orderedWait]]
    * with an explicit retry strategy (kept for signature parity). */
  def orderedWaitWithRetry[T, U: Encoder](
      in: DataStream[T], asyncF: T => Future[Seq[U]], timeoutMs: Long,
      capacity: Int, retry: AsyncWait.Retry): DataStream[U] =
    orderedWait(in, asyncF, timeoutMs, capacity, retry = retry)

  /** AsyncDataStream.java:217 `unorderedWaitWithRetry`. */
  def unorderedWaitWithRetry[T, U: Encoder](
      in: DataStream[T], asyncF: T => Future[Seq[U]], timeoutMs: Long,
      capacity: Int, retry: AsyncWait.Retry): DataStream[U] =
    unorderedWait(in, asyncF, timeoutMs, capacity, retry = retry)

  private def deadline(timeoutMs: Long): Long =
    System.nanoTime() + timeoutMs * 1000000L

  /** The element's future across its retry schedule: client failures
    * re-invoke after the scheduled delay (the delay sleeps on the
    * global pool — facade tier, not the hot path); the element's one
    * deadline still bounds the whole chain. */
  private def attempt[T, U](f: T => Future[Seq[U]], t: T,
      delays: Seq[Long])(implicit ec: ExecutionContext): Future[Seq[U]] =
    Future.unit.flatMap(_ => f(t)).recoverWith {
      case scala.util.control.NonFatal(_) if delays.nonEmpty =>
        Future { Thread.sleep(delays.head) }
          .flatMap(_ => attempt(f, t, delays.tail))
    }
}
