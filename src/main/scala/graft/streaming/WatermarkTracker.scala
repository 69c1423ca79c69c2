package graft.streaming

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.time.Instant
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/** CURRENT_WATERMARK introspection (reference: the CURRENT_WATERMARK
  * temporal function in BuiltInFunctionDefinitions.java — returns the
  * operator's current event-time watermark).
  *
  * Spark exposes watermarks only through query progress, so graft tracks
  * them with a [[StreamingQueryListener]]: one listener per session keeps
  * the latest observed watermark per running query. [[currentWatermark]]
  * returns it as a literal Column — evaluated on the DRIVER at call time,
  * so the idiomatic use is inside `foreachBatch` (per-micro-batch
  * constant, which is exactly the watermark's granularity in micro-batch
  * execution; a per-ROW watermark read would be meaningless here).
  */
object WatermarkTracker {

  private val byQuery = new ConcurrentHashMap[UUID, Long]()
  private val sessions =
    java.util.Collections.synchronizedSet(new java.util.HashSet[Int]())

  /** Idempotently attach the tracking listener to a session. */
  def register(spark: SparkSession): Unit = {
    if (sessions.add(System.identityHashCode(spark))) {
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit =
          byQuery.remove(e.id)
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val wm = e.progress.eventTime.get("watermark")
          if (wm != null)
            byQuery.put(e.progress.id, Instant.parse(wm).toEpochMilli)
        }
      })
    }
  }

  /** Latest observed watermark of one query. */
  def watermarkMs(queryId: UUID): Option[Long] = Option(byQuery.get(queryId))

  /** Latest observed watermark across all tracked queries (None until a
    * first watermark is emitted). */
  def latestWatermarkMs(): Option[Long] = {
    val it = byQuery.values().iterator()
    var best = Long.MinValue
    while (it.hasNext) best = math.max(best, it.next())
    if (best == Long.MinValue) None else Some(best)
  }

  /** CURRENT_WATERMARK as a Column (driver-evaluated at call time; null
    * before any watermark exists — same contract as the reference, which
    * returns NULL when no watermark has been emitted yet). */
  def currentWatermark(): Column =
    latestWatermarkMs()
      .map(ms => timestamp_millis(lit(ms)))
      .getOrElse(lit(null).cast("timestamp"))
}
