package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time / watermark helpers — the unified batch/stream entry point
  * (reference: StreamExecWatermarkAssigner.java:62,
  * RT/operators/wmassigners/WatermarkAssignerOperator.java:42; watermark
  * strategies flink-core/…/api/common/eventtime/).
  *
  * The reference's 2.x direction (and ours): one declaration works on both
  * a bounded table and a stream. On a streaming DataFrame these helpers
  * assign a bounded-out-of-orderness watermark; on a batch DataFrame the
  * watermark is a no-op (batch is the watermark-at-infinity special case),
  * so every graft.streaming operator can be validated against its batch
  * oracle with the SAME code path.
  */
object EventTime {

  /** Assign a bounded-out-of-orderness watermark (streaming) / no-op
    * (batch). `delay` is a calendar-interval string, e.g. "10 seconds". */
  def withWatermark(df: DataFrame, tsCol: String, delay: String): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, delay) else df

  /** Millis-since-epoch of a timestamp column (state-op arithmetic is done
    * in exact long millis, never double). */
  def epochMs(c: Column): Column = (unix_micros(c) / lit(1000L)).cast("long")

  /** Tumbling window start in epoch millis. */
  def windowStartMs(tsMs: Long, sizeMs: Long): Long = tsMs - (tsMs % sizeMs)
}
