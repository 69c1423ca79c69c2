package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked event-time window aggregations — the streaming face of the
  * TVF window tier (reference: StreamExecWindowAggregate.java:92; slice
  * assigners RT/operators/window/tvf/slicing/SliceAssigners.java:67,83,100;
  * session merging …/tvf/unslicing/UnsliceAssigners.java).
  *
  * Tumble/hop/session map directly onto Spark's native `window` /
  * `session_window` streaming aggregates (watermark-driven state cleanup,
  * append-mode emission at window close — the reference's default
  * emit-on-watermark behavior). CUMULATE has no Spark native form; it is
  * re-expressed as the slice-explode rewrite (SURVEY §7.1): each row is
  * assigned to every expanding window end, then a plain windowed-agg per
  * (start, end) pair. The explode happens before the shuffle, so partial
  * aggregation still applies — the 100 TB plan is scan → explode(≤
  * maxSize/step) → partial agg → shuffle → final agg.
  *
  * Semantic deltas vs the reference (documented, by design): late data is
  * dropped (no side output), no custom triggers/evictors, allowedLateness
  * is expressed through the watermark delay only.
  *
  * All helpers run unchanged on batch DataFrames (watermark no-ops) — the
  * batch results are the DuckDB-oracle-checked ones.
  */
object StreamingWindows {

  /** Tumbling window aggregate. */
  def tumble(
      df: DataFrame,
      tsCol: String,
      size: String,
      delay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    EventTime.withWatermark(df, tsCol, delay)
      .groupBy(window(col(tsCol), size) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Hopping (sliding) window aggregate. */
  def hop(
      df: DataFrame,
      tsCol: String,
      size: String,
      slide: String,
      delay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    EventTime.withWatermark(df, tsCol, delay)
      .groupBy(window(col(tsCol), size, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session window aggregate (gap-merged). */
  def session(
      df: DataFrame,
      tsCol: String,
      gap: String,
      delay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    EventTime.withWatermark(df, tsCol, delay)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** CUMULATE window aggregate via slice-explode: emits one row per
    * (shared window start, expanding end) per key. `maxSize` must be a
    * multiple of `step` (same restriction as the reference's
    * CumulativeSliceAssigner).
    *
    * Streaming caveat: the grouping keys are derived window bounds, not a
    * native `window()` column, so Spark plans this as an UPDATE-mode
    * aggregation (rows re-emitted as slices accumulate — which IS the
    * reference's CUMULATE emission pattern) and state is not
    * watermark-evicted. At scale, run the slice agg streaming and fold
    * slices into cumulative windows downstream (changelog tier), or bound
    * state with a state-TTL config. Batch mode is exact and oracle-checked.
    */
  def cumulate(
      df: DataFrame,
      tsCol: String,
      maxSizeMs: Long,
      stepMs: Long,
      delay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame = {
    require(maxSizeMs % stepMs == 0, "maxSize must be a multiple of step")
    val tsMs = EventTime.epochMs(col(tsCol))
    val winStart = tsMs - (tsMs % lit(maxSizeMs))
    val firstEnd = tsMs - (tsMs % lit(stepMs)) + lit(stepMs)
    val ends = sequence(firstEnd, winStart + lit(maxSizeMs), lit(stepMs))
    EventTime.withWatermark(df, tsCol, delay)
      .withColumn("window_start", timestamp_millis(winStart))
      .withColumn("__end_ms", explode(ends))
      .withColumn("window_end", timestamp_millis(col("__end_ms")))
      .groupBy(col("window_start") +: col("window_end") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
