package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time window assigners over an exact epoch-nanos column.
  *
  * Re-expresses the reference's TVF window semantics
  * (flink-table-runtime/…/operators/window/tvf/slicing/SliceAssigners.java:
  * 67=tumbling, 83=hopping, 100=cumulative) for batch. Streaming variants
  * use Spark's native `window`/`session_window` (graft.streaming); these
  * nanos forms exist because the test events carry TIMESTAMP(NANOS) which
  * Spark timestamps cannot represent exactly.
  *
  * All assigners are pure projections (explode for the multi-assign cases) —
  * no shuffle is introduced before the downstream aggregation, so the plan
  * at scale is scan → project/explode → partial agg → shuffle → final agg.
  */
object Windows {

  // NOTE: all arithmetic below stays in exact LongType (`%`), never double —
  // epoch nanos (~1.7e18) exceed double's 2^53 integer range.

  /** Tumbling window start: one window per row. */
  def tumbleStart(tsNs: Column, sizeNs: Long): Column =
    tsNs - (tsNs % lit(sizeNs))

  /** Hopping (sliding) windows: every window start s ≡ 0 (mod slide) with
    * s <= t < s + size. Emits one row per covering window. Unlike the r1
    * version, `size` need NOT be a multiple of `slide` (the reference's
    * HoppingSliceAssigner has no such restriction): the first covering
    * start is the smallest slide-multiple strictly greater than t - size.
    * Assumes positive epoch values (true for any real event time).
    */
  def hopStarts(tsNs: Column, sizeNs: Long, slideNs: Long): Column = {
    val latest = tsNs - (tsNs % lit(slideNs))
    val first =
      tsNs - lit(sizeNs) - ((tsNs - lit(sizeNs)) % lit(slideNs)) + lit(slideNs)
    sequence(first, latest, lit(slideNs))
  }

  /** Cumulative (CUMULATE) windows: fixed start at the `maxSize` boundary,
    * end expanding by `step`; a row belongs to every window whose end > t.
    * Returns the array of window ends; the shared start is [[tumbleStart]]
    * with `maxSizeNs`.
    */
  def cumulateEnds(tsNs: Column, maxSizeNs: Long, stepNs: Long): Column = {
    require(maxSizeNs % stepNs == 0, "maxSize must be a multiple of step")
    val sinceStep = tsNs % lit(stepNs)
    val firstEnd = tsNs - sinceStep + lit(stepNs)
    sequence(firstEnd, tumbleStart(tsNs, maxSizeNs) + lit(maxSizeNs), lit(stepNs))
  }

  /** Tumble-assign + group helper: adds `window_start` (epoch nanos). */
  def withTumble(df: DataFrame, tsNsCol: String, sizeNs: Long): DataFrame =
    df.withColumn("window_start", tumbleStart(col(tsNsCol), sizeNs))

  /** Hop-assign: one output row per (row, covering window). */
  def withHops(df: DataFrame, tsNsCol: String, sizeNs: Long, slideNs: Long): DataFrame =
    df.withColumn(
        "window_start",
        explode(hopStarts(col(tsNsCol), sizeNs, slideNs)))

  /** Cumulate-assign: one output row per (row, expanding window end). */
  def withCumulate(df: DataFrame, tsNsCol: String, maxSizeNs: Long, stepNs: Long): DataFrame =
    df.withColumn("window_start", tumbleStart(col(tsNsCol), maxSizeNs))
      .withColumn(
        "window_end",
        explode(cumulateEnds(col(tsNsCol), maxSizeNs, stepNs)))
}
