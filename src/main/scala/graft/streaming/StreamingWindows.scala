package graft.streaming

import graft.changelog.AggSpec
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

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
  * dropped here (LateData adds side-output routing), allowedLateness is
  * expressed through the watermark delay, and firing is watermark-driven —
  * custom triggers/evictors live in [[TriggeredWindows]].
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

  /** Tumbling window aggregate with a start OFFSET (the reference's
    * `TUMBLE(…, offset)` / TumblingEventTimeWindows.of(size, offset)):
    * window boundaries shift by `offset` — e.g. size 10 min, offset 3 min
    * → windows [hh:03, hh:13), [hh:13, hh:23), … */
  def tumbleOffset(
      df: DataFrame,
      tsCol: String,
      size: String,
      offset: String,
      delay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    EventTime.withWatermark(df, tsCol, delay)
      .groupBy(window(col(tsCol), size, size, offset) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session window with a PER-ROW dynamic gap (the reference's
    * DynamicSessionWindows / SessionWindowTimeGapExtractor — gap computed
    * from each element): sessions are the interval-union islands of
    * `[ts, ts + gap(row))`. Maps onto Spark's native
    * `session_window(ts, gapExpr)` — watermark-evicted state in streaming,
    * exact islands semantics in batch. */
  def sessionDynamic(
      df: DataFrame,
      tsCol: String,
      gapExpr: Column,
      delay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    EventTime.withWatermark(df, tsCol, delay)
      .groupBy(session_window(col(tsCol), gapExpr) +: keys: _*)
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
    * watermark-evicted. [[cumulateBounded]] is the state-bounded streaming
    * form. Batch mode here is exact and oracle-checked.
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

  /** State-BOUNDED streaming CUMULATE (VERDICT r2 "what's wrong" #4 fix):
    *
    * phase 1 — native tumbling `window(step)` aggregate per key: Spark's
    * own watermark eviction, append-mode emission at slice close (the
    * reference's slice-shared machinery, SliceAssigners.java:100);
    * phase 2 — a keyed fold of closed slices into expanding windows
    * (`flatMapGroupsWithState`): state = ONE open cumulate window per key
    * (last emitted end + merged accumulators), an event-time timer at the
    * window close emits the trailing ends and DELETES the state.
    *
    * Emission matches the batch slice-explode form exactly: a cumulative
    * row for every step end from the first slice with data through the
    * window close, each covering all data at or before it.
    *
    * Supported aggregates: the mergeable AggSpec family (count/sum/min/
    * max) — the same restriction the reference's slice-sharing imposes.
    * Batch face: delegates to [[cumulate]].
    */
  def cumulateBounded(
      df: DataFrame,
      tsCol: String,
      maxSizeMs: Long,
      stepMs: Long,
      delay: String,
      keys: Seq[String],
      specs: Seq[AggSpec]): DataFrame = {
    require(maxSizeMs % stepMs == 0, "maxSize must be a multiple of step")

    def aggCol(s: AggSpec): Column = s.kind match {
      case "count" => count(lit(1)).as(s.outName)
      case "sum" => sum(col(s.inCol).cast("double")).as(s.outName)
      case "min" => min(col(s.inCol).cast("double")).as(s.outName)
      case "max" => max(col(s.inCol).cast("double")).as(s.outName)
    }

    if (!df.isStreaming)
      return cumulate(df, tsCol, maxSizeMs, stepMs, delay,
        keys.map(col), specs.map(aggCol))

    // phase 1: closed slices via the native tumble path. `window_time()`
    // derives an event-time column that KEEPS the watermark tag through
    // the aggregate (the Spark 3.4+ chained-stateful-operator idiom) — a
    // second withWatermark would deadlock: its watermark starts at 0 and
    // the global watermark is the min of all of them, so the first agg
    // would never close a slice.
    val slices = EventTime.withWatermark(df, tsCol, delay)
      .groupBy(window(col(tsCol), s"$stepMs milliseconds") +: keys.map(col): _*)
      .agg(specs.map(aggCol).head, specs.map(aggCol).tail: _*)
      .withColumn("__slice_ts", window_time(col("window")))
      .select(
        (unix_millis(col("window.start")) -
          (unix_millis(col("window.start")) % maxSizeMs)).as("__win_start") +:
          unix_millis(col("window.end")).as("__slice_end") +:
          (keys.map(col) ++ specs.map(s => col(s.outName))) :+
          col("__slice_ts"): _*) // kept: the watermarked event-time column

    val keyFields = keys.map(df.schema(_))
    val keySchema = StructType(
      StructField("__win_start", LongType) +: keyFields)
    val specFields = specs.map(s => StructField(s.outName,
      if (s.kind == "count") LongType else DoubleType))
    val outSchema2 = StructType(
      StructField("window_start", TimestampType) +:
        StructField("window_end", TimestampType) +:
        keyFields ++: specFields)

    val kEnc: Encoder[Row] = Encoders.row(keySchema)
    val vEnc: Encoder[Row] = Encoders.row(slices.schema)
    type S = (Long, Seq[Any]) // last emitted end ms, merged accumulators
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = Encoders.row(outSchema2)

    val nKeys = keys.length
    val specBase = 2 + nKeys // slice row: __win_start, __slice_end, keys, specs

    def sliceVals(r: Row): Seq[Any] =
      specs.indices.map(i => r.get(specBase + i))
    def merge(a: Seq[Any], b: Seq[Any]): Seq[Any] =
      specs.indices.map { i =>
        // each branch pinned to Any: a bare match would numerically unify
        // Long/Double branches to Double and corrupt the count column
        val r: Any = specs(i).kind match {
          case "count" =>
            a(i).asInstanceOf[Long] + b(i).asInstanceOf[Long]
          case "sum" =>
            a(i).asInstanceOf[Double] + b(i).asInstanceOf[Double]
          case "min" =>
            math.min(a(i).asInstanceOf[Double], b(i).asInstanceOf[Double])
          case "max" =>
            math.max(a(i).asInstanceOf[Double], b(i).asInstanceOf[Double])
        }
        r
      }
    def mkRow(winStart: Long, end: Long, keyVals: Seq[Any],
        accs: Seq[Any]): Row =
      Row.fromSeq(
        new java.sql.Timestamp(winStart) +:
          new java.sql.Timestamp(end) +: (keyVals ++ accs))

    slices.as[Row](vEnc)
      .groupByKey(r => Row.fromSeq(r.get(0) +: (1 to nKeys).map(i => r.get(1 + i))))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Row, rows: Iterator[Row], state: GroupState[S]) =>
          val winStart = key.getLong(0)
          val winEnd = winStart + maxSizeMs
          val keyVals = (1 until key.length).map(key.get)
          if (state.hasTimedOut) {
            // trailing ends through the window close, then drop the state
            val (last, accs) = state.get
            state.remove()
            ((last + stepMs) to winEnd by stepMs).iterator
              .map(e => mkRow(winStart, e, keyVals, accs))
          } else {
            val sorted = rows.toSeq.sortBy(_.getLong(1))
            val out = Seq.newBuilder[Row]
            var (last, accs) = state.getOption.getOrElse(
              (sorted.head.getLong(1) - stepMs, null: Seq[Any]))
            sorted.foreach { r =>
              val e = r.getLong(1)
              // step ends with no new data still emit (batch parity)
              ((last + stepMs) until e by stepMs).foreach { mid =>
                out += mkRow(winStart, mid, keyVals, accs)
              }
              accs = if (accs == null) sliceVals(r) else merge(accs, sliceVals(r))
              out += mkRow(winStart, e, keyVals, accs)
              last = e
            }
            if (last >= winEnd) state.remove()
            else {
              // slices only close after the watermark passes them, so the
              // window may ALREADY be over — flush trailing ends now
              // rather than setting an in-past timer
              val wm = state.getCurrentWatermarkMs()
              if (winEnd <= wm) {
                ((last + stepMs) to winEnd by stepMs).foreach { e =>
                  out += mkRow(winStart, e, keyVals, accs)
                }
                state.remove()
              } else {
                state.update((last, accs))
                state.setTimeoutTimestamp(winEnd)
              }
            }
            out.result().iterator
          }
      }(sEnc, oEnc)
  }
}
