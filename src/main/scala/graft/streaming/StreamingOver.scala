package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming bounded OVER aggregate: per key, event-time-ordered running
  * SUM over the current row and the `precedingRows` rows before it
  * (ROWS BETWEEN precedingRows PRECEDING AND CURRENT ROW) — rows are
  * emitted in event-time order once the watermark passes them.
  *
  * Spark-first re-expression of StreamExecOverAggregate.java:105 /
  * RT/operators/over/RowTimeRowsBoundedPrecedingFunction.java (buffer
  * rows until watermark, process in time order, retain only the frame
  * tail): state per key = rows newer than the watermark + the last
  * `precedingRows` emitted values (the frame tail) — the reference's
  * exact state-cleanup contract, so state cannot grow with stream length.
  *
  * Batch inputs get the equivalent window-function plan (free in Spark).
  */
object StreamingOver {

  /** Honor an ALREADY-declared watermark on `tsCol` (Spark disallows
    * redefining one): apply `delay` only when the plan has none. */
  private def watermarked(
      df: DataFrame, tsCol: String, delay: String): DataFrame = {
    val has = df.queryExecution.analyzed.collectFirst {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
          if e.eventTime.name == tsCol => e
    }.isDefined
    if (has) df else df.withWatermark(tsCol, delay)
  }

  /** @param idleRetentionMs after this long past the watermark with no
    *   pending rows, a key's frame-tail state is dropped (the reference's
    *   idle-state-retention cleanup); a key that resumes later restarts
    *   its frame.
    */
  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      precedingRows: Int,
      delay: String,
      idleRetentionMs: Long = 3600000L): DataFrame = {

    val outSchema = StructType(
      df.schema.fields :+ StructField("run_sum", DoubleType))

    if (!df.isStreaming) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col(tsCol).asc)
        .rowsBetween(-precedingRows, org.apache.spark.sql.expressions.Window.currentRow)
      return df.withColumn("run_sum", sum(col(valCol)).over(w))
    }

    val wm = watermarked(df, tsCol, delay)
    val tsIdx = df.schema.fieldIndex(tsCol)
    val valIdx = df.schema.fieldIndex(valCol)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val keySchema = StructType(keyIdx.map(df.schema.fields(_)))

    val kEnc: Encoder[Row] = StatefulOps.rowEnc(keySchema)
    val vEnc: Encoder[Row] = StatefulOps.rowEnc(df.schema)
    // state: (pending rows beyond watermark, frame tail of emitted values)
    type S = (List[(Long, Seq[Any])], List[Double])
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = StatefulOps.rowEnc(outSchema)

    wm.as[Row](vEnc)
      .groupByKey(r => StatefulOps.keyOf(keyIdx)(r))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          var (pending, tail) = state.getOption.getOrElse((Nil, Nil))

          if (!state.hasTimedOut) rows.foreach { r =>
            pending = (StatefulOps.tsMsOf(r, tsIdx), r.toSeq) :: pending
          }

          val wmMs = state.getCurrentWatermarkMs()
          val (ready, stillPending) = pending.partition(_._1 <= wmMs)
          val out = Seq.newBuilder[Row]
          // process in event-time order (ties: stable by insertion reversal
          // is not deterministic — order equal timestamps by value seq hash
          // would be arbitrary; sort by (ts) keeps Spark-batch parity for
          // distinct timestamps, the tested contract)
          ready.sortBy(_._1).foreach { case (_, vals) =>
            val v = vals(valIdx) match {
              case n: Number => n.doubleValue()
              case _ => 0.0
            }
            tail = (v :: tail).take(precedingRows + 1)
            out += Row.fromSeq(vals :+ tail.sum)
          }

          if (stillPending.isEmpty &&
            (tail.isEmpty || (state.hasTimedOut && ready.isEmpty))) {
            // nothing buffered, or idle-retention expired: drop all state
            state.remove()
          } else {
            state.update((stillPending, tail))
            val wake = stillPending.map(_._1).minOption
              .getOrElse(wmMs + idleRetentionMs) // idle cleanup timer
            if (wake > wmMs) state.setTimeoutTimestamp(wake)
          }
          out.result().iterator
      }(sEnc, oEnc)
  }

  /** Time-RANGE-bounded streaming OVER: per key, event-time-ordered
    * running SUM over rows within `precedingMs` of the current row
    * (RANGE BETWEEN interval PRECEDING AND CURRENT ROW) — the reference's
    * RowTimeRangeBoundedPrecedingFunction.java:56 (298 LoC), the
    * time-interval sibling of the rows-bounded form above.
    *
    * SQL RANGE semantics include PEERS: rows sharing a timestamp all see
    * the same frame, containing every one of them — so emission processes
    * each distinct timestamp as a group, exactly as the reference fires
    * one timer per timestamp and emits all its rows together.
    *
    * `valCol` must be LongType (callers fixed-point-scale doubles) so the
    * running sums are bit-identical across engines and arrival orders.
    * State per key = pending rows beyond the watermark + the frame tail
    * (rows within `precedingMs` of the last emitted timestamp) — bounded
    * by the interval span, never by stream length.
    */
  def range(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      precedingMs: Long,
      delay: String,
      idleRetentionMs: Long = 3600000L): DataFrame = {
    require(precedingMs > 0, "precedingMs must be positive")
    val outSchema = StructType(
      df.schema.fields :+ StructField("run_sum", LongType))

    if (!df.isStreaming) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(unix_millis(col(tsCol)))
        .rangeBetween(-precedingMs, 0)
      return df.withColumn("run_sum", sum(col(valCol)).over(w))
    }

    val wm = watermarked(df, tsCol, delay)
    val tsIdx = df.schema.fieldIndex(tsCol)
    val valIdx = df.schema.fieldIndex(valCol)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val keySchema = StructType(keyIdx.map(df.schema.fields(_)))

    val kEnc: Encoder[Row] = StatefulOps.rowEnc(keySchema)
    val vEnc: Encoder[Row] = StatefulOps.rowEnc(df.schema)
    // state: (pending rows beyond watermark, frame rows (tsMs, v))
    type S = (List[(Long, Seq[Any])], List[(Long, Long)])
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = StatefulOps.rowEnc(outSchema)

    wm.as[Row](vEnc)
      .groupByKey(r => StatefulOps.keyOf(keyIdx)(r))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          var (pending, frame) = state.getOption.getOrElse((Nil, Nil))

          if (!state.hasTimedOut) rows.foreach { r =>
            pending = (StatefulOps.tsMsOf(r, tsIdx), r.toSeq) :: pending
          }

          val wmMs = state.getCurrentWatermarkMs()
          val (ready, stillPending) = pending.partition(_._1 <= wmMs)
          val out = Seq.newBuilder[Row]
          // one pass per DISTINCT timestamp: peers enter the frame
          // together and share one sum (SQL RANGE peer semantics)
          ready.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (t, group) =>
            group.foreach { case (_, vals) =>
              frame = (t, vals(valIdx).asInstanceOf[Long]) :: frame
            }
            frame = frame.filter(_._1 >= t - precedingMs)
            val s = frame.iterator.map(_._2).sum
            group.foreach { case (_, vals) =>
              out += Row.fromSeq(vals :+ s)
            }
          }

          if (stillPending.isEmpty &&
            (frame.isEmpty || (state.hasTimedOut && ready.isEmpty))) {
            state.remove()
          } else {
            state.update((stillPending, frame))
            val wake = stillPending.map(_._1).minOption
              .getOrElse(wmMs + idleRetentionMs)
            if (wake > wmMs) state.setTimeoutTimestamp(wake)
          }
          out.result().iterator
      }(sEnc, oEnc)
  }

  /** UNBOUNDED PRECEDING streaming OVER: per key, event-time-ordered
    * running SUM over every row since the stream began (RANGE BETWEEN
    * UNBOUNDED PRECEDING AND CURRENT ROW) — the reference's
    * RT/operators/over/RowTimeRangeUnboundedPrecedingOverFunction.java:52
    * (the unbounded sibling of the bounded frames above): rows buffer
    * until the watermark passes them, fire in row-time order, and the
    * ONLY retained per-key state is the running accumulator — O(1) per
    * key, never growing with stream length (vs the bounded frames' tail).
    *
    * RANGE peer semantics: rows sharing a timestamp all see the same
    * frame containing every one of them, exactly as the reference fires
    * one timer per timestamp and emits its rows together.
    *
    * `valCol` must be LongType (callers fixed-point-scale doubles) so the
    * running sums are bit-identical across engines and arrival orders.
    *
    * Idle cleanup (the reference's state-retention contract,
    * `KeyedProcessFunctionWithCleanupState`): after `idleRetentionMs`
    * past the watermark with no pending rows the accumulator is dropped;
    * a key that resumes later restarts its running total from zero —
    * identical to the reference's documented TTL behavior.
    */
  def unbounded(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      delay: String,
      idleRetentionMs: Long = 3600000L): DataFrame = {
    val outSchema = StructType(
      df.schema.fields :+ StructField("run_sum", LongType))

    if (!df.isStreaming) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(unix_millis(col(tsCol)))
        .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      return df.withColumn("run_sum", sum(col(valCol)).over(w))
    }
    unboundedStream(df, keyCols, tsCol, valCol, delay, idleRetentionMs,
      outSchema, vals => Seq(java.lang.Long.valueOf(vals.sum)))
  }

  /** As [[unbounded]] with the FULL monotone accumulator family — SUM /
    * COUNT / MIN / MAX since the stream began (the reference's
    * unbounded-preceding over functions run arbitrary generated agg
    * handlers; these four are the O(1)-state members — AVG derives as
    * sum/cnt downstream). Emits `run_sum`, `run_cnt`, `run_min`,
    * `run_max` (all LongType; `valCol` must be LongType). */
  def unboundedMulti(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      delay: String,
      idleRetentionMs: Long = 3600000L): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("run_sum", LongType), StructField("run_cnt", LongType),
      StructField("run_min", LongType), StructField("run_max", LongType)))

    if (!df.isStreaming) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(unix_millis(col(tsCol)))
        .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      return df
        .withColumn("run_sum", sum(col(valCol)).over(w))
        .withColumn("run_cnt", count(col(valCol)).over(w))
        .withColumn("run_min", min(col(valCol)).over(w))
        .withColumn("run_max", max(col(valCol)).over(w))
    }
    unboundedStream(df, keyCols, tsCol, valCol, delay, idleRetentionMs,
      outSchema, vals => Seq(
        java.lang.Long.valueOf(vals.sum),
        java.lang.Long.valueOf(vals.cnt),
        java.lang.Long.valueOf(vals.mn),
        java.lang.Long.valueOf(vals.mx)))
  }

  /** Monotone unbounded accumulator — O(1) per key. */
  private final case class UnboundedAcc(
      sum: Long, cnt: Long, mn: Long, mx: Long) {
    def add(v: Long): UnboundedAcc =
      if (cnt == 0L) UnboundedAcc(v, 1L, v, v)
      else UnboundedAcc(sum + v, cnt + 1L, math.min(mn, v), math.max(mx, v))
  }

  /** Shared streaming body of the unbounded frames: buffer rows until
    * the watermark, fire per distinct timestamp (RANGE peer semantics),
    * fold into the O(1) accumulator, emit `emit(acc)` columns. */
  private def unboundedStream(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String,
      delay: String,
      idleRetentionMs: Long,
      outSchema: StructType,
      emit: UnboundedAcc => Seq[Any]): DataFrame = {

    val wm = watermarked(df, tsCol, delay)
    val tsIdx = df.schema.fieldIndex(tsCol)
    val valIdx = df.schema.fieldIndex(valCol)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val keySchema = StructType(keyIdx.map(df.schema.fields(_)))

    val kEnc: Encoder[Row] = StatefulOps.rowEnc(keySchema)
    val vEnc: Encoder[Row] = StatefulOps.rowEnc(df.schema)
    // state: (pending rows beyond watermark, running accumulator);
    // acc.cnt > 0 distinguishes "never fired" from "values cancelled"
    type S = (List[(Long, Seq[Any])], UnboundedAcc)
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = StatefulOps.rowEnc(outSchema)
    val zero = UnboundedAcc(0L, 0L, 0L, 0L)

    wm.as[Row](vEnc)
      .groupByKey(r => StatefulOps.keyOf(keyIdx)(r))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          var (pending, acc) = state.getOption.getOrElse((Nil, zero))

          if (!state.hasTimedOut) rows.foreach { r =>
            pending = (StatefulOps.tsMsOf(r, tsIdx), r.toSeq) :: pending
          }

          val wmMs = state.getCurrentWatermarkMs()
          val (ready, stillPending) = pending.partition(_._1 <= wmMs)
          val out = Seq.newBuilder[Row]
          // one pass per DISTINCT timestamp: peers enter the accumulator
          // together and share one frame (SQL RANGE peer semantics)
          ready.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, group) =>
            group.foreach { case (_, vals) =>
              acc = acc.add(vals(valIdx).asInstanceOf[Long])
            }
            group.foreach { case (_, vals) =>
              out += Row.fromSeq(vals ++ emit(acc))
            }
          }

          if (stillPending.isEmpty &&
            (acc.cnt == 0L || (state.hasTimedOut && ready.isEmpty))) {
            // nothing buffered and nothing ever accumulated, or
            // idle-retention expired with nothing new: drop the state
            state.remove()
          } else {
            state.update((stillPending, acc))
            val wake = stillPending.map(_._1).minOption
              .getOrElse(wmMs + idleRetentionMs) // idle cleanup timer
            if (wake > wmMs) state.setTimeoutTimestamp(wake)
          }
          out.result().iterator
      }(sEnc, oEnc)
  }
}
