package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Shared machinery for the custom stateful streaming operators: generic
  * DataFrame in/out, Row-encoded keys/outputs, kryo-encoded state,
  * event-time timeouts. Each operator is the Spark-first re-expression of
  * one reference stateful operator (cited per class below) — keyed state +
  * timers become `flatMapGroupsWithState` with `EventTimeTimeout`.
  *
  * Scale properties shared by all ops here: one hash shuffle on the group
  * key, per-key state bounded by an explicit watermark-driven cleanup rule
  * (stated per op), no cross-key coordination — the same properties the
  * reference's keyed-state operators have on a 1000-node cluster.
  */
private[streaming] object StatefulOps {

  def rowEnc(schema: StructType): Encoder[Row] = Encoders.row(schema)

  /** Values of `cols` as a stable group key string is wrong; use a Row key
    * with its own encoder so grouping is typed and hash-partitioned on the
    * real values. */
  def keyOf(idx: Seq[Int])(r: Row): Row = Row.fromSeq(idx.map(r.get))

  def tsMsOf(r: Row, i: Int): Long = r.getAs[java.sql.Timestamp](i).getTime
}

/** Streaming deduplicate keep-LAST per (key, tumbling window): buffers the
  * row with the greatest event time per key+window, emits it once the
  * watermark passes the window end, then drops the state.
  *
  * Reference: StreamExecDeduplicate.java:94 keep-last +
  * RT/operators/deduplicate/RowTimeDeduplicateFunction.java:28 (state =
  * one row per key, timer at cleanup time). Keep-FIRST needs no custom op:
  * `dropDuplicates`/`dropDuplicatesWithinWatermark` already is it.
  *
  * State bound: exactly one buffered row per (key, open window); removed on
  * emission. Batch inputs route to the same-semantics batch operator
  * (graft.operators.Dedup.keepLast over the window assignment).
  */
object StreamingDedupLast {

  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      windowMs: Long,
      delay: String): DataFrame = {

    val outSchema = StructType(
      df.schema.fields :+ StructField("window_start", TimestampType))

    if (!df.isStreaming) {
      // Unified path: batch = the exact windowed keep-last.
      val withWin = df.withColumn("window_start",
        timestamp_millis(
          (EventTime.epochMs(col(tsCol)) / windowMs).cast("long") * windowMs))
      return graft.operators.Dedup.keepLast(
        withWin,
        keyCols.map(col) :+ col("window_start"),
        // bare ascending orders; ties broken by nothing → keepLast on ts
        Seq(col(tsCol)))
    }

    val wm = df.withWatermark(tsCol, delay)
    val tsIdx = df.schema.fieldIndex(tsCol)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val keySchema = StructType(
      keyIdx.map(df.schema.fields(_)) :+ StructField("__win_start", LongType))

    val kEnc: Encoder[Row] = StatefulOps.rowEnc(keySchema)
    val vEnc: Encoder[Row] = StatefulOps.rowEnc(df.schema)
    val sEnc: Encoder[(Long, Seq[Any])] =
      Encoders.kryo[(Long, Seq[Any])]
    val oEnc: Encoder[Row] = StatefulOps.rowEnc(outSchema)

    wm.as[Row](vEnc)
      .groupByKey { r =>
        val ts = StatefulOps.tsMsOf(r, tsIdx)
        Row.fromSeq(keyIdx.map(r.get) :+ (ts - ts % windowMs))
      }(kEnc)
      .flatMapGroupsWithState[(Long, Seq[Any]), Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Row, rows: Iterator[Row], state: GroupState[(Long, Seq[Any])]) =>
          val winStart = key.getLong(key.length - 1)
          val winEnd = winStart + windowMs
          def emit(s: (Long, Seq[Any])): Iterator[Row] = Iterator.single(
            Row.fromSeq(s._2 :+ new java.sql.Timestamp(winStart)))
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit).getOrElse(Iterator.empty)
            state.remove()
            out
          } else {
            // keep the row with max event time; later-arriving wins ties
            var best = state.getOption.orNull
            rows.foreach { r =>
              val ts = StatefulOps.tsMsOf(r, tsIdx)
              if (best == null || ts >= best._1) best = (ts, r.toSeq)
            }
            state.update(best)
            if (state.getCurrentWatermarkMs() >= winEnd) {
              // window already closed (possible on restart/replay): emit now
              val out = emit(best); state.remove(); out
            } else {
              state.setTimeoutTimestamp(winEnd)
              Iterator.empty
            }
          }
      }(sEnc, oEnc)
  }
}

/** Streaming Top-N per (key, tumbling window): keeps only the current top
  * `n` rows by `orderCol` (descending) in state, emits ranked rows when the
  * watermark closes the window.
  *
  * Reference: StreamExecRank.java:93 /
  * RT/operators/rank/AppendOnlyTopNFunction.java:46 (in-state sorted map
  * capped at N) — same cap, but emission is once-at-window-close (the
  * reference's window-rank variant, StreamExecWindowRank.java:77) rather
  * than eager +I/-D churn; the changelog tier covers retraction emission.
  *
  * State bound: ≤ n rows per (key, open window).
  */
object StreamingTopN {

  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      orderCol: String,
      n: Int,
      windowMs: Long,
      delay: String): DataFrame = {

    val outSchema = StructType(
      df.schema.fields :+ StructField("window_start", TimestampType) :+
        StructField("rnk", IntegerType))

    if (!df.isStreaming) {
      val withWin = df.withColumn("window_start",
        timestamp_millis(
          (EventTime.epochMs(col(tsCol)) / windowMs).cast("long") * windowMs))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col) :+ col("window_start"): _*)
        .orderBy(col(orderCol).desc, col(tsCol).asc)
      return withWin.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= n)
    }

    val wm = df.withWatermark(tsCol, delay)
    val tsIdx = df.schema.fieldIndex(tsCol)
    val ordIdx = df.schema.fieldIndex(orderCol)
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val keySchema = StructType(
      keyIdx.map(df.schema.fields(_)) :+ StructField("__win_start", LongType))

    val kEnc: Encoder[Row] = StatefulOps.rowEnc(keySchema)
    val vEnc: Encoder[Row] = StatefulOps.rowEnc(df.schema)
    // buffer: (orderValue, tsMs, row values) sorted desc by order, asc ts
    val sEnc: Encoder[List[(Double, Long, Seq[Any])]] =
      Encoders.kryo[List[(Double, Long, Seq[Any])]]
    val oEnc: Encoder[Row] = StatefulOps.rowEnc(outSchema)

    wm.as[Row](vEnc)
      .groupByKey { r =>
        val ts = StatefulOps.tsMsOf(r, tsIdx)
        Row.fromSeq(keyIdx.map(r.get) :+ (ts - ts % windowMs))
      }(kEnc)
      .flatMapGroupsWithState[List[(Double, Long, Seq[Any])], Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Row, rows: Iterator[Row],
         state: GroupState[List[(Double, Long, Seq[Any])]]) =>
          val winStart = key.getLong(key.length - 1)
          val winEnd = winStart + windowMs
          def ranked(buf: List[(Double, Long, Seq[Any])]): Iterator[Row] =
            buf.iterator.zipWithIndex.map { case ((_, _, vs), i) =>
              Row.fromSeq(vs :+ new java.sql.Timestamp(winStart) :+ (i + 1))
            }
          if (state.hasTimedOut) {
            val out = state.getOption.map(ranked).getOrElse(Iterator.empty)
            state.remove()
            out
          } else {
            var buf = state.getOption.getOrElse(Nil)
            rows.foreach { r =>
              val e = (r.getAs[Number](ordIdx).doubleValue(),
                StatefulOps.tsMsOf(r, tsIdx), r.toSeq)
              buf = (e :: buf)
                .sortBy(t => (-t._1, t._2))
                .take(n) // cap state at N — the AppendOnlyTopNFunction bound
            }
            state.update(buf)
            if (state.getCurrentWatermarkMs() >= winEnd) {
              val out = ranked(buf); state.remove(); out
            } else {
              state.setTimeoutTimestamp(winEnd)
              Iterator.empty
            }
          }
      }(sEnc, oEnc)
  }
}
