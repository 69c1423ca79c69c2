package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming event-time temporal (versioned / as-of) join: for each probe
  * row, attach the payload of the latest build row with the same key and
  * buildTime <= probeTime, emitting once the watermark guarantees no
  * earlier build version can still arrive.
  *
  * Spark-first re-expression of
  * StreamExecTemporalJoin.java:77 / RT/operators/join/temporal/
  * TemporalRowTimeJoinOperator.java:84: the reference co-processes two
  * keyed inputs with MapState<time, version> + registered event-time
  * timers; here both sides are unioned into one envelope stream, hash
  * shuffled ONCE on the key, and co-processed per key in
  * `flatMapGroupsWithState` with an event-time timeout.
  *
  * State bound (the reference's cleanup rule, TemporalRowTimeJoinOperator
  * "earliest version to keep"): probe rows leave state as soon as the
  * watermark passes their time; build versions strictly older than the
  * latest version at-or-before the watermark are dropped — per key the
  * state is (pending probes beyond watermark) + (live versions), exactly
  * what correctness requires and nothing more.
  *
  * Batch inputs route to graft.operators.AsOfJoin (same semantics, one
  * shuffle + ordered window).
  */
object StreamingTemporalJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      delay: String,
      outPrefix: String = "asof_"): DataFrame = {

    if (!left.isStreaming && !right.isStreaming)
      return graft.operators.AsOfJoin(
        left, right, key, leftTime, rightTime, payloadCols,
        outPrefix = outPrefix)

    val payloadType = StructType(payloadCols.map(right.schema(_)))
    val outSchema = StructType(
      left.schema.fields ++
        payloadCols.map(c => right.schema(c).copy(
          name = s"$outPrefix${c}", nullable = true)))

    // Envelope: key, event time, side, one nullable struct per side.
    val lEnv = EventTime.withWatermark(left, leftTime, delay).select(
      col(key).as("__k"),
      col(leftTime).as("__t"),
      lit(0).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(payloadType).as("__r"))
    val rEnv = EventTime.withWatermark(right, rightTime, delay).select(
      col(key).as("__k"),
      col(rightTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(StructType(left.schema.fields)).as("__l"),
      struct(payloadCols.map(col): _*).as("__r"))
    val env = lEnv.unionByName(rEnv)

    val keySchema = StructType(Seq(env.schema.fields(0).copy(name = "__k")))

    val kEnc: Encoder[Row] = StatefulOps.rowEnc(keySchema)
    val vEnc: Encoder[Row] = StatefulOps.rowEnc(env.schema)
    // state: (pending probes (tsMs, leftValues), build versions (tsMs, payloadValues))
    type S = (List[(Long, Seq[Any])], List[(Long, Seq[Any])])
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = StatefulOps.rowEnc(outSchema)

    env.as[Row](vEnc)
      .groupByKey(r => Row(r.get(0)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          var (probes, versions) = state.getOption.getOrElse((Nil, Nil))

          if (!state.hasTimedOut) rows.foreach { r =>
            val ts = StatefulOps.tsMsOf(r, 1)
            if (r.getInt(2) == 0)
              probes = (ts, r.getStruct(3).toSeq) :: probes
            else
              versions = (ts, r.getStruct(4).toSeq) :: versions
          }

          val wm = state.getCurrentWatermarkMs()
          // Probes at/below the watermark are final: no build row with
          // time <= probeTime can arrive anymore (build watermark == wm).
          val (ready, pending) = probes.partition(_._1 <= wm)
          val sortedV = versions.sortBy(_._1)
          val out = ready.sortBy(_._1).iterator.map { case (pt, lvals) =>
            val v = sortedV.takeWhile(_._1 <= pt).lastOption
            val pvals = v.map(_._2).getOrElse(payloadCols.map(_ => null))
            Row.fromSeq(lvals ++ pvals)
          }

          // Version cleanup: drop versions strictly older than the latest
          // version at-or-before the watermark (still needed by future
          // probes), keep everything newer.
          val lastBeforeWm = sortedV.takeWhile(_._1 <= wm).lastOption
          val keptV = lastBeforeWm.toList ++ sortedV.dropWhile(_._1 <= wm)

          if (pending.isEmpty && keptV.isEmpty) state.remove()
          else {
            state.update((pending, keptV))
            // wake up when the watermark reaches the oldest pending probe
            pending.map(_._1).minOption.foreach { t =>
              if (t > wm) state.setTimeoutTimestamp(t)
            }
          }
          out
      }(sEnc, oEnc)
  }
}
