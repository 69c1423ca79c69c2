package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** LATERAL SNAPSHOT processing-time temporal join — the reference's
  * two-phase LOAD-then-JOIN operator introduced in v2.4
  * (flink-table-planner/…/exec/stream/StreamExecLateralSnapshotJoin.java:26,
  * runtime operators/join/snapshot/LateralSnapshotJoinOperator.java,
  * planner rule LogicalJoinToLateralSnapshotJoinRule.java:101).
  *
  * Semantics (from the reference):
  *   - the BUILD side is a changelog with exactly one row-time attribute;
  *     its changes materialize into a per-key multiset, applied in
  *     row-time order gated by the build watermark;
  *   - the operator runs two forward-only phases split at
  *     `loadCompletedMs` (the planner-resolved flip point:
  *     'compile_time' = plan wall-clock, 'user_time' = user literal).
  *     LOAD: probe rows are BUFFERED (never joined against a
  *     partially-loaded table); JOIN: once the build watermark passes the
  *     flip, buffered probes drain in insertion order against the
  *     materialized state, and later probes join immediately;
  *   - join types INNER and LEFT only, at least one equality key
  *     (LogicalJoinToLateralSnapshotJoinRule.java:103,111);
  *   - BATCH degrades to a regular join — all input is bounded, so LOAD
  *     trivially completes before any probe
  *     (BatchPhysicalLateralSnapshotJoinRule).
  *
  * Spark-first mapping: the same union-envelope co-process as
  * [[StreamingTemporalJoin]] — both inputs wrapped, unioned, hash
  * shuffled ONCE on the key, `flatMapGroupsWithState` with an event-time
  * timeout at the flip point so buffered probes drain even when a key
  * receives no further input. Micro-batch granularity note: within one
  * micro-batch, build changes at-or-under the watermark apply before the
  * batch's probes join (the reference interleaves by arrival; both orders
  * satisfy the watermark contract). The reference's
  * `load_completed_idle_timeout` (flip early when the build source goes
  * idle) is N/A here by the same argument as MiniBatchAssigner: Spark's
  * micro-batch watermark advances on the batch clock, so an idle build
  * source cannot wedge the watermark the way an idle Flink source parks
  * its per-split watermark.
  *
  * State bound: per key, the pending probe buffer (drains at the flip —
  * bounded by LOAD duration) + the live build multiset (the table's
  * current version, exactly what correctness requires); `stateTtlMs`
  * additionally drops a key's state after that long with no activity
  * (the reference's state_ttl argument).
  */
object LateralSnapshotJoin {

  def apply(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      buildTime: String,
      loadCompletedMs: Long,
      delay: String,
      joinType: String = "inner",
      stateTtlMs: Option[Long] = None,
      outPrefix: String = "snap_"): DataFrame = {
    val jt = joinType.toLowerCase
    require(jt == "inner" || jt == "left",
      s"LATERAL SNAPSHOT join only supports INNER and LEFT, got $joinType")

    // ------------------------------------------------- batch degradation
    if (!probe.isStreaming && !build.isStreaming) {
      val plain = if (build.columns.contains("__rowkind"))
        build.drop("__rowkind") else build
      val b = plain.columns.foldLeft(plain) { (d, c) =>
        d.withColumnRenamed(c, s"$outPrefix$c")
      }
      return probe.join(b,
        col(key) === col(s"$outPrefix$key"),
        if (jt == "left") "left_outer" else "inner")
    }

    // fail fast with the contract instead of a deep ClassCastException in
    // tsMsOf / an envelope-union analysis error: the streaming operator's
    // row-time arithmetic (watermark gating, version-aware retraction)
    // works on TimestampType only
    require(build.schema(buildTime).dataType == TimestampType,
      s"build row-time '$buildTime' must be TIMESTAMP (TimestampType), " +
        s"got ${build.schema(buildTime).dataType.simpleString} — cast " +
        "TIMESTAMP_NTZ/epoch columns explicitly first")

    val hasRowkind = build.columns.contains("__rowkind")
    val payloadCols = build.columns.filterNot(_ == "__rowkind").toSeq
    val payloadType = StructType(payloadCols.map(build.schema(_)))
    val outSchema = StructType(
      probe.schema.fields ++
        payloadCols.map(c => build.schema(c).copy(
          name = s"$outPrefix$c", nullable = true)))

    // Envelope: key, build row-time (probe rows carry the flip point so
    // their event-time column is always defined), side, kind, payloads.
    val bEnv = EventTime.withWatermark(build, buildTime, delay).select(
      col(key).as("__k"),
      col(buildTime).as("__t"),
      lit(1).as("__side"),
      (if (hasRowkind) col("__rowkind") else lit("+I")).as("__kind"),
      lit(null).cast(StructType(probe.schema.fields)).as("__p"),
      struct(payloadCols.map(col): _*).as("__b"))
    // probe rows are PROC-time (no row-time attribute in the reference
    // either); their envelope event-time is pinned far-future so the
    // stateful operator's late-data filter (driven by the build-side
    // watermark) can never drop a probe
    val pEnv = probe.select(
      col(key).as("__k"),
      lit(new java.sql.Timestamp(253402300799000L)).as("__t"),
      lit(0).as("__side"),
      lit("+I").as("__kind"),
      struct(probe.columns.map(col): _*).as("__p"),
      lit(null).cast(payloadType).as("__b"))
    val env = bEnv.unionByName(pEnv)

    val keySchema = StructType(Seq(env.schema.fields(0).copy(name = "__k")))
    val kEnc: Encoder[Row] = StatefulOps.rowEnc(keySchema)
    val vEnc: Encoder[Row] = StatefulOps.rowEnc(env.schema)
    // state: (probe buffer in arrival order, pending build changes
    // (tsMs, kind, values) in arrival order, materialized multiset,
    // watermark at last activity — drives the state-TTL clock)
    type S = (List[Seq[Any]], List[(Long, String, Seq[Any])], List[Seq[Any]], Long)
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = StatefulOps.rowEnc(outSchema)
    val nullPad: Seq[Any] = payloadCols.map(_ => null)
    val leftOuter = jt == "left"
    // payload index of the build row-time, excluded from retraction match
    val timeIdx = payloadCols.indexOf(buildTime)
    def stripTime(vals: Seq[Any]): Seq[Any] =
      if (timeIdx < 0) vals else vals.patch(timeIdx, Nil, 1)

    env.as[Row](vEnc)
      .groupByKey(r => Row(r.get(0)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          var (pending, changes, table, lastTouch) = state.getOption.getOrElse(
            (Nil: List[Seq[Any]],
             Nil: List[(Long, String, Seq[Any])],
             Nil: List[Seq[Any]],
             Long.MinValue))
          val newProbes = scala.collection.mutable.ListBuffer.empty[Seq[Any]]
          var sawRows = false
          if (!state.hasTimedOut) rows.foreach { r =>
            sawRows = true
            if (r.getInt(2) == 0) newProbes += r.getStruct(4).toSeq
            else changes = changes :+
              ((StatefulOps.tsMsOf(r, 1), r.getString(3), r.getStruct(5).toSeq))
          }
          val wm = state.getCurrentWatermarkMs()
          if (sawRows) lastTouch = wm

          // apply build changes whose row-time the watermark has passed,
          // in row-time order (ties in arrival order — the buffer is
          // appended in arrival order and sortBy is stable, preserving
          // the reference's -U/+U atomic-pair visibility). Retraction
          // contract: a -U/-D carries the old row's CONTENT but the
          // CHANGE's row-time (the reference emits the pair at the
          // update time — "changes sharing a row-time are applied in
          // arrival order"), so removal matches the stored row by its
          // non-time fields. Tagging the -U with the update time keeps
          // the old version visible up to the update — applying it at
          // the OLD row-time would make the key vanish for the whole
          // window between versions.
          val (applicable, still) = changes.partition(_._1 <= wm)
          applicable.sortBy(_._1).foreach { case (chgMs, kind, vals) =>
            if (kind == "-D" || kind == "-U") {
              // Among content matches, remove the VERSION the change refers
              // to: the stored row whose row-time is the latest one <= the
              // change's row-time (ADVICE r15 — with identical payloads
              // inserted at different row-times, removing the first content
              // match could strip the other version and leave the survivor
              // carrying the wrong snapshot row-time). Fall back to the
              // earliest stored match when none precedes the change.
              val matches = table.zipWithIndex
                .filter { case (b, _) => stripTime(b) == stripTime(vals) }
              if (matches.nonEmpty) {
                // build row-time is TimestampType by operator contract
                // (required at construction below) — TIMESTAMP_NTZ would
                // already fail the envelope union and tsMsOf before here
                def storedMs(b: Seq[Any]): Long =
                  if (timeIdx < 0) Long.MinValue
                  else b(timeIdx) match {
                    case t: java.sql.Timestamp => t.getTime
                    case t: java.time.Instant => t.toEpochMilli
                    case l: Long => l
                    case _ => Long.MinValue
                  }
                val atOrBefore = matches.filter { case (b, _) => storedMs(b) <= chgMs }
                val victim =
                  if (atOrBefore.nonEmpty) atOrBefore.maxBy { case (b, _) => storedMs(b) }._2
                  else matches.minBy { case (b, _) => storedMs(b) }._2
                table = table.patch(victim, Nil, 1)
              }
            } else table = table :+ vals
          }
          changes = still

          def joinOne(p: Seq[Any]): Seq[Row] =
            if (table.nonEmpty) table.map(b => Row.fromSeq(p ++ b))
            else if (leftOuter) Seq(Row.fromSeq(p ++ nullPad))
            else Nil

          val joined = wm >= loadCompletedMs
          val out =
            if (joined) {
              // flip (or already past it): drain buffered probes in
              // insertion order, then this batch's probes
              val drained = (pending ++ newProbes).iterator.flatMap(joinOne)
              pending = Nil
              drained
            } else {
              pending = pending ++ newProbes
              Iterator.empty
            }

          val ttlExpired = joined && state.hasTimedOut &&
            stateTtlMs.exists(ttl => wm - lastTouch >= ttl)
          if (ttlExpired ||
              (joined && changes.isEmpty && table.isEmpty && pending.isEmpty))
            state.remove()
          else {
            state.update((pending, changes, table, lastTouch))
            if (!joined)
              // wake at the flip so LOAD-phase probes drain without
              // further input for this key
              state.setTimeoutTimestamp(math.max(loadCompletedMs, wm + 1))
            else stateTtlMs.foreach(ttl =>
              state.setTimeoutTimestamp(math.max(lastTouch + ttl, wm + 1)))
          }
          out
      }(sEnc, oEnc)
  }
}
