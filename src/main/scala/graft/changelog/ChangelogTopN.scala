package graft.changelog

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** RETRACTABLE streaming Top-N — the reference's RetractableTopNFunction
  * (RT/operators/rank/RetractableTopNFunction.java:56): Top-N over a
  * CHANGELOG input, where updates and deletes of ranked rows re-rank the
  * partition and emit the difference as retraction pairs. This closes the
  * rank-tier sub-row the append-only StreamingTopN (state capped at N)
  * cannot express: an append-only Top-N can ignore rows below the
  * threshold forever; a retractable one must know what RE-ENTERS the
  * top when a leader retracts.
  *
  * Input: a full changelog with `__rowkind`/`__seq` (one global seq
  * domain per partition key; an update is a -U/+U pair). Ranking is by
  * value DESC with the upsert key as the deterministic tie-break.
  *
  * Output: a changelog of rank assignments keyed by (partition, rank):
  * +I when a rank first fills, -U/+U when a rank's occupant or value
  * changes, -D when the partition shrinks below a rank. Materializing
  * with keep-last by (partition, rank) yields exactly the Top-N of the
  * final state — the oracle's formulation.
  *
  * State per partition key: the FULL live-row map (upsertKey → value) +
  * the N emitted assignments — the reference's own bound (its ranked
  * treemap also holds every live row; that is the price of retractable
  * semantics, and the reason the append-only variant exists).
  * One hash shuffle on the partition key; emission diffs are O(N) per
  * batch after an O(live) re-rank bounded by the partition's live rows.
  */
object ChangelogTopN extends Serializable {

  private def isRetract(kind: String): Boolean =
    kind == RowKind.UpdateBefore || kind == RowKind.Delete

  /** Diff two rank assignments into changelog rows; the per-key
    * emission counter stamps `__seq` (2 slots per change so -U < +U). */
  private def diff(
      keyVals: Seq[Any],
      old: Vector[(Any, Double)],
      nw: Vector[(Any, Double)],
      seq0: Long): (Long, Seq[Row]) = {
    var seq = seq0
    val out = Seq.newBuilder[Row]
    val m = math.max(old.length, nw.length)
    var r = 0
    while (r < m) {
      val o = old.lift(r)
      val w = nw.lift(r)
      (o, w) match {
        case (Some(ov), Some(nv)) if ov == nv => ()
        case (Some(ov), Some(nv)) =>
          out += Row.fromSeq(keyVals ++ Seq(r + 1, ov._1, ov._2,
            RowKind.UpdateBefore, seq))
          out += Row.fromSeq(keyVals ++ Seq(r + 1, nv._1, nv._2,
            RowKind.UpdateAfter, seq + 1))
          seq += 2
        case (None, Some(nv)) =>
          out += Row.fromSeq(keyVals ++ Seq(r + 1, nv._1, nv._2,
            RowKind.Insert, seq + 1))
          seq += 2
        case (Some(ov), None) =>
          out += Row.fromSeq(keyVals ++ Seq(r + 1, ov._1, ov._2,
            RowKind.Delete, seq))
          seq += 2
        case (None, None) => ()
      }
      r += 1
    }
    (seq, out.result())
  }

  def apply(
      df: DataFrame,
      partitionCols: Seq[String],
      upsertKeyCol: String,
      valCol: String,
      n: Int): DataFrame =
    apply(df, partitionCols, upsertKeyCol, valCol, n, idleTtlMs = None)

  /** @param idleTtlMs streaming-face idle-state retention — the
    *        reference's `table.exec.state.ttl` (processing-time based,
    *        as on ChangelogJoin/RetractingChangelogAgg): a partition
    *        key receiving no envelopes for this long drops its live-row
    *        map AND its emitted assignments. The documented trade is
    *        the reference's own: post-expiry envelopes re-rank against
    *        the post-expiry state only (the previously emitted ranks
    *        are not retracted — downstream keep-last materialization is
    *        assumed compacted). None keeps state for the stream's
    *        lifetime — exact retractable Top-N; note that a partition
    *        key whose rows are ALL retracted then leaves a permanent
    *        seq-only tombstone (as RetractingChangelogAgg's counter mode
    *        always has — a later re-insert must out-seq the -D rows the
    *        key emitted, or keep-last materialization would resurrect
    *        them), so high-churn key spaces should set a TTL to bound
    *        dead-key state. */
  def apply(
      df: DataFrame,
      partitionCols: Seq[String],
      upsertKeyCol: String,
      valCol: String,
      n: Int,
      idleTtlMs: Option[Long]): DataFrame = {
    require(n > 0, "n must be positive")
    val pIdx = partitionCols.map(df.schema.fieldIndex)
    val ukIdx = df.schema.fieldIndex(upsertKeyCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val kindIdx = df.schema.fieldIndex(RowKind.kindCol)
    val seqIdx = df.schema.fieldIndex(RowKind.seqCol)

    val outSchema = StructType(
      pIdx.map(df.schema.fields(_)) ++ Seq(
        StructField("rank", IntegerType),
        df.schema.fields(ukIdx),
        StructField(valCol, DoubleType),
        StructField(RowKind.kindCol, StringType),
        StructField(RowKind.seqCol, LongType)))

    // ranking: value DESC, upsert key string form ASC (deterministic)
    def topOf(live: Map[Any, Double]): Vector[(Any, Double)] =
      live.toVector
        .sortBy { case (uk, v) => (-v, String.valueOf(uk)) }
        .take(n)

    def applyEnvelope(
        live: scala.collection.mutable.Map[Any, Double], e: Row): Unit = {
      val uk = e.get(ukIdx)
      val v = e.getAs[Number](vIdx).doubleValue()
      if (isRetract(e.getString(kindIdx))) {
        // remove only if the stored value matches the pre-image (a stale
        // -U for an already-replaced row must not kill the newer value)
        if (live.get(uk).contains(v)) live.remove(uk)
      } else live.update(uk, v)
    }

    if (!df.isStreaming) {
      // per-envelope re-rank must NOT re-sort the live set (that is
      // O(E·L log L) — quadratic in a partition's envelope count): keep
      // an ordered set of (-value, key) so each envelope costs O(log L)
      // to update and O(N) to read the top
      return graft.operators.SecondarySort.mapOrderedGroups(
        df, partitionCols,
        Seq(col(RowKind.seqCol),
          when(col(RowKind.kindCol) === RowKind.UpdateBefore ||
            col(RowKind.kindCol) === RowKind.Delete, 0).otherwise(1)),
        outSchema) { (keyVals, rows) =>
        val byStr =
          scala.collection.mutable.Map.empty[String, (Any, Double)]
        val ranked = scala.collection.mutable.TreeSet
          .empty[(Double, String)](
            Ordering.by { case (v, k) => (-v, k) })
        var top = Vector.empty[(Any, Double)]
        var seq = 1L
        rows.flatMap { e =>
          val uk = e.get(ukIdx)
          val str = String.valueOf(uk)
          val v = e.getAs[Number](vIdx).doubleValue()
          if (isRetract(e.getString(kindIdx))) {
            if (byStr.get(str).exists(_._2 == v)) {
              ranked.remove((v, str))
              byStr.remove(str)
            }
          } else {
            byStr.get(str).foreach { case (_, ov) =>
              ranked.remove((ov, str))
            }
            byStr.update(str, (uk, v))
            ranked.add((v, str))
          }
          val nw = ranked.iterator.take(n)
            .map { case (vv, kk) => (byStr(kk)._1, vv) }.toVector
          val (s2, outs) = diff(keyVals, top, nw, seq)
          top = nw
          seq = s2
          outs
        }
      }
    }

    val keySchema = StructType(pIdx.map(df.schema.fields(_)))
    val kEnc: Encoder[Row] = Encoders.row(keySchema)
    val vEnc: Encoder[Row] = Encoders.row(df.schema)
    // state: (emission seq, live rows, emitted top assignments)
    type S = (Long, Map[Any, Double], Vector[(Any, Double)])
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = Encoders.row(outSchema)

    val timeoutConf = idleTtlMs match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    df.as[Row](vEnc)
      .groupByKey(r => Row.fromSeq(pIdx.map(r.get)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), timeoutConf) {
        (key: Row, rows: Iterator[Row], state: GroupState[S]) =>
          if (state.hasTimedOut) {
            // idle TTL: drop EVERYTHING (the reference's state.ttl — the
            // live-row map, the assignments, and the seq slot). No
            // tombstone: under a TTL the emission seq is rebased each
            // micro-batch to processingTimeMs << 16 (below), so output
            // after an expiry always out-seqs output from before it and
            // keep-last materialization cannot land on a stale
            // pre-expiry row. The stale rank rows already in the sink
            // stay visible until overridden — the reference's own
            // documented state-TTL behavior (no retraction on expiry).
            state.remove()
            Iterator.empty
          } else {
            val old = state.getOption
            // 2^16 slots per ms of batch time; each batch's diff emits 2
            // slots per rank change (≤ 2n+… per batch), so collisions
            // would need >32k rank changes of one key in one millisecond.
            // See RetractingChangelogAgg's procBase comment for the
            // headroom rationale (downstream affine seq consumers) and
            // the clock-monotonicity assumption across restarts.
            val procBase =
              if (idleTtlMs.isDefined) state.getCurrentProcessingTimeMs << 16
              else 1L
            val (seqStored, liveM, top0) = old.getOrElse(
              (1L, Map.empty[Any, Double], Vector.empty[(Any, Double)]))
            ClockMonotonicity.check(seqStored, procBase, "ChangelogTopN")
            val seq0 = math.max(seqStored, procBase)
            val live = scala.collection.mutable.Map.from(liveM)
            // order within the micro-batch slice; retracts before the
            // accumulate sharing their seq
            val ordered = rows.toSeq.sortBy { e =>
              (e.getLong(seqIdx),
                if (isRetract(e.getString(kindIdx))) 0 else 1)
            }
            ordered.foreach(applyEnvelope(live, _))
            val nw = topOf(live.toMap)
            val (seq2, outs) = diff(key.toSeq, top0, nw, seq0)
            if (live.isEmpty && nw.isEmpty) {
              // the key died: keep a seq-only tombstone so a later
              // re-insert out-seqs the -D rows this key just emitted
              // (RetractingChangelogAgg parity — a fresh seq-1 restart
              // would lose keep-last materialization to them). With a
              // TTL the tombstone rides the normal timeout (procBase
              // covers every later batch); without one it persists, as
              // the agg's does. A key that never emitted needs nothing.
              if (old.isEmpty && outs.isEmpty) state.remove()
              else {
                state.update((seq2, Map.empty[Any, Double],
                  Vector.empty[(Any, Double)]))
                idleTtlMs.foreach(state.setTimeoutDuration)
              }
            } else {
              state.update((seq2, live.toMap, nw))
              idleTtlMs.foreach(state.setTimeoutDuration)
            }
            outs.iterator
          }
      }(sEnc, oEnc)
  }

  /** FastTop1 fast path — the reference's FastTop1Function.java:58 (the
    * rank-strategy specialization StreamExecRank picks when N = 1 and
    * the input is an UPSERT stream): state per partition key is the ONE
    * current champion (upsertKey, value) instead of the full live-row
    * map — O(1) versus O(live rows).
    *
    * Applicability contract (the reference's RankProcessStrategy
    * conditions, enforced loudly here instead of by a planner rule):
    *  - the input is upsert-only: +I/+U envelopes, no -U/-D — a
    *    retraction requires knowing the runner-up, which O(1) state
    *    cannot; such inputs must use [[apply]];
    *  - a key's sort value never DECREASES (monotone improvement) — a
    *    champion worsening below the runner-up is likewise unknowable
    *    from O(1) state. A decreasing update for the current champion
    *    raises; for a non-champion it is harmless (it cannot change the
    *    top) and is absorbed.
    *
    * Output: the same rank-1 changelog envelope as [[apply]] with n = 1
    * (+I on first fill, -U/+U on champion or value change), so sinks and
    * materialization are interchangeable.
    */
  def top1Upsert(
      df: DataFrame,
      partitionCols: Seq[String],
      upsertKeyCol: String,
      valCol: String): DataFrame = {
    val pIdx = partitionCols.map(df.schema.fieldIndex)
    val ukIdx = df.schema.fieldIndex(upsertKeyCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val kindIdx = df.schema.fieldIndex(RowKind.kindCol)
    val seqIdx = df.schema.fieldIndex(RowKind.seqCol)

    val outSchema = StructType(
      pIdx.map(df.schema.fields(_)) ++ Seq(
        StructField("rank", IntegerType),
        df.schema.fields(ukIdx),
        StructField(valCol, DoubleType),
        StructField(RowKind.kindCol, StringType),
        StructField(RowKind.seqCol, LongType)))

    /** (champion, value) after one envelope; None champ change. */
    def advance(
        champ: Option[(Any, Double)], e: Row): Option[(Any, Double)] = {
      val kind = e.getString(kindIdx)
      require(kind == RowKind.Insert || kind == RowKind.UpdateAfter,
        s"FastTop1 is an UPSERT-only fast path; envelope kind $kind " +
          "requires the retractable engine (ChangelogTopN.apply)")
      val uk = e.get(ukIdx)
      val v = e.getAs[Number](vIdx).doubleValue()
      champ match {
        case None => Some((uk, v))
        case Some((cu, cv)) if String.valueOf(uk) == String.valueOf(cu) =>
          require(v >= cv,
            s"FastTop1 requires non-decreasing sort values per key; " +
              s"champion $cu worsened $cv -> $v — use the retractable " +
              "engine (ChangelogTopN.apply)")
          Some((cu, v))
        case Some((cu, cv)) =>
          // deterministic order: value DESC, key string ASC (as apply())
          if (v > cv || (v == cv && String.valueOf(uk) < String.valueOf(cu)))
            Some((uk, v))
          else champ
      }
    }

    /** Rank-1 envelope diff, 2 seq slots per change (as apply's diff). */
    def diff1(
        keyVals: Seq[Any],
        old: Option[(Any, Double)],
        nw: Option[(Any, Double)],
        seq0: Long): (Long, Seq[Row]) = (old, nw) match {
      case (o, w) if o == w => (seq0, Nil)
      case (None, Some((uk, v))) =>
        (seq0 + 2, Seq(Row.fromSeq(keyVals ++ Seq(1, uk, v,
          RowKind.Insert, seq0 + 1))))
      case (Some((ou, ov)), Some((nu, nv))) =>
        (seq0 + 2, Seq(
          Row.fromSeq(keyVals ++ Seq(1, ou, ov, RowKind.UpdateBefore, seq0)),
          Row.fromSeq(keyVals ++ Seq(1, nu, nv, RowKind.UpdateAfter,
            seq0 + 1))))
      case (Some((ou, ov)), None) =>
        (seq0 + 2, Seq(Row.fromSeq(keyVals ++ Seq(1, ou, ov,
          RowKind.Delete, seq0))))
    }

    if (!df.isStreaming) {
      return graft.operators.SecondarySort.mapOrderedGroups(
        df, partitionCols, Seq(col(RowKind.seqCol)), outSchema) {
        (keyVals, rows) =>
          var champ: Option[(Any, Double)] = None
          var seq = 1L
          rows.flatMap { e =>
            val nw = advance(champ, e)
            val (s2, outs) = diff1(keyVals, champ, nw, seq)
            champ = nw
            seq = s2
            outs
          }
      }
    }

    val keySchema = StructType(pIdx.map(df.schema.fields(_)))
    val kEnc: Encoder[Row] = Encoders.row(keySchema)
    val vEnc: Encoder[Row] = Encoders.row(df.schema)
    // O(1) state: emission seq + the single champion
    type S = (Long, Option[(Any, Double)])
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = Encoders.row(outSchema)

    df.as[Row](vEnc)
      .groupByKey(r => Row.fromSeq(pIdx.map(r.get)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Row, rows: Iterator[Row], state: GroupState[S]) =>
          var (seq, champ) = state.getOption.getOrElse(
            (1L, Option.empty[(Any, Double)]))
          val out = Seq.newBuilder[Row]
          rows.toSeq.sortBy(_.getLong(seqIdx)).foreach { e =>
            val nw = advance(champ, e)
            val (s2, outs) = diff1(key.toSeq, champ, nw, seq)
            champ = nw
            seq = s2
            outs.foreach(out += _)
          }
          state.update((seq, champ))
          out.result().iterator
      }(sEnc, oEnc)
  }

  /** Updatable Top-N fast path — the reference's
    * UpdatableTopNFunction.java:63 (the rank strategy StreamExecRank
    * picks for an UPSERT input whose sort field only improves): state
    * per partition key is the N-row RANK BUFFER alone, not the full
    * live-row map — O(N) versus O(live rows).
    *
    * Applicability contract (RankProcessStrategy, enforced loudly):
    * upsert-only envelopes (+I/+U); a BUFFERED key's sort value never
    * decreases (a decreasing update raises — the true successor is
    * unknowable from buffer-only state). A non-buffered key below the
    * buffer floor is ignored: values only improve, so an evicted or
    * never-admitted key ranks below the floor until a LATER envelope
    * lifts it in — which re-admits it then. Same changelog envelope as
    * [[apply]], so sinks and materialization interchange.
    */
  def updatableTopN(
      df: DataFrame,
      partitionCols: Seq[String],
      upsertKeyCol: String,
      valCol: String,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val pIdx = partitionCols.map(df.schema.fieldIndex)
    val ukIdx = df.schema.fieldIndex(upsertKeyCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val kindIdx = df.schema.fieldIndex(RowKind.kindCol)
    val seqIdx = df.schema.fieldIndex(RowKind.seqCol)

    val outSchema = StructType(
      pIdx.map(df.schema.fields(_)) ++ Seq(
        StructField("rank", IntegerType),
        df.schema.fields(ukIdx),
        StructField(valCol, DoubleType),
        StructField(RowKind.kindCol, StringType),
        StructField(RowKind.seqCol, LongType)))

    def rankKey(uk: Any, v: Double): (Double, String) =
      (-v, String.valueOf(uk))

    /** Apply one envelope to the rank buffer. */
    def advance(
        buf: Vector[(Any, Double)], e: Row): Vector[(Any, Double)] = {
      val kind = e.getString(kindIdx)
      require(kind == RowKind.Insert || kind == RowKind.UpdateAfter,
        s"UpdatableTopN is an UPSERT-only fast path; envelope kind " +
          s"$kind requires the retractable engine (ChangelogTopN.apply)")
      val uk = e.get(ukIdx)
      val str = String.valueOf(uk)
      val v = e.getAs[Number](vIdx).doubleValue()
      val at = buf.indexWhere { case (bu, _) => String.valueOf(bu) == str }
      if (at >= 0) {
        require(v >= buf(at)._2,
          s"UpdatableTopN requires non-decreasing sort values for " +
            s"buffered keys; $uk worsened ${buf(at)._2} -> $v — use the " +
            "retractable engine (ChangelogTopN.apply)")
        (buf.updated(at, (uk, v))).sortBy { case (u, x) => rankKey(u, x) }
      } else if (buf.length < n)
        (buf :+ ((uk, v))).sortBy { case (u, x) => rankKey(u, x) }
      else {
        val floor = buf.last
        if (Ordering[(Double, String)].lt(rankKey(uk, v),
            rankKey(floor._1, floor._2)))
          (buf.init :+ ((uk, v))).sortBy { case (u, x) => rankKey(u, x) }
        else buf // below the floor: can only re-enter by improving later
      }
    }

    if (!df.isStreaming) {
      return graft.operators.SecondarySort.mapOrderedGroups(
        df, partitionCols, Seq(col(RowKind.seqCol)), outSchema) {
        (keyVals, rows) =>
          var buf = Vector.empty[(Any, Double)]
          var seq = 1L
          rows.flatMap { e =>
            val nw = advance(buf, e)
            val (s2, outs) = diff(keyVals, buf, nw, seq)
            buf = nw
            seq = s2
            outs
          }
      }
    }

    val keySchema = StructType(pIdx.map(df.schema.fields(_)))
    val kEnc: Encoder[Row] = Encoders.row(keySchema)
    val vEnc: Encoder[Row] = Encoders.row(df.schema)
    // O(N) state: emission seq + the rank buffer
    type S = (Long, Vector[(Any, Double)])
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = Encoders.row(outSchema)

    df.as[Row](vEnc)
      .groupByKey(r => Row.fromSeq(pIdx.map(r.get)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Row, rows: Iterator[Row], state: GroupState[S]) =>
          var (seq, buf) = state.getOption.getOrElse(
            (1L, Vector.empty[(Any, Double)]))
          val out = Seq.newBuilder[Row]
          rows.toSeq.sortBy(_.getLong(seqIdx)).foreach { e =>
            val nw = advance(buf, e)
            val (s2, outs) = diff(key.toSeq, buf, nw, seq)
            buf = nw
            seq = s2
            outs.foreach(out += _)
          }
          state.update((seq, buf))
          out.result().iterator
      }(sEnc, oEnc)
  }
}
