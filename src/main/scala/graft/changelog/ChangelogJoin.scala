package graft.changelog

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Changelog-consuming equi-join: both inputs are changelogs (`__rowkind` +
  * `__seq`), the output is an UPSERT changelog of joined rows keyed by
  * (left upsert key, right upsert key) — `+U` when a pairing (re)appears,
  * `-D` when a pairing dies. This is the tier that lets agg→join pipelines
  * compose: e.g. joining two continuously-updated aggregates (VERDICT r2
  * gap #1).
  *
  * Reference: RT/operators/join/stream/StreamingJoinOperator.java:38 —
  * two-input co-processing with per-side join-state views
  * (…/join/stream/state/JoinRecordStateViews.java); this is the
  * InputSideHasUniqueKey view: state = live row per upsert key per side,
  * scoped to the join key.
  *
  * Spark-first mapping (no two-input stateful operator exists): the
  * StreamingTemporalJoin union-envelope pattern — both sides are wrapped in
  * a common envelope, unioned, hash-shuffled ONCE on the join key, and
  * co-processed per key. On an accumulate (`+I`/`+U`) the row is upserted
  * into its side's state and emits `+U` against every live row of the
  * other side; on a retract (`-U`/`-D`) it is removed and emits `-D` for
  * each pairing it participated in.
  *
  * Output `__seq` = 2 × (triggering input row's `__seq`) + 1 for
  * accumulates, + 0 for retracts — an update's `-U`/`+U` pair shares one
  * input seq, and the doubling keeps "pairing died" vs "pairing reborn at
  * the same instant" ordered for downstream keep-last materialization.
  * Contract: the two inputs' `__seq` values come from ONE global sequence
  * domain with unique values per change (a CDC log position) — the same
  * assumption the reference makes when it trusts upstream changelog order.
  * Seq-domain headroom: each changelog tier maps seq → 2·seq + krank, so
  * chaining k tiers multiplies the domain by 2^k; inputs must keep their
  * seq values below Long.MaxValue / 2^k (a CDC log position has ~19 digits
  * of headroom — far beyond any real log — but a caller packing bits into
  * the high end of the Long would overflow silently).
  * Inputs must be FULL changelogs (with `-U` pre-images): a join-key-
  * changing update's `-U` is what reaches the OLD join-key group to kill
  * its pairings.
  *
  * Scale: one shuffle on the join key; state = live rows per join key per
  * side (exactly the reference's bound); a hot join key costs its join
  * product — inherent to join semantics, AQE-visible as ordinary key skew.
  * Batch face: secondary-sorted replay (external sort, streamed groups,
  * O(live rows per key) heap) emitting the FULL changelog. Streaming
  * face: sorts only within a micro-batch's per-key slice and emits the
  * NET change per touched pairing per micro-batch (r19) — intra-batch
  * churn (outer pads born and retracted by a later event of the same
  * batch, an update chain's intermediate images) folds away, exactly the
  * reference's minibatch join suppression
  * (MiniBatchStreamingJoinOperator.java:234, bundle/
  * JoinKeyContainsUniqueKeyBundle.java); keep-last materialization and
  * signed aggregation read identical results from either emission form.
  */
object ChangelogJoin {

  /** Pairing identity of an emitted join row: each slot holds that
    * side's upsert-key value, or [[PadSlot]] for the null-padded side of
    * an outer-join pad row (a sentinel, so a genuinely-NULL key value
    * cannot collide with a pad). */
  private final case class PairKey(l: Any, r: Any)
  private case object PadSlot

  def apply(
      left: DataFrame,
      right: DataFrame,
      leftJoinKey: String,
      rightJoinKey: String,
      leftKey: String,
      rightKey: String): DataFrame =
    apply(left, right, leftJoinKey, rightJoinKey, leftKey, rightKey,
      joinType = "inner")

  /** @param joinType "inner" | "left" | "right" | "full" — the outer
    *        variants pad an unmatched row with nulls and RETRACT the
    *        padded row the moment a match appears (re-padding when the
    *        last match dies) — the reference's streaming outer-join
    *        null-padding protocol (StreamingJoinOperator's outerJoin
    *        paths). Padded rows materialize under (leftKey, NULL) /
    *        (NULL, rightKey), so keep-last by (leftKey, rightKey) yields
    *        exactly the SQL OUTER JOIN of the final states. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftJoinKey: String,
      rightJoinKey: String,
      leftKey: String,
      rightKey: String,
      joinType: String): DataFrame =
    apply(left, right, leftJoinKey, rightJoinKey, leftKey, rightKey,
      joinType, idleTtlMs = None)

  /** @param idleTtlMs streaming-face idle-state retention — the
    *        reference's `table.exec.state.ttl` (processing-time based):
    *        a join key receiving no events for this long has BOTH sides'
    *        live-row state dropped. The documented correctness trade is
    *        the reference's own: events arriving after expiry re-pair
    *        against the post-expiry state only. None (default) keeps
    *        state for the stream's lifetime — exact join semantics. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftJoinKey: String,
      rightJoinKey: String,
      leftKey: String,
      rightKey: String,
      joinType: String,
      idleTtlMs: Option[Long]): DataFrame = {
    require(Seq("inner", "left", "right", "full").contains(joinType),
      s"unsupported joinType: $joinType")
    // padLeft: unmatched LEFT rows survive null-padded (left/full outer);
    // padRight: unmatched RIGHT rows survive null-padded (right/full)
    val padLeft = joinType == "left" || joinType == "full"
    val padRight = joinType == "right" || joinType == "full"

    val metaCols = Set(RowKind.kindCol, RowKind.seqCol)
    val lPayF = left.schema.fields.filterNot(f => metaCols(f.name))
    val rPayF = right.schema.fields.filterNot(f => metaCols(f.name))
    val clash = lPayF.map(_.name).toSet.intersect(rPayF.map(_.name).toSet)
    require(clash.isEmpty, s"column name clash across sides: $clash")
    // mismatched key types would only surface later as an opaque
    // unionByName failure on the __jk envelope column — check up front
    val lJkType = left.schema(leftJoinKey).dataType
    val rJkType = right.schema(rightJoinKey).dataType
    require(lJkType == rJkType,
      s"join key types differ: $leftJoinKey is $lJkType but " +
        s"$rightJoinKey is $rJkType — cast one side explicitly")

    val lType = StructType(lPayF)
    val rType = StructType(rPayF)
    // outer variants pad a payload with nulls — force nullability
    val lPayOut =
      if (padRight) lPayF.map(_.copy(nullable = true)) else lPayF
    val rPayOut =
      if (padLeft) rPayF.map(_.copy(nullable = true)) else rPayF
    val outSchema = StructType(
      (lPayOut ++ rPayOut) :+
        StructField(RowKind.kindCol, StringType) :+
        StructField(RowKind.seqCol, LongType))

    val lkIdx = lPayF.indexWhere(_.name == leftKey)
    val rkIdx = rPayF.indexWhere(_.name == rightKey)
    require(lkIdx >= 0 && rkIdx >= 0, "upsert key must be a payload column")

    // __krank orders a retract before the accumulate that shares its seq
    // (an update's -U/+U pair) during the per-key replay.
    val krank = when(
      col(RowKind.kindCol) === RowKind.UpdateBefore ||
        col(RowKind.kindCol) === RowKind.Delete, 0).otherwise(1)
    // SQL inner-equi-join semantics: NULL join keys never match — drop
    // them before the shuffle (they would otherwise co-group and pair)
    val lNn = left.where(col(leftJoinKey).isNotNull)
    val rNn = right.where(col(rightJoinKey).isNotNull)
    val lEnv = lNn.select(
      col(leftJoinKey).as("__jk"),
      lit(0).as("__side"),
      col(RowKind.seqCol).as("__seqe"),
      col(RowKind.kindCol).as("__kind"),
      krank.as("__krank"),
      struct(lPayF.map(f => col(f.name)): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rEnv = rNn.select(
      col(rightJoinKey).as("__jk"),
      lit(1).as("__side"),
      col(RowKind.seqCol).as("__seqe"),
      col(RowKind.kindCol).as("__kind"),
      krank.as("__krank"),
      lit(null).cast(lType).as("__l"),
      struct(rPayF.map(f => col(f.name)): _*).as("__r"))
    val env = lEnv.unionByName(rEnv, allowMissingColumns = false)

    type SideState = scala.collection.mutable.LinkedHashMap[Any, Seq[Any]]

    val rNulls: Seq[Any] = rPayF.map(_ => null).toSeq
    val lNulls: Seq[Any] = lPayF.map(_ => null).toSeq

    // Join-state transition step shared by both faces. Envelope layout:
    // 0 __jk, 1 __side, 2 __seqe, 3 __kind, 4 __krank, 5 __l, 6 __r.
    // Padding protocol (symmetric): a side's rows are null-padded while
    // the OTHER side's state is empty; the first arriving match retracts
    // every pad, the last dying match restores them.
    // Each emission is tagged with its pairing identity ([[PairKey]]) so
    // the streaming face can net out intra-batch churn (below); the
    // batch face drops the tag.
    def step(e: Row, lState: SideState, rState: SideState)
        : Seq[(PairKey, Row)] = {
      val kind = e.getString(3)
      val retract =
        kind == RowKind.UpdateBefore || kind == RowKind.Delete
      val outSeq = 2 * e.getLong(2) + (if (retract) 0L else 1L)
      def pair(l: Seq[Any], r: Seq[Any], k: String): (PairKey, Row) =
        (PairKey(l(lkIdx), r(rkIdx)),
          Row.fromSeq(l ++ r :+ k :+ outSeq))
      def lPad(l: Seq[Any], k: String): (PairKey, Row) =
        (PairKey(l(lkIdx), PadSlot),
          Row.fromSeq(l ++ rNulls :+ k :+ outSeq))
      def rPad(r: Seq[Any], k: String): (PairKey, Row) =
        (PairKey(PadSlot, r(rkIdx)),
          Row.fromSeq(lNulls ++ r :+ k :+ outSeq))
      if (e.getInt(1) == 0) {
        val pay = e.getStruct(5).toSeq
        val k = pay(lkIdx)
        if (retract) lState.remove(k) match {
          case Some(old) =>
            if (rState.isEmpty)
              if (padLeft) Seq(lPad(old, RowKind.Delete)) else Nil
            else {
              val outs =
                rState.values.map(pair(old, _, RowKind.Delete)).toSeq
              // last left row gone: right rows become unmatched again
              if (padRight && lState.isEmpty)
                outs ++ rState.values.map(rPad(_, RowKind.UpdateAfter))
              else outs
            }
          case None => Nil
        } else {
          val wasLEmpty = lState.isEmpty
          lState.update(k, pay)
          if (rState.isEmpty)
            if (padLeft) Seq(lPad(pay, RowKind.UpdateAfter)) else Nil
          else {
            val outs =
              rState.values.map(pair(pay, _, RowKind.UpdateAfter)).toSeq
            // first left row: the right side stops being unmatched
            if (padRight && wasLEmpty)
              rState.values.map(rPad(_, RowKind.Delete)).toSeq ++ outs
            else outs
          }
        }
      } else {
        val pay = e.getStruct(6).toSeq
        val k = pay(rkIdx)
        if (retract) rState.remove(k) match {
          case Some(old) =>
            if (lState.isEmpty)
              if (padRight) Seq(rPad(old, RowKind.Delete)) else Nil
            else {
              val outs =
                lState.values.map(pair(_, old, RowKind.Delete)).toSeq
              // last match died: every left row becomes unmatched again
              if (padLeft && rState.isEmpty)
                outs ++ lState.values.map(lPad(_, RowKind.UpdateAfter))
              else outs
            }
          case None => Nil
        } else {
          val wasREmpty = rState.isEmpty
          rState.update(k, pay)
          if (lState.isEmpty)
            if (padRight) Seq(rPad(pay, RowKind.UpdateAfter)) else Nil
          else {
            val outs =
              lState.values.map(pair(_, pay, RowKind.UpdateAfter)).toSeq
            // first match appeared: retract the left pads
            if (padLeft && wasREmpty)
              lState.values.map(lPad(_, RowKind.Delete)).toSeq ++ outs
            else outs
          }
        }
      }
    }

    if (!env.isStreaming) {
      return graft.operators.SecondarySort.mapOrderedGroups(
        env, Seq("__jk"), Seq(col("__seqe"), col("__krank"), col("__side")),
        outSchema) { (_, rows) =>
        val lState: SideState = scala.collection.mutable.LinkedHashMap.empty
        val rState: SideState = scala.collection.mutable.LinkedHashMap.empty
        rows.flatMap(e => step(e, lState, rState).map(_._2))
      }
    }

    // The final image of pairing `pk` under side states (l, r): Some(
    // payload) when alive, None when dead. Pads are alive only while the
    // other side's state is empty (the padding protocol above).
    def image(
        pk: PairKey,
        l: scala.collection.Map[Any, Seq[Any]],
        r: scala.collection.Map[Any, Seq[Any]]): Option[Seq[Any]] =
      (pk.l, pk.r) match {
        case (PadSlot, rk) =>
          if (padRight && l.isEmpty) r.get(rk).map(lNulls ++ _) else None
        case (lk, PadSlot) =>
          if (padLeft && r.isEmpty) l.get(lk).map(_ ++ rNulls) else None
        case (lk, rk) =>
          for { lp <- l.get(lk); rp <- r.get(rk) } yield lp ++ rp
      }

    val jkField = env.schema.fields(0)
    val kEnc: Encoder[Row] = Encoders.row(StructType(Seq(jkField)))
    val vEnc: Encoder[Row] = Encoders.row(env.schema)
    // state: (left live rows, right live rows) as upsertKey -> payload
    type S = (Map[Any, Seq[Any]], Map[Any, Seq[Any]])
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = Encoders.row(outSchema)

    val timeoutConf = idleTtlMs match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    env.as[Row](vEnc)
      .groupByKey(r => Row(r.get(0)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), timeoutConf) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          if (state.hasTimedOut) {
            // idle TTL expired: drop both sides' live rows (state.ttl)
            state.remove()
            Iterator.empty
          } else {
            val old = state.getOption.getOrElse(
              (Map.empty[Any, Seq[Any]], Map.empty[Any, Seq[Any]]))
            val lState: SideState =
              scala.collection.mutable.LinkedHashMap.from(old._1)
            val rState: SideState =
              scala.collection.mutable.LinkedHashMap.from(old._2)
            // Net emission per micro-batch (r19, guide §2.3 "shuffle
            // fewer bytes"; ref MiniBatchStreamingJoinOperator.java:234 —
            // the reference's minibatch join folds redundant changelog
            // pairs the same way): replay the batch slice through the
            // shared step to advance state and learn WHICH pairings it
            // touches, then emit only each touched pairing's pre→post
            // transition — `-D`(pre) / `+U`(post) when the image changed,
            // nothing when it ends where it started. Intra-batch churn
            // (an outer pad born and retracted by a later event of the
            // same batch, an update's intermediate images) never reaches
            // the shuffle or the sink MERGE. Net-vs-eager equivalence for
            // both downstream consumers: keep-last materialization reads
            // the same final image per pairing, and signed aggregation
            // reads the same net contribution (the dropped +U/-D pairs
            // cancel exactly). Seq stamps keep the retract-slot protocol:
            // -D at 2·s, +U at 2·s+1 of the pairing's last touching event.
            val out = scala.collection.mutable.ArrayBuffer.empty[Row]
            val touched =
              scala.collection.mutable.LinkedHashMap.empty[PairKey, Long]
            rows.toSeq
              .sortBy(e => (e.getLong(2), e.getInt(4), e.getInt(1)))
              .foreach { e =>
                step(e, lState, rState).foreach { case (pk, row) =>
                  touched.update(pk, row.getLong(row.length - 1))
                }
              }
            touched.foreach { case (pk, lastSeq) =>
              val pre = image(pk, old._1, old._2)
              val post = image(pk, lState, rState)
              if (pre != post) {
                pre.foreach(p => out +=
                  Row.fromSeq(p :+ RowKind.Delete :+ (lastSeq & ~1L)))
                post.foreach(p => out +=
                  Row.fromSeq(p :+ RowKind.UpdateAfter :+ (lastSeq | 1L)))
              }
            }
            if (lState.isEmpty && rState.isEmpty) state.remove()
            else {
              state.update((lState.toMap, rState.toMap))
              idleTtlMs.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }(sEnc, oEnc)
  }
}
