package graft.changelog

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Changelog-consuming SEMI / ANTI join — the reference's
  * StreamingSemiAntiJoinOperator (RT/operators/join/stream/
  * StreamingSemiAntiJoinOperator.java:38): IN / EXISTS (semi) and
  * NOT EXISTS (anti) over two changelog inputs. A left row is LIVE in
  * the output while the right side has ≥1 (semi) / exactly 0 (anti)
  * live rows under its join key — and right-side changes FLIP whole
  * key groups: the first right insert emits every held left row (semi)
  * or retracts it (anti), the last right delete does the inverse.
  *
  * Inputs follow the [[ChangelogJoin]] contract: full changelogs with
  * `__rowkind`/`__seq` on one global seq domain (an update is a -U/+U
  * pair; `-U` must reach the OLD join-key group). Left value updates
  * surface as -D/+I pairs in the output (equivalent under keep-last
  * materialization by the left upsert key, which reproduces exactly
  * `SELECT * FROM left_final WHERE [NOT] EXISTS right_final`).
  *
  * Output `__seq` = 2 × (triggering envelope's input `__seq`) + krank
  * (0 retract / 1 accumulate) — [[ChangelogJoin]]'s scheme, NOT a
  * per-key-group counter: a left update whose -U and +U land in
  * DIFFERENT join-key groups must still order its output -D before its
  * +I on the one global domain, or keep-last materialization by the
  * left upsert key could keep the -D over the +I (dropping a live semi
  * row / resurrecting a dead anti row). Same 2^k-per-tier headroom
  * contract as ChangelogJoin.
  *
  * State: left live rows + the right live upsert-key set per join key —
  * the reference's bound (it keeps right rows with counters). One hash
  * shuffle on the join key; a right 0↔1 flip costs O(left rows under
  * that key) emissions, which is the semantic output size.
  */
object ChangelogSemiJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      leftJoinKey: String,
      rightJoinKey: String,
      rightKey: String,
      anti: Boolean): DataFrame =
    apply(left, right, leftJoinKey, rightJoinKey, rightKey, anti,
      idleTtlMs = None)

  /** @param idleTtlMs streaming-face idle-state retention
    *        (`table.exec.state.ttl`, processing-time based, as on
    *        ChangelogJoin): a join key silent for this long drops BOTH
    *        sides' state (live left rows + right key set); post-expiry
    *        envelopes re-pair against post-expiry state only. None =
    *        exact semantics, state for the stream's lifetime. */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftJoinKey: String,
      rightJoinKey: String,
      rightKey: String,
      anti: Boolean,
      idleTtlMs: Option[Long]): DataFrame = {
    val metaCols = Set(RowKind.kindCol, RowKind.seqCol)
    val lPayF = left.schema.fields.filterNot(f => metaCols(f.name))
    require(left.schema(leftJoinKey).dataType ==
      right.schema(rightJoinKey).dataType,
      "join key types differ — cast one side explicitly")

    val outSchema = StructType(
      lPayF :+
        StructField(RowKind.kindCol, StringType) :+
        StructField(RowKind.seqCol, LongType))

    val krank = when(
      col(RowKind.kindCol) === RowKind.UpdateBefore ||
        col(RowKind.kindCol) === RowKind.Delete, 0).otherwise(1)
    val lNn = left.where(col(leftJoinKey).isNotNull)
    val rNn = right.where(col(rightJoinKey).isNotNull)
    val lEnv = lNn.select(
      col(leftJoinKey).as("__jk"),
      lit(0).as("__side"),
      col(RowKind.seqCol).as("__seqe"),
      col(RowKind.kindCol).as("__kind"),
      krank.as("__krank"),
      struct(lPayF.map(f => col(f.name)): _*).as("__l"),
      col(leftJoinKey).cast("string").as("__ruk")) // unused on left
    val rEnv = rNn.select(
      col(rightJoinKey).as("__jk"),
      lit(1).as("__side"),
      col(RowKind.seqCol).as("__seqe"),
      col(RowKind.kindCol).as("__kind"),
      krank.as("__krank"),
      lit(null).cast(StructType(lPayF)).as("__l"),
      col(rightKey).cast("string").as("__ruk"))
    val env = lEnv.unionByName(rEnv)

    val lIdx = 5
    val rukIdx = 6

    def isRetract(kind: String): Boolean =
      kind == RowKind.UpdateBefore || kind == RowKind.Delete

    // shared replay step: returns output rows for one envelope.
    // lState: left payloads by their full value (a multiset via count);
    // rSet: live right upsert keys. `cond` = does a left row belong in
    // the output right now.
    final case class St(
        lState: scala.collection.mutable.LinkedHashMap[Seq[Any], Long],
        rSet: scala.collection.mutable.LinkedHashSet[String])

    def cond(st: St): Boolean = if (anti) st.rSet.isEmpty else st.rSet.nonEmpty

    def emit(pay: Seq[Any], kind: String, seq: Long): Row =
      Row.fromSeq(pay :+ kind :+ seq)

    def step(st: St, e: Row): Seq[Row] = {
      val retract = isRetract(e.getString(3))
      // global output seq: 2·(input seq) + krank — cross-group ordered
      val outSeq = 2L * e.getLong(2) + e.getInt(4)
      if (e.getInt(1) == 0) {
        // left row
        val pay = e.getStruct(lIdx).toSeq
        if (retract) {
          st.lState.get(pay).foreach { c =>
            if (c <= 1) st.lState.remove(pay) else st.lState.update(pay, c - 1)
          }
          if (cond(st)) Seq(emit(pay, RowKind.Delete, outSeq)) else Nil
        } else {
          st.lState.update(pay, st.lState.getOrElse(pay, 0L) + 1)
          if (cond(st)) Seq(emit(pay, RowKind.Insert, outSeq)) else Nil
        }
      } else {
        // right row: only 0 <-> >0 transitions flip the key group
        val before = cond(st)
        val ruk = e.getString(rukIdx)
        if (retract) st.rSet.remove(ruk) else st.rSet.add(ruk)
        val after = cond(st)
        if (before == after) Nil
        else {
          val kind = if (after) RowKind.Insert else RowKind.Delete
          st.lState.iterator.flatMap { case (pay, c) =>
            (1L to c).map(_ => emit(pay, kind, outSeq))
          }.toSeq
        }
      }
    }

    if (!env.isStreaming) {
      return graft.operators.SecondarySort.mapOrderedGroups(
        env, Seq("__jk"), Seq(col("__seqe"), col("__krank"), col("__side")),
        outSchema) { (_, rows) =>
        val st = St(
          scala.collection.mutable.LinkedHashMap.empty,
          scala.collection.mutable.LinkedHashSet.empty)
        rows.flatMap(step(st, _))
      }
    }

    val jkField = env.schema.fields(0)
    val kEnc: Encoder[Row] = Encoders.row(StructType(Seq(jkField)))
    val vEnc: Encoder[Row] = Encoders.row(env.schema)
    type S = (Map[Seq[Any], Long], Set[String])
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = Encoders.row(outSchema)

    env.as[Row](vEnc)
      .groupByKey(r => Row(r.get(0)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), idleTtlMs match {
          case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
          case None => GroupStateTimeout.NoTimeout()
        }) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          if (state.hasTimedOut) {
            // idle TTL: the reference's state.ttl drop — both sides'
            // live state for the silent join key goes away
            state.remove()
            Iterator.empty
          } else {
            val (lM, rS) = state.getOption.getOrElse(
              (Map.empty[Seq[Any], Long], Set.empty[String]))
            val st = St(
              scala.collection.mutable.LinkedHashMap.from(lM),
              scala.collection.mutable.LinkedHashSet.from(rS))
            val out = rows.toSeq
              .sortBy(e => (e.getLong(2), e.getInt(4), e.getInt(1)))
              .flatMap(step(st, _))
            if (st.lState.isEmpty && st.rSet.isEmpty) state.remove()
            else {
              state.update((st.lState.toMap, st.rSet.toSet))
              idleTtlMs.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }(sEnc, oEnc)
  }
}
