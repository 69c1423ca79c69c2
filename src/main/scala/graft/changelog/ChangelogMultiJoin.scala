package graft.changelog

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Changelog-consuming N-ary INNER join in ONE stateful operator — the
  * reference's StreamingMultiJoinOperator (RT/operators/join/stream/
  * StreamingMultiJoinOperator.java:66, planned by
  * flink-table-planner/…/exec/stream/StreamExecMultiJoin.java:78): n
  * changelog inputs equi-joined on a COMMON key, co-processed so the
  * operator's state is the live rows of each INPUT — never a
  * materialized intermediate join. A binary chain `(A ⋈ B) ⋈ C` keeps
  * O(|A ⋈ B|) pair state in the middle operator; this keeps
  * O(|A|+|B|+|C|), the reference's headline win for 3+-way changelog
  * star joins (its common-join-key requirement carries over: all inputs
  * must join on the same key, which also makes ONE hash shuffle enough).
  *
  * Per envelope from input i: the new (accumulate) or removed (retract)
  * row is crossed with every OTHER input's live rows under the key —
  * the reference's recursiveMultiJoin walk — emitting `+I`/`-D` joined
  * deltas with multiset multiplicity. Output `__seq` =
  * 2 × (triggering input `__seq`) + krank, [[ChangelogJoin]]'s
  * global-domain scheme, so keep-last materialization by the
  * concatenated upsert keys reproduces the SQL n-way inner join of the
  * final states. Inputs follow the [[ChangelogJoin]] contract (full
  * changelogs, one global seq domain, -U pre-images reach the old key).
  *
  * Scale: one shuffle on the join key for ALL inputs; a hot key costs
  * its join product — inherent to join semantics. Batch face replays
  * key groups via external secondary sort; streaming face holds per-key
  * multisets in flatMapGroupsWithState.
  */
object ChangelogMultiJoin extends Serializable {

  /** @param inputs (changelog, joinKeyCol) per side — payload column
    *        names must be unique across sides (alias upstream). */
  def apply(inputs: Seq[(DataFrame, String)]): DataFrame = {
    require(inputs.size >= 2, "multi-join needs at least two inputs")
    val metaCols = Set(RowKind.kindCol, RowKind.seqCol)
    val n = inputs.size
    val payF: Seq[Array[StructField]] = inputs.map { case (df, _) =>
      df.schema.fields.filterNot(f => metaCols(f.name))
    }
    val allNames = payF.flatten.map(_.name)
    require(allNames.distinct.size == allNames.size,
      s"payload column names must be unique across inputs: " +
        allNames.diff(allNames.distinct).distinct.mkString(", "))
    val jkType = inputs.head._1.schema(inputs.head._2).dataType
    inputs.foreach { case (df, jk) =>
      require(df.schema(jk).dataType == jkType,
        "join key types differ — cast one side explicitly")
    }

    val outSchema = StructType(
      payF.flatten :+
        StructField(RowKind.kindCol, StringType) :+
        StructField(RowKind.seqCol, LongType))

    val krank = when(
      col(RowKind.kindCol) === RowKind.UpdateBefore ||
        col(RowKind.kindCol) === RowKind.Delete, 0).otherwise(1)
    // envelope: 0 __jk, 1 __side, 2 __seqe, 3 __kind, 4 __krank,
    // 5.. one nullable payload struct per side (own side populated)
    val env = inputs.zipWithIndex.map { case ((df, jk), i) =>
      df.where(col(jk).isNotNull).select(
        Seq(
          col(jk).as("__jk"),
          lit(i).as("__side"),
          col(RowKind.seqCol).as("__seqe"),
          col(RowKind.kindCol).as("__kind"),
          krank.as("__krank")) ++
          payF.zipWithIndex.map { case (fs, j) =>
            if (j == i) struct(fs.map(f => col(f.name)).toSeq: _*).as(s"__p$j")
            else lit(null).cast(StructType(fs)).as(s"__p$j")
          }: _*)
    }.reduce(_ unionByName _)

    def isRetract(kind: String): Boolean =
      kind == RowKind.UpdateBefore || kind == RowKind.Delete

    // state: one live-row multiset per input (payload -> count)
    type Side = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]
    def emptySt: Array[Side] =
      Array.fill(n)(scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long])

    // cross the triggering row with every other side's live rows —
    // the reference's recursiveMultiJoin (depth-first over inputs)
    def step(st: Array[Side], e: Row): Seq[Row] = {
      val side = e.getInt(1)
      val retract = isRetract(e.getString(3))
      val outSeq = 2L * e.getLong(2) + e.getInt(4)
      val pay = e.getStruct(5 + side).toSeq
      val own = st(side)
      if (retract) {
        own.get(pay).foreach { c =>
          if (c <= 1) own.remove(pay) else own.update(pay, c - 1)
        }
      } else own.update(pay, own.getOrElse(pay, 0L) + 1)
      val kind = if (retract) RowKind.Delete else RowKind.Insert
      val out = Seq.newBuilder[Row]
      def walk(depth: Int, acc: Vector[Seq[Any]], mult: Long): Unit = {
        if (depth == n) {
          var k = 0L
          while (k < mult) { // multiset multiplicity
            out += Row.fromSeq(acc.flatten :+ kind :+ outSeq)
            k += 1
          }
        } else if (depth == side) walk(depth + 1, acc :+ pay, mult)
        else st(depth).foreach { case (p, c) =>
          walk(depth + 1, acc :+ p, mult * c)
        }
      }
      walk(0, Vector.empty, 1L)
      out.result()
    }

    if (!env.isStreaming) {
      return graft.operators.SecondarySort.mapOrderedGroups(
        env, Seq("__jk"), Seq(col("__seqe"), col("__krank"), col("__side")),
        outSchema) { (_, rows) =>
        val st = emptySt
        rows.flatMap(step(st, _))
      }
    }

    val jkField = env.schema.fields(0)
    val kEnc: Encoder[Row] = Encoders.row(StructType(Seq(jkField)))
    val vEnc: Encoder[Row] = Encoders.row(env.schema)
    type S = Seq[Map[Seq[Any], Long]]
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = Encoders.row(outSchema)

    env.as[Row](vEnc)
      .groupByKey(r => Row(r.get(0)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          val st = emptySt
          state.getOption.foreach(_.zipWithIndex.foreach { case (m, i) =>
            st(i) = scala.collection.mutable.LinkedHashMap.from(m)
          })
          val out = rows.toSeq
            .sortBy(e => (e.getLong(2), e.getInt(4), e.getInt(1)))
            .flatMap(step(st, _))
          if (st.forall(_.isEmpty)) state.remove()
          else state.update(st.map(_.toMap).toSeq)
          out.iterator
      }(sEnc, oEnc)
  }
}
