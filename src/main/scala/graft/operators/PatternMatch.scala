package graft.operators

import graft.streaming.{GraftPTF, ProcessTableFunction}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** One element of a row-pattern: `name` labels the step's count in the
  * output, `pred(prevValue, curValue)` is a PREV-semantics predicate over
  * the measure column, `greedy` makes it a one-or-more `X+` quantifier
  * (false = exactly one row), and `minCount` raises the quantifier to
  * `X{n,}` — the step must match at least `n` rows before the pattern may
  * advance past it or complete. */
final case class PatternStep(
    name: String,
    pred: (Double, Double) => Boolean,
    greedy: Boolean,
    minCount: Int = 1) extends Serializable

/** Generalized MATCH_RECOGNIZE over measure-based consecutive-row
  * predicates: a parameterized pattern `S1[+] S2[+] … Sn[+]` with greedy
  * quantifiers and AFTER MATCH SKIP PAST LAST ROW.
  *
  * Reference: the CEP NFA (flink-libraries/flink-cep/…/cep/nfa/NFA.java:76)
  * and StreamExecMatch.java:61. Scope vs the reference (documented delta):
  * deterministic greedy matching WITHOUT backtracking or a shared buffer —
  * each row extends the current step if its predicate holds, else enters
  * the next step, else the partial match aborts and the row is re-tested
  * as a fresh pattern start. This is exact for transition-exclusive
  * patterns (the falling/rising family); arbitrary quantifier nesting and
  * PERMUTE remain out of scope.
  *
  * Output: one row per match — key, start time (the anchor row the first
  * step compared against), end time (last matched row), one `n_<name>`
  * count per step.
  *
  * Batch face: SecondarySort streamed replay (O(pattern) per-key heap).
  * Streaming face: the PTF hook, NFA registers as state; a greedy-final
  * match completes when a row breaks it (batch completes it at group end).
  */
object PatternMatch {

  /** NFA registers — serializable for the streaming PTF state. */
  final case class NfaState(
      stepIdx: Int,
      counts: Vector[Long],
      startT: Long,
      prevT: Long,
      prevV: Double,
      havePrev: Boolean)

  private def initial(n: Int): NfaState =
    NfaState(-1, Vector.fill(n)(0L), 0L, 0L, 0.0, havePrev = false)

  /** Counts only grow via the greedy-extension branch of [[advance]], so a
    * non-greedy step with `minCount > 1` could never satisfy its minimum —
    * such a pattern would silently never match. Fail loudly instead
    * (ADVICE r3). */
  private def validate(steps: Seq[PatternStep]): Unit = {
    require(steps.nonEmpty, "pattern needs at least one step")
    val bad = steps.filter(s => !s.greedy && s.minCount > 1)
    require(bad.isEmpty,
      s"non-greedy steps match exactly one row; minCount > 1 is " +
        s"unsatisfiable for: ${bad.map(_.name).mkString(", ")} " +
        "(make the step greedy to use X{n,})")
  }

  /** Feed one (time, value) row; returns the advanced state and an
    * optional completed match (start, end, counts). */
  private def advance(
      steps: IndexedSeq[PatternStep],
      st: NfaState,
      t: Long,
      v: Double): (NfaState, Option[(Long, Long, Vector[Long])]) = {
    if (!st.havePrev)
      return (st.copy(prevT = t, prevV = v, havePrev = true), None)
    val p = st.prevV
    val zero = Vector.fill(steps.length)(0L)
    var s = st
    var out: Option[(Long, Long, Vector[Long])] = None
    def tryStart(cur: NfaState): NfaState =
      if (steps(0).pred(p, v))
        cur.copy(stepIdx = 0, counts = zero.updated(0, 1L), startT = cur.prevT)
      else cur.copy(stepIdx = -1)
    if (s.stepIdx < 0) s = tryStart(s)
    else {
      val curStep = steps(s.stepIdx)
      // the pattern may only advance past / complete the current step once
      // its X{n,} minimum is satisfied
      val minMet = s.counts(s.stepIdx) >= curStep.minCount
      if (curStep.greedy && curStep.pred(p, v))
        s = s.copy(counts = s.counts.updated(s.stepIdx, s.counts(s.stepIdx) + 1))
      else if (minMet && s.stepIdx + 1 < steps.length &&
          steps(s.stepIdx + 1).pred(p, v)) {
        val ni = s.stepIdx + 1
        s = s.copy(stepIdx = ni, counts = s.counts.updated(ni, 1L))
        if (ni == steps.length - 1 && !steps(ni).greedy &&
            steps(ni).minCount <= 1) {
          out = Some((s.startT, t, s.counts)) // non-greedy final: done here
          s = s.copy(stepIdx = -1)
        }
      } else if (s.stepIdx == steps.length - 1 && minMet) {
        out = Some((s.startT, s.prevT, s.counts)) // greedy final ended at prev
        s = tryStart(s.copy(stepIdx = -1)) // SKIP PAST LAST ROW
      } else {
        s = tryStart(s.copy(stepIdx = -1)) // abort, re-test as fresh start
      }
    }
    (s.copy(prevT = t, prevV = v, havePrev = true), out)
  }

  /** A greedy-final match still open when the input ends (batch only). */
  private def flush(
      steps: IndexedSeq[PatternStep],
      st: NfaState): Option[(Long, Long, Vector[Long])] =
    if (st.stepIdx == steps.length - 1 && steps(st.stepIdx).greedy &&
        st.counts(st.stepIdx) >= steps(st.stepIdx).minCount)
      Some((st.startT, st.prevT, st.counts))
    else None

  private def outSchema(df: DataFrame, keyCol: String,
      steps: Seq[PatternStep]): StructType =
    StructType(
      df.schema(keyCol) +:
        StructField("start_us", LongType) +:
        StructField("end_us", LongType) +:
        steps.map(s => StructField(s"n_${s.name}", LongType)))

  /** Batch face. `timeCol` must be LongType (exact micros); ties must be
    * pre-deduplicated for determinism. */
  def apply(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      steps: Seq[PatternStep]): DataFrame = {
    validate(steps)
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val stepsArr = steps.toIndexedSeq
    val schema = outSchema(df, keyCol, steps)
    SecondarySort.mapOrderedGroups(
      df, Seq(keyCol), Seq(col(timeCol)), schema) { (key, rows) =>
      var st = initial(stepsArr.length)
      val matches = rows.flatMap { r =>
        val (s2, m) = advance(stepsArr, st, r.getLong(tIdx), r.getDouble(vIdx))
        st = s2
        m.map { case (a, b, c) =>
          Row.fromSeq(key.head +: a +: b +: c)
        }
      }
      matches ++ flush(stepsArr, st).iterator.map { case (a, b, c) =>
        Row.fromSeq(key.head +: a +: b +: c)
      }
    }
  }

  /** Streaming face on the PTF hook: NFA registers persist as keyed state;
    * rows are ordered within each micro-batch slice (cross-batch order is
    * the source's responsibility, as for every keyed CEP consumer). */
  def streaming(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      steps: Seq[PatternStep]): DataFrame = {
    validate(steps)
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val stepsArr = steps.toIndexedSeq
    val schema = outSchema(df, keyCol, steps)
    val ptf = new GraftPTF[NfaState] {
      def process(
          key: Row,
          rows: Iterator[Row],
          state: Option[NfaState],
          watermarkMs: Long): (Option[NfaState], Seq[Row], Option[Long]) = {
        var st = state.getOrElse(initial(stepsArr.length))
        val out = Seq.newBuilder[Row]
        rows.toSeq.sortBy(_.getLong(tIdx)).foreach { r =>
          val (s2, m) =
            advance(stepsArr, st, r.getLong(tIdx), r.getDouble(vIdx))
          st = s2
          m.foreach { case (a, b, c) =>
            out += Row.fromSeq(key.get(0) +: a +: b +: c)
          }
        }
        (Some(st), out.result(), None)
      }
    }
    ProcessTableFunction(df, Seq(keyCol), schema, ptf)
  }
}
