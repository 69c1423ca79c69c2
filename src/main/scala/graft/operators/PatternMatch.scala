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
  * advance past it or complete.
  *
  * `minCount = 0` makes the step OPTIONAL: `X?` when non-greedy (zero or
  * one row), `X*` when greedy (zero or more). An optional step may be
  * skipped entirely when the pattern advances past it, and trailing
  * optional steps do not block completion. The first step may not be
  * optional (it anchors the match).
  *
  * `reluctant = true` INVERTS the step's match-resolution preference
  * (the SQL `B*?`/`B+?`/`B{n,m}?` reluctant quantifiers — reference
  * docs/content/docs/sql/reference/queries/match_recognize.md:375-446):
  * among a branch's interpretations at one anchor, FEWER rows at this
  * step rank higher instead of more. Reluctance only reorders candidate
  * priority in [[CepNfa]] — which interpretations exist is unchanged. */
final case class PatternStep(
    name: String,
    pred: (Double, Double) => Boolean,
    greedy: Boolean,
    minCount: Int = 1,
    reluctant: Boolean = false) extends Serializable

object PatternStep {

  /** OR-combined condition — the reference's `SimpleCondition.or`
    * (flink-libraries/flink-cep/…/cep/pattern/conditions/RichOrCondition
    * .java): the step matches when ANY branch predicate holds. This is
    * Flink CEP's alternation form for single steps. */
  def or(preds: ((Double, Double) => Boolean)*): (Double, Double) => Boolean =
    (p, c) => preds.exists(_(p, c))
}

/** AFTER MATCH SKIP strategy — reference:
  * flink-libraries/flink-cep/…/cep/nfa/aftermatch/AfterMatchSkipStrategy.java.
  */
sealed trait AfterMatchSkip extends Serializable
object AfterMatchSkip {

  /** Resume after the match's last row; matched rows are consumed
    * (SkipPastLastStrategy.java — the MATCH_RECOGNIZE default here). */
  case object PastLastRow extends AfterMatchSkip

  /** Also emit every overlapping match anchored INSIDE the first step's
    * run (SkipToNextStrategy.java): a completed `A+ …` match at anchor
    * r_0 implies sibling matches anchored at r_1…r_{n-1} — all are
    * emitted at completion, which is what repeatedly skipping to the next
    * row produces for transition-exclusive patterns. Requires keeping the
    * first step's anchor timestamps (the reference's shared-buffer cost,
    * bounded by one run). */
  case object ToNextRow extends AfterMatchSkip

  /** Resume at the FIRST row the given pattern variable matched
    * (SkipToFirstStrategy.java): after a match emits, partial matches
    * whose first row precedes that row are pruned; ones starting AT it
    * survive. With `throwOnMiss = false` (the DataStream API default) a
    * match where the variable matched nothing prunes nothing; with
    * `throwOnMiss = true` (what the reference's SQL path attaches —
    * CommonExecMatch calls `throwExceptionOnMiss()`) such a match
    * raises, as does skipping to the match's own first row (the
    * reference's infinite-loop guard for SKIP TO FIRST of the first
    * variable). Supported by the concurrent-run engine ([[CepNfa]]). */
  final case class ToFirst(variable: String, throwOnMiss: Boolean = false)
    extends AfterMatchSkip

  /** Resume at the LAST row the given pattern variable matched
    * (SkipToLastStrategy.java); otherwise as [[ToFirst]] (`throwOnMiss`
    * raises on a variable miss only — a last-row boundary cannot loop).
    */
  final case class ToLast(variable: String, throwOnMiss: Boolean = false)
    extends AfterMatchSkip
}

/** Generalized MATCH_RECOGNIZE over measure-based consecutive-row
  * predicates: a parameterized pattern `S1[+] S2[+] … Sn[+]` with greedy
  * quantifiers, `X{n,}` minimums, an optional WITHIN bound, and AFTER
  * MATCH SKIP PAST LAST ROW / TO NEXT ROW strategies.
  *
  * Reference: the CEP NFA (flink-libraries/flink-cep/…/cep/nfa/NFA.java:76)
  * and StreamExecMatch.java:61. Scope vs the reference (documented delta):
  * deterministic greedy matching WITHOUT backtracking or concurrent
  * partial matches — each row extends the current step if its predicate
  * holds, else enters the next step, else the partial match aborts and the
  * row is re-tested as a fresh pattern start. This is exact for
  * transition-exclusive patterns (the falling/rising family); arbitrary
  * quantifier nesting and PERMUTE remain out of scope.
  *
  * WITHIN semantics (delta vs the reference's eager partial pruning —
  * documented): the bound `end - start <= withinUs` is enforced at match
  * COMPLETION; an over-budget match is discarded but still consumes its
  * rows under PastLastRow. With ToNextRow each suffix anchor is bounded
  * individually, so a long run still yields its in-budget suffixes — which
  * recovers the useful part of the reference's concurrent-anchor behavior.
  *
  * Output: one row per match — key, start time (the anchor row the first
  * step compared against), end time (last matched row), one `n_<name>`
  * count per step.
  *
  * Batch face: SecondarySort streamed replay (state = NFA registers plus,
  * for ToNextRow only, the current first-step anchor times).
  * Streaming face: the PTF hook, NFA registers as state; a greedy-final
  * match completes when a row breaks it (batch completes it at group end).
  */
object PatternMatch {

  /** NFA registers — serializable for the streaming PTF state. `anchors`
    * holds first-step row times (ToNextRow only; empty otherwise). */
  final case class NfaState(
      stepIdx: Int,
      counts: Vector[Long],
      startT: Long,
      prevT: Long,
      prevV: Double,
      havePrev: Boolean,
      anchors: Vector[Long])

  private def initial(n: Int): NfaState =
    NfaState(-1, Vector.fill(n)(0L), 0L, 0L, 0.0, havePrev = false,
      Vector.empty)

  /** Counts only grow via the greedy-extension branch of [[advance]], so a
    * non-greedy step with `minCount > 1` could never satisfy its minimum —
    * such a pattern would silently never match. Fail loudly instead
    * (ADVICE r3). */
  private def validate(steps: Seq[PatternStep], withinUs: Option[Long]): Unit = {
    require(steps.nonEmpty, "pattern needs at least one step")
    val bad = steps.filter(s => !s.greedy && s.minCount > 1)
    require(bad.isEmpty,
      s"non-greedy steps match exactly one row; minCount > 1 is " +
        s"unsatisfiable for: ${bad.map(_.name).mkString(", ")} " +
        "(make the step greedy to use X{n,})")
    require(steps.head.minCount >= 1,
      "the first step may not be optional (minCount = 0): it anchors the " +
        "match start")
    require(withinUs.forall(_ > 0), "withinUs must be positive")
  }

  /** Steps after `i` are all optional → a match sitting at `i` may
    * complete. */
  private def canComplete(steps: IndexedSeq[PatternStep], i: Int): Boolean =
    (i + 1 until steps.length).forall(steps(_).minCount == 0)

  /** Expand one completed raw match into emitted matches per the skip
    * strategy, applying the WITHIN bound per anchor. */
  private def emitMatches(
      steps: IndexedSeq[PatternStep],
      skip: AfterMatchSkip,
      withinUs: Option[Long],
      start: Long,
      end: Long,
      counts: Vector[Long],
      anchors: Vector[Long]): List[(Long, Long, Vector[Long])] = {
    def inBudget(s: Long) = withinUs.forall(end - s <= _)
    skip match {
      case AfterMatchSkip.PastLastRow =>
        if (inBudget(start)) List((start, end, counts)) else Nil
      case AfterMatchSkip.ToNextRow =>
        // anchors = times of the first step's rows r_0..r_{n-1}; suffix k
        // keeps n-k first-step rows and every later step unchanged
        val n0 = counts(0)
        anchors.iterator.zipWithIndex
          .filter { case (a, k) =>
            n0 - k >= steps(0).minCount && inBudget(a)
          }
          .map { case (a, k) => (a, end, counts.updated(0, n0 - k)) }
          .toList
      case other => throw new IllegalArgumentException(
        s"$other requires the concurrent-run engine — use CepNfa")
    }
  }

  /** Feed one (time, value) row; returns the advanced state and completed
    * matches (start, end, counts) — possibly several under ToNextRow. */
  private def advance(
      steps: IndexedSeq[PatternStep],
      skip: AfterMatchSkip,
      withinUs: Option[Long],
      st: NfaState,
      t: Long,
      v: Double): (NfaState, List[(Long, Long, Vector[Long])]) = {
    if (!st.havePrev)
      return (st.copy(prevT = t, prevV = v, havePrev = true), Nil)
    val p = st.prevV
    val zero = Vector.fill(steps.length)(0L)
    val trackAnchors = skip == AfterMatchSkip.ToNextRow
    var s = st
    var out: List[(Long, Long, Vector[Long])] = Nil
    def tryStart(cur: NfaState): NfaState =
      if (steps(0).pred(p, v))
        cur.copy(stepIdx = 0, counts = zero.updated(0, 1L),
          startT = cur.prevT,
          anchors = if (trackAnchors) Vector(cur.prevT) else Vector.empty)
      else cur.copy(stepIdx = -1, anchors = Vector.empty)
    if (s.stepIdx < 0) s = tryStart(s)
    else {
      val curStep = steps(s.stepIdx)
      // the pattern may only advance past / complete the current step once
      // its X{n,} minimum is satisfied
      val minMet = s.counts(s.stepIdx) >= curStep.minCount
      if (curStep.greedy && curStep.pred(p, v)) {
        s = s.copy(counts = s.counts.updated(s.stepIdx, s.counts(s.stepIdx) + 1),
          anchors = if (trackAnchors && s.stepIdx == 0) s.anchors :+ s.prevT
                    else s.anchors)
      } else {
        // Advance to the next ENTERABLE step: optional (minCount = 0)
        // steps whose predicate fails are skipped over; the walk stops at
        // the first required step that fails.
        var ni = -1
        if (minMet) {
          var j = s.stepIdx + 1
          var blocked = false
          while (ni < 0 && !blocked && j < steps.length) {
            if (steps(j).pred(p, v)) ni = j
            else if (steps(j).minCount == 0) j += 1
            else blocked = true
          }
        }
        if (ni >= 0) {
          s = s.copy(stepIdx = ni, counts = s.counts.updated(ni, 1L))
          if (ni == steps.length - 1 && !steps(ni).greedy &&
              steps(ni).minCount <= 1) {
            out = emitMatches(steps, skip, withinUs, s.startT, t, s.counts,
              s.anchors) // non-greedy final: done here
            s = s.copy(stepIdx = -1, anchors = Vector.empty)
          }
          // entering a non-greedy NON-final step (trailing optionals
          // remain) defers completion: the next row may still extend the
          // match into them — prefer-longer, like the greedy finals
        } else if (minMet && canComplete(steps, s.stepIdx)) {
          out = emitMatches(steps, skip, withinUs, s.startT, s.prevT, s.counts,
            s.anchors) // match ended at prev (trailing optionals unmatched)
          s = tryStart(s.copy(stepIdx = -1)) // SKIP PAST LAST ROW resume
        } else {
          s = tryStart(s.copy(stepIdx = -1)) // abort, re-test as fresh start
        }
      }
    }
    (s.copy(prevT = t, prevV = v, havePrev = true), out)
  }

  /** A greedy-final match still open when the input ends (batch only). */
  private def flush(
      steps: IndexedSeq[PatternStep],
      skip: AfterMatchSkip,
      withinUs: Option[Long],
      st: NfaState): List[(Long, Long, Vector[Long])] =
    if (st.stepIdx >= 0 &&
        st.counts(st.stepIdx) >= steps(st.stepIdx).minCount &&
        canComplete(steps, st.stepIdx) &&
        (steps(st.stepIdx).greedy || st.stepIdx < steps.length - 1))
      // greedy final still open at input end, or a non-greedy step whose
      // trailing optional steps stayed unmatched (a non-greedy FINAL step
      // completes immediately on entry and never reaches here)
      emitMatches(steps, skip, withinUs, st.startT, st.prevT, st.counts,
        st.anchors)
    else Nil

  private def outSchema(df: DataFrame, keyCol: String,
      steps: Seq[PatternStep]): StructType =
    StructType(
      df.schema(keyCol) +:
        StructField("start_us", LongType) +:
        StructField("end_us", LongType) +:
        steps.map(s => StructField(s"n_${s.name}", LongType)))

  /** PERMUTE over MUTUALLY EXCLUSIVE steps (reference:
    * flink-cep GroupPattern / MATCH_RECOGNIZE `PERMUTE(A, B)`): the
    * `permuted` steps may match in any order between `prefix` and
    * `suffix`. Expanded to the union of all orderings, each run through
    * the linear NFA independently — EXACT when at any position at most
    * one ordering's next step can accept a row (mutually exclusive step
    * predicates, e.g. a +2 jump vs a -2 drop), which is the documented
    * restriction; non-exclusive steps could double-emit where a true
    * multi-branch NFA would consume. Factorial expansion — keep the
    * permuted set small (the reference's PERMUTE carries the same
    * combinatorial cost inside its NFA). */
  def permute(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      prefix: Seq[PatternStep],
      permuted: Seq[PatternStep],
      suffix: Seq[PatternStep] = Nil,
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame = {
    require(permuted.size >= 2, "PERMUTE needs at least two steps")
    permuted.permutations
      .map(perm => apply(df, keyCol, timeCol, valCol,
        prefix ++ perm ++ suffix, withinUs, skip))
      .reduce(_.unionByName(_))
  }

  /** Batch face. `timeCol` must be LongType (exact micros); ties must be
    * pre-deduplicated for determinism. */
  def apply(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      steps: Seq[PatternStep],
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame = {
    validate(steps, withinUs)
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val stepsArr = steps.toIndexedSeq
    val schema = outSchema(df, keyCol, steps)
    SecondarySort.mapOrderedGroups(
      df, Seq(keyCol), Seq(col(timeCol)), schema) { (key, rows) =>
      var st = initial(stepsArr.length)
      val matches = rows.flatMap { r =>
        val (s2, ms) = advance(stepsArr, skip, withinUs, st,
          r.getLong(tIdx), r.getDouble(vIdx))
        st = s2
        ms.map { case (a, b, c) =>
          Row.fromSeq(key.head +: a +: b +: c)
        }
      }
      matches ++ flush(stepsArr, skip, withinUs, st).iterator.map {
        case (a, b, c) => Row.fromSeq(key.head +: a +: b +: c)
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
      steps: Seq[PatternStep],
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame = {
    validate(steps, withinUs)
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
          val (s2, ms) = advance(stepsArr, skip, withinUs, st,
            r.getLong(tIdx), r.getDouble(vIdx))
          st = s2
          ms.foreach { case (a, b, c) =>
            out += Row.fromSeq(key.get(0) +: a +: b +: c)
          }
        }
        (Some(st), out.result(), None)
      }
    }
    ProcessTableFunction(df, Seq(keyCol), schema, ptf)
  }
}
