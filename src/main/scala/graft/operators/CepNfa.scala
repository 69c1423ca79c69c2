package graft.operators

import scala.annotation.tailrec

import graft.streaming.{GraftPTF, ProcessTableFunction}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Concurrent-run CEP NFA — the run-splitting engine the reference's CEP
  * library implements with `NFA.java:76` computation states over a shared
  * buffer (flink-libraries/flink-cep/…/cep/nfa/NFA.java, operator
  * `…/cep/operator/CepOperator.java:83`). Where [[PatternMatch]] is a
  * DETERMINISTIC single-run engine (exact only for transition-exclusive
  * patterns), this engine keeps a SET of live partial matches per key and
  * SPLITS a run whenever a row satisfies both "stay in the current
  * quantifier" and "advance to a later step" — which is exactly greedy
  * backtracking: the longest interpretation is preferred, but shorter
  * interpretations survive until the longer ones provably complete or die.
  *
  * Semantics (documented contract):
  *  - Every row is a potential match anchor: a fresh run starts wherever a
  *    branch's first step accepts the (prev, cur) pair — matching is
  *    attempted from every position, as MATCH_RECOGNIZE requires, not
  *    only after the previous partial match aborts.
  *  - Matches are emitted per AFTER MATCH SKIP strategy with a total
  *    priority order: earlier anchor first; at the same anchor, earlier
  *    branch (declaration order — regex-alternation preference); within a
  *    branch, lexicographically larger step counts (greedy prefer-longer).
  *    A completed candidate is HELD while any live run could still beat it
  *    under that order, and emitted as soon as none can.
  *  - PastLastRow: emitting a match prunes every run/candidate anchored
  *    strictly before the match end (the next match may re-anchor AT the
  *    end row — consecutive matches share the boundary row, matching the
  *    islands formulation of the oracles).
  *    ToNextRow: only the emitted anchor is retired, so every later
  *    anchor inside the same run emits its own (shorter) match.
  *  - WITHIN is enforced EAGERLY, as the reference prunes partial matches
  *    on advance: a run whose age exceeds the bound dies immediately
  *    (emitting its in-budget completion if its remaining steps are all
  *    optional), and — unlike [[PatternMatch]]'s completion-time check —
  *    later anchors inside the over-budget run remain live, so a shorter
  *    in-budget match can still be found.
  *  - Multiple branches = alternation (`A | B`) — which also makes
  *    PERMUTE exact WITHOUT the mutual-exclusivity restriction: each
  *    ordering is one branch, and per-anchor resolution emits a single
  *    winner instead of the union-expansion's double-emission.
  *
  * State bound: live runs are bounded by (pattern length × rows whose
  * pairs can extend some step) per key — the same worst case as the
  * reference's shared buffer. A WITHIN bound caps run lifetime and is the
  * recommended guard for always-true-ish predicates at scale.
  *
  * Batch face: [[SecondarySort]] streamed replay. Streaming face: the PTF
  * hook with the full NFA state (runs + held candidates) as keyed state.
  */
object CepNfa {

  /** One live partial match. `startT` is the anchor row's time (the prev
    * row of the first matched pair, as in [[PatternMatch]]). */
  final case class Run(
      branch: Int,
      stepIdx: Int,
      counts: Vector[Long],
      startT: Long)

  /** A completed match held until no live run can outrank it. */
  final case class Cand(
      branch: Int,
      counts: Vector[Long],
      startT: Long,
      endT: Long)

  /** Full NFA registers — keyed state on the streaming face. */
  final case class NfaState(
      runs: List[Run],
      pending: List[Cand],
      prevT: Long,
      prevV: Double,
      havePrev: Boolean)

  private val empty = NfaState(Nil, Nil, 0L, 0.0, havePrev = false)

  private def validate(
      branches: Seq[Seq[PatternStep]], withinUs: Option[Long]): Unit = {
    require(branches.nonEmpty, "pattern needs at least one branch")
    branches.foreach { steps =>
      require(steps.nonEmpty, "pattern needs at least one step")
      val bad = steps.filter(s => !s.greedy && s.minCount > 1)
      require(bad.isEmpty,
        s"non-greedy steps match exactly one row; minCount > 1 is " +
          s"unsatisfiable for: ${bad.map(_.name).mkString(", ")}")
      require(steps.head.minCount >= 1,
        "the first step may not be optional: it anchors the match start")
    }
    require(withinUs.forall(_ > 0), "withinUs must be positive")
  }

  /** The pure engine over one branch set — shared by both faces. */
  private final class Engine(
      branches: IndexedSeq[IndexedSeq[PatternStep]],
      withinUs: Option[Long],
      skip: AfterMatchSkip) extends Serializable {

    private def canComplete(b: Int, i: Int): Boolean = {
      val steps = branches(b)
      (i + 1 until steps.length).forall(steps(_).minCount == 0)
    }

    private def inBudget(start: Long, end: Long): Boolean =
      withinUs.forall(end - start <= _)

    /** Greedy order at one anchor+branch: lexicographically larger counts
      * rank higher. Returns <0 if a ranks before b. */
    private def cmpCounts(a: Vector[Long], b: Vector[Long]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n && a(i) == b(i)) i += 1
      if (i == n) 0 else if (a(i) > b(i)) -1 else 1
    }

    private val candOrder: Ordering[Cand] = (a: Cand, b: Cand) => {
      if (a.startT != b.startT) java.lang.Long.compare(a.startT, b.startT)
      else if (a.branch != b.branch) Integer.compare(a.branch, b.branch)
      else cmpCounts(a.counts, b.counts)
    }

    /** Upper bound on the counts this run could still reach: frozen below
      * the current step, unbounded where a greedy quantifier can extend. */
    private def potential(r: Run): Vector[Long] = {
      val steps = branches(r.branch)
      Vector.tabulate(steps.length) { i =>
        if (i < r.stepIdx) r.counts(i)
        else if (i == r.stepIdx)
          if (steps(i).greedy) Long.MaxValue else r.counts(i)
        else if (steps(i).greedy) Long.MaxValue
        else 1L
      }
    }

    /** Could this live run still complete a match outranking `c`? */
    private def couldBeat(r: Run, c: Cand): Boolean =
      if (r.startT != c.startT) r.startT < c.startT
      else if (r.branch != c.branch) r.branch < c.branch
      else cmpCounts(potential(r), c.counts) < 0

    /** Completion available when a run dies: all remaining steps optional,
      * minimum met, budget holds for a match ending at `endT`. */
    private def deathCand(r: Run, endT: Long): Option[Cand] = {
      val steps = branches(r.branch)
      if (r.counts(r.stepIdx) >= steps(r.stepIdx).minCount &&
          canComplete(r.branch, r.stepIdx) && inBudget(r.startT, endT))
        Some(Cand(r.branch, r.counts, r.startT, endT))
      else None
    }

    /** Successors + completions of one run for the pair (p, v) at `t`.
      * `prevT` is the time of the pair's left row (= match end if the run
      * dies here). */
    private def evolve(r: Run, p: Double, v: Double, t: Long, prevT: Long)
        : (List[Run], List[Cand]) = {
      val steps = branches(r.branch)
      val s = steps(r.stepIdx)
      var succ: List[Run] = Nil
      var cands: List[Cand] = Nil
      if (s.greedy && s.pred(p, v) && inBudget(r.startT, t))
        succ ::= r.copy(counts =
          r.counts.updated(r.stepIdx, r.counts(r.stepIdx) + 1L))
      if (r.counts(r.stepIdx) >= s.minCount) {
        // branch into every ENTERABLE later step: optional steps may be
        // entered or skipped over (both successors are kept — this is the
        // run split the deterministic engine lacks); the walk stops after
        // the first required step.
        var j = r.stepIdx + 1
        var walking = true
        while (walking && j < steps.length) {
          val sj = steps(j)
          if (sj.pred(p, v) && inBudget(r.startT, t)) {
            val c2 = r.counts.updated(j, 1L)
            if (j == steps.length - 1 && !sj.greedy)
              cands ::= Cand(r.branch, c2, r.startT, t)
            else succ ::= r.copy(stepIdx = j, counts = c2)
          }
          walking = sj.minCount == 0
          j += 1
        }
      }
      if (succ.isEmpty && cands.isEmpty)
        cands = deathCand(r, prevT).toList
      (succ, cands)
    }

    /** Emit every pending candidate no live run can outrank; apply the
      * skip strategy's pruning after each emission. */
    @tailrec private def resolve(
        runs: List[Run],
        pending: List[Cand],
        out: List[Cand]): (List[Run], List[Cand], List[Cand]) =
      if (pending.isEmpty) (runs, pending, out.reverse)
      else {
        val best = pending.min(candOrder)
        if (runs.exists(couldBeat(_, best))) (runs, pending, out.reverse)
        else skip match {
          case AfterMatchSkip.PastLastRow =>
            resolve(
              runs.filter(_.startT >= best.endT),
              pending.filter(c => c.startT >= best.endT),
              best :: out)
          case AfterMatchSkip.ToNextRow =>
            resolve(
              runs.filter(_.startT != best.startT),
              pending.filter(_.startT != best.startT),
              best :: out)
        }
      }

    /** Feed one row; returns the advanced state and emitted matches. */
    def advance(st: NfaState, t: Long, v: Double): (NfaState, List[Cand]) = {
      if (!st.havePrev)
        return (st.copy(prevT = t, prevV = v, havePrev = true), Nil)
      val p = st.prevV
      // eager WITHIN: over-budget runs die before seeing the row; their
      // in-budget completions (ending at the previous row) survive
      val (live, aged) = st.runs.partition(r => inBudget(r.startT, t))
      var cands: List[Cand] = aged.flatMap(deathCand(_, st.prevT))
      var runs: List[Run] = Nil
      live.foreach { r =>
        val (s2, c2) = evolve(r, p, v, t, st.prevT)
        runs :::= s2
        cands :::= c2
      }
      // fresh anchor per branch (every row is a potential match start)
      branches.indices.foreach { b =>
        val steps = branches(b)
        if (steps(0).pred(p, v)) {
          val c0 = Vector.tabulate(steps.length)(i => if (i == 0) 1L else 0L)
          if (steps.length == 1 && !steps(0).greedy) {
            if (steps(0).minCount <= 1) cands ::= Cand(b, c0, st.prevT, t)
          } else runs ::= Run(b, 0, c0, st.prevT)
        }
      }
      val (r2, p2, emitted) =
        resolve(runs.distinct, (st.pending ++ cands).distinct, Nil)
      (NfaState(r2, p2, t, v, havePrev = true), emitted)
    }

    /** Input end (batch / group close): every live run takes its death
      * completion, then resolution drains with nothing left to block. */
    def flush(st: NfaState): List[Cand] = {
      val cands = st.runs.flatMap(deathCand(_, st.prevT))
      val (_, _, emitted) =
        resolve(Nil, (st.pending ++ cands).distinct, Nil)
      emitted
    }
  }

  /** Output step names: union across branches in first-seen order. */
  private def outNames(branches: Seq[Seq[PatternStep]]): Seq[String] =
    branches.flatMap(_.map(_.name)).distinct

  private def outSchema(df: DataFrame, keyCol: String,
      branches: Seq[Seq[PatternStep]]): StructType =
    StructType(
      df.schema(keyCol) +:
        StructField("start_us", LongType) +:
        StructField("end_us", LongType) +:
        outNames(branches).map(n => StructField(s"n_$n", LongType)))

  private def candRow(key: Any, c: Cand, names: Seq[String],
      branches: IndexedSeq[IndexedSeq[PatternStep]]): Row = {
    val steps = branches(c.branch)
    val byName = names.map { n =>
      steps.iterator.zipWithIndex
        .filter(_._1.name == n).map(x => c.counts(x._2)).sum
    }
    Row.fromSeq(key +: c.startT +: c.endT +: byName)
  }

  /** Batch face. `timeCol` must be LongType (exact micros); ties must be
    * pre-deduplicated for determinism. */
  def apply(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      branches: Seq[Seq[PatternStep]],
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame = {
    validate(branches, withinUs)
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val br = branches.map(_.toIndexedSeq).toIndexedSeq
    val names = outNames(branches)
    val eng = new Engine(br, withinUs, skip)
    SecondarySort.mapOrderedGroups(
      df, Seq(keyCol), Seq(col(timeCol)), outSchema(df, keyCol, branches)) {
      (key, rows) =>
        var st = empty
        val matched = rows.flatMap { r =>
          val (s2, ms) = eng.advance(st, r.getLong(tIdx), r.getDouble(vIdx))
          st = s2
          ms.map(candRow(key.head, _, names, br))
        }
        matched ++ eng.flush(st).iterator.map(candRow(key.head, _, names, br))
    }
  }

  /** Single-branch convenience (generalizes [[PatternMatch.apply]]). */
  def single(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      steps: Seq[PatternStep],
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame =
    apply(df, keyCol, timeCol, valCol, Seq(steps), withinUs, skip)

  /** PERMUTE without the mutual-exclusivity restriction: each ordering is
    * an alternation branch; per-anchor resolution emits one winner, so
    * overlapping step predicates no longer double-emit (the documented
    * defect of [[PatternMatch.permute]]'s union expansion). Factorial
    * branch count — keep the permuted set small. */
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
    apply(df, keyCol, timeCol, valCol,
      permuted.permutations.map(prefix ++ _ ++ suffix).toSeq,
      withinUs, skip)
  }

  /** Streaming face on the PTF hook: the full NFA state (runs + held
    * candidates + prev row) persists as keyed state; rows are ordered
    * within each micro-batch slice (cross-batch order is the source's
    * responsibility, as for every keyed CEP consumer). Held candidates
    * whose blocking runs die in a later batch are emitted then. */
  def streaming(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      branches: Seq[Seq[PatternStep]],
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame = {
    validate(branches, withinUs)
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val br = branches.map(_.toIndexedSeq).toIndexedSeq
    val names = outNames(branches)
    val eng = new Engine(br, withinUs, skip)
    val schema = outSchema(df, keyCol, branches)
    val ptf = new GraftPTF[NfaState] {
      def process(
          key: Row,
          rows: Iterator[Row],
          state: Option[NfaState],
          watermarkMs: Long): (Option[NfaState], Seq[Row], Option[Long]) = {
        var st = state.getOrElse(empty)
        val out = Seq.newBuilder[Row]
        rows.toSeq.sortBy(_.getLong(tIdx)).foreach { r =>
          val (s2, ms) = eng.advance(st, r.getLong(tIdx), r.getDouble(vIdx))
          st = s2
          ms.foreach(c => out += candRow(key.get(0), c, names, br))
        }
        (Some(st), out.result(), None)
      }
    }
    ProcessTableFunction(df, Seq(keyCol), schema, ptf)
  }
}
