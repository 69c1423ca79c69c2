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

  /** One element of a nested pattern: a plain step or a quantified GROUP
    * of elements — the reference's GroupPattern
    * (flink-libraries/flink-cep/…/cep/pattern/GroupPattern.java), which
    * nests ARBITRARILY (`((A B)+ C)+`): a group's elements may themselves
    * be quantified groups. `greedy = true` lets the group iterate beyond
    * `minIters` preferring more iterations, `false` pins it at exactly
    * `minIters`. */
  sealed trait PatternElem extends Serializable

  /** Iterative condition — the reference's IterativeCondition
    * (flink-libraries/flink-cep/src/main/java/org/apache/flink/cep/
    * pattern/conditions/IterativeCondition.java:63,
    * `ctx.getEventsForPattern`): evaluated with the FULL (prev row, cur
    * row) value vectors (indexed like the face's `valCols`) plus a
    * [[MatchCtx]] exposing running aggregates over the rows ALREADY
    * matched by each pattern variable in this partial match — what
    * `DEFINE B AS B.price < AVG(A.price)` needs. Aggregates exclude the
    * row under test (the reference's contract: the context serves
    * previously ACCEPTED events); a running self-aggregate that should
    * include it combines the context value with `cur` explicitly. */
  type IterCond = (Vector[Double], Vector[Double], MatchCtx) => Boolean

  /** Running per-variable aggregates of one partial match. Aggregates
    * over a variable that has matched no rows yet return NaN (count: 0),
    * so comparisons fail — matching the reference, where an aggregate
    * over an empty pattern set is null and the condition is false. */
  final class MatchCtx private[operators] (
      names: IndexedSeq[String],
      meas: Vector[Vector[Meas]]) {
    private def ms(v: String, col: Int): List[Meas] = {
      var out = List.empty[Meas]
      var i = names.length - 1
      while (i >= 0) {
        if (names(i) == v && meas(i)(col).n > 0) out = meas(i)(col) :: out
        i -= 1
      }
      out
    }
    def count(v: String, col: Int = 0): Long = ms(v, col).map(_.n).sum
    def sum(v: String, col: Int = 0): Double = {
      val l = ms(v, col); if (l.isEmpty) Double.NaN else l.map(_.sum).sum
    }
    def avg(v: String, col: Int = 0): Double = {
      val l = ms(v, col)
      if (l.isEmpty) Double.NaN else l.map(_.sum).sum / l.map(_.n).sum
    }
    def min(v: String, col: Int = 0): Double = {
      val l = ms(v, col); if (l.isEmpty) Double.NaN else l.map(_.mn).min
    }
    def max(v: String, col: Int = 0): Double = {
      val l = ms(v, col); if (l.isEmpty) Double.NaN else l.map(_.mx).max
    }
    def first(v: String, col: Int = 0): Double =
      ms(v, col) match { case h :: _ => h.first; case _ => Double.NaN }
    def last(v: String, col: Int = 0): Double =
      ms(v, col) match {
        case l if l.nonEmpty => l.last.last; case _ => Double.NaN
      }
    /** Logical offsets: the (off+1)-th matched value from the start /
      * end of the variable's rows (NaN when fewer rows matched — the
      * reference's null). Requires the engine's `recentCap` > off. */
    def firstOff(v: String, col: Int = 0, off: Int): Double = {
      val vs = ms(v, col).flatMap(_.early)
      if (off < vs.length) vs(off) else Double.NaN
    }
    def lastOff(v: String, col: Int = 0, off: Int): Double = {
      val vs = ms(v, col).flatMap(_.recent)
      val i = vs.length - 1 - off
      if (i >= 0) vs(i) else Double.NaN
    }
    /** Total matched-row count of the variable (offset bound checks). */
    private[graft] def countAll(v: String, col: Int = 0): Long =
      ms(v, col).map(_.n).sum
  }

  /** `colIdx` selects which value column (of the face's `valCols`) this
    * step's predicate reads — 0 for the single-column faces. When `iter`
    * is set it REPLACES the step's pair predicate: the step accepts a row
    * iff the iterative condition holds. */
  final case class Atom(step: PatternStep, colIdx: Int = 0,
      iter: Option[IterCond] = None)
    extends PatternElem
  final case class GroupElem(
      elems: Seq[PatternElem],
      minIters: Int = 1,
      greedy: Boolean = true) extends PatternElem

  /** Plain-steps group — the common single-level form. */
  def groupOf(
      steps: Seq[PatternStep],
      minIters: Int = 1,
      greedy: Boolean = true): GroupElem =
    GroupElem(steps.map(Atom(_): PatternElem), minIters, greedy)

  /** Flattened branch: the step array plus a LAMINAR group forest over
    * flat indices. `grpIn(i)` is the INNERMOST group containing step i
    * (-1 = none); `groups` are in pre-order (outer before inner, so a
    * lower id is never nested inside a higher one); `startsAt(p)` lists
    * the groups starting at flat position p, outermost first. */
  private final case class GroupSpec(
      start: Int, end: Int, minIters: Long, greedy: Boolean, parent: Int)
  private final case class Branch(
      steps: IndexedSeq[PatternStep],
      stepCol: IndexedSeq[Int],
      stepIter: IndexedSeq[Option[IterCond]],
      grpIn: IndexedSeq[Int],
      groups: IndexedSeq[GroupSpec],
      startsAt: Map[Int, List[Int]]) extends Serializable {
    val stepNames: IndexedSeq[String] = steps.map(_.name)
  }

  private def compile(elems: Seq[PatternElem]): Branch = {
    val steps = IndexedSeq.newBuilder[PatternStep]
    val stepCol = IndexedSeq.newBuilder[Int]
    val stepIter = IndexedSeq.newBuilder[Option[IterCond]]
    val grpIn = IndexedSeq.newBuilder[Int]
    val groups = scala.collection.mutable.ArrayBuffer.empty[GroupSpec]
    var i = 0
    def walk(es: Seq[PatternElem], encl: Int): Unit = es.foreach {
      case Atom(s, c, it) =>
        steps += s; stepCol += c; stepIter += it; grpIn += encl; i += 1
      case GroupElem(inner, minIters, greedy) =>
        val gid = groups.length
        groups += GroupSpec(i, -1, minIters.toLong, greedy, encl)
        walk(inner, gid)
        groups(gid) = groups(gid).copy(end = i - 1)
    }
    walk(elems, -1)
    val starts = groups.indices.toList.groupBy(groups(_).start)
      .map { case (p, gs) => p -> gs.sorted } // pre-order id = outer first
    Branch(steps.result(), stepCol.result(), stepIter.result(),
      grpIn.result(), groups.toIndexedSeq, starts)
  }

  /** Per-step measure accumulator over matched row values — the engine
    * side of MATCH_RECOGNIZE MEASURES (first/last/min/max/sum per pattern
    * variable). A step's matched rows are the `cur` rows of its accepted
    * pairs, in match order. `early`/`recent` retain the first/last
    * `keep` matched values when the pattern uses LOGICAL OFFSETS
    * (`FIRST/LAST(A.x, n)` — match_recognize.md logical-offsets
    * section); keep = 0 (no offsets) stores nothing, so patterns
    * without offsets pay no extra state. */
  final case class Meas(
      first: Double, last: Double, mn: Double, mx: Double,
      sum: Double, n: Long,
      early: Vector[Double] = Vector.empty,
      recent: Vector[Double] = Vector.empty) {
    def add(v: Double, keep: Int = 0): Meas = Meas(
      if (n == 0) v else first, v,
      if (n == 0) v else math.min(mn, v),
      if (n == 0) v else math.max(mx, v),
      sum + v, n + 1,
      if (keep > 0 && early.length < keep) early :+ v else early,
      if (keep > 0) (recent :+ v).takeRight(keep) else recent)
  }
  private val emptyMeas = Meas(0.0, 0.0, 0.0, 0.0, 0.0, 0L)

  /** One MEASURES output column: `agg` of step `step`'s matched values,
    * emitted as column `as` (DoubleType; NULL when the step matched no
    * rows). `agg`: first | last | min | max | sum. A name shared by steps
    * in several positions combines in declaration order. `colIdx`
    * selects which value column the measure reads (0 for single-column
    * faces). */
  final case class MeasureSpec(
      agg: String, step: String, as: String, colIdx: Int = 0,
      off: Int = 0) {
    require(
      Seq("first", "last", "min", "max", "sum", "count", "avg")
        .contains(agg),
      s"unknown measure agg: $agg")
    require(off == 0 || agg == "first" || agg == "last",
      s"logical offsets apply to FIRST/LAST measures, not $agg")
    require(off >= 0, "logical offset must be >= 0")
  }

  /** One live partial match. `startT` is the anchor row's time (the prev
    * row of the first matched pair, as in [[PatternMatch]]). `counts` is
    * CUMULATIVE per step (the output), `iterCounts` counts only the
    * current group iteration (what step minimums are checked against;
    * mirrors `counts` outside groups), `iters(g)` is the number of
    * COMPLETED iterations of group g within its current enclosing
    * iteration context (reset whenever an ancestor group starts a fresh
    * iteration), `meas` accumulates per-step measures in lockstep with
    * `counts`. */
  /** Per-step matched-ROW-TIME register: first/last row time a step
    * matched plus the match count — what SKIP TO FIRST/LAST `var` prunes
    * against (the reference's per-variable EventId lists, reduced to the
    * two ends the strategies read). Maintained in lockstep with
    * `counts`. */
  final case class StepTimes(firstT: Long, lastT: Long, n: Long) {
    def add(t: Long): StepTimes =
      StepTimes(if (n == 0) t else firstT, t, n + 1)
  }
  private val emptyTimes = StepTimes(0L, 0L, 0L)

  final case class Run(
      branch: Int,
      stepIdx: Int,
      counts: Vector[Long],
      iterCounts: Vector[Long],
      iters: Vector[Long],
      startT: Long,
      meas: Vector[Vector[Meas]], // step × value column
      stepT: Vector[StepTimes])

  /** A completed match held until no live run can outrank it. */
  final case class Cand(
      branch: Int,
      counts: Vector[Long],
      startT: Long,
      endT: Long,
      meas: Vector[Vector[Meas]],
      stepT: Vector[StepTimes])

  /** Full NFA registers — keyed state on the streaming face. */
  final case class NfaState(
      runs: List[Run],
      pending: List[Cand],
      prevT: Long,
      prevV: Vector[Double],
      havePrev: Boolean)

  private val empty = NfaState(Nil, Nil, 0L, Vector.empty, havePrev = false)

  /** The element consumes at least one row when entered — the anchor
    * property a group's (and the pattern's) FIRST element must have. */
  private def anchored(e: PatternElem): Boolean = e match {
    case Atom(s, _, _) => s.minCount >= 1
    case GroupElem(es, minIters, _) =>
      minIters >= 1 && es.nonEmpty && anchored(es.head)
  }

  private def flatSteps(e: PatternElem): Seq[PatternStep] = e match {
    case Atom(s, _, _) => Seq(s)
    case GroupElem(es, _, _) => es.flatMap(flatSteps)
  }

  private def validate(
      branches: Seq[Seq[PatternElem]], withinUs: Option[Long]): Unit = {
    require(branches.nonEmpty, "pattern needs at least one branch")
    branches.foreach { elems =>
      require(elems.nonEmpty, "pattern needs at least one element")
      def check(e: PatternElem): Unit = e match {
        case Atom(_, _, _) => ()
        case g @ GroupElem(es, minIters, greedy) =>
          require(es.nonEmpty, "a group needs at least one element")
          require(minIters >= 0, "group minIters must be >= 0")
          require(greedy || minIters >= 1,
            "a non-greedy group with minIters = 0 can never be entered")
          // An OPTIONAL head (e.g. the Pattern-API tier's synthetic
          // relaxed-contiguity gap steps) is fine as long as SOME
          // element of the group is required: entering any element
          // consumes the current row, so every iteration still
          // advances by at least one row and the NFA cannot loop in
          // place. (The pattern-initial element keeps the stricter
          // anchored-head rule below — fresh anchors attach at flat
          // step 0.)
          require(es.exists(anchored),
            s"a group needs at least one required element " +
              s"(${flatSteps(g).head.name})")
          es.foreach(check)
      }
      elems.foreach(check)
      val steps = elems.flatMap(flatSteps)
      require(steps.nonEmpty, "pattern needs at least one step")
      val bad = steps.filter(s => !s.greedy && s.minCount > 1)
      require(bad.isEmpty,
        s"non-greedy steps match exactly one row; minCount > 1 is " +
          s"unsatisfiable for: ${bad.map(_.name).mkString(", ")}")
      require(anchored(elems.head),
        "the first element may not be optional: it anchors the match start")
    }
    require(withinUs.forall(_ > 0), "withinUs must be positive")
  }

  /** The pure engine over one branch set — shared by both faces. */
  private final class Engine(
      branches: IndexedSeq[Branch],
      withinUs: Option[Long],
      skip: AfterMatchSkip,
      nVals: Int = 1,
      recentCap: Int = 0) extends Serializable {

    /** Per-step register row: one accumulator per value column. */
    private val emptyMeasRow: Vector[Meas] = Vector.fill(nVals)(emptyMeas)
    private def addAll(ms: Vector[Meas], v: Vector[Double]): Vector[Meas] =
      Vector.tabulate(nVals)(ci => ms(ci).add(v(ci), recentCap))

    /** Empty per-branch registers — what a fresh anchor's iterative
      * condition reads (no rows matched yet). */
    private val emptyMeasFor: IndexedSeq[Vector[Vector[Meas]]] =
      branches.map(b => Vector.fill(b.steps.length)(emptyMeasRow))

    /** Step `k` of branch `b` accepts the (prev, cur) pair given the
      * partial match's registers: the plain pair predicate, or — when the
      * Atom carries an iterative condition — that condition over the full
      * value vectors plus the running per-variable aggregates. */
    private def accepts(
        b: Branch, k: Int, p: Vector[Double], v: Vector[Double],
        meas: Vector[Vector[Meas]]): Boolean =
      b.stepIter(k) match {
        case Some(f) => f(p, v, new MatchCtx(b.stepNames, meas))
        case None =>
          val sc = b.stepCol(k)
          b.steps(k).pred(p(sc), v(sc))
      }

    /** One enterable target when walking INTO a position range: the step
      * index plus the chain of groups entered at a fresh first iteration
      * on the way (outermost first). */
    private final case class Entry(k: Int, fresh: List[Int])

    /** Walk the elements of level `lvl` (a group id or -1 for the root)
      * from flat position `j` to the level's inclusive end: enterable
      * entries in order plus whether the walk may run PAST the end
      * (everything from `j` on is skippable). A nested group is enterable
      * at its start (recursing into its own first iteration) and
      * walkable-past only when its minIters is 0. */
    private def walkLevel(
        b: Branch, j: Int, end: Int, lvl: Int): (List[Entry], Boolean) = {
      val entries = scala.collection.mutable.ListBuffer.empty[Entry]
      var k = j
      while (k <= end) {
        // Only a DIRECT child of this level is enterable here — matching
        // by span (`g != lvl && end <= end`) would re-enter the enclosing
        // group from inside a same-span single-child group (e.g.
        // PATTERN (((down)+)+)) and recurse forever with walkInto.
        b.startsAt.getOrElse(k, Nil)
          .find(g => b.groups(g).parent == lvl) match {
          case Some(g) =>
            entries ++= walkInto(b, g)
            if (b.groups(g).minIters == 0) k = b.groups(g).end + 1
            else return (entries.toList, false)
          case None =>
            entries += Entry(k, Nil)
            if (b.steps(k).minCount == 0) k += 1
            else return (entries.toList, false)
        }
      }
      (entries.toList, true)
    }

    /** Fresh-first-iteration entries of group `g`. */
    private def walkInto(b: Branch, g: Int): List[Entry] =
      walkLevel(b, b.groups(g).start, b.groups(g).end, g)._1
        .map(e => e.copy(fresh = g :: e.fresh))

    /** Move targets after the element at flat position `pos` closes on
      * level `lvl`: forward entries within the level; when the rest of
      * the level is skippable and the level is a group whose iteration
      * minimum is met, the close CASCADES — loop back into a fresh
      * iteration and/or exit into the parent level, recursively. Each
      * target carries the loop-back group (if that move anchors one). */
    private def cascade(
        b: Branch, iters: Vector[Long], pos: Int, lvl: Int)
        : List[(Entry, Option[Int])] = {
      val end = if (lvl < 0) b.steps.length - 1 else b.groups(lvl).end
      val (entries, canPass) = walkLevel(b, pos + 1, end, lvl)
      var all: List[(Entry, Option[Int])] = entries.map((_, None))
      if (canPass && lvl >= 0) {
        val g = b.groups(lvl)
        val done = iters(lvl) + 1
        if (g.greedy || done < g.minIters)
          // the loop group leaves `fresh` (its counter BUMPS, it doesn't
          // reset); nested groups entered on the way stay fresh
          all = all ++ walkInto(b, lvl)
            .map(e => (e.copy(fresh = e.fresh.filterNot(_ == lvl)), Some(lvl)))
        if (done >= g.minIters)
          all = all ++ cascade(b, iters, g.end, g.parent)
      }
      all
    }

    /** The close at `pos` can cascade past the pattern end: every level
      * up the chain has a skippable tail and a met iteration minimum. */
    @tailrec private def canCascadeEnd(
        b: Branch, iters: Vector[Long], pos: Int, lvl: Int): Boolean = {
      val end = if (lvl < 0) b.steps.length - 1 else b.groups(lvl).end
      val (_, canPass) = walkLevel(b, pos + 1, end, lvl)
      canPass && (lvl < 0 || {
        val g = b.groups(lvl)
        iters(lvl) + 1 >= g.minIters && canCascadeEnd(b, iters, g.end, g.parent)
      })
    }

    /** The run's current position admits a match ending at its last
      * matched row. */
    private def canCompleteRun(r: Run): Boolean = {
      val b = branches(r.branch)
      r.iterCounts(r.stepIdx) >= b.steps(r.stepIdx).minCount &&
        canCascadeEnd(b, r.iters, r.stepIdx, b.grpIn(r.stepIdx))
    }

    private def inBudget(start: Long, end: Long): Boolean =
      withinUs.forall(end - start <= _)

    /** Per-anchor order within one branch: lexicographic over step
      * counts with a PER-STEP direction — larger first at greedy steps
      * (the SQL default), smaller first at reluctant steps (`B*?` —
      * the quantifier tries to match as few rows as possible, reference
      * match_recognize.md:375). Returns <0 if a ranks before b. */
    private def cmpCounts(
        br: Branch, a: Vector[Long], b: Vector[Long]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n && a(i) == b(i)) i += 1
      if (i == n) 0
      else if (br.steps(i).reluctant) { if (a(i) < b(i)) -1 else 1 }
      else if (a(i) > b(i)) -1 else 1
    }

    private val candOrder: Ordering[Cand] = (a: Cand, b: Cand) => {
      if (a.startT != b.startT) java.lang.Long.compare(a.startT, b.startT)
      else if (a.branch != b.branch) Integer.compare(a.branch, b.branch)
      else cmpCounts(branches(a.branch), a.counts, b.counts)
    }

    /** BEST-priority bound on the counts this run could still reach:
      * frozen below the current step; where a greedy quantifier (step-
      * or group-level loop-back at ANY enclosing depth) can extend, the
      * bound is unbounded for greedy-direction steps. A RELUCTANT step
      * prefers fewer rows, and counts never decrease — so its best
      * reachable value is its CURRENT count (optimistically no further
      * matches), at every position. Optimism only delays emission
      * (candidates stay held while a run could still beat them), never
      * reorders it. The outermost still-loopable enclosing group widens
      * the unbounded span (a conservative bound: an outer loop-back
      * resets everything inside it). */
    private def potential(r: Run): Vector[Long] = {
      val b = branches(r.branch)
      val steps = b.steps
      var loopStart = -1
      var loopEnd = -1
      var g = b.grpIn(r.stepIdx)
      while (g >= 0) {
        val gs = b.groups(g)
        if (gs.greedy || r.iters(g) + 1 < gs.minIters) {
          loopStart = gs.start; loopEnd = gs.end
        }
        g = gs.parent
      }
      Vector.tabulate(steps.length) { i =>
        if (steps(i).reluctant) r.counts(i)
        else if (loopStart >= 0 && i >= loopStart && i <= loopEnd)
          Long.MaxValue
        else if (i < r.stepIdx) r.counts(i)
        else if (i == r.stepIdx)
          if (steps(i).greedy) Long.MaxValue else r.counts(i)
        else if (steps(i).greedy || b.grpIn(i) >= 0) Long.MaxValue
        else 1L
      }
    }

    /** Could this live run still complete a match outranking `c`? */
    private def couldBeat(r: Run, c: Cand): Boolean =
      if (r.startT != c.startT) r.startT < c.startT
      else if (r.branch != c.branch) r.branch < c.branch
      else cmpCounts(branches(r.branch), potential(r), c.counts) < 0

    /** Completion available when a run dies: position admits completion
      * and the budget holds for a match ending at `endT`. */
    private def deathCand(r: Run, endT: Long): Option[Cand] =
      if (canCompleteRun(r) && inBudget(r.startT, endT))
        Some(Cand(r.branch, r.counts, r.startT, endT, r.meas, r.stepT))
      else None

    /** Time of a match's (or partial match's) FIRST matched row. */
    private def firstRowT(st: Vector[StepTimes]): Long = {
      var best = Long.MaxValue
      st.foreach(s => if (s.n > 0 && s.firstT < best) best = s.firstT)
      best
    }

    /** SKIP TO FIRST/LAST pruning row for `c`, per the reference's
      * SkipToElementStrategy.getPruningId: the first (or last) row the
      * named variable matched; None when the variable matched nothing
      * (non-throwing default → prune nothing). */
    private def skipBoundary(
        c: Cand, variable: String, toFirst: Boolean): Option[Long] = {
      val b = branches(c.branch)
      var out: Option[Long] = None
      b.steps.indices.foreach { i =>
        if (b.steps(i).name == variable && c.stepT(i).n > 0) {
          val t = if (toFirst) c.stepT(i).firstT else c.stepT(i).lastT
          out = Some(out.fold(t)(prev =>
            if (toFirst) math.min(prev, t) else math.max(prev, t)))
        }
      }
      out
    }

    /** Successors + completions of one run for the pair (p, v) at `t`.
      * `prevT` is the time of the pair's left row (= match end if the run
      * dies here). Close semantics at any depth: when the current
      * element's minimum is met, the run splits into every enterable
      * later target from [[cascade]] — forward within the level, a fresh
      * loop-back iteration at each closable enclosing group, or an exit
      * into the parent level — and, when a match could also end RIGHT
      * HERE, the exit-now interpretation is kept as a HELD candidate (so
      * a later mid-iteration death cannot lose the shorter match). */
    private def evolve(
        r: Run, p: Vector[Double], v: Vector[Double], t: Long, prevT: Long)
        : (List[Run], List[Cand]) = {
      val b = branches(r.branch)
      val steps = b.steps
      val s = steps(r.stepIdx)
      val budget = inBudget(r.startT, t)
      val succ = scala.collection.mutable.ListBuffer.empty[Run]
      val cands = scala.collection.mutable.ListBuffer.empty[Cand]
      if (s.greedy && budget && accepts(b, r.stepIdx, p, v, r.meas))
        succ += r.copy(
          counts = r.counts.updated(r.stepIdx, r.counts(r.stepIdx) + 1L),
          iterCounts =
            r.iterCounts.updated(r.stepIdx, r.iterCounts(r.stepIdx) + 1L),
          meas = r.meas.updated(r.stepIdx, addAll(r.meas(r.stepIdx), v)),
          stepT = r.stepT.updated(r.stepIdx, r.stepT(r.stepIdx).add(t)))
      if (r.iterCounts(r.stepIdx) >= s.minCount) {
        cascade(b, r.iters, r.stepIdx, b.grpIn(r.stepIdx)).foreach {
          case (Entry(k, fresh), loopOf) =>
            if (budget && accepts(b, k, p, v, r.meas)) {
              val c2 = r.counts.updated(k, r.counts(k) + 1L)
              val m2 = r.meas.updated(k, addAll(r.meas(k), v))
              val st2 = r.stepT.updated(k, r.stepT(k).add(t))
              if (k == steps.length - 1 && !steps(k).greedy &&
                  b.grpIn(k) < 0)
                // root-level final non-greedy step: completes right here
                cands += Cand(r.branch, c2, r.startT, t, m2, st2)
              else {
                // iteration counters: a loop-back bumps its group and
                // resets everything nested inside; a freshly entered
                // group resets itself and everything nested inside
                var it = r.iters
                loopOf.foreach { gl =>
                  b.groups.indices.foreach { h =>
                    if (h != gl && b.groups(h).start >= b.groups(gl).start &&
                        b.groups(h).end <= b.groups(gl).end)
                      it = it.updated(h, 0L)
                  }
                  it = it.updated(gl, it(gl) + 1L)
                }
                fresh.foreach { hf =>
                  b.groups.indices.foreach { h =>
                    if (b.groups(h).start >= b.groups(hf).start &&
                        b.groups(h).end <= b.groups(hf).end)
                      it = it.updated(h, 0L)
                  }
                }
                // per-iteration step counts: reset the spans of every
                // group whose iteration restarts, then count the target
                val spans = (loopOf.toList ++ fresh).map(b.groups(_))
                val ic0 =
                  if (spans.isEmpty) r.iterCounts
                  else Vector.tabulate(steps.length) { i =>
                    if (spans.exists(sp => i >= sp.start && i <= sp.end)) 0L
                    else r.iterCounts(i)
                  }
                succ += Run(r.branch, k, c2,
                  ic0.updated(k, ic0(k) + 1L), it, r.startT, m2, st2)
              }
            }
        }
        // exit-now: the match ending at the previous row stays a held
        // candidate while successors explore longer interpretations
        if (succ.nonEmpty && canCompleteRun(r) && inBudget(r.startT, prevT))
          cands += Cand(r.branch, r.counts, r.startT, prevT, r.meas, r.stepT)
      }
      if (succ.isEmpty && cands.isEmpty) (Nil, deathCand(r, prevT).toList)
      else (succ.toList, cands.toList)
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
          case AfterMatchSkip.ToFirst(v, strict) =>
            val bd = skipBoundary(best, v, toFirst = true)
            if (strict) {
              // the reference's SQL path (CommonExecMatch attaches
              // throwExceptionOnMiss()): a miss, or skipping to the
              // match's own first row, raises instead of silently
              // emitting the overlap set
              if (bd.isEmpty) throw new IllegalStateException(
                s"AFTER MATCH SKIP TO FIRST $v: the variable matched no " +
                  "rows in a match (the SQL path raises on miss)")
              if (bd.contains(firstRowT(best.stepT)))
                throw new IllegalStateException(
                  s"AFTER MATCH SKIP TO FIRST $v would skip to the " +
                    "match's own first row (the reference's loop guard)")
            }
            resolve(
              runs.filter(r => bd.forall(firstRowT(r.stepT) >= _)),
              pending.filter(c => c != best &&
                bd.forall(firstRowT(c.stepT) >= _)),
              best :: out)
          case AfterMatchSkip.ToLast(v, strict) =>
            val bd = skipBoundary(best, v, toFirst = false)
            if (strict && bd.isEmpty) throw new IllegalStateException(
              s"AFTER MATCH SKIP TO LAST $v: the variable matched no " +
                "rows in a match (the SQL path raises on miss)")
            resolve(
              runs.filter(r => bd.forall(firstRowT(r.stepT) >= _)),
              pending.filter(c => c != best &&
                bd.forall(firstRowT(c.stepT) >= _)),
              best :: out)
        }
      }

    /** Feed one row; returns the advanced state and emitted matches. */
    def advance(st: NfaState, t: Long, v: Vector[Double])
        : (NfaState, List[Cand]) = {
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
      // fresh anchor per branch (every row is a potential match start);
      // validate guarantees the first enterable position is flat step 0
      branches.indices.foreach { b =>
        val br = branches(b)
        val steps = br.steps
        if (accepts(br, 0, p, v, emptyMeasFor(b))) {
          val c0 = Vector.tabulate(steps.length)(i => if (i == 0) 1L else 0L)
          val m0 = Vector.fill(steps.length)(emptyMeasRow)
            .updated(0, addAll(emptyMeasRow, v))
          val st0 = Vector.fill(steps.length)(emptyTimes)
            .updated(0, emptyTimes.add(t))
          val it0 = Vector.fill(br.groups.length)(0L)
          if (steps.length == 1 && !steps(0).greedy && br.grpIn(0) < 0) {
            if (steps(0).minCount <= 1)
              cands ::= Cand(b, c0, st.prevT, t, m0, st0)
          } else runs ::= Run(b, 0, c0, c0, it0, st.prevT, m0, st0)
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

    /** Last matched row time of a run (its completion end under
      * watermark expiry). */
    private def lastRowT(r: Run): Long = {
      var best = Long.MinValue
      r.stepT.foreach(s => if (s.n > 0 && s.lastT > best) best = s.lastT)
      if (best == Long.MinValue) r.startT else best
    }

    /** Watermark passage at `wmUs` (streaming): runs whose WITHIN budget
      * ends before the watermark can never extend again — they die
      * (taking their in-budget completions), unblocking held candidates;
      * the reference's timer-based partial-match pruning, so per-key
      * state cannot outlive its within bound. With no WITHIN bound only
      * `wmUs = Long.MaxValue` (the closed-stream end) drains. Returns
      * the advanced state, emissions, and the next wake-up (µs). */
    def expire(st: NfaState, wmUs: Long)
        : (NfaState, List[Cand], Option[Long]) = {
      val (dead, live) =
        if (wmUs == Long.MaxValue) (st.runs, Nil)
        else st.runs.partition(r =>
          withinUs.exists(w => r.startT + w < wmUs))
      if (dead.isEmpty && st.pending.isEmpty)
        return (st, Nil,
          withinUs.flatMap(w => live.map(_.startT + w).minOption.map(_ + 1)))
      val cands = dead.flatMap(r => deathCand(r, lastRowT(r)))
      val (r2, p2, emitted) =
        resolve(live, (st.pending ++ cands).distinct, Nil)
      val wake =
        withinUs.flatMap(w => r2.map(_.startT + w).minOption.map(_ + 1))
      (st.copy(runs = r2, pending = p2), emitted, wake)
    }
  }

  /** Output step names: union across branches in first-seen order. */
  private def outNames(branches: Seq[Branch]): Seq[String] =
    branches.flatMap(_.steps.map(_.name)).distinct

  private def outSchema(df: DataFrame, keyCol: String,
      branches: Seq[Branch], measures: Seq[MeasureSpec]): StructType =
    StructType(
      (df.schema(keyCol) +:
        StructField("start_us", LongType) +:
        StructField("end_us", LongType) +:
        outNames(branches).map(n => StructField(s"n_$n", LongType))) ++
        measures.map(m => StructField(m.as, DoubleType)))

  /** MEASURES value for one spec: combine the branch's same-name steps
    * that matched at least one row, in declaration order. */
  private def measValue(c: Cand, b: Branch, spec: MeasureSpec): Any = {
    val ms = b.steps.zipWithIndex
      .filter(_._1.name == spec.step)
      .map(x => c.meas(x._2)(spec.colIdx))
      .filter(_.n > 0)
    if (ms.isEmpty) null
    else spec.agg match {
      // logical offsets (FIRST/LAST(A.x, n)): the (n+1)-th matched
      // value from the ends; beyond the matched rows -> NULL (the
      // reference's null). Requires the face's recentCap > n.
      case "first" if spec.off > 0 =>
        val vs = ms.flatMap(_.early)
        if (spec.off < vs.length) vs(spec.off) else null
      case "last" if spec.off > 0 =>
        val vs = ms.flatMap(_.recent)
        val i = vs.length - 1 - spec.off
        if (i >= 0) vs(i) else null
      case "first" => ms.head.first
      case "last" => ms.last.last
      case "min" => ms.map(_.mn).min
      case "max" => ms.map(_.mx).max
      case "sum" => ms.map(_.sum).sum
      // COUNT/AVG emit as DoubleType like every measure column (the
      // engine's uniform measure type); SQL oracles CAST accordingly
      case "count" => ms.map(_.n).sum.toDouble
      case "avg" => ms.map(_.sum).sum / ms.map(_.n).sum
    }
  }

  private def candRow(key: Any, c: Cand, names: Seq[String],
      branches: IndexedSeq[Branch], measures: Seq[MeasureSpec]): Row = {
    val b = branches(c.branch)
    val steps = b.steps
    val byName = names.map { n =>
      steps.iterator.zipWithIndex
        .filter(_._1.name == n).map(x => c.counts(x._2)).sum
    }
    Row.fromSeq((key +: c.startT +: c.endT +: byName) ++
      measures.map(measValue(c, b, _)))
  }

  /** Batch face over nested-pattern branches. `timeCol` must be LongType
    * (exact micros); ties must be pre-deduplicated for determinism. */
  def nested(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      branches: Seq[Seq[PatternElem]],
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow,
      measures: Seq[MeasureSpec] = Nil): DataFrame =
    nestedMulti(df, keyCol, timeCol, Seq(valCol), branches, withinUs, skip,
      measures)

  /** As [[nested]] with SEVERAL value columns: each Atom / MeasureSpec
    * addresses its column via `colIdx` into `valCols` (the reference's
    * DEFINE/MEASURES over different row attributes). */
  def nestedMulti(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCols: Seq[String],
      branches: Seq[Seq[PatternElem]],
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow,
      measures: Seq[MeasureSpec] = Nil,
      recentCap: Int = 0): DataFrame = {
    validate(branches, withinUs)
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdxs = valCols.map(df.schema.fieldIndex).toVector
    val br = branches.map(compile).toIndexedSeq
    val names = outNames(br)
    val eng = new Engine(br, withinUs, skip, valCols.length, recentCap)
    SecondarySort.mapOrderedGroups(
      df, Seq(keyCol), Seq(col(timeCol)),
      outSchema(df, keyCol, br, measures)) {
      (key, rows) =>
        var st = empty
        val matched = rows.flatMap { r =>
          val (s2, ms) =
            eng.advance(st, r.getLong(tIdx), vIdxs.map(r.getDouble))
          st = s2
          ms.map(candRow(key.head, _, names, br, measures))
        }
        matched ++
          eng.flush(st).iterator.map(candRow(key.head, _, names, br, measures))
    }
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
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame =
    nested(df, keyCol, timeCol, valCol,
      branches.map(_.map(Atom(_): PatternElem)), withinUs, skip)

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
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame =
    nestedStreaming(df, keyCol, timeCol, valCol,
      branches.map(_.map(Atom(_): PatternElem)), withinUs, skip)

  /** Streaming face over nested-pattern branches (see [[streaming]]). */
  def nestedStreaming(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      branches: Seq[Seq[PatternElem]],
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow,
      measures: Seq[MeasureSpec] = Nil): DataFrame =
    nestedStreamingMulti(df, keyCol, timeCol, Seq(valCol), branches,
      withinUs, skip, measures)

  /** As [[nestedStreaming]] with SEVERAL value columns (see
    * [[nestedMulti]]). */
  def nestedStreamingMulti(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCols: Seq[String],
      branches: Seq[Seq[PatternElem]],
      withinUs: Option[Long] = None,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow,
      measures: Seq[MeasureSpec] = Nil,
      recentCap: Int = 0): DataFrame = {
    validate(branches, withinUs)
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdxs = valCols.map(df.schema.fieldIndex).toVector
    val br = branches.map(compile).toIndexedSeq
    val names = outNames(br)
    val eng = new Engine(br, withinUs, skip, valCols.length, recentCap)
    val schema = outSchema(df, keyCol, br, measures)
    val ptf = new GraftPTF[NfaState] {
      def process(
          key: Row,
          rows: Iterator[Row],
          state: Option[NfaState],
          watermarkMs: Long): (Option[NfaState], Seq[Row], Option[Long]) = {
        var st = state.getOrElse(empty)
        val out = Seq.newBuilder[Row]
        rows.toSeq.sortBy(_.getLong(tIdx)).foreach { r =>
          val (s2, ms) =
            eng.advance(st, r.getLong(tIdx), vIdxs.map(r.getDouble))
          st = s2
          ms.foreach(c => out += candRow(key.get(0), c, names, br, measures))
        }
        // watermark expiry (incl. timer wake-ups on silent keys): the
        // engine time column is exact µs, the watermark maps as
        // wmUs = watermarkMs * 1000 (the ts = timestamp_micros(ts_us)
        // convention); Long.MaxValue = the closed-stream end drains all
        val wmUs =
          if (watermarkMs == Long.MaxValue) Long.MaxValue
          else watermarkMs * 1000L
        val (s3, ms3, wakeUs) = eng.expire(st, wmUs)
        st = s3
        ms3.foreach(c => out += candRow(key.get(0), c, names, br, measures))
        (Some(st), out.result(), wakeUs.map(_ / 1000L + 1L))
      }
    }
    ProcessTableFunction(df, Seq(keyCol), schema, ptf)
  }
}
