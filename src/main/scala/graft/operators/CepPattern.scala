package graft.operators

import graft.streaming.{GraftPTF, ProcessTableFunction}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The Pattern-API tier of CEP — the reference's fluent `Pattern`
  * (flink-libraries/flink-cep/src/main/java/org/apache/flink/cep/pattern/
  * Pattern.java:349-430): RELAXED contiguity (`followedBy` skips
  * non-matching events, `followedByAny` additionally branches on every
  * later match) and NEGATIVE patterns (`notNext`, `notFollowedBy`, with
  * the trailing-`notFollowedBy`-requires-`within` restriction of
  * Pattern.java:298) — the contiguity/negation surface MATCH_RECOGNIZE
  * (strict contiguity, [[CepNfa]]) does not model.
  *
  * Conditions are single-event predicates over the event's VALUE VECTOR
  * (`SimpleCondition.of(event -> …)` — the reference's conditions see
  * the whole event), not the pair predicates of the MATCH_RECOGNIZE
  * engines. `whereRow`/`orRow`/`untilRow`/`whereWithRow` receive one
  * double per declared value column ([[applyCols]] order); the
  * single-column `where(Double => Boolean)` family wraps index 0.
  *
  * Semantics (documented contract, mirroring the reference's NO_SKIP
  * default — every match is reported):
  *  - Every row matching the first step's condition anchors a run.
  *  - `next`: the step must match immediately after the previous step's
  *    last row; a non-matching row kills that branch.
  *  - `followedBy`: non-matching rows in the gap are skipped; the FIRST
  *    matching row advances the run (per branch).
  *  - `followedByAny`: every matching row in the gap advances a COPY of
  *    the run — later matches yield their own matches too.
  *  - `notNext(N)`: the first row after the previous step must not match
  *    N (checked once, before the next positive step's entry test).
  *  - `notFollowedBy(N)`: while waiting in the gap, a row matching N
  *    kills the run (checked only when the row does not advance the
  *    step — an advancing row is consumed by the positive step first,
  *    as the reference's NFA consumes before testing the NOT state).
  *  - Quantifiers: `times(n)` exact, `oneOrMore` (internally strict —
  *    the reference's `consecutive()`; min 1, unbounded). Non-final
  *    quantifiers are NON-greedy (the reference's default): every
  *    interpretation emits. A final-step `greedy` emits only the
  *    maximal extension (on run death or input end).
  *  - `within`: the whole match (first to last row) must fit the bound;
  *    over-budget runs die eagerly. A trailing `notFollowedBy` HOLDS the
  *    completed match until the within deadline passes without the
  *    negative condition matching (emitted at input end otherwise) —
  *    the reference's timeout-release behavior for ending NOT patterns.
  *
  * Output: one row per match — key, start_us (first matched row), end_us
  * (last matched row), one `n_<name>` count per positive step.
  *
  * Batch face: [[SecondarySort]] streamed replay. Streaming face: the
  * PTF hook with runs + held candidates as keyed state.
  */
object CepPattern {

  /** Gap contiguity of a step relative to its predecessor. */
  sealed trait Link extends Serializable
  case object Strict extends Link
  case object Relaxed extends Link
  case object RelaxedAny extends Link

  /** AfterMatchSkipStrategy for the Pattern API
    * (flink-libraries/flink-cep/…/nfa/aftermatch/AfterMatchSkipStrategy
    * .java). NoSkip (the reference default) reports every
    * interpretation; SkipToNext keeps ONE match per anchor (the most
    * rows, discarding same-start partials on emission); SkipPastLast
    * emits greedily non-overlapping matches earliest-anchor-first and
    * discards partials starting at or before an emitted match's end. */
  sealed trait SkipStrategy extends Serializable
  case object NoSkip extends SkipStrategy
  case object SkipToNext extends SkipStrategy
  case object SkipPastLast extends SkipStrategy

  /** Event values: one double per declared value column — the
    * reference's conditions see the WHOLE event (SimpleCondition.of),
    * so every condition here receives the full value vector. The
    * single-column builder methods (`where(Double => Boolean)`) wrap
    * onto index 0. A primitive array (not Vector) so the NFA inner
    * loop never boxes per row; built fresh per row and never retained
    * past the row's `advance`, so the shared-mutable hazard is moot. */
  type Vals = Array[Double]

  /** Read the declared value columns of one event, unboxed. */
  private def readVals(r: Row, vIdxs: Array[Int]): Vals = {
    val a = new Array[Double](vIdxs.length)
    var i = 0
    while (i < vIdxs.length) { a(i) = r.getDouble(vIdxs(i)); i += 1 }
    a
  }

  /** One positive step. `notNextCond`/`notDuringCond` are the negative
    * patterns declared between the previous step and this one. An
    * `iterCond` REPLACES `where`: it additionally reads running
    * per-variable aggregates of the partial match (the reference's
    * IterativeCondition — the Pattern API's native condition class,
    * IterativeCondition.java:63). */
  final case class Step(
      name: String,
      where: Vals => Boolean,
      link: Link,
      minTimes: Int = 1,
      maxTimes: Int = 1,
      greedy: Boolean = false,
      notNextCond: Option[Vals => Boolean] = None,
      notDuringCond: Option[Vals => Boolean] = None,
      iterCond: Option[(Vals, CepNfa.MatchCtx) => Boolean] = None,
      internal: Link = Strict,
      untilCond: Option[Vals => Boolean] = None)
    extends Serializable

  /** Compiled pattern: positive steps + optional trailing negative +
    * optional within bound (µs) + after-match skip strategy.
    * `maxGapUs` is the `WithinType.PREVIOUS_AND_CURRENT` bound
    * (Pattern.java `within(Duration, WithinType)`, Flink 1.16): the
    * maximum time gap between CONSECUTIVE matched events, vs `withinUs`
    * bounding first-to-last. Both may be set. */
  final case class Pattern(
      steps: IndexedSeq[Step],
      trailingNot: Option[Vals => Boolean],
      withinUs: Option[Long],
      skip: SkipStrategy = NoSkip,
      maxGapUs: Option[Long] = None) extends Serializable

  // ------------------------------------------------------------ builder

  /** Fluent builder mirroring the reference's Pattern API. */
  final class Builder private[CepPattern] (firstName: String) {
    private[CepPattern] val steps = scala.collection.mutable.ArrayBuffer(
      Step(firstName, _ => true, Strict))
    private[CepPattern] var pendingNotNext: Option[Vals => Boolean] = None
    private[CepPattern] var pendingNotDuring: Option[Vals => Boolean] = None
    private[CepPattern] var lastWasNot = false
    private var notIsNext = false
    private[CepPattern] var withinUs: Option[Long] = None
    private[CepPattern] var maxGapUs: Option[Long] = None
    private[CepPattern] var skip: SkipStrategy = NoSkip
    /** Group spans (GroupPattern tier): inclusive step ranges added by
      * [[addGroup]], with their quantifier and iteration contiguity.
      * Non-nested, in positional order. */
    private[CepPattern] val groups =
      scala.collection.mutable.ArrayBuffer.empty[Grp]
    /** Set right after a group is added — group quantifier calls
      * (times/optional/consecutive) target it; any other declaration
      * clears it. */
    private var lastGroup: Option[Int] = None

    /** Condition for the most recently declared step (positive or NOT),
      * over the FIRST value column — the single-column convenience. */
    def where(f: Double => Boolean): Builder = whereRow(vs => f(vs(0)))

    /** Condition over the FULL value vector (the reference's
      * SimpleCondition sees the whole event): one double per value
      * column of the face (`applyCols`/`streamingCols` order). */
    def whereRow(f: Vals => Boolean): Builder = {
      require(lastGroup.isEmpty,
        "conditions belong on the steps INSIDE a group")
      if (lastWasNot) {
        if (notIsNext) pendingNotNext = Some(f) else pendingNotDuring = Some(f)
      } else steps(steps.length - 1) =
        steps.last.copy(where = f)
      this
    }

    /** OR-combine with the step's current condition (Pattern.java
      * `or(IterativeCondition)` — RichOrCondition). On a NOT pattern the
      * kill condition widens. `where` replaces; `or` composes. */
    def or(f: Double => Boolean): Builder = orRow(vs => f(vs(0)))

    /** [[or]] over the full value vector. */
    def orRow(f: Vals => Boolean): Builder = {
      require(lastGroup.isEmpty,
        "conditions belong on the steps INSIDE a group")
      if (lastWasNot) {
        def widen(c: Option[Vals => Boolean]): Option[Vals => Boolean] =
          c.map(g => (v: Vals) => g(v) || f(v))
        if (notIsNext) pendingNotNext = widen(pendingNotNext)
        else pendingNotDuring = widen(pendingNotDuring)
      } else {
        val s = steps.last
        require(s.iterCond.isEmpty,
          "or() composes plain conditions — fold the disjunction into " +
            "the whereWith iterative condition instead")
        val g = s.where
        steps(steps.length - 1) = s.copy(where = v => g(v) || f(v))
      }
      this
    }

    /** Iterative condition for the most recent POSITIVE step — sees the
      * row's value plus running per-variable aggregates of the rows
      * already matched by this partial match (IterativeCondition.java:63
      * `ctx.getEventsForPattern`; aggregates exclude the row under
      * test). Replaces any plain `where` on the step. */
    def whereWith(f: (Double, CepNfa.MatchCtx) => Boolean): Builder =
      whereWithRow((vs, ctx) => f(vs(0), ctx))

    /** [[whereWith]] over the full value vector. */
    def whereWithRow(f: (Vals, CepNfa.MatchCtx) => Boolean): Builder = {
      require(!lastWasNot,
        "iterative conditions apply to positive steps only")
      require(lastGroup.isEmpty,
        "conditions belong on the steps INSIDE a group")
      steps(steps.length - 1) = steps.last.copy(iterCond = Some(f))
      this
    }

    private def addPositive(name: String, link: Link): Builder = {
      steps += Step(name, _ => true, link,
        notNextCond = pendingNotNext, notDuringCond = pendingNotDuring)
      pendingNotNext = None; pendingNotDuring = None; lastWasNot = false
      lastGroup = None
      this
    }

    def next(name: String): Builder = addPositive(name, Strict)
    def followedBy(name: String): Builder = addPositive(name, Relaxed)
    def followedByAny(name: String): Builder = addPositive(name, RelaxedAny)

    /** Append a GROUP (the reference's GroupPattern — Pattern.java
      * begin/next/followedBy(Pattern)): the sub-pattern's steps join this
      * pattern as a quantifiable span. `times(n)` / `times(from, to)` /
      * `optional()` right after apply to the whole group; iterations
      * chain with RELAXED contiguity (the reference's default) unless
      * [[consecutive]] follows the quantifier. Groups NEST (the
      * reference's GroupPattern nests arbitrarily via
      * Pattern.begin(Pattern)): a sub-builder that itself contains
      * groups joins with its group forest intact — such patterns (and
      * unbounded group quantifiers) run on the nested-NFA face
      * ([[nested]]/[[nestedStreaming]]); build()/buildAll() serve
      * single-level bounded patterns. Groups carry no own within/skip
      * and may not sit directly after a NOT pattern. */
    private[CepPattern] def addGroup(sub: Builder, link: Link): Builder = {
      require(!sub.lastWasNot && sub.pendingNotNext.isEmpty &&
        sub.pendingNotDuring.isEmpty,
        "a group may not end with a NOT pattern")
      require(sub.withinUs.isEmpty && sub.maxGapUs.isEmpty &&
        sub.skip == NoSkip,
        "within/afterMatchSkip belong on the outer pattern, not a group")
      require(pendingNotNext.isEmpty && pendingNotDuring.isEmpty &&
        !lastWasNot,
        "a NOT pattern directly before a group is not supported")
      val start = steps.length
      val ss = sub.steps.toIndexedSeq
      steps += ss.head.copy(link = link)
      steps ++= ss.tail
      val base = groups.length
      groups += Grp(start, steps.length - 1, 1, 1, Relaxed)
      // the sub-pattern's own groups nest under the new outer group:
      // spans shift by the insertion offset, parents remap (sub id j
      // becomes base + 1 + j; sub's top level becomes the outer group)
      sub.groups.foreach { g =>
        groups += g.copy(start = g.start + start, end = g.end + start,
          parent = if (g.parent < 0) base else base + 1 + g.parent)
      }
      lastGroup = Some(base)
      this
    }

    def next(sub: Builder): Builder = addGroup(sub, Strict)
    def followedBy(sub: Builder): Builder = addGroup(sub, Relaxed)
    def followedByAny(sub: Builder): Builder = addGroup(sub, RelaxedAny)

    /** STRICT contiguity between group iterations (the reference's
      * `consecutive()` on a looping GroupPattern; default is relaxed). */
    def consecutive(): Builder = {
      val g = lastGroup.getOrElse(throw new IllegalArgumentException(
        "consecutive() applies to a quantified group"))
      groups(g) = groups(g).copy(iterLink = Strict)
      this
    }

    def notNext(name: String): Builder = {
      require(pendingNotNext.isEmpty && pendingNotDuring.isEmpty,
        "consecutive NOT patterns are not supported")
      lastWasNot = true; notIsNext = true
      lastGroup = None // conditions now belong to the NOT step, not the group
      pendingNotNext = Some(_ => true)
      this
    }

    def notFollowedBy(name: String): Builder = {
      require(pendingNotNext.isEmpty && pendingNotDuring.isEmpty,
        "consecutive NOT patterns are not supported")
      lastWasNot = true; notIsNext = false
      lastGroup = None // conditions now belong to the NOT step, not the group
      pendingNotDuring = Some(_ => true)
      this
    }

    /** Quantifier on the most recent POSITIVE step (or group). */
    def times(n: Int): Builder = {
      require(!lastWasNot, "a NOT pattern cannot be quantified")
      require(n >= 1, "times(n) needs n >= 1")
      lastGroup match {
        case Some(g) => groups(g) = groups(g).copy(min = n, max = n)
        case None => steps(steps.length - 1) =
          steps.last.copy(minTimes = n, maxTimes = n)
      }
      this
    }

    /** `times(from, to)` range quantifier (Pattern.java times(int,int)):
      * between `from` and `to` occurrences, strict internal contiguity,
      * non-greedy (every count in range emits, the reference default).
      * On a group: every iteration count in range emits (NoSkip only). */
    def times(from: Int, to: Int): Builder = {
      require(!lastWasNot, "a NOT pattern cannot be quantified")
      require(from >= 0 && to >= 1 && from <= to,
        s"times($from, $to) needs 0 <= from <= to, to >= 1")
      lastGroup match {
        case Some(g) => groups(g) = groups(g).copy(min = from, max = to)
        case None => steps(steps.length - 1) =
          steps.last.copy(minTimes = from, maxTimes = to)
      }
      this
    }

    def oneOrMore(): Builder = {
      require(!lastWasNot, "a NOT pattern cannot be quantified")
      lastGroup match {
        case Some(g) => // (G)+ — the nested-NFA face's tier
          groups(g) = groups(g).copy(min = 1, max = Int.MaxValue)
        case None => steps(steps.length - 1) =
          steps.last.copy(minTimes = 1, maxTimes = Int.MaxValue)
      }
      this
    }

    /** `timesOrMore(n)` (Pattern.java timesOrMore): at least `n`
      * occurrences, unbounded above, strict internal contiguity unless
      * relaxed via [[allowGaps]]/[[allowCombinations]]. */
    def timesOrMore(n: Int): Builder = {
      require(!lastWasNot, "a NOT pattern cannot be quantified")
      require(n >= 1, "timesOrMore(n) needs n >= 1")
      lastGroup match {
        case Some(g) => // (G){n,} — the nested-NFA face's tier
          groups(g) = groups(g).copy(min = n, max = Int.MaxValue)
        case None => steps(steps.length - 1) =
          steps.last.copy(minTimes = n, maxTimes = Int.MaxValue)
      }
      this
    }

    /** `until(condition)` (Pattern.java until): a row matching the stop
      * condition ENDS the step's quantifier — no further repetitions
      * accepted in that run (the row itself is not consumed by the
      * quantifier; it may still advance the pattern). */
    def until(f: Double => Boolean): Builder = untilRow(vs => f(vs(0)))

    /** [[until]] over the full value vector. */
    def untilRow(f: Vals => Boolean): Builder = {
      require(!lastWasNot, "until applies to positive steps")
      require(lastGroup.isEmpty, "until applies to steps, not groups")
      steps(steps.length - 1) = steps.last.copy(untilCond = Some(f))
      this
    }

    /** RELAXED internal contiguity for the step's quantifier
      * (Pattern.java's DEFAULT for oneOrMore/times — graft defaults to
      * `consecutive()`-strict, the documented delta): non-matching rows
      * between repetitions are skipped. */
    def allowGaps(): Builder = {
      require(!lastWasNot, "a NOT pattern cannot be quantified")
      require(lastGroup.isEmpty,
        "group iteration contiguity is relaxed by default; " +
          "consecutive() makes it strict")
      steps(steps.length - 1) = steps.last.copy(internal = Relaxed)
      this
    }

    /** NON-DETERMINISTIC relaxed internal contiguity
      * (Pattern.allowCombinations): every later matching row can extend
      * each earlier repetition state — combinatorial, as in the
      * reference. */
    def allowCombinations(): Builder = {
      require(!lastWasNot, "a NOT pattern cannot be quantified")
      require(lastGroup.isEmpty,
        "allowCombinations applies to steps, not groups")
      steps(steps.length - 1) = steps.last.copy(internal = RelaxedAny)
      this
    }

    /** `optional()` (Pattern.java:optional): the step may match zero
      * times — `B?`; after [[oneOrMore]] it yields zero-or-more (`B*`),
      * the reference's composition. Not allowed on the first step (it
      * anchors the match). */
    def optional(): Builder = {
      require(!lastWasNot, "a NOT pattern cannot be quantified")
      lastGroup match {
        case Some(g) => groups(g) = groups(g).copy(min = 0)
        case None =>
          steps(steps.length - 1) = steps.last.copy(minTimes = 0)
      }
      this
    }

    def greedy(): Builder = {
      require(!lastWasNot, "a NOT pattern cannot be quantified")
      require(lastGroup.isEmpty, "greedy applies to steps, not groups")
      steps(steps.length - 1) = steps.last.copy(greedy = true)
      this
    }

    def within(us: Long): Builder = {
      require(us > 0, "within must be positive")
      withinUs = Some(us)
      this
    }

    /** `within(Duration, WithinType.PREVIOUS_AND_CURRENT)`: bound the
      * gap between CONSECUTIVE matched events instead of first-to-last
      * (Pattern.java:392, WithinType.java). A run whose last matched
      * event is more than `us` behind the current row can never extend
      * and dies (greedy bests flush; timeout side output surfaces the
      * partial when enabled). */
    def withinGap(us: Long): Builder = {
      require(us > 0, "withinGap must be positive")
      maxGapUs = Some(us)
      this
    }

    /** AfterMatchSkipStrategy (default NoSkip — every interpretation).
      * SKIP pruning applies at emission time, so a greedy final step
      * (whose match emits on run death) prunes later than a non-greedy
      * one — the documented delta vs the reference's in-NFA pruning. */
    def afterMatchSkip(strategy: SkipStrategy): Builder = {
      skip = strategy
      this
    }

    private def validateSteps(ss: IndexedSeq[Step]): Unit = {
      require(ss.nonEmpty,
        "the pattern is empty (a lone optional group's zero-iteration " +
          "branch has no steps)")
      ss.foreach { s =>
        require(s.greedy || s.minTimes <= s.maxTimes, s"bad quantifier on ${s.name}")
      }
      require(ss.head.minTimes >= 1,
        s"the first step (${ss.head.name}) may not be optional: it " +
          "anchors the match")
      ss.init.foreach { s =>
        require(!s.greedy,
          s"greedy is supported on the final step only (${s.name}) — " +
            "non-final quantifiers are non-greedy, the reference default")
      }
      // optional steps and NOT patterns may not be adjacent: while a run
      // waits at the gap before an optional step, the engine keeps ONE
      // subsuming waiting state, which cannot distinguish which side of
      // the skipped step a negative condition guards
      ss.indices.foreach { i =>
        if (ss(i).minTimes == 0) {
          require(ss(i).notNextCond.isEmpty && ss(i).notDuringCond.isEmpty,
            s"a NOT pattern directly before optional step ${ss(i).name} " +
              "is not supported")
          if (i < ss.length - 1)
            require(ss(i + 1).notNextCond.isEmpty &&
              ss(i + 1).notDuringCond.isEmpty,
              s"a NOT pattern directly after optional step ${ss(i).name} " +
                "is not supported")
        }
      }
    }

    def build(): Pattern = {
      val all = buildAll()
      require(all.size == 1,
        "a ranged/optional group expands to several interpretation " +
          "branches — use buildAll() and the Seq[Pattern] faces")
      all.head
    }

    /** All interpretation branches: a group quantified `times(from, to)`
      * (or `optional`) expands to one flat branch per iteration count —
      * under NoSkip the union of branch matches IS the reference's
      * every-interpretation emission set (GroupPattern.java semantics). */
    def buildAll(): Seq[Pattern] = {
      val trailing =
        if (lastWasNot) {
          require(!notIsNext, "a pattern may not end with notNext")
          require(withinUs.isDefined,
            "a pattern ending in notFollowedBy requires within " +
              "(Pattern.java:298)")
          val f = pendingNotDuring
          pendingNotDuring = None
          f
        } else None
      require(groups.forall(_.parent < 0),
        "nested group patterns run on the nested-NFA face — " +
          "CepPattern.nested(df, keyCol, timeCol, valCols, builder)")
      require(groups.forall(_.max != Int.MaxValue),
        "unbounded group quantifiers run on the nested-NFA face — " +
          "CepPattern.nested(df, keyCol, timeCol, valCols, builder)")
      val branches =
        if (groups.isEmpty) Seq(steps.toIndexedSeq)
        else expandBranches(steps.toIndexedSeq, groups.toSeq)
      branches.foreach(validateSteps)
      require(branches.size == 1 || skip == NoSkip,
        "ranged/optional groups require the NoSkip strategy (the " +
          "branch union emits every interpretation)")
      require(skip == NoSkip || trailing.isEmpty,
        "a trailing notFollowedBy requires the NoSkip strategy (held " +
          "candidates cannot re-order under skip pruning)")
      branches.map(ss => Pattern(ss, trailing, withinUs, skip, maxGapUs))
    }
  }

  /** Group span over builder steps [start..end], quantified min..max
    * iterations chaining with `iterLink` contiguity. `parent` is the
    * enclosing group's index (-1 at top level) — nested groups are the
    * nested-NFA face's tier ([[nested]]); the expansion tier
    * (build/buildAll) serves single-level patterns. */
  private[CepPattern] final case class Grp(
      start: Int, end: Int, min: Int, max: Int, iterLink: Link,
      parent: Int = -1)

  /** One flat step sequence per group-iteration-count choice: group g
    * repeated c times contributes its span c times, iterations 2+
    * entering with the group's iteration contiguity. */
  private def expandBranches(
      ss: IndexedSeq[Step], gs: Seq[Grp]): Seq[IndexedSeq[Step]] = {
    val choices = gs.foldLeft(Seq(Vector.empty[Int])) { (acc, g) =>
      acc.flatMap(v => (g.min to g.max).map(v :+ _))
    }
    choices.map { counts =>
      val out = IndexedSeq.newBuilder[Step]
      var i = 0
      while (i < ss.length) {
        val gi = gs.indexWhere(_.start == i)
        if (gi < 0) { out += ss(i); i += 1 }
        else {
          val g = gs(gi)
          val span = ss.slice(g.start, g.end + 1)
          (1 to counts(gi)).foreach { it =>
            span.zipWithIndex.foreach { case (s, j) =>
              out += (if (it > 1 && j == 0) s.copy(link = g.iterLink)
                      else s)
            }
          }
          i = g.end + 1
        }
      }
      out.result()
    }
  }

  def begin(name: String): Builder = new Builder(name)

  /** Begin with a GROUP (Pattern.begin(Pattern) — GroupPattern.java). */
  def begin(sub: Builder): Builder = {
    val b = new Builder("__group__")
    b.steps.clear()
    b.addGroup(sub, Strict)
    b
  }

  // ------------------------------------------------------------- engine

  /** One live partial match. `idx` is the step being filled (cnt >= 1)
    * or entered (cnt == 0 → waiting in the gap before it); `gapFirst` is
    * true until the first gap row has been seen (notNext window). */
  final case class PRun(
      idx: Int,
      cnt: Int,
      gapFirst: Boolean,
      startT: Long,
      endT: Long,
      counts: Vector[Long],
      meas: Vector[Vector[CepNfa.Meas]], // per step, per value column
      best: Option[Snap]) // greedy-final maximal snapshot

  /** Completed-match snapshot: (end time, counts, measure registers). */
  type Snap = (Long, Vector[Long], Vector[Vector[CepNfa.Meas]])

  /** A completed match held for a trailing notFollowedBy. */
  final case class Held(
      startT: Long, endT: Long, counts: Vector[Long],
      meas: Vector[Vector[CepNfa.Meas]], deadline: Long)

  /** One measure column: `agg` of step `step`'s matched values as
    * column `as` — the PatternSelectFunction tier's per-variable
    * aggregates (the reference hands the select function each
    * variable's matched events; these are their reductions). DoubleType
    * output; NULL when the step matched no rows. */
  final case class Measure(agg: String, step: String, as: String,
      colIdx: Int = 0) {
    require(
      Seq("first", "last", "min", "max", "sum", "count", "avg")
        .contains(agg),
      s"unknown measure agg: $agg")
  }

  final case class PatState(
      runs: List[PRun], held: List[Held]) extends Serializable

  private val emptyState = PatState(Nil, Nil)

  /** `wmRelease` (streaming): trailing-not held candidates release on
    * WATERMARK passage (via [[onWatermark]]) instead of on the next
    * row's event time — a late negative row inside the watermark
    * allowance can still kill them. Batch replays rows in order, so
    * row-time release is exact there. */
  private final class Engine(pat: Pattern,
      emitTimeouts: Boolean = false,
      wmRelease: Boolean = false,
      nVals: Int = 1) extends Serializable {
    private val steps = pat.steps
    private val last = steps.length - 1

    private val zeroMeasRow: Vector[CepNfa.Meas] =
      Vector.fill(nVals)(CepNfa.Meas(0, 0, 0, 0, 0, 0L))
    private def addAll(row: Vector[CepNfa.Meas],
        v: Vals): Vector[CepNfa.Meas] =
      Vector.tabulate(nVals)(ci => row(ci).add(v(ci)))

    private def inBudget(start: Long, t: Long): Boolean =
      pat.withinUs.forall(t - start <= _)

    /** PREVIOUS_AND_CURRENT expiry: row `t` is too far past the run's
      * last matched event — no row from here on can ever extend it. */
    private def gapDead(r: PRun, t: Long): Boolean =
      pat.maxGapUs.exists(g => t - r.endT > g)

    private val stepNames = steps.map(_.name)

    /** Step `i` accepts value `v` given the partial match's measure
      * registers: the plain condition, or — when the step carries an
      * iterative condition — that condition over the running
      * per-variable aggregates (rows matched so far, excluding this
      * one). */
    private def accepts(
        i: Int, v: Vals, meas: Vector[Vector[CepNfa.Meas]]): Boolean =
      steps(i).iterCond match {
        case Some(f) =>
          f(v, new CepNfa.MatchCtx(stepNames, meas))
        case None => steps(i).where(v)
      }

    /** Every step after `i` is optional → a match may end at step `i`. */
    private def tailOptional(i: Int): Boolean = {
      var j = i + 1
      while (j <= last && steps(j).minTimes == 0) j += 1
      j > last
    }

    /** Emit or hold a completed snapshot. */
    private def complete(
        startT: Long, endT: Long, counts: Vector[Long],
        meas: Vector[Vector[CepNfa.Meas]],
        out: scala.collection.mutable.ListBuffer[Done],
        held: scala.collection.mutable.ListBuffer[Held]): Unit =
      pat.trailingNot match {
        case None => out += ((startT, endT, counts, meas))
        case Some(_) =>
          held += Held(startT, endT, counts, meas, startT + pat.withinUs.get)
      }

    /** Row (t, v) against run r → successor runs; completions appended. */
    private def evolve(
        r: PRun, t: Long, v: Vals,
        out: scala.collection.mutable.ListBuffer[Done],
        held: scala.collection.mutable.ListBuffer[Held],
        tout: scala.collection.mutable.ListBuffer[Done]): List[PRun] = {
      if (!inBudget(r.startT, t) || gapDead(r, t)) {
        // eager WITHIN / gap expiry: flush a greedy-final best before
        // dying; with timeout emission on, a partial with no completed
        // best surfaces on the side output (TimedOutPartialMatchHandler)
        if (emitTimeouts && r.best.isEmpty)
          tout += ((r.startT, r.endT, r.counts, r.meas))
        r.best.foreach { case (e, c, m) =>
          complete(r.startT, e, c, m, out, held) }
        return Nil
      }
      val succ = scala.collection.mutable.ListBuffer.empty[PRun]
      var died = true // becomes false if any branch survives

      /** `entryOnly` marks a skip-over recursion past an optional step:
        * only step ENTRY is attempted there — the waiting state stays at
        * the outermost gap position, which subsumes the deeper gaps (it
        * re-runs this walk on every later row), so no duplicate waiting
        * runs or duplicate emissions arise. */
      def enterGapOrStep(
          i: Int, from: PRun, gapFirst: Boolean,
          entryOnly: Boolean = false): Unit = {
        // test row v against step i's entry from the gap
        val s = steps(i)
        if (gapFirst && s.notNextCond.exists(_(v))) return // notNext kills
        // a row matching the step's until-condition is never accepted
        // into its quantifier (entry included)
        val stopEntry = s.untilCond.exists(_(v))
        if (!stopEntry && accepts(i, v, from.meas)) {
          val advanced = from.copy(idx = i, cnt = 1, gapFirst = false,
            endT = t, counts = from.counts.updated(i, from.counts(i) + 1L),
            meas = from.meas.updated(i, addAll(from.meas(i), v)))
          val done = 1 >= s.minTimes && tailOptional(i)
          if (done && i == last && s.greedy)
            succ += advanced.copy(
              best = Some((t, advanced.counts, advanced.meas)))
          else {
            if (done) complete(advanced.startT, t, advanced.counts,
              advanced.meas, out, held)
            if (s.maxTimes > 1 || i < last || !done)
              succ += advanced // longer interpretations may follow
          }
          if (!entryOnly) {
            if (s.link == RelaxedAny)
              // followedByAny: later matches of THIS step also branch
              succ += from.copy(idx = i, cnt = 0, gapFirst = false)
            else if (s.minTimes == 0 && i < last)
              // optional take keeps the skip-it interpretation alive —
              // waiting PAST the step (a b? c on a,b,c rows yields both
              // (a,b,c) and (a,c); the skipped branch cannot take a
              // later b, matching the reference's branch states)
              succ += from.copy(idx = i + 1, cnt = 0, gapFirst = false)
          }
        } else if (!entryOnly) s.link match {
          case Strict => () // this branch dies
          case _ =>
            if (!s.notDuringCond.exists(_(v)))
              succ += from.copy(idx = i, cnt = 0, gapFirst = false)
        }
        // optional step: the row may instead enter a LATER step —
        // skip-over branch (both interpretations live, NO_SKIP)
        if (s.minTimes == 0 && i < last)
          enterGapOrStep(i + 1, from, gapFirst, entryOnly = true)
      }

      if (r.cnt == 0) {
        // waiting in the gap before step r.idx
        enterGapOrStep(r.idx, r, r.gapFirst)
      } else {
        val s = steps(r.idx)
        // extend the quantifier (internal contiguity per Step.internal:
        // Strict = consecutive(), Relaxed = skip non-matching rows,
        // RelaxedAny = every later match extends each earlier state)
        val stopped = s.untilCond.exists(_(v))
        if (!stopped && r.cnt < s.maxTimes && accepts(r.idx, v, r.meas)) {
          val ext = r.copy(cnt = r.cnt + 1, endT = t,
            counts = r.counts.updated(r.idx, r.counts(r.idx) + 1L),
            meas = r.meas.updated(r.idx, addAll(r.meas(r.idx), v)))
          val done = ext.cnt >= s.minTimes && tailOptional(r.idx)
          if (done && r.idx == last && s.greedy)
            succ += ext.copy(best = Some((t, ext.counts, ext.meas)))
          else {
            if (done) complete(ext.startT, t, ext.counts, ext.meas, out, held)
            succ += ext
          }
          if (s.internal == RelaxedAny)
            succ += r // combination branch: a LATER row may extend too
        } else if (!stopped && r.cnt < s.maxTimes && s.internal != Strict) {
          succ += r // relaxed repetition gap: wait for a later match
        }
        // advance into the next step's gap (branching — non-greedy)
        if (r.cnt >= s.minTimes && r.idx < last)
          enterGapOrStep(r.idx + 1, r, gapFirst = true)
      }
      died = succ.isEmpty
      if (died)
        r.best.foreach { case (e, c, m) =>
          complete(r.startT, e, c, m, out, held) }
      succ.toList
    }

    /** Completion record: (start, end, counts, measure registers). */
    type Done = (Long, Long, Vector[Long], Vector[Vector[CepNfa.Meas]])

    private val emptyMeasVec = Vector.fill(steps.length)(zeroMeasRow)

    /** Apply the after-match skip strategy to one emission batch:
      * SkipToNext keeps the most-rows match per anchor; SkipPastLast
      * selects greedily non-overlapping matches, earliest anchor first,
      * longest first at a tie. */
    private def applySkip(out: List[Done]): List[Done] = pat.skip match {
      case NoSkip => out
      case SkipToNext =>
        out.groupBy(_._1).toList.sortBy(_._1).map { case (_, ms) =>
          ms.maxBy(m => (m._3.sum, -m._2))
        }
      case SkipPastLast =>
        val sorted = out.sortBy(m => (m._1, -m._3.sum))
        var kept = List.empty[Done]
        var lastEnd = Long.MinValue
        sorted.foreach { m =>
          if (m._1 > lastEnd) { kept ::= m; lastEnd = m._2 }
        }
        kept.reverse
    }

    /** Discard partial runs the emitted matches consume. */
    private def pruneRuns(runs: List[PRun], emitted: List[Done])
        : List[PRun] = pat.skip match {
      case NoSkip => runs
      case SkipToNext =>
        runs.filterNot(r => emitted.exists(_._1 == r.startT))
      case SkipPastLast =>
        val maxEnd = emitted.map(_._2).maxOption.getOrElse(Long.MinValue)
        runs.filter(_.startT > maxEnd)
    }

    /** Feed one row; returns advanced state + emitted matches +
      * timed-out partials (empty unless timeout emission is on). */
    def advance(st: PatState, t: Long, v: Vals)
        : (PatState, List[Done], List[Done]) = {
      val out = scala.collection.mutable.ListBuffer.empty[Done]
      val tout = scala.collection.mutable.ListBuffer.empty[Done]
      val heldNew = scala.collection.mutable.ListBuffer.empty[Held]
      var runs: List[PRun] = Nil
      st.runs.foreach { r => runs :::= evolve(r, t, v, out, heldNew, tout) }
      // fresh anchor (every matching row may begin a match; a row
      // matching the first step's until-condition cannot anchor)
      val s0 = steps(0)
      if (!s0.untilCond.exists(_(v)) && accepts(0, v, emptyMeasVec)) {
        val z = Vector.fill(steps.length)(0L)
        val m0 = Vector.fill(steps.length)(zeroMeasRow)
          .updated(0, addAll(zeroMeasRow, v))
        val fresh = PRun(0, 1, gapFirst = false, t, t,
          z.updated(0, 1L), m0, None)
        val done = 1 >= s0.minTimes && tailOptional(0)
        if (done && last == 0 && s0.greedy)
          runs ::= fresh.copy(best = Some((t, fresh.counts, fresh.meas)))
        else {
          if (done) complete(t, t, fresh.counts, fresh.meas, out, heldNew)
          if (s0.maxTimes > 1 || last > 0 || !done) runs ::= fresh
        }
      }
      // trailing-not candidates: release past-deadline (batch row-time
      // mode only — streaming waits for the watermark), kill on match
      var held: List[Held] = st.held
      pat.trailingNot.foreach { nf =>
        if (!wmRelease) {
          val (ripe, rest) = held.partition(_.deadline < t)
          ripe.foreach(h => out += ((h.startT, h.endT, h.counts, h.meas)))
          held = rest
        }
        // the negative condition guards the interval AFTER the match
        // (endT, deadline]: an out-of-order negative row from before the
        // match's end must not kill it
        if (nf(v))
          held = held.filterNot(h => t > h.endT && t <= h.deadline)
      }
      held = heldNew.toList ::: held
      val emitted = applySkip(out.toList)
      (PatState(pruneRuns(runs.distinct, emitted), held), emitted,
        tout.toList)
    }

    /** Watermark passage at `wmUs` (streaming): release matured held
      * candidates, expire WITHIN-dead runs (their budget ends before the
      * watermark — no future row can extend them; the reference's
      * timer-based state cleanup), emitting greedy bests and — with
      * timeout emission on — timed-out partials. Returns the advanced
      * state, emissions, timeouts, and the next wake-up (µs). */
    def onWatermark(st: PatState, wmUs: Long)
        : (PatState, List[Done], List[Done], Option[Long]) = {
      val out = scala.collection.mutable.ListBuffer.empty[Done]
      val tout = scala.collection.mutable.ListBuffer.empty[Done]
      val heldNew = scala.collection.mutable.ListBuffer.empty[Held]
      val (ripe, rest) = st.held.partition(_.deadline < wmUs)
      ripe.foreach(h => out += ((h.startT, h.endT, h.counts, h.meas)))
      val (dead, live) = st.runs.partition(r =>
        pat.withinUs.exists(w => r.startT + w < wmUs) ||
          pat.maxGapUs.exists(g => r.endT + g < wmUs))
      dead.foreach { r =>
        if (emitTimeouts && r.best.isEmpty)
          tout += ((r.startT, r.endT, r.counts, r.meas))
        r.best.foreach { case (e, c, m) =>
          complete(r.startT, e, c, m, out, heldNew) }
      }
      val held2 = heldNew.toList ::: rest
      val wake = (held2.map(_.deadline) ++
        pat.withinUs.toList.flatMap(w => live.map(_.startT + w)) ++
        pat.maxGapUs.toList.flatMap(g => live.map(_.endT + g)))
        .minOption.map(_ + 1)
      val emitted = applySkip(out.toList)
      (PatState(pruneRuns(live, emitted), held2), emitted, tout.toList,
        wake)
    }

    /** Input end: greedy-final bests and surviving held candidates. */
    def flush(st: PatState): List[Done] = {
      val out = scala.collection.mutable.ListBuffer.empty[Done]
      val heldNew = scala.collection.mutable.ListBuffer.empty[Held]
      st.runs.foreach { r =>
        r.best.foreach { case (e, c, m) =>
          complete(r.startT, e, c, m, out, heldNew) }
      }
      (st.held ::: heldNew.toList).foreach(h =>
        out += ((h.startT, h.endT, h.counts, h.meas)))
      applySkip(out.toList)
    }
  }

  /** Output step names: union across branches in first-seen order —
    * expanded group branches repeat names; counts merge per name. */
  private def mergedNames(pats: Seq[Pattern]): Seq[String] =
    pats.flatMap(_.steps.map(_.name)).distinct

  private def outSchema(df: DataFrame, keyCol: String,
      names: Seq[String], measures: Seq[Measure]): StructType =
    StructType(
      (df.schema(keyCol) +:
        StructField("start_us", LongType) +:
        StructField("end_us", LongType) +:
        names.map(n => StructField(s"n_$n", LongType))) ++
        measures.map(m => StructField(m.as, DoubleType)))

  /** One measure value: combine the same-name steps that matched at
    * least one row, in declaration order (as CepNfa.measValue). */
  private def measVal(
      m: Measure, pat: Pattern, meas: Vector[Vector[CepNfa.Meas]]): Any = {
    val ms = pat.steps.zipWithIndex
      .filter(_._1.name == m.step)
      .map(x => meas(x._2)(m.colIdx))
      .filter(_.n > 0)
    if (ms.isEmpty) null
    else m.agg match {
      case "first" => ms.head.first
      case "last" => ms.last.last
      case "min" => ms.map(_.mn).min
      case "max" => ms.map(_.mx).max
      case "sum" => ms.map(_.sum).sum
      case "count" => ms.map(_.n).sum.toDouble
      case "avg" => ms.map(_.sum).sum / ms.map(_.n).sum
    }
  }

  private def doneRow(key: Any, pat: Pattern, names: Seq[String],
      measures: Seq[Measure], a: Long, b: Long, c: Vector[Long],
      m: Vector[Vector[CepNfa.Meas]]): Row = {
    val byName = names.map { n =>
      pat.steps.iterator.zipWithIndex
        .filter(_._1.name == n).map(x => c(x._2)).sum
    }
    Row.fromSeq((key +: a +: b +: byName) ++
      measures.map(measVal(_, pat, m)))
  }

  /** Batch face. `timeCol` must be LongType (exact micros); ties must be
    * pre-deduplicated for determinism. `measures` append per-variable
    * aggregate columns (the PatternSelectFunction reductions). */
  def apply(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      pat: Pattern,
      measures: Seq[Measure] = Nil): DataFrame =
    applyAll(df, keyCol, timeCol, valCol, Seq(pat), measures)

  /** Batch face over SEVERAL interpretation branches ([[Builder.buildAll]]
    * — expanded ranged/optional groups): one secondary-sorted pass runs
    * every branch's engine in lockstep; emissions union (NoSkip). Counts
    * columns are per merged step name. */
  def applyAll(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      pats: Seq[Pattern],
      measures: Seq[Measure] = Nil): DataFrame =
    applyCols(df, keyCol, timeCol, Seq(valCol), pats, measures)

  /** Batch face over SEVERAL value columns: conditions declared with
    * `whereRow`/`orRow`/`untilRow`/`whereWithRow` see one double per
    * column, in `valCols` order (the reference's conditions see the
    * whole event); measures address columns via `Measure.colIdx`. */
  def applyCols(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCols: Seq[String],
      pats: Seq[Pattern],
      measures: Seq[Measure] = Nil): DataFrame = {
    require(pats.nonEmpty, "at least one pattern branch")
    require(pats.size == 1 || pats.forall(_.skip == NoSkip),
      "several branches require the NoSkip strategy")
    val names = mergedNames(pats)
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdxs = valCols.map(df.schema.fieldIndex).toArray
    val engs =
      pats.map(new Engine(_, nVals = valCols.length)).toIndexedSeq
    val patV = pats.toIndexedSeq
    SecondarySort.mapOrderedGroups(
      df, Seq(keyCol), Seq(col(timeCol)),
      outSchema(df, keyCol, names, measures)) {
      (key, rows) =>
        val sts = Array.fill(engs.length)(emptyState)
        val matched = rows.flatMap { r =>
          val t = r.getLong(tIdx); val v = readVals(r, vIdxs)
          engs.indices.iterator.flatMap { i =>
            val (s2, ms, _) = engs(i).advance(sts(i), t, v)
            sts(i) = s2
            ms.map { case (a, b, c, m) =>
              doneRow(key.head, patV(i), names, measures, a, b, c, m) }
          }
        }
        matched ++ engs.indices.iterator.flatMap { i =>
          engs(i).flush(sts(i)).iterator.map { case (a, b, c, m) =>
            doneRow(key.head, patV(i), names, measures, a, b, c, m)
          }
        }
    }
  }

  // ------------------------------------------- nested-NFA face (groups²)

  /** Translate a Builder whose pattern NESTS groups (or quantifies one
    * unboundedly) onto [[CepNfa]] nested elements — the reference's
    * GroupPattern tier (GroupPattern.java nests arbitrarily via
    * Pattern.begin(Pattern)).
    *
    * Encoding: relaxed contiguity becomes a synthetic RELUCTANT skip
    * step — `followedBy X` is `(¬X)* X` under strict contiguity (the
    * gap cannot consume a row the target would match, so the first
    * match advances — the reference's skip-till-next semantics), and
    * `followedByAny X` is `(any)*? X` (the run-splitting NFA branches
    * on every later match; the reluctant gap makes the earliest one
    * the per-anchor winner). Relaxed ITERATION contiguity unrolls:
    * `(G)+` with relaxed chaining is `G ((gap) G)*`. Gap steps carry
    * unique `__gap<i>` names and their count columns are dropped from
    * the output.
    *
    * Emission follows MATCH_RECOGNIZE resolution (one best
    * interpretation per anchor under the given [[AfterMatchSkip]]) —
    * parity with [[CepNfa.nested]], a documented delta from the
    * expansion tier's NoSkip every-interpretation emission. A second
    * inherited delta: the NFA replays (prev, cur) pairs, so a
    * partition's FIRST row cannot anchor a match (no PREV row exists),
    * where this tier's own engine anchors on the first row.
    *
    * Not representable here (rejected with pointers): NOT patterns,
    * until(), greedy-final emission, allowGaps/allowCombinations on
    * quantified steps, PREVIOUS_AND_CURRENT within, bounded group
    * ranges (`times(from, to)` on a group — the expansion tier serves
    * those for single-level patterns), optional unbounded groups, and
    * relaxed gaps into optional or iterative-condition targets. */
  private def translateNested(b: Builder): Seq[CepNfa.PatternElem] = {
    val ss = b.steps.toIndexedSeq
    val gs = b.groups.toIndexedSeq
    require(!b.lastWasNot && b.pendingNotNext.isEmpty &&
      b.pendingNotDuring.isEmpty,
      "NOT patterns are not supported on the nested-NFA face")
    require(b.maxGapUs.isEmpty,
      "within(PREVIOUS_AND_CURRENT) is not supported on the nested-NFA face")
    require(b.skip == NoSkip,
      "the nested-NFA face takes its own AfterMatchSkip parameter " +
        "(MATCH_RECOGNIZE scheduling); builder-level skip strategies " +
        "apply to the expansion tier")
    ss.foreach { s =>
      require(s.notNextCond.isEmpty && s.notDuringCond.isEmpty,
        "NOT patterns are not supported on the nested-NFA face")
      require(s.untilCond.isEmpty,
        "until() is not supported on the nested-NFA face")
      require(!s.greedy,
        "greedy() final emission is not supported on the nested-NFA face")
      require(s.internal == Strict || s.maxTimes <= 1,
        s"allowGaps/allowCombinations on quantified step ${s.name} is " +
          "not supported on the nested-NFA face")
    }

    var gapId = 0
    // `loop = true` marks a gap at a group-iteration head: it must NOT
    // be reluctant — a reluctant count there would dominate the
    // lexicographic candidate order and prefer FEWER iterations,
    // inverting the greedy group default. (For `¬X` gaps the length is
    // forced — the gap cannot consume a row the head would match — so
    // the direction only matters for this dominance.) Entry gaps ARE
    // reluctant: for `(any)*` followedByAny gaps that makes the
    // EARLIEST following match the per-anchor winner.
    def gap(notPred: Option[Vals => Boolean],
        loop: Boolean): CepNfa.PatternElem = {
      gapId += 1
      val iter: CepNfa.IterCond = notPred match {
        case Some(f) => (_, cv, _) => !f(cv.toArray)
        case None => (_, _, _) => true
      }
      CepNfa.Atom(
        PatternStep(s"__gap$gapId", (_, _) => true, greedy = true,
          minCount = 0, reluctant = !loop),
        0, Some(iter))
    }
    def iterOf(s: Step): CepNfa.IterCond = s.iterCond match {
      case Some(f) => (_, cv, ctx) => f(cv.toArray, ctx)
      case None => val w = s.where; (_, cv, _) => w(cv.toArray)
    }
    def atomsOf(s: Step): Seq[CepNfa.PatternElem] = {
      val it = Some(iterOf(s))
      def one(min: Int, gr: Boolean) = CepNfa.Atom(
        PatternStep(s.name, (_, _) => true, greedy = gr, minCount = min),
        0, it)
      if (s.maxTimes == Int.MaxValue) Seq(one(s.minTimes, gr = true))
      else Seq.fill(s.minTimes)(one(1, gr = false)) ++
        Seq.fill(s.maxTimes - s.minTimes)(one(0, gr = false))
    }
    // gap negation target: the condition of the element headed by step i
    def entryWhere(i: Int): Vals => Boolean = {
      val s = ss(i)
      require(s.iterCond.isEmpty,
        s"a relaxed gap into iterative-condition step ${s.name} cannot " +
          "be negated — use followedByAny or next")
      require(s.minTimes >= 1,
        s"a relaxed gap into optional step ${s.name} is ambiguous — " +
          "make the target required or use next")
      s.where
    }
    def gapOf(link: Link, headIdx: Int,
        loop: Boolean = false): Seq[CepNfa.PatternElem] =
      link match {
        case Strict => Nil
        case Relaxed => Seq(gap(Some(entryWhere(headIdx)), loop))
        case RelaxedAny => Seq(gap(None, loop))
      }

    /** Elements of one level (`parent` group id, -1 = root) between
      * flat steps [lo..hi]. The level's FIRST element emits no entry
      * gap — its link is carried by the caller (the group's entry or
      * iteration gap, or the pattern start). */
    def level(lo: Int, hi: Int, parent: Int): Seq[CepNfa.PatternElem] = {
      val out = Seq.newBuilder[CepNfa.PatternElem]
      var i = lo
      var first = true
      while (i <= hi) {
        gs.indices.find(g => gs(g).start == i && gs(g).parent == parent)
          match {
          case Some(g) =>
            val grp = gs(g)
            val entry =
              if (first) Nil else gapOf(ss(grp.start).link, grp.start)
            val body = level(grp.start, grp.end, g)
            def iterGap: Seq[CepNfa.PatternElem] =
              gapOf(grp.iterLink, grp.start, loop = true)
            (grp.min, grp.max) match {
              case (1, 1) =>
                out ++= entry; out ++= body
              case (n, m) if n == m =>
                if (grp.iterLink == Strict) {
                  out ++= entry
                  out += CepNfa.GroupElem(body, n, greedy = false)
                } else {
                  out ++= entry; out ++= body
                  (2 to n).foreach { _ => out ++= iterGap; out ++= body }
                }
              case (n, Int.MaxValue) =>
                require(n >= 1,
                  "an optional unbounded group ((G)*) is not supported " +
                    "on the nested-NFA face — anchor with a required " +
                    "first iteration ((G)+ / timesOrMore)")
                if (grp.iterLink == Strict) {
                  out ++= entry
                  out += CepNfa.GroupElem(body, n, greedy = true)
                } else {
                  out ++= entry; out ++= body
                  (2 to n).foreach { _ => out ++= iterGap; out ++= body }
                  out += CepNfa.GroupElem(iterGap ++ body, 0, greedy = true)
                }
              case (n, m) =>
                throw new IllegalArgumentException(
                  s"bounded group ranges times($n, $m) are served by the " +
                    "expansion tier (buildAll) for single-level " +
                    "patterns; on the nested-NFA face use an exact " +
                    "count or oneOrMore/timesOrMore")
            }
            i = grp.end + 1
          case None =>
            val s = ss(i)
            if (!first) out ++= gapOf(s.link, i)
            out ++= atomsOf(s)
            i += 1
        }
        first = false
      }
      out.result()
    }
    level(0, ss.length - 1, -1)
  }

  private def dropGapCols(out: DataFrame): DataFrame =
    out.drop(out.columns.filter(_.startsWith("n___gap")).toSeq: _*)

  /** Batch face for NESTED group patterns (see [[translateNested]]):
    * `CepPattern.nested(df, "k", "t", Seq("v"),
    * CepPattern.begin(inner).oneOrMore().followedBy("c").where(…))`.
    * Within comes from the builder; skip is MATCH_RECOGNIZE
    * [[AfterMatchSkip]] scheduling; measures address steps by name
    * ([[CepNfa.MeasureSpec]]). */
  def nested(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCols: Seq[String],
      b: Builder,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow,
      measures: Seq[CepNfa.MeasureSpec] = Nil): DataFrame =
    dropGapCols(CepNfa.nestedMulti(df, keyCol, timeCol, valCols,
      Seq(translateNested(b)), b.withinUs, skip, measures,
      recentCap = offsetCap(measures)))

  /** Streaming face for NESTED group patterns (see [[nested]]). */
  def nestedStreaming(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCols: Seq[String],
      b: Builder,
      skip: AfterMatchSkip = AfterMatchSkip.PastLastRow,
      measures: Seq[CepNfa.MeasureSpec] = Nil): DataFrame =
    dropGapCols(CepNfa.nestedStreamingMulti(df, keyCol, timeCol, valCols,
      Seq(translateNested(b)), b.withinUs, skip, measures,
      recentCap = offsetCap(measures)))

  /** Logical-offset measures need the engine to retain the first/last
    * (maxOff + 1) values per register (review r11: without this the
    * offset measures silently emitted NULL on the nested faces). */
  private def offsetCap(measures: Seq[CepNfa.MeasureSpec]): Int =
    measures.map(_.off).foldLeft(0)(math.max) match {
      case 0 => 0
      case m => m + 1
    }

  /** Batch face WITH the timeout side output — the reference's
    * TimedOutPartialMatchHandler (flink-libraries/flink-cep/…/functions/
    * TimedOutPartialMatchHandler.java): a `within`-bounded partial match
    * that exceeds the bound surfaces with `timed_out = true` (counts and
    * measures of the rows it HAD consumed; end_us = its last matched
    * row) when the first over-budget row arrives. Completed matches
    * carry `timed_out = false`. Requires a within bound. */
  def withTimeouts(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      pat: Pattern,
      measures: Seq[Measure] = Nil): DataFrame = {
    require(pat.withinUs.isDefined,
      "the timeout side output requires a within bound")
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val names = mergedNames(Seq(pat))
    val eng = new Engine(pat, emitTimeouts = true)
    val schema = StructType(outSchema(df, keyCol, names, measures)
      .fields :+ StructField("timed_out", BooleanType))
    SecondarySort.mapOrderedGroups(
      df, Seq(keyCol), Seq(col(timeCol)), schema) {
      (key, rows) =>
        def row(d: (Long, Vector[Long], Vector[Vector[CepNfa.Meas]], Long),
            flag: Boolean): Row = Row.fromSeq(
          doneRow(key.head, pat, names, measures, d._4, d._1, d._2, d._3)
            .toSeq :+ flag)
        var st = emptyState
        val emitted = rows.flatMap { r =>
          val (s2, ms, ts) =
            eng.advance(st, r.getLong(tIdx), Array(r.getDouble(vIdx)))
          st = s2
          ms.map { case (a, b, c, m) => row((b, c, m, a), flag = false) } ++
            ts.map { case (a, b, c, m) => row((b, c, m, a), flag = true) }
        }
        emitted ++ eng.flush(st).iterator.map { case (a, b, c, m) =>
          row((b, c, m, a), flag = false)
        }
    }
  }

  /** Streaming face on the PTF hook: runs + held candidates persist as
    * keyed state; rows are ordered within each micro-batch slice
    * (cross-batch order is the source's responsibility). */
  def streaming(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      pat: Pattern,
      measures: Seq[Measure] = Nil): DataFrame =
    streamingFace(df, keyCol, timeCol, Seq(valCol), Seq(pat), measures,
      emitTimeouts = false)

  /** Streaming face over SEVERAL interpretation branches (see
    * [[applyAll]]): per-key state is the vector of branch NFA states. */
  def streamingAll(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      pats: Seq[Pattern],
      measures: Seq[Measure] = Nil): DataFrame = {
    require(pats.nonEmpty, "at least one pattern branch")
    require(pats.size == 1 || pats.forall(_.skip == NoSkip),
      "several branches require the NoSkip strategy")
    streamingFace(df, keyCol, timeCol, Seq(valCol), pats, measures,
      emitTimeouts = false)
  }

  /** Streaming face WITH the timeout side output (see [[withTimeouts]]):
    * over-budget partials surface flagged when the WATERMARK passes
    * their deadline (the reference's timer-driven
    * TimedOutPartialMatchHandler). */
  def streamingWithTimeouts(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      pat: Pattern,
      measures: Seq[Measure] = Nil): DataFrame = {
    require(pat.withinUs.isDefined,
      "the timeout side output requires a within bound")
    streamingFace(df, keyCol, timeCol, Seq(valCol), Seq(pat), measures,
      emitTimeouts = true)
  }

  /** Shared streaming body: rows advance the NFA; watermark passage
    * (including timer wake-ups on silent keys) releases matured
    * trailing-not candidates and expires WITHIN-dead runs — the
    * reference's timer-based state cleanup, so per-key state cannot
    * outlive its within bound. The engine time column is exact µs;
    * the watermark maps as wmUs = watermarkMs * 1000 (the ts =
    * timestamp_micros(ts_us) convention of every PTF operator). */
  private def streamingFace(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCols: Seq[String],
      pats: Seq[Pattern],
      measures: Seq[Measure],
      emitTimeouts: Boolean): DataFrame = {
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdxs = valCols.map(df.schema.fieldIndex).toArray
    val names = mergedNames(pats)
    val patV = pats.toIndexedSeq
    val engs = patV.map(
      new Engine(_, emitTimeouts, wmRelease = true, valCols.length))
    val base = outSchema(df, keyCol, names, measures)
    val schema =
      if (emitTimeouts)
        StructType(base.fields :+ StructField("timed_out", BooleanType))
      else base
    val ptf = new GraftPTF[Vector[PatState]] {
      def process(
          key: Row,
          rows: Iterator[Row],
          state: Option[Vector[PatState]],
          watermarkMs: Long)
          : (Option[Vector[PatState]], Seq[Row], Option[Long]) = {
        val sts = state.getOrElse(
          Vector.fill(engs.length)(emptyState)).toArray
        val out = Seq.newBuilder[Row]
        def emit(i: Int,
            d: (Long, Long, Vector[Long], Vector[Vector[CepNfa.Meas]]),
            flag: Boolean): Unit = {
          val r = doneRow(key.get(0), patV(i), names, measures,
            d._1, d._2, d._3, d._4)
          out += (if (emitTimeouts) Row.fromSeq(r.toSeq :+ flag) else r)
        }
        rows.toSeq.sortBy(_.getLong(tIdx)).foreach { r =>
          val t = r.getLong(tIdx); val v = readVals(r, vIdxs)
          engs.indices.foreach { i =>
            val (s2, ms, ts) = engs(i).advance(sts(i), t, v)
            sts(i) = s2
            ms.foreach(emit(i, _, flag = false))
            ts.foreach(emit(i, _, flag = true))
          }
        }
        val wmUs =
          if (watermarkMs == Long.MaxValue) Long.MaxValue
          else watermarkMs * 1000L
        var wakeUs: Option[Long] = None
        engs.indices.foreach { i =>
          val (s3, ms3, ts3, w) = engs(i).onWatermark(sts(i), wmUs)
          sts(i) = s3
          ms3.foreach(emit(i, _, flag = false))
          ts3.foreach(emit(i, _, flag = true))
          wakeUs = (wakeUs.toList ++ w.toList).minOption
        }
        val wakeMs = wakeUs.map(u => u / 1000L + 1L)
        (Some(sts.toVector), out.result(), wakeMs)
      }
    }
    ProcessTableFunction(df, Seq(keyCol), schema, ptf)
  }
}
