package graft

import graft.operators.{AfterMatchSkip, CepNfa, Dedup, PatternMatch, PatternStep}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The concurrent-run NFA engine: run-splitting (greedy backtracking),
  * alternation branches, exact PERMUTE without the exclusivity
  * restriction, eager WITHIN pruning, and parity with the deterministic
  * engine on the transition-exclusive patterns it is exact for. */
class CepNfaSpec extends SparkSpecBase {
  import spark.implicits._

  private val down = PatternStep("down", (p: Double, c: Double) => c < p,
    greedy = true)
  private val upOnce = PatternStep("up", (p: Double, c: Double) => c > p,
    greedy = false)
  private val upRun = PatternStep("up", (p: Double, c: Double) => c > p,
    greedy = true)
  // overlapping pair: every flat pair satisfies BOTH steps
  private val nonIncThenFlat = Seq(
    PatternStep("a", (p: Double, c: Double) => c <= p, greedy = true),
    PatternStep("b", (p: Double, c: Double) => c == p, greedy = false))

  test("run split recovers the greedy-backtracking match") {
    // 5,4,3,3,7 with pattern a+(c<=p) b(c==p): greedy a+ swallows the
    // flat (3,3) pair; backtracking gives it back as b.
    val rows = Seq((1L, 1L, 5.0), (1L, 2L, 4.0), (1L, 3L, 3.0),
      (1L, 4L, 3.0), (1L, 5L, 7.0)).toDF("k", "t", "v")
    val nfa = CepNfa.single(rows, "k", "t", "v", nonIncThenFlat)
      .select($"start_us", $"end_us", $"n_a", $"n_b")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(nfa == Set((1L, 4L, 2L, 1L)))
    // the deterministic engine misses it — the defect this engine fixes
    assert(PatternMatch(rows, "k", "t", "v", nonIncThenFlat).count() == 0)
  }

  test("held candidate emitted only when the longer sibling dies") {
    // pairs D,E,E,D then rise: candidates (a=1,b=1 at the first flat) and
    // (a=2,b=1 at the second) are held while the greedy take-branch lives;
    // the lexicographically larger (a=2, ending at the LAST flat pair)
    // wins once the run dies at the rise.
    val rows = Seq((1L, 1L, 9.0), (1L, 2L, 7.0), (1L, 3L, 7.0),
      (1L, 4L, 7.0), (1L, 5L, 5.0), (1L, 6L, 8.0)).toDF("k", "t", "v")
    val nfa = CepNfa.single(rows, "k", "t", "v", nonIncThenFlat)
      .select($"start_us", $"end_us", $"n_a", $"n_b")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(nfa == Set((1L, 4L, 2L, 1L)))
  }

  test("parity with the deterministic engine on exclusive patterns") {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
    val d = Dedup.keepFirst(e,
      Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
    val steps = Seq(down, upRun)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val det = PatternMatch(d, "user_id", "ts_us", "value", steps)
      .collect().map(key).toSet
    val nfa = CepNfa.single(d, "user_id", "ts_us", "value", steps)
      .collect().map(key).toSet
    assert(det == nfa && det.nonEmpty)

    // SKIP TO NEXT ROW: suffix anchors match the anchor-vector emission
    val detN = PatternMatch(d, "user_id", "ts_us", "value", Seq(down, upOnce),
      skip = AfterMatchSkip.ToNextRow).collect().map(key).toSet
    val nfaN = CepNfa.single(d, "user_id", "ts_us", "value",
      Seq(down, upOnce), skip = AfterMatchSkip.ToNextRow)
      .collect().map(key).toSet
    assert(detN == nfaN && detN.size > det.size)
  }

  test("PERMUTE with overlapping steps emits one winner per anchor") {
    // x and y are the SAME predicate — maximal overlap. The union
    // expansion double-emits; per-anchor resolution picks one branch.
    val rows = Seq((1L, 1L, 0.0), (1L, 2L, 0.0), (1L, 3L, 1.0),
      (1L, 4L, 2.0)).toDF("k", "t", "v")
    val calm = PatternStep("calm", (p: Double, c: Double) => c == p,
      greedy = true)
    val x = PatternStep("x", (p: Double, c: Double) => c - p >= 1,
      greedy = false)
    val y = PatternStep("y", (p: Double, c: Double) => c - p >= 1,
      greedy = false)
    val union = PatternMatch.permute(rows, "k", "t", "v",
      prefix = Seq(calm), permuted = Seq(x, y))
    assert(union.count() == 2) // the documented double-emission defect
    val nfa = CepNfa.permute(rows, "k", "t", "v",
      prefix = Seq(calm), permuted = Seq(x, y))
      .select($"start_us", $"end_us", $"n_calm", $"n_x", $"n_y")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(nfa == Set((1L, 4L, 1L, 1L, 1L)))
  }

  test("eager WITHIN recovers later anchors inside an over-budget run") {
    val rows = Seq((1L, 0L, 10.0), (1L, 1L, 9.0), (1L, 2L, 8.0),
      (1L, 3L, 7.0), (1L, 4L, 9.0)).toDF("k", "t", "v")
    val steps = Seq(down, upOnce)
    // completion-time check: the single run is over budget and its
    // consumed rows are lost
    assert(PatternMatch(rows, "k", "t", "v", steps,
      withinUs = Some(3L)).count() == 0)
    // eager pruning: the anchor at t=1 stays in budget and matches
    val nfa = CepNfa.single(rows, "k", "t", "v", steps,
      withinUs = Some(3L))
      .select($"start_us", $"end_us", $"n_down", $"n_up")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(nfa == Set((1L, 4L, 2L, 1L)))
  }

  test("alternation branches: V and inverted-V both found, no overlap") {
    // 5,4,3,6,9,7,5: a V (down,down,up) then an inverted V (up,down) —
    // PastLastRow lets the second match re-anchor AT the first's end row.
    val rows = Seq((1L, 1L, 5.0), (1L, 2L, 4.0), (1L, 3L, 3.0),
      (1L, 4L, 6.0), (1L, 5L, 9.0), (1L, 6L, 7.0), (1L, 7L, 5.0))
      .toDF("k", "t", "v")
    val v = Seq(down, upOnce)
    val lambda = Seq(upRun,
      PatternStep("down", (p: Double, c: Double) => c < p, greedy = false))
    val out = CepNfa(rows, "k", "t", "v", Seq(v, lambda))
      .select($"start_us", $"end_us", $"n_down", $"n_up")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 4L, 2L, 1L), (4L, 6L, 1L, 1L)))
  }

  test("streaming parity: NFA state (runs + held candidates) crosses batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // sequences end in a sharp rise so every run dies and all held
    // candidates drain (streams have no end-of-input flush)
    val series = Seq(
      1L -> Seq(10.0, 8.0, 5.0, 5.0, 9.0, 7.0, 6.0, 6.0, 12.0),
      2L -> Seq(4.0, 4.0, 3.0, 3.0, 8.0))
    val rows = series.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, (i + 1) * 1000L, v) }
    }
    val batch = CepNfa.single(rows.toDF("user_id", "ts_us", "value"),
      "user_id", "ts_us", "value", nonIncThenFlat)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nfa-").toString
    val q = CepNfa.streaming(df, "user_id", "ts_us", "value",
      Seq(nonIncThenFlat))
      .writeStream.format("memory").queryName("nfa_t")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val ordered = rows.sortBy(r => (r._2, r._1))
      val (a, b) = ordered.splitAt(ordered.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("nfa_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  // ----- nested group patterns (GroupPattern.java) -----

  private val downOne = PatternStep("down", (p: Double, c: Double) => c < p,
    greedy = false)
  private val upOne2 = PatternStep("up", (p: Double, c: Double) => c > p,
    greedy = false)
  private val duGroup = CepNfa.groupOf(Seq(downOne, upOne2))

  private def nestedMatches(
      rows: Seq[(Long, Long, Double)],
      elems: Seq[CepNfa.PatternElem]): Set[Seq[Long]] =
    CepNfa.nested(rows.toDF("k", "t", "v"), "k", "t", "v", Seq(elems))
      .collect().map(_.toSeq.map(_.asInstanceOf[Long]).tail.toSeq).toSet

  private def series(vs: Double*): Seq[(Long, Long, Double)] =
    vs.zipWithIndex.map { case (v, i) => (1L, (i + 1).toLong, v) }

  test("group (down up)+ iterates greedily across iterations") {
    // pairs D,U,D,U,D → two full iterations, the trailing D dies
    val m = nestedMatches(series(5, 3, 6, 2, 9, 1), Seq(duGroup))
    assert(m == Set(Seq(1L, 5L, 2L, 2L)))
  }

  test("mid-iteration death falls back to the completed iterations") {
    // pairs D,U,D: the loop-back consumes the trailing D and dies — the
    // exit-now held candidate recovers the 1-iteration match
    val m = nestedMatches(series(5, 3, 6, 2), Seq(duGroup))
    assert(m == Set(Seq(1L, 3L, 1L, 1L)))
  }

  test("group minIters gates the match") {
    val two = CepNfa.groupOf(Seq(downOne, upOne2), minIters = 2)
    assert(nestedMatches(series(5, 3, 6, 2), Seq(two)).isEmpty)
    assert(nestedMatches(series(5, 3, 6, 2, 9), Seq(two)) ==
      Set(Seq(1L, 5L, 2L, 2L)))
  }

  test("non-greedy group stops at exactly minIters iterations") {
    // pairs D,U,D,U,D,U — three iterations available
    val rows = series(5, 3, 6, 2, 9, 1, 7)
    val greedy = CepNfa.groupOf(Seq(downOne, upOne2), minIters = 2)
    assert(nestedMatches(rows, Seq(greedy)) == Set(Seq(1L, 7L, 3L, 3L)))
    val exact = CepNfa.groupOf(Seq(downOne, upOne2), minIters = 2,
      greedy = false)
    // stops after two iterations; the leftover single D,U pair at the
    // boundary can't reach minIters again
    assert(nestedMatches(rows, Seq(exact)) == Set(Seq(1L, 5L, 2L, 2L)))
  }

  test("group followed by a required suffix step") {
    val flat = PatternStep("flat", (p: Double, c: Double) => c == p,
      greedy = false)
    val elems = Seq(duGroup, CepNfa.Atom(flat))
    // pairs D,U,D,U,E → both iterations then the flat suffix
    assert(nestedMatches(series(5, 3, 6, 2, 9, 9), elems) ==
      Set(Seq(1L, 6L, 2L, 2L, 1L)))
    // no flat → no match (exit-now is not a valid completion here)
    assert(nestedMatches(series(5, 3, 6, 2, 9), elems).isEmpty)
  }

  test("optional group (minIters = 0) is entered or skipped over") {
    val calm = PatternStep("calm", (p: Double, c: Double) => c == p,
      greedy = true)
    val opt = CepNfa.groupOf(Seq(downOne, upOne2), minIters = 0)
    val elems = Seq(CepNfa.Atom(calm), opt)
    // pairs E,D,U → calm then one iteration (greedy prefers entering)
    assert(nestedMatches(series(7, 7, 5, 8), elems) ==
      Set(Seq(1L, 4L, 1L, 1L, 1L)))
    // pairs E,U → the group never opens; the match is calm alone
    assert(nestedMatches(series(7, 7, 9), elems) ==
      Set(Seq(1L, 2L, 1L, 0L, 0L)))
  }

  test("same-span single-child group (((down)+)+) terminates and matches") {
    // regression: walkInto(outer) → walkInto(inner) used to recurse
    // forever when a group's body is exactly one nested group with the
    // same flat span; entry is now restricted to DIRECT children
    val inner = CepNfa.groupOf(Seq(downOne))
    val outer = CepNfa.GroupElem(Seq(inner))
    // pairs D,D,D → the down step accumulates across iterations
    val m = nestedMatches(series(9, 7, 5, 3), Seq(outer))
    assert(m == Set(Seq(1L, 4L, 3L)))
    // and the plain singly-wrapped form agrees on the counts
    assert(nestedMatches(series(9, 7, 5, 3), Seq(inner)) ==
      Set(Seq(1L, 4L, 3L)))
  }

  test("greedy inner step within a group") {
    // (down+ up)+ : pairs D,D,U,D,U → iter1 has two downs, iter2 one
    val downRun = PatternStep("down", (p: Double, c: Double) => c < p,
      greedy = true)
    val g = CepNfa.groupOf(Seq(downRun, upOne2))
    assert(nestedMatches(series(9, 7, 5, 8, 2, 6), Seq(g)) ==
      Set(Seq(1L, 6L, 3L, 2L)))
  }

  test("MEASURES accumulate across group iterations") {
    // (down up)+ over 5,3,6,2,9: two iterations — sum_down = 3+2,
    // min_down = 2, last_up = 9, first_down = 3
    val rows = series(5, 3, 6, 2, 9, 1)
    val m = CepNfa.nested(rows.toDF("k", "t", "v"), "k", "t", "v",
      Seq(Seq(duGroup)),
      measures = Seq(
        CepNfa.MeasureSpec("sum", "down", "sum_down"),
        CepNfa.MeasureSpec("min", "down", "min_down"),
        CepNfa.MeasureSpec("first", "down", "first_down"),
        CepNfa.MeasureSpec("last", "up", "last_up")))
      .select($"sum_down", $"min_down", $"first_down", $"last_up")
      .as[(Double, Double, Double, Double)].collect().toSet
    assert(m == Set((5.0, 2.0, 3.0, 9.0)), s"got $m")
  }

  // ----- groups INSIDE groups (GroupPattern.java nests arbitrarily) -----

  private val flatOne = PatternStep("flat", (p: Double, c: Double) => c == p,
    greedy = false)

  /** ((down up)+ flat) under an outer quantifier. */
  private def nested2(outerMin: Int): Seq[CepNfa.PatternElem] = Seq(
    CepNfa.GroupElem(Seq(duGroup, CepNfa.Atom(flatOne)), minIters = outerMin))

  test("depth-2: ((down up)+ flat)+ spans two outer iterations") {
    // pairs D,U,E,D,U,E → outer iterations (DU E)(DU E)
    val m = nestedMatches(series(5, 3, 6, 6, 2, 9, 9), nested2(1))
    assert(m == Set(Seq(1L, 7L, 2L, 2L, 2L)), s"got $m")
  }

  test("depth-2: outer minIters gates; greedy inner iterations counted") {
    // pairs D,U,D,U,E — one outer iteration with TWO inner iterations
    assert(nestedMatches(series(5, 3, 6, 2, 9, 9), nested2(1)) ==
      Set(Seq(1L, 6L, 2L, 2L, 1L)))
    // {2,}: a single outer iteration is not a match
    assert(nestedMatches(series(5, 3, 6, 2, 9, 9), nested2(2)).isEmpty)
    // two full outer iterations satisfy {2,}
    assert(nestedMatches(series(5, 3, 6, 6, 2, 9, 9), nested2(2)) ==
      Set(Seq(1L, 7L, 2L, 2L, 2L)))
  }

  test("depth-2: mid-outer-iteration death falls back to completed iterations") {
    // pairs D,U,E,D,U then input end: the second outer iteration never
    // sees its flat — the held 1-iteration match survives
    val m = nestedMatches(series(5, 3, 6, 6, 2, 9), nested2(1))
    assert(m == Set(Seq(1L, 4L, 1L, 1L, 1L)), s"got $m")
  }

  test("depth-2: inner iteration counters reset on outer loop-back") {
    val duMin2 = CepNfa.groupOf(Seq(downOne, upOne2), minIters = 2)
    val elems = Seq(
      CepNfa.GroupElem(Seq(duMin2, CepNfa.Atom(flatOne)), minIters = 1))
    // ((down up){2,} flat)+ : pairs D,U,D,U,E,D,U,E — the second outer
    // iteration has only ONE du pair; if the inner counter leaked from
    // iteration 1 the engine would wrongly exit to flat and match long
    val m = nestedMatches(series(5, 3, 6, 2, 9, 9, 7, 8, 8), elems)
    assert(m == Set(Seq(1L, 6L, 2L, 2L, 1L)), s"got $m")
    // and a genuine double-du second iteration DOES extend the match
    val m2 = nestedMatches(series(5, 3, 6, 2, 9, 9, 7, 8, 6, 9, 9), elems)
    assert(m2 == Set(Seq(1L, 11L, 4L, 4L, 2L)), s"got $m2")
  }

  test("depth-3: (((down up)+ flat)+ jump)+ nests three levels") {
    val jump = PatternStep("jump", (p: Double, c: Double) => c - p >= 10,
      greedy = false)
    val elems: Seq[CepNfa.PatternElem] = Seq(
      CepNfa.GroupElem(Seq(
        CepNfa.GroupElem(Seq(duGroup, CepNfa.Atom(flatOne)), minIters = 1),
        CepNfa.Atom(jump)), minIters = 1))
    // pairs D,U,E,D,U,E,J | D,U,E,J — two outer iterations, the first
    // with two mid-level ((down up)+ flat) iterations
    val m = nestedMatches(
      series(5, 3, 6, 6, 2, 9, 9, 25, 20, 26, 26, 40), elems)
    assert(m == Set(Seq(1L, 12L, 3L, 3L, 3L, 2L)), s"got $m")
  }

  test("depth-2: streaming face matches batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // trailing lone U pair kills every live run (a flat would leave the
    // outer loop alive — streams have no end-of-input flush)
    val rows = series(5, 3, 6, 6, 2, 9, 9, 1, 4, 4, 9)
    val elems = nested2(1)
    val batch = CepNfa.nested(rows.toDF("user_id", "ts_us", "value"),
      "user_id", "ts_us", "value", Seq(elems))
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nf2-").toString
    val q = CepNfa.nestedStreaming(df, "user_id", "ts_us", "value",
      Seq(elems))
      .writeStream.format("memory").queryName("nfa_n2")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("nfa_n2").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming parity for group patterns across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // each key ends on a flat (E) pair so every run dies and all held
    // candidates drain — streams have no end-of-input flush
    val series2 = Seq(
      1L -> Seq(5.0, 3.0, 6.0, 2.0, 9.0, 1.0, 7.0, 7.0, 20.0, 20.0),
      2L -> Seq(4.0, 2.0, 8.0, 8.0, 1.0, 9.0, 9.0))
    val rows = series2.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, (i + 1) * 1000L, v) }
    }
    val elems = Seq(duGroup)
    val batch = CepNfa.nested(rows.toDF("user_id", "ts_us", "value"),
      "user_id", "ts_us", "value", Seq(elems))
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nfg-").toString
    val q = CepNfa.nestedStreaming(df, "user_id", "ts_us", "value",
      Seq(elems))
      .writeStream.format("memory").queryName("nfa_g")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val ordered = rows.sortBy(r => (r._2, r._1))
      val (a, b) = ordered.splitAt(ordered.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("nfa_g").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  // ---------------------------------------------- SKIP TO FIRST / LAST

  private val bPlusC = Seq(
    PatternStep("b", (_: Double, c: Double) => c == 2.0, greedy = true),
    PatternStep("c", (_: Double, c: Double) => c == 3.0, greedy = false))

  test("SKIP TO FIRST/LAST variable prunes by the variable's row times") {
    // b+ c over 2,2,2,2,3: anchors at t0,t1,t2 all complete on the 3.
    val rows = Seq((1L, 0L, 2.0), (1L, 1L, 2.0), (1L, 2L, 2.0),
      (1L, 3L, 2.0), (1L, 4L, 3.0)).toDF("k", "t", "v")
    def run(skip: AfterMatchSkip) =
      CepNfa.single(rows, "k", "t", "v", bPlusC, None, skip)
        .select($"start_us", $"n_b").as[(Long, Long)].collect().toSet
    // the default consumes the matched rows: one (greedy-longest) match
    assert(run(AfterMatchSkip.PastLastRow) == Set((0L, 3L)))
    // TO FIRST b: the emitted match's first b row IS its first row, so
    // every later anchor survives — full overlap (SkipToFirstStrategy)
    assert(run(AfterMatchSkip.ToFirst("b")) ==
      Set((0L, 3L), (1L, 2L), (2L, 1L)))
    // TO LAST b: only the partial starting AT the last b row survives
    assert(run(AfterMatchSkip.ToLast("b")) == Set((0L, 3L), (2L, 1L)))
    // a variable the match never bound prunes nothing — the reference's
    // non-throwing default (SkipToElementStrategy.getPruningId miss)
    assert(run(AfterMatchSkip.ToFirst("nope")) ==
      Set((0L, 3L), (1L, 2L), (2L, 1L)))
  }

  test("SKIP TO LAST via the MATCH_RECOGNIZE SQL entry") {
    val rows = Seq((1L, 0L, 2.0), (1L, 1L, 2.0), (1L, 2L, 2.0),
      (1L, 3L, 2.0), (1L, 4L, 3.0)).toDF("k", "t", "v")
    val out = graft.sql.FlinkSql.sql(spark,
      """SELECT k, start_us, n_b FROM t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY t
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO LAST b
        |  PATTERN (b+ c)
        |  DEFINE b AS v = 2, c AS v = 3
        |) ORDER BY start_us""".stripMargin,
      Map("t" -> rows))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 3L), (1L, 2L, 1L)))
  }

  test("streaming parity for SKIP TO LAST across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq((1L, 1000L, 2.0), (1L, 2000L, 2.0), (1L, 3000L, 2.0),
      (1L, 4000L, 2.0), (1L, 5000L, 3.0), (2L, 1000L, 2.0),
      (2L, 2000L, 2.0), (2L, 3000L, 3.0))
    val batch = CepNfa.single(rows.toDF("user_id", "ts_us", "value"),
      "user_id", "ts_us", "value", bPlusC, None,
      AfterMatchSkip.ToLast("b")).collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nfs-").toString
    val q = CepNfa.streaming(df, "user_id", "ts_us", "value",
      Seq(bPlusC), None, AfterMatchSkip.ToLast("b"))
      .writeStream.format("memory").queryName("nfa_skip")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val ordered = rows.sortBy(r => (r._2, r._1))
      val (a, b) = ordered.splitAt(ordered.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("nfa_skip").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  // ----- iterative (aggregate) conditions (IterativeCondition.java:63) -----

  /** `a{2,}` extending while the running sum INCLUDING the row under test
    * stays within budget — `DEFINE A AS SUM(A.v) <= 10`. */
  private val sumBudgetElems: Seq[CepNfa.PatternElem] = Seq(
    CepNfa.Atom(
      PatternStep("a", (_: Double, _: Double) => true, greedy = true,
        minCount = 2),
      0,
      Some((_: Vector[Double], cv: Vector[Double], ctx: CepNfa.MatchCtx) => {
        val s = ctx.sum("a")
        (if (s.isNaN) 0.0 else s) + cv(0) <= 10.0
      })))

  test("aggregate DEFINE: running self-sum budget gates extension") {
    // 5,3,2,4,9,20: anchor@t2 takes 3,2,4 (sum 9; +9 busts), anchor@t3
    // takes 2,4 (sum 6; +9 busts); later anchors never reach minCount.
    val rows = Seq((1L, 1L, 5.0), (1L, 2L, 3.0), (1L, 3L, 2.0),
      (1L, 4L, 4.0), (1L, 5L, 9.0), (1L, 6L, 20.0)).toDF("k", "t", "v")
    val got = CepNfa.nested(rows, "k", "t", "v", Seq(sumBudgetElems),
      skip = AfterMatchSkip.ToNextRow)
      .select($"start_us", $"end_us", $"n_a")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 4L, 3L), (2L, 4L, 2L)))
  }

  test("aggregate DEFINE: cross-variable AVG(A) read from matched rows") {
    // a{2,} (always true) then b with cur < AVG(a): 8,6,7,3 → a=[6,7]
    // (avg 6.5), b=3 completes; greedy prefer-longer picks the maximal a.
    val avgElems: Seq[CepNfa.PatternElem] = Seq(
      CepNfa.Atom(
        PatternStep("a", (_: Double, _: Double) => true, greedy = true,
          minCount = 2)),
      CepNfa.Atom(
        PatternStep("b", (_: Double, _: Double) => true, greedy = false),
        0,
        Some((_: Vector[Double], cv: Vector[Double], c: CepNfa.MatchCtx) =>
          cv(0) < c.avg("a"))))
    val rows = Seq((1L, 1L, 8.0), (1L, 2L, 6.0), (1L, 3L, 7.0),
      (1L, 4L, 3.0)).toDF("k", "t", "v")
    val got = CepNfa.nested(rows, "k", "t", "v", Seq(avgElems))
      .select($"start_us", $"end_us", $"n_a", $"n_b")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 4L, 2L, 1L)))
  }

  test("streaming parity for iterative conditions across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq((1L, 1000L, 5.0), (1L, 2000L, 3.0), (1L, 3000L, 2.0),
      (1L, 4000L, 4.0), (1L, 5000L, 9.0), (1L, 6000L, 20.0),
      (2L, 1000L, 1.0), (2L, 2000L, 2.0), (2L, 3000L, 3.0),
      (2L, 4000L, 30.0))
    val batch = CepNfa.nested(rows.toDF("user_id", "ts_us", "value"),
      "user_id", "ts_us", "value", Seq(sumBudgetElems),
      skip = AfterMatchSkip.ToNextRow).collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nfi-").toString
    val q = CepNfa.nestedStreaming(df, "user_id", "ts_us", "value",
      Seq(sumBudgetElems), None, AfterMatchSkip.ToNextRow)
      .writeStream.format("memory").queryName("nfa_iter")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val ordered = rows.sortBy(r => (r._2, r._1))
      val (a, b) = ordered.splitAt(ordered.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("nfa_iter").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming WITHIN expiry fires on watermark for silent keys") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // greedy down-run stays open (its match only emits when the run
    // dies); the within bound expires via OTHER-key rows advancing the
    // watermark — the timer must emit the in-budget completion
    val input = MemoryStream[(Long, Long, Double)]
    val sdf = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nfw-").toString
    val q = CepNfa.streaming(sdf, "user_id", "ts_us", "value",
      Seq(Seq(down)), withinUs = Some(5000000L))
      .writeStream.format("memory").queryName("nfa_wm")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      input.addData(Seq((1L, 1000000L, 10.0), (1L, 2000000L, 9.0),
        (1L, 3000000L, 8.0)))
      q.processAllAvailable()
      // rising values for key 2: no down-pair ever matches there
      input.addData(Seq((2L, 20000000L, 1.0))); q.processAllAvailable()
      input.addData(Seq((2L, 21000000L, 2.0))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("nfa_wm")
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_down"))
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L, 1000000L, 3000000L, 2L)), got)
  }

  test("MEASURES COUNT and AVG aggregates through the SQL entry") {
    val d = Seq((1L, 1L, 9.0), (1L, 2L, 7.0), (1L, 3L, 5.0), (1L, 4L, 8.0))
      .toDF("user_id", "ts_us", "vf")
    // down matches [7, 5]: COUNT = 2, AVG = 6 (emitted as DoubleType,
    // the engine's uniform measure column type)
    val out = graft.sql.FlinkSql.sql(spark,
      """SELECT user_id, n_cnt, a_avg FROM d MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts_us
        |  MEASURES COUNT(down.vf) AS n_cnt, AVG(down.vf) AS a_avg
        |  PATTERN (down+ up)
        |  DEFINE down AS down.vf < PREV(down.vf),
        |         up AS up.vf > PREV(up.vf)
        |)""".stripMargin, Map("d" -> d))
      .collect().map(_.toSeq).toSeq
    assert(out == Seq(Seq(1L, 2.0, 6.0)), out)
  }
}
