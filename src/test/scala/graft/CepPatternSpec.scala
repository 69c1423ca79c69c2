package graft

import graft.operators.CepPattern
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The Pattern-API tier (Pattern.java:349-430): relaxed contiguity
  * (followedBy / followedByAny), negative patterns (notNext /
  * notFollowedBy incl. the trailing-not-requires-within rule), NO_SKIP
  * emission (all interpretations), and greedy-final maximality. */
class CepPatternSpec extends SparkSpecBase {
  import spark.implicits._

  private def df(vs: (Long, Double)*): DataFrame =
    vs.map { case (t, v) => (1L, t, v) }.toDF("k", "t", "v")

  private def run(d: DataFrame, p: CepPattern.Pattern): Set[Seq[Any]] =
    CepPattern(d, "k", "t", "v", p).collect().map(_.toSeq.tail.toSeq).toSet

  private def runAll(
      d: DataFrame, ps: Seq[CepPattern.Pattern]): Set[Seq[Any]] =
    CepPattern.applyAll(d, "k", "t", "v", ps)
      .collect().map(_.toSeq.tail.toSeq).toSet

  private val aFollowedByB = CepPattern.begin("a").where(_ >= 8.0)
    .followedBy("b").where(_ <= 2.0).build()

  test("followedBy skips gap events that strict next would abort on") {
    val d = df(1L -> 9.0, 2L -> 5.0, 3L -> 1.0)
    assert(run(d, aFollowedByB) == Set(Seq(1L, 3L, 1L, 1L)))
    val strict = CepPattern.begin("a").where(_ >= 8.0)
      .next("b").where(_ <= 2.0).build()
    assert(run(d, strict).isEmpty)
    // and strict DOES match when adjacent
    assert(run(df(1L -> 9.0, 2L -> 1.0), strict) == Set(Seq(1L, 2L, 1L, 1L)))
  }

  test("followedBy takes the FIRST match; followedByAny branches on all") {
    val d = df(1L -> 9.0, 2L -> 1.0, 3L -> 2.0)
    assert(run(d, aFollowedByB) == Set(Seq(1L, 2L, 1L, 1L)))
    val any = CepPattern.begin("a").where(_ >= 8.0)
      .followedByAny("b").where(_ <= 2.0).build()
    assert(run(d, any) ==
      Set(Seq(1L, 2L, 1L, 1L), Seq(1L, 3L, 1L, 1L)))
  }

  test("notNext kills when the immediate successor matches") {
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .notNext("x").where(v => v >= 4.0 && v < 8.0)
      .followedBy("b").where(_ <= 2.0).build()
    // 9, 5(=x), 1 → killed; 9, 3, 1 → match (gap row is not x)
    assert(run(df(1L -> 9.0, 2L -> 5.0, 3L -> 1.0), p).isEmpty)
    assert(run(df(1L -> 9.0, 2L -> 3.0, 3L -> 1.0), p) ==
      Set(Seq(1L, 3L, 1L, 1L)))
  }

  test("notFollowedBy kills anywhere in the gap") {
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .notFollowedBy("x").where(v => v >= 4.0 && v < 8.0)
      .followedBy("b").where(_ <= 2.0).build()
    // kill row deep in the gap (notNext would have allowed it)
    assert(run(df(1L -> 9.0, 2L -> 3.0, 3L -> 5.0, 4L -> 1.0), p).isEmpty)
    assert(run(df(1L -> 9.0, 2L -> 3.0, 3L -> 3.0, 4L -> 1.0), p) ==
      Set(Seq(1L, 4L, 1L, 1L)))
  }

  test("trailing notFollowedBy requires within and honors the deadline") {
    intercept[IllegalArgumentException] {
      CepPattern.begin("a").where(_ >= 8.0)
        .notFollowedBy("x").where(_ <= 2.0).build()
    }
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .notFollowedBy("x").where(_ <= 2.0).within(10L).build()
    // killed: a lull inside the 10µs window after the spike
    assert(run(df(1L -> 9.0, 5L -> 1.0), p).isEmpty)
    // released: the lull lands after the deadline (1+10 < 15)
    assert(run(df(1L -> 9.0, 15L -> 1.0), p) == Set(Seq(1L, 1L, 1L)))
    // released at input end when nothing followed
    assert(run(df(1L -> 9.0), p) == Set(Seq(1L, 1L, 1L)))
  }

  test("non-final oneOrMore is non-greedy: every interpretation emits") {
    val p = CepPattern.begin("a").where(_ >= 5.0).oneOrMore()
      .followedBy("b").where(_ <= 2.0).build()
    // 9, 8, 1: a=[9,8]+b, a=[9]+b (gap-skip branch), a=[8]+b
    assert(run(df(1L -> 9.0, 2L -> 8.0, 3L -> 1.0), p) == Set(
      Seq(1L, 3L, 2L, 1L), Seq(1L, 3L, 1L, 1L), Seq(2L, 3L, 1L, 1L)))
    // greedy on a non-final step is rejected (reference default is
    // non-greedy; greedy is final-step-only here)
    intercept[IllegalArgumentException] {
      CepPattern.begin("a").where(_ >= 5.0).oneOrMore().greedy()
        .followedBy("b").where(_ <= 2.0).build()
    }
  }

  test("greedy final oneOrMore emits only the maximal extension") {
    val p = CepPattern.begin("a").where(_ >= 5.0).oneOrMore().greedy()
      .build()
    assert(run(df(1L -> 9.0, 2L -> 8.0, 3L -> 7.0, 4L -> 1.0), p) == Set(
      Seq(1L, 3L, 3L), Seq(2L, 3L, 2L), Seq(3L, 3L, 1L)))
  }

  test("times(n) exact quantifier with strict internal contiguity") {
    val p = CepPattern.begin("a").where(_ >= 5.0).times(2)
      .followedBy("b").where(_ <= 2.0).build()
    assert(run(df(1L -> 9.0, 2L -> 8.0, 3L -> 1.0), p) ==
      Set(Seq(1L, 3L, 2L, 1L)))
    // a run broken by a non-matching row cannot fill times(2); only the
    // unbroken pair after the break anchors a match
    assert(run(df(1L -> 9.0, 2L -> 3.0, 3L -> 8.0, 4L -> 8.0, 5L -> 1.0),
      p) == Set(Seq(3L, 5L, 2L, 1L)))
  }

  test("within bounds the whole match") {
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").where(_ <= 2.0).within(5L).build()
    assert(run(df(1L -> 9.0, 10L -> 1.0), p).isEmpty)
    assert(run(df(1L -> 9.0, 4L -> 1.0), p) == Set(Seq(1L, 4L, 1L, 1L)))
  }

  test("times(from, to) range quantifier emits every in-range count") {
    val p = CepPattern.begin("a").where(_ >= 5.0).times(2, 3)
      .followedBy("b").where(_ <= 2.0).build()
    // 9,8,7,1: anchors t1 (a=3 and the cnt-2 advance branch) and t2
    // (a=2); anchor t3 never reaches the 2-minimum
    assert(run(df(1L -> 9.0, 2L -> 8.0, 3L -> 7.0, 4L -> 1.0), p) == Set(
      Seq(1L, 4L, 3L, 1L), Seq(1L, 4L, 2L, 1L), Seq(2L, 4L, 2L, 1L)))
  }

  test("optional middle step: take and skip interpretations both emit") {
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").where(v => v >= 4.0 && v < 8.0).optional()
      .followedBy("c").where(_ <= 2.0).build()
    // 9,5,1 → (a,b,c) and (a,c)
    assert(run(df(1L -> 9.0, 2L -> 5.0, 3L -> 1.0), p) == Set(
      Seq(1L, 3L, 1L, 1L, 1L), Seq(1L, 3L, 1L, 0L, 1L)))
    // once b is taken or skipped, a LATER b cannot join that branch
    // (the reference's branch states): no (a, b@3, c) interpretation
    assert(run(df(1L -> 9.0, 2L -> 5.0, 3L -> 5.0, 4L -> 1.0), p) == Set(
      Seq(1L, 4L, 1L, 1L, 1L), Seq(1L, 4L, 1L, 0L, 1L)))
    // b absent entirely: the skip interpretation alone
    assert(run(df(1L -> 9.0, 2L -> 3.0, 3L -> 1.0), p) == Set(
      Seq(1L, 3L, 1L, 0L, 1L)))
  }

  test("optional trailing step completes early and extends") {
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").where(_ <= 2.0).optional().build()
    // (a) emits at the anchor; (a,b) when the lull arrives
    assert(run(df(1L -> 9.0, 2L -> 1.0), p) == Set(
      Seq(1L, 1L, 1L, 0L), Seq(1L, 2L, 1L, 1L)))
    // oneOrMore + optional = zero-or-more
    val star = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").where(_ <= 2.0).oneOrMore().optional().build()
    assert(run(df(1L -> 9.0, 2L -> 1.0, 3L -> 2.0), star) == Set(
      Seq(1L, 1L, 1L, 0L), Seq(1L, 2L, 1L, 1L), Seq(1L, 3L, 1L, 2L)))
    // the first step may not be optional
    intercept[IllegalArgumentException] {
      CepPattern.begin("a").where(_ >= 8.0).optional().build()
    }
    // NOT patterns adjacent to an optional step are rejected
    intercept[IllegalArgumentException] {
      CepPattern.begin("a").where(_ >= 8.0)
        .notFollowedBy("n").where(_ > 100.0)
        .followedBy("b").where(_ <= 2.0).optional()
        .followedBy("c").where(_ <= 1.0).build()
    }
  }

  test("measures: per-variable aggregates over matched rows") {
    val p = CepPattern.begin("a").where(_ >= 5.0).oneOrMore()
      .followedBy("b").where(_ <= 2.0).build()
    val ms = Seq(
      CepPattern.Measure("sum", "a", "sum_a"),
      CepPattern.Measure("avg", "a", "avg_a"),
      CepPattern.Measure("count", "a", "cnt_a"),
      CepPattern.Measure("min", "a", "min_a"),
      CepPattern.Measure("last", "b", "last_b"))
    // 9,8,1: interpretations a=[9,8], a=[9], a=[8] — each with b=1
    val got = CepPattern(df(1L -> 9.0, 2L -> 8.0, 3L -> 1.0),
      "k", "t", "v", p, ms)
      .select($"n_a", $"sum_a", $"avg_a", $"cnt_a", $"min_a", $"last_b")
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSet
    assert(got == Set(
      (2L, 17.0, 8.5, 2.0, 8.0, 1.0),
      (1L, 9.0, 9.0, 1.0, 9.0, 1.0),
      (1L, 8.0, 8.0, 1.0, 8.0, 1.0)))
  }

  test("iterative condition: running aggregate budget gates the quantifier") {
    // the reference's canonical IterativeCondition example: b extends
    // while the running sum of b's matched rows (plus this row) stays
    // within budget
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").oneOrMore()
      .whereWith((v, ctx) => {
        val s = ctx.sum("b")
        v >= 5.0 && (if (s.isNaN) 0.0 else s) + v <= 20.0
      }).build()
    // 9,7,6,8,1: b takes 7 (sum 7) then 6 (13); 8 busts (21) and kills
    // the run; v=1 fails the floor for the t4-anchored run
    val got = run(df(1L -> 9.0, 2L -> 7.0, 3L -> 6.0, 4L -> 8.0,
      5L -> 1.0), p)
    assert(got == Set(Seq(1L, 2L, 1L, 1L), Seq(1L, 3L, 1L, 2L)), got)
  }

  test("afterMatchSkip: SkipToNext and SkipPastLast prune interpretations") {
    def pat(skip: CepPattern.SkipStrategy) =
      CepPattern.begin("a").where(_ >= 5.0).oneOrMore()
        .followedBy("b").where(_ <= 2.0)
        .afterMatchSkip(skip).build()
    val d = df(1L -> 9.0, 2L -> 8.0, 3L -> 1.0)
    // NoSkip: all three interpretations (see the oneOrMore test)
    assert(run(d, pat(CepPattern.NoSkip)).size == 3)
    // SkipToNext: one match per anchor — the most-rows one at anchor 1
    assert(run(d, pat(CepPattern.SkipToNext)) == Set(
      Seq(1L, 3L, 2L, 1L), Seq(2L, 3L, 1L, 1L)))
    // SkipPastLast: matches may not overlap — only the earliest-anchor
    // longest match survives
    assert(run(d, pat(CepPattern.SkipPastLast)) == Set(
      Seq(1L, 3L, 2L, 1L)))
    // cross-row pruning: a second disjoint occurrence still matches
    val d2 = df(1L -> 9.0, 2L -> 1.0, 3L -> 7.0, 4L -> 2.0)
    assert(run(d2, pat(CepPattern.SkipPastLast)) == Set(
      Seq(1L, 2L, 1L, 1L), Seq(3L, 4L, 1L, 1L)))
    // trailing notFollowedBy demands NoSkip
    intercept[IllegalArgumentException] {
      CepPattern.begin("a").where(_ >= 5.0)
        .notFollowedBy("n").where(_ > 100.0).within(10L)
        .afterMatchSkip(CepPattern.SkipPastLast).build()
    }
  }

  test("internal contiguity: allowGaps and allowCombinations") {
    def pat(f: CepPattern.Builder => CepPattern.Builder) =
      f(CepPattern.begin("a").where(_ >= 5.0).oneOrMore())
        .followedBy("b").where(_ <= 2.0).build()
    // strict (consecutive, graft default): a gap row breaks the run
    val gapped = df(1L -> 9.0, 2L -> 3.0, 3L -> 8.0, 4L -> 1.0)
    assert(!run(gapped, pat(identity)).contains(Seq(1L, 4L, 2L, 1L)))
    // allowGaps (the reference default): the run skips the gap row
    assert(run(gapped, pat(_.allowGaps())).contains(Seq(1L, 4L, 2L, 1L)))
    // allowCombinations additionally branches past MATCHING rows:
    // a=[9,7] (skipping the matching 8, sum 16) exists only there —
    // distinguish same-count interpretations by SUM(a)
    val dense = df(1L -> 9.0, 2L -> 8.0, 3L -> 7.0, 4L -> 1.0)
    def sums(f: CepPattern.Builder => CepPattern.Builder): Set[Double] =
      CepPattern(dense, "k", "t", "v", pat(f),
        Seq(CepPattern.Measure("sum", "a", "sum_a")))
        .select($"sum_a").as[Double].collect().toSet
    val relaxed = sums(_.allowGaps())
    val combos = sums(_.allowCombinations())
    assert(relaxed == Set(9.0, 17.0, 24.0, 8.0, 15.0, 7.0), relaxed)
    assert(combos == relaxed + 16.0, combos)
  }

  test("timesOrMore and until bound the quantifier") {
    val p = CepPattern.begin("a").where(_ >= 5.0).timesOrMore(2)
      .followedBy("b").where(_ <= 2.0).build()
    // 9,8,7,1: at-least-2 emits counts 2 and 3 (anchor 1) and 2 (anchor
    // 2), never 1
    val got = run(df(1L -> 9.0, 2L -> 8.0, 3L -> 7.0, 4L -> 1.0), p)
    assert(got == Set(Seq(1L, 4L, 3L, 1L), Seq(1L, 4L, 2L, 1L),
      Seq(2L, 4L, 2L, 1L)), got)
    // until: the stop row ends the repetition (and is not consumed)
    val pu = CepPattern.begin("a").where(_ >= 5.0).oneOrMore()
      .until(_ >= 100.0)
      .followedBy("b").where(_ <= 2.0).build()
    // 9,8,200,7,1: the 200 stops every open quantifier — a can only be
    // [9],[9,8],[8] (pre-stop) or [7] (fresh anchor after)
    val gu = run(df(1L -> 9.0, 2L -> 8.0, 3L -> 200.0, 4L -> 7.0,
      5L -> 1.0), pu)
    assert(gu == Set(Seq(1L, 5L, 1L, 1L), Seq(1L, 5L, 2L, 1L),
      Seq(2L, 5L, 1L, 1L), Seq(4L, 5L, 1L, 1L)), gu)
  }

  test("withTimeouts surfaces over-budget partials on the side output") {
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").where(_ <= 2.0).within(5L).build()
    // anchor t1 never sees a b within 5µs; the row at t10 kills it and
    // surfaces the partial; the t10 anchor completes normally at t12
    val got = CepPattern.withTimeouts(
      df(1L -> 9.0, 10L -> 9.0, 12L -> 1.0), "k", "t", "v", p)
      .select($"start_us", $"end_us", $"n_a", $"n_b", $"timed_out")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, 1L, 0L, true), (10L, 12L, 1L, 1L, false)),
      got)
  }

  test("streaming: watermark timers fire timeouts on silent keys") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").where(_ <= 2.0).within(5000000L).build()
    val input = MemoryStream[(Long, Long, Double)]
    val sdf = input.toDF().toDF("k", "ts_us", "v")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cpt-").toString
    val q = CepPattern.streamingWithTimeouts(sdf, "k", "ts_us", "v", p)
      .writeStream.format("memory").queryName("cep_tout")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // the k=1 anchor never sees a b; only OTHER-key rows push the
      // watermark past its deadline — the timer must fire the timeout
      input.addData(Seq((1L, 1000000L, 9.0))); q.processAllAvailable()
      input.addData(Seq((2L, 20000000L, 0.0))); q.processAllAvailable()
      input.addData(Seq((2L, 30000000L, 0.0))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cep_tout")
      .select(col("k"), col("start_us"), col("timed_out"))
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L, 1000000L, true)), got)
  }

  test("streaming: trailing-not releases on watermark, not row arrival") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .notFollowedBy("n").where(_ <= 2.0).within(5000000L).build()
    def runCase(withLateKill: Boolean): Set[Seq[Any]] = {
      val input = MemoryStream[(Long, Long, Double)]
      val sdf = input.toDF().toDF("k", "ts_us", "v")
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "3 seconds")
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-cpn-$withLateKill-").toString
      val name = s"cep_tnot_$withLateKill"
      val q = CepPattern.streaming(sdf, "k", "ts_us", "v", p)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        input.addData(Seq((1L, 1000000L, 9.0))); q.processAllAvailable()
        // a row PAST the deadline arrives while the watermark is still
        // below it: row-time release would emit here; watermark release
        // must hold the candidate
        input.addData(Seq((1L, 7000000L, 50.0))); q.processAllAvailable()
        if (withLateKill) {
          // a LATE negative row (event time inside the deadline, still
          // above the watermark) kills the held candidate
          input.addData(Seq((1L, 5000000L, 1.0))); q.processAllAvailable()
        }
        input.addData(Seq((2L, 30000000L, 50.0))); q.processAllAvailable()
        input.addData(Seq((2L, 40000000L, 50.0))); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).select(col("k"), col("start_us"))
        .collect().map(_.toSeq).toSet
    }
    // without the late kill the candidate matures at the watermark
    // (plus the t=7s spike's candidate and the k=2 t=30s one, whose own
    // deadline the final row's watermark passes)
    assert(runCase(withLateKill = false) ==
      Set(Seq(1L, 1000000L), Seq(1L, 7000000L), Seq(2L, 30000000L)))
    // the late kill removes exactly the first candidate
    assert(runCase(withLateKill = true) ==
      Set(Seq(1L, 7000000L), Seq(2L, 30000000L)))
  }

  test("streaming parity: runs and held candidates cross batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = CepPattern.begin("a").where(_ >= 150.0)
      .notFollowedBy("n").where(_ >= 100.0)
      .followedBy("b").where(_ <= 2.0).build()
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
    val rows = graft.operators.Dedup.keepFirst(e,
      Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
      .select(col("user_id"), col("ts_us"), col("value"))
      .as[(Long, Long, Double)].collect().toSeq
    val batch = CepPattern(rows.toDF("user_id", "ts_us", "value"),
      "user_id", "ts_us", "value", p).collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, Long, Double)]
    val sdf = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cpp-").toString
    val q = CepPattern.streaming(sdf, "user_id", "ts_us", "value", p)
      .writeStream.format("memory").queryName("cep_pat")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val ordered = rows.sortBy(r => (r._2, r._1))
      val (x, y) = ordered.splitAt(ordered.length / 2)
      input.addData(x); q.processAllAvailable()
      input.addData(y); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cep_pat").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("withinGap bounds consecutive-event gaps (PREVIOUS_AND_CURRENT)") {
    def steps3 = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").where(v => v >= 4.0 && v < 8.0)
      .followedBy("c").where(_ <= 2.0)
    val pGap = steps3.withinGap(10L).build()
    val pFl = steps3.within(10L).build()
    // consecutive gaps of 8µs each fit the 10µs PREVIOUS_AND_CURRENT
    // bound but blow the 10µs FIRST_AND_LAST budget (total 16)
    val d = df(1L -> 9.0, 9L -> 5.0, 17L -> 1.0)
    assert(run(d, pGap) == Set(Seq(1L, 17L, 1L, 1L, 1L)))
    assert(run(d, pFl).isEmpty)
    // one 12µs gap kills the gap-bounded pattern
    assert(run(df(1L -> 9.0, 13L -> 5.0, 17L -> 1.0), pGap).isEmpty)
  }

  test("withinGap streaming parity with the batch face") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = CepPattern.begin("a").where(_ >= 150.0)
      .followedBy("b").where(_ <= 2.0)
      .withinGap(2L * 3600L * 1000000L).build()
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
    val rows = graft.operators.Dedup.keepFirst(e,
      Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
      .select(col("user_id"), col("ts_us"), col("value"))
      .as[(Long, Long, Double)].collect().toSeq
    val batch = CepPattern(rows.toDF("user_id", "ts_us", "value"),
      "user_id", "ts_us", "value", p).collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, Long, Double)]
    val sdf = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cpg-").toString
    val q = CepPattern.streaming(sdf, "user_id", "ts_us", "value", p)
      .writeStream.format("memory").queryName("cep_pat_gap")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val ordered = rows.sortBy(r => (r._2, r._1))
      val (x, y) = ordered.splitAt(ordered.length / 2)
      input.addData(x); q.processAllAvailable()
      input.addData(y); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cep_pat_gap").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("or() widens a step's condition (RichOrCondition)") {
    val p = CepPattern.begin("a").where(_ >= 8.0).or(_ <= 1.0)
      .next("b").where(v => v >= 4.0 && v < 8.0).build()
    // both the high anchor (9) and the low anchor (1) start matches
    val d = df(1L -> 9.0, 2L -> 5.0, 3L -> 1.0, 4L -> 6.0)
    assert(run(d, p) ==
      Set(Seq(1L, 2L, 1L, 1L), Seq(3L, 4L, 1L, 1L)))
    // or() on a NOT pattern widens the kill set
    val pn = CepPattern.begin("a").where(_ >= 8.0)
      .notFollowedBy("x").where(_ <= 1.0).or(v => v >= 4.0 && v < 8.0)
      .followedBy("b").where(_ <= 2.0).build()
    assert(run(df(1L -> 9.0, 2L -> 5.0, 3L -> 2.0), pn).isEmpty)
    assert(run(df(1L -> 9.0, 2L -> 3.0, 3L -> 2.0), pn) ==
      Set(Seq(1L, 3L, 1L, 1L)))
  }

  test("whereRow conditions see the full value vector (multi-column)") {
    // two value columns (v, w): a v-spike followed by the FIRST event
    // that is BOTH low in v and high in w
    val d = Seq(
      (1L, 1L, 9.0, 0.0), (1L, 2L, 1.0, 0.0), // low v but low w — skipped
      (1L, 3L, 1.0, 9.0), (1L, 4L, 1.0, 9.0))
      .toDF("k", "t", "v", "w")
    val p = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").whereRow(vs => vs(0) <= 2.0 && vs(1) >= 5.0)
      .build()
    val out = CepPattern.applyCols(d, "k", "t", Seq("v", "w"), Seq(p),
      Seq(CepPattern.Measure("last", "b", "bw", colIdx = 1)))
    assert(out.collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 1L, 3L, 1L, 1L, 9.0)))
    // a single-column pattern through the SAME multi-column face agrees
    // with the single-column face
    val p1 = CepPattern.begin("a").where(_ >= 8.0)
      .followedBy("b").where(_ <= 2.0).build()
    val viaCols = CepPattern.applyCols(d, "k", "t", Seq("v"), Seq(p1))
      .collect().map(_.toSeq).toSet
    val viaSingle = CepPattern(d, "k", "t", "v", p1)
      .collect().map(_.toSeq).toSet
    assert(viaCols == viaSingle)
  }

  private def abGroup = CepPattern.begin("a").where(_ >= 8.0)
    .followedBy("b").where(_ <= 2.0)

  test("group patterns: times(n) repeats the whole group") {
    val p = CepPattern.begin(abGroup).times(2).build()
    // (a b){2} over a,b,a,b — one match spanning both iterations,
    // counts merged per name
    val d = df(1L -> 9.0, 2L -> 1.0, 3L -> 9.0, 4L -> 1.0)
    assert(run(d, p) == Set(Seq(1L, 4L, 2L, 2L)))
    // a single iteration is not enough
    assert(run(df(1L -> 9.0, 2L -> 1.0), p).isEmpty)
    // relaxed iteration contiguity (the default): a gap row between
    // iterations is skipped
    val dg = df(1L -> 9.0, 2L -> 1.0, 3L -> 5.0, 4L -> 9.0, 5L -> 1.0)
    assert(run(dg, p) == Set(Seq(1L, 5L, 2L, 2L)))
    // consecutive(): iterations must chain strictly — the gap row kills
    val pc = CepPattern.begin(abGroup).times(2).consecutive().build()
    assert(run(dg, pc).isEmpty)
    assert(run(d, pc) == Set(Seq(1L, 4L, 2L, 2L)))
  }

  test("group patterns: times(from, to) emits every iteration count") {
    val ps = CepPattern.begin(abGroup).times(1, 2).buildAll()
    assert(ps.size == 2)
    val d = df(1L -> 9.0, 2L -> 1.0, 3L -> 9.0, 4L -> 1.0)
    assert(runAll(d, ps) == Set(
      Seq(1L, 2L, 1L, 1L), Seq(3L, 4L, 1L, 1L), // one-iteration matches
      Seq(1L, 4L, 2L, 2L))) // the two-iteration interpretation
    // build() on a ranged group directs to buildAll
    val e = intercept[IllegalArgumentException](
      CepPattern.begin(abGroup).times(1, 2).build())
    assert(e.getMessage.contains("buildAll"))
  }

  test("group patterns: optional group after a head step") {
    val grp = CepPattern.begin("c").where(v => v >= 4.0 && v < 8.0)
      .followedBy("d").where(_ <= 2.0)
    val ps = CepPattern.begin("s").where(_ >= 8.0)
      .followedBy(grp).optional().buildAll()
    assert(ps.size == 2)
    // s alone matches (zero-iteration branch); s c d matches too
    val d = df(1L -> 9.0, 2L -> 5.0, 3L -> 1.0)
    assert(runAll(d, ps) == Set(
      Seq(1L, 1L, 1L, 0L, 0L), Seq(1L, 3L, 1L, 1L, 1L)))
  }

  test("notFollowedBy after a group takes its own condition") {
    // ADVICE r10: Pattern.begin(group).notFollowedBy(x).where(cond) is
    // reference-legal — the condition belongs to the NOT step, not the
    // group, so it must not be rejected
    val p = CepPattern.begin(abGroup)
      .notFollowedBy("x").where(v => v >= 4.0 && v < 8.0)
      .followedBy("c").where(_ >= 8.0).build()
    // kill row in the gap after the group
    assert(run(df(1L -> 9.0, 2L -> 1.0, 3L -> 5.0, 4L -> 9.0), p).isEmpty)
    // clean gap → match spans group + c
    assert(run(df(1L -> 9.0, 2L -> 1.0, 3L -> 3.0, 4L -> 9.0), p) ==
      Set(Seq(1L, 4L, 1L, 1L, 1L)))
  }

  test("group patterns: rejections") {
    // nested groups / unbounded group quantifiers build only on the
    // nested-NFA face — the expansion tier rejects with a pointer
    val e1 = intercept[IllegalArgumentException] {
      CepPattern.begin(CepPattern.begin(abGroup).times(2)).build()
    }
    assert(e1.getMessage.contains("nested-NFA face"))
    val e2 = intercept[IllegalArgumentException] {
      CepPattern.begin(abGroup).oneOrMore().build()
    }
    assert(e2.getMessage.contains("nested-NFA face"))
    // conditions on the group itself
    intercept[IllegalArgumentException] {
      CepPattern.begin(abGroup).where(_ > 0)
    }
    // ranged groups require NoSkip
    intercept[IllegalArgumentException] {
      CepPattern.begin(abGroup).times(1, 2)
        .afterMatchSkip(CepPattern.SkipPastLast).buildAll()
    }
  }

  test("nested face: strict-iteration (a b)+ parity with CepNfa") {
    import graft.operators.{CepNfa, PatternStep}
    // (a b)+ strict chaining (all-strict links), then strict c —
    // identical elements both ways; the nested face must build exactly
    // the CepNfa plan
    val sg = CepPattern.begin("a").where(_ >= 8.0)
      .next("b").where(_ <= 2.0)
    val b = CepPattern.begin(sg).oneOrMore().consecutive()
      .next("c").where(_ >= 4.0)
    val viaFace = CepPattern.nested(
      df(1L -> 0.0, 2L -> 9.0, 3L -> 1.0, 4L -> 9.0, 5L -> 1.0, 6L -> 5.0),
      "k", "t", Seq("v"), b)
    val direct = CepNfa.nested(
      df(1L -> 0.0, 2L -> 9.0, 3L -> 1.0, 4L -> 9.0, 5L -> 1.0, 6L -> 5.0),
      "k", "t", "v", Seq(Seq(
        CepNfa.GroupElem(Seq(
          CepNfa.Atom(PatternStep("a", (_, c) => c >= 8.0, greedy = false)),
          CepNfa.Atom(PatternStep("b", (_, c) => c <= 2.0, greedy = false))),
          1, greedy = true),
        CepNfa.Atom(PatternStep("c", (_, c) => c >= 4.0, greedy = false)))))
    assert(viaFace.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
    // and the match is the greedy two-iteration one
    assert(viaFace.collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 1L, 6L, 2L, 2L, 1L)))
  }

  test("nested face: relaxed iteration and relaxed links") {
    // (a b)+ with relaxed chaining (the default): the gap row 5.0
    // between iterations is skipped; followedBy(c) skips nothing here
    val b = CepPattern.begin(abGroup).oneOrMore()
      .followedBy("c").where(_ == 7.0)
    val out = CepPattern.nested(
      df(1L -> 0.0, 2L -> 9.0, 3L -> 1.0, 4L -> 5.0, 5L -> 9.0,
        6L -> 1.0, 7L -> 7.0),
      "k", "t", Seq("v"), b)
    // greedy iteration preference: BOTH (a b) iterations matched (the
    // single-iteration interpretation with a long c-gap loses)
    assert(out.collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 1L, 7L, 2L, 2L, 1L)))
    // gap count columns are dropped from the output
    assert(out.columns.toSeq ==
      Seq("k", "start_us", "end_us", "n_a", "n_b", "n_c"))
  }

  test("nested face: groups of groups ((a b)+ c)+") {
    import graft.operators.AfterMatchSkip
    val inner = CepPattern.begin(abGroup).oneOrMore().consecutive()
      .next("c").where(v => v >= 4.0 && v < 8.0)
    val b = CepPattern.begin(inner).oneOrMore().consecutive()
    val e = intercept[IllegalArgumentException](b.build())
    assert(e.getMessage.contains("nested-NFA face"))
    // two outer iterations: (a b c) (a b a b c)
    val out = CepPattern.nested(
      df(1L -> 0.0, 2L -> 9.0, 3L -> 1.0, 4L -> 5.0, 5L -> 9.0,
        6L -> 1.0, 7L -> 9.0, 8L -> 1.0, 9L -> 5.0),
      "k", "t", Seq("v"), b)
    assert(out.collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 1L, 9L, 3L, 3L, 2L)))
  }

  test("nested face: streaming parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // a within bound so streaming runs AGE OUT when the trailing far
    // row arrives (eager WITHIN) and held candidates resolve — the
    // batch face resolves at flush instead
    val b = CepPattern.begin(abGroup).oneOrMore()
      .followedBy("c").where(_ == 7.0).within(10L)
    val base = 10_000_000L
    val rows = Seq(0.0, 9.0, 1.0, 5.0, 9.0, 1.0, 7.0).zipWithIndex
      .map { case (v, i) => (1L, base + i.toLong, v) } :+
      ((1L, base + 1000L, 0.0)) // ages every run past the within bound
    val batch = CepPattern.nested(
      rows.toDF("k", "t", "v"), "k", "t", Seq("v"), b)
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, Long, Double)]
    val sdf = input.toDF().toDF("k", "t", "v")
      .withColumn("ts", timestamp_micros(col("t")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-nested-").toString
    val q = CepPattern.nestedStreaming(sdf, "k", "t", Seq("v"), b)
      .writeStream.format("memory").queryName("nested_stream")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val (h1, h2) = rows.splitAt(4)
      input.addData(h1); q.processAllAvailable()
      input.addData(h2); q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("nested_stream").collect().map(_.toSeq).toSet
      == batch)
    assert(batch.nonEmpty)
  }

  test("group patterns: streaming parity via streamingAll") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val grp = CepPattern.begin("a").where(_ >= 150.0)
      .followedBy("b").where(_ <= 2.0)
    val ps = CepPattern.begin(grp).times(1, 2).buildAll()
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
    val rows = graft.operators.Dedup.keepFirst(e,
      Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
      .select(col("user_id"), col("ts_us"), col("value"))
      .as[(Long, Long, Double)].collect().toSeq
    val batch = CepPattern.applyAll(rows.toDF("user_id", "ts_us", "value"),
      "user_id", "ts_us", "value", ps).collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, Long, Double)]
    val sdf = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cpgr-").toString
    val q = CepPattern.streamingAll(sdf, "user_id", "ts_us", "value", ps)
      .writeStream.format("memory").queryName("cep_pat_grp")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val ordered = rows.sortBy(r => (r._2, r._1))
      val (x, y) = ordered.splitAt(ordered.length / 2)
      input.addData(x); q.processAllAvailable()
      input.addData(y); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cep_pat_grp").collect().map(_.toSeq).toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
