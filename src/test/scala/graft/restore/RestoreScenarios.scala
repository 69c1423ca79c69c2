package graft.restore

import graft.changelog.{ChangelogJoin, ChangelogMultiJoin, ChangelogTopN, RetractingChangelogAgg, RowKind}
import graft.operators.{CepNfa, PatternStep}
import graft.streaming.StreamingDedupLast
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint restore-compatibility scenarios (VERDICT r12 task 2 — the
  * reference's pinned tier: flink-table-planner
  * `src/test/resources/restore-tests/` + `RestoreTestBase.java`, which
  * resumes every stateful ExecNode from a versioned savepoint golden).
  *
  * Each scenario pins ONE production stateful operator's checkpoint
  * layout: the fixture generator ([[RestoreFixtureGen]]) runs `build`
  * over `batch1`, snapshots the checkpoint, feeds `batch2`, and records
  * the incremental output as the golden. [[graft.RestoreCompatSpec]]
  * then resumes `build` from the COMMITTED checkpoint with only `batch2`
  * present and must reproduce the golden — so any refactor that changes
  * a state encoder's shape, a key schema, or the operator's plan
  * placement fails the suite loudly instead of corrupting a user's
  * running checkpoint on upgrade.
  *
  * Every batch2 is designed so the correct output REQUIRES batch1's
  * state (a retraction echoing a batch-1 aggregate, a join pairing
  * against a batch-1 row, a rank displacement of a batch-1 entry, a
  * keep-last winner buffered in batch 1, a CEP run opened in batch 1) —
  * lost state cannot pass silently.
  */
object RestoreScenarios {

  final case class Scenario(
      name: String,
      schemas: Seq[StructType],
      batch1: Seq[Seq[Row]],
      batch2: Seq[Seq[Row]],
      build: Seq[DataFrame] => DataFrame)

  private def ts(sec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(sec * 1000L)

  private val changelogSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType),
    StructField(RowKind.seqCol, LongType),
    StructField(RowKind.kindCol, StringType)))

  /** RetractingChangelogAgg: batch 2's `-U` must echo the batch-1
    * aggregate (n=1, sum=10) — only restorable from state. */
  private val retractingAgg = Scenario(
    "retracting_changelog_agg",
    Seq(changelogSchema),
    Seq(Seq(Row(1L, 10.0, 1L, RowKind.Insert))),
    Seq(Seq(Row(1L, 5.0, 2L, RowKind.Insert))),
    dfs => RetractingChangelogAgg(dfs.head, Seq("k"), "v"))

  private def sideSchema(jk: String, key: String, v: String) =
    StructType(Seq(
      StructField(jk, LongType), StructField(key, StringType),
      StructField(v, DoubleType),
      StructField(RowKind.seqCol, LongType),
      StructField(RowKind.kindCol, StringType)))

  /** ChangelogJoin: batch 2 deletes the right row — the emitted `-D`
    * pair needs the batch-1 LEFT row from state. */
  private val changelogJoin = Scenario(
    "changelog_join",
    Seq(sideSchema("ljk", "lk", "lv"), sideSchema("rjk", "rk", "rv")),
    Seq(Seq(Row(1L, "a", 1.5, 1L, RowKind.Insert)),
      Seq(Row(1L, "x", 2.5, 1L, RowKind.Insert))),
    Seq(Nil, Seq(Row(1L, "x", 2.5, 2L, RowKind.Delete))),
    dfs => ChangelogJoin(dfs(0), dfs(1), "ljk", "rjk", "lk", "rk"))

  /** ChangelogJoin, state-format v2 (r20): same operator as
    * `changelog_join`, but the committed checkpoint was generated AFTER
    * the UnsafeRow-backed state codec landed — so this fixture pins the
    * v2 byte layout itself, while `changelog_join` keeps pinning that
    * pre-v2 Kryo checkpoints still replay through the fallback decoder.
    * LEFT join so pad state (a right row retracted while its match is
    * held) also round-trips the new bytes. */
  private val changelogJoinV2 = Scenario(
    "changelog_join_v2",
    Seq(sideSchema("ljk", "lk", "lv"), sideSchema("rjk", "rk", "rv")),
    Seq(Seq(Row(1L, "a", 1.5, 1L, RowKind.Insert),
      Row(2L, "b", 3.5, 2L, RowKind.Insert)),
      Seq(Row(1L, "x", 2.5, 3L, RowKind.Insert))),
    Seq(Nil, Seq(Row(1L, "x", 2.5, 4L, RowKind.Delete),
      Row(2L, "y", 9.0, 5L, RowKind.Insert))),
    dfs => ChangelogJoin(dfs(0), dfs(1), "ljk", "rjk", "lk", "rk", "left"))

  private val topnSchema = StructType(Seq(
    StructField("pk", StringType), StructField("uk", LongType),
    StructField("v", DoubleType),
    StructField(RowKind.seqCol, LongType),
    StructField(RowKind.kindCol, StringType)))

  /** ChangelogTopN (n=2): batch 2's newcomer displaces the batch-1
    * rank-2 entry — the retraction (-U uk=2 v=40) lives only in state. */
  private val changelogTopn = Scenario(
    "changelog_topn",
    Seq(topnSchema),
    Seq(Seq(Row("p", 1L, 50.0, 1L, RowKind.Insert),
      Row("p", 2L, 40.0, 2L, RowKind.Insert))),
    Seq(Seq(Row("p", 3L, 45.0, 3L, RowKind.Insert))),
    dfs => ChangelogTopN(dfs.head, Seq("pk"), "uk", "v", 2))

  private val dedupSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("ts", TimestampType)))

  /** StreamingDedupLast (window 10 s): the batch-1 row (ts=5 s, "a")
    * must win over batch 2's earlier-ts "b"; the batch-2 watermark row
    * closes the window. Lost state would emit "b". */
  private val dedupLast = Scenario(
    "streaming_dedup_last",
    Seq(dedupSchema),
    Seq(Seq(Row(1L, "a", ts(5)))),
    Seq(Seq(Row(1L, "b", ts(2)), Row(2L, "z", ts(25)))),
    dfs => StreamingDedupLast(dfs.head, Seq("k"), "ts",
      windowMs = 10000L, delay = "0 seconds"))

  private val cepSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts_us", LongType),
    StructField("value", DoubleType)))

  /** CepNfa streaming (`down+` within 5 s): the run OPENS on batch 1's
    * descending pair and extends through batch 2; key 2's later rows
    * advance the watermark to flush the match. Without the NFA state the
    * batch-2 row alone cannot produce the 1 s→3 s match. */
  private val cepStreaming = Scenario(
    "cep_nfa_streaming",
    Seq(cepSchema),
    Seq(Seq(Row(1L, 1000000L, 10.0), Row(1L, 2000000L, 9.0))),
    Seq(Seq(Row(1L, 3000000L, 8.0), Row(2L, 20000000L, 1.0),
      Row(2L, 21000000L, 2.0))),
    dfs => CepNfa.streaming(
      dfs.head
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "1 second"),
      "user_id", "ts_us", "value",
      Seq(Seq(PatternStep("down", (p, c) => c < p, greedy = true))),
      withinUs = Some(5000000L)))

  private val countSchema = StructType(Seq(
    StructField("k", LongType), StructField("ord", LongType),
    StructField("v", DoubleType)))

  /** CountWindows (size 3): batch 1 buffers a 2-row open window (partial
    * sum 3.0 in state); batch 2's third row fills it — the emitted sum
    * 6.0 is only right with the restored partial. */
  private val countWindows = Scenario(
    "count_windows",
    Seq(countSchema),
    Seq(Seq(Row(1L, 1L, 1.0), Row(1L, 2L, 2.0))),
    Seq(Seq(Row(1L, 3L, 3.0))),
    dfs => graft.streaming.CountWindows(dfs.head, Seq("k"), "ord", "v", 3))

  private val tjLeftSchema = StructType(Seq(
    StructField("k", LongType), StructField("lt", TimestampType),
    StructField("probe_id", LongType)))
  private val tjRightSchema = StructType(Seq(
    StructField("k", LongType), StructField("rt", TimestampType),
    StructField("p", StringType)))

  /** StreamingTemporalJoin: batch 1 stores a build version AND a pending
    * probe; batch 2 only advances the watermark (BOTH sides — the
    * multi-watermark policy is min) — the emitted row pairs batch-1
    * state against batch-1 state. */
  private val temporalJoin = Scenario(
    "streaming_temporal_join",
    Seq(tjLeftSchema, tjRightSchema),
    Seq(Seq(Row(1L, ts(5), 100L)), Seq(Row(1L, ts(1), "v1"))),
    Seq(Seq(Row(9L, ts(50), 900L)), Seq(Row(9L, ts(50), "x"))),
    dfs => graft.streaming.StreamingTemporalJoin(
      dfs(0), dfs(1), "k", "lt", "rt", Seq("p"), delay = "0 seconds"))

  private val overSchema = StructType(Seq(
    StructField("k", LongType), StructField("ts", TimestampType),
    StructField("v", DoubleType)))

  /** StreamingOver (ROWS 1 PRECEDING): batch 1's row waits in pending
    * state (watermark behind it); batch 2 releases it and extends the
    * frame — BOTH emitted run_sums need the restored pending row and
    * frame tail. */
  private val streamingOver = Scenario(
    "streaming_over",
    Seq(overSchema),
    Seq(Seq(Row(1L, ts(1), 10.0))),
    Seq(Seq(Row(1L, ts(2), 5.0), Row(9L, ts(50), 0.0))),
    dfs => graft.streaming.StreamingOver(dfs.head, Seq("k"), "ts", "v",
      precedingRows = 1, delay = "0 seconds"))

  /** ChangelogSemiJoin: batch 1 pairs a left row with a right key; batch
    * 2 deletes the right row — the emitted retraction of the left row
    * requires both sides' batch-1 state. */
  private val changelogSemi = Scenario(
    "changelog_semi_join",
    Seq(sideSchema("ljk", "lk", "lv"),
      StructType(Seq(
        StructField("rjk", LongType), StructField("rk", StringType),
        StructField(RowKind.seqCol, LongType),
        StructField(RowKind.kindCol, StringType)))),
    Seq(Seq(Row(1L, "a", 1.5, 1L, RowKind.Insert)),
      Seq(Row(1L, "x", 1L, RowKind.Insert))),
    Seq(Nil, Seq(Row(1L, "x", 2L, RowKind.Delete))),
    dfs => graft.changelog.ChangelogSemiJoin(dfs(0), dfs(1),
      "ljk", "rjk", "rk", anti = false))

  /** A running per-key sum PTF: batch 2's emitted total only derives
    * from batch 1's restored state. */
  private object RunningSumPtf extends graft.streaming.GraftPTF[Double] {
    def process(key: Row, rows: Iterator[Row], state: Option[Double],
        watermarkMs: Long): (Option[Double], Seq[Row], Option[Long]) = {
      val xs = rows.toList
      val total = state.getOrElse(0.0) + xs.map(_.getDouble(1)).sum
      (Some(total),
        if (xs.nonEmpty) Seq(Row(key.get(0), total)) else Nil,
        None)
    }
  }

  private val ptfSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType),
    StructField("ts", TimestampType)))

  /** ProcessTableFunction (the PTF hook every PTF/CEP face rides): kryo
    * Option[Double] keyed state across the checkpoint (the face needs a
    * watermarked input for its event-time timers). */
  private val processTableFunction = Scenario(
    "process_table_function",
    Seq(ptfSchema),
    Seq(Seq(Row(1L, 10.0, ts(1)))),
    Seq(Seq(Row(1L, 5.0, ts(2)))),
    dfs => graft.streaming.ProcessTableFunction(
      dfs.head.withWatermark("ts", "0 seconds"), Seq("k"),
      StructType(Seq(StructField("k", LongType),
        StructField("total", DoubleType))),
      RunningSumPtf))

  private val cumSchema = StructType(Seq(
    StructField("k", StringType), StructField("ts", TimestampType),
    StructField("v", DoubleType)))

  /** StreamingWindows.cumulateBounded (10 s max / 5 s step): batch 1's
    * row sits in the open cumulate fold; batch 2's watermark row closes
    * the slices — the emitted counts need the restored fold. */
  private val cumulateBounded = Scenario(
    "cumulate_bounded",
    Seq(cumSchema),
    Seq(Seq(Row("a", ts(2), 10.0))),
    Seq(Seq(Row("z", ts(60), 1.0))),
    dfs => graft.streaming.StreamingWindows.cumulateBounded(
      dfs.head, "ts", maxSizeMs = 10000L, stepMs = 5000L,
      delay = "0 seconds", Seq("k"),
      Seq(graft.changelog.AggSpec("n", "v", "count"),
        graft.changelog.AggSpec("max_v", "v", "max"))))

  private val lsjProbeSchema = StructType(Seq(
    StructField("oid", LongType), StructField("cur", StringType)))
  private val lsjBuildSchema = StructType(Seq(
    StructField("rts", TimestampType), StructField("cur", StringType),
    StructField("rate", DoubleType)))

  /** LateralSnapshotJoin (flip at t=10s): batch 1 loads a build version
    * AND buffers a LOAD-phase probe; batch 2 only advances the build
    * watermark past the flip — the drained row pairs the batch-1 probe
    * buffer against the batch-1 build multiset, both restored state. */
  private val lateralSnapshot = Scenario(
    "lateral_snapshot_join",
    Seq(lsjProbeSchema, lsjBuildSchema),
    Seq(Seq(Row(100L, "EUR")), Seq(Row(ts(1), "EUR", 1.25))),
    Seq(Nil, Seq(Row(ts(30), "__wm", 0.0))),
    dfs => graft.streaming.LateralSnapshotJoin(
      dfs(0), dfs(1), "cur", "rts", loadCompletedMs = 10000L,
      delay = "0 seconds", joinType = "inner"))

  /** Typed (LEFT) ChangelogMultiJoin.chain (round 16): batch 1 inserts an
    * unmatched LEFT-side row (padded output); batch 2's right-side insert
    * must emit the pad RETRACTION before the matched row — only possible
    * when the batch-1 left row restores from the per-input state maps. */
  private val multiJoinLeft = Scenario(
    "changelog_multi_join_left",
    Seq(sideSchema("ajk", "ak", "av"), sideSchema("bjk", "bk", "bv")),
    Seq(Seq(Row(1L, "a", 1.5, 1L, RowKind.Insert)), Nil),
    Seq(Nil, Seq(Row(1L, "x", 2.5, 2L, RowKind.Insert))),
    dfs => ChangelogMultiJoin.chain(
      Seq(dfs(0), dfs(1)),
      Map(1 -> Seq(ChangelogMultiJoin.ChainCond(0, "ajk", "bjk"))),
      Seq("inner", "left")))

  val all: Seq[Scenario] = Seq(retractingAgg, changelogJoin,
    changelogJoinV2, changelogTopn,
    dedupLast, cepStreaming, countWindows, temporalJoin, streamingOver,
    changelogSemi, processTableFunction, cumulateBounded, lateralSnapshot,
    multiJoinLeft)

  val fixtureRoot = "src/test/resources/restore"
}
