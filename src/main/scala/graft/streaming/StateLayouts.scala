package graft.streaming

/** Per-stateful-operator STATE-LAYOUT version registry (VERDICT r17 task
  * 7). The reference's compiled plan pins a versioned ExecNode JSON with
  * each node's state serde version
  * (`flink-table-planner/…/plan/nodes/exec/serde/`, restore-tests tier);
  * graft pins state layouts through the committed restore fixtures
  * (`src/test/resources/restore/`, `RestoreCompatSpec`) and THIS table
  * pins their versions into compiled-plan manifests, so `EXECUTE PLAN`
  * under `spark.graft.strictCompiledPlan` catches a state-layout change —
  * not just an operator-shape change.
  *
  * Contract: bump an operator's version in the SAME commit that changes
  * its state encoding (the same event that regenerates its restore
  * fixture via `RestoreFixtureGen`). History starts at this round's
  * layouts; the two operators whose encodings changed in r16
  * (processing-time seq base; dead-key seq tombstone) start at 2 to
  * record that there IS an earlier incompatible layout in the wild.
  *
  * Granularity — a DELIBERATE delta vs the reference: manifests pin the
  * WHOLE registry (an engine state-layout EPOCH), not just the operators
  * the plan uses, because mapping a Catalyst physical plan back to graft
  * operator families is lossy (every stateful tier surfaces as
  * FlatMapGroupsWithState). Consequence: under strictCompiledPlan, ANY
  * layout bump conservatively invalidates ALL previously compiled plans
  * — including plans holding no such state. Strict mode is the opt-in
  * bit-compat guarantee where a false rejection (re-compile the plan) is
  * strictly cheaper than a false acceptance (resume onto an incompatible
  * layout); the default mode only warns.
  */
object StateLayouts {

  val versions: Map[String, Int] = Map(
    "retracting_changelog_agg" -> 2, // r16: processing-time seq base
    "changelog_topn" -> 2, // r16: dead-key seq tombstone
    "changelog_join" -> 1,
    "changelog_semi_join" -> 1,
    "changelog_multi_join" -> 1,
    "streaming_dedup_last" -> 1,
    "cep_nfa_streaming" -> 1,
    "count_windows" -> 1,
    "streaming_temporal_join" -> 1,
    "streaming_over" -> 1,
    "process_table_function" -> 1,
    "cumulate_bounded" -> 1,
    "lateral_snapshot_join" -> 1)

  /** Test hook: simulate a layout bump without editing the table (a
    * FlinkDdlSpec case asserts strict EXECUTE PLAN throws naming the
    * operator). */
  @volatile private[graft] var overrides: Map[String, Int] = Map.empty

  def current: Map[String, Int] = versions ++ overrides
}
