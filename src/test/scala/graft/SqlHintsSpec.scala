package graft

import graft.sql.FlinkSql
import org.apache.spark.sql.DataFrame

/** Flink query hints through the SQL text entry (reference:
  * docs/dev/table/sql/queries/hints.md): join-strategy names translate
  * to Spark's, Flink-only tuning hints strip cleanly, string literals
  * survive, and the TVF `window_time` column carries event time.
  */
class SqlHintsSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  private lazy val left: DataFrame =
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
  private lazy val right: DataFrame =
    Seq((1, 10), (2, 20)).toDF("k", "w")

  private def tables = Map("l" -> left, "r" -> right)

  test("hint names translate: SHUFFLE_MERGE → MERGE, NEST_LOOP → replicate NL") {
    assert(FlinkSql.translateHints(
      "SELECT /*+ SHUFFLE_MERGE(l) */ * FROM l") ==
      "SELECT /*+ MERGE(l) */ * FROM l")
    assert(FlinkSql.translateHints(
      "SELECT /*+ NEST_LOOP(l, r) */ * FROM l") ==
      "SELECT /*+ SHUFFLE_REPLICATE_NL(l, r) */ * FROM l")
    // same-spelling hints pass through
    assert(FlinkSql.translateHints(
      "SELECT /*+ BROADCAST(r) */ * FROM l") ==
      "SELECT /*+ BROADCAST(r) */ * FROM l")
  }

  test("Flink-only tuning hints strip; mixed lists keep the rest") {
    assert(FlinkSql.translateHints(
      "SELECT * FROM l /*+ OPTIONS('scan.startup.mode'='latest') */") ==
      "SELECT * FROM l ")
    assert(FlinkSql.translateHints(
      "SELECT /*+ STATE_TTL('l'='1d'), BROADCAST(r) */ * FROM l") ==
      "SELECT /*+ BROADCAST(r) */ * FROM l")
    assert(FlinkSql.translateHints(
      "SELECT /*+ LOOKUP('table'='r','async'='true') */ * FROM l") ==
      "SELECT  * FROM l")
  }

  test("hints inside string literals are untouched") {
    val s = "SELECT '/*+ OPTIONS(''a''=''b'') */' AS x FROM l"
    assert(FlinkSql.translateHints(s) == s)
    val r = FlinkSql.sql(spark, s, tables).collect().head.getString(0)
    assert(r == "/*+ OPTIONS('a'='b') */")
  }

  test("translated hints steer the Spark planner") {
    val merged = FlinkSql.sql(spark,
      "SELECT /*+ SHUFFLE_MERGE(l) */ l.k, r.w FROM l JOIN r ON l.k = r.k",
      tables)
    assert(merged.queryExecution.executedPlan.toString
      .contains("SortMergeJoin"))
    val bc = FlinkSql.sql(spark,
      "SELECT /*+ BROADCAST(r) */ l.k, r.w FROM l JOIN r ON l.k = r.k",
      tables)
    assert(bc.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(merged.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("stripped OPTIONS hint leaves results intact") {
    val rows = FlinkSql.sql(spark,
      "SELECT k FROM l /*+ OPTIONS('a'='b') */ WHERE k > 1 ORDER BY k",
      tables).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 3))
  }

  test("temporal table function: legacy LATERAL spelling, equi-pushdown") {
    val versions = Seq(
      (1, 1000L, 10.0), (1, 3000L, 30.0), (2, 1000L, 99.0))
      .toDF("r_key", "r_time", "r_rate")
    val probes = Seq((1, 2000L), (1, 4000L), (2, 500L))
      .toDF("k", "t")
    FlinkSql.registerTemporalFunction("rates_v",
      FlinkSql.TemporalFnSpec("rates", "r_time", Seq("r_key")))
    val df = FlinkSql.sql(spark,
      """SELECT k, t, r_rate FROM probes, LATERAL TABLE (rates_v(t))
        |WHERE k = r_key ORDER BY k, t""".stripMargin,
      Map("probes" -> probes, "rates" -> versions))
    val rows = df.as[(Int, Long, Double)].collect().toSeq
    // (1,2000) sees the 1000-version; (1,4000) the 3000-version;
    // (2,500) has no version at/before it → dropped (inner semantics)
    assert(rows == Seq((1, 2000L, 10.0), (1, 4000L, 30.0)))
    // the WHERE key equality reaches the join: no nested-loop plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("window TVF emits window_time = window_end - 1ms, both time faces") {
    val ev = Seq(
      ("2024-01-01 00:03:00", 1L),
      ("2024-01-01 00:12:00", 2L))
      .toDF("ts_s", "n")
      .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts",
        "unix_micros(CAST(ts_s AS TIMESTAMP)) * 1000 AS ts_ns", "n")
    // nanos descriptor → bigint window_time
    val ns = FlinkSql.sql(spark,
      """SELECT window_start, window_end, window_time
        |FROM TABLE(TUMBLE(TABLE e, DESCRIPTOR(ts_ns), INTERVAL '10' MINUTE))
        |ORDER BY window_start""".stripMargin,
      Map("e" -> ev)).collect()
    assert(ns.forall(r => r.getLong(2) == r.getLong(1) - 1000000L))
    // timestamp descriptor → timestamp window_time
    val ts = FlinkSql.sql(spark,
      """SELECT window_start, window_end, window_time
        |FROM TABLE(TUMBLE(TABLE e, DESCRIPTOR(ts), INTERVAL '10' MINUTE))
        |ORDER BY window_start""".stripMargin,
      Map("e" -> ev)).collect()
    ts.foreach { r =>
      val end = r.getTimestamp(1).getTime
      assert(r.getTimestamp(2).getTime == end - 1L)
    }
  }
}
