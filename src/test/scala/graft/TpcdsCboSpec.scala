package graft

import graft.queries.TpcdsSqlQueries
import org.apache.spark.sql.functions._

/** CBO parity with the reference's TPC-DS gate: `test_tpcds.sh:23` runs
  * with `USE_TABLE_STATS=true`, injecting per-table/column stats for the
  * cost-based optimizer (`flink-tpcds-test/…/stats/TpcdsStatsProvider`).
  * Spark-first mapping: the 24 fixtures as catalog tables (in-memory
  * catalog, LOCATION-backed — no data copies), `ANALYZE TABLE … COMPUTE
  * STATISTICS FOR ALL COLUMNS`, and `spark.sql.cbo.enabled` +
  * `joinReorder` on; official texts then plan with propagated row counts
  * and return the same results as the temp-view path.
  */
class TpcdsCboSpec extends SparkSpecBase {

  private val db = "tpcds_cbo"

  /** Idempotent: LOCATION-backed catalog tables + ANALYZE, shared by both
    * tests (suite-ordered, but each test stands alone). */
  private def ensureStats(): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    TpcdsSqlQueries.tableNames.foreach { t =>
      spark.sql(s"CREATE TABLE IF NOT EXISTS $db.$t USING parquet " +
        s"LOCATION '${TpcdsSqlQueries.dataDir}/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }

  test("official texts plan under CBO with analyzed table/column stats") {
    ensureStats()
    // stats landed in the catalog: row counts + column stats
    val ssStats = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "store_sales", Some(db))).stats
    assert(ssStats.exists(_.rowCount.exists(_.toLong > 0)),
      s"no row count on store_sales: $ssStats")
    assert(ssStats.exists(_.colStats.nonEmpty),
      "ANALYZE FOR ALL COLUMNS must record column stats")

    val prev = spark.catalog.currentDatabase
    spark.sql(s"USE $db")
    // temp views SHADOW catalog tables for unqualified names (this suite
    // and others register the 24 names as views) — drop them so the CBO
    // phase genuinely resolves the ANALYZEd catalog tables
    def dropViews(): Unit =
      TpcdsSqlQueries.tableNames.foreach(spark.catalog.dropTempView(_))
    val texts = Seq(17, 25).map(n =>
      n -> TpcdsSqlQueries.officialText(n).trim.stripSuffix(";"))
    try {
      // phase 1 — q17/q25 (stats-heavy multi-join texts) against the
      // catalog tables only, CBO on
      val cboResults =
        try {
          Seq("spark.sql.cbo.enabled" -> "true",
            "spark.sql.cbo.joinReorder.enabled" -> "true").foreach {
            case (k, v) => spark.conf.set(k, v)
          }
          texts.map { case (n, text) =>
            dropViews()
            val df = graft.sql.FlinkSql.sql(spark, text, Map.empty)
            // really planned on CATALOG relations (not shadowing views)...
            val catalogLeaves = df.queryExecution.optimizedPlan.collect {
              case l: org.apache.spark.sql.execution.datasources
                  .LogicalRelation if l.catalogTable.isDefined => l
            }
            assert(catalogLeaves.nonEmpty,
              s"q$n: no catalog-table leaves — temp views shadowed the test")
            // ...and CBO propagates row counts through the optimized plan
            assert(df.queryExecution.optimizedPlan.stats.rowCount.isDefined,
              s"q$n: no rowCount under CBO")
            n -> df.collect().map(_.toSeq).toSet
          }.toMap
        } finally Seq("spark.sql.cbo.enabled",
          "spark.sql.cbo.joinReorder.enabled").foreach(spark.conf.unset)
      // phase 2 — value parity with the temp-view path, CBO off
      val tpcds = TpcdsSqlQueries.tableNames.map(t =>
        t -> graft.Tables(spark, TpcdsSqlQueries.dataDir, t)).toMap
      texts.foreach { case (n, text) =>
        val viaViews = graft.sql.FlinkSql.sql(spark, text, tpcds)
          .collect().map(_.toSeq).toSet
        assert(cboResults(n) == viaViews,
          s"q$n: CBO-planned result diverges from the temp-view path")
      }
    } finally spark.sql(s"USE $prev")
  }

  test("the 10 join-heaviest official texts lock no-BNLJ + stats-driven " +
      "broadcast-vs-shuffle under CBO") {
    ensureStats()
    val prev = spark.catalog.currentDatabase
    spark.sql(s"USE $db")
    def dropViews(): Unit =
      TpcdsSqlQueries.tableNames.foreach(spark.catalog.dropTempView(_))
    // the reference gate's stats-heavy texts (USE_TABLE_STATS=true,
    // test_tpcds.sh:23 + TpcdsStatsProvider.java): deep fact-fact join
    // chains where a mis-costed build side means BNLJ or an
    // everything-broadcast plan. q23 is deliberately NOT here: its
    // `0.95 * (select max …)` scalar-subquery HAVING legitimately plans a
    // single-row BroadcastNestedLoopJoin — cheap by construction, not a
    // mis-cost (the DSL sibling q_tpcds_q23's no-BNLJ lock covers the
    // join body).
    val joinHeavy = Seq(14, 17, 25, 29, 54, 64, 72, 78, 80, 95)
    def plansFor(broadcastThreshold: Int): Map[Int, String] = {
      // the statement cache keys on (text, tables) and cannot see conf
      // changes — without this, the second threshold's "plans" would be
      // the first threshold's cached DataFrames (review r17)
      graft.sql.FlinkSql.invalidateStatements(spark)
      Seq("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> broadcastThreshold.toString)
        .foreach { case (k, v) => spark.conf.set(k, v) }
      joinHeavy.map { n =>
        dropViews()
        val text = TpcdsSqlQueries.officialText(n).trim.stripSuffix(";")
        val df = graft.sql.FlinkSql.sql(spark, text, Map.empty)
        val catalogLeaves = df.queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.execution.datasources
              .LogicalRelation if l.catalogTable.isDefined => l
        }
        assert(catalogLeaves.nonEmpty,
          s"q$n: no catalog-table leaves — temp views shadowed the test")
        assert(df.queryExecution.optimizedPlan.stats.rowCount.isDefined,
          s"q$n: no rowCount under CBO")
        n -> df.queryExecution.executedPlan.toString
      }.toMap
    }
    try {
      // Direction 1 — dims broadcast: with a threshold between dim and
      // fact-intermediate size, stats must choose hash broadcasts for the
      // small sides and never fall to BNLJ/Cartesian. (At sf0.03 CBO's
      // filtered-cardinality estimates keep every probe side under 1MB
      // too, so all-broadcast IS the cost-optimal shape here — the
      // shuffle direction is forced separately below.)
      plansFor(1024 * 1024).foreach { case (n, p) =>
        assert(!p.contains("BroadcastNestedLoopJoin") &&
          !p.contains("CartesianProduct"),
          s"q$n: BNLJ/Cartesian in the stats-planned shape")
        assert(p.contains("BroadcastHashJoin"),
          s"q$n: no broadcast join — dims must broadcast under stats")
      }
      // Direction 2 — the choice is DRIVEN BY STATS, not by a generous
      // threshold: at a tight 256KB threshold, the stats-less path (temp
      // views — size estimate = raw file bytes, filters pass size
      // through) must route fact joins to shuffle, while the ANALYZEd
      // path's filtered-cardinality estimates unlock broadcasts the file
      // heuristic cannot see. Same texts, same threshold — the only
      // difference is the stats.
      def bhj(p: String): Int = "BroadcastHashJoin".r.findAllIn(p).size
      val withStats = plansFor(256 * 1024)
      graft.sql.FlinkSql.invalidateStatements(spark)
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (256 * 1024).toString)
      val tpcds = TpcdsSqlQueries.tableNames.map(t =>
        t -> graft.Tables(spark, TpcdsSqlQueries.dataDir, t)).toMap
      val noStats = joinHeavy.map { n =>
        val text = TpcdsSqlQueries.officialText(n).trim.stripSuffix(";")
        n -> graft.sql.FlinkSql.sql(spark, text, tpcds)
          .queryExecution.executedPlan.toString
      }.toMap
      val shuffling = joinHeavy.filter(n =>
        noStats(n).contains("SortMergeJoin") ||
          noStats(n).contains("ShuffledHashJoin"))
      assert(shuffling.size >= joinHeavy.size / 2,
        s"stats-less 256KB plans should shuffle their fact joins; only " +
          s"$shuffling did")
      // Stats must CHANGE the join choices, per query — filtered-
      // cardinality estimates move some joins to broadcast AND pull some
      // back (CBO's intermediate estimates can exceed raw file size), so
      // the honest lock is responsiveness, not a fixed direction: the
      // per-query broadcast counts must differ for a majority of the
      // pack. (An earlier form asserted strictly-more broadcasts under
      // stats and "passed" only via a stale statement cache — review
      // r17.)
      val changed = joinHeavy.filter(n => bhj(withStats(n)) != bhj(noStats(n)))
      assert(changed.size >= joinHeavy.size / 2,
        s"ANALYZEd stats changed broadcast choices for only " +
          s"${changed.size}/${joinHeavy.size} queries ($changed)")
    } finally {
      Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
        .foreach(spark.conf.unset)
      spark.sql(s"USE $prev")
    }
  }
}
