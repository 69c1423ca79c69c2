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

  test("official texts plan under CBO with analyzed table/column stats") {
    val db = "tpcds_cbo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    TpcdsSqlQueries.tableNames.foreach { t =>
      spark.sql(s"CREATE TABLE IF NOT EXISTS $db.$t USING parquet " +
        s"LOCATION '${TpcdsSqlQueries.dataDir}/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
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
}
