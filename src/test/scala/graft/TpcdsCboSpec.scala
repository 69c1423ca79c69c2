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
    try {
      Seq("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true").foreach {
        case (k, v) => spark.conf.set(k, v)
      }
      // q17 (store/catalog sales + returns, three date_dim roles) and
      // q25 — stats-heavy multi-join texts; resolved against the
      // ANALYZEd catalog tables, no temp-view map
      Seq(17, 25).foreach { n =>
        val text = TpcdsSqlQueries.officialText(n).trim.stripSuffix(";")
        val df = graft.sql.FlinkSql.sql(spark, text, Map.empty)
        // CBO propagates exact row counts through the optimized plan
        assert(df.queryExecution.optimizedPlan.stats.rowCount.isDefined,
          s"q$n: no rowCount under CBO")
        val got = df.collect().map(_.toSeq).toSet
        val exp = TpcdsSqlQueries.run(spark, n)
          .collect().map(_.toSeq).toSet
        // run() normalizes to c1..cn; compare sizes + re-run raw text on
        // the temp-view path for value parity
        val tpcds = TpcdsSqlQueries.tableNames.map(t =>
          t -> graft.Tables(spark, TpcdsSqlQueries.dataDir, t)).toMap
        val viaViews = graft.sql.FlinkSql.sql(spark, text, tpcds)
          .collect().map(_.toSeq).toSet
        assert(got == viaViews,
          s"q$n: CBO-planned result diverges from the temp-view path")
        assert(got.size == exp.size, s"q$n: row count vs normalized run")
      }
    } finally {
      spark.sql(s"USE $prev")
      Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
        .foreach(spark.conf.unset)
    }
  }
}
