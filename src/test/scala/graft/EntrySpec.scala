package graft

import org.apache.spark.sql.functions._

class EntrySpec extends SparkSpecBase {

  test("tables load with expected shapes") {
    val l = Tables.lineitem(spark, sf)
    assert(l.count() > 0)
    val e = Tables.events(spark, sf)
    assert(e.columns.contains("ts") && e.columns.contains("ts_ns"))
    assert(
      e.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // ts must equal ts_ns truncated to micros
    val bad = e
      .where(unix_micros(col("ts")) =!= expr("ts_ns div 1000"))
      .count()
    assert(bad == 0)
  }

  test("entry returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("q1_agg groups and sums correctly on a hand-check") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every group key pair is distinct and counts are positive
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("every oracle key exists in queries") {
    val q = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(q))
  }
}
