package graft

import graft.operators.LookupJoin
import graft.sources.JdbcLookupClient
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Real JDBC store round trips for the lookup join (embedded Derby — the
  * JDBC driver bundled with Spark) and the `'connector'='jdbc'` DDL
  * surface. */
class JdbcLookupSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  private def freshUrl(tag: String): String =
    s"jdbc:derby:${java.nio.file.Files.createTempDirectory(s"graft_derby_$tag")}/db;create=true"

  private def seedDim(url: String): Unit =
    Seq((1L, "alice", 3.5), (2L, "bob", 4.5), (3L, "carol", 5.5))
      .toDF("id", "name", "score")
      .write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", "dim").save()

  private val payload = StructType(Seq(
    StructField("name", StringType), StructField("score", DoubleType)))

  // Spark's JDBC writer quotes identifiers at CREATE time, so columns are
  // case-sensitive in the store — the probe SQL quotes them to match.
  private def client(url: String) = new JdbcLookupClient(
    url, """SELECT "name", "score" FROM dim WHERE "id" = ?""")

  test("JdbcLookupClient probes Derby through the sync cached join") {
    val url = freshUrl("sync")
    seedDim(url)
    val probe = Seq((10L, 1L), (11L, 2L), (12L, 1L), (13L, 9L))
      .toDF("event_id", "dim_id")
    val out = LookupJoin(probe, "dim_id", client(url), payload)
      .select($"event_id", $"lk_name", $"lk_score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    // inner: key 9 (miss) dropped; key 1 served twice (second via cache)
    assert(out == Set((10L, "alice", 3.5), (11L, "bob", 4.5),
      (12L, "alice", 3.5)))
  }

  test("left join null-pads JDBC misses; async ORDERED matches sync") {
    val url = freshUrl("left")
    seedDim(url)
    val probe = Seq((10L, 1L), (13L, 9L)).toDF("event_id", "dim_id")
    val left = LookupJoin(probe, "dim_id", client(url), payload,
        joinType = "left")
      .select($"event_id", $"lk_name")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(left == Set((10L, Some("alice")), (13L, None)))

    val async = LookupJoin.async(probe, "dim_id", client(url), payload,
        joinType = "left", batchSize = 1, maxInFlight = 2)
      .select($"event_id", $"lk_name")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(async == left)
  }

  test("lookup before open() fails the lifecycle require") {
    val c = client(freshUrl("lifecycle"))
    val e = intercept[IllegalArgumentException](c.lookup(1L))
    assert(e.getMessage.contains("lifecycle"))
  }

  test("'connector'='jdbc' DDL: INSERT INTO writes the store, SELECT scans it") {
    val url = freshUrl("ddl")
    val src = java.nio.file.Files.createTempDirectory("graft_jdbc_src")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "tag", "v")
      .write.mode("overwrite").parquet(src.toString)
    val out = graft.sql.FlinkDdl.run(spark,
      s"""
      CREATE TABLE src (k BIGINT, tag STRING, v DOUBLE) WITH (
        'connector' = 'filesystem', 'path' = '$src', 'format' = 'parquet');
      CREATE TABLE store (k BIGINT, tag STRING, v DOUBLE) WITH (
        'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'store');
      INSERT INTO store SELECT k, tag, v FROM src;
      SELECT k, tag, v * 2 AS v2 FROM store;
      """)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 20.0), (2L, "b", 40.0)))
  }
}
