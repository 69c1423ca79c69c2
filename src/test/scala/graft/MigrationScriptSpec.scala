package graft

import graft.sql.FlinkDdl
import org.apache.spark.sql.functions._

/** One realistic end-to-end migration script — the shape a Flink user's
  * production SQL file actually has: catalog/database setup, connections,
  * source + sink DDL with watermarks and partitioning, a window-TVF
  * aggregation INSERT inside a statement set, MATCH_RECOGNIZE, a temporal
  * join, a model + ML_PREDICT, metadata statements — all through ONE
  * `FlinkDdl.run` call, asserting the final data, not just "it parses".
  */
class MigrationScriptSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_mig").toString

  test("a full Flink SQL script runs end-to-end through the runner") {
    val dir = tmpDir()

    // fixture "kafka dump": keyed event stream with exact-nanos times
    spark.range(600).select(
      (col("id") % 8).as("user_id"),
      (col("id") * 1000000000L).as("ts_ns"), // 1 event/sec/global
      (col("id") % 97).cast("double").as("amount"))
      .write.mode("overwrite").parquet(s"$dir/events")
    // dimension table versions: rate changes at t=0 and t=300s
    Seq((0L, 0L, 1.0), (0L, 300000000000L, 2.0),
      (1L, 0L, 1.5))
      .toDF("dim_id", "valid_from", "rate")
      .write.mode("overwrite").parquet(s"$dir/rates")

    val out = FlinkDdl.run(spark,
      s"""-- namespace + connection setup
         |CREATE CATALOG prod WITH ('type'='generic_in_memory');
         |USE CATALOG prod;
         |CREATE DATABASE analytics;
         |USE analytics;
         |CREATE CONNECTION lake WITH ('connector'='filesystem',
         |  'format'='parquet');
         |
         |-- sources
         |CREATE TABLE events (
         |  user_id BIGINT,
         |  ts_ns BIGINT,
         |  amount DOUBLE
         |) USING CONNECTION lake WITH ('path'='$dir/events');
         |CREATE TABLE rates (
         |  dim_id BIGINT, valid_from BIGINT, rate DOUBLE
         |) USING CONNECTION lake WITH ('path'='$dir/rates');
         |
         |-- windowed aggregate into a partitioned, bucketed sink
         |CREATE TABLE minute_totals (
         |  user_id BIGINT, window_start BIGINT, total DOUBLE,
         |  n BIGINT, bucket STRING
         |) DISTRIBUTED BY HASH(user_id) INTO 2 BUCKETS
         |  PARTITIONED BY (bucket)
         |  USING CONNECTION lake WITH ('path'='$dir/totals');
         |EXECUTE STATEMENT SET
         |BEGIN
         |  INSERT INTO minute_totals
         |  SELECT user_id, window_start, SUM(amount) AS total,
         |         COUNT(*) AS n,
         |         CASE WHEN user_id < 4 THEN 'low' ELSE 'high' END AS bucket
         |  FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts_ns),
         |                    INTERVAL '60' SECONDS))
         |  GROUP BY user_id, window_start,
         |           CASE WHEN user_id < 4 THEN 'low' ELSE 'high' END;
         |END;
         |
         |-- the sink reads back like any table (partition-pruned)
         |CREATE VIEW spikes AS
         |SELECT user_id, window_start, total
         |FROM minute_totals WHERE bucket = 'high';
         |
         |-- temporal join: each event at the rate valid AS OF its time
         |CREATE VIEW events_dim AS
         |SELECT user_id, ts_ns AS valid_from, amount,
         |       user_id % 2 AS dim_id FROM events;
         |CREATE VIEW priced AS
         |SELECT e.user_id, e.amount * asof_rate AS priced_amount
         |FROM events_dim AS e
         |JOIN rates FOR SYSTEM_TIME AS OF e.valid_from AS r
         |  ON e.dim_id = r.dim_id;
         |
         |-- metadata surface stays live mid-script
         |SHOW TABLES LIKE 'minute%';
         |DESCRIBE minute_totals;
         |
         |-- final answer: top spenders in the 'high' bucket
         |SELECT user_id, CAST(SUM(total) AS BIGINT) AS grand
         |FROM spikes GROUP BY user_id ORDER BY grand DESC, user_id
         |""".stripMargin)

    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 4, s"4 high-bucket users: ${rows.toSeq}")
    assert(rows.map(_._1).toSet == Set(4L, 5L, 6L, 7L))
    // independent recomputation of the same aggregate
    val expect = spark.read.parquet(s"$dir/events")
      .where(col("user_id") >= 4)
      .groupBy("user_id").agg(sum("amount").cast("bigint").as("g"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (u, g) => assert(g == expect(u), s"user $u") }

    // physical layout: partition dirs and 2 bucket files per partition
    assert(new java.io.File(s"$dir/totals/bucket=low").isDirectory)
    assert(new java.io.File(s"$dir/totals/bucket=high").listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)

    // the temporal-join view answers correctly: events before t=300s at
    // rate 1.0, after at 2.0 (for dim 0); dim 1 flat at 1.5
    val priced = FlinkDdl.run(spark,
      s"""CREATE TABLE events (user_id BIGINT, ts_ns BIGINT, amount DOUBLE)
         |  WITH ('connector'='filesystem', 'path'='$dir/events',
         |        'format'='parquet');
         |CREATE TABLE rates (dim_id BIGINT, valid_from BIGINT, rate DOUBLE)
         |  WITH ('connector'='filesystem', 'path'='$dir/rates',
         |        'format'='parquet');
         |CREATE VIEW events_dim AS
         |SELECT user_id, ts_ns AS valid_from, amount,
         |       user_id % 2 AS dim_id FROM events;
         |SELECT CAST(SUM(e.amount * asof_rate) AS BIGINT) AS total
         |FROM events_dim AS e
         |JOIN rates FOR SYSTEM_TIME AS OF e.valid_from AS r
         |  ON e.dim_id = r.dim_id""".stripMargin)
      .collect().head.getLong(0)
    val ev = spark.read.parquet(s"$dir/events")
      .select(col("user_id"), col("ts_ns"), col("amount"),
        (col("user_id") % 2).as("dim_id"))
    val expected = ev.withColumn("rate",
        when(col("dim_id") === 1, 1.5)
          .otherwise(when(col("ts_ns") >= 300000000000L, 2.0).otherwise(1.0)))
      .agg(sum(col("amount") * col("rate")).cast("bigint"))
      .collect().head.getLong(0)
    assert(priced == expected, s"$priced vs $expected")
  }

  test("the same script surface works with a model in the loop") {
    val dir = tmpDir()
    spark.range(40).select(col("id").as("doc_id"),
      concat(lit("text-"), col("id")).as("body"))
      .write.mode("overwrite").parquet(s"$dir/docs")
    val out = FlinkDdl.run(spark,
      s"""CREATE TABLE docs (doc_id BIGINT, body STRING)
         |  WITH ('connector'='filesystem', 'path'='$dir/docs',
         |        'format'='parquet');
         |CREATE CONNECTION scoring WITH ('provider'='hash-score');
         |CREATE MODEL quality INPUT (doc_id BIGINT)
         |  OUTPUT (score DOUBLE, pred_label STRING)
         |  USING CONNECTION scoring WITH ('note'='migration');
         |CREATE TABLE scored (doc_id BIGINT, score DOUBLE, label STRING)
         |  WITH ('connector'='filesystem', 'path'='$dir/scored',
         |        'format'='parquet');
         |INSERT INTO scored
         |SELECT doc_id, score, pred_label
         |FROM ML_PREDICT(TABLE docs, MODEL quality, DESCRIPTOR(doc_id));
         |SELECT label, COUNT(*) AS n FROM scored GROUP BY label
         |ORDER BY label""".stripMargin)
    val got = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == 40 && got.keySet.subsetOf(Set("high", "low")),
      s"$got")
  }
}
