package graft

import graft.changelog._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Changelog-tier specs: streaming retraction emission and the CDC round
  * trip — applying an emitted changelog reproduces the batch answer
  * (VERDICT r2 gate). */
class ChangelogSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val eventRows: Seq[(Timestamp, Long, String, Double)] =
    Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getAs[Timestamp](0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSeq

  test("streaming ChangelogAgg emits +I then balanced -U/+U pairs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val df = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cagg-").toString
    val q = ChangelogAgg(df, Seq("event_type"),
      Seq(AggSpec("n", "user_id", "count"), AggSpec("sv", "value", "sum")))
      .writeStream.format("memory").queryName("cl_agg")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // three micro-batches → at least three changes per key
      eventRows.grouped(400).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val log = spark.table("cl_agg").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("__rowkind"),
        r.getAs[Long]("__seq"), r.getAs[Long]("n"), r.getAs[Double]("sv")))

    val byKey = log.groupBy(_._1)
    assert(byKey.nonEmpty)
    byKey.foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._2 == RowKind.Insert, s"$k must start with +I")
      val kinds = sorted.tail.map(_._2)
      assert(kinds.grouped(2).forall(p =>
        p.length == 2 && p(0) == RowKind.UpdateBefore &&
          p(1) == RowKind.UpdateAfter),
        s"$k changes must be -U/+U pairs, got ${kinds.mkString(",")}")
    }

    // CDC round trip: materializing the changelog == the batch aggregate
    val materialized = UpsertMaterialize(spark.table("cl_agg"),
      Seq("event_type"))
      .select("event_type", "n", "sv").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val batch = eventRows.toDF("ts", "user_id", "event_type", "value")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(materialized.map(t => (t._1, t._2)).sameElements(
      batch.map(t => (t._1, t._2))))
    materialized.lazyZip(batch).foreach { (m, b) =>
      assert(math.abs(m._3 - b._3) < 1e-6, s"sum mismatch for ${m._1}")
    }
  }

  test("streaming ChangelogNormalize matches batch replay across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // upsert feed: (key, value, seq, kind) — updates and deletes interleaved
    val feed = (1L to 50L).flatMap { k =>
      Seq((k, k * 10.0, 1L, RowKind.UpdateAfter),
        (k, k * 20.0, 2L, RowKind.UpdateAfter)) ++
        (if (k % 4 == 0) Seq((k, 0.0, 3L, RowKind.Delete)) else Nil)
    }

    val input = MemoryStream[(Long, Double, Long, String)]
    val df = input.toDF().toDF("k", "v", "__seq", "kind")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cnorm-").toString
    val q = ChangelogNormalize(df, Seq("k"), "kind", "__seq")
      .writeStream.format("memory").queryName("cl_norm")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // split mid-key so state crosses micro-batch boundaries
      val (a, b) = feed.splitAt(feed.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cl_norm").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._3, t._4))
    val batch = ChangelogNormalize(
      feed.toDF("k", "v", "__seq", "kind"), Seq("k"), "kind", "__seq")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._3, t._4))
    assert(streamed.sameElements(batch))
    assert(streamed.nonEmpty)

    // round trip: materialize == survivors at their latest value
    val mat = UpsertMaterialize(spark.table("cl_norm"), Seq("k"))
      .select("k", "v").as[(Long, Double)].collect().sortBy(_._1)
    val expected = (1L to 50L).filterNot(_ % 4 == 0).map(k => (k, k * 20.0))
    assert(mat.sameElements(expected))
  }

  test("UpsertSink: streamed changelog materializes to the batch final state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val feed = (1L to 40L).flatMap { k =>
      Seq((k, k * 10.0, 1L, RowKind.UpdateAfter),
        (k, k * 30.0, 2L, RowKind.UpdateAfter)) ++
        (if (k % 3 == 0) Seq((k, 0.0, 3L, RowKind.Delete)) else Nil)
    }
    val input = MemoryStream[(Long, Double, Long, String)]
    val df = input.toDF().toDF("k", "v", "__seq", "kind")
    val table = java.nio.file.Files.createTempDirectory("graft-upsert-")
      .toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-upsert-ck-")
      .toString
    val q = UpsertSink.writeUpsert(
      ChangelogNormalize(df, Seq("k"), "kind", "__seq"),
      table, Seq("k"), ckpt)
    try {
      val (a, b) = feed.splitAt(feed.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(table)
      .select("k", "v").as[(Long, Double)].collect().sortBy(_._1)
    val expected = (1L to 40L).filterNot(_ % 3 == 0).map(k => (k, k * 30.0))
    assert(got.sameElements(expected))
  }

  test("RetractableAgg: retractions exactly cancel accumulations") {
    import org.apache.spark.sql.functions.lit
    // +I 10, +I 20, -U 10 (retract), +U 30, -D 20 → live = {30}
    val log = Seq(
      (1L, 10.0, RowKind.Insert), (1L, 20.0, RowKind.Insert),
      (1L, 10.0, RowKind.UpdateBefore), (1L, 30.0, RowKind.UpdateAfter),
      (1L, 20.0, RowKind.Delete),
      (2L, 7.0, RowKind.Insert))
      .toDF("g", "v", RowKind.kindCol).withColumn(RowKind.seqCol, lit(1L))
    val out = RetractableAgg(log, Seq("g"), "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 30.0, 30.0, 30.0),
      (2L, 1L, 7.0, 7.0, 7.0)))
  }
}
