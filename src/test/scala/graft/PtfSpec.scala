package graft

import graft.streaming.{GraftPTF, ProcessTableFunction, WatermarkTracker}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Running per-key count+sum, emitted on every invocation — the PTF
  * documentation example shape. Top-level so the closure captures only
  * this serializable object, not the test class. */
private class RunningTotalsPtf extends GraftPTF[(Long, Double)] {
  def process(
      key: Row,
      rows: Iterator[Row],
      state: Option[(Long, Double)],
      watermarkMs: Long): (Option[(Long, Double)], Seq[Row], Option[Long]) = {
    var (n, s) = state.getOrElse((0L, 0.0))
    rows.foreach { r => n += 1; s += r.getDouble(r.fieldIndex("value")) }
    (Some((n, s)), Seq(Row(key.getLong(0), n, s)), None)
  }
}

/** Specs for the PTF hook and CURRENT_WATERMARK introspection. */
class PtfSpec extends SparkSpecBase {

  import spark.implicits._

  private val outSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("n_so_far", LongType),
    StructField("sum_so_far", DoubleType)))

  test("PTF batch: one process() call per key with watermark at +inf") {
    val in = Tables.events(spark, sf)
      .select(col("user_id"), col("value"))
    val out = ProcessTableFunction(in, Seq("user_id"), outSchema,
      new RunningTotalsPtf)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val exp = in.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).sameElements(exp.map(t => (t._1, t._2))))
    got.lazyZip(exp).foreach((g, e) => assert(math.abs(g._3 - e._3) < 1e-6))
  }

  test("PTF streaming: state accumulates across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ptf-").toString
    val q = ProcessTableFunction(df, Seq("user_id"), outSchema,
      new RunningTotalsPtf)
      .writeStream.format("memory").queryName("ptf_t")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val t0 = System.currentTimeMillis()
    try {
      input.addData(Seq((new Timestamp(t0), 1L, 1.0), (new Timestamp(t0), 2L, 5.0)))
      q.processAllAvailable()
      input.addData(Seq((new Timestamp(t0 + 1000), 1L, 2.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ptf_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // user 1: (1, 1.0) after batch 1, (2, 3.0) after batch 2; user 2: (1, 5.0)
    assert(rows == Set((1L, 1L, 1.0), (1L, 2L, 3.0), (2L, 1L, 5.0)))
  }

  test("PatternMatch streaming parity: NFA state crosses micro-batches") {
    import graft.operators.{PatternMatch, PatternStep}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val steps = Seq(
      PatternStep("down", (p: Double, c: Double) => c < p, greedy = true),
      PatternStep("up", (p: Double, c: Double) => c > p, greedy = true))

    // two keys, several Vs each, ending on a plateau so no greedy-final
    // match is left open (streaming has no end-of-input flush)
    val series = Seq(
      1L -> Seq(10.0, 8.0, 5.0, 7.0, 9.0, 9.0, 6.0, 4.0, 8.0, 8.0),
      2L -> Seq(3.0, 3.0, 2.0, 1.0, 5.0, 2.0, 6.0, 6.0))
    val rows = series.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, (i + 1) * 1000L, v) }
    }

    val batch = PatternMatch(
      rows.toDF("user_id", "ts_us", "value"),
      "user_id", "ts_us", "value", steps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    val input = MemoryStream[(Long, Long, Double)]
    val df = input.toDF().toDF("user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pm-").toString
    val q = PatternMatch.streaming(df, "user_id", "ts_us", "value", steps)
      .writeStream.format("memory").queryName("pm_t")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // split mid-run: the falling run of user 1's second V crosses batches
      val ordered = rows.sortBy(r => (r._2, r._1))
      val (a, b) = ordered.splitAt(ordered.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("pm_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // sanity: user 1 has two complete Vs, user 2 has two
    assert(batch.count(_._1 == 1L) == 2 && batch.count(_._1 == 2L) == 2)
  }

  test("WatermarkTracker observes advancing watermarks; column reflects it") {
    WatermarkTracker.register(spark)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "v").withWatermark("ts", "1 second")
      .groupBy(window(col("ts"), "10 seconds")).count()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wm-").toString
    val q = df.writeStream.format("memory").queryName("wm_t")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val base = 1700000000000L
    try {
      input.addData(Seq((new Timestamp(base), 1L)))
      q.processAllAvailable()
      input.addData(Seq((new Timestamp(base + 60000), 2L)))
      q.processAllAvailable()
      input.addData(Seq((new Timestamp(base + 61000), 3L)))
      q.processAllAvailable()
      // listener bus is async — wait for the progress events to land
      var waited = 0
      while (WatermarkTracker.watermarkMs(q.id).isEmpty && waited < 100) {
        Thread.sleep(100); waited += 1
      }
      // read BEFORE stop(): the tracker drops a query's entry on its
      // terminated event (running-query semantics, like the reference's
      // CURRENT_WATERMARK), so post-stop reads race the listener bus
      val wm = WatermarkTracker.watermarkMs(q.id)
      assert(wm.exists(_ >= base + 60000 - 1000), s"watermark not tracked: $wm")
      // the Column face renders the latest watermark as a timestamp literal
      val c = WatermarkTracker.currentWatermark()
      val v = spark.range(1).select(c.as("wm")).head().getTimestamp(0)
      assert(v != null && v.getTime >= base + 59000)
    } finally q.stop()
  }
}
