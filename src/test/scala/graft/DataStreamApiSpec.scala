package graft

import graft.stream.StreamExecutionEnvironment
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, timestamp_micros}

/** The typed DataStream facade (DataStream.java / KeyedStream.java over
  * Dataset[T]): functional transforms, running reduce with Flink's
  * per-element emission contract, and the KeyedProcessFunction tier —
  * batch/stream unified. */
class DataStreamApiSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val env = StreamExecutionEnvironment.create(spark)

  test("map / flatMap / filter / union / keyBy plan as typed Dataset ops") {
    val s = env.fromElements((1L, 2.0), (2L, 3.0), (1L, 4.0))
      .filter(_._2 > 2.0)
      .map { case (k, v) => (k, v * 10) }
      .flatMap { case (k, v) => Seq((k, v), (k, -v)) }
    assert(s.executeAndCollect().toSet ==
      Set((2L, 30.0), (2L, -30.0), (1L, 40.0), (1L, -40.0)))
    val u = env.fromElements((9L, 1.0)).union(env.fromElements((8L, 2.0)))
    assert(u.executeAndCollect().toSet == Set((9L, 1.0), (8L, 2.0)))
  }

  test("keyBy().reduce emits the running reduce per element") {
    val out = env.fromElements(
      (1L, 1.0), (1L, 2.0), (2L, 5.0), (1L, 3.0))
      .keyBy(_._1)
      .reduce((a, b) => (a._1, a._2 + b._2))
      .executeAndCollect()
    // one emission PER INPUT carrying the reduce-so-far (Flink's
    // rolling aggregation), grouped per key
    assert(out.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap ==
      Map(1L -> Seq(1.0, 3.0, 6.0), 2L -> Seq(5.0)))
  }

  test("reduce: streaming accumulator persists across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val q = env.fromDataset(input.toDS())
      .keyBy(_._1)
      .reduce((a, b) => (a._1, a._2 + b._2))
      .toDataset
      .writeStream.format("memory").queryName("ds_reduce")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-dsr-").toString)
      .start()
    try {
      input.addData(Seq((1L, 1.0), (1L, 2.0))); q.processAllAvailable()
      input.addData(Seq((1L, 3.0))); q.processAllAvailable()
    } finally q.stop()
    val vals = spark.table("ds_reduce").as[(Long, Double)]
      .collect().map(_._2).sorted.toSeq
    // the third batch's emission continues from the persisted 3.0
    assert(vals == Seq(1.0, 3.0, 6.0))
  }

  test("keyBy().process: typed state + event-time timer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // count elements per key; on a 50ms-of-event-time silence timer,
    // emit the count and clear — the canonical KeyedProcessFunction
    val input = MemoryStream[(Long, Long)] // (key, ts_us)
    val withTime = input.toDF().toDF("k", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .as[(Long, Long, java.sql.Timestamp)]
    val q = env.fromDataset(withTime)
      .assignTimestampsAndWatermarks("ts", "0 seconds")
      .keyBy(_._1)
      .process[(Long, Long), (Long, Long)] { (key, rows, st, wm) =>
        val (cnt0, maxTs) = st.getOrElse((0L, 0L))
        var cnt = cnt0; var mx = maxTs
        rows.foreach { r => cnt += 1; mx = math.max(mx, r._2 / 1000L) }
        if (rows.isEmpty && cnt > 0 && wm >= mx + 50L)
          (None, Seq((key, cnt)), None) // timer fired: flush + clear
        else (Some((cnt, mx)), Nil, Some(mx + 51L))
      }
      .toDataset
      .writeStream.format("memory").queryName("ds_proc")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-dsp-").toString)
      .start()
    try {
      input.addData(Seq((7L, 100000L), (7L, 200000L)))
      q.processAllAvailable()
      // advance the watermark well past the silence window
      input.addData(Seq((8L, 900000L)))
      q.processAllAvailable()
      input.addData(Seq((8L, 950000L)))
      q.processAllAvailable()
    } finally q.stop()
    val flushed = spark.table("ds_proc").as[(Long, Long)].collect().toSet
    assert(flushed.contains((7L, 2L)), s"missing key-7 flush: $flushed")
  }

  test("batch process runs each key once with the watermark at infinity") {
    val out = env.fromElements((1L, 10.0), (1L, 20.0), (2L, 5.0))
      .keyBy(_._1)
      // the watermark flag rides the output (a scalatest assert inside
      // the closure would capture the non-serializable suite)
      .process[Double, (Long, Double, Boolean)] { (key, rows, _, wm) =>
        (None, Seq((key, rows.map(_._2).sum, wm == Long.MaxValue)), None)
      }
      .executeAndCollect()
    assert(out.toSet == Set((1L, 30.0, true), (2L, 5.0, true)))
  }
}
