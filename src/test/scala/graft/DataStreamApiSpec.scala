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

  test("process on an unwatermarked stream fails fast on a wake timer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // ADVICE r11: a requested event-time timer used to silently vanish
    // when the streaming input carried no watermarked column (wm pinned
    // to 0); a ported program's timers then never fired. Now it throws.
    val input = MemoryStream[(Long, Long)]
    val q = env.fromDataset(input.toDS())
      .keyBy(_._1) // NO assignTimestampsAndWatermarks
      .process[Long, (Long, Long)] { (key, rows, st, _) =>
        val cnt = st.getOrElse(0L) + rows.size
        (Some(cnt), Seq((key, cnt)), Some(12345L)) // wake requested
      }
      .toDataset
      .writeStream.format("memory").queryName("ds_proc_nowm")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-dspn-").toString)
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { input.addData(Seq((1L, 10L))); q.processAllAvailable() }
      finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no watermarked column")), msgs(e))
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

  test("partitioning verbs, name/uid, minBy/maxBy, fromCollection") {
    val s = env.fromCollection(Seq((1L, 5.0), (1L, 2.0), (1L, 7.0)))
      .name("source").uid("src-1")
    // redistribution verbs preserve content
    assert(s.rebalance().executeAndCollect().toSet ==
      Set((1L, 5.0), (1L, 2.0), (1L, 7.0)))
    assert(s.shuffle().executeAndCollect().size == 3)
    assert(s.rescale().executeAndCollect().size == 3)
    assert(s.global().toDataset.rdd.getNumPartitions == 1)
    assert(s.forward().executeAndCollect().size == 3)
    assert(s.setParallelism(2).toDataset.rdd.getNumPartitions == 2)
    // rolling minBy/maxBy emit per element, first-seen tie-break
    val mins = s.keyBy(_._1).minBy(_._2).executeAndCollect()
      .map(_._2).sorted
    assert(mins == Seq(2.0, 2.0, 5.0))
    val maxs = s.keyBy(_._1).maxBy(_._2).executeAndCollect()
      .map(_._2).sorted
    assert(maxs == Seq(5.0, 5.0, 7.0))
    env.execute("compat") // no-op
  }

  test("connect: CoMap per side; keyed CoProcess shares per-key state") {
    val a = env.fromElements((1L, 10.0), (2L, 20.0))
    val b = env.fromElements((1L, "x"), (1L, "y"))
    val m = a.connect(b).map(t => s"L${t._1}", s => s"R${s._2}")
    assert(m.executeAndCollect().toSet == Set("L1", "L2", "Rx", "Ry"))
    val joined = a.connect(b).keyBy(_._1, _._1)
      .process[Unit, (Long, Double, Long)] { (k, rows, _, _) =>
        var sum = 0.0; var n = 0L
        rows.foreach {
          case Left((_, v)) => sum += v
          case Right(_) => n += 1
        }
        (None, Seq((k, sum, n)), None)
      }
    // one call per key seeing BOTH inputs tagged Left/Right
    assert(joined.executeAndCollect().toSet ==
      Set((1L, 10.0, 2L), (2L, 20.0, 0L)))
  }

  test("processWithSideOutputs routes tagged elements") {
    import graft.stream.Tagged
    val s = env.fromElements((1L, 5.0), (1L, -3.0), (2L, 7.0))
      .keyBy(_._1)
      .processWithSideOutputs[Unit, (Long, Double)] { (_, rows, _, _) =>
        val outs = rows.map { r =>
          if (r._2 < 0) Tagged("neg", r) else Tagged("", r)
        }.toSeq
        (None, outs, None)
      }
    assert(s.mainOutput.executeAndCollect().toSet ==
      Set((1L, 5.0), (2L, 7.0)))
    assert(s.getSideOutput("neg").executeAndCollect().toSet ==
      Set((1L, -3.0)))
  }

  test("intervalJoin pairs in-bound elements once, batch and stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 10_000_000L // ms — keeps event times far above epoch
    val l = Seq((1L, base + 100L), (1L, base + 200L), (2L, base + 100L))
    val r = Seq((1L, base + 101L), (1L, base + 150L), (1L, base + 199L),
      (2L, base + 300L))
    // 1s out-of-orderness so the second batch's older rows are not
    // dropped as late (the reference's bounded-out-of-orderness bound)
    def run(lds: graft.stream.DataStream[(Long, Long)],
        rds: graft.stream.DataStream[(Long, Long)]) =
      lds.keyBy(_._1).intervalJoin(rds.keyBy(_._1))
        .between(-2L, 2L, delay = "1 second")(_._2, _._2)
        .process((a, b) => (a._1, a._2 - base, b._2 - base))
    val expected = Set((1L, 100L, 101L), (1L, 200L, 199L))
    assert(run(env.fromElements(l: _*), env.fromElements(r: _*))
      .executeAndCollect().toSet == expected)

    // streaming: same pairs across micro-batch splits, each once (the
    // join assigns its own watermark from the extracted times)
    val li = MemoryStream[(Long, Long)]
    val ri = MemoryStream[(Long, Long)]
    val q = run(env.fromDataset(li.toDS()), env.fromDataset(ri.toDS()))
      .toDataset
      .writeStream.format("memory").queryName("ds_ivj")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ivj-").toString)
      .start()
    try {
      li.addData(l.take(2)); ri.addData(r.take(2)); q.processAllAvailable()
      li.addData(l.drop(2)); ri.addData(r.drop(2)); q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("ds_ivj").as[(Long, Long, Long)]
      .collect().toSet == expected)

    // struct-encoded (tuple) keys work too (review r11: the key is
    // re-derived from the payload, not read back from the struct col)
    val lt = Seq(((1L, "x"), base + 100L), ((2L, "y"), base + 100L))
    val rt = Seq(((1L, "x"), base + 101L), ((2L, "z"), base + 101L))
    val outT = env.fromElements(lt: _*).keyBy(_._1)
      .intervalJoin(env.fromElements(rt: _*).keyBy(_._1))
      .between(-2L, 2L)(_._2, _._2)
      .process((a, b) => (a._1._1, a._1._2))
      .executeAndCollect().toSet
    assert(outT == Set((1L, "x"))) // (2,"y") vs (2,"z") keys differ
  }

  test("streaming event-time window without a watermark fails fast") {
    import graft.stream.TumblingEventTimeWindows
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val e = intercept[IllegalArgumentException] {
      env.fromDataset(input.toDS())
        .keyBy(_._1)
        .window(TumblingEventTimeWindows(10L))(_._2)
        .apply((k, w, es) => (k, w, es.size))
    }
    assert(e.getMessage.contains("assignTimestampsAndWatermarks"))
  }

  test("event-time windows and countWindow close per contract") {
    import graft.stream.{SlidingEventTimeWindows, TumblingEventTimeWindows}
    val rows = Seq((1L, 5L, 1.0), (1L, 15L, 2.0), (1L, 25L, 4.0),
      (2L, 5L, 8.0))
    val w = env.fromElements(rows: _*)
      .keyBy(_._1)
      .window(TumblingEventTimeWindows(10L))(_._2)
      .apply((k, ws, elems) => (k, ws, elems.map(_._3).sum))
    assert(w.executeAndCollect().toSet ==
      Set((1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 20L, 4.0), (2L, 0L, 8.0)))
    // sliding: each element lands in size/slide windows
    val sl = env.fromElements(rows: _*)
      .keyBy(_._1)
      .window(SlidingEventTimeWindows(20L, 10L))(_._2)
      .apply((k, ws, elems) => (k, ws, elems.map(_._3).sum))
    assert(sl.executeAndCollect().toSet == Set(
      (1L, -10L, 1.0), (1L, 0L, 3.0), (1L, 10L, 6.0), (1L, 20L, 4.0),
      (2L, -10L, 8.0), (2L, 0L, 8.0)))
    // count windows: full windows only, arrival order
    val c = env.fromElements(rows: _*)
      .keyBy(_._1).countWindow(2)
      .apply((k, es) => (k, es.map(_._3).sum))
    assert(c.executeAndCollect().toSet == Set((1L, 3.0)))
    val cr = env.fromElements(rows: _*)
      .keyBy(_._1).countWindow(2)
      .reduce((x, y) => (x._1, x._2, x._3 + y._3))
    assert(cr.executeAndCollect().toSet == Set((1L, 5L, 3.0)))
  }

  test("coGroup windows both sides per key, batch and stream") {
    import graft.stream.TumblingEventTimeWindows
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 10_000_000L
    val l = Seq((1L, base + 2L, "a"), (1L, base + 12L, "b"),
      (2L, base + 3L, "c"))
    val r = Seq((1L, base + 4L, 10.0), (1L, base + 15L, 20.0),
      (3L, base + 5L, 30.0))
    def run(lds: graft.stream.DataStream[(Long, Long, String)],
        rds: graft.stream.DataStream[(Long, Long, Double)]) =
      lds.coGroup(rds).where(_._1).equalTo(_._1)
        .window(TumblingEventTimeWindows(10L), delay = "1 second")(
          _._2, _._2)
        .apply((k, w, ls, rs) =>
          (k, w - base, ls.map(_._3).mkString("|"), rs.map(_._3).sum))
    val expected = Set(
      (1L, 0L, "a", 10.0), (1L, 10L, "b", 20.0),
      (2L, 0L, "c", 0.0), (3L, 0L, "", 30.0)) // one-sided windows too
    assert(run(env.fromElements(l: _*), env.fromElements(r: _*))
      .executeAndCollect().toSet == expected)
    val li = MemoryStream[(Long, Long, String)]
    val ri = MemoryStream[(Long, Long, Double)]
    val q = run(env.fromDataset(li.toDS()), env.fromDataset(ri.toDS()))
      .toDataset.writeStream.format("memory").queryName("ds_cogrp")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cg-").toString)
      .start()
    try {
      li.addData(l.take(2)); ri.addData(r.take(1)); q.processAllAvailable()
      li.addData(l.drop(2)); ri.addData(r.drop(1)); q.processAllAvailable()
      // push the watermark past every window end
      li.addData(Seq((9L, base + 100_000L, "z"))); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ds_cogrp")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(expected.subsetOf(streamed))
    assert(streamed -- expected ==
      Set((9L, 100_000L - math.floorMod(100_000L, 10L), "z", 0.0)) ||
      (streamed -- expected).forall(_._1 == 9L))
  }

  test("session windows merge by gap, constant and dynamic") {
    import graft.stream.{DynamicEventTimeSessionWindows, EventTimeSessionWindows}
    // key 1: 5,8,12 (one session: gaps < 10), 40 (own session)
    val rows = Seq((1L, 5L, 1.0), (1L, 8L, 2.0), (1L, 12L, 4.0),
      (1L, 40L, 8.0), (2L, 7L, 16.0))
    val s = env.fromElements(rows: _*)
      .keyBy(_._1)
      .window(EventTimeSessionWindows.withGap(10L))(_._2)
      .apply((k, start, es) => (k, start, es.map(_._3).sum))
    assert(s.executeAndCollect().toSet ==
      Set((1L, 5L, 7.0), (1L, 40L, 8.0), (2L, 7L, 16.0)))
    // dynamic gap: the element's value IS its gap — (1, 5) gap 1 ends
    // before 8 (split); (1, 8) gap 30 spans [8, 38) so 12 merges but
    // 40 does not
    val d = env.fromElements(
      (1L, 5L, 1.0), (1L, 8L, 30.0), (1L, 12L, 4.0), (1L, 40L, 8.0))
      .keyBy(_._1)
      .window(DynamicEventTimeSessionWindows
        .withDynamicGap[(Long, Long, Double)](_._3.toLong))(_._2)
      .apply((k, start, es) => (k, start, es.map(_._3).sum))
    assert(d.executeAndCollect().toSet ==
      Set((1L, 5L, 1.0), (1L, 8L, 34.0), (1L, 40L, 8.0)))
    // reduce face + empty-session never emitted
    val r = env.fromElements(rows: _*)
      .keyBy(_._1)
      .window(EventTimeSessionWindows.withGap(10L))(_._2)
      .reduce((a, b) => (a._1, a._2, a._3 + b._3))
    assert(r.executeAndCollect().map(_._3).toSet == Set(7.0, 8.0, 16.0))
  }

  test("streaming session window closes when the watermark passes its end") {
    import graft.stream.EventTimeSessionWindows
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseMs = 10_000_000L
    val input = MemoryStream[(Long, Long, Double)]
    val s = env.fromDataset(
      input.toDF().toDF("k", "tms", "v")
        .withColumn("ts", timestamp_micros(col("tms") * 1000L))
        .as[(Long, Long, Double, java.sql.Timestamp)])
      .assignTimestampsAndWatermarks("ts", "0 seconds")
      .keyBy(_._1)
      .window(EventTimeSessionWindows.withGap(10L))(_._2)
      .apply((k, start, es) => (k, start - baseMs, es.map(_._3).sum))
    val q = s.toDataset.writeStream.format("memory").queryName("ds_sess")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-dss-").toString)
      .start()
    try {
      input.addData(Seq((1L, baseMs + 5L, 1.0), (1L, baseMs + 12L, 2.0)))
      q.processAllAvailable()
      // wm at 12: session [5, 22) still open
      assert(spark.table("ds_sess").isEmpty)
      // 18 extends the session (gap from 12 is 6 < 10); wm stays inside
      input.addData(Seq((1L, baseMs + 18L, 4.0)))
      q.processAllAvailable()
      assert(spark.table("ds_sess").isEmpty)
      input.addData(Seq((1L, baseMs + 40L, 8.0))) // wm 40 > 18+10: closes
      q.processAllAvailable()
      assert(spark.table("ds_sess").as[(Long, Long, Double)]
        .collect().toSet == Set((1L, 5L, 7.0)))
    } finally q.stop()
  }

  test("window aggregate is incremental; session aggregate merges accs") {
    import graft.stream.{EventTimeSessionWindows, TumblingEventTimeWindows}
    val rows = Seq((1L, 5L, 1.0), (1L, 15L, 2.0), (1L, 25L, 4.0),
      (2L, 5L, 8.0))
    // (count, sum) accumulator — the canonical AggregateFunction
    val a = env.fromElements(rows: _*)
      .keyBy(_._1)
      .window(TumblingEventTimeWindows(10L))(_._2)
      .aggregate[(Long, Double), (Long, Double)](
        () => (0L, 0.0), (acc, r) => (acc._1 + 1, acc._2 + r._3), identity)
    assert(a.executeAndCollect().toSet ==
      Set((1L, 1.0), (1L, 2.0), (1L, 4.0), (2L, 8.0)).map { case (k, s) =>
        (1L, s) })
    // windowed reduce rides the same incremental path
    val r = env.fromElements(rows: _*)
      .keyBy(_._1)
      .window(TumblingEventTimeWindows(10L))(_._2)
      .reduce((x, y) => (x._1, math.max(x._2, y._2), x._3 + y._3))
    assert(r.executeAndCollect().map(_._3).toSet == Set(1.0, 2.0, 4.0, 8.0))
    // session aggregate: bridging element merges neighbor accumulators
    val s = env.fromElements(
      (1L, 5L, 1.0), (1L, 30L, 2.0), (1L, 14L, 4.0)) // 14 bridges 5 & 30? gap 10: 5..15, 14 in; 14+10=24 < 30 → separate
      .keyBy(_._1)
      .window(EventTimeSessionWindows.withGap(10L))(_._2)
      .aggregate[(Long, Double), (Long, Double)](
        () => (0L, 0.0), (acc, r) => (acc._1 + 1, acc._2 + r._3),
        identity, (x, y) => (x._1 + y._1, x._2 + y._2))
    assert(s.executeAndCollect().toSet ==
      Set((2L, 5.0), (1L, 2.0)))
  }

  test("allowedLateness re-fires; sideOutputLateData catches drops") {
    import graft.stream.TumblingEventTimeWindows
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseMs = 10_000_000L
    val input = MemoryStream[(Long, Long, Double)]
    // NOT pre-watermarked: the lateness path derives its own watermark
    // from timeOf with the 100ms out-of-orderness bound
    def windowed(lateness: Long) = env.fromDataset(input.toDS())
      .keyBy(_._1)
      .window(TumblingEventTimeWindows(10L))(_._2)
      .allowedLateness(lateness, outOfOrdernessMs = 100L)
      .sideOutputLateData()
      .applyWithLateOutput((k, ws, elems) =>
        (k, ws - baseMs, elems.map(_._3).sum))
    val out = windowed(20L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-late-")
    val qm = out.mainOutput.toDataset.writeStream.format("memory")
      .queryName("dsl_main").outputMode("append")
      .option("checkpointLocation", s"$ckpt/m").start()
    val ql = out.lateOutput.toDataset.writeStream.format("memory")
      .queryName("dsl_late").outputMode("append")
      .option("checkpointLocation", s"$ckpt/l").start()
    def sync(): Unit = { qm.processAllAvailable(); ql.processAllAvailable() }
    try {
      input.addData(Seq((1L, baseMs + 5L, 1.0)))
      sync()
      input.addData(Seq((1L, baseMs + 25L, 2.0))) // wm→~-75: nothing fires yet
      input.addData(Seq((1L, baseMs + 120L, 0.5))) // wm→+20: [0,10) fires
      sync()
      // in-lateness straggler for [0,10): end 10, lateness 20 → wm 20 < 30
      input.addData(Seq((1L, baseMs + 7L, 10.0)))
      sync()
      // push the true watermark to +100 (assigned delay is
      // user 100ms + lateness 20 + size 10 = 130ms behind max event)
      input.addData(Seq((1L, baseMs + 200L, 0.25)))
      sync()
      // too-late element: window [70,80) has end + lateness = 100 <= wm
      input.addData(Seq((1L, baseMs + 75L, 100.0)))
      sync()
      val main = spark.table("dsl_main").as[(Long, Long, Double)]
        .collect().toList
      // [0,10) fired at 1.0, then RE-fired at 11.0 after the straggler
      assert(main.filter(_._2 == 0L).map(_._3).sorted == List(1.0, 11.0))
      val late = spark.table("dsl_late")
        .as[(Long, Long, Double)].collect().toList
      assert(late.map(_._3) == List(100.0))
    } finally { qm.stop(); ql.stop() }
  }

  test("AsyncDataStream ordered/unordered waits, timeout and retry") {
    import graft.stream.AsyncDataStream
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    val in = env.fromCollection((1L to 40L).map(i => (i, i * 2)))
    // ordered: input order survives even when early elements finish last
    val ord = AsyncDataStream.orderedWait[(Long, Long), (Long, Long)](
      in.rebalance().setParallelism(1),
      t => Future { if (t._1 <= 3) Thread.sleep(40); (t._1, t._2 * 10) }
        .map(Seq(_)),
      timeoutMs = 30000L, capacity = 8)
    assert(ord.executeAndCollect().map(_._1) == (1L to 40L))
    // unordered: same multiset, plus a 1-to-many completion
    val uno = AsyncDataStream.unorderedWait[(Long, Long), Long](
      in, t => Future(Seq(t._1, -t._1)), timeoutMs = 30000L)
    assert(uno.executeAndCollect().toSet ==
      (1L to 40L).flatMap(i => Seq(i, -i)).toSet)
    // timeout: the fallback hook completes overdue elements
    val slow = AsyncDataStream.unorderedWait[(Long, Long), Long](
      env.fromElements((1L, 0L), (2L, 0L)).setParallelism(1),
      t => if (t._1 == 1L) Future { Thread.sleep(60000); Seq(t._1) }
        else Future.successful(Seq(t._1)),
      timeoutMs = 300L, onTimeout = t => Seq(-t._1))
    assert(slow.executeAndCollect().toSet == Set(-1L, 2L))
    // default timeout policy fails the task (reference default)
    val failing = AsyncDataStream.orderedWait[(Long, Long), Long](
      env.fromElements((1L, 0L)).setParallelism(1),
      _ => Future { Thread.sleep(60000); Seq(0L) }, timeoutMs = 200L)
    val e = intercept[org.apache.spark.SparkException] {
      failing.executeAndCollect()
    }
    assert(e.getMessage.contains("timeout") ||
      Option(e.getCause).exists(_.toString.contains("Timeout")))
    // retry: first two attempts fail, third succeeds
    val attempts = new java.util.concurrent.ConcurrentHashMap[Long,
      java.util.concurrent.atomic.AtomicInteger]()
    val rt = AsyncDataStream.orderedWaitWithRetry[(Long, Long), Long](
      env.fromElements((7L, 0L)).setParallelism(1),
      t => Future {
        val n = attempts.computeIfAbsent(t._1,
          _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
        if (n < 3) sys.error(s"flaky attempt $n") else Seq(t._1 * 100)
      },
      timeoutMs = 30000L, capacity = 4,
      retry = graft.operators.AsyncWait.FixedDelay(retries = 3, delayMs = 10))
    assert(rt.executeAndCollect() == Seq(700L))
  }

  test("fullWindowPartition: per-subtask full-window ops, no shuffle") {
    val s = env.fromCollection(1 to 10).global() // one partition
      .toDataset
    val one = new graft.stream.DataStream(s)
    assert(one.fullWindowPartition()
      .mapPartition(es => Seq(es.sum)).executeAndCollect() == Seq(55))
    assert(one.fullWindowPartition()
      .sortPartition((x: Int) => -x).executeAndCollect().take(3) ==
      Seq(10, 9, 8))
    assert(one.fullWindowPartition()
      .aggregate[(Int, Int), Double](() => (0, 0),
        (a, x) => (a._1 + x, a._2 + 1), a => a._1.toDouble / a._2)
      .executeAndCollect() == Seq(5.5))
    assert(one.fullWindowPartition()
      .reduce(_ + _).executeAndCollect() == Seq(55))
    // multi-partition: one result per non-empty partition, local only
    val multi = env.fromDataset(spark.range(100).as[Long].repartition(4))
      .fullWindowPartition().reduce(_ + _).executeAndCollect()
    assert(multi.size == 4 && multi.sum == 4950)
    // streaming input is rejected (bounded-only, per the reference)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Int]
    val e = intercept[IllegalArgumentException](
      env.fromDataset(input.toDS()).fullWindowPartition())
    assert(e.getMessage.contains("bounded"))
  }

  test("streaming tumbling window closes when the watermark passes") {
    import graft.stream.TumblingEventTimeWindows
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseMs = 10_000_000L
    val input = MemoryStream[(Long, Long, Double)] // (k, tMs, v)
    // the watermarked ts column must STAY in the element type (typed
    // maps strip watermark metadata) — assign last, keyBy directly
    val s = env.fromDataset(
      input.toDF().toDF("k", "tms", "v")
        .withColumn("ts", timestamp_micros(col("tms") * 1000L))
        .as[(Long, Long, Double, java.sql.Timestamp)])
      .assignTimestampsAndWatermarks("ts", "0 seconds")
      .keyBy(_._1)
      .window(TumblingEventTimeWindows(10L))(_._2)
      .apply((k, ws, elems) => (k, ws - baseMs, elems.map(_._3).sum))
    val q = s.toDataset.writeStream.format("memory").queryName("ds_win")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-dsw-").toString)
      .start()
    try {
      input.addData(Seq((1L, baseMs + 5L, 1.0), (1L, baseMs + 8L, 2.0)))
      q.processAllAvailable()
      // watermark still inside window [base, base+10) — nothing closed
      assert(spark.table("ds_win").isEmpty)
      input.addData(Seq((1L, baseMs + 25L, 4.0))) // wm jumps past +10
      q.processAllAvailable()
      assert(spark.table("ds_win").as[(Long, Long, Double)]
        .collect().toSet == Set((1L, 0L, 3.0)))
    } finally q.stop()
  }
}
