package graft

import graft.stream.v2._
import graft.stream.v2.Api._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The DataStream API V2 facade (flink-datastream-api): streams ×
  * partitionings × process functions, each mapped onto the graft tier
  * underneath. */
class DataStreamV2Spec extends SparkSpecBase {
  import spark.implicits._

  private lazy val env = ExecutionEnvironment.getExecutionEnvironment(spark)

  test("non-keyed one-input process with endInput flush") {
    val out = env.fromCollection(Seq(1, 2, 3, 4))
      .process(new OneInputStreamProcessFunction[Int, Int] {
        def processRecord(r: Int, out: Collector[Int],
            ctx: PartitionedContext): Unit =
          if (r % 2 == 0) out.collect(r * 10)
      })
      .toDataset.collect().toSet
    assert(out == Set(20, 40))
    // endInput runs once per partition
    val flushed = env.fromCollection(Seq(1, 2, 3)).global()
      .process(new OneInputStreamProcessFunction[Int, Int] {
        private var n = 0
        def processRecord(r: Int, out: Collector[Int],
            ctx: PartitionedContext): Unit = n += 1
        override def endInput(out: Collector[Int],
            ctx: PartitionedContext): Unit = out.collect(n)
      })
      .toDataset.collect().toList
    assert(flushed == List(3))
  }

  test("two-output process splits into getFirst / getSecond") {
    val r = env.fromCollection(Seq(1, 2, 3, 4, 5))
      .process(new TwoOutputStreamProcessFunction[Int, Int, String] {
        def processRecord(x: Int, o1: Collector[Int], o2: Collector[String],
            ctx: PartitionedContext): Unit =
          if (x % 2 == 0) o1.collect(x) else o2.collect(s"odd-$x")
      })
    assert(r.getFirst.toDataset.collect().toSet == Set(2, 4))
    assert(r.getSecond.toDataset.collect().toSet ==
      Set("odd-1", "odd-3", "odd-5"))
  }

  test("connectAndProcess: two non-keyed inputs, broadcast rules input") {
    val merged = env.fromCollection(Seq(1, 2))
      .connectAndProcess(env.fromCollection(Seq("a", "b")),
        new TwoInputNonBroadcastStreamProcessFunction[Int, String, String] {
          def processRecordFromFirstInput(r: Int, out: Collector[String],
              ctx: PartitionedContext): Unit = out.collect(s"i$r")
          def processRecordFromSecondInput(r: String, out: Collector[String],
              ctx: PartitionedContext): Unit = out.collect(s"s$r")
        })
      .toDataset.collect().toSet
    assert(merged == Set("i1", "i2", "sa", "sb"))
    // broadcast side visits every partition before the records
    val b = env.fromCollection(Seq(10, 20)).broadcast()
    val applied = env.fromCollection(Seq(1, 2, 3))
      .connectAndProcess(b,
        new TwoInputBroadcastStreamProcessFunction[Int, Int, Int] {
          @transient private var thresh = 0
          def processRecordFromBroadcastInput(r: Int,
              ctx: PartitionedContext): Unit = thresh = math.max(thresh, r)
          def processRecordFromNonBroadcastInput(r: Int, out: Collector[Int],
              ctx: PartitionedContext): Unit = out.collect(r + thresh)
        })
      .toDataset.collect().toSet
    assert(applied == Set(21, 22, 23))
  }

  test("keyed process: per-key state, endInput at batch end, re-keying") {
    val out = env.fromCollection(
      Seq((1, 2.0), (2, 5.0), (1, 3.0), (2, 1.0), (1, 4.0)))
      .keyBy(_._1)
      .process(new OneInputStreamProcessFunction[(Int, Double), (Int, Double, Long)] {
        def processRecord(r: (Int, Double), out: Collector[(Int, Double, Long)],
            ctx: PartitionedContext): Unit = {
          val sm = ctx.stateManager
          sm.update("sum", sm.getState[Double]("sum").getOrElse(0.0) + r._2)
          sm.update("n", sm.getState[Long]("n").getOrElse(0L) + 1)
          sm.update("key", r._1)
        }
        override def endInput(out: Collector[(Int, Double, Long)],
            ctx: PartitionedContext): Unit = {
          val sm = ctx.stateManager
          out.collect((sm.getState[Int]("key").get,
            sm.getState[Double]("sum").get, sm.getState[Long]("n").get))
        }
      })
      .toDataset.collect().toSet
    assert(out == Set((1, 9.0, 3L), (2, 6.0, 2L)))
  }

  test("state on a non-keyed stream fails fast") {
    val e = intercept[org.apache.spark.SparkException] {
      env.fromCollection(Seq(1))
        .process(new OneInputStreamProcessFunction[Int, Int] {
          def processRecord(r: Int, out: Collector[Int],
              ctx: PartitionedContext): Unit =
            ctx.stateManager.update("x", 1)
        })
        .toDataset.collect()
    }
    assert(e.getMessage.contains("keyBy") ||
      Option(e.getCause).exists(_.getMessage.contains("keyBy")))
  }

  test("keyed process on a stream: state across batches + event timer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseMs = 10_000_000L
    val input = MemoryStream[(Long, Long, Double)]
    val v1 = new graft.stream.DataStream(
      input.toDF().toDF("k", "tms", "v")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("tms") * 1000L))
        .as[(Long, Long, Double, java.sql.Timestamp)])
      .assignTimestampsAndWatermarks("ts", "0 seconds")
    val s = env.fromDataset(v1.toDataset)
      .keyBy(_._1)
      .process(new OneInputStreamProcessFunction[
          (Long, Long, Double, java.sql.Timestamp), (Long, Double)] {
        def processRecord(r: (Long, Long, Double, java.sql.Timestamp),
            out: Collector[(Long, Double)], ctx: PartitionedContext): Unit = {
          val sm = ctx.stateManager
          sm.update("sum", sm.getState[Double]("sum").getOrElse(0.0) + r._3)
          sm.update("key", r._1)
          // flush when the watermark passes the element by 15ms
          ctx.eventTimeManager.registerTimer(r._2 + 15L)
        }
        override def onEventTimer(ts: Long, out: Collector[(Long, Double)],
            ctx: PartitionedContext): Unit = {
          val sm = ctx.stateManager
          out.collect((sm.getState[Long]("key").get,
            sm.getState[Double]("sum").get))
          sm.remove("sum"); sm.remove("key")
        }
      })
    val q = s.toDataset.writeStream.format("memory").queryName("v2_timer")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-v2t-").toString)
      .start()
    try {
      input.addData(Seq((1L, baseMs + 5L, 2.0), (1L, baseMs + 8L, 3.0)))
      q.processAllAvailable()
      assert(spark.table("v2_timer").isEmpty) // wm 8 < timer 20/23
      // a DIFFERENT key pushes the watermark past key 1's timer
      input.addData(Seq((9L, baseMs + 40L, 1.0)))
      q.processAllAvailable()
      val got = spark.table("v2_timer").as[(Long, Double)].collect().toList
      assert(got == List((1L, 5.0)))
    } finally q.stop()
  }

  test("BuiltinFuncs.window: tumbling and session on the V2 face") {
    val keyed = env.fromCollection(
      Seq((1L, 5L, 1.0), (1L, 15L, 2.0), (1L, 18L, 4.0), (2L, 5L, 8.0)))
      .keyBy(_._1)
    val t = BuiltinFuncs.window[Long, (Long, Long, Double), (Long, Long, Double)](
      keyed, BuiltinFuncs.tumbling(10L), _._2) { (k, w, es, out) =>
      out.collect((k, w, es.map(_._3).sum))
    }
    assert(t.toDataset.collect().toSet ==
      Set((1L, 0L, 1.0), (1L, 10L, 6.0), (2L, 0L, 8.0)))
    val s = BuiltinFuncs.window[Long, (Long, Long, Double), (Long, Long, Double)](
      keyed, BuiltinFuncs.session(8L), _._2) { (k, w, es, out) =>
      out.collect((k, w, es.map(_._3).sum))
    }
    assert(s.toDataset.collect().toSet ==
      Set((1L, 5L, 1.0), (1L, 15L, 6.0), (2L, 5L, 8.0)))
  }

  test("BuiltinFuncs.window2 and windowTwoOutput complete the window set") {
    val l = env.fromCollection(
      Seq((1L, 5L, "a"), (1L, 15L, "b"), (2L, 5L, "c"))).keyBy(_._1)
    val r = env.fromCollection(
      Seq((1L, 7L, 10.0), (3L, 8L, 30.0))).keyBy(_._1)
    // two-input window: both sides per (key, window), either may be empty
    val j = BuiltinFuncs.window2[Long, (Long, Long, String),
        (Long, Long, Double), (Long, Long, String, Double)](
      l, r, BuiltinFuncs.tumbling(10L), _._2, _._2) { (k, w, ls, rs, out) =>
      out.collect((k, w, ls.map(_._3).mkString("|"), rs.map(_._3).sum))
    }
    assert(j.toDataset.collect().toSet == Set(
      (1L, 0L, "a", 10.0), (1L, 10L, "b", 0.0),
      (2L, 0L, "c", 0.0), (3L, 0L, "", 30.0)))
    // session strategy rejected on the two-input face
    val e = intercept[IllegalArgumentException](
      BuiltinFuncs.window2[Long, (Long, Long, String), (Long, Long, Double),
          Long](l, r, BuiltinFuncs.session(5L), _._2, _._2)((_, _, _, _, _) => ()))
    assert(e.getMessage.contains("session"))
    // two-output window: evens and odds split from one windowed pass
    val two = BuiltinFuncs.windowTwoOutput[Long, (Long, Long, String),
        Long, String](l, BuiltinFuncs.tumbling(10L), _._2) {
      (k, w, es, o1, o2) => o1.collect(k * 100 + w); es.foreach(e => o2.collect(e._3))
    }
    assert(two.getFirst.toDataset.collect().toSet == Set(100L, 110L, 200L))
    assert(two.getSecond.toDataset.collect().toSet == Set("a", "b", "c"))
  }

  test("BuiltinFuncs.join pairs per key (INNER, the reference's set)") {
    val l = env.fromCollection(Seq((1, "a"), (1, "b"), (2, "c"))).keyBy(_._1)
    val r = env.fromCollection(Seq((1, 10), (2, 20), (3, 30))).keyBy(_._1)
    val j = BuiltinFuncs.join[Int, (Int, String), (Int, Int), (Int, String, Int)](
      l, r) { (a, b, out) => out.collect((a._1, a._2, b._2)) }
    assert(j.toDataset.collect().toSet ==
      Set((1, "a", 10), (1, "b", 10), (2, "c", 20)))
  }

  test("keyed×broadcast: replay happens ONCE per key even with no user state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (key, seq)
    val b = env.fromCollection(Seq(10, 20)).broadcast()
    val s = env.fromDataset(input.toDS())
      .keyBy(_._1)
      .connectAndProcess(b,
        // stores NO user state: the pre-fix heuristic (state emptiness =
        // first visit) replayed the broadcast on EVERY micro-batch here
        new TwoInputBroadcastStreamProcessFunction[(Long, Long), Int, (Long, Int)] {
          @transient private var replays = 0
          def processRecordFromBroadcastInput(r: Int,
              ctx: PartitionedContext): Unit = replays += 1
          def processRecordFromNonBroadcastInput(r: (Long, Long),
              out: Collector[(Long, Int)], ctx: PartitionedContext): Unit =
            out.collect((r._2, replays))
        })
    val q = s.toDataset.writeStream.format("memory").queryName("v2_breplay")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-v2b-").toString)
      .start()
    try {
      input.addData(Seq((1L, 1L)))
      q.processAllAvailable()
      input.addData(Seq((1L, 2L))) // same key, next micro-batch
      q.processAllAvailable()
      val got = spark.table("v2_breplay").as[(Long, Int)].collect().toMap
      assert(got(1L) == 2, "first visit replays both broadcast records")
      assert(got(2L) == 0, s"second micro-batch must NOT replay (got ${got(2L)})")
    } finally q.stop()
  }

  test("partitionings: shuffle/global keep data; sinks consume") {
    val xs = (1 to 100).toList
    assert(env.fromCollection(xs).shuffle().toDataset.collect().sorted
      .toList == xs)
    val g = env.fromCollection(xs).global()
    assert(g.toDataset.rdd.getNumPartitions == 1)
    val buf = scala.collection.mutable.ListBuffer.empty[Int]
    env.fromCollection(Seq(7, 8)).toSink(Sinks.collect(buf))
    assert(buf.toSet == Set(7, 8))
    env.fromCollection(Seq(1)).toSink(Sinks.blackhole) // materializes
  }
}
