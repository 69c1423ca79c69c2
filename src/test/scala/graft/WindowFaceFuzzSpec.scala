package graft

import graft.stream._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.util.Random

/** Property fuzz for the typed window face (round 12 engine rewrite):
  * random element sets through tumbling / sliding / session windows are
  * checked against an independent brute-force formulation of the
  * assigner semantics, and the incremental `aggregate` path must agree
  * with the buffered `apply` path on every case. One randomized case
  * also replays through a real stream in micro-batches and must match
  * the batch answer (windows closed by the final watermark push). */
class WindowFaceFuzzSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val env = StreamExecutionEnvironment.create(spark)

  private val Cases = 20
  private val seed0 = 0x57a6e12L // deterministic

  private def brute(rows: Seq[(Long, Long, Double)], size: Long,
      slide: Long): Set[(Long, Long, Double, Long)] =
    rows.flatMap { case (k, t, v) =>
      val last = t - math.floorMod(t, slide)
      ((last - size + slide) to last by slide).map(w => (k, w, v))
    }.groupBy { case (k, w, _) => (k, w) }
      .map { case ((k, w), es) =>
        (k, w, es.map(_._3).sum, es.size.toLong)
      }.toSet

  private def bruteSessions(rows: Seq[(Long, Long, Double)], gap: Long)
      : Set[(Long, Long, Double, Long)] =
    rows.groupBy(_._1).flatMap { case (k, es) =>
      var out = List.empty[(Long, Long, List[Double])] // (start, end, vals)
      es.sortBy(_._2).foreach { case (_, t, v) =>
        out match {
          case (s, e, vs) :: rest if t < e =>
            out = (s, math.max(e, t + gap), v :: vs) :: rest
          case _ => out = (t, t + gap, List(v)) :: out
        }
      }
      out.map { case (s, _, vs) => (k, s, vs.sum, vs.size.toLong) }
    }.toSet

  test(s"typed windows agree with brute force on $Cases random cases") {
    val rnd = new Random(seed0)
    (1 to Cases).foreach { c =>
      val n = 5 + rnd.nextInt(40)
      val keys = 1 + rnd.nextInt(3)
      val rows = Seq.fill(n)((1L + rnd.nextInt(keys),
        10L + rnd.nextInt(90), (1 + rnd.nextInt(9)).toDouble))
      val size = Seq(5L, 10L, 20L)(rnd.nextInt(3))
      val slide = if (rnd.nextBoolean()) size else size / 5
      val assigner =
        if (slide == size) TumblingEventTimeWindows(size)
        else SlidingEventTimeWindows(size, slide)
      val expected = brute(rows, size, slide)

      val applied = env.fromElements(rows: _*)
        .keyBy(_._1)
        .window(assigner)(_._2)
        .apply((k, w, es) => (k, w, es.map(_._3).sum, es.size.toLong))
        .executeAndCollect().toSet
      assert(applied == expected, s"case $c apply: rows=$rows size=$size slide=$slide")

      val aggregated = env.fromElements(rows: _*)
        .keyBy(_._1)
        .window(assigner)(_._2)
        .aggregate[(Double, Long), (Double, Long)](
          () => (0.0, 0L), (a, r) => (a._1 + r._3, a._2 + 1), identity)
        .executeAndCollect()
      assert(aggregated.sorted ==
        expected.toList.map(x => (x._3, x._4)).sorted,
        s"case $c aggregate: rows=$rows size=$size slide=$slide")

      // sessions with a random gap on the same rows
      val gap = 3L + rnd.nextInt(20)
      val sessExpected = bruteSessions(rows, gap)
      val sess = env.fromElements(rows: _*)
        .keyBy(_._1)
        .window(EventTimeSessionWindows.withGap(gap))(_._2)
        .apply((k, s, es) => (k, s, es.map(_._3).sum, es.size.toLong))
        .executeAndCollect().toSet
      assert(sess == sessExpected, s"case $c session: rows=$rows gap=$gap")
    }
  }

  test("streaming replay in micro-batches matches the batch answer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new Random(seed0 ^ 0x5eed)
    val baseMs = 50_000_000L
    val n = 30
    val rows = Seq.fill(n)((1L + rnd.nextInt(2),
      baseMs + 10L + rnd.nextInt(90), (1 + rnd.nextInt(9)).toDouble))
      .sortBy(_._2) // arrive in event-time order so windows close cleanly
    val size = 10L
    val expected = env.fromElements(rows: _*)
      .keyBy(_._1)
      .window(TumblingEventTimeWindows(size))(_._2)
      .apply((k, w, es) => (k, w - baseMs, es.map(_._3).sum))
      .executeAndCollect().toSet

    val input = MemoryStream[(Long, Long, Double)]
    val s = env.fromDataset(
      input.toDF().toDF("k", "tms", "v")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("tms") * 1000L))
        .as[(Long, Long, Double, java.sql.Timestamp)])
      .assignTimestampsAndWatermarks("ts", "0 seconds")
      .keyBy(_._1)
      .window(TumblingEventTimeWindows(size))(_._2)
      .apply((k, w, es) => (k, w - baseMs, es.map(_._3).sum))
    val q = s.toDataset.writeStream.format("memory").queryName("wf_fuzz")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-wff-").toString)
      .start()
    try {
      var rest = rows
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(7)
        input.addData(rest.take(take)); rest = rest.drop(take)
        q.processAllAvailable()
      }
      // final push closes every window
      input.addData(Seq((9L, baseMs + 1_000_000L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("wf_fuzz").as[(Long, Long, Double)]
      .collect().toSet.filter(_._1 != 9L)
    assert(streamed == expected)
  }
}
