package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Late-data SIDE OUTPUT — the allowedLateness escape hatch the reference
  * exposes as `sideOutputLateData(tag)` on windowed streams
  * (flink-streaming-java/…/datastream/WindowedStream.java; lateness check
  * in …/windowing/WindowOperator.java `isElementLate`): rows whose event
  * time has fallen more than `allowedLateness` behind the watermark are
  * routed to a separate sink instead of being silently dropped, so a
  * pipeline can archive/reprocess them.
  *
  * Spark-first mapping: Spark drops late rows inside its stateful
  * operators with no hook, so the split happens ONE OPERATOR EARLIER — a
  * `foreachBatch` on the watermarked source stream classifies each
  * micro-batch against the listener-tracked watermark
  * ([[WatermarkTracker]]) and routes the two slices to user sinks. The
  * main slice is what a downstream aggregation would actually keep;
  * the late slice is the reference's side-output tag.
  *
  * Scale: the classification is a stateless filter per micro-batch — no
  * shuffle, no state; both sinks receive DataFrames and write with
  * whatever parallelism they choose.
  */
object LateData {

  /** Split one micro-batch by the given watermark: (on-time, late).
    * A row is late iff its event time < watermark − allowedLateness
    * (the reference's `isElementLate`). With no watermark yet (0),
    * everything is on time. */
  def split(
      batch: DataFrame,
      tsCol: String,
      watermarkMs: Long,
      allowedLatenessMs: Long): (DataFrame, DataFrame) = {
    val cutoff = watermarkMs - allowedLatenessMs
    val tsMs = EventTime.epochMs(col(tsCol))
    if (watermarkMs <= 0L) (batch, batch.limit(0))
    else (batch.where(tsMs >= cutoff), batch.where(tsMs < cutoff))
  }

  /** Start a streaming query that routes each micro-batch's on-time rows
    * to `onTime` and its late rows (beyond `allowedLatenessMs` behind the
    * watermark) to `late`.
    *
    * The watermark is maintained HERE (max event time seen in prior
    * batches − `delayMs`), replicating Spark's bounded-out-of-orderness
    * semantics: Spark itself only advances a query's watermark when a
    * stateful operator consumes it, and this sink is deliberately
    * stateless. Driver-side cost is one `max()` action per micro-batch.
    *
    * The max-seen event time is PERSISTED at `<checkpoint>/graft-watermark`
    * (write-temp-then-rename, Hadoop FS API so hdfs://s3a:// paths work)
    * and reloaded on start — the reference checkpoints watermarks, so a
    * restarted query must not regress to "no watermark" and misclassify
    * arbitrarily late replayed rows as on-time.
    */
  def writeWithSideOutput(
      df: DataFrame,
      tsCol: String,
      delayMs: Long,
      allowedLatenessMs: Long,
      checkpoint: String)(
      onTime: DataFrame => Unit,
      late: DataFrame => Unit): StreamingQuery = {
    val hadoopConf = df.sparkSession.sessionState.newHadoopConf()
    val wmPath = new Path(checkpoint, "graft-watermark")
    val maxSeen =
      new java.util.concurrent.atomic.AtomicLong(readWatermark(wmPath, hadoopConf))
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.persist()
        try {
          // watermark as of the END of the previous batch (Spark's rule)
          val wm =
            if (maxSeen.get() == Long.MinValue) 0L
            else maxSeen.get() - delayMs
          val (ok, lt) = split(cached, tsCol, wm, allowedLatenessMs)
          onTime(ok)
          late(lt)
          val row = cached
            .agg(max(EventTime.epochMs(col(tsCol)))).head()
          if (!row.isNullAt(0)) {
            val prev = maxSeen.getAndAccumulate(row.getLong(0), math.max)
            if (maxSeen.get() != prev) {
              writeWatermark(wmPath, maxSeen.get(), hadoopConf)
            }
          }
          ()
        } finally cached.unpersist()
      }
      .start()
  }

  /** Reload the persisted max-seen event time; Long.MinValue if absent. */
  private[streaming] def readWatermark(
      path: Path,
      conf: org.apache.hadoop.conf.Configuration): Long = {
    val fs = FileSystem.get(path.toUri, conf)
    if (!fs.exists(path)) Long.MinValue
    else {
      val in = fs.open(path)
      try {
        val bytes = new Array[Byte](64)
        val n = in.read(bytes)
        new String(bytes, 0, math.max(n, 0), StandardCharsets.UTF_8).trim.toLong
      } finally in.close()
    }
  }

  /** Persist atomically: write a temp file, then rename over the target. */
  private[streaming] def writeWatermark(
      path: Path,
      value: Long,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val fs = FileSystem.get(path.toUri, conf)
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(value.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(path)) fs.delete(path, false)
    fs.rename(tmp, path)
    ()
  }
}
