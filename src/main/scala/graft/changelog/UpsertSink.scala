package graft.changelog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Changelog-aware streaming SINK: materializes a changelog stream into a
  * parquet-backed table via `foreachBatch` MERGE — the engine-side half of
  * the reference's Sink + SinkUpsertMaterializer pair
  * (StreamExecSink.java:137, SinkUpsertMaterializer.java:64).
  *
  * Per micro-batch: read current table state, union the batch's changelog
  * rows, keep-last per key by `__seq`, drop deleted keys, atomically
  * replace the table (write to a staging dir, swap). Idempotent under
  * micro-batch replay: re-applying a batch reaches the same state because
  * materialization is keyed keep-last by seq, not an increment.
  *
  * At scale the overwrite becomes a MERGE INTO on a table format with
  * transactional commit (Delta/Iceberg — not in this container); the
  * changelog→final-state semantics are identical and tested here.
  */
object UpsertSink {

  /** Apply one changelog micro-batch to the stored table. */
  def applyBatch(
      spark: SparkSession,
      tablePath: String,
      batch: DataFrame,
      keyCols: Seq[String]): Unit = {
    val dir = new java.io.File(tablePath)
    val existing =
      if (dir.exists() && dir.list().exists(_.endsWith(".parquet")))
        Some(spark.read.parquet(tablePath))
      else None

    // stored rows re-enter as seq-0 upserts so any change in the batch
    // (seq >= 1) supersedes them
    val storedAsLog = existing.map(
      _.withColumn(RowKind.kindCol, lit(RowKind.UpdateAfter))
        .withColumn(RowKind.seqCol, lit(0L)))

    val merged = UpsertMaterialize(
      storedAsLog.map(_.unionByName(batch)).getOrElse(batch), keyCols)

    val staging = tablePath + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    // swap staging into place (single-FS rename; transactional commit is
    // the table format's job at scale)
    val target = new java.io.File(tablePath)
    if (target.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(target)
    }
    new java.io.File(staging).renameTo(target)
  }

  /** Start a streaming upsert sink for a changelog-emitting query. */
  def writeUpsert(
      changelog: DataFrame,
      tablePath: String,
      keyCols: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changelog.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, tablePath, batch, keyCols)
      }
      .start()
}
