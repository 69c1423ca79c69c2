package graft.changelog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level UPDATE / DELETE against a bucketed parquet table — the sink
  * abilities the reference models as SupportsRowLevelUpdate /
  * SupportsRowLevelDelete (flink-table-common/…/connector/sink/abilities/).
  *
  * The table must use the [[UpsertSink.applyBatchBucketed]] layout
  * (`__bucket=N/` hash partitions). Execution: one scan evaluates the
  * predicate everywhere (a predicate is not generally bucket-prunable),
  * but only buckets that actually CONTAIN matching rows are rewritten —
  * dynamic partition overwrite leaves the rest untouched, so write I/O is
  * proportional to the touched fraction. With a transactional table
  * format (Delta/Iceberg) the same plan commits atomically; plain parquet
  * swaps per-partition directories, same as the upsert sink.
  */
object RowLevelOps {

  private def touchedBuckets(spark: SparkSession, tablePath: String,
      cond: Column): Array[Int] =
    spark.read.parquet(tablePath).where(cond)
      .select(col("__bucket")).distinct().collect().map(_.getInt(0))

  /** UPDATE table SET assignments WHERE cond. Returns rows changed. */
  def update(
      spark: SparkSession,
      tablePath: String,
      cond: Column,
      assignments: Map[String, Column]): Long = {
    val affected = touchedBuckets(spark, tablePath, cond)
    if (affected.isEmpty) return 0L
    val slice = spark.read.parquet(tablePath)
      .where(col("__bucket").isin(affected.map(Int.box): _*))
    val changed = slice.where(cond).count()
    val updated = assignments.foldLeft(slice) { case (df, (c, v)) =>
      df.withColumn(c, when(cond, v).otherwise(col(c)))
    }
    updated.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket").parquet(tablePath)
    changed
  }

  /** DELETE FROM table WHERE cond. Returns rows deleted; buckets emptied
    * entirely are removed. */
  def delete(
      spark: SparkSession,
      tablePath: String,
      cond: Column): Long = {
    val affected = touchedBuckets(spark, tablePath, cond)
    if (affected.isEmpty) return 0L
    val slice = spark.read.parquet(tablePath)
      .where(col("__bucket").isin(affected.map(Int.box): _*))
    val deleted = slice.where(cond).count()
    val kept = slice.where(!coalesce(cond, lit(false)))
    val live = kept.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    kept.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket").parquet(tablePath)
    affected.filterNot(live).foreach { b =>
      FsOps.deleteRecursive(spark, s"$tablePath/__bucket=$b")
    }
    deleted
  }
}
