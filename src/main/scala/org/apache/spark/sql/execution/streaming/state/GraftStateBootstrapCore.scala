package org.apache.spark.sql.execution.streaming.state

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Core of the state BOOTSTRAP WRITE path (graft.streaming.StateBootstrap
  * is the public face): author a Structured Streaming aggregation
  * checkpoint — state delta files plus the offsets/commits/metadata logs —
  * from a batch DataFrame of pre-aggregated rows, so a streaming query
  * started against that checkpoint resumes "from" the batch data and
  * continues its counts.
  *
  * This is the reverse of the state READ path (graft.streaming.StateQuery
  * over `format("statestore")`) and the Spark-native analog of the
  * reference's state-processor write side
  * (flink-libraries/flink-state-processing-api/…/
  * StateBootstrapTransformation.java:63, SavepointWriter) — there, a batch
  * job writes operator savepoint files; here, a batch job writes the
  * HDFS-backed state store's version-1 deltas through the provider API and
  * authors batch-0 offset/commit entries so the engine treats the
  * bootstrap as an already-committed first batch.
  *
  * Lives in Spark's `state` package because the provider API is
  * `private[sql]`; contains only original code.
  *
  * Scale: the write is `mapPartitionsWithIndex` over the key-hash
  * partitioned rows — each task writes exactly its partition's delta, no
  * driver involvement, no shuffle beyond the one key repartition (which is
  * REQUIRED: rows must land in the same partition the streaming
  * aggregation's HashPartitioning will later look them up in — same
  * Murmur3 hash, same modulus).
  */
object GraftStateBootstrapCore {

  /** Write `df` (key columns + aggregation-buffer columns, one row per
    * key) as the keyed state of a streaming aggregation, as of a committed
    * batch 0. `numShufflePartitions` is recorded in the offset log, so the
    * resuming query adopts it regardless of its session default (Spark's
    * own restart semantics). */
  def writeAggState(
      df: DataFrame,
      checkpoint: String,
      keyCols: Seq[String],
      numShufflePartitions: Int,
      operatorId: Long): Unit = {
    val spark = df.sparkSession
    val valueCols = df.columns.filterNot(keyCols.contains).toSeq
    val shaped = df.select((keyCols ++ valueCols).map(col): _*)
      .repartition(numShufflePartitions, keyCols.map(col): _*)
    val schema = shaped.schema
    val nKeys = keyCols.length
    val keySchema = StructType(schema.fields.take(nKeys))
    val valueSchema = StructType(schema.fields.drop(nKeys))
    val stateRoot = new org.apache.hadoop.fs.Path(checkpoint, "state").toString
    val conf0 = spark.sessionState.newHadoopConf()
    // the provider derives its instance identity from the streaming run id
    // in the hadoop conf; the bootstrap job is a one-shot synthetic "run"
    conf0.set(
      org.apache.spark.sql.execution.streaming.runtime.StreamExecution.RUN_ID_KEY,
      java.util.UUID.randomUUID().toString)
    val hadoopConf = new SerializableConfiguration(conf0)
    val fields = schema.fields

    shaped.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      val provider = new HDFSBackedStateStoreProvider()
      provider.init(
        StateStoreId(stateRoot, operatorId, pid),
        keySchema, valueSchema,
        NoPrefixKeyStateEncoderSpec(keySchema),
        useColumnFamilies = false,
        new StateStoreConf(),
        hadoopConf.value)
      val store = provider.getStore(0)
      val keyProj = UnsafeProjection.create((0 until nKeys).map(i =>
        BoundReference(i, fields(i).dataType, fields(i).nullable)))
      val valProj = UnsafeProjection.create((nKeys until fields.length).map(i =>
        BoundReference(i, fields(i).dataType, fields(i).nullable)))
      it.foreach { row =>
        // projections reuse buffers; the store keeps references → copy
        store.put(keyProj(row).copy(), valProj(row).copy())
      }
      store.commit() // writes <partition>/1.delta
      provider.close()
      Iterator.single(pid)
    }.count()

    // Batch-0 logs, hand-authored in the engine's stable text formats: the
    // offset log pins the confs a restart re-applies (partitioning, state
    // format), the commit log marks batch 0 complete (so the first real
    // batch is 1, reading state version 1 — our deltas), and the file
    // source's own log records an EMPTY batch 0 so only files arriving
    // after bootstrap are processed.
    def write(rel: String, text: String): Unit = {
      val p = java.nio.file.Paths.get(checkpoint, rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, text)
    }
    val conf = Seq(
      "spark.sql.shuffle.partitions" -> numShufflePartitions.toString,
      "spark.sql.streaming.stateStore.providerClass" ->
        classOf[HDFSBackedStateStoreProvider].getName,
      "spark.sql.streaming.aggregation.stateFormatVersion" -> "2",
      "spark.sql.streaming.flatMapGroupsWithState.stateFormatVersion" -> "2",
      "spark.sql.streaming.join.stateFormatVersion" -> "2",
      "spark.sql.streaming.multipleWatermarkPolicy" -> "min",
      "spark.sql.streaming.statefulOperator.useStrictDistribution" -> "true",
      "spark.sql.streaming.stateStore.compression.codec" -> "lz4")
      .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    write("metadata", s"""{"id":"${java.util.UUID.randomUUID()}"}""")
    write("offsets/0",
      "v1\n" +
        s"""{"batchWatermarkMs":0,"batchTimestampMs":${System.currentTimeMillis()},"conf":{$conf}}\n""" +
        """{"logOffset":0}""")
    write("commits/0", "v1\n{\"nextBatchWatermarkMs\":0}")
    write("sources/0/0", "v1")
  }
}
