package org.apache.spark.sql.execution.streaming.state

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BoundReference, CreateNamedStruct, Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Core of the state BOOTSTRAP WRITE path (graft.streaming.StateBootstrap
  * is the public face): author a Structured Streaming checkpoint — state
  * delta files plus the offsets/commits/metadata logs — from a batch
  * DataFrame of pre-computed state rows, so a streaming query started
  * against that checkpoint resumes "from" the batch data.
  *
  * Three state layouts, one per stateful operator family:
  *  - aggregation (`groupBy.agg`, state format v2): value row = the
  *    aggregation buffer columns (key columns NOT repeated);
  *  - deduplication (`dropDuplicates`): value row = the EMPTY row — the
  *    store is a key-presence set;
  *  - flatMapGroupsWithState / mapGroupsWithState (state format v2):
  *    value row = `groupState` struct of the user state's encoder fields,
  *    plus a `timeoutTimestamp` LONG only when the resuming query uses a
  *    GroupStateTimeout (the engine's conditional schema).
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
  * operator's HashPartitioning will later look them up in — same
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
    val valueCols = df.columns.filterNot(keyCols.contains).toSeq
    writeState(df, checkpoint, keyCols, valueCols, numShufflePartitions,
      operatorId) { (fields, idx) =>
        idx.map(i => BoundReference(i, fields(i).dataType, fields(i).nullable))
      }
  }

  /** Write `df`'s key columns (one row per distinct key) as streaming
    * deduplication state: `dropDuplicates(keyCols)` started on the
    * checkpoint treats every bootstrapped key as already emitted. The
    * stored value is the engine's presence sentinel (a single-NullType
    * row — StreamingDeduplicateExec.EMPTY_ROW). */
  def writeDedupState(
      df: DataFrame,
      checkpoint: String,
      keyCols: Seq[String],
      numShufflePartitions: Int,
      operatorId: Long): Unit =
    writeState(df.select(keyCols.map(col): _*), checkpoint, keyCols, Nil,
      numShufflePartitions, operatorId)((_, _) =>
        Seq(Literal(null, org.apache.spark.sql.types.NullType)))

  /** Write `df` (key columns + user-state columns [+ `timeoutCol`]) as
    * `mapGroupsWithState` / `flatMapGroupsWithState` keyed state (state
    * format v2): the non-key columns must match the resuming query's
    * state-encoder fields in order and type. Pass `timeoutCol` iff the
    * resuming query sets a GroupStateTimeout (the engine only adds the
    * `timeoutTimestamp` slot to the state schema then); epoch millis, or
    * -1 for "no timeout set on this key". */
  def writeGroupState(
      df: DataFrame,
      checkpoint: String,
      keyCols: Seq[String],
      numShufflePartitions: Int,
      operatorId: Long,
      timeoutCol: Option[String],
      numSources: Int = 1): Unit = {
    val stateCols = df.columns
      .filterNot(keyCols.contains).filterNot(timeoutCol.contains).toSeq
    writeState(df, checkpoint, keyCols, stateCols ++ timeoutCol,
      numShufflePartitions, operatorId, numSources) { (fields, idx) =>
        val stateIdx = timeoutCol.fold(idx)(_ => idx.dropRight(1))
        val nested = CreateNamedStruct(stateIdx.flatMap { i =>
          Seq(Literal(fields(i).name),
            BoundReference(i, fields(i).dataType, fields(i).nullable))
        })
        val timeout = timeoutCol.map(_ => BoundReference(idx.last,
          fields(idx.last).dataType, nullable = false))
        Seq(nested) ++ timeout
      }
  }

  /** Shared writer: repartition by key hash, write each partition's
    * version-1 delta through the provider API, author the batch-0 logs.
    * `valueExprs(fields, valueIdx)` builds the bound value-row
    * projection expressions from the shaped schema. */
  private def writeState(
      df: DataFrame,
      checkpoint: String,
      keyCols: Seq[String],
      valueCols: Seq[String],
      numShufflePartitions: Int,
      operatorId: Long,
      numSources: Int = 1)(
      valueExprs: (Array[org.apache.spark.sql.types.StructField], Seq[Int])
        => Seq[Expression]): Unit = {
    val spark = df.sparkSession
    val shaped = df.select((keyCols ++ valueCols).map(col): _*)
      .repartition(numShufflePartitions, keyCols.map(col): _*)
    val schema = shaped.schema
    val nKeys = keyCols.length
    val keySchema = StructType(schema.fields.take(nKeys))
    val stateRoot = new org.apache.hadoop.fs.Path(checkpoint, "state").toString
    val conf0 = spark.sessionState.newHadoopConf()
    // the provider derives its instance identity from the streaming run id
    // in the hadoop conf; the bootstrap job is a one-shot synthetic "run"
    conf0.set(
      org.apache.spark.sql.execution.streaming.runtime.StreamExecution.RUN_ID_KEY,
      java.util.UUID.randomUUID().toString)
    val hadoopConf = new SerializableConfiguration(conf0)
    val fields = schema.fields
    val valueIdx = nKeys until fields.length
    val vExprs = valueExprs(fields, valueIdx.toSeq)
    val valueSchema = StructType(vExprs.zipWithIndex.map { case (e, i) =>
      org.apache.spark.sql.types.StructField(s"_$i", e.dataType, e.nullable)
    })

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
      val valProj = UnsafeProjection.create(vExprs)
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
    // one offset line + one source log per source the RESUMING query
    // reads (a changelog join unions two file streams -> two sources;
    // Spark refuses to recover when the counts differ)
    write("offsets/0",
      "v1\n" +
        s"""{"batchWatermarkMs":0,"batchTimestampMs":${System.currentTimeMillis()},"conf":{$conf}}""" +
        ("\n" + """{"logOffset":0}""") * numSources)
    write("commits/0", "v1\n{\"nextBatchWatermarkMs\":0}")
    (0 until numSources).foreach(i => write(s"sources/$i/0", "v1"))
  }
}

/** Bridge for [[graft.streaming.SavepointReader]]: the statestore DSv2
  * source reports snapshot loads to the session's StateStoreCoordinator
  * RPC endpoint, which Spark only creates when a streaming query starts
  * (`StreamingQueryManager.stateStoreCoordinator` is private[sql]) —
  * force-create it so purely-offline checkpoint reads work in a fresh
  * batch session.
  */
object GraftStateCoordinator {
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.streams match {
      case m: org.apache.spark.sql.classic.StreamingQueryManager =>
        m.stateStoreCoordinator
      case _ => ()
    }
}
