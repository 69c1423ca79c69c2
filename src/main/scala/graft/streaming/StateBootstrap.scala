package graft.streaming

import org.apache.spark.sql.DataFrame

/** State bootstrap — the WRITE side of the state-processor surface
  * (reference: flink-state-processing-api/…/
  * StateBootstrapTransformation.java:63, SavepointWriter/SavepointReader):
  * author a checkpoint from a batch DataFrame so a streaming query
  * warm-starts with that state instead of an empty store. The read side is
  * [[StateQuery]]; together they round-trip: checkpoint → DataFrame →
  * (transform) → checkpoint.
  *
  * Usage: `writeAggCheckpoint` the pre-aggregated rows (one per key:
  * key columns then aggregation-buffer columns, e.g. `(k, count)` for
  * `groupBy(k).count()`), then start the streaming query with this
  * checkpoint location — its first real batch continues from the
  * bootstrapped values. The buffer column layout must match the resuming
  * aggregation's state (types and order), exactly as the reference
  * requires the bootstrap function to produce the operator's state type.
  */
object StateBootstrap {

  /** Author a streaming-aggregation checkpoint (a committed batch 0 whose
    * keyed state holds `df`'s rows) under `checkpoint`. See
    * [[org.apache.spark.sql.execution.streaming.state.GraftStateBootstrapCore]]
    * for the mechanics. */
  def writeAggCheckpoint(
      df: DataFrame,
      checkpoint: String,
      keyCols: Seq[String],
      numShufflePartitions: Int,
      operatorId: Long = 0): Unit =
    org.apache.spark.sql.execution.streaming.state.GraftStateBootstrapCore
      .writeAggState(df, checkpoint, keyCols, numShufflePartitions, operatorId)

  /** Author a `dropDuplicates(keyCols)` checkpoint: every key in `df` is
    * treated as already seen (and therefore suppressed) by the resuming
    * streaming dedup. */
  def writeDedupCheckpoint(
      df: DataFrame,
      checkpoint: String,
      keyCols: Seq[String],
      numShufflePartitions: Int,
      operatorId: Long = 0): Unit =
    org.apache.spark.sql.execution.streaming.state.GraftStateBootstrapCore
      .writeDedupState(df, checkpoint, keyCols, numShufflePartitions,
        operatorId)

  /** Prepare a FILE-SINK output directory for a bootstrap-resumed query:
    * the sink's transaction log (`_spark_metadata`) needs an (empty)
    * entry for the committed batch 0, or readers of the output directory
    * fail on the gap once batch 1 commits. Call once per file-sink
    * destination before starting the resumed query. */
  def prepareFileSink(outputDir: String): Unit = {
    val p = java.nio.file.Paths.get(outputDir, "_spark_metadata", "0")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, "v1")
  }

  /** Author a `mapGroupsWithState`/`flatMapGroupsWithState` checkpoint —
    * the reference state-processor API's headline use (bootstrap a custom
    * keyed process function's state). `df` carries the key columns, then
    * the user state-encoder's fields in declaration order, then (only if
    * the resuming query configures a GroupStateTimeout) `timeoutCol` in
    * epoch millis (-1 = no timeout armed for the key). */
  def writeGroupStateCheckpoint(
      df: DataFrame,
      checkpoint: String,
      keyCols: Seq[String],
      numShufflePartitions: Int,
      operatorId: Long = 0,
      timeoutCol: Option[String] = None,
      numSources: Int = 1): Unit =
    org.apache.spark.sql.execution.streaming.state.GraftStateBootstrapCore
      .writeGroupState(df, checkpoint, keyCols, numShufflePartitions,
        operatorId, timeoutCol, numSources)
}
