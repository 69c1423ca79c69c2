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
}
