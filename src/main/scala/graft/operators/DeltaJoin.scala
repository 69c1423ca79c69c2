package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

/** Delta join — the reference's state-light bidirectional lookup join
  * (EXS/StreamExecDeltaJoin.java:204, RT/operators/join/deltajoin/):
  * instead of materializing both streams inside the join operator, each
  * arriving delta row probes the OTHER side's indexed sink table, so the
  * join "state" is the two tables that already exist downstream.
  *
  * Spark-first mapping: the two side tables are stored relations (parquet
  * here; a keyed table format in production) appended per micro-batch, and
  * each micro-batch emits
  *
  *   ΔA ⋈ B_stored  ∪  (A_stored ∪ ΔA) ⋈ ΔB
  *
  * which produces every cross pair EXACTLY once: (old, old) pairs were
  * emitted in earlier batches, (new, old) by the first term, (old, new)
  * and (new, new) by the second. Append-only inputs (the reference gates
  * delta join to insert-only streams with index-usable keys; updates
  * require the upsert tier).
  *
  * At scale both per-batch joins broadcast the DELTA side (small) against
  * the stored table scan — the stored side never shuffles, which is the
  * whole point of the operator.
  */
object DeltaJoin {

  /** One micro-batch step: join the two deltas against the stored tables
    * under `leftPath`/`rightPath`, append the deltas to their stores, and
    * return this batch's join output. Column names of the two sides must
    * be disjoint. */
  def processBatch(
      spark: SparkSession,
      deltaLeft: DataFrame,
      deltaRight: DataFrame,
      leftKey: String,
      rightKey: String,
      leftPath: String,
      rightPath: String): DataFrame = {
    require(deltaLeft.columns.toSet.intersect(deltaRight.columns.toSet).isEmpty,
      "delta join requires disjoint column names across sides")
    val storedLeft = readOrEmpty(spark, leftPath, deltaLeft.schema)
    val storedRight = readOrEmpty(spark, rightPath, deltaRight.schema)
    val cond = col(leftKey) === col(rightKey)
    val out =
      deltaLeft.join(storedRight, cond)
        .unionByName(storedLeft.unionByName(deltaLeft).join(deltaRight, cond))
    // Sever lineage BEFORE the appends: a cache() would be invalidated by
    // the writes below (CacheManager recaches plans whose source path is
    // written) and recompute against the already-appended stores —
    // double-counting every same-batch pair. localCheckpoint pins the
    // materialized rows.
    val result = out.localCheckpoint(true)
    deltaLeft.write.mode("append").parquet(leftPath)
    deltaRight.write.mode("append").parquet(rightPath)
    result
  }

  private def readOrEmpty(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    if (new java.io.File(path).exists())
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)

  /** Wrap both sides into one common-schema envelope so a single streaming
    * query carries them (the operator is two-input; Spark queries are
    * one-input). */
  def envelope(left: DataFrame, right: DataFrame): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val rNull = lit(null).cast(StructType(right.schema.fields))
    val lNull = lit(null).cast(StructType(left.schema.fields))
    left.select(lit("L").as("__side"), lStruct.as("__l"), rNull.as("__r"))
      .unionByName(
        right.select(lit("R").as("__side"), lNull.as("__l"),
          rStruct.as("__r")))
  }

  /** Streaming face: envelope the two delta streams, run [[processBatch]]
    * per micro-batch, hand each batch's append-only join output to `sink`.
    * Start with `.start()` on the returned writer. */
  def stream(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftPath: String,
      rightPath: String,
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    envelope(left, right).writeStream.foreachBatch {
      (batch: DataFrame, id: Long) =>
        val dl = batch.where(col("__side") === "L").select(col("__l.*"))
        val dr = batch.where(col("__side") === "R").select(col("__r.*"))
        sink(processBatch(batch.sparkSession, dl, dr, leftKey, rightKey,
          leftPath, rightPath), id)
    }
}
