package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StructField, StructType}

import scala.concurrent.{ExecutionContext, Future}

/** AsyncCorrelate: asynchronous TABLE function invocation in a LATERAL
  * position — the reference's async correlate tier
  * (flink-table-planner/…/exec/stream/StreamExecAsyncCorrelate.java:28,
  * CommonExecAsyncCorrelate.java:59; runtime
  * AsyncCorrelateRunner over the shared ORDERED AsyncWaitOperator).
  *
  * Where [[AsyncCalc]] appends ONE scalar per row, AsyncCorrelate joins
  * each input row with the 0..n rows its async table function returns —
  * an async UDTF in `FROM t, LATERAL TABLE(F(args))` position. Use for
  * table functions that do I/O (an HTTP fan-out per key, a service
  * returning a result LIST per row).
  *
  * Semantics (parity with the reference):
  *   - join types INNER (row dropped when the function returns empty) and
  *     LEFT (kept, null-padded — the `ON TRUE` spelling), the two types
  *     the reference's correlate supports (FlinkJoinType checks in
  *     CommonExecAsyncCorrelate);
  *   - ORDERED emission: results emit in input-row order regardless of
  *     async completion order (the reference hard-codes
  *     AsyncDataStream.OutputMode.ORDERED for correlates);
  *   - bounded in-flight work per partition (`maxInFlight` batches of
  *     `batchSize` — the reference's table.exec.async-correlate
  *     buffer-capacity), timeout policy + retry schedule shared with the
  *     rest of the async tier ([[AsyncWait]]).
  *
  * Scale: pure per-partition pipeline — no shuffle, no state; throughput
  * scales with partitions × maxInFlight like the reference's operator
  * scales with parallelism × capacity.
  */
object AsyncCorrelate {

  def apply(
      df: DataFrame,
      f: Row => Seq[Seq[Any]],
      outFields: Seq[StructField],
      joinType: String = "inner",
      batchSize: Int = 64,
      maxInFlight: Int = 4,
      timeoutMs: Long = AsyncWait.DefaultTimeoutMs,
      onTimeout: AsyncWait.Policy = AsyncWait.Fail,
      retry: AsyncWait.Retry = AsyncWait.NoRetry): DataFrame = {
    val jt = joinType.toLowerCase
    require(jt == "inner" || jt == "left",
      s"async correlate supports INNER and LEFT joins, got $joinType")
    val leftOuter = jt == "left"
    // LEFT pads misses with nulls; the Nulls timeout policy pads whole
    // timed-out batches — either way the output fields must admit nulls
    val outFs =
      if (leftOuter || onTimeout == AsyncWait.Nulls)
        outFields.map(_.copy(nullable = true))
      else outFields
    val outSchema = StructType(df.schema.fields ++ outFs)
    val width = outFields.size
    df.mapPartitions { it =>
      val nulls: Seq[Any] = Seq.fill(width)(null)
      def expand(r: Row): Seq[Row] = {
        val produced = f(r)
        if (produced.isEmpty) {
          if (leftOuter) Seq(Row.fromSeq(r.toSeq ++ nulls)) else Nil
        } else produced.map { out =>
          require(out.size == width,
            s"table function returned ${out.size} fields, declared $width")
          Row.fromSeq(r.toSeq ++ out)
        }
      }
      // Nulls-policy timeout = every row of the batch is a miss:
      // LEFT pads, INNER drops (parity with LookupJoin.async)
      AsyncWait.orderedBatched(it, batchSize, maxInFlight,
        run = _.flatMap(expand),
        fallback = batch =>
          if (leftOuter) batch.map(r => Row.fromSeq(r.toSeq ++ nulls))
          else Seq.empty,
        timeoutMs, onTimeout, retry)
    }(Encoders.row(outSchema))
  }
}
