package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.TimestampType

/** Watermark ALIGNMENT — the reference's drift-bounded source throttling
  * (flink-core/…/api/common/eventtime/WatermarkStrategy.java:88
  * `withWatermarkAlignment(group, maxDrift, updateInterval)`; runtime
  * coordination in `SourceCoordinator`/`WatermarkAlignmentEvent`): members
  * of an alignment group pause reading when their local watermark runs
  * more than `maxDrift` ahead of the group minimum, bounding the state
  * that downstream joins/windows must buffer for the slow member.
  *
  * Spark's micro-batch sources admit offsets, not event time, so the
  * throttle cannot live in the source. The Spark-first mapping puts the
  * SAME contract one operator downstream: rows more than `maxDriftMs`
  * ahead of the current global watermark — which Spark already computes
  * as the MIN across the query's sources (`multipleWatermarkPolicy` =
  * min, the alignment-group minimum) — are held in compact keyed state
  * and released, in event-time order, as the watermark advances (an
  * event-time timer fires exactly when the earliest held row becomes
  * releasable). Downstream operators therefore never see an event more
  * than `maxDriftMs` past the slowest source's watermark — alignment's
  * guarantee — at the cost of the aligner's own bounded buffer
  * (≤ the in-flight drift window) instead of idled source readers.
  *
  * Batch face: the watermark sits at +infinity, every row is releasable,
  * and the operator is a per-key order-preserving pass-through — the
  * usual batch-is-a-closed-stream special case.
  *
  * @param alignKeyCol alignment-group member id (source / partition id);
  *                    buffering and release order are per member
  * @param tsCol       event-time column (TimestampType, the watermark
  *                    column of the input)
  * @param maxDriftMs  how far past the global watermark a row may run
  *                    before it is held back
  */
object WatermarkAlign {

  def apply(
      df: DataFrame,
      alignKeyCol: String,
      tsCol: String,
      maxDriftMs: Long): DataFrame = {
    require(maxDriftMs >= 0, "maxDriftMs must be >= 0")
    require(df.schema(tsCol).dataType == TimestampType,
      s"$tsCol must be TimestampType (the watermark column)")
    val tsIdx = df.schema.fieldIndex(tsCol)
    def tsMs(r: Row): Long = r.getAs[java.sql.Timestamp](tsIdx).getTime

    // state: rows held because they outran watermark + drift
    val ptf = new GraftPTF[Seq[Seq[Any]]] {
      def process(
          key: Row,
          rows: Iterator[Row],
          state: Option[Seq[Seq[Any]]],
          watermarkMs: Long): (Option[Seq[Seq[Any]]], Seq[Row], Option[Long]) = {
        val horizon =
          if (watermarkMs == Long.MaxValue) Long.MaxValue
          else watermarkMs + maxDriftMs
        val held = state.getOrElse(Nil).map(Row.fromSeq) ++ rows
        val (release, keep) = held.partition(tsMs(_) <= horizon)
        val out = release.sortBy(tsMs) // event-time order within the member
        val wake =
          if (keep.isEmpty) None
          // fires when the earliest held row becomes releasable
          else Some(keep.map(tsMs).min - maxDriftMs)
        (if (keep.isEmpty) None else Some(keep.map(_.toSeq)), out, wake)
      }
    }
    ProcessTableFunction(df, Seq(alignKeyCol), df.schema, ptf)
  }
}
