package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Temporal (event-time) sort: emit rows per key in event-time order as
  * the watermark advances — the reference's row-time sort
  * (StreamExecTemporalSort.java:64 / RT/operators/sort/RowTimeSortOperator
  * .java: buffer rows keyed by time, flush in order on watermark).
  *
  * Implemented ON TOP OF the PTF hook ([[ProcessTableFunction]]) — the
  * point of the PTF tier is that operators like this are a page of user
  * code, not an engine change. State = rows beyond the watermark only.
  * Batch input: one closed-stream pass per key (exact per-key sort).
  */
object StreamingSort {

  private final class SortPtf(tsIdx: Int)
    extends GraftPTF[List[(Long, Seq[Any])]] {
    def process(
        key: Row,
        rows: Iterator[Row],
        state: Option[List[(Long, Seq[Any])]],
        watermarkMs: Long)
      : (Option[List[(Long, Seq[Any])]], Seq[Row], Option[Long]) = {
      var pending = state.getOrElse(Nil)
      rows.foreach { r =>
        pending = (r.getAs[java.sql.Timestamp](tsIdx).getTime, r.toSeq) :: pending
      }
      val (ready, rest) = pending.partition(_._1 <= watermarkMs)
      val out = ready.sortBy(_._1).map(t => Row.fromSeq(t._2))
      val wake = rest.map(_._1).minOption
      (if (rest.isEmpty) None else Some(rest), out, wake)
    }
  }

  def apply(df: DataFrame, keyCols: Seq[String], tsCol: String,
      delay: String): DataFrame = {
    val in = EventTime.withWatermark(df, tsCol, delay)
    ProcessTableFunction(in, keyCols, df.schema,
      new SortPtf(df.schema.fieldIndex(tsCol)))
  }
}
