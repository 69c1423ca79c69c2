package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch session windows: assign a session id per key where consecutive
  * events further apart than `gap` start a new session.
  *
  * Re-expresses the reference's merging session windows
  * (flink-table-runtime/…/operators/window/tvf/unslicing/UnsliceAssigners.java)
  * as the classic gaps-and-islands form: lag + cumulative sum over one
  * per-key ordered window. One shuffle, no state, scales with the window
  * machinery (streaming variant: Spark's `session_window`, see
  * graft.streaming).
  */
object Sessionize {

  /** Adds `__session_start` (the session's first time value) to every row.
    *
    * @param timeCol orderable numeric/time column (exact epoch nanos
    *                recommended for reproducibility)
    * @param gap     same unit as `timeCol`
    */
  def apply(df: DataFrame, key: String, timeCol: String, gap: Long): DataFrame = {
    val byTime = Window.partitionBy(col(key)).orderBy(col(timeCol))
    val newSession =
      when(col(timeCol) - lag(col(timeCol), 1).over(byTime) > gap, 1)
        .otherwise(0)
    val sessionIdx = sum(when(lag(col(timeCol), 1).over(byTime).isNull, 0)
      .otherwise(newSession))
      .over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__session_idx", sessionIdx)
      .withColumn(
        "__session_start",
        min(col(timeCol)).over(
          Window.partitionBy(col(key), col("__session_idx"))))
      .drop("__session_idx") // internal helper — output adds only __session_start
  }

  /** Per-session aggregate: key, session start, row count, and the given
    * aggregates.
    */
  def aggregate(
      df: DataFrame,
      key: String,
      timeCol: String,
      gap: Long,
      aggs: (String, Column)*): DataFrame = {
    val first = count(lit(1)).as("session_rows")
    apply(df, key, timeCol, gap)
      .groupBy(col(key), col("__session_start").as("session_start"))
      .agg(first, aggs.map { case (n, c) => c.as(n) }: _*)
  }
}
