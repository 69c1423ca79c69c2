package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-first / keep-last row per key (reference:
  * StreamExecDeduplicate.java:94, RT/operators/deduplicate/).
  *
  * Batch form: row_number over (key, order) + filter — planned as
  * WindowGroupLimit (map-side group-limit before the shuffle).
  * Streaming keep-first is `dropDuplicates`/`dropDuplicatesWithinWatermark`;
  * keep-last lives in graft.streaming (flatMapGroupsWithState).
  */
object Dedup {

  /** Keep the first row per key under `order` (include tie-breakers for
    * determinism).
    *
    * `order` must be BARE (direction-free) columns/expressions — e.g.
    * `col("ts")`, `col("ts_ns")`, `length(col("s"))` — never `c.desc` /
    * `c.asc`: [[keepLast]] derives the reversed ordering by applying `.desc`
    * to each element, and Spark cannot reverse an expression that is already
    * a SortOrder (it would re-wrap it and either keep the wrong direction or
    * fail analysis).
    */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep the last row per key under `order`. Same contract as [[keepFirst]]:
    * `order` elements must be bare ascending expressions (they are reversed
    * here with `.desc`).
    */
  def keepLast(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order.map(_.desc))
}
