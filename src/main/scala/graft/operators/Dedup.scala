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
    */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep the last row per key under `order`. */
  def keepLast(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order.map(_.desc))
}
