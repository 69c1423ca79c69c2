package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-N per group (reference: StreamExecRank.java:93 /
  * BatchExecRank.java:59, RT/operators/rank/).
  *
  * Batch form: `row_number` over a per-group ordered window + filter.
  * Spark ≥3.5 plans this as WindowGroupLimit — the per-partition top-N is
  * pruned BEFORE the shuffle, so at 100 TB each map task forwards at most N
  * rows per group instead of the whole group.
  */
object TopN {

  /** Keep the first `n` rows per group under `order`; adds `rank_no`.
    * Pass a total order (tie-broken) for deterministic output.
    */
  def apply(df: DataFrame, n: Int, groupBy: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupBy: _*).orderBy(order: _*)
    df.withColumn("rank_no", row_number().over(w))
      .where(col("rank_no") <= n)
  }
}
