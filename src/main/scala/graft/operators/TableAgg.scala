package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Table aggregate: a grouping whose "aggregate" emits MULTIPLE rows per
  * group — the UDF tier the reference exposes as TableAggregateFunction
  * (flink-table-common/…/functions/TableAggregateFunction.java:157, used by
  * StreamExecGroupTableAggregate). Spark-first mapping: `flatMapGroups`.
  *
  * [[topNWithTies]] is the canonical example (the reference docs' own
  * Top2 demo, generalized): emit every row whose competition rank by
  * `orderCol` (descending) is ≤ n — ties included, so a group can emit
  * more than n rows.
  */
object TableAgg {

  def topNWithTies(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      n: Int): DataFrame = {
    val ordIdx = df.schema.fieldIndex(orderCol)
    val outSchema = StructType(
      df.schema.fields :+ StructField("rnk", IntegerType))

    // Secondary sort: rows arrive per key in DESCENDING orderCol order from
    // Spark's external sort, so competition ranking is a single counter —
    // no per-key buffer, no heap; rows past rank n are skipped lazily.
    SecondarySort.mapOrderedGroups(
      df, keyCols,
      Seq(org.apache.spark.sql.functions.col(orderCol).desc),
      outSchema) { (_, rows) =>
      // competition ranking: 1,1,3,…
      var rank = 0
      var seen = 0
      var prev = Double.NaN
      rows.flatMap { r =>
        val v = r.getAs[Number](ordIdx).doubleValue()
        seen += 1
        if (seen == 1 || v != prev) { rank = seen; prev = v }
        if (rank <= n) Some(Row.fromSeq(r.toSeq :+ rank)) else None
      }
    }
  }
}
