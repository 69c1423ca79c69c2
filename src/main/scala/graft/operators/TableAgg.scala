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
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val ordIdx = df.schema.fieldIndex(orderCol)
    val keySchema = StructType(keyIdx.map(df.schema.fields(_)))
    val outSchema = StructType(
      df.schema.fields :+ StructField("rnk", IntegerType))

    val kEnc = Encoders.row(keySchema)
    val vEnc = Encoders.row(df.schema)
    val oEnc = Encoders.row(outSchema)

    df.as[Row](vEnc)
      .groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(kEnc)
      .flatMapGroups { (_: Row, rows: Iterator[Row]) =>
        val sorted = rows.toSeq
          .map(r => (r.getAs[Number](ordIdx).doubleValue(), r))
          .sortBy(-_._1)
        // competition ranking: 1,1,3,…
        var rank = 0
        var seen = 0
        var prev = Double.NaN
        val out = Seq.newBuilder[Row]
        sorted.foreach { case (v, r) =>
          seen += 1
          if (seen == 1 || v != prev) { rank = seen; prev = v }
          if (rank <= n) out += Row.fromSeq(r.toSeq :+ rank)
        }
        out.result().iterator
      }(oEnc)
  }
}
