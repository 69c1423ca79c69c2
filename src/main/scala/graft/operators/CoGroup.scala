package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** CoGroup — both sides' rows for a key handed to one user function
  * (`DataStream.coGroup` via JoinedStreams/CoGroupedStreams,
  * flink-runtime/…/streaming/api/datastream/CoGroupedStreams.java): the
  * generalization of join where a key present on only one side still
  * produces a group (with the other side empty), and the function sees
  * whole groups rather than row pairs.
  *
  * Spark-first mapping: `KeyValueGroupedDataset.cogroup` — one hash
  * shuffle per side on the key, groups streamed to the function per
  * partition (no driver materialization). Spark's cogroup is batch-only;
  * the streaming coGroup-in-a-window shape is covered by the window join
  * (graft `q_window_join`) like the reference's windowed coGroup.
  */
object CoGroup {

  /** @param f (key, leftRows, rightRows) => output rows; either iterator
    *          may be empty (full-outer grouping). */
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      outSchema: StructType)(
      f: (Any, Iterator[Row], Iterator[Row]) => IterableOnce[Row]): DataFrame = {

    val li = left.schema.fieldIndex(leftKey)
    val ri = right.schema.fieldIndex(rightKey)
    require(left.schema(li).dataType == right.schema(ri).dataType,
      s"cogroup key types differ: ${left.schema(li).dataType} vs " +
        s"${right.schema(ri).dataType}")
    val keySchema = StructType(Seq(left.schema(li).copy(name = "k")))

    val kEnc: Encoder[Row] = Encoders.row(keySchema)
    val oEnc: Encoder[Row] = Encoders.row(outSchema)
    val lEnc: Encoder[Row] = Encoders.row(left.schema)
    val rEnc: Encoder[Row] = Encoders.row(right.schema)

    left.as[Row](lEnc).groupByKey(r => Row(r.get(li)))(kEnc)
      .cogroup(right.as[Row](rEnc).groupByKey(r => Row(r.get(ri)))(kEnc)) {
        (k, ls, rs) => f(k.get(0), ls, rs).iterator
      }(oEnc)
  }
}
