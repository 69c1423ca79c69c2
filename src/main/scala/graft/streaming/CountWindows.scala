package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Tumbling COUNT windows per key — `KeyedStream.countWindow(n)`
  * (flink-runtime/…/streaming/api/datastream/KeyedStream.java:676, window
  * machinery `PurgingTrigger.of(CountTrigger.of(n))` over GlobalWindows).
  *
  * Semantics (the reference's): rows are grouped per key in arrival order
  * into consecutive windows of exactly `size` rows; a window FIRES only
  * when full — a trailing partial window never emits. `countWindowAll` is
  * the `keyCols = constant` special case (parallelism-1 in the reference
  * too — it serializes by construction, use a real key at scale).
  *
  * Output: key columns, `win_id` (0-based per key), `n_rows` (= size),
  * `sum_v` (exact decimal sum of `valCol` cast back to double).
  *
  * Batch face: row_number per key over `orderCols` div size — one shuffle
  * + per-partition sort, no per-key materialization. Streaming face:
  * `flatMapGroupsWithState` with O(1) state per key (running count, the
  * partial sum, next win_id) — rows beyond batch boundaries continue the
  * same window; within a micro-batch rows are ordered by `orderCols`'
  * first column (cross-batch order is arrival order, as for every keyed
  * count-window consumer including the reference's).
  */
object CountWindows {

  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valCol: String,
      size: Int): DataFrame = {
    require(size > 0, "count window size must be positive")

    if (!df.isStreaming) {
      val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      return df
        .withColumn("__rn", row_number().over(w) - 1)
        .withColumn("win_id", (col("__rn") / size).cast("long"))
        .groupBy(keyCols.map(col) :+ col("win_id"): _*)
        .agg(count(lit(1)).as("n_rows"),
          graft.queries.Exact.dsum(col(valCol)).as("sum_v"))
        .where(col("n_rows") === size)
    }

    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val ordIdx = df.schema.fieldIndex(orderCol)
    val valIdx = df.schema.fieldIndex(valCol)
    require(df.schema(ordIdx).dataType == LongType,
      s"streaming count window orders within a micro-batch by a LongType " +
        s"column (exact event-time micros); got ${df.schema(ordIdx).dataType}")
    val keySchema = StructType(keyIdx.map(df.schema.fields(_)))
    val outSchema = StructType(
      keyIdx.map(df.schema.fields(_)) ++ Seq(
        StructField("win_id", LongType),
        StructField("n_rows", LongType),
        StructField("sum_v", DoubleType)))

    val kEnc: Encoder[Row] = StatefulOps.rowEnc(keySchema)
    val vEnc: Encoder[Row] = StatefulOps.rowEnc(df.schema)
    // state: (next win_id, rows in open window, open window's exact sum
    // as an unscaled scale-2 decimal — the same HALF_UP centi-units the
    // batch face's decimal(25,2) cast produces)
    type S = (Long, Long, Long)
    implicit val sEnc: Encoder[S] = Encoders.kryo[S]
    implicit val oEnc: Encoder[Row] = StatefulOps.rowEnc(outSchema)

    df.as[Row](vEnc)
      .groupByKey(StatefulOps.keyOf(keyIdx))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Row, rows: Iterator[Row], state: GroupState[S]) =>
          var (win, n, sumCenti) = state.getOption.getOrElse((0L, 0L, 0L))
          val out = List.newBuilder[Row]
          rows.toSeq.sortBy(_.getLong(ordIdx))
            .foreach { r =>
              val v = r.get(valIdx) match {
                case x: Number => x.doubleValue()
                case _ => 0.0
              }
              n += 1
              sumCenti += new java.math.BigDecimal(v)
                .setScale(2, java.math.RoundingMode.HALF_UP)
                .unscaledValue().longValueExact()
              if (n == size) {
                out += Row.fromSeq(key.toSeq ++
                  Seq[Any](win, n, sumCenti.toDouble / 100))
                win += 1; n = 0; sumCenti = 0L
              }
            }
          state.update((win, n, sumCenti))
          out.result().iterator
      }
  }

  /** SLIDING count windows — `countWindow(size, slide)`: window `w` covers
    * rows `(w·slide − size, w·slide]` of the key's arrival order and fires
    * when its last row arrives; only FULL windows fire. Tumbling is the
    * `slide = size` special case ([[apply]]).
    *
    * Batch face: each row explodes to its ≤ size/slide member window ids
    * before the shuffle (partial aggregation applies). Streaming face:
    * state per key = the last `size − 1` values plus a running count —
    * O(size), the same bound the reference's count-sliding window pane
    * state has. */
  def sliding(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valCol: String,
      size: Int,
      slide: Int): DataFrame = {
    require(size > 0 && slide > 0 && slide <= size,
      "need 0 < slide <= size")

    if (!df.isStreaming) {
      val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      val wAll = Window.partitionBy(keyCols.map(col): _*)
      return df
        .withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__tot", count(lit(1)).over(wAll))
        .withColumn("win_id", explode(sequence(
          expr(s"(__rn + ${slide - 1}) div $slide"),
          expr(s"(__rn + ${size - 1}) div $slide"))))
        .where(col("win_id") * slide >= size &&
          col("win_id") * slide <= col("__tot"))
        .groupBy(keyCols.map(col) :+ col("win_id"): _*)
        .agg(count(lit(1)).as("n_rows"),
          graft.queries.Exact.dsum(col(valCol)).as("sum_v"))
    }

    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val ordIdx = df.schema.fieldIndex(orderCol)
    val valIdx = df.schema.fieldIndex(valCol)
    require(df.schema(ordIdx).dataType == LongType,
      "streaming sliding count window orders within a micro-batch by a " +
        s"LongType column; got ${df.schema(ordIdx).dataType}")
    val keySchema = StructType(keyIdx.map(df.schema.fields(_)))
    val outSchema = StructType(
      keyIdx.map(df.schema.fields(_)) ++ Seq(
        StructField("win_id", LongType),
        StructField("n_rows", LongType),
        StructField("sum_v", DoubleType)))
    val kEnc: Encoder[Row] = StatefulOps.rowEnc(keySchema)
    val vEnc: Encoder[Row] = StatefulOps.rowEnc(df.schema)
    // state: (total rows seen, last size-1 values in scale-2 centi units)
    type S = (Long, Vector[Long])
    implicit val sEnc: Encoder[S] = Encoders.kryo[S]
    implicit val oEnc: Encoder[Row] = StatefulOps.rowEnc(outSchema)

    df.as[Row](vEnc)
      .groupByKey(StatefulOps.keyOf(keyIdx))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Row, rows: Iterator[Row], state: GroupState[S]) =>
          var (total, buf) = state.getOption.getOrElse((0L, Vector.empty[Long]))
          val out = List.newBuilder[Row]
          rows.toSeq.sortBy(_.getLong(ordIdx)).foreach { r =>
            val v = r.get(valIdx) match {
              case x: Number => x.doubleValue()
              case _ => 0.0
            }
            val centi = new java.math.BigDecimal(v)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .unscaledValue().longValueExact()
            total += 1
            buf = (buf :+ centi).takeRight(size)
            if (total % slide == 0 && total >= size) {
              out += Row.fromSeq(key.toSeq ++ Seq[Any](
                total / slide, size.toLong, buf.sum.toDouble / 100))
            }
            buf = buf.takeRight(size - 1)
          }
          state.update((total, buf))
          out.result().iterator
      }
  }
}
