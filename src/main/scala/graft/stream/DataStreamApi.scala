package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's typed DataStream surface (flink-streaming-java/…/
  * datastream/DataStream.java, KeyedStream.java) re-expressed over
  * `Dataset[T]` — entry point C of SURVEY §3.3, so a migrating
  * DataStream program keeps its functional shape:
  *
  * {{{
  * val env = StreamExecutionEnvironment.create(spark)
  * env.fromDataset(events)
  *   .filter(_.value > 0)
  *   .map(e => (e.user, e.value))
  *   .keyBy(_._1)
  *   .reduce((a, b) => (a._1, a._2 + b._2))   // running per-key reduce
  * }}}
  *
  * Every operation maps onto the equivalent Dataset operation
  * (map/flatMap/filter/union are Catalyst-planned typed transforms;
  * `keyBy` is `groupByKey`). `reduce` keeps Flink's RUNNING emission
  * contract — one output per input element carrying the reduce-so-far —
  * via `flatMapGroupsWithState` on streams and a per-key fold on batch
  * (unified execution, like every graft operator). `process` exposes
  * the KeyedProcessFunction tier (state + event-time timers) as a typed
  * wrapper over the same hook the PTF operators use.
  *
  * Deliberate deltas (documented): no iterate() (cyclic dataflow has no
  * Catalyst analog — ConnectedComponents covers the iterative-algorithm
  * use case); windows live on the Table/SQL tiers (graft.table windows,
  * streaming ops) rather than on the typed stream.
  */
final class StreamExecutionEnvironment private (val spark: SparkSession) {
  def fromDataset[T](ds: Dataset[T]): DataStream[T] = new DataStream(ds)
  def fromElements[T: Encoder](xs: T*): DataStream[T] =
    new DataStream(spark.createDataset(xs))
}

object StreamExecutionEnvironment {
  def create(spark: SparkSession): StreamExecutionEnvironment =
    new StreamExecutionEnvironment(spark)
}

final class DataStream[T](val ds: Dataset[T]) {
  def map[U: Encoder](f: T => U): DataStream[U] = new DataStream(ds.map(f))
  def flatMap[U: Encoder](f: T => IterableOnce[U]): DataStream[U] =
    new DataStream(ds.flatMap(x => f(x).iterator.to(Iterable)))
  def filter(f: T => Boolean): DataStream[T] = new DataStream(ds.filter(f))
  def union(o: DataStream[T]): DataStream[T] =
    new DataStream(ds.union(o.ds))
  def keyBy[K: Encoder](f: T => K): KeyedStream[K, T] =
    new KeyedStream(ds, f)

  /** WatermarkStrategy.forBoundedOutOfOrderness over an existing
    * TIMESTAMP field (DataStream.assignTimestampsAndWatermarks): the
    * watermark trails the max seen event time by `maxOutOfOrderness`
    * (a Spark interval string, e.g. "5 seconds"). */
  def assignTimestampsAndWatermarks(
      eventTimeField: String, maxOutOfOrderness: String): DataStream[T] =
    new DataStream(ds.withWatermark(eventTimeField, maxOutOfOrderness))

  def toDataset: Dataset[T] = ds
  def executeAndCollect(): Seq[T] = ds.collect().toSeq
}

/** KeyedStream.java: per-key stateful operations with unified
  * batch/stream execution. */
final class KeyedStream[K, T] private[stream] (
    ds: Dataset[T], keyF: T => K)(implicit kEnc: Encoder[K]) {

  /** Flink's running `reduce`: EVERY input element emits the reduce of
    * all elements seen so far for its key (KeyedStream.java reduce —
    * the rolling aggregation contract). On batch the per-key fold
    * replays in encounter order; on streams the accumulator persists as
    * keyed state across micro-batches. */
  def reduce(f: (T, T) => T)(implicit tEnc: Encoder[T]): DataStream[T] = {
    implicit val optEnc: Encoder[Option[T]] =
      org.apache.spark.sql.Encoders.kryo[Option[T]]
    val out = ds.groupByKey(keyF)
      .flatMapGroupsWithState[Option[T], T](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[Option[T]]) =>
          var acc = state.getOption.flatten
          val emitted = rows.map { r =>
            acc = Some(acc.fold(r)(f(_, r)))
            acc.get
          }.toList
          state.update(acc)
          emitted.iterator
      }
    new DataStream(out)
  }

  /** Rolling sum/min/max conveniences (KeyedStream.java sum/min/max)
    * expressed through [[reduce]] with a numeric view. */
  def sumBy(num: (T, T) => T)(implicit tEnc: Encoder[T]): DataStream[T] =
    reduce(num)

  /** KeyedProcessFunction.java: per-key hook with persistent typed
    * state and an event-time timer. `f(key, newElements, priorState,
    * watermarkMs)` returns (state to keep, outputs, optional wake-up in
    * event-time ms — fires when the watermark passes it; `rows` is
    * empty on a timer wake-up). Batch runs each key once with the
    * watermark at +infinity, the closed-stream special case. */
  def process[S, U: Encoder](
      f: (K, Iterator[T], Option[S], Long) => (Option[S], Seq[U], Option[Long]))
      (implicit tEnc: Encoder[T]): DataStream[U] = {
    implicit val sEnc: Encoder[Option[S]] =
      org.apache.spark.sql.Encoders.kryo[Option[S]]
    val isStream = ds.isStreaming // hoisted: the closure must not capture ds
    val timeout =
      if (isStream) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = ds.groupByKey(keyF)
      .flatMapGroupsWithState[Option[S], U](
        OutputMode.Append(), timeout) {
        (key: K, rows: Iterator[T], state: GroupState[Option[S]]) =>
          val wm =
            if (isStream) state.getCurrentWatermarkMs()
            else Long.MaxValue
          val (next, outs, wake) = f(
            key,
            if (state.hasTimedOut) Iterator.empty else rows,
            state.getOption.flatten, wm)
          next match {
            case Some(_) =>
              state.update(next)
              wake.filter(_ > wm).foreach(state.setTimeoutTimestamp)
            case None => state.remove()
          }
          outs.iterator
      }
    new DataStream(out)
  }
}
