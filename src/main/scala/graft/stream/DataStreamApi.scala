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
  * Deliberate deltas (documented): no iterate() (removed upstream in
  * the reference's 2.x line; cyclic dataflow has no Catalyst analog —
  * ConnectedComponents covers the iterative-algorithm use case); no
  * processing-time window assigners (Spark SS is event-time-first —
  * ProcessingTimeSessionWindows etc. map to the event-time forms over
  * an ingestion timestamp).
  */
final class StreamExecutionEnvironment private (val spark: SparkSession) {
  def fromDataset[T](ds: Dataset[T]): DataStream[T] = new DataStream(ds)
  def fromElements[T: Encoder](xs: T*): DataStream[T] =
    new DataStream(spark.createDataset(xs))
  /** StreamExecutionEnvironment#fromCollection. */
  def fromCollection[T: Encoder](xs: Iterable[T]): DataStream[T] =
    new DataStream(spark.createDataset(xs.toSeq))
  /** StreamExecutionEnvironment#execute(jobName): in the reference this
    * submits the assembled dataflow; here every transform is a lazy
    * Dataset and ACTIONS run it (executeAndCollect / writeStream), so
    * execute is a compatibility no-op for ported program shapes. */
  def execute(jobName: String = ""): Unit = ()
  /** setParallelism: advisory — Spark sizes stages from
    * spark.sql.shuffle.partitions; recorded for API compatibility. */
  def setParallelism(n: Int): StreamExecutionEnvironment = this
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

  // Physical-partitioning verbs (DataStream.java rebalance/rescale/
  // shuffle/global/forward): each maps onto the Spark redistribution
  // with the same contract. `broadcast()` (replicate to every task) has
  // no Dataset analog — broadcastness is a JOIN-side property in Spark;
  // use graft.streaming.BroadcastRules for broadcast state.
  def rebalance(): DataStream[T] = new DataStream(ds.repartition())
  def shuffle(): DataStream[T] = new DataStream(ds.repartition())
  def rescale(): DataStream[T] = new DataStream(
    ds.coalesce(math.max(1,
      ds.sparkSession.sparkContext.defaultParallelism / 2)))
  def global(): DataStream[T] = new DataStream(ds.repartition(1))
  def forward(): DataStream[T] = this
  /** name/uid: operator metadata for checkpoint addressing in the
    * reference — accepted and ignored (Spark state keys by operator
    * position in the plan). */
  def name(n: String): DataStream[T] = this
  def uid(id: String): DataStream[T] = this
  def setParallelism(n: Int): DataStream[T] =
    new DataStream(ds.repartition(n))

  /** CoGroupedStreams.java: `a.coGroup(b).where(kA).equalTo(kB)
    * .window(assigner)(timeOfA, timeOfB).apply(f)` — per (key, window)
    * both sides' elements meet in one function call. Built like
    * [[KeyedStream.intervalJoin]] on an explicitly watermarked merged
    * input; windows close when the watermark passes their end. */
  def coGroup[U](other: DataStream[U]): CoGroupWhere[T, U] =
    new CoGroupWhere(ds, other.ds)

  /** DataStream.java:237 `connect`: pair this stream with another of a
    * DIFFERENT element type. Unkeyed co-transforms (`map(f1, f2)` /
    * `flatMap`) are per-element and translate to map-each-side + union;
    * `keyBy(k1, k2).process(...)` is the CoProcessFunction tier — one
    * keyed hook with SHARED state and timers seeing both inputs as
    * `Either` (Left = this stream, Right = other). Each input keeps its
    * own watermark; Spark takes the minimum across them, the
    * reference's two-input watermark rule. */
  def connect[U](other: DataStream[U]): ConnectedStreams[T, U] =
    new ConnectedStreams(ds, other.ds)

  /** WatermarkStrategy.forBoundedOutOfOrderness over an existing
    * TIMESTAMP field (DataStream.assignTimestampsAndWatermarks): the
    * watermark trails the max seen event time by `maxOutOfOrderness`
    * (a Spark interval string, e.g. "5 seconds"). */
  def assignTimestampsAndWatermarks(
      eventTimeField: String, maxOutOfOrderness: String): DataStream[T] =
    new DataStream(ds.withWatermark(eventTimeField, maxOutOfOrderness))

  /** FLIP-380 `fullWindowPartition`
    * (docs dev/datastream/operators/full_window_partition.md;
    * DataStream#fullWindowPartition → PartitionWindowedStream): collect
    * each subtask's records into one full window processed at end of
    * input — mapPartition / sortPartition / aggregate / reduce. Bounded
    * (batch) execution only, as in the reference. */
  def fullWindowPartition(): PartitionWindowedStream[T] = {
    require(!ds.isStreaming,
      "fullWindowPartition collects whole partitions at end of input — " +
        "bounded (batch) execution only, per the reference")
    new PartitionWindowedStream(ds)
  }

  def toDataset: Dataset[T] = ds
  def executeAndCollect(): Seq[T] = ds.collect().toSeq
}

/** PartitionWindowedStream (FLIP-380): each parallelism's records as
  * one full window, processed at end of input. Every operation is a
  * single per-partition pass — no shuffle. */
final class PartitionWindowedStream[T] private[stream] (ds: Dataset[T]) {

  /** MapPartitionFunction: the whole partition at once. */
  def mapPartition[U: Encoder](f: Seq[T] => IterableOnce[U]): DataStream[U] =
    new DataStream(ds.mapPartitions(it =>
      f(it.toSeq).iterator.to(Iterable).iterator))

  /** sortPartition(selector, order): partition-local sort — no
    * exchange (the reference's subtask-local contract). */
  def sortPartition[B](keyF: T => B, ascending: Boolean = true)(
      implicit ord: Ordering[B], tEnc: Encoder[T]): DataStream[T] = {
    val o = if (ascending) ord else ord.reverse
    new DataStream(ds.mapPartitions(it => it.toSeq.sortBy(keyF)(o).iterator))
  }

  /** AggregateFunction over the partition window: incremental add,
    * one result per partition. */
  def aggregate[ACC, U: Encoder](createAcc: () => ACC,
      add: (ACC, T) => ACC, getResult: ACC => U): DataStream[U] =
    new DataStream(ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator.single(getResult(it.foldLeft(createAcc())(add)))
    })

  /** ReduceFunction over the partition window: one reduced element per
    * non-empty partition. */
  def reduce(f: (T, T) => T)(implicit tEnc: Encoder[T]): DataStream[T] =
    new DataStream(ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty else Iterator.single(it.reduce(f))
    })
}

/** DataStreamUtils (dev/datastream/experimental.md): the
  * reinterpret-as-keyed escape hatch. */
object DataStreamUtils {
  /** `reinterpretAsKeyedStream(stream, keySelector)`: treat a stream
    * that is ALREADY partitioned by key as keyed without a new
    * shuffle. In graft the keyed view is (dataset, selector) — the
    * exchange decision belongs to Catalyst, which already elides it
    * when the child partitioning satisfies the required distribution
    * (e.g. after `repartition(col)` on the same key); this spelling
    * exists so ported programs keep their shape, with the same
    * caveat as the reference: data NOT actually partitioned by the
    * selector yields undefined window/state grouping. */
  def reinterpretAsKeyedStream[K: Encoder, T](
      stream: DataStream[T], keySelector: T => K): KeyedStream[K, T] =
    new KeyedStream(stream.ds, keySelector)
}

/** ConnectedStreams.java: the two-input surface of [[DataStream.connect]]. */
final class ConnectedStreams[A, B] private[stream] (
    private[stream] val a: Dataset[A], private[stream] val b: Dataset[B]) {

  /** CoMapFunction (ConnectedStreams#map): per-element, no shared
    * state — each side maps independently and the results interleave. */
  def map[U: Encoder](f1: A => U, f2: B => U): DataStream[U] =
    new DataStream(a.map(f1).union(b.map(f2)))

  /** CoFlatMapFunction (ConnectedStreams#flatMap). */
  def flatMap[U: Encoder](
      f1: A => IterableOnce[U], f2: B => IterableOnce[U]): DataStream[U] =
    new DataStream(a.flatMap(x => f1(x).iterator.to(Iterable))
      .union(b.flatMap(x => f2(x).iterator.to(Iterable))))

  /** Key both inputs to the SAME key space (ConnectedStreams#keyBy) —
    * the precondition for shared per-key state. */
  def keyBy[K: Encoder](k1: A => K, k2: B => K): ConnectedKeyedStreams[K, A, B] =
    new ConnectedKeyedStreams(a, b, k1, k2)
}

/** The CoProcessFunction tier (co-process over keyed connected
  * streams): one hook, shared keyed state, inputs tagged Left/Right. */
final class ConnectedKeyedStreams[K, A, B] private[stream] (
    a: Dataset[A], b: Dataset[B], k1: A => K, k2: B => K)(
    implicit kEnc: Encoder[K]) {

  /** CoProcessFunction.java: `f(key, taggedElements, priorState,
    * watermarkMs)` — same contract as [[KeyedStream.process]], with
    * elements arriving as Left (first input) / Right (second). */
  def process[S, U: Encoder](
      f: (K, Iterator[Either[A, B]], Option[S], Long)
        => (Option[S], Seq[U], Option[Long])): DataStream[U] = {
    implicit val eEnc: Encoder[Either[A, B]] =
      org.apache.spark.sql.Encoders.kryo[Either[A, B]]
    val kf1 = k1; val kf2 = k2 // hoisted: the closure must not capture this
    val u = a.map(x => Left(x): Either[A, B])
      .union(b.map(x => Right(x): Either[A, B]))
    new KeyedStream[K, Either[A, B]](u, _.fold(kf1, kf2)).process(f)
  }
}

/** One element of a side-output-bearing stream: `tag` "" is the main
  * output; OutputTag-named side outputs split off downstream (the
  * reference's ProcessFunction.Context#output). Documented delta: one
  * element TYPE per process call — heterogeneous tags encode into a
  * common type (the reference's OutputTag is per-type). */
final case class Tagged[U](tag: String, value: U)

/** The result of [[KeyedStream.processWithSideOutputs]]: split into the
  * main output and named side outputs. Each split is an independent
  * downstream branch; in streaming, sinking several branches re-runs
  * the stateful op per sink (standard Spark multi-sink behavior — use
  * foreachBatch to fan one run out when that matters). */
final class SideOutputStream[U] private[stream] (ds: Dataset[Tagged[U]])(
    implicit uEnc: Encoder[U]) {
  def mainOutput: DataStream[U] =
    new DataStream(ds.filter(_.tag.isEmpty).map(_.value))
  def getSideOutput(tag: String): DataStream[U] = {
    require(tag.nonEmpty, "side output tags are non-empty strings")
    new DataStream(ds.filter(_.tag == tag).map(_.value))
  }
  def all: DataStream[Tagged[U]] = new DataStream(ds)
}

/** KeyedStream.java: per-key stateful operations with unified
  * batch/stream execution. */
final class KeyedStream[K, T] private[stream] (
    private[stream] val ds: Dataset[T],
    private[stream] val keyF: T => K)(implicit kEnc: Encoder[K]) {

  /** Two keyed streams over the same key space → the CoProcess tier
    * (what [[IntervalJoined.process]] builds on). */
  private[stream] def connectKeyed[U](
      other: KeyedStream[K, U]): ConnectedKeyedStreams[K, T, U] =
    new ConnectedKeyedStreams(ds, other.ds, keyF, other.keyF)

  /** The input still carries a watermarked column (typed maps strip
    * the metadata) — the precondition for event-time timers. */
  private[stream] def watermarked: Boolean = ds.schema.fields
    .exists(_.metadata.contains("spark.watermarkDelayMs"))
  private[stream] def isStreamingInput: Boolean = ds.isStreaming

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

  /** KeyedStream#minBy / maxBy: the rolling element with the
    * smallest/largest extracted value so far — ties keep the FIRST
    * seen, the reference's default. One emission per input, like
    * [[reduce]]. */
  def minBy(f: T => Double)(implicit tEnc: Encoder[T]): DataStream[T] =
    reduce((a, b) => if (f(b) < f(a)) b else a)
  def maxBy(f: T => Double)(implicit tEnc: Encoder[T]): DataStream[T] =
    reduce((a, b) => if (f(b) > f(a)) b else a)

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
    // Event-time timers need the WATERMARKED COLUMN in this operator's
    // input (Spark tracks watermarks per attribute; a typed map strips
    // the metadata). Assign watermarks LAST — directly before keyBy —
    // and keep the timestamp field in the element type. Without it the
    // hook still runs, with no timers and the watermark pinned at 0.
    val wmPresent = ds.schema.fields
      .exists(_.metadata.contains("spark.watermarkDelayMs"))
    val timeout =
      if (isStream && wmPresent) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val out = ds.groupByKey(keyF)
      .flatMapGroupsWithState[Option[S], U](
        OutputMode.Append(), timeout) {
        (key: K, rows: Iterator[T], state: GroupState[Option[S]]) =>
          val wm =
            if (!isStream) Long.MaxValue
            else if (wmPresent) state.getCurrentWatermarkMs()
            else 0L
          val (next, outs, wake) = f(
            key,
            if (state.hasTimedOut) Iterator.empty else rows,
            state.getOption.flatten, wm)
          // Fail fast instead of never firing (ADVICE r11): a requested
          // wake-up on an unwatermarked streaming input would silently
          // vanish (no event-time timeout available), mirroring the
          // WindowedStream fail-fast for the same condition.
          if (isStream && !wmPresent && wake.nonEmpty)
            throw new IllegalStateException(
              "KeyedStream.process requested an event-time timer but the " +
                "streaming input carries no watermarked column — call " +
                "assignTimestampsAndWatermarks directly before keyBy and " +
                "keep the timestamp field in the element type")
          next match {
            case Some(_) =>
              state.update(next)
              if (isStream && wmPresent)
                wake.filter(_ > wm).foreach(state.setTimeoutTimestamp)
            case None => state.remove()
          }
          outs.iterator
      }
    new DataStream(out)
  }

  /** [[process]] with SIDE OUTPUTS (ProcessFunction.Context#output):
    * emitted elements carry an OutputTag name ("" = main); split the
    * result with [[SideOutputStream.mainOutput]] / `getSideOutput`. */
  def processWithSideOutputs[S, U: Encoder](
      f: (K, Iterator[T], Option[S], Long)
        => (Option[S], Seq[Tagged[U]], Option[Long]))
      (implicit tEnc: Encoder[T]): SideOutputStream[U] = {
    implicit val tgEnc: Encoder[Tagged[U]] =
      org.apache.spark.sql.Encoders.kryo[Tagged[U]]
    new SideOutputStream(process[S, Tagged[U]](f).ds)
  }

  /** KeyedStream.java:395 `intervalJoin`: pair elements of two keyed
    * streams whose event times sit within a bounded interval —
    * `left.intervalJoin(right).between(lo, hi)(timeOfL, timeOfR)
    * .process(join)` emits (l, r) when `timeOfR(r) - timeOfL(l)` is in
    * `[lo, hi]` ms and the keys match. Times come from extractor
    * functions (Spark Datasets carry no per-element timestamp
    * metadata — the reference reads the assigned timestamp).
    * Implementation: the reference's own IntervalJoinOperator
    * algorithm — both sides buffer in shared keyed state, each
    * arriving element joins the other side's buffer, and the watermark
    * prunes entries that can no longer pair. */
  def intervalJoin[U](other: KeyedStream[K, U]): IntervalJoin[K, T, U] =
    new IntervalJoin(this, other)

  /** KeyedStream.java:705 `countWindow(size)`: tumbling COUNT window —
    * every `size`-th element per key closes a window over the last
    * `size` elements (state: the partial buffer; no watermark needed,
    * count windows close on arrival). */
  def countWindow(size: Int)(implicit tEnc: Encoder[T])
      : CountWindowedStream[K, T] = {
    require(size >= 1, "countWindow needs size >= 1")
    new CountWindowedStream(this, size)
  }

  /** KeyedStream.java:676 `window(assigner)`: event-time windows on the
    * typed face. `timeOf` extracts the element's event time (ms).
    * Windows close when the watermark passes their end (streaming) or
    * at input end (batch) — the reference's event-time trigger. */
  def window(assigner: WindowAssigner)(timeOf: T => Long)
      (implicit tEnc: Encoder[T]): WindowedStream[K, T] =
    new WindowedStream(this, assigner, timeOf)

  /** Session windows on the typed face (assigners/EventTimeSessionWindows
    * .java, DynamicEventTimeSessionWindows.java): elements closer than
    * the gap merge into one session; a session closes when the
    * watermark passes its end (last element time + its gap). */
  def window(assigner: SessionWindowAssigner[T])(timeOf: T => Long)
      (implicit tEnc: Encoder[T]): SessionWindowedStream[K, T] =
    new SessionWindowedStream(this, assigner, timeOf)

  private[stream] def processHook[S, U: Encoder](
      f: (K, Iterator[T], Option[S], Long) => (Option[S], Seq[U], Option[Long]))
      (implicit tEnc: Encoder[T]): DataStream[U] = process(f)
}

/** Builder for [[KeyedStream.intervalJoin]]. `delay` is the watermark
  * out-of-orderness bound the join assigns on its merged input (the
  * reference infers it from the upstream assigners; Spark watermark
  * metadata does not survive typed transforms, so the join re-assigns
  * from the extracted element times). */
final class IntervalJoin[K, T, U] private[stream] (
    left: KeyedStream[K, T], right: KeyedStream[K, U]) {
  def between(lowerMs: Long, upperMs: Long, delay: String = "0 seconds")(
      timeOfL: T => Long, timeOfR: U => Long): IntervalJoined[K, T, U] = {
    require(lowerMs <= upperMs, "between(lo, hi) needs lo <= hi")
    new IntervalJoined(left, right, lowerMs, upperMs, delay,
      timeOfL, timeOfR)
  }
}

/** Java-serialization helpers for heterogeneous payload columns (the
  * facade's elements are Serializable JVM objects — tuples and case
  * classes; the hot operator tiers never pass through here). */
private[stream] object Ser {
  def ser(o: Any): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(o); oos.close()
    bos.toByteArray
  }
  def deser[T](b: Array[Byte]): T = {
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[T] finally ois.close()
  }
}

final class IntervalJoined[K, T, U] private[stream] (
    left: KeyedStream[K, T], right: KeyedStream[K, U],
    lowerMs: Long, upperMs: Long, delay: String,
    timeOfL: T => Long, timeOfR: U => Long) {

  /** ProcessJoinFunction: map each in-interval pair. Each pair emits
    * exactly once — when the later of its two elements arrives. The
    * merged input carries an explicit watermarked time column, so the
    * buffers prune by watermark exactly as the reference's
    * IntervalJoinOperator cleans up its map state. */
  def process[O: Encoder](f: (T, U) => O)(
      implicit tEnc: Encoder[T], uEnc: Encoder[U],
      kEnc: Encoder[K]): DataStream[O] = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_millis}
    val (lo, hi) = (lowerMs, upperMs)
    val (tl, tr) = (timeOfL, timeOfR)
    val (lk, rk) = (left.keyF, right.keyF)
    implicit val rowEnc: Encoder[(K, Long, Boolean, Array[Byte])] =
      org.apache.spark.sql.Encoders.tuple(kEnc,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaBoolean,
        org.apache.spark.sql.Encoders.BINARY)
    val la = left.ds.map(x => (lk(x), tl(x), true, Ser.ser(x)))
    val ra = right.ds.map(x => (rk(x), tr(x), false, Ser.ser(x)))
    var u = la.toDF("k", "tms", "isL", "payload")
      .union(ra.toDF("k", "tms", "isL", "payload"))
      .withColumn("ts", timestamp_millis(col("tms")))
    val isStream = u.isStreaming
    if (isStream) u = u.withWatermark("ts", delay)
    implicit val bufEnc
        : Encoder[Option[(List[(Long, Array[Byte])], List[(Long, Array[Byte])])]] =
      org.apache.spark.sql.Encoders
        .kryo[Option[(List[(Long, Array[Byte])], List[(Long, Array[Byte])])]]
    // key extraction re-derives K from the payload: reading the "k"
    // column via getAs[K] returns a Row for struct-encoded keys
    // (tuples, case classes) and only worked for primitives (review
    // r11)
    val out = u.groupByKey { r =>
        val e = Ser.deser[Any](r.getAs[Array[Byte]]("payload"))
        if (r.getAs[Boolean]("isL")) lk(e.asInstanceOf[T])
        else rk(e.asInstanceOf[U])
      }
      .flatMapGroupsWithState[
        Option[(List[(Long, Array[Byte])], List[(Long, Array[Byte])])], O](
        OutputMode.Append(),
        if (isStream) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout()) { (_, rows, state) =>
        val wm = if (isStream) state.getCurrentWatermarkMs() else Long.MaxValue
        var (ls, rs) = state.getOption.flatten.getOrElse(
          (List.empty[(Long, Array[Byte])], List.empty[(Long, Array[Byte])]))
        val out = scala.collection.mutable.ListBuffer.empty[O]
        rows.foreach { r =>
          val t = r.getAs[Long]("tms")
          val payload = r.getAs[Array[Byte]]("payload")
          if (r.getAs[Boolean]("isL")) {
            rs.foreach { case (tu, rb) =>
              if (tu - t >= lo && tu - t <= hi)
                out += f(Ser.deser[T](payload), Ser.deser[U](rb)) }
            ls = (t, payload) :: ls
          } else {
            ls.foreach { case (tt, lb) =>
              if (t - tt >= lo && t - tt <= hi)
                out += f(Ser.deser[T](lb), Ser.deser[U](payload)) }
            rs = (t, payload) :: rs
          }
        }
        // a left at tL pairs rights in [tL+lo, tL+hi]: dead once the
        // watermark passes tL+hi (symmetrically tR-lo for rights)
        if (wm != Long.MaxValue && wm > 0) {
          ls = ls.filter { case (t, _) => t + hi >= wm }
          rs = rs.filter { case (t, _) => t - lo >= wm }
        }
        if (wm == Long.MaxValue || (ls.isEmpty && rs.isEmpty))
          state.remove()
        else {
          state.update(Some((ls, rs)))
          // timer at the earliest prune deadline, so quiescent keys
          // still shed state on watermark passage (review r11 — the
          // reference's IntervalJoinOperator cleanup timers)
          if (isStream) {
            val wake = (ls.iterator.map(_._1 + hi) ++
              rs.iterator.map(_._1 - lo)).min + 1
            if (wake > wm) state.setTimeoutTimestamp(wake)
          }
        }
        out.iterator
      }
    new DataStream(out)
  }
}

/** CoGroupedStreams.java builder chain: where → equalTo → window →
  * apply. */
final class CoGroupWhere[A, B] private[stream] (
    a: Dataset[A], b: Dataset[B]) {
  def where[K: Encoder](kA: A => K): CoGroupEqual[K, A, B] =
    new CoGroupEqual(a, b, kA)
}
final class CoGroupEqual[K, A, B] private[stream] (
    a: Dataset[A], b: Dataset[B], kA: A => K)(implicit kEnc: Encoder[K]) {
  def equalTo(kB: B => K): CoGrouped[K, A, B] = new CoGrouped(a, b, kA, kB)
}
final class CoGrouped[K, A, B] private[stream] (
    a: Dataset[A], b: Dataset[B], kA: A => K, kB: B => K)(
    implicit kEnc: Encoder[K]) {

  /** Event-time windowed co-group. `delay` is the watermark
    * out-of-orderness bound on the merged input (see
    * [[IntervalJoin]]). */
  def window(assigner: WindowAssigner, delay: String = "0 seconds")(
      timeOfA: A => Long, timeOfB: B => Long): CoGroupWindowed[K, A, B] =
    new CoGroupWindowed(a, b, kA, kB, assigner, delay, timeOfA, timeOfB)
}
final class CoGroupWindowed[K, A, B] private[stream] (
    a: Dataset[A], b: Dataset[B], kA: A => K, kB: B => K,
    assigner: WindowAssigner, delay: String,
    timeOfA: A => Long, timeOfB: B => Long)(implicit kEnc: Encoder[K]) {

  /** CoGroupFunction: `f(key, windowStart, lefts, rights)` once per
    * closed (key, window) — either side may be empty, the co-group
    * contract (what makes outer joins expressible). Elements arrive in
    * event-time order. */
  def apply[O: Encoder](f: (K, Long, Seq[A], Seq[B]) => O): DataStream[O] = {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val (ka, kb, ta, tb, asg) = (kA, kB, timeOfA, timeOfB, assigner)
    implicit val rowEnc: Encoder[(K, Long, Boolean, Array[Byte])] =
      org.apache.spark.sql.Encoders.tuple(kEnc,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaBoolean,
        org.apache.spark.sql.Encoders.BINARY)
    val la = a.map(x => (ka(x), ta(x), true, Ser.ser(x)))
    val rb = b.map(x => (kb(x), tb(x), false, Ser.ser(x)))
    var u = la.toDF("k", "tms", "isL", "payload")
      .union(rb.toDF("k", "tms", "isL", "payload"))
      .withColumn("ts", timestamp_millis(col("tms")))
    val isStream = u.isStreaming
    if (isStream) u = u.withWatermark("ts", delay)
    // per (window, side): buffered (time, payload) lists
    type Buf = Map[Long, (List[(Long, Array[Byte])], List[(Long, Array[Byte])])]
    implicit val bufEnc: Encoder[Option[Buf]] =
      org.apache.spark.sql.Encoders.kryo[Option[Buf]]
    val out = u.groupByKey { r => // see IntervalJoined: payload-derived K
        val e = Ser.deser[Any](r.getAs[Array[Byte]]("payload"))
        if (r.getAs[Boolean]("isL")) ka(e.asInstanceOf[A])
        else kb(e.asInstanceOf[B])
      }
      .flatMapGroupsWithState[Option[Buf], O](
        OutputMode.Append(),
        if (isStream) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout()) { (key, rows, state) =>
        val wm = if (isStream) state.getCurrentWatermarkMs() else Long.MaxValue
        var buf: Buf = state.getOption.flatten.getOrElse(Map.empty)
        rows.foreach { r =>
          val t = r.getAs[Long]("tms")
          val payload = r.getAs[Array[Byte]]("payload")
          val isLeft = r.getAs[Boolean]("isL")
          asg.windowsOf(t).foreach { w =>
            val (ls, rs) = buf.getOrElse(w, (Nil, Nil))
            buf = buf.updated(w,
              if (isLeft) ((t, payload) :: ls, rs)
              else (ls, (t, payload) :: rs))
          }
        }
        val (closed, open) = buf.partition {
          case (w, _) => w + asg.sizeMs <= wm
        }
        val outs = closed.toSeq.sortBy(_._1).map { case (w, (ls, rs)) =>
          f(key, w,
            ls.reverse.sortBy(_._1).map(p => Ser.deser[A](p._2)),
            rs.reverse.sortBy(_._1).map(p => Ser.deser[B](p._2)))
        }
        if (open.isEmpty) state.remove()
        else {
          state.update(Some(open))
          if (isStream)
            open.keys.map(_ + asg.sizeMs).minOption
              .filter(_ > wm).foreach(state.setTimeoutTimestamp)
        }
        outs.iterator
      }
    new DataStream(out)
  }
}

/** Window assigners for the typed face (assigners/TumblingEventTimeWindows
  * .java, SlidingEventTimeWindows.java): map an event time to the
  * windows containing it. */
sealed trait WindowAssigner extends Serializable {
  /** Start times of every window containing time `t` (ms). */
  def windowsOf(t: Long): Seq[Long]
  def sizeMs: Long
}
final case class TumblingEventTimeWindows(sizeMs: Long)
    extends WindowAssigner {
  require(sizeMs > 0, "window size must be positive")
  def windowsOf(t: Long): Seq[Long] = Seq(t - math.floorMod(t, sizeMs))
}
final case class SlidingEventTimeWindows(sizeMs: Long, slideMs: Long)
    extends WindowAssigner {
  require(sizeMs > 0 && slideMs > 0 && sizeMs % slideMs == 0,
    "sliding window needs size a positive multiple of slide")
  def windowsOf(t: Long): Seq[Long] = {
    val last = t - math.floorMod(t, slideMs)
    (last - sizeMs + slideMs) to last by slideMs
  }
}

/** Event-time windowed keyed stream: per-(key, window) state closing
  * when the watermark passes the window end.
  *
  * Late-element contract (WindowedStream.java:127 `allowedLateness`,
  * :143 `sideOutputLateData`; WindowOperator's lateness rule): a window
  * FIRES when the watermark passes its end; elements arriving after
  * that but within `allowedLateness` of the end re-fire the window with
  * its updated contents (one more emitted row per late firing — the
  * reference's late-firing behavior in append mode); elements whose
  * every assigned window is past end + lateness DROP — or route to the
  * late side output when `sideOutputLateData()` is on. The lateness
  * path assigns its own watermark from `timeOf` (Spark forbids
  * redefining an upstream one), so the input must NOT be
  * pre-watermarked; pass the out-of-orderness bound to
  * `allowedLateness` instead.
  *
  * Trigger/evictor customization stays one tier down
  * (`graft.streaming.TriggeredWindows` covers the count / continuous /
  * delta trigger × evictor matrix) — documented delta of this face. */
final class WindowedStream[K, T] private[stream] (
    keyed: KeyedStream[K, T], assigner: WindowAssigner, timeOf: T => Long,
    latenessMs: Long = 0L, lateSide: Boolean = false,
    delayMs: Long = 0L)(
    implicit kEnc: Encoder[K], tEnc: Encoder[T]) {

  /** WindowedStream.java:127: keep fired windows alive for `ms` more
    * watermark time; in-lateness stragglers re-fire them.
    *
    * `outOfOrderness` is the watermark delay the LATENESS PATH assigns
    * itself (Spark forbids redefining an upstream watermark, so — like
    * the facade's intervalJoin/coGroup — this path derives its own
    * watermark from `timeOf` and requires the input NOT pre-watermarked). */
  def allowedLateness(ms: Long,
      outOfOrdernessMs: Long = 0L): WindowedStream[K, T] = {
    require(ms >= 0 && outOfOrdernessMs >= 0,
      "allowedLateness and outOfOrderness must be >= 0")
    new WindowedStream(keyed, assigner, timeOf, ms, lateSide,
      outOfOrdernessMs)
  }

  /** WindowedStream.java:143: route too-late elements (every assigned
    * window past end + lateness) to [[WindowOutput.lateOutput]] instead
    * of dropping them. Note the admission bound: elements older than
    * `outOfOrderness + lateness + windowSize` behind the max event time
    * never reach this operator (Spark's watermark filter) — for exact
    * unbounded late routing use `graft.streaming.LateData` one operator
    * earlier (documented delta). */
  def sideOutputLateData(): WindowedStream[K, T] =
    new WindowedStream(keyed, assigner, timeOf, latenessMs,
      lateSide = true, delayMs)

  private def checkWatermarked(): Unit =
    // fail fast (review r11): without the watermarked column the hook
    // would see watermark 0 forever and no window would EVER close —
    // a silently empty query is worse than an error
    require(!keyed.isStreamingInput || keyed.watermarked,
      "event-time windows on a stream need the watermarked column in " +
        "the element type — call assignTimestampsAndWatermarks directly " +
        "before keyBy and keep the timestamp field (typed maps strip " +
        "watermark metadata)")

  /** The full windows engine over generic per-window state: `init/add`
    * accumulate, `emit` renders a firing. Buffered `apply` and
    * incremental `aggregate` both ride it.
    *
    * Lateness plumbing: Spark's stateful operator drops rows older
    * than the CURRENT watermark before the hook ever sees them, so
    * in-lateness stragglers would never arrive. When lateness handling
    * is on, the operator re-assigns the watermark with an extra
    * `lateness + windowSize` delay (shifting Spark's admission down to
    * exactly the rows the reference's WindowOperator#isElementLate
    * still accepts — a row's latest window end exceeds its time by at
    * most windowSize) and reconstructs the TRUE watermark inside the
    * hook by adding the shift back. Firing and the late/drop rule then
    * evaluate against the true watermark — the reference's exact
    * semantics, at the cost of `shift` more retained input. */
  private def run[S, U: Encoder](init: S, add: (S, Long, T) => S,
      emit: (K, Long, S) => U): DataStream[Either[T, U]] = {
    val asg = assigner; val tf = timeOf
    val (late, sideOn) = (latenessMs, lateSide)
    val shift =
      if ((late > 0 || sideOn) && keyed.isStreamingInput)
        late + asg.sizeMs
      else 0L
    implicit val outEnc: Encoder[Either[T, U]] =
      org.apache.spark.sql.Encoders.kryo[Either[T, U]]
    // per window: (fired once already?, dirty since last firing?, state)
    type Buf = Map[Long, (Boolean, Boolean, S)]
    // one per-key batch step, watermark already in the TRUE domain;
    // wake deadline returned in the true domain too
    def step(key: K, elems: Iterator[(Long, T)], st: Option[Buf],
        fireWm: Long, ingestWm: Long)
        : (Option[Buf], Seq[Either[T, U]], Option[Long]) = {
      var buf = st.getOrElse(Map.empty: Buf)
      val lateOut = scala.collection.mutable.ListBuffer.empty[Either[T, U]]
      elems.foreach { case (t, r) =>
        val ws = asg.windowsOf(t)
        // the reference's drop rule: too late iff EVERY assigned window
        // is past end + lateness (WindowOperator#isElementLate)
        if (ws.forall(_ + asg.sizeMs + late <= ingestWm)) {
          if (sideOn) lateOut += Left(r)
        } else ws.foreach { w =>
          if (w + asg.sizeMs + late > ingestWm) {
            val (fired, _, s) = buf.getOrElse(w, (false, false, init))
            buf = buf.updated(w, (fired, true, add(s, t, r)))
          }
        }
      }
      // fire: unfired windows past their end, and fired windows that a
      // late element dirtied (still within lateness by construction)
      val out = buf.toSeq.sortBy(_._1).flatMap { case (w, (_, dirty, s)) =>
        if (w + asg.sizeMs <= fireWm && dirty) {
          buf = buf.updated(w, (true, false, s))
          Some(Right(emit(key, w, s)): Either[T, U])
        } else None
      }
      // retain while late elements can still arrive for the window
      val keep = buf.filter { case (w, _) => w + asg.sizeMs + late > fireWm }
      val wake = keep.flatMap { case (w, (fired, _, _)) =>
        (if (fired) None else Some(w + asg.sizeMs)) ++
          Some(w + asg.sizeMs + late)
      }.minOption
      (if (keep.isEmpty) None else Some(keep),
        lateOut.toList ++ out, wake)
    }
    if (shift == 0L) {
      // plain path: the upstream-assigned watermark drives everything
      checkWatermarked()
      keyed.processHook[Buf, Either[T, U]] { (key, rows, st, wm) =>
        // batch runs with wm = +inf: every window fires, NO row is
        // late (whole-input replay semantics)
        val ingestWm = if (wm == Long.MaxValue) Long.MinValue else wm
        step(key, rows.map(r => (tf(r), r)), st, wm, ingestWm)
      }
    } else {
      // lateness path: Spark forbids redefining an upstream watermark,
      // so this operator derives its OWN from timeOf — assigned with
      // `outOfOrderness + lateness + windowSize` of delay, making
      // Spark's late-row filter admit exactly the rows the reference's
      // WindowOperator still accepts (a row's latest window end is at
      // most windowSize past its time); the hook adds the shift back
      // to recover the true watermark, and the explicit isElementLate
      // rule above does the final drop/route.
      require(!keyed.watermarked,
        "allowedLateness/sideOutputLateData derive their own watermark " +
          "from timeOf — do not call assignTimestampsAndWatermarks " +
          "upstream; pass the out-of-orderness bound to allowedLateness")
      import org.apache.spark.sql.functions.{col, timestamp_millis}
      val kf = keyed.keyF
      implicit val rowEnc: Encoder[(Long, Array[Byte])] =
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY)
      implicit val bufEnc: Encoder[Option[Buf]] =
        org.apache.spark.sql.Encoders.kryo[Option[Buf]]
      import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
      val out = keyed.ds.map(x => (tf(x), Ser.ser(x)))
        .toDF("tms", "payload")
        .withColumn("ts", timestamp_millis(col("tms")))
        .withWatermark("ts", s"${delayMs + shift} milliseconds")
        .groupByKey(r => kf(Ser.deser[T](r.getAs[Array[Byte]]("payload"))))
        .flatMapGroupsWithState[Option[Buf], Either[T, U]](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (key, rows, state) =>
            val wmShifted = state.getCurrentWatermarkMs()
            val trueWm =
              if (wmShifted == 0L) 0L else wmShifted + shift
            val elems =
              if (state.hasTimedOut) Iterator.empty
              else rows.map { r =>
                val t = r.getAs[Long]("tms")
                (t, Ser.deser[T](r.getAs[Array[Byte]]("payload")))
              }
            val (next, outs, wake) = step(key, elems, state.getOption.flatten,
              trueWm, if (trueWm == 0L) Long.MinValue else trueWm)
            next match {
              case Some(_) =>
                state.update(next)
                // back to the shifted domain the timer compares in;
                // an open window's deadline stays > wmShifted because
                // end > trueWm ⇔ end - shift > wmShifted
                wake.map(_ - shift).filter(_ > wmShifted)
                  .foreach(state.setTimeoutTimestamp)
              case None => state.remove()
            }
            outs.iterator
        }
      new DataStream(out)
    }
  }

  private def split[U: Encoder](
      s: DataStream[Either[T, U]]): WindowOutput[T, U] =
    new WindowOutput(s.ds)

  /** WindowFunction: `f(key, windowStart, elements)` per firing
    * (elements in event-time order). */
  def apply[U: Encoder](f: (K, Long, Seq[T]) => U): DataStream[U] =
    applyWithLateOutput(f).mainOutput

  /** [[apply]] keeping the late side output ([[sideOutputLateData]]). */
  def applyWithLateOutput[U: Encoder](
      f: (K, Long, Seq[T]) => U): WindowOutput[T, U] =
    split(run[List[(Long, T)], U](Nil, (s, t, r) => (t, r) :: s,
      (k, w, s) => f(k, w, s.reverse.sortBy(_._1).map(_._2))))

  /** WindowedStream.java:310 `aggregate(AggregateFunction)`: INCREMENTAL
    * accumulation — per-(key, window) state is the accumulator alone,
    * not the element buffer (the reference's state-size contract; what
    * makes long windows over hot keys viable at scale). `add` applies
    * in arrival order. */
  def aggregate[ACC, U: Encoder](createAcc: () => ACC,
      add: (ACC, T) => ACC, getResult: ACC => U): DataStream[U] =
    split(run[Option[ACC], U](None,
      (s, _, r) => Some(add(s.getOrElse(createAcc()), r)),
      (_, _, s) => getResult(s.getOrElse(createAcc())))).mainOutput

  /** WindowedStream#reduce: the reduce of each window's elements, one
    * row per firing — incremental state like [[aggregate]]. */
  def reduce(f: (T, T) => T): DataStream[T] =
    aggregate[Option[T], T](() => None,
      (acc, r) => Some(acc.fold(r)(f(_, r))), _.get)(tEnc)
}

/** Result of a windowed apply with [[WindowedStream.sideOutputLateData]]
  * on: the window outputs plus the too-late elements (the reference's
  * OutputTag<T> late stream — heterogeneous types, so a split). */
final class WindowOutput[T, U] private[stream] (
    ds: Dataset[Either[T, U]])(
    implicit tEnc: Encoder[T], uEnc: Encoder[U]) {
  def mainOutput: DataStream[U] =
    new DataStream(ds.flatMap(_.toOption.iterator.to(Iterable)))
  def lateOutput: DataStream[T] =
    new DataStream(ds.flatMap(_.left.toOption.iterator.to(Iterable)))
}

/** Merging session assigners (WindowAssigner with merging semantics in
  * the reference — MergingWindowAssigner.java): each element seeds a
  * window `[t, t + gap)`; overlapping windows merge. `gapOf` is the
  * element's gap in ms (constant or extracted — the
  * SessionWindowTimeGapExtractor contract). */
sealed trait SessionWindowAssigner[-T] extends Serializable {
  def gapOf(e: T, t: Long): Long
}
/** EventTimeSessionWindows.java `withGap`: constant session gap. */
final case class EventTimeSessionWindows(gapMs: Long)
    extends SessionWindowAssigner[Any] {
  require(gapMs > 0, "session gap must be positive")
  def gapOf(e: Any, t: Long): Long = gapMs
}
object EventTimeSessionWindows {
  def withGap(gapMs: Long): EventTimeSessionWindows =
    EventTimeSessionWindows(gapMs)
}
/** DynamicEventTimeSessionWindows.java `withDynamicGap`: per-element
  * gap from the SessionWindowTimeGapExtractor. */
final case class DynamicEventTimeSessionWindows[T](extract: T => Long)
    extends SessionWindowAssigner[T] {
  def gapOf(e: T, t: Long): Long = {
    val g = extract(e)
    require(g > 0, s"dynamic session gap must be positive, got $g")
    g
  }
}
object DynamicEventTimeSessionWindows {
  def withDynamicGap[T](extract: T => Long)
      : DynamicEventTimeSessionWindows[T] =
    DynamicEventTimeSessionWindows(extract)
}

/** Session-windowed keyed stream: open-session elements buffer in keyed
  * state; each batch re-derives the session partition of the buffer
  * (sort + gap split — sessions are a function of the element times, so
  * merging needs no window bookkeeping), closes the ones the watermark
  * passed, and keeps the rest. */
final class SessionWindowedStream[K, T] private[stream] (
    keyed: KeyedStream[K, T], assigner: SessionWindowAssigner[T],
    timeOf: T => Long)(implicit kEnc: Encoder[K], tEnc: Encoder[T]) {

  /** `f(key, sessionStart, elements)` per closed session, elements in
    * event-time order; sessionStart is the first element's time. */
  def apply[U: Encoder](f: (K, Long, Seq[T]) => U): DataStream[U] = {
    require(!keyed.isStreamingInput || keyed.watermarked,
      "event-time session windows on a stream need the watermarked " +
        "column in the element type — call assignTimestampsAndWatermarks " +
        "directly before keyBy and keep the timestamp field")
    val asg = assigner; val tf = timeOf
    type Buf = List[(Long, T)]
    keyed.processHook[Buf, U] { (key, rows, st, wm) =>
      var buf = st.getOrElse(Nil)
      rows.foreach(r => buf = (tf(r), r) :: buf)
      // gap-split the time-sorted buffer: element t extends the current
      // session while t < its end; merged end = max(t_i + gap_i)
      var sessions = List.empty[(Long, Long, List[(Long, T)])] // (start, end, rev elems)
      buf.sortBy(_._1).foreach { case (t, e) =>
        val end = t + asg.gapOf(e, t)
        sessions match {
          case (s0, e0, es) :: rest if t < e0 =>
            sessions = (s0, math.max(e0, end), (t, e) :: es) :: rest
          case _ => sessions = (t, end, List((t, e))) :: sessions
        }
      }
      val (closed, open) = sessions.partition(_._2 <= wm)
      val out = closed.sortBy(_._1).map { case (s, _, es) =>
        f(key, s, es.reverse.map(_._2))
      }
      val keep = open.flatMap(_._3)
      val wake = open.map(_._2).minOption
      (if (keep.isEmpty) None else Some(keep), out, wake)
    }
  }

  /** WindowedStream#reduce over each closed session. */
  def reduce(f: (T, T) => T): DataStream[T] =
    apply[T]((_, _, elems) => elems.reduce(f))(tEnc)

  /** WindowedStream.java:376 `aggregate` with a MERGING assigner: the
    * reference requires the AggregateFunction's `merge` for session
    * windows — per-session state is the accumulator alone; bridging
    * elements merge neighbor sessions' accumulators (accumulators add
    * in arrival order, merge when sessions fuse — the reference's
    * merging-window-state contract). */
  def aggregate[ACC, U: Encoder](createAcc: () => ACC,
      add: (ACC, T) => ACC, getResult: ACC => U,
      merge: (ACC, ACC) => ACC): DataStream[U] = {
    require(!keyed.isStreamingInput || keyed.watermarked,
      "event-time session windows on a stream need the watermarked " +
        "column in the element type — call assignTimestampsAndWatermarks " +
        "directly before keyBy and keep the timestamp field")
    val asg = assigner; val tf = timeOf
    type Buf = List[(Long, Long, ACC)] // open sessions: (start, end, acc)
    keyed.processHook[Buf, U] { (key, rows, st, wm) =>
      var spans = st.getOrElse(Nil)
      rows.foreach { r =>
        val t = tf(r)
        spans = (t, t + asg.gapOf(r, t), add(createAcc(), r)) :: spans
      }
      // merge overlapping spans: [a, e1) fuses [b, e2) when b < e1
      var merged = List.empty[(Long, Long, ACC)]
      spans.sortBy(_._1).foreach { case (s, e, a) =>
        merged match {
          case (s0, e0, a0) :: rest if s < e0 =>
            merged = (s0, math.max(e0, e), merge(a0, a)) :: rest
          case _ => merged = (s, e, a) :: merged
        }
      }
      val (closed, open) = merged.partition(_._2 <= wm)
      val out = closed.sortBy(_._1).map { case (s, _, a) =>
        getResult(a)
      }
      val wake = open.map(_._2).minOption
      (if (open.isEmpty) None else Some(open), out, wake)
    }
  }
}

/** Tumbling count windows ([[KeyedStream.countWindow]]). */
final class CountWindowedStream[K, T] private[stream] (
    keyed: KeyedStream[K, T], size: Int)(
    implicit kEnc: Encoder[K], tEnc: Encoder[T]) {

  /** `f(key, elements)` per FULL window of `size` elements, in arrival
    * order; a trailing partial window never emits (the reference's
    * count-trigger contract). */
  def apply[U: Encoder](f: (K, Seq[T]) => U): DataStream[U] = {
    val n = size
    keyed.processHook[List[T], U] { (key, rows, st, _) =>
      var buf = st.getOrElse(Nil) // reversed arrival order
      val out = scala.collection.mutable.ListBuffer.empty[U]
      rows.foreach { r =>
        buf = r :: buf
        if (buf.length == n) { out += f(key, buf.reverse); buf = Nil }
      }
      (if (buf.isEmpty) None else Some(buf), out.toList, None)
    }
  }

  def reduce(f: (T, T) => T): DataStream[T] =
    apply[T]((_, elems) => elems.reduce(f))(tEnc)
}
