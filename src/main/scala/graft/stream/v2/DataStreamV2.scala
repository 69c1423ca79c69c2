package graft.stream.v2

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

import graft.stream.{DataStream => V1Stream, _}

/** The reference's DataStream API V2 (flink-datastream-api module;
  * docs/content/docs/dev/datastream-v2 pages) — the 2.x next-generation
  * surface built from three primitives: partitioned STREAMS
  * (Global / Keyed / NonKeyed / Broadcast —
  * stream/NonKeyedPartitionStream.java:34, KeyedPartitionStream.java,
  * GlobalStream.java, BroadcastStream.java), PARTITIONINGS
  * (keyBy / shuffle / global / broadcast), and PROCESS FUNCTIONS
  * (function/OneInputStreamProcessFunction.java:30,
  * TwoOutputStreamProcessFunction.java:30,
  * TwoInputNonBroadcastStreamProcessFunction.java,
  * TwoInputBroadcastStreamProcessFunction.java) applied through
  * `process` / `connectAndProcess` and configured through the
  * `ProcessConfigurable` handle (withName/withUid/withParallelism).
  *
  * Each V2 primitive delegates to the corresponding graft tier: keyed
  * processing rides [[graft.stream.KeyedStream.process]] (typed keyed
  * state + event-time timers over flatMapGroupsWithState), non-keyed
  * processing is a per-partition pass, two-output splits ride the
  * side-output machinery, the broadcast input rides a Spark broadcast
  * of the (bounded) broadcast side — the same contract as
  * `streaming.BroadcastRules`.
  *
  * Documented deltas: state is a name-keyed typed map rather than
  * declared State descriptors (context/StateManager.java — the
  * declaration model adds nothing once state lives in one checkpointed
  * value per key); processing-time timers and PROCESSING TimeType map
  * onto event time over ingestion timestamps (Spark SS is
  * event-time-first); watermark handling (`onWatermark`) is internal —
  * Spark propagates watermarks, the hook observes them via
  * [[EventTimeManager.currentTime]]. */
object Api {
  /** common/Collector.java. */
  trait Collector[T] { def collect(t: T): Unit }

  private[v2] final class BufCollector[T] extends Collector[T] {
    val buf = scala.collection.mutable.ListBuffer.empty[T]
    def collect(t: T): Unit = buf += t
  }

  /** context/StateManager.java — keyed state as a name-keyed typed
    * map (documented delta: no declaration step). Only partitioned
    * (keyed) processing has state, as in the reference. */
  final class StateManager private[v2] (
      private[v2] var m: Map[String, Any], keyedCtx: Boolean) {
    private def check(): Unit =
      if (!keyedCtx) throw new IllegalStateException(
        "state is only available on keyed (partitioned) streams — keyBy first")
    def getState[S](name: String): Option[S] =
      { check(); m.get(name).map(_.asInstanceOf[S]) }
    def update[S](name: String, v: S): Unit = { check(); m = m.updated(name, v) }
    def remove(name: String): Unit = { check(); m = m.removed(name) }
  }

  /** extension/eventtime/timer/EventTimeManager.java: event-time
    * timers on keyed streams; `currentTime` is the current watermark. */
  final class EventTimeManager private[v2] (
      private[v2] var wakes: List[Long], wm: Long, keyedCtx: Boolean) {
    def registerTimer(timestamp: Long): Unit = {
      if (!keyedCtx) throw new IllegalStateException(
        "event-time timers need a keyed stream — keyBy first")
      wakes = timestamp :: wakes
    }
    def currentTime: Long = wm
  }

  /** context/PartitionedContext.java (collapsed with RuntimeContext):
    * what `processRecord` sees. */
  final class PartitionedContext private[v2] (
      val stateManager: StateManager,
      val eventTimeManager: EventTimeManager)

  /** function/OneInputStreamProcessFunction.java:30. */
  trait OneInputStreamProcessFunction[IN, OUT] extends Serializable {
    def open(): Unit = ()
    def processRecord(record: IN, output: Collector[OUT],
        ctx: PartitionedContext): Unit
    /** end-of-input flush: per PARTITION on non-keyed streams, per KEY
      * on keyed ones (the reference's endInput). */
    def endInput(output: Collector[OUT], ctx: PartitionedContext): Unit = ()
    /** extension/eventtime/function/OneInputEventTimeStreamProcessFunction
      * .java `onEventTimer` — fires on keyed streams when the watermark
      * passes a registered timer. */
    def onEventTimer(timestamp: Long, output: Collector[OUT],
        ctx: PartitionedContext): Unit = ()
  }

  /** function/TwoOutputStreamProcessFunction.java:30. */
  trait TwoOutputStreamProcessFunction[IN, OUT1, OUT2] extends Serializable {
    def processRecord(record: IN, output1: Collector[OUT1],
        output2: Collector[OUT2], ctx: PartitionedContext): Unit
    def endInput(output1: Collector[OUT1], output2: Collector[OUT2],
        ctx: PartitionedContext): Unit = ()
  }

  /** function/TwoInputNonBroadcastStreamProcessFunction.java. */
  trait TwoInputNonBroadcastStreamProcessFunction[IN1, IN2, OUT]
      extends Serializable {
    def processRecordFromFirstInput(record: IN1, output: Collector[OUT],
        ctx: PartitionedContext): Unit
    def processRecordFromSecondInput(record: IN2, output: Collector[OUT],
        ctx: PartitionedContext): Unit
    def endInput(output: Collector[OUT], ctx: PartitionedContext): Unit = ()
  }

  /** function/TwoInputBroadcastStreamProcessFunction.java — the
    * broadcast input is seen IN FULL by every partition before the
    * non-broadcast records (bounded broadcast side, the
    * BroadcastRules contract). */
  trait TwoInputBroadcastStreamProcessFunction[IN1, IN2, OUT]
      extends Serializable {
    def processRecordFromBroadcastInput(record: IN2,
        ctx: PartitionedContext): Unit
    def processRecordFromNonBroadcastInput(record: IN1,
        output: Collector[OUT], ctx: PartitionedContext): Unit
    def endInput(output: Collector[OUT], ctx: PartitionedContext): Unit = ()
  }
}

import Api._

/** stream/ProcessConfigurable.java: the post-process configuration
  * handle every `process` returns. */
trait ProcessConfigurable[Self] { self: Self =>
  def withName(n: String): Self = self
  def withUid(uid: String): Self = self
  /** advisory in graft (Spark sizes stages from shuffle partitions);
    * honored where a direct repartition expresses it. */
  def withParallelism(n: Int): Self = self
  def withMaxParallelism(n: Int): Self = self
}

/** ExecutionEnvironment.java (V2): the entry point. */
final class ExecutionEnvironment private (val spark: SparkSession) {
  def fromDataset[T](ds: Dataset[T]): NonKeyedPartitionStream[T] =
    new NonKeyedPartitionStream(ds)
  def fromCollection[T: Encoder](xs: Iterable[T]): NonKeyedPartitionStream[T] =
    new NonKeyedPartitionStream(spark.createDataset(xs.toSeq))
  /** lazy Datasets execute at their actions — compatibility no-op. */
  def execute(jobName: String = ""): Unit = ()
}
object ExecutionEnvironment {
  def getExecutionEnvironment(spark: SparkSession): ExecutionEnvironment =
    new ExecutionEnvironment(spark)
}

/** A sink for `toSink` (stream/NonKeyedPartitionStream.java:104) —
  * wraps any Dataset-consuming action. */
trait Sink[T] extends Serializable { def write(ds: Dataset[T]): Unit }
object Sinks {
  /** The noop sink (connectors/table/blackhole.md): materialize and
    * discard — the benchmarking/testing sink. */
  def blackhole[T]: Sink[T] = ds =>
    ds.toDF().write.format("noop").mode("overwrite").save()
  def collect[T](into: scala.collection.mutable.Buffer[T]): Sink[T] =
    ds => into ++= ds.collect()
}

/** One-input per-partition execution shared by the non-keyed tiers. */
private[v2] object Run {
  def oneInputPartition[IN, OUT: Encoder](ds: Dataset[IN],
      f: OneInputStreamProcessFunction[IN, OUT]): Dataset[OUT] =
    ds.mapPartitions { it =>
      f.open()
      val sm = new StateManager(Map.empty, keyedCtx = false)
      val etm = new EventTimeManager(Nil, 0L, keyedCtx = false)
      val ctx = new PartitionedContext(sm, etm)
      val out = new BufCollector[OUT]
      it.foreach(r => f.processRecord(r, out, ctx))
      f.endInput(out, ctx)
      out.buf.iterator
    }
}

/** stream/NonKeyedPartitionStream.java:34. */
final class NonKeyedPartitionStream[T](val ds: Dataset[T])
    extends ProcessConfigurable[NonKeyedPartitionStream[T]] {

  /** :41 one-input process — per-partition, stateless (state needs a
    * keyed stream, as in the reference). */
  def process[OUT: Encoder](
      f: OneInputStreamProcessFunction[T, OUT]): NonKeyedPartitionStream[OUT] =
    new NonKeyedPartitionStream(Run.oneInputPartition(ds, f))

  /** :50 two-output process: one pass, two result streams
    * (ProcessConfigurableAndTwoNonKeyedPartitionStream — getFirst /
    * getSecond). */
  def process[OUT1: Encoder, OUT2: Encoder](
      f: TwoOutputStreamProcessFunction[T, OUT1, OUT2])
      : TwoNonKeyedPartitionStreams[OUT1, OUT2] = {
    implicit val eitherEnc: Encoder[Either[OUT1, OUT2]] =
      org.apache.spark.sql.Encoders.kryo[Either[OUT1, OUT2]]
    val tagged = ds.mapPartitions { it =>
      val ctx = new PartitionedContext(
        new StateManager(Map.empty, keyedCtx = false),
        new EventTimeManager(Nil, 0L, keyedCtx = false))
      val o1 = new BufCollector[OUT1]; val o2 = new BufCollector[OUT2]
      it.foreach(r => f.processRecord(r, o1, o2, ctx))
      f.endInput(o1, o2, ctx)
      o1.buf.iterator.map(Left(_): Either[OUT1, OUT2]) ++
        o2.buf.iterator.map(Right(_): Either[OUT1, OUT2])
    }
    new TwoNonKeyedPartitionStreams(tagged)
  }

  /** :60 connectAndProcess with another non-keyed stream: per-record,
    * no shared state (that tier lives on keyed streams). */
  def connectAndProcess[T2, OUT: Encoder](other: NonKeyedPartitionStream[T2],
      f: TwoInputNonBroadcastStreamProcessFunction[T, T2, OUT])
      : NonKeyedPartitionStream[OUT] = {
    val first = Run.oneInputPartition[T, OUT](ds,
      new OneInputStreamProcessFunction[T, OUT] {
        def processRecord(r: T, out: Collector[OUT],
            ctx: PartitionedContext): Unit =
          f.processRecordFromFirstInput(r, out, ctx)
      })
    val second = Run.oneInputPartition[T2, OUT](other.ds,
      new OneInputStreamProcessFunction[T2, OUT] {
        def processRecord(r: T2, out: Collector[OUT],
            ctx: PartitionedContext): Unit =
          f.processRecordFromSecondInput(r, out, ctx)
      })
    new NonKeyedPartitionStream(first.union(second))
  }

  /** :70 connectAndProcess with a BROADCAST stream: every partition
    * sees the whole broadcast input first (bounded side — collected
    * through a Spark broadcast, the BroadcastRules contract). */
  def connectAndProcess[T2, OUT: Encoder](broadcast: BroadcastStream[T2],
      f: TwoInputBroadcastStreamProcessFunction[T, T2, OUT])
      : NonKeyedPartitionStream[OUT] = {
    require(!broadcast.ds.isStreaming,
      "the broadcast input must be bounded here (it replicates via a " +
        "Spark broadcast); for a LIVE broadcast-rules stream use " +
        "graft.streaming.BroadcastRules")
    val b = ds.sparkSession.sparkContext.broadcast(
      broadcast.ds.collect().toSeq)
    new NonKeyedPartitionStream(ds.mapPartitions { it =>
      val ctx = new PartitionedContext(
        new StateManager(Map.empty, keyedCtx = false),
        new EventTimeManager(Nil, 0L, keyedCtx = false))
      val out = new BufCollector[OUT]
      b.value.foreach(r => f.processRecordFromBroadcastInput(r, ctx))
      it.foreach(r => f.processRecordFromNonBroadcastInput(r, out, ctx))
      f.endInput(out, ctx)
      out.buf.iterator
    })
  }

  /** :87 keyBy partitioning → KeyedPartitionStream. */
  def keyBy[K: Encoder](keySelector: T => K): KeyedPartitionStream[K, T] =
    new KeyedPartitionStream(new KeyedStream(ds, keySelector))
  /** :95 shuffle partitioning. */
  def shuffle(): NonKeyedPartitionStream[T] =
    new NonKeyedPartitionStream(ds.repartition())
  /** :79 global partitioning → single-partition GlobalStream. */
  def global(): GlobalStream[T] = new GlobalStream(ds.repartition(1))
  /** :102 broadcast partitioning. */
  def broadcast(): BroadcastStream[T] = new BroadcastStream(ds)
  /** :104 toSink. */
  def toSink(sink: Sink[T]): NonKeyedPartitionStream[T] = {
    sink.write(ds); this
  }
  def toDataset: Dataset[T] = ds
  def toV1: V1Stream[T] = new V1Stream(ds)
}

/** ProcessConfigurableAndTwoNonKeyedPartitionStream
  * (NonKeyedPartitionStream.java:117). */
final class TwoNonKeyedPartitionStreams[OUT1, OUT2] private[v2] (
    tagged: Dataset[Either[OUT1, OUT2]])(
    implicit e1: Encoder[OUT1], e2: Encoder[OUT2])
    extends ProcessConfigurable[TwoNonKeyedPartitionStreams[OUT1, OUT2]] {
  def getFirst: NonKeyedPartitionStream[OUT1] =
    new NonKeyedPartitionStream(
      tagged.flatMap(_.left.toOption.iterator.to(Iterable)))
  def getSecond: NonKeyedPartitionStream[OUT2] =
    new NonKeyedPartitionStream(
      tagged.flatMap(_.toOption.iterator.to(Iterable)))
}

/** stream/GlobalStream.java: the single-partition stream — same
  * one-input processing, forced parallelism 1. */
final class GlobalStream[T](val ds: Dataset[T])
    extends ProcessConfigurable[GlobalStream[T]] {
  def process[OUT: Encoder](
      f: OneInputStreamProcessFunction[T, OUT]): GlobalStream[OUT] =
    new GlobalStream(Run.oneInputPartition(ds, f))
  def toSink(sink: Sink[T]): GlobalStream[T] = { sink.write(ds); this }
  def toDataset: Dataset[T] = ds
}

/** stream/BroadcastStream.java: only meaningful as the broadcast input
  * of a connectAndProcess (building_blocks.md: "broadcast can only be
  * used in conjunction with other inputs"). */
final class BroadcastStream[T] private[v2] (private[v2] val ds: Dataset[T])

/** stream/KeyedPartitionStream.java: the stateful tier. */
final class KeyedPartitionStream[K, T] private[v2] (
    private[v2] val keyed: KeyedStream[K, T])(
    implicit kEnc: Encoder[K]) extends ProcessConfigurable[KeyedPartitionStream[K, T]] {

  /** :65 one-input keyed process: per-key typed state + event-time
    * timers, batch/stream unified — each record runs through
    * `processRecord` with the name-keyed StateManager; registered
    * timers fire `onEventTimer` when the watermark passes (streaming;
    * batch flushes through `endInput` at watermark +inf). */
  def process[OUT: Encoder](f: OneInputStreamProcessFunction[T, OUT])
      (implicit tEnc: Encoder[T]): NonKeyedPartitionStream[OUT] = {
    val out = keyed.process[Map[String, Any], OUT] { (_, rows, st, wm) =>
      val sm = new StateManager(st.getOrElse(Map.empty), keyedCtx = true)
      val etm = new EventTimeManager(Nil, wm, keyedCtx = true)
      val ctx = new PartitionedContext(sm, etm)
      val col = new BufCollector[OUT]
      var any = false
      rows.foreach { r => any = true; f.processRecord(r, col, ctx) }
      if (!any) f.onEventTimer(wm, col, ctx) // timer wake-up
      if (wm == Long.MaxValue) f.endInput(col, ctx) // batch end-of-input
      val wake = etm.wakes.filter(_ > wm).minOption
      (if (sm.m.isEmpty && wake.isEmpty) None else Some(sm.m),
        col.buf.toList, wake)
    }
    new NonKeyedPartitionStream(out.ds)
  }

  /** KeyedPartitionStream.java `connectAndProcess` with another keyed
    * stream over the SAME key space: one hook, SHARED per-key state,
    * both inputs' records routed to their respective methods. */
  def connectAndProcess[T2, OUT: Encoder](other: KeyedPartitionStream[K, T2],
      f: TwoInputNonBroadcastStreamProcessFunction[T, T2, OUT])
      (implicit tEnc: Encoder[T], t2Enc: Encoder[T2]): NonKeyedPartitionStream[OUT] = {
    val out = keyed.connectKeyed(other.keyed)
      .process[Map[String, Any], OUT] { (_, rows, st, wm) =>
        val sm = new StateManager(st.getOrElse(Map.empty), keyedCtx = true)
        val ctx = new PartitionedContext(sm,
          new EventTimeManager(Nil, wm, keyedCtx = true))
        val col = new BufCollector[OUT]
        rows.foreach {
          case Left(a) => f.processRecordFromFirstInput(a, col, ctx)
          case Right(b) => f.processRecordFromSecondInput(b, col, ctx)
        }
        if (wm == Long.MaxValue) f.endInput(col, ctx)
        (if (sm.m.isEmpty) None else Some(sm.m), col.buf.toList, None)
      }
    new NonKeyedPartitionStream(out.ds)
  }

  /** Keyed + broadcast connectAndProcess (the partitioning matrix's
    * Keyed × Broadcast → Keyed/NonKeyed row). */
  def connectAndProcess[T2, OUT: Encoder](broadcast: BroadcastStream[T2],
      f: TwoInputBroadcastStreamProcessFunction[T, T2, OUT])
      (implicit tEnc: Encoder[T]): NonKeyedPartitionStream[OUT] = {
    require(!broadcast.ds.isStreaming,
      "the broadcast input must be bounded here (it replicates via a " +
        "Spark broadcast); for a LIVE broadcast-rules stream use " +
        "graft.streaming.BroadcastRules")
    val b = keyed.ds.sparkSession.sparkContext
      .broadcast(broadcast.ds.collect().toSeq)
    // Replay completion is marked with an explicit sentinel state entry,
    // NOT inferred from state emptiness: a process function that stores
    // no user state would otherwise look like a first visit on every
    // micro-batch and receive the broadcast side again (ADVICE r12).
    val ReplayedKey = "__graft.broadcast.replayed__"
    val out = keyed.process[Map[String, Any], OUT] { (_, rows, st, wm) =>
      val prior = st.getOrElse(Map.empty)
      val replayed = prior.contains(ReplayedKey)
      val sm = new StateManager(prior - ReplayedKey, keyedCtx = true)
      val ctx = new PartitionedContext(sm,
        new EventTimeManager(Nil, wm, keyedCtx = true))
      val col = new BufCollector[OUT]
      if (!replayed) // first visit of this key: replay the broadcast side
        b.value.foreach(r => f.processRecordFromBroadcastInput(r, ctx))
      rows.foreach(r => f.processRecordFromNonBroadcastInput(r, col, ctx))
      if (wm == Long.MaxValue) f.endInput(col, ctx)
      (Some(sm.m + (ReplayedKey -> true)), col.buf.toList, None)
    }
    new NonKeyedPartitionStream(out.ds)
  }

  def keyBy[K2: Encoder](keySelector: T => K2): KeyedPartitionStream[K2, T] =
    new KeyedPartitionStream(new KeyedStream(keyed.ds, keySelector))
  def shuffle(): NonKeyedPartitionStream[T] =
    new NonKeyedPartitionStream(keyed.ds.repartition())
  def global(): GlobalStream[T] = new GlobalStream(keyed.ds.repartition(1))
  def toSink(sink: Sink[T]): KeyedPartitionStream[K, T] = {
    sink.write(keyed.ds); this
  }
  def toDataset: Dataset[T] = keyed.ds
}

/** extension/eventtime/EventTimeExtension.java: declare event time +
  * watermarks on a V2 stream (maps onto the V1 face's
  * assignTimestampsAndWatermarks — Spark carries the watermark in the
  * column metadata; keep the timestamp field in the element type). */
object EventTimeExtension {
  def withEventTime[T](stream: NonKeyedPartitionStream[T],
      eventTimeField: String, maxOutOfOrderness: String)
      : NonKeyedPartitionStream[T] =
    new NonKeyedPartitionStream(
      stream.ds.withWatermark(eventTimeField, maxOutOfOrderness))
}

/** builtin/BuiltinFuncs.java: the window and join extensions. */
object BuiltinFuncs {

  /** extension/window/strategy/WindowStrategy.java factories (EVENT
    * time; PROCESSING maps to event time over ingestion timestamps —
    * documented delta). */
  sealed trait WindowStrategy extends Serializable
  final case class TumblingWindow(sizeMs: Long) extends WindowStrategy
  final case class SlidingWindow(sizeMs: Long, slideMs: Long)
      extends WindowStrategy
  final case class SessionWindow(gapMs: Long) extends WindowStrategy
  def tumbling(sizeMs: Long): WindowStrategy = TumblingWindow(sizeMs)
  def sliding(sizeMs: Long, slideMs: Long): WindowStrategy =
    SlidingWindow(sizeMs, slideMs)
  def session(gapMs: Long): WindowStrategy = SessionWindow(gapMs)

  /** BuiltinFuncs.java:152 `window`: apply a window strategy + window
    * process function to a keyed stream. `onTrigger(key, windowStart,
    * records, output)` runs once per closed window over its buffered
    * records (extension/window/function/OneInputWindowStreamProcessFunction
    * .java onTrigger + OneInputWindowContext.getAllRecords). */
  def window[K, T, OUT: Encoder](stream: KeyedPartitionStream[K, T],
      strategy: WindowStrategy, timeOf: T => Long)(
      onTrigger: (K, Long, Seq[T], Collector[OUT]) => Unit)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T])
      : NonKeyedPartitionStream[OUT] = {
    def emit(k: K, w: Long, es: Seq[T]): Seq[OUT] = {
      val col = new BufCollector[OUT]
      onTrigger(k, w, es, col)
      col.buf.toList
    }
    implicit val seqEnc: Encoder[Seq[OUT]] =
      org.apache.spark.sql.Encoders.kryo[Seq[OUT]]
    val keyed = stream.keyed
    val burst: V1Stream[Seq[OUT]] = strategy match {
      case TumblingWindow(s) =>
        new WindowedStream(keyed, TumblingEventTimeWindows(s), timeOf)
          .apply[Seq[OUT]](emit)
      case SlidingWindow(s, sl) =>
        new WindowedStream(keyed, SlidingEventTimeWindows(s, sl), timeOf)
          .apply[Seq[OUT]](emit)
      case SessionWindow(g) =>
        new SessionWindowedStream(keyed, EventTimeSessionWindows(g), timeOf)
          .apply[Seq[OUT]](emit)
    }
    new NonKeyedPartitionStream(
      burst.ds.flatMap(identity(_)))
  }

  /** BuiltinFuncs.java:176 two-input window
    * (TwoInputNonBroadcastWindowStreamProcessFunction +
    * TwoInputWindowContext): per (key, window) BOTH keyed inputs'
    * records meet in one onTrigger call — either side possibly empty
    * (the co-group contract underneath). Tumbling/sliding event-time
    * strategies (session merging is one-input in the reference's
    * context model too). */
  def window2[K, T1, T2, OUT: Encoder](left: KeyedPartitionStream[K, T1],
      right: KeyedPartitionStream[K, T2], strategy: WindowStrategy,
      timeOf1: T1 => Long, timeOf2: T2 => Long)(
      onTrigger: (K, Long, Seq[T1], Seq[T2], Collector[OUT]) => Unit)(
      implicit kEnc: Encoder[K]): NonKeyedPartitionStream[OUT] = {
    val assigner = strategy match {
      case TumblingWindow(s) => TumblingEventTimeWindows(s)
      case SlidingWindow(s, sl) => SlidingEventTimeWindows(s, sl)
      case SessionWindow(_) => throw new IllegalArgumentException(
        "two-input windows support tumbling/sliding strategies; session " +
          "windows are one-input (the reference's window-context model)")
    }
    implicit val seqEnc: Encoder[Seq[OUT]] =
      org.apache.spark.sql.Encoders.kryo[Seq[OUT]]
    val burst = new CoGroupWhere[T1, T2](left.keyed.ds, right.keyed.ds)
      .where(left.keyed.keyF).equalTo(right.keyed.keyF)
      .window(assigner)(timeOf1, timeOf2)
      .apply[Seq[OUT]] { (k, w, ls, rs) =>
        val col = new BufCollector[OUT]
        onTrigger(k, w, ls, rs, col)
        col.buf.toList
      }
    new NonKeyedPartitionStream(burst.ds.flatMap(identity(_)))
  }

  /** BuiltinFuncs.java:193 two-output window
    * (TwoOutputWindowStreamProcessFunction): one windowed pass, two
    * result streams. */
  def windowTwoOutput[K, T, O1: Encoder, O2: Encoder](
      stream: KeyedPartitionStream[K, T], strategy: WindowStrategy,
      timeOf: T => Long)(
      onTrigger: (K, Long, Seq[T], Collector[O1], Collector[O2]) => Unit)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T])
      : TwoNonKeyedPartitionStreams[O1, O2] = {
    implicit val outEnc: Encoder[Seq[Either[O1, O2]]] =
      org.apache.spark.sql.Encoders.kryo[Seq[Either[O1, O2]]]
    implicit val eitherEnc: Encoder[Either[O1, O2]] =
      org.apache.spark.sql.Encoders.kryo[Either[O1, O2]]
    def emit(k: K, w: Long, es: Seq[T]): Seq[Either[O1, O2]] = {
      val c1 = new BufCollector[O1]; val c2 = new BufCollector[O2]
      onTrigger(k, w, es, c1, c2)
      c1.buf.toList.map(Left(_): Either[O1, O2]) ++
        c2.buf.toList.map(Right(_): Either[O1, O2])
    }
    val keyed = stream.keyed
    val burst = strategy match {
      case TumblingWindow(s) =>
        new WindowedStream(keyed, TumblingEventTimeWindows(s), timeOf)
          .apply[Seq[Either[O1, O2]]](emit)
      case SlidingWindow(s, sl) =>
        new WindowedStream(keyed, SlidingEventTimeWindows(s, sl), timeOf)
          .apply[Seq[Either[O1, O2]]](emit)
      case SessionWindow(g) =>
        new SessionWindowedStream(keyed, EventTimeSessionWindows(g), timeOf)
          .apply[Seq[Either[O1, O2]]](emit)
    }
    new TwoNonKeyedPartitionStreams(burst.ds.flatMap(identity(_)))
  }

  /** BuiltinFuncs.java:56 `join` (extension/join/JoinType.java — the
    * reference currently ships INNER only): per matching key, every
    * (left, right) pair runs through the JoinFunction
    * (extension/join/JoinFunction.java:41). Both sides buffer in
    * shared keyed state; emission at end of input (batch) / watermark
    * close (the reference's join semantics over bounded keyed
    * streams). */
  def join[K, T1, T2, OUT: Encoder](left: KeyedPartitionStream[K, T1],
      right: KeyedPartitionStream[K, T2])(
      f: (T1, T2, Collector[OUT]) => Unit)(
      implicit kEnc: Encoder[K], t1Enc: Encoder[T1], t2Enc: Encoder[T2])
      : NonKeyedPartitionStream[OUT] =
    left.connectAndProcess(right,
      new TwoInputNonBroadcastStreamProcessFunction[T1, T2, OUT] {
        private def lefts(ctx: PartitionedContext): List[T1] =
          ctx.stateManager.getState[List[T1]]("__join_l").getOrElse(Nil)
        private def rights(ctx: PartitionedContext): List[T2] =
          ctx.stateManager.getState[List[T2]]("__join_r").getOrElse(Nil)
        def processRecordFromFirstInput(r: T1, out: Collector[OUT],
            ctx: PartitionedContext): Unit =
          ctx.stateManager.update("__join_l", r :: lefts(ctx))
        def processRecordFromSecondInput(r: T2, out: Collector[OUT],
            ctx: PartitionedContext): Unit =
          ctx.stateManager.update("__join_r", r :: rights(ctx))
        override def endInput(out: Collector[OUT],
            ctx: PartitionedContext): Unit =
          for (l <- lefts(ctx).reverse; r <- rights(ctx).reverse)
            f(l, r, out)
      })
}
