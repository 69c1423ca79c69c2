package graft.streaming

import graft.operators.SecondarySort
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Fire policy for [[TriggeredWindows]] — the reference's `Trigger` tier
  * (flink-runtime/…/streaming/api/windowing/triggers/Trigger.java,
  * EventTimeTrigger.java, CountTrigger.java,
  * ContinuousEventTimeTrigger.java). Every policy ALSO fires a final pass
  * when the window closes (the composite most reference pipelines run);
  * early fires carry `is_final = false`.
  */
sealed trait WindowTrigger extends Serializable
object WindowTrigger {

  /** Fire only at window close (the reference's default EventTimeTrigger). */
  case object OnClose extends WindowTrigger

  /** Additionally fire after every `n`-th element of the window
    * (CountTrigger.java composed with the event-time close). */
  final case class CountEvery(n: Long) extends WindowTrigger {
    require(n > 0, "CountEvery needs n > 0")
  }

  /** Additionally fire when event time crosses an `intervalUs`-aligned
    * boundary inside the window (ContinuousEventTimeTrigger.java): the fire
    * covers everything accumulated BEFORE the boundary-crossing element.
    * Early fires are element-driven, so a boundary with no later element
    * inside the window folds into the close fire.
    */
  final case class ContinuousEventTime(intervalUs: Long) extends WindowTrigger {
    require(intervalUs > 0, "ContinuousEventTime needs intervalUs > 0")
  }

  /** Additionally fire when the value moves more than `threshold` away
    * from the value at the LAST fire (DeltaTrigger.java with the absolute
    * delta function; the reference seeds the comparison point with the
    * first element and replaces it at each fire). The firing element is
    * included in the fired contents, as Trigger.onElement runs after the
    * element is added. */
  final case class DeltaOver(threshold: Long) extends WindowTrigger {
    require(threshold > 0, "DeltaOver needs threshold > 0")
  }
}

/** Pre-aggregation element filter applied at every fire — the reference's
  * `Evictor` tier (…/windowing/evictors/Evictor.java, CountEvictor.java,
  * TimeEvictor.java). An evictor forces the operator to keep raw elements
  * instead of a running accumulator — the reference documents the same
  * cost (WindowOperator falls back from AggregatingState to ListState).
  */
sealed trait WindowEvictor extends Serializable
object WindowEvictor {

  /** No eviction: O(1) accumulator state per open window. */
  case object KeepAll extends WindowEvictor

  /** Aggregate only the last `n` elements by event time
    * (CountEvictor.java). */
  final case class CountLast(n: Int) extends WindowEvictor {
    require(n > 0, "CountLast needs n > 0")
  }

  /** Aggregate only elements within `deltaUs` of the window's max event
    * time seen so far (TimeEvictor.java). */
  final case class TimeLast(deltaUs: Long) extends WindowEvictor {
    require(deltaUs > 0, "TimeLast needs deltaUs > 0")
  }

  /** Aggregate only elements whose value is within `threshold` of the
    * LAST element's value — by event time — at fire time
    * (DeltaEvictor.java with the absolute delta function: evict when
    * delta >= threshold). */
  final case class DeltaLast(threshold: Long) extends WindowEvictor {
    require(threshold > 0, "DeltaLast needs threshold > 0")
  }
}

/** Tumbling event-time windows with pluggable trigger + evictor — the
  * reference's WindowOperator assembly
  * (flink-runtime/…/runtime/operators/windowing/WindowOperator.java:131:
  * assigner + trigger + evictor + window function), which plain
  * watermark-emitting window aggs (StreamingWindows) cannot express.
  *
  * Emission protocol: every fire is one output row
  * `(key, w_start, w_end, fire_seq, is_final, n_rows, agg_val)`.
  * `fire_seq` counts fires within the window (1-based), the close fire has
  * `is_final = true` and always happens (even if a count fire just covered
  * the same contents — trigger fires are independent, as in the
  * reference). Downstream upsert consumers key on `(key, w_start)` and the
  * close fire is the last word — the changelog materialization pattern.
  *
  * Determinism contract: the BATCH face processes each key's rows in
  * `(timeCol, orderCols…)` order, so early fires are exact and
  * oracle-checkable. The STREAMING face fires early fires in arrival
  * order (sorted within each micro-batch) — out-of-order input can shift
  * WHICH prefix an early fire covers, exactly as the reference's triggers
  * are arrival-driven; close fires are watermark-driven and deterministic
  * on both faces.
  *
  * Aggregation is over a LongType column (callers fixed-point-scale
  * doubles — see VectorOps scaladoc): integer math keeps every fire
  * bit-identical across engines. Kinds: count | sum | min | max.
  *
  * State at scale: per open window, `KeepAll` holds a 4-long accumulator;
  * an evictor holds the window's raw `(ts, v)` pairs (bounded by the
  * window span, watermark-evicted at close — the reference's ListState
  * cost). One hash shuffle on the key, no cross-key coordination.
  */
object TriggeredWindows {

  private final case class Acc(
      cnt: Long, sum: Long, min: Long, max: Long,
      buf: Vector[(Long, Long)], // (tsUs, v) — only when evictor != KeepAll
      fireSeq: Long,
      lastBucket: Long,
      trigSet: Boolean, // DeltaOver: comparison point initialized?
      trigV: Long) { // DeltaOver: value at the last fire (or first element)
    def add(t: Long, v: Long, keepRaw: Boolean): Acc = copy(
      cnt = cnt + 1, sum = sum + v, min = math.min(min, v),
      max = math.max(max, v),
      buf = if (keepRaw) buf :+ (t -> v) else buf)
  }
  private val empty =
    Acc(0L, 0L, Long.MaxValue, Long.MinValue, Vector.empty, 0L,
      Long.MinValue, trigSet = false, 0L)

  /** Aggregate the (possibly evicted) contents; returns (nRows, value). */
  private def evaluate(
      a: Acc, evictor: WindowEvictor, aggKind: String): (Long, Long) = {
    val kept: Seq[Long] = evictor match {
      case WindowEvictor.KeepAll => Seq.empty // use the accumulator
      case WindowEvictor.CountLast(n) =>
        a.buf.sortBy(_._1).takeRight(n).map(_._2)
      case WindowEvictor.TimeLast(d) =>
        val maxTs = if (a.buf.isEmpty) Long.MinValue else a.buf.map(_._1).max
        a.buf.filter(_._1 > maxTs - d).map(_._2)
      case WindowEvictor.DeltaLast(thr) =>
        if (a.buf.isEmpty) Seq.empty
        else {
          val lastV = a.buf.maxBy(_._1)._2
          a.buf.filter(e => math.abs(e._2 - lastV) < thr).map(_._2)
        }
    }
    evictor match {
      case WindowEvictor.KeepAll =>
        val v = aggKind match {
          case "count" => a.cnt
          case "sum" => a.sum
          case "min" => a.min
          case "max" => a.max
        }
        (a.cnt, v)
      case _ =>
        val v = aggKind match {
          case "count" => kept.size.toLong
          case "sum" => kept.sum
          case "min" => kept.min
          case "max" => kept.max
        }
        (kept.size.toLong, v)
    }
  }

  private def outSchema(df: DataFrame, keyCol: String): StructType =
    StructType(Seq(
      df.schema(keyCol),
      StructField("w_start", LongType, nullable = false),
      StructField("w_end", LongType, nullable = false),
      StructField("fire_seq", LongType, nullable = false),
      StructField("is_final", BooleanType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("agg_val", LongType, nullable = false)))

  private def fireRow(
      key: Any, wStart: Long, sizeUs: Long, a: Acc, isFinal: Boolean,
      evictor: WindowEvictor, aggKind: String): Row = {
    val (n, v) = evaluate(a, evictor, aggKind)
    Row(key, wStart, wStart + sizeUs, a.fireSeq, isFinal, n, v)
  }

  /** Feed one element; returns (state, optional early-fire row). */
  private def feed(
      key: Any, wStart: Long, sizeUs: Long, a0: Acc, t: Long, v: Long,
      trigger: WindowTrigger, evictor: WindowEvictor,
      aggKind: String): (Acc, Option[Row]) = {
    val keepRaw = evictor != WindowEvictor.KeepAll
    trigger match {
      case WindowTrigger.OnClose =>
        (a0.add(t, v, keepRaw), None)
      case WindowTrigger.CountEvery(n) =>
        val a = a0.add(t, v, keepRaw)
        if (a.cnt % n == 0) {
          val f = a.copy(fireSeq = a.fireSeq + 1)
          (f, Some(fireRow(key, wStart, sizeUs, f, isFinal = false,
            evictor, aggKind)))
        } else (a, None)
      case WindowTrigger.ContinuousEventTime(iv) =>
        val bucket = Math.floorDiv(t, iv)
        val fire =
          if (a0.cnt > 0 && bucket > a0.lastBucket) {
            // the boundary-crossing element fires the PRIOR contents
            val f = a0.copy(fireSeq = a0.fireSeq + 1)
            Some(fireRow(key, wStart, sizeUs, f, isFinal = false,
              evictor, aggKind))
          } else None
        val a1 = (if (fire.isDefined) a0.copy(fireSeq = a0.fireSeq + 1)
                  else a0).add(t, v, keepRaw)
        (a1.copy(lastBucket = math.max(a1.lastBucket, bucket)), fire)
      case WindowTrigger.DeltaOver(thr) =>
        val a = a0.add(t, v, keepRaw)
        if (!a0.trigSet) (a.copy(trigSet = true, trigV = v), None)
        else if (math.abs(v - a0.trigV) > thr) {
          val f = a.copy(fireSeq = a.fireSeq + 1, trigV = v)
          (f, Some(fireRow(key, wStart, sizeUs, f, isFinal = false,
            evictor, aggKind)))
        } else (a, None)
    }
  }

  /** Batch face: exact trigger/evictor replay in event-time order via the
    * streamed secondary sort (no per-key materialization). `timeCol` must
    * be LongType micros; `orderCols` break event-time ties
    * deterministically; `valCol` must be LongType (pre-scaled).
    */
  def apply(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      sizeUs: Long,
      trigger: WindowTrigger,
      evictor: WindowEvictor,
      aggKind: String,
      orderCols: Seq[Column] = Nil): DataFrame = {
    require(Seq("count", "sum", "min", "max").contains(aggKind),
      s"unsupported agg kind: $aggKind")
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdx = df.schema.fieldIndex(valCol)
    SecondarySort.mapOrderedGroups(
      df, Seq(keyCol), col(timeCol) +: orderCols, outSchema(df, keyCol)) {
      (key, rows) =>
        var wStart = Long.MinValue
        var acc = empty
        val k = key.head
        val out = rows.flatMap { r =>
          val t = r.getLong(tIdx)
          val v = r.getLong(vIdx)
          val w = t - Math.floorMod(t, sizeUs)
          val closed: Option[Row] =
            if (w != wStart && acc.cnt > 0) {
              val f = acc.copy(fireSeq = acc.fireSeq + 1)
              val row = fireRow(k, wStart, sizeUs, f, isFinal = true,
                evictor, aggKind)
              acc = empty
              Some(row)
            } else None
          if (w != wStart) { wStart = w; acc = empty }
          val (a2, early) =
            feed(k, wStart, sizeUs, acc, t, v, trigger, evictor, aggKind)
          acc = a2
          closed.iterator ++ early.iterator
        }
        out ++ new Iterator[Row] {
          private var done = false
          def hasNext: Boolean = !done && acc.cnt > 0
          def next(): Row = {
            done = true
            val f = acc.copy(fireSeq = acc.fireSeq + 1)
            fireRow(k, wStart, sizeUs, f, isFinal = true, evictor, aggKind)
          }
        }
    }
  }

  /** Streaming face on the PTF hook: open windows live as keyed state,
    * early fires are arrival-driven, close fires happen when the watermark
    * passes `w_end` (timer wake-up), after which the window's state is
    * dropped. Late rows for closed windows are ignored (LateData routes
    * them upstream if needed).
    */
  def streaming(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String,
      sizeUs: Long,
      trigger: WindowTrigger,
      evictor: WindowEvictor,
      aggKind: String): DataFrame = {
    require(Seq("count", "sum", "min", "max").contains(aggKind),
      s"unsupported agg kind: $aggKind")
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdx = df.schema.fieldIndex(valCol)
    type S = Map[Long, Acc]
    val ptf = new GraftPTF[S] {
      def process(
          key: Row,
          rows: Iterator[Row],
          state: Option[S],
          watermarkMs: Long): (Option[S], Seq[Row], Option[Long]) = {
        var open: S = state.getOrElse(Map.empty)
        val out = Seq.newBuilder[Row]
        val k = key.get(0)
        val wmUs =
          if (watermarkMs == Long.MaxValue) Long.MaxValue
          else watermarkMs * 1000L
        rows.toSeq.sortBy(_.getLong(tIdx)).foreach { r =>
          val t = r.getLong(tIdx)
          val w = t - Math.floorMod(t, sizeUs)
          if (w + sizeUs > wmUs || wmUs == Long.MaxValue) {
            val (a2, early) = feed(k, w, sizeUs, open.getOrElse(w, empty),
              t, r.getLong(vIdx), trigger, evictor, aggKind)
            open = open.updated(w, a2)
            early.foreach(out += _)
          } // else: late for a closed window — dropped
        }
        // close every window the watermark has passed
        val (closing, stillOpen) = open.partition(_._1 + sizeUs <= wmUs)
        closing.toSeq.sortBy(_._1).foreach { case (w, a) =>
          if (a.cnt > 0) {
            val f = a.copy(fireSeq = a.fireSeq + 1)
            out += fireRow(k, w, sizeUs, f, isFinal = true, evictor, aggKind)
          }
        }
        open = stillOpen
        val wake = open.keys.map(w => (w + sizeUs) / 1000L + 1).minOption
        (if (open.isEmpty) None else Some(open), out.result(), wake)
      }
    }
    ProcessTableFunction(df, Seq(keyCol), outSchema(df, keyCol), ptf)
  }
}
