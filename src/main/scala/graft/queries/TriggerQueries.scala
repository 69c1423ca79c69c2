package graft.queries

import graft.Tables
import graft.streaming.{TriggeredWindows, WindowEvictor, WindowTrigger}
import org.apache.spark.sql.functions._

/** Trigger/evictor window queries — the batch (deterministic, in-order)
  * face of [[graft.streaming.TriggeredWindows]], oracle-checked fire by
  * fire. Ten-minute tumbling windows on `events` keyed by `event_type`;
  * values fixed-point-scaled (`floor(value·10⁶)` as BIGINT) so running
  * sums are bit-identical across engines; `event_id` breaks event-time
  * ties so every fire's prefix is deterministic.
  */
object TriggerQueries {

  private val W = 600000000L // 10 min in µs
  private val IV = 120000000L // 2 min in µs

  private def scaled(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .withColumn("v", floor(col("value") * 1e6).cast("long"))

  // shared oracle prelude: scaled value, µs time, window assignment
  private val E = s"""
    SELECT event_type, epoch_us(ts) AS ts_us, event_id,
           CAST(FLOOR(value * 1e6) AS BIGINT) AS v,
           epoch_us(ts) - epoch_us(ts) % $W AS w_start
    FROM events"""

  private def ordered(q: org.apache.spark.sql.DataFrame) =
    q.orderBy(col("event_type"), col("w_start"), col("fire_seq"))

  val defs: Seq[QueryDef] = Seq(

    // CountTrigger(25) + event-time close: early fire after every 25th
    // element with the running aggregate, final fire with the full window.
    QueryDef(
      "q_window_trigger_count",
      (s, dir) => ordered(TriggeredWindows(
        scaled(s, dir), "event_type", "ts_us", "v", W,
        WindowTrigger.CountEvery(25), WindowEvictor.KeepAll, "sum",
        Seq(col("event_id")))),
      Some(s"""
        WITH e AS ($E),
        r AS (
          SELECT *,
                 ROW_NUMBER() OVER w AS rn,
                 CAST(SUM(v) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum,
                 COUNT(*) OVER (PARTITION BY event_type, w_start) AS cnt,
                 CAST(SUM(v) OVER (PARTITION BY event_type, w_start) AS BIGINT) AS tot
          FROM e
          WINDOW w AS (PARTITION BY event_type, w_start
                       ORDER BY ts_us, event_id))
        SELECT event_type, w_start, w_start + $W AS w_end,
               CAST(rn // 25 AS BIGINT) AS fire_seq, FALSE AS is_final,
               rn AS n_rows, run_sum AS agg_val
        FROM r WHERE rn % 25 = 0
        UNION ALL
        SELECT event_type, w_start, w_start + $W,
               CAST(cnt // 25 + 1 AS BIGINT), TRUE, cnt, tot
        FROM r WHERE rn = 1
        ORDER BY event_type, w_start, fire_seq
      """.stripMargin.trim)),

    // ContinuousEventTimeTrigger(2 min) + close: the element crossing each
    // 2-minute boundary fires the contents accumulated before it (= through
    // the previous bucket's last row); the close fire covers everything.
    QueryDef(
      "q_window_trigger_cont",
      (s, dir) => ordered(TriggeredWindows(
        scaled(s, dir), "event_type", "ts_us", "v", W,
        WindowTrigger.ContinuousEventTime(IV), WindowEvictor.KeepAll, "sum",
        Seq(col("event_id")))),
      Some(s"""
        WITH e AS ($E),
        r AS (
          SELECT *, ts_us // $IV AS bucket,
                 ROW_NUMBER() OVER w AS rn,
                 CAST(SUM(v) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum,
                 COUNT(*) OVER (PARTITION BY event_type, w_start) AS cnt,
                 CAST(SUM(v) OVER (PARTITION BY event_type, w_start) AS BIGINT) AS tot
          FROM e
          WINDOW w AS (PARTITION BY event_type, w_start
                       ORDER BY ts_us, event_id)),
        m AS (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY event_type, w_start, bucket
                                    ORDER BY ts_us DESC, event_id DESC) AS rdb,
                 MAX(bucket) OVER (PARTITION BY event_type, w_start) AS maxb,
                 COUNT(DISTINCT bucket)
                   OVER (PARTITION BY event_type, w_start) AS nb
          FROM r),
        early AS (SELECT * FROM m WHERE rdb = 1 AND bucket < maxb)
        SELECT event_type, w_start, w_start + $W AS w_end,
               DENSE_RANK() OVER (PARTITION BY event_type, w_start
                                  ORDER BY bucket) AS fire_seq,
               FALSE AS is_final, rn AS n_rows, run_sum AS agg_val
        FROM early
        UNION ALL
        SELECT event_type, w_start, w_start + $W, nb, TRUE, cnt, tot
        FROM m WHERE rn = 1
        ORDER BY event_type, w_start, fire_seq
      """.stripMargin.trim)),

    // CountEvictor(30): the close fire aggregates only the window's last
    // 30 elements by event time.
    QueryDef(
      "q_window_evict_count",
      (s, dir) => ordered(TriggeredWindows(
        scaled(s, dir), "event_type", "ts_us", "v", W,
        WindowTrigger.OnClose, WindowEvictor.CountLast(30), "sum",
        Seq(col("event_id")))),
      Some(s"""
        WITH e AS ($E),
        r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, w_start
                     ORDER BY ts_us DESC, event_id DESC) AS rd
          FROM e)
        SELECT event_type, w_start, w_start + $W AS w_end,
               CAST(1 AS BIGINT) AS fire_seq, TRUE AS is_final,
               COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS agg_val
        FROM r WHERE rd <= 30
        GROUP BY event_type, w_start
        ORDER BY event_type, w_start, fire_seq
      """.stripMargin.trim)),

    // TimeEvictor(2 min): the close fire aggregates only elements within
    // 2 minutes of the window's max event time.
    QueryDef(
      "q_window_evict_time",
      (s, dir) => ordered(TriggeredWindows(
        scaled(s, dir), "event_type", "ts_us", "v", W,
        WindowTrigger.OnClose, WindowEvictor.TimeLast(IV), "min",
        Seq(col("event_id")))),
      Some(s"""
        WITH e AS ($E),
        r AS (
          SELECT *, MAX(ts_us) OVER (PARTITION BY event_type, w_start) AS mx
          FROM e)
        SELECT event_type, w_start, w_start + $W AS w_end,
               CAST(1 AS BIGINT) AS fire_seq, TRUE AS is_final,
               COUNT(*) AS n_rows, MIN(v) AS agg_val
        FROM r WHERE ts_us > mx - $IV
        GROUP BY event_type, w_start
        ORDER BY event_type, w_start, fire_seq
      """.stripMargin.trim)),

    // Trigger + evictor composed: every 25th element fires the sum of the
    // last 50 elements seen so far (a sliding frame); the close fire
    // covers the window's last 50.
    QueryDef(
      "q_window_trigger_evict",
      (s, dir) => ordered(TriggeredWindows(
        scaled(s, dir), "event_type", "ts_us", "v", W,
        WindowTrigger.CountEvery(25), WindowEvictor.CountLast(50), "sum",
        Seq(col("event_id")))),
      Some(s"""
        WITH e AS ($E),
        r AS (
          SELECT *,
                 ROW_NUMBER() OVER w AS rn,
                 CAST(SUM(v) OVER (w ROWS 49 PRECEDING) AS BIGINT) AS win_sum,
                 COUNT(*) OVER (PARTITION BY event_type, w_start) AS cnt
          FROM e
          WINDOW w AS (PARTITION BY event_type, w_start
                       ORDER BY ts_us, event_id))
        SELECT event_type, w_start, w_start + $W AS w_end,
               CAST(rn // 25 AS BIGINT) AS fire_seq, FALSE AS is_final,
               LEAST(rn, 50) AS n_rows, win_sum AS agg_val
        FROM r WHERE rn % 25 = 0
        UNION ALL
        SELECT event_type, w_start, w_start + $W,
               CAST(cnt // 25 + 1 AS BIGINT), TRUE, LEAST(cnt, 50), win_sum
        FROM r WHERE rn = cnt
        ORDER BY event_type, w_start, fire_seq
      """.stripMargin.trim)),

    // DeltaTrigger(|v - v_atLastFire| > 100 units): the comparison point
    // seeds at the window's first element and moves to the firing element
    // at each fire — inherently sequential state, so the oracle WALKS each
    // window with a recursive CTE (one iteration per in-window position).
    QueryDef(
      "q_window_trigger_delta",
      (s, dir) => ordered(TriggeredWindows(
        scaled(s, dir), "event_type", "ts_us", "v", W,
        WindowTrigger.DeltaOver(100000000L), WindowEvictor.KeepAll, "sum",
        Seq(col("event_id")))),
      Some(s"""
        WITH RECURSIVE e AS ($E),
        r AS (
          SELECT *,
                 ROW_NUMBER() OVER w AS rn,
                 CAST(SUM(v) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum,
                 COUNT(*) OVER (PARTITION BY event_type, w_start) AS cnt,
                 CAST(SUM(v) OVER (PARTITION BY event_type, w_start) AS BIGINT) AS tot
          FROM e
          WINDOW w AS (PARTITION BY event_type, w_start
                       ORDER BY ts_us, event_id)),
        walk AS (
          SELECT event_type, w_start, rn, v AS trigv,
                 CAST(0 AS BIGINT) AS fire_seq, FALSE AS fired,
                 run_sum, cnt, tot
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.event_type, r.w_start, r.rn,
                 CASE WHEN ABS(r.v - w.trigv) > 100000000
                      THEN r.v ELSE w.trigv END,
                 w.fire_seq + CASE WHEN ABS(r.v - w.trigv) > 100000000
                                   THEN 1 ELSE 0 END,
                 ABS(r.v - w.trigv) > 100000000,
                 r.run_sum, r.cnt, r.tot
          FROM walk w
          JOIN r ON r.event_type = w.event_type
                AND r.w_start = w.w_start AND r.rn = w.rn + 1)
        SELECT event_type, w_start, w_start + $W AS w_end, fire_seq,
               FALSE AS is_final, rn AS n_rows, run_sum AS agg_val
        FROM walk WHERE fired
        UNION ALL
        SELECT event_type, w_start, w_start + $W, fire_seq + 1, TRUE,
               cnt, tot
        FROM walk WHERE rn = cnt
        ORDER BY event_type, w_start, fire_seq
      """.stripMargin.trim)),

    // DeltaEvictor(|v - v_last| < 100 units): the close fire aggregates
    // only elements whose value is near the window's LAST element's value.
    QueryDef(
      "q_window_evict_delta",
      (s, dir) => ordered(TriggeredWindows(
        scaled(s, dir), "event_type", "ts_us", "v", W,
        WindowTrigger.OnClose, WindowEvictor.DeltaLast(100000000L), "sum",
        Seq(col("event_id")))),
      Some(s"""
        WITH e AS ($E),
        r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, w_start
                     ORDER BY ts_us DESC, event_id DESC) AS rd
          FROM e),
        lastv AS (SELECT event_type, w_start, v AS lv FROM r WHERE rd = 1)
        SELECT r.event_type, r.w_start, r.w_start + $W AS w_end,
               CAST(1 AS BIGINT) AS fire_seq, TRUE AS is_final,
               COUNT(*) AS n_rows, CAST(SUM(r.v) AS BIGINT) AS agg_val
        FROM r JOIN lastv l
          ON l.event_type = r.event_type AND l.w_start = r.w_start
        WHERE ABS(r.v - l.lv) < 100000000
        GROUP BY r.event_type, r.w_start
        ORDER BY r.event_type, r.w_start, fire_seq
      """.stripMargin.trim))
  )
}
