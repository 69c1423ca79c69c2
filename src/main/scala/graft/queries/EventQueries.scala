package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Sessionize, Windows}
import org.apache.spark.sql.functions._

/** Event-time windowing + time-bound joins (SURVEY.md §2.3/§2.4 streaming
  * rows, batch mode): tumble/hop/cumulate/session window aggregates,
  * interval join, window join, temporal as-of join.
  * Reference: SliceAssigners.java:67/83/100, UnsliceAssigners.java,
  * TimeIntervalJoin.java, WindowJoinOperator.java:57,
  * TemporalRowTimeJoinOperator.java:84.
  *
  * Exact epoch-nanos arithmetic (ts_ns) is used for window assignment so
  * results are reproducible against a nanosecond-capable oracle; the native
  * Spark `window()` API is exercised by q_tumble_native and the streaming
  * layer.
  */
object EventQueries {
  import Exact._

  private val NS_MIN = 60L * 1000000000L
  private val NS_HOUR = 60L * NS_MIN
  private val US_MIN = 60L * 1000000L

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_tumble_agg",
      (s, dir) => {
        Windows.withTumble(Tables.events(s, dir), "ts_ns", 10 * NS_MIN)
          .groupBy(col("window_start"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
          .orderBy(col("window_start"), col("event_type"))
      },
      Some(s"""
        SELECT epoch_ns(ts) - epoch_ns(ts) % 600000000000 AS window_start,
               event_type, COUNT(*) AS n, ${sqlSum("value", 6)} AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
      """.trim)),

    // Native Spark window() — micro-precision timestamps; bucket assignment
    // is truncation-stable vs the nanosecond oracle (events sit µs-deep
    // inside 10-minute buckets).
    QueryDef(
      "q_tumble_native",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("window_start"), col("n"))
          .orderBy(col("window_start"))
      },
      Some("""
        SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
      """.trim)),

    QueryDef(
      "q_hop_agg",
      (s, dir) => {
        Windows.withHops(Tables.events(s, dir), "ts_ns", 10 * NS_MIN, 5 * NS_MIN)
          .groupBy(col("window_start"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
          .orderBy(col("window_start"))
      },
      Some(s"""
        SELECT (epoch_ns(ts) - epoch_ns(ts) % 300000000000) - i * 300000000000 AS window_start,
               COUNT(*) AS n, ${sqlSum("value", 6)} AS sum_value
        FROM events CROSS JOIN generate_series(0, 1) g(i)
        GROUP BY 1 ORDER BY 1
      """.trim)),

    QueryDef(
      "q_cumulate_agg",
      (s, dir) => {
        Windows.withCumulate(Tables.events(s, dir), "ts_ns", NS_HOUR, 15 * NS_MIN)
          .groupBy(col("window_start"), col("window_end"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
          .orderBy(col("window_start"), col("window_end"))
      },
      Some(s"""
        WITH x AS (
          SELECT value, epoch_ns(ts) AS t,
                 epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS s
          FROM events),
        ex AS (
          SELECT s AS window_start, value,
                 unnest(generate_series(t - t % 900000000000 + 900000000000,
                                        s + 3600000000000, 900000000000)) AS window_end
          FROM x)
        SELECT window_start, window_end, COUNT(*) AS n,
               ${sqlSum("value", 6)} AS sum_value
        FROM ex GROUP BY 1, 2 ORDER BY 1, 2
      """.trim)),

    QueryDef(
      "q_session_agg",
      (s, dir) => {
        Sessionize.aggregate(
            Tables.events(s, dir), "user_id", "ts_us", 30 * US_MIN,
            "sum_value" -> dsum(col("value"), 6))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some(s"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
        m AS (SELECT *, CASE WHEN t - LAG(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        sess AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        SELECT user_id, MIN(t) AS session_start, COUNT(*) AS session_rows,
               ${sqlSum("value", 6)} AS sum_value
        FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
      """.trim)),

    // Interval join: purchases within (click, click + 30 min] per user.
    // Equi-key on user_id keeps it a hash join with a range residual —
    // no cross product at scale.
    QueryDef(
      "q_interval_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val c = e.where(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts"),
            col("event_id").as("click_id"))
        val p = e.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"),
            col("value"))
        c.join(p, col("user_id") === col("p_user") &&
            col("p_ts") > col("c_ts") &&
            col("p_ts") <= col("c_ts") + lit(30 * US_MIN))
          .groupBy(col("click_id"))
          .agg(count(lit(1)).as("n_purchases"), dsum(col("value"), 6).as("sum_value"))
          .orderBy(col("click_id"))
      },
      Some(s"""
        SELECT c.event_id AS click_id, COUNT(*) AS n_purchases,
               ${sqlSum("p.value", 6)} AS sum_value
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND epoch_us(p.ts) > epoch_us(c.ts)
         AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
        GROUP BY 1 ORDER BY 1
      """.trim)),

    // LEFT OUTER interval join (StreamExecIntervalJoin outer emission):
    // every click appears; clicks with no purchase inside the 30-minute
    // window carry zero counts — in streaming the unmatched row emits when
    // the watermark passes the interval bound, in batch it's the plain
    // outer join Spark plans natively.
    QueryDef(
      "q_interval_join_left",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val c = e.where(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts"),
            col("event_id").as("click_id"))
        val p = e.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"),
            col("value"))
        c.join(p, col("user_id") === col("p_user") &&
            col("p_ts") > col("c_ts") &&
            col("p_ts") <= col("c_ts") + lit(30 * US_MIN), "left")
          .groupBy(col("click_id"))
          .agg(count(col("p_user")).as("n_purchases"),
            dsum(coalesce(col("value"), lit(0.0)), 6).as("sum_value"))
          .orderBy(col("click_id"))
      },
      Some(s"""
        SELECT c.event_id AS click_id, COUNT(p.user_id) AS n_purchases,
               ${sqlSum("COALESCE(p.value, 0.0)", 6)} AS sum_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND epoch_us(p.ts) > epoch_us(c.ts)
         AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
        GROUP BY 1 ORDER BY 1
      """.trim)),

    // HOP-window join (Flink's window join on a sliding TVF): clicks ⋈
    // purchases sharing a 10-min/5-min hop window and user — each row
    // expands into its two windows, then a plain (window, key) equi-join.
    QueryDef(
      "q_window_join_hop",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val c = Windows.withHops(
          e.where(col("event_type") === "click"), "ts_ns",
          10 * NS_MIN, 5 * NS_MIN)
          .select(col("user_id"), col("window_start"))
        val p = Windows.withHops(
          e.where(col("event_type") === "purchase"), "ts_ns",
          10 * NS_MIN, 5 * NS_MIN)
          .select(col("user_id").as("p_user"),
            col("window_start").as("p_win"))
        c.join(p, col("user_id") === col("p_user") &&
            col("window_start") === col("p_win"))
          .groupBy(col("window_start"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("window_start"))
      },
      Some("""
        WITH c AS (
          SELECT user_id,
                 (epoch_ns(ts) - epoch_ns(ts) % 300000000000)
                   - i * 300000000000 AS ws
          FROM events CROSS JOIN generate_series(0, 1) g(i)
          WHERE event_type = 'click'),
        p AS (
          SELECT user_id,
                 (epoch_ns(ts) - epoch_ns(ts) % 300000000000)
                   - i * 300000000000 AS ws
          FROM events CROSS JOIN generate_series(0, 1) g(i)
          WHERE event_type = 'purchase')
        SELECT c.ws AS window_start, COUNT(*) AS n_pairs
        FROM c JOIN p ON c.user_id = p.user_id AND c.ws = p.ws
        GROUP BY 1 ORDER BY 1
      """.trim)),

    // Window TVF aggregate under GROUPING SETS (the reference's window
    // agg supports grouping sets): per-window totals and per-window
    // per-type splits in one pass through Catalyst's Expand.
    QueryDef(
      "q_window_grouping_sets",
      (s, dir) => {
        Windows.withTumble(Tables.events(s, dir), "ts_ns", 15 * NS_MIN)
          .createOrReplaceTempView("ev_win")
        s.sql(s"""
          SELECT window_start,
                 COALESCE(event_type, 'ALL') AS et,
                 COUNT(*) AS n, ${sqlSum("value", 6)} AS sum_value
          FROM ev_win
          GROUP BY GROUPING SETS ((window_start, event_type),
                                  (window_start))
          ORDER BY window_start, et
        """)
      },
      Some(s"""
        WITH w AS (
          SELECT event_type, value,
                 epoch_ns(ts) - epoch_ns(ts) % 900000000000 AS window_start
          FROM events)
        SELECT window_start, COALESCE(event_type, 'ALL') AS et,
               COUNT(*) AS n, ${sqlSum("value", 6)} AS sum_value
        FROM w
        GROUP BY GROUPING SETS ((window_start, event_type), (window_start))
        ORDER BY window_start, et
      """.trim)),

    // Window join: clicks ⋈ purchases in the same 15-min tumble window —
    // a plain equi-join on (window, key), shuffle-friendly.
    QueryDef(
      "q_window_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val win = 15 * NS_MIN
        val c = Windows.withTumble(
          e.where(col("event_type") === "click"), "ts_ns", win)
          .select(col("user_id"), col("window_start"))
        val p = Windows.withTumble(
          e.where(col("event_type") === "purchase"), "ts_ns", win)
          .select(col("user_id").as("p_user"), col("window_start").as("p_win"))
        c.join(p, col("user_id") === col("p_user") &&
            col("window_start") === col("p_win"))
          .groupBy(col("window_start"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("window_start"))
      },
      Some("""
        SELECT epoch_ns(c.ts) - epoch_ns(c.ts) % 900000000000 AS window_start,
               COUNT(*) AS n_pairs
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND epoch_ns(c.ts) - epoch_ns(c.ts) % 900000000000
             = epoch_ns(p.ts) - epoch_ns(p.ts) % 900000000000
        GROUP BY 1 ORDER BY 1
      """.trim)),

    // LEFT OUTER window join (the reference's window join supports all
    // outer types): clicks keep their window row even when no purchase
    // shares the (user, window) — matched and unmatched counted per window.
    QueryDef(
      "q_window_join_left",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val win = 15 * NS_MIN
        val c = Windows.withTumble(
          e.where(col("event_type") === "click"), "ts_ns", win)
          .select(col("user_id"), col("window_start"))
        val p = Windows.withTumble(
          e.where(col("event_type") === "purchase"), "ts_ns", win)
          .select(col("user_id").as("p_user"), col("window_start").as("p_win"))
        c.join(p, col("user_id") === col("p_user") &&
            col("window_start") === col("p_win"), "left")
          .groupBy(col("window_start"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("p_user")).as("n_matched"))
          .orderBy(col("window_start"))
      },
      Some("""
        SELECT epoch_ns(c.ts) - epoch_ns(c.ts) % 900000000000 AS window_start,
               COUNT(*) AS n_rows,
               COUNT(p.user_id) AS n_matched
        FROM events c LEFT JOIN events p
          ON c.user_id = p.user_id
         AND p.event_type = 'purchase'
         AND epoch_ns(c.ts) - epoch_ns(c.ts) % 900000000000
             = epoch_ns(p.ts) - epoch_ns(p.ts) % 900000000000
        WHERE c.event_type = 'click'
        GROUP BY 1 ORDER BY 1
      """.trim)),

    // SEMI window join (StreamExecWindowJoin supports semi/anti): clicks
    // with at least one purchase in the same (user, 15-min window) —
    // Spark's left_semi on the (window, key) equi-pair.
    QueryDef(
      "q_window_join_semi",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val win = 15 * NS_MIN
        val c = Windows.withTumble(
          e.where(col("event_type") === "click"), "ts_ns", win)
          .select(col("user_id"), col("window_start"))
        val p = Windows.withTumble(
          e.where(col("event_type") === "purchase"), "ts_ns", win)
          .select(col("user_id").as("p_user"), col("window_start").as("p_win"))
        c.join(p, col("user_id") === col("p_user") &&
            col("window_start") === col("p_win"), "left_semi")
          .groupBy(col("window_start"))
          .agg(count(lit(1)).as("n_clicks"))
          .orderBy(col("window_start"))
      },
      Some("""
        SELECT epoch_ns(c.ts) - epoch_ns(c.ts) % 900000000000 AS window_start,
               COUNT(*) AS n_clicks
        FROM events c
        WHERE c.event_type = 'click' AND EXISTS (
          SELECT 1 FROM events p
          WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
            AND epoch_ns(p.ts) - epoch_ns(p.ts) % 900000000000
                = epoch_ns(c.ts) - epoch_ns(c.ts) % 900000000000)
        GROUP BY 1 ORDER BY 1
      """.trim)),

    // ANTI window join: clicks with NO purchase in the same window.
    QueryDef(
      "q_window_join_anti",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val win = 15 * NS_MIN
        val c = Windows.withTumble(
          e.where(col("event_type") === "click"), "ts_ns", win)
          .select(col("user_id"), col("window_start"))
        val p = Windows.withTumble(
          e.where(col("event_type") === "purchase"), "ts_ns", win)
          .select(col("user_id").as("p_user"), col("window_start").as("p_win"))
        c.join(p, col("user_id") === col("p_user") &&
            col("window_start") === col("p_win"), "left_anti")
          .groupBy(col("window_start"))
          .agg(count(lit(1)).as("n_clicks"))
          .orderBy(col("window_start"))
      },
      Some("""
        SELECT epoch_ns(c.ts) - epoch_ns(c.ts) % 900000000000 AS window_start,
               COUNT(*) AS n_clicks
        FROM events c
        WHERE c.event_type = 'click' AND NOT EXISTS (
          SELECT 1 FROM events p
          WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
            AND epoch_ns(p.ts) - epoch_ns(p.ts) % 900000000000
                = epoch_ns(c.ts) - epoch_ns(c.ts) % 900000000000)
        GROUP BY 1 ORDER BY 1
      """.trim)),

    // FULL OUTER window join: both sides keep their window rows;
    // per-window totals count presence of each side.
    QueryDef(
      "q_window_join_full",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val win = 15 * NS_MIN
        val c = Windows.withTumble(
          e.where(col("event_type") === "click"), "ts_ns", win)
          .select(col("user_id"), col("window_start"))
        val p = Windows.withTumble(
          e.where(col("event_type") === "purchase"), "ts_ns", win)
          .select(col("user_id").as("p_user"), col("window_start").as("p_win"))
        c.join(p, col("user_id") === col("p_user") &&
            col("window_start") === col("p_win"), "full")
          .groupBy(coalesce(col("window_start"), col("p_win")).as("w"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("user_id")).as("n_left"),
            count(col("p_user")).as("n_right"))
          .orderBy(col("w"))
      },
      Some("""
        WITH c AS (SELECT user_id,
                     epoch_ns(ts) - epoch_ns(ts) % 900000000000 AS w
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id,
                     epoch_ns(ts) - epoch_ns(ts) % 900000000000 AS w
                   FROM events WHERE event_type = 'purchase')
        SELECT COALESCE(c.w, p.w) AS w, COUNT(*) AS n_rows,
               COUNT(c.user_id) AS n_left, COUNT(p.user_id) AS n_right
        FROM c FULL JOIN p ON c.user_id = p.user_id AND c.w = p.w
        GROUP BY 1 ORDER BY 1
      """.trim)),

    // Temporal as-of join: each click sees the user's latest purchase at or
    // before it (FOR SYSTEM_TIME AS OF semantics).
    QueryDef(
      "q_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val clicks = e.where(col("event_type") === "click")
        val purchases = e.where(col("event_type") === "purchase")
        AsOfJoin(clicks, purchases,
            key = "user_id", leftTime = "ts_us", rightTime = "ts_us",
            payloadCols = Seq("value", "ts_us"),
            tieBreak = Seq("event_id"))
          .select(col("event_id"), col("user_id"),
            col("asof_value"), col("asof_ts_us"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH u AS (
          SELECT user_id AS k, epoch_us(ts) AS t, 1 AS side, event_id,
                 CAST(NULL AS DOUBLE) AS pval, CAST(NULL AS BIGINT) AS pt
          FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, epoch_us(ts), 0, event_id, value, epoch_us(ts)
          FROM events WHERE event_type = 'purchase'),
        w AS (
          SELECT *,
            LAST_VALUE(pval IGNORE NULLS) OVER win AS asof_value,
            LAST_VALUE(pt IGNORE NULLS) OVER win AS asof_ts_us
          FROM u
          WINDOW win AS (PARTITION BY k ORDER BY t, side, CAST(event_id AS VARCHAR)
                         ROWS UNBOUNDED PRECEDING))
        SELECT event_id, k AS user_id, asof_value, asof_ts_us
        FROM w WHERE side = 1 ORDER BY event_id
      """.trim))
  )
}
