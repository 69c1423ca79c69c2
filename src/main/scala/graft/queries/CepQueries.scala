package graft.queries

import graft.Tables
import graft.operators.{AfterMatchSkip, CepNfa, CepPattern, Dedup, MatchRecognize, PatternMatch, PatternStep}
import graft.sql.FlinkSql
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE-lite (CEP) queries. The Spark side runs the per-key
  * NFA scan (MatchRecognize.fallingRunThenRise); the oracle re-derives
  * the identical matches relationally (gaps-and-islands + arg_min/arg_max)
  * — two independent formulations of the same pattern semantics.
  */
object CepQueries {

  val defs: Seq[QueryDef] = Seq(

    // V-shape detection per user over the events stream: a maximal run of
    // strictly-falling values immediately followed by a rise.
    QueryDef(
      "q_match_recognize",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        // deterministic order: one row per (user, micro), lowest event_id
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        MatchRecognize.fallingRunThenRise(d, "user_id", "ts_us", "value")
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, value,
                lag(tu) OVER w AS ptu, lag(value) OVER w AS pv,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN value < pv THEN 'D'
                              WHEN value > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir = 'D'
                                  AND (pdir IS NULL OR pdir <> 'D')
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2),
        druns AS (
          SELECT user_id, runid,
                 COUNT(*) AS n_down,
                 MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_us,
                 arg_min(pv, idx) AS top,
                 arg_max(value, idx) AS bottom
          FROM r WHERE dir = 'D' GROUP BY user_id, runid)
        SELECT d.user_id, d.start_us, nxt.tu AS end_us, d.n_down,
               d.top - d.bottom AS depth
        FROM druns d JOIN r nxt
          ON nxt.user_id = d.user_id AND nxt.idx = d.last_idx + 1
             AND nxt.dir = 'U'
        ORDER BY d.user_id, d.start_us
      """.stripMargin.trim)),

    // Relaxed contiguity (Pattern.followedBy, Pattern.java:349): a spike
    // (value >= 150) followed — with any number of irrelevant events
    // skipped in between — by the FIRST lull (value <= 2). The strict
    // MATCH_RECOGNIZE engines cannot express the skip-gap: any
    // non-matching row between the two would abort. Oracle: each spike
    // pairs with the first later lull per user.
    QueryDef(
      "q_cep_followed_by",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        CepPattern(d, "user_id", "ts_us", "value",
          CepPattern.begin("a").where(_ >= 150.0)
            .followedBy("b").where(_ <= 2.0).build())
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        a AS (SELECT user_id, tu FROM d WHERE value >= 150),
        b AS (SELECT user_id, tu FROM d WHERE value <= 2)
        SELECT a.user_id, a.tu AS start_us, MIN(b.tu) AS end_us,
               CAST(1 AS BIGINT) AS n_a, CAST(1 AS BIGINT) AS n_b
        FROM a JOIN b ON b.user_id = a.user_id AND b.tu > a.tu
        GROUP BY a.user_id, a.tu ORDER BY a.user_id, start_us
      """.stripMargin.trim)),

    // Negative pattern (Pattern.notFollowedBy, Pattern.java:298/:430): a
    // spike followed by the first lull with NO elevated event
    // (value >= 100) anywhere in the gap — the elevated event kills the
    // partial match while it waits. Oracle: the followedBy pairs minus
    // those with an intervening kill row (NOT EXISTS over the open
    // interval).
    QueryDef(
      "q_cep_not_followed_by",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        CepPattern(d, "user_id", "ts_us", "value",
          CepPattern.begin("a").where(_ >= 150.0)
            .notFollowedBy("n").where(_ >= 100.0)
            .followedBy("b").where(_ <= 2.0).build())
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        a AS (SELECT user_id, tu FROM d WHERE value >= 150),
        b AS (SELECT user_id, tu FROM d WHERE value <= 2),
        n AS (SELECT user_id, tu FROM d WHERE value >= 100),
        m AS (SELECT a.user_id, a.tu AS start_us, MIN(b.tu) AS end_us
              FROM a JOIN b ON b.user_id = a.user_id AND b.tu > a.tu
              GROUP BY a.user_id, a.tu)
        SELECT m.user_id, m.start_us, m.end_us,
               CAST(1 AS BIGINT) AS n_a, CAST(1 AS BIGINT) AS n_b
        FROM m
        WHERE NOT EXISTS (SELECT 1 FROM n WHERE n.user_id = m.user_id
                          AND n.tu > m.start_us AND n.tu < m.end_us)
        ORDER BY m.user_id, m.start_us
      """.stripMargin.trim)),

    // Non-deterministic relaxed contiguity (Pattern.followedByAny):
    // EVERY later lull after a spike yields its own match — the full
    // pair set, trivially relational.
    QueryDef(
      "q_cep_followed_by_any",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        CepPattern(d, "user_id", "ts_us", "value",
          CepPattern.begin("a").where(_ >= 200.0)
            .followedByAny("b").where(_ <= 1.0).build())
          .orderBy(col("user_id"), col("start_us"), col("end_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        a AS (SELECT user_id, tu FROM d WHERE value >= 200),
        b AS (SELECT user_id, tu FROM d WHERE value <= 1)
        SELECT a.user_id, a.tu AS start_us, b.tu AS end_us,
               CAST(1 AS BIGINT) AS n_a, CAST(1 AS BIGINT) AS n_b
        FROM a JOIN b ON b.user_id = a.user_id AND b.tu > a.tu
        ORDER BY a.user_id, start_us, end_us
      """.stripMargin.trim)),

    // Timeout side output (TimedOutPartialMatchHandler): spike →
    // first lull within 24h, ELSE the partial surfaces timed_out=true
    // once a row past the deadline proves the window empty (batch
    // semantics: the timeout fires when the first over-budget row
    // arrives, so a spike at the very end of a user's history with no
    // later row emits nothing — replicated by the EXISTS guard).
    QueryDef(
      "q_cep_timeout",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        CepPattern.withTimeouts(d, "user_id", "ts_us", "value",
          CepPattern.begin("a").where(_ >= 150.0)
            .followedBy("b").where(_ <= 20.0)
            .within(86400000000L).build())
          .orderBy(col("user_id"), col("start_us"), col("timed_out"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        a AS (SELECT user_id, tu FROM d WHERE value >= 150),
        b AS (SELECT user_id, tu FROM d WHERE value <= 20),
        fb AS (SELECT a.user_id, a.tu AS start_us, MIN(b.tu) AS end_us
               FROM a JOIN b ON b.user_id = a.user_id AND b.tu > a.tu
                            AND b.tu <= a.tu + 86400000000
               GROUP BY 1, 2)
        SELECT user_id, start_us, end_us, CAST(1 AS BIGINT) AS n_a,
               CAST(1 AS BIGINT) AS n_b, FALSE AS timed_out
        FROM fb
        UNION ALL
        SELECT a.user_id, a.tu, a.tu, CAST(1 AS BIGINT),
               CAST(0 AS BIGINT), TRUE
        FROM a
        WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.user_id = a.user_id
                          AND b.tu > a.tu AND b.tu <= a.tu + 86400000000)
          AND EXISTS (SELECT 1 FROM d WHERE d.user_id = a.user_id
                      AND d.tu > a.tu + 86400000000)
        ORDER BY user_id, start_us, timed_out
      """.stripMargin.trim)),

    // Aggregate (iterative) DEFINE condition — the reference's
    // IterativeCondition (flink-cep/…/pattern/conditions/
    // IterativeCondition.java:63) / the aggregate-DEFINE cases of
    // MatchRecognizeITCase: `a{3,}` extends while the RUNNING SUM of the
    // rows matched so far (including the row under test — SQL running
    // semantics) stays within budget. SKIP TO NEXT ROW → every anchor
    // emits its own maximal in-budget run. Values fixed-point-scaled
    // (×100) so running sums are exact integers in double. The oracle
    // replays the same matches relationally: positive values make the
    // per-key cumulative sum monotone, so an anchor's run is the
    // contiguous prefix with csum_j <= csum_{anchor-1} + budget.
    QueryDef(
      "q_match_recognize_aggcond",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
          .withColumn("v100", round(col("value") * 100).cast("double"))
        FlinkSql.sql(s,
          """SELECT user_id, start_us, end_us, n_a, sum_a
            |FROM events_v MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts_us
            |  MEASURES SUM(a.v100) AS sum_a
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (a{3,})
            |  DEFINE a AS SUM(a.v100) <= 10000
            |)
            |ORDER BY user_id, start_us""".stripMargin,
          Map("events_v" -> d))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu,
                 CAST(ROUND(value * 100) AS BIGINT) AS v,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, v FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, v, row_number() OVER w AS idx,
                     SUM(v) OVER (w ROWS UNBOUNDED PRECEDING) AS c,
                     lag(tu) OVER w AS ptu
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        m AS (SELECT a.user_id, a.idx, a.ptu AS start_us,
                     COUNT(*) AS n_a, MAX(b.tu) AS end_us, SUM(b.v) AS sum_v
              FROM s a JOIN s b
                ON b.user_id = a.user_id AND b.idx >= a.idx
               AND b.c <= a.c - a.v + 10000
              WHERE a.idx >= 2
              GROUP BY a.user_id, a.idx, a.ptu)
        SELECT user_id, start_us, end_us, CAST(n_a AS BIGINT) AS n_a,
               CAST(sum_v AS DOUBLE) AS sum_a
        FROM m WHERE n_a >= 3 ORDER BY user_id, start_us
      """.stripMargin.trim)),

    // Generalized pattern A+ B+ (full V: maximal falling run then maximal
    // rising run) via the parameterized NFA. The oracle derives the same
    // matches from adjacent D-run/U-run island pairs — a D-run followed
    // immediately by a U-run is exactly one SKIP-PAST-LAST-ROW match.
    QueryDef(
      "q_match_recognize_updown",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        PatternMatch(d, "user_id", "ts_us", "value", Seq(
          PatternStep("down", (p, c) => c < p, greedy = true),
          PatternStep("up", (p, c) => c > p, greedy = true)))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, value,
                lag(tu) OVER w AS ptu, lag(value) OVER w AS pv,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN value < pv THEN 'D'
                              WHEN value > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir IS NOT NULL
                                  AND (pdir IS NULL OR pdir <> dir)
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2 WHERE dir IS NOT NULL),
        runs AS (
          SELECT user_id, runid, dir,
                 COUNT(*) AS n,
                 MIN(idx) AS first_idx, MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_tu,
                 arg_max(tu, idx) AS end_tu
          FROM r GROUP BY user_id, runid, dir)
        SELECT d.user_id, d.start_tu AS start_us, u.end_tu AS end_us,
               d.n AS n_down, u.n AS n_up
        FROM runs d JOIN runs u
          ON u.user_id = d.user_id AND d.dir = 'D' AND u.dir = 'U'
             AND u.first_idx = d.last_idx + 1
        ORDER BY d.user_id, start_us
      """.stripMargin.trim)),

    // Bounded repetition A{2,}+ B+: only falling runs of length >= 2
    // followed by a rise match. Because maximal runs are disjoint and
    // SKIP PAST LAST ROW consumes whole runs, the oracle is the updown
    // islands formulation filtered on the run length.
    QueryDef(
      "q_match_recognize_min2",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        PatternMatch(d, "user_id", "ts_us", "value", Seq(
          PatternStep("down", (p, c) => c < p, greedy = true, minCount = 2),
          PatternStep("up", (p, c) => c > p, greedy = true)))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, value,
                lag(tu) OVER w AS ptu, lag(value) OVER w AS pv,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN value < pv THEN 'D'
                              WHEN value > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir IS NOT NULL
                                  AND (pdir IS NULL OR pdir <> dir)
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2 WHERE dir IS NOT NULL),
        runs AS (
          SELECT user_id, runid, dir,
                 COUNT(*) AS n,
                 MIN(idx) AS first_idx, MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_tu,
                 arg_max(tu, idx) AS end_tu
          FROM r GROUP BY user_id, runid, dir)
        SELECT d.user_id, d.start_tu AS start_us, u.end_tu AS end_us,
               d.n AS n_down, u.n AS n_up
        FROM runs d JOIN runs u
          ON u.user_id = d.user_id AND d.dir = 'D' AND u.dir = 'U'
             AND u.first_idx = d.last_idx + 1 AND d.n >= 2
        ORDER BY d.user_id, start_us
      """.stripMargin.trim)),

    // WITHIN bound: the V-shape must complete inside 24 hours. Matches are
    // disjoint maximal run pairs, so completion-time filtering (the
    // documented WITHIN semantics) is exactly a duration predicate over
    // the islands formulation.
    QueryDef(
      "q_match_recognize_within",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        PatternMatch(d, "user_id", "ts_us", "value", Seq(
          PatternStep("down", (p, c) => c < p, greedy = true),
          PatternStep("up", (p, c) => c > p, greedy = true)),
          withinUs = Some(86400000000L))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, value,
                lag(tu) OVER w AS ptu, lag(value) OVER w AS pv,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN value < pv THEN 'D'
                              WHEN value > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir IS NOT NULL
                                  AND (pdir IS NULL OR pdir <> dir)
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2 WHERE dir IS NOT NULL),
        runs AS (
          SELECT user_id, runid, dir,
                 COUNT(*) AS n,
                 MIN(idx) AS first_idx, MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_tu,
                 arg_max(tu, idx) AS end_tu
          FROM r GROUP BY user_id, runid, dir)
        SELECT d.user_id, d.start_tu AS start_us, u.end_tu AS end_us,
               d.n AS n_down, u.n AS n_up
        FROM runs d JOIN runs u
          ON u.user_id = d.user_id AND d.dir = 'D' AND u.dir = 'U'
             AND u.first_idx = d.last_idx + 1
             AND u.end_tu - d.start_tu <= 86400000000
        ORDER BY d.user_id, start_us
      """.stripMargin.trim)),

    // Logical offsets (round 11 — match_recognize.md logical-offsets
    // section): LAST(down.value, 1) is the SECOND-TO-LAST value the
    // down variable matched (NULL for one-row runs — the reference's
    // beyond-the-window null). Pattern: maximal falling run then a
    // rise (the q_match_recognize islands shape); the oracle reads the
    // run's value at last_idx - 1 when the run has >= 2 rows.
    QueryDef(
      "q_match_recognize_offsets",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        FlinkSql.sql(s,
          """SELECT user_id, start_us, end_us, n_down, second_last
            |FROM d MATCH_RECOGNIZE (
            |  PARTITION BY user_id ORDER BY ts_us
            |  MEASURES LAST(down.value, 1) AS second_last
            |  ONE ROW PER MATCH
            |  PATTERN (down+ up)
            |  DEFINE down AS value < PREV(value),
            |         up AS value > PREV(value))
            |ORDER BY user_id, start_us""".stripMargin,
          Map("d" -> d))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, value,
                lag(tu) OVER w AS ptu, lag(value) OVER w AS pv,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN value < pv THEN 'D'
                              WHEN value > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir = 'D'
                                  AND (pdir IS NULL OR pdir <> 'D')
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2),
        druns AS (
          SELECT user_id, runid,
                 COUNT(*) AS n_down,
                 MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_us
          FROM r WHERE dir = 'D' GROUP BY user_id, runid)
        SELECT d.user_id, d.start_us, nxt.tu AS end_us,
               CAST(d.n_down AS BIGINT) AS n_down,
               CASE WHEN d.n_down >= 2 THEN sl.value END AS second_last
        FROM druns d
        JOIN r nxt ON nxt.user_id = d.user_id
                  AND nxt.idx = d.last_idx + 1 AND nxt.dir = 'U'
        LEFT JOIN r sl ON sl.user_id = d.user_id
                      AND sl.idx = d.last_idx - 1
        ORDER BY d.user_id, d.start_us
      """.stripMargin.trim)),

    // MATCH_ROWTIME / MATCH_PROCTIME time-attribute measures (round
    // 11 — match_recognize.md:1038,1049): MATCH_ROWTIME() is the
    // TIMESTAMP of the match's last mapped row (= end_us); the
    // operand form returns the operand's type (the exact-micros long
    // here). The oracle derives the same adjacent down-up matches
    // relationally and stamps make_timestamp(end_us).
    QueryDef(
      "q_sql_match_rowtime",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        FlinkSql.sql(s,
          """SELECT user_id, start_us, end_us, mrt, mrt_raw
            |FROM d MATCH_RECOGNIZE (
            |  PARTITION BY user_id ORDER BY ts_us
            |  MEASURES MATCH_ROWTIME() AS mrt,
            |           MATCH_ROWTIME(ts_us) AS mrt_raw
            |  ONE ROW PER MATCH
            |  PATTERN (down up)
            |  DEFINE down AS value < PREV(value),
            |         up AS value > PREV(value))
            |ORDER BY user_id, start_us""".stripMargin,
          Map("d" -> d))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, value,
                lag(tu) OVER w AS ptu, lag(value) OVER w AS pv,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN value < pv THEN 'D'
                              WHEN value > pv THEN 'U' ELSE 'E' END AS dir
               FROM s)
        SELECT dn.user_id, dn.ptu AS start_us, up.tu AS end_us,
               make_timestamp(up.tu) AS mrt, up.tu AS mrt_raw
        FROM sd dn JOIN sd up
          ON up.user_id = dn.user_id AND up.idx = dn.idx + 1
        WHERE dn.dir = 'D' AND up.dir = 'U'
        ORDER BY dn.user_id, start_us
      """.stripMargin.trim)),

    // Nested-NFA Pattern-API face (round 11): an unbounded
    // followedBy-linked group `(a b)+ c` — a spike (>=150) followed by
    // the first lull (<=2) forms one iteration; iterations chain
    // relaxedly (skip to the next spike); the match ends at the first
    // >100 row after the last lull. Relaxed gaps force every
    // interpretation's row assignment, so per anchor only the
    // iteration count k varies and the greedy group picks the MAXIMUM
    // k that still finds a c row. The oracle replays exactly that: a
    // recursive chain walk over window-precomputed next-lull /
    // next-spike / next->100 indices, keeping max k per anchor.
    // SKIP TO NEXT ROW = every spike anchors its own chain.
    QueryDef(
      "q_cep_nested_group",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        val grp = CepPattern.begin("a").where(_ >= 150.0)
          .followedBy("b").where(_ <= 2.0)
        val pat = CepPattern.begin(grp).oneOrMore()
          .followedBy("c").where(_ > 100.0)
        CepPattern.nested(d, "user_id", "ts_us", Seq("value"), pat,
          skip = AfterMatchSkip.ToNextRow)
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH RECURSIVE e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, value,
                lag(tu) OVER w AS ptu,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        nx AS (SELECT *,
                MIN(CASE WHEN value <= 2 THEN idx END) OVER wf AS nxt_l,
                MIN(CASE WHEN value >= 150 THEN idx END) OVER wf AS nxt_s,
                MIN(CASE WHEN value > 100 THEN idx END) OVER wf AS nxt_c
               FROM s WINDOW wf AS (PARTITION BY user_id ORDER BY tu
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        chain AS (
          SELECT user_id, idx AS a_idx, ptu AS start_us, nxt_l AS l_idx,
                 CAST(1 AS BIGINT) AS k
          FROM nx
          WHERE value >= 150 AND ptu IS NOT NULL AND nxt_l IS NOT NULL
          UNION ALL
          SELECT c.user_id, c.a_idx, c.start_us, ls.nxt_l, c.k + 1
          FROM chain c
          JOIN nx lrow ON lrow.user_id = c.user_id AND lrow.idx = c.l_idx
          JOIN nx ls ON ls.user_id = c.user_id AND ls.idx = lrow.nxt_s
          WHERE lrow.nxt_s IS NOT NULL AND ls.nxt_l IS NOT NULL),
        scored AS (
          SELECT ch.user_id, ch.a_idx, ch.start_us, ch.k, lr.nxt_c AS c_idx
          FROM chain ch
          JOIN nx lr ON lr.user_id = ch.user_id AND lr.idx = ch.l_idx
          WHERE lr.nxt_c IS NOT NULL),
        best AS (
          SELECT user_id, a_idx, start_us, MAX(k) AS k
          FROM scored GROUP BY user_id, a_idx, start_us)
        SELECT b.user_id, b.start_us, cr.tu AS end_us,
               b.k AS n_a, b.k AS n_b, CAST(1 AS BIGINT) AS n_c
        FROM best b
        JOIN scored sc ON sc.user_id = b.user_id AND sc.a_idx = b.a_idx
                          AND sc.k = b.k
        JOIN nx cr ON cr.user_id = b.user_id AND cr.idx = sc.c_idx
        ORDER BY b.user_id, b.start_us
      """.stripMargin.trim)),

    // Reluctant quantifier `b*?` (round 11 — reference
    // match_recognize.md:375-446): a spike (value > 150) followed by as
    // FEW sub-150 rows as possible before the first value > 100. The
    // reluctant preference makes the match end at the FIRST row after
    // the anchor with value > 100 (every gap row is <= 100, hence a
    // valid B) — relationally the "next >100 row" join, which is how
    // the oracle derives it. A greedy `b*` would instead swallow the
    // whole sub-150 run; the two disagree wherever several >100 rows
    // chain, so the oracle genuinely discriminates.
    QueryDef(
      "q_match_recognize_reluctant",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        FlinkSql.sql(s,
          """SELECT user_id, start_us, end_us, n_a, n_b, n_c, c_val
            |FROM ev MATCH_RECOGNIZE (
            |  PARTITION BY user_id
            |  ORDER BY ts_us
            |  MEASURES LAST(c.value) AS c_val
            |  ONE ROW PER MATCH
            |  AFTER MATCH SKIP TO NEXT ROW
            |  PATTERN (a b*? c)
            |  DEFINE a AS a.value > 150, b AS b.value < 150,
            |         c AS c.value > 100
            |)
            |ORDER BY user_id, start_us""".stripMargin,
          Map("ev" -> d))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, value,
                lag(tu) OVER w AS ptu,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        s2 AS (SELECT *, MIN(CASE WHEN value > 100 THEN idx END)
                 OVER (PARTITION BY user_id ORDER BY tu
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                 AS nxt
               FROM s)
        SELECT a.user_id, a.ptu AS start_us, e2.tu AS end_us,
               CAST(1 AS BIGINT) AS n_a,
               CAST(e2.idx - a.idx - 1 AS BIGINT) AS n_b,
               CAST(1 AS BIGINT) AS n_c,
               e2.value AS c_val
        FROM s2 a JOIN s2 e2
          ON e2.user_id = a.user_id AND e2.idx = a.nxt
        WHERE a.value > 150 AND a.ptu IS NOT NULL
        ORDER BY a.user_id, start_us
      """.stripMargin.trim)),

    // AFTER MATCH SKIP TO NEXT ROW: pattern `down+ up` (single rise) with
    // overlapping matches — every anchor inside the falling run yields its
    // own suffix match. The oracle enumerates, per completed run pair, the
    // run-start anchor plus one anchor per interior D-row.
    QueryDef(
      "q_match_recognize_skipnext",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        PatternMatch(d, "user_id", "ts_us", "value", Seq(
          PatternStep("down", (p, c) => c < p, greedy = true),
          PatternStep("up", (p, c) => c > p, greedy = false)),
          skip = graft.operators.AfterMatchSkip.ToNextRow)
          .orderBy(col("user_id"), col("start_us"), col("n_down"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, value,
                lag(tu) OVER w AS ptu, lag(value) OVER w AS pv,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN value < pv THEN 'D'
                              WHEN value > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir IS NOT NULL
                                  AND (pdir IS NULL OR pdir <> dir)
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2 WHERE dir IS NOT NULL),
        runs AS (
          SELECT user_id, runid, dir,
                 COUNT(*) AS n,
                 MIN(idx) AS first_idx, MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_tu
          FROM r GROUP BY user_id, runid, dir),
        matches AS (
          SELECT dr.user_id, dr.runid, dr.n, dr.first_idx, dr.last_idx,
                 dr.start_tu, nxt.tu AS end_tu
          FROM runs dr JOIN r nxt
            ON nxt.user_id = dr.user_id AND nxt.idx = dr.last_idx + 1
               AND nxt.dir = 'U'
          WHERE dr.dir = 'D')
        SELECT user_id, start_tu AS start_us, end_tu AS end_us,
               n AS n_down, CAST(1 AS BIGINT) AS n_up
        FROM matches
        UNION ALL
        SELECT m.user_id, rr.tu, m.end_tu, m.last_idx - rr.idx,
               CAST(1 AS BIGINT)
        FROM matches m JOIN r rr
          ON rr.user_id = m.user_id AND rr.runid = m.runid
             AND rr.idx < m.last_idx
        ORDER BY user_id, start_us, n_down
      """.stripMargin.trim)),

    // Optional step `down+ flat? up+` on 25-bucketed values: a falling
    // run, AT MOST ONE plateau row, then a rising run. Without
    // backtracking a 2+-row plateau aborts the partial match — exactly
    // the islands formulation's f.n = 1 restriction.
    QueryDef(
      "q_match_recognize_opt",
      (s, dir) => {
        PatternMatch(bucketed(s, dir), "user_id", "ts_us", "vb", Seq(
          PatternStep("down", (p, c) => c < p, greedy = true),
          PatternStep("flat", (p, c) => c == p, greedy = false, minCount = 0),
          PatternStep("up", (p, c) => c > p, greedy = true)))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some(s"""
        WITH $bucketedRunsSql
        SELECT d.user_id, d.start_tu AS start_us, u.end_tu AS end_us,
               d.n AS n_down, CAST(0 AS BIGINT) AS n_flat, u.n AS n_up
        FROM runs d JOIN runs u
          ON u.user_id = d.user_id AND d.dir = 'D' AND u.dir = 'U'
             AND u.first_idx = d.last_idx + 1
        UNION ALL
        SELECT d.user_id, d.start_tu, u.end_tu, d.n, f.n, u.n
        FROM runs d
        JOIN runs f ON f.user_id = d.user_id AND d.dir = 'D' AND f.dir = 'E'
                   AND f.first_idx = d.last_idx + 1 AND f.n = 1
        JOIN runs u ON u.user_id = d.user_id AND u.dir = 'U'
                   AND u.first_idx = f.last_idx + 1
        ORDER BY user_id, start_us
      """.stripMargin.trim)),

    // Kleene star `down+ flat* up+`: any-length plateau (including none)
    // between the falling and rising runs; n_flat counts the plateau rows.
    QueryDef(
      "q_match_recognize_star",
      (s, dir) => {
        PatternMatch(bucketed(s, dir), "user_id", "ts_us", "vb", Seq(
          PatternStep("down", (p, c) => c < p, greedy = true),
          PatternStep("flat", (p, c) => c == p, greedy = true, minCount = 0),
          PatternStep("up", (p, c) => c > p, greedy = true)))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some(s"""
        WITH $bucketedRunsSql
        SELECT d.user_id, d.start_tu AS start_us, u.end_tu AS end_us,
               d.n AS n_down, CAST(0 AS BIGINT) AS n_flat, u.n AS n_up
        FROM runs d JOIN runs u
          ON u.user_id = d.user_id AND d.dir = 'D' AND u.dir = 'U'
             AND u.first_idx = d.last_idx + 1
        UNION ALL
        SELECT d.user_id, d.start_tu, u.end_tu, d.n, f.n, u.n
        FROM runs d
        JOIN runs f ON f.user_id = d.user_id AND d.dir = 'D' AND f.dir = 'E'
                   AND f.first_idx = d.last_idx + 1
        JOIN runs u ON u.user_id = d.user_id AND u.dir = 'U'
                   AND u.first_idx = f.last_idx + 1
        ORDER BY user_id, start_us
      """.stripMargin.trim)),

    // OR-combined condition (Flink CEP's RichOrCondition alternation):
    // `calm+ spike` where spike is a >=2-bucket jump in EITHER direction.
    QueryDef(
      "q_match_recognize_alt",
      (s, dir) => {
        PatternMatch(bucketed(s, dir), "user_id", "ts_us", "vb", Seq(
          PatternStep("calm", (p, c) => math.abs(c - p) < 2, greedy = true),
          PatternStep("spike", PatternStep.or(
            (p, c) => c - p >= 2,
            (p, c) => p - c >= 2), greedy = false)))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some(s"""
        WITH $bucketedPrologueSql,
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN abs(vb - pv) >= 2 THEN 'S'
                              ELSE 'C' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir IS NOT NULL
                                  AND (pdir IS NULL OR pdir <> dir)
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2 WHERE dir IS NOT NULL),
        runs AS (
          SELECT user_id, runid, dir, COUNT(*) AS n,
                 MIN(idx) AS first_idx, MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_tu, arg_max(tu, idx) AS end_tu
          FROM r GROUP BY user_id, runid, dir)
        SELECT c.user_id, c.start_tu AS start_us, sp.tu AS end_us,
               c.n AS n_calm, CAST(1 AS BIGINT) AS n_spike
        FROM runs c JOIN r sp
          ON sp.user_id = c.user_id AND sp.idx = c.last_idx + 1
             AND sp.dir = 'S'
        WHERE c.dir = 'C'
        ORDER BY c.user_id, start_us
      """.stripMargin.trim)),

    // Concurrent-run NFA (CepNfa): pattern `a+ b` where a = non-increasing
    // and b = flat — every flat pair satisfies BOTH steps, so the match
    // requires greedy BACKTRACKING (the deterministic engine finds nothing:
    // a+ swallows the flats and dies at the rise). A match is a maximal
    // non-rising island whose LAST flat pair becomes b; n_a counts the
    // pairs before it. The oracle derives exactly that via islands of
    // non-U pairs and their last E position (rel position >= 2).
    QueryDef(
      "q_cep_backtrack",
      (s, dir) => {
        CepNfa.single(bucketed(s, dir), "user_id", "ts_us", "vb", Seq(
          PatternStep("a", (p, c) => c <= p, greedy = true),
          PatternStep("b", (p, c) => c == p, greedy = false)))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some(s"""
        WITH $bucketedPrologueSql,
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN vb > pv THEN 'U'
                              WHEN vb < pv THEN 'D' ELSE 'E' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir <> 'U'
                                  AND (pdir IS NULL OR pdir = 'U')
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2 WHERE dir IS NOT NULL),
        ni AS (SELECT * FROM r WHERE dir <> 'U'),
        isl AS (SELECT user_id, runid, MIN(idx) AS first_idx,
                       arg_min(ptu, idx) AS start_tu
                FROM ni GROUP BY user_id, runid),
        le AS (SELECT user_id, runid, MAX(idx) AS e_idx
               FROM ni WHERE dir = 'E' GROUP BY user_id, runid)
        SELECT i.user_id, i.start_tu AS start_us, x.tu AS end_us,
               CAST(le.e_idx - i.first_idx AS BIGINT) AS n_a,
               CAST(1 AS BIGINT) AS n_b
        FROM isl i
        JOIN le ON le.user_id = i.user_id AND le.runid = i.runid
        JOIN ni x ON x.user_id = i.user_id AND x.runid = i.runid
               AND x.idx = le.e_idx
        WHERE le.e_idx >= i.first_idx + 1
        ORDER BY i.user_id, start_us
      """.stripMargin.trim)),

    // PERMUTE(up, down) after a calm run: a >=2-bucket jump and a
    // >=2-bucket drop in EITHER order — the two orderings are mutually
    // exclusive per row, so the union expansion is exact. The oracle takes
    // each maximal calm run and checks the next two rows for
    // opposite-direction spikes.
    QueryDef(
      "q_match_recognize_permute",
      (s, dir) => {
        PatternMatch.permute(bucketed(s, dir), "user_id", "ts_us", "vb",
          prefix = Seq(
            PatternStep("calm", (p, c) => math.abs(c - p) < 2, greedy = true)),
          permuted = Seq(
            PatternStep("up", (p, c) => c - p >= 2, greedy = false),
            PatternStep("down", (p, c) => p - c >= 2, greedy = false)))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some(s"""
        WITH $bucketedPrologueSql,
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN vb - pv >= 2 THEN 'U'
                              WHEN pv - vb >= 2 THEN 'D'
                              ELSE 'C' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir IS NOT NULL
                                  AND (pdir IS NULL OR pdir <> dir)
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2 WHERE dir IS NOT NULL),
        runs AS (
          SELECT user_id, runid, dir, COUNT(*) AS n,
                 MIN(idx) AS first_idx, MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_tu
          FROM r GROUP BY user_id, runid, dir)
        SELECT c.user_id, c.start_tu AS start_us, s2nd.tu AS end_us,
               c.n AS n_calm, CAST(1 AS BIGINT) AS n_up,
               CAST(1 AS BIGINT) AS n_down
        FROM runs c
        JOIN r s1st ON s1st.user_id = c.user_id
                   AND s1st.idx = c.last_idx + 1
                   AND s1st.dir IN ('U', 'D')
        JOIN r s2nd ON s2nd.user_id = c.user_id
                   AND s2nd.idx = c.last_idx + 2
                   AND s2nd.dir IN ('U', 'D') AND s2nd.dir <> s1st.dir
        WHERE c.dir = 'C'
        ORDER BY c.user_id, start_us
      """.stripMargin.trim)),

    // Nested GROUP pattern `(down up)+` (GroupPattern.java): a maximal
    // alternating sequence of strictly-falling then strictly-rising pairs,
    // greedy in the iteration count, matches non-overlapping with
    // earliest-anchor priority. The oracle is an independent REGEX
    // formulation: classify each consecutive pair D/U/E, concatenate per
    // user in time order, and take the leftmost non-overlapping greedy
    // matches of (DU)+ — exactly the NFA's PastLastRow semantics in pair
    // space. Compared as the per-user multiset of match sizes.
    QueryDef(
      "q_cep_group",
      (s, dir) => {
        val m = CepNfa.nested(bucketed(s, dir), "user_id", "ts_us", "vb",
          Seq(Seq(CepNfa.groupOf(Seq(
            PatternStep("down", (p, c) => c < p, greedy = false),
            PatternStep("up", (p, c) => c > p, greedy = false))))))
        m.groupBy(col("user_id"), col("n_down"), col("n_up"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("user_id"), col("n_down"))
      },
      Some(s"""
        WITH $bucketedPrologueSql,
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN vb < pv THEN 'D'
                              WHEN vb > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        pstr AS (SELECT user_id, string_agg(dir, '' ORDER BY tu) AS ps
                 FROM sd WHERE dir IS NOT NULL GROUP BY user_id),
        m AS (SELECT user_id, unnest(regexp_extract_all(ps, '(?:DU)+')) AS mm
              FROM pstr)
        SELECT user_id, CAST(length(mm) // 2 AS BIGINT) AS n_down,
               CAST(length(mm) // 2 AS BIGINT) AS n_up,
               COUNT(*) AS cnt
        FROM m GROUP BY 1, 2, 3
        ORDER BY user_id, n_down
      """.stripMargin.trim)),

    // Groups INSIDE groups — ((D U)+ E){2,}: at least two outer
    // iterations, each a maximal run of strictly-alternating down/up
    // pairs closed by a flat pair. The alphabet (vb<pv / vb>pv / vb=pv)
    // is transition-exclusive, so the NFA's greedy PastLastRow matches
    // are exactly the leftmost greedy non-overlapping regex matches of
    // ((DU)+E){2,} over the per-user pair string — an independent
    // formulation. Compared as the per-user multiset of step counts.
    QueryDef(
      "q_cep_nested2",
      (s, dir) => {
        val down = PatternStep("down", (p, c) => c < p, greedy = false)
        val up = PatternStep("up", (p, c) => c > p, greedy = false)
        val flat = PatternStep("flat", (p, c) => c == p, greedy = false)
        val m = CepNfa.nested(bucketed(s, dir), "user_id", "ts_us", "vb",
          Seq(Seq(CepNfa.GroupElem(Seq(
            CepNfa.groupOf(Seq(down, up)),
            CepNfa.Atom(flat)), minIters = 2))))
        m.groupBy(col("user_id"), col("n_down"), col("n_up"), col("n_flat"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("user_id"), col("n_down"), col("n_flat"))
      },
      Some(s"""
        WITH $bucketedPrologueSql,
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN vb < pv THEN 'D'
                              WHEN vb > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        pstr AS (SELECT user_id, string_agg(dir, '' ORDER BY tu) AS ps
                 FROM sd WHERE dir IS NOT NULL GROUP BY user_id),
        m AS (SELECT user_id,
                     unnest(regexp_extract_all(ps, '(?:(?:DU)+E){2,}')) AS mm
              FROM pstr),
        c AS (SELECT user_id,
                     length(mm) - length(replace(mm, 'E', '')) AS ne,
                     length(mm) AS lm
              FROM m)
        SELECT user_id, CAST((lm - ne) // 2 AS BIGINT) AS n_down,
               CAST((lm - ne) // 2 AS BIGINT) AS n_up,
               CAST(ne AS BIGINT) AS n_flat,
               COUNT(*) AS cnt
        FROM c GROUP BY 1, 2, 3, 4
        ORDER BY user_id, n_down, n_flat
      """.stripMargin.trim)),

    // MEASURES clause: per-variable aggregates over each match's rows —
    // min/sum/first of the falling run's values and the rise row's value
    // (FIRST/LAST/aggregate per CLASSIFIER in the reference). Values are
    // floored to integers so sums are exact in any accumulation order.
    QueryDef(
      "q_cep_measures",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
          .withColumn("vf", floor(col("value")).cast("double"))
        CepNfa.nested(d, "user_id", "ts_us", "vf", Seq(Seq(
          CepNfa.Atom(PatternStep("down", (p, c) => c < p, greedy = true)),
          CepNfa.Atom(PatternStep("up", (p, c) => c > p, greedy = false)))),
          measures = Seq(
            CepNfa.MeasureSpec("min", "down", "min_down"),
            CepNfa.MeasureSpec("sum", "down", "sum_down"),
            CepNfa.MeasureSpec("first", "down", "first_down"),
            CepNfa.MeasureSpec("last", "up", "last_up")))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu,
                 CAST(FLOOR(value) AS DOUBLE) AS vf,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, vf FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, vf,
                lag(tu) OVER w AS ptu, lag(vf) OVER w AS pv,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN vf < pv THEN 'D'
                              WHEN vf > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir = 'D'
                                  AND (pdir IS NULL OR pdir <> 'D')
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2),
        druns AS (
          SELECT user_id, runid,
                 COUNT(*) AS n_down,
                 MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_us,
                 MIN(vf) AS min_down,
                 SUM(vf) AS sum_down,
                 arg_min(vf, idx) AS first_down
          FROM r WHERE dir = 'D' GROUP BY user_id, runid)
        SELECT d.user_id, d.start_us, nxt.tu AS end_us, d.n_down,
               CAST(1 AS BIGINT) AS n_up, d.min_down, d.sum_down,
               d.first_down, nxt.vf AS last_up
        FROM druns d JOIN r nxt
          ON nxt.user_id = d.user_id AND nxt.idx = d.last_idx + 1
             AND nxt.dir = 'U'
        ORDER BY d.user_id, d.start_us
      """.stripMargin.trim)),

    // AFTER MATCH SKIP TO LAST <var> (SkipToLastStrategy.java): pattern
    // `low+ high` over absolute value buckets (low: vb<=7, high: vb>=12;
    // 8..11 neutral). Per low-island of m matchable rows followed
    // immediately by a high row, the strategy emits the greedy full match
    // AND the overlap restarting at the last low row (m>=2) — partials
    // whose first row precedes the last low row are pruned, ones starting
    // AT it survive. The oracle replays exactly that island algebra.
    QueryDef(
      "q_cep_skip_to_last",
      (s, dir) => {
        CepNfa.single(bucketed(s, dir), "user_id", "ts_us", "vb", Seq(
          PatternStep("low", (_, c) => c <= 7.0, greedy = true),
          PatternStep("high", (_, c) => c >= 12.0, greedy = false)),
          None, AfterMatchSkip.ToLast("low"))
          .orderBy(col("user_id"), col("start_us"), col("n_low"))
      },
      Some(s"""
        WITH $bucketedPrologueSql,
        cl AS (SELECT *, CASE WHEN vb <= 7 THEN 'L'
                              WHEN vb >= 12 THEN 'H' ELSE 'N' END AS cls,
                      lag(CASE WHEN vb <= 7 THEN 'L'
                               WHEN vb >= 12 THEN 'H' ELSE 'N' END)
                        OVER (PARTITION BY user_id ORDER BY tu) AS pcls
               FROM s),
        r AS (SELECT *, SUM(CASE WHEN cls = 'L'
                                  AND (pcls IS NULL OR pcls <> 'L')
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM cl),
        isl AS (
          SELECT user_id, runid, MAX(idx) AS last_idx,
                 COUNT(*) FILTER (WHERE idx >= 2) AS m,
                 arg_min(ptu, idx) FILTER (WHERE idx >= 2) AS start_full,
                 arg_max(ptu, idx) AS start_sfx
          FROM r WHERE cls = 'L' GROUP BY user_id, runid),
        sel AS (
          SELECT i.user_id, i.m, i.start_full, i.start_sfx, h.tu AS end_tu
          FROM isl i JOIN r h
            ON h.user_id = i.user_id AND h.idx = i.last_idx + 1
               AND h.cls = 'H'
          WHERE i.m >= 1)
        SELECT user_id, start_full AS start_us, end_tu AS end_us,
               CAST(m AS BIGINT) AS n_low, CAST(1 AS BIGINT) AS n_high
        FROM sel
        UNION ALL
        SELECT user_id, start_sfx, end_tu, 1, 1 FROM sel WHERE m >= 2
        ORDER BY user_id, start_us, n_low
      """.stripMargin.trim)),

    // AFTER MATCH SKIP TO FIRST <var> (SkipToFirstStrategy.java): with
    // the skip target at the match's own first row, every later anchor
    // survives each emission — the full overlap set. Per island, every
    // matchable low row anchors one emitted match covering the lows from
    // it through the high row.
    QueryDef(
      "q_cep_skip_to_first",
      (s, dir) => {
        CepNfa.single(bucketed(s, dir), "user_id", "ts_us", "vb", Seq(
          PatternStep("low", (_, c) => c <= 7.0, greedy = true),
          PatternStep("high", (_, c) => c >= 12.0, greedy = false)),
          None, AfterMatchSkip.ToFirst("low"))
          .orderBy(col("user_id"), col("start_us"), col("n_low"))
      },
      Some(s"""
        WITH $bucketedPrologueSql,
        cl AS (SELECT *, CASE WHEN vb <= 7 THEN 'L'
                              WHEN vb >= 12 THEN 'H' ELSE 'N' END AS cls,
                      lag(CASE WHEN vb <= 7 THEN 'L'
                               WHEN vb >= 12 THEN 'H' ELSE 'N' END)
                        OVER (PARTITION BY user_id ORDER BY tu) AS pcls
               FROM s),
        r AS (SELECT *, SUM(CASE WHEN cls = 'L'
                                  AND (pcls IS NULL OR pcls <> 'L')
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM cl),
        isl AS (
          SELECT user_id, runid, MAX(idx) AS last_idx
          FROM r WHERE cls = 'L' GROUP BY user_id, runid)
        SELECT l.user_id, l.ptu AS start_us, h.tu AS end_us,
               CAST(i.last_idx - l.idx + 1 AS BIGINT) AS n_low,
               CAST(1 AS BIGINT) AS n_high
        FROM r l
        JOIN isl i ON i.user_id = l.user_id AND i.runid = l.runid
        JOIN r h ON h.user_id = i.user_id AND h.idx = i.last_idx + 1
               AND h.cls = 'H'
        WHERE l.cls = 'L' AND l.idx >= 2
        ORDER BY l.user_id, start_us, n_low
      """.stripMargin.trim)),

    // Multi-attribute Pattern-API conditions (round 10): the reference's
    // conditions see the WHOLE event (SimpleCondition.of(event -> …)) —
    // a spike followed by the first event that is BOTH a lull (value)
    // AND high-severity (event_id-derived attribute), via whereRow over
    // the (value, sev) vector. Replay: first later row satisfying both.
    QueryDef(
      "q_cep_multicol",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
          .withColumn("sev", (col("event_id") % 4).cast("double"))
        CepPattern.applyCols(d, "user_id", "ts_us", Seq("value", "sev"),
          Seq(CepPattern.begin("a").where(_ >= 150.0)
            .followedBy("b").whereRow(vs => vs(0) <= 2.0 && vs(1) >= 2.0)
            .build()))
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 CAST(event_id % 4 AS DOUBLE) AS sev,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value, sev FROM e WHERE dd = 1),
        a AS (SELECT user_id, tu FROM d WHERE value >= 150),
        b AS (SELECT user_id, tu FROM d WHERE value <= 2 AND sev >= 2)
        SELECT a.user_id, a.tu AS start_us, MIN(b.tu) AS end_us,
               CAST(1 AS BIGINT) AS n_a, CAST(1 AS BIGINT) AS n_b
        FROM a JOIN b ON b.user_id = a.user_id AND b.tu > a.tu
        GROUP BY a.user_id, a.tu ORDER BY a.user_id, start_us
      """.stripMargin.trim)),

    // PREVIOUS_AND_CURRENT within (Pattern.within(Duration, WithinType),
    // Flink 1.16): spike followedBy lull with the CONSECUTIVE-event gap
    // bounded by 12h. followedBy takes the FIRST later lull; a first
    // lull beyond the gap kills the run (no retry with a closer row),
    // so the replay is min-lookup + gap filter.
    QueryDef(
      "q_cep_within_gap",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        CepPattern(d, "user_id", "ts_us", "value",
          CepPattern.begin("a").where(_ >= 150.0)
            .followedBy("b").where(_ <= 2.0)
            .withinGap(12L * 3600L * 1000000L).build())
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        a AS (SELECT user_id, tu FROM d WHERE value >= 150),
        b AS (SELECT user_id, tu FROM d WHERE value <= 2)
        SELECT user_id, start_us, end_us,
               CAST(1 AS BIGINT) AS n_a, CAST(1 AS BIGINT) AS n_b
        FROM (
          SELECT a.user_id, a.tu AS start_us, MIN(b.tu) AS end_us
          FROM a JOIN b ON b.user_id = a.user_id AND b.tu > a.tu
          GROUP BY a.user_id, a.tu)
        WHERE end_us - start_us <= 43200000000
        ORDER BY user_id, start_us
      """.stripMargin.trim)),

    // Group pattern (GroupPattern.java — Pattern.begin(Pattern).times):
    // (spike lull){1,2} with relaxed first-match links. Each anchor's
    // run is deterministic (followedBy takes the FIRST later match), so
    // the replay is a chain of correlated min() lookups: b1 = first
    // lull after the spike, a2 = first spike after b1, b2 = first lull
    // after a2; the {1,2} range unions both iteration counts (NoSkip).
    QueryDef(
      "q_cep_group_times",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
        val d = Dedup.keepFirst(e,
          Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
        val grp = CepPattern.begin("a").where(_ >= 150.0)
          .followedBy("b").where(_ <= 2.0)
        CepPattern.applyAll(d, "user_id", "ts_us", "value",
          CepPattern.begin(grp).times(1, 2).buildAll())
          .orderBy(col("user_id"), col("start_us"), col("n_a"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu, value,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, value FROM e WHERE dd = 1),
        a AS (SELECT user_id, tu FROM d WHERE value >= 150),
        b AS (SELECT user_id, tu FROM d WHERE value <= 2),
        m1 AS (SELECT a.user_id, a.tu AS t1,
                 (SELECT min(b.tu) FROM b
                  WHERE b.user_id = a.user_id AND b.tu > a.tu) AS t2
               FROM a),
        m2 AS (SELECT m1.user_id, t1, t2,
                 (SELECT min(a2.tu) FROM a a2
                  WHERE a2.user_id = m1.user_id AND a2.tu > t2) AS t3
               FROM m1 WHERE t2 IS NOT NULL),
        m3 AS (SELECT m2.user_id, t1, t2, t3,
                 (SELECT min(b2.tu) FROM b b2
                  WHERE b2.user_id = m2.user_id AND b2.tu > t3) AS t4
               FROM m2 WHERE t3 IS NOT NULL)
        SELECT user_id, t1 AS start_us, t2 AS end_us,
               CAST(1 AS BIGINT) AS n_a, CAST(1 AS BIGINT) AS n_b
        FROM m1 WHERE t2 IS NOT NULL
        UNION ALL
        SELECT user_id, t1, t4, CAST(2 AS BIGINT), CAST(2 AS BIGINT)
        FROM m3 WHERE t4 IS NOT NULL
        ORDER BY user_id, start_us, n_a
      """.stripMargin.trim))
  )

  /** Deduped events with the 25-bucketed measure column `vb`. */
  private def bucketed(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
    Dedup.keepFirst(e, Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))
      .withColumn("vb", floor(col("value") / 25).cast("double"))
  }

  /** Shared oracle prologue: dedup + bucket + lag/idx frame. */
  private def bucketedPrologueSql = """e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS tu,
                 CAST(floor(value / 25) AS DOUBLE) AS vb,
                 row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 1000
                                    ORDER BY event_id) AS dd
          FROM events),
        d AS (SELECT user_id, tu, vb FROM e WHERE dd = 1),
        s AS (SELECT user_id, tu, vb,
                lag(tu) OVER w AS ptu, lag(vb) OVER w AS pv,
                row_number() OVER w AS idx
              FROM d WINDOW w AS (PARTITION BY user_id ORDER BY tu))"""

  /** Prologue + D/E/U classification + maximal-run islands. */
  private def bucketedRunsSql = s"""$bucketedPrologueSql,
        sd AS (SELECT *, CASE WHEN pv IS NULL THEN NULL
                              WHEN vb < pv THEN 'D'
                              WHEN vb > pv THEN 'U' ELSE 'E' END AS dir
               FROM s),
        s2 AS (SELECT *, lag(dir) OVER (PARTITION BY user_id ORDER BY tu)
                 AS pdir FROM sd),
        r AS (SELECT *, SUM(CASE WHEN dir IS NOT NULL
                                  AND (pdir IS NULL OR pdir <> dir)
                                 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY tu
                      ROWS UNBOUNDED PRECEDING) AS runid
              FROM s2 WHERE dir IS NOT NULL),
        runs AS (
          SELECT user_id, runid, dir, COUNT(*) AS n,
                 MIN(idx) AS first_idx, MAX(idx) AS last_idx,
                 arg_min(ptu, idx) AS start_tu, arg_max(tu, idx) AS end_tu
          FROM r GROUP BY user_id, runid, dir)"""
}
