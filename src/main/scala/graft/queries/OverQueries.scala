package graft.queries

import graft.Tables
import graft.operators.{Dedup, TopN, Windows}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** OVER aggregates, rank/Top-N, dedup, sort/limit (SURVEY.md §2.5).
  * Reference: BatchExecOverAggregate.java:91 + RT/operators/over/frame/,
  * BatchExecRank.java:59, StreamExecDeduplicate.java:94,
  * BatchExecSortLimit.java:65.
  */
object OverQueries {
  import Exact._

  val defs: Seq[QueryDef] = Seq(

    // ROWS frame: running + sliding sums per key. Exact decimal inside the
    // frame, double on output.
    QueryDef(
      "q_over_rows",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        val price = col("o_totalprice").cast(DecimalType(25, 2))
        o.select(
          col("o_custkey"), col("o_orderkey"),
          sum(price).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_sum"),
          sum(price).over(w.rowsBetween(-2, 0)).cast("double").as("sliding_sum3"),
          count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_n"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding_sum3,
          COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        FROM orders ORDER BY o_custkey, o_orderkey
      """.trim)),

    // RANGE frame over a numeric ordering column.
    QueryDef(
      "q_over_range",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
        c.select(
          col("c_nationkey"), col("c_custkey"),
          count(lit(1)).over(w.rangeBetween(-50, 0)).as("n_in_range"),
          sum(col("c_acctbal").cast(DecimalType(25, 2)))
            .over(w.rangeBetween(-50, 0)).cast("double").as("bal_in_range"))
          .orderBy(col("c_nationkey"), col("c_custkey"))
      },
      Some("""
        SELECT c_nationkey, c_custkey,
          COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
               RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS n_in_range,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
               RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS DOUBLE) AS bal_in_range
        FROM customer ORDER BY c_nationkey, c_custkey
      """.trim)),

    // Ranking family. rank/dense_rank depend only on the order key (peer
    // rows share a rank), row_number/ntile need the total order for
    // determinism.
    QueryDef(
      "q_over_rank",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        c.select(
          col("c_nationkey"), col("c_custkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
          .orderBy(col("c_nationkey"), col("c_custkey"))
      },
      Some("""
        SELECT c_nationkey, c_custkey,
          RANK() OVER w AS rnk,
          DENSE_RANK() OVER w AS drnk,
          ROW_NUMBER() OVER w AS rn,
          NTILE(4) OVER w AS quartile,
          PERCENT_RANK() OVER w AS prnk,
          CUME_DIST() OVER w AS cdist
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        ORDER BY c_nationkey, c_custkey
      """.trim)),

    QueryDef(
      "q_over_lag_lead",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        e.select(
          col("user_id"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id,
          LAG(event_type, 1) OVER w AS prev_type,
          LEAD(event_type, 1) OVER w AS next_type,
          epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ORDER BY user_id, event_id
      """.trim)),

    // Top-N per group — WindowGroupLimit prunes to N rows per group
    // map-side before the shuffle (the scale path for rank queries).
    QueryDef(
      "q_topn",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        TopN(o, 3,
          groupBy = Seq(col("o_custkey")),
          order = Seq(col("o_totalprice").desc, col("o_orderkey").asc))
          .select(col("o_custkey"), col("o_orderkey"), col("rank_no"))
          .orderBy(col("o_custkey"), col("rank_no"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, rank_no FROM (
          SELECT o_custkey, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_no
          FROM orders) WHERE rank_no <= 3
        ORDER BY o_custkey, rank_no
      """.trim)),

    // Keep-first / keep-last dedup per key.
    QueryDef(
      "q_dedup_first",
      (s, dir) => {
        val e = Tables.events(s, dir)
        Dedup.keepFirst(e, Seq(col("user_id")),
            Seq(col("ts_us"), col("event_id")))
          .select(col("user_id"), col("event_id"), col("event_type"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, event_id, event_type FROM (
          SELECT user_id, event_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS rn
          FROM events) WHERE rn = 1
        ORDER BY user_id
      """.trim)),

    QueryDef(
      "q_dedup_last",
      (s, dir) => {
        val e = Tables.events(s, dir)
        Dedup.keepLast(e, Seq(col("user_id")),
            Seq(col("ts_us"), col("event_id")))
          .select(col("user_id"), col("event_id"), col("event_type"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, event_id, event_type FROM (
          SELECT user_id, event_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
        ORDER BY user_id
      """.trim)),

    // Window dedup / window rank: per-window variants
    // (StreamExecWindowDeduplicate.java:69, StreamExecWindowRank.java:77).
    QueryDef(
      "q_window_dedup",
      (s, dir) => {
        val e = Windows.withTumble(Tables.events(s, dir), "ts_ns", 3600L * 1000000000L)
        Dedup.keepFirst(e, Seq(col("user_id"), col("window_start")),
            Seq(col("ts_us"), col("event_id")))
          .select(col("user_id"), col("window_start"), col("event_id"))
          .orderBy(col("user_id"), col("window_start"))
      },
      Some("""
        SELECT user_id, window_start, event_id FROM (
          SELECT user_id, event_id,
                 epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS window_start,
                 ROW_NUMBER() OVER (PARTITION BY user_id,
                     epoch_ns(ts) - epoch_ns(ts) % 3600000000000
                   ORDER BY epoch_us(ts), event_id) AS rn
          FROM events) WHERE rn = 1
        ORDER BY user_id, window_start
      """.trim)),

    QueryDef(
      "q_window_rank",
      (s, dir) => {
        val e = Windows.withTumble(Tables.events(s, dir), "ts_ns", 3600L * 1000000000L)
        TopN(e, 2,
          groupBy = Seq(col("window_start")),
          order = Seq(col("value").desc, col("event_id").asc))
          .select(col("window_start"), col("event_id"), col("rank_no"))
          .orderBy(col("window_start"), col("rank_no"))
      },
      Some("""
        SELECT window_start, event_id, rank_no FROM (
          SELECT event_id,
                 epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS window_start,
                 ROW_NUMBER() OVER (PARTITION BY
                     epoch_ns(ts) - epoch_ns(ts) % 3600000000000
                   ORDER BY value DESC, event_id ASC) AS rank_no
          FROM events) WHERE rank_no <= 2
        ORDER BY window_start, rank_no
      """.trim)),

    // Global sort + limit → TakeOrderedAndProject (no full sort at scale).
    QueryDef(
      "q_sort_limit",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice"))
      },
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
      """.trim)),

    // SortLimit with OFFSET (the reference's fetch/offset pair).
    QueryDef(
      "q_sort_limit_offset",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .offset(5)
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice"))
      },
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10 OFFSET 5
      """.trim)),

    // The remaining rank family: DENSE_RANK / PERCENT_RANK / CUME_DIST /
    // NTILE over a totally-ordered partition (unique order keys make all
    // four deterministic and engine-portable).
    QueryDef(
      "q_over_rank2",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            dense_rank().over(w).as("drk"),
            percent_rank().over(w).as("prk"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(w).as("nt"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_orderpriority,
               CAST(dense_rank() OVER w AS BIGINT) AS drk,
               percent_rank() OVER w AS prk,
               cume_dist() OVER w AS cd,
               CAST(ntile(4) OVER w AS INT) AS nt
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
        ORDER BY o_orderkey
      """.trim)),

    // IGNORE NULLS over frames (the reference's FIRST_VALUE/LAST_VALUE/
    // LAG ignore-null forms): "latest click value so far" per user — a
    // sparse signal carried forward across non-click rows.
    QueryDef(
      "q_over_ignore_nulls",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("click_v",
            when(col("event_type") === "click", col("value")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        e.select(
          col("user_id"), col("event_id"),
          last(col("click_v"), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)).as("last_click_v"),
          lag(col("click_v"), 1, null, ignoreNulls = true).over(w)
            .as("prev_click_v"),
          first(col("click_v"), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)).as("first_click_v"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS tu,
            CASE WHEN event_type = 'click' THEN value END AS click_v
          FROM events)
        SELECT user_id, event_id,
          last_value(click_v IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY tu, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS last_click_v,
          lag(click_v, 1 IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY tu, event_id) AS prev_click_v,
          first_value(click_v IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY tu, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS first_click_v
        FROM e ORDER BY user_id, event_id
      """.trim))
  )
}
