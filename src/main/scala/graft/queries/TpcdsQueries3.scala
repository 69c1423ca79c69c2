package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS query-shape pack, part 3 (see [[TpcdsQueries]] for the schema
  * adaptation rules and determinism conventions).
  *
  * Shapes here: cumulative running sums FULL OUTER JOINed across channels
  * (q51), three-channel within-10%-of-average equality (q58), an
  * aggregated CTE self-joined across two years with a growth filter
  * (q64), ROLLUP over a 4-deep hierarchy with top-k rank per ancestor
  * (q67), rank-gated geography rollup whose qualifying set comes from a
  * windowed subquery (q70), unreturned-sales via LEFT JOIN + IS NULL with
  * a cross-channel ratio (q78), the single-row multi-bucket cross-tab
  * over the events stream table (q88), refund-adjusted order totals
  * (q93), and the ≥2-distinct-suppliers EXISTS composition (q95).
  */
object TpcdsQueries3 {

  import TpcdsQueries.{rev, fpSum, sqlFpSum, money, sqlMoney, channelCol,
    sqlChannel}

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q51
    // TPC-DS q51 shape: per-brand monthly cumulative revenue in the web
    // and store channels, FULL OUTER JOINed on (brand, month), keeping
    // months where the web running total overtakes the store running
    // total. Cumulative sums are fixed-point longs — exact.
    QueryDef(
      "q_tpcds_q51",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .where(year(col("o_orderdate")) === 1997)
        def channel(m: Int, pre: String) = {
          val w = Window.partitionBy(col("brand"))
            .orderBy(col("mo"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          l.where(col("l_linenumber") % 3 === m)
            .groupBy(col("p_brand").as("brand"),
              month(col("o_orderdate")).cast("int").as("mo"))
            .agg(fpSum(expr(rev)).as("sales"))
            .select(col("brand").as(s"${pre}_brand"),
              col("mo").as(s"${pre}_mo"),
              sum(col("sales")).over(w).as(s"${pre}_cum"))
        }
        channel(2, "web")
          .join(channel(1, "store"),
            col("web_brand") === col("store_brand") &&
              col("web_mo") === col("store_mo"), "full_outer")
          .where(col("web_cum").isNotNull && col("store_cum").isNotNull &&
            col("web_cum") > col("store_cum"))
          .select(col("web_brand").as("brand"), col("web_mo").as("mo"),
            (col("web_cum").cast("double") / 1e4).as("web_cumulative"),
            (col("store_cum").cast("double") / 1e4).as("store_cumulative"))
          .orderBy(col("brand"), col("mo"))
      },
      Some {
        def side(m: Int): String =
          s"""SELECT brand, mo,
             CAST(SUM(sales) OVER (PARTITION BY brand ORDER BY mo
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             FROM (SELECT p_brand AS brand,
                     CAST(month(o_orderdate) AS INT) AS mo,
                     ${sqlFpSum(rev)} AS sales
                   FROM lineitem, orders, part
                   WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
                     AND year(o_orderdate) = 1997 AND l_linenumber % 3 = $m
                   GROUP BY 1, 2) t"""
        s"""WITH web AS (${side(2)}), store AS (${side(1)})
           SELECT web.brand AS brand, web.mo AS mo,
                  CAST(web.cum AS DOUBLE) / 1e4 AS web_cumulative,
                  CAST(store.cum AS DOUBLE) / 1e4 AS store_cumulative
           FROM web FULL OUTER JOIN store
             ON web.brand = store.brand AND web.mo = store.mo
           WHERE web.cum IS NOT NULL AND store.cum IS NOT NULL
             AND web.cum > store.cum
           ORDER BY brand, mo""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q58
    // TPC-DS q58 shape: items whose revenue is balanced across all three
    // channels — each channel's revenue within ±10% of the three-channel
    // average.
    QueryDef(
      "q_tpcds_q58",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        def ch(m: Int, pre: String) =
          l.where(col("l_linenumber") % 3 === m)
            .groupBy(col("l_partkey").as(s"${pre}_item"))
            .agg(fpSum(expr(rev)).as(s"${pre}_rev"))
        ch(1, "ss").join(ch(2, "ws"), col("ss_item") === col("ws_item"))
          .join(ch(0, "cs"), col("ss_item") === col("cs_item"))
          .withColumn("average",
            (col("ss_rev") + col("ws_rev") + col("cs_rev")).cast("double") / 3)
          .where(
            col("ss_rev").cast("double").between(
              col("average") * 0.9, col("average") * 1.1) &&
            col("ws_rev").cast("double").between(
              col("average") * 0.9, col("average") * 1.1) &&
            col("cs_rev").cast("double").between(
              col("average") * 0.9, col("average") * 1.1))
          .select(col("ss_item").as("item"),
            (col("ss_rev").cast("double") / 1e4).as("ss_revenue"),
            (col("ws_rev").cast("double") / 1e4).as("ws_revenue"),
            (col("cs_rev").cast("double") / 1e4).as("cs_revenue"))
          .orderBy(col("item"))
      },
      Some {
        def side(m: Int, pre: String): String =
          s"""SELECT l_partkey AS ${pre}_item,
             ${sqlFpSum(rev)} AS ${pre}_rev
             FROM lineitem WHERE l_linenumber % 3 = $m GROUP BY 1"""
        s"""WITH ss AS (${side(1, "ss")}), ws AS (${side(2, "ws")}),
                cs AS (${side(0, "cs")})
           SELECT ss_item AS item,
                  CAST(ss_rev AS DOUBLE) / 1e4 AS ss_revenue,
                  CAST(ws_rev AS DOUBLE) / 1e4 AS ws_revenue,
                  CAST(cs_rev AS DOUBLE) / 1e4 AS cs_revenue
           FROM ss, ws, cs
           WHERE ss_item = ws_item AND ss_item = cs_item
             AND CAST(ss_rev AS DOUBLE)
                 BETWEEN CAST(ss_rev + ws_rev + cs_rev AS DOUBLE) / 3 * 0.9
                     AND CAST(ss_rev + ws_rev + cs_rev AS DOUBLE) / 3 * 1.1
             AND CAST(ws_rev AS DOUBLE)
                 BETWEEN CAST(ss_rev + ws_rev + cs_rev AS DOUBLE) / 3 * 0.9
                     AND CAST(ss_rev + ws_rev + cs_rev AS DOUBLE) / 3 * 1.1
             AND CAST(cs_rev AS DOUBLE)
                 BETWEEN CAST(ss_rev + ws_rev + cs_rev AS DOUBLE) / 3 * 0.9
                     AND CAST(ss_rev + ws_rev + cs_rev AS DOUBLE) / 3 * 1.1
           ORDER BY item""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q64
    // TPC-DS q64 shape: the aggregated sales CTE self-joined across two
    // consecutive years on the item, keeping items whose revenue grew by
    // more than 20%, with the item dimension joined for attributes.
    QueryDef(
      "q_tpcds_q64",
      (s, dir) => {
        val cs = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .where(year(col("o_orderdate")).isin(1996, 1997))
          .groupBy(col("l_partkey").as("item"),
            year(col("o_orderdate")).cast("int").as("yr"))
          .agg(count(lit(1)).as("cnt"), fpSum(expr(rev)).as("sales"))
        val y1 = cs.where(col("yr") === 1996)
          .select(col("item").as("i1"), col("cnt").as("cnt1"),
            col("sales").as("sales1"))
        val y2 = cs.where(col("yr") === 1997)
          .select(col("item").as("i2"), col("cnt").as("cnt2"),
            col("sales").as("sales2"))
        y1.join(y2, col("i1") === col("i2"))
          .where(col("sales2").cast("double") > col("sales1") * 1.2)
          .join(broadcast(Tables.part(s, dir)),
            col("i1") === col("p_partkey"))
          .select(col("p_name"), col("p_brand").as("brand"),
            col("cnt1"), col("cnt2"),
            (col("sales1").cast("double") / 1e4).as("sales_1996"),
            (col("sales2").cast("double") / 1e4).as("sales_1997"))
          .orderBy(col("p_name"), col("brand"))
      },
      Some(s"""
        WITH cs AS (
          SELECT l_partkey AS item, CAST(year(o_orderdate) AS INT) AS yr,
                 COUNT(*) AS cnt, ${sqlFpSum(rev)} AS sales
          FROM lineitem, orders
          WHERE l_orderkey = o_orderkey AND year(o_orderdate) IN (1996, 1997)
          GROUP BY 1, 2)
        SELECT p_name, p_brand AS brand,
               CAST(y1.cnt AS BIGINT) AS cnt1, CAST(y2.cnt AS BIGINT) AS cnt2,
               CAST(y1.sales AS DOUBLE) / 1e4 AS sales_1996,
               CAST(y2.sales AS DOUBLE) / 1e4 AS sales_1997
        FROM cs y1, cs y2, part
        WHERE y1.item = y2.item AND y1.yr = 1996 AND y2.yr = 1997
          AND CAST(y2.sales AS DOUBLE) > y1.sales * 1.2
          AND y1.item = p_partkey
        ORDER BY p_name, brand
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q67
    // TPC-DS q67 shape: ROLLUP over the full (type, brand, year, month)
    // hierarchy, then the top 5 rows per type partition by rank.
    QueryDef(
      "q_tpcds_q67",
      (s, dir) => {
        val rolled = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .where(year(col("o_orderdate")).isin(1996, 1997))
          .rollup(col("p_type"), col("p_brand"),
            year(col("o_orderdate")).cast("int").as("yr"),
            month(col("o_orderdate")).cast("int").as("mo"))
          .agg(fpSum(expr(rev)).as("sumsales"))
        rolled.withColumn("rk",
          rank().over(Window.partitionBy(col("p_type"))
            .orderBy(col("sumsales").desc_nulls_last,
              col("p_brand").asc_nulls_first,
              col("yr").asc_nulls_first, col("mo").asc_nulls_first)))
          .where(col("rk") <= 5)
          .select(col("p_type").as("ptype"), col("p_brand").as("brand"),
            col("yr"), col("mo"),
            (col("sumsales").cast("double") / 1e4).as("sumsales"), col("rk"))
          .orderBy(col("ptype").asc_nulls_first, col("rk"))
      },
      Some(s"""
        WITH rolled AS (
          SELECT p_type, p_brand, CAST(year(o_orderdate) AS INT) AS yr,
                 CAST(month(o_orderdate) AS INT) AS mo,
                 ${sqlFpSum(rev)} AS sumsales
          FROM lineitem, orders, part
          WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
            AND year(o_orderdate) IN (1996, 1997)
          GROUP BY ROLLUP(p_type, p_brand, year(o_orderdate),
                          month(o_orderdate)))
        SELECT ptype, brand, yr, mo, sumsales, rk FROM (
          SELECT p_type AS ptype, p_brand AS brand, yr, mo,
                 CAST(sumsales AS DOUBLE) / 1e4 AS sumsales,
                 RANK() OVER (PARTITION BY p_type
                   ORDER BY sumsales DESC NULLS LAST,
                            p_brand ASC NULLS FIRST,
                            yr ASC NULLS FIRST, mo ASC NULLS FIRST) AS rk
          FROM rolled) t
        WHERE rk <= 5
        ORDER BY ptype NULLS FIRST, rk
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q70
    // TPC-DS q70 shape: profit ROLLUP over (region, nation) restricted to
    // nations in the top 3 by profit WITHIN their region (a windowed
    // subquery feeding the main rollup), with rank within grouping level.
    QueryDef(
      "q_tpcds_q70",
      (s, dir) => {
        val fact = Tables.lineitem(s, dir)
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey"))
        val topNations = fact
          .groupBy(col("r_name").as("tr"), col("n_name").as("tn"))
          .agg(fpSum(expr(rev)).as("profit"))
          .withColumn("rnk", rank().over(Window.partitionBy(col("tr"))
            .orderBy(col("profit").desc, col("tn"))))
          .where(col("rnk") <= 3)
          .select(col("tn"))
        val rolled = fact
          .join(broadcast(topNations), col("n_name") === col("tn"), "left_semi")
          .rollup(col("r_name"), col("n_name"))
          .agg((fpSum(expr(rev)).cast("double") / 1e4).as("total_profit"),
            (grouping(col("r_name")) + grouping(col("n_name")))
              .cast("int").as("lochierarchy"),
            grouping(col("n_name")).cast("int").as("gn"))
        rolled.withColumn("rank_within_parent",
          rank().over(Window
            .partitionBy(col("lochierarchy"),
              when(col("gn") === 0, col("r_name")))
            .orderBy(col("total_profit").desc,
              col("n_name").asc_nulls_first)))
          .select(col("total_profit"), col("r_name").as("region"),
            col("n_name").as("nation"), col("lochierarchy"),
            col("rank_within_parent"))
          .orderBy(col("lochierarchy").desc, col("region").asc_nulls_first,
            col("rank_within_parent"))
      },
      Some(s"""
        WITH top_nations AS (
          SELECT tn FROM (
            SELECT r_name AS tr, n_name AS tn, ${sqlFpSum(rev)} AS profit,
                   RANK() OVER (PARTITION BY r_name
                     ORDER BY ${sqlFpSum(rev)} DESC, n_name) AS rnk
            FROM lineitem, supplier, nation, region
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
            GROUP BY r_name, n_name) t
          WHERE rnk <= 3)
        SELECT total_profit, region, nation, lochierarchy,
               RANK() OVER (
                 PARTITION BY lochierarchy,
                   CASE WHEN gn = 0 THEN region END
                 ORDER BY total_profit DESC,
                          nation ASC NULLS FIRST) AS rank_within_parent
        FROM (
          SELECT CAST(${sqlFpSum(rev)} AS DOUBLE) / 1e4 AS total_profit,
                 r_name AS region, n_name AS nation,
                 CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS lochierarchy,
                 CAST(GROUPING(n_name) AS INT) AS gn
          FROM lineitem, supplier, nation, region
          WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_regionkey = r_regionkey
            AND n_name IN (SELECT tn FROM top_nations)
          GROUP BY ROLLUP(r_name, n_name)) base
        ORDER BY lochierarchy DESC, region NULLS FIRST, rank_within_parent
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q78
    // TPC-DS q78 shape: unreturned sales — the fact LEFT JOINed to the
    // returns set with an IS NULL filter (not an ANTI join in the
    // reference text; the plan is equivalent) — aggregated per (customer,
    // year) in two channels and compared as a ratio.
    QueryDef(
      "q_tpcds_q78",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey",
          "o_orderdate")
        val returns = l.where(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("r_ok"),
            col("l_linenumber").as("r_ln"))
        def channel(m: Int, pre: String) =
          l.where(col("l_linenumber") % 3 === m)
            .join(returns, col("l_orderkey") === col("r_ok") &&
              col("l_linenumber") === col("r_ln"), "left")
            .where(col("r_ok").isNull)
            .join(o, col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("o_custkey").as(s"${pre}_cust"),
              year(col("o_orderdate")).cast("int").as(s"${pre}_yr"))
            .agg(sum(col("l_quantity").cast("long")).as(s"${pre}_qty"),
              fpSum(expr(rev)).as(s"${pre}_amt"))
        channel(1, "ss").join(channel(2, "ws"),
            col("ss_cust") === col("ws_cust") && col("ss_yr") === col("ws_yr"))
          .where(col("ws_qty") > 0)
          .select(col("ss_cust").as("cust"), col("ss_yr").as("yr"),
            (col("ss_qty").cast("double") / col("ws_qty")).as("ratio"),
            col("ss_qty"),
            (col("ss_amt").cast("double") / 1e4).as("ss_amount"))
          .orderBy(col("ratio").desc, col("cust"), col("yr"))
          .limit(100)
      },
      Some {
        def channel(m: Int, pre: String): String =
          s"""SELECT o_custkey AS ${pre}_cust,
             CAST(year(o_orderdate) AS INT) AS ${pre}_yr,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ${pre}_qty,
             ${sqlFpSum(rev)} AS ${pre}_amt
             FROM lineitem LEFT JOIN
               (SELECT l_orderkey AS r_ok, l_linenumber AS r_ln
                FROM lineitem WHERE l_returnflag = 'R') r
               ON l_orderkey = r_ok AND l_linenumber = r_ln
             JOIN orders ON l_orderkey = o_orderkey
             WHERE l_linenumber % 3 = $m AND r_ok IS NULL
             GROUP BY 1, 2"""
        s"""WITH ss AS (${channel(1, "ss")}), ws AS (${channel(2, "ws")})
           SELECT ss_cust AS cust, ss_yr AS yr,
                  CAST(ss_qty AS DOUBLE) / ws_qty AS ratio,
                  ss_qty,
                  CAST(ss_amt AS DOUBLE) / 1e4 AS ss_amount
           FROM ss, ws
           WHERE ss_cust = ws_cust AND ss_yr = ws_yr AND ws_qty > 0
           ORDER BY ratio DESC, cust, yr LIMIT 100""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q88
    // TPC-DS q88 shape: the single-row multi-bucket cross-tab — event
    // counts per time-of-day bucket. The reference text spells this as 8
    // scalar-subquery scans cross-joined; the Spark-first plan is ONE
    // conditional-aggregation pass over the events stream table.
    QueryDef(
      "q_tpcds_q88",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .where(col("event_type").isin("click", "view", "purchase"))
        def bucket(h0: Int, h1: Int) =
          sum(when(hour(col("ts")) >= h0 && hour(col("ts")) < h1, 1L)
            .otherwise(0L))
        e.agg(
          bucket(0, 3).as("h0_3"), bucket(3, 6).as("h3_6"),
          bucket(6, 9).as("h6_9"), bucket(9, 12).as("h9_12"),
          bucket(12, 15).as("h12_15"), bucket(15, 18).as("h15_18"),
          bucket(18, 21).as("h18_21"), bucket(21, 24).as("h21_24"))
      },
      Some {
        def b(h0: Int, h1: Int, as: String): String =
          s"""CAST(SUM(CASE WHEN hour(ts) >= $h0 AND hour(ts) < $h1
             THEN 1 ELSE 0 END) AS BIGINT) AS $as"""
        s"""SELECT ${b(0, 3, "h0_3")}, ${b(3, 6, "h3_6")},
           ${b(6, 9, "h6_9")}, ${b(9, 12, "h9_12")},
           ${b(12, 15, "h12_15")}, ${b(15, 18, "h15_18")},
           ${b(18, 21, "h18_21")}, ${b(21, 24, "h21_24")}
           FROM events
           WHERE event_type IN ('click', 'view', 'purchase')"""
            .stripMargin.trim
      }),

    // --------------------------------------------------------------- q93
    // TPC-DS q93 shape: refund-adjusted customer totals — sales LEFT
    // JOINed to the returns set; matched rows contribute at half value,
    // unmatched at full; top 20 customers.
    QueryDef(
      "q_tpcds_q93",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val returns = l.where(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("r_ok"),
            col("l_linenumber").as("r_ln"))
        l.join(returns, col("l_orderkey") === col("r_ok") &&
            col("l_linenumber") === col("r_ln"), "left")
          .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("cust"))
          .agg((fpSum(when(col("r_ok").isNotNull, expr(s"($rev) * 0.5"))
            .otherwise(expr(rev))).cast("double") / 1e4).as("act_sales"))
          .orderBy(col("act_sales").desc, col("cust"))
          .limit(20)
      },
      Some(s"""
        SELECT o_custkey AS cust,
               CAST(SUM(CAST(floor((CASE WHEN r_ok IS NOT NULL
                 THEN (l_extendedprice * (1 - l_discount)) * 0.5
                 ELSE l_extendedprice * (1 - l_discount) END) * 1e4)
                 AS BIGINT)) AS DOUBLE) / 1e4 AS act_sales
        FROM lineitem LEFT JOIN
          (SELECT l_orderkey AS r_ok, l_linenumber AS r_ln
           FROM lineitem WHERE l_returnflag = 'R') r
          ON l_orderkey = r_ok AND l_linenumber = r_ln
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey
        ORDER BY act_sales DESC, cust LIMIT 20
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q95
    // TPC-DS q95 shape: orders shipped by at least two distinct suppliers
    // that also had a return. The reference text spells the two-supplier
    // test as a self-join EXISTS; the Spark-first plan is a per-order
    // COUNT(DISTINCT supplier) — one shuffle on the order key instead of
    // a fact×fact self-join (the oracle keeps the self-join spelling).
    QueryDef(
      "q_tpcds_q95",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val multiSupp = l.groupBy(col("l_orderkey").as("ms_ok"))
          .agg(countDistinct(col("l_suppkey")).as("nsupp"))
          .where(col("nsupp") >= 2)
          .select(col("ms_ok"))
        val returned = l.where(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("r_ok")).distinct()
        val o = Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        o.join(multiSupp, col("o_orderkey") === col("ms_ok"), "left_semi")
          .join(returned, col("o_orderkey") === col("r_ok"), "left_semi")
          .agg(count(lit(1)).as("order_count"),
            (sum(floor(col("o_totalprice") * 1e4).cast("long"))
              .cast("double") / 1e4).as("total_price"))
      },
      Some("""
        WITH multi_supp AS (
          SELECT DISTINCT ws1.l_orderkey AS ms_ok
          FROM lineitem ws1, lineitem ws2
          WHERE ws1.l_orderkey = ws2.l_orderkey
            AND ws1.l_suppkey <> ws2.l_suppkey)
        SELECT COUNT(*) AS order_count,
               CAST(SUM(CAST(floor(o_totalprice * 1e4) AS BIGINT))
                 AS DOUBLE) / 1e4 AS total_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
          AND o_orderkey IN (SELECT ms_ok FROM multi_supp)
          AND o_orderkey IN (SELECT DISTINCT l_orderkey FROM lineitem
                             WHERE l_returnflag = 'R')
      """.stripMargin.trim))
  )
}
