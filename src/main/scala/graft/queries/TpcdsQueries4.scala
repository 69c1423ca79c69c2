package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** TPC-DS query-shape pack, part 4 (see [[TpcdsQueries]] for the schema
  * adaptation rules and determinism conventions).
  *
  * Shapes here: the six-instance quarter-over-quarter growth-comparison
  * chain (q31), IN-subquery + OR-of-EXISTS gates feeding a multi-
  * aggregate demographic report (q35), the period-pivot FULL JOIN
  * (monthly columns per year, joined year vs year+1 — q59/q2's
  * structure), OR-of-AND multi-range condition triples across fact and
  * dimension attributes (q85), EXISTS + NOT-EXISTS gated COUNT(DISTINCT)
  * order reporting (q16), the histogram-of-aggregates revenue-band
  * report (q54), the all-anti demographic complement (q69), and
  * share-of-class window ratios (q98).
  */
object TpcdsQueries4 {

  import TpcdsQueries.{rev, fpSum, sqlFpSum, money, sqlMoney}

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q31
    // TPC-DS q31 shape: one aggregated CTE instantiated six ways — store
    // and web sales per (nation, quarter) across Q1→Q2→Q3 1997 — keeping
    // nations whose web growth outpaces store growth in BOTH transitions.
    QueryDef(
      "q_tpcds_q31",
      (s, dir) => {
        val base = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .where(year(col("o_orderdate")) === 1997 &&
            quarter(col("o_orderdate")) <= 3)
          .groupBy(col("n_name").as("nation"),
            quarter(col("o_orderdate")).cast("int").as("qtr"),
            (col("l_linenumber") % 3 === 1).as("is_store"))
          .agg(fpSum(expr(rev)).as("total"))
        def slice(q: Int, store: Boolean, as: String) =
          base.where(col("qtr") === q && col("is_store") === store)
            .select(col("nation").as(s"${as}_n"), col("total").as(as))
        slice(1, store = true, "ss1")
          .join(slice(2, store = true, "ss2"), col("ss1_n") === col("ss2_n"))
          .join(slice(3, store = true, "ss3"), col("ss1_n") === col("ss3_n"))
          .join(slice(1, store = false, "ws1"), col("ss1_n") === col("ws1_n"))
          .join(slice(2, store = false, "ws2"), col("ss1_n") === col("ws2_n"))
          .join(slice(3, store = false, "ws3"), col("ss1_n") === col("ws3_n"))
          .where(col("ss1") > 0 && col("ss2") > 0 &&
            col("ws1") > 0 && col("ws2") > 0)
          .where(col("ws2").cast("double") / col("ws1") >
            col("ss2").cast("double") / col("ss1") &&
            col("ws3").cast("double") / col("ws2") >
            col("ss3").cast("double") / col("ss2"))
          .select(col("ss1_n").as("nation"),
            (col("ws2").cast("double") / col("ws1")).as("web_q1_q2"),
            (col("ss2").cast("double") / col("ss1")).as("store_q1_q2"),
            (col("ws3").cast("double") / col("ws2")).as("web_q2_q3"),
            (col("ss3").cast("double") / col("ss2")).as("store_q2_q3"))
          .orderBy(col("nation"))
      },
      Some(s"""
        WITH base AS (
          SELECT n_name AS nation,
                 CAST(quarter(o_orderdate) AS INT) AS qtr,
                 l_linenumber % 3 = 1 AS is_store,
                 ${sqlFpSum(rev)} AS total
          FROM lineitem, orders, customer, nation
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n_nationkey
            AND year(o_orderdate) = 1997 AND quarter(o_orderdate) <= 3
          GROUP BY 1, 2, 3)
        SELECT ss1.nation AS nation,
               CAST(ws2.total AS DOUBLE) / ws1.total AS web_q1_q2,
               CAST(ss2.total AS DOUBLE) / ss1.total AS store_q1_q2,
               CAST(ws3.total AS DOUBLE) / ws2.total AS web_q2_q3,
               CAST(ss3.total AS DOUBLE) / ss2.total AS store_q2_q3
        FROM base ss1, base ss2, base ss3, base ws1, base ws2, base ws3
        WHERE ss1.nation = ss2.nation AND ss1.nation = ss3.nation
          AND ss1.nation = ws1.nation AND ss1.nation = ws2.nation
          AND ss1.nation = ws3.nation
          AND ss1.is_store AND ss2.is_store AND ss3.is_store
          AND NOT ws1.is_store AND NOT ws2.is_store AND NOT ws3.is_store
          AND ss1.qtr = 1 AND ss2.qtr = 2 AND ss3.qtr = 3
          AND ws1.qtr = 1 AND ws2.qtr = 2 AND ws3.qtr = 3
          AND ss1.total > 0 AND ss2.total > 0
          AND ws1.total > 0 AND ws2.total > 0
          AND CAST(ws2.total AS DOUBLE) / ws1.total
            > CAST(ss2.total AS DOUBLE) / ss1.total
          AND CAST(ws3.total AS DOUBLE) / ws2.total
            > CAST(ss3.total AS DOUBLE) / ss2.total
        ORDER BY nation
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q35
    // TPC-DS q35 shape: customers gated by IN(orders 1997) AND
    // (EXISTS store-channel OR EXISTS web-channel), reported per
    // (nation, segment) with count + avg/max/sum of a measure.
    QueryDef(
      "q_tpcds_q35",
      (s, dir) => {
        val o97 = Tables.orders(s, dir)
          .where(year(col("o_orderdate")) === 1997)
        val lo = Tables.lineitem(s, dir)
          .join(o97.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
        val storeOrWeb = lo.where(col("l_linenumber") % 3 =!= 0)
          .select(col("o_custkey")).distinct()
        Tables.customer(s, dir)
          .join(o97.select(col("o_custkey")).distinct(),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .join(storeOrWeb, col("c_custkey") === col("o_custkey"),
            "left_semi")
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("cnt"),
            (sum(col("c_acctbal").cast("decimal(25,2)")).cast("double") /
              count(lit(1))).as("avg_bal"),
            max(col("c_acctbal")).as("max_bal"),
            sum(col("c_acctbal").cast("decimal(25,2)"))
              .cast("double").as("sum_bal"))
          .orderBy(col("nation"), col("segment"))
      },
      Some("""
        SELECT n_name AS nation, c_mktsegment AS segment, COUNT(*) AS cnt,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE)
                 / COUNT(*) AS avg_bal,
               MAX(c_acctbal) AS max_bal,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE)
                 AS sum_bal
        FROM customer c, nation
        WHERE c.c_nationkey = n_nationkey
          AND c.c_custkey IN (SELECT o_custkey FROM orders
                              WHERE year(o_orderdate) = 1997)
          AND (EXISTS (SELECT 1 FROM lineitem l, orders o2
                       WHERE l.l_orderkey = o2.o_orderkey
                         AND o2.o_custkey = c.c_custkey
                         AND year(o2.o_orderdate) = 1997
                         AND l.l_linenumber % 3 = 1)
            OR EXISTS (SELECT 1 FROM lineitem l, orders o3
                       WHERE l.l_orderkey = o3.o_orderkey
                         AND o3.o_custkey = c.c_custkey
                         AND year(o3.o_orderdate) = 1997
                         AND l.l_linenumber % 3 = 2))
        GROUP BY n_name, c_mktsegment
        ORDER BY nation, segment
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q59
    // TPC-DS q59/q2 shape: the period pivot — monthly sales as 12
    // conditional-sum COLUMNS per (nation, year), FULL JOINed year vs
    // year+1, reporting month-over-month-of-prior-year ratios.
    QueryDef(
      "q_tpcds_q59",
      (s, dir) => {
        val base = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .where(year(col("o_orderdate")).isin(1996, 1997))
        def mcol(m: Int) = fpSum(when(month(col("o_orderdate")) === m,
          expr(rev)).otherwise(lit(0.0))).as(s"m$m")
        val pivot = base
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("int").as("yr"))
          .agg(mcol(1), mcol(2), mcol(3), mcol(4), mcol(5), mcol(6))
        val y1 = pivot.where(col("yr") === 1996)
        val y2 = pivot.where(col("yr") === 1997)
          .select(col("nation").as("nation2") +:
            (1 to 6).map(m => col(s"m$m").as(s"p$m")): _*)
        y1.join(y2, col("nation") === col("nation2"), "full_outer")
          .where(col("nation").isNotNull && col("nation2").isNotNull)
          .select(col("nation") +: (1 to 6).map(m =>
            when(col(s"m$m") > 0,
              col(s"p$m").cast("double") / col(s"m$m"))
              .as(s"ratio_m$m")): _*)
          .orderBy(col("nation"))
      },
      Some {
        def mexpr(m: Int): String =
          s"CAST(${sqlFpSum(s"CASE WHEN month(o_orderdate) = $m THEN $rev ELSE 0.0 END")} AS BIGINT) AS m$m"
        val cols = (1 to 6).map(mexpr).mkString(", ")
        val ratios = (1 to 6).map(m =>
          s"CASE WHEN y1.m$m > 0 THEN CAST(y2.m$m AS DOUBLE) / y1.m$m END AS ratio_m$m")
          .mkString(", ")
        s"""WITH mp AS (
           SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
                  $cols
           FROM lineitem, orders, customer, nation
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND c_nationkey = n_nationkey
             AND year(o_orderdate) IN (1996, 1997)
           GROUP BY 1, 2)
           SELECT y1.nation AS nation, $ratios
           FROM (SELECT * FROM mp WHERE yr = 1996) y1
           FULL OUTER JOIN (SELECT * FROM mp WHERE yr = 1997) y2
             ON y1.nation = y2.nation
           WHERE y1.nation IS NOT NULL AND y2.nation IS NOT NULL
           ORDER BY nation""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q85
    // TPC-DS q85 shape: an OR of AND-condition triples spanning fact
    // measures AND dimension attributes, reported per order priority.
    QueryDef(
      "q_tpcds_q85",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .where(
            (col("c_mktsegment") === "BUILDING" &&
              col("l_quantity").between(1, 15) &&
              col("c_acctbal").between(0, 3000)) ||
            (col("c_mktsegment") === "MACHINERY" &&
              col("l_quantity").between(16, 35) &&
              col("c_acctbal").between(3000, 7000)) ||
            (col("c_mktsegment") === "AUTOMOBILE" &&
              col("l_quantity").between(36, 50) &&
              col("c_acctbal").between(7000, 10000)))
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("cnt"),
            (sum(col("l_quantity").cast("long")).cast("double") /
              count(lit(1))).as("avg_qty"),
            money(expr(rev)).as("revenue"))
          .orderBy(col("priority"))
      },
      Some(s"""
        SELECT o_orderpriority AS priority, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 / COUNT(*) AS avg_qty,
               ${sqlMoney(rev)} AS revenue
        FROM lineitem, orders, customer
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND ((c_mktsegment = 'BUILDING'
                AND l_quantity BETWEEN 1 AND 15
                AND c_acctbal BETWEEN 0 AND 3000)
            OR (c_mktsegment = 'MACHINERY'
                AND l_quantity BETWEEN 16 AND 35
                AND c_acctbal BETWEEN 3000 AND 7000)
            OR (c_mktsegment = 'AUTOMOBILE'
                AND l_quantity BETWEEN 36 AND 50
                AND c_acctbal BETWEEN 7000 AND 10000))
        GROUP BY o_orderpriority
        ORDER BY priority
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q16
    // TPC-DS q16 shape: COUNT(DISTINCT order) + money total for a window
    // of orders gated by EXISTS (shipped by ≥2 distinct suppliers) AND
    // NOT EXISTS (any return) — the semi + anti gate composition on one
    // fact, reported as a single row.
    QueryDef(
      "q_tpcds_q16",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val multiSupp = l.groupBy(col("l_orderkey").as("ms_ok"))
          .agg(countDistinct(col("l_suppkey")).as("ns"))
          .where(col("ns") >= 2).select(col("ms_ok"))
        val returned = l.where(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("r_ok")).distinct()
        Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1997-03-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-05-01").cast("timestamp"))
          .join(multiSupp, col("o_orderkey") === col("ms_ok"), "left_semi")
          .join(returned, col("o_orderkey") === col("r_ok"), "left_anti")
          .agg(countDistinct(col("o_orderkey")).as("order_count"),
            (sum(floor(col("o_totalprice") * 1e4).cast("long"))
              .cast("double") / 1e4).as("total_price"))
      },
      Some("""
        SELECT COUNT(DISTINCT o_orderkey) AS order_count,
               CAST(SUM(CAST(floor(o_totalprice * 1e4) AS BIGINT))
                 AS DOUBLE) / 1e4 AS total_price
        FROM orders o1
        WHERE o_orderdate >= TIMESTAMP '1997-03-01'
          AND o_orderdate < TIMESTAMP '1997-05-01'
          AND EXISTS (SELECT 1 FROM lineitem l1, lineitem l2
                      WHERE l1.l_orderkey = o1.o_orderkey
                        AND l2.l_orderkey = o1.o_orderkey
                        AND l1.l_suppkey <> l2.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem lr
                          WHERE lr.l_orderkey = o1.o_orderkey
                            AND lr.l_returnflag = 'R')
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q54
    // TPC-DS q54 shape: the histogram of aggregates — per-customer
    // quarterly revenue bucketed into $5,000 bands, then the COUNT OF
    // CUSTOMERS per band (an aggregate over an aggregate's distribution).
    QueryDef(
      "q_tpcds_q54",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-04-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(fpSum(expr(rev)).as("r"))
          .select(floor(col("r").cast("double") / 1e4 / 5000)
            .cast("int").as("segment"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("num_customers"))
          .orderBy(col("segment"))
      },
      Some(s"""
        WITH cs AS (
          SELECT o_custkey, ${sqlFpSum(rev)} AS r
          FROM lineitem, orders
          WHERE l_orderkey = o_orderkey
            AND o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1997-04-01'
          GROUP BY o_custkey)
        SELECT CAST(floor(CAST(r AS DOUBLE) / 1e4 / 5000) AS INT) AS segment,
               COUNT(*) AS num_customers
        FROM cs GROUP BY 1 ORDER BY segment
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q69
    // TPC-DS q69 shape: the demographic COMPLEMENT of q35 — customers
    // with a 1997 order but NO store purchase and NO web purchase that
    // year (one semi gate, two anti gates).
    QueryDef(
      "q_tpcds_q69",
      (s, dir) => {
        val o97 = Tables.orders(s, dir)
          .where(year(col("o_orderdate")) === 1997)
        val lo = Tables.lineitem(s, dir)
          .join(o97.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
        def channelCust(m: Int) = lo.where(col("l_linenumber") % 3 === m)
          .select(col("o_custkey")).distinct()
        Tables.customer(s, dir)
          .join(o97.select(col("o_custkey")).distinct(),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .join(channelCust(1), col("c_custkey") === col("o_custkey"),
            "left_anti")
          .join(channelCust(2), col("c_custkey") === col("o_custkey"),
            "left_anti")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("segment"))
      },
      Some("""
        SELECT c_mktsegment AS segment, COUNT(*) AS cnt
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND year(o.o_orderdate) = 1997)
          AND NOT EXISTS (SELECT 1 FROM lineitem l, orders o2
                          WHERE l.l_orderkey = o2.o_orderkey
                            AND o2.o_custkey = c.c_custkey
                            AND year(o2.o_orderdate) = 1997
                            AND l.l_linenumber % 3 = 1)
          AND NOT EXISTS (SELECT 1 FROM lineitem l, orders o3
                          WHERE l.l_orderkey = o3.o_orderkey
                            AND o3.o_custkey = c.c_custkey
                            AND year(o3.o_orderdate) = 1997
                            AND l.l_linenumber % 3 = 2)
        GROUP BY c_mktsegment ORDER BY segment
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q98
    // TPC-DS q98 shape: share-of-class — per-item revenue with its ratio
    // of the item TYPE's total via a window sum over the aggregate.
    QueryDef(
      "q_tpcds_q98",
      (s, dir) => {
        val perItem = Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_name"), col("p_type"))
          .agg(fpSum(expr(rev)).as("itemrevenue"))
        // scale note: the textbook spelling is SUM() OVER (PARTITION BY
        // p_type) — but a handful of type values means a handful of
        // window tasks each sorting its whole slice of the per-item
        // frame. Aggregate the 6 type totals and broadcast them back
        // instead: same result, no low-cardinality window sort.
        val typeTotals = perItem.groupBy(col("p_type").as("tt_type"))
          .agg(sum(col("itemrevenue")).as("type_total"))
        perItem.join(broadcast(typeTotals),
            col("p_type") === col("tt_type"))
          .select(col("p_name"), col("p_type"),
            (col("itemrevenue").cast("double") / 1e4).as("itemrevenue"),
            (col("itemrevenue").cast("double") * 100 /
              col("type_total").cast("double")).as("revenueratio"))
          .orderBy(col("p_type"), col("revenueratio").desc, col("p_name"))
      },
      Some(s"""
        WITH per_item AS (
          SELECT p_name, p_type, ${sqlFpSum(rev)} AS fp
          FROM lineitem, part
          WHERE l_partkey = p_partkey
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-02-01'
          GROUP BY p_name, p_type)
        SELECT p_name, p_type,
               CAST(fp AS DOUBLE) / 1e4 AS itemrevenue,
               CAST(fp AS DOUBLE) * 100 /
                 CAST(SUM(fp) OVER (PARTITION BY p_type) AS DOUBLE)
                 AS revenueratio
        FROM per_item
        ORDER BY p_type, revenueratio DESC, p_name
      """.stripMargin.trim))
  )
}
