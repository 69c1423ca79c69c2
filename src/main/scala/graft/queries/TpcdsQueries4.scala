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
  * structure), and OR-of-AND multi-range condition triples across fact
  * and dimension attributes (q85).
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
      """.stripMargin.trim))
  )
}
