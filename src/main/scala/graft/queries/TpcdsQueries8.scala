package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** TPC-DS query-shape pack, part 8 (see [[TpcdsQueries]] for the schema
  * adaptation rules and determinism conventions).
  *
  * Shapes here: the cross-geography trip detail with a per-trip subquery
  * (q68), the three-channel union'd brand/time breakdown (q71), the
  * inventory mega-join with fact-fact inequality + two left-outer legs
  * (q72), trip-frequency buckets (q73), the two-channel year-over-year
  * growth select (q74), the sales-minus-returns year-over-year brand
  * delta over UNION'd channels (q75), the null-key channel report (q76),
  * the per-entity sales/returns/profit rollup across channels (q77), the
  * weekday trip coupon/profit detail (q79), and the promo-gated
  * channel-id rollup with netted returns (q80).
  */
object TpcdsQueries8 {

  import TpcdsQueries.{rev, sqlFpSum, sqlMoney, sqlQuery}

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q68
    // TPC-DS q68 shape: per-trip (order) money sums in a subquery with
    // demographic/date gates, joined to customer, keeping trips whose
    // "bought" geography differs from the customer's current one.
    QueryDef(
      "q_tpcds_q68",
      sqlQuery(tpcds68Text(join = true)),
      Some(tpcds68Text(join = false))),

    // --------------------------------------------------------------- q71
    // TPC-DS q71 shape: brand revenue per time slot (:= day of month)
    // with the three channels UNION ALL'd before the dimension joins.
    QueryDef(
      "q_tpcds_q71",
      sqlQuery(tpcds71Text),
      Some(tpcds71Text)),

    // --------------------------------------------------------------- q72
    // TPC-DS q72 shape: the inventory mega-join — catalog sales joined
    // to a second fact (inventory := the store slice as per-(part,
    // supplier, month) stock) on keys + SAME-PERIOD equality + the
    // quantity INEQUALITY, a date-gap inequality on the sales row
    // itself, and two LEFT OUTER legs (promotion; returns), counting
    // promo vs no-promo per (item, warehouse, month).
    QueryDef(
      "q_tpcds_q72",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val sales = l.where(col("l_linenumber") % 3 === 0)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .where(year(col("o_orderdate")) === 1997 &&
            datediff(col("l_shipdate"), col("o_orderdate")) > lit(5))
          .select(col("l_orderkey").as("cs_order"),
            col("l_partkey").as("cs_part"),
            col("l_suppkey").as("cs_supp"),
            col("l_quantity").as("cs_qty"),
            month(col("o_orderdate")).cast("int").as("cs_mo"))
        val inv = l.where(col("l_linenumber") % 3 === 1 &&
            year(col("l_shipdate")) === 1997)
          .groupBy(col("l_partkey").as("inv_part"),
            col("l_suppkey").as("inv_supp"),
            month(col("l_shipdate")).cast("int").as("inv_mo"))
          .agg(min(col("l_quantity")).as("inv_qty"))
        val promo = Tables.part(s, dir).where(col("p_type") === "PROMO")
          .select(col("p_partkey").as("promo_part"))
        val ret = l.where(col("l_linenumber") % 3 === 2 &&
            col("l_returnflag") === "R")
          .select(col("l_orderkey").as("r_order"),
            col("l_partkey").as("r_part")).distinct()
        sales
          .join(inv, col("cs_part") === col("inv_part") &&
            col("cs_supp") === col("inv_supp") &&
            col("cs_mo") === col("inv_mo") &&
            col("inv_qty") < col("cs_qty"))
          .join(broadcast(Tables.part(s, dir)),
            col("cs_part") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("cs_supp") === col("s_suppkey"))
          .join(broadcast(promo), col("cs_part") === col("promo_part"),
            "left_outer")
          .join(ret, col("cs_order") === col("r_order") &&
            col("cs_part") === col("r_part"), "left_outer")
          .groupBy(col("p_name").as("item_desc"),
            col("s_name").as("warehouse"), col("cs_mo").as("mo"))
          .agg(
            sum(when(col("promo_part").isNull, 1).otherwise(0)).as("no_promo"),
            sum(when(col("promo_part").isNotNull, 1).otherwise(0)).as("promo"),
            count(lit(1)).as("total_cnt"))
          .orderBy(col("total_cnt").desc, col("item_desc"),
            col("warehouse"), col("mo"))
          .limit(100)
      },
      Some("""
        WITH sales AS (
          SELECT l_orderkey AS cs_order, l_partkey AS cs_part,
                 l_suppkey AS cs_supp, l_quantity AS cs_qty,
                 CAST(month(o_orderdate) AS INT) AS cs_mo
          FROM lineitem, orders
          WHERE l_orderkey = o_orderkey AND l_linenumber % 3 = 0
            AND year(o_orderdate) = 1997
            AND datediff('day', o_orderdate, l_shipdate) > 5),
        inv AS (
          SELECT l_partkey AS inv_part, l_suppkey AS inv_supp,
                 CAST(month(l_shipdate) AS INT) AS inv_mo,
                 MIN(l_quantity) AS inv_qty
          FROM lineitem
          WHERE l_linenumber % 3 = 1 AND year(l_shipdate) = 1997
          GROUP BY 1, 2, 3),
        promo AS (SELECT p_partkey AS promo_part FROM part
                  WHERE p_type = 'PROMO'),
        ret AS (
          SELECT DISTINCT l_orderkey AS r_order, l_partkey AS r_part
          FROM lineitem
          WHERE l_linenumber % 3 = 2 AND l_returnflag = 'R')
        SELECT p_name AS item_desc, s_name AS warehouse, cs_mo AS mo,
               CAST(SUM(CASE WHEN promo_part IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS no_promo,
               CAST(SUM(CASE WHEN promo_part IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS promo,
               COUNT(*) AS total_cnt
        FROM sales
        JOIN inv ON cs_part = inv_part AND cs_supp = inv_supp
                AND cs_mo = inv_mo AND inv_qty < cs_qty
        JOIN part ON cs_part = p_partkey
        JOIN supplier ON cs_supp = s_suppkey
        LEFT JOIN promo ON cs_part = promo_part
        LEFT JOIN ret ON cs_order = r_order AND cs_part = r_part
        GROUP BY 1, 2, 3
        ORDER BY total_cnt DESC, item_desc, warehouse, mo LIMIT 100
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q73
    // TPC-DS q73 shape: trips (orders) whose line count falls in a
    // band, under OR'd demographic gates — count-per-trip subquery,
    // customer join, band filter.
    QueryDef(
      "q_tpcds_q73",
      sqlQuery(tpcds73Text(join = true)),
      Some(tpcds73Text(join = false))),

    // --------------------------------------------------------------- q74
    // TPC-DS q74 shape: the two-channel year-over-year growth select —
    // one UNION ALL year_total CTE consumed four times (store/web x
    // first/second year), keeping customers whose web growth beats
    // store growth.
    QueryDef(
      "q_tpcds_q74",
      sqlQuery(tpcds74Text),
      Some(tpcds74Text)),

    // --------------------------------------------------------------- q75
    // TPC-DS q75 shape: sales-minus-returns per (year, brand, size
    // class) over the three channels (UNION, not UNION ALL — the
    // benchmark deduplicates the legs), self-joined prev-year vs
    // curr-year keeping shrinking counts.
    QueryDef(
      "q_tpcds_q75",
      sqlQuery(tpcds75Text),
      Some(tpcds75Text)),

    // --------------------------------------------------------------- q76
    // TPC-DS q76 shape: the "null foreign key" audit — per channel a
    // scan keeping rows where a (different per channel) dimension key
    // column is exceptional, UNION ALL'd, counted per channel x period
    // x category. Null keys have no analog (the star keys are total),
    // so the exceptional-value gate is channel-specific flag/priority.
    QueryDef(
      "q_tpcds_q76",
      sqlQuery(tpcds76Text),
      Some(tpcds76Text)),

    // --------------------------------------------------------------- q77
    // TPC-DS q77 shape: per-channel (sales, returns, profit) CTE pairs
    // rolled up across channels — sales and returns aggregated
    // SEPARATELY per entity, full-outer-joined, then ROLLUP'd.
    QueryDef(
      "q_tpcds_q77",
      sqlQuery(tpcds77Text),
      Some(tpcds77Text)),

    // --------------------------------------------------------------- q79
    // TPC-DS q79 shape: q73's money twin — per-trip discount/revenue
    // sums on one weekday, store-size gate, customer join.
    QueryDef(
      "q_tpcds_q79",
      (s, dir) => {
        val trips = Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 === 1)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .where(dayofweek(col("o_orderdate")) === 2 && // Monday
            col("s_acctbal") > 1000 &&
            (col("o_orderpriority") === "1-URGENT" ||
              col("o_orderpriority") === "2-HIGH"))
          .groupBy(col("o_orderkey").as("trip"),
            col("o_custkey").as("cust"), col("s_name").as("store"))
          .agg((TpcdsQueries.fpSum(col("l_extendedprice") * col("l_discount"))
              .cast("double") / 1e4).as("amt"),
            (TpcdsQueries.fpSum(expr(rev)).cast("double") / 1e4).as("profit"))
        trips
          .join(broadcast(Tables.customer(s, dir)),
            col("cust") === col("c_custkey"))
          .select(col("c_name").as("cname"),
            substring(col("store"), 1, 30).as("store"),
            col("trip"), col("amt"), col("profit"))
          .orderBy(col("cname"), col("trip"), col("profit"))
          .limit(100)
      },
      Some(s"""
        WITH trips AS (
          SELECT o_orderkey AS trip, o_custkey AS cust, s_name AS store,
                 CAST(${sqlFpSum("l_extendedprice * l_discount")} AS DOUBLE)
                   / 1e4 AS amt,
                 CAST(${sqlFpSum(rev)} AS DOUBLE) / 1e4 AS profit
          FROM lineitem, orders, supplier
          WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
            AND l_linenumber % 3 = 1
            AND dayofweek(o_orderdate) = 1
            AND s_acctbal > 1000
            AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          GROUP BY 1, 2, 3)
        SELECT c_name AS cname, substr(store, 1, 30) AS store, trip,
               amt, profit
        FROM trips, customer
        WHERE cust = c_custkey
        ORDER BY cname, trip, profit LIMIT 100""".stripMargin.trim)),

    // --------------------------------------------------------------- q80
    // TPC-DS q80 shape: q77's id-level twin — per-channel entity-id
    // sales/netted-returns/profit CTEs with promo + price gates,
    // UNION ALL'd under ROLLUP(channel, id).
    QueryDef(
      "q_tpcds_q80",
      sqlQuery(tpcds80Text),
      Some(tpcds80Text)),
  )

  // ------------------------------------------------------- shared texts

  private def tpcds68Text(join: Boolean): String = {
    val dims =
      if (join)
        """FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE"""
      else
        """FROM lineitem, orders, supplier, nation
           WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
             AND s_nationkey = n_nationkey AND"""
    s"""WITH dn AS (
          SELECT o_orderkey AS trip, o_custkey AS cust,
                 n_name AS bought_nation,
                 CAST(${sqlFpSum("l_extendedprice")} AS DOUBLE) / 1e4
                   AS extended_price,
                 CAST(${sqlFpSum("l_extendedprice * l_tax")} AS DOUBLE) / 1e4
                   AS extended_tax,
                 CAST(${sqlFpSum(rev)} AS DOUBLE) / 1e4 AS list_price
          $dims l_linenumber % 3 = 1
            AND day(o_orderdate) BETWEEN 1 AND 2
            AND year(o_orderdate) IN (1996, 1997, 1998)
            AND (o_orderpriority = '1-URGENT' OR o_orderpriority = '5-LOW')
          GROUP BY 1, 2, 3)
        SELECT c_name AS cname, nc.n_name AS current_nation, bought_nation,
               trip, extended_price, extended_tax, list_price
        FROM dn, customer, nation nc
        WHERE cust = c_custkey AND c_nationkey = nc.n_nationkey
          AND nc.n_name <> bought_nation
        ORDER BY cname, trip LIMIT 100""".stripMargin.trim
  }

  private def tpcds71Text: String = {
    def leg(ch: Int): String =
      s"""SELECT l_partkey AS item,
                 CAST(day(o_orderdate) AS INT) AS slot,
                 CAST(floor((l_extendedprice * (1 - l_discount)) * 1e4)
                   AS BIGINT) AS fp
          FROM lineitem, orders
          WHERE l_orderkey = o_orderkey AND l_linenumber % 3 = $ch
            AND year(o_orderdate) = 1999 AND month(o_orderdate) = 11"""
    s"""WITH u AS (${leg(2)} UNION ALL ${leg(0)} UNION ALL ${leg(1)})
        SELECT p_brand AS brand, slot,
               CAST(SUM(fp) AS DOUBLE) / 1e4 AS ext_price
        FROM u, part
        WHERE item = p_partkey
        GROUP BY 1, 2
        ORDER BY ext_price DESC, brand, slot LIMIT 100""".stripMargin.trim
  }

  private def tpcds73Text(join: Boolean): String = {
    val dims =
      if (join)
        """FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey
           WHERE"""
      else
        """FROM lineitem, orders, supplier
           WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey AND"""
    s"""WITH dj AS (
          SELECT o_orderkey AS trip, o_custkey AS cust, COUNT(*) AS cnt
          $dims l_linenumber % 3 = 1
            AND day(o_orderdate) BETWEEN 1 AND 2
            AND year(o_orderdate) IN (1996, 1997, 1998)
            AND (o_orderpriority = '4-NOT SPECIFIED'
              OR o_orderpriority = '5-LOW')
            AND s_acctbal > 0
          GROUP BY 1, 2)
        SELECT c_name AS cname, c_mktsegment, trip, cnt
        FROM dj, customer
        WHERE cust = c_custkey AND cnt BETWEEN 1 AND 5
        ORDER BY cnt DESC, cname, trip LIMIT 100""".stripMargin.trim
  }

  private def tpcds74Text: String = {
    def leg(ch: Int, tag: String): String =
      s"""SELECT o_custkey AS customer_id, '$tag' AS sale_type,
                 CAST(year(o_orderdate) AS INT) AS yr,
                 ${sqlFpSum("l_quantity")} AS year_total
          FROM lineitem, orders
          WHERE l_orderkey = o_orderkey AND l_linenumber % 3 = $ch
            AND year(o_orderdate) IN (1996, 1997)
          GROUP BY 1, 2, 3"""
    s"""WITH year_total AS (${leg(1, "s")} UNION ALL ${leg(2, "w")})
        SELECT ts2.customer_id
        FROM year_total ts1, year_total ts2,
             year_total tw1, year_total tw2
        WHERE ts1.customer_id = ts2.customer_id
          AND ts1.customer_id = tw1.customer_id
          AND ts1.customer_id = tw2.customer_id
          AND ts1.sale_type = 's' AND ts2.sale_type = 's'
          AND tw1.sale_type = 'w' AND tw2.sale_type = 'w'
          AND ts1.yr = 1996 AND ts2.yr = 1997
          AND tw1.yr = 1996 AND tw2.yr = 1997
          AND ts1.year_total > 0 AND tw1.year_total > 0
          AND CAST(tw2.year_total AS DOUBLE) / tw1.year_total
            > CAST(ts2.year_total AS DOUBLE) / ts1.year_total
        ORDER BY ts2.customer_id LIMIT 100""".stripMargin.trim
  }

  private def tpcds75Text: String = {
    def leg(ch: Int): String =
      s"""SELECT CAST(year(o_orderdate) AS INT) AS yr, p_brand AS brand,
                 p_size AS class,
                 CAST(l_quantity AS BIGINT)
                   - CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
                          ELSE 0 END AS BIGINT) AS sales_cnt,
                 CAST(floor((l_extendedprice
                   - CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0 END) * 1e4) AS BIGINT) AS sales_fp
          FROM lineitem, orders, part
          WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
            AND l_linenumber % 3 = $ch AND p_type = 'PROMO'
            AND year(o_orderdate) IN (1996, 1997)"""
    s"""WITH all_sales AS (
          SELECT yr, brand, class,
                 CAST(SUM(sales_cnt) AS BIGINT) AS sales_cnt,
                 CAST(SUM(sales_fp) AS BIGINT) AS sales_fp
          FROM (${leg(1)} UNION ${leg(0)} UNION ${leg(2)}) d
          GROUP BY 1, 2, 3)
        SELECT prev.yr AS prev_year, curr.yr AS yr, curr.brand, curr.class,
               prev.sales_cnt AS prev_cnt, curr.sales_cnt AS curr_cnt,
               curr.sales_cnt - prev.sales_cnt AS cnt_diff,
               CAST(curr.sales_fp - prev.sales_fp AS DOUBLE) / 1e4
                 AS amt_diff
        FROM all_sales curr, all_sales prev
        WHERE curr.brand = prev.brand AND curr.class = prev.class
          AND curr.yr = 1997 AND prev.yr = 1996
          AND prev.sales_cnt > 0
          AND CAST(curr.sales_cnt AS DOUBLE) / prev.sales_cnt < 0.97
        ORDER BY cnt_diff, amt_diff, curr.brand, curr.class LIMIT 100"""
      .stripMargin.trim
  }

  private def tpcds76Text: String = {
    def leg(ch: Int, name: String, colName: String, gate: String): String =
      s"""SELECT '$name' AS channel, '$colName' AS col_name,
                 CAST(year(o_orderdate) AS INT) AS yr,
                 CAST(quarter(o_orderdate) AS INT) AS qoy,
                 p_type AS category,
                 CAST(floor((l_extendedprice * (1 - l_discount)) * 1e4)
                   AS BIGINT) AS fp
          FROM lineitem, orders, part
          WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
            AND l_linenumber % 3 = $ch AND $gate"""
    s"""WITH u AS (
          ${leg(1, "store", "l_returnflag", "l_returnflag = 'R'")}
          UNION ALL
          ${leg(2, "web", "o_orderstatus", "o_orderstatus = 'F'")}
          UNION ALL
          ${leg(0, "catalog", "l_linestatus", "l_linestatus = 'O'")})
        SELECT channel, col_name, yr, qoy, category,
               COUNT(*) AS sales_cnt,
               CAST(SUM(fp) AS DOUBLE) / 1e4 AS sales_amt
        FROM u
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY channel, col_name, yr, qoy, category LIMIT 100"""
      .stripMargin.trim
  }

  private def tpcds77Text: String = {
    def sales(ch: Int, key: String): String =
      s"""SELECT $key AS id, ${sqlFpSum(rev)} AS sales_fp,
                 ${sqlFpSum("l_extendedprice * l_discount")} AS profit_fp
          FROM lineitem
          WHERE l_linenumber % 3 = $ch AND year(l_shipdate) = 1997
          GROUP BY 1"""
    def rets(ch: Int, key: String): String =
      s"""SELECT $key AS id, ${sqlFpSum(rev)} AS returns_fp,
                 ${sqlFpSum("l_extendedprice * l_tax")} AS loss_fp
          FROM lineitem
          WHERE l_linenumber % 3 = $ch AND year(l_shipdate) = 1997
            AND l_returnflag = 'R'
          GROUP BY 1"""
    def channel(name: String, ch: Int, key: String): String =
      s"""SELECT '$name' AS channel, s.id,
                 s.sales_fp, COALESCE(r.returns_fp, 0) AS returns_fp,
                 s.profit_fp - COALESCE(r.loss_fp, 0) AS profit_fp
          FROM (${sales(ch, key)}) s
          LEFT JOIN (${rets(ch, key)}) r ON s.id = r.id"""
    s"""WITH u AS (
          ${channel("store channel", 1, "l_suppkey")}
          UNION ALL
          ${channel("catalog channel", 0, "l_suppkey % 7")}
          UNION ALL
          ${channel("web channel", 2, "l_partkey % 11")})
        SELECT channel, id,
               CAST(SUM(sales_fp) AS DOUBLE) / 1e4 AS sales,
               CAST(SUM(returns_fp) AS DOUBLE) / 1e4 AS returns,
               CAST(SUM(profit_fp) AS DOUBLE) / 1e4 AS profit
        FROM u
        GROUP BY ROLLUP(channel, id)
        ORDER BY channel NULLS FIRST, id NULLS FIRST LIMIT 100"""
      .stripMargin.trim
  }

  private def tpcds80Text: String = {
    def channel(name: String, ch: Int, key: String): String =
      s"""SELECT '$name' AS channel, CAST($key AS STRING) AS id,
                 CAST(floor((l_extendedprice * (1 - l_discount)) * 1e4)
                   AS BIGINT) AS sales_fp,
                 CAST(floor((CASE WHEN l_returnflag = 'R'
                   THEN l_extendedprice ELSE 0 END) * 1e4) AS BIGINT)
                   AS returns_fp,
                 CAST(floor((l_extendedprice * (1 - l_discount)
                   - CASE WHEN l_returnflag = 'R'
                     THEN l_extendedprice * l_discount ELSE 0 END) * 1e4)
                   AS BIGINT) AS profit_fp
          FROM lineitem, orders, part
          WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
            AND l_linenumber % 3 = $ch
            AND year(o_orderdate) = 1998
            AND p_retailprice > 50
            AND o_orderpriority <> '4-NOT SPECIFIED'"""
    s"""WITH u AS (
          ${channel("store channel", 1, "l_suppkey")}
          UNION ALL
          ${channel("catalog channel", 0, "l_suppkey % 13")}
          UNION ALL
          ${channel("web channel", 2, "l_partkey % 17")})
        SELECT channel, id,
               CAST(SUM(sales_fp) AS DOUBLE) / 1e4 AS sales,
               CAST(SUM(returns_fp) AS DOUBLE) / 1e4 AS returns,
               CAST(SUM(profit_fp) AS DOUBLE) / 1e4 AS profit
        FROM u
        GROUP BY ROLLUP(channel, id)
        ORDER BY channel NULLS FIRST, id NULLS FIRST LIMIT 100"""
      .stripMargin.trim
  }
}
