package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** TPC-DS query-shape pack, part 7 (see [[TpcdsQueries]] for the schema
  * adaptation rules and determinism conventions).
  *
  * Shapes here: sale-to-return latency buckets (q50), the monthly brand
  * star twins (q52, q55), manufacturer deviation-from-window-average
  * reports (q53 quarterly, q63 monthly), three-channel UNION ALL item
  * totals gated by an IN item subquery (q56, q60), the lag/lead
  * year-window deviation report with a second dimension (q57), the
  * promotional-vs-total ratio of two scalar aggregates (q61), shipping
  * latency buckets by warehouse x ship mode (q62), the 10%-of-store-
  * average item pairing (q65), and the monthly warehouse pivot with
  * unioned carrier legs (q66).
  *
  * Day-difference buckets: Spark spells `datediff(end, start)`, DuckDB
  * `datediff('day', start, end)` — those shapes carry twin texts that
  * differ only in that call.
  */
object TpcdsQueries7 {

  import TpcdsQueries.{rev, fpSum, sqlFpSum, sqlMoney, sqlQuery}

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q50
    // TPC-DS q50 shape: per-store counts of returns bucketed by days
    // between sale and return — a fact(sales)⋈fact(returns)⋈dim join
    // with bucketed conditional counts. Sale date := o_orderdate,
    // return date := l_shipdate of the returned row.
    QueryDef(
      "q_tpcds_q50",
      (s, dir) => {
        val gap = datediff(col("l_shipdate"), col("o_orderdate"))
        def b(c: org.apache.spark.sql.Column, as: String) =
          sum(when(c, 1).otherwise(0)).as(as)
        Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 === 1 &&
            col("l_returnflag") === "R")
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .where(year(col("l_shipdate")) === 2000 &&
            month(col("l_shipdate")) === 8)
          .groupBy(col("s_name").as("store"))
          .agg(
            b(gap <= 30, "d30"),
            b(gap > 30 && gap <= 60, "d31_60"),
            b(gap > 60 && gap <= 90, "d61_90"),
            b(gap > 90 && gap <= 120, "d91_120"),
            b(gap > 120, "d120_plus"))
          .orderBy(col("store"))
          .limit(100)
      },
      Some {
        val gap = "datediff('day', o_orderdate, l_shipdate)"
        s"""SELECT s_name AS store,
               CAST(SUM(CASE WHEN $gap <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
               CAST(SUM(CASE WHEN $gap > 30 AND $gap <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
               CAST(SUM(CASE WHEN $gap > 60 AND $gap <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
               CAST(SUM(CASE WHEN $gap > 90 AND $gap <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
               CAST(SUM(CASE WHEN $gap > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120_plus
           FROM lineitem, orders, supplier
           WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
             AND l_linenumber % 3 = 1 AND l_returnflag = 'R'
             AND year(l_shipdate) = 2000 AND month(l_shipdate) = 8
           GROUP BY 1 ORDER BY store LIMIT 100""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q52
    // TPC-DS q52 shape: the one-month brand star report, revenue-ranked.
    QueryDef(
      "q_tpcds_q52",
      sqlQuery(s"""
        SELECT 2000 AS yr, p_brand AS brand,
               CAST(${sqlFpSum(rev)} AS DOUBLE) / 1e4 AS ext_price
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linenumber % 3 = 1
          AND year(o_orderdate) = 2000 AND month(o_orderdate) = 11
        GROUP BY p_brand
        ORDER BY ext_price DESC, brand LIMIT 100"""),
      Some(s"""
        SELECT 2000 AS yr, p_brand AS brand,
               CAST(${sqlFpSum(rev)} AS DOUBLE) / 1e4 AS ext_price
        FROM lineitem, orders, part
        WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
          AND l_linenumber % 3 = 1
          AND year(o_orderdate) = 2000 AND month(o_orderdate) = 11
        GROUP BY p_brand
        ORDER BY ext_price DESC, brand LIMIT 100""".stripMargin.trim)),

    // --------------------------------------------------------------- q53
    // TPC-DS q53 shape: quarterly manufacturer revenue vs its window
    // average over the year, keeping >10% deviations — OR-of-AND item
    // gate, group agg, windowed average, deviation filter.
    QueryDef(
      "q_tpcds_q53",
      sqlQuery(s"""
        WITH t AS (
          SELECT p_brand AS mfg, CAST(quarter(l_shipdate) AS INT) AS qoy,
                 ${sqlFpSum(rev)} AS fp
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_linenumber % 3 = 1 AND year(l_shipdate) = 1998
            AND ((p_type IN ('PROMO', 'STANDARD') AND p_size < 25)
              OR (p_type IN ('SMALL', 'LARGE') AND p_size >= 25))
          GROUP BY 1, 2),
        w AS (
          SELECT mfg, qoy, fp,
                 CAST(SUM(fp) OVER (PARTITION BY mfg) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY mfg) AS avg_q
          FROM t)
        SELECT mfg, qoy, CAST(fp AS DOUBLE) / 1e4 AS sum_sales,
               avg_q / 1e4 AS avg_quarterly_sales
        FROM w
        WHERE CASE WHEN avg_q > 0
              THEN abs(CAST(fp AS DOUBLE) - avg_q) / avg_q END > 0.1
        ORDER BY avg_quarterly_sales, sum_sales, mfg, qoy LIMIT 100"""),
      Some(s"""
        WITH t AS (
          SELECT p_brand AS mfg, CAST(quarter(l_shipdate) AS INT) AS qoy,
                 ${sqlFpSum(rev)} AS fp
          FROM lineitem, part
          WHERE l_partkey = p_partkey
            AND l_linenumber % 3 = 1 AND year(l_shipdate) = 1998
            AND ((p_type IN ('PROMO', 'STANDARD') AND p_size < 25)
              OR (p_type IN ('SMALL', 'LARGE') AND p_size >= 25))
          GROUP BY 1, 2),
        w AS (
          SELECT mfg, qoy, fp,
                 CAST(SUM(fp) OVER (PARTITION BY mfg) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY mfg) AS avg_q
          FROM t)
        SELECT mfg, qoy, CAST(fp AS DOUBLE) / 1e4 AS sum_sales,
               avg_q / 1e4 AS avg_quarterly_sales
        FROM w
        WHERE CASE WHEN avg_q > 0
              THEN abs(CAST(fp AS DOUBLE) - avg_q) / avg_q END > 0.1
        ORDER BY avg_quarterly_sales, sum_sales, mfg, qoy LIMIT 100"""
        .stripMargin.trim)),

    // --------------------------------------------------------------- q55
    // TPC-DS q55 shape: q52's even simpler twin (no year column, web
    // channel, different slice month).
    QueryDef(
      "q_tpcds_q55",
      sqlQuery(s"""
        SELECT p_brand AS brand,
               CAST(${sqlFpSum(rev)} AS DOUBLE) / 1e4 AS ext_price
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linenumber % 3 = 2
          AND year(o_orderdate) = 1999 AND month(o_orderdate) = 11
        GROUP BY p_brand
        ORDER BY ext_price DESC, brand LIMIT 100"""),
      Some(s"""
        SELECT p_brand AS brand,
               CAST(${sqlFpSum(rev)} AS DOUBLE) / 1e4 AS ext_price
        FROM lineitem, orders, part
        WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
          AND l_linenumber % 3 = 2
          AND year(o_orderdate) = 1999 AND month(o_orderdate) = 11
        GROUP BY p_brand
        ORDER BY ext_price DESC, brand LIMIT 100""".stripMargin.trim)),

    // --------------------------------------------------------------- q56
    // TPC-DS q56 shape: three per-channel item revenue CTEs gated by an
    // IN item-attribute subquery, UNION ALL'd and re-aggregated.
    QueryDef(
      "q_tpcds_q56",
      sqlQuery(tpcds56Text(
        "p_type IN ('ECONOMY', 'MEDIUM')", 2001, 2,
        "ORDER BY total_sales, item")),
      Some(tpcds56Text(
        "p_type IN ('ECONOMY', 'MEDIUM')", 2001, 2,
        "ORDER BY total_sales, item", ansi = true))),

    // --------------------------------------------------------------- q57
    // TPC-DS q57 shape: q47's lag/lead deviation report with the second
    // dimension (call center := supplier nation) and the year-fringe
    // month window. The v1/v1_lag/v1_lead self-join triple is expressed
    // as LAG/LEAD over one window — one pass, no self-joins.
    QueryDef(
      "q_tpcds_q57",
      sqlQuery(tpcds57Text(spark = true)),
      Some(tpcds57Text(spark = false))),

    // --------------------------------------------------------------- q60
    // TPC-DS q60 shape: q56's twin with a different item gate and the
    // item-first ordering.
    QueryDef(
      "q_tpcds_q60",
      sqlQuery(tpcds56Text(
        "p_type = 'STANDARD'", 1998, 9,
        "ORDER BY item, total_sales")),
      Some(tpcds56Text(
        "p_type = 'STANDARD'", 1998, 9,
        "ORDER BY item, total_sales", ansi = true))),

    // --------------------------------------------------------------- q61
    // TPC-DS q61 shape: the promotional-sales / total-sales percentage —
    // two single-row scalar aggregates over the same dimensional slice
    // (one with the promotion gate), cross-joined into one row.
    QueryDef(
      "q_tpcds_q61",
      sqlQuery(tpcds61Text),
      Some(tpcds61Text)),

    // --------------------------------------------------------------- q62
    // TPC-DS q62 shape: order-to-ship latency buckets by warehouse x
    // ship mode x site (:= supplier x order priority x nation).
    QueryDef(
      "q_tpcds_q62",
      (s, dir) => {
        val gap = datediff(col("l_shipdate"), col("o_orderdate"))
        def b(c: org.apache.spark.sql.Column, as: String) =
          sum(when(c, 1).otherwise(0)).as(as)
        Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 === 2)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .where(year(col("l_shipdate")) === 1998)
          .groupBy(substring(col("s_name"), 1, 20).as("warehouse"),
            col("o_orderpriority").as("sm_type"),
            col("n_name").as("site"))
          .agg(
            b(gap <= 30, "d30"),
            b(gap > 30 && gap <= 60, "d31_60"),
            b(gap > 60 && gap <= 90, "d61_90"),
            b(gap > 90 && gap <= 120, "d91_120"),
            b(gap > 120, "d120_plus"))
          .orderBy(col("warehouse"), col("sm_type"), col("site"))
          .limit(100)
      },
      Some {
        val gap = "datediff('day', o_orderdate, l_shipdate)"
        s"""SELECT substr(s_name, 1, 20) AS warehouse,
               o_orderpriority AS sm_type, n_name AS site,
               CAST(SUM(CASE WHEN $gap <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
               CAST(SUM(CASE WHEN $gap > 30 AND $gap <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
               CAST(SUM(CASE WHEN $gap > 60 AND $gap <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
               CAST(SUM(CASE WHEN $gap > 90 AND $gap <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
               CAST(SUM(CASE WHEN $gap > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120_plus
           FROM lineitem, orders, supplier, nation
           WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
             AND s_nationkey = n_nationkey
             AND l_linenumber % 3 = 2 AND year(l_shipdate) = 1998
           GROUP BY 1, 2, 3
           ORDER BY warehouse, sm_type, site LIMIT 100""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q63
    // TPC-DS q63 shape: q53's monthly twin with its own item gate.
    QueryDef(
      "q_tpcds_q63",
      sqlQuery(tpcds63Text(join = true)),
      Some(tpcds63Text(join = false))),

    // --------------------------------------------------------------- q65
    // TPC-DS q65 shape: items selling at or below 10% of their store's
    // average item revenue — aggregate-then-join with an avg-of-agg
    // subquery, then dimension joins for display.
    QueryDef(
      "q_tpcds_q65",
      sqlQuery(tpcds65Text(join = true)),
      Some(tpcds65Text(join = false))),

    // --------------------------------------------------------------- q66
    // TPC-DS q66 shape: the monthly warehouse pivot — two UNION ALL'd
    // "carrier" legs each spreading a year of revenue over 12 monthly
    // conditional sums, re-summed per warehouse x year.
    QueryDef(
      "q_tpcds_q66",
      sqlQuery(tpcds66Text),
      Some(tpcds66Text)),
  )

  // ------------------------------------------------------- shared texts

  /** q56/q60 family: per-channel CTEs + UNION ALL + re-aggregate. */
  private def tpcds56Text(
      itemGate: String, yr: Int, mo: Int, order: String,
      ansi: Boolean = false): String = {
    def leg(ch: Int): String = {
      val from =
        if (ansi) "FROM lineitem, part WHERE l_partkey = p_partkey AND"
        else "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE"
      s"""SELECT l_partkey AS item, ${sqlFpSum(rev)} AS fp
          $from l_linenumber % 3 = $ch
            AND year(l_shipdate) = $yr AND month(l_shipdate) = $mo
            AND l_partkey IN (SELECT p_partkey FROM part WHERE $itemGate)
          GROUP BY 1"""
    }
    s"""WITH ss AS (${leg(1)}), cs AS (${leg(0)}), ws AS (${leg(2)})
        SELECT item, CAST(SUM(fp) AS DOUBLE) / 1e4 AS total_sales
        FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
              UNION ALL SELECT * FROM ws) u
        GROUP BY item
        $order LIMIT 100""".stripMargin.trim
  }

  /** q57: monthly (category, brand, nation) sums over a year plus fringe
    * months, windowed yearly average + lag/lead neighbors, deviation
    * filter. */
  private def tpcds57Text(spark: Boolean): String = {
    val join =
      if (spark)
        """FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE"""
      else
        """FROM lineitem, orders, part, supplier, nation
           WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
             AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
             AND"""
    s"""WITH v1 AS (
          SELECT p_type AS category, p_brand AS brand, n_name AS cc,
                 CAST(year(o_orderdate) AS INT) AS yr,
                 CAST(month(o_orderdate) AS INT) AS mo,
                 ${sqlFpSum(rev)} AS fp
          $join l_linenumber % 3 = 0
            AND (year(o_orderdate) = 1997
              OR (year(o_orderdate) = 1996 AND month(o_orderdate) = 12)
              OR (year(o_orderdate) = 1998 AND month(o_orderdate) = 1))
          GROUP BY 1, 2, 3, 4, 5),
        v2 AS (
          SELECT category, brand, cc, yr, mo, fp,
                 CAST(SUM(fp) OVER (PARTITION BY category, brand, cc, yr)
                   AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY category, brand, cc, yr)
                   AS avg_monthly,
                 LAG(fp, 1) OVER (PARTITION BY category, brand, cc
                                  ORDER BY yr, mo) AS pfp,
                 LEAD(fp, 1) OVER (PARTITION BY category, brand, cc
                                   ORDER BY yr, mo) AS nfp
          FROM v1)
        SELECT category, brand, cc, yr, mo,
               avg_monthly / 1e4 AS avg_monthly_sales,
               CAST(fp AS DOUBLE) / 1e4 AS sum_sales,
               CAST(pfp AS DOUBLE) / 1e4 AS psum,
               CAST(nfp AS DOUBLE) / 1e4 AS nsum
        FROM v2
        WHERE yr = 1997 AND avg_monthly > 0
          AND abs(CAST(fp AS DOUBLE) - avg_monthly) / avg_monthly > 0.1
          AND pfp IS NOT NULL AND nfp IS NOT NULL
        ORDER BY CAST(fp AS DOUBLE) - avg_monthly, cc, category, brand, mo
        LIMIT 100""".stripMargin.trim
  }

  /** q61: two scalar aggregates (promo-gated and total) cross-joined. */
  private def tpcds61Text: String = {
    def scalar(as: String, promoGate: String): String =
      s"""SELECT CAST(${sqlFpSum(rev)} AS DOUBLE) / 1e4 AS $as
          FROM lineitem, orders, customer, nation, part
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n_nationkey AND l_partkey = p_partkey
            AND l_linenumber % 3 = 1 AND n_name = 'FRANCE'
            AND year(o_orderdate) = 1998 AND month(o_orderdate) = 11
            $promoGate"""
    s"""SELECT promotions, total, promotions / total * 100 AS promo_pct
        FROM (${scalar("promotions", "AND p_type = 'PROMO'")}) p,
             (${scalar("total", "")}) t
        ORDER BY promotions, total""".stripMargin.trim
  }

  /** q63: monthly manufacturer deviation twin of q53. */
  private def tpcds63Text(join: Boolean): String = {
    val from =
      if (join) "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE"
      else "FROM lineitem, part WHERE l_partkey = p_partkey AND"
    s"""WITH t AS (
          SELECT p_brand AS mfg, CAST(month(l_shipdate) AS INT) AS mo,
                 ${sqlFpSum(rev)} AS fp
          $from l_linenumber % 3 = 1 AND year(l_shipdate) = 1997
            AND ((p_type IN ('ECONOMY', 'MEDIUM') AND p_size < 20)
              OR (p_type IN ('PROMO', 'LARGE') AND p_size >= 30))
          GROUP BY 1, 2),
        w AS (
          SELECT mfg, mo, fp,
                 CAST(SUM(fp) OVER (PARTITION BY mfg) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY mfg) AS avg_m
          FROM t)
        SELECT mfg, mo, CAST(fp AS DOUBLE) / 1e4 AS sum_sales,
               avg_m / 1e4 AS avg_monthly_sales
        FROM w
        WHERE CASE WHEN avg_m > 0
              THEN abs(CAST(fp AS DOUBLE) - avg_m) / avg_m END > 0.1
        ORDER BY avg_monthly_sales, sum_sales, mfg, mo LIMIT 100"""
      .stripMargin.trim
  }

  /** q65: items at <= 10% of their store's average item revenue. */
  private def tpcds65Text(join: Boolean): String = {
    val dims =
      if (join)
        """FROM sc
           JOIN sb ON sc.store = sb.store
           JOIN supplier ON s_suppkey = sc.store
           JOIN part ON p_partkey = sc.item
           WHERE CAST(sc.fp AS DOUBLE) <= 0.1 * sb.ave"""
      else
        """FROM sc, sb, supplier, part
           WHERE sc.store = sb.store AND s_suppkey = sc.store
             AND p_partkey = sc.item
             AND CAST(sc.fp AS DOUBLE) <= 0.1 * sb.ave"""
    s"""WITH sc AS (
          SELECT l_suppkey AS store, l_partkey AS item,
                 ${sqlFpSum(rev)} AS fp
          FROM lineitem
          WHERE l_linenumber % 3 = 1
            AND year(l_shipdate) IN (1996, 1997)
          GROUP BY 1, 2),
        sb AS (
          SELECT store, CAST(SUM(fp) AS DOUBLE) / COUNT(*) AS ave
          FROM sc GROUP BY 1)
        SELECT s_name AS store_name, p_name AS item_desc,
               CAST(sc.fp AS DOUBLE) / 1e4 AS revenue,
               p_retailprice, p_brand
        $dims
        ORDER BY store_name, item_desc, p_brand LIMIT 100""".stripMargin.trim
  }

  /** q66: two unioned carrier legs, 12 monthly conditional sums each. */
  private def tpcds66Text: String = {
    def months(col: String): String =
      (1 to 12).map(m =>
        s"""SUM(CASE WHEN month(l_shipdate) = $m
            THEN CAST(floor(($rev) * 1e4) AS BIGINT) ELSE 0 END) AS ${col}_m$m""")
        .mkString(",\n ")
    def leg(carrier: String, prios: String): String =
      s"""SELECT s_name AS warehouse, '$carrier' AS ship_carriers,
                 CAST(year(l_shipdate) AS INT) AS yr,
                 ${months("s")}
          FROM lineitem, orders, supplier
          WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
            AND l_linenumber % 3 = 0
            AND o_orderpriority IN ($prios)
            AND year(l_shipdate) IN (1996, 1997)
          GROUP BY 1, 2, 3"""
    val outer = (1 to 12).map(m =>
      s"CAST(SUM(s_m$m) AS DOUBLE) / 1e4 AS sales_m$m").mkString(",\n ")
    s"""WITH legs AS (
          ${leg("URGENT,HIGH", "'1-URGENT', '2-HIGH'")}
          UNION ALL
          ${leg("MEDIUM,LOW", "'3-MEDIUM', '5-LOW'")})
        SELECT warehouse, ship_carriers, yr,
               $outer
        FROM legs
        GROUP BY 1, 2, 3
        ORDER BY warehouse, ship_carriers, yr LIMIT 100""".stripMargin.trim
  }
}
