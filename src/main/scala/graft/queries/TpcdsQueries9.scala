package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** TPC-DS query-shape pack, part 9 — completes the 99-shape set (see
  * [[TpcdsQueries]] for the schema adaptation rules and determinism
  * conventions; reference gate test_tpcds.sh:22 / TpcdsTestProgram.java:76).
  *
  * Shapes here: the state-average return-ratio detail (q81), item
  * activity gates through a second fact (q82), the three-channel
  * return-quantity report with shared-period subqueries (q83), the
  * demographic chain lookup (q84), the ROLLUP + grouping()-partitioned
  * rank report (q86), the three-way EXCEPT distinct-customer count
  * (q87), the category deviation-from-average report (q89), the
  * am/pm-ratio of two scalar counts (q90), the call-center returns
  * report (q91), the correlated excess-discount sum (q92), the
  * EXISTS/NOT-EXISTS shipping audit (q94), the time-slot count (q96),
  * the two-channel customer-overlap full-outer count (q97), and the
  * latency-bucket twin (q99).
  */
object TpcdsQueries9 {

  import TpcdsQueries.{rev, sqlFpSum, sqlQuery}

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q81
    // TPC-DS q81 shape: q30's sibling — customers whose channel return
    // total exceeds 1.2x their state average (correlated aggregate over
    // a CTE), with the full customer detail in the output.
    QueryDef(
      "q_tpcds_q81",
      sqlQuery(tpcds81Text),
      Some(tpcds81Text)),

    // --------------------------------------------------------------- q82
    // TPC-DS q82 shape: q37's store sibling — item attributes gated by
    // price band, manufacturer set, an inventory-band second fact, and
    // presence in the sales fact.
    QueryDef(
      "q_tpcds_q82",
      sqlQuery(tpcds82Text(join = true)),
      Some(tpcds82Text(join = false))),

    // --------------------------------------------------------------- q83
    // TPC-DS q83 shape: three per-channel return-quantity CTEs over a
    // SHARED date subquery (dates belonging to selected periods), full
    // three-way join per item with each channel's share of the total.
    QueryDef(
      "q_tpcds_q83",
      sqlQuery(tpcds83Text),
      Some(tpcds83Text)),

    // --------------------------------------------------------------- q84
    // TPC-DS q84 shape: the pure dimension-chain lookup — customer
    // through geography and two demographic dims into the returns fact,
    // name concatenation in the output.
    QueryDef(
      "q_tpcds_q84",
      sqlQuery(tpcds84Text),
      Some(tpcds84Text)),

    // --------------------------------------------------------------- q86
    // TPC-DS q86 shape: ROLLUP(category, class) totals ranked WITHIN
    // their grouping level via grouping()-keyed window partitions.
    QueryDef(
      "q_tpcds_q86",
      sqlQuery(tpcds86Text),
      Some(tpcds86Text)),

    // --------------------------------------------------------------- q87
    // TPC-DS q87 shape: COUNT over ((store EXCEPT catalog) EXCEPT web)
    // distinct (customer, day) tuples.
    QueryDef(
      "q_tpcds_q87",
      sqlQuery(tpcds87Text),
      Some(tpcds87Text)),

    // --------------------------------------------------------------- q89
    // TPC-DS q89 shape: q53/q63's category sibling — monthly sums per
    // (category, brand, store), window average per (category, brand,
    // store) over the year, keeping >10% deviations.
    QueryDef(
      "q_tpcds_q89",
      sqlQuery(tpcds89Text(join = true)),
      Some(tpcds89Text(join = false))),

    // --------------------------------------------------------------- q90
    // TPC-DS q90 shape: the am/pm ratio — two scalar COUNTs over
    // disjoint time slots (:= day-of-month bands), cross-joined into
    // one ratio row.
    QueryDef(
      "q_tpcds_q90",
      sqlQuery(tpcds90Text),
      Some(tpcds90Text)),

    // --------------------------------------------------------------- q91
    // TPC-DS q91 shape: call-center return losses under OR'd
    // demographic pairs — returns fact through customer into two
    // demographic dimensions, grouped by center.
    QueryDef(
      "q_tpcds_q91",
      sqlQuery(tpcds91Text(join = true)),
      Some(tpcds91Text(join = false))),

    // --------------------------------------------------------------- q92
    // TPC-DS q92 shape: q32's web sibling — discounts exceeding 1.3x
    // the item's period average (correlated scalar aggregate), single
    // output sum.
    QueryDef(
      "q_tpcds_q92",
      sqlQuery(tpcds92Text),
      Some(tpcds92Text)),

    // --------------------------------------------------------------- q94
    // TPC-DS q94 shape: q16's web sibling — orders shipped from more
    // than one supplier (correlated EXISTS on the same fact) and never
    // returned (correlated NOT EXISTS), count-distinct + money sums.
    QueryDef(
      "q_tpcds_q94",
      sqlQuery(tpcds94Text),
      Some(tpcds94Text)),

    // --------------------------------------------------------------- q96
    // TPC-DS q96 shape: the bare four-way star COUNT under slot gates.
    QueryDef(
      "q_tpcds_q96",
      sqlQuery(tpcds96Text(join = true)),
      Some(tpcds96Text(join = false))),

    // --------------------------------------------------------------- q97
    // TPC-DS q97 shape: distinct (customer, item) sets per channel,
    // FULL OUTER joined, counting store-only / catalog-only / both.
    QueryDef(
      "q_tpcds_q97",
      sqlQuery(tpcds97Text),
      Some(tpcds97Text)),

    // --------------------------------------------------------------- q99
    // TPC-DS q99 shape: q62's catalog sibling — order-to-ship latency
    // buckets by warehouse x ship mode x call center.
    QueryDef(
      "q_tpcds_q99",
      (s, dir) => {
        val gap = datediff(col("l_shipdate"), col("o_orderdate"))
        def b(c: org.apache.spark.sql.Column, as: String) =
          sum(when(c, 1).otherwise(0)).as(as)
        Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 === 0)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .where(year(col("l_shipdate")) === 1997)
          .groupBy(substring(col("s_name"), 1, 20).as("warehouse"),
            col("o_orderpriority").as("sm_type"),
            col("n_name").as("cc_name"))
          .agg(
            b(gap <= 30, "d30"),
            b(gap > 30 && gap <= 60, "d31_60"),
            b(gap > 60 && gap <= 90, "d61_90"),
            b(gap > 90 && gap <= 120, "d91_120"),
            b(gap > 120, "d120_plus"))
          .orderBy(col("warehouse"), col("sm_type"), col("cc_name"))
          .limit(100)
      },
      Some {
        val gap = "datediff('day', o_orderdate, l_shipdate)"
        s"""SELECT substr(s_name, 1, 20) AS warehouse,
               o_orderpriority AS sm_type, n_name AS cc_name,
               CAST(SUM(CASE WHEN $gap <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
               CAST(SUM(CASE WHEN $gap > 30 AND $gap <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
               CAST(SUM(CASE WHEN $gap > 60 AND $gap <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
               CAST(SUM(CASE WHEN $gap > 90 AND $gap <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
               CAST(SUM(CASE WHEN $gap > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120_plus
           FROM lineitem, orders, supplier, nation
           WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
             AND s_nationkey = n_nationkey
             AND l_linenumber % 3 = 0 AND year(l_shipdate) = 1997
           GROUP BY 1, 2, 3
           ORDER BY warehouse, sm_type, cc_name LIMIT 100""".stripMargin.trim
      }),
  )

  // ------------------------------------------------------- shared texts

  private def tpcds81Text: String = s"""
    WITH ctr AS (
      SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
             ${sqlFpSum(rev)} AS ctr_total
      FROM lineitem, orders, customer
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_linenumber % 3 = 0 AND l_returnflag = 'R'
        AND year(o_orderdate) = 1997
      GROUP BY 1, 2)
    SELECT c_name, c_mktsegment, n_name,
           CAST(ctr_total AS DOUBLE) / 1e4 AS total_return
    FROM ctr c1, customer, nation
    WHERE ctr_total > (SELECT CAST(SUM(c2.ctr_total) AS DOUBLE)
                         / COUNT(*) * 1.2
                       FROM ctr c2 WHERE c2.ctr_nation = c1.ctr_nation)
      AND c1.ctr_cust = c_custkey AND c_nationkey = n_nationkey
      AND c_mktsegment = 'BUILDING'
    ORDER BY c_name, total_return LIMIT 100""".stripMargin.trim

  private def tpcds82Text(join: Boolean): String = {
    val from =
      if (join)
        """FROM part
           JOIN lineitem inv ON inv.l_partkey = p_partkey
           WHERE"""
      else
        """FROM part, lineitem inv
           WHERE inv.l_partkey = p_partkey AND"""
    s"""SELECT p_name, p_brand, p_retailprice
        $from p_retailprice BETWEEN 400 AND 700
          AND p_size IN (5, 10, 15, 20)
          AND inv.l_linenumber % 3 = 1
          AND inv.l_quantity BETWEEN 10 AND 40
          AND year(inv.l_shipdate) = 1997
          AND p_partkey IN (SELECT l_partkey FROM lineitem
                            WHERE l_linenumber % 3 = 0)
        GROUP BY 1, 2, 3
        ORDER BY p_name, p_brand LIMIT 100""".stripMargin.trim
  }

  private def tpcds83Text: String = {
    def leg(ch: Int, as: String): String =
      s"""SELECT l_partkey AS item,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS $as
          FROM lineitem
          WHERE l_linenumber % 3 = $ch AND l_returnflag = 'R'
            AND CAST(l_shipdate AS DATE) IN (
              SELECT CAST(o_orderdate AS DATE) FROM orders
              WHERE year(o_orderdate) = 1997
                AND month(o_orderdate) IN (3, 7, 11))
          GROUP BY 1"""
    s"""WITH sr AS (${leg(1, "sr_qty")}),
         cr AS (${leg(0, "cr_qty")}),
         wr AS (${leg(2, "wr_qty")})
        SELECT sr.item,
               CAST(sr_qty AS BIGINT) AS sr_qty,
               CAST(cr_qty AS BIGINT) AS cr_qty,
               CAST(wr_qty AS BIGINT) AS wr_qty,
               CAST(sr_qty + cr_qty + wr_qty AS BIGINT) AS total_qty,
               CAST(sr_qty AS DOUBLE)
                 / (sr_qty + cr_qty + wr_qty) * 100 AS sr_share
        FROM sr, cr, wr
        WHERE sr.item = cr.item AND sr.item = wr.item
        ORDER BY sr.item, sr_qty LIMIT 100""".stripMargin.trim
  }

  private def tpcds84Text: String = {
    s"""SELECT c_custkey AS customer_id,
               c_name || ', ' || c_mktsegment AS customername
        FROM customer, nation, region, lineitem, orders
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND o_custkey = c_custkey AND l_orderkey = o_orderkey
          AND r_name = 'EUROPE'
          AND c_acctbal BETWEEN 1000 AND 6000
          AND l_returnflag = 'R' AND l_linenumber % 3 = 1
        GROUP BY 1, 2
        ORDER BY customer_id LIMIT 100""".stripMargin.trim
  }

  private def tpcds86Text: String = s"""
    WITH t AS (
      SELECT p_type AS category, CAST(p_size % 8 AS INT) AS class,
             ${sqlFpSum(rev)} AS fp
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND l_linenumber % 3 = 2
        AND year(l_shipdate) = 1997
      GROUP BY ROLLUP(p_type, p_size % 8))
    SELECT CAST(fp AS DOUBLE) / 1e4 AS total_sum, category, class,
           (CASE WHEN category IS NULL THEN 1 ELSE 0 END
            + CASE WHEN class IS NULL THEN 1 ELSE 0 END) AS lochierarchy,
           RANK() OVER (
             PARTITION BY (CASE WHEN category IS NULL THEN 1 ELSE 0 END
                           + CASE WHEN class IS NULL THEN 1 ELSE 0 END),
                          CASE WHEN class IS NOT NULL THEN category END
             ORDER BY fp DESC) AS rank_within_parent
    FROM t
    ORDER BY lochierarchy DESC,
             CASE WHEN lochierarchy = 0 THEN category END NULLS FIRST,
             rank_within_parent, category NULLS FIRST, class NULLS FIRST
    LIMIT 100""".stripMargin.trim

  private def tpcds87Text: String = {
    def leg(ch: Int): String =
      s"""SELECT DISTINCT c_name, CAST(o_orderdate AS DATE) AS d
          FROM lineitem, orders, customer
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_linenumber % 3 = $ch AND year(o_orderdate) = 1997"""
    s"""SELECT COUNT(*) AS n
        FROM ((${leg(1)}) EXCEPT (${leg(0)}) EXCEPT (${leg(2)})) cool_cust"""
      .stripMargin.trim
  }

  private def tpcds89Text(join: Boolean): String = {
    val from =
      if (join)
        """FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           WHERE"""
      else
        """FROM lineitem, part, supplier
           WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey AND"""
    s"""WITH t AS (
          SELECT p_type AS category, p_brand AS brand, s_name AS store,
                 CAST(month(l_shipdate) AS INT) AS mo,
                 ${sqlFpSum(rev)} AS fp
          $from l_linenumber % 3 = 1 AND year(l_shipdate) = 1996
            AND ((p_type IN ('STANDARD', 'SMALL', 'PROMO')
                  AND p_size < 20)
              OR (p_type IN ('LARGE', 'ECONOMY', 'MEDIUM')
                  AND p_size >= 20))
          GROUP BY 1, 2, 3, 4),
        w AS (
          SELECT category, brand, store, mo, fp,
                 CAST(SUM(fp) OVER (PARTITION BY category, brand, store)
                   AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY category, brand, store)
                   AS avg_m
          FROM t)
        SELECT category, brand, store, mo,
               CAST(fp AS DOUBLE) / 1e4 AS sum_sales,
               avg_m / 1e4 AS avg_monthly_sales
        FROM w
        WHERE CASE WHEN avg_m <> 0
              THEN abs(CAST(fp AS DOUBLE) - avg_m) / avg_m END > 0.1
        ORDER BY CAST(fp AS DOUBLE) - avg_m, store, category, brand, mo
        LIMIT 100""".stripMargin.trim
  }

  private def tpcds90Text: String = {
    def slot(as: String, lo: Int, hi: Int): String =
      s"""SELECT COUNT(*) AS $as
          FROM lineitem, orders, customer
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_linenumber % 3 = 2
            AND day(o_orderdate) BETWEEN $lo AND $hi
            AND c_acctbal BETWEEN 1000 AND 6000
            AND o_orderpriority = '3-MEDIUM'"""
    s"""SELECT amc, pmc, CAST(amc AS DOUBLE) / pmc AS am_pm_ratio
        FROM (${slot("amc", 8, 9)}) am, (${slot("pmc", 19, 20)}) pm
        ORDER BY am_pm_ratio""".stripMargin.trim
  }

  private def tpcds91Text(join: Boolean): String = {
    val from =
      if (join)
        """FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN supplier ON l_suppkey = s_suppkey
           WHERE"""
      else
        """FROM lineitem, orders, customer, nation, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND c_nationkey = n_nationkey AND l_suppkey = s_suppkey
             AND"""
    s"""SELECT s_name AS call_center, n_name AS center_nation,
               CAST(${sqlFpSum("l_extendedprice * l_tax")} AS DOUBLE) / 1e4
                 AS returns_loss
        $from l_linenumber % 3 = 0 AND l_returnflag = 'R'
          AND year(o_orderdate) = 1998 AND month(o_orderdate) = 11
          AND ((c_mktsegment = 'MACHINERY' AND c_acctbal < 3000)
            OR (c_mktsegment = 'HOUSEHOLD' AND c_acctbal >= 3000))
        GROUP BY 1, 2
        ORDER BY returns_loss DESC, call_center, center_nation"""
      .stripMargin.trim
  }

  private def tpcds92Text: String = s"""
    WITH ws AS (
      SELECT l_partkey AS item, l_extendedprice * l_discount AS disc
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey AND l_linenumber % 3 = 2
        AND year(o_orderdate) = 1997 AND month(o_orderdate) BETWEEN 1 AND 3)
    SELECT CAST(${sqlFpSum("w1.disc")} AS DOUBLE) / 1e4
             AS excess_discount_amount
    FROM ws w1, part
    WHERE w1.item = p_partkey AND p_size BETWEEN 1 AND 15
      AND w1.disc > (SELECT 1.3 * (CAST(${sqlFpSum("w2.disc")} AS DOUBLE)
                       / 1e4 / COUNT(*))
                     FROM ws w2 WHERE w2.item = w1.item)
    ORDER BY excess_discount_amount""".stripMargin.trim

  private def tpcds94Text: String = s"""
    SELECT COUNT(DISTINCT l1.l_orderkey) AS order_count,
           CAST(${sqlFpSum("l1.l_extendedprice * l1.l_tax")} AS DOUBLE) / 1e4
             AS total_shipping_cost,
           CAST(${sqlFpSum("l1.l_extendedprice * (1 - l1.l_discount)")}
             AS DOUBLE) / 1e4 AS total_net_profit
    FROM lineitem l1, orders, supplier, nation
    WHERE l1.l_orderkey = o_orderkey AND l1.l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey AND l1.l_linenumber % 3 = 2
      AND year(o_orderdate) = 1997 AND o_orderpriority = '1-URGENT'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_returnflag = 'R')
      AND n_name = 'CANADA'
    ORDER BY order_count""".stripMargin.trim

  private def tpcds96Text(join: Boolean): String = {
    val from =
      if (join)
        """FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
           WHERE"""
      else
        """FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey AND"""
    s"""SELECT COUNT(*) AS n
        $from l_linenumber % 3 = 1
          AND day(o_orderdate) = 20 AND month(o_orderdate) >= 6
          AND c_mktsegment = 'AUTOMOBILE'
          AND s_acctbal > 0
        ORDER BY n""".stripMargin.trim
  }

  private def tpcds97Text: String = {
    def leg(ch: Int): String =
      s"""SELECT o_custkey AS customer_sk, l_partkey AS item_sk
          FROM lineitem, orders
          WHERE l_orderkey = o_orderkey AND l_linenumber % 3 = $ch
            AND year(o_orderdate) = 1997
          GROUP BY 1, 2"""
    s"""WITH ssci AS (${leg(1)}), csci AS (${leg(0)})
        SELECT CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                 AND csci.customer_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS store_only,
               CAST(SUM(CASE WHEN ssci.customer_sk IS NULL
                 AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS catalog_only,
               CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                 AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS store_and_catalog
        FROM ssci FULL OUTER JOIN csci
          ON ssci.customer_sk = csci.customer_sk
         AND ssci.item_sk = csci.item_sk""".stripMargin.trim
  }
}
