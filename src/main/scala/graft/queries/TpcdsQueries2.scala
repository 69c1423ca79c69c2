package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-DS query-shape pack, part 2 (see [[TpcdsQueries]] for the schema
  * adaptation rules and determinism conventions).
  *
  * Shapes here: before/after inventory ratios with HAVING bounds (q21),
  * frequent-items ∩ best-customers CTE composition (q23), nested
  * aggregation vs a scalar average of the aggregate itself (q24),
  * order-size buckets joined back to the customer dimension (q34),
  * ROLLUP + GROUPING() + rank within grouping level (q36), INTERSECT of
  * multi-column distinct sets across periods (q38), coefficient-of-
  * variation self-join across consecutive months (q39), correlated COUNT
  * subqueries under OR-of-AND attribute filters (q41), best/worst
  * double-ranked join (q44), IN-subquery OR IN-list filters (q45),
  * lag/lead + partition-average deviation windows over an aggregated CTE
  * (q47), and per-channel return-ratio rankings unioned (q49).
  */
object TpcdsQueries2 {

  import TpcdsQueries.{rev, fpSum, sqlFpSum, money, sqlMoney, channelCol,
    sqlChannel, sqlQuery}

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q21
    // TPC-DS q21 shape: quantity shipped in the 60 days before vs after a
    // cut date per (supplier, brand), HAVING the after/before ratio inside
    // [2/3, 3/2]. Integer quantity sums — exact in both engines.
    QueryDef(
      "q_tpcds_q21",
      (s, dir) => {
        val cut = lit("1997-07-01").cast("timestamp")
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= lit("1997-05-02").cast("timestamp") &&
            col("l_shipdate") < lit("1997-08-30").cast("timestamp"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("s_name"), col("p_brand").as("brand"))
          .agg(
            sum(when(col("l_shipdate") < cut, col("l_quantity").cast("long"))
              .otherwise(0L)).as("inv_before"),
            sum(when(col("l_shipdate") >= cut, col("l_quantity").cast("long"))
              .otherwise(0L)).as("inv_after"))
          .where(col("inv_before") > 0 &&
            col("inv_after").cast("double") / col("inv_before") >= 2.0 / 3.0 &&
            col("inv_after").cast("double") / col("inv_before") <= 3.0 / 2.0)
          .orderBy(col("s_name"), col("brand"))
      },
      Some("""
        SELECT s_name, p_brand AS brand,
               CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-07-01'
                   THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS inv_before,
               CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-07-01'
                   THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS inv_after
        FROM lineitem, supplier, part
        WHERE l_suppkey = s_suppkey AND l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1997-05-02'
          AND l_shipdate < TIMESTAMP '1997-08-30'
        GROUP BY s_name, p_brand
        HAVING SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-07-01'
                   THEN CAST(l_quantity AS BIGINT) ELSE 0 END) > 0
           AND CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-07-01'
                   THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS DOUBLE)
               / SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-07-01'
                   THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
               BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
        ORDER BY s_name, brand
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q23
    // TPC-DS q23 shape: two preparation CTEs — frequent items (bought
    // more often than 1.2× the per-item average) and best customers
    // (spend above half the maximum customer's) — composed into one
    // target-quarter total. Thresholds are SCALE-FREE (relative to the
    // data's own averages/max), so the shape survives any SF.
    QueryDef(
      "q_tpcds_q23",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val itemCnt = l.join(o.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
          .where(year(col("o_orderdate")).isin(1996, 1997))
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
        // scalar threshold: 1.2 × the average per-item count (broadcast
        // 1-row frame, never collected)
        val thresh = itemCnt.agg(
          (sum(col("cnt")).cast("double") / count(lit(1)) * 1.2).as("th"))
        val frequent = itemCnt.join(broadcast(thresh))
          .where(col("cnt") > col("th")).select("l_partkey")
        val spend = l.join(o.select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey")).agg(fpSum(expr(rev)).as("spend"))
        val maxSpend = spend.agg(max(col("spend")).as("mx"))
        val best = spend.join(broadcast(maxSpend))
          .where(col("spend").cast("double") > col("mx") * 0.5)
          .select(col("o_custkey").as("best_cust"))
        l.join(o.where(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
          .join(frequent, Seq("l_partkey"), "left_semi")
          .join(best, col("o_custkey") === col("best_cust"), "left_semi")
          .agg(money(expr(rev)).as("total"))
      },
      Some(s"""
        WITH item_cnt AS (
          SELECT l_partkey, COUNT(*) AS cnt
          FROM lineitem, orders
          WHERE l_orderkey = o_orderkey AND year(o_orderdate) IN (1996, 1997)
          GROUP BY l_partkey),
        frequent AS (
          SELECT l_partkey FROM item_cnt
          WHERE cnt > (SELECT CAST(SUM(cnt) AS DOUBLE) / COUNT(*) * 1.2
                       FROM item_cnt)),
        spend AS (
          SELECT o_custkey, ${sqlFpSum(rev)} AS spend
          FROM lineitem, orders WHERE l_orderkey = o_orderkey
          GROUP BY o_custkey),
        best AS (
          SELECT o_custkey FROM spend
          WHERE CAST(spend AS DOUBLE) > (SELECT MAX(spend) FROM spend) * 0.5)
        SELECT ${sqlMoney(rev)} AS total
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1997-10-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_partkey IN (SELECT l_partkey FROM frequent)
          AND o_custkey IN (SELECT o_custkey FROM best)
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q24
    // TPC-DS q24 shape: nested aggregation — per (customer, supplier,
    // shared nation) net paid where customer and supplier share a nation,
    // kept only when above 1.5× the average of the aggregate itself
    // (scalar subquery over the CTE).
    QueryDef(
      "q_tpcds_q24",
      sqlQuery(s"""
        WITH ssales AS (
          SELECT c_name, s_name, n_name, ${sqlFpSum(rev)} AS netpaid
          FROM lineitem, orders, customer, supplier, nation
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            AND c_nationkey = n_nationkey
          GROUP BY c_name, s_name, n_name)
        SELECT c_name, s_name, n_name,
               CAST(netpaid AS DOUBLE) / 1e4 AS paid
        FROM ssales
        WHERE CAST(netpaid AS DOUBLE) >
          (SELECT CAST(SUM(netpaid) AS DOUBLE) / COUNT(*) * 1.5 FROM ssales)
        ORDER BY c_name, s_name, n_name"""),
      Some(s"""
        WITH ssales AS (
          SELECT c_name, s_name, n_name, ${sqlFpSum(rev)} AS netpaid
          FROM lineitem, orders, customer, supplier, nation
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            AND c_nationkey = n_nationkey
          GROUP BY c_name, s_name, n_name)
        SELECT c_name, s_name, n_name,
               CAST(netpaid AS DOUBLE) / 1e4 AS paid
        FROM ssales
        WHERE CAST(netpaid AS DOUBLE) >
          (SELECT CAST(SUM(netpaid) AS DOUBLE) / COUNT(*) * 1.5 FROM ssales)
        ORDER BY c_name, s_name, n_name""".stripMargin.trim)),

    // --------------------------------------------------------------- q34
    // TPC-DS q34 shape: households that buy in bulk — order-size buckets
    // (6-7 items per order here; the generated max is 7) joined back to
    // the customer dimension for targeted segments.
    QueryDef(
      "q_tpcds_q34",
      (s, dir) => {
        val oc = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("cnt"))
          .where(col("cnt").between(6, 7))
        Tables.orders(s, dir)
          .join(oc, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables.customer(s, dir)
            .where(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey").as("custkey"),
            col("o_orderkey").as("orderkey"), col("cnt"))
          .orderBy(col("c_name"), col("custkey"), col("orderkey"))
      },
      Some("""
        SELECT c_name, c_custkey AS custkey, o_orderkey AS orderkey, cnt
        FROM (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem
              GROUP BY l_orderkey HAVING COUNT(*) BETWEEN 6 AND 7) oc,
             orders, customer
        WHERE o_orderkey = oc.l_orderkey AND o_custkey = c_custkey
          AND c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
        ORDER BY c_name, custkey, orderkey
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q36
    // TPC-DS q36 shape: gross-margin ROLLUP over the item hierarchy with
    // GROUPING() arithmetic for the hierarchy level and RANK() within
    // each (level, ancestor) partition.
    QueryDef(
      "q_tpcds_q36",
      (s, dir) => {
        val base = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .rollup(col("p_type"), col("p_brand"))
          .agg(
            (fpSum(expr(s"$rev - l_quantity * 10")).cast("double") /
              fpSum(col("l_extendedprice")).cast("double")).as("gross_margin"),
            (grouping(col("p_type")) + grouping(col("p_brand")))
              .cast("int").as("lochierarchy"),
            grouping(col("p_brand")).cast("int").as("gb"))
        base.withColumn("rank_within_parent",
          rank().over(Window
            .partitionBy(col("lochierarchy"),
              when(col("gb") === 0, col("p_type")))
            .orderBy(col("gross_margin").asc_nulls_last,
              col("p_brand").asc_nulls_first)))
          .select(col("gross_margin"), col("p_type").as("ptype"),
            col("p_brand").as("brand"),
            col("lochierarchy"), col("rank_within_parent"))
          .orderBy(col("lochierarchy").desc, col("ptype").asc_nulls_first,
            col("rank_within_parent"))
      },
      Some(s"""
        SELECT gross_margin, ptype, brand, lochierarchy,
               RANK() OVER (
                 PARTITION BY lochierarchy,
                   CASE WHEN gb = 0 THEN ptype END
                 ORDER BY gross_margin ASC NULLS LAST,
                          brand ASC NULLS FIRST) AS rank_within_parent
        FROM (
          SELECT CAST(${sqlFpSum(s"$rev - l_quantity * 10")} AS DOUBLE)
                 / CAST(${sqlFpSum("l_extendedprice")} AS DOUBLE) AS gross_margin,
                 p_type AS ptype, p_brand AS brand,
                 CAST(GROUPING(p_type) + GROUPING(p_brand) AS INT) AS lochierarchy,
                 CAST(GROUPING(p_brand) AS INT) AS gb
          FROM lineitem, part
          WHERE l_partkey = p_partkey
          GROUP BY ROLLUP(p_type, p_brand)) t
        ORDER BY lochierarchy DESC, ptype NULLS FIRST, rank_within_parent
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q38
    // TPC-DS q38 shape: customers active in ALL three years — INTERSECT
    // of multi-column DISTINCT sets, then a single count.
    QueryDef(
      "q_tpcds_q38",
      (s, dir) => {
        val oc = Tables.orders(s, dir)
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
        def yearSet(y: Int) = oc.where(year(col("o_orderdate")) === y)
          .select(col("c_custkey"), col("c_name")).distinct()
        yearSet(1996).intersect(yearSet(1997)).intersect(yearSet(1998))
          .agg(count(lit(1)).as("cnt"))
      },
      Some("""
        SELECT COUNT(*) AS cnt FROM (
          SELECT DISTINCT c_custkey, c_name FROM orders, customer
          WHERE o_custkey = c_custkey AND year(o_orderdate) = 1996
          INTERSECT
          SELECT DISTINCT c_custkey, c_name FROM orders, customer
          WHERE o_custkey = c_custkey AND year(o_orderdate) = 1997
          INTERSECT
          SELECT DISTINCT c_custkey, c_name FROM orders, customer
          WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998) hot
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q39
    // TPC-DS q39 shape: demand variability — per (brand, month) quantity
    // coefficient of variation from exact integer moments, self-joined
    // across two consecutive months where BOTH months are volatile.
    QueryDef(
      "q_tpcds_q39",
      (s, dir) => {
        val stats = Tables.lineitem(s, dir)
          .where(year(col("l_shipdate")) === 1997 &&
            month(col("l_shipdate")).isin(2, 3))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"),
            month(col("l_shipdate")).cast("int").as("mo"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("s"),
            sum(col("l_quantity").cast("long") *
              col("l_quantity").cast("long")).as("sq"))
          .where(col("n") >= 5)
        def cov: Column = {
          val n = col("n"); val sm = col("s"); val sq = col("sq")
          sqrt((n * sq - sm * sm).cast("double") / (n * (n - lit(1L)))) /
            (sm.cast("double") / n)
        }
        val m1 = stats.where(col("mo") === 2)
          .select(col("brand"), cov.as("cov1"))
        val m2 = stats.where(col("mo") === 3)
          .select(col("brand").as("brand2"), cov.as("cov2"))
        m1.join(m2, col("brand") === col("brand2"))
          .where(col("cov1") > 0.57)
          .select(col("brand"), col("cov1"), col("cov2"))
          .orderBy(col("brand"))
      },
      Some {
        def side(mo: Int): String =
          s"""SELECT p_brand AS brand, COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS s,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sq
             FROM lineitem, part
             WHERE l_partkey = p_partkey AND year(l_shipdate) = 1997
               AND month(l_shipdate) = $mo
             GROUP BY p_brand HAVING COUNT(*) >= 5"""
        def cov(t: String): String =
          s"sqrt(CAST($t.n * $t.sq - $t.s * $t.s AS DOUBLE) / ($t.n * ($t.n - 1)))" +
            s" / (CAST($t.s AS DOUBLE) / $t.n)"
        s"""WITH m1 AS (${side(2)}), m2 AS (${side(3)})
           SELECT m1.brand AS brand, ${cov("m1")} AS cov1, ${cov("m2")} AS cov2
           FROM m1, m2
           WHERE m1.brand = m2.brand AND ${cov("m1")} > 0.57
           ORDER BY brand""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q41
    // TPC-DS q41 shape: DISTINCT item names under a correlated COUNT
    // subquery whose body is an OR of AND attribute combinations.
    QueryDef(
      "q_tpcds_q41",
      sqlQuery("""
        SELECT DISTINCT p_name
        FROM part p1
        WHERE p_size BETWEEN 10 AND 20
          AND (SELECT COUNT(*) FROM part p2
               WHERE p2.p_brand = p1.p_brand
                 AND ((p2.p_type = 'PROMO' AND p2.p_size BETWEEN 10 AND 15)
                   OR (p2.p_type = 'ECONOMY' AND p2.p_size BETWEEN 16 AND 20))) > 0
        ORDER BY p_name LIMIT 100"""),
      Some("""
        SELECT DISTINCT p_name
        FROM part p1
        WHERE p_size BETWEEN 10 AND 20
          AND (SELECT COUNT(*) FROM part p2
               WHERE p2.p_brand = p1.p_brand
                 AND ((p2.p_type = 'PROMO' AND p2.p_size BETWEEN 10 AND 15)
                   OR (p2.p_type = 'ECONOMY' AND p2.p_size BETWEEN 16 AND 20))) > 0
        ORDER BY p_name LIMIT 100""".stripMargin.trim)),

    // --------------------------------------------------------------- q44
    // TPC-DS q44 shape: best and worst performing items — two opposite
    // rankings of per-item average profit joined on the rank index, with
    // the item dimension joined twice for the two name columns.
    QueryDef(
      "q_tpcds_q44",
      (s, dir) => {
        val perf = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey"))
          .agg((fpSum(expr(rev)).cast("double") / lit(1e4) /
            count(lit(1))).as("avg_profit"))
        // scale note: the rank is over the PER-ITEM frame (billions of
        // rows at 100 TB) — a bare global rank window would move it all
        // to one task. orderBy+limit plans as TakeOrderedAndProject
        // (distributed top-k, per-partition heads merged on the driver);
        // the window then ranks a 10-ROW frame. The partition key is a
        // row-derived constant (pmod(k, 1) = 0, which constant folding
        // cannot strip) so WindowExec sees a partitioned input — here the
        // input is bounded by the LIMIT, not by luck.
        def top10(order: Seq[org.apache.spark.sql.Column], keyAs: String) =
          perf.orderBy(order: _*).limit(10)
            .select(col("l_partkey").as(keyAs),
              rank().over(Window.partitionBy(pmod(col("l_partkey"), lit(1)))
                .orderBy(order: _*)).as("rnk"))
        val asc = top10(Seq(col("avg_profit").desc, col("l_partkey")),
          "best_key")
        val desc = top10(Seq(col("avg_profit").asc, col("l_partkey")),
          "worst_key")
        val p1 = broadcast(Tables.part(s, dir)
          .select(col("p_partkey").as("bk"), col("p_name").as("best_name")))
        val p2 = broadcast(Tables.part(s, dir)
          .select(col("p_partkey").as("wk"), col("p_name").as("worst_name")))
        asc.join(desc, Seq("rnk"))
          .join(p1, col("best_key") === col("bk"))
          .join(p2, col("worst_key") === col("wk"))
          .select(col("rnk"), col("best_name"), col("worst_name"))
          .orderBy(col("rnk"))
      },
      Some(s"""
        WITH perf AS (
          SELECT l_partkey,
                 CAST(${sqlFpSum(rev)} AS DOUBLE) / 1e4 / COUNT(*) AS avg_profit
          FROM lineitem GROUP BY l_partkey),
        best AS (
          SELECT l_partkey AS best_key,
                 RANK() OVER (ORDER BY avg_profit DESC, l_partkey) AS rnk
          FROM perf),
        worst AS (
          SELECT l_partkey AS worst_key,
                 RANK() OVER (ORDER BY avg_profit ASC, l_partkey) AS rnk
          FROM perf)
        SELECT best.rnk AS rnk, p1.p_name AS best_name, p2.p_name AS worst_name
        FROM best, worst, part p1, part p2
        WHERE best.rnk = worst.rnk AND best.rnk <= 10 AND worst.rnk <= 10
          AND p1.p_partkey = best.best_key AND p2.p_partkey = worst.worst_key
        ORDER BY rnk
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q45
    // TPC-DS q45 shape: web sales by geography where the item is in an
    // IN-subquery set OR the customer is in a static key list.
    QueryDef(
      "q_tpcds_q45",
      (s, dir) => {
        val smallParts = Tables.part(s, dir).where(col("p_size") < 5)
          .select(col("p_partkey"))
        Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 === 2)
          .join(Tables.orders(s, dir)
            .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(smallParts),
            col("l_partkey") === col("p_partkey"), "left")
          .where(col("p_partkey").isNotNull ||
            col("c_custkey").isin(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L))
          .groupBy(col("n_name").as("nation"))
          .agg(money(expr(rev)).as("total"))
          .orderBy(col("nation"))
      },
      Some(s"""
        SELECT n_name AS nation, ${sqlMoney(rev)} AS total
        FROM lineitem, orders, customer, nation
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n_nationkey AND l_linenumber % 3 = 2
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
          AND (l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 5)
            OR c_custkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89))
        GROUP BY n_name ORDER BY nation
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q47
    // TPC-DS q47 shape: monthly brand sales vs the brand-year average and
    // the neighboring months (lag/lead) — windows over an aggregated CTE,
    // keeping months that deviate >10% from their year's average.
    QueryDef(
      "q_tpcds_q47",
      (s, dir) => {
        val v1 = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .where(year(col("o_orderdate")).isin(1996, 1997, 1998))
          .groupBy(col("p_brand").as("brand"),
            year(col("o_orderdate")).cast("int").as("yr"),
            month(col("o_orderdate")).cast("int").as("mo"))
          .agg(fpSum(expr(rev)).as("sum_sales"))
        val wAvg = Window.partitionBy(col("brand"), col("yr"))
        val wSeq = Window.partitionBy(col("brand"))
          .orderBy(col("yr"), col("mo"))
        val v2 = v1
          .withColumn("avg_monthly",
            sum(col("sum_sales")).over(wAvg).cast("double") /
              count(lit(1)).over(wAvg))
          .withColumn("psum", lag(col("sum_sales"), 1).over(wSeq))
          .withColumn("nsum", lead(col("sum_sales"), 1).over(wSeq))
        v2.where(col("yr") === 1997 && col("avg_monthly") > 0 &&
            abs(col("sum_sales").cast("double") - col("avg_monthly")) /
              col("avg_monthly") > 0.1 &&
            col("psum").isNotNull && col("nsum").isNotNull)
          .select(col("brand"), col("yr"), col("mo"),
            (col("sum_sales").cast("double") / 1e4).as("sales"),
            (col("avg_monthly") / 1e4).as("avg_sales"),
            (col("psum").cast("double") / 1e4).as("prev_sales"),
            (col("nsum").cast("double") / 1e4).as("next_sales"))
          .orderBy((col("sum_sales").cast("double") - col("avg_monthly")).asc,
            col("brand"), col("yr"), col("mo"))
          .limit(100)
      },
      Some(s"""
        WITH v1 AS (
          SELECT p_brand AS brand, CAST(year(o_orderdate) AS INT) AS yr,
                 CAST(month(o_orderdate) AS INT) AS mo,
                 ${sqlFpSum(rev)} AS sum_sales
          FROM lineitem, orders, part
          WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
            AND year(o_orderdate) IN (1996, 1997, 1998)
          GROUP BY 1, 2, 3),
        v2 AS (
          SELECT brand, yr, mo, sum_sales,
                 CAST(SUM(sum_sales) OVER (PARTITION BY brand, yr) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY brand, yr) AS avg_monthly,
                 LAG(sum_sales, 1) OVER (PARTITION BY brand ORDER BY yr, mo) AS psum,
                 LEAD(sum_sales, 1) OVER (PARTITION BY brand ORDER BY yr, mo) AS nsum
          FROM v1)
        SELECT brand, yr, mo, CAST(sum_sales AS DOUBLE) / 1e4 AS sales,
               avg_monthly / 1e4 AS avg_sales,
               CAST(psum AS DOUBLE) / 1e4 AS prev_sales,
               CAST(nsum AS DOUBLE) / 1e4 AS next_sales
        FROM v2
        WHERE yr = 1997 AND avg_monthly > 0
          AND abs(CAST(sum_sales AS DOUBLE) - avg_monthly) / avg_monthly > 0.1
          AND psum IS NOT NULL AND nsum IS NOT NULL
        ORDER BY CAST(sum_sales AS DOUBLE) - avg_monthly ASC, brand, yr, mo
        LIMIT 100
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q49
    // TPC-DS q49 shape: worst return ratios per channel — per-channel
    // per-item returned/sold quantity ratios ranked, the top 10 of each
    // channel UNIONed into one report.
    QueryDef(
      "q_tpcds_q49",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val base = l.groupBy(channelCol.as("channel"),
            col("l_partkey").as("item"))
          .agg(
            sum(when(col("l_returnflag") === "R",
              col("l_quantity").cast("long")).otherwise(0L)).as("ret_qty"),
            sum(col("l_quantity").cast("long")).as("sold_qty"))
          .where(col("sold_qty") > 0)
          .withColumn("return_ratio",
            col("ret_qty").cast("double") / col("sold_qty"))
        val w = Window.partitionBy(col("channel"))
          .orderBy(col("return_ratio").desc, col("item"))
        base.withColumn("return_rank", rank().over(w))
          .where(col("return_rank") <= 10)
          .select(col("channel"), col("item"), col("return_ratio"),
            col("return_rank"))
          .orderBy(col("channel"), col("return_rank"), col("item"))
      },
      Some(s"""
        WITH base AS (
          SELECT $sqlChannel AS channel, l_partkey AS item,
                 SUM(CASE WHEN l_returnflag = 'R'
                     THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS ret_qty,
                 SUM(CAST(l_quantity AS BIGINT)) AS sold_qty
          FROM lineitem
          GROUP BY 1, 2 HAVING SUM(CAST(l_quantity AS BIGINT)) > 0),
        ranked AS (
          SELECT channel, item,
                 CAST(ret_qty AS DOUBLE) / sold_qty AS return_ratio,
                 RANK() OVER (PARTITION BY channel
                   ORDER BY CAST(ret_qty AS DOUBLE) / sold_qty DESC, item)
                   AS return_rank
          FROM base)
        SELECT channel, item, return_ratio, return_rank
        FROM ranked WHERE return_rank <= 10
        ORDER BY channel, return_rank, item
      """.stripMargin.trim))
  )
}
