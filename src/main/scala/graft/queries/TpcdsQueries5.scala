package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** TPC-DS query-shape pack, part 5 (see [[TpcdsQueries]] for the schema
  * adaptation rules and determinism conventions). Parts 5-9 complete the
  * pack to all 99 reference-gated query structures
  * (flink-end-to-end-tests/test-scripts/test_tpcds.sh:22 runs the full
  * set; TpcdsTestProgram.java:76,102 row-matches each).
  *
  * Shapes here: the week-over-week pivot ratio report (q2), star
  * multi-average demographics (q7, q26), IN-(INTERSECT-subquery) store
  * gates (q8), two-channel year-over-year growth with CASE-guarded
  * ratios (q11), revenue-share-within-class window ratios (q12, q20),
  * OR-of-AND demographic branch averages (q13), multi-average
  * ROLLUP(region, nation) reports (q18), cross-nation inequality brand
  * revenue (q19), the deep ROLLUP quantity-on-hand report (q22), and the
  * three-way channel sales/returns/catalog profit join (q25).
  *
  * Window-ratio determinism: per-group revenues stay scale-4 fixed-point
  * BIGINT through the window sum (exact in any accumulation order); only
  * the final ratio divides as double — identical operands, identical
  * IEEE result in both engines.
  */
object TpcdsQueries5 {

  import TpcdsQueries.{rev, fpSum, sqlFpSum, money, sqlMoney, channelCol,
    sqlChannel, sqlQuery}
  import org.apache.spark.sql.Column

  /** floor-to-2-decimals of a ratio of two fixed-point BIGINT sums,
    * null-guarded against empty/zero denominators. */
  private def ratio2(num: Column, den: Column): Column =
    when(den > 0, floor(num.cast("double") / den * 100.0) / 100.0)
  private def sqlRatio2(num: String, den: String): String =
    s"CASE WHEN $den > 0 THEN floor(CAST($num AS DOUBLE) / $den * 100.0) / 100.0 END"

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q2
    // TPC-DS q2 shape: the week-over-week pivot — per-(week, day-of-week)
    // revenue pivoted to 7 columns, the SAME week self-joined across two
    // consecutive years, one ratio column per weekday.
    QueryDef(
      "q_tpcds_q2",
      (s, dir) => {
        val lo = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .where(year(col("o_orderdate")).isin(1996, 1997))
        // Spark dayofweek is 1=Sunday; the oracle's dayofweek is 0=Sunday
        def dowSum(d: Int) =
          fpSum(when(dayofweek(col("o_orderdate")) === d + 1, expr(rev)))
        val wk = lo.groupBy(year(col("o_orderdate")).cast("int").as("yr"),
            weekofyear(col("o_orderdate")).cast("int").as("wk"))
          .agg(dowSum(0).as("sun"), dowSum(1).as("mon"), dowSum(2).as("tue"),
            dowSum(3).as("wed"), dowSum(4).as("thu"), dowSum(5).as("fri"),
            dowSum(6).as("sat"))
        val y1 = wk.where(col("yr") === 1996).drop("yr")
        val y2 = wk.where(col("yr") === 1997).drop("yr")
          .select(col("wk").as("wk2"), col("sun").as("sun2"),
            col("mon").as("mon2"), col("tue").as("tue2"),
            col("wed").as("wed2"), col("thu").as("thu2"),
            col("fri").as("fri2"), col("sat").as("sat2"))
        y1.join(y2, col("wk") === col("wk2"))
          .select(col("wk"),
            ratio2(col("sun"), col("sun2")).as("r_sun"),
            ratio2(col("mon"), col("mon2")).as("r_mon"),
            ratio2(col("tue"), col("tue2")).as("r_tue"),
            ratio2(col("wed"), col("wed2")).as("r_wed"),
            ratio2(col("thu"), col("thu2")).as("r_thu"),
            ratio2(col("fri"), col("fri2")).as("r_fri"),
            ratio2(col("sat"), col("sat2")).as("r_sat"))
          .orderBy(col("wk"))
      },
      Some {
        def d(i: Int, as: String) =
          s"SUM(CASE WHEN dayofweek(o_orderdate) = $i THEN CAST(floor(($rev) * 1e4) AS BIGINT) END) AS $as"
        s"""
        WITH wk AS (
          SELECT CAST(year(o_orderdate) AS INT) AS yr,
                 CAST(weekofyear(o_orderdate) AS INT) AS wk,
                 ${d(0, "sun")}, ${d(1, "mon")}, ${d(2, "tue")},
                 ${d(3, "wed")}, ${d(4, "thu")}, ${d(5, "fri")}, ${d(6, "sat")}
          FROM lineitem, orders
          WHERE l_orderkey = o_orderkey AND year(o_orderdate) IN (1996, 1997)
          GROUP BY 1, 2)
        SELECT y1.wk AS wk,
               ${sqlRatio2("y1.sun", "y2.sun")} AS r_sun,
               ${sqlRatio2("y1.mon", "y2.mon")} AS r_mon,
               ${sqlRatio2("y1.tue", "y2.tue")} AS r_tue,
               ${sqlRatio2("y1.wed", "y2.wed")} AS r_wed,
               ${sqlRatio2("y1.thu", "y2.thu")} AS r_thu,
               ${sqlRatio2("y1.fri", "y2.fri")} AS r_fri,
               ${sqlRatio2("y1.sat", "y2.sat")} AS r_sat
        FROM wk y1 JOIN wk y2 ON y1.wk = y2.wk
        WHERE y1.yr = 1996 AND y2.yr = 1997
        ORDER BY wk""".stripMargin.trim
      }),

    // ---------------------------------------------------------------- q7
    // TPC-DS q7 shape: the multi-average demographics star — four AVG
    // aggregates per item over a demographic+promo slice.
    QueryDef(
      "q_tpcds_q7",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .where(col("c_mktsegment") === "AUTOMOBILE" &&
            col("o_orderpriority").startsWith("1"))
          .groupBy(col("p_name").as("item"))
          .agg(Exact.davg(col("l_quantity"), 4).as("agg1"),
            Exact.davg(col("l_discount"), 4).as("agg2"),
            Exact.davg(col("l_extendedprice"), 4).as("agg3"),
            Exact.davg(col("p_retailprice"), 4).as("agg4"))
          .orderBy(col("item"))
          .limit(100)
      },
      Some(s"""
        SELECT p_name AS item,
               ${Exact.sqlAvg("l_quantity", 4)} AS agg1,
               ${Exact.sqlAvg("l_discount", 4)} AS agg2,
               ${Exact.sqlAvg("l_extendedprice", 4)} AS agg3,
               ${Exact.sqlAvg("p_retailprice", 4)} AS agg4
        FROM lineitem, orders, customer, part
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_partkey = p_partkey AND c_mktsegment = 'AUTOMOBILE'
          AND o_orderpriority LIKE '1%'
        GROUP BY 1 ORDER BY item LIMIT 100""".stripMargin.trim)),

    // ---------------------------------------------------------------- q8
    // TPC-DS q8 shape: store revenue gated by an IN-(INTERSECT of two
    // subqueries) — nations dense in customers ∩ nations with preferred
    // (high-balance) customers.
    QueryDef(
      "q_tpcds_q8",
      sqlQuery(s"""
        SELECT s_name, ${sqlMoney(rev)} AS net_profit
        FROM lineitem, supplier
        WHERE l_suppkey = s_suppkey
          AND s_nationkey IN (
            SELECT c_nationkey FROM customer
            GROUP BY c_nationkey HAVING COUNT(*) >= 55
            INTERSECT
            SELECT DISTINCT c_nationkey FROM customer
            WHERE c_acctbal > 7000)
        GROUP BY s_name ORDER BY s_name"""),
      Some(s"""
        SELECT s_name, ${sqlMoney(rev)} AS net_profit
        FROM lineitem, supplier
        WHERE l_suppkey = s_suppkey
          AND s_nationkey IN (
            SELECT c_nationkey FROM customer
            GROUP BY c_nationkey HAVING COUNT(*) >= 55
            INTERSECT
            SELECT DISTINCT c_nationkey FROM customer
            WHERE c_acctbal > 7000)
        GROUP BY s_name ORDER BY s_name""".stripMargin.trim)),

    // --------------------------------------------------------------- q11
    // TPC-DS q11 shape: two-channel year-over-year customer growth with
    // the CASE-guarded ratio comparison (q4's family, but the guard is
    // CASE WHEN total > 0 THEN ratio ELSE 0 END — customers with no
    // first-year sales on a channel compare as 0, not dropped).
    QueryDef(
      "q_tpcds_q11",
      (s, dir) => {
        val yt = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .where(year(col("o_orderdate")).isin(1997, 1998))
          .groupBy(col("c_custkey").as("cust"), col("c_name").as("cname"),
            year(col("o_orderdate")).cast("int").as("yr"), channelCol.as("ch"))
          .agg(fpSum(expr(rev)).as("total"))
        def slice(yr: Int, ch: String, as: String) =
          yt.where(col("yr") === yr && col("ch") === ch)
            .select(col("cust").as(s"${as}_cust"),
              col("cname").as(s"${as}_name"), col("total").as(as))
        def grow(first: Column, second: Column) =
          when(first > 0, second.cast("double") / first).otherwise(lit(0.0))
        slice(1997, "store", "s1")
          .join(slice(1998, "store", "s2"), col("s1_cust") === col("s2_cust"))
          .join(slice(1997, "catalog", "c1"), col("s1_cust") === col("c1_cust"))
          .join(slice(1998, "catalog", "c2"), col("s1_cust") === col("c2_cust"))
          .where(grow(col("c1"), col("c2")) > grow(col("s1"), col("s2")))
          .select(col("s1_cust").as("cust"), col("s1_name").as("cname"))
          .orderBy(col("cust"))
          .limit(100)
      },
      Some(s"""
        WITH yt AS (
          SELECT c_custkey AS cust, c_name AS cname,
                 CAST(year(o_orderdate) AS INT) AS yr,
                 $sqlChannel AS ch, ${sqlFpSum(rev)} AS total
          FROM lineitem, orders, customer
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND year(o_orderdate) IN (1997, 1998)
          GROUP BY 1, 2, 3, 4)
        SELECT s1.cust AS cust, s1.cname AS cname
        FROM yt s1, yt s2, yt c1, yt c2
        WHERE s1.cust = s2.cust AND s1.cust = c1.cust AND s1.cust = c2.cust
          AND s1.ch = 'store' AND s1.yr = 1997
          AND s2.ch = 'store' AND s2.yr = 1998
          AND c1.ch = 'catalog' AND c1.yr = 1997
          AND c2.ch = 'catalog' AND c2.yr = 1998
          AND (CASE WHEN c1.total > 0
                 THEN CAST(c2.total AS DOUBLE) / c1.total ELSE 0.0 END)
            > (CASE WHEN s1.total > 0
                 THEN CAST(s2.total AS DOUBLE) / s1.total ELSE 0.0 END)
        ORDER BY cust LIMIT 100""".stripMargin.trim)),

    // --------------------------------------------------------------- q12
    // TPC-DS q12 shape: revenue share within class — per-item revenue
    // with its percentage of the item type's total via a window sum over
    // the aggregated (exact fixed-point) revenue.
    QueryDef(
      "q_tpcds_q12",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val item = Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 === 2) // web channel
          .where(col("l_shipdate") >= "1997-05-01" &&
            col("l_shipdate") < "1997-07-01")
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_name").as("item"), col("p_type").as("class"))
          .agg(fpSum(expr(rev)).as("fp_rev"))
        val w = Window.partitionBy(col("class"))
        item
          .withColumn("revenueratio",
            col("fp_rev").cast("double") * 100.0 / sum(col("fp_rev")).over(w))
          .select(col("item"), col("class"),
            (col("fp_rev").cast("double") / 1e4).as("itemrevenue"),
            col("revenueratio"))
          .orderBy(col("class"), col("revenueratio"), col("item"))
      },
      Some(s"""
        WITH item AS (
          SELECT p_name AS item, p_type AS class, ${sqlFpSum(rev)} AS fp_rev
          FROM lineitem, part
          WHERE l_partkey = p_partkey AND l_linenumber % 3 = 2
            AND l_shipdate >= TIMESTAMP '1997-05-01'
            AND l_shipdate < TIMESTAMP '1997-07-01'
          GROUP BY 1, 2)
        SELECT item, class, CAST(fp_rev AS DOUBLE) / 1e4 AS itemrevenue,
               CAST(fp_rev AS DOUBLE) * 100.0
                 / SUM(fp_rev) OVER (PARTITION BY class) AS revenueratio
        FROM item
        ORDER BY class, revenueratio, item""".stripMargin.trim)),

    // --------------------------------------------------------------- q13
    // TPC-DS q13 shape: one aggregate row under an OR of three AND'd
    // demographic × quantity × balance branch conditions.
    QueryDef(
      "q_tpcds_q13",
      (s, dir) => {
        val branch =
          (col("c_mktsegment") === "AUTOMOBILE" &&
            col("c_acctbal").between(100, 5000) &&
            col("l_quantity").between(1, 20)) ||
          (col("c_mktsegment") === "BUILDING" &&
            col("c_acctbal").between(3000, 8000) &&
            col("l_quantity").between(21, 35)) ||
          (col("c_mktsegment") === "MACHINERY" &&
            col("c_acctbal").between(50, 2500) &&
            col("l_quantity").between(36, 50))
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .where(branch)
          .agg(Exact.davg(col("l_quantity"), 4).as("avg_qty"),
            Exact.davg(col("l_extendedprice"), 4).as("avg_price"),
            Exact.davg(col("l_discount"), 4).as("avg_disc"),
            money(expr(rev)).as("sum_rev"))
      },
      Some(s"""
        SELECT ${Exact.sqlAvg("l_quantity", 4)} AS avg_qty,
               ${Exact.sqlAvg("l_extendedprice", 4)} AS avg_price,
               ${Exact.sqlAvg("l_discount", 4)} AS avg_disc,
               ${sqlMoney(rev)} AS sum_rev
        FROM lineitem, orders, customer
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND ((c_mktsegment = 'AUTOMOBILE' AND c_acctbal BETWEEN 100 AND 5000
                AND l_quantity BETWEEN 1 AND 20)
            OR (c_mktsegment = 'BUILDING' AND c_acctbal BETWEEN 3000 AND 8000
                AND l_quantity BETWEEN 21 AND 35)
            OR (c_mktsegment = 'MACHINERY' AND c_acctbal BETWEEN 50 AND 2500
                AND l_quantity BETWEEN 36 AND 50))""".stripMargin.trim)),

    // --------------------------------------------------------------- q18
    // TPC-DS q18 shape: multi-average report over ROLLUP(geography) —
    // averages + count at nation, region and grand-total levels.
    QueryDef(
      "q_tpcds_q18",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey"))
          .where(col("o_orderpriority") === "1-URGENT")
          .rollup(col("r_name").as("region"), col("n_name").as("nation"))
          .agg(Exact.davg(col("l_quantity"), 4).as("agg1"),
            Exact.davg(col("l_extendedprice"), 4).as("agg2"),
            Exact.davg(col("l_discount"), 4).as("agg3"),
            count(lit(1)).as("cnt"))
          .orderBy(col("region").asc_nulls_first, col("nation").asc_nulls_first)
      },
      Some(s"""
        SELECT r_name AS region, n_name AS nation,
               ${Exact.sqlAvg("l_quantity", 4)} AS agg1,
               ${Exact.sqlAvg("l_extendedprice", 4)} AS agg2,
               ${Exact.sqlAvg("l_discount", 4)} AS agg3,
               COUNT(*) AS cnt
        FROM lineitem, orders, customer, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND o_orderpriority = '1-URGENT'
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region NULLS FIRST, nation NULLS FIRST""".stripMargin.trim)),

    // --------------------------------------------------------------- q19
    // TPC-DS q19 shape: brand revenue where the buyer's and the seller's
    // geographies DIFFER — the classic "customer zip <> store zip"
    // inequality riding on top of the equi-join.
    QueryDef(
      "q_tpcds_q19",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .where(col("s_nationkey") =!= col("c_nationkey") &&
            year(col("o_orderdate")) === 1997 &&
            month(col("o_orderdate")) === 11)
          .groupBy(col("p_brand").as("brand"))
          .agg(money(expr(rev)).as("ext_price"))
          .orderBy(col("ext_price").desc, col("brand"))
      },
      Some(s"""
        SELECT p_brand AS brand, ${sqlMoney(rev)} AS ext_price
        FROM lineitem, orders, customer, supplier, part
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND l_partkey = p_partkey
          AND s_nationkey <> c_nationkey
          AND year(o_orderdate) = 1997 AND month(o_orderdate) = 11
        GROUP BY 1 ORDER BY ext_price DESC, brand""".stripMargin.trim)),

    // --------------------------------------------------------------- q20
    // TPC-DS q20 shape: q12's window-share structure on the catalog
    // channel, share within brand.
    QueryDef(
      "q_tpcds_q20",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val item = Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 === 0) // catalog channel
          .where(col("l_shipdate") >= "1996-02-01" &&
            col("l_shipdate") < "1996-04-01")
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_name").as("item"), col("p_brand").as("brand"))
          .agg(fpSum(expr(rev)).as("fp_rev"))
        val w = Window.partitionBy(col("brand"))
        item
          .withColumn("revenueratio",
            col("fp_rev").cast("double") * 100.0 / sum(col("fp_rev")).over(w))
          .select(col("brand"), col("item"),
            (col("fp_rev").cast("double") / 1e4).as("itemrevenue"),
            col("revenueratio"))
          .orderBy(col("brand"), col("revenueratio"), col("item"))
      },
      Some(s"""
        WITH item AS (
          SELECT p_name AS item, p_brand AS brand, ${sqlFpSum(rev)} AS fp_rev
          FROM lineitem, part
          WHERE l_partkey = p_partkey AND l_linenumber % 3 = 0
            AND l_shipdate >= TIMESTAMP '1996-02-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1, 2)
        SELECT brand, item, CAST(fp_rev AS DOUBLE) / 1e4 AS itemrevenue,
               CAST(fp_rev AS DOUBLE) * 100.0
                 / SUM(fp_rev) OVER (PARTITION BY brand) AS revenueratio
        FROM item
        ORDER BY brand, revenueratio, item""".stripMargin.trim)),

    // --------------------------------------------------------------- q22
    // TPC-DS q22 shape: the deep inventory ROLLUP — average quantity on
    // hand over ROLLUP(product, brand, class), ordered by the average.
    QueryDef(
      "q_tpcds_q22",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .rollup(col("p_name").as("product"), col("p_brand").as("brand"),
            col("p_type").as("class"))
          .agg(Exact.davg(col("l_quantity"), 4).as("qoh"))
          .orderBy(col("qoh"), col("product").asc_nulls_first,
            col("brand").asc_nulls_first, col("class").asc_nulls_first)
          .limit(100)
      },
      Some(s"""
        SELECT p_name AS product, p_brand AS brand, p_type AS class,
               ${Exact.sqlAvg("l_quantity", 4)} AS qoh
        FROM lineitem, part
        WHERE l_partkey = p_partkey
        GROUP BY ROLLUP(p_name, p_brand, p_type)
        ORDER BY qoh, product NULLS FIRST, brand NULLS FIRST,
                 class NULLS FIRST
        LIMIT 100""".stripMargin.trim)),

    // --------------------------------------------------------------- q25
    // TPC-DS q25 shape: the three-way channel join — store sales ⋈ store
    // returns ⋈ catalog sales aggregated per (item, store), profit per
    // leg.
    QueryDef(
      "q_tpcds_q25",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        def legAgg(leg: org.apache.spark.sql.DataFrame, as: String) =
          leg.groupBy(col("l_partkey").as(s"${as}_pk"),
              col("l_suppkey").as(s"${as}_sk"))
            .agg(fpSum(expr(rev)).as(as))
        val ss = legAgg(l.where(col("l_linenumber") % 3 === 1 &&
          col("l_returnflag") =!= "R"), "ss")
        val sr = legAgg(l.where(col("l_linenumber") % 3 === 1 &&
          col("l_returnflag") === "R"), "sr")
        val cs = legAgg(l.where(col("l_linenumber") % 3 === 0), "cs")
        ss.join(sr, col("ss_pk") === col("sr_pk") &&
            col("ss_sk") === col("sr_sk"))
          .join(cs, col("ss_pk") === col("cs_pk") &&
            col("ss_sk") === col("cs_sk"))
          .join(broadcast(Tables.part(s, dir)),
            col("ss_pk") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("ss_sk") === col("s_suppkey"))
          .select(col("p_name").as("item"), col("s_name").as("store"),
            (col("ss").cast("double") / 1e4).as("store_sales_profit"),
            (col("sr").cast("double") / 1e4).as("store_returns_loss"),
            (col("cs").cast("double") / 1e4).as("catalog_sales_profit"))
          .orderBy(col("item"), col("store"))
          .limit(100)
      },
      Some(s"""
        WITH ss AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                      ${sqlFpSum(rev)} AS v
                    FROM lineitem
                    WHERE l_linenumber % 3 = 1 AND l_returnflag <> 'R'
                    GROUP BY 1, 2),
             sr AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                      ${sqlFpSum(rev)} AS v
                    FROM lineitem
                    WHERE l_linenumber % 3 = 1 AND l_returnflag = 'R'
                    GROUP BY 1, 2),
             cs AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                      ${sqlFpSum(rev)} AS v
                    FROM lineitem WHERE l_linenumber % 3 = 0
                    GROUP BY 1, 2)
        SELECT p_name AS item, s_name AS store,
               CAST(ss.v AS DOUBLE) / 1e4 AS store_sales_profit,
               CAST(sr.v AS DOUBLE) / 1e4 AS store_returns_loss,
               CAST(cs.v AS DOUBLE) / 1e4 AS catalog_sales_profit
        FROM ss, sr, cs, part, supplier
        WHERE ss.pk = sr.pk AND ss.sk = sr.sk
          AND ss.pk = cs.pk AND ss.sk = cs.sk
          AND ss.pk = p_partkey AND ss.sk = s_suppkey
        ORDER BY item, store LIMIT 100""".stripMargin.trim)),

    // --------------------------------------------------------------- q26
    // TPC-DS q26 shape: q7's multi-average star on the catalog channel
    // with a different demographic slice, grouped by brand.
    QueryDef(
      "q_tpcds_q26",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 === 0) // catalog channel
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .where(col("c_mktsegment") === "HOUSEHOLD" &&
            col("o_orderstatus") === "O")
          .groupBy(col("p_brand").as("brand"))
          .agg(Exact.davg(col("l_quantity"), 4).as("agg1"),
            Exact.davg(col("l_extendedprice"), 4).as("agg2"),
            Exact.davg(col("l_discount"), 4).as("agg3"),
            Exact.davg(col("l_tax"), 4).as("agg4"))
          .orderBy(col("brand"))
          .limit(100)
      },
      Some(s"""
        SELECT p_brand AS brand,
               ${Exact.sqlAvg("l_quantity", 4)} AS agg1,
               ${Exact.sqlAvg("l_extendedprice", 4)} AS agg2,
               ${Exact.sqlAvg("l_discount", 4)} AS agg3,
               ${Exact.sqlAvg("l_tax", 4)} AS agg4
        FROM lineitem, orders, customer, part
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_partkey = p_partkey AND c_mktsegment = 'HOUSEHOLD'
          AND o_orderstatus = 'O' AND l_linenumber % 3 = 0
        GROUP BY 1 ORDER BY brand LIMIT 100""".stripMargin.trim))
  )
}
