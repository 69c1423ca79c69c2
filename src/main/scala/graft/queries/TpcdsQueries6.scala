package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** TPC-DS query-shape pack, part 6 (see [[TpcdsQueries]] for the schema
  * adaptation rules and determinism conventions).
  *
  * Shapes here: the partial-ROLLUP demographic star (q27 — GROUP BY
  * item, ROLLUP(state)), the six-bucket single-row price statistics
  * cross-tab (q28), the quantity flavor of the three-way channel join
  * (q29), per-state return-ratio customer detail (q30), the correlated
  * "excess discount" scalar subquery (q32), the three-channel UNION ALL
  * manufacturer report (q33), item-attribute filtering through fact
  * activity gates (q37), the before/after-date conditional pivot (q40),
  * the plain category star report (q42), the day-of-week pivot per
  * store (q43), weekend cross-geography trips (q46), and the OR-of-AND
  * single-sum (q48).
  */
object TpcdsQueries6 {

  import TpcdsQueries.{rev, fpSum, sqlFpSum, money, sqlMoney, channelCol,
    sqlChannel, sqlQuery}

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q27
    // TPC-DS q27 shape: averages per item over GROUP BY item,
    // ROLLUP(state) — a PARTIAL rollup (grand total per item, not
    // overall), expressed with GROUPING SETS semantics.
    QueryDef(
      "q_tpcds_q27",
      sqlQuery(s"""
        SELECT p_type AS item, n_name AS state,
               ${Exact.sqlAvg("l_quantity", 4)} AS agg1,
               ${Exact.sqlAvg("l_extendedprice", 4)} AS agg2,
               ${Exact.sqlAvg("l_discount", 4)} AS agg3
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN part ON l_partkey = p_partkey
        WHERE c_mktsegment = 'FURNITURE' AND l_linenumber % 3 = 1
        GROUP BY p_type, ROLLUP(n_name)
        ORDER BY item, state NULLS FIRST"""),
      Some(s"""
        SELECT p_type AS item, n_name AS state,
               ${Exact.sqlAvg("l_quantity", 4)} AS agg1,
               ${Exact.sqlAvg("l_extendedprice", 4)} AS agg2,
               ${Exact.sqlAvg("l_discount", 4)} AS agg3
        FROM lineitem, orders, customer, supplier, nation, part
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND l_partkey = p_partkey
          AND c_mktsegment = 'FURNITURE' AND l_linenumber % 3 = 1
        GROUP BY p_type, ROLLUP(n_name)
        ORDER BY item, state NULLS FIRST""".stripMargin.trim)),

    // --------------------------------------------------------------- q28
    // TPC-DS q28 shape: six quantity-band buckets of (avg price, count,
    // distinct-price count). The r13 form was one ungrouped agg with six
    // countDistincts — Catalyst rewrites that into an Expand (6× the
    // full fact scan) feeding a SINGLE final partition, the worst shape
    // at scale (VERDICT r14 #3). The benchmark's own spelling is six
    // scans cross-joined; the Spark-first plan is better than both: ONE
    // scan, a manual two-phase distinct — partial groupBy
    // (band, price) [count + exact decimal partial sums], then a
    // band-level final agg where count(*) IS the distinct-price count —
    // and a trivial 6-row pivot. One well-distributed shuffle on
    // (band, price), no Expand, no single-reducer distinct.
    QueryDef(
      "q_tpcds_q28",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val bands =
          Seq((1, 1, 8), (2, 9, 16), (3, 17, 24), (4, 25, 32),
            (5, 33, 40), (6, 41, 50))
        val bandCol = bands.foldLeft(lit(null).cast("int")) {
          case (acc, (b, lo, hi)) =>
            when(col("l_quantity").between(lo, hi), b).otherwise(acc)
        }
        val perPrice = l
          .select(col("l_extendedprice"), bandCol.as("band"))
          // NULL prices must not form a (band, NULL) group: count(*) at the
          // band level plays the role of countDistinct(price), which ignores
          // NULL (ADVICE r15 — moot on TPC-H's NOT NULL column, load-bearing
          // on any nullable price)
          .where(col("band").isNotNull && col("l_extendedprice").isNotNull)
          .groupBy(col("band"), col("l_extendedprice"))
          .agg(
            count(lit(1)).as("c"),
            sum(col("l_extendedprice")
              .cast(org.apache.spark.sql.types.DecimalType(25, 4))).as("s"))
        val perBand = perPrice
          .groupBy(col("band"))
          .agg(
            (sum(col("s")).cast("double") / sum(col("c"))).as("avg"),
            sum(col("c")).as("cnt"),
            count(lit(1)).as("cntd"))
        val pivots = bands.flatMap { case (b, _, _) =>
          Seq(
            max(when(col("band") === b, col("avg"))).as(s"b${b}_avg"),
            max(when(col("band") === b, col("cnt"))).as(s"b${b}_cnt"),
            max(when(col("band") === b, col("cntd"))).as(s"b${b}_cntd"))
        }
        perBand.agg(pivots.head, pivots.tail: _*)
      },
      Some {
        // every clause counts only NON-NULL prices (official
        // count(ss_list_price) semantics) — keeps the oracle symmetric
        // with the DSL side's isNotNull guard on a nullable price column
        def b(i: Int, lo: Int, hi: Int): String =
          s"""CAST(SUM(CAST(CASE WHEN l_quantity BETWEEN $lo AND $hi
                THEN l_extendedprice END AS DECIMAL(25,4))) AS DOUBLE)
                / COUNT(CASE WHEN l_quantity BETWEEN $lo AND $hi
                THEN l_extendedprice END) AS b${i}_avg,
              COUNT(CASE WHEN l_quantity BETWEEN $lo AND $hi
                THEN l_extendedprice END) AS b${i}_cnt,
              COUNT(DISTINCT CASE WHEN l_quantity BETWEEN $lo AND $hi
                THEN l_extendedprice END) AS b${i}_cntd"""
        s"""SELECT ${b(1, 1, 8)}, ${b(2, 9, 16)}, ${b(3, 17, 24)},
                   ${b(4, 25, 32)}, ${b(5, 33, 40)}, ${b(6, 41, 50)}
           FROM lineitem""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q29
    // TPC-DS q29 shape: q25's three-way channel join, quantity measures,
    // grouped to item × store names.
    QueryDef(
      "q_tpcds_q29",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        def legAgg(leg: org.apache.spark.sql.DataFrame, as: String) =
          leg.groupBy(col("l_partkey").as(s"${as}_pk"),
              col("l_suppkey").as(s"${as}_sk"))
            .agg(sum(col("l_quantity").cast("long")).as(as))
        val ss = legAgg(l.where(col("l_linenumber") % 3 === 1 &&
          col("l_linestatus") === "F"), "ss_qty")
        val sr = legAgg(l.where(col("l_linenumber") % 3 === 1 &&
          col("l_returnflag") === "R"), "sr_qty")
        val cs = legAgg(l.where(col("l_linenumber") % 3 === 0), "cs_qty")
        ss.join(sr, col("ss_qty_pk") === col("sr_qty_pk") &&
            col("ss_qty_sk") === col("sr_qty_sk"))
          .join(cs, col("ss_qty_pk") === col("cs_qty_pk") &&
            col("ss_qty_sk") === col("cs_qty_sk"))
          .join(broadcast(Tables.part(s, dir)),
            col("ss_qty_pk") === col("p_partkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("ss_qty_sk") === col("s_suppkey"))
          .select(col("p_name").as("item"), col("s_name").as("store"),
            col("ss_qty"), col("sr_qty"), col("cs_qty"))
          .orderBy(col("item"), col("store"))
          .limit(100)
      },
      Some(s"""
        WITH ss AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
                    FROM lineitem
                    WHERE l_linenumber % 3 = 1 AND l_linestatus = 'F'
                    GROUP BY 1, 2),
             sr AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
                    FROM lineitem
                    WHERE l_linenumber % 3 = 1 AND l_returnflag = 'R'
                    GROUP BY 1, 2),
             cs AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
                    FROM lineitem WHERE l_linenumber % 3 = 0
                    GROUP BY 1, 2)
        SELECT p_name AS item, s_name AS store, ss.v AS ss_qty,
               sr.v AS sr_qty, cs.v AS cs_qty
        FROM ss, sr, cs, part, supplier
        WHERE ss.pk = sr.pk AND ss.sk = sr.sk
          AND ss.pk = cs.pk AND ss.sk = cs.sk
          AND ss.pk = p_partkey AND ss.sk = s_suppkey
        ORDER BY item, store LIMIT 100""".stripMargin.trim)),

    // --------------------------------------------------------------- q30
    // TPC-DS q30 shape: q1's correlated return-ratio, web channel, with
    // customer detail output (the reference returns the customer's
    // identity columns, not just the key).
    QueryDef(
      "q_tpcds_q30",
      sqlQuery(s"""
        WITH ctr AS (
          SELECT c_custkey AS ctr_cust, c_name AS ctr_name,
                 c_acctbal AS ctr_bal, c_nationkey AS ctr_nation,
                 ${sqlFpSum(rev)} AS ctr_total
          FROM lineitem, orders, customer
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_returnflag = 'R' AND l_linenumber % 3 = 2
          GROUP BY 1, 2, 3, 4)
        SELECT ctr_cust, ctr_name, ctr_bal,
               CAST(ctr_total AS DOUBLE) / 1e4 AS return_amt
        FROM ctr c1
        WHERE ctr_total > (SELECT CAST(SUM(c2.ctr_total) AS DOUBLE)
                             / COUNT(*) * 1.2
                           FROM ctr c2
                           WHERE c2.ctr_nation = c1.ctr_nation)
        ORDER BY ctr_cust LIMIT 50"""),
      Some(s"""
        WITH ctr AS (
          SELECT c_custkey AS ctr_cust, c_name AS ctr_name,
                 c_acctbal AS ctr_bal, c_nationkey AS ctr_nation,
                 ${sqlFpSum(rev)} AS ctr_total
          FROM lineitem, orders, customer
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_returnflag = 'R' AND l_linenumber % 3 = 2
          GROUP BY 1, 2, 3, 4)
        SELECT ctr_cust, ctr_name, ctr_bal,
               CAST(ctr_total AS DOUBLE) / 1e4 AS return_amt
        FROM ctr c1
        WHERE ctr_total > (SELECT CAST(SUM(c2.ctr_total) AS DOUBLE)
                             / COUNT(*) * 1.2
                           FROM ctr c2
                           WHERE c2.ctr_nation = c1.ctr_nation)
        ORDER BY ctr_cust LIMIT 50""".stripMargin.trim)),

    // --------------------------------------------------------------- q32
    // TPC-DS q32 shape: "excess discount" — the sum over rows whose
    // discount exceeds 1.3× the per-part average discount (correlated
    // scalar aggregate on the SAME fact table).
    QueryDef(
      "q_tpcds_q32",
      sqlQuery(s"""
        SELECT ${sqlMoney("l1.l_extendedprice")} AS excess_discount_amount
        FROM lineitem l1, part
        WHERE l1.l_partkey = p_partkey AND p_type = 'PROMO'
          AND l1.l_discount > (
            SELECT 1.3 * (CAST(SUM(CAST(l2.l_discount AS DECIMAL(25,4)))
                     AS DOUBLE) / COUNT(*))
            FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey)"""),
      Some(s"""
        SELECT ${sqlMoney("l1.l_extendedprice")} AS excess_discount_amount
        FROM lineitem l1, part
        WHERE l1.l_partkey = p_partkey AND p_type = 'PROMO'
          AND l1.l_discount > (
            SELECT 1.3 * (CAST(SUM(CAST(l2.l_discount AS DECIMAL(25,4)))
                     AS DOUBLE) / COUNT(*))
            FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey)""".stripMargin.trim)),

    // --------------------------------------------------------------- q33
    // TPC-DS q33 shape: per-manufacturer revenue summed across three
    // per-channel aggregates UNION ALL'd together (each channel
    // aggregated independently, then re-grouped).
    QueryDef(
      "q_tpcds_q33",
      (s, dir) => {
        val base = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).where(col("p_type") === "ECONOMY")),
            col("l_partkey") === col("p_partkey"))
          .where(month(col("l_shipdate")) === 3)
        def ch(n: Int) = base.where(col("l_linenumber") % 3 === n)
          .groupBy(col("p_brand").as("manufacturer"))
          .agg(fpSum(expr(rev)).as("fp"))
        ch(0).unionByName(ch(1)).unionByName(ch(2))
          .groupBy(col("manufacturer"))
          .agg((sum(col("fp")).cast("double") / 1e4).as("total_sales"))
          .orderBy(col("total_sales").desc, col("manufacturer"))
          .limit(100)
      },
      Some(s"""
        WITH per AS (
          SELECT l_linenumber % 3 AS ch, p_brand AS manufacturer,
                 ${sqlFpSum(rev)} AS fp
          FROM lineitem, part
          WHERE l_partkey = p_partkey AND p_type = 'ECONOMY'
            AND month(l_shipdate) = 3
          GROUP BY 1, 2)
        SELECT manufacturer, CAST(SUM(fp) AS DOUBLE) / 1e4 AS total_sales
        FROM per GROUP BY 1
        ORDER BY total_sales DESC, manufacturer LIMIT 100"""
        .stripMargin.trim)),

    // --------------------------------------------------------------- q37
    // TPC-DS q37 shape: item attributes gated by a retail-price band AND
    // fact activity in a date+quantity window (join-as-semi-filter,
    // GROUP BY collapses the fact multiplicity).
    QueryDef(
      "q_tpcds_q37",
      (s, dir) => {
        Tables.part(s, dir)
          .where(col("p_retailprice").between(920, 980))
          .join(Tables.lineitem(s, dir)
            .where(col("l_shipdate") >= "1997-01-01" &&
              col("l_shipdate") < "1997-03-01" &&
              col("l_quantity").between(10, 40)),
            col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_partkey").as("item"), col("p_name").as("name"),
            col("p_retailprice").as("price"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("item"), col("name"), col("price"))
          .orderBy(col("item"))
          .limit(50)
      },
      Some("""
        SELECT p_partkey AS item, p_name AS name, p_retailprice AS price
        FROM part, lineitem
        WHERE p_partkey = l_partkey AND p_retailprice BETWEEN 920 AND 980
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-03-01'
          AND l_quantity BETWEEN 10 AND 40
        GROUP BY 1, 2, 3 ORDER BY item LIMIT 50""".stripMargin.trim)),

    // --------------------------------------------------------------- q40
    // TPC-DS q40 shape: the before/after-event conditional pivot —
    // per (state, item) sales split around a pivot date inside one
    // aggregation pass.
    QueryDef(
      "q_tpcds_q40",
      (s, dir) => {
        val pivot = "1997-06-01"
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= "1997-04-01" &&
            col("l_shipdate") < "1997-08-01")
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.part(s, dir).where(col("p_size") <= 25)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("n_name").as("state"), col("p_name").as("item"))
          .agg(
            (fpSum(when(col("l_shipdate") < pivot, expr(rev)))
              .cast("double") / 1e4).as("sales_before"),
            (fpSum(when(col("l_shipdate") >= pivot, expr(rev)))
              .cast("double") / 1e4).as("sales_after"))
          .orderBy(col("state"), col("item"))
          .limit(100)
      },
      Some(s"""
        SELECT n_name AS state, p_name AS item,
               CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1997-06-01'
                 THEN CAST(floor(($rev) * 1e4) AS BIGINT) END)
                 AS DOUBLE) / 1e4 AS sales_before,
               CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-06-01'
                 THEN CAST(floor(($rev) * 1e4) AS BIGINT) END)
                 AS DOUBLE) / 1e4 AS sales_after
        FROM lineitem, supplier, nation, part
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND l_partkey = p_partkey AND p_size <= 25
          AND l_shipdate >= TIMESTAMP '1997-04-01'
          AND l_shipdate < TIMESTAMP '1997-08-01'
        GROUP BY 1, 2 ORDER BY state, item LIMIT 100""".stripMargin.trim)),

    // --------------------------------------------------------------- q42
    // TPC-DS q42 shape: the plain one-month category star report ordered
    // by revenue.
    QueryDef(
      "q_tpcds_q42",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .where(year(col("o_orderdate")) === 1997 &&
            month(col("o_orderdate")) === 12)
          .groupBy(year(col("o_orderdate")).cast("int").as("d_year"),
            col("p_type").as("category"))
          .agg(money(expr(rev)).as("total_sales"))
          .orderBy(col("total_sales").desc, col("category"))
      },
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INT) AS d_year, p_type AS category,
               ${sqlMoney(rev)} AS total_sales
        FROM lineitem, orders, part
        WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
          AND year(o_orderdate) = 1997 AND month(o_orderdate) = 12
        GROUP BY 1, 2 ORDER BY total_sales DESC, category"""
        .stripMargin.trim)),

    // --------------------------------------------------------------- q43
    // TPC-DS q43 shape: the day-of-week pivot per store — seven
    // conditional sums per store over one year.
    QueryDef(
      "q_tpcds_q43",
      (s, dir) => {
        // Spark dayofweek: 1=Sunday … 7=Saturday; oracle dayofweek 0-6
        def d(i: Int, as: String) =
          (fpSum(when(dayofweek(col("l_shipdate")) === i + 1, expr(rev)))
            .cast("double") / 1e4).as(as)
        Tables.lineitem(s, dir)
          .where(year(col("l_shipdate")) === 1997)
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name").as("store"))
          .agg(d(0, "sun_sales"), d(1, "mon_sales"), d(2, "tue_sales"),
            d(3, "wed_sales"), d(4, "thu_sales"), d(5, "fri_sales"),
            d(6, "sat_sales"))
          .orderBy(col("store"))
          .limit(100)
      },
      Some {
        def d(i: Int, as: String) =
          s"""CAST(SUM(CASE WHEN dayofweek(l_shipdate) = $i
             THEN CAST(floor(($rev) * 1e4) AS BIGINT) END)
             AS DOUBLE) / 1e4 AS $as"""
        s"""SELECT s_name AS store, ${d(0, "sun_sales")}, ${d(1, "mon_sales")},
                   ${d(2, "tue_sales")}, ${d(3, "wed_sales")},
                   ${d(4, "thu_sales")}, ${d(5, "fri_sales")},
                   ${d(6, "sat_sales")}
           FROM lineitem, supplier
           WHERE l_suppkey = s_suppkey AND year(l_shipdate) = 1997
           GROUP BY 1 ORDER BY store LIMIT 100""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q46
    // TPC-DS q46 shape: weekend cross-geography trips — per (customer,
    // order) amounts where the selling geography differs from the
    // buyer's home geography, weekend orders only.
    QueryDef(
      "q_tpcds_q46",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .where(dayofweek(col("o_orderdate")).isin(1, 7) && // Sun, Sat
            col("s_nationkey") =!= col("c_nationkey"))
          .groupBy(col("c_name").as("cname"),
            col("o_orderkey").as("order_id"))
          .agg(money(col("l_extendedprice")).as("amt"),
            money(expr(rev)).as("profit"))
          .orderBy(col("cname"), col("order_id"))
          .limit(100)
      },
      Some(s"""
        SELECT c_name AS cname, o_orderkey AS order_id,
               ${sqlMoney("l_extendedprice")} AS amt,
               ${sqlMoney(rev)} AS profit
        FROM lineitem, orders, customer, supplier
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey
          AND dayofweek(o_orderdate) IN (0, 6)
          AND s_nationkey <> c_nationkey
        GROUP BY 1, 2 ORDER BY cname, order_id LIMIT 100"""
        .stripMargin.trim)),

    // --------------------------------------------------------------- q48
    // TPC-DS q48 shape: one total-quantity sum under an OR of three
    // AND'd priority × balance × quantity branches.
    QueryDef(
      "q_tpcds_q48",
      (s, dir) => {
        val branch =
          (col("o_orderpriority") === "1-URGENT" &&
            col("c_acctbal").between(0, 4000) &&
            col("l_quantity").between(1, 25)) ||
          (col("o_orderpriority") === "2-HIGH" &&
            col("c_acctbal").between(2000, 6000) &&
            col("l_quantity").between(16, 40)) ||
          (col("o_orderpriority") === "5-LOW" &&
            col("c_acctbal").between(4000, 9000) &&
            col("l_quantity").between(26, 50))
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .where(branch)
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
      },
      Some("""
        SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem, orders, customer
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND ((o_orderpriority = '1-URGENT' AND c_acctbal BETWEEN 0 AND 4000
                AND l_quantity BETWEEN 1 AND 25)
            OR (o_orderpriority = '2-HIGH' AND c_acctbal BETWEEN 2000 AND 6000
                AND l_quantity BETWEEN 16 AND 40)
            OR (o_orderpriority = '5-LOW' AND c_acctbal BETWEEN 4000 AND 9000
                AND l_quantity BETWEEN 26 AND 50))""".stripMargin.trim))
  )
}
