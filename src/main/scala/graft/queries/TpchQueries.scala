package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The full TPC-H query set (all 22 shapes, adapted to the generated
  * schema) — multi-join + aggregate + top-N pipelines that exercise the
  * relational surface END TO END the way the reference's own TPC-H/TPC-DS
  * e2e suites do (flink-end-to-end-tests/test-scripts/test_tpch.sh;
  * BASELINE.md "reference-pinned facts").
  *
  * Schema adaptations (the generated tables are TPC-H-ish, not TPC-H):
  * no `partsupp` → Q2/Q11/Q16/Q20 derive the part↔supplier relation from
  * `SELECT DISTINCT l_partkey, l_suppkey FROM lineitem` and use
  * `s_acctbal`/`p_retailprice` where `ps_supplycost`/`ps_availqty` would
  * appear; no `l_commitdate`/`l_receiptdate` → Q12 groups by
  * `l_linestatus` and Q21 defines "late" as shipped > 90 days after the
  * order date; no comment columns → Q13/Q16 filter on
  * `o_orderpriority`/`s_acctbal` instead. Join/agg/subquery structure is
  * preserved query by query.
  *
  * Plan expectations at 100 TB: `nation`/`region`/`part` broadcast
  * (hinted); `customer`⋈`orders`⋈`lineitem` shuffle on their keys with
  * AQE sizing; date filters push to the parquet scans (PushedFilters
  * asserted in PlanSpec for the scan layer generally). Scalar-subquery
  * thresholds (Q11/Q15/Q22) broadcast a 1-row frame, never collect.
  *
  * Revenue sums use tie-free fixed-point arithmetic (floor(x·10⁴) summed
  * as BIGINT — see VectorOps scaladoc for why decimal casts of IEEE
  * doubles are not portable across engines).
  */
object TpchQueries {

  /** Fixed-point (scale 4) exact sum of a double expression. */
  private def revSum(c: Column): Column =
    sum(floor(c * lit(1e4)).cast("long")).cast("double") / lit(1e4)

  private def sqlRevSum(e: String): String =
    s"(CAST(SUM(CAST(floor(($e) * 1e4) AS BIGINT)) AS DOUBLE) / 1e4)"

  private val rev = "l_extendedprice * (1 - l_discount)"

  val defs: Seq[QueryDef] = Seq(

    // Q3: shipping-priority revenue of BUILDING-segment orders not yet
    // shipped at the cut date; top 10 orders by revenue.
    QueryDef(
      "q_tpch_q3",
      (s, dir) => {
        val cut = lit("1998-01-01").cast("timestamp")
        val c = Tables.customer(s, dir)
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val o = Tables.orders(s, dir)
          .where(col("o_orderdate") < cut)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val l = Tables.lineitem(s, dir)
          .where(col("l_shipdate") > cut)
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(revSum(expr(rev)).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
          .select(col("l_orderkey"), col("o_orderdate"), col("revenue"))
      },
      Some(s"""
        SELECT l_orderkey, o_orderdate, ${sqlRevSum(rev)} AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10
      """.stripMargin.trim)),

    // Q5: local-supplier volume — revenue per ASIA nation in 1996 where
    // the supplier and customer share the nation.
    QueryDef(
      "q_tpch_q5",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        Tables.customer(s, dir)
          .join(o, col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, dir),
            col("o_orderkey") === col("l_orderkey"))
          .join(Tables.supplier(s, dir),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey") &&
              col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(revSum(expr(rev)).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""
        SELECT n_name, ${sqlRevSum(rev)} AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name
      """.stripMargin.trim)),

    // Q10: returned-item reporting — revenue lost to returns per customer
    // for one quarter; top 20 customers.
    QueryDef(
      "q_tpch_q10",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        Tables.customer(s, dir)
          .join(o, col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, dir)
            .where(col("l_returnflag") === "R"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"))
          .agg(revSum(expr(rev)).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               ${sqlRevSum(rev)} AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
      """.stripMargin.trim)),

    // Q7: volume shipped between two nations (either direction), per year.
    QueryDef(
      "q_tpch_q7",
      (s, dir) => {
        val n1 = broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation")))
        val n2 = broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation")))
        Tables.supplier(s, dir)
          .join(Tables.lineitem(s, dir), col("s_suppkey") === col("l_suppkey"))
          .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
          .join(n1, col("s_nationkey") === col("nk1"))
          .join(n2, col("c_nationkey") === col("nk2"))
          .where((col("nk1") === 1 && col("nk2") === 2) ||
            (col("nk1") === 2 && col("nk2") === 1))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("yr"))
          .agg(revSum(expr(rev)).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("yr"))
      },
      Some(s"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS yr,
               ${sqlRevSum(rev)} AS revenue
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_nationkey = 1 AND n2.n_nationkey = 2)
            OR (n1.n_nationkey = 2 AND n2.n_nationkey = 1))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
      """.stripMargin.trim)),

    // Q14: promo revenue share for one month — two conditional aggregates
    // and a final scalar division.
    QueryDef(
      "q_tpch_q14",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .agg(
            (lit(100.0) *
              revSum(when(col("p_type") === "PROMO", expr(rev))
                .otherwise(lit(0.0))) /
              revSum(expr(rev))).as("promo_revenue_pct"))
      },
      Some(s"""
        SELECT 100.0 * ${sqlRevSum(s"CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0.0 END")}
               / ${sqlRevSum(rev)} AS promo_revenue_pct
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-02-01'
      """.stripMargin.trim)),

    // Q18: large-volume customers — orders whose total quantity exceeds a
    // threshold (integer-valued double sums are exact in any fold order).
    QueryDef(
      "q_tpch_q18",
      (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .where(col("sum_qty") > 300)
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"),
            col("o_totalprice").cast("double").as("o_totalprice"),
            col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice, sum_qty
        FROM customer, orders,
          (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
           FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) big
        WHERE c_custkey = o_custkey AND o_orderkey = big.l_orderkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
      """.stripMargin.trim)),

    // Q19: discounted revenue under OR'd brand/quantity conjunctions —
    // exercises disjunctive predicate handling across a join.
    QueryDef(
      "q_tpch_q19",
      (s, dir) => {
        val cond =
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#7" && col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#13" && col("l_quantity").between(20, 30))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .where(cond)
          .agg(revSum(expr(rev)).as("revenue"))
      },
      Some(s"""
        SELECT ${sqlRevSum(rev)} AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND (
          (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#7' AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 20 AND 30))
      """.stripMargin.trim)),

    // Q4 shape: order-priority counts for orders with at least one
    // late-shipped line (EXISTS -> left-semi join with a compound
    // cross-table condition).
    QueryDef(
      "q_tpch_q4",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        o.join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"),
          "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
      """.stripMargin.trim)),

    // Q22 shape: wealthy customers with no orders — scalar subquery
    // (deterministic decimal average) + anti join.
    QueryDef(
      "q_tpch_q22",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val avgBal = c.where(col("c_acctbal") > 0)
          .agg(Exact.davg(col("c_acctbal")).as("ab"))
        c.join(broadcast(avgBal))
          .where(col("c_acctbal") > col("ab"))
          .join(Tables.orders(s, dir),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"),
            Exact.dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy(col("c_nationkey"))
      },
      Some(s"""
        SELECT c_nationkey, COUNT(*) AS numcust,
               ${Exact.sqlSum("c_acctbal")} AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT ${Exact.sqlAvg("c_acctbal")}
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey ORDER BY c_nationkey
      """.stripMargin.trim)),

    // Q1: the full pricing summary report — every aggregate family over
    // one scan, the canonical map-side-combine stress test.
    QueryDef(
      "q_tpch_q1",
      (s, dir) => {
        val charge = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
            revSum(expr(rev)).as("sum_disc_price"),
            revSum(expr(charge)).as("sum_charge"),
            Exact.davg(col("l_quantity")).as("avg_qty"),
            Exact.davg(col("l_extendedprice")).as("avg_price"),
            Exact.davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               ${Exact.sqlSum("l_extendedprice")} AS sum_base_price,
               ${sqlRevSum(rev)} AS sum_disc_price,
               ${sqlRevSum(s"$rev * (1 + l_tax)")} AS sum_charge,
               ${Exact.sqlAvg("l_quantity")} AS avg_qty,
               ${Exact.sqlAvg("l_extendedprice")} AS avg_price,
               ${Exact.sqlAvg("l_discount")} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim)),

    // Q2 shape: minimum-cost supplier per part in a region — the
    // part↔supplier relation comes from lineitem (no partsupp table) and
    // s_acctbal stands in for ps_supplycost; the correlated-MIN subquery
    // is the exercised structure.
    QueryDef(
      "q_tpch_q2",
      (s, dir) => {
        val ps = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val eu = ps
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey") &&
              col("r_name") === "EUROPE")
        val minBal = eu.groupBy(col("l_partkey").as("mk"))
          .agg(min(col("s_acctbal")).as("min_bal"))
        Tables.part(s, dir)
          .where(col("p_size").between(10, 25) && col("p_type") === "LARGE")
          .join(eu, col("p_partkey") === col("l_partkey"))
          .join(minBal,
            col("p_partkey") === col("mk") &&
              col("s_acctbal") === col("min_bal"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_type"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some("""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type
        FROM part, ps, supplier, nation, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND p_size BETWEEN 10 AND 25 AND p_type = 'LARGE'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND s_acctbal = (
            SELECT MIN(s2.s_acctbal)
            FROM ps ps2, supplier s2, nation n2, region r2
            WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
      """.stripMargin.trim)),

    // Q6: forecasting revenue change — single-scan conditional revenue,
    // the pure pushdown/codegen microbenchmark of the suite.
    QueryDef(
      "q_tpch_q6",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(revSum(expr("l_extendedprice * l_discount")).as("revenue"))
      },
      Some(s"""
        SELECT ${sqlRevSum("l_extendedprice * l_discount")} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      """.stripMargin.trim)),

    // Q8: national market share — one nation's slice of a region's
    // ECONOMY-part import volume, per year; conditional-over-total
    // division after a 6-table join.
    QueryDef(
      "q_tpch_q8",
      (s, dir) => {
        val n1 = broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("nk1"),
            col("n_name").as("supp_nation")))
        val n2 = broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("nk2"), col("n_regionkey")))
        val all = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .where(col("p_type") === "ECONOMY")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir)
            .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(n2, col("c_nationkey") === col("nk2"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey") &&
              col("r_name") === "AMERICA")
          .join(n1, col("s_nationkey") === col("nk1"))
          .select(year(col("o_orderdate")).as("yr"),
            expr(rev).as("volume"), col("supp_nation"))
        all.groupBy(col("yr"))
          .agg((revSum(when(col("supp_nation") === "NATION_2", col("volume"))
            .otherwise(lit(0.0))) / revSum(col("volume"))).as("mkt_share"))
          .orderBy(col("yr"))
      },
      Some(s"""
        SELECT yr,
               ${sqlRevSum("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0.0 END")}
               / ${sqlRevSum("volume")} AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS INT) AS yr,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n1.n_name AS supp_nation
          FROM part, supplier, lineitem, orders, customer,
               nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
            AND s_nationkey = n1.n_nationkey AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1997-01-01') all_nations
        GROUP BY yr ORDER BY yr
      """.stripMargin.trim)),

    // Q9 shape: product-type profit by supplier nation and year;
    // p_retailprice·l_quantity·0.1 stands in for the missing
    // ps_supplycost·l_quantity term.
    QueryDef(
      "q_tpch_q9",
      (s, dir) => {
        val profit =
          "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1"
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .where(col("p_name").like("%widget%"))),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(revSum(expr(profit)).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               ${sqlRevSum(
                 "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1")}
               AS sum_profit
        FROM lineitem, part, supplier, orders, nation
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%widget%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
      """.stripMargin.trim)),

    // Q11 shape: important stock — per-part value of one nation's
    // suppliers' shipments vs a scalar fraction-of-total threshold
    // (broadcast 1-row frame, no collect).
    QueryDef(
      "q_tpch_q11",
      (s, dir) => {
        val base = Tables.lineitem(s, dir)
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey") &&
              col("n_name") === "NATION_7")
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"),
            expr("l_quantity * p_retailprice").as("val"))
        val total = base.agg(revSum(col("val")).as("tot"))
        base.groupBy(col("l_partkey"))
          .agg(revSum(col("val")).as("value"))
          .join(broadcast(total))
          .where(col("value") > lit(0.001) * col("tot"))
          .select(col("l_partkey"), col("value"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      Some(s"""
        WITH base AS (
          SELECT l_partkey, l_quantity * p_retailprice AS val
          FROM lineitem, supplier, nation, part
          WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            AND n_name = 'NATION_7' AND l_partkey = p_partkey)
        SELECT l_partkey, ${sqlRevSum("val")} AS value
        FROM base GROUP BY l_partkey
        HAVING ${sqlRevSum("val")} >
          (SELECT 0.001 * ${sqlRevSum("val")} FROM base)
        ORDER BY value DESC, l_partkey
      """.stripMargin.trim)),

    // Q12 shape: shipping-priority split per line status (no l_shipmode
    // column) — urgent vs non-urgent order counts per group.
    QueryDef(
      "q_tpch_q12",
      (s, dir) => {
        val urgent = col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH"
        Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir)
            .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus ORDER BY l_linestatus
      """.stripMargin.trim)),

    // Q13 shape: customer order-count distribution — left outer join with
    // an extra join-condition filter, then a second aggregation over the
    // first's results.
    QueryDef(
      "q_tpch_q13",
      (s, dir) => {
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") =!= "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
      """.stripMargin.trim)),

    // Q15: top supplier — quarterly revenue per supplier matched against
    // a scalar MAX subquery (fixed-point sums make the max tie-free
    // across engines).
    QueryDef(
      "q_tpch_q15",
      (s, dir) => {
        val revenue = Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(revSum(expr(rev)).as("total_revenue"))
        val best = revenue.agg(max(col("total_revenue")).as("best"))
        Tables.supplier(s, dir)
          .join(revenue, col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(best))
          .where(col("total_revenue") === col("best"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""
        WITH revenue AS (
          SELECT l_suppkey, ${sqlRevSum(rev)} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = l_suppkey
          AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
      """.stripMargin.trim)),

    // Q16 shape: parts/supplier relationship — distinct-supplier counts
    // per (brand, type, size) with a NOT-IN (anti join) supplier
    // exclusion; negative account balance stands in for the complaint
    // comment filter.
    QueryDef(
      "q_tpch_q16",
      (s, dir) => {
        val ps = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        ps.join(broadcast(Tables.part(s, dir)
            .where(col("p_brand") =!= "Brand#13" &&
              col("p_size").between(1, 8))),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, dir).where(col("s_acctbal") < 0),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, part
        WHERE p_partkey = l_partkey AND p_brand <> 'Brand#13'
          AND p_size BETWEEN 1 AND 8
          AND l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      """.stripMargin.trim)),

    // Q17 shape: small-quantity-order revenue — correlated per-part
    // average-quantity threshold (decorrelated to a grouped join on the
    // Spark side), single-brand slice.
    QueryDef(
      "q_tpch_q17",
      (s, dir) => {
        val thresh = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey").as("tk"))
          .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_thresh"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .where(col("p_brand") === "Brand#3")),
            col("l_partkey") === col("p_partkey"))
          .join(thresh, col("l_partkey") === col("tk"))
          .where(col("l_quantity") < col("qty_thresh"))
          .agg((Exact.dsum(col("l_extendedprice")) / lit(7.0))
            .as("avg_yearly"))
      },
      Some(s"""
        SELECT ${Exact.sqlSum("l_extendedprice")} / 7.0 AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
      """.stripMargin.trim)),

    // Q20 shape: suppliers with significant shipments of a part family —
    // nested aggregate subquery feeding a semi join, nation-scoped.
    QueryDef(
      "q_tpch_q20",
      (s, dir) => {
        val shippers = Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, dir)
            .where(col("p_name").like("red%"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("qty"))
          .where(col("qty") > 100)
        Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey") &&
              col("n_name") === "NATION_3")
          .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_name"), col("s_acctbal"))
          .orderBy(col("s_name"))
      },
      Some("""
        SELECT s_name, s_acctbal
        FROM supplier, nation
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem, part
            WHERE p_partkey = l_partkey AND p_name LIKE 'red%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        ORDER BY s_name
      """.stripMargin.trim)),

    // Q21 shape: suppliers who kept orders waiting — per-order supplier /
    // late-supplier sets ("late" = shipped > 90 days after the order
    // date; no receipt/commit dates), credited when a supplier is the
    // ONLY late one on a multi-supplier order. The EXISTS / NOT-EXISTS
    // pair is decorrelated into one grouped pass on both engines.
    QueryDef(
      "q_tpch_q21",
      (s, dir) => {
        val perSupp = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(when(
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            1L).otherwise(0L)).as("late"))
        val perOrder = perSupp.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("nsupp"), sum(col("late")).as("nlate"),
            max(when(col("late") === 1L, col("l_suppkey"))).as("the_late"))
          .where(col("nsupp") >= 2 && col("nlate") === 1L)
        Tables.supplier(s, dir)
          .join(perOrder, col("s_suppkey") === col("the_late"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""
        WITH per_supp AS (
          SELECT l_orderkey, l_suppkey,
                 MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                          THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders
            ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
          GROUP BY l_orderkey, l_suppkey),
        per_order AS (
          SELECT l_orderkey, COUNT(*) AS nsupp, SUM(late) AS nlate,
                 MAX(CASE WHEN late = 1 THEN l_suppkey END) AS the_late
          FROM per_supp GROUP BY l_orderkey)
        SELECT s_name, COUNT(*) AS numwait
        FROM per_order JOIN supplier ON s_suppkey = the_late
        WHERE nsupp >= 2 AND nlate = 1
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
      """.stripMargin.trim))
  )
}
