package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Classic TPC-H composite queries (Q3/Q5/Q10 shapes, adapted to the
  * generated schema) — multi-join + aggregate + top-N pipelines that
  * exercise the relational surface END TO END the way the reference's own
  * TPC-H/TPC-DS e2e suites do (flink-end-to-end-tests/test-scripts/
  * test_tpch.sh; BASELINE.md "reference-pinned facts").
  *
  * Plan expectations at 100 TB: `nation`/`region` broadcast (hinted);
  * `customer`⋈`orders`⋈`lineitem` shuffle on their keys with AQE sizing;
  * date filters push to the parquet scans (PushedFilters asserted in
  * PlanSpec for the scan layer generally).
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
      """.stripMargin.trim))
  )
}
