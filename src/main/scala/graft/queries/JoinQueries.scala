package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3): hash/sort-merge/broadcast/nested-loop,
  * all join types incl. semi/anti, multi-way join with reordering.
  * Reference: BatchExecHashJoin.java:77, BatchExecSortMergeJoin.java:54,
  * BatchExecNestedLoopJoin.java:61, FlinkJoinType.java:22.
  */
object JoinQueries {
  import Exact._

  val defs: Seq[QueryDef] = Seq(

    // Equi inner join + agg. At scale: shuffle-hash/SMJ on o_custkey with
    // partial aggregation after; AQE picks the strategy.
    QueryDef(
      "q_join_inner",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""
        SELECT c_mktsegment, COUNT(*) AS n, ${sqlSum("o_totalprice")} AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
      """.trim)),

    QueryDef(
      "q_join_left",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               ${sqlSum("o_totalprice")} AS sum_price
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey
      """.trim)),

    QueryDef(
      "q_join_right",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"), "right")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(col("l_orderkey")).as("n_items"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(l_orderkey) AS n_items, COUNT(*) AS n_rows
        FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus
      """.trim)),

    // Full outer join of two pre-aggregated sides (classic reconciliation
    // shape); unmatched rows exercise the null-fill path.
    QueryDef(
      "q_join_full",
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
        val su = Tables.supplier(s, dir)
          .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
        c.join(su, Seq("nk"), "full")
          .select(col("nk"), col("n_cust"), col("n_supp"))
          .orderBy(col("nk"))
      },
      Some("""
        SELECT COALESCE(c.nk, s.nk) AS nk, n_cust, n_supp
        FROM (SELECT c_nationkey nk, COUNT(*) n_cust FROM customer GROUP BY 1) c
        FULL JOIN (SELECT s_nationkey nk, COUNT(*) n_supp FROM supplier GROUP BY 1) s
          USING (nk)
        ORDER BY nk
      """.trim)),

    // LEFT SEMI (EXISTS). Reference: StreamingSemiAntiJoinOperator.java:38.
    QueryDef(
      "q_join_semi",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val l = Tables.lineitem(s, dir).where(col("l_quantity") > 45)
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .agg(
            count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("sum_price"))
      },
      Some(s"""
        SELECT COUNT(*) AS n, ${sqlSum("o_totalprice")} AS sum_price
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      """.trim)),

    // LEFT ANTI (NOT EXISTS).
    QueryDef(
      "q_join_anti",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_no_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_no_orders
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
      """.trim)),

    // Non-equi theta join → BroadcastNestedLoopJoin (both inputs tiny dims;
    // at scale the smaller side must be the broadcast side).
    QueryDef(
      "q_join_theta_nlj",
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        n.join(r, n("n_regionkey") < r("r_regionkey"))
          .select(col("n_name"), col("r_name"))
          .orderBy(col("n_name"), col("r_name"))
      },
      Some("""
        SELECT n_name, r_name FROM nation JOIN region ON n_regionkey < r_regionkey
        ORDER BY n_name, r_name
      """.trim)),

    // Small-dim broadcast join — the batch analog of the reference's lookup
    // join (StreamExecLookupJoin.java:82): probe side streams, dim is
    // broadcast to every task, no shuffle of the big side.
    QueryDef(
      "q_lookup_join",
      (s, dir) => {
        val su = Tables.supplier(s, dir)
        val n = Tables.nation(s, dir)
        su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ORDER BY s_suppkey
      """.trim)),

    // TPC-H Q5 shape: 6-way join with selective filters — exercises join
    // reordering, broadcasts for dims, shuffle joins for facts.
    QueryDef(
      "q_join_multi",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val l = Tables.lineitem(s, dir)
        val su = Tables.supplier(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .join(su, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "ASIA" &&
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("revenue"))
          .orderBy(col("n_name"))
      },
      Some(s"""
        SELECT n_name, ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name ORDER BY n_name
      """.trim))
  )
}
