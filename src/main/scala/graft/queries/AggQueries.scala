package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4): hash agg, partial/final two-phase
  * agg, distinct agg, grouping sets / cube / rollup, percentile, misc aggs.
  * Reference ExecNodes: BatchExecHashAggregate.java:73,
  * StreamExecGroupAggregate.java:87, DecomposeGroupingSetsRule.java.
  */
object AggQueries {
  import Exact._

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape — the M1 end-to-end slice (SURVEY.md §7.2).
    // Fused filter+project (Calc) + hash agg + sort; Catalyst plans a
    // partial/final HashAggregate pair with the filter pushed to the scan.
    QueryDef(
      "q1_agg",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        l.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
              .as("sum_disc_price"),
            dsum(
              col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
                (lit(1.0) + col("l_tax")),
              6).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
          ${sqlSum("l_quantity")} AS sum_qty,
          ${sqlSum("l_extendedprice")} AS sum_base_price,
          ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS sum_disc_price,
          ${sqlSum("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)", 6)} AS sum_charge,
          ${sqlAvg("l_quantity")} AS avg_qty,
          ${sqlAvg("l_extendedprice")} AS avg_price,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim))
  )
}
