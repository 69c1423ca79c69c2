package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Remaining §2.4 aggregation surface: distinct agg, grouping sets / cube /
  * rollup, exact percentile, listagg, first/last (arg-min/max), filtered
  * and boolean aggs, incremental variance, approx-count-distinct.
  * Reference: FlinkAggregateExpandDistinctAggregatesRule.java,
  * DecomposeGroupingSetsRule.java, PercentileAggFunction.java, and the
  * RT/functions/aggregate package.
  */
object MiscAggQueries {
  import Exact._

  val defs: Seq[QueryDef] = Seq(

    // Distinct aggregates (Catalyst expands these like the reference's
    // split-distinct rewrite).
    QueryDef(
      "q_distinct_agg",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("nd_part"),
            countDistinct(col("l_suppkey")).as("nd_supp"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
               COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """.trim)),

    // CUBE → Catalyst Expand (reference: DecomposeGroupingSetsRule).
    // Keys are coalesced to a sentinel so null-ordering quirks can't bite.
    QueryDef(
      "q_cube",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n"), col("sum_qty"))
          .orderBy(col("rf"), col("ls"))
      },
      Some(s"""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY rf, ls
      """.trim)),

    QueryDef(
      "q_rollup",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n"))
          .orderBy(col("rf"), col("ls"))
      },
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY rf, ls
      """.trim)),

    QueryDef(
      "q_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(s"""
          SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                 COALESCE(l_linestatus, 'ALL') AS ls,
                 COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY rf, ls
        """)
      },
      Some(s"""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY rf, ls
      """.trim)),

    // Exact percentile with linear interpolation (reference:
    // PercentileAggFunction.java). Spark `percentile` ≡ DuckDB quantile_cont.
    QueryDef(
      "q_percentile",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.9)").as("p90"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50,
               quantile_cont(l_quantity, 0.9) AS p90
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """.trim)),

    // LISTAGG / ARRAY_AGG with deterministic intra-group order
    // (reference: RT/functions/aggregate/ListAggFunction.java).
    QueryDef(
      "q_listagg",
      (s, dir) => {
        Tables.supplier(s, dir)
          .groupBy(col("s_nationkey"))
          .agg(expr(
            "array_join(transform(array_sort(collect_list(struct(s_suppkey, s_name))), x -> x.s_name), ',')")
            .as("names"))
          .orderBy(col("s_nationkey"))
      },
      Some("""
        SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_suppkey) AS names
        FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
      """.trim)),

    // FIRST_VALUE/LAST_VALUE-style aggs via arg-min/arg-max.
    QueryDef(
      "q_first_last",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            min_by(col("event_type"), col("ts_us")).as("first_type"),
            max_by(col("event_type"), col("ts_us")).as("last_type"),
            min(col("ts_us")).as("first_ts_us"),
            max(col("ts_us")).as("last_ts_us"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id,
               arg_min(event_type, epoch_us(ts)) AS first_type,
               arg_max(event_type, epoch_us(ts)) AS last_type,
               MIN(epoch_us(ts)) AS first_ts_us,
               MAX(epoch_us(ts)) AS last_ts_us
        FROM events GROUP BY user_id ORDER BY user_id
      """.trim)),

    // Filtered/boolean aggregates.
    QueryDef(
      "q_filtered_agg",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            count_if(col("value") > 50).as("n_big"),
            bool_and(col("value") >= 0).as("all_nonneg"),
            bool_or(col("value") > 99).as("any_huge"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type,
               COUNT(*) FILTER (WHERE value > 50) AS n_big,
               bool_and(value >= 0) AS all_nonneg,
               bool_or(value > 99) AS any_huge
        FROM events GROUP BY event_type ORDER BY event_type
      """.trim)),

    // Variance from exact decimal power sums (reference:
    // WelfordM2AggFunction.java computes the same moments incrementally).
    // Built-in stddev is numerically engine-specific; the moment form is
    // reproducible.
    QueryDef(
      "q_stats_var",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_q"),
            dsum(col("l_quantity") * col("l_quantity"), 8).as("sum_q2"))
          .select(
            col("l_returnflag"), col("n"),
            ((col("sum_q2") - col("sum_q") * col("sum_q") / col("n")) /
              (col("n") - lit(1))).as("var_samp_q"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""
        SELECT l_returnflag, n,
               (sum_q2 - sum_q * sum_q / n) / (n - 1) AS var_samp_q
        FROM (
          SELECT l_returnflag, COUNT(*) AS n,
                 ${sqlSum("l_quantity")} AS sum_q,
                 ${sqlSum("l_quantity*l_quantity", 8)} AS sum_q2
          FROM lineitem GROUP BY l_returnflag)
        ORDER BY l_returnflag
      """.trim)),

    // HyperLogLog++ approx distinct — sketch values differ across engines,
    // so the oracled columns are deterministic: the exact NDV plus a
    // bounded-error boolean (rsd=0.005 → 2% is a 4-sigma bound, so the
    // check is stable). The oracle asserts the same exact NDV and TRUE.
    //
    // Plan shape: pre-distinct the (flag, partkey) pairs, then feed BOTH
    // the exact count and the sketch from that set in one tiny aggregate.
    // A combined countDistinct+sketch agg would plan the sketch buffer
    // inside the per-(flag, partkey) distinct aggregate — ~200K groups ×
    // ~48 KB of HLL buffer at sf0.1 (r6's 37× breach), OOM at 100×. Here
    // the wide aggregate is a bare distinct (no buffer) and the sketch
    // exists for 3 groups only; one scan total. The sketch is the
    // DataSketches-backed hll_sketch_agg (byte-array buffer) rather than
    // approx_count_distinct(rsd=0.005), whose ~6150-LongType-field buffer
    // schema breaks codegen (3.8 MiB task binaries, 2.8 s for 3 groups).
    // lgK=16 → RSE ≈ 0.4%, so the 2% oracle bound is a ~5σ check.
    QueryDef(
      "q_approx_distinct",
      (s, dir) => {
        val pairs = Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_partkey")).distinct()
        pairs.groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("exact_part"),
            hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), 16))
              .as("apx_part"))
          .select(
            col("l_returnflag"), col("exact_part"),
            (abs(col("apx_part") - col("exact_part")) <=
              col("exact_part") * 0.02).as("within_2pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_part,
               TRUE AS within_2pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """.trim))
  )
}
