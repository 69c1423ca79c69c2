package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS query-shape pack, part 1 (part 2: [[TpcdsQueries2]]).
  *
  * The reference's single hardest pinned correctness gate is 99/99 TPC-DS
  * with row-level answer matching
  * (flink-end-to-end-tests/test-scripts/test_tpcds.sh:22,
  * flink-tpcds-test/…/TpcdsTestProgram.java:76,102). The synthetic star
  * schema has no dbgen TPC-DS tables, so this pack adapts the ~30
  * STRUCTURALLY DISTINCT TPC-DS query shapes onto the generated schema the
  * same way the TPC-H pack does — preserving the join/agg/subquery
  * structure per query while swapping in the available dimensions:
  *
  *   - sales "channels" (store/web/catalog) := `l_linenumber % 3` — a
  *     deterministic 3-way split of the one fact table,
  *   - returns := `l_returnflag = 'R'` rows,
  *   - item := part, customer demographics := c_mktsegment / c_acctbal,
  *     state/county := nation, date_dim := o_orderdate / l_shipdate.
  *
  * Shapes covered here: correlated scalar subqueries vs group averages
  * (q1, q6), star reports (q3), cross-channel year-over-year CTE
  * self-joins (q4), multi-channel UNION ALL + ROLLUP reports (q5),
  * single-pass bucketed conditional aggregation (q9), EXISTS/OR-EXISTS
  * demographics (q10), cross-channel INTERSECT item sets (q14), HAVING
  * gates (q15), and stddev/mean coefficient-of-variation stats (q17).
  *
  * Determinism rules (same as [[TpchQueries]]): money sums are scale-4
  * fixed point (floor(x·10⁴) summed as BIGINT); averages are exact
  * integer/decimal sums divided by counts; stddev is computed from exact
  * integer sum/sum-of-squares so both engines evaluate the identical IEEE
  * expression; LIMIT queries carry a total order.
  *
  * Scale notes (100 TB): every dimension join (part, nation, customer at
  * bench scale) broadcasts; fact-fact compositions reduce BEFORE joining
  * (aggregate-then-join, never join-then-aggregate where the group is the
  * join key); correlated subqueries run as Catalyst-decorrelated
  * aggregates (PlanSpec locks: no BroadcastNestedLoopJoin, no
  * CartesianProduct in this pack).
  */
object TpcdsQueries {

  // ------------------------------------------------------------ helpers

  private[queries] val rev = "l_extendedprice * (1 - l_discount)"

  /** Scale-4 fixed-point sum of a money expression, as BIGINT. */
  private[queries] def fpSum(c: Column): Column =
    sum(floor(c * lit(1e4)).cast("long"))
  private[queries] def sqlFpSum(e: String): String =
    s"SUM(CAST(floor(($e) * 1e4) AS BIGINT))"

  /** Fixed-point sum rendered back to a money double. */
  private[queries] def money(c: Column): Column = fpSum(c).cast("double") / lit(1e4)
  private[queries] def sqlMoney(e: String): String =
    s"(CAST(${sqlFpSum(e)} AS DOUBLE) / 1e4)"

  /** The 3-way deterministic channel split of the fact table. */
  private[queries] val channelCol: Column =
    when(col("l_linenumber") % 3 === 0, "catalog")
      .when(col("l_linenumber") % 3 === 1, "store")
      .otherwise("web")
  private[queries] val sqlChannel: String =
    "CASE l_linenumber % 3 WHEN 0 THEN 'catalog' WHEN 1 THEN 'store' ELSE 'web' END"

  /** Run a Flink/Spark-SQL-surface query over the registered test tables
    * (used for the correlated-subquery shapes, where the declarative SQL
    * text IS the Spark-first form — Catalyst decorrelates it). */
  private[queries] def sqlQuery(text: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(text) }

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q1
    // TPC-DS q1 shape: customers whose returns exceed 1.2× the average
    // return total of their state (correlated scalar AGGREGATE subquery
    // over a CTE — Catalyst decorrelates it into an aggregate + join).
    QueryDef(
      "q_tpcds_q1",
      sqlQuery(s"""
        WITH ctr AS (
          SELECT c_custkey AS ctr_cust, c_nationkey AS ctr_nation,
                 ${sqlFpSum(rev)} AS ctr_total
          FROM lineitem, orders, customer
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_returnflag = 'R'
          GROUP BY c_custkey, c_nationkey)
        SELECT ctr_cust
        FROM ctr c1
        WHERE ctr_total > (SELECT CAST(SUM(c2.ctr_total) AS DOUBLE)
                             / COUNT(*) * 1.2
                           FROM ctr c2
                           WHERE c2.ctr_nation = c1.ctr_nation)
        ORDER BY ctr_cust LIMIT 50"""),
      Some(s"""
        WITH ctr AS (
          SELECT c_custkey AS ctr_cust, c_nationkey AS ctr_nation,
                 ${sqlFpSum(rev)} AS ctr_total
          FROM lineitem, orders, customer
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND l_returnflag = 'R'
          GROUP BY c_custkey, c_nationkey)
        SELECT ctr_cust
        FROM ctr c1
        WHERE ctr_total > (SELECT CAST(SUM(c2.ctr_total) AS DOUBLE)
                             / COUNT(*) * 1.2
                           FROM ctr c2
                           WHERE c2.ctr_nation = c1.ctr_nation)
        ORDER BY ctr_cust LIMIT 50""".stripMargin.trim)),

    // ---------------------------------------------------------------- q3
    // TPC-DS q3 shape: the canonical star report — fact ⋈ item ⋈ date,
    // brand revenue by year for one item attribute slice.
    QueryDef(
      "q_tpcds_q3",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, dir).where(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(year(col("o_orderdate")).cast("int").as("sales_year"),
            col("p_brand").as("brand"))
          .agg(money(expr(rev)).as("sum_agg"))
          .orderBy(col("sales_year"), col("sum_agg").desc, col("brand"))
      },
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INT) AS sales_year, p_brand AS brand,
               ${sqlMoney(rev)} AS sum_agg
        FROM lineitem, orders, part
        WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
          AND p_type = 'PROMO'
        GROUP BY 1, 2 ORDER BY sales_year, sum_agg DESC, brand
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- q4
    // TPC-DS q4 shape: year-over-year growth comparison across channels —
    // one aggregated CTE self-joined four ways (customer × year × channel),
    // keeping customers whose web growth outpaces store growth.
    QueryDef(
      "q_tpcds_q4",
      (s, dir) => {
        val yt = Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 =!= 0) // store + web channels
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .where(year(col("o_orderdate")).isin(1996, 1997))
          .groupBy(col("o_custkey").as("cust"),
            year(col("o_orderdate")).cast("int").as("yr"),
            channelCol.as("ch"))
          .agg(fpSum(expr(rev)).as("total"))
        def slice(yr: Int, ch: String, as: String) =
          yt.where(col("yr") === yr && col("ch") === ch)
            .select(col("cust").as(s"${as}_cust"), col("total").as(as))
        slice(1996, "store", "s1")
          .join(slice(1997, "store", "s2"), col("s1_cust") === col("s2_cust"))
          .join(slice(1996, "web", "w1"), col("s1_cust") === col("w1_cust"))
          .join(slice(1997, "web", "w2"), col("s1_cust") === col("w2_cust"))
          .where(col("s1") > 0 && col("w1") > 0)
          .where(col("w2").cast("double") / col("w1") >
            col("s2").cast("double") / col("s1"))
          .select(col("s1_cust").as("cust"))
          .orderBy(col("cust"))
          .limit(100)
      },
      Some(s"""
        WITH yt AS (
          SELECT o_custkey AS cust, CAST(year(o_orderdate) AS INT) AS yr,
                 $sqlChannel AS ch, ${sqlFpSum(rev)} AS total
          FROM lineitem, orders
          WHERE l_orderkey = o_orderkey AND l_linenumber % 3 <> 0
            AND year(o_orderdate) IN (1996, 1997)
          GROUP BY 1, 2, 3)
        SELECT s1.cust AS cust
        FROM yt s1, yt s2, yt w1, yt w2
        WHERE s1.cust = s2.cust AND s1.cust = w1.cust AND s1.cust = w2.cust
          AND s1.ch = 'store' AND s1.yr = 1996
          AND s2.ch = 'store' AND s2.yr = 1997
          AND w1.ch = 'web' AND w1.yr = 1996
          AND w2.ch = 'web' AND w2.yr = 1997
          AND s1.total > 0 AND w1.total > 0
          AND CAST(w2.total AS DOUBLE) / w1.total
            > CAST(s2.total AS DOUBLE) / s1.total
        ORDER BY cust LIMIT 100
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- q5
    // TPC-DS q5 shape: the multi-channel sales/returns report — a UNION
    // ALL of per-channel (sales, returns) detail rows rolled up with
    // ROLLUP over (channel, nation).
    QueryDef(
      "q_tpcds_q5",
      (s, dir) => {
        val fact = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
        val sales = fact.select(channelCol.as("channel"), col("n_name"),
          expr(rev).as("sales_amt"), lit(0.0).as("returns_amt"))
        val returns = fact.where(col("l_returnflag") === "R")
          .select(channelCol.as("channel"), col("n_name"),
            lit(0.0).as("sales_amt"), expr(rev).as("returns_amt"))
        sales.unionAll(returns)
          .rollup(col("channel"), col("n_name").as("nation"))
          .agg(money(col("sales_amt")).as("sales"),
            money(col("returns_amt")).as("returns"))
          .withColumn("profit", col("sales") - col("returns"))
          .orderBy(col("channel").asc_nulls_first,
            col("nation").asc_nulls_first)
      },
      Some(s"""
        WITH detail AS (
          SELECT $sqlChannel AS channel, n_name AS nation,
                 l_extendedprice * (1 - l_discount) AS sales_amt,
                 0.0 AS returns_amt
          FROM lineitem, orders, customer, nation
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n_nationkey
          UNION ALL
          SELECT $sqlChannel AS channel, n_name AS nation,
                 0.0 AS sales_amt,
                 l_extendedprice * (1 - l_discount) AS returns_amt
          FROM lineitem, orders, customer, nation
          WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n_nationkey AND l_returnflag = 'R')
        SELECT channel, nation, ${sqlMoney("sales_amt")} AS sales,
               ${sqlMoney("returns_amt")} AS returns,
               ${sqlMoney("sales_amt")} - ${sqlMoney("returns_amt")} AS profit
        FROM detail
        GROUP BY ROLLUP(channel, nation)
        ORDER BY channel NULLS FIRST, nation NULLS FIRST
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- q6
    // TPC-DS q6 shape: states whose customers bought items priced over
    // 1.03× the average price of the item's type in one quarter (retail
    // prices are uniform 900-1000, so the TPC-DS 1.2 factor would select
    // nothing; the SHAPE — correlated AVG + HAVING — is the point) — a
    // correlated average subquery against the item dimension + HAVING.
    QueryDef(
      "q_tpcds_q6",
      sqlQuery("""
        SELECT n_name AS state, COUNT(*) AS cnt
        FROM customer, orders, lineitem, part, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_partkey = p_partkey AND c_nationkey = n_nationkey
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND p_retailprice > 1.03 *
            (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(25,2)))
                      AS DOUBLE) / COUNT(*)
             FROM part p2 WHERE p2.p_type = part.p_type)
        GROUP BY n_name
        HAVING COUNT(*) >= 10
        ORDER BY cnt, state"""),
      Some("""
        SELECT n_name AS state, COUNT(*) AS cnt
        FROM customer, orders, lineitem, part, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_partkey = p_partkey AND c_nationkey = n_nationkey
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND p_retailprice > 1.03 *
            (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(25,2)))
                      AS DOUBLE) / COUNT(*)
             FROM part p2 WHERE p2.p_type = part.p_type)
        GROUP BY n_name
        HAVING COUNT(*) >= 10
        ORDER BY cnt, state""".stripMargin.trim)),

    // ---------------------------------------------------------------- q9
    // TPC-DS q9 shape: five quantity-bucket statistics chosen by CASE over
    // bucket counts. The reference text spells this as 15 scalar
    // subqueries over the same fact table; the Spark-first plan is ONE
    // conditional-aggregation scan (15 scans → 1), which Catalyst keeps in
    // a single WSCG span.
    QueryDef(
      "q_tpcds_q9",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        def bucket(lo: Int, hi: Int): Column = {
          val in = col("l_quantity") >= lo && col("l_quantity") <= hi
          val cnt = sum(when(in, 1L).otherwise(0L))
          val fpPrice = sum(when(in,
            floor(col("l_extendedprice") * 1e4).cast("long")).otherwise(0L))
          val fpDisc = sum(when(in,
            floor(col("l_discount") * 1e4).cast("long")).otherwise(0L))
          // bucket stat: avg extended price when the bucket is populous,
          // else 10000 × avg discount (the q9 CASE shape, scale-free gate)
          when(cnt > lit(5000L),
            fpPrice.cast("double") / lit(1e4) / cnt)
            .otherwise(fpDisc.cast("double") / cnt)
        }
        l.agg(
          bucket(1, 10).as("bucket1"), bucket(11, 20).as("bucket2"),
          bucket(21, 30).as("bucket3"), bucket(31, 40).as("bucket4"),
          bucket(41, 50).as("bucket5"))
      },
      Some {
        def b(lo: Int, hi: Int, as: String): String = {
          val in = s"l_quantity >= $lo AND l_quantity <= $hi"
          s"""CASE WHEN SUM(CASE WHEN $in THEN 1 ELSE 0 END) > 5000
             THEN CAST(SUM(CASE WHEN $in THEN CAST(floor(l_extendedprice * 1e4) AS BIGINT) ELSE 0 END) AS DOUBLE) / 1e4 / SUM(CASE WHEN $in THEN 1 ELSE 0 END)
             ELSE CAST(SUM(CASE WHEN $in THEN CAST(floor(l_discount * 1e4) AS BIGINT) ELSE 0 END) AS DOUBLE) / SUM(CASE WHEN $in THEN 1 ELSE 0 END)
             END AS $as"""
        }
        s"""SELECT ${b(1, 10, "bucket1")}, ${b(11, 20, "bucket2")},
           ${b(21, 30, "bucket3")}, ${b(31, 40, "bucket4")},
           ${b(41, 50, "bucket5")}
           FROM lineitem""".stripMargin.trim
      }),

    // --------------------------------------------------------------- q10
    // TPC-DS q10 shape: demographic counts of customers active in a year
    // AND present in at least one of two secondary channels —
    // EXISTS ∧ (EXISTS ∨ EXISTS), decorrelated to semi joins with the
    // disjunction as a union of key sets.
    QueryDef(
      "q_tpcds_q10",
      (s, dir) => {
        val o96 = Tables.orders(s, dir)
          .where(year(col("o_orderdate")) === 1996)
        val lo = Tables.lineitem(s, dir)
          .join(o96.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
        val webOrCatalog = lo.where(col("l_linenumber") % 3 =!= 1)
          .select(col("o_custkey")).distinct()
        Tables.customer(s, dir)
          .join(o96.select(col("o_custkey")).distinct(),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .join(webOrCatalog, col("c_custkey") === col("o_custkey"),
            "left_semi")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("segment"))
      },
      Some(s"""
        SELECT c_mktsegment AS segment, COUNT(*) AS cnt
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND year(o.o_orderdate) = 1996)
          AND (EXISTS (SELECT 1 FROM lineitem l, orders o2
                       WHERE l.l_orderkey = o2.o_orderkey
                         AND o2.o_custkey = c.c_custkey
                         AND year(o2.o_orderdate) = 1996
                         AND l.l_linenumber % 3 = 0)
            OR EXISTS (SELECT 1 FROM lineitem l, orders o3
                       WHERE l.l_orderkey = o3.o_orderkey
                         AND o3.o_custkey = c.c_custkey
                         AND year(o3.o_orderdate) = 1996
                         AND l.l_linenumber % 3 = 2))
        GROUP BY c_mktsegment
        ORDER BY segment
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q14
    // TPC-DS q14 shape: the cross-channel item set — items sold in ALL
    // three channels (INTERSECT chain), then a per-channel sales rollup
    // restricted to that set.
    QueryDef(
      "q_tpcds_q14",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        def chItems(m: Int) = l.where(col("l_linenumber") % 3 === m)
          .select(col("l_partkey")).distinct()
        val crossItems = chItems(0).intersect(chItems(1)).intersect(chItems(2))
        l.join(crossItems, Seq("l_partkey"), "left_semi")
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .rollup(channelCol.as("channel"), col("p_brand").as("brand"))
          .agg(money(expr(rev)).as("sales"), count(lit(1)).as("cnt"))
          .orderBy(col("channel").asc_nulls_first,
            col("brand").asc_nulls_first)
      },
      Some(s"""
        WITH cross_items AS (
          SELECT l_partkey FROM lineitem WHERE l_linenumber % 3 = 0
          INTERSECT
          SELECT l_partkey FROM lineitem WHERE l_linenumber % 3 = 1
          INTERSECT
          SELECT l_partkey FROM lineitem WHERE l_linenumber % 3 = 2)
        SELECT $sqlChannel AS channel, p_brand AS brand,
               ${sqlMoney(rev)} AS sales, COUNT(*) AS cnt
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_partkey IN (SELECT l_partkey FROM cross_items)
        GROUP BY ROLLUP($sqlChannel, p_brand)
        ORDER BY channel NULLS FIRST, brand NULLS FIRST
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q15
    // TPC-DS q15 shape: catalog sales by geography for high-value OR
    // targeted-segment customers in one quarter, HAVING-gated.
    QueryDef(
      "q_tpcds_q15",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .where(col("l_linenumber") % 3 === 0)
          .join(Tables.orders(s, dir)
            .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .where(col("c_acctbal") > 8000 ||
            col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .groupBy(col("n_name").as("nation"))
          .agg(money(expr(rev)).as("total"))
          .where(col("total") > 1000.0)
          .orderBy(col("nation"))
      },
      Some(s"""
        SELECT n_name AS nation, ${sqlMoney(rev)} AS total
        FROM lineitem, orders, customer, nation
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n_nationkey AND l_linenumber % 3 = 0
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
          AND (c_acctbal > 8000 OR c_mktsegment IN ('BUILDING', 'MACHINERY'))
        GROUP BY n_name
        HAVING ${sqlMoney(rev)} > 1000.0
        ORDER BY nation
      """.stripMargin.trim)),

    // --------------------------------------------------------------- q17
    // TPC-DS q17 shape: per-brand quantity statistics (count, exact mean,
    // stdev/mean coefficient of variation) compared across two channels.
    // Stddev is computed from exact integer Σx/Σx² so both engines
    // evaluate the identical IEEE expression.
    QueryDef(
      "q_tpcds_q17",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
        def stats(m: Int, pre: String) = {
          val qty = col("l_quantity").cast("long")
          l.where(col("l_linenumber") % 3 === m)
            .groupBy(col("p_brand").as("brand"))
            .agg(count(lit(1)).as(s"${pre}_n"),
              sum(qty).as(s"${pre}_sum"),
              sum(qty * qty).as(s"${pre}_sumsq"))
        }
        def cv(pre: String): Column = {
          val n = col(s"${pre}_n"); val sm = col(s"${pre}_sum")
          val sq = col(s"${pre}_sumsq")
          val mean = sm.cast("double") / n
          val varExpr = (n * sq - sm * sm).cast("double") / (n * (n - lit(1L)))
          sqrt(varExpr) / mean
        }
        stats(1, "st").join(stats(2, "wb"), Seq("brand"))
          .where(col("st_n") >= 5 && col("wb_n") >= 5)
          .select(col("brand"), col("st_n"),
            (col("st_sum").cast("double") / col("st_n")).as("st_mean"),
            cv("st").as("st_cov"), col("wb_n"),
            (col("wb_sum").cast("double") / col("wb_n")).as("wb_mean"),
            cv("wb").as("wb_cov"))
          .where(col("st_cov") > col("wb_cov"))
          .orderBy(col("brand"))
      },
      Some {
        def side(m: Int): String =
          s"""SELECT p_brand AS brand, COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS s,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sq
             FROM lineitem, part
             WHERE l_partkey = p_partkey AND l_linenumber % 3 = $m
             GROUP BY p_brand"""
        s"""WITH st AS (${side(1)}), wb AS (${side(2)})
           SELECT st.brand AS brand, st.n AS st_n,
                  CAST(st.s AS DOUBLE) / st.n AS st_mean,
                  sqrt(CAST(st.n * st.sq - st.s * st.s AS DOUBLE)
                    / (st.n * (st.n - 1))) / (CAST(st.s AS DOUBLE) / st.n) AS st_cov,
                  wb.n AS wb_n,
                  CAST(wb.s AS DOUBLE) / wb.n AS wb_mean,
                  sqrt(CAST(wb.n * wb.sq - wb.s * wb.s AS DOUBLE)
                    / (wb.n * (wb.n - 1))) / (CAST(wb.s AS DOUBLE) / wb.n) AS wb_cov
           FROM st, wb
           WHERE st.brand = wb.brand AND st.n >= 5 AND wb.n >= 5
             AND sqrt(CAST(st.n * st.sq - st.s * st.s AS DOUBLE)
                   / (st.n * (st.n - 1))) / (CAST(st.s AS DOUBLE) / st.n)
               > sqrt(CAST(wb.n * wb.sq - wb.s * wb.s AS DOUBLE)
                   / (wb.n * (wb.n - 1))) / (CAST(wb.s AS DOUBLE) / wb.n)
           ORDER BY brand""".stripMargin.trim
      })
  )
}
