package graft.queries

import graft.Tables
import graft.changelog._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Changelog-tier queries: batch faces of the RowKind operators, each
  * DuckDB-oracle-checked (streaming behavior asserted in ChangelogSpec).
  *
  * The synthetic CDC feed used below (deterministic, from `orders`):
  *   seq 1: upsert every order at its original price        (+U)
  *   seq 2: upsert orders with orderkey % 5 = 0 at half price (+U)
  *   seq 3: delete orders with orderkey % 7 = 0               (-D)
  */
object ChangelogQueries {

  /** The deterministic upsert feed: (o_orderkey, o_totalprice, __seq, kind). */
  private def upsertFeed(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice").cast("double"))
    base.select(col("o_orderkey"), col("o_totalprice"), lit(1L).as("__seq"),
        lit(RowKind.UpdateAfter).as("kind"))
      .unionByName(base.where(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") * 0.5).as("o_totalprice"),
          lit(2L).as("__seq"), lit(RowKind.UpdateAfter).as("kind")))
      .unionByName(base.where(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_totalprice"), lit(3L).as("__seq"),
          lit(RowKind.Delete).as("kind")))
  }

  private val feedOracle = """
    feed AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS p FROM orders)"""

  /** Order + customer upsert feeds for the semi/anti join queries: order
    * updates (halved price for %5), order deletes (%7), customer deletes
    * (%3) — one global seq domain. */
  private def semiFeeds(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ob = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"))
    val ofeed = ob
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
      .unionByName(ob.where(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 0.5).as("o_totalprice"),
          lit(20L).as("__seq"), lit(RowKind.UpdateAfter).as("kind")))
      .unionByName(ob.where(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
    val cb = Tables.customer(s, dir).select(col("c_custkey"))
    val cfeed = cb
      .select(col("c_custkey"), lit(11L).as("__seq"),
        lit(RowKind.UpdateAfter).as("kind"))
      .unionByName(cb.where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), lit(21L).as("__seq"),
          lit(RowKind.Delete).as("kind")))
    (ofeed, cfeed)
  }

  private def semiOracle(exists: Boolean): String = {
    val pred = if (exists) "" else "NOT "
    s"""
      WITH ofinal AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 5 = 0
                    THEN CAST(o_totalprice AS DOUBLE) * 0.5
                    ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0),
      cfinal AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0)
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM ofinal o
      WHERE ${pred}EXISTS (SELECT 1 FROM cfinal c
                           WHERE c.c_custkey = o.o_custkey)
      ORDER BY o_orderkey
    """.stripMargin.trim
  }

  val defs: Seq[QueryDef] = Seq(

    // Upsert key/value records (the upsert-kafka connector convention:
    // serialized key + value, NULL value = tombstone) decoded through
    // UpsertEnvelope → ChangelogNormalize → materialized final state.
    // The topic is synthesized in-query with to_json — the same bytes a
    // real upsert topic would carry.
    QueryDef(
      "q_upsert_envelope",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val b = Tables.orders(s, dir).select(col("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"))
        def rec(value: org.apache.spark.sql.Column, seq: Long) = Seq(
          to_json(struct(col("o_orderkey"))).as("key"),
          value.as("value"), lit(seq).as("offset"))
        val topic = b.select(rec(
            to_json(struct(col("o_orderkey"), col("o_totalprice"))), 1L): _*)
          .unionByName(b.where(col("o_orderkey") % 5 === 0).select(rec(
            to_json(struct(col("o_orderkey"),
              (col("o_totalprice") * 0.5).as("o_totalprice"))), 2L): _*))
          .unionByName(b.where(col("o_orderkey") % 7 === 0).select(rec(
            lit(null).cast("string"), 3L): _*))
        val keySchema = StructType(Seq(StructField("o_orderkey", LongType)))
        val valueSchema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_totalprice", DoubleType)))
        val log = graft.changelog.UpsertEnvelope.decode(
          topic, "key", "value", keySchema, valueSchema, "offset")
        UpsertMaterialize(log, Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN p * 0.5 ELSE p END
                 AS o_totalprice
        FROM (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS p
              FROM orders)
        WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey
      """.stripMargin.trim)),

    // ChangelogNormalize: upsert feed → full changelog with -U pre-images.
    QueryDef(
      "q_changelog_normalize",
      (s, dir) => {
        ChangelogNormalize(upsertFeed(s, dir), Seq("o_orderkey"), "kind",
          "__seq")
          .orderBy(col("o_orderkey"), col("__seq"), col("__rowkind"))
      },
      Some(s"""
        WITH $feedOracle
        SELECT * FROM (
          SELECT k AS o_orderkey, p AS o_totalprice,
                 CAST(1 AS BIGINT) AS __seq, '+I' AS __rowkind FROM feed
          UNION ALL
          SELECT k, p, 2, '-U' FROM feed WHERE k % 5 = 0
          UNION ALL
          SELECT k, p * 0.5, 2, '+U' FROM feed WHERE k % 5 = 0
          UNION ALL
          SELECT k, CASE WHEN k % 5 = 0 THEN p * 0.5 ELSE p END, 3, '-D'
          FROM feed WHERE k % 7 = 0)
        ORDER BY o_orderkey, __seq, __rowkind
      """.stripMargin.trim)),

    // DropUpdateBefore: the same changelog minus pre-images.
    QueryDef(
      "q_drop_update_before",
      (s, dir) => {
        DropUpdateBefore(
          ChangelogNormalize(upsertFeed(s, dir), Seq("o_orderkey"), "kind",
            "__seq"))
          .orderBy(col("o_orderkey"), col("__seq"), col("__rowkind"))
      },
      Some(s"""
        WITH $feedOracle
        SELECT * FROM (
          SELECT k AS o_orderkey, p AS o_totalprice,
                 CAST(1 AS BIGINT) AS __seq, '+I' AS __rowkind FROM feed
          UNION ALL
          SELECT k, p * 0.5, 2, '+U' FROM feed WHERE k % 5 = 0
          UNION ALL
          SELECT k, CASE WHEN k % 5 = 0 THEN p * 0.5 ELSE p END, 3, '-D'
          FROM feed WHERE k % 7 = 0)
        ORDER BY o_orderkey, __seq, __rowkind
      """.stripMargin.trim)),

    // UpsertMaterialize: changelog → final table state (CDC round trip —
    // the oracle states the final table directly).
    QueryDef(
      "q_upsert_materialize",
      (s, dir) => {
        UpsertMaterialize(
          ChangelogNormalize(upsertFeed(s, dir), Seq("o_orderkey"), "kind",
            "__seq"),
          Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""
        WITH $feedOracle
        SELECT k AS o_orderkey,
               CASE WHEN k % 5 = 0 THEN p * 0.5 ELSE p END AS o_totalprice
        FROM feed WHERE k % 7 <> 0 ORDER BY o_orderkey
      """.stripMargin.trim)),

    // Retract-CONSUMING aggregate: fold the full changelog (accumulate
    // +I/+U, retract -U/-D) into per-bucket live-set aggregates — the
    // *WithRetractAggFunction tier. The oracle aggregates the final table
    // state directly; both must agree exactly (decimal-sum, multiset
    // min/max).
    QueryDef(
      "q_retract_agg",
      (s, dir) => {
        val log = ChangelogNormalize(upsertFeed(s, dir), Seq("o_orderkey"),
          "kind", "__seq")
          .withColumn("bucket", col("o_orderkey") % 10)
        RetractableAgg(log, Seq("bucket"), "o_totalprice")
          .orderBy(col("bucket"))
      },
      Some(s"""
        WITH $feedOracle,
        final AS (
          SELECT k % 10 AS bucket,
                 CASE WHEN k % 5 = 0 THEN p * 0.5 ELSE p END AS p2
          FROM feed WHERE k % 7 <> 0)
        SELECT bucket, COUNT(*) AS n_live,
               CAST(SUM(CAST(p2 AS DECIMAL(25,6))) AS DOUBLE) AS sum_v,
               MIN(p2) AS min_v, MAX(p2) AS max_v
        FROM final GROUP BY bucket ORDER BY bucket
      """.stripMargin.trim)),

    // Changelog-consuming JOIN (VERDICT r2 gap #1): two full changelogs —
    // orders (updates + deletes) and customers (deletes) on one global seq
    // domain — joined on custkey with live-row state per side; the output
    // upsert changelog materialized by (o_orderkey, c_custkey) must equal
    // the join of the two final table states, which is what the oracle
    // computes directly. Retractions flow from BOTH sides through the join.
    QueryDef(
      "q_changelog_join",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 5 === 0)
            .select(col("o_orderkey"), col("o_custkey"),
              (col("o_totalprice") * 0.5).as("o_totalprice"),
              lit(20L).as("__seq"), lit(RowKind.UpdateAfter).as("kind")))
          .unionByName(ob.where(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val lcl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")

        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"),
            col("c_acctbal").cast("double").as("c_acctbal"))
        val cfeed = cb
          .select(col("c_custkey"), col("c_acctbal"),
            lit(11L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(cb.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), col("c_acctbal"),
              lit(21L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val rcl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")

        UpsertMaterialize(
          ChangelogJoin(lcl, rcl, "o_custkey", "c_custkey",
            "o_orderkey", "c_custkey"),
          Seq("o_orderkey", "c_custkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH ofinal AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 5 = 0
                      THEN CAST(o_totalprice AS DOUBLE) * 0.5
                      ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice
          FROM orders WHERE o_orderkey % 7 <> 0),
        cfinal AS (
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
          FROM customer WHERE c_custkey % 3 <> 0)
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               c.c_custkey, c.c_acctbal
        FROM ofinal o JOIN cfinal c ON o.o_custkey = c.c_custkey
        ORDER BY o_orderkey
      """.stripMargin.trim)),

    // Upsert-only inputs whose updates CHANGE the join key: the second
    // wave relocates every fifth order to a different customer (o_custkey
    // rewritten). ChangelogNormalize turns each upsert into a full
    // -U(old row)/+U(new row) pair, so the join sees the retraction under
    // the OLD join key and the insert under the NEW one — the row moves
    // between join buckets and the materialized output must equal the
    // join of final states. This is the composition the README contract
    // requires for upsert feeds with key-changing updates.
    QueryDef(
      "q_changelog_join_rekey",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 5 === 0)
            .select(col("o_orderkey"),
              (col("o_custkey") % 100 + 1).as("o_custkey"),
              (col("o_totalprice") * 0.5).as("o_totalprice"),
              lit(20L).as("__seq"), lit(RowKind.UpdateAfter).as("kind")))
        val lcl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")

        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"),
            col("c_acctbal").cast("double").as("c_acctbal"))
        val cfeed = cb
          .select(col("c_custkey"), col("c_acctbal"),
            lit(11L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
        val rcl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")

        UpsertMaterialize(
          ChangelogJoin(lcl, rcl, "o_custkey", "c_custkey",
            "o_orderkey", "c_custkey"),
          Seq("o_orderkey", "c_custkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH ofinal AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 5 = 0
                      THEN o_custkey % 100 + 1 ELSE o_custkey
                 END AS o_custkey,
                 CASE WHEN o_orderkey % 5 = 0
                      THEN CAST(o_totalprice AS DOUBLE) * 0.5
                      ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice
          FROM orders),
        cfinal AS (
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
          FROM customer)
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               c.c_custkey, c.c_acctbal
        FROM ofinal o JOIN cfinal c ON o.o_custkey = c.c_custkey
        ORDER BY o_orderkey
      """.stripMargin.trim)),

    // Changelog SEMI join (StreamingSemiAntiJoinOperator.java): orders
    // whose customer is LIVE — customer deletes retract whole key groups,
    // order updates surface as -D/+I pairs. Materialized output = EXISTS
    // over the two final states.
    QueryDef(
      "q_changelog_join_semi",
      (s, dir) => {
        val (ofeed, cfeed) = semiFeeds(s, dir)
        val lcl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")
        val rcl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")
        UpsertMaterialize(
          ChangelogSemiJoin(lcl, rcl, "o_custkey", "c_custkey",
            "c_custkey", anti = false),
          Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some(semiOracle(exists = true))),

    // Changelog ANTI join: orders whose customer is gone (or never
    // existed) — the inverse flip protocol. Materialized = NOT EXISTS.
    QueryDef(
      "q_changelog_join_anti",
      (s, dir) => {
        val (ofeed, cfeed) = semiFeeds(s, dir)
        val lcl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")
        val rcl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")
        UpsertMaterialize(
          ChangelogSemiJoin(lcl, rcl, "o_custkey", "c_custkey",
            "c_custkey", anti = true),
          Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some(semiOracle(exists = false))),

    // WINDOWED retractable aggregation: CDC corrections (a -U/+U pair
    // doubling every tenth event's value) re-aggregate their 15-minute
    // tumble window — the retracting agg keyed by (type, window), the
    // window TVF × changelog composition. Materialized per-window totals
    // must equal the corrected batch aggregate.
    QueryDef(
      "q_changelog_window_agg",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_type"), col("event_id"), col("value"),
            (col("ts_us") - col("ts_us") % lit(900000000L)).as("wstart"))
        val corr = e.where(col("event_id") % 10 === 0)
        val feed = e
          .select(col("event_type"), col("wstart"), col("value").as("v"),
            lit(1L).as(RowKind.seqCol), lit(RowKind.Insert).as(RowKind.kindCol))
          .unionByName(corr.select(col("event_type"), col("wstart"),
            col("value").as("v"), lit(2L).as(RowKind.seqCol),
            lit(RowKind.UpdateBefore).as(RowKind.kindCol)))
          .unionByName(corr.select(col("event_type"), col("wstart"),
            (col("value") * 2).as("v"), lit(3L).as(RowKind.seqCol),
            lit(RowKind.UpdateAfter).as(RowKind.kindCol)))
        UpsertMaterialize(
          RetractingChangelogAgg(feed, Seq("event_type", "wstart"), "v"),
          Seq("event_type", "wstart"))
          .select(col("event_type"), col("wstart"), col("n_live"),
            col("sum_v"), col("min_v"), col("max_v"))
          .orderBy(col("event_type"), col("wstart"))
      },
      Some("""
        WITH e AS (
          SELECT event_type,
                 epoch_us(ts) - epoch_us(ts) % 900000000 AS wstart,
                 CASE WHEN event_id % 10 = 0 THEN value * 2 ELSE value END
                   AS v
          FROM events)
        SELECT event_type, wstart, COUNT(*) AS n_live,
               CAST(SUM(CAST(v AS DECIMAL(25,6))) AS DOUBLE) AS sum_v,
               MIN(v) AS min_v, MAX(v) AS max_v
        FROM e GROUP BY 1, 2
        ORDER BY 1, 2
      """.stripMargin.trim)),

    // RETRACTABLE Top-N (RetractableTopNFunction.java): top-3 orders by
    // price per priority over a changelog — price updates DEMOTE ranked
    // rows and deletes PROMOTE lower ones, each re-rank emitted as
    // retraction pairs keyed by (priority, rank). Materializing keep-last
    // by (priority, rank) must equal the Top-N of the final state.
    QueryDef(
      "q_changelog_topn",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice").cast("double").as("price"))
        val feed = ob
          .select(col("o_orderkey"), col("o_orderpriority"), col("price"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 5 === 0)
            .select(col("o_orderkey"), col("o_orderpriority"),
              (col("price") * 0.5).as("price"),
              lit(20L).as("__seq"), lit(RowKind.UpdateAfter).as("kind")))
          .unionByName(ob.where(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), col("o_orderpriority"), col("price"),
              lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val cl = ChangelogNormalize(feed, Seq("o_orderkey"), "kind", "__seq")
        UpsertMaterialize(
          ChangelogTopN(cl, Seq("o_orderpriority"), "o_orderkey",
            "price", 3),
          Seq("o_orderpriority", "rank"))
          .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
            col("price"))
          .orderBy(col("o_orderpriority"), col("rank"))
      },
      Some("""
        WITH ofinal AS (
          SELECT o_orderkey, o_orderpriority,
                 CASE WHEN o_orderkey % 5 = 0
                      THEN CAST(o_totalprice AS DOUBLE) * 0.5
                      ELSE CAST(o_totalprice AS DOUBLE) END AS price
          FROM orders WHERE o_orderkey % 7 <> 0),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY price DESC, CAST(o_orderkey AS VARCHAR) ASC)
                 AS rank
          FROM ofinal)
        SELECT o_orderpriority, CAST(rank AS INT) AS rank, o_orderkey, price
        FROM r WHERE rank <= 3
        ORDER BY o_orderpriority, rank
      """.stripMargin.trim)),

    // FastTop1 fast path (FastTop1Function.java): Top-1 over an
    // UPSERT-only feed (inserts + improving updates, no retractions) —
    // champion-only O(1) state per partition instead of the full
    // live-row map. Oracle: rank-1 of the final upsert image.
    QueryDef(
      "q_changelog_top1_fast",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice").cast("double").as("price"))
        val feed = ob
          .select(col("o_orderkey"), col("o_orderpriority"), col("price"),
            lit(10L).as(RowKind.seqCol), lit(RowKind.Insert).as(RowKind.kindCol))
          .unionByName(ob.where(col("o_orderkey") % 5 === 0)
            .select(col("o_orderkey"), col("o_orderpriority"),
              (col("price") * 1.5).as("price"),
              lit(20L).as(RowKind.seqCol),
              lit(RowKind.UpdateAfter).as(RowKind.kindCol)))
        UpsertMaterialize(
          ChangelogTopN.top1Upsert(feed, Seq("o_orderpriority"),
            "o_orderkey", "price"),
          Seq("o_orderpriority", "rank"))
          .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
            col("price"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        WITH ofinal AS (
          SELECT o_orderkey, o_orderpriority,
                 CASE WHEN o_orderkey % 5 = 0
                      THEN CAST(o_totalprice AS DOUBLE) * 1.5
                      ELSE CAST(o_totalprice AS DOUBLE) END AS price
          FROM orders),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY price DESC, CAST(o_orderkey AS VARCHAR) ASC)
                 AS rank
          FROM ofinal)
        SELECT o_orderpriority, CAST(rank AS INT) AS rank, o_orderkey, price
        FROM r WHERE rank = 1
        ORDER BY o_orderpriority
      """.stripMargin.trim)),

    // Updatable Top-N fast path (UpdatableTopNFunction.java): Top-3
    // over an upsert-only, monotone-improving feed — rank-buffer-only
    // O(N) state. Oracle: ranks 1..3 of the final upsert image.
    QueryDef(
      "q_changelog_topn_updatable",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice").cast("double").as("price"))
        val feed = ob
          .select(col("o_orderkey"), col("o_orderpriority"), col("price"),
            lit(10L).as(RowKind.seqCol), lit(RowKind.Insert).as(RowKind.kindCol))
          .unionByName(ob.where(col("o_orderkey") % 5 === 0)
            .select(col("o_orderkey"), col("o_orderpriority"),
              (col("price") * 1.5).as("price"),
              lit(20L).as(RowKind.seqCol),
              lit(RowKind.UpdateAfter).as(RowKind.kindCol)))
        UpsertMaterialize(
          ChangelogTopN.updatableTopN(feed, Seq("o_orderpriority"),
            "o_orderkey", "price", 3),
          Seq("o_orderpriority", "rank"))
          .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
            col("price"))
          .orderBy(col("o_orderpriority"), col("rank"))
      },
      Some("""
        WITH ofinal AS (
          SELECT o_orderkey, o_orderpriority,
                 CASE WHEN o_orderkey % 5 = 0
                      THEN CAST(o_totalprice AS DOUBLE) * 1.5
                      ELSE CAST(o_totalprice AS DOUBLE) END AS price
          FROM orders),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY price DESC, CAST(o_orderkey AS VARCHAR) ASC)
                 AS rank
          FROM ofinal)
        SELECT o_orderpriority, CAST(rank AS INT) AS rank, o_orderkey, price
        FROM r WHERE rank <= 3
        ORDER BY o_orderpriority, rank
      """.stripMargin.trim)),

    // LEFT OUTER changelog join: orders of deleted customers stay as
    // null-padded rows; the padding appears/retracts as matches come and
    // go. Oracle: LEFT JOIN of the two final states.
    QueryDef(
      "q_changelog_join_left",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val lcl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")

        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"),
            col("c_acctbal").cast("double").as("c_acctbal"))
        val cfeed = cb
          .select(col("c_custkey"), col("c_acctbal"),
            lit(11L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(cb.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), col("c_acctbal"),
              lit(21L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val rcl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")

        UpsertMaterialize(
          ChangelogJoin(lcl, rcl, "o_custkey", "c_custkey",
            "o_orderkey", "c_custkey", joinType = "left"),
          Seq("o_orderkey", "c_custkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH ofinal AS (
          SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE)
            AS o_totalprice
          FROM orders WHERE o_orderkey % 7 <> 0),
        cfinal AS (
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
          FROM customer WHERE c_custkey % 3 <> 0)
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               c.c_custkey, c.c_acctbal
        FROM ofinal o LEFT JOIN cfinal c ON o.o_custkey = c.c_custkey
        ORDER BY o_orderkey
      """.stripMargin.trim)),

    // FULL OUTER changelog join: orders whose customer died stay
    // right-null-padded; customers whose orders all died become
    // left-null-padded — both paddings appear/retract as state evolves.
    QueryDef(
      "q_changelog_join_full",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_custkey") % 4 === 0)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val lcl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")

        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"),
            col("c_acctbal").cast("double").as("c_acctbal"))
        val cfeed = cb
          .select(col("c_custkey"), col("c_acctbal"),
            lit(11L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(cb.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), col("c_acctbal"),
              lit(21L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val rcl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")

        UpsertMaterialize(
          ChangelogJoin(lcl, rcl, "o_custkey", "c_custkey",
            "o_orderkey", "c_custkey", joinType = "full"),
          Seq("o_orderkey", "c_custkey"))
          .orderBy(col("o_orderkey"), col("c_custkey"))
      },
      Some("""
        WITH ofinal AS (
          SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE)
            AS o_totalprice
          FROM orders WHERE o_custkey % 4 <> 0),
        cfinal AS (
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
          FROM customer WHERE c_custkey % 3 <> 0)
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               c.c_custkey, c.c_acctbal
        FROM ofinal o FULL JOIN cfinal c ON o.o_custkey = c.c_custkey
        ORDER BY o_orderkey, c_custkey
      """.stripMargin.trim)),

    // N-ARY (3-way) changelog join as a binary chain: orders ⋈ customer ⋈
    // nation. ChangelogJoin emits an UPSERT changelog (+U/-D, no -U
    // pre-images), so the chain re-normalizes between joins — exactly the
    // planner-inserted ChangelogNormalize the reference uses when an
    // operator needs retractions its input doesn't carry. Seq domains:
    // join1 doubles the global domain; the nation side is scaled ×2 to
    // match before join2.
    QueryDef(
      "q_changelog_join3",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val lcl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")

        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))
        val cfeed = cb
          .select(col("c_custkey"), col("c_nationkey"),
            lit(11L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(cb.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), col("c_nationkey"),
              lit(21L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val rcl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")

        val j1 = ChangelogJoin(lcl, rcl, "o_custkey", "c_custkey",
          "o_orderkey", "c_custkey")
        // j1 is an upsert changelog keyed by (o_orderkey, c_custkey) =
        // o_orderkey; re-derive -U pre-images for the next join
        val j1full = ChangelogNormalize(
          j1.withColumn("kind", col(RowKind.kindCol))
            .drop(RowKind.kindCol),
          Seq("o_orderkey"), "kind", RowKind.seqCol)

        val nb = Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))
        val nfeed = nb
          .select(col("n_nationkey"), col("n_name"),
            lit(1L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(nb.where(col("n_nationkey") % 5 === 0)
            .select(col("n_nationkey"), col("n_name"),
              lit(100L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ncl = ChangelogNormalize(nfeed, Seq("n_nationkey"), "kind",
          "__seq")
          .withColumn("__seq", col("__seq") * 2) // align with j1's domain

        val j2 = ChangelogJoin(j1full, ncl, "c_nationkey", "n_nationkey",
          "o_orderkey", "n_nationkey")
        UpsertMaterialize(j2, Seq("o_orderkey", "n_nationkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               c.c_custkey, c.c_nationkey, n.n_nationkey, n.n_name
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderkey % 7 <> 0 AND c.c_custkey % 3 <> 0
          AND n.n_nationkey % 5 <> 0
        ORDER BY o_orderkey
      """.stripMargin.trim)),

    // N-ARY changelog join in ONE stateful operator
    // (StreamingMultiJoinOperator.java): a 3-way star on custkey —
    // orders × customer × a second customer-derived feed — where the
    // operator's state is the three inputs' live rows, never the
    // intermediate orders⋈customer product the binary chain
    // (q_changelog_join3) materializes. Deletes on every side exercise
    // the cross-product retraction walk.
    QueryDef(
      "q_changelog_join_nary",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ocl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")

        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))
        val cfeed = cb
          .select(col("c_custkey"), col("c_nationkey"),
            lit(11L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(cb.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), col("c_nationkey"),
              lit(21L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ccl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")

        val ab = Tables.customer(s, dir)
          .select(col("c_custkey").as("a_custkey"),
            col("c_mktsegment").as("a_mktsegment"))
        val afeed = ab
          .select(col("a_custkey"), col("a_mktsegment"),
            lit(12L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ab.where(col("a_custkey") % 5 === 0)
            .select(col("a_custkey"), col("a_mktsegment"),
              lit(22L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val acl = ChangelogNormalize(afeed, Seq("a_custkey"), "kind", "__seq")

        UpsertMaterialize(
          ChangelogMultiJoin(Seq(
            ocl -> "o_custkey", ccl -> "c_custkey", acl -> "a_custkey")),
          Seq("o_orderkey", "c_custkey", "a_custkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               c.c_custkey, c.c_nationkey,
               a.c_custkey AS a_custkey, a.c_mktsegment AS a_mktsegment
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN customer a ON o.o_custkey = a.c_custkey
        WHERE o.o_orderkey % 7 <> 0 AND c.c_custkey % 3 <> 0
          AND a.c_custkey % 5 <> 0
        ORDER BY o_orderkey
      """.stripMargin.trim)),

    // N-ary changelog join with PER-DEPTH LEFT joins — the reference's
    // left-deep typed multi-join (StreamingMultiJoinOperator.java:884
    // isLeftJoin(depth)): orders LEFT customer LEFT customer-feed on
    // custkey in ONE stateful operator. Deletes on the right sides drive
    // the pad transitions (last match retracted -> padded row re-emitted),
    // so the materialized state is exactly the SQL n-way LEFT join of the
    // final states.
    QueryDef(
      "q_changelog_join_nary_left",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ocl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")

        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))
        val cfeed = cb
          .select(col("c_custkey"), col("c_nationkey"),
            lit(11L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(cb.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), col("c_nationkey"),
              lit(21L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ccl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")

        val ab = Tables.customer(s, dir)
          .select(col("c_custkey").as("a_custkey"),
            col("c_mktsegment").as("a_mktsegment"))
        val afeed = ab
          .select(col("a_custkey"), col("a_mktsegment"),
            lit(12L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ab.where(col("a_custkey") % 5 === 0)
            .select(col("a_custkey"), col("a_mktsegment"),
              lit(22L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val acl = ChangelogNormalize(afeed, Seq("a_custkey"), "kind", "__seq")

        UpsertMaterialize(
          ChangelogMultiJoin.chain(
            Seq(ocl, ccl, acl),
            Map(
              1 -> Seq(ChangelogMultiJoin.ChainCond(
                0, "o_custkey", "c_custkey")),
              2 -> Seq(ChangelogMultiJoin.ChainCond(
                0, "o_custkey", "a_custkey"))),
            Seq("inner", "left", "left")),
          Seq("o_orderkey", "c_custkey", "a_custkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               c.c_custkey, c.c_nationkey, a.a_custkey, a.a_mktsegment
        FROM (SELECT * FROM orders WHERE o_orderkey % 7 <> 0) o
        LEFT JOIN (SELECT c_custkey, c_nationkey FROM customer
                   WHERE c_custkey % 3 <> 0) c
          ON o.o_custkey = c.c_custkey
        LEFT JOIN (SELECT c_custkey AS a_custkey,
                          c_mktsegment AS a_mktsegment FROM customer
                   WHERE c_custkey % 5 <> 0) a
          ON o.o_custkey = a.a_custkey
        ORDER BY o_orderkey
      """.stripMargin.trim)),

    // N-ary changelog join with PER-PAIR keys — the chain shape the
    // common-key operator can't take: nation—customer on nationkey,
    // customer—orders on custkey (two DIFFERENT customer columns, so no
    // attribute class touches every input and no common shuffle key
    // exists — the reference's joinAttributeMap case,
    // StreamExecMultiJoin.java:84). Still ONE stateful operator holding
    // per-input state; deletes on every side exercise the cross-product
    // retraction walk through both link keys.
    QueryDef(
      "q_changelog_join_nary_chain",
      (s, dir) => {
        val nb = Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))
        val nfeed = nb
          .select(col("n_nationkey"), col("n_name"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(nb.where(col("n_nationkey") % 5 === 0)
            .select(col("n_nationkey"), col("n_name"),
              lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ncl = ChangelogNormalize(nfeed, Seq("n_nationkey"), "kind", "__seq")

        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))
        val cfeed = cb
          .select(col("c_custkey"), col("c_nationkey"),
            lit(11L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(cb.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), col("c_nationkey"),
              lit(21L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ccl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")

        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(12L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              lit(22L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ocl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")

        UpsertMaterialize(
          ChangelogMultiJoin.chain(
            Seq(ncl, ccl, ocl),
            Map(
              1 -> Seq(ChangelogMultiJoin.ChainCond(
                0, "n_nationkey", "c_nationkey")),
              2 -> Seq(ChangelogMultiJoin.ChainCond(
                1, "c_custkey", "o_custkey")))),
          Seq("n_nationkey", "c_custkey", "o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT n.n_nationkey, n.n_name, c.c_custkey, c.c_nationkey,
               o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        FROM nation n
        JOIN customer c ON n.n_nationkey = c.c_nationkey
        JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE n.n_nationkey % 5 <> 0 AND c.c_custkey % 3 <> 0
          AND o.o_orderkey % 7 <> 0
        ORDER BY o_orderkey
      """.stripMargin.trim)),

    // N-ary changelog join with a RESIDUAL condition — a TRIANGLE join
    // graph over a star on custkey: orders—customer and orders—feed are
    // tree edges on custkey, PLUS the non-tree customer—feed edge on
    // independent parity attributes (nationkey parity vs mktsegment
    // length parity), which the BFS visit plan applies as a probe-time
    // post-filter — the reference's ConditionAttributeRef to an earlier,
    // non-via input (AttributeBasedJoinKeyExtractor's joinAttributeMap).
    // The custkey attribute class spans all three inputs, so the
    // operator stays KEYED (parallel groups — the scale path); the
    // unkeyed fallback is covered by the ChangelogSpec triangle test.
    // Deletes on every side drive the retraction walk THROUGH the
    // residual filter.
    QueryDef(
      "q_changelog_join_nary_residual",
      (s, dir) => {
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            lit(10L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              lit(30L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ocl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")

        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"),
            (col("c_nationkey") % 2).cast("long").as("c_par"))
        val cfeed = cb
          .select(col("c_custkey"), col("c_nationkey"), col("c_par"),
            lit(11L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(cb.where(col("c_custkey") % 3 === 0)
            .select(col("c_custkey"), col("c_nationkey"), col("c_par"),
              lit(21L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val ccl = ChangelogNormalize(cfeed, Seq("c_custkey"), "kind", "__seq")

        val ab = Tables.customer(s, dir)
          .select(col("c_custkey").as("a_custkey"),
            col("c_mktsegment").as("a_mktsegment"),
            (length(col("c_mktsegment")) % 2).cast("long").as("a_par"))
        val afeed = ab
          .select(col("a_custkey"), col("a_mktsegment"), col("a_par"),
            lit(12L).as("__seq"), lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ab.where(col("a_custkey") % 5 === 0)
            .select(col("a_custkey"), col("a_mktsegment"), col("a_par"),
              lit(22L).as("__seq"), lit(RowKind.Delete).as("kind")))
        val acl = ChangelogNormalize(afeed, Seq("a_custkey"), "kind", "__seq")

        UpsertMaterialize(
          ChangelogMultiJoin.chain(
            Seq(ocl, ccl, acl),
            Map(
              1 -> Seq(ChangelogMultiJoin.ChainCond(
                0, "o_custkey", "c_custkey")),
              2 -> Seq(
                ChangelogMultiJoin.ChainCond(0, "o_custkey", "a_custkey"),
                ChangelogMultiJoin.ChainCond(1, "c_par", "a_par")))),
          Seq("o_orderkey", "c_custkey", "a_custkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               c.c_custkey, c.c_nationkey,
               CAST(c.c_nationkey % 2 AS BIGINT) AS c_par,
               a.a_custkey, a.a_mktsegment,
               CAST(length(a.a_mktsegment) % 2 AS BIGINT) AS a_par
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN (SELECT c_custkey AS a_custkey,
                     c_mktsegment AS a_mktsegment FROM customer) a
          ON o.o_custkey = a.a_custkey
         AND c.c_nationkey % 2 = length(a.a_mktsegment) % 2
        WHERE o.o_orderkey % 7 <> 0 AND c.c_custkey % 3 <> 0
          AND a.a_custkey % 5 <> 0
        ORDER BY o_orderkey
      """.stripMargin.trim)),

    // Agg→agg changelog CHAIN (VERDICT r2 gap #2): normalize the upsert
    // feed into a full changelog, aggregate it per bucket with the
    // retract-consuming+emitting agg (whose batch face replays the FULL
    // -U/+U transition history), re-aggregate THAT changelog per bucket
    // parity — the second agg must correctly consume the first's
    // retractions — then materialize the final state. The oracle computes
    // the final table state directly: any mishandled retraction anywhere
    // in the chain changes the result.
    QueryDef(
      "q_changelog_agg_chain",
      (s, dir) => {
        val log = ChangelogNormalize(upsertFeed(s, dir), Seq("o_orderkey"),
          "kind", "__seq")
          .withColumn("bucket", col("o_orderkey") % 10)
        val lvl1 = RetractingChangelogAgg(log, Seq("bucket"), "o_totalprice",
          orderCols =
            Seq(col("__seq"), col("__rowkind"), col("o_orderkey")))
        val lvl2 = RetractingChangelogAgg(
          lvl1.withColumn("parity", col("bucket") % 2),
          Seq("parity"), "sum_v",
          orderCols = Seq(col("__seq"), col("__rowkind"), col("bucket")))
        UpsertMaterialize(lvl2, Seq("parity")).orderBy(col("parity"))
      },
      Some(s"""
        WITH $feedOracle,
        final AS (
          SELECT k % 10 AS bucket,
                 CASE WHEN k % 5 = 0 THEN p * 0.5 ELSE p END AS p2
          FROM feed WHERE k % 7 <> 0),
        b AS (SELECT bucket, COUNT(*) AS bn,
                     CAST(SUM(CAST(p2 AS DECIMAL(25,6))) AS DOUBLE) AS bsum
              FROM final GROUP BY bucket)
        SELECT bucket % 2 AS parity, COUNT(*) AS n_live,
               CAST(SUM(CAST(bsum AS DECIMAL(25,6))) AS DOUBLE) AS sum_v,
               MIN(bsum) AS min_v, MAX(bsum) AS max_v
        FROM b GROUP BY parity ORDER BY parity
      """.stripMargin.trim)),

    // Agg→JOIN pipeline (the composition VERDICT r2 named as the
    // motivating user story): a continuously-updated per-bucket aggregate
    // changelog (seqFromInput keeps the global CDC seq domain) joined
    // against a dimension changelog whose members come and go. The
    // materialized join must equal aggregating + joining the final states.
    QueryDef(
      "q_changelog_agg_join",
      (s, dir) => {
        // orders changelog with globally unique per-change seqs
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        val ofeed = ob
          .select(col("o_orderkey"), col("o_totalprice"),
            (col("o_orderkey") * 10 + 1).as("__seq"),
            lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(ob.where(col("o_orderkey") % 5 === 0)
            .select(col("o_orderkey"),
              (col("o_totalprice") * 0.5).as("o_totalprice"),
              (col("o_orderkey") * 10 + 2).as("__seq"),
              lit(RowKind.UpdateAfter).as("kind")))
          .unionByName(ob.where(col("o_orderkey") % 7 === 0)
            .select(col("o_orderkey"), col("o_totalprice"),
              (col("o_orderkey") * 10 + 3).as("__seq"),
              lit(RowKind.Delete).as("kind")))
        val lcl = ChangelogNormalize(ofeed, Seq("o_orderkey"), "kind", "__seq")
          .withColumn("bucket", col("o_orderkey") % 10)
        val retractFirst = when(
          col("__rowkind") === RowKind.UpdateBefore ||
            col("__rowkind") === RowKind.Delete, 0).otherwise(1)
        val aggCl = RetractingChangelogAgg(lcl, Seq("bucket"), "o_totalprice",
          orderCols = Seq(col("__seq"), retractFirst, col("o_orderkey")),
          seqFromInput = true)

        // dimension changelog: labels per bucket, every 4th later deleted;
        // seq domain shared with the orders log (later positions), scaled
        // x4 to align with the agg output's transformed domain
        val dims = s.range(0, 10)
          .select(col("id").as("bucket_id"),
            concat(lit("bucket-"), col("id").cast("string")).as("label"))
        val dfeed = dims
          .select(col("bucket_id"), col("label"),
            (lit(2000000L) + col("bucket_id")).as("__seq"),
            lit(RowKind.UpdateAfter).as("kind"))
          .unionByName(dims.where(col("bucket_id") % 4 === 0)
            .select(col("bucket_id"), col("label"),
              (lit(3000000L) + col("bucket_id")).as("__seq"),
              lit(RowKind.Delete).as("kind")))
        val rcl = ChangelogNormalize(dfeed, Seq("bucket_id"), "kind", "__seq")
          .withColumn("__seq", col("__seq") * 4)

        UpsertMaterialize(
          ChangelogJoin(aggCl, rcl, "bucket", "bucket_id",
            "bucket", "bucket_id"),
          Seq("bucket", "bucket_id"))
          .orderBy(col("bucket"))
      },
      Some("""
        WITH final AS (
          SELECT o_orderkey % 10 AS bucket,
                 CASE WHEN o_orderkey % 5 = 0
                      THEN CAST(o_totalprice AS DOUBLE) * 0.5
                      ELSE CAST(o_totalprice AS DOUBLE) END AS p2
          FROM orders WHERE o_orderkey % 7 <> 0),
        b AS (SELECT bucket, COUNT(*) AS n_live,
                     CAST(SUM(CAST(p2 AS DECIMAL(25,6))) AS DOUBLE) AS sum_v,
                     MIN(p2) AS min_v, MAX(p2) AS max_v
              FROM final GROUP BY bucket),
        d AS (SELECT unnest(range(0, 10)) AS bucket_id),
        dims AS (SELECT bucket_id, 'bucket-' || CAST(bucket_id AS VARCHAR)
                   AS label FROM d WHERE bucket_id % 4 <> 0)
        SELECT b.bucket, b.n_live, b.sum_v, b.min_v, b.max_v,
               dims.bucket_id, dims.label
        FROM b JOIN dims ON b.bucket = dims.bucket_id
        ORDER BY b.bucket
      """.stripMargin.trim)),

    // ChangelogAgg batch face: the all-+I special case of the
    // retraction-emitting group aggregate.
    QueryDef(
      "q_changelog_agg",
      (s, dir) => {
        ChangelogAgg(Tables.events(s, dir), Seq("event_type"),
          Seq(AggSpec("n", "event_id", "count"),
            AggSpec("min_v", "value", "min"),
            AggSpec("max_v", "value", "max")))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               MIN(CAST(value AS DOUBLE)) AS min_v,
               MAX(CAST(value AS DOUBLE)) AS max_v,
               '+I' AS __rowkind, CAST(1 AS BIGINT) AS __seq
        FROM events GROUP BY event_type ORDER BY event_type
      """.stripMargin.trim))
  )
}
