package graft.queries

import graft.Tables
import graft.changelog.{CdcFormats, UpsertMaterialize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC format queries: Debezium / Canal / Maxwell JSON envelopes parsed
  * into the `__rowkind` changelog convention (graft.changelog.CdcFormats).
  *
  * Each query builds a deterministic CDC feed from `orders` IN-QUERY
  * (to_json of envelope structs — the same bytes a real connector would
  * put on a topic), parses it back, and either emits the changelog or
  * materializes final state. The oracle states the expected rows directly
  * from `orders`, so a parse defect anywhere (envelope shape, op mapping,
  * pre-image overlay, batched arrays) breaks the hash match.
  *
  * Feed semantics (mirrors ChangelogQueries' upsert feed):
  *   ts 1: snapshot insert of every order at its original price
  *   ts 2: update to half price where o_orderkey % 5 = 0
  *   ts 3: delete where o_orderkey % 7 = 0
  */
object CdcQueries {

  private val valueSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_totalprice", DoubleType)))

  // spread (r19): the to_json envelope build + from_json parse both sat
  // in a ONE-task scan stage (single-split input); no-op at scale
  private def base(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice").cast("double")))

  // Current price after the ts-2 update — the delete's pre-image.
  private def curPrice =
    when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 0.5)
      .otherwise(col("o_totalprice"))

  private def row(price: org.apache.spark.sql.Column) =
    struct(col("o_orderkey"), price.as("o_totalprice"))

  /** Single-scan Debezium feed: all three phases' envelopes explode from
    * ONE pass over the base table (the r4-final union-of-three-branches
    * rescanned it three times). The envelope candidates are to_json
    * STRINGS, so the array is homogeneous; non-applicable phases are null
    * and filtered. */
  private def debeziumFeed(
      b: DataFrame,
      rowOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      ts: (Long, Long, Long)): DataFrame =
    b.select(explode(array(
      to_json(struct(rowOf(col("o_totalprice")).as("after"),
        lit("c").as("op"), lit(ts._1).as("ts_ms"))),
      when(col("o_orderkey") % 5 === 0, to_json(struct(
        rowOf(col("o_totalprice")).as("before"),
        rowOf(col("o_totalprice") * 0.5).as("after"),
        lit("u").as("op"), lit(ts._2).as("ts_ms")))),
      when(col("o_orderkey") % 7 === 0, to_json(struct(
        rowOf(curPrice).as("before"),
        lit("d").as("op"), lit(ts._3).as("ts_ms"))))))
      .as("payload"))
      .where(col("payload").isNotNull)

  /** The full-changelog oracle shared by the debezium and canal faces. */
  private val changelogOracle = """
    WITH feed AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS p FROM orders)
    SELECT * FROM (
      SELECT k AS o_orderkey, p AS o_totalprice, '+I' AS __rowkind,
             CAST(1 AS BIGINT) AS __seq FROM feed
      UNION ALL
      SELECT k, p, '-U', 2 FROM feed WHERE k % 5 = 0
      UNION ALL
      SELECT k, p * 0.5, '+U', 2 FROM feed WHERE k % 5 = 0
      UNION ALL
      SELECT k, CASE WHEN k % 5 = 0 THEN p * 0.5 ELSE p END, '-D', 3
      FROM feed WHERE k % 7 = 0)
    ORDER BY o_orderkey, __seq, __rowkind""".stripMargin.trim

  val defs: Seq[QueryDef] = Seq(

    // Debezium: per-row before/after/op envelopes.
    QueryDef(
      "q_cdc_debezium",
      (s, dir) => {
        val feed = debeziumFeed(base(s, dir), row, (1L, 2L, 3L))
        CdcFormats.fromDebezium(feed, "payload", valueSchema)
          .orderBy(col("o_orderkey"), col("__seq"), col("__rowkind"))
      },
      Some(changelogOracle)),

    // Canal: batched `data` arrays (snapshot pairs two orders per message
    // — exercises the posexplode path) and changed-columns-only `old`
    // pre-images (exercises the overlay).
    QueryDef(
      "q_cdc_canal",
      (s, dir) => {
        val b = base(s, dir)
        val ins = b
          .groupBy(expr("o_orderkey div 2").as("g"))
          .agg(sort_array(collect_list(row(col("o_totalprice")))).as("data"))
          .select(to_json(struct(col("data"), lit("INSERT").as("type"),
            lit(1L).as("ts"))).as("payload"))
        val upd = b.where(col("o_orderkey") % 5 === 0)
          .select(to_json(struct(
            array(row(col("o_totalprice") * 0.5)).as("data"),
            // old carries ONLY the changed column, like the real connector
            array(struct((col("o_totalprice")).as("o_totalprice"))).as("old"),
            lit("UPDATE").as("type"), lit(2L).as("ts"))).as("payload"))
        val del = b.where(col("o_orderkey") % 7 === 0)
          .select(to_json(struct(
            array(row(curPrice)).as("data"),
            lit("DELETE").as("type"), lit(3L).as("ts"))).as("payload"))
        CdcFormats.fromCanal(ins.unionByName(upd).unionByName(del),
            "payload", valueSchema)
          .orderBy(col("o_orderkey"), col("__seq"), col("__rowkind"))
      },
      Some(changelogOracle)),

    // Ogg (GoldenGate): per-row before/after envelopes with op_type
    // letters and STRING op_ts timestamps — deletes carry the pre-image
    // (unlike Debezium's d/before conventions the letters and the string
    // timestamp are the format-specific bits this exercises).
    QueryDef(
      "q_cdc_ogg",
      (s, dir) => {
        val tsStr = (sec: Int) => lit(f"1970-01-01 00:00:0$sec%d.000000")
        val feed = base(s, dir).select(explode(array(
            to_json(struct(row(col("o_totalprice")).as("after"),
              lit("I").as("op_type"), tsStr(1).as("op_ts"))),
            when(col("o_orderkey") % 5 === 0, to_json(struct(
              row(col("o_totalprice")).as("before"),
              row(col("o_totalprice") * 0.5).as("after"),
              lit("U").as("op_type"), tsStr(2).as("op_ts")))),
            when(col("o_orderkey") % 7 === 0, to_json(struct(
              row(curPrice).as("before"),
              lit("D").as("op_type"), tsStr(3).as("op_ts"))))))
            .as("payload"))
          .where(col("payload").isNotNull)
        CdcFormats.fromOgg(feed, "payload", valueSchema)
          .orderBy(col("o_orderkey"), col("__seq"), col("__rowkind"))
      },
      Some(changelogOracle)),

    // Maxwell: per-row envelopes, parsed changelog folded straight into
    // final table state — the topic→table CDC round trip.
    QueryDef(
      "q_cdc_maxwell",
      (s, dir) => {
        val feed = base(s, dir).select(explode(array(
            to_json(struct(row(col("o_totalprice")).as("data"),
              lit("insert").as("type"), lit(1L).as("ts"))),
            when(col("o_orderkey") % 5 === 0, to_json(struct(
              row(col("o_totalprice") * 0.5).as("data"),
              struct(col("o_totalprice").as("o_totalprice")).as("old"),
              lit("update").as("type"), lit(2L).as("ts")))),
            when(col("o_orderkey") % 7 === 0, to_json(struct(
              row(curPrice).as("data"),
              lit("delete").as("type"), lit(3L).as("ts"))))))
            .as("payload"))
          .where(col("payload").isNotNull)
        UpsertMaterialize(
          CdcFormats.fromMaxwell(feed, "payload", valueSchema),
          Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH feed AS (
          SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS p
          FROM orders)
        SELECT k AS o_orderkey,
               CASE WHEN k % 5 = 0 THEN p * 0.5 ELSE p END AS o_totalprice
        FROM feed WHERE k % 7 <> 0 ORDER BY o_orderkey
      """.stripMargin.trim)),

    // Composition depth: CDC topic → parsed changelog → retract-consuming
    // aggregate, the ingestion→aggregation pipeline a CDC consumer runs.
    // The parsed -U/+U/-D rows feed RetractableAgg directly; the oracle
    // aggregates the final table state.
    QueryDef(
      "q_cdc_pipeline",
      (s, dir) => {
        val feed = debeziumFeed(base(s, dir), row, (1L, 2L, 3L))
        val log = CdcFormats.fromDebezium(feed, "payload", valueSchema)
          .withColumn("bucket", col("o_orderkey") % 10)
        graft.changelog.RetractableAgg(log, Seq("bucket"), "o_totalprice")
          .orderBy(col("bucket"))
      },
      Some("""
        WITH feed AS (
          SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS p
          FROM orders),
        final AS (
          SELECT k % 10 AS bucket,
                 CASE WHEN k % 5 = 0 THEN p * 0.5 ELSE p END AS p2
          FROM feed WHERE k % 7 <> 0)
        SELECT bucket, COUNT(*) AS n_live,
               CAST(SUM(CAST(p2 AS DECIMAL(25,6))) AS DOUBLE) AS sum_v,
               MIN(p2) AS min_v, MAX(p2) AS max_v
        FROM final GROUP BY bucket ORDER BY bucket
      """.stripMargin.trim)),

    // Write side: the changelog SERIALIZES back to Debezium envelopes
    // (CdcFormats.toDebezium — the reference's
    // DebeziumJsonSerializationSchema mapping: updates degrade to
    // delete+insert) and re-parses to the same final state. Envelope
    // order is made total first (seq*2 + new-image bit — the offset a
    // real topic would assign), because the degraded -D/+I pair shares
    // its source timestamp.
    QueryDef(
      "q_cdc_writeback",
      (s, dir) => {
        val feed = debeziumFeed(base(s, dir), row, (1L, 2L, 3L))
        val log = CdcFormats.fromDebezium(feed, "payload", valueSchema)
          .withColumn("__seq", col("__seq") * 2 +
            when(col("__rowkind").isin("+I", "+U"), 1).otherwise(0))
        val rt = CdcFormats.fromDebezium(
          CdcFormats.toDebezium(log).toDF("payload"), "payload", valueSchema)
        UpsertMaterialize(rt, Seq("o_orderkey")).orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN p * 0.5 ELSE p END
                 AS o_totalprice
        FROM (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS p
              FROM orders)
        WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey
      """.stripMargin.trim)),

    // The full CDC story: TWO Debezium topics (orders with updates +
    // deletes, customers with deletes) parsed into full changelogs —
    // Debezium carries -U pre-images, so no normalize step is needed —
    // joined by the changelog-consuming join, materialized to final
    // state. Oracle: join of the two final table states.
    QueryDef(
      "q_cdc_join",
      (s, dir) => {
        import graft.changelog.ChangelogJoin
        val oSchema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType),
          StructField("o_totalprice", DoubleType)))
        val ob = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
        def orow(price: org.apache.spark.sql.Column) =
          struct(col("o_orderkey"), col("o_custkey"),
            price.as("o_totalprice"))
        val lcl = CdcFormats.fromDebezium(
          debeziumFeed(ob, orow, (10L, 20L, 30L)), "payload", oSchema)

        val cSchema = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_acctbal", DoubleType)))
        val cb = Tables.customer(s, dir)
          .select(col("c_custkey"),
            col("c_acctbal").cast("double").as("c_acctbal"))
        val crow = struct(col("c_custkey"), col("c_acctbal"))
        val cfeed = cb.select(explode(array(
            to_json(struct(crow.as("after"), lit("c").as("op"),
              lit(11L).as("ts_ms"))),
            when(col("c_custkey") % 3 === 0, to_json(struct(
              crow.as("before"), lit("d").as("op"),
              lit(21L).as("ts_ms")))))).as("payload"))
          .where(col("payload").isNotNull)
        val rcl = CdcFormats.fromDebezium(cfeed, "payload", cSchema)

        graft.changelog.UpsertMaterialize(
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
      """.stripMargin.trim))
  )
}
