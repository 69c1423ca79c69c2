package graft.changelog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC envelope formats → the graft changelog convention.
  *
  * The reference ships three JSON changelog formats that decode message
  * envelopes from the common CDC tools into RowKind-flagged rows
  * (flink-formats/flink-json:
  * `…/formats/json/debezium/DebeziumJsonDeserializationSchema.java`,
  * `…/json/canal/CanalJsonDeserializationSchema.java`,
  * `…/json/maxwell/MaxwellJsonDeserializationSchema.java`). These are the
  * ingestion half of the changelog tier: a Kafka topic of Debezium/Canal/
  * Maxwell messages becomes a `-U/+U/-D`-bearing dynamic table that
  * ChangelogNormalize / RetractableAgg / ChangelogJoin consume.
  *
  * Each parser here is fully declarative — `from_json` + one
  * explode-of-candidate-structs pass per message (no UDF, no second scan of
  * the envelope column), so parsing stays inside WholeStageCodegen and runs
  * identically on batch and streaming DataFrames. Output schema:
  * the value columns of `valueSchema`, `__rowkind`, `__seq` (from the
  * envelope's timestamp field — Debezium `ts_ms`, Canal/Maxwell `ts`; at
  * scale substitute the Kafka partition offset for a total per-key order).
  *
  * Update pre-images: Debezium carries a full `before` row. Canal and
  * Maxwell carry only the CHANGED columns in `old`, so the pre-image is
  * reconstructed field-wise as `coalesce(old.f, new.f)` — the same overlay
  * the reference's deserializers perform.
  */
object CdcFormats {

  import RowKind._

  /** Explode one parsed envelope row into its changelog rows: `cands` are
    * (condition, row-struct, kind) candidates; null-condition rows vanish. */
  private def emit(
      parsed: DataFrame,
      seq: Column,
      valueSchema: StructType,
      cands: Seq[(Column, Column, String)]): DataFrame = {
    val entries = cands.map { case (cond, row, kind) =>
      when(cond, struct(row.as("row"), lit(kind).as("kind")))
    }
    parsed
      .select(seq.as(seqCol), explode_outer(array(entries: _*)).as("__e"))
      .where(col("__e").isNotNull && col("__e.row").isNotNull)
      .select(
        valueSchema.fieldNames.map(f => col(s"__e.row.$f")) :+
          col("__e.kind").as(kindCol) :+ col(seqCol): _*)
  }

  /** Field-wise overlay: changed-columns struct `old` over full row `new`. */
  private def overlay(oldRow: Column, newRow: Column,
      valueSchema: StructType): Column =
    struct(valueSchema.fieldNames.map(f =>
      coalesce(oldRow.getField(f), newRow.getField(f)).as(f)): _*)

  /** Debezium JSON: `{"before":R|null,"after":R|null,"op":"c|r|u|d",
    * "ts_ms":N}`. op c/r → +I(after); u → -U(before) +U(after);
    * d → -D(before). */
  def fromDebezium(df: DataFrame, jsonCol: String,
      valueSchema: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("before", valueSchema),
      StructField("after", valueSchema),
      StructField("op", StringType),
      StructField("ts_ms", LongType)))
    val p = df.select(from_json(col(jsonCol), env).as("c"))
    val op = col("c.op")
    emit(p, col("c.ts_ms"), valueSchema, Seq(
      (op.isin("c", "r"), col("c.after"), Insert),
      (op === "u", col("c.before"), UpdateBefore),
      (op === "u", col("c.after"), UpdateAfter),
      (op === "d", col("c.before"), Delete)))
  }

  /** Canal JSON: `{"data":[R,…],"old":[R_changed,…]|null,
    * "type":"INSERT|UPDATE|DELETE","ts":N}` — `data` is a BATCH of rows;
    * for UPDATE, `old[i]` holds the changed columns of `data[i]`'s
    * pre-image. */
  def fromCanal(df: DataFrame, jsonCol: String,
      valueSchema: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("data", ArrayType(valueSchema)),
      StructField("old", ArrayType(valueSchema)),
      StructField("type", StringType),
      StructField("ts", LongType)))
    val p = df.select(from_json(col(jsonCol), env).as("c"))
      .select(col("c.type").as("t"), col("c.ts").as("ts"), col("c.old").as("os"),
        posexplode(col("c.data")).as(Seq("pos", "d")))
      .withColumn("o", element_at(col("os"), col("pos") + 1))
    val before = overlay(col("o"), col("d"), valueSchema)
    emit(p, col("ts"), valueSchema, Seq(
      (col("t") === "INSERT", col("d"), Insert),
      (col("t") === "UPDATE", before, UpdateBefore),
      (col("t") === "UPDATE", col("d"), UpdateAfter),
      (col("t") === "DELETE", col("d"), Delete)))
  }

  /** Ogg (GoldenGate) JSON
    * (`…/json/ogg/OggJsonDeserializationSchema.java`): `{"before":R|null,
    * "after":R|null,"op_type":"I|U|D","op_ts":"yyyy-MM-dd
    * HH:mm:ss[.ffffff]"}`. I → +I(after); U → -U(before) +U(after);
    * D → -D(before) — Ogg, unlike Debezium, deletes by PRE-image and
    * stamps a STRING timestamp, parsed here to epoch seconds for
    * `__seq`. */
  def fromOgg(df: DataFrame, jsonCol: String,
      valueSchema: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("before", valueSchema),
      StructField("after", valueSchema),
      StructField("op_type", StringType),
      StructField("op_ts", StringType)))
    val p = df.select(from_json(col(jsonCol), env).as("c"))
    val op = col("c.op_type")
    emit(p, unix_timestamp(to_timestamp(col("c.op_ts"))), valueSchema, Seq(
      (op === "I", col("c.after"), Insert),
      (op === "U", col("c.before"), UpdateBefore),
      (op === "U", col("c.after"), UpdateAfter),
      (op === "D", col("c.before"), Delete)))
  }

  /** Maxwell JSON: `{"data":R,"old":R_changed|null,
    * "type":"insert|update|delete","ts":N}` — `old` holds the changed
    * columns of the pre-image. */
  def fromMaxwell(df: DataFrame, jsonCol: String,
      valueSchema: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("data", valueSchema),
      StructField("old", valueSchema),
      StructField("type", StringType),
      StructField("ts", LongType)))
    val p = df.select(from_json(col(jsonCol), env).as("c"))
    val before = overlay(col("c.old"), col("c.data"), valueSchema)
    emit(p, col("c.ts"), valueSchema, Seq(
      (col("c.type") === "insert", col("c.data"), Insert),
      (col("c.type") === "update", before, UpdateBefore),
      (col("c.type") === "update", col("c.data"), UpdateAfter),
      (col("c.type") === "delete", col("c.data"), Delete)))
  }

  // ----------------------------------------------------------- write side

  // The reference's CDC formats SERIALIZE too (DebeziumJson/CanalJson/
  // MaxwellJson/OggJson SerializationSchema + the Avro-Confluent
  // DebeziumAvroSerializationSchema): a changelog-producing query can
  // write envelopes back to a Kafka-style sink. All four map the same
  // way (DebeziumJsonSerializationSchema.java:78): +I/+U become the
  // format's INSERT envelope carrying the row as the new image, -U/-D
  // become its DELETE envelope carrying the row as the old image — an
  // update degrades to delete+insert, exactly as on the read side's
  // reverse. Serializers are pure `to_json(struct(...))` projections
  // (nulls kept explicit so the envelopes parse back), map-side only.

  /** The non-metadata value columns of a changelog frame. */
  private def valueCols(df: DataFrame): Seq[Column] =
    df.columns.filterNot(Set(kindCol, seqCol)).map(col).toSeq

  /** Struct type of those value columns (for typed null literals). */
  private def valueType(df: DataFrame): StructType =
    StructType(df.schema.fields.filterNot(f => Set(kindCol, seqCol)(f.name)))

  private def jsonOpts = Map("ignoreNullFields" -> "false")

  /** Changelog → Debezium JSON envelopes (`before`/`after`/`op`/`ts_ms`;
    * ts_ms carries `__seq` so a round trip preserves order). */
  def toDebezium(df: DataFrame, outCol: String = "json"): DataFrame = {
    val row = struct(valueCols(df): _*)
    val isNew = col(kindCol).isin(RowKind.Insert, RowKind.UpdateAfter)
    df.select(to_json(struct(
      when(!isNew, row).as("before"),
      when(isNew, row).as("after"),
      when(isNew, lit("c")).otherwise(lit("d")).as("op"),
      col(seqCol).as("ts_ms")), jsonOpts).as(outCol))
  }

  /** Changelog → Canal JSON envelopes (`data` is a one-row batch). */
  def toCanal(df: DataFrame, outCol: String = "json"): DataFrame = {
    val row = struct(valueCols(df): _*)
    val isNew = col(kindCol).isin(RowKind.Insert, RowKind.UpdateAfter)
    df.select(to_json(struct(
      array(row).as("data"),
      lit(null).cast(ArrayType(valueType(df))).as("old"),
      when(isNew, lit("INSERT")).otherwise(lit("DELETE")).as("type"),
      col(seqCol).as("ts")), jsonOpts).as(outCol))
  }

  /** Changelog → Maxwell JSON envelopes. */
  def toMaxwell(df: DataFrame, outCol: String = "json"): DataFrame = {
    val row = struct(valueCols(df): _*)
    val isNew = col(kindCol).isin(RowKind.Insert, RowKind.UpdateAfter)
    df.select(to_json(struct(
      row.as("data"),
      lit(null).cast(valueType(df)).as("old"),
      when(isNew, lit("insert")).otherwise(lit("delete")).as("type"),
      col(seqCol).as("ts")), jsonOpts).as(outCol))
  }

  /** Changelog → Ogg JSON envelopes (`op_ts` formats `__seq` as Ogg's
    * string timestamp, epoch seconds). */
  def toOgg(df: DataFrame, outCol: String = "json"): DataFrame = {
    val row = struct(valueCols(df): _*)
    val isNew = col(kindCol).isin(RowKind.Insert, RowKind.UpdateAfter)
    df.select(to_json(struct(
      when(!isNew, row).as("before"),
      when(isNew, row).as("after"),
      when(isNew, lit("I")).otherwise(lit("D")).as("op_type"),
      date_format(to_timestamp(col(seqCol)),
        "yyyy-MM-dd HH:mm:ss").as("op_ts")), jsonOpts).as(outCol))
  }

  // ------------------------------------------- debezium-avro-confluent

  private def debeziumEnvelope(valueSchema: StructType): StructType =
    StructType(Seq(
      StructField("before", valueSchema),
      StructField("after", valueSchema),
      StructField("op", StringType),
      StructField("ts_ms", LongType)))

  /** Debezium over Confluent-framed AVRO
    * (flink-avro-confluent-registry/…/debezium/
    * DebeziumAvroDeserializationSchema.java): the binary column holds
    * magic-byte + schema-id framed Avro envelopes; schema resolution and
    * malformed-frame null policy come from
    * [[graft.sources.ConfluentAvro]], the envelope → changelog mapping is
    * the same as the JSON face. */
  def fromDebeziumAvro(
      df: DataFrame,
      binCol: String,
      registry: graft.sources.ConfluentAvro.SchemaRegistryClient,
      valueSchema: StructType): DataFrame = {
    val p = graft.sources.ConfluentAvro
      .decode(df, binCol, registry, debeziumEnvelope(valueSchema),
        outCol = "__dbz")
      .select(col("__dbz").as("c"))
    val op = col("c.op")
    emit(p, col("c.ts_ms"), valueSchema, Seq(
      (op.isin("c", "r"), col("c.after"), Insert),
      (op === "u", col("c.before"), UpdateBefore),
      (op === "u", col("c.after"), UpdateAfter),
      (op === "d", col("c.before"), Delete)))
  }

  /** Changelog → Confluent-framed Avro Debezium envelopes (binary column
    * `framed`; schema registered under `subject` —
    * DebeziumAvroSerializationSchema.java:108's mapping). */
  def toDebeziumAvro(
      df: DataFrame,
      registry: graft.sources.ConfluentAvro.SchemaRegistryClient,
      subject: String,
      outCol: String = "framed"): DataFrame = {
    val row = struct(valueCols(df): _*)
    val isNew = col(kindCol).isin(RowKind.Insert, RowKind.UpdateAfter)
    val env = df.select(
      when(!isNew, row).as("before"),
      when(isNew, row).as("after"),
      when(isNew, lit("c")).otherwise(lit("d")).as("op"),
      col(seqCol).as("ts_ms"))
    graft.sources.ConfluentAvro.encode(env, registry, subject, outCol)
      .select(col(outCol))
  }
}
