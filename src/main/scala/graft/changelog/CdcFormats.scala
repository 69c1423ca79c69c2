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
}
