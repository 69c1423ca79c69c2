package graft.changelog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The upsert key/value record convention — the reference's
  * upsert-kafka-style connector semantic (in-repo reference: the
  * UpsertTestSink key/value test connector,
  * flink-tests/…/connector/upserttest/sink/UpsertTestSinkWriter.java, and
  * the planner's ChangelogNormalize contract,
  * flink-table-runtime/…/operators/deduplicate/ChangelogNormalizeFunction):
  * each record is a (key, value) pair of serialized rows where a NULL
  * value is a tombstone deleting the key.
  *
  * [[decode]] turns such a topic into a FULL `__rowkind` changelog:
  * key/value JSON parse → per-key upsert stream (+U, -D on tombstone) →
  * [[ChangelogNormalize]] reconstructs +I vs -U/+U pre-images — exactly
  * the normalize step the reference plans after an upsert source.
  * [[encode]] is the sink direction: the changelog's per-key last-image
  * sequence becomes (key, value) records with tombstones for deletes
  * (`-U` rows drop — DropUpdateBefore — since an upsert sink keys on the
  * primary key and the following `+U` supersedes).
  *
  * Both directions are declarative JSON projections (from_json/to_json);
  * the only stateful step is the normalize's keyed state — identical
  * batch and streaming.
  */
object UpsertEnvelope {

  /** (keyCol JSON, valueCol JSON|null) records → full changelog.
    * `seq` must give a per-key total order (a Kafka offset at scale);
    * keys present in the key JSON override the same-named value fields
    * (the reference reads the PK from the key bytes). */
  def decode(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      keySchema: StructType,
      valueSchema: StructType,
      seqCol: String): DataFrame = {
    val keyNames = keySchema.fieldNames.toSeq
    val parsed = df.select(
      from_json(col(keyCol), keySchema).as("__k"),
      from_json(col(valueCol), valueSchema).as("__v"),
      col(valueCol).isNull.as("__tomb"),
      col(seqCol).cast("long").as(RowKind.seqCol))
    val cols =
      keyNames.map(k => col(s"__k.$k").as(k)) ++
        valueSchema.fieldNames.filterNot(keyNames.contains)
          .map(v => col(s"__v.$v").as(v))
    val upserts = parsed.select(cols :+ col(RowKind.seqCol) :+
      when(col("__tomb"), RowKind.Delete)
        .otherwise(RowKind.UpdateAfter).as("__upsert_kind"): _*)
    ChangelogNormalize(upserts, keyNames, "__upsert_kind", RowKind.seqCol)
  }

  /** Changelog → (key, value) upsert records: `+I`/`+U` carry the row as
    * value JSON, `-D` emits a tombstone (null value), `-U` drops. Order
    * within a key follows `__seq` (kept on the output for the sink's
    * partitioner). */
  def encode(
      df: DataFrame,
      keyCols: Seq[String],
      keyOut: String = "key",
      valueOut: String = "value"): DataFrame = {
    val valueCols = df.columns
      .filterNot(Set(RowKind.kindCol, RowKind.seqCol)).toSeq
    df.where(col(RowKind.kindCol) =!= RowKind.UpdateBefore)
      .select(
        to_json(struct(keyCols.map(col): _*)).as(keyOut),
        when(col(RowKind.kindCol) =!= RowKind.Delete,
          to_json(struct(valueCols.map(col): _*),
            Map("ignoreNullFields" -> "false"))).as(valueOut),
        col(RowKind.seqCol))
  }
}
