package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, plus decode / feature-extract / frame-
  * sample stages (the LLM-training-data north star; analogous surface in
  * the reference: raw/binary columns flowing through table functions, e.g.
  * StreamExecMLPredictTableFunction.java:55 feeding a model provider).
  *
  * The container ships no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE decode — but every Spark-side concern
  * is real and tested: binary payloads with a metadata struct column,
  * per-partition batched decode via `mapPartitions` (the Scala analog of a
  * pandas-batch UDF), explicit output schema, and frame sampling as a
  * lateral explode so one blob → n rows without collecting anything.
  *
  * Scale notes: blobs never leave their partition (no shuffle in decode),
  * frame sampling multiplies rows by a bounded factor before any shuffle,
  * and metadata-only queries prune the binary column at the parquet scan.
  */
object Multimodal {

  /** Metadata struct carried alongside every blob. */
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sha256", StringType, nullable = false)))

  /** Wrap a string column as a binary payload + metadata struct — the
    * ingest shape for any opaque media column. */
  def pack(df: DataFrame, payload: Column, mime: String): DataFrame = {
    val bin = encode(payload, "UTF-8")
    df.withColumn("media", bin)
      .withColumn("media_meta",
        struct(
          lit(mime).as("mime"),
          length(bin).cast("long").as("n_bytes"),
          sha2(bin, 256).as("sha256")))
  }

  /** Decoded feature schema appended by [[decodeStub]]. */
  val featureType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** STUB decode: a real implementation would open the codec here (per
    * partition, batched) and emit true dimensions. This fake derives
    * deterministic "dimensions" from the byte length so results are
    * verifiable; the mapPartitions/batch/schema plumbing is the real
    * operator shape.
    */
  def decodeStub(df: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ featureType.fields)
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { it =>
      // codec session would be opened here, once per partition
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          val n = bytes.length.toLong
          // ??? real decode goes here; deterministic fake below
          val width = (n % 64L).toInt + 1
          val height = ((n / 64L) % 64L).toInt + 1
          val frames = (n % 7L).toInt + 1
          Row.fromSeq(r.toSeq ++ Seq(width, height, frames))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling: one row per sampled frame (lateral explode), with a
    * per-frame fingerprint over the frame's slice of the payload. The
    * blob → n-rows expansion happens before any shuffle, map-side. */
  def frameSample(df: DataFrame, payloadText: Column): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("frame_off",
        (col("frame_idx") *
          floor(col("media_meta.n_bytes") / col("n_frames")).cast("long"))
          .cast("long"))
      .withColumn("frame_hash",
        md5(call_function("substring", payloadText, col("frame_off") + 1,
          lit(16))))
}
