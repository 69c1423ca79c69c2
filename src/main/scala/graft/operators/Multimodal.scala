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
  * [[decode]] is a REAL container decode ([[ImageCodec]]): PNG/APNG, JPEG,
  * GIF and BMP dimensions and frame counts read from the actual bytes via
  * header parsing — no full pixel decode, so the per-blob cost is a few
  * header reads regardless of payload size. Undecodable bytes yield null
  * features (poisoned blobs must not kill a stage). The operator shape is
  * per-partition batched `mapPartitions` (the Scala analog of a
  * pandas-batch UDF) with an explicit output schema, and frame sampling is
  * a lateral explode so one blob → n rows without collecting anything.
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

  /** Decoded feature schema appended by [[decode]] — nullable: bytes that
    * parse as no known container yield null features, not a task failure. */
  val featureType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("decoded_mime", StringType, nullable = true)))

  /** Real decode: per-partition batched header parse of the `media` binary
    * column ([[ImageCodec]] — PNG/APNG, JPEG, GIF, BMP), appending true
    * width/height/n_frames plus the mime detected FROM THE BYTES (which
    * may disagree with the declared `media_meta.mime` — that mismatch is
    * itself a data-quality signal). */
  def decode(df: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ featureType.fields)
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { it =>
      // batched so a heavier codec could amortize per-batch setup; the
      // header parsers themselves are allocation-light per row
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](mediaIdx)
          ImageCodec.decode(bytes) match {
            case Some(m) =>
              Row.fromSeq(r.toSeq ++ Seq(m.width, m.height, m.nFrames, m.mime))
            case None =>
              Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic real-image fixture: one blob per row from `idCol` —
    * JPEG when id % 3 == 0, else PNG, which becomes an APNG with
    * (id % 4) + 2 frames when id % 5 == 0; dimensions
    * ((id % 61) + 4) × ((id % 37) + 4). Encoded with the JDK's ImageIO
    * (real bitstreams — [[decode]] reads these dimensions back out of the
    * bytes, so an oracle recomputing the formulas checks the decoder
    * against ground truth). Runs per-partition; nothing is collected. */
  def packSynthetic(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("media", BinaryType, nullable = false),
      StructField("media_meta", metaType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val id = r.getLong(idIdx)
        val w = (id % 61).toInt + 4
        val h = (id % 37).toInt + 4
        val bytes =
          if (id % 3 == 0) ImageCodec.synthesize("jpg", w, h, id)
          else {
            val png = ImageCodec.synthesize("png", w, h, id)
            if (id % 5 == 0)
              ImageCodec.withApngFrames(png, (id % 4).toInt + 2)
            else png
          }
        val mime = if (id % 3 == 0) "image/jpeg" else "image/png"
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        Row.fromSeq(r.toSeq ++ Seq(bytes,
          Row(mime, bytes.length.toLong, sha)))
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling: one row per sampled frame (lateral explode), with a
    * per-frame fingerprint over the frame's byte slice of the payload. The
    * blob → n-rows expansion happens before any shuffle, map-side; rows
    * whose decode failed (null `n_frames`) simply produce no frames. */
  def frameSample(df: DataFrame): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("frame_off",
        (col("frame_idx") *
          floor(col("media_meta.n_bytes") / col("n_frames")).cast("long"))
          .cast("long"))
      .withColumn("frame_hash",
        md5(expr("substring(media, cast(frame_off + 1 as int), 16)")))
}
