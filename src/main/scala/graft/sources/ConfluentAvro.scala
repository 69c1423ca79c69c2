package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Confluent-schema-registry Avro framing: each message is
  * `[magic 0x00][schema-id int32 BE][avro binary body]` — the wire format
  * the reference reads/writes via
  * flink-formats/flink-avro-confluent-registry/…/RegistryAvroFormatFactory
  * .java:81 (deserializer ConfluentRegistryAvroDeserializationSchema).
  *
  * The registry client is an SPI ([[SchemaRegistryClient]]); the bundled
  * [[FileRegistry]] is file-backed (a directory of `<id>.avsc` plus
  * `subject-<name>.id` pointers) so tests and air-gapped runs need no
  * registry service — swap in an HTTP client implementation against a real
  * Confluent registry without touching the codec.
  *
  * Decode policy: malformed frames — wrong magic byte, unknown schema id,
  * truncated/corrupt body — yield a NULL decoded struct rather than a task
  * failure (one poisoned Kafka record must not kill the stage); the
  * payload column passes through so dead-lettering stays possible.
  * Schema evolution goes through Avro schema resolution: the frame's
  * writer schema (by id) is resolved against the requested reader schema,
  * so projections and compatible changes decode correctly.
  *
  * Scale: encode/decode are per-partition `mapPartitions` with per-id
  * reader caches — no shuffle, no driver involvement.
  */
object ConfluentAvro {

  val Magic: Byte = 0x00

  trait SchemaRegistryClient extends Serializable {
    /** Writer schema JSON for an id, if registered. */
    def schemaById(id: Int): Option[String]
    /** Id for a subject's schema, registering it if new. */
    def register(subject: String, schemaJson: String): Int
  }

  /** Directory-backed registry: `<id>.avsc` holds schema `id`,
    * `subject-<name>.id` holds the id a subject registered. Registration
    * is idempotent per (subject, schema text). */
  final class FileRegistry(dir: String) extends SchemaRegistryClient {
    private def path(f: String) = java.nio.file.Paths.get(dir, f)

    override def schemaById(id: Int): Option[String] = {
      val p = path(s"$id.avsc")
      if (java.nio.file.Files.exists(p))
        Some(java.nio.file.Files.readString(p))
      else None
    }

    override def register(subject: String, schemaJson: String): Int =
      FileRegistry.lock.synchronized {
        java.nio.file.Files.createDirectories(path(""))
        val subjFile = path(s"subject-$subject.id")
        if (java.nio.file.Files.exists(subjFile)) {
          val id = java.nio.file.Files.readString(subjFile).trim.toInt
          if (schemaById(id).exists(s =>
              new Schema.Parser().parse(s) ==
                new Schema.Parser().parse(schemaJson))) return id
        }
        val existing = java.nio.file.Files.list(path("")).toArray.toSeq
          .map(_.toString).filter(_.endsWith(".avsc"))
          .flatMap(n => scala.util.Try(
            n.split('/').last.stripSuffix(".avsc").toInt).toOption)
        val id = (existing :+ 0).max + 1
        java.nio.file.Files.writeString(path(s"$id.avsc"), schemaJson)
        java.nio.file.Files.writeString(subjFile, id.toString)
        id
      }
  }

  private object FileRegistry { val lock = new Object }

  /** Frame one record: magic + id + avro binary body. */
  private[sources] def frame(id: Int, body: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(5 + body.length)
    out.put(Magic).putInt(id).put(body)
    out.array()
  }

  /** Append a `framed` binary column encoding the given columns as one
    * registry-framed Avro message per row, registering the schema under
    * `subject` (the `<topic>-value` convention). */
  def encode(
      df: DataFrame,
      registry: SchemaRegistryClient,
      subject: String,
      outCol: String = "framed"): DataFrame = {
    val sparkSchema = df.schema
    val json = AvroIO.avroSchemaJson(sparkSchema)
    val id = registry.register(subject, json)
    val outSchema = StructType(sparkSchema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val n = sparkSchema.fields.length
    df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(json)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val baos = new java.io.ByteArrayOutputStream()
      it.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < n) {
          rec.put(i, AvroIO.toAvro(row.get(i), sparkSchema.fields(i).dataType,
            schema.getFields.get(i).schema()))
          i += 1
        }
        baos.reset()
        val enc = EncoderFactory.get().binaryEncoder(baos, null)
        writer.write(rec, enc)
        enc.flush()
        Row.fromSeq(row.toSeq :+ frame(id, baos.toByteArray))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a framed binary column into a struct column `decoded` of
    * `readerSchema` (null on any malformed frame — see the class doc). */
  def decode(
      df: DataFrame,
      binCol: String,
      registry: SchemaRegistryClient,
      readerSchema: StructType,
      outCol: String = "decoded"): DataFrame = {
    val readerJson = AvroIO.avroSchemaJson(readerSchema)
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, readerSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      val reader = new Schema.Parser().parse(readerJson)
      // per-id resolving readers, built once per partition
      val readers = scala.collection.mutable.Map.empty[Int,
        Option[GenericDatumReader[GenericRecord]]]
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val decoded: Row =
          if (bytes == null || bytes.length < 6 || bytes(0) != Magic) null
          else {
            val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
            readers.getOrElseUpdate(id,
              registry.schemaById(id).flatMap { wj =>
                scala.util.Try(new GenericDatumReader[GenericRecord](
                  new Schema.Parser().parse(wj), reader)).toOption
              }) match {
              case None => null
              case Some(r) =>
                scala.util.Try {
                  val dec = DecoderFactory.get()
                    .binaryDecoder(bytes, 5, bytes.length - 5, null)
                  val rec = r.read(null, dec)
                  Row.fromSeq(readerSchema.fields.indices.map(i =>
                    AvroIO.fromAvro(rec.get(i),
                      readerSchema.fields(i).dataType)))
                }.getOrElse(null)
            }
          }
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }(Encoders.row(outSchema))
  }
}
