package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro FILE format support built directly on the avro-mapred Hadoop I/O
  * formats bundled with Spark — the `spark-avro` DataSource connector is
  * not in this container, but the format itself needs nothing more than
  * these public classes (reference: flink-formats/flink-avro's
  * AvroInputFormat/AvroOutputFormat pair, the same Hadoop-format route).
  *
  * Supported column types: boolean/int/long/float/double/string/binary,
  * decimal / timestamp / timestamp_ntz / date via the standard Avro
  * logical types (bytes-decimal, timestamp-micros, local-timestamp-micros,
  * date), plus arbitrarily NESTED struct (Avro record), array, and
  * string-keyed map — nullable anywhere via the `["null", T]` union, the
  * same mapping flink-avro's AvroSchemaConverter performs.
  *
  * Scale: both directions are straight `mapPartitions` over Hadoop file
  * splits — no shuffle, partition-parallel, same execution shape as any
  * file scan/write.
  */
object AvroIO {

  /** Avro schema JSON for a Spark type; `nullable` wraps in a null union.
    * Record names are path-derived for uniqueness. */
  private def avroTypeJson(dt: DataType, nullable: Boolean,
      path: String): String = {
    val core = dt match {
      case BooleanType => "\"boolean\""
      case IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case d: DecimalType =>
        s"""{"type": "bytes", "logicalType": "decimal", "precision": ${
          d.precision}, "scale": ${d.scale}}"""
      case TimestampType =>
        """{"type": "long", "logicalType": "timestamp-micros"}"""
      case TimestampNTZType =>
        """{"type": "long", "logicalType": "local-timestamp-micros"}"""
      case DateType =>
        """{"type": "int", "logicalType": "date"}"""
      case StructType(fields) =>
        val fs = fields.map(f => s"""{"name": "${f.name}", "type": ${
          avroTypeJson(f.dataType, f.nullable, s"${path}_${f.name}")}}""")
        s"""{"type": "record", "name": "rec_$path", "fields": [${fs.mkString(",")}]}"""
      case ArrayType(elem, containsNull) =>
        s"""{"type": "array", "items": ${
          avroTypeJson(elem, containsNull, s"${path}_item")}}"""
      case MapType(StringType, v, valueContainsNull) =>
        s"""{"type": "map", "values": ${
          avroTypeJson(v, valueContainsNull, s"${path}_value")}}"""
      case other => throw new IllegalArgumentException(
        s"AvroIO cannot map $other")
    }
    if (nullable) s"""["null", $core]""" else core
  }

  /** Avro record schema JSON for a StructType (nested types included). */
  def avroSchemaJson(schema: StructType, name: String = "row"): String = {
    val fields = schema.fields.map { f =>
      s"""{"name": "${f.name}", "type": ${
        avroTypeJson(f.dataType, f.nullable, f.name)}}"""
    }
    s"""{"type": "record", "name": "$name", "fields": [${fields.mkString(",")}]}"""
  }

  /** The non-null branch of a `["null", T]` union (or the schema itself). */
  private def actual(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Spark external value → Avro datum, recursively. Decimal/timestamp/
    * date use the standard Avro logical-type encodings (unscaled
    * big-endian bytes, epoch micros, epoch days). */
  private[sources] def toAvro(v: Any, dt: DataType, s: Schema): Any = v match {
    case null => null
    case d: java.math.BigDecimal =>
      val scaled = d.setScale(dt.asInstanceOf[DecimalType].scale)
      java.nio.ByteBuffer.wrap(scaled.unscaledValue().toByteArray)
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case dte: java.sql.Date =>
      dte.toLocalDate.toEpochDay.toInt
    case ldt: java.time.LocalDateTime =>
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case row: Row =>
      val rs = actual(s)
      val st = dt.asInstanceOf[StructType]
      val rec = new GenericData.Record(rs)
      var i = 0
      while (i < st.fields.length) {
        rec.put(i, toAvro(row.get(i), st.fields(i).dataType,
          rs.getFields.get(i).schema()))
        i += 1
      }
      rec
    case seq: scala.collection.Seq[_] =>
      val es = actual(s).getElementType
      val et = dt.asInstanceOf[ArrayType].elementType
      seq.map(toAvro(_, et, es)).asJava
    case m: scala.collection.Map[_, _] =>
      val vs = actual(s).getValueType
      val vt = dt.asInstanceOf[MapType].valueType
      m.map { case (k, mv) => k.toString -> toAvro(mv, vt, vs) }.asJava
    case other => other
  }

  /** Avro datum → Spark external value, recursively. */
  private[sources] def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, _) => u.toString
    case (bb: java.nio.ByteBuffer, d: DecimalType) =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
    case (micros: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000).toInt)
      ts
    case (micros: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000).toInt,
        java.time.ZoneOffset.UTC)
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      bytes
    // foreign-file shapes AvroSource's inference advertises (our writer
    // never produces them): ENUM → its symbol string, FIXED → bytes or
    // the fixed-backed decimal logical type
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) =>
      e.toString
    case (f: org.apache.avro.generic.GenericFixed, d: DecimalType) =>
      new java.math.BigDecimal(
        new java.math.BigInteger(f.bytes()), d.scale)
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) =>
      f.bytes().clone()
    case (rec: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.indices.map(i =>
        fromAvro(rec.get(i), st.fields(i).dataType)))
    case (list: java.util.Collection[_], at: ArrayType) =>
      list.asScala.map(fromAvro(_, at.elementType)).toSeq
    case (m: java.util.Map[_, _], mt: MapType) =>
      m.asScala.map { case (k, mv) =>
        k.toString -> fromAvro(mv, mt.valueType)
      }.toMap
    case (other, _) => other
  }

  /** Write a DataFrame (nested types included) as Avro container files. */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    val job = Job.getInstance(
      df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(json))
    val n = sparkSchema.fields.length
    df.rdd
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(json) // parse per partition
        it.map { row =>
          val rec: GenericRecord = new GenericData.Record(schema)
          var i = 0
          while (i < n) {
            rec.put(i, toAvro(row.get(i), sparkSchema.fields(i).dataType,
              schema.getFields.get(i).schema()))
            i += 1
          }
          (new AvroKey[GenericRecord](rec), NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(
        path,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }

  /** Read Avro container files written by [[write]] (or any Avro data
    * matching `schema`, nested records/arrays/maps included). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val json = avroSchemaJson(schema)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(json))
    val fields = schema.fields
    val rdd = spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(fields.indices.map(i =>
          fromAvro(rec.get(i), fields(i).dataType)))
      }
    spark.createDataFrame(rdd, schema)
  }
}
