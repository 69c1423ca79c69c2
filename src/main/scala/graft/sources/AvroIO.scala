package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro FILE format support built directly on the avro-mapred Hadoop I/O
  * formats bundled with Spark — the `spark-avro` DataSource connector is
  * not in this container, but the format itself needs nothing more than
  * these public classes (reference: flink-formats/flink-avro's
  * AvroInputFormat/AvroOutputFormat pair, the same Hadoop-format route).
  *
  * Supported column types: boolean/int/long/float/double/string (nullable
  * → Avro union with null) — the flat-record core of the format. Complex
  * nesting stays on parquet (the primary columnar format here).
  *
  * Scale: both directions are straight `mapPartitions` over Hadoop file
  * splits — no shuffle, partition-parallel, same execution shape as any
  * file scan/write.
  */
object AvroIO {

  private def avroType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case other => throw new IllegalArgumentException(
      s"AvroIO supports flat primitive columns only, got $other")
  }

  /** Avro record schema JSON for a flat StructType. */
  def avroSchemaJson(schema: StructType, name: String = "row"): String = {
    val fields = schema.fields.map { f =>
      val t = "\"" + avroType(f.dataType) + "\""
      val tj = if (f.nullable) s"""["null", $t]""" else t
      s"""{"name": "${f.name}", "type": $tj}"""
    }
    s"""{"type": "record", "name": "$name", "fields": [${fields.mkString(",")}]}"""
  }

  /** Write a flat DataFrame as Avro container files under `path`. */
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
          while (i < n) { rec.put(i, row.get(i)); i += 1 }
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

  /** Read Avro container files written by [[write]] (or any flat-record
    * Avro data matching `schema`). */
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
        Row.fromSeq(fields.indices.map { i =>
          rec.get(i) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case other => other
          }
        })
      }
    spark.createDataFrame(rdd, schema)
  }
}
