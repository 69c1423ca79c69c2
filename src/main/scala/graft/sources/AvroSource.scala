package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** The `avro` DataSource (VERDICT r12 missing #4): schema-on-read SQL over
  * .avro container files as a one-liner —
  * `spark.read.format("avro").load(path)`,
  * `df.write.format("avro").save(path)`, and
  * `CREATE TABLE t … WITH ('format'='avro')` through the DDL runner —
  * registered under the short name `avro` via DataSourceRegister (the
  * spark-avro connector is not in this container; the I/O rides
  * [[AvroIO]]'s avro-mapred Hadoop formats, the same public classes the
  * reference's flink-formats/flink-avro AvroInputFormat uses).
  *
  * Schema inference reads the FIRST container file's embedded writer
  * schema (Avro files are self-describing); records decode BY FIELD NAME
  * against it, so column order differences and missing fields (→ null)
  * resolve the way Avro schema resolution does.
  *
  * Scale: the scan is Hadoop-split parallel (one task per file split, no
  * shuffle) — but as a V1 `TableScan` relation it reads every column;
  * filters and projections apply AFTER decode. For hot 100 TB paths
  * convert to parquet (columnar pruning + pushdown); this source is the
  * interop surface, matching the reference's positioning of its Avro
  * filesystem format. Appends write through a temp dir and move files in
  * (Avro has no transaction log to replay).
  */
final class AvroSource extends RelationProvider with SchemaRelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "avro"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "the avro source needs a 'path' (use .load(path)/.save(path))"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new AvroRelation(sqlContext, pathOf(parameters), None)

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String], schema: StructType): BaseRelation =
    new AvroRelation(sqlContext, pathOf(parameters), Some(schema))

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(
      sqlContext.sparkSession.sessionState.newHadoopConf())
    val exists = fs.exists(hPath)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(s"path $path already exists")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Overwrite =>
        if (exists) fs.delete(hPath, true)
        AvroIO.write(data, path)
      case _ if !exists => AvroIO.write(data, path)
      case _ => // Append into an existing directory: the Hadoop output
        // format refuses a non-empty target, so write aside and move the
        // data files in under collision-free names
        val tmp = new Path(path + "_append_" + java.util.UUID.randomUUID())
        AvroIO.write(data, tmp.toString)
        fs.listStatus(tmp).filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))
          .foreach { st =>
            fs.rename(st.getPath, new Path(hPath,
              s"part-${java.util.UUID.randomUUID()}.avro"))
          }
        fs.delete(tmp, true)
    }
    new AvroRelation(sqlContext, path, Some(data.schema))
  }
}

object AvroSource {

  /** Spark type for an Avro schema (the inverse of AvroIO's writer
    * mapping): `["null", T]` unions unwrap to nullable T; the standard
    * logical types map back (date, timestamp-micros,
    * local-timestamp-micros, bytes-decimal). `*-millis` timestamps stay
    * raw longs — [[AvroIO.fromAvro]] decodes micros only, and silently
    * rescaling someone else's data would be worse than handing back the
    * number. */
  def sparkType(s: Schema): (DataType, Boolean) = {
    import Schema.Type._
    s.getType match {
      case UNION =>
        val nonNull = s.getTypes.asScala.filterNot(_.getType == NULL).toSeq
        require(nonNull.size == 1,
          s"unsupported avro union (only [null, T] resolves): $s")
        (sparkType(nonNull.head)._1, true)
      case BOOLEAN => (BooleanType, false)
      case INT =>
        (if (Option(s.getLogicalType).exists(_.getName == "date")) DateType
         else IntegerType, false)
      case LONG =>
        (Option(s.getLogicalType).map(_.getName) match {
          case Some("timestamp-micros") => TimestampType
          case Some("local-timestamp-micros") => TimestampNTZType
          case _ => LongType
        }, false)
      case FLOAT => (FloatType, false)
      case DOUBLE => (DoubleType, false)
      case STRING | ENUM => (StringType, false)
      case BYTES | FIXED =>
        s.getLogicalType match {
          case d: org.apache.avro.LogicalTypes.Decimal =>
            (DecimalType(d.getPrecision, d.getScale), false)
          case _ => (BinaryType, false)
        }
      case RECORD =>
        (StructType(s.getFields.asScala.map { f =>
          val (t, n) = sparkType(f.schema())
          StructField(f.name, t, n)
        }.toSeq), false)
      case ARRAY =>
        val (t, n) = sparkType(s.getElementType); (ArrayType(t, n), false)
      case MAP =>
        val (t, n) = sparkType(s.getValueType)
        (MapType(StringType, t, n), false)
      case other => throw new IllegalArgumentException(
        s"unsupported avro type $other in $s")
    }
  }

  /** The embedded writer schema of the first container file under `path`
    * (a file, a directory, or a glob), as a Spark schema. */
  def inferSchema(spark: SparkSession, path: String): StructType = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val first = {
      val matches = Option(fs.globStatus(p)).getOrElse(Array.empty).toSeq
      val files = matches.flatMap { st =>
        if (st.isFile) Seq(st.getPath)
        else fs.listStatus(st.getPath).filter(_.isFile).map(_.getPath).toSeq
      }.filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      files.headOption.getOrElse(throw new IllegalArgumentException(
        s"no avro data files under $path — pass a schema with .schema(...)"))
    }
    val in = fs.open(first)
    try {
      val stream = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try sparkType(stream.getSchema)._1.asInstanceOf[StructType]
      finally stream.close()
    } finally scala.util.Try(in.close())
  }

  /** Decode container files by FIELD NAME against `schema` (missing
    * fields → null), using each file's own writer schema — no reader
    * schema is imposed, so foreign record/namespace names resolve. */
  def readByName(spark: SparkSession, path: String,
      schema: StructType): RDD[Row] = {
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val fields = schema.fields
    spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(fields.map { f =>
          val v = if (rec.getSchema.getField(f.name) == null) null
            else rec.get(f.name)
          AvroIO.fromAvro(v, f.dataType)
        }.toSeq)
      }
  }
}

/** Full-scan relation over avro container files (see [[AvroSource]]). */
final class AvroRelation(
    ctx: SQLContext,
    path: String,
    userSchema: Option[StructType]) extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = ctx

  override val schema: StructType = userSchema.getOrElse(
    AvroSource.inferSchema(ctx.sparkSession, path))

  override def buildScan(): RDD[Row] =
    AvroSource.readByName(ctx.sparkSession, scanPath, schema)

  /** newAPIHadoopFile does not recurse a directory with trailing slash
    * semantics differences; normalize a directory to its file glob. */
  private def scanPath: String = {
    val p = new Path(path)
    val fs = p.getFileSystem(ctx.sparkSession.sessionState.newHadoopConf())
    if (fs.isDirectory(p)) new Path(p, "*.avro").toString else path
  }
}
