package graft

import graft.operators.{LookupJoin, MapBackedClient, TableAgg}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Specs for the lookup-join tier, table-agg tier, datagen/rate source,
  * file formats and sink abilities. */
class MiscOpsSpec extends SparkSpecBase {

  import spark.implicits._

  private val payload = StructType(Seq(StructField("name", StringType)))

  test("Tables catalog cache: per-session reuse, per-(dir,name) isolation") {
    Tables.clearCache()
    // same (session, dir, name) resolves to the SAME DataFrame — the
    // register-once catalog pattern (no re-list / footer re-read)
    val a = Tables.lineitem(spark, sf)
    val b = Tables.lineitem(spark, sf)
    assert(a eq b)
    // distinct dirs and names stay distinct entries
    val mid = Tables.lineitem(spark, sfMid)
    assert(!(a eq mid))
    assert(!(a eq Tables.orders(spark, sf)))
    // cached events table still carries the normalized time columns
    val ev = Tables.events(spark, sf)
    assert(ev eq Tables.events(spark, sf))
    assert(Seq("ts", "ts_ns", "ts_us").forall(ev.columns.contains))
    // clearCache forces a fresh resolution
    Tables.clearCache()
    assert(!(a eq Tables.lineitem(spark, sf)))
  }

  test("LookupJoin: cache bounded, inner drops misses, left null-pads") {
    val store = new MapBackedClient(
      Map(1L -> Seq("one"), 2L -> Seq("two"), 3L -> Seq("three")))
    val probe = Seq(1L, 2L, 9L, 1L, 3L, 9L).toDF("k")
    val inner = LookupJoin(probe, "k", store, payload, "inner",
      cacheCapacity = 2)
    assert(inner.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .sameElements(Array((1L, "one"), (1L, "one"), (2L, "two"), (3L, "three"))))
    val left = LookupJoin(probe, "k", store, payload, "left")
    assert(left.count() == 6)
    assert(left.where(col("lk_name").isNull).count() == 2)
  }

  test("LookupJoin.async preserves probe order per partition") {
    val store = new MapBackedClient(
      (1L to 100L).map(k => (k: Any) -> Seq(s"v$k")).toMap)
    val probe = spark.sparkContext.parallelize(1L to 100L, 2).toDF("k")
    val out = LookupJoin.async(probe, "k", store, payload,
      batchSize = 7, maxInFlight = 3)
    // per input partition, output keys must preserve the probe order
    val ordered = out.select(spark_partition_id().as("p"), col("k"))
      .collect().groupBy(_.getInt(0))
    ordered.values.foreach { rows =>
      val ks = rows.map(_.getLong(1)).toSeq
      assert(ks == ks.sorted, "async emission must preserve probe order")
    }
    assert(out.count() == 100)
  }

  test("TableAgg.topNWithTies emits all tied rows") {
    val df = Seq(("a", 3.0), ("a", 3.0), ("a", 2.0), ("a", 1.0), ("b", 5.0))
      .toDF("g", "v")
    val out = TableAgg.topNWithTies(df, Seq("g"), "v", 2)
      .select("g", "v", "rnk").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).sorted
    // a: two rows tied at rank 1, then 2.0 at rank 3 (excluded: rank>2? no —
    // competition ranking 1,1,3 → 3 > 2 excluded). b: single rank 1.
    assert(out.sameElements(Array(("a", 3.0, 1), ("a", 3.0, 1), ("b", 5.0, 1))))
  }

  test("DataGen source: rate stream + column exprs produce typed rows") {
    // The reference's DataGeneratorSource maps to format("rate") + exprs.
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .select(col("timestamp"), col("value"),
        (col("value") % 10).as("key"),
        md5(col("value").cast("string")).as("payload"))
      .writeStream.format("memory").queryName("datagen_t")
      .outputMode("append").start()
    try {
      var waited = 0
      while (spark.table("datagen_t").isEmpty && waited < 150) {
        q.processAllAvailable(); Thread.sleep(100); waited += 1
      }
    } finally q.stop()
    val rows = spark.table("datagen_t")
    assert(rows.count() > 0)
    assert(rows.where(col("key") >= 10 || col("key") < 0).count() == 0)
  }

  test("formats: csv/json/orc round-trip the nation table losslessly") {
    val n = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val base = java.nio.file.Files.createTempDirectory("graft-fmt-").toString
    val expected = n.collect().map(_.toSeq).sortBy(_.toString)
    Seq("csv", "json", "orc").foreach { fmt =>
      val path = s"$base/$fmt"
      n.write.format(fmt).option("header", "true").save(path)
      val back = spark.read.format(fmt).option("header", "true")
        .schema(n.schema).load(path)
      assert(back.collect().map(_.toSeq).sortBy(_.toString)
        .sameElements(expected), s"$fmt round-trip mismatch")
    }
  }

  test("formats: avro round-trip via the bundled avro-mapred I/O formats") {
    val src = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val path = java.nio.file.Files.createTempDirectory("graft-avro-")
      .toString + "/c"
    graft.sources.AvroIO.write(src, path)
    val back = graft.sources.AvroIO.read(spark, path, src.schema)
    val exp = src.collect().map(_.toSeq).sortBy(_.toString)
    val got = back.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.sameElements(exp), "avro round-trip mismatch")
    // null handling: a nullable column survives
    val withNull = src.withColumn("c_name",
      when(col("c_custkey") % 2 === 0, col("c_name")))
    val p2 = path + "2"
    graft.sources.AvroIO.write(withNull, p2)
    val back2 = graft.sources.AvroIO.read(spark, p2, withNull.schema)
    assert(back2.where(col("c_name").isNull).count() ==
      withNull.where(col("c_name").isNull).count())
  }

  test("formats: NESTED avro round-trip (struct / array / map / nulls)") {
    val src = Tables.orders(spark, sf).limit(200)
      .select(
        col("o_orderkey"),
        struct(col("o_custkey"), col("o_orderstatus"),
          struct(col("o_totalprice")).as("inner")).as("hdr"),
        array(col("o_orderkey"), col("o_orderkey") + 1).as("ks"),
        map(lit("status"), col("o_orderstatus"),
          lit("prio"), col("o_orderpriority")).as("meta"),
        when(col("o_orderkey") % 3 === 0,
          struct(col("o_custkey"))).as("opt_struct"),
        when(col("o_orderkey") % 4 === 0,
          array(col("o_orderstatus"))).as("opt_arr"))
    val path = java.nio.file.Files.createTempDirectory("graft-avron-")
      .toString + "/o"
    graft.sources.AvroIO.write(src, path)
    val back = graft.sources.AvroIO.read(spark, path, src.schema)
    // canonicalize the map (hash-order differs across the round trip)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("meta", sort_array(map_entries(col("meta"))))
        .collect().map(_.toString).sorted
    val exp = canon(src)
    val got = canon(back)
    assert(got.sameElements(exp), "nested avro round-trip mismatch")
    assert(back.where(col("opt_struct").isNull).count() ==
      src.where(col("opt_struct").isNull).count())
    // nested field survives with values intact (exact sum via decimal)
    val s1 = src.agg(sum(col("hdr.inner.o_totalprice")
      .cast("decimal(25,2)"))).head().getDecimal(0)
    val s2 = back.agg(sum(col("hdr.inner.o_totalprice")
      .cast("decimal(25,2)"))).head().getDecimal(0)
    assert(s1 == s2)
  }

  test("formats: avro logical types (decimal / timestamp / date / binary)") {
    val src = Tables.orders(spark, sf).limit(100)
      .select(
        col("o_orderkey"),
        col("o_totalprice").cast("decimal(15,2)").as("dec"),
        col("o_orderdate").as("tsv"),
        to_date(col("o_orderdate")).as("dt"),
        unhex(md5(col("o_orderkey").cast("string"))).as("bin"))
    val path = java.nio.file.Files.createTempDirectory("graft-avrol-")
      .toString + "/o"
    graft.sources.AvroIO.write(src, path)
    val back = graft.sources.AvroIO.read(spark, path, src.schema)
    def extract(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDecimal(1),
        r.getAs[Any](2).toString, r.getDate(3).toString,
        java.util.Arrays.hashCode(r.getAs[Array[Byte]](4))))
        .sortBy(_._1)
    val exp = extract(src)
    val got = extract(back)
    assert(got.sameElements(exp), "avro logical-type round-trip mismatch")
  }

  test("formats: Confluent-framed avro round-trip through a file registry") {
    import graft.sources.ConfluentAvro
    val regDir = java.nio.file.Files.createTempDirectory("graft-reg-").toString
    val registry = new ConfluentAvro.FileRegistry(regDir)
    val src = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal")).limit(100)
    val framed = ConfluentAvro.encode(src, registry, "customers-value")
    // wire shape: magic 0x00 + int32 schema id + avro body
    val first = framed.select(col("framed")).head().getAs[Array[Byte]](0)
    assert(first(0) == 0x00 &&
      java.nio.ByteBuffer.wrap(first, 1, 4).getInt == 1)
    val decoded = ConfluentAvro.decode(
      framed.select(col("framed")), "framed", registry, src.schema)
    val got = decoded.select(col("decoded.*")).collect()
      .map(_.toSeq).sortBy(_.toString)
    val exp = src.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.sameElements(exp), "framed avro round-trip mismatch")
    // same subject + same schema re-registers idempotently
    assert(registry.register("customers-value",
      graft.sources.AvroIO.avroSchemaJson(src.schema)) == 1)
  }

  test("formats: framed avro malformed frames decode to null, not failure") {
    import graft.sources.ConfluentAvro
    val regDir = java.nio.file.Files.createTempDirectory("graft-reg2-").toString
    val registry = new ConfluentAvro.FileRegistry(regDir)
    val src = Tables.region(spark, sf).select(col("r_regionkey"), col("r_name"))
    val framed = ConfluentAvro.encode(src, registry, "regions-value")
      .select(col("r_regionkey"), col("framed"))
    val good = framed.head().getAs[Array[Byte]](1)
    import spark.implicits._
    val mangled = Seq(
      ("good", good),
      ("wrong-magic", { val b = good.clone(); b(0) = 1; b }),
      ("unknown-id", { val b = good.clone(); b(4) = 99; b }),
      ("truncated", good.take(7)),
      ("empty", Array.empty[Byte]),
      ("null", null)).toDF("kind", "framed")
    val out = ConfluentAvro.decode(mangled, "framed", registry, src.schema)
      .select(col("kind"), col("decoded")).collect()
      .map(r => r.getString(0) -> (r.get(1) != null)).toMap
    assert(out("good"))
    assert(!out("wrong-magic") && !out("unknown-id") && !out("truncated") &&
      !out("empty") && !out("null"))
  }

  test("formats: framed avro schema evolution via writer/reader resolution") {
    import graft.sources.ConfluentAvro
    import org.apache.spark.sql.types._
    val regDir = java.nio.file.Files.createTempDirectory("graft-reg3-").toString
    val registry = new ConfluentAvro.FileRegistry(regDir)
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val framed = ConfluentAvro.encode(src, registry, "nations-value")
    // reader requests a PROJECTION of the writer schema (column dropped)
    val readerSchema = StructType(Seq(
      StructField("n_nationkey", src.schema("n_nationkey").dataType),
      StructField("n_name", StringType)))
    val got = ConfluentAvro.decode(
      framed.select(col("framed")), "framed", registry, readerSchema)
      .select(col("decoded.*")).collect()
      .map(r => (r.get(0).toString, r.getString(1))).sorted
    val exp = src.collect()
      .map(r => (r.get(0).toString, r.getString(1))).sorted
    assert(got.sameElements(exp), "projected decode mismatch")
  }

  test("script transform: TRANSFORM ... USING an external command") {
    Tables.nation(spark, sf).createOrReplaceTempView("nation_v")
    val out = spark.sql("""
      SELECT TRANSFORM(n_nationkey, n_name) USING 'cat' AS (k STRING, v STRING)
      FROM nation_v
    """).collect().map(r => (r.getString(0), r.getString(1)))
    val exp = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("string"), col("n_name"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.sorted.sameElements(exp.sorted))
  }

  test("sink abilities: truncate (overwrite) and dynamic partition overwrite") {
    val base = java.nio.file.Files.createTempDirectory("graft-sink-").toString
    val r = Tables.region(spark, sf)
    // truncate-and-write
    r.write.mode("overwrite").parquet(s"$base/t")
    r.write.mode("overwrite").parquet(s"$base/t")
    assert(spark.read.parquet(s"$base/t").count() == r.count())
    // partitioned write + dynamic partition overwrite of ONE partition
    val n = Tables.nation(spark, sf)
    n.write.partitionBy("n_regionkey").mode("overwrite").parquet(s"$base/p")
    val before = spark.read.parquet(s"$base/p").count()
    val one = n.where(col("n_regionkey") === 0)
      .withColumn("n_name", upper(col("n_name")))
    one.write.partitionBy("n_regionkey").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(s"$base/p")
    val after = spark.read.parquet(s"$base/p")
    assert(after.count() == before) // only partition 0 replaced
    assert(after.where(col("n_regionkey") === 0)
      .select(min(col("n_name") === upper(col("n_name")))).head().getBoolean(0))
  }

  test("avro DataSource reads FOREIGN files with enum and fixed fields") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // a file graft's own writer never produces: enum + fixed fields
    val schema: Schema = SchemaBuilder.record("foreign").fields()
      .requiredLong("id")
      .name("color").`type`(SchemaBuilder.enumeration("Color")
        .symbols("RED", "GREEN", "BLUE")).noDefault()
      .name("tag").`type`(SchemaBuilder.fixed("Tag").size(4)).noDefault()
      .endRecord()
    val dir = java.nio.file.Files.createTempDirectory("graft-avrof-")
    val f = new java.io.File(dir.toFile, "foreign.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    def rec(id: Long, color: String, tag: Array[Byte]): GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("id", id)
      r.put("color",
        new GenericData.EnumSymbol(schema.getField("color").schema(), color))
      r.put("tag",
        new GenericData.Fixed(schema.getField("tag").schema(), tag))
      r
    }
    w.append(rec(1L, "GREEN", Array[Byte](1, 2, 3, 4)))
    w.append(rec(2L, "RED", Array[Byte](9, 8, 7, 6)))
    w.close()
    val back = spark.read.format("avro").load(f.toString)
    assert(back.schema("color").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(back.schema("tag").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val rows = back.orderBy("id").collect()
    assert(rows(0).getString(1) == "GREEN" && rows(1).getString(1) == "RED")
    assert(rows(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("avro DataSource: format(\"avro\") infers schema, appends, DDL reads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-avrods-")
    val path = s"$dir/t"
    val src = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    src.write.format("avro").save(path)
    // schema inferred from the container files' embedded writer schema
    val back = spark.read.format("avro").load(path)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "v"))
    assert(back.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, "a", 1.5), Seq(2L, "b", 2.5)))
    // append moves new container files in beside the old ones
    Seq((3L, "c", 3.5)).toDF("id", "name", "v")
      .write.format("avro").mode("append").save(path)
    assert(spark.read.format("avro").load(path).count() == 3)
    // overwrite replaces; errorifexists refuses
    Seq((9L, "z", 9.0)).toDF("id", "name", "v")
      .write.format("avro").mode("overwrite").save(path)
    assert(spark.read.format("avro").load(path).count() == 1)
    intercept[Exception] {
      src.write.format("avro").save(path)
    }
    // DDL face: CREATE TABLE … WITH ('format'='avro') + INSERT + SELECT
    val got = graft.sql.FlinkDdl.run(spark,
      s"""CREATE TABLE av (id BIGINT, name STRING, v DOUBLE) WITH (
         |  'connector'='filesystem', 'path'='$dir/ddl', 'format'='avro');
         |INSERT INTO av SELECT * FROM
         |  (VALUES (10, 'x', 0.5), (11, 'y', 1.0)) AS t(id, name, v);
         |SELECT id, name FROM av ORDER BY id""".stripMargin)
    assert(got.collect().map(_.toSeq).toSeq ==
      Seq(Seq(10L, "x"), Seq(11L, "y")))
  }
}
