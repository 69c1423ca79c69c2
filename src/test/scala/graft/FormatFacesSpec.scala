package graft

import org.apache.spark.sql.functions._

/** The two minor format faces the coverage audit listed as unproven
  * (VERDICT r16 "what's missing" #4): `flink-formats/flink-compress`
  * (CompressWriterFactory.java — hadoop-codec compressed bulk text
  * writing) and `flink-formats/flink-sequence-file`
  * (SequenceFileWriterFactory.java — hadoop SequenceFile<K,V> sink).
  * Spark covers both natively — the compression codec option on the text
  * writer (same hadoop codecs) and the hadoop-RDD SequenceFile API — so
  * the face is inherited, not rebuilt; these tests prove the round trips
  * the reference's writers exist for.
  */
class FormatFacesSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_format_faces").toString

  test("compressed text round trip (flink-compress face): gzip + deflate " +
      "codecs, transparent read-back") {
    val docs = Tables.documents(spark, sf)
      .select(regexp_replace(col("text"), "[\\r\\n]", " ").as("value"))
    val expected = docs.collect().map(_.getString(0)).sorted.toSeq
    for (codec <- Seq("gzip", "deflate")) {
      val dir = s"${tmp()}/$codec"
      docs.write.option("compression", codec).text(dir)
      val ext = if (codec == "gzip") ".gz" else ".deflate"
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-"))
      assert(files.nonEmpty && files.forall(_.getName.endsWith(ext)),
        s"$codec: expected $ext part files, got " +
          files.map(_.getName).mkString(", "))
      // decompression is codec-transparent on read, as with the
      // reference's hadoop codec discovery
      val back = spark.read.text(dir).collect().map(_.getString(0)).sorted
      assert(back.toSeq == expected, s"$codec round trip diverged")
    }
  }

  test("SequenceFile round trip (flink-sequence-file face): K=LongWritable " +
      "V=Text via the hadoop RDD API") {
    import org.apache.hadoop.io.{LongWritable, Text}
    val dir = s"${tmp()}/seq"
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    spark.sparkContext.parallelize(docs, 2)
      .saveAsSequenceFile(dir)
    // the hadoop SequenceFile header is present in each part
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val head = java.nio.file.Files.readAllBytes(part.toPath).take(3)
    assert(head.sameElements("SEQ".getBytes), "not a hadoop SequenceFile")
    val back = spark.sparkContext
      .sequenceFile(dir, classOf[LongWritable], classOf[Text])
      .map { case (k, v) => (k.get(), v.toString) }
      .collect().toSeq
    assert(back.sorted == docs.sorted, "SequenceFile round trip diverged")
  }
}
