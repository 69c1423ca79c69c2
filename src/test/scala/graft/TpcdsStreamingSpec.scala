package graft

import graft.queries.TpcdsSqlQueries
import graft.sql.{FlinkDdl, FlinkSql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming face for the OFFICIAL TPC-DS texts (VERDICT r17 task 4): the
  * reference runs one planner for batch and streaming — a TPC-DS aggregate
  * submitted as a streaming INSERT plans as an UPDATING query and
  * materializes through the upsert sink. Here five official texts whose
  * shape is streamable (single-block aggregates: q3, q7, q42, q52, q55 —
  * `src/main/resources/tpcds/q*.sql`, trailing ORDER BY/LIMIT stripped,
  * sort is presentation-only and streaming-final-state is unordered) run
  * through [[FlinkDdl.runStreaming]] with the fact table arriving as a file
  * stream in TWO batches and every dimension static — and the materialized
  * final state must equal the batch run of the same text. This proves the
  * changelog-mode inference (`isAppendCapable` →
  * `FlinkChangelogModeInferenceProgram` parity) on real-world SQL, not toy
  * scripts.
  */
class TpcdsStreamingSpec extends SparkSpecBase {

  private def ddlType(dt: DataType): String = dt match {
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case StringType => "STRING"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => fail(s"unmapped sink type $other")
  }

  private def stripped(n: Int): String = {
    val t = TpcdsSqlQueries.officialText(n).trim.stripSuffix(";").trim
    val i = t.toLowerCase.lastIndexOf("order by")
    assert(i > 0, s"q$n: expected a trailing ORDER BY")
    val s = t.substring(0, i).trim
    assert(!s.toLowerCase.contains("order by") &&
      s.toLowerCase.contains("group by"))
    s
  }

  // query number -> PK arity (the leading grouping columns of the select
  // list — the upsert key the reference's sink would declare)
  private val cases = Seq(3 -> 3, 7 -> 1, 42 -> 3, 52 -> 3, 55 -> 2)

  test("official q7 streams BYTE-IDENTICAL (ORDER BY + LIMIT intact) via " +
      "inferred complete mode; final state == batch") {
    // With complete-mode inference the text needs no stripping at all:
    // sort+limit over a streaming aggregate is exactly the
    // whole-result-revision tier, so the official text runs through the
    // streaming runner as-is. q7 has 156 groups at sf0.03, so its
    // LIMIT 100 BINDS, and its ORDER BY key (i_item_id) is unique, so
    // the retained-100 set is deterministic.
    val dataDir = TpcdsSqlQueries.dataDir
    assume(new java.io.File(dataDir).isDirectory)
    val text = TpcdsSqlQueries.officialText(7).trim.stripSuffix(";").trim
    assert(text.toLowerCase.contains("order by") &&
      text.toLowerCase.contains("limit"))
    val batchTables: Map[String, DataFrame] =
      TpcdsSqlQueries.tableNames
        .map(t => t -> Tables(spark, dataDir, t)).toMap
    val batch = FlinkSql.sql(spark, text, batchTables)
    val schema = batch.schema
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tpcds_stream_q7_full").toString
    val ss = Tables(spark, dataDir, "store_sales")
    val (h1, h2) = (
      ss.where(pmod(col("ss_ticket_number"), lit(2)) === 0),
      ss.where(pmod(col("ss_ticket_number"), lit(2)) === 1))
    h1.write.mode("append").parquet(s"$dir/src")
    val ssStream = spark.readStream.schema(ss.schema).parquet(s"$dir/src")
    val sinkCols = schema.fields.zipWithIndex
      .map { case (f, i) => s"c${i + 1} ${ddlType(f.dataType)}" }
      .mkString(", ")
    // complete mode: no PRIMARY KEY required — a displaced rank-101 row
    // belongs to ANOTHER key, which upserts cannot retract
    val qs = FlinkDdl.runStreaming(spark,
      s"""CREATE TABLE snk ($sinkCols)
         |  WITH ('connector'='filesystem', 'path'='$dir/snk',
         |        'format'='parquet', 'sink.checkpoint-dir'='$dir/ck');
         |INSERT INTO snk
         |$text""".stripMargin,
      extra = batchTables - "store_sales" + ("store_sales" -> ssStream))
    try {
      qs.head.processAllAvailable()
      assert(graft.changelog.UpsertSink.readTable(spark, s"$dir/snk").count() > 0)
      h2.write.mode("append").parquet(s"$dir/src")
      qs.head.processAllAvailable()
      val finalState = graft.changelog.UpsertSink.readTable(spark, s"$dir/snk").collect().toSet
      val expected = batch
        .toDF((1 to schema.length).map(i => s"c$i"): _*)
        .collect().toSet
      assert(expected.size == 100, s"q7's LIMIT must bind: ${expected.size}")
      assert(finalState == expected,
        s"q7 full-text: streaming final state diverges from batch " +
          s"(${finalState.size} vs ${expected.size} rows)")
    } finally qs.foreach(_.stop())
  }

  for ((n, pkArity) <- cases)
    test(s"official q$n streams via inferred upsert; final state == batch") {
      val dataDir = TpcdsSqlQueries.dataDir
      assume(new java.io.File(dataDir).isDirectory)
      val text = stripped(n)
      val batchTables: Map[String, DataFrame] =
        TpcdsSqlQueries.tableNames
          .map(t => t -> Tables(spark, dataDir, t)).toMap
      val batch = FlinkSql.sql(spark, text, batchTables)
      val schema = batch.schema
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_tpcds_stream_q$n").toString

      // fact stream: store_sales arrives as two file batches
      val ss = Tables(spark, dataDir, "store_sales")
      val (h1, h2) = (
        ss.where(pmod(col("ss_ticket_number"), lit(2)) === 0),
        ss.where(pmod(col("ss_ticket_number"), lit(2)) === 1))
      h1.write.mode("append").parquet(s"$dir/src")
      val ssStream = spark.readStream.schema(ss.schema).parquet(s"$dir/src")

      val sinkCols = schema.fields.zipWithIndex
        .map { case (f, i) => s"c${i + 1} ${ddlType(f.dataType)}" }
        .mkString(", ")
      val pk = (1 to pkArity).map(i => s"c$i").mkString(", ")
      val qs = FlinkDdl.runStreaming(spark,
        s"""CREATE TABLE snk ($sinkCols, PRIMARY KEY ($pk) NOT ENFORCED)
           |  WITH ('connector'='filesystem', 'path'='$dir/snk',
           |        'format'='parquet', 'sink.checkpoint-dir'='$dir/ck');
           |INSERT INTO snk
           |$text""".stripMargin,
        extra = batchTables - "store_sales" + ("store_sales" -> ssStream))
      try {
        qs.head.processAllAvailable()
        val afterFirst = graft.changelog.UpsertSink.readTable(spark, s"$dir/snk")
        assert(afterFirst.columns.toSeq ==
          (1 to schema.length).map(i => s"c$i"))
        h2.write.mode("append").parquet(s"$dir/src")
        qs.head.processAllAvailable()
        val finalState = graft.changelog.UpsertSink.readTable(spark, s"$dir/snk").collect().toSet
        // batch run of the identical text, renamed to the sink's positional
        // columns (the declared types came FROM the batch schema, so the
        // sink-side cast was the identity)
        val expected = batch
          .toDF((1 to schema.length).map(i => s"c$i"): _*)
          .collect().toSet
        assert(expected.nonEmpty, s"q$n must be non-vacuous at sf0.03")
        assert(finalState == expected,
          s"q$n: streaming final state diverges from batch " +
            s"(${finalState.size} vs ${expected.size} rows)")
      } finally qs.foreach(_.stop())
    }
}
