package graft

import graft.table.{Session => TSession, Slide, Table, TableEnvironment, Tumble}
import graft.table.api._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, sum, timestamp_micros}

/** The Table API facade: every fluent operation must build exactly the
  * plan the DataFrame DSL builds (value parity asserted; the facade is
  * a name-for-name mapping of Table.java onto Dataset operations). */
class TableApiSpec extends SparkSpecBase {

  private lazy val env = {
    val e = TableEnvironment.create(spark)
    e.createTemporaryView("orders", Tables.orders(spark, sf))
    e.createTemporaryView("customer", Tables.customer(spark, sf))
    e.createTemporaryView("events", Tables.events(spark, sf))
    e
  }

  private def assertSame(t: Table, d: DataFrame): Unit = {
    val a = t.toDataFrame.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = d.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.length == b.length, s"${a.length} vs ${b.length} rows")
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
  }

  test("select / filter / orderBy / fetch map onto the DataFrame plan") {
    val t = env.from("orders")
      .filter($("o_totalprice").isGreater(lit(100000.0)))
      .select($("o_orderkey"), $("o_totalprice").times(lit(2)).as("dbl"))
      .orderBy($("o_orderkey").asc)
      .fetch(50)
    val d = Tables.orders(spark, sf)
      .where(col("o_totalprice") > 100000.0)
      .select(col("o_orderkey"), (col("o_totalprice") * 2).as("dbl"))
      .orderBy(col("o_orderkey").asc)
      .limit(50)
    assertSame(t, d)
    assert(t.toDataFrame.count() > 0)
  }

  test("groupBy().select aggregates in declaration order") {
    val t = env.from("orders")
      .groupBy($("o_orderpriority"))
      .select($("o_orderpriority"), $("o_totalprice").sum.as("total"),
        $("o_orderkey").count.as("n"))
    val d = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("o_totalprice")).as("total"),
        count(col("o_orderkey")).as("n"))
      .select("o_orderpriority", "total", "n")
    assertSame(t, d)
    // aggregate-first order also resolves
    val t2 = env.from("orders").groupBy($("o_orderpriority"))
      .select($("o_totalprice").sum.as("total"), $("o_orderpriority"))
    assert(t2.toDataFrame.columns.toSeq ==
      Seq("total", "o_orderpriority"))
  }

  test("joins require disjoint field names, as the reference does") {
    val orders = env.from("orders")
      .select($("o_orderkey"), $("o_custkey"), $("o_totalprice"))
    val cust = env.from("customer")
      .select($("c_custkey"), $("c_name"))
    val t = orders.join(cust, $("o_custkey").isEqual($("c_custkey")))
    val d = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .join(Tables.customer(spark, sf).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
    assertSame(t, d)
    val e = intercept[IllegalArgumentException](orders.join(
      orders, $("o_custkey").isEqual($("o_custkey"))))
    assert(e.getMessage.contains("share field names"))
    // left outer keeps unmatched left rows
    val lo = orders.leftOuterJoin(
      cust.filter($("c_custkey").mod(lit(2)).isEqual(lit(0))),
      $("o_custkey").isEqual($("c_custkey")))
    assert(lo.toDataFrame.where(col("c_name").isNull).count() > 0)
  }

  test("set ops / distinct / rename / add / drop columns") {
    val a = env.from("orders").select($("o_orderpriority"))
    val b = env.from("orders").select($("o_orderpriority")).fetch(0)
    assertSame(a.unionAll(a).minusAll(a),
      Tables.orders(spark, sf).select("o_orderpriority"))
    assertSame(a.union(b),
      Tables.orders(spark, sf).select("o_orderpriority").distinct())
    assertSame(a.intersect(a), a.distinct().toDataFrame)
    val renamed = env.from("orders")
      .select($("o_orderkey"), $("o_totalprice"))
      .renameColumns("o_totalprice" -> "price")
      .addColumns($("price").plus(lit(1.0)).as("p1"))
      .dropColumns("price")
    assert(renamed.toDataFrame.columns.toSeq == Seq("o_orderkey", "p1"))
  }

  test("Tumble / Slide / Session group windows match native window()") {
    val ev = Tables.events(spark, sf)
    val t = env.from("events")
      .window(Tumble.over("10 minutes").on($("ts")).as("w"))
      .groupBy($("w"), $("event_type"))
      .select($("event_type"), $("w_start"), $("w_end"),
        $("value").sum.as("sv"))
    val d = ev.groupBy(
      org.apache.spark.sql.functions.window(col("ts"), "10 minutes"),
      col("event_type"))
      .agg(sum(col("value")).as("sv"))
      .select(col("event_type"), col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("sv"))
    assertSame(t, d)

    val s = env.from("events")
      .window(Slide.over("10 minutes").every("5 minutes")
        .on($("ts")).as("w"))
      .groupBy($("w"))
      .select($("w_start"), $("value").count.as("n"))
    val sd = ev.groupBy(
      org.apache.spark.sql.functions.window(col("ts"), "10 minutes",
        "5 minutes"))
      .agg(count(col("value")).as("n"))
      .select(col("window.start").as("w_start"), col("n"))
    assertSame(s, sd)

    val g = env.from("events")
      .window(TSession.withGap("30 minutes").on($("ts")).as("w"))
      .groupBy($("w"), $("user_id"))
      .select($("user_id"), $("w_start"), $("value").count.as("n"))
    val gd = ev.groupBy(
      org.apache.spark.sql.functions.session_window(col("ts"),
        "30 minutes"),
      col("user_id"))
      .agg(count(col("value")).as("n"))
      .select(col("user_id"), col("session_window.start").as("w_start"),
        col("n"))
    assertSame(g, gd)
  }

  test("Over windows: unbounded range, rows interval, marked aggs only") {
    import graft.table.{Over, UNBOUNDED_RANGE}
    import org.apache.spark.sql.expressions.Window
    val t = env.from("events")
      .window(Over.partitionBy($("user_id")).orderBy($("ts_us"))
        .preceding(UNBOUNDED_RANGE).as("w"))
      .select($("user_id"), $("ts_us"),
        $("value").sum.over($("w")).as("running"),
        $("value").count.over($("w")).as("cnt"))
    val spec = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val d = Tables.events(spark, sf).select(
      col("user_id"), col("ts_us"),
      sum(col("value")).over(spec).as("running"),
      count(col("value")).over(spec).as("cnt"))
    assertSame(t, d)

    val tr = env.from("events")
      .window(Over.partitionBy($("user_id")).orderBy($("ts_us"))
        .preceding(rowInterval(2)).as("w"))
      .select($("user_id"), $("value").avg.over($("w")).as("ma3"))
    val rspec = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rowsBetween(-2, Window.currentRow)
    val rd = Tables.events(spark, sf).select(col("user_id"),
      org.apache.spark.sql.functions.avg(col("value"))
        .over(rspec).as("ma3"))
    assertSame(tr, rd)
  }

  test("unpartitioned over-window warns by default and throws under strict") {
    import graft.table.{Over, UNBOUNDED_RANGE}
    // default: accepted (Spark's own unpartitioned-OVER semantics), the
    // single-task consequence is logged loudly
    val lax = env.from("events")
      .window(Over.orderBy($("ts_us")).preceding(UNBOUNDED_RANGE).as("w"))
      .select($("value").sum.over($("w")).as("running"))
      .toDataFrame
    assert(lax.columns.toSeq == Seq("running"))
    // strict session: refuses with the single-task explanation
    spark.conf.set("spark.graft.strictUnpartitionedOver", "true")
    try {
      val e = intercept[IllegalArgumentException] {
        env.from("events")
          .window(Over.orderBy($("ts_us")).preceding(UNBOUNDED_RANGE).as("w"))
          .select($("value").sum.over($("w")).as("running"))
      }
      assert(e.getMessage.contains("SINGLE task"), e.getMessage)
    } finally spark.conf.unset("spark.graft.strictUnpartitionedOver")
  }

  test("over(...) validates the window alias; grouped select rejects " +
      "aggregates aliased to key names") {
    import graft.table.{Over, UNBOUNDED_RANGE}
    // ADVICE r10: a wrong/undeclared over-window alias must throw, not
    // silently use the select's single window
    val e1 = intercept[IllegalArgumentException] {
      env.from("events")
        .window(Over.partitionBy($("user_id")).orderBy($("ts_us"))
          .preceding(UNBOUNDED_RANGE).as("w"))
        .select($("user_id"), $("value").sum.over($("typo")).as("s"))
        .toDataFrame
    }
    assert(e1.getMessage.contains("typo"))
    // ADVICE r10: sum(...).as(keyName) with groupBy(key) must throw,
    // not be silently treated as a key passthrough
    val e2 = intercept[IllegalArgumentException] {
      env.from("orders").groupBy($("o_orderpriority"))
        .select($("o_totalprice").sum.as("o_orderpriority"),
          $("o_totalprice").avg.as("a"))
        .toDataFrame
    }
    assert(e2.getMessage.contains("o_orderpriority"))
    // ... and the aggregate mark survives derived expressions (review
    // r11: sum.plus(1) is still an aggregate)
    val e2b = intercept[IllegalArgumentException] {
      env.from("orders").groupBy($("o_orderpriority"))
        .select($("o_totalprice").sum.plus(lit(1.0)).as("o_orderpriority"),
          $("o_totalprice").avg.as("a"))
        .toDataFrame
    }
    assert(e2b.getMessage.contains("o_orderpriority"))
  }

  test("joinLateral / map / flatMap / aggregate / flatAggregate") {
    import org.apache.spark.sql.functions.{split => fsplit, struct}
    // joinLateral: UDTF correlate — split each priority into words
    val lat = env.from("orders")
      .select($("o_orderkey"), $("o_orderpriority"))
      .joinLateral(call("split", $("o_orderpriority"), lit("-")).as("part"))
    val d = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        org.apache.spark.sql.functions.explode(
          fsplit(col("o_orderpriority"), "-")).as("part"))
    assertSame(lat, d)

    // map: scalar-function row output (struct fields become columns)
    val mapped = env.from("orders")
      .map(row($("o_orderkey").as("k"),
        $("o_totalprice").times(lit(2)).as("dbl")))
    val md = Tables.orders(spark, sf).select(
      col("o_orderkey").as("k"), (col("o_totalprice") * 2).as("dbl"))
    assertSame(mapped, md)

    // flatMap: table-function rows (array of structs explode + expand)
    val fm = env.from("orders").flatMap(array(
      row($("o_orderkey").as("k")),
      row(lit(0L).minus($("o_orderkey")).as("k"))))
    assert(fm.toDataFrame.count() ==
      2 * Tables.orders(spark, sf).count())

    // aggregate: one ROW per group, fields flattened next to the keys
    val agg = env.from("orders").groupBy($("o_orderpriority"))
      .aggregate(row($("o_orderkey").count.as("n"),
        $("o_totalprice").sum.as("total")))
    val ad = Tables.orders(spark, sf).groupBy(col("o_orderpriority"))
      .agg(count(col("o_orderkey")).as("n"),
        sum(col("o_totalprice")).as("total"))
    assertSame(agg, ad)

    // flatAggregate: top-2 prices per priority (array-of-struct agg —
    // the Table API spelling of the Top2 table aggregate)
    val top2 = call("slice",
      call("sort_array",
        call("collect_list", row($("o_totalprice").as("price"))),
        lit(false)),
      lit(1), lit(2))
    val fa = env.from("orders").groupBy($("o_orderpriority"))
      .flatAggregate(top2)
    val fd = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(org.apache.spark.sql.functions.slice(
        org.apache.spark.sql.functions.sort_array(
          org.apache.spark.sql.functions.collect_list(
            struct(col("o_totalprice").as("price"))), asc = false),
        1, 2).as("t2"))
      .select(col("o_orderpriority"),
        org.apache.spark.sql.functions.explode(col("t2")).as("r"))
      .select(col("o_orderpriority"), col("r.price").as("price"))
    assertSame(fa, fd)
  }

  test("executeSql runs DDL scripts; DataStream bridges round-trip") {
    // executeSql: a DDL + query script over the env's temporary views
    val res = env.executeSql(
      """CREATE VIEW big AS
        |  SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |  WHERE o_totalprice > 100000 GROUP BY o_orderpriority;
        |SELECT * FROM big ORDER BY o_orderpriority""".stripMargin)
    assert(res.collect().nonEmpty)
    // DDL-only scripts return the OK marker, as the reference
    assert(env.executeSql("CREATE CATALOG c1 WITH ('k' = 'v')")
      .collect().head.getString(0) == "OK")
    // fromDataStream / toDataStream bridge the typed facade
    val senv = graft.stream.StreamExecutionEnvironment.create(spark)
    import spark.implicits._
    val ds = senv.fromElements((1L, 2.0), (2L, 3.0))
    val t = env.fromDataStream(ds)
      .filter($("_2").isGreater(lit(2.0)))
    assert(env.toDataStream(t).executeAndCollect()
      .map(r => (r.getLong(0), r.getDouble(1))) == Seq((2L, 3.0)))
  }

  test("sqlQuery runs the Flink dialect over registered views") {
    val t = env.sqlQuery(
      """SELECT window_start, COUNT(*) AS n
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts_ns),
        |                  INTERVAL '10' MINUTE))
        |GROUP BY window_start""".stripMargin)
    assert(t.execute().collect().nonEmpty)
  }

  test("Tumble group window runs streaming with batch parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select(col("ts_us"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect().toSeq
    def viaFacade(df: org.apache.spark.sql.DataFrame) =
      TableEnvironment.create(spark).fromDataFrame(df)
        .window(Tumble.over("10 minutes").on($("ts")).as("w"))
        .groupBy($("w"), $("event_type"))
        .select($("event_type"), $("w_start"), $("value").count.as("n"))
        .toDataFrame
    val batch = viaFacade(rows.toDF("ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))))
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, String, Double)]
    val sdf = input.toDF().toDF("ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 second")
    val out = viaFacade(sdf)
    assert(out.isStreaming)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-taw-").toString
    val q = out.writeStream.format("memory").queryName("ta_win")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val ordered = rows.sortBy(_._1)
      val (a, b) = ordered.splitAt(ordered.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
    } finally q.stop()
    // append mode emits a window only once its watermark passes: the
    // streamed set is the batch set minus the tail windows still open
    val streamed = spark.table("ta_win").collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed.subsetOf(batch),
      s"streamed ${streamed.size} must be ⊆ batch ${batch.size}")
  }

  test("a streaming input stays streaming through the facade") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val sdf = input.toDF().toDF("k", "v")
    val t = TableEnvironment.create(spark).fromDataFrame(sdf)
      .filter($("v").isGreater(lit(1.0)))
      .select($("k"), $("v").times(lit(10)).as("v10"))
    assert(t.toDataFrame.isStreaming)
  }
}
