package graft

import graft.functions.{BitmapFunctions, JsonAggFunctions, StringGapFunctions => SG}
import org.apache.spark.sql.functions._

class FunctionSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("splitIndex: 0-based, literal separator, null OOB") {
    val df = Seq(("a.b.c", "."), ("x|y", "|"), ("solo", ".")).toDF("s", "sep")
    val out = df.select(
      SG.splitIndex($"s", $"sep", lit(0)),
      SG.splitIndex($"s", $"sep", lit(1)),
      SG.splitIndex($"s", $"sep", lit(5)))
      .collect().map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
    assert(out(0) == (("a", Some("b"), None)))
    assert(out(1) == (("x", Some("y"), None)))
    assert(out(2) == (("solo", None, None)))
  }

  test("inetAton/inetNtoa roundtrip and edge values") {
    val df = Seq(0L, 1L, 255L, 4294967295L, 2130706433L).toDF("n")
    val rt = df.select(SG.inetAton(SG.inetNtoa($"n")).as("rt"))
      .as[Long].collect().toSeq
    assert(rt == Seq(0L, 1L, 255L, 4294967295L, 2130706433L))
    val bad = Seq("1.2.3", "1.2.3.999", "a.b.c.d", "1.2.3.4.5").toDF("ip")
    // composed form: malformed octets / wrong arity → null
    assert(bad.select(SG.inetAton($"ip")).collect().forall(_.isNullAt(0)))
  }

  test("jsonQuote escapes per JSON spec; unquote roundtrips") {
    val df = Seq("plain", "with \"quote\"", "tab\there", "back\\slash", "nl\nend")
      .toDF("s")
    val out = df.select($"s", SG.jsonQuote($"s").as("q"),
      SG.jsonUnquote(SG.jsonQuote($"s")).as("rt")).collect()
    out.foreach { r =>
      val q = r.getString(1)
      assert(q.startsWith("\"") && q.endsWith("\""))
      assert(r.getString(2) == r.getString(0), s"roundtrip failed for ${r.getString(0)}")
    }
    assert(out(1).getString(1) == "\"with \\\"quote\\\"\"")
    assert(out(2).getString(1) == "\"tab\\there\"")
  }

  test("bitmap agg + scalar ops against set semantics") {
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Seq((1, 1L), (1, 2L), (1, 2L), (1, 100000L), (2, 2L), (2, 3L))
      .toDF("g", "v")
    df.createOrReplaceTempView("bm_in")
    val row = spark.sql("""
      WITH b AS (SELECT g, bitmap_agg(v) AS bm FROM bm_in GROUP BY g)
      SELECT bitmap_cardinality(b1.bm) AS c1,
             bitmap_cardinality(b2.bm) AS c2,
             bitmap_cardinality(bitmap_and(b1.bm, b2.bm)) AS cand,
             bitmap_cardinality(bitmap_or(b1.bm, b2.bm)) AS cor,
             bitmap_cardinality(bitmap_andnot(b1.bm, b2.bm)) AS cnot,
             bitmap_contains(b1.bm, 100000L) AS has,
             bitmap_to_array(b2.bm) AS arr
      FROM (SELECT bm FROM b WHERE g=1) b1, (SELECT bm FROM b WHERE g=2) b2
    """).head()
    assert(row.getLong(0) == 3 && row.getLong(1) == 2)
    assert(row.getLong(2) == 1 && row.getLong(3) == 4 && row.getLong(4) == 2)
    assert(row.getBoolean(5))
    assert(row.getSeq[Long](6).toSet == Set(2L, 3L))
  }

  test("bitmap_or_agg / bitmap_and_agg merge pre-built bitmaps") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq((1, 1L), (1, 2L), (2, 2L), (2, 3L), (3, 2L), (3, 9L))
      .toDF("g", "v").createOrReplaceTempView("bm_in2")
    val row = spark.sql("""
      WITH b AS (SELECT g, bitmap_agg(v) AS bm FROM bm_in2 GROUP BY g)
      SELECT bitmap_cardinality(bitmap_or_agg(bm)) AS cor,
             bitmap_cardinality(bitmap_and_agg(bm)) AS cand
      FROM b
    """).head()
    assert(row.getLong(0) == 4) // {1,2,3,9}
    assert(row.getLong(1) == 1) // {2}
  }

  test("json_objectagg / json_arrayagg deterministic sorted output") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq(("b", "2"), ("a", "1"), ("c", null.asInstanceOf[String]))
      .toDF("k", "v").createOrReplaceTempView("ja_in")
    val obj = spark.sql("SELECT json_objectagg(k, v) FROM ja_in").head().getString(0)
    assert(obj == """{"a":"1","b":"2","c":null}""")
    val arr = spark.sql("SELECT json_arrayagg(k) FROM ja_in").head().getString(0)
    assert(arr == """["a","b","c"]""")
  }

  test("CONVERT_TZ maps to convert_timezone (DST-aware, JVM tzdata)") {
    // spec-gated rather than DuckDB-oracled: the offline DuckDB build has
    // no ICU timezone support. Winter = UTC-5, summer = UTC-4.
    val r = spark.sql("""
      SELECT
        convert_timezone('UTC', 'America/New_York',
          TIMESTAMP_NTZ '2024-01-15 12:00:00') AS winter,
        convert_timezone('UTC', 'America/New_York',
          TIMESTAMP_NTZ '2024-07-15 12:00:00') AS summer
    """).head()
    assert(r.getAs[java.time.LocalDateTime](0).getHour == 7)
    assert(r.getAs[java.time.LocalDateTime](1).getHour == 8)
  }

  test("mapUnion: later maps override, null in null out") {
    import graft.functions.{CollectionGapFunctions => CG}
    val df = Seq(1).toDF("i").select(
      CG.mapUnion(
        map(lit("a"), lit(1), lit("b"), lit(2)),
        map(lit("b"), lit(20), lit("c"), lit(30)),
        map(lit("c"), lit(300))).as("m"),
      CG.mapUnion(map(lit("a"), lit(1)),
        lit(null).cast("map<string,int>")).as("n"))
    val r = df.collect().head
    assert(r.getAs[Map[String, Int]]("m") ==
      Map("a" -> 1, "b" -> 20, "c" -> 300))
    assert(r.isNullAt(1), "MAP_UNION with a NULL argument is NULL")
  }

  test("arraySlice: negative indices, open end, empty intersection") {
    import graft.functions.{CollectionGapFunctions => CG}
    val df = Seq(Seq(10L, 20L, 30L, 40L, 50L)).toDF("a")
    val out = df.select(
      CG.arraySlice($"a", lit(2), lit(4)).as("mid"),
      CG.arraySlice($"a", lit(-2)).as("tail2"),
      CG.arraySlice($"a", lit(1), lit(-3)).as("headToNeg"),
      CG.arraySlice($"a", lit(4), lit(2)).as("empty"),
      CG.arraySlice($"a", lit(-99), lit(99)).as("clamped")).collect().head
    assert(out.getAs[scala.collection.Seq[Long]]("mid") == Seq(20L, 30L, 40L))
    assert(out.getAs[scala.collection.Seq[Long]]("tail2") == Seq(40L, 50L))
    assert(out.getAs[scala.collection.Seq[Long]]("headToNeg") == Seq(10L, 20L, 30L))
    assert(out.getAs[scala.collection.Seq[Long]]("empty").isEmpty)
    assert(out.getAs[scala.collection.Seq[Long]]("clamped") == Seq(10L, 20L, 30L, 40L, 50L))
  }

  test("randInteger: bounded, and seeded form is reproducible") {
    import graft.functions.{CollectionGapFunctions => CG}
    val df = TestSpark.spark.range(1000).toDF("i")
    val vals = df.select(CG.randInteger(lit(7)).as("r"))
      .as[Int].collect()
    assert(vals.forall(v => v >= 0 && v < 7))
    assert(vals.distinct.length > 1, "must actually vary")
    val a = df.select(CG.randInteger(42L, lit(100)).as("r")).as[Int].collect()
    val b = df.select(CG.randInteger(42L, lit(100)).as("r")).as[Int].collect()
    assert(a.toSeq == b.toSeq, "seeded rand_integer must be reproducible")
  }

  test("json_string SQL wrapper and jsonString on nested types") {
    import graft.functions.{CollectionGapFunctions => CG}
    graft.functions.GraftFunctions.registerAll(TestSpark.spark)
    val df = Seq(("x\"y", 3)).toDF("s", "n")
    val r = df.select(
      CG.jsonString($"s").as("js"),
      CG.jsonString($"n").as("jn"),
      CG.jsonString(array(lit(1), lit(2))).as("ja"),
      CG.jsonString(struct(lit(1).as("a"))).as("jo"),
      CG.jsonString(lit(null).cast("string")).as("jnull"),
      expr("json_string('plain')").as("sqljs")).collect().head
    assert(r.getString(0) == "\"x\\\"y\"")
    assert(r.getString(1) == "3")
    assert(r.getString(2) == "[1,2]")
    assert(r.getString(3) == "{\"a\":1}")
    assert(r.isNullAt(4))
    assert(r.getString(5) == "\"plain\"")
  }

  test("canonicalizeUrl: case, ports, fragments, utm params, slashes") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercase, PATH case preserved
      "HTTP://WWW.Ex.COM/Path/File" -> "http://www.ex.com/Path/File",
      // default ports stripped per scheme; non-default kept
      "https://a.com:443/x" -> "https://a.com/x",
      "http://a.com:80/x" -> "http://a.com/x",
      "https://a.com:8443/x" -> "https://a.com:8443/x",
      // ports that merely START with a default port must survive whole
      "http://a.com:8080/x" -> "http://a.com:8080/x",
      "https://a.com:4433/x" -> "https://a.com:4433/x",
      "https://a.com:443" -> "https://a.com",
      // fragment stripped
      "https://a.com/x#frag" -> "https://a.com/x",
      // utm params: leading with following param, leading alone, trailing
      "https://a.com/x?utm_source=s&q=1" -> "https://a.com/x?q=1",
      "https://a.com/x?utm_source=s" -> "https://a.com/x",
      "https://a.com/x?q=1&utm_medium=m" -> "https://a.com/x?q=1",
      "https://a.com/x?utm_a=1&utm_b=2" -> "https://a.com/x",
      // two leading utm params followed by a real one (no-rescan trap)
      "https://a.com/p?utm_source=fb&utm_campaign=c1&id=9" ->
        "https://a.com/p?id=9",
      "https://a.com/p?utm_a=1&b=2&utm_c=3&d=4" ->
        "https://a.com/p?b=2&d=4",
      // trailing slash and everything combined
      "https://a.com/x/" -> "https://a.com/x",
      "HTTPS://A.com:443/Dir/?utm_c=9#top" -> "https://a.com/Dir",
      // non-utm queries untouched
      "https://a.com/x?a=1&b=2" -> "https://a.com/x?a=1&b=2")
    val got = cases.map(_._1).toDF("u")
      .select(graft.functions.UrlFunctions.canonicalizeUrl(col("u")))
      .as[String].collect().toSeq
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalizeUrl($in) = $g, want $want")
    }
  }
}
