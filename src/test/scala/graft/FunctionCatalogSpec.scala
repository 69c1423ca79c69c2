package graft

import graft.sql.{FlinkSql, FunctionCatalog}
import org.apache.spark.sql.DataFrame

/** Executes EVERY sample in [[graft.sql.FunctionCatalog]] through the
  * Flink-SQL text entry, and pins exact values for the names graft
  * registers itself (FlinkNameCompat + the bitmap/JSON extensions). Also
  * cross-checks the catalog against the reference's published function
  * inventory so a new reference function can't be silently missing.
  */
class FunctionCatalogSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  private lazy val fixture: DataFrame = {
    val df = Seq(
      (1, 0, 1700000000L, -42.345, "Hello", "world", "123", "3.14",
        """{"a":1,"b":[1,2]}""", "[1,2,3]",
        Seq(3, 1, 2), Seq(2, 4), Seq("a", "b", "c"),
        Map("a" -> 1), Map("b" -> 2),
        java.sql.Timestamp.valueOf("2024-03-15 10:30:00"),
        java.sql.Date.valueOf("2024-03-15"),
        "aGVsbG8=", "192.168.1.10", "https://example.com/path?q=1", "a,b,c"),
      (2, 0, 1700000100L, 7.5, "spark", "flink", "42", "-1e3",
        """{"a":2,"b":[]}""", "[]",
        Seq(5, 6), Seq(6), Seq("x", "y", "z"),
        Map("c" -> 3), Map("c" -> 4),
        java.sql.Timestamp.valueOf("2024-03-16 00:00:00"),
        java.sql.Date.valueOf("2024-12-31"),
        "d29ybGQ=", "10.0.0.1", "http://host/x", "1,2"),
      (3, 1, 1700000200L, 0.0, "abc", "def", "007", "0.0",
        """{"a":3}""", "[null]",
        Seq(9), Seq(9), Seq("q", "r", "s"),
        Map("d" -> 5), Map("d" -> 6),
        java.sql.Timestamp.valueOf("2024-01-01 12:00:00"),
        java.sql.Date.valueOf("2024-01-01"),
        "YQ==", "255.255.255.255", "https://a.b/c", "solo"))
      .toDF("i", "g", "l", "d", "s", "s2", "digits", "dec", "js", "jarr",
        "arr", "arr2", "sarr", "mp", "mp2", "ts", "dt", "b64", "ip",
        "url", "csv")
    df
  }

  private def run(stmt: String): Array[org.apache.spark.sql.Row] =
    FlinkSql.sql(spark, stmt, Map("t" -> fixture)).collect()

  private def one(stmt: String): Any = {
    val rows = run(stmt)
    assert(rows.length == 3, s"expected 3 rows from: $stmt")
    rows.head.get(0)
  }

  test("every catalog sample executes through the SQL entry") {
    val failures = FunctionCatalog.entries.flatMap { entry =>
      try {
        val rows = run(entry.sample)
        if (rows.isEmpty) Some(s"${entry.name}: zero rows") else None
      } catch {
        case ex: Throwable =>
          Some(s"${entry.name}: ${ex.getClass.getSimpleName} " +
            ex.getMessage.linesIterator.take(2).mkString(" | "))
      }
    }
    assert(failures.isEmpty, "catalog samples failed:\n" +
      failures.mkString("\n"))
  }

  test("catalog covers the reference's published function inventory") {
    val yml = new java.io.File(
      "/root/reference/docs/data/sql_functions.yml")
    assume(yml.exists, "reference inventory not present")
    val text = new String(
      java.nio.file.Files.readAllBytes(yml.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val pattern = """- sql:\s*\|?\s*\n?\s*([A-Z][A-Z0-9_]+)\s*\(""".r
    val published = pattern.findAllMatchIn(text).map(_.group(1)).toSet
    val covered = FunctionCatalog.entries.map(_.name).toSet
    val missing = published -- covered
    assert(missing.isEmpty,
      s"reference functions with no catalog entry: ${missing.toSeq.sorted}")
  }

  test("no catalog entry regressed to unsupported") {
    assert(FunctionCatalog.entries.forall(e =>
      Set("spark", "graft", "syntax", "delta").contains(e.status)))
    // deltas must explain themselves
    assert(FunctionCatalog.entries.filter(_.status == "delta")
      .forall(_.note.nonEmpty))
  }

  // ------------------------------------------------- pinned value checks

  test("TRUNCATE truncates toward zero at the given scale") {
    assert(one("SELECT TRUNCATE(-42.345, 2) FROM t") == -42.34)
    assert(one("SELECT TRUNCATE(42.345, 2) FROM t") == 42.34)
    assert(one("SELECT TRUNCATE(42.9) FROM t") == 42.0)
    assert(one("SELECT TRUNCATE(-42.9) FROM t") == -42.0)
  }

  test("FROM_BASE64 / TO_BASE64 round trip strings") {
    assert(one("SELECT FROM_BASE64('aGVsbG8=') FROM t") == "hello")
    assert(one("SELECT TO_BASE64('hello') FROM t") == "aGVsbG8=")
    assert(one("SELECT FROM_BASE64(TO_BASE64(s)) FROM t") == "Hello")
  }

  test("SHA-2 family matches known vectors") {
    assert(one("SELECT SHA256('abc') FROM t") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(one("SELECT SHA224('abc') FROM t") ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(one("SELECT LENGTH(SHA384('abc')) FROM t") == 96)
    assert(one("SELECT LENGTH(SHA512('abc')) FROM t") == 128)
  }

  test("WEEK / CONVERT_TZ / TO_TIMESTAMP_LTZ epoch path") {
    assert(one("SELECT WEEK(DATE '2024-01-04') FROM t") == 1)
    assert(one(
      "SELECT CONVERT_TZ('1970-01-01 00:00:00', 'UTC', 'America/New_York') FROM t")
      == "1969-12-31 19:00:00")
    assert(one("SELECT CAST(TO_TIMESTAMP_LTZ(1700000000000, 3) AS STRING) FROM t")
      == "2023-11-14 22:13:20")
    assert(one("SELECT CAST(TO_TIMESTAMP_LTZ(1700000000, 0) AS STRING) FROM t")
      == "2023-11-14 22:13:20")
  }

  test("ELEMENT returns the sole element, null otherwise") {
    assert(one("SELECT ELEMENT(ARRAY(7)) FROM t") == 7)
    assert(one("SELECT ELEMENT(ARRAY(1, 2)) FROM t") == null)
    assert(one("SELECT ELEMENT(ARRAY()) FROM t") == null)
  }

  test("COLLECT builds the multiset map") {
    val got = FlinkSql.sql(spark,
      "SELECT COLLECT(x) AS c FROM (SELECT EXPLODE(ARRAY(1, 1, 2)) AS x)",
      Map("t" -> fixture)).collect().head.getAs[Map[Int, Int]](0)
    assert(got == Map(1 -> 2, 2 -> 1))
  }

  test("IS_ALPHA / IS_DIGIT / IS_DECIMAL") {
    assert(one("SELECT IS_ALPHA('Hello') FROM t") == true)
    assert(one("SELECT IS_ALPHA('Hello1') FROM t") == false)
    assert(one("SELECT IS_DIGIT('123') FROM t") == true)
    assert(one("SELECT IS_DIGIT('12.3') FROM t") == false)
    assert(one("SELECT IS_DECIMAL('12.3') FROM t") == true)
    assert(one("SELECT IS_DECIMAL('-1e3') FROM t") == true)
    assert(one("SELECT IS_DECIMAL('abc') FROM t") == false)
  }

  test("JSON_OBJECT KEY/VALUE syntax with both null policies") {
    assert(one("SELECT JSON_OBJECT(KEY 'a' VALUE 1, 'b' VALUE CAST(NULL AS INT)) FROM t")
      == """{"a":1,"b":null}""")
    assert(one("SELECT JSON_OBJECT(KEY 'a' VALUE 1, 'b' VALUE CAST(NULL AS INT) ABSENT ON NULL) FROM t")
      == """{"a":1}""")
    // raw-JSON insertion through the JSON() marker
    assert(one("SELECT JSON_OBJECT(KEY 'r' VALUE JSON('{\"x\":5}')) FROM t")
      == """{"r":{"x":5}}""")
  }

  test("JSON_ARRAY null policies") {
    assert(one("SELECT JSON_ARRAY(1, CAST(NULL AS INT), 3) FROM t") == "[1,3]")
    assert(one("SELECT JSON_ARRAY(1, CAST(NULL AS INT), 3 NULL ON NULL) FROM t")
      == "[1,null,3]")
  }

  test("JSON_VALUE / JSON_QUERY / JSON_EXISTS / JSON_LENGTH") {
    assert(one("SELECT JSON_VALUE(js, 'lax $.a') FROM t") == "1")
    // non-scalar → NULL for VALUE, returned for QUERY
    assert(one("SELECT JSON_VALUE(js, 'lax $.b') FROM t") == null)
    assert(one("SELECT JSON_QUERY(js, 'lax $.b') FROM t") == "[1,2]")
    assert(one("SELECT JSON_QUERY(js, 'lax $.a') FROM t") == null)
    assert(one("SELECT JSON_EXISTS(js, 'lax $.a') FROM t") == true)
    assert(one("SELECT JSON_EXISTS(js, 'lax $.zz') FROM t") == false)
    assert(one("SELECT JSON_LENGTH('[1,2,3]') FROM t") == 3)
    assert(one("SELECT JSON_LENGTH(js) FROM t") == 2)
    assert(one("SELECT JSON_LENGTH(js, '$.b') FROM t") == 2)
    assert(one("SELECT JSON_LENGTH('5') FROM t") == 1)
  }

  test("SQL/JSON behavior clauses: RETURNING, defaults, wrappers") {
    assert(one("SELECT JSON_VALUE(js, '$.a' RETURNING INT) FROM t") == 1)
    assert(one("SELECT JSON_VALUE(js, 'lax $.zz' DEFAULT 'none' ON EMPTY) FROM t")
      == "none")
    assert(one("SELECT JSON_VALUE(js, '$.zz' RETURNING INT DEFAULT -1 ON EMPTY) FROM t")
      == -1)
    // scalar wrapped; existing array NOT double-wrapped conditionally
    assert(one("SELECT JSON_QUERY(js, '$.a' WITH WRAPPER) FROM t") == "[1]")
    assert(one("SELECT JSON_QUERY(js, '$.b' WITH CONDITIONAL ARRAY WRAPPER) FROM t")
      == "[1,2]")
    assert(one("SELECT JSON_QUERY(js, '$.b' WITH UNCONDITIONAL WRAPPER) FROM t")
      == "[[1,2]]")
    assert(one("SELECT JSON_QUERY(js, '$.zz' EMPTY ARRAY ON EMPTY) FROM t")
      == "[]")
    assert(one("SELECT JSON_QUERY(js, '$.zz' EMPTY OBJECT ON ERROR) FROM t")
      == "{}")
    assert(one("SELECT JSON_EXISTS(js, '$.a' FALSE ON ERROR) FROM t") == true)
    val err = intercept[Exception] {
      run("SELECT JSON_VALUE(js, '$.zz' ERROR ON EMPTY) FROM t")
    }
    assert(err.getMessage.contains("JSON_VALUE") ||
      Option(err.getCause).exists(_.getMessage.contains("JSON_VALUE")))
  }

  test("IS JSON predicate family rewrites") {
    val r = run("SELECT js IS JSON, s IS NOT JSON, js IS JSON OBJECT, " +
      "jarr IS JSON ARRAY, digits IS JSON SCALAR, " +
      "UPPER(jarr) IS JSON FROM t").head
    assert(r.getBoolean(0))      // object is json
    assert(r.getBoolean(1))      // 'Hello' is not json
    assert(r.getBoolean(2))      // object
    assert(r.getBoolean(3))      // array
    assert(r.getBoolean(4))      // scalar
    assert(r.getBoolean(5))      // function-call operand
  }

  test("OBJECT_OF / OBJECT_UPDATE structured helpers") {
    val r = run("SELECT OBJECT_UPDATE(OBJECT_OF('c', 'name', s, 'age', i), " +
      "'age', 99) AS o FROM t").head.getStruct(0)
    assert(r.getAs[String]("name") == "Hello")
    assert(r.getAs[Int]("age") == 99)
  }

  test("bitmap catalog spellings round trip") {
    assert(one("SELECT BITMAP_TO_STRING(BITMAP_BUILD(ARRAY(3, 1, 2))) FROM t")
      == "{1,2,3}")
    assert(one("SELECT BITMAP_CARDINALITY(BITMAP_FROM_BYTES(" +
      "BITMAP_TO_BYTES(BITMAP_BUILD(ARRAY(1, 2, 3))))) FROM t") == 3L)
    val aggs = FlinkSql.sql(spark,
      "SELECT BITMAP_BUILD_CARDINALITY_AGG(i) AS c, " +
        "BITMAP_TO_STRING(BITMAP_XOR_AGG(BITMAP_BUILD(arr))) AS x FROM t",
      Map("t" -> fixture)).collect().head
    assert(aggs.getLong(0) == 3L)
    // arr sets: {3,1,2} xor {5,6} xor {9} = {1,2,3,5,6,9}
    assert(aggs.getString(1) == "{1,2,3,5,6,9}")
  }

  test("SPLIT is a literal delimiter inside the Flink entry") {
    val got = run("SELECT SPLIT('a.b.c', '.') AS p FROM t")
      .head.getSeq[String](0)
    assert(got == Seq("a", "b", "c")) // Spark's regex split would explode
    // \E injection in the delimiter stays literal
    val tricky = run("""SELECT SPLIT('x\\Ey', '\\E') AS p FROM t""")
      .head.getSeq[String](0)
    assert(tricky == Seq("x", "y"))
  }

  test("scalar-syntax rewrites leave string literals alone") {
    assert(one("SELECT 'a IS JSON b' FROM t") == "a IS JSON b")
    assert(one("SELECT 'JSON_OBJECT(KEY a VALUE b)' FROM t") ==
      "JSON_OBJECT(KEY a VALUE b)")
    assert(one("SELECT 'SPLIT(x)' FROM t") == "SPLIT(x)")
  }

  test("IS JSON composes in WHERE and with nested constructors") {
    val rows = run("SELECT i FROM t WHERE js IS JSON OBJECT")
    assert(rows.length == 3)
    // nested constructor: object inside array
    assert(one("SELECT JSON_ARRAY(JSON(JSON_OBJECT(KEY 'a' VALUE 1))) FROM t")
      == """[{"a":1}]""")
  }

  test("GROUP_ID resolves in grouping-set queries") {
    val rows = run("SELECT g, GROUP_ID() FROM t GROUP BY CUBE(g)")
    assert(rows.nonEmpty)
  }
}
