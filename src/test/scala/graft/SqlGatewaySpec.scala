package graft

import graft.sql.SqlGateway

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The SQL Gateway REST endpoint (sql-gateway/overview.md flow): info →
  * open session → execute → status → paged result fetch, with session
  * catalog continuity and error surfacing. */
class SqlGatewaySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val http = HttpClient.newHttpClient()

  private def get(url: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def post(url: String, body: String = ""): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def field(json: String, name: String): String = {
    val m = ("\"" + name + "\"\\s*:\\s*\"([^\"]+)\"").r
    m.findFirstMatchIn(json).map(_.group(1)).getOrElse(
      sys.error(s"no $name in $json"))
  }

  test("gateway serves the documented REST flow end to end") {
    val port = SqlGateway.serve(spark, 0,
      extra = Map("gw_nums" -> spark.range(2500).toDF("n")))
    try {
      val base = s"http://localhost:$port/v1"
      // GET /v1/info
      val (ic, info) = get(s"$base/info")
      assert(ic == 200 && info.contains("graft"))
      // open a session
      val (_, sj) = post(s"$base/sessions")
      val s = field(sj, "sessionHandle")
      // execute a query
      val (_, oj) = post(s"$base/sessions/$s/statements",
        """{"statement": "SELECT n FROM gw_nums ORDER BY n"}""")
      val op = field(oj, "operationHandle")
      assert(get(s"$base/sessions/$s/operations/$op/status")._2
        .contains("FINISHED"))
      // paged fetch: 2500 rows = 3 pages chained by nextResultUri
      val (c0, p0) = get(s"$base/sessions/$s/operations/$op/result/0")
      assert(c0 == 200)
      assert(p0.contains(""""name":"n""""))
      assert(p0.contains(""""type":"BIGINT""""))
      assert(p0.contains("""{"kind":"INSERT","fields":[0]}"""))
      assert(p0.contains(s""""nextResultUri":"/v1/sessions/$s/operations/$op/result/1""""))
      val (_, p1) = get(s"$base/sessions/$s/operations/$op/result/1")
      assert(p1.contains("""[1000]"""))
      val (_, p2) = get(s"$base/sessions/$s/operations/$op/result/2")
      assert(p2.contains(""""nextResultUri":null"""))
      assert(p2.contains("""[2499]"""))

      // session catalog continuity: DDL in one statement, DML in the
      // next, query in a third
      val dir = java.nio.file.Files.createTempDirectory("graft-gw-")
      val ddl = s"""{"statement": "CREATE TABLE gw_t (id BIGINT, s STRING) WITH ('connector'='filesystem', 'path'='$dir/t', 'format'='parquet')"}"""
      val (_, o1) = post(s"$base/sessions/$s/statements", ddl)
      val o1h = field(o1, "operationHandle")
      assert(get(s"$base/sessions/$s/operations/$o1h/status")._2
        .contains("FINISHED"),
        get(s"$base/sessions/$s/operations/$o1h/result/0")._2)
      val (_, o2) = post(s"$base/sessions/$s/statements",
        """{"statement": "INSERT INTO gw_t SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS v(id, s)"}""")
      assert(get(s"$base/sessions/$s/operations/${field(o2, "operationHandle")}/status")._2.contains("FINISHED"))
      val (_, o3) = post(s"$base/sessions/$s/statements",
        """{"statement": "SELECT s FROM gw_t ORDER BY id"}""")
      val op3 = field(o3, "operationHandle")
      val (_, r3) = get(s"$base/sessions/$s/operations/$op3/result/0")
      assert(r3.contains("""["a"]""") && r3.contains("""["b"]"""))

      // errors: bad SQL → ERROR status, 500 on result fetch
      val (_, oe) = post(s"$base/sessions/$s/statements",
        """{"statement": "SELECT FROM nothing"}""")
      val ope = field(oe, "operationHandle")
      assert(get(s"$base/sessions/$s/operations/$ope/status")._2
        .contains("ERROR"))
      assert(get(s"$base/sessions/$s/operations/$ope/result/0")._1 == 500)

      // unknown session
      assert(post(s"$base/sessions/deadbeef/statements",
        """{"statement": "SELECT 1"}""")._1 == 404)
      // close
      val del = http.send(HttpRequest.newBuilder(
        URI.create(s"$base/sessions/$s")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(del.body().contains("CLOSED"))
      assert(post(s"$base/sessions/$s/statements",
        """{"statement": "SELECT 1"}""")._1 == 404)
    } finally SqlGateway.stop()
  }

  test("the JDBC driver drives the gateway through java.sql") {
    val port = SqlGateway.serve(spark, 0,
      extra = Map("gw_j" -> spark.range(2500).toDF("n")))
    try {
      // ensure driver self-registration ran
      graft.sql.jdbc.GraftDriver.getMajorVersion
      val conn = java.sql.DriverManager
        .getConnection(s"jdbc:flink://localhost:$port")
      val st = conn.createStatement()
      val rs = st.executeQuery(
        "SELECT n, CAST(n AS DOUBLE) / 2 AS half FROM gw_j ORDER BY n")
      val md = rs.getMetaData
      assert(md.getColumnCount == 2)
      assert(md.getColumnName(1) == "n" && md.getColumnName(2) == "half")
      assert(md.getColumnType(1) == java.sql.Types.BIGINT)
      assert(md.getColumnTypeName(2) == "DOUBLE")
      // iterate across page boundaries (2500 rows, 1000/page)
      var count = 0L
      var sum = 0L
      while (rs.next()) {
        sum += rs.getLong(1)
        assert(rs.getDouble("half") == rs.getLong("n") / 2.0)
        count += 1
      }
      assert(count == 2500 && sum == 2500L * 2499 / 2)
      rs.close()
      // JSON special characters survive the wire both directions
      val rs2 = st.executeQuery(
        "SELECT concat('quote \" back ', char(92), ' nl', char(10), " +
          "'tab', char(9), 'end') AS s")
      assert(rs2.next())
      assert(rs2.getString("s") == "quote \" back \\ nl\ntab\tend")
      // errors surface as SQLException
      val e = intercept[java.sql.SQLException](
        st.executeQuery("SELECT broken FROM nowhere"))
      assert(e.getMessage.contains("gateway error"))
      // unsupported surface names the method
      val u = intercept[java.sql.SQLException](conn.prepareStatement("x"))
      assert(u.getMessage.contains("prepareStatement"))
      conn.close()
      assert(conn.isClosed)
    } finally SqlGateway.stop()
  }
}
