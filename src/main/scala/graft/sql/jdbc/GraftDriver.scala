package graft.sql.jdbc

import org.json4s._
import org.json4s.jackson.JsonMethods

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.{Connection, Driver, DriverPropertyInfo, ResultSet,
  ResultSetMetaData, SQLException, Statement, Types}
import java.util.Properties
import java.util.logging.Logger

/** The SQL JDBC driver (reference: flink-table/flink-sql-jdbc-driver;
  * docs dev/table/jdbcDriver.md): `java.sql` over the SQL Gateway REST
  * endpoint — `DriverManager.getConnection("jdbc:flink://host:port")`
  * opens a gateway session, `Statement.executeQuery` posts the
  * statement and iterates the paged result fetch
  * (`nextResultUri`-chained), with column metadata from the gateway's
  * `logicalType` names.
  *
  * Scope: the read-path subset BI tooling drives — Connection
  * (createStatement/close/metadata no-ops), Statement
  * (executeQuery/executeUpdate/execute), ResultSet (forward-only
  * next/getXxx by index or label/wasNull/metadata). The long tail of
  * the `java.sql` surface answers through reflective proxies:
  * unsupported calls raise SQLException naming the method (the
  * reference's driver throws the same way for its unsupported
  * surface). Both `jdbc:flink://` and `jdbc:graft://` URL prefixes
  * are accepted. */
object GraftDriver extends Driver {

  private val Prefixes = Seq("jdbc:flink://", "jdbc:graft://")
  private lazy val http = HttpClient.newHttpClient()

  // self-registration, the java.sql.Driver contract
  try java.sql.DriverManager.registerDriver(this) catch { case _: Throwable => () }

  override def acceptsURL(url: String): Boolean =
    url != null && Prefixes.exists(url.startsWith)

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null
    val hostPort = Prefixes.foldLeft(url)((u, p) => u.stripPrefix(p))
      .takeWhile(_ != '/')
    val base = s"http://$hostPort/v1"
    val session = (parse(post(s"$base/sessions", "")) \ "sessionHandle")
      .values.toString
    newConnection(base, session)
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = Logger.getGlobal
  override def getPropertyInfo(url: String, info: Properties)
      : Array[DriverPropertyInfo] = Array.empty

  private def parse(s: String): JValue = JsonMethods.parse(s)

  private def get(url: String): String = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (r.statusCode() >= 400)
      throw new SQLException(s"gateway error ${r.statusCode()}: ${r.body()}")
    r.body()
  }
  private def post(url: String, body: String): String = {
    val r = http.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    if (r.statusCode() >= 400)
      throw new SQLException(s"gateway error ${r.statusCode()}: ${r.body()}")
    r.body()
  }

  private def proxy[T](iface: Class[T])(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          pf.applyOrElse((m.getName, a), { _: (String, Array[AnyRef]) =>
            m.getName match {
              case "toString" => s"graft-jdbc:${iface.getSimpleName}"
              case "hashCode" => Int.box(System.identityHashCode(p))
              case "equals" => Boolean.box(p eq a.headOption.orNull)
              case "isWrapperFor" => Boolean.box(false)
              case _ => throw new SQLException(
                s"${iface.getSimpleName}.${m.getName} is not supported " +
                  "by the graft JDBC driver (read-path subset)")
            }
          })
        }
      }).asInstanceOf[T]

  private def newConnection(base: String, session: String): Connection = {
    @volatile var closed = false
    proxy(classOf[Connection]) {
      case ("createStatement", _) => newStatement(base, session)
      case ("close", _) =>
        closed = true
        try http.send(HttpRequest.newBuilder(
          URI.create(s"$base/sessions/$session")).DELETE().build(),
          HttpResponse.BodyHandlers.ofString())
        catch { case _: Throwable => () }
        null
      case ("isClosed", _) => Boolean.box(closed)
      case ("isValid", _) => Boolean.box(!closed)
      case ("setAutoCommit", _) | ("commit", _) | ("rollback", _) |
          ("clearWarnings", _) | ("setReadOnly", _) => null
      case ("getAutoCommit", _) => Boolean.box(true)
      case ("isReadOnly", _) => Boolean.box(false)
      case ("getWarnings", _) => null
      case ("getCatalog", _) => "default_catalog"
      case ("getSchema", _) => "default_database"
    }
  }

  private def newStatement(base: String, session: String): Statement = {
    @volatile var closed = false
    @volatile var lastRs: ResultSet = null
    @volatile var queryTimeoutS = 0 // java.sql contract: 0 = no limit
    @volatile var currentOp: String = null
    def cancelOp(op: String): Unit =
      try post(s"$base/sessions/$session/operations/$op/cancel", "{}")
      catch { case _: Throwable => () }
    // currentOp is live only while run() is in flight (ADVICE r14):
    // without the finally-clear, a watchdog thread's Statement.cancel()
    // BETWEEN statements would post a cancel for the previous (finished)
    // operation and silently miss the statement it meant to stop.
    def run(sql: String): ResultSet = try runInner(sql) finally currentOp = null
    def runInner(sql: String): ResultSet = {
      val opJson = parse(post(s"$base/sessions/$session/statements",
        s"""{"statement": ${JsonMethods.compact(JsonMethods.render(JString(sql)))}}"""))
      val op = (opJson \ "operationHandle").values.toString
      currentOp = op
      // statements run asynchronously on the gateway: poll the status
      // endpoint to a terminal state (the documented fetch loop). The
      // poll is BOUNDED by Statement.setQueryTimeout — an operation
      // wedged RUNNING (worker stuck, or queued indefinitely behind
      // another session statement) must not hang the JDBC call forever;
      // on expiry the operation is cancelled gateway-side and
      // SQLTimeoutException raised, the java.sql contract.
      val deadlineNanos =
        if (queryTimeoutS > 0)
          System.nanoTime() + queryTimeoutS * 1000000000L
        else Long.MaxValue
      var status = "RUNNING"
      while (status == "RUNNING") {
        status = (parse(get(
          s"$base/sessions/$session/operations/$op/status")) \ "status")
          .values.toString
        if (status == "RUNNING") {
          if (System.nanoTime() > deadlineNanos) {
            cancelOp(op)
            throw new java.sql.SQLTimeoutException(
              s"statement exceeded queryTimeout=${queryTimeoutS}s: $sql")
          }
          Thread.sleep(20)
        }
      }
      if (status == "ERROR") // surface the statement's own error
        get(s"$base/sessions/$session/operations/$op/result/0")
      if (status == "CANCELED")
        throw new SQLException(s"statement was canceled: $sql")
      newResultSet(s"$base/sessions/$session/operations/$op/result/0")
    }
    proxy(classOf[Statement]) {
      case ("executeQuery", Array(sql: String)) =>
        lastRs = run(sql); lastRs
      case ("execute", Array(sql: String)) =>
        lastRs = run(sql); Boolean.box(true)
      case ("executeUpdate", Array(sql: String)) =>
        run(sql); Int.box(0)
      case ("getResultSet", _) => lastRs
      case ("getUpdateCount", _) => Int.box(-1)
      case ("getMoreResults", _) => Boolean.box(false)
      case ("close", _) => closed = true; null
      case ("isClosed", _) => Boolean.box(closed)
      case ("setQueryTimeout", Array(s: Integer)) =>
        if (s.intValue() < 0)
          throw new SQLException(s"queryTimeout must be >= 0, got $s")
        queryTimeoutS = s.intValue(); null
      case ("getQueryTimeout", _) => Int.box(queryTimeoutS)
      case ("cancel", _) =>
        // best-effort cancel of the in-flight statement from another
        // thread (java.sql.Statement.cancel contract)
        val op = currentOp
        if (op != null) cancelOp(op)
        null
      case ("setFetchSize", _) | ("setMaxRows", _) |
          ("clearWarnings", _) => null
      case ("getFetchSize", _) => Int.box(1000)
      case ("getWarnings", _) => null
    }
  }

  private def jdbcType(flinkName: String): Int = {
    val base = flinkName.takeWhile(c => c.isLetter || c == '_')
    base match {
      case "INTEGER" => Types.INTEGER
      case "BIGINT" => Types.BIGINT
      case "SMALLINT" => Types.SMALLINT
      case "TINYINT" => Types.TINYINT
      case "DOUBLE" => Types.DOUBLE
      case "FLOAT" => Types.FLOAT
      case "BOOLEAN" => Types.BOOLEAN
      case "VARCHAR" => Types.VARCHAR
      case "VARBINARY" => Types.VARBINARY
      case "DATE" => Types.DATE
      case "TIMESTAMP" => Types.TIMESTAMP
      case "DECIMAL" => Types.DECIMAL
      case "ARRAY" => Types.ARRAY
      case _ => Types.OTHER
    }
  }

  private def newResultSet(firstUri0: String): ResultSet = {
    val root = firstUri0.substring(0, firstUri0.indexOf("/v1"))
    var columns: Seq[(String, String)] = Nil // (name, flink type)
    var rows: IndexedSeq[Seq[Any]] = IndexedSeq.empty
    var idx = -1
    var nextUri: Option[String] = Some(firstUri0)
    var nulled = false
    var closed = false

    def fetch(): Unit = nextUri match {
      case Some(u) =>
        val j = parse(get(u))
        columns = (j \ "results" \ "columns") match {
          case JArray(cs) => cs.map(c =>
            ((c \ "name").values.toString,
              (c \ "logicalType" \ "type").values.toString))
          case _ => columns
        }
        rows = (j \ "results" \ "data") match {
          case JArray(ds) => ds.map { d =>
            (d \ "fields") match {
              case JArray(fs) => fs.map(jv => jv.values): Seq[Any]
              case _ => Nil
            }
          }.toIndexedSeq
          case _ => IndexedSeq.empty
        }
        idx = -1
        nextUri = (j \ "nextResultUri") match {
          case JString(s) => Some(root + s)
          case _ => None
        }
      case None => rows = IndexedSeq.empty; idx = -1
    }
    fetch()

    def cell(i: Int): Any = {
      val v = rows(idx)(i - 1)
      nulled = v == null
      v
    }
    def byLabel(label: String): Int = {
      val i = columns.indexWhere(_._1.equalsIgnoreCase(label))
      if (i < 0) throw new SQLException(
        s"no column $label; columns: ${columns.map(_._1).mkString(", ")}")
      i + 1
    }
    def resolve(arg: AnyRef): Int = arg match {
      case i: Integer => i.intValue()
      case s: String => byLabel(s)
      case other => throw new SQLException(s"bad column selector $other")
    }
    def meta: ResultSetMetaData = proxy(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Int.box(columns.size)
      case ("getColumnName", Array(i: Integer)) => columns(i - 1)._1
      case ("getColumnLabel", Array(i: Integer)) => columns(i - 1)._1
      case ("getColumnTypeName", Array(i: Integer)) => columns(i - 1)._2
      case ("getColumnType", Array(i: Integer)) =>
        Int.box(jdbcType(columns(i - 1)._2))
      case ("isNullable", _) =>
        Int.box(ResultSetMetaData.columnNullable)
    }

    proxy(classOf[ResultSet]) {
      case ("next", _) =>
        if (idx + 1 < rows.size) { idx += 1; Boolean.box(true) }
        else if (nextUri.isDefined) {
          fetch()
          if (rows.nonEmpty) { idx = 0; Boolean.box(true) }
          else Boolean.box(false)
        } else Boolean.box(false)
      case ("getString", Array(a)) =>
        val v = cell(resolve(a)); if (v == null) null else v.toString
      case ("getLong", Array(a)) =>
        val v = cell(resolve(a))
        Long.box(if (v == null) 0L else v match {
          case n: Number => n.longValue()
          case s => s.toString.toLong
        })
      case ("getInt", Array(a)) =>
        val v = cell(resolve(a))
        Int.box(if (v == null) 0 else v match {
          case n: Number => n.intValue()
          case s => s.toString.toInt
        })
      case ("getDouble", Array(a)) =>
        val v = cell(resolve(a))
        Double.box(if (v == null) 0.0 else v match {
          case n: Number => n.doubleValue()
          case s => s.toString.toDouble
        })
      case ("getBoolean", Array(a)) =>
        val v = cell(resolve(a))
        Boolean.box(v != null && v == true)
      case ("getBigDecimal", Array(a)) =>
        val v = cell(resolve(a))
        if (v == null) null else new java.math.BigDecimal(v.toString)
      case ("getObject", Array(a)) => cell(resolve(a)).asInstanceOf[AnyRef]
      case ("wasNull", _) => Boolean.box(nulled)
      case ("findColumn", Array(label: String)) => Int.box(byLabel(label))
      case ("getMetaData", _) => meta
      case ("getType", _) => Int.box(ResultSet.TYPE_FORWARD_ONLY)
      case ("getConcurrency", _) => Int.box(ResultSet.CONCUR_READ_ONLY)
      case ("close", _) => closed = true; null
      case ("isClosed", _) => Boolean.box(closed)
      case ("getWarnings", _) => null
      case ("clearWarnings", _) => null
    }
  }
}
