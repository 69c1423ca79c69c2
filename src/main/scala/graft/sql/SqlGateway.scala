package graft.sql

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID
import scala.collection.concurrent.TrieMap

/** The SQL Gateway REST endpoint (reference:
  * flink-table/flink-sql-gateway + docs
  * docs/sql/interfaces/sql-gateway/overview.md, rest.md): a service
  * multiple remote clients drive with plain HTTP —
  *
  *   GET  /v1/info                                     → product/version
  *   POST /v1/sessions                                 → sessionHandle
  *   POST /v1/sessions/{s}/statements  {"statement":…} → operationHandle
  *   GET  /v1/sessions/{s}/operations/{o}/status       → FINISHED/ERROR
  *   GET  /v1/sessions/{s}/operations/{o}/result/{n}   → columns + rows
  *        (paged; `nextResultUri` carries the next token, null at end —
  *        the docs' fetch loop)
  *   DELETE /v1/sessions/{s}                           → close
  *
  * Statements execute through [[FlinkDdl.run]] (the full DDL/DML/query
  * runner). Session continuity follows the compiled-plan model:
  * catalog-mutating statements (CREATE/ALTER/DROP/USE/SET/LOAD …)
  * append to a per-session DDL prefix replayed before every later
  * statement — DDL replay is idempotent over the same paths, while
  * INSERT/queries run exactly once (their effects persist in the
  * written files, visible to later statements through the re-created
  * catalog). Results render the reference wire shape: `columns` with
  * `logicalType {type, nullable}` (Flink type names), `data` rows of
  * `{"kind":"INSERT","fields":[…]}`.
  *
  * Execution is synchronous per statement (status FINISHED/ERROR at
  * submit-response time) — the driver-side analog of the reference's
  * gateway running on a session cluster; the HiveServer2 endpoint and
  * multi-cluster routing (`executionConfig` rest.address) are out of
  * scope (no vendored clusters). */
object SqlGateway {

  private val PageSize = 1000

  private final case class Session(
      stmts: StatementSession,
      ops: TrieMap[String, Operation] = TrieMap.empty)
  /** Pages materialize LAZILY from a partition-streamed iterator
    * (toLocalIterator): the driver holds only the pages clients have
    * fetched — a huge SELECT cannot OOM the gateway by existing, only
    * by being read to the end (and the reference's result store has
    * the same already-fetched retention). */
  private final class Operation(
      val status: String, // FINISHED | ERROR
      val error: Option[String],
      val columns: Seq[(String, DataType)],
      it: Iterator[org.apache.spark.sql.Row]) {
    private val pages =
      scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Seq[Any]]]
    /** The page at `token` (empty past the end) and whether more rows
      * exist after it. */
    def page(token: Int): (IndexedSeq[Seq[Any]], Boolean) = synchronized {
      while (pages.size <= token && it.hasNext)
        pages += it.take(PageSize).map(_.toSeq).toIndexedSeq
      val p = if (token < pages.size) pages(token) else IndexedSeq.empty
      (p, token + 1 < pages.size || it.hasNext)
    }
  }

  private val sessions = TrieMap.empty[String, Session]
  @volatile private var server: HttpServer = _
  @volatile private var boundSpark: SparkSession = _
  @volatile private var extraTables: Map[String, DataFrame] = Map.empty
  @volatile private var procs: Map[String, Procedure] = Procedures.builtin

  /** Flink logical-type name for the wire shape (types.md names). */
  private def flinkType(t: DataType): String = t match {
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR"
    case BinaryType => "VARBINARY"
    case DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    case TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
    case a: ArrayType => s"ARRAY<${flinkType(a.elementType)}>"
    case m: MapType =>
      s"MAP<${flinkType(m.keyType)}, ${flinkType(m.valueType)}>"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${flinkType(f.dataType)}")
        .mkString("ROW<", ", ", ">")
    case other => other.sql
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => if (n.isNaN || n.isInfinite) s""""$n"""" else n.toString
    case n: Double => if (n.isNaN || n.isInfinite) s""""$n"""" else n.toString
    case n: java.math.BigDecimal => n.toPlainString
    case n: BigDecimal => n.underlying.toPlainString
    case s: Seq[_] => s.map(jsonValue).mkString("[", ",", "]")
    case a: Array[_] => a.map(jsonValue).mkString("[", ",", "]")
    case other => "\"" + jsonEscape(other.toString) + "\""
  }

  /** Serve on `port`. `extra` tables and `procedures` thread through to
    * every statement execution. */
  def serve(spark: SparkSession, port: Int,
      extra: Map[String, DataFrame] = Map.empty,
      procedures: Map[String, Procedure] = Procedures.builtin): Int =
    synchronized {
      boundSpark = spark; extraTables = extra; procs = procedures
      if (server == null) {
        server = HttpServer.create(new InetSocketAddress(port), 0)
        server.createContext("/v1", (ex: HttpExchange) => handle(ex))
        // the gateway contract is "multiple clients in concurrency"
        // (overview.md) — serve each exchange off a pooled thread;
        // Spark's scheduler handles concurrent job submission
        server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
          r => { val t = new Thread(r, "graft-sql-gateway"); t.setDaemon(true); t }))
        server.start()
      }
      server.getAddress.getPort
    }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
    sessions.clear()
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** Minimal field extraction from the statement POST body (the only
    * JSON the gateway receives: {"statement": "…"}). */
  private def extractStatement(body: String): String = {
    val key = "\"statement\""
    val i = body.indexOf(key)
    require(i >= 0, "missing \"statement\" field in request body")
    var j = body.indexOf('"', i + key.length + 1)
    require(j >= 0, "malformed statement body")
    val sb = new StringBuilder
    j += 1
    while (j < body.length && body(j) != '"') {
      if (body(j) == '\\' && j + 1 < body.length) {
        body(j + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case 'u' if j + 5 < body.length =>
            sb.append(Integer.parseInt(body.substring(j + 2, j + 6), 16)
              .toChar)
            j += 4
          case c => sb.append(c)
        }
        j += 2
      } else { sb.append(body(j)); j += 1 }
    }
    sb.toString
  }

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: Throwable =>
        respond(ex, 500,
          s"""{"errors":["${jsonEscape(String.valueOf(e.getMessage))}"]}""")
    }

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val parts = path.split("/").filter(_.nonEmpty).toList
    (ex.getRequestMethod, parts) match {
      case ("GET", List("v1", "info")) =>
        respond(ex, 200,
          """{"productName":"graft","version":"spark-4"}""")
      case ("POST", List("v1", "sessions")) =>
        val h = UUID.randomUUID().toString
        sessions.put(h,
          Session(new StatementSession(boundSpark, extraTables, procs)))
        respond(ex, 200, s"""{"sessionHandle":"$h"}""")
      case ("DELETE", List("v1", "sessions", s)) =>
        sessions.remove(s)
        respond(ex, 200, """{"status":"CLOSED"}""")
      case ("POST", List("v1", "sessions", s, "statements")) =>
        val session = sessions.getOrElse(s,
          return respond(ex, 404, s"""{"errors":["unknown session $s"]}"""))
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val stmt = extractStatement(body)
        val op = UUID.randomUUID().toString
        val operation =
          try {
            val df = session.stmts.execute(stmt)
            val cols = df.schema.fields.toSeq.map(f => (f.name, f.dataType))
            import scala.jdk.CollectionConverters._
            val o = new Operation("FINISHED", None, cols,
              df.toLocalIterator().asScala)
            o.page(0) // materialize the first page NOW so execution
            o         // errors surface as ERROR status at submit time
          } catch {
            case e: Throwable =>
              new Operation("ERROR", Some(String.valueOf(e.getMessage)),
                Nil, Iterator.empty)
          }
        session.ops.put(op, operation)
        respond(ex, 200, s"""{"operationHandle":"$op"}""")
      case ("GET", List("v1", "sessions", s, "operations", o, "status")) =>
        val op = sessions.get(s).flatMap(_.ops.get(o)).getOrElse(
          return respond(ex, 404, s"""{"errors":["unknown operation"]}"""))
        respond(ex, 200, s"""{"status":"${op.status}"}""")
      case ("GET", List("v1", "sessions", s, "operations", o, "result", t)) =>
        val op = sessions.get(s).flatMap(_.ops.get(o)).getOrElse(
          return respond(ex, 404, s"""{"errors":["unknown operation"]}"""))
        if (op.status == "ERROR")
          return respond(ex, 500,
            s"""{"errors":["${jsonEscape(op.error.getOrElse(""))}"]}""")
        val token = t.toInt
        val (page, more) = op.page(token)
        val colsJson = op.columns.map { case (n, dt) =>
          s"""{"name":"${jsonEscape(n)}","logicalType":{"type":"${
            jsonEscape(flinkType(dt))}","nullable":true}}"""
        }.mkString("[", ",", "]")
        val dataJson = page.map(r =>
          s"""{"kind":"INSERT","fields":${
            r.map(jsonValue).mkString("[", ",", "]")}}""")
          .mkString("[", ",", "]")
        val next =
          if (more) s""""/v1/sessions/$s/operations/$o/result/${token + 1}""""
          else "null"
        respond(ex, 200,
          s"""{"results":{"columns":$colsJson,"data":$dataJson},""" +
            s""""resultType":"PAYLOAD","nextResultUri":$next}""")
      case _ =>
        respond(ex, 404, s"""{"errors":["no route: $path"]}""")
    }
  }
}
