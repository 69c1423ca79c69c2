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
  *        the docs' fetch loop; `resultType` NOT_READY with the same
  *        token while the statement still runs)
  *   POST /v1/sessions/{s}/operations/{o}/cancel       → CANCELED
  *        (stops the statement's running Spark jobs mid-flight)
  *   DELETE /v1/sessions/{s}/operations/{o}/close      → CLOSED
  *   GET|POST /v1/sessions/{s}/complete-statement      → candidates
  *        ({"statement":…,"position":N} — keyword + table-name hints)
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
  * Statements execute asynchronously on a dedicated worker pool (the
  * reference's OperationManager submits to an executor the same way):
  * submit returns the operationHandle immediately, status transitions
  * RUNNING → FINISHED/ERROR/CANCELED, and each statement runs under its
  * own Spark job group so cancel-operation stops it mid-flight.
  * Statements within one session serialize through the shared
  * [[StatementSession]]. The HiveServer2 endpoint and multi-cluster
  * routing (`executionConfig` rest.address) are out of scope (no
  * vendored clusters). */
object SqlGateway {

  private val PageSize = 1000

  private final case class Session(
      stmts: StatementSession,
      properties: Map[String, String] = Map.empty,
      ops: TrieMap[String, Operation] = TrieMap.empty)
  /** One statement's lifecycle (reference:
    * gateway/service/operation/OperationManager.java status machine):
    * RUNNING → FINISHED | ERROR | CANCELED | CLOSED. Statements execute
    * ASYNCHRONOUSLY on the statement pool under a per-operation Spark
    * job group, so cancel-operation can stop the running jobs
    * mid-flight (CancelOperationHandler.java). Pages materialize LAZILY
    * from a partition-streamed iterator (toLocalIterator): the driver
    * holds only the pages clients have fetched — a huge SELECT cannot
    * OOM the gateway by existing, only by being read to the end (and
    * the reference's result store has the same already-fetched
    * retention). */
  private final class Operation(val jobGroup: String) {
    @volatile var status: String = "RUNNING"
    @volatile var error: Option[String] = None
    @volatile var columns: Seq[(String, DataType)] = Nil
    private var it: Iterator[org.apache.spark.sql.Row] = Iterator.empty
    private val pages =
      scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Seq[Any]]]
    /** Worker-side completion; loses to an already-arrived cancel.
      * Page 0 materializes OUTSIDE the monitor (still on the worker,
      * under the operation's job group) so runtime errors and
      * cancellation hit here rather than a fetch thread — AND so
      * cancel() can take the lock, flip status and kill the job group
      * while a long SELECT's first page is still being pulled; holding
      * the monitor across the Spark jobs would park the cancel until
      * the page completed and then no-op it. */
    def finish(cols: Seq[(String, DataType)],
        rows: Iterator[org.apache.spark.sql.Row]): Unit = {
      val first: Either[Throwable, IndexedSeq[Seq[Any]]] =
        try {
          var p: IndexedSeq[Seq[Any]] = IndexedSeq.empty
          while (p.isEmpty && rows.hasNext)
            p = rows.take(PageSize).map(_.toSeq).toIndexedSeq
          Right(p)
        } catch { case e: Throwable => Left(e) }
      synchronized {
        if (status == "RUNNING") first match {
          case Right(p) =>
            columns = cols; it = rows
            if (p.nonEmpty) pages += p
            status = "FINISHED"
          case Left(e) =>
            error = Some(String.valueOf(e.getMessage)); status = "ERROR"
        }
      }
    }
    def fail(e: Throwable): Unit = synchronized {
      if (status == "RUNNING") {
        error = Some(String.valueOf(e.getMessage)); status = "ERROR"
      }
    }
    /** Client-side cancel: mark CANCELED first (the worker's finish
      * then loses the race), then kill the operation's job group —
      * INCLUDING jobs the statement has not submitted yet, so a cancel
      * landing between two of its Spark jobs (or while it queues behind
      * another statement's session lock) still stops it. The worker also
      * re-checks status before starting (see the submit path). Returns
      * the operation's RESULTING status — a cancel that loses the race
      * to finish()/fail() reports the real terminal state, it does not
      * pretend the statement was stopped. */
    /** Attempt the RUNNING -> CANCELED transition; true iff THIS call
      * moved it. The reference errors on any cancel that didn't —
      * terminal states only transition to CLOSED
      * (OperationStatus.isValidStatusTransition).
      */
    def cancel(spark: SparkSession): Boolean = {
      val wasRunning = synchronized {
        val r = status == "RUNNING"
        if (r) status = "CANCELED"
        r
      }
      if (wasRunning)
        try spark.sparkContext.cancelJobGroupAndFutureJobs(jobGroup)
        catch { case _: NoSuchMethodError =>
          spark.sparkContext.cancelJobGroup(jobGroup)
        }
      wasRunning
    }
    def close(): Unit = synchronized { status = "CLOSED"; it = Iterator.empty }
    /** The page at `token` (empty past the end) and whether more rows
      * exist after it. Only callable once FINISHED. */
    def page(token: Int): (IndexedSeq[Seq[Any]], Boolean) = synchronized {
      while (pages.size <= token && it.hasNext)
        pages += it.take(PageSize).map(_.toSeq).toIndexedSeq
      val p = if (token < pages.size) pages(token) else IndexedSeq.empty
      (p, token + 1 < pages.size || it.hasNext)
    }
  }

  /** Statement worker pool — separate from the HTTP pool so long
    * statements never starve request handling (status/cancel must stay
    * responsive while an INSERT runs). */
  private lazy val statementPool =
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-gateway-stmt"); t.setDaemon(true); t
    })

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
        // version negotiation lives at the root, outside /v1
        // (GetApiVersionHandler.java)
        server.createContext("/api_versions", (ex: HttpExchange) => handle(ex))
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
    // continuous queries belonging to sessions die with the gateway —
    // after clear() no handle could ever stop them (review r18)
    sessions.values.foreach(s => scala.util.Try(s.stmts.shutdown()))
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

  /** Hint words for complete-statement (the reference delegates to the
    * planner's SqlAdvisor; the gateway surface is the same — prefix in,
    * candidate list out). */
  private val SqlKeywords = Seq(
    "SELECT", "FROM", "WHERE", "GROUP BY", "ORDER BY", "HAVING", "LIMIT",
    "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "OUTER", "CROSS", "ON",
    "UNION", "INTERSECT", "EXCEPT", "ALL", "DISTINCT", "AS", "AND", "OR",
    "NOT", "IN", "EXISTS", "BETWEEN", "LIKE", "IS", "NULL", "CASE",
    "WHEN", "THEN", "ELSE", "END", "INSERT", "INTO", "OVERWRITE",
    "VALUES", "CREATE", "TABLE", "VIEW", "TEMPORARY", "MATERIALIZED",
    "FUNCTION", "CATALOG", "DATABASE", "MODEL", "DROP", "ALTER", "USE",
    "SHOW", "DESCRIBE", "EXPLAIN", "SET", "RESET", "WITH", "PARTITIONED",
    "WATERMARK", "PRIMARY", "KEY", "MATCH_RECOGNIZE", "TUMBLE", "HOP",
    "CUMULATE", "SESSION", "OVER", "PARTITION", "BY", "ROWS", "RANGE",
    "INTERVAL", "CAST", "COUNT", "SUM", "AVG", "MIN", "MAX")

  /** Candidates for the word ending at `position` in `statement`:
    * keywords (uppercase) and session table names sharing the typed
    * prefix, case-insensitively; empty prefix → no candidates (the
    * reference returns the full keyword space there — noise the tests
    * pin down to the useful subset). */
  private[sql] def completeStatement(statement: String, position: Int,
      tableNames: Set[String]): Seq[String] = {
    val pos = math.min(math.max(position, 0), statement.length)
    var start = pos
    while (start > 0 && (statement(start - 1).isLetterOrDigit ||
        statement(start - 1) == '_')) start -= 1
    val prefix = statement.substring(start, pos)
    if (prefix.isEmpty) Nil
    else {
      val up = prefix.toUpperCase
      val kws = SqlKeywords.filter(_.startsWith(up))
      val tbls = tableNames.toSeq.sorted
        .filter(_.toUpperCase.startsWith(up))
      (kws ++ tbls).distinct
    }
  }

  /** The flat map under `"properties"` in an open-session body, parsed
    * with Jackson (scalar values coerce to their text form, matching the
    * reference's string-typed session options); empty when absent or the
    * body is empty. Malformed JSON is an error, not silent loss. */
  private[sql] def extractProperties(body: String): Map[String, String] = {
    if (body.trim.isEmpty) return Map.empty
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body)
    val props = root.path("properties")
    if (!props.isObject) return Map.empty
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val it = props.fields()
    while (it.hasNext) {
      val e = it.next()
      out(e.getKey) = e.getValue.asText()
    }
    out.toMap
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
      case ("GET", List("api_versions")) | ("GET", List("v1", "api_versions")) =>
        // GetApiVersionHandler.java: clients negotiate the REST version
        respond(ex, 200, """{"versions":["V1"]}""")
      case ("POST", List("v1", "sessions")) =>
        val h = UUID.randomUUID().toString
        // OpenSessionHandler.java: the optional {"properties": {...}}
        // map configures the session — applied as leading SET statements
        // through the same catalog-continuity path any SET takes
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val props = extractProperties(body)
        val stmts = new StatementSession(boundSpark, extraTables, procs)
        props.foreach { case (k, v) =>
          stmts.execute(s"SET '${k.replace("'", "''")}' = " +
            s"'${v.replace("'", "''")}'")
        }
        sessions.put(h, Session(stmts, props))
        respond(ex, 200, s"""{"sessionHandle":"$h"}""")
      case ("GET", List("v1", "sessions", s)) =>
        // GetSessionConfigHandler.java: the session's configured options
        val session = sessions.getOrElse(s,
          return respond(ex, 404, s"""{"errors":["unknown session $s"]}"""))
        val props = session.properties.toSeq.sortBy(_._1)
          .map { case (k, v) =>
            s""""${jsonEscape(k)}":"${jsonEscape(v)}"""" }
          .mkString(",")
        respond(ex, 200, s"""{"properties":{$props}}""")
      case ("DELETE", List("v1", "sessions", s)) =>
        // closing a session cancels its still-running operations — their
        // handles are about to disappear, so nothing could stop them
        // afterwards (the reference's session close tears operations down
        // the same way)
        sessions.remove(s).foreach { sess =>
          sess.ops.values.foreach(_.cancel(boundSpark))
          // continuous queries the session started (streaming INSERTs)
          // die with it — nothing could stop them afterwards
          sess.stmts.shutdown()
        }
        respond(ex, 200, """{"status":"CLOSED"}""")
      case ("POST", List("v1", "sessions", s, "statements")) =>
        val session = sessions.getOrElse(s,
          return respond(ex, 404, s"""{"errors":["unknown session $s"]}"""))
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val stmt = extractStatement(body)
        val op = UUID.randomUUID().toString
        val operation = new Operation(s"graft-gateway-op-$op")
        session.ops.put(op, operation)
        val spark = boundSpark
        statementPool.submit(new Runnable {
          def run(): Unit = {
            // a cancel may land while this worker queues behind the
            // session lock — don't start a statement whose operation is
            // already terminal (its side effects must not happen)
            if (operation.status != "RUNNING") return
            // the job group makes every Spark job this statement submits
            // cancellable by CancelOperation (interruptOnCancel kills
            // straggler tasks too; cancel also revokes FUTURE jobs of
            // the group, closing the between-jobs window)
            spark.sparkContext.setJobGroup(operation.jobGroup,
              s"gateway statement $op", interruptOnCancel = true)
            try {
              val (df, _) = session.stmts.executeTagged(stmt)
              val cols = df.schema.fields.toSeq.map(f => (f.name, f.dataType))
              import scala.jdk.CollectionConverters._
              operation.finish(cols, df.toLocalIterator().asScala)
            } catch {
              case e: Throwable => operation.fail(e)
            } finally spark.sparkContext.clearJobGroup()
          }
        })
        respond(ex, 200, s"""{"operationHandle":"$op"}""")
      case ("GET", List("v1", "sessions", s, "operations", o, "status")) =>
        val op = sessions.get(s).flatMap(_.ops.get(o)).getOrElse(
          return respond(ex, 404, s"""{"errors":["unknown operation"]}"""))
        respond(ex, 200, s"""{"status":"${op.status}"}""")
      case ("POST", List("v1", "sessions", s, "operations", o, "cancel")) =>
        // CancelOperationHandler.java: stop the running statement's jobs
        // and move the operation to CANCELED; the session stays usable.
        // Wire compat (ADVICE r14): the reference REJECTS the
        // FINISHED/ERROR/CANCELED -> CANCELED transition
        // (OperationStatus.isValidStatusTransition — terminal states only
        // transition to CLOSED; OperationManager.updateState throws
        // SqlGatewayException), so cancel on an already-terminal
        // operation — including a cancel that loses the race to
        // completion — errors instead of reporting the terminal status.
        val op = sessions.get(s).flatMap(_.ops.get(o)).getOrElse(
          return respond(ex, 404, s"""{"errors":["unknown operation"]}"""))
        if (op.cancel(boundSpark))
          respond(ex, 200, """{"status":"CANCELED"}""")
        else
          respond(ex, 500,
            s"""{"errors":["Failed to convert the Operation Status from ${op.status} to CANCELED for $o."]}""")
      case ("DELETE", List("v1", "sessions", s, "operations", o, "close")) =>
        // CloseOperationHandler.java: release the operation's results —
        // cancelling first if it is still RUNNING (the reference's
        // CloseOperationHandler cancels before releasing; without this a
        // closed-while-running statement's jobs would keep executing with
        // no remaining handle able to stop them).
        val session = sessions.getOrElse(s,
          return respond(ex, 404, s"""{"errors":["unknown session $s"]}"""))
        session.ops.remove(o).foreach { op =>
          if (op.status == "RUNNING") op.cancel(boundSpark)
          op.close()
        }
        respond(ex, 200, """{"status":"CLOSED"}""")
      case (m, List("v1", "sessions", s, "complete-statement"))
          if m == "GET" || m == "POST" =>
        // CompleteStatementHandler.java: position-aware candidates —
        // SQL keywords plus the session's visible table names.
        val session = sessions.getOrElse(s,
          return respond(ex, 404, s"""{"errors":["unknown session $s"]}"""))
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val stmt = extractStatement(body)
        val pos = {
          val m2 = "\"position\"\\s*:\\s*(\\d+)".r
          m2.findFirstMatchIn(body).map(_.group(1).toInt)
            .getOrElse(stmt.length)
        }
        val cands = completeStatement(stmt, pos, session.stmts.tableNames)
        respond(ex, 200, cands.map(c => "\"" + jsonEscape(c) + "\"")
          .mkString("""{"candidates":[""", ",", "]}"))
      case ("GET", List("v1", "sessions", s, "operations", o, "result", t)) =>
        val op = sessions.get(s).flatMap(_.ops.get(o)).getOrElse(
          return respond(ex, 404, s"""{"errors":["unknown operation"]}"""))
        if (op.status == "ERROR")
          return respond(ex, 500,
            s"""{"errors":["${jsonEscape(op.error.getOrElse(""))}"]}""")
        if (op.status == "CANCELED" || op.status == "CLOSED")
          return respond(ex, 500,
            s"""{"errors":["operation is ${op.status}"]}""")
        if (op.status == "RUNNING")
          // the docs' fetch loop shape for a not-yet-ready result: empty
          // payload, nextResultUri re-pointing at the SAME token
          return respond(ex, 200,
            s"""{"results":{"columns":[],"data":[]},""" +
              s""""resultType":"NOT_READY","nextResultUri":""" +
              s""""/v1/sessions/$s/operations/$o/result/$t"}""")
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
