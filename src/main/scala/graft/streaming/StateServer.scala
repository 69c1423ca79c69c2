package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.changelog.{RowKind, UpsertMaterialize}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** LIVE queryable state — the reference's queryable-state RPC surface
  * (flink-queryable-state/…: `QueryableStateClient.getKvState(jobId,
  * stateName, key, …)` served by the task executors' KvStateServer),
  * re-expressed Spark-first: a streaming changelog is materialized per
  * micro-batch into an in-process key→row registry (`foreachBatch` +
  * keep-last upsert — exactly the state a Flink user exposes with
  * `.asQueryableState(name)`), and point lookups are served over HTTP
  * from the driver. JDK-only (`com.sun.net.httpserver`), no deps.
  *
  * Endpoints: `GET /state/<name>?key=v1[,v2…]` → the key's latest row as
  * JSON (404 when absent or deleted); `GET /state/<name>` → registry size.
  * Semantics match the reference: reads are BEST-EFFORT against the most
  * recent completed micro-batch (Flink reads whatever the local state
  * backend holds — dirty reads by design, no cross-key consistency).
  *
  * Scale note: like the reference's per-TM KvStateServer this serves the
  * state the serving process holds. local[*] holds everything; on a
  * cluster, route the changelog to an external store via
  * [[graft.changelog.UpsertSink]] instead — this server is the dev/test
  * and single-node serving path.
  *
  * Delta vs the reference (documented): lookups address a STATE NAME on
  * one server, not (jobId, operator) across a cluster; values return as
  * JSON rows, not serializer-framed bytes.
  */
object StateServer {

  /** One named queryable state: key columns → latest live row. */
  private final class Registry(val keyCols: Seq[String], val schema: Seq[String]) {
    val rows = new ConcurrentHashMap[Seq[String], Seq[Any]]()
  }

  private val registries = new ConcurrentHashMap[String, Registry]()
  @volatile private var server: HttpServer = _

  private def jsonEscape(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.result()
  }

  /** Start (or reuse) the HTTP server on `port` and register `name`:
    * the changelog `df` (kind + seq columns, streaming) is upsert-
    * materialized per micro-batch into the registry. Returns the
    * streaming query feeding the state.
    */
  def serve(
      df: DataFrame,
      name: String,
      keyCols: Seq[String],
      port: Int,
      checkpoint: String): StreamingQuery = {
    val payCols = df.schema.fieldNames
      .filterNot(Set(RowKind.kindCol, RowKind.seqCol)).toSeq
    val reg = new Registry(keyCols, payCols)
    // bind (or port-check) the server FIRST: if ensureServer throws on a
    // port mismatch, no stale registry entry is left behind (ADVICE r8)
    ensureServer(port)
    registries.put(name, reg)
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-batch keep-last merge into the live registry: -D removes,
        // +I/+U replace — the same MERGE the upsert sink performs. The
        // collect is the serving process's own state (driver-bound by
        // design, like a TM's KvStateServer serving its local backend).
        UpsertMaterialize.lastImage(batch, keyCols).collect().foreach {
          r: Row =>
            val key = keyCols.map(c => String.valueOf(r.getAs[Any](c)))
            if (r.getAs[String](RowKind.kindCol) == RowKind.Delete)
              reg.rows.remove(key)
            else
              reg.rows.put(key, payCols.map(c => r.getAs[Any](c)))
        }
        ()
      }
      .start()
  }

  /** Point lookup without HTTP (the in-process client face). */
  def lookup(name: String, key: Seq[String]): Option[Map[String, Any]] =
    Option(registries.get(name)).flatMap(reg =>
      Option(reg.rows.get(key)).map(vs => reg.schema.zip(vs).toMap))

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
    registries.clear()
  }

  private def ensureServer(port: Int): Unit = synchronized {
    if (server != null) {
      // one server per process — a second serve() must agree on the port
      // or the caller's requested port would be silently ignored
      val bound = server.getAddress.getPort
      require(bound == port,
        s"state server already bound to port $bound; requested $port — " +
          "stop() it first or reuse the bound port")
    }
    if (server == null) {
      server = HttpServer.create(new InetSocketAddress(port), 0)
      server.createContext("/state", (ex: HttpExchange) => {
        val resp =
          try handle(ex)
          catch { case e: Exception =>
            (500, s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}""") }
        val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(resp._1, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
      server.setExecutor(null)
      server.start()
    }
  }

  private def handle(ex: HttpExchange): (Int, String) = {
    val path = ex.getRequestURI.getPath.stripPrefix("/state").stripPrefix("/")
    val reg = registries.get(path)
    if (reg == null)
      return (404, s"""{"error":"unknown state ${jsonEscape(path)}"}""")
    // getRawQuery: components are %-decoded INDIVIDUALLY after splitting,
    // so a key part containing ',' (%2C) or '&' (%26) stays addressable
    val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    val key = query.split("&").collectFirst {
      case kv if kv.startsWith("key=") =>
        kv.stripPrefix("key=").split(",", -1).toSeq
          // PERCENT-decode only: URLDecoder applies form decoding, which
          // would turn a literal '+' into a space (ADVICE r8) — shield
          // raw '+' as %2B first so keys containing '+' stay addressable
          .map(part => java.net.URLDecoder.decode(
            part.replace("+", "%2B"), StandardCharsets.UTF_8))
    }
    key match {
      case None => (200, s"""{"state":"${jsonEscape(path)}","keys":${reg.rows.size}}""")
      case Some(k) =>
        Option(reg.rows.get(k)) match {
          case None =>
            (404, s"""{"error":"no live row for key ${jsonEscape(k.mkString(","))}"}""")
          case Some(vs) =>
            val fields = reg.schema.zip(vs).map { case (n, v) =>
              val j = v match {
                case null => "null"
                case s: String => "\"" + jsonEscape(s) + "\""
                case other => String.valueOf(other)
              }
              s""""$n":$j"""
            }
            (200, fields.mkString("{", ",", "}"))
        }
    }
  }
}
