package graft.sources

import graft.operators.LookupClient

/** JDBC-backed [[LookupClient]]: the real external-store client for the
  * lookup join, probing a relational table with one `PreparedStatement`
  * per partition. This is the canonical store behind Flink's lookup join
  * (the public flink-connector-jdbc `JdbcRowDataLookupFunction` pairs with
  * the runtime's LookupJoinRunner.java:35 / cache tier the same way);
  * Derby's embedded driver ships with Spark, so specs and oracle queries
  * exercise a genuine JDBC round trip with zero extra dependencies.
  *
  * Lifecycle: [[open]] acquires the connection and prepares `query` (one
  * `?` bind parameter = the lookup key); [[lookup]] binds + executes and
  * reads the FIRST matching row's columns in select-list order; [[close]]
  * releases both. The surrounding [[graft.operators.LookupJoin]] supplies
  * the LRU/negative caching, micro-batching, async ORDERED mode, timeout
  * and retry — this class is deliberately just the store protocol.
  *
  * Scale: one connection per partition (the reference's per-subtask
  * layout); no state besides the prepared statement, so 1000 executors
  * mean 1000 independent connections — pool sizing is the store's
  * concern, same as any JDBC lookup deployment.
  */
final class JdbcLookupClient(
    url: String,
    query: String,
    props: Map[String, String] = Map.empty) extends LookupClient {

  @transient private var conn: java.sql.Connection = _
  @transient private var stmt: java.sql.PreparedStatement = _

  override def open(): Unit = {
    JdbcLookupClient.quietDerby()
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    conn = java.sql.DriverManager.getConnection(url, p)
    stmt = conn.prepareStatement(query)
  }

  override def close(): Unit = {
    if (stmt != null) { stmt.close(); stmt = null }
    if (conn != null) { conn.close(); conn = null }
  }

  override def lookup(key: Any): Option[Seq[Any]] = {
    require(stmt != null, "lookup before open() — client lifecycle violated")
    stmt.setObject(1, key.asInstanceOf[AnyRef])
    val rs = stmt.executeQuery()
    try {
      if (!rs.next()) None
      else {
        val n = rs.getMetaData.getColumnCount
        Some((1 to n).map(i => normalize(rs.getObject(i))))
      }
    } finally rs.close()
  }

  /** JDBC object → Spark Row-compatible external type. */
  private def normalize(v: AnyRef): Any = v match {
    case t: java.sql.Timestamp => t // TimestampType external type
    case d: java.sql.Date => d
    case c: java.sql.Clob => c.getSubString(1, c.length().toInt)
    case b: java.sql.Blob => b.getBytes(1, b.length().toInt)
    case other => other
  }
}

object JdbcLookupClient {
  /** Point Derby's home (derby.log lives there) away from the repo cwd.
    * Idempotent; only sets the property when the user hasn't. */
  private[graft] def quietDerby(): Unit = synchronized {
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home",
        System.getProperty("java.io.tmpdir", "/tmp"))
  }
}

/** One-time JDBC fixture population guard: oracle queries that probe a
  * JDBC store first materialize the dim table from parquet; this keeps the
  * write from repeating on every query invocation within a JVM. */
object JdbcFixtures {
  private val populated = scala.collection.mutable.Set.empty[String]

  def ensure(key: String)(write: => Unit): Unit = synchronized {
    if (!populated(key)) { write; populated += key }
  }
}
