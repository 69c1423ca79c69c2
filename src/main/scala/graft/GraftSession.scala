package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Central place for the configs every entry point (tests, Verify, Bench,
  * user code) must agree on:
  *   - `spark.sql.legacy.parquet.nanosAsLong`: the `events` table carries
  *     parquet TIMESTAMP(NANOS) which Spark has no native type for; we read
  *     nanos as Long and surface both the exact nanos and a micro-truncated
  *     TimestampType column (see [[Tables.events]]).
  *   - UTC session timezone so timestamp semantics are stable across hosts.
  *   - AQE on: runtime join-strategy switching, partition coalescing and
  *     skew-join handling are the scale story for 100 TB inputs.
  */
object GraftSession {

  def builder(
      appName: String = "graft",
      master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Driver-generated parquet stores naive (isAdjustedToUTC=false)
      // microsecond timestamps; read them as TimestampType in the UTC
      // session rather than TIMESTAMP_NTZ so time arithmetic (unix_micros,
      // windows, watermarks) keeps working and matches the DuckDB oracle.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // plan strings truncate PushedFilters at 100 chars by default, which
      // hides pushed timestamp-range predicates from plan audits
      .config("spark.sql.maxMetadataStringLength", "1000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Build (or reuse) a session and register all graft SQL functions. */
  def get(
      appName: String = "graft",
      master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(appName, master, shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    quietBenignShutdownWarnings
    graft.functions.GraftFunctions.registerAll(spark)
    spark
  }

  /** Spark's own StreamExecution.stop() cancels the query's job group
    * even when the query is idle between triggers, and the DAGScheduler
    * then WARNs "Failed to cancel job group … Cannot find active jobs" —
    * twice per graceful stop, spamming every bench/verify tail (VERDICT
    * r12 task 8). Filter exactly that message (and nothing else) off the
    * DAGScheduler logger; real scheduler warnings still surface. Lazy
    * Unit: the filter installs exactly ONCE per JVM — re-running per
    * get() would stack duplicate filters on the logger config. */
  private lazy val quietBenignShutdownWarnings: Unit = {
      try {
        import org.apache.logging.log4j.{Level, LogManager}
        import org.apache.logging.log4j.core.LoggerContext
        import org.apache.logging.log4j.core.config.LoggerConfig
        import org.apache.logging.log4j.core.filter.RegexFilter
        val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
        val conf = ctx.getConfiguration
        val name = "org.apache.spark.scheduler.DAGScheduler"
        val filter = RegexFilter.createFilter(
          ".*Failed to cancel job group.*", null, false,
          org.apache.logging.log4j.core.Filter.Result.DENY,
          org.apache.logging.log4j.core.Filter.Result.NEUTRAL)
        conf.getLoggerConfig(name) match {
          case lc if lc.getName == name => lc.addFilter(filter)
          case _ =>
            val lc = new LoggerConfig(name, Level.WARN, true)
            lc.addFilter(filter)
            conf.addLogger(name, lc)
        }
        ctx.updateLoggers()
      } catch { case _: Throwable => () } // logging backend absent: no-op
  }
}
