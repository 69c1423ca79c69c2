package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named, driver-checkable query per implemented operator (SURVEY.md §2).
  *
  * @param name   stable query id (keys `SparkEntry.queries`)
  * @param run    (session, sfDir) => result DataFrame
  * @param oracle equivalent DuckDB SQL over the same parquet tables, or None
  *               when the op is not SQL-expressible (driver then records a
  *               weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Registry {

  private def packs: Seq[Seq[QueryDef]] = Seq(
    AggQueries.defs,
    MiscAggQueries.defs,
    JoinQueries.defs,
    SetOpQueries.defs,
    OverQueries.defs,
    EventQueries.defs,
    FuncQueries.defs,
    CustomFuncQueries.defs,
    TextQueries.defs,
    VectorQueries.defs,
    PipelineQueries.defs,
    StreamQueries.defs,
    ChangelogQueries.defs,
    CdcQueries.defs,
    MiscOpQueries.defs,
    CepQueries.defs,
    SqlQueries.defs,
    TriggerQueries.defs,
    TpchQueries.defs,
    TpcdsQueries.defs,
    TpcdsQueries2.defs,
    TpcdsQueries3.defs,
    TpcdsQueries4.defs,
    TpcdsQueries5.defs,
    TpcdsQueries6.defs,
    TpcdsQueries7.defs,
    TpcdsQueries8.defs,
    TpcdsQueries9.defs,
    TpcdsSqlQueries.defs,
    TpcdsSqlQueries.sf1Defs
  )

  lazy val defs: Seq[QueryDef] = {
    val d = packs.flatten
    val dup = d.groupBy(_.name).collect { case (n, vs) if vs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    d
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  lazy val oracles: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** Determinism helpers for oracle-matched numeric outputs.
  *
  * Cross-engine float equality rules (Spark vs DuckDB):
  *   - never SUM raw doubles (partial-agg ordering changes low bits);
  *     cast to decimal first — decimal sums are exact in both engines —
  *     then cast the final value back to double (deterministic rounding),
  *   - averages = exact decimal sum cast to double, divided by count
  *     (IEEE division of identical operands is bit-identical),
  *   - counts / mins / maxes are naturally deterministic.
  */
object Exact {
  /** Exact sum of a double column via decimal, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(25, scale))).cast("double")

  /** Deterministic average: exact sum as double / count. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(25, scale))).cast("double") / count(lit(1))

  /** DuckDB SQL spelling of [[dsum]]. */
  def sqlSum(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(25,$scale))) AS DOUBLE)"

  /** DuckDB SQL spelling of [[davg]]. */
  def sqlAvg(e: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($e AS DECIMAL(25,$scale))) AS DOUBLE)/COUNT(*)"
}
