package graft.sql

import org.apache.spark.sql.SparkSession

/** Stored-procedure SPI (reference:
  * flink-table-common/…/procedures/Procedure.java and
  * …/procedure/ProcedureContext.java; docs dev/table/procedures.md):
  * procedures live in a catalog (`Catalog.getProcedure`) and run with
  * `CALL [catalog.][db.]proc(args…)`. graft keys them by qualified
  * name in the runner's procedure registry — the same place the
  * reference's catalog lookup lands — and the returned array becomes
  * the statement's result rows (single `result` column, the
  * CallProcedureOperation output contract for scalar arrays).
  *
  * The reference's `call` methods are JVM-overloaded with typed
  * parameters; graft's single entry receives the parsed literal
  * arguments (String / Long / Double / Boolean / null) and does its
  * own dispatch — same expressive power, no reflection. */
trait Procedure extends Serializable {
  def call(ctx: ProcedureContext, args: Seq[Any]): Seq[Any]
}

/** ProcedureContext.java: `getExecutionEnvironment` hands the
  * reference's procedures a StreamExecutionEnvironment; graft hands
  * the SparkSession (and the V1 facade env derived from it). */
final class ProcedureContext(val spark: SparkSession) {
  def getExecutionEnvironment: graft.stream.StreamExecutionEnvironment =
    graft.stream.StreamExecutionEnvironment.create(spark)
}

object Procedures {
  /** The docs' worked example (GenerateSequenceProcedure,
    * procedures.md): `generate_n(n)` → 0 … n-1, distributed through
    * the environment rather than built on the driver. */
  object GenerateSequence extends Procedure {
    def call(ctx: ProcedureContext, args: Seq[Any]): Seq[Any] = {
      val n = args match {
        case Seq(x: Long) => x
        case Seq(s: String) => s.toLong
        case _ => throw new IllegalArgumentException(
          s"generate_n(n): expected one integer argument, got $args")
      }
      ctx.spark.range(n).collect().toSeq
    }
  }

  /** Default registry: the `system` database procedures every catalog
    * exposes in the docs' examples. */
  val builtin: Map[String, Procedure] = Map(
    "system.generate_n" -> GenerateSequence)
}
