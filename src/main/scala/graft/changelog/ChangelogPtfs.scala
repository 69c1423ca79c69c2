package graft.changelog

import graft.streaming.{PtfCall, SqlPtf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** The built-in changelog conversion PTFs
  * (docs/sql/reference/queries/changelog.md;
  * BuiltInFunctionDefinitions.FROM_CHANGELOG / TO_CHANGELOG): an
  * append-only table with an explicit operation-code column converts into
  * the engine's changelog convention (`__rowkind`) and back. In this
  * engine the dynamic-table side IS the `__rowkind` convention every
  * changelog operator consumes (ChangelogNormalize, RetractableAgg,
  * UpsertMaterialize …), so the pair is a pure column mapping — fully
  * codegen'd, no state, no shuffle beyond what the consumer asks for.
  */
object ChangelogPtfs {

  private val OpNames = Seq(
    "INSERT" -> RowKind.Insert,
    "UPDATE_BEFORE" -> RowKind.UpdateBefore,
    "UPDATE_AFTER" -> RowKind.UpdateAfter,
    "DELETE" -> RowKind.Delete)

  /** Expand `'c, r' -> v` comma-grouped keys into per-code entries. */
  private def expand(entries: Seq[(String, String)]): Seq[(String, String)] =
    entries.flatMap { case (ks, v) =>
      ks.split(",").map(_.trim).filter(_.nonEmpty).map(_ -> v) }

  /** `FROM_CHANGELOG(input => TABLE t [PARTITION BY k [ORDER BY ts]],
    * [op => DESCRIPTOR(c),] [op_mapping => MAP['c,r','INSERT',…],]
    * [error_handling => 'FAIL'|'SKIP'])` — append table with op codes →
    * `__rowkind` changelog. With ORDER BY, `__seq` derives from the first
    * sort column (epoch micros for time attributes) so downstream
    * changelog folds replay in event order; otherwise arrival order is
    * kept with a constant seq, as the reference assumes in-order input. */
  object FromChangelog extends SqlPtf {
    override def name: String = "FROM_CHANGELOG"

    override def apply(input: DataFrame, call: PtfCall): DataFrame = {
      val opCol = call.named.getOrElse("op", "op")
      require(input.columns.exists(_.equalsIgnoreCase(opCol)),
        s"FROM_CHANGELOG: op column $opCol not in " +
          input.columns.mkString(", "))
      // code → engine kind; default mapping = TO_CHANGELOG's inverse
      val mapping: Seq[(String, String)] =
        call.maps.get("op_mapping") match {
          case Some(m) =>
            val byName = OpNames.toMap
            expand(m).map { case (code, opName) =>
              code -> byName.getOrElse(opName.toUpperCase,
                throw new IllegalArgumentException(
                  s"FROM_CHANGELOG: unknown change operation '$opName' " +
                    s"(expected ${OpNames.map(_._1).mkString(", ")})"))
            }
          case None => OpNames.map { case (n, k) => n -> k }
        }
      val skip = call.named.get("error_handling")
        .exists(_.equalsIgnoreCase("SKIP"))
      val op = trim(col(opCol))
      val kind = mapping.foldRight(
        if (skip) lit(null: String)
        else raise_error(concat(lit("FROM_CHANGELOG: unmapped op code '"),
          coalesce(col(opCol), lit("<null>")), lit("'")))) {
        case ((code, k), other) => when(op === code, lit(k)).otherwise(other)
      }
      val keep = input.columns.filterNot(_.equalsIgnoreCase(opCol)).toSeq
      val seq: org.apache.spark.sql.Column = call.orderBy.headOption match {
        case Some(o) => input.schema(o).dataType match {
          case TimestampType => unix_micros(col(o))
          case _ => col(o).cast(LongType)
        }
        case None => lit(1L)
      }
      val out = input
        .withColumn(RowKind.kindCol, kind)
        .withColumn(RowKind.seqCol, seq)
        .select(keep.map(col) :+ col(RowKind.kindCol) :+
          col(RowKind.seqCol): _*)
      if (skip) out.where(col(RowKind.kindCol).isNotNull) else out
    }
  }

  /** `TO_CHANGELOG(input => TABLE t, [op => DESCRIPTOR(c),]
    * [op_mapping => MAP['INSERT','I',…],] [produces_full_deletes =>
    * BOOLEAN])` — `__rowkind` changelog → append table whose FIRST column
    * is the op code (the reference's `[op_column, all_input_columns]`
    * shape). A custom op_mapping forwards only the mapped operations;
    * `produces_full_deletes => false` nulls every non-key column on
    * DELETE rows (partial deletes for key-only sinks). */
  object ToChangelog extends SqlPtf {
    override def name: String = "TO_CHANGELOG"

    override def apply(input: DataFrame, call: PtfCall): DataFrame = {
      require(input.columns.contains(RowKind.kindCol),
        s"TO_CHANGELOG expects a changelog input (a ${RowKind.kindCol} " +
          "column) — produce one with FROM_CHANGELOG or a changelog op")
      val opCol = call.named.getOrElse("op", "op")
      val mapping: Seq[(String, String)] = call.maps.get("op_mapping") match {
        case Some(m) =>
          val byName = OpNames.toMap
          expand(m).map { case (opName, code) =>
            byName.getOrElse(opName.toUpperCase,
              throw new IllegalArgumentException(
                s"TO_CHANGELOG: unknown change operation '$opName'")) -> code
          }
        case None => OpNames.map { case (n, k) => k -> n }
      }
      val kind = col(RowKind.kindCol)
      val code = mapping.foldRight(lit(null: String)) {
        case ((k, c), other) => when(kind === k, lit(c)).otherwise(other)
      }
      val fullDeletes = !call.named.get("produces_full_deletes")
        .exists(_.equalsIgnoreCase("false"))
      val valueCols = input.columns.toSeq
        .filterNot(c => c == RowKind.kindCol || c == RowKind.seqCol)
      val values = valueCols.map { c =>
        if (fullDeletes || call.partitionBy.exists(_.equalsIgnoreCase(c)))
          col(c)
        else when(kind === RowKind.Delete, lit(null)).otherwise(col(c)).as(c)
      }
      input
        .select((code.as(opCol) +: values): _*)
        .where(col(opCol).isNotNull) // custom mapping forwards mapped ops only
    }
  }
}
