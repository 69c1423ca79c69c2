package graft.sql

import graft.changelog.{CdcFormats, RowKind, UpsertSink}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC formats on the DDL/SQL source face (VERDICT r17 task 2): a table
  * declared `WITH ('format'='debezium-json' | 'canal-json' |
  * 'maxwell-json' | 'ogg-json')` reads its files as CDC envelope streams
  * — the reference's changelog formats
  * (`docs/content/docs/connectors/table/formats/debezium.md`;
  * flink-formats/flink-json `DebeziumJsonDeserializationSchema.java` et
  * al.), decoded by the existing [[graft.changelog.CdcFormats]] parsers.
  *
  * Batch face: the bounded envelope log folds to final table state on the
  * source's PRIMARY KEY (keep-last by the envelope timestamp, deletes
  * dropped) — a batch query over a CDC table sees the table, not the log.
  *
  * Streaming face ("CDC in, changelog out" through pure SQL text): an
  * `INSERT INTO sink SELECT … FROM cdc_src …` routes here, because a
  * decoded changelog carries retractions (`-U`/`-D`) that Spark's
  * insert-only streaming operators cannot consume directly. Two tiers,
  * chosen from the compiled plan — both fully incremental, O(delta) state
  * flow per micro-batch:
  *
  *   - '''Signed aggregation''' (the reference's retract-consuming group
  *     aggregate, `StreamExecGroupAggregate` fed by a CDC source): a
  *     top-level `GROUP BY` rewrites each aggregate into its
  *     signed-contribution form over the decoded log — `COUNT(*)` →
  *     `SUM(sign)`, `SUM(x)` → `SUM(sign·x)`, `AVG(x)` →
  *     `SUM(sign·x)/SUM(sign·[x≠null])`, where sign is +1 for `+I`/`+U`
  *     rows and −1 for `-U`/`-D` rows (a `WHERE` over value columns
  *     filters both images symmetrically, so predicate exits retract
  *     correctly). The rewritten plan is a STANDARD Spark streaming
  *     aggregate — per-group running sums in state, Update output mode —
  *     and each micro-batch MERGEs into the sink on its PRIMARY KEY. A
  *     hidden `SUM(sign)` liveness column detects groups whose last live
  *     row was deleted: those MERGE as `-D`, the reference's
  *     group-agg retraction when a count reaches zero. MIN/MAX (and
  *     DISTINCT aggregates) need retractable multiset state the rewrite
  *     cannot express — they fail loudly toward the DataStream tier
  *     ([[graft.changelog.Changelog]] RetractableAgg).
  *
  *   - '''Changelog passthrough''' (the reference's ChangelogNormalize +
  *     DropUpdateBefore over a projected/filtered CDC source): with no
  *     aggregation, the decoded rows flow as a changelog with `-U`
  *     degraded to `-D` at `seq·2` and new images at `seq·2+1` (the same
  *     total order a topic offset would give the pair), MERGEd into the
  *     sink by its PRIMARY KEY — so an update whose new image leaves a
  *     `WHERE` predicate set still deletes the sink row via its
  *     surviving before-image.
  */
object StreamingCdc {

  /** Hidden signed-contribution column added by the streaming decode. */
  val SignCol = "__sign"

  private val decoders
      : Map[String, (DataFrame, String, StructType) => DataFrame] = Map(
    "debezium-json" -> CdcFormats.fromDebezium,
    "canal-json" -> CdcFormats.fromCanal,
    "maxwell-json" -> CdcFormats.fromMaxwell,
    "ogg-json" -> CdcFormats.fromOgg)

  def isCdcFormat(format: String): Boolean = decoders.contains(format)

  /** Envelope lines → changelog rows (value columns + `__rowkind` +
    * `__seq`), for the batch face. */
  def decodeBatch(
      raw: DataFrame, format: String, valueSchema: StructType): DataFrame =
    decoders(format)(raw, raw.columns.head, valueSchema)

  /** As [[decodeBatch]] plus the hidden `__sign` column the streaming
    * signed-aggregation rewrite consumes. */
  def decode(
      raw: DataFrame, format: String, valueSchema: StructType): DataFrame =
    decodeBatch(raw, format, valueSchema).withColumn(SignCol,
      when(col(RowKind.kindCol).isin(RowKind.Insert, RowKind.UpdateAfter),
        lit(1L)).otherwise(lit(-1L)))

  /** Envelope timestamps tie at millisecond resolution (a row updated
    * then deleted in one transaction shares one `ts_ms`), and keep-last
    * materialization MUST resolve such ties in LOG order — the reference
    * orders by topic offset. The decode preserves arrival order within a
    * file partition (narrow ops only), so a per-partition row counter is
    * the offset's stand-in: seq' = ts·2^20 + (counter mod 2^20). Within
    * one envelope the explode emits `-U` before `+U`, so an in-place
    * update keeps its new image, and a later delete at the same
    * timestamp wins over both. Cross-partition ties stay
    * timestamp-ordered (the pre-existing contract). */
  def withArrivalSeq(log: DataFrame): DataFrame =
    log.withColumn(RowKind.seqCol,
      col(RowKind.seqCol) * lit(1L << 20) +
        pmod(monotonically_increasing_id(), lit(1L << 20)))

  /** Does this compiled plan read a CDC-format source? (The decoded
    * source is the only thing that puts a `__sign` attribute in a plan.) */
  def referencesCdc(df: DataFrame): Boolean =
    df.queryExecution.analyzed
      .find(p => p.output.exists(_.name == SignCol)).isDefined

  private def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.GraftPlans.ofRows(spark, plan)

  /** Project a micro-batch onto the sink's declared physical schema
    * ([[FlinkDdl.alignToSink]]'s rule: by name when the names line up,
    * positionally otherwise — the batch's value columns keep the user's
    * select-list order) KEEPING the changelog metadata columns for the
    * MERGE. */
  private def alignKeeping(
      spec: FlinkDdl.TableSpec, df: DataFrame): DataFrame = {
    val declared = spec.columns.collect {
      case FlinkDdl.ColumnSpec(n, Some(t), _, false, _) => (n, t) }
    if (declared.isEmpty) df
    else {
      val meta = Set(RowKind.kindCol, RowKind.seqCol, LiveCol, SignCol)
      val values = df.columns.filterNot(meta)
      val byName = declared.forall { case (n, _) =>
        values.exists(_.equalsIgnoreCase(n)) }
      require(byName || values.length == declared.size,
        s"INSERT into ${spec.name}: query has ${values.length} columns, " +
          s"sink declares ${declared.size}")
      df.select(declared.zipWithIndex.map { case ((n, t), i) =>
        (if (byName) col(values.find(_.equalsIgnoreCase(n)).get)
         else col(values(i))).cast(t).as(n)
      } ++ Seq(col(RowKind.kindCol), col(RowKind.seqCol)): _*)
    }
  }

  private def requireUpsertSink(spec: FlinkDdl.TableSpec): Unit = {
    require(spec.connector == "filesystem",
      s"CDC-sourced INSERT supports filesystem sinks, not " +
        s"'${spec.connector}' (${spec.name})")
    require(spec.primaryKey.nonEmpty,
      s"Table sink '${spec.name}' doesn't support consuming update and " +
        "delete changes which are produced by a CDC-format source — " +
        "declare a PRIMARY KEY on the sink so it can upsert")
    require(spec.format == "parquet",
      s"Table sink '${spec.name}': upsert materialization of a CDC query " +
        s"is parquet-backed; declared format '${spec.format}' cannot " +
        "store the merge state — declare 'format'='parquet'")
  }

  /** Start the continuous query for `INSERT INTO spec <compiled>` where
    * the compiled plan reads a CDC source. Returns (query, checkpoint). */
  def start(
      spark: SparkSession,
      spec: FlinkDdl.TableSpec,
      compiled: DataFrame)
      : (org.apache.spark.sql.streaming.StreamingQuery, String) = {
    requireUpsertSink(spec)
    val ckpt = spec.options.getOrElse("sink.checkpoint-dir",
      java.nio.file.Files
        .createTempDirectory(s"graft_cdc_ck_${spec.name}_").toString)
    val analyzed = compiled.queryExecution.analyzed
    val pk = spec.primaryKey
    // honor the sink's declared bucketing like the update tier: a
    // bucketed MERGE only reads/rewrites the buckets a batch touches —
    // the at-scale I/O shape for big key spaces
    val buckets = spec.options.get("distribution-buckets").map(_.toInt)
    def merge(batch: DataFrame, log: DataFrame): Unit = buckets match {
      case Some(n) => UpsertSink.applyBatchBucketed(
        batch.sparkSession, spec.path, log, pk, n)
      case None => UpsertSink.applyBatch(
        batch.sparkSession, spec.path, log, pk)
    }

    // Top-level aggregate (optionally under an attribute-only Project the
    // analyzer sometimes leaves above it) → signed-aggregation tier.
    val aggRoot: Option[(Aggregate, Option[Project])] = analyzed match {
      case a: Aggregate => Some((a, None))
      case p @ Project(pl, a: Aggregate)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        Some((a, Some(p)))
      case _ => None
    }

    val q = aggRoot match {
      case Some((agg, outer)) =>
        val sign = agg.child.output.find(_.name == SignCol).getOrElse(
          throw new IllegalArgumentException(
            "CDC aggregation must group the CDC source directly " +
              "(subqueries/joins between the source and the GROUP BY " +
              "are not supported on the SQL streaming entry)"))
        val rewritten = rewriteAggregate(agg, sign)
        val plan = outer match {
          case Some(p) =>
            val live = rewritten.aggregateExpressions.last.toAttribute
            Project(p.projectList :+ live, rewritten)
          case None => rewritten
        }
        ofRows(spark, plan).writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            // groups whose live-row count reached zero retract (-D); the
            // rest upsert at a batch-monotonic seq, superseding stored
            // state (seq 0). Replay-idempotent like the update tier.
            val log = batch
              .withColumn(RowKind.kindCol,
                when(col(LiveCol) > 0, RowKind.UpdateAfter)
                  .otherwise(RowKind.Delete))
              .withColumn(RowKind.seqCol, lit(batchId + 1L))
              .drop(LiveCol)
            merge(batch, alignKeeping(spec, log))
          }
          .start()

      case None =>
        // Passthrough tier: projection/filter only. Thread the changelog
        // columns through the top Project (they are pruned nowhere else
        // at analysis time); reject shapes where they are unreachable.
        val plan = analyzed match {
          case p: Project =>
            val meta = Seq(RowKind.kindCol, RowKind.seqCol).map { n =>
              p.child.output.find(_.name == n).getOrElse(
                throw new IllegalArgumentException(
                  "CDC passthrough INSERT must select from the CDC " +
                    "source directly (nested subqueries dropped the " +
                    "changelog columns)"))
            }
            Project(p.projectList ++ meta, p.child)
          case other if Seq(RowKind.kindCol, RowKind.seqCol)
              .forall(n => other.output.exists(_.name == n)) => other
          case _ => throw new IllegalArgumentException(
            "unsupported CDC query shape: expected a top-level GROUP BY " +
              "(signed-aggregation tier) or a projection/filter " +
              "(changelog passthrough)")
        }
        ofRows(spark, plan).writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            // -U degrades to -D, and [[withArrivalSeq]] imposes log order
            // on envelope-timestamp ties (review r18: the old seq·2+bit
            // scheme made a same-ts delete LOSE to the update before it),
            // so keep-last resolves in-place updates to the new image,
            // predicate exits to the delete, and update-then-delete in
            // one transaction to the delete.
            val log = withArrivalSeq(batch)
              .withColumn(RowKind.kindCol,
                when(col(RowKind.kindCol) === RowKind.UpdateBefore,
                  RowKind.Delete).otherwise(col(RowKind.kindCol)))
            merge(batch, alignKeeping(spec, log))
          }
          .start()
    }
    (q, ckpt)
  }

  /** Hidden liveness column: `SUM(sign)` = number of live rows in the
    * group — 0 means the group left the table and the sink must delete. */
  private val LiveCol = "__live"

  /** Rewrite each aggregate into its signed form and append the liveness
    * aggregate (always LAST in the output). */
  private def rewriteAggregate(agg: Aggregate, sign: Attribute): Aggregate = {
    def signedLive(e: Expression): Sum =
      new Sum(If(IsNull(e), Literal(0L), sign))
    val rewritten = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression if ae.isDistinct || ae.filter.isDefined =>
          throw new IllegalArgumentException(
            "DISTINCT/FILTER aggregates over a CDC source need " +
              "retractable distinct state — use the DataStream changelog " +
              "tier (RetractableAgg) for this query")
        case ae: AggregateExpression => ae.aggregateFunction match {
          case Count(es) if es.forall(_.foldable) => // COUNT(*) / COUNT(1)
            ae.copy(aggregateFunction = new Sum(sign))
          case Count(Seq(e)) =>
            ae.copy(aggregateFunction = signedLive(e))
          case s: Sum =>
            ae.copy(aggregateFunction =
              s.copy(child = Multiply(s.child, Cast(sign, s.child.dataType))))
          case Average(e, _) =>
            Divide(
              new Sum(Multiply(Cast(e, DoubleType), Cast(sign, DoubleType)))
                .toAggregateExpression(),
              Cast(signedLive(e).toAggregateExpression(), DoubleType))
          case other => throw new IllegalArgumentException(
            s"aggregate ${other.prettyName} over a CDC-format source " +
              "needs retractable aggregate state; the SQL streaming entry " +
              "supports COUNT/SUM/AVG (use the DataStream changelog tier " +
              "for MIN/MAX/retractable collections)")
        }
      }.asInstanceOf[NamedExpression]
    }
    val live = Alias(new Sum(sign).toAggregateExpression(), LiveCol)()
    agg.copy(aggregateExpressions = rewritten :+ live)
  }
}
