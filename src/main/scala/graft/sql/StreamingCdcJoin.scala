package graft.sql

import graft.changelog.{ChangelogJoin, RowKind}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._

/** CDC JOIN routing on the SQL streaming entry (VERDICT r18 task 2): an
  * `INSERT INTO sink SELECT … FROM cdc_a JOIN cdc_b ON a.k = b.k` (or
  * `cdc JOIN dim`) compiles to a Catalyst Join that Spark's stream-stream
  * join cannot run — the inputs carry retractions. The reference runs
  * these as its regular streaming join over changelogs
  * (`StreamingJoinOperator.java:38`; docs `dev/table/sql/queries/joins.md`
  * "Regular Joins"); graft already HAS that operator
  * ([[graft.changelog.ChangelogJoin]]), so this object only routes: it
  * decomposes the analyzed plan at the Join node, rebuilds each side as a
  * decoded changelog DataFrame, hands the pair to ChangelogJoin, and
  * re-applies the user's projection/filters above the joined changelog.
  *
  * Scope (loud errors elsewhere): one INNER/LEFT/RIGHT/FULL equi-join
  * (single `l = r` condition; the outer variants ride ChangelogJoin's
  * null-padding retraction protocol) between two sides that are each a CDC-format source or an
  * append-only streaming table with a declared PRIMARY KEY — possibly
  * under projections/filters, which re-thread the changelog metadata
  * columns. N-way joins route via the DataStream multi-join tier
  * ([[graft.changelog.ChangelogMultiJoin]]).
  *
  * Seq discipline: both sides get [[StreamingCdc.withArrivalSeq]]
  * (envelope ts in the high bits + per-partition arrival counter — the
  * topic-offset stand-in), ChangelogJoin then stamps `2·seq + bit`,
  * still within Long range (ts·2^21 ≈ 2^62). A filter above the join
  * applies symmetrically to old and new images, so predicate exits
  * retract correctly — the same argument as the aggregate tier's WHERE.
  */
private[sql] object StreamingCdcJoin {

  private def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.GraftPlans.ofRows(spark, plan)

  private val metaNames =
    Seq(RowKind.kindCol, RowKind.seqCol, StreamingCdc.SignCol)

  /** Is there a Join anywhere in this plan? */
  def hasJoin(p: LogicalPlan): Boolean =
    p.collectFirst { case j: Join => j }.isDefined

  /** Rebind every attribute in `e` onto `out` by (case-insensitive)
    * name — the joined changelog preserves payload column names, so the
    * user's projection/filter expressions re-resolve against it. */
  private[sql] def rebind(e: Expression, out: Seq[Attribute]): Expression =
    e.transformUp {
      case a: AttributeReference =>
        out.find(_.name.equalsIgnoreCase(a.name)).getOrElse(
          throw new IllegalArgumentException(
            s"column ${a.name} is not visible above the CDC streaming " +
              "join (was it projected away below the join?)"))
    }

  private def rebindNamed(
      ne: NamedExpression, out: Seq[Attribute]): NamedExpression =
    rebind(ne, out).asInstanceOf[NamedExpression]

  /** Build the joined changelog for a plan of shape
    * `[Project >] [Filter >] Join` (SubqueryAliases transparent), with
    * the user's projections/filters re-applied ABOVE the changelog join
    * and the metadata columns threaded through. Returns the changelog
    * DataFrame plus the post-projection names of the two sides' upsert
    * keys (the join output's pairing identity — what a PK sink must key
    * on). None when the plan holds no Join. */
  def changelogOf(
      spark: SparkSession,
      plan: LogicalPlan,
      sources: Seq[FlinkDdl.TableSpec]): Option[(DataFrame, Set[String])] = {
    // Single-pass rebind (r20, VERDICT r19 task 3): the recursion builds
    // the rebound Project/Filter hops directly on the ANALYZED join plan
    // and materializes ONE DataFrame at the top — the previous per-hop
    // `ofRows` round trips re-ran the full analyzer over the (large)
    // changelog-join subtree once per hop, ~0.5-1 s of out-of-batch
    // driver time on every `q_sql_*` streaming join query. The rebound
    // expressions reference the child's resolved output attributes, so
    // the single top-level analysis is a cheap already-resolved pass.
    def loop(p: LogicalPlan): Option[(LogicalPlan, Set[String])] =
      p match {
        case Project(pl, child) =>
          loop(child).map { case (c, keys) =>
            val out = c.output
            val rebound = pl.map(rebindNamed(_, out))
            val metaAttrs = Seq(RowKind.kindCol, RowKind.seqCol)
              .flatMap(n => out.find(_.name == n))
              .filterNot(a => rebound.exists(_.name == a.name))
            // pairing-key provenance through the rename: an entry whose
            // expression is a bare reference to a key keeps it alive under
            // its output name; a key absent from the list is dropped (the
            // caller's PK validation then rejects the shape loudly)
            val keptKeys = rebound.flatMap { ne =>
              val inner = ne match { case al: Alias => al.child; case e => e }
              inner match {
                case ar: AttributeReference if keys(ar.name.toLowerCase) =>
                  Some(ne.name.toLowerCase)
                case _ => None
              }
            }.toSet
            (Project(rebound ++ metaAttrs, c), keptKeys)
          }
        case Filter(cond, child) =>
          loop(child).map { case (c, keys) =>
            (Filter(rebind(cond, c.output), c), keys)
          }
        case s: SubqueryAlias => loop(s.child)
        case j: Join =>
          val (df, keys) = buildJoin(spark, j, sources)
          Some((df.queryExecution.analyzed, keys))
        case _ => None
      }
    loop(plan).map { case (p, keys) => (ofRows(spark, p), keys) }
  }

  private def buildJoin(
      spark: SparkSession,
      j: Join,
      sources: Seq[FlinkDdl.TableSpec]): (DataFrame, Set[String]) = {
    import org.apache.spark.sql.catalyst.plans.{
      FullOuter, Inner, LeftOuter, RightOuter}
    val joinType = j.joinType match {
      case Inner => "inner"
      case LeftOuter => "left"
      case RightOuter => "right"
      case FullOuter => "full"
      case other => throw new IllegalArgumentException(
        s"CDC streaming join supports INNER/LEFT/RIGHT/FULL equi-joins " +
          s"on the SQL entry; ${other.sql} routes via the DataStream " +
          "changelog tier (ChangelogSemiJoin)")
    }
    val cond = j.condition.getOrElse(throw new IllegalArgumentException(
      "CDC streaming join needs an equi-join condition (ON l.k = r.k)"))
    val (lk, rk) = cond match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b))
          (a, b)
        else if (j.left.outputSet.contains(b) &&
          j.right.outputSet.contains(a)) (b, a)
        else throw new IllegalArgumentException(
          "CDC streaming join condition must compare one column from " +
            "each side")
      case _ => throw new IllegalArgumentException(
        "CDC streaming join supports a single equi-join condition " +
          s"(ON l.k = r.k); got: ${cond.sql}")
    }
    val (lDf, lPk) = sideChangelog(spark, j.left, sources)
    val (rDf, rPk) = sideChangelog(spark, j.right, sources)
    (ChangelogJoin(lDf, rDf, lk.name, rk.name, lPk, rPk, joinType),
      Set(lPk.toLowerCase, rPk.toLowerCase))
  }

  /** One join input as a full changelog: a CDC side keeps its decoded
    * `__rowkind`/`__seq` (re-threaded through any pruning projections);
    * an append-only streaming side (a dim table fed by files) synthesizes
    * `+I` rows — its PRIMARY KEY is still the upsert identity, and a key
    * re-delivered later supersedes in join state and downstream MERGE.
    * Both get the arrival-seq total order. */
  private def sideChangelog(
      spark: SparkSession,
      side: LogicalPlan,
      sources: Seq[FlinkDdl.TableSpec]): (DataFrame, String) = {
    if (hasJoin(side)) throw new IllegalArgumentException(
      "n-way CDC joins are not routed on the SQL streaming entry — " +
        "compose them via the DataStream multi-join tier " +
        "(graft.changelog.ChangelogMultiJoin)")
    def hasMeta(p: LogicalPlan): Boolean =
      Seq(RowKind.kindCol, RowKind.seqCol)
        .forall(n => p.output.exists(_.name == n))
    // re-thread the changelog metadata through pruning projections (the
    // user's SELECT inside a subquery drops them; filters/aliases don't)
    def rethread(p: LogicalPlan): LogicalPlan =
      if (hasMeta(p)) p
      else p match {
        case pr: Project =>
          val c = rethread(pr.child)
          val add = metaNames.flatMap(n => c.output.find(_.name == n))
            .filterNot(a => pr.projectList.exists(_.name == a.name))
          Project(pr.projectList ++ add, c)
        case f: Filter => f.copy(child = rethread(f.child))
        case s: SubqueryAlias => rethread(s.child)
        case other => other
      }
    val df0 = ofRows(spark, rethread(side))
    val isCdc = df0.columns.contains(RowKind.kindCol) &&
      df0.columns.contains(RowKind.seqCol)
    val df1 =
      if (isCdc) df0.drop(StreamingCdc.SignCol)
      else {
        require(df0.isStreaming,
          "a non-CDC join input on the CDC streaming entry must itself " +
            "be a streaming table (a bounded batch side would freeze at " +
            "its first snapshot)")
        df0.withColumn(RowKind.kindCol, lit(RowKind.Insert))
          .withColumn(RowKind.seqCol, lit(0L))
      }
    val valueCols = df1.columns
      .filterNot(Set(RowKind.kindCol, RowKind.seqCol)).map(_.toLowerCase)
    val spec = specFor(sources, valueCols.toSet).getOrElse(
      throw new IllegalArgumentException(
        "cannot resolve the upsert key of a CDC join input: no declared " +
          s"table with a PRIMARY KEY matches columns " +
          s"[${valueCols.mkString(", ")}]"))
    require(spec.primaryKey.size == 1,
      s"CDC streaming join input '${spec.name}': composite PRIMARY KEYs " +
        "are not supported as the join-side upsert key on the SQL entry " +
        "(single-column keys only)")
    val pk = df1.columns.find(_.equalsIgnoreCase(spec.primaryKey.head))
      .getOrElse(throw new IllegalArgumentException(
        s"PRIMARY KEY column ${spec.primaryKey.head} of '${spec.name}' " +
          "must be selected on its side of the CDC join"))
    (StreamingCdc.withArrivalSeq(df1), pk)
  }

  /** The declared source table whose physical columns (and PRIMARY KEY)
    * all appear in this side's value columns — the side's identity. */
  private def specFor(
      sources: Seq[FlinkDdl.TableSpec],
      valueCols: Set[String]): Option[FlinkDdl.TableSpec] = {
    val matches = sources.filter { s =>
      val phys = s.columns.collect {
        case FlinkDdl.ColumnSpec(n, Some(_), _, false, _) => n.toLowerCase }
      s.primaryKey.nonEmpty && phys.nonEmpty &&
        phys.toSet.subsetOf(valueCols)
    }
    matches match {
      case Seq(one) => Some(one)
      case Seq() => None
      case many => throw new IllegalArgumentException(
        "ambiguous upsert-key resolution for a CDC join input: tables " +
          s"${many.map(_.name).mkString(", ")} all match its columns")
    }
  }
}
