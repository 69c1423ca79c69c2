package graft.table

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.{functions => F}

/** The reference's fluent Table API re-expressed over DataFrames — the
  * `TableEnvironment` / `Table` / expression-DSL surface
  * (flink-table/flink-table-api-java/src/main/java/org/apache/flink/
  * table/api/Table.java, TableEnvironment.java, Expressions.java), so a
  * migrating Table-API program keeps its SHAPE:
  *
  * {{{
  * val env = TableEnvironment.create(spark)
  * env.createTemporaryView("orders", ordersDf)
  * env.from("orders")
  *   .filter($("o_totalprice").isGreater(lit(100.0)))
  *   .groupBy($("o_orderpriority"))
  *   .select($("o_orderpriority"), $("o_totalprice").sum.as("total"))
  *   .orderBy($("o_orderpriority"))
  * }}}
  *
  * Every operation is a thin, lazy mapping onto the equivalent
  * DataFrame operation — Catalyst sees exactly the plan the DataFrame
  * DSL would build (no extra execution layer), and streaming inputs
  * stay streaming. Group windows mirror Tumble/Slide/Session
  * (GroupWindow.java) onto Spark's native `window()` /
  * `session_window()`; over windows map onto Spark Window specs.
  *
  * Deliberate deltas (documented): expression strings ("a + 1") are not
  * parsed — the typed DSL only; `execute()` collects eagerly like the
  * reference's `TableResult#collect` but returns plain Rows.
  */
object api {

  /** Expressions.$ — a field reference. */
  def $(name: String): Expr = new Expr(F.col(name), Some(name))

  /** Expressions.lit. */
  def lit(v: Any): Expr = new Expr(F.lit(v))

  /** Expressions.nullOf analog (typed NULL literal). */
  def nullOf(dt: org.apache.spark.sql.types.DataType): Expr =
    new Expr(F.lit(null).cast(dt))

  /** ApiExpression surface: Flink's fluent method names over a Spark
    * Column. Each call returns a new immutable Expr. `name` tracks the
    * statically-known output name (a field reference or an alias) —
    * grouped/windowed selects resolve columns through it without
    * touching Catalyst internals. `overMark` flags `agg.over($("w"))`
    * calls: the over-window select applies the window spec (and then
    * the alias) to marked expressions. */
  final class Expr private[table] (
      private[table] val col: Column,
      private[table] val name: Option[String] = None,
      private[table] val overMark: Boolean = false,
      private[table] val overAlias: Option[String] = None,
      private[table] val aggMark: Boolean = false) {
    // derived expressions keep (and merge) aggregate-ness so the
    // grouped-select key/aggregate classification cannot be bypassed by
    // wrapping an aggregate in arithmetic (review r11)
    private def mk(c: Column) = new Expr(c, aggMark = aggMark)
    private def mk2(c: Column, o: Expr) =
      new Expr(c, aggMark = aggMark || o.aggMark)
    private def mkAgg(c: Column) = new Expr(c, aggMark = true)

    /** Apply this aggregate over the select's over-window (Table.java
      * window(OverWindow).select). The argument must name the declared
      * OverWindow's alias — validated at select time, as the reference
      * validates unresolved over-window references. */
    def over(window: Expr): Expr =
      new Expr(col, name, overMark = true,
        overAlias = window.name, aggMark = aggMark)

    // arithmetic (ApiExpression plus/minus/times/dividedBy/mod)
    def plus(o: Expr): Expr = mk2(col + o.col, o)
    def minus(o: Expr): Expr = mk2(col - o.col, o)
    def times(o: Expr): Expr = mk2(col * o.col, o)
    def dividedBy(o: Expr): Expr = mk2(col / o.col, o)
    def mod(o: Expr): Expr = mk2(col % o.col, o)

    // comparison
    def isEqual(o: Expr): Expr = mk2(col === o.col, o)
    def isNotEqual(o: Expr): Expr = mk2(col =!= o.col, o)
    def isGreater(o: Expr): Expr = mk2(col > o.col, o)
    def isGreaterOrEqual(o: Expr): Expr = mk2(col >= o.col, o)
    def isLess(o: Expr): Expr = mk2(col < o.col, o)
    def isLessOrEqual(o: Expr): Expr = mk2(col <= o.col, o)
    def isNull: Expr = mk(col.isNull)
    def isNotNull: Expr = mk(col.isNotNull)
    def between(lo: Expr, hi: Expr): Expr =
      new Expr(col.between(lo.col, hi.col),
        aggMark = aggMark || lo.aggMark || hi.aggMark)
    def in(vs: Expr*): Expr = mk(col.isin(vs.map(_.col): _*))
    def like(pattern: String): Expr = mk(col.like(pattern))

    // logic
    def and(o: Expr): Expr = mk2(col && o.col, o)
    def or(o: Expr): Expr = mk2(col || o.col, o)
    def not: Expr = mk(!col)

    // naming / ordering / casting; on an over-marked expression the
    // alias applies AFTER the window spec (at select time)
    def as(alias: String): Expr =
      if (overMark)
        new Expr(col, Some(alias), overMark = true, overAlias, aggMark)
      else new Expr(col.as(alias), Some(alias), aggMark = aggMark)
    def asc: Expr = mk(col.asc)
    def desc: Expr = mk(col.desc)
    def cast(dt: org.apache.spark.sql.types.DataType): Expr =
      mk(col.cast(dt))

    // aggregates (ApiExpression sum/avg/count/max/min/…) — marked so
    // grouped selects classify by aggregate-ness, never by name alone
    def sum: Expr = mkAgg(F.sum(col))
    def sum0: Expr = mkAgg(F.coalesce(F.sum(col), F.lit(0)))
    def avg: Expr = mkAgg(F.avg(col))
    def count: Expr = mkAgg(F.count(col))
    def max: Expr = mkAgg(F.max(col))
    def min: Expr = mkAgg(F.min(col))
    def stddevPop: Expr = mkAgg(F.stddev_pop(col))
    def stddevSamp: Expr = mkAgg(F.stddev_samp(col))
    def varPop: Expr = mkAgg(F.var_pop(col))
    def varSamp: Expr = mkAgg(F.var_samp(col))
    def collect: Expr = mkAgg(F.collect_list(col))
    def distinct: Expr = mkAgg(F.count_distinct(col)) // count(DISTINCT x)

    // scalar functions (the common ApiExpression names)
    def upperCase: Expr = mk(F.upper(col))
    def lowerCase: Expr = mk(F.lower(col))
    def trim(): Expr = mk(F.trim(col))
    def charLength: Expr = mk(F.length(col))
    def substring(begin: Int, len: Int): Expr =
      mk(F.substring(col, begin, len))
    def abs: Expr = mk(F.abs(col))
    def floor: Expr = mk(F.floor(col))
    def ceil: Expr = mk(F.ceil(col))
    def round(places: Int): Expr = mk(F.round(col, places))
    def ifThenElse(thenE: Expr, elseE: Expr): Expr =
      mk(F.when(col, thenE.col).otherwise(elseE.col))

    // over-window application: agg.over($("w"))
  }

  /** Expressions.call — any Spark SQL function by name. */
  def call(fn: String, args: Expr*): Expr =
    new Expr(F.call_function(fn, args.map(_.col): _*))

  /** Expressions.row — a ROW (struct) constructor; aliased arguments
    * name the fields (what Table#map / aggregate consume). */
  def row(exprs: Expr*): Expr = new Expr(F.struct(exprs.map(_.col): _*))

  /** Expressions.array — an ARRAY constructor (what Table#flatMap /
    * joinLateral consume). */
  def array(exprs: Expr*): Expr = new Expr(F.array(exprs.map(_.col): _*))

  /** Expressions.rowInterval — a ROWS over-window preceding bound. */
  def rowInterval(n: Long): RowInterval = RowInterval(n)
}

/** TableEnvironment.java: view registry + `from` + `sqlQuery` (the
  * latter through the graft SQL dialect entry, so TVF windows /
  * MATCH_RECOGNIZE etc. work from the same environment). */
final class TableEnvironment private (val spark: SparkSession) {
  private val views =
    scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]

  def createTemporaryView(name: String, df: DataFrame): Unit =
    views(name) = df

  def dropTemporaryView(name: String): Boolean =
    views.remove(name).isDefined

  def listTables(): Seq[String] = views.keys.toSeq

  def from(name: String): Table =
    new Table(views.getOrElse(name, throw new IllegalArgumentException(
      s"Table `$name` was not found — createTemporaryView it first")), this)

  def fromDataFrame(df: DataFrame): Table = new Table(df, this)

  /** TableEnvironment#sqlQuery through the Flink-dialect SQL entry. */
  def sqlQuery(sql: String): Table =
    new Table(graft.sql.FlinkSql.sql(spark, sql, views.toMap), this)

  /** TableEnvironment#executeSql — the full statement/script entry
    * (DDL, DML, queries, SHOW/DESCRIBE) through the graft DDL runner;
    * the environment's temporary views are visible to the script. A
    * script with neither a query nor a sink returns an empty OK result
    * (the reference's TableResult.TABLE_RESULT_OK). */
  def executeSql(stmt: String): TableResult = {
    val res = graft.sql.FlinkDdl.runScript(spark, stmt, views.toMap)
    new TableResult(res.lastQuery.getOrElse {
      res.lastSink match {
        case Some(_) => res.dataFrame
        case None => // DDL-only: OK marker, as the reference
          import org.apache.spark.sql.types.{StringType, StructField, StructType}
          spark.createDataFrame(
            java.util.Arrays.asList(Row("OK")),
            StructType(Seq(StructField("result", StringType))))
      }
    })
  }

  /** StreamTableEnvironment#fromDataStream: bridge from the typed
    * DataStream facade (streaming inputs stay streaming). */
  def fromDataStream[T](s: graft.stream.DataStream[T]): Table =
    new Table(s.ds.toDF(), this)

  /** StreamTableEnvironment#toDataStream: the Table as a typed
    * (Row-elementized) DataStream. */
  def toDataStream(t: Table): graft.stream.DataStream[Row] =
    new graft.stream.DataStream(t.df)
}

object TableEnvironment {
  def create(spark: SparkSession): TableEnvironment =
    new TableEnvironment(spark)
}

/** Table.java: each method is the reference's name, each body the
  * equivalent DataFrame operation. */
final class Table private[table] (
    private[table] val df: DataFrame,
    private val env: TableEnvironment) {
  import graft.table.api.Expr

  private def mk(d: DataFrame) = new Table(d, env)

  def select(exprs: Expr*): Table = mk(df.select(exprs.map(_.col): _*))

  /** Table#as — positional rename of every field. */
  def as(names: String*): Table = {
    require(names.length == df.columns.length,
      s"as() takes ${df.columns.length} names, got ${names.length}")
    mk(df.toDF(names: _*))
  }

  def where(e: Expr): Table = mk(df.where(e.col))
  def filter(e: Expr): Table = where(e)

  def distinct(): Table = mk(df.distinct())

  def groupBy(keys: Expr*): GroupedTable =
    new GroupedTable(df, keys, env)

  // joins (Table#join/leftOuterJoin/…): field names must be unique
  // across both sides, the reference's own requirement
  private def joined(right: Table, cond: Expr, how: String): Table = {
    val clash = df.columns.toSet.intersect(right.df.columns.toSet)
    require(clash.isEmpty,
      s"join inputs share field names $clash — rename one side (as)")
    mk(df.join(right.df, cond.col, how))
  }
  def join(right: Table, cond: Expr): Table = joined(right, cond, "inner")
  def leftOuterJoin(right: Table, cond: Expr): Table =
    joined(right, cond, "left")
  def rightOuterJoin(right: Table, cond: Expr): Table =
    joined(right, cond, "right")
  def fullOuterJoin(right: Table, cond: Expr): Table =
    joined(right, cond, "full")

  // lateral joins (Table#joinLateral / leftOuterJoinLateral — the UDTF
  // correlate): the argument is an ARRAY-producing expression (a table
  // function's collected rows); each element becomes one output row
  // under the expression's alias. INNER drops rows with empty/null
  // arrays; LEFT OUTER keeps them null-padded (explode vs
  // explode_outer — exactly the reference's correlate semantics).
  private def lateral(e: Expr, outer: Boolean): Table = {
    val alias = e.name.getOrElse(throw new IllegalArgumentException(
      "joinLateral needs an aliased expression (expr.as(name))"))
    val ex = if (outer) F.explode_outer(e.col) else F.explode(e.col)
    mk(df.select((df.columns.map(F.col) :+ ex.as(alias)).toSeq: _*))
  }
  def joinLateral(e: Expr): Table = lateral(e, outer = false)
  def leftOuterJoinLateral(e: Expr): Table = lateral(e, outer = true)

  /** Table#map: one scalar function call producing a ROW per input row
    * — the argument must evaluate to a STRUCT; its fields become the
    * output columns (the reference's map output type). */
  def map(e: Expr): Table =
    mk(df.select(e.col.as("__m")).select("__m.*"))

  /** Table#flatMap: a table function producing ZERO OR MORE rows per
    * input row — the argument must evaluate to an ARRAY of STRUCTs;
    * each element's fields become one output row. */
  def flatMap(e: Expr): Table =
    mk(df.select(F.explode(e.col).as("__m")).select("__m.*"))

  // set operations (distinct + ALL multiset forms, as Table.java)
  def union(o: Table): Table = mk(df.union(o.df).distinct())
  def unionAll(o: Table): Table = mk(df.union(o.df))
  def intersect(o: Table): Table = mk(df.intersect(o.df))
  def intersectAll(o: Table): Table = mk(df.intersectAll(o.df))
  def minus(o: Table): Table = mk(df.except(o.df))
  def minusAll(o: Table): Table = mk(df.exceptAll(o.df))

  def orderBy(exprs: Expr*): Table = mk(df.orderBy(exprs.map(_.col): _*))
  def offset(n: Int): Table = mk(df.offset(n))
  def fetch(n: Int): Table = mk(df.limit(n))
  def limit(n: Int): Table = fetch(n)

  // schema modification (Table#addColumns/renameColumns/dropColumns —
  // aliased expressions carry the new names)
  def addColumns(exprs: Expr*): Table =
    mk(df.select((df.columns.map(F.col) ++ exprs.map(_.col)).toSeq: _*))
  def addOrReplaceColumns(exprs: Expr*): Table =
    mk(exprs.foldLeft(df) { (d, e) =>
      val n = e.name.getOrElse(throw new IllegalArgumentException(
        "addOrReplaceColumns needs aliased expressions (expr.as(name))"))
      d.withColumn(n, e.col)
    })
  def renameColumns(pairs: (String, String)*): Table =
    mk(pairs.foldLeft(df) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to) })
  def dropColumns(names: String*): Table = mk(df.drop(names: _*))

  /** Group-window declaration (Tumble/Slide/Session over a TIMESTAMP
    * time attribute — GroupWindow.java). */
  def window(w: GroupWindow): WindowedTable = new WindowedTable(df, w, env)

  /** Over-window declaration (Over.java / OverWindow.java): aggregates
    * marked `.over($("w"))` in the following select are computed over
    * the spec; unmarked expressions pass through per row. */
  def window(w: OverWindow): OverWindowedTable =
    new OverWindowedTable(df, w, env)

  def execute(): TableResult = new TableResult(df)
  def toDataFrame: DataFrame = df
  def printSchema(): Unit = df.printSchema()
}

/** Table#groupBy(...).select(aggregates) → DataFrame groupBy/agg. Keys
  * appear in the select list by name; non-key expressions are
  * aggregates (resolved positionally against the agg output). */
final class GroupedTable private[table] (
    df: DataFrame,
    keys: Seq[graft.table.api.Expr],
    env: TableEnvironment) {
  import graft.table.api.Expr

  def select(exprs: Expr*): Table = {
    val keyNames = keys.flatMap(_.name).toSet
    // an aggregate aliased to a grouping-key name would silently shadow
    // the key (ADVICE r10) — the reference rejects the ambiguity too
    exprs.find(e => e.aggMark && e.name.exists(keyNames.contains))
      .foreach { e => throw new IllegalArgumentException(
        s"aggregate aliased to grouping-key name `${e.name.get}` — " +
          "alias it to a non-key name") }
    val (keySel, aggExprs) =
      exprs.partition(e => e.name.exists(keyNames.contains))
    require(aggExprs.nonEmpty, "groupBy().select needs an aggregate")
    val aggd = df.groupBy(keys.map(_.col): _*)
      .agg(aggExprs.head.col, aggExprs.tail.map(_.col): _*)
    // agg outputs follow the keys in aggd.columns, in declaration order
    val aggOut = aggd.columns.drop(keys.length)
    var ai = 0
    new Table(aggd.select(exprs.map { e =>
      if (e.name.exists(keyNames.contains)) F.col(e.name.get)
      else { val c = F.col(aggOut(ai)); ai += 1; c }
    }: _*), env)
  }

  /** GroupedTable#aggregate (Table API row-level ops): one aggregate
    * call producing a ROW (STRUCT) per group; the following select
    * reads the group keys and the struct's fields
    * (`groupBy($("k")).aggregate(agg.as("a")).select($("k"),
    * $("a_f1"), …)` — struct fields surface flattened). */
  def aggregate(e: Expr): Table = {
    val aggd = df.groupBy(keys.map(_.col): _*).agg(e.col.as("__a"))
    new Table(aggd.select(
      (keys.flatMap(_.name).map(F.col) :+ F.col("__a.*")): _*), env)
  }

  /** GroupedTable#flatAggregate: a TABLE aggregate emitting zero or
    * more rows per group — the argument must aggregate to an ARRAY of
    * STRUCTs (e.g. a top-N accumulator); each element's fields become
    * one output row next to the group keys. */
  def flatAggregate(e: Expr): Table = {
    val aggd = df.groupBy(keys.map(_.col): _*).agg(e.col.as("__fa"))
    new Table(aggd
      .select((keys.flatMap(_.name).map(F.col) :+
        F.explode(F.col("__fa")).as("__r")): _*)
      .select((keys.flatMap(_.name).map(F.col) :+ F.col("__r.*")): _*),
      env)
  }
}

/** GroupWindow builders — Tumble.over(...).on(...).as("w"),
  * Slide.over(...).every(...).on(...).as("w"),
  * Session.withGap(...).on(...).as("w") (api/Tumble.java etc.).
  * Durations are Spark interval strings ("10 minutes"). */
sealed trait GroupWindow {
  def timeCol: String
  def alias: String
}
final case class TumbleWindow(size: String, timeCol: String,
    alias: String) extends GroupWindow
final case class SlideWindow(size: String, slide: String, timeCol: String,
    alias: String) extends GroupWindow
final case class SessionWindow(gap: String, timeCol: String,
    alias: String) extends GroupWindow

object Tumble {
  final class B1(size: String) {
    def on(time: graft.table.api.Expr): B2 = new B2(size, time.name.get)
  }
  final class B2(size: String, timeCol: String) {
    def as(alias: String): TumbleWindow =
      TumbleWindow(size, timeCol, alias)
  }
  def over(size: String): B1 = new B1(size)
}
object Slide {
  final class B0(size: String) {
    def every(slide: String): B1 = new B1(size, slide)
  }
  final class B1(size: String, slide: String) {
    def on(time: graft.table.api.Expr): B2 =
      new B2(size, slide, time.name.get)
  }
  final class B2(size: String, slide: String, timeCol: String) {
    def as(alias: String): SlideWindow =
      SlideWindow(size, slide, timeCol, alias)
  }
  def over(size: String): B0 = new B0(size)
}
object Session {
  final class B1(gap: String) {
    def on(time: graft.table.api.Expr): B2 = new B2(gap, time.name.get)
  }
  final class B2(gap: String, timeCol: String) {
    def as(alias: String): SessionWindow = SessionWindow(gap, timeCol, alias)
  }
  def withGap(gap: String): B1 = new B1(gap)
}

/** windowed groupBy: keys may include the window alias; `w.start` /
  * `w.end` surface as `<alias>_start` / `<alias>_end` columns
  * (window_start/window_end renamed to the alias). */
final class WindowedTable private[table] (
    df: DataFrame,
    w: GroupWindow,
    env: TableEnvironment) {
  import graft.table.api.Expr

  def groupBy(keys: Expr*): WindowGroupedTable =
    new WindowGroupedTable(df, w, keys, env)
}

final class WindowGroupedTable private[table] (
    df: DataFrame,
    w: GroupWindow,
    keys: Seq[graft.table.api.Expr],
    env: TableEnvironment) {
  import graft.table.api.Expr

  def select(exprs: Expr*): Table = {
    val wcol = w match {
      case TumbleWindow(size, tc, _) => F.window(F.col(tc), size)
      case SlideWindow(size, slide, tc, _) =>
        F.window(F.col(tc), size, slide)
      case SessionWindow(gap, tc, _) => F.session_window(F.col(tc), gap)
    }
    val aliasNames = Set(w.alias, s"${w.alias}_start", s"${w.alias}_end")
    val keyCols = keys.filterNot(e => e.name.exists(aliasNames.contains))
    val keyNames = keyCols.flatMap(_.name).toSet
    def isAgg(e: Expr): Boolean =
      !e.name.exists(n => aliasNames.contains(n) || keyNames.contains(n))
    val aggExprs = exprs.filter(isAgg)
    require(aggExprs.nonEmpty, "windowed select needs an aggregate")
    val structName = w match {
      case _: SessionWindow => "session_window"
      case _ => "window"
    }
    val grouped = df.groupBy(wcol +: keyCols.map(_.col): _*)
      .agg(aggExprs.head.col, aggExprs.tail.map(_.col): _*)
      .withColumn(s"${w.alias}_start", F.col(s"$structName.start"))
      .withColumn(s"${w.alias}_end", F.col(s"$structName.end"))
      .drop(structName)
    // after the drop: keyNames ++ aggOutputs ++ (alias_start, alias_end)
    val aggOut = grouped.columns.drop(keyCols.length)
      .dropRight(2)
    var ai = 0
    new Table(grouped.select(exprs.map { e =>
      if (!isAgg(e)) F.col(e.name.get)
      else { val c = F.col(aggOut(ai)); ai += 1; c }
    }: _*), env)
  }
}

/** Over-window builders (api/Over.java): `Over.partitionBy($("k"))
  * .orderBy($("ts")).preceding(UNBOUNDED_RANGE).as("w")`. Frames map
  * onto Spark WindowSpec frames; the Flink default (no preceding
  * clause) is UNBOUNDED_RANGE → CURRENT_ROW, as the reference. */
sealed trait OverPreceding
case object UNBOUNDED_RANGE extends OverPreceding
case object UNBOUNDED_ROW extends OverPreceding
case object CURRENT_RANGE extends OverPreceding
case object CURRENT_ROW extends OverPreceding
final case class RowInterval(n: Long) extends OverPreceding

final case class OverWindow(
    partKeys: Seq[graft.table.api.Expr],
    orderE: graft.table.api.Expr,
    preceding: OverPreceding,
    alias: String)

object Over {
  final class B1(keys: Seq[graft.table.api.Expr]) {
    def orderBy(e: graft.table.api.Expr): B2 = new B2(keys, e)
  }
  final class B2(keys: Seq[graft.table.api.Expr],
      order: graft.table.api.Expr) {
    def preceding(p: OverPreceding): B3 = new B3(keys, order, p)
    def as(alias: String): OverWindow =
      OverWindow(keys, order, UNBOUNDED_RANGE, alias)
  }
  final class B3(keys: Seq[graft.table.api.Expr],
      order: graft.table.api.Expr, p: OverPreceding) {
    def as(alias: String): OverWindow = OverWindow(keys, order, p, alias)
  }
  def partitionBy(keys: graft.table.api.Expr*): B1 = new B1(keys)
  def orderBy(e: graft.table.api.Expr): B2 = new B2(Nil, e)
}

final class OverWindowedTable private[table] (
    df: DataFrame,
    w: OverWindow,
    env: TableEnvironment) {
  import graft.table.api.Expr
  import org.apache.spark.sql.expressions.Window

  def select(exprs: Expr*): Table = {
    // every `.over($("x"))` must reference THIS window's alias
    // (ADVICE r10: the reference validates the alias; a typo'd or
    // undeclared window name must not silently use the single window)
    exprs.filter(_.overMark).foreach { e =>
      val a = e.overAlias.getOrElse(throw new IllegalArgumentException(
        "over(...) needs a window alias reference, e.g. .over($(\"w\"))"))
      require(a == w.alias,
        s"over window `$a` is not declared — the select's window is " +
          s"`${w.alias}`")
    }
    val base =
      if (w.partKeys.isEmpty) {
        // An over-window with no partition keys collapses to ONE task
        // sorting the whole input (Spark's own unpartitioned-OVER
        // semantics) — silent death at scale for a migrated Table API
        // program. Loud by default; a strict session refuses outright.
        val strict = df.sparkSession.conf
          .getOption("spark.graft.strictUnpartitionedOver")
          .contains("true")
        if (strict) throw new IllegalArgumentException(
          s"over window `${w.alias}` has no partitionBy keys: the whole " +
            "input would sort in a SINGLE task. Add partitionBy(...), or " +
            "unset spark.graft.strictUnpartitionedOver to accept the " +
            "single-task plan.")
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "over window `{}` has no partitionBy keys — the whole input " +
            "moves to ONE task for the sort; this will not scale past a " +
            "single executor (set spark.graft.strictUnpartitionedOver=true " +
            "to make this an error)", w.alias)
        Window.orderBy(w.orderE.col)
      }
      else Window.partitionBy(w.partKeys.map(_.col): _*)
        .orderBy(w.orderE.col)
    val spec = w.preceding match {
      case UNBOUNDED_RANGE | CURRENT_RANGE =>
        base.rangeBetween(
          if (w.preceding == CURRENT_RANGE) Window.currentRow
          else Window.unboundedPreceding, Window.currentRow)
      case UNBOUNDED_ROW =>
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      case CURRENT_ROW =>
        base.rowsBetween(Window.currentRow, Window.currentRow)
      case RowInterval(n) => base.rowsBetween(-n, Window.currentRow)
    }
    new Table(df.select(exprs.map { e =>
      if (e.overMark) {
        val c = e.col.over(spec)
        e.name.map(c.as).getOrElse(c)
      } else e.col
    }: _*), env)
  }
}

/** TableResult#collect / print. */
final class TableResult private[table] (df: DataFrame) {
  def collect(): Seq[Row] = df.collect().toSeq
  def print(): Unit = df.show(truncate = false)
}
