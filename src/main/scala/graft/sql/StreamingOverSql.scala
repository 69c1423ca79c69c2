package graft.sql

/** Text-level splitter for the reference's streaming OVER aggregation
  * idiom (docs `dev/table/sql/queries/over-agg.md`; runtime
  * `RT/operators/over/RowTimeRangeBoundedPrecedingFunction.java:56` and
  * the unbounded siblings):
  *
  * {{{
  *   SELECT a, b, SUM(v) OVER (
  *     PARTITION BY p ORDER BY ts
  *     [RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  *      | ROWS BETWEEN n PRECEDING AND CURRENT ROW]) AS alias
  *   FROM <child> [WHERE …]
  * }}}
  *
  * Spark rejects window functions in every streaming output mode, so the
  * DDL runner splits at the OVER boundary (`FlinkDdl.startOverSink`):
  * `<child>` runs as the continuous append query and the per-key
  * event-time-ordered frame applies through the existing
  * [[graft.streaming.StreamingOver]] engine — watermark-driven emission,
  * per-key state bounded by the frame, exactly the reference's operator
  * shape. Strictly scoped to the documented idiom: one OVER call,
  * SUM/COUNT/MIN/MAX, other select items plain columns, no top-level
  * GROUP/ORDER/LIMIT (pre-filters via WHERE fold into the child).
  * Anything else returns None and the caller falls through to the
  * normal unsupported-plan error.
  */
private[sql] object StreamingOverSql {

  sealed trait Frame
  /** RANGE UNBOUNDED PRECEDING (the ORDER BY default). */
  case object Unbounded extends Frame
  /** ROWS BETWEEN n PRECEDING AND CURRENT ROW. */
  final case class RowsPreceding(n: Int) extends Frame

  /** One select item: a plain column (name, outputAs) or the over call. */
  sealed trait Item
  final case class Plain(name: String, as: String) extends Item
  case object OverCall extends Item

  final case class OverSplit(
      childText: String,
      items: Seq[Item],
      fn: String,
      valCol: String,
      partitionCols: Seq[String],
      orderCol: String,
      frame: Frame,
      alias: String)

  private val Fns = Set("SUM", "COUNT", "MIN", "MAX")

  def split(query: String): Option[OverSplit] = {
    val toks = FlinkSql.tokenize(query)
    val n = toks.length
    if (n == 0 || toks(0).up != "SELECT") return None
    def matching(open: Int): Int = {
      var depth = 0
      var i = open
      while (i < n) {
        toks(i).s match {
          case "(" => depth += 1
          case ")" => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    // top-level FROM
    var depth = 0
    var fromIdx = -1
    var i = 0
    while (i < n && fromIdx < 0) {
      toks(i).s match {
        case "(" => depth += 1
        case ")" => depth -= 1
        case _ if depth == 0 && toks(i).up == "FROM" => fromIdx = i
        case _ =>
      }
      i += 1
    }
    if (fromIdx < 0) return None
    // no top-level GROUP/ORDER/HAVING/LIMIT after the child (WHERE is
    // fine — SQL applies it before the window, so it folds into the
    // child); no subquery/join child restrictions here — the child text
    // compiles wholesale
    depth = 0
    i = fromIdx + 1
    while (i < n) {
      toks(i).s match {
        case "(" => depth += 1
        case ")" => depth -= 1
        case _ if depth == 0 &&
          Set("GROUP", "ORDER", "HAVING", "LIMIT", "QUALIFY")(toks(i).up) =>
          return None
        case _ =>
      }
      i += 1
    }

    // split select list on top-level commas
    val itemRanges = {
      val b = Seq.newBuilder[(Int, Int)]
      var st = 1
      var d = 0
      var j = 1
      while (j < fromIdx) {
        toks(j).s match {
          case "(" => d += 1
          case ")" => d -= 1
          case "," if d == 0 => b += ((st, j)); st = j + 1
          case _ =>
        }
        j += 1
      }
      b += ((st, fromIdx))
      b.result()
    }

    var overItem: Option[(String, String, Seq[String], String, Frame,
      String)] = None
    val items = Seq.newBuilder[Item]
    def ident(j: Int): Option[String] =
      Some(toks(j).s).filter(s => s.nonEmpty &&
        (s.head.isLetter || s.head == '_'))
    itemRanges.foreach { case (st, en) =>
      val len = en - st
      if (len <= 0) return None
      if (Fns(toks(st).up) && st + 1 < en && toks(st + 1).s == "(") {
        // the over call: FN ( arg ) OVER ( spec ) AS alias
        if (overItem.isDefined) return None // one OVER per statement
        val argsClose = matching(st + 1)
        if (argsClose < 0 || argsClose + 2 >= en ||
          toks(argsClose + 1).up != "OVER" ||
          toks(argsClose + 2).s != "(") return None
        val overClose = matching(argsClose + 2)
        if (overClose < 0 || overClose + 2 != en - 1 ||
          toks(overClose + 1).up != "AS") return None
        val alias = toks(overClose + 2).s
        // argument: a bare or qualified column (COUNT(*) not supported —
        // the engine counts the value column)
        val argToks = toks.slice(st + 2, argsClose).map(_.s)
        val valCol = argToks.filterNot(_ == ".") match {
          case Seq(c) => c
          case s if s.size == 2 => s.last // t.col
          case _ => return None
        }
        // OVER ( PARTITION BY p[, q…] ORDER BY ts [frame] )
        var k = argsClose + 3
        if (k >= overClose || toks(k).up != "PARTITION" ||
          toks(k + 1).up != "BY") return None
        k += 2
        val parts = Seq.newBuilder[String]
        var expectCol = true
        while (k < overClose && toks(k).up != "ORDER") {
          toks(k).s match {
            case "," => expectCol = true
            case "." => // qualifier dot: replace last with next
            case s if expectCol => parts += s; expectCol = false
            case s => // qualified tail: overwrite
              val sofar = parts.result()
              parts.clear(); parts ++= sofar.dropRight(1) :+ s
          }
          k += 1
        }
        if (k >= overClose || toks(k).up != "ORDER" ||
          toks(k + 1).up != "BY") return None
        k += 2
        var orderCol = ident(k).getOrElse(return None)
        k += 1
        while (k < overClose && toks(k).s == ".") {
          orderCol = toks(k + 1).s; k += 2
        }
        val frame: Frame =
          if (k == overClose) Unbounded
          else {
            val f = toks.slice(k, overClose).map(_.up)
            if (f == Seq("RANGE", "BETWEEN", "UNBOUNDED", "PRECEDING",
              "AND", "CURRENT", "ROW")) Unbounded
            else if (f.length == 7 && f(0) == "ROWS" &&
              f(1) == "BETWEEN" && f(2).forall(_.isDigit) &&
              f(3) == "PRECEDING" && f(4) == "AND" &&
              f(5) == "CURRENT" && f(6) == "ROW")
              RowsPreceding(f(2).toInt)
            else return None
          }
        overItem =
          Some((toks(st).up, valCol, parts.result(), orderCol, frame,
            alias))
        items += OverCall
      } else {
        // plain column: ident, t.ident, with optional [AS] alias
        var name = ident(st).getOrElse(return None)
        var j = st + 1
        while (j < en && toks(j).s == ".") {
          name = toks(j + 1).s; j += 2
        }
        val as =
          if (j == en) name
          else if (j + 2 == en && toks(j).up == "AS")
            ident(j + 1).getOrElse(return None)
          else if (j + 1 == en) ident(j).getOrElse(return None)
          else return None
        items += Plain(name, as)
      }
    }
    overItem.map { case (fn, valCol, parts, orderCol, frame, alias) =>
      if (parts.isEmpty) return None
      OverSplit(
        childText = query.substring(toks(fromIdx).end).trim,
        items = items.result(),
        fn = fn,
        valCol = valCol,
        partitionCols = parts,
        orderCol = orderCol,
        frame = frame,
        alias = alias)
    }
  }
}
