package graft.sql

/** Text-level splitter for the reference's streaming Top-N SQL idiom
  * (docs `dev/table/sql/queries/topn.md`; planner rule
  * `FlinkLogicalRankRuleBase` + `StreamExecRank`):
  *
  * {{{
  *   SELECT <cols> FROM (
  *     SELECT <cols>, ROW_NUMBER() OVER (
  *       PARTITION BY p ORDER BY s) AS rn
  *     FROM <child> )
  *   WHERE rn <= N
  * }}}
  *
  * Spark's streaming checker rejects window functions in every output
  * mode, so the DDL runner splits the TEXT at the rank boundary instead:
  * `<child>` runs as the continuous query and the rank+filter section is
  * applied per micro-batch as ordinary batch SQL over the child's state
  * (see `FlinkDdl.startRankSink` for the two materialization tiers).
  * `RANK()` and `DENSE_RANK()` are accepted alongside `ROW_NUMBER()` —
  * all three are monotone non-decreasing as rows accumulate, which is
  * what the append tier's candidate-closure argument needs.
  *
  * Strictly scoped to the documented idiom: the ranked subquery must be
  * `SELECT <list> FROM <child>` with no top-level WHERE/GROUP/ORDER of
  * its own (put pre-filters inside the child, as the reference docs do).
  * Anything else returns None and the caller falls through to the
  * normal unsupported-plan error.
  */
private[sql] object StreamingRank {

  /** The marker view name the outer/candidate texts read from. */
  val Marker = "__graft_rank_input"

  /** Rank-alias column the candidate query adds (dropped before the
    * candidate rows are stored — state keeps the CHILD's schema). */
  val CandRn = "__graft_rn"

  /** @param innerText     the child query — the part that streams
    * @param outerText     the full statement with the child replaced by
    *                      [[Marker]] (child alias preserved so qualified
    *                      references keep resolving) — applied per batch,
    *                      feeds the sink
    * @param candidateText `None` unless the outer filter is a monotone
    *                      prefix; ranks the marker rows with the SAME
    *                      OVER clause and keeps `SELECT *` — the rows a
    *                      future batch could still need (append tier
    *                      state, full child schema + [[CandRn]])
    */
  final case class RankSplit(
      innerText: String,
      outerText: String,
      candidateText: Option[String])

  private val RankFns = Set("ROW_NUMBER", "RANK", "DENSE_RANK")

  def split(query: String): Option[RankSplit] = {
    val toks = FlinkSql.tokenize(query)
    val n = toks.length
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
    // the rank call: FN ( ) OVER ( ... ) AS alias
    val rankIdx = toks.indices.find(i => RankFns(toks(i).up) &&
      i + 1 < n && toks(i + 1).s == "(")
    rankIdx.flatMap { ri =>
      val argsClose = matching(ri + 1)
      if (argsClose < 0 || argsClose + 2 >= n ||
        toks(argsClose + 1).up != "OVER" ||
        toks(argsClose + 2).s != "(") return None
      val overClose = matching(argsClose + 2)
      if (overClose < 0 || overClose + 2 >= n ||
        toks(overClose + 1).up != "AS") return None
      val rnAlias = toks(overClose + 2).s
      val rankFn = toks(ri).up
      val overSpan =
        query.substring(toks(argsClose + 2).start, toks(overClose).end)

      // smallest `FROM ( … )` span containing the rank call = the ranked
      // subquery S
      var best: Option[(Int, Int)] = None // (openParenIdx, closeParenIdx)
      var i = 0
      while (i < n - 1) {
        if (toks(i).up == "FROM" && toks(i + 1).s == "(") {
          val close = matching(i + 1)
          if (close > ri && i + 1 < ri &&
            best.forall { case (o, c) => close - i < c - o })
            best = Some((i + 1, close))
        }
        i += 1
      }
      best.flatMap { case (op, cp) =>
        // S's own top-level FROM (paren depth 0 within the span)
        var depth = 0
        var sFrom = -1
        var j = op + 1
        while (j < cp && sFrom < 0) {
          toks(j).s match {
            case "(" => depth += 1
            case ")" => depth -= 1
            case _ if depth == 0 && toks(j).up == "FROM" => sFrom = j
            case _ =>
          }
          j += 1
        }
        if (sFrom < 0 || sFrom < overClose) return None
        // the idiom: S ends with its child — no rank-level WHERE/GROUP/
        // ORDER (pre-filters belong inside the child); also reject joins
        // at the rank level (a comma list or JOIN in S's FROM)
        depth = 0
        var k = sFrom + 1
        while (k < cp) {
          toks(k).s match {
            case "(" => depth += 1
            case ")" => depth -= 1
            case _ if depth == 0 &&
              (Set("WHERE", "GROUP", "ORDER", "HAVING", "QUALIFY",
                "JOIN", ",")(toks(k).up)) => return None
            case _ =>
          }
          k += 1
        }
        val oFrom = {
          // the FROM directly preceding S's open paren
          var f = op - 1
          while (f >= 0 && toks(f).up != "FROM") f -= 1
          f
        }
        if (oFrom < 0) return None

        // child alias: `t`, `t a`, `t AS a`, `( … ) a`, `( … ) AS a` —
        // preserved on the marker so qualified refs in S keep resolving;
        // a bare table name doubles as its own qualifier
        val childToks = toks.slice(sFrom + 1, cp)
        if (childToks.isEmpty) return None
        val childAlias: Option[String] = {
          val last = childToks.last
          if (childToks.length == 1)
            Some(last.s).filter(_.head.isLetter)
          else if (last.s.head.isLetter && last.up != ")")
            Some(last.s)
          else None
        }
        val markerRef = childAlias match {
          case Some(a) => s"$Marker AS $a"
          case None => Marker
        }
        val childText =
          query.substring(toks(sFrom).end, toks(cp).start).trim
        val swapped = query.substring(0, toks(sFrom).end) +
          s" $markerRef " + query.substring(toks(cp).start)

        // monotone prefix: after S's close ) [AS alias], exactly
        // `WHERE rn <= N` (or < N, or = 1) and nothing else
        val after = {
          var a = cp + 1
          if (a < n && toks(a).up == "AS") a += 2
          else if (a < n && toks(a).s.head.isLetter &&
            toks(a).up != "WHERE") a += 1 // bare subquery alias
          a
        }
        val candidate =
          if (after + 4 == n && toks(after).up == "WHERE" &&
            toks(after + 1).s.equalsIgnoreCase(rnAlias) && {
              val op2 = toks(after + 2).s
              val lit = toks(after + 3).s
              lit.forall(_.isDigit) &&
                (op2 == "<=" || op2 == "<" || (op2 == "=" && lit == "1"))
            })
            Some(s"SELECT * FROM (SELECT *, $rankFn() OVER $overSpan " +
              s"AS $CandRn FROM $markerRef) " +
              s"WHERE $CandRn ${toks(after + 2).s} ${toks(after + 3).s}")
          else None

        Some(RankSplit(
          innerText = s"SELECT * FROM $childText",
          outerText = swapped,
          candidateText = candidate))
      }
    }
  }
}
