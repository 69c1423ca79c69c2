package graft.changelog

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Changelog-consuming N-ary INNER join in ONE stateful operator — the
  * reference's StreamingMultiJoinOperator (RT/operators/join/stream/
  * StreamingMultiJoinOperator.java:66, planned by
  * flink-table-planner/…/exec/stream/StreamExecMultiJoin.java:78): n
  * changelog inputs equi-joined on a COMMON key, co-processed so the
  * operator's state is the live rows of each INPUT — never a
  * materialized intermediate join. A binary chain `(A ⋈ B) ⋈ C` keeps
  * O(|A ⋈ B|) pair state in the middle operator; this keeps
  * O(|A|+|B|+|C|), the reference's headline win for 3+-way changelog
  * star joins (its common-join-key requirement carries over: all inputs
  * must join on the same key, which also makes ONE hash shuffle enough).
  *
  * Per envelope from input i: the new (accumulate) or removed (retract)
  * row is crossed with every OTHER input's live rows under the key —
  * the reference's recursiveMultiJoin walk — emitting `+I`/`-D` joined
  * deltas with multiset multiplicity. Output `__seq` =
  * 2 × (triggering input `__seq`) + krank, [[ChangelogJoin]]'s
  * global-domain scheme, so keep-last materialization by the
  * concatenated upsert keys reproduces the SQL n-way inner join of the
  * final states. Inputs follow the [[ChangelogJoin]] contract (full
  * changelogs, one global seq domain, -U pre-images reach the old key).
  *
  * Scale: one shuffle on the join key for ALL inputs; a hot key costs
  * its join product — inherent to join semantics. Batch face replays
  * key groups via external secondary sort; streaming face holds per-key
  * multisets in flatMapGroupsWithState.
  */
object ChangelogMultiJoin extends Serializable {

  def apply(inputs: Seq[(DataFrame, String)]): DataFrame =
    apply(inputs, idleTtlMs = None)

  /** @param inputs (changelog, joinKeyCol) per side — payload column
    *        names must be unique across sides (alias upstream).
    *  @param idleTtlMs streaming-face idle-state retention — the
    *        reference's STATE_TTL hint on the multi-join
    *        (JoinToMultiJoinRule.handleStateTtlHintsForInput); a key
    *        group's per-input live rows drop after this long without
    *        activity. Batch face ignores it (bounded input).
    */
  def apply(
      inputs: Seq[(DataFrame, String)],
      idleTtlMs: Option[Long]): DataFrame = {
    require(inputs.size >= 2, "multi-join needs at least two inputs")
    val metaCols = Set(RowKind.kindCol, RowKind.seqCol)
    val n = inputs.size
    val payF: Seq[Array[StructField]] = inputs.map { case (df, _) =>
      df.schema.fields.filterNot(f => metaCols(f.name))
    }
    val allNames = payF.flatten.map(_.name)
    require(allNames.distinct.size == allNames.size,
      s"payload column names must be unique across inputs: " +
        allNames.diff(allNames.distinct).distinct.mkString(", "))
    val jkType = inputs.head._1.schema(inputs.head._2).dataType
    inputs.foreach { case (df, jk) =>
      require(df.schema(jk).dataType == jkType,
        "join key types differ — cast one side explicitly")
    }

    val outSchema = StructType(
      payF.flatten :+
        StructField(RowKind.kindCol, StringType) :+
        StructField(RowKind.seqCol, LongType))

    val krank = when(
      col(RowKind.kindCol) === RowKind.UpdateBefore ||
        col(RowKind.kindCol) === RowKind.Delete, 0).otherwise(1)
    // envelope: 0 __jk, 1 __side, 2 __seqe, 3 __kind, 4 __krank,
    // 5.. one nullable payload struct per side (own side populated)
    val env = inputs.zipWithIndex.map { case ((df, jk), i) =>
      df.where(col(jk).isNotNull).select(
        Seq(
          col(jk).as("__jk"),
          lit(i).as("__side"),
          col(RowKind.seqCol).as("__seqe"),
          col(RowKind.kindCol).as("__kind"),
          krank.as("__krank")) ++
          payF.zipWithIndex.map { case (fs, j) =>
            if (j == i) struct(fs.map(f => col(f.name)).toSeq: _*).as(s"__p$j")
            else lit(null).cast(StructType(fs)).as(s"__p$j")
          }: _*)
    }.reduce(_ unionByName _)

    def isRetract(kind: String): Boolean =
      kind == RowKind.UpdateBefore || kind == RowKind.Delete

    // state: one live-row multiset per input (payload -> count)
    type Side = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]
    def emptySt: Array[Side] =
      Array.fill(n)(scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long])

    // cross the triggering row with every other side's live rows —
    // the reference's recursiveMultiJoin (depth-first over inputs)
    def step(st: Array[Side], e: Row): Seq[Row] = {
      val side = e.getInt(1)
      val retract = isRetract(e.getString(3))
      val outSeq = 2L * e.getLong(2) + e.getInt(4)
      val pay = e.getStruct(5 + side).toSeq
      val own = st(side)
      if (retract) {
        own.get(pay) match {
          // a retract for a row not in the live multiset is an upstream
          // contract violation (lossy changelog) — skip rather than emit
          // phantom -D deltas for combos that were never inserted
          case None => return Nil
          case Some(c) =>
            if (c <= 1) own.remove(pay) else own.update(pay, c - 1)
        }
      } else own.update(pay, own.getOrElse(pay, 0L) + 1)
      val kind = if (retract) RowKind.Delete else RowKind.Insert
      val out = Seq.newBuilder[Row]
      def walk(depth: Int, acc: Vector[Seq[Any]], mult: Long): Unit = {
        if (depth == n) {
          var k = 0L
          while (k < mult) { // multiset multiplicity
            out += Row.fromSeq(acc.flatten :+ kind :+ outSeq)
            k += 1
          }
        } else if (depth == side) walk(depth + 1, acc :+ pay, mult)
        else st(depth).foreach { case (p, c) =>
          walk(depth + 1, acc :+ p, mult * c)
        }
      }
      walk(0, Vector.empty, 1L)
      out.result()
    }

    if (!env.isStreaming) {
      return graft.operators.SecondarySort.mapOrderedGroups(
        env, Seq("__jk"), Seq(col("__seqe"), col("__krank"), col("__side")),
        outSchema) { (_, rows) =>
        val st = emptySt
        rows.flatMap(step(st, _))
      }
    }

    val jkField = env.schema.fields(0)
    val kEnc: Encoder[Row] = Encoders.row(StructType(Seq(jkField)))
    val vEnc: Encoder[Row] = Encoders.row(env.schema)
    type S = Seq[Map[Seq[Any], Long]]
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = Encoders.row(outSchema)

    val timeoutConf = idleTtlMs match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    env.as[Row](vEnc)
      .groupByKey(r => Row(r.get(0)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), timeoutConf) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          if (state.hasTimedOut) {
            // idle TTL expired: drop every input's live rows (state.ttl)
            state.remove()
            Iterator.empty
          } else {
            val st = emptySt
            state.getOption.foreach(_.zipWithIndex.foreach { case (m, i) =>
              st(i) = scala.collection.mutable.LinkedHashMap.from(m)
            })
            val out = rows.toSeq
              .sortBy(e => (e.getLong(2), e.getInt(4), e.getInt(1)))
              .flatMap(step(st, _))
            if (st.forall(_.isEmpty)) state.remove()
            else {
              state.update(st.map(_.toMap).toSeq)
              idleTtlMs.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }(sEnc, oEnc)
  }

  /** One equi-link of a per-pair key chain: the input this condition is
    * registered under (the MAP KEY in [[chain]]'s `conds`) joins an
    * EARLIER input `leftInput` on `leftCol = rightCol`. Mirrors one
    * ConditionAttributeRef of the reference's joinAttributeMap
    * (flink-table-planner/…/exec/stream/StreamExecMultiJoin.java:84,101).
    */
  final case class ChainCond(leftInput: Int, leftCol: String, rightCol: String)

  /** N-ary changelog inner join with PER-PAIR join keys — lifts [[apply]]'s
    * common-key restriction the way the reference's multi-join does
    * (`StreamExecMultiJoin.java:84`'s `joinAttributeMap`): each input i ≥ 1
    * declares equi-conditions against earlier inputs, so chain shapes
    * (A—B on k1, B—C on k2) run as ONE stateful operator with per-INPUT
    * state — no materialized intermediate join.
    *
    * Partitioning mirrors the reference's
    * AttributeBasedJoinKeyExtractor.initializeCommonJoinKeyStructures:
    * union-find over the condition attributes; an equivalence class that
    * touches every input is the COMMON key and keys the one shuffle.
    * Without one (a true chain) all rows share a single key group — the
    * reference's empty-common-key behavior — so per-pair-key joins trade
    * shuffle parallelism for single-operator state; prefer [[apply]]
    * whenever a common key exists.
    *
    * Within a key group the walk IMPROVES on the reference's left-to-right
    * scan (`StreamingMultiJoinOperator.java:557` iterates depth-0 state
    * unkeyed): inputs are visited in BFS order from the TRIGGERING side
    * along the join graph, and each input keeps one hash index per
    * neighbor pair, so every lookup is keyed by already-bound rows —
    * per-event work is the size of the emitted delta, not the state.
    *
    * DECLARE THE SELECTIVE CONDITION FIRST per input: when an input has
    * several conditions (a triangle/cyclic join graph), the earliest
    * declared condition that connects it to the already-visited inputs
    * becomes the hop whose attributes key the index lookup; the later
    * ones are applied as probe-time residual post-filters. Declaring a
    * low-cardinality condition (a parity/flag attribute) first makes it
    * the lookup key and fans every probe out to all rows sharing that
    * flag value before the real key is checked — put the high-cardinality
    * equi-key first and results are identical with delta-sized work.
    */
  def chain(
      inputs: Seq[DataFrame],
      conds: Map[Int, Seq[ChainCond]]): DataFrame =
    chain(inputs, conds, Seq.fill(inputs.size)("inner"))

  /** [[chain]] with PER-DEPTH join types — the reference's left-deep
    * multi-join semantics (`StreamingMultiJoinOperator.java:884`
    * `isLeftJoin(depth)`): `joinTypes(i)` ∈ {"inner", "left"} is the type
    * of the depth-i join `(inputs 0..i-1) JOIN inputs(i) ON conds(i)`
    * (`joinTypes(0)` is ignored). LEFT depths null-pad: a prefix tuple
    * with no depth-i match emits with input i's columns null, and the
    * operator emits the reference's pad transitions — the first match
    * retracts the padded row before inserting the matched one, the last
    * retraction re-inserts the pad (scaladoc walkthrough at
    * `StreamingMultiJoinOperator.java:146`, "A LEFT JOIN B INNER JOIN C").
    *
    * Delta evaluation is left-deep rather than BFS-from-trigger: a change
    * to input t enumerates the JOINED PREFIX tuples (pads included) that
    * match the changed row — index lookups keyed by the trigger's
    * attributes prune non-matching branches — checks the prefix's
    * before/after association with input t for the pad flip, and expands
    * the suffix levels with pad-on-empty at LEFT depths. Per-event work
    * is proportional to the emitted delta plus the association probes for
    * star shapes (every level reaches the trigger or an already-bound
    * level through an index); a CHAIN-shaped typed join with no common
    * key scans level-0 state within the key group per event — the
    * reference's own depth-0 behavior (StreamingMultiJoinOperator.java:557
    * iterates depth-0 state unkeyed), so prefer a common join key where
    * one exists. Scan-level null rejection keeps LEFT-side rows
    * whose only null attributes feed LEFT depths (they must surface
    * padded), and still drops rows whose nulls can never reach output.
    */
  def chain(
      inputs: Seq[DataFrame],
      conds: Map[Int, Seq[ChainCond]],
      joinTypes: Seq[String],
      idleTtlMs: Option[Long] = None): DataFrame = {
    val n = inputs.size
    require(n >= 2, "multi-join needs at least two inputs")
    require(joinTypes.size == n,
      s"joinTypes must have one entry per input, got ${joinTypes.size}")
    require(joinTypes.drop(1).forall(t => t == "inner" || t == "left"),
      s"joinTypes must be inner|left, got ${joinTypes.mkString(",")}")
    val jt: Int => String = i => if (i == 0) "inner" else joinTypes(i)
    val typed = (1 until n).exists(jt(_) == "left")
    require(conds.keySet == (1 until n).toSet,
      s"conds must cover inputs 1..${n - 1}, got ${conds.keySet.toSeq.sorted}")
    (1 until n).foreach { i =>
      require(conds(i).nonEmpty, s"input $i needs at least one condition")
      conds(i).foreach { c =>
        require(c.leftInput >= 0 && c.leftInput < i,
          s"condition on input $i must reference an earlier input")
        require(inputs(c.leftInput).schema(c.leftCol).dataType ==
            inputs(i).schema(c.rightCol).dataType,
          s"join key types differ on ${c.leftCol}=${c.rightCol}")
      }
    }
    val metaCols = Set(RowKind.kindCol, RowKind.seqCol)
    val payF: Seq[Array[StructField]] = inputs.map { df =>
      df.schema.fields.filterNot(f => metaCols(f.name))
    }
    val allNames = payF.flatten.map(_.name)
    require(allNames.distinct.size == allNames.size,
      s"payload column names must be unique across inputs: " +
        allNames.diff(allNames.distinct).distinct.mkString(", "))
    val payIdx: Seq[Map[String, Int]] =
      payF.map(_.map(_.name).zipWithIndex.toMap)

    // every condition as an undirected edge (l, r, leftCol, rightCol)
    val edges: Seq[(Int, Int, String, String)] =
      (1 until n).flatMap(i => conds(i).map(c =>
        (c.leftInput, i, c.leftCol, c.rightCol)))

    // ---- common-key discovery (union-find over condition attributes) ----
    type Attr = (Int, String)
    val parent = scala.collection.mutable.Map.empty[Attr, Attr]
    def find(a: Attr): Attr = {
      val p = parent.getOrElse(a, a)
      if (p == a) a else { val r = find(p); parent(a) = r; r }
    }
    edges.foreach { case (l, r, lc, rc) =>
      val (ra, rb) = (find((l, lc)), find((r, rc)))
      if (ra != rb) parent(ra) = rb
    }
    val allAttrs = edges.flatMap { case (l, r, lc, rc) =>
      Seq((l, lc), (r, rc)) }.distinct
    val commonClass = allAttrs.groupBy(find).values
      .find(cls => (0 until n).forall(i => cls.exists(_._1 == i)))
      .map(_.sortBy(a => (a._1, a._2)))
    val jkOf: Int => org.apache.spark.sql.Column = commonClass match {
      case Some(cls) => i => col(cls.find(_._1 == i).get._2)
      case None => _ => lit(0L) // reference's empty-common-key fallback
    }

    // ---- per-input indexes: one per incident neighbor pair ----
    // pairs touching input i, each with i's attrs in that pair's conds
    // (condition declaration order — the canonical key layout)
    val pairsOf: Seq[Seq[(Int, Seq[Int])]] = (0 until n).map { i =>
      edges.filter(e => e._1 == i || e._2 == i)
        .groupBy(e => if (e._1 == i) e._2 else e._1).toSeq.sortBy(_._1)
        .map { case (nbr, es) =>
          nbr -> es.map(e =>
            if (e._1 == i) payIdx(i)(e._3) else payIdx(i)(e._4))
        }
    }
    // BFS visit plan per triggering side: (input, viaNeighbor,
    // residualConds) where residualConds are conds to OTHER already-bound
    // inputs, applied as post-filters (only non-tree edges hit this)
    // narrow-hop warnings dedupe across the n per-side plans: each
    // degraded (input, via) pair surfaces once, whichever side's BFS
    // first routes through it (ADVICE r16 — and the side-0-only variant
    // missed hops that only appear in the other sides' visit orders)
    val warnedHops = scala.collection.mutable.Set.empty[(Int, Int)]
    val planOf: Seq[Seq[(Int, Int, Seq[(Int, Int, Int)])]] =
      (0 until n).map { s =>
        val visited = scala.collection.mutable.LinkedHashSet(s)
        val plan = Seq.newBuilder[(Int, Int, Seq[(Int, Int, Int)])]
        while (visited.size < n) {
          // deterministic: the earliest DECLARED condition connecting an
          // unvisited input to the visited set decides the next hop —
          // users declare the primary (selective) join path first (the
          // typed engine's candsBase takes cons.head the same way), so a
          // low-cardinality secondary condition (a parity/flag edge in a
          // triangle graph) can never become the index-lookup path while
          // a declared-earlier edge is available; it stays a residual
          // post-filter. Picking it as the hop key would fan every probe
          // out to all rows sharing the flag value — quadratic blow-up.
          val hop = edges.find(e =>
            (visited(e._1) && !visited(e._2)) ||
              (visited(e._2) && !visited(e._1)))
          require(hop.nonEmpty, "join graph must be connected")
          val (d, via) =
            if (visited(hop.get._1)) (hop.get._2, hop.get._1)
            else (hop.get._1, hop.get._2)
          // ADVICE r16: declaration order decides the hop, so declaring a
          // low-cardinality condition (parity/flag) before the
          // high-cardinality equi-key silently degrades every probe to a
          // fan-out over all rows sharing the flag value (correct results,
          // quadratic work). When a different visited neighbor offers a
          // WIDER lookup key to the same input, surface it — once per
          // plan build, not per row.
          val chosenWidth = edges.count(e =>
            (e._1 == d && e._2 == via) || (e._1 == via && e._2 == d))
          val widest = (0 until n).filter(p => visited(p) && p != d)
            .map(p => edges.count(e =>
              (e._1 == d && e._2 == p) || (e._1 == p && e._2 == d)))
            .foldLeft(0)(math.max)
          if (chosenWidth < widest && warnedHops.add((d, via)))
            System.err.println(
              s"[graft] WARN ChangelogMultiJoin: input $d is probed via " +
                s"neighbor $via with a $chosenWidth-condition key while a " +
                s"later-declared neighbor offers $widest conditions — if " +
                "the chosen key is low-cardinality, declare the selective " +
                "equi-key condition first (hop selection follows " +
                "declaration order; see chain() scaladoc)")
          // residual: conds from d to visited inputs OTHER than via:
          // (otherInput, otherColIdx, dColIdx)
          val residual = edges.collect {
            case (l, r, lc, rc) if l == d && visited(r) && r != via =>
              (r, payIdx(r)(rc), payIdx(d)(lc))
            case (l, r, lc, rc) if r == d && visited(l) && l != via =>
              (l, payIdx(l)(lc), payIdx(d)(rc))
          }
          plan += ((d, via, residual))
          visited += d
        }
        plan.result()
      }
    // lookup key VALUES for visiting d via neighbor p: p's attr indices
    // in (d, p) cond order — must align with pairsOf(d)(p)'s layout
    val lookupIdx: Map[(Int, Int), Seq[Int]] =
      (for {
        d <- 0 until n
        (p, _) <- pairsOf(d)
      } yield (d, p) -> edges
        .filter(e => (e._1 == d && e._2 == p) || (e._1 == p && e._2 == d))
        .map(e => if (e._1 == p) payIdx(p)(e._3) else payIdx(p)(e._4))
      ).toMap

    val outSchema = StructType(
      // LEFT depths null-pad whole inputs, so typed output columns are
      // nullable regardless of the inputs' own nullability
      payF.flatten.map(f => if (typed) f.copy(nullable = true) else f) :+
        StructField(RowKind.kindCol, StringType) :+
        StructField(RowKind.seqCol, LongType))
    val krank = when(
      col(RowKind.kindCol) === RowKind.UpdateBefore ||
        col(RowKind.kindCol) === RowKind.Delete, 0).otherwise(1)
    // null rejection at the scan: an input's OWN depth attrs (conds(i)
    // rightCols) never match with nulls and unmatched RIGHT rows never
    // surface, so they always drop; attrs feeding a LATER depth drop only
    // when that depth is INNER — under a later LEFT depth the row must
    // stay and surface padded
    val env = inputs.zipWithIndex.map { case (df, i) =>
      val attrs = edges.collect {
        case (l, d, lc, _) if l == i && jt(d) == "inner" => lc
        case (_, d, _, rc) if d == i => rc
      }.distinct
      val pruned =
        if (attrs.isEmpty) df
        else df.where(attrs.map(col(_).isNotNull).reduce(_ && _))
      pruned.select(
        Seq(
          jkOf(i).as("__jk"),
          lit(i).as("__side"),
          col(RowKind.seqCol).as("__seqe"),
          col(RowKind.kindCol).as("__kind"),
          krank.as("__krank")) ++
          payF.zipWithIndex.map { case (fs, j) =>
            if (j == i) struct(fs.map(f => col(f.name)).toSeq: _*).as(s"__p$j")
            else lit(null).cast(StructType(fs)).as(s"__p$j")
          }: _*)
    }.reduce(_ unionByName _)

    def isRetract(kind: String): Boolean =
      kind == RowKind.UpdateBefore || kind == RowKind.Delete

    // state per input: neighborPair -> keyVals -> payload -> multiplicity
    type Bucket = scala.collection.mutable.LinkedHashMap[Seq[Any], Long]
    type Side =
      scala.collection.mutable.LinkedHashMap[(Int, Seq[Any]), Bucket]
    def emptySt: Array[Side] = Array.fill(n)(
      scala.collection.mutable.LinkedHashMap.empty[(Int, Seq[Any]), Bucket])

    def indexKeys(i: Int, pay: Seq[Any]): Seq[(Int, Seq[Any])] =
      pairsOf(i).map { case (nbr, idxs) => (nbr, idxs.map(pay(_))) }

    def step(st: Array[Side], e: Row): Seq[Row] = {
      val side = e.getInt(1)
      val retract = isRetract(e.getString(3))
      val outSeq = 2L * e.getLong(2) + e.getInt(4)
      val pay = e.getStruct(5 + side).toSeq
      val own = st(side)
      val keys = indexKeys(side, pay)
      if (retract) {
        // a retract for a row not in the live multiset is an upstream
        // contract violation (lossy changelog) — skip rather than emit
        // phantom -D deltas that would corrupt keep-last materialization
        if (!keys.headOption.flatMap(own.get).exists(_.contains(pay)))
          return Nil
        keys.foreach { k =>
          own.get(k).foreach { b =>
            b.get(pay).foreach { c =>
              if (c <= 1) { b.remove(pay); if (b.isEmpty) own.remove(k) }
              else b.update(pay, c - 1)
            }
          }
        }
      } else keys.foreach { k =>
        val b = own.getOrElseUpdate(k,
          scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long])
        b.update(pay, b.getOrElse(pay, 0L) + 1)
      }
      val kind = if (retract) RowKind.Delete else RowKind.Insert
      val bound = new Array[Seq[Any]](n)
      bound(side) = pay
      val plan = planOf(side)
      val out = Seq.newBuilder[Row]
      def walk(stepNo: Int, mult: Long): Unit =
        if (stepNo == plan.length) {
          var k = 0L
          while (k < mult) { // multiset multiplicity
            out += Row.fromSeq(bound.toSeq.flatten :+ kind :+ outSeq)
            k += 1
          }
        } else {
          val (d, via, residual) = plan(stepNo)
          val key = lookupIdx((d, via)).map(bound(via)(_))
          st(d).get((via, key)).foreach(_.foreach { case (p, c) =>
            if (residual.forall { case (o, oi, di) => bound(o)(oi) == p(di) }) {
              bound(d) = p
              walk(stepNo + 1, mult * c)
            }
          })
        }
      walk(0, 1L)
      out.result()
    }

    // ---- typed (LEFT-carrying) left-deep delta evaluation ----
    // base constraints per level j: conds(j) as (boundLevel, levelAttrIdx,
    // ownAttrIdx); trigger constraints per (trigger t, prefix level j):
    // conds(t) edges landing on j as (ownAttrIdx@j, attrIdx@t)
    val baseCons: IndexedSeq[Seq[(Int, Int, Int)]] = (0 until n).map { j =>
      if (j == 0) Nil
      else conds(j).map(c =>
        (c.leftInput, payIdx(c.leftInput)(c.leftCol), payIdx(j)(c.rightCol)))
    }
    val trigCons: IndexedSeq[IndexedSeq[Seq[(Int, Int)]]] = (0 until n).map { t =>
      (0 until n).map { j =>
        if (t == 0 || j >= t) Nil
        else conds(t).filter(_.leftInput == j)
          .map(c => (payIdx(j)(c.leftCol), payIdx(t)(c.rightCol)))
      }
    }
    val nullPay: IndexedSeq[Seq[Any]] =
      payF.map(_.map(_ => null: Any).toSeq).toIndexedSeq

    // live rows of input j matching the bound tuple under conds(j):
    // index lookup via the first constraint's pair, residuals filtered;
    // a null/padded referenced level never matches (SQL null-reject)
    def candsBase(st: Array[Side], bound: Array[Seq[Any]], j: Int)
        : Seq[(Seq[Any], Long)] = {
      val cons = baseCons(j)
      if (cons.isEmpty) {
        val nbr = pairsOf(j).head._1
        st(j).iterator.collect { case ((p, _), b) if p == nbr => b }
          .flatten.toSeq
      } else {
        val via = cons.head._1
        if (bound(via) == null) Nil
        else {
          val key = lookupIdx((j, via)).map(bound(via)(_))
          val rest = cons.filter(_._1 != via)
          st(j).get((via, key)).map(_.iterator.filter { case (p, _) =>
            rest.forall { case (l, li, ji) =>
              bound(l) != null && bound(l)(li) == p(ji) }
          }.toSeq).getOrElse(Nil)
        }
      }
    }

    def typedStep(st: Array[Side], e: Row): Seq[Row] = {
      val t = e.getInt(1)
      val retract = isRetract(e.getString(3))
      val outSeq = 2L * e.getLong(2) + e.getInt(4)
      val r = e.getStruct(5 + t).toSeq
      val own = st(t)
      val keys = indexKeys(t, r)
      if (retract) {
        // retract of a row not live = lossy upstream changelog — skip
        if (!keys.headOption.flatMap(own.get).exists(_.contains(r)))
          return Nil
        // remove FIRST: association checks below must see the post-state
        keys.foreach { k =>
          own.get(k).foreach { b =>
            b.get(r).foreach { c =>
              if (c <= 1) { b.remove(r); if (b.isEmpty) own.remove(k) }
              else b.update(r, c - 1)
            }
          }
        }
      }
      val out = Seq.newBuilder[Row]
      val bound = new Array[Seq[Any]](n)

      def emit(kind: String, mult: Long): Unit = {
        val full = (0 until n)
          .flatMap(j => if (bound(j) == null) nullPay(j) else bound(j))
        var k = 0L
        while (k < mult) { out += Row.fromSeq(full :+ kind :+ outSeq); k += 1 }
      }

      // expand suffix levels (t+1..n-1): pad on empty at LEFT depths,
      // prune on empty at INNER depths
      def suffix(j: Int, mult: Long, kind: String): Unit =
        if (j >= n) emit(kind, mult)
        else {
          val cs = candsBase(st, bound, j)
          if (cs.nonEmpty) cs.foreach { case (p, c) =>
            bound(j) = p; suffix(j + 1, mult * c, kind); bound(j) = null
          }
          else if (jt(j) == "left") suffix(j + 1, mult, kind) // bound stays null
        }

      // at the trigger depth: pad flip per the prefix's association with
      // input t (state already excludes r on both paths — accumulate
      // inserts after the walk, retract removed above)
      def atTrigger(multP: Long): Unit = {
        val padFlip = jt(t) == "left" && t >= 1 &&
          candsBase(st, bound, t).isEmpty
        if (!retract) {
          if (padFlip) suffix(t + 1, multP, RowKind.Delete) // retract the pad
          bound(t) = r
          suffix(t + 1, multP, RowKind.Insert)
          bound(t) = null
        } else {
          bound(t) = r
          suffix(t + 1, multP, RowKind.Delete)
          bound(t) = null
          if (padFlip) suffix(t + 1, multP, RowKind.Insert) // re-pad
        }
      }

      // enumerate joined-prefix tuples (pads included) that can combine
      // with r: a level carrying a trigger edge filters its candidates
      // against r, and a PADDED level with a trigger edge can never match
      // r (null-reject) so that branch prunes
      def prefix(j: Int, mult: Long): Unit =
        if (j == t) atTrigger(mult)
        else {
          val tc = trigCons(t)(j)
          if (baseCons(j).isEmpty && tc.nonEmpty) {
            // level j (= 0) has no earlier-level conds but links to the
            // trigger: probe the (j, t) pair index with r's attrs instead
            // of scanning the level — star-shaped typed joins stay
            // O(delta) per event even with no common shuffle key. A level
            // with no base conds never pads, so empty-lookup just prunes.
            val key = lookupIdx((j, t)).map(r(_))
            st(j).get((t, key)).foreach(_.foreach { case (p, c) =>
              bound(j) = p; prefix(j + 1, mult * c); bound(j) = null
            })
          } else {
            val base = candsBase(st, bound, j)
            if (base.isEmpty) {
              if (jt(j) == "left" && j >= 1 && tc.isEmpty) prefix(j + 1, mult)
            } else {
              val ms =
                if (tc.isEmpty) base
                else base.filter { case (p, _) =>
                  tc.forall { case (ji, ti) => p(ji) == r(ti) } }
              ms.foreach { case (p, c) =>
                bound(j) = p; prefix(j + 1, mult * c); bound(j) = null
              }
            }
          }
        }

      prefix(0, 1L)
      if (!retract) keys.foreach { k =>
        val b = own.getOrElseUpdate(k,
          scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long])
        b.update(r, b.getOrElse(r, 0L) + 1)
      }
      out.result()
    }

    val stepFn: (Array[Side], Row) => Seq[Row] =
      if (typed) typedStep else step

    if (!env.isStreaming) {
      return graft.operators.SecondarySort.mapOrderedGroups(
        env, Seq("__jk"), Seq(col("__seqe"), col("__krank"), col("__side")),
        outSchema) { (_, rows) =>
        val st = emptySt
        rows.flatMap(stepFn(st, _))
      }
    }

    val jkField = env.schema.fields(0)
    val kEnc: Encoder[Row] = Encoders.row(StructType(Seq(jkField)))
    val vEnc: Encoder[Row] = Encoders.row(env.schema)
    type S = Seq[Map[(Int, Seq[Any]), Map[Seq[Any], Long]]]
    val sEnc: Encoder[S] = Encoders.kryo[S]
    val oEnc: Encoder[Row] = Encoders.row(outSchema)

    val timeoutConf = idleTtlMs match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    env.as[Row](vEnc)
      .groupByKey(r => Row(r.get(0)))(kEnc)
      .flatMapGroupsWithState[S, Row](
        OutputMode.Append(), timeoutConf) {
        (_: Row, rows: Iterator[Row], state: GroupState[S]) =>
          if (state.hasTimedOut) {
            // idle TTL expired: drop every input's live rows (state.ttl)
            state.remove()
            Iterator.empty
          } else {
            val st = emptySt
            state.getOption.foreach(_.zipWithIndex.foreach { case (m, i) =>
              st(i) = scala.collection.mutable.LinkedHashMap.from(
                m.view.mapValues(b =>
                  scala.collection.mutable.LinkedHashMap.from(b)).toMap)
            })
            val out = rows.toSeq
              .sortBy(e => (e.getLong(2), e.getInt(4), e.getInt(1)))
              .flatMap(stepFn(st, _))
            if (st.forall(_.isEmpty)) state.remove()
            else {
              state.update(
                st.map(_.view.mapValues(_.toMap).toMap).toSeq)
              idleTtlMs.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }(sEnc, oEnc)
  }
}
