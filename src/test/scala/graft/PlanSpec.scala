package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions: the Spark-inherited abilities VERDICT r1 listed
  * as "never asserted" — filter pushdown into the parquet scan, column
  * pruning (ReadSchema), broadcast choice for small dims, AQE/DPP/runtime-
  * filter configs. These lock the 100 TB-relevant plan properties so a
  * regression (a lost pushdown, a broadcast turned shuffle) fails CI, not
  * the cluster.
  */
class PlanSpec extends SparkSpecBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfMid).queryExecution.executedPlan.toString

  test("q1_agg: shipdate filter reaches the scan; only needed columns read") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    // 7 needed columns, not the full 16-column lineitem schema
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      s"column pruning lost: $readSchema")
  }

  test("q_join_multi: dims broadcast, selective filters pushed") {
    val p = planOf("q_join_multi")
    assert(p.contains("BroadcastHashJoin"), "dim joins must broadcast")
    assert(p.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), "orderdate filter not pushed")
  }

  test("q_vector_topk: query-set predicate pushed; broadcast NLJ on small side") {
    val p = planOf("q_vector_topk")
    assert(p.contains("LessThan(vec_id,10)"), "query-set filter not pushed")
    assert(p.contains("BroadcastNestedLoopJoin"), "query set must broadcast")
    assert(p.contains("WindowGroupLimit"), "top-k must plan as group-limit")
  }

  test("q_tpch_q5: date range pushed to scan, region filter pushed, dims broadcast") {
    val p = planOf("q_tpch_q5")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"date filter not pushed:\n$p")
    assert(p.contains("LessThan(o_orderdate"), "date upper bound not pushed")
    assert(p.contains("EqualTo(r_name,ASIA)"), "region filter not pushed")
    assert(p.contains("BroadcastHashJoin"), "nation/region must broadcast")
  }

  test("q_tpch_q3: segment + date filters pushed, lineitem columns pruned") {
    val p = planOf("q_tpch_q3")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "segment filter not pushed")
    assert(p.contains("GreaterThan(l_shipdate"), "shipdate filter not pushed")
    val lineitemRead = p.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("l_extendedprice"))
    assert(lineitemRead.exists(r => !r.contains("l_comment") && !r.contains("l_tax")),
      s"lineitem column pruning lost: $lineitemRead")
  }

  test("q_tpch_q9: part LIKE filter pushed, part/nation broadcast, partial agg") {
    val p = planOf("q_tpch_q9")
    assert(p.contains("StringContains(p_name,widget)"), s"LIKE filter not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), "part/nation must broadcast")
    // two-phase aggregation: partial before the exchange, final after
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "profit agg must be partial+final")
  }

  test("q_tpch_q21: orderstatus filter pushed, decorrelated grouped passes") {
    val p = planOf("q_tpch_q21")
    assert(p.contains("EqualTo(o_orderstatus,F)"), s"status filter not pushed:\n$p")
    // the EXISTS/NOT-EXISTS pair is one grouped pass per level, no NLJ
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "Q21 must decorrelate without a nested loop")
  }

  test("q_vector_ivf_topk: no global sort for assignment; broadcasts, codegen dots") {
    val p = planOf("q_vector_ivf_topk")
    // r4 shape: assignment reduces per vector via max(struct) partial
    // aggregation — the corpus-by-centroid relation must never feed a
    // global Window sort (the r3 shape's scale killer)
    // max(struct) plans as Sort/ObjectHashAggregate (struct keys aren't
    // hash-aggregable) — any partial+final aggregate pair qualifies
    assert(p.linesIterator.count(_.contains("Aggregate")) >= 2,
      s"assignment must be partial+final aggregation:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "centroids/candidates must broadcast")
    // the native dot expressions keep scoring inside codegen — no
    // interpreted zip_with/aggregate lambdas in the plan
    assert(!p.contains("zip_with"), s"interpreted HOF dot in plan:\n$p")
  }

  test("q_ngram_jaccard: grouped postings, no self-join of the shingle subtree") {
    val p = planOf("q_ngram_jaccard")
    // candidate pairs come from ONE grouped pass + explode, not a
    // posting-list self-join (SortMergeJoin/ShuffledHashJoin on s)
    assert(!p.contains("SortMergeJoin"), s"self-join shape is back:\n$p")
    // shingle explode ×2 (postings + the two broadcast size instances
    // share one), pair explode ×1, sizes instance ×1 — measured faster
    // than the join-free carry-sizes-in-postings variant (struct posting
    // lists tripled the grouped-aggregation cost)
    assert(p.linesIterator.count(_.contains("Generate explode")) == 4,
      s"unexpected explode count:\n$p")
  }

  test("q_cdc_debezium: single parse pass, codegen JSON, no UDF boundary") {
    val p = planOf("q_cdc_debezium")
    // one explode-of-candidates per envelope row — not four scans of the
    // parsed column. The feed builder contributes its own explode
    // (single-scan envelope generation), so count only the parse pass:
    // the Generate whose candidates carry the rowkind envelope markers.
    assert(p.linesIterator.count(l =>
        l.contains("Generate explode") && l.contains("kind, +I")) == 1,
      s"CDC parse must be a single explode pass:\n$p")
    assert(p.linesIterator.count(_.contains("Generate explode")) == 2,
      s"expected exactly feed-build + parse explodes:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"CDC parse must stay declarative:\n$p")
  }

  test("q_decontaminate: benchmark shingles broadcast, corpus probe unshuffled") {
    val p = planOf("q_decontaminate")
    // the benchmark side must reach the probe as a broadcast relation —
    // the corpus-sized shingle stream never shuffles for the join
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark shingle set must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not shuffle for the benchmark probe:\n$p")
  }

  test("q_train_shuffle: range exchange + in-partition sort, no global sort") {
    val p = planOf("q_train_shuffle")
    assert(p.contains("rangepartitioning"),
      s"epoch shuffle must be a range exchange:\n$p")
    // the sort must stay within partitions (global=false ⇒ no single-task
    // final sort); formatted plans print in-partition sorts as non-global
    assert(!p.linesIterator.exists(l =>
        l.contains("Sort ") && l.contains("global=true")),
      s"global sort would bottleneck one task:\n$p")
  }

  test("q_window_join_hop: windowed equi-join, no cartesian, two explodes") {
    val p = planOf("q_window_join_hop")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"hop-window join must stay an equi-join:\n$p")
    // one hop-expansion explode per side — not re-derived per reference
    assert(p.linesIterator.count(_.contains("Generate explode")) == 2,
      s"expected exactly one hop explode per side:\n$p")
  }

  test("q_protobuf: codec stays expression-level, single scan") {
    val p = planOf("q_protobuf")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"protobuf codec must be a native expression:\n$p")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"round trip must read orders once:\n$p")
  }

  test("q_approx_distinct: HLL sketch never rides the per-distinct-key aggregate") {
    val p = planOf("q_approx_distinct")
    // if the sketch's partial aggregate is keyed by (l_returnflag,
    // l_partkey) — the expand-based combined distinct plan — that's one
    // sketch buffer per distinct key (r6's 37× breach, OOM at 100×). The
    // sketch must aggregate keyed by l_returnflag alone. l_partkey
    // legitimately appears as the sketch's ARGUMENT; only its presence in
    // the keys=[…] segment marks the bad plan. Matches both sketch
    // spellings (hll_sketch_agg / approx_count_distinct) so a future
    // rewrite can't silently regress the shape.
    val offending = p.linesIterator.filter { l =>
      (l.contains("hll_sketch_agg") || l.contains("approx_count_distinct")) && {
        val i = l.indexOf("keys=[")
        val j = if (i >= 0) l.indexOf("]", i) else -1
        i >= 0 && j > i && l.substring(i, j).contains("l_partkey")
      }
    }
    assert(offending.isEmpty,
      s"HLL partial rides the per-partkey aggregate:\n${offending.mkString("\n")}")
    assert(p.contains("hll_sketch_agg"),
      s"sketch must still be computed:\n$p")
  }

  test("q_sql_tumble: the SQL text path adds no execution overhead") {
    // the translator only splices a temp view — the plan must be the DSL
    // plan: one scan, two-phase agg, no UDF boundary, no extra shuffle
    val p = planOf("q_sql_tumble")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"SQL path must scan events once:\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"SQL path must stay declarative:\n$p")
    // window assignment is a pure projection: exchanges are only the agg
    // hash-partition and the ORDER BY range-partition
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2,
      s"unexpected exchanges in the SQL path:\n$p")
  }

  test("scale configs: AQE, skew join, DPP, runtime bloom filters active") {
    val c = spark.conf
    assert(c.get("spark.sql.adaptive.enabled") == "true")
    assert(c.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c.get("spark.sql.optimizer.dynamicPartitionPruning.enabled") == "true")
    assert(c.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
  }

  test("no scale killers: collect/cartesian absent from registry plans") {
    // every registered query must plan without CartesianProduct (the one
    // theta NLJ uses BroadcastNestedLoopJoin by construction)
    val offenders = Seq("q_ngram_jaccard", "q_dedup_minhash",
      "q_embedding_cosine_dup", "q_upsert_materialize", "q_match_recognize")
      .filter(n => planOf(n).contains("CartesianProduct"))
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("tpcds pack: no cartesians; correlated subqueries decorrelate") {
    // both TPC-DS families plan without CartesianProduct: the 99 DSL
    // shapes (q_tpcds_qN) and the 99 official SQL texts (q_tpcds_sql_NN).
    // The q_tpcds_sf1_* de-vacuation tier (r17) is the same 17 official
    // texts against the sf1 corpus — identical plans, already covered by
    // the sql pack, and only registered when the corpus exists.
    val all = SparkEntry.queries.keys.filter(_.startsWith("q_tpcds_"))
      .filterNot(_.startsWith("q_tpcds_sf1_")).toSeq
    val (sqlPack, shapePack) = all.partition(_.startsWith("q_tpcds_sql_"))
    assert(shapePack.size == 99,
      s"expected the full 99-shape pack, found ${shapePack.size}")
    assert(sqlPack.size == 99,
      s"expected the full 99-official-text pack, found ${sqlPack.size}")
    // q77's OFFICIAL text crosses two per-call-center aggregate CTEs with
    // no condition ("FROM cs, cr" — catalog channel has one logical call
    // center) — a deliberate tiny-by-tiny cartesian in the benchmark
    // itself, not a planning failure; everything else must stay clean
    val cartesians = all.filterNot(_ == "q_tpcds_sql_77")
      .filter(n => planOf(n).contains("CartesianProduct"))
    assert(cartesians.isEmpty, s"cartesian products in: $cartesians")
    // the correlated-subquery shapes (q1 aggregate-correlated, q6 avg-
    // correlated, q41 count-correlated, q81 state-average-correlated,
    // q92 per-item-average-correlated) must decorrelate into joins —
    // a BroadcastNestedLoopJoin would mean per-row re-execution shape
    for (n <- Seq("q_tpcds_q1", "q_tpcds_q6", "q_tpcds_q41",
        "q_tpcds_q81", "q_tpcds_q92")) {
      val p = planOf(n)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$n did not decorrelate:\n$p")
    }
  }

  test("q_tpcds_q3: date dim broadcast, filter pushed, two-phase agg") {
    val p = planOf("q_tpcds_q3")
    assert(p.contains("EqualTo(p_type,PROMO)"), s"type filter not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), "part dim must broadcast")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "brand/year agg must be partial+final")
  }

  test("q_tpcds_q67: rollup ranks inside WindowGroupLimit, no global sort") {
    val p = planOf("q_tpcds_q67")
    // rank<=5 per type partition must push a group-limit below the window
    assert(p.contains("WindowGroupLimit"), s"rank filter not pushed:\n$p")
    assert(p.contains("Expand"), "rollup must plan as Expand")
  }

  test("q_tpcds_q28: manual two-phase distinct, no Expand over the fact") {
    val p = planOf("q_tpcds_q28")
    // the six distinct-price counts ride ONE (band, price) partial agg —
    // never Catalyst's multi-countDistinct Expand (6x the fact scan into
    // a single final partition, VERDICT r14 #3)
    assert(!p.contains("Expand"), s"Expand over the fact scan:\n$p")
    // one scan of lineitem, not the benchmark's six
    assert(p.linesIterator.count(_.contains("parquet")) <= 2,
      s"fact must be scanned once:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 4,
      "both agg levels must be partial+final")
  }

  test("q_tpcds_q72: every join hash-based on equi keys, never a nested loop") {
    val p = planOf("q_tpcds_q72")
    // the inventory mega-join chains a fact-fact join (sales x inv on
    // part/supp/month with the quantity inequality as residual), three
    // dims, and two LEFT OUTER legs — every one must be an EQUI hash
    // join. At sf0.01 the aggregated inventory side is below the
    // broadcast threshold so Catalyst broadcasts it too (the right
    // call); at 100 TB stats push it to SMJ automatically. What must
    // hold at ANY scale: no cartesian, no nested-loop fallback (an
    // inequality-only join would plan BNLJ), all 6 joins present.
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"a join lost its equi keys and fell back to a nested loop:\n$p")
    // 5, not 6: Catalyst ELIMINATES the returns left join outright (its
    // right side is distinct and no output column is referenced — the
    // no-op outer join optimization), which is the plan you'd want
    assert(p.linesIterator.count(_.contains("HashJoin")) +
      p.linesIterator.count(_.contains("SortMergeJoin")) >= 5,
      s"the surviving joins must all be hash/merge equi-joins:\n$p")
  }

  test("q_tpcds_q95: count-distinct form avoids the fact self-join blowup") {
    val p = planOf("q_tpcds_q95")
    // one aggregate on the order key, then semi joins — never fact×fact
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(_.contains("LeftSemi")) >= 2,
      s"both gates must be semi joins:\n$p")
  }

  test("q_chunk_documents: expression-only chunking, no UDF, pruned scan") {
    val p = planOf("q_chunk_documents")
    // sequence/transform/slice/array_join stay expressions; posexplode
    // is the only Generate; no UDF boundary anywhere
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"UDF boundary leaked into the chunking plan:\n$p")
    assert(p.contains("Generate"), "posexplode should plan as Generate")
    // only doc_id and text are read from the documents scan
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("n_chars"), s"scan not pruned: $read")
    assert(!p.contains("CartesianProduct"))
  }

  test("ivf big-probe shape drops the candidate broadcast (size gate)") {
    import org.apache.spark.sql.functions._
    // VERDICT r17 task 7: IvfIndex broadcasts its candidate (qid, cid)
    // pairs — fine at benched probe sizes, a driver-memory ceiling for a
    // millions-of-queries probe. The gate estimates candidate bytes from
    // the query side's plan stats and drops the hint above the ceiling.
    val corpus = Tables.embeddings(spark, sfMid)
      .select(col("vec_id"), col("embedding"))
    val small = corpus.limit(200)
    // a probe set whose ESTIMATED size clears the 64 MB candidate
    // ceiling (range stats are exact; the vector column multiplies the
    // estimated row width) — never executed, plan-only
    val big = spark.range(30000000L)
      .select(col("id").as("vec_id"),
        array((0 until 64).map(i => (col("id") % (i + 7)).cast("float")): _*)
          .as("embedding"))
    val ivf = graft.operators.VectorIndexes("ivf")
    val smallPlan = ivf.topK(corpus, small, 5)
      .queryExecution.sparkPlan.toString
    val bigPlan = ivf.topK(corpus, big, 5)
      .queryExecution.sparkPlan.toString
    def broadcasts(p: String): Int =
      "BroadcastHashJoin".r.findAllIn(p).size
    // small probe keeps the tuned shape (probe, candidates and query
    // embeddings hint-broadcast, 3 BroadcastHashJoins); big probe drops
    // ALL query-derived hints: the probe and qid joins become SHUFFLE
    // joins, and the candidate join is left to Catalyst's stats — which
    // here broadcast the (small) corpus scan, the choice that flips to a
    // shuffle too once the corpus side outgrows the threshold. The lock:
    // nothing derived from the big probe set is ever broadcast.
    assert(broadcasts(smallPlan) == broadcasts(bigPlan) + 2,
      s"expected the big-probe plan to drop two hinted broadcast joins\n" +
        s"--- small ---\n$smallPlan\n--- big ---\n$bigPlan")
    assert("SortMergeJoin \\[qid".r.findFirstIn(bigPlan).isDefined ||
      "ShuffledHashJoin \\[qid".r.findFirstIn(bigPlan).isDefined,
      s"big-probe re-score must shuffle on qid, not broadcast the " +
        s"query embeddings\n$bigPlan")
    assert("SortMergeJoin".r.findAllIn(smallPlan).isEmpty,
      "small probe must keep the all-broadcast tuned shape")
  }
}
