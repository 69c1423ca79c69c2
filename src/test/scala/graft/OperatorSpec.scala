package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Deliberately hung store client: every probe sleeps far longer than any
  * test timeout. Top-level for closure serialization. */
private class SlowLookupClient extends LookupClient {
  override def lookup(key: Any): Option[Seq[Any]] = {
    Thread.sleep(5000); Some(Seq("late"))
  }
}

/** Hung model provider declaring NON-nullable outputs — exercises the
  * Nulls-policy nullability relaxation. Top-level for serialization. */
private class HungModel extends graft.ml.ModelProvider {
  import org.apache.spark.sql.types._
  override def name: String = "hung"
  override val outputSchema: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false)))
  override def predictBatch(rows: Seq[org.apache.spark.sql.Row]) = {
    Thread.sleep(5000); rows.map(_ => org.apache.spark.sql.Row(1.0))
  }
}

class OperatorSpec extends SparkSpecBase {
  import TestSpark.spark.implicits._

  test("AsOfJoin attaches latest right row at or before left time") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 90.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin(left, right, "k", "t", "t", Seq("v"))
      .select($"k", $"t", $"tag", $"asof_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSet
    // left (1,10) sees right at t=10 (<= inclusive); (1,20) sees t=15;
    // (2,5) has no right at or before → null
    assert(out == Set(
      (1L, 10L, "a", Some(100.0)),
      (1L, 20L, "b", Some(150.0)),
      (2L, 5L, "c", None)))
  }

  test("Sessionize splits on gaps > threshold") {
    val df = Seq((1L, 100L), (1L, 150L), (1L, 400L), (2L, 10L))
      .toDF("k", "t")
    val out = Sessionize(df, "k", "t", gap = 100L)
      .select($"k", $"t", $"__session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // gap 100: (100,150) same session (diff 50); 400 starts new (diff 250)
    assert(out == Set(
      (1L, 100L, 100L), (1L, 150L, 100L), (1L, 400L, 400L), (2L, 10L, 10L)))
  }

  test("Sessionize boundary: gap exactly equal to threshold stays joined") {
    val df = Seq((1L, 0L), (1L, 100L), (1L, 201L)).toDF("k", "t")
    val starts = Sessionize(df, "k", "t", gap = 100L)
      .select($"__session_start").as[Long].collect().sorted
    // diff 100 == gap → same session; diff 101 > gap → new session
    assert(starts.toSeq == Seq(0L, 0L, 201L))
  }

  test("TopN keeps n rows per group in order") {
    val df = Seq(("g1", 3), ("g1", 1), ("g1", 2), ("g2", 9)).toDF("g", "v")
    val out = TopN(df, 2, Seq($"g"), Seq($"v".desc))
      .select($"g", $"v", $"rank_no")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set(("g1", 3, 1), ("g1", 2, 2), ("g2", 9, 1)))
  }

  test("Dedup keepFirst / keepLast") {
    val df = Seq((1L, 10L, "x"), (1L, 20L, "y"), (2L, 5L, "z"))
      .toDF("k", "t", "tag")
    val first = Dedup.keepFirst(df, Seq($"k"), Seq($"t"))
      .select($"tag").as[String].collect().toSet
    val last = Dedup.keepLast(df, Seq($"k"), Seq($"t"))
      .select($"tag").as[String].collect().toSet
    assert(first == Set("x", "z"))
    assert(last == Set("y", "z"))
  }

  test("Windows.tumbleStart / hopStarts / cumulateEnds assignment") {
    val df = Seq(Tuple1(25L)).toDF("t")
    val tumble = df.select(Windows.tumbleStart($"t", 10L)).as[Long].head()
    assert(tumble == 20L)
    val hops = df.select(Windows.hopStarts($"t", 20L, 10L)).as[Seq[Long]].head()
    assert(hops == Seq(10L, 20L)) // windows [10,30) and [20,40) cover t=25
    val ends = df.select(Windows.cumulateEnds($"t", 40L, 10L)).as[Seq[Long]].head()
    assert(ends == Seq(30L, 40L)) // start=0(mod 40): ends >25 → 30, 40
  }

  test("Windows boundary: element exactly on a step boundary") {
    val df = Seq(Tuple1(30L)).toDF("t")
    val ends = df.select(Windows.cumulateEnds($"t", 40L, 10L)).as[Seq[Long]].head()
    assert(ends == Seq(40L)) // window end must be > t: 30 excluded
    val hops = df.select(Windows.hopStarts($"t", 20L, 10L)).as[Seq[Long]].head()
    assert(hops == Seq(20L, 30L))
  }

  test("approx_count_distinct within 5% of exact") {
    val l = Tables.lineitem(spark, sfMid)
    val exact = l.select(countDistinct($"l_partkey")).as[Long].head()
    val apx = l.select(approx_count_distinct($"l_partkey")).as[Long].head()
    assert(math.abs(apx - exact).toDouble / exact < 0.05,
      s"apx=$apx exact=$exact")
  }

  test("secondary-sorted operators stream a hot key (200k rows, one key)") {
    // One key holding the entire input: the old flatMapGroups+toSeq shape
    // buffered all 200k rows per task; the SecondarySort shape keeps O(1)
    // per-key state and must produce identical results.
    val n = 200000
    val hot = spark.range(n)
      .selectExpr("1L AS k", "id AS t",
        "CAST(id % 97 AS DOUBLE) AS v")

    // TableAgg: competition rank with ties over the single group.
    val top = TableAgg.topNWithTies(hot, Seq("k"), "v", 3)
    // v cycles 0..96; top value 96 appears ceil(n/97) times => all rank 1;
    // next distinct value 95 gets competition rank (count(96)+1) > 3, so
    // ONLY the 96s are emitted.
    val expected96 = (0 until n).count(_ % 97 == 96)
    assert(top.count() == expected96)
    assert(top.agg(min($"rnk"), max($"rnk")).as[(Int, Int)].head() == ((1, 1)))

    // MatchRecognize: v cycles 0..96 then drops to 0 — per cycle one
    // falling edge (96 -> 0) followed by a rise, i.e. one V per cycle
    // except the tail.
    val m = MatchRecognize.fallingRunThenRise(hot, "k", "t", "v")
    val matches = m.collect()
    // one V per cycle: fall at t=k*97+96 -> k*97+97, rise at k*97+98;
    // a match needs the rising row to exist (k*97+98 <= n-1)
    assert(matches.length == (n - 1 - 98) / 97 + 1)
    assert(matches.forall(r => r.getLong(3) == 1L && r.getDouble(4) == 96.0))
  }

  test("async operators time out on a hung client per policy") {
    import org.apache.spark.sql.types._
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "tag").repartition(1)
    val payload = StructType(Seq(StructField("v", StringType)))

    // Nulls policy: a hung batch degrades to all-misses (left => null pad)
    val t0 = System.nanoTime()
    val relaxed = LookupJoin.async(df, "k", new SlowLookupClient, payload,
      joinType = "left", batchSize = 8, timeoutMs = 150,
      onTimeout = AsyncWait.Nulls)
      .collect()
    assert((System.nanoTime() - t0) / 1e9 < 4.0, "timeout did not apply")
    assert(relaxed.length == 2 && relaxed.forall(_.get(2) == null))

    // inner + Nulls: timed-out batch treated as misses => dropped
    val dropped = LookupJoin.async(df, "k", new SlowLookupClient, payload,
      joinType = "inner", batchSize = 8, timeoutMs = 150,
      onTimeout = AsyncWait.Nulls).collect()
    assert(dropped.isEmpty)

    // Fail policy: the task fails with the timeout as root cause
    val ex = intercept[Exception] {
      LookupJoin.async(df, "k", new SlowLookupClient, payload,
        joinType = "left", batchSize = 8, timeoutMs = 150,
        onTimeout = AsyncWait.Fail).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(
      _.isInstanceOf[java.util.concurrent.TimeoutException]))

    // AsyncCalc: slow scalar function, null policy
    val calc = AsyncCalc(df, _ => { Thread.sleep(5000); "never" },
      StructField("out", StringType), batchSize = 8,
      timeoutMs = 150, onTimeout = AsyncWait.Nulls).collect()
    assert(calc.length == 2 && calc.forall(_.get(2) == null))
  }

  test("AsyncCorrelate: 1-to-many ordered emission, inner vs left, timeout/retry parity") {
    import org.apache.spark.sql.types._
    // 1-to-many: each row fans out to k rows; k=0 rows distinguish
    // inner (dropped) from left (null-padded)
    val df = Seq((1L, 2), (2L, 0), (3L, 3)).toDF("k", "n").repartition(1)
    val fanout: org.apache.spark.sql.Row => Seq[Seq[Any]] =
      r => (0 until r.getInt(1)).map(i => Seq(s"${r.getLong(0)}-$i", i.toLong))
    val outF = Seq(StructField("tag", StringType), StructField("i", LongType))

    val inner = AsyncCorrelate(df, fanout, outF, joinType = "inner",
      batchSize = 1, maxInFlight = 4).collect()
    // ordered emission despite concurrent batches: input order preserved
    assert(inner.map(_.getString(2)).toSeq ==
      Seq("1-0", "1-1", "3-0", "3-1", "3-2"))
    val left = AsyncCorrelate(df, fanout, outF, joinType = "left",
      batchSize = 1, maxInFlight = 4).collect()
    assert(left.length == 6)
    assert(left.filter(_.getLong(0) == 2L).map(r => (r.get(2), r.get(3)))
      .toSeq == Seq((null, null)))

    // timeout parity with AsyncCalc: Nulls pads LEFT, drops INNER
    val hung: org.apache.spark.sql.Row => Seq[Seq[Any]] =
      _ => { Thread.sleep(5000); Seq(Seq("never", 0L)) }
    val padded = AsyncCorrelate(df, hung, outF, joinType = "left",
      batchSize = 8, timeoutMs = 150, onTimeout = AsyncWait.Nulls).collect()
    assert(padded.length == 3 && padded.forall(_.get(2) == null))
    val droppedC = AsyncCorrelate(df, hung, outF, joinType = "inner",
      batchSize = 8, timeoutMs = 150, onTimeout = AsyncWait.Nulls).collect()
    assert(droppedC.isEmpty)
    val exC = intercept[Exception] {
      AsyncCorrelate(df, hung, outF, joinType = "left",
        batchSize = 8, timeoutMs = 150, onTimeout = AsyncWait.Fail).collect()
    }
    def causesC(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causesC(t.getCause)
    assert(causesC(exC).exists(
      _.isInstanceOf[java.util.concurrent.TimeoutException]))

    // retry parity: flaky function recovers under FixedDelay
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val flakyC: org.apache.spark.sql.Row => Seq[Seq[Any]] = r => {
      if (attempts.incrementAndGet() <= 2)
        throw new RuntimeException("transient")
      Seq(Seq(s"ok-${r.getLong(0)}", 0L))
    }
    val recovered = AsyncCorrelate(df.limit(1), flakyC, outF,
      batchSize = 8, retry = AsyncWait.FixedDelay(3, 10)).collect()
    assert(recovered.map(_.getString(2)).toSeq == Seq("ok-1"))
  }

  test("AsyncCorrelate SQL spelling routes LATERAL TABLE to the async tier") {
    import org.apache.spark.sql.types._
    graft.sql.FlinkSql.registerAsyncTableFunction("fan_toks",
      graft.sql.FlinkSql.AsyncUdtfSpec(
        args => args.head.toString.split(" ").filter(_.length > 3).toSeq
          .map(t => Seq(t, t.length.toLong)),
        Seq(StructField("tok", StringType), StructField("tok_len", LongType))))
    try {
      val docs = Seq((1L, "alpha is long"), (2L, "no"))
        .toDF("id", "txt")
      // comma form = INNER
      val inner = graft.sql.FlinkSql.sql(spark,
        """SELECT id, tok, tok_len
          |FROM docs, LATERAL TABLE(fan_toks(txt)) AS T(tok, tok_len)
          |ORDER BY id, tok""".stripMargin,
        Map("docs" -> docs)).collect()
      assert(inner.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq == Seq((1L, "alpha", 5L), (1L, "long", 4L)))
      // LEFT JOIN … ON TRUE = LEFT (row 2 kept, null-padded)
      val left = graft.sql.FlinkSql.sql(spark,
        """SELECT id, tok FROM docs
          |LEFT JOIN LATERAL TABLE(fan_toks(txt)) AS T(tok, tok_len) ON TRUE
          |ORDER BY id, tok""".stripMargin,
        Map("docs" -> docs)).collect()
      assert(left.length == 3)
      assert(left.filter(_.getLong(0) == 2L).map(_.get(1)).toSeq == Seq(null))
    } finally graft.sql.FlinkSql.dropAsyncTableFunction("fan_toks")
  }

  test("PatternMatch minCount: short runs rejected, long runs match") {
    // key 1: V with a single fall (rejected at minCount=2);
    // key 2: V with a two-step fall (accepted)
    val rows = Seq(
      (1L, 1L, 5.0), (1L, 2L, 3.0), (1L, 3L, 6.0),
      (2L, 1L, 5.0), (2L, 2L, 4.0), (2L, 3L, 2.0), (2L, 4L, 6.0))
      .toDF("k", "t", "v")
    val steps = Seq(
      PatternStep("down", (p: Double, c: Double) => c < p, greedy = true,
        minCount = 2),
      PatternStep("up", (p: Double, c: Double) => c > p, greedy = true))
    val out = PatternMatch(rows, "k", "t", "v", steps)
      .select($"k", $"n_down", $"n_up").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set((2L, 2L, 1L)))
  }

  test("LSH bucket cap bounds degenerate embedding candidates") {
    // 40 identical constant-sign vectors land in ONE bucket in every
    // band — uncapped, candidate generation goes quadratic on that key
    // (40*39/2 = 780 pairs). Capped at 10 the hot buckets switch to
    // representative pairing (ADVICE r11): each member pairs with the
    // bucket's min-id rep, so the cluster stays CONNECTED through the
    // rep star (identical vectors are hot in every band at once — no
    // other band rescues them) while the pair count stays linear.
    val dim = 64
    val constants = (1L to 40L).map(i => (i, Array.fill(dim)(1.0f)))
    val alt = Array.tabulate(dim)(d => if (d % 2 == 0) 1.0f else -1.0f)
    val dups = Seq((100L, alt), (101L, alt.clone()))
    val emb = (constants ++ dups).toDF("vec_id", "embedding")

    val capped = graft.queries.VectorQueries
      .cosineDupPairs(emb, 0.3, bucketCap = 10)
    val got = capped.select($"vec_a", $"vec_b").as[(Long, Long)]
      .collect().toSet
    // rep star (1, i) for every constant member + the genuine dup pair:
    // linear (40 pairs), not quadratic (781)
    assert(got ==
      (2L to 40L).map(i => (1L, i)).toSet + ((100L, 101L)))
    // cluster recall: connected components over the capped pairs still
    // groups ALL 40 identical vectors into one cluster
    val cc = graft.operators.ConnectedComponents(
      capped.select($"vec_a", $"vec_b"), "vec_a", "vec_b")
    assert(cc.where($"label" === 1L).count() == 40)
    // plan lock: bucketed candidate generation, never all-pairs; the
    // bucket-size gate and the rep ride ONE window over (band, key)
    // whose exchange the grouping reuses — one shuffle, one signature
    // pass
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
    assert(!plan.contains("LeftSemi"))

    // cap above every bucket: exactly the uncapped answer (the
    // verification-scale contract — 780 constant pairs + the dup pair)
    val wide = graft.queries.VectorQueries
      .cosineDupPairs(emb, 0.3, bucketCap = 1000)
    assert(wide.count() == 40L * 39 / 2 + 1)
  }

  test("MinHash band-bucket cap bounds all-identical-doc candidates") {
    // 40 byte-identical documents share one MinHash signature, so they
    // land in ONE bucket in EVERY band (no other band rescues them) —
    // uncapped, the in-bucket pair explosion goes quadratic on that key
    // (40*39/2 = 780 pairs). Capped at 10 the hot buckets switch to
    // representative pairing: linear (39 rep pairs), and a downstream
    // connected-components pass still groups the full cluster via the
    // rep star. Two genuinely near-dup docs in small buckets keep exact
    // pairing.
    val boiler = (1L to 40L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val dups = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta iota"))
    val docs = (boiler ++ dups).toDF("doc_id", "text")

    val capped = graft.queries.TextQueries
      .minhashCandidatePairs(docs, bucketCap = 10)
    val got = capped.as[(Long, Long)].collect().toSet
    assert(got.contains((100L, 101L))) // real near-dup pair survives
    val boilerPairs = got.filter(_._1 <= 40L)
    assert(boilerPairs == (2L to 40L).map(i => (1L, i)).toSet) // rep star
    val cc = graft.operators.ConnectedComponents(
      capped.select($"doc_a", $"doc_b"), "doc_a", "doc_b")
    assert(cc.where($"label" === 1L).count() == 40)
    // plan lock (as the embedding-LSH twin): bucketed candidate
    // generation, never all-pairs; the size gate and the rep ride ONE
    // window over (band, bkey) whose exchange the grouping reuses — the
    // gate runs BEFORE collect_list materializes any array
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))

    // cap above every bucket: exactly the uncapped answer (the
    // verification-scale contract — 780 boiler pairs + the dup pair)
    val wide = graft.queries.TextQueries
      .minhashCandidatePairs(docs, bucketCap = 1000)
    assert(wide.count() == 40L * 39 / 2 + 1)
  }

  test("MinHash cap recall property: planted dup families stay connected under any cap") {
    // randomized corpora (fixed seed): identical-doc families are hot in
    // EVERY band bucket at once, so the rep-star guarantee — every
    // family member connects to the bucket's min-id rep — must hold for
    // ANY cap, not just the production 64. CC over the capped pairs must
    // put each planted family into one cluster.
    val rnd = new scala.util.Random(42)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    for (trial <- 1 to 2) {
      var id = 0L
      val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val families = (1 to 6).map { _ =>
        val text = Seq.fill(8)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        val members = (1 to 2 + rnd.nextInt(5)).map { _ =>
          id += 1; docs += ((id, text)); id
        }
        members.toSet
      }
      (1 to 20).foreach { _ => // unique chaff
        id += 1
        docs += ((id,
          Seq.fill(8)(vocab(rnd.nextInt(vocab.length))).mkString(" ") +
            s" unique$id"))
      }
      val cap = 2 + rnd.nextInt(4) // far below family sizes
      val pairs = graft.queries.TextQueries
        .minhashCandidatePairs(docs.toSeq.toDF("doc_id", "text"), bucketCap = cap)
      val cc = graft.operators.ConnectedComponents(pairs, "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      families.foreach { fam =>
        val labels = fam.map(m => cc.getOrElse(m, m))
        assert(labels.size == 1,
          s"trial $trial cap $cap: family $fam split across labels $labels")
      }
    }
  }

  test("NgramJaccard df cap bounds hot-shingle candidates") {
    // 20 docs all sharing one boilerplate shingle ("common legal footer"),
    // plus two genuinely near-duplicate docs. Uncapped, the boilerplate
    // alone generates 20*19/2 = 190 candidate pairs; capped at 10 it
    // generates none, and only the real near-dup pair survives.
    val boiler = (1 to 20).map(i => (s"b$i", s"common legal footer unique$i"))
    val dups = Seq(
      ("d1", "alpha beta gamma delta epsilon"),
      ("d2", "alpha beta gamma delta zeta"))
    val docs = (boiler ++ dups).toDF("doc_id", "text")

    val sh = docs.select($"doc_id",
      explode(graft.functions.TextAnalysis.shingles(
        graft.functions.TextAnalysis.tokens($"text"), 3)).as("s"))
    val capped = NgramJaccard.cappedPostings(sh, dfCap = 10)
    // The df=20 shingle is gone; every remaining posting has df <= 10.
    assert(capped.where($"s" === "common legal footer").count() == 0)
    val maxDf = capped.groupBy($"s").count()
      .agg(max($"count")).as[Long].head()
    assert(maxDf <= 10)

    val pairs = NgramJaccard(docs, n = 3, dfCap = 10, minJaccard = 0.5)
      .select($"doc_a", $"doc_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("d1", "d2")))

    // Cap above every df: identical to the uncapped answer.
    val uncapped = NgramJaccard(docs, n = 3, dfCap = 1000, minJaccard = 0.0)
    val cappedAll = NgramJaccard(docs, n = 3, dfCap = 20, minJaccard = 0.0)
    assert(uncapped.count() == cappedAll.count())
  }

  test("PatternMatch WITHIN: over-budget matches discarded at completion") {
    // two Vs on one key: a tight V (duration 2) and a slow V (duration 30)
    val rows = Seq(
      (1L, 10L, 5.0), (1L, 11L, 3.0), (1L, 12L, 6.0),
      (1L, 30L, 9.0), (1L, 45L, 4.0), (1L, 60L, 7.0))
      .toDF("k", "t", "v")
    val steps = Seq(
      PatternStep("down", (p: Double, c: Double) => c < p, greedy = true),
      PatternStep("up", (p: Double, c: Double) => c > p, greedy = true))
    // the rise at t=30 extends the first V's up-run: (10,30) and (30,60)
    val all = PatternMatch(rows, "k", "t", "v", steps)
      .select($"start_us", $"end_us").as[(Long, Long)].collect().toSet
    assert(all == Set((10L, 30L), (30L, 60L)))
    val bounded = PatternMatch(rows, "k", "t", "v", steps,
      withinUs = Some(25L))
      .select($"start_us", $"end_us").as[(Long, Long)].collect().toSet
    assert(bounded == Set((10L, 30L)))
  }

  test("PatternMatch SKIP TO NEXT ROW: overlapping suffix anchors emitted") {
    // one falling run 8>6>4>2 then a rise: anchors at 8, 6, 4
    val rows = Seq(
      (1L, 1L, 8.0), (1L, 2L, 6.0), (1L, 3L, 4.0), (1L, 4L, 2.0),
      (1L, 5L, 9.0)).toDF("k", "t", "v")
    val steps = Seq(
      PatternStep("down", (p: Double, c: Double) => c < p, greedy = true),
      PatternStep("up", (p: Double, c: Double) => c > p, greedy = false))
    val past = PatternMatch(rows, "k", "t", "v", steps)
      .select($"start_us", $"end_us", $"n_down").as[(Long, Long, Long)]
      .collect().toSet
    assert(past == Set((1L, 5L, 3L)))
    val next = PatternMatch(rows, "k", "t", "v", steps,
      skip = AfterMatchSkip.ToNextRow)
      .select($"start_us", $"end_us", $"n_down").as[(Long, Long, Long)]
      .collect().toSet
    assert(next == Set((1L, 5L, 3L), (2L, 5L, 2L), (3L, 5L, 1L)))
    // WITHIN composes per anchor: only the short suffixes survive
    val nextBounded = PatternMatch(rows, "k", "t", "v", steps,
      withinUs = Some(3L), skip = AfterMatchSkip.ToNextRow)
      .select($"start_us", $"n_down").as[(Long, Long)].collect().toSet
    assert(nextBounded == Set((2L, 2L), (3L, 1L)))
  }

  test("PatternMatch optional and star quantifiers") {
    val downUpSteps = (flatGreedy: Boolean) => Seq(
      PatternStep("down", (p: Double, c: Double) => c < p, greedy = true),
      PatternStep("flat", (p: Double, c: Double) => c == p,
        greedy = flatGreedy, minCount = 0),
      PatternStep("up", (p: Double, c: Double) => c > p, greedy = true))
    val rows = Seq(
      // key 1: D U (no plateau) → matches both ? and *
      (1L, 1L, 5.0), (1L, 2L, 3.0), (1L, 3L, 6.0),
      // key 2: D E U (1-row plateau) → matches both, n_flat = 1
      (2L, 1L, 5.0), (2L, 2L, 3.0), (2L, 3L, 3.0), (2L, 4L, 6.0),
      // key 3: D E E U (2-row plateau) → star only (n_flat = 2); the
      // non-backtracking optional aborts at the second plateau row
      (3L, 1L, 5.0), (3L, 2L, 3.0), (3L, 3L, 3.0), (3L, 4L, 3.0),
      (3L, 5L, 6.0))
      .toDF("k", "t", "v")
    def run(flatGreedy: Boolean) =
      PatternMatch(rows, "k", "t", "v", downUpSteps(flatGreedy))
        .select($"k", $"n_down", $"n_flat", $"n_up")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(run(false) == Set((1L, 1L, 0L, 1L), (2L, 1L, 1L, 1L)))
    assert(run(true) == Set(
      (1L, 1L, 0L, 1L), (2L, 1L, 1L, 1L), (3L, 1L, 2L, 1L)))

    // Trailing optional: down+ up* — a bare falling run at input end
    // completes with n_up = 0 via flush.
    val tail = Seq((9L, 1L, 5.0), (9L, 2L, 4.0), (9L, 3L, 3.0))
      .toDF("k", "t", "v")
    val tOut = PatternMatch(tail, "k", "t", "v", Seq(
      PatternStep("down", (p: Double, c: Double) => c < p, greedy = true),
      PatternStep("up", (p: Double, c: Double) => c > p, greedy = true,
        minCount = 0)))
      .select($"k", $"n_down", $"n_up").as[(Long, Long, Long)]
      .collect().toSet
    assert(tOut == Set((9L, 2L, 0L)))

    // The first step may not be optional.
    val ex = intercept[IllegalArgumentException](
      PatternMatch(rows, "k", "t", "v", Seq(
        PatternStep("a", (_: Double, _: Double) => true, greedy = true,
          minCount = 0),
        PatternStep("b", (p: Double, c: Double) => c > p, greedy = false))))
    assert(ex.getMessage.contains("may not be optional"))
  }

  test("KMeans: recovers separated clusters, bit-identical across runs") {
    import org.apache.spark.sql.functions.{array => farr}
    // 3 well-separated clusters in 4 dims, 20 points each
    val pts = for (c <- 0 until 3; i <- 0 until 20) yield {
      val base = Array.fill(4)(0.0f)
      base(c) = 10.0f
      (c * 20L + i, base.toSeq.zipWithIndex
        .map { case (v, d) => v + ((i * 7 + d) % 5) * 0.1f })
    }
    val df = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    def run() = graft.operators.KMeans(df, "vec_id", "embedding",
      k = 3, iters = 5)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).map(d => math.rint(d * 1e9) / 1e9)))
      .sortBy(_._1).toSeq
    val c1 = run()
    assert(c1.size == 3)
    // each centroid sits near one corner: exactly one dim ~10, rest ~0.2
    val corners = c1.map(_._2.indexWhere(_ > 5.0)).toSet
    assert(corners == Set(0, 1, 2), s"centroids not separated: $c1")
    // determinism: a second run is bit-identical
    assert(run() == c1)
  }

  test("KMeans-trained IVF: recall vs brute force on real embeddings") {
    import graft.operators.VectorOps._
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    // brute-force ground truth: top-5 per query (10 queries)
    val n = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val q = n.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    def top5(cand: org.apache.spark.sql.DataFrame) = cand
      .join(broadcast(q), col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        cosine(col("qe"), col("ce"), col("qn"), col("cn")).as("cos"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
      .select(col("qid"), col("cid"))
    val truth = top5(n.select(col("vec_id").as("cid"),
      col("embedding").as("ce"), col("nrm").as("cn")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // trained IVF: k-means centroids, probe top-3 of 8 clusters
    val cents = graft.operators.KMeans(emb, "vec_id", "embedding",
      k = 8, iters = 3)
      .select(col("cent_id"),
        transform(col("centroid"), _.cast("float")).as("cemb"))
    val scoredAll = emb.join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        dotDouble(col("embedding"), col("cemb")).as("score"))
    val assign = scoredAll.groupBy(col("vec_id"), col("embedding"))
      .agg(max(struct(col("score"), (-col("cent_id")).as("nc"))).as("b"))
      .select(col("vec_id"), col("embedding"), (-col("b.nc")).as("cent_id"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("cent_id").asc)
    val probe = scoredAll.where(col("vec_id") < 10)
      .withColumn("rk", row_number().over(wq)).where(col("rk") <= 3)
      .select(col("vec_id").as("qid"), col("cent_id"))
    val cand = assign.join(broadcast(probe), "cent_id")
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        col("embedding").as("ce"))
      .withColumn("cn", norm(col("ce")))
    val ivf = cand.join(broadcast(q), "qid")
      .select(col("qid"), col("cid"),
        cosine(col("qe"), col("ce"), col("qn"), col("cn")).as("cos"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
      .select(col("qid"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth intersect ivf).size.toDouble / truth.size
    assert(recall >= 0.6, s"trained-IVF recall too low: $recall")
  }

  test("ConnectedComponents: multi-hop chains collapse to min label") {
    // a 4-node chain (diameter 3), a separate pair, directed edges only
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("s", "d")
    val out = graft.operators.ConnectedComponents(edges, "s", "d")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("PatternMatch.permute: both orderings match, overlaps impossible") {
    // key 1: calm calm UP DOWN; key 2: calm calm DOWN UP; key 3: calm UP UP
    // (same direction twice → no permutation matches)
    val rows = Seq(
      (1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 9.0), (1L, 4L, 5.0),
      (2L, 1L, 5.0), (2L, 2L, 5.0), (2L, 3L, 1.0), (2L, 4L, 5.0),
      (3L, 1L, 5.0), (3L, 2L, 5.0), (3L, 3L, 9.0), (3L, 4L, 13.0))
      .toDF("k", "t", "v")
    val out = PatternMatch.permute(rows, "k", "t", "v",
      prefix = Seq(PatternStep("calm",
        (p: Double, c: Double) => math.abs(c - p) < 2, greedy = true)),
      permuted = Seq(
        PatternStep("up", (p: Double, c: Double) => c - p >= 2, greedy = false),
        PatternStep("down", (p: Double, c: Double) => p - c >= 2,
          greedy = false)))
      .select($"k", $"n_calm", $"n_up", $"n_down")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 1L, 1L), (2L, 1L, 1L, 1L)))
  }

  test("PatternStep.or combines branch conditions") {
    val spike = PatternStep.or(
      (p: Double, c: Double) => c - p >= 2,
      (p: Double, c: Double) => p - c >= 2)
    assert(spike(1.0, 3.5) && spike(3.5, 1.0) && !spike(1.0, 2.0))
  }

  test("PatternMatch rejects unsatisfiable non-greedy minCount up front") {
    val rows = Seq((1L, 1L, 1.0)).toDF("k", "t", "v")
    val steps = Seq(
      PatternStep("down", (p: Double, c: Double) => c < p, greedy = false,
        minCount = 2))
    val ex = intercept[IllegalArgumentException](
      PatternMatch(rows, "k", "t", "v", steps))
    assert(ex.getMessage.contains("unsatisfiable"))
  }

  test("MLPredict Nulls policy emits nulls for a non-nullable provider schema") {
    // HashScoreModel declares its outputs non-nullable; under the Nulls
    // timeout policy the operator must relax nullability so the fallback
    // rows encode instead of crashing (ADVICE r3).
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "tag").repartition(1)
    val out = graft.ml.MLPredict.async(df, new HungModel, batchSize = 8,
      timeoutMs = 150, onTimeout = AsyncWait.Nulls).collect()
    assert(out.length == 2 && out.forall(r => r.get(2) == null))
  }

  test("AsyncWait retry: flaky client recovers, NoRetry propagates") {
    import org.apache.spark.sql.types.{StringType, StructField}
    val df = Seq(1L, 2L).toDF("k").repartition(1)
    // fails the first two attempts, then succeeds — a transient endpoint
    FlakyCounter.n.set(0)
    def flaky(r: org.apache.spark.sql.Row): Any = {
      if (FlakyCounter.n.incrementAndGet() <= 2)
        throw new RuntimeException("transient")
      s"ok${r.getLong(0)}"
    }
    val out = AsyncCalc(df, flaky, StructField("v", StringType),
      batchSize = 8, retry = AsyncWait.FixedDelay(retries = 3, delayMs = 5))
      .collect().map(_.getString(1)).sorted
    assert(out.toSeq == Seq("ok1", "ok2"))

    FlakyCounter.n.set(0)
    val ex = intercept[org.apache.spark.SparkException](
      AsyncCalc(df, flaky, StructField("v", StringType), batchSize = 8)
        .collect())
    assert(ex.getMessage.contains("transient") ||
      Option(ex.getCause).exists(_.getMessage.contains("transient")))

    // exhausted retries rethrow the last failure
    FlakyCounter.n.set(-1000)
    val ex2 = intercept[org.apache.spark.SparkException](
      AsyncCalc(df, flaky, StructField("v", StringType), batchSize = 8,
        retry = AsyncWait.FixedDelay(retries = 2, delayMs = 1)).collect())
    assert(ex2.getMessage.contains("transient") ||
      Option(ex2.getCause).exists(_.getMessage.contains("transient")))

    // backoff schedule: doubling, capped
    assert(AsyncWait.ExpBackoff(5, 100, 2.0, 500).delaysMs ==
      Seq(100L, 200L, 400L, 500L, 500L))
  }

  test("Decontaminate benchDfCap drops ubiquitous benchmark shingles") {
    // boilerplate shared by EVERY benchmark doc would multiply the probe
    // by |benchmark|; with the cap it contributes nothing, and the doc
    // whose only overlap is boilerplate is no longer flagged
    val boiler = "shared license header boilerplate"
    val bench = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, s"$boiler iota kappa lambda mu")).toDF("bench_id", "text")
    val corpus = Seq(
      // real contamination: shares the unique tail of bench 1
      (10L, "alpha beta gamma delta unrelated tail words here"),
      // boilerplate-only overlap
      (11L, s"$boiler completely different content words")).toDF("doc_id", "text")
    val capped = Decontaminate(corpus, bench, minOverlap = 0.2, benchDfCap = 2)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(capped.contains((10L, 1L)), s"real overlap lost: $capped")
    assert(!capped.exists(_._1 == 11L),
      s"boilerplate-only doc flagged despite the cap: $capped")
    // uncapped, the boilerplate doc IS flagged against all three
    val uncapped = Decontaminate(corpus, bench, minOverlap = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(uncapped.contains(11L))
  }

  test("TrainingData sampling is independent of physical partitioning") {
    val docs = Tables.documents(TestSpark.spark, sf)
      .select(col("doc_id"), col("source"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      TrainingData.sample(df, col("doc_id"), lit(40), "ptest")
        .select("doc_id").as[Long].collect().toSet
    val a = ids(docs.repartition(7))
    val b = ids(docs.repartition(3, col("source")))
    val c = ids(docs.coalesce(1))
    assert(a == b && b == c && a.nonEmpty && a.size < 500,
      "deterministic sample must not depend on partitioning")
    // epoch shuffle: same epoch = same order; different epoch = different
    val o1 = TrainingData.epochShuffle(docs, col("doc_id"), "e1")
      .select("doc_id").as[Long].collect().toSeq
    val o1b = TrainingData.epochShuffle(docs.repartition(5),
      col("doc_id"), "e1").select("doc_id").as[Long].collect().toSeq
    val o2 = TrainingData.epochShuffle(docs, col("doc_id"), "e2")
      .select("doc_id").as[Long].collect().toSeq
    assert(o1 == o1b, "epoch order must be partitioning-independent")
    assert(o1 != o2, "distinct epochs must reorder")
    assert(o1.toSet == o2.toSet)
  }

  test("TrainingData sample keep-rate tracks the weight within 0.5%") {
    // 100k keys; weights straddling 56 — the two-hex-digit bucket's bias
    // cliff (buckets 0-55 were 3/256 vs 2/256 above, ~17% over-keep) —
    // must all land within 0.5% of the requested percentage.
    val keys = TestSpark.spark.range(100000).toDF("k")
    for (w <- Seq(7, 40, 50, 56, 93)) {
      val kept =
        TrainingData.sample(keys, col("k"), lit(w), "biascheck").count()
      val rate = kept / 1000.0 // percent
      assert(math.abs(rate - w) < 0.5,
        s"weight $w%: empirical keep-rate $rate%")
    }
  }

  test("VectorQuant int8: error bound, full scale, zero vector, tinyint") {
    import graft.functions.VectorQuant._
    import org.apache.spark.sql.functions.{size => asize}
    val df = TestSpark.spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, Seq(0.5f, -1.25f, 0.01f, 2.0f)),
        org.apache.spark.sql.Row(2L, Seq(-3.0f, 0.0f, 1.5f, 0.25f)),
        org.apache.spark.sql.Row(3L, Seq(0.0f, 0.0f, 0.0f, 0.0f))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val q = df.withColumn("scale", int8Scale(col("v")))
      .withColumn("q", quantizeInt8(col("v"), col("scale")))
      .withColumn("err", maxAbsError(col("v"), col("q"), col("scale")))
    // storage type is genuinely byte (the 4x claim)
    assert(q.schema("q").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType))
    val rows = q.orderBy("id").collect()
    // nonzero rows: error within scale/2 (+noise), max |q| = 127
    rows.take(2).foreach { r =>
      val scale = r.getAs[Double]("scale")
      assert(r.getAs[Double]("err") <= scale * 0.51)
      assert(r.getAs[scala.collection.Seq[Byte]]("q").map(b => math.abs(b.toInt)).max == 127)
    }
    // zero vector: scale 0, q all zeros, zero error
    val z = rows(2)
    assert(z.getAs[Double]("scale") == 0.0)
    assert(z.getAs[scala.collection.Seq[Byte]]("q").forall(_ == 0))
    assert(z.getAs[Double]("err") == 0.0)
    // dequantize round-trips the exact grid points
    val grid = df.where(col("id") === 1L)
      .select(dequantizeInt8(
        quantizeInt8(col("v"), int8Scale(col("v"))),
        int8Scale(col("v"))).as("d"), asize(col("v")).as("n"))
      .collect().head
    assert(grid.getAs[scala.collection.Seq[Double]]("d").size == grid.getAs[Int]("n"))
  }
}

/** Partition-local failure counter for the flaky-client retry spec (object
  * so the closure serializes; local[*] tests share the JVM). */
object FlakyCounter {
  val n = new java.util.concurrent.atomic.AtomicInteger(0)
}
