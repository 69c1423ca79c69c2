package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark harness (driver contract: prints ONE JSON line).
  *
  * Measurement rules (VERDICT r1 "what's wrong" #1/#2):
  *   - materialize through the `noop` DSv2 sink, not `.count()` — a count
  *     lets Catalyst prune every unreferenced projection and eliminate sorts,
  *     so projection-only queries would time scan+count instead of the
  *     functions under test;
  *   - one full warmup pass (JIT + codegen + parquet footer caching) before
  *     timing;
  *   - deterministic name order, median of timed runs per query.
  *
  * Budget discipline (VERDICT r16 "what's wrong" #1 — the r16 driver run was
  * killed at its wall-clock limit before printing anything, rc 124; r15's
  * sweep passed at 1,344 s and r16 added 101 queries on top):
  *   - the sweep runs against a deadline (`SPARK_GRAFT_BENCH_DEADLINE`
  *     seconds, default 1380 — just above the slowest sweep the driver has
  *     ever accepted);
  *   - queries whose recorded baseline is < 1.2 s take their 2 samples
  *     back-to-back in the warm sequential pass and skip the cold
  *     round-robin rescue rep (418 of 473 queries; the rescue pass's
  *     cold-cache penalty would bias a 2-sample median upward — the r11
  *     lesson — while for the big queries the penalty is relatively
  *     negligible and the decorrelated third sample stays valuable); the
  *     skipped rescue pass (~210 s) is what keeps the sweep plus the two
  *     10x tiers inside the window;
  *   - the full-sweep JSON is written to BENCH_LAST.json and the contract
  *     line printed IMMEDIATELY after the timed reps, then again after each
  *     optional stage (scale tier, quiet re-measures), so a kill mid-stage
  *     still leaves a complete parseable artifact — the driver tails stdout
  *     and the last complete line wins;
  *   - stage order puts the sf1 scale tier BEFORE the quiet re-measures:
  *     the scale block is a graded artifact, the re-measures only refine
  *     outlier medians (the final emit recomputes growth factors from the
  *     re-measured denominators either way);
  *   - every deadline-driven skip is recorded in the JSON (`budget` block)
  *     so a truncated sweep is never mistaken for a complete one.
  */
object Bench {

  private def runOnce(
      spark: SparkSession,
      sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val startNs = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - startNs) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val deadline =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE", "1380").toDouble
    val spark = GraftSession.get("graft-bench", s"local[$cpus]", cpus.toInt)

    // Dev loop only (driver leaves it unset): bench a named subset.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      // the q_tpcds_sf1_* de-vacuation tier is a CORRECTNESS surface (runs
      // against the 260 MB sf1 corpus, seconds per query); sweeping it here
      // would blow the driver's bench window for zero perf signal — the sf1
      // perf story lives in TPCDS_SF1.json and the scale tier
      .filterNot { case (n, _) => n.startsWith("q_tpcds_sf1_") }

    // Recorded baselines, parsed up-front: they drive both the rep schedule
    // (sub-1.2s queries get one fewer sequential rep) and the 1.8x
    // re-measure trigger.
    val baselines: Map[String, Double] =
      try {
        val md = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BASELINE.md")),
          java.nio.charset.StandardCharsets.UTF_8)
        val row = """\| (q\w+) \| ([0-9.]+) \| [0-9.]+ \| [0-9.]+ \|""".r
        row.findAllMatchIn(md)
          .map(m => m.group(1) -> m.group(2).toDouble).toSeq
          // last occurrence wins: a re-baselined query appears in multiple
          // round sections and the most recent number is the live one
          .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      } catch { case _: Throwable => Map.empty }

    val budgetNotes = scala.collection.mutable.ArrayBuffer.empty[String]

    // Warmup: one untimed pass over every query. Gate at 40% of the budget —
    // a degraded box that can't finish warmup in that window won't finish
    // the timed passes either, and a cold-measured query beats none.
    var warmupSkipped = 0
    ordered.foreach { case (_, fn) =>
      if (elapsed > deadline * 0.4) warmupSkipped += 1
      else (try runOnce(spark, sfDir, fn) catch { case _: Throwable => () })
    }
    if (warmupSkipped > 0) budgetNotes += s"warmup_skipped:$warmupSkipped"

    // Rep schedule (r12): sequential reps per query right after its warmup
    // neighborhood (hot JIT/code cache — the state the baselines were
    // recorded in), then ONE final round-robin rescue pass minutes later.
    // r11's fully-interleaved schedule fixed the spike false alarms but ran
    // every rep cold and shifted the whole sweep's medians +26% vs baseline.
    // Aggregate by MEDIAN (r13, ADVICE r12): the BASELINE.md numbers were
    // recorded under median, and a min-vs-median comparison biases every
    // ratio downward, weakening the 2x gate.
    // Sub-1.2s-baseline queries take BOTH samples here, sequentially —
    // their medians must come from the warm neighborhood the baselines
    // were recorded in (a cold round-robin rep after 470 other queries
    // churned the code cache reads +26%, the r11 lesson, and a 2-sample
    // median would average that bias in). Neighborhood-wide poisoning of
    // both reps is caught by the 1.8x-vs-baseline re-measure trigger.
    val timed = Array.fill(ordered.size)(
      scala.collection.mutable.ArrayBuffer.empty[Double])
    val small = ordered.map { case (name, _) =>
      baselines.get(name).exists(_ < 1.2) }
    var seqSkipped = 0
    ordered.zipWithIndex.foreach { case ((_, fn), i) =>
      if (elapsed > deadline * 0.7) seqSkipped += 1
      else (1 to math.max(if (small(i)) 2 else 1, reps - 1)).foreach { _ =>
        timed(i) += (try runOnce(spark, sfDir, fn)
          catch { case _: Throwable => -1.0 })
      }
    }
    if (seqSkipped > 0) budgetNotes += s"seq_reps_skipped:$seqSkipped"

    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    // Medians over whatever samples a query holds. ANY failed rep marks the
    // query failed (-1): a query that crashes intermittently must not report
    // a healthy aggregate of its surviving reps (review r11).
    def computeResults(): Seq[(String, Double)] =
      ordered.zipWithIndex.map { case ((name, _), i) =>
        val ts = timed(i).toSeq
        name -> (if (ts.isEmpty || ts.exists(_ < 0)) -1.0 else median(ts))
      }

    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    // One 10x tier block: per-query seconds, growth vs this sweep's sf0.1
    // medians, 15x-gate breaches, deadline-skipped names.
    final case class Tier(
        label: String,
        dir: Option[String],
        results: Seq[(String, Double)],
        skipped: Seq[String])
    def toJson(
        rs: Seq[(String, Double)],
        fullResults: Seq[(String, Double)],
        remeasured: Seq[String],
        tiers: Seq[Tier]): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = fullResults.map(_._2).filter(_ >= 0).sum // always the FULL total
      val rm = remeasured.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      val base = fullResults.toMap
      val tierJson = tiers.filter(t => t.results.nonEmpty || t.skipped.nonEmpty)
        .map { t =>
          val sq = t.results.map { case (k, v) =>
            "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
          val growth = t.results.flatMap { case (k, v) =>
            base.get(k).filter(b => b > 0 && v >= 0)
              .map(b => k -> v / b)
          }
          val gj = growth.map { case (k, g) =>
            "\"" + k + "\":" + f"$g%.2f" }.mkString("{", ",", "}")
          val breaches = growth.filter(_._2 > 15.0).map(_._1).sorted
            .map("\"" + _ + "\"").mkString("[", ",", "]")
          val sk = t.skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
          s""","${t.label}":{"dir":"${t.dir.getOrElse("")}","queries":$sq,"growth":$gj,"breaches":$breaches,"skipped":$sk}"""
        }.mkString
      // Sweep-level box diagnostic: the median of per-query ratios vs the
      // recorded baselines. Code changes move individual ratios; a BOX
      // slower/faster than the recording window moves the whole median
      // (r17: a degraded window read 1.3-1.5 here while an A/B at the
      // prior commit confirmed code parity — this number turns that
      // investigation into a one-glance readout). Diagnostic only, never
      // a gate.
      val medianRatio = {
        val ratios = fullResults.flatMap { case (k, v) =>
          baselines.get(k).filter(_ > 0).filter(_ => v > 0).map(v / _)
        }.sorted
        if (ratios.isEmpty) ""
        else f""","median_ratio_vs_baseline":${median(ratios)}%.2f"""
      }
      val budget =
        s""","budget":{"deadline":${fmt(deadline)},"elapsed":${fmt(elapsed)}$medianRatio,"notes":${
          budgetNotes.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"remeasured":$rm,"sf":"$sfDir"$tierJson$budget,"full":"BENCH_LAST.json"}"""
    }

    // Persist the complete per-query map to a file: the driver captures only
    // the last ~2000 chars of stdout, which truncated BENCH_r02/r03 — the
    // file survives intact (committed to the repo each round). The headline
    // stdout line is a prioritized subset cut at the 1800-char budget.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    val headline = Seq(
      "q1_agg", "q_ngram_jaccard", "q_dedup_minhash", "q_dedup_simhash",
      "q_embedding_cosine_dup", "q_vector_topk", "q_vector_ivf_topk",
      "q_changelog_join", "q_changelog_agg_chain", "q_match_recognize",
      "q_over_rows", "q_topn", "q_salted_join", "q_multiset", "q_asof_join",
      "q_interval_join", "q_session_agg", "q_unified_tumble", "q_retract_agg",
      "q_tpcds_q23", "q_tpcds_q67", "q_tpcds_q95", "q_url_dedup",
      "q_avro_scan")
    def emit(
        results: Seq[(String, Double)],
        remeasured: Seq[String],
        tiers: Seq[Tier]): Unit = {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(out),
        toJson(results, results, remeasured, tiers)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
      val byName = results.toMap
      val prioritized =
        results.filter(_._1.startsWith("q_tpch_")) ++
          headline.flatMap(n => byName.get(n).map(n -> _)) ++
          results.filterNot { case (n, _) =>
            n.startsWith("q_tpch_") || headline.contains(n)
          }
      val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      prioritized.foreach { kv =>
        if (toJson(kept.toSeq :+ kv, results, remeasured, tiers)
          .length <= 1800) kept += kv
      }
      println(toJson(kept.toSeq, results, remeasured, tiers))
      System.out.flush()
    }

    // ---- STAGE 0 flush: seq-pass medians, BEFORE the rescue pass. On a
    // badly degraded box even the rescue pass can outlive the driver's
    // wall clock — this flush guarantees a parseable artifact exists the
    // moment the timed sequential reps are in (the r16 rc-124 hole, and
    // the review-r17 refinement: the rescue pass must never be the thing
    // standing between a kill and an empty artifact).
    var results = computeResults()
    emit(results, Seq.empty, Seq.empty)

    // Rescue pass — the temporally-decorrelated third sample for the big
    // queries (their absolute size dwarfs the cold-cache penalty). Past
    // 90% of the budget, only queries with zero samples still run; past
    // the FULL deadline nothing runs (an unsampled query then reports -1
    // with the skip recorded — a parseable artifact beats a perfect one).
    var rescueSkipped = 0
    var rescueUnsampled = 0
    ordered.zipWithIndex.foreach { case ((_, fn), i) =>
      if (small(i) && timed(i).nonEmpty) ()
      else if (elapsed > deadline && timed(i).isEmpty) rescueUnsampled += 1
      else if (elapsed > deadline * 0.9 && timed(i).nonEmpty) rescueSkipped += 1
      else timed(i) += (try runOnce(spark, sfDir, fn)
        catch { case _: Throwable => -1.0 })
    }
    if (rescueSkipped > 0) budgetNotes += s"rescue_reps_skipped:$rescueSkipped"
    if (rescueUnsampled > 0)
      budgetNotes += s"rescue_unsampled_skipped:$rescueUnsampled"

    // ---- STAGE 1 flush: full raw medians.
    results = computeResults()
    emit(results, Seq.empty, Seq.empty)

    // ---- STAGE 2: scale tier (VERDICT r15 #3): the heaviest pipelines once
    // more against the 10x corpus (scale-data/sf1, built by ScaleDataGen).
    // One rep each — these run seconds-long, so single-rep noise is small
    // relative to the 15x growth gate; growth = t_sf1 / t_sf0.1 median from
    // THIS sweep (same process, same JIT state). A growth factor > 15x for
    // 10x data flags a super-linear pipeline (breaches list). Per-query
    // deadline gate: skipped names are recorded, never silently dropped.
    val scaleNames = Seq(
      "q1_agg", "q_salted_join", "q_multiset",
      "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
      "q_ngram_jaccard", "q_doc_fingerprint", "q_dedup_cluster",
      "q_decontaminate", "q_embedding_cosine_dup",
      "q_embedding_dedup_cluster", "q_vector_topk", "q_vector_ivf_topk",
      "q_tpch_q1", "q_tpch_q9", "q_tpch_q21",
      "q_tpcds_q23", "q_tpcds_q28", "q_tpcds_q67", "q_tpcds_q72",
      "q_tpcds_q95",
      "q_changelog_agg_chain", "q_changelog_join", "q_changelog_join_nary",
      "q_changelog_join_nary_left", "q_changelog_join_nary_residual",
      "q_retract_agg")
    def runTier(
        label: String,
        dirEnv: String,
        defaultDir: String,
        names: Seq[String],
        gate: Double): Tier = {
      val dir = sys.env.get(dirEnv)
        .orElse(Option(defaultDir)
          .filter(d => new java.io.File(d).isDirectory))
        .filter(_ => sys.env.get("SPARK_GRAFT_SCALE_SKIP").isEmpty)
      val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
      val rs: Seq[(String, Double)] = dir match {
        case Some(d) =>
          val byNameQ = SparkEntry.queries
          names.filter(byNameQ.contains)
            .filter(n => only.forall(_.contains(n)))
            .flatMap { n =>
              if (elapsed > deadline * gate) { skipped += n; None }
              else Some(n -> (try runOnce(spark, d, byNameQ(n))
                catch { case _: Throwable => -1.0 }))
            }
        case None => Seq.empty
      }
      Tier(label, dir, rs, skipped.toSeq)
    }
    val scaleTier = runTier("scale", "SPARK_GRAFT_SCALE_DIR",
      "scale-data/sf1", scaleNames, gate = 0.97)
    emit(results, Seq.empty, Seq(scaleTier))

    // ---- STAGE 2b: SKEW sub-tier (VERDICT r16 task 5): the same 15x
    // growth gate against the adversarially-skewed 10x corpus
    // (`ScaleDataGen skew` — zipf join keys, one 10^4-member duplicate
    // family, one hot cosine cluster). The uniform tier proves linearity
    // on spread keys; this one proves the df/bucket caps and salting
    // absorb concentrated keys. Growth denominators are the same sf0.1
    // medians.
    val skewNames = Seq(
      "q1_agg", "q_salted_agg", "q_salted_join", "q_tpch_q9",
      "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
      "q_ngram_jaccard", "q_doc_fingerprint", "q_dedup_cluster",
      "q_embedding_cosine_dup", "q_embedding_dedup_cluster",
      "q_changelog_join", "q_changelog_join_nary")
    val skewTier = runTier("skew", "SPARK_GRAFT_SKEW_DIR",
      "scale-data/sf1skew", skewNames, gate = 0.99)
    emit(results, Seq.empty, Seq(scaleTier, skewTier))

    // ---- STAGE 3: quiet re-measures — the BASELINE.md "7-rep quiet-box"
    // procedure automated inside the sweep (r14): when a query's median sits
    // far above its own fastest rep (noisy-neighbor poisoning), or exceeds
    // 1.8x its RECORDED baseline (uniformly noisy neighborhood, r15), take 4
    // extra reps at the END of the sweep (quiet JVM) and report the median
    // of all samples. Variance reduction, not selection: a genuine
    // regression is slow in every rep and keeps its slow median.
    // floor 0.05 not 0.15: the per-query 2x gate treats a 0.1s->0.22s drift
    // on a 25-row query the same as a 2s->4.4s one.
    // auditable (ADVICE r14): record + log every query the procedure
    // touched, so an adjusted median is never mistaken for a raw one.
    val remeasured = scala.collection.mutable.ArrayBuffer.empty[String]
    var remeasureTruncated = false
    ordered.zipWithIndex.foreach { case ((name, fn), i) =>
      val ts = timed(i).toSeq
      if (ts.nonEmpty && !ts.exists(_ < 0)) {
        val med = median(ts)
        val vsBaseline = baselines.get(name)
          .exists(b => med > b * 1.8 && med - b > 0.05)
        val noisy = (med > ts.min * 1.5 && med - ts.min > 0.15) || vsBaseline
        if (noisy) {
          if (elapsed > deadline) remeasureTruncated = true
          else {
            remeasured += name
            System.err.println(
              f"[bench] re-measuring $name: median $med%.3f vs " +
                f"min ${ts.min}%.3f over ${ts.size} reps")
            (1 to 4).foreach { _ =>
              timed(i) += (try runOnce(spark, sfDir, fn)
                catch { case _: Throwable => -1.0 })
            }
          }
        }
      }
    }
    if (remeasureTruncated) budgetNotes += "remeasure_truncated"
    results = computeResults()
    emit(results, remeasured.toSeq, Seq(scaleTier, skewTier))
    spark.stop()
  }
}
