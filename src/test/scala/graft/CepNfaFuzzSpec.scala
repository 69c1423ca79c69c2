package graft

import graft.operators.{AfterMatchSkip, CepNfa, PatternStep}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based fuzz of the concurrent-run NFA against an INDEPENDENT
  * brute-force matcher. The brute force enumerates, per anchor, every
  * assignment of consecutive rows to steps (largest counts first — the
  * engine's documented per-anchor priority) and applies the skip
  * strategy by simple scheduling:
  *
  *  - ToNextRow: every anchor emits its own highest-priority completion;
  *  - PastLastRow: anchors in time order, an emitted match bars anchors
  *    strictly before its end (re-anchoring AT the end allowed).
  *
  * Two independent formulations of MATCH_RECOGNIZE semantics agreeing on
  * randomized inputs is the CEP analog of the DuckDB oracles (which can
  * only phrase deterministic pattern shapes relationally).
  */
class CepNfaFuzzSpec extends SparkSpecBase {
  import spark.implicits._

  private case class StepSpec(
      pred: (Double, Double) => Boolean,
      greedy: Boolean,
      min: Int,
      reluctant: Boolean = false)

  /** Predicate pool — names keep failure messages readable. */
  private val preds: Vector[(String, (Double, Double) => Boolean)] = Vector(
    "lt_prev" -> ((p, c) => c < p),
    "gt_prev" -> ((p, c) => c > p),
    "ge2" -> ((_, c) => c >= 2.0),
    "le1" -> ((_, c) => c <= 1.0),
    "any" -> ((_, _) => true))

  private def genCase: Gen[(Vector[Double], Vector[(String, StepSpec)],
      Option[Long], Boolean)] = for {
    n <- Gen.choose(8, 14)
    vals <- Gen.listOfN(n, Gen.choose(0, 3).map(_.toDouble))
    k <- Gen.choose(1, 3)
    steps <- Gen.listOfN(k, for {
      pi <- Gen.choose(0, preds.length - 1)
      greedy <- Gen.oneOf(true, false)
      min <- if (greedy) Gen.choose(1, 2) else Gen.choose(0, 1)
      rel <- if (greedy) Gen.oneOf(true, false) else Gen.const(false)
    } yield (preds(pi)._1, StepSpec(preds(pi)._2, greedy, min, rel)))
    within <- Gen.option(Gen.choose(3L, 8L))
    toNext <- Gen.oneOf(true, false)
  } yield {
    // first step anchors: min >= 1
    val ss = steps.toVector
    val fixed = ss.updated(0, (ss.head._1,
      ss.head._2.copy(min = math.max(1, ss.head._2.min))))
    (vals.toVector, fixed, within, toNext)
  }

  /** Highest-priority completion for one anchor (first matched row at
    * index `s`): DFS over per-step counts, larger counts first. Returns
    * (endIdx, counts). */
  private def bestAt(vals: Vector[Double], s: Int,
      steps: Vector[StepSpec], withinUs: Option[Long])
      : Option[(Int, Vector[Long])] = {
    val startT = s - 1 // row index IS its time
    def ok(stepIdx: Int, rowIdx: Int): Boolean =
      rowIdx < vals.length &&
        withinUs.forall(w => rowIdx - startT <= w) &&
        steps(stepIdx).pred(vals(rowIdx - 1), vals(rowIdx))
    // returns counts for steps j.. consuming rows from r; None if no
    // completion. Larger counts first = engine priority.
    def dfs(j: Int, r: Int): Option[(Int, List[Long])] = {
      if (j == steps.length)
        return if (r > s) Some((r - 1, Nil)) else None
      val st = steps(j)
      // candidate counts, descending priority
      val maxHere = {
        var c = 0
        while (ok(j, r + c)) c += 1
        c
      }
      val counts: Seq[Int] =
        if (st.greedy && st.reluctant)
          // reluctant: FEWEST rows first (ascending priority)
          st.min to math.min(maxHere, vals.length)
        else if (st.greedy) (math.min(maxHere, vals.length) to st.min by -1) ++
          (if (st.min == 0) Seq(0) else Nil)
        else if (st.min == 0) Seq(math.min(1, maxHere), 0).distinct
        else if (maxHere >= st.min) Seq(st.min)
        else Nil
      counts.filter(c => c <= maxHere || c == 0).foreach { c =>
        dfs(j + 1, r + c) match {
          case Some((end, rest)) => return Some((end, c.toLong :: rest))
          case None => ()
        }
      }
      None
    }
    dfs(0, s).map { case (end, cs) => (end, cs.toVector) }
  }

  /** All emitted matches under the skip strategy. Row index = time. */
  private def brute(vals: Vector[Double], steps: Vector[StepSpec],
      withinUs: Option[Long], toNext: Boolean)
      : Set[(Long, Long, Vector[Long])] = {
    var out = Set.empty[(Long, Long, Vector[Long])]
    var barrier = Long.MinValue
    (1 until vals.length).foreach { s =>
      val anchorT = (s - 1).toLong
      if (toNext || anchorT >= barrier) {
        bestAt(vals, s, steps, withinUs).foreach { case (end, cs) =>
          // a zero-row completion cannot happen (first step min >= 1)
          out += ((anchorT, end.toLong, cs))
          if (!toNext) barrier = math.max(barrier, end.toLong)
        }
      }
    }
    out
  }

  test("fuzz: streaming NFA matches the batch face across random splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    (101L to 106L).foreach { seed =>
      val (vals, named0, within0, _) =
        genCase.pureApply(Gen.Parameters.default, Seed(seed))
      // streaming-parity constraints (streams have no end-of-input
      // flush): a WITHIN bound always set, >= 2 steps, final step
      // non-greedy with min >= 1 (completions emit eagerly; a trailing
      // far-future row expires every run, so held candidates resolve
      // before the stream stops — exactly what the batch flush does)
      val named = {
        val base = if (named0.length < 2) named0 ++ named0 else named0
        base.updated(base.length - 1, (base.last._1,
          base.last._2.copy(greedy = false, min = 1)))
      }
      val steps = named.map(_._2)
      val within = Some(within0.getOrElse(6L))
      // event times sit well above epoch: a t=0 µs row is ≤ the initial
      // watermark (0 ms) and Spark's stateful-op late filter silently
      // drops it — real tables live at ~1.7e15 µs, so shift the fixture
      val base = 10_000_000L
      val rows = vals.zipWithIndex
        .map { case (v, i) => (1L, base + i.toLong, v) } :+
        ((1L, base + vals.length + 1000L, 2.0))
      val engineSteps = steps.zipWithIndex.map { case (st, i) =>
        PatternStep(s"s$i", st.pred, st.greedy, st.min, st.reluctant)
      }
      val batch = CepNfa.single(rows.toDF("k", "t", "v"),
        "k", "t", "v", engineSteps, withinUs = within)
        .collect().map(_.toSeq).toSet

      val input = MemoryStream[(Long, Long, Double)]
      val sdf = input.toDF().toDF("k", "t", "v")
        .withColumn("ts", timestamp_micros(col("t")))
        .withWatermark("ts", "1 second")
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-nf$seed-").toString
      val q = CepNfa.streaming(sdf, "k", "t", "v", Seq(engineSteps),
        withinUs = within)
        .writeStream.format("memory").queryName(s"nfz_$seed")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        val cut = ((seed % vals.length) + 1).toInt
        Seq(rows.take(cut), rows.drop(cut)).foreach { chunk =>
          input.addData(chunk); q.processAllAvailable()
        }
      } finally q.stop()
      val streamed =
        spark.table(s"nfz_$seed").collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"seed $seed: pattern ${named.map(x => (x._1, x._2.greedy, x._2.min))}" +
          s" within=$within vals=$vals\n" +
          s"batch=$batch\nstream=$streamed")
    }
  }

  test("fuzz: exact-count nested groups match their flat expansion") {
    // (S1 … Sk){n} as a GroupElem must equal the same steps repeated n
    // times flat — two independent engine paths (group loop-back
    // machinery vs plain step sequencing) over random inputs
    import graft.operators.CepNfa.{Atom, GroupElem, PatternElem}
    (201L to 220L).foreach { seed =>
      val (vals, named, within, toNext) =
        genCase.pureApply(Gen.Parameters.default, Seed(seed))
      // group bodies need required single-match steps (loop iterations
      // chain strictly, matching flat adjacency)
      val steps = named.map(_._2.copy(greedy = false, min = 1))
      val n = (seed % 3 + 1).toInt // 1..3 iterations
      val df = vals.zipWithIndex
        .map { case (v, i) => (1L, i.toLong, v) }.toDF("k", "t", "v")
      val atoms = steps.zipWithIndex.map { case (st, i) =>
        Atom(PatternStep(s"s$i", st.pred, st.greedy, st.min)): PatternElem
      }
      val skip =
        if (toNext) AfterMatchSkip.ToNextRow else AfterMatchSkip.PastLastRow
      def runElems(elems: Seq[PatternElem]) =
        CepNfa.nested(df, "k", "t", "v", Seq(elems),
          withinUs = within, skip = skip)
          .collect().map { r =>
            // counts merge by name either way; compare (start, end, sum)
            (r.getLong(1), r.getLong(2),
              (3 until r.length).map(r.getLong).sum)
          }.toSet
      val grouped = runElems(Seq(GroupElem(atoms, n, greedy = false)))
      val flat = runElems(Seq.fill(n)(atoms).flatten)
      assert(grouped == flat,
        s"seed $seed n=$n pattern ${named.map(_._1)} within=$within " +
          s"toNext=$toNext vals=$vals\ngroup=$grouped\nflat =$flat")
    }
  }

  test("fuzz: CepNfa matches the brute-force matcher on random inputs") {
    (1L to 50L).foreach { seed =>
      val (vals, named, within, toNext) =
        genCase.pureApply(Gen.Parameters.default, Seed(seed))
      val steps = named.map(_._2)
      val df = vals.zipWithIndex
        .map { case (v, i) => (1L, i.toLong, v) }.toDF("k", "t", "v")
      val engineSteps = steps.zipWithIndex.map { case (st, i) =>
        PatternStep(s"s$i", st.pred, st.greedy, st.min, st.reluctant)
      }
      val skip =
        if (toNext) AfterMatchSkip.ToNextRow else AfterMatchSkip.PastLastRow
      val got = CepNfa.single(df, "k", "t", "v", engineSteps,
        withinUs = within, skip = skip)
        .collect().map { r =>
          (r.getLong(1), r.getLong(2),
            steps.indices.map(i => r.getLong(3 + i)).toVector)
        }.toSet
      val exp = brute(vals, steps, within, toNext)
      assert(got == exp,
        s"seed $seed: pattern ${named.map(x =>
            (x._1, x._2.greedy, x._2.min, x._2.reluctant))}" +
          s" within=$within toNext=$toNext vals=$vals\n" +
          s"engine=${got.toSeq.sortBy(_._1)}\nbrute =${exp.toSeq.sortBy(_._1)}")
    }
  }
}
