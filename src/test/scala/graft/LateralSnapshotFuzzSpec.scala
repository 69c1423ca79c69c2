package graft

import java.sql.Timestamp

import graft.streaming.LateralSnapshotJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Property fuzz for the two-phase LATERAL SNAPSHOT operator (VERDICT r15
  * #6): random flip points × random build-changelog/probe interleavings ×
  * random micro-batch splits, checked against an independent model of the
  * contract — probes buffered through LOAD drain at the flip against the
  * flip-time build state; JOIN-phase probes join their batch's state;
  * build changes apply in row-time order gated by the batch-start
  * watermark; -U/-D removal picks the content match whose row-time is
  * nearest at-or-before the change (the ADVICE-r15 version rule, which
  * the generator exercises by re-inserting duplicate values).
  *
  * Feeding is SERIALIZED per round — builds, processAllAvailable, then
  * probes, processAllAvailable — because two addData calls on two
  * MemoryStreams are not atomic against the always-running trigger loop:
  * fed together, the probe rows can land one trigger after their round's
  * builds (observed under full-suite load), where the watermark has
  * already advanced and the model's one-trigger-per-round assumption
  * breaks. Under serialized feeding the staging is deterministic and the
  * model replays it exactly: the build trigger applies pending changes
  * gated by the PREVIOUS round's watermark; the round's new watermark
  * (max build event time minus delay) takes effect from the next trigger,
  * so the probe trigger — and any timer-driven flip drain in a trailing
  * no-data batch, which sees the same wm and the same applied table —
  * joins against state gated by the watermark that INCLUDES this round's
  * builds. Build row-times are generated strictly increasing so no change
  * is ever watermark-late and two-wave application equals one-wave.
  *
  * 13 seeds × {inner, left} = 26 runs × 2 keys = 52 randomized key-cases.
  */
class LateralSnapshotFuzzSpec extends SparkSpecBase {
  import spark.implicits._

  private case class BItem(ts: Long, k: String, v: Double, kind: String)
  private case class PItem(pid: Long, k: String)

  /** The operator's retraction rule, shared by generator-model and
    * expectation: among content matches, remove the version with the
    * latest row-time at-or-before the change; else the earliest. */
  private def modelRemove(
      live: scala.collection.mutable.ArrayBuffer[(Long, Double)],
      chgTs: Long, v: Double): Unit = {
    val ms = live.zipWithIndex.filter(_._1._2 == v)
    if (ms.nonEmpty) {
      val atOrBefore = ms.filter(_._1._1 <= chgTs)
      val victim =
        if (atOrBefore.nonEmpty) atOrBefore.maxBy(_._1._1)._2
        else ms.minBy(_._1._1)._2
      live.remove(victim)
    }
  }

  test("fuzz: snapshot join matches the phase-contract model") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keys = Seq("A", "B")
    val delayMs = 2000L
    for (seed <- 1 to 13; jt <- Seq("inner", "left")) {
      val rnd = new scala.util.Random(seed * 131 + jt.length)
      val flipMs = 2000L + rnd.nextInt(6) * 1000L
      val nBatches = 4 + rnd.nextInt(3)
      var ts = 1000L
      var pid = 0L
      val genLive = keys.map(_ ->
        scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]).toMap
      val batches: Seq[(Seq[BItem], Seq[PItem])] = (1 to nBatches).map { _ =>
        val bs = scala.collection.mutable.Buffer.empty[BItem]
        keys.foreach { k =>
          val live = genLive(k)
          (1 to 1 + rnd.nextInt(2)).foreach { _ =>
            ts += 500L + rnd.nextInt(2500)
            val r = rnd.nextInt(10)
            if (live.nonEmpty && r < 3) { // delete a live value
              val v = live(rnd.nextInt(live.size))._2
              bs += BItem(ts, k, v, "-D")
              modelRemove(live, ts, v)
            } else if (live.nonEmpty && r < 6) { // -U/+U pair, shared ts
              val v = live(rnd.nextInt(live.size))._2
              val nv = rnd.nextInt(10).toDouble
              bs += BItem(ts, k, v, "-U")
              bs += BItem(ts, k, nv, "+U")
              modelRemove(live, ts, v)
              live += ((ts, nv))
            } else { // insert (small value space → duplicate contents)
              val nv = rnd.nextInt(10).toDouble
              bs += BItem(ts, k, nv, "+I")
              live += ((ts, nv))
            }
          }
        }
        val ps = (0 until rnd.nextInt(3)).map { _ =>
          pid += 1; PItem(pid, keys(rnd.nextInt(keys.size)))
        }
        (bs.toSeq, ps)
      }

      // ---- model replay ----
      val pending = keys.map(_ ->
        scala.collection.mutable.Buffer.empty[BItem]).toMap
      val buffered = keys.map(_ ->
        scala.collection.mutable.Buffer.empty[PItem]).toMap
      val applied = keys.map(_ ->
        scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]).toMap
      val expected =
        scala.collection.mutable.Buffer.empty[(Long, Option[(Long, Double)])]
      var wm = 0L
      def joinOne(p: PItem): Unit = {
        val tbl = applied(p.k)
        if (tbl.nonEmpty) tbl.foreach(b => expected += ((p.pid, Some(b))))
        else if (jt == "left") expected += ((p.pid, None))
      }
      def applyPending(k: String): Unit = {
        val (app, still) = pending(k).partition(_.ts <= wm)
        app.sortBy(_.ts).foreach { c => // stable: ties keep arrival order
          if (c.kind == "-D" || c.kind == "-U")
            modelRemove(applied(k), c.ts, c.v)
          else applied(k) += ((c.ts, c.v))
        }
        pending(k).clear(); pending(k) ++= still
      }
      batches.foreach { case (bs, ps) =>
        // build trigger: pending changes gate on the PREVIOUS watermark
        keys.foreach { k =>
          pending(k) ++= bs.filter(_.k == k)
          applyPending(k)
        }
        // the build batch's watermark takes effect from the next trigger
        wm = math.max(wm, bs.map(_.ts).max - delayMs)
        // probe trigger (and any trailing timer-driven flip drain — same
        // wm, same applied table): apply under the new wm, then join
        keys.foreach { k =>
          applyPending(k)
          val probesNow = ps.filter(_.k == k)
          if (wm >= flipMs) {
            (buffered(k) ++ probesNow).foreach(joinOne)
            buffered(k).clear()
          } else buffered(k) ++= probesNow
        }
      }
      // trailing far-future nudge applies remaining changes and fires any
      // pending flip timers; drain any still-buffered probes per model
      val nudgeTs = ts + 60000L
      keys.foreach { k =>
        (pending(k) ++ Seq.empty).sortBy(_.ts).foreach { c =>
          if (c.ts <= nudgeTs - delayMs) {
            if (c.kind == "-D" || c.kind == "-U")
              modelRemove(applied(k), c.ts, c.v)
            else applied(k) += ((c.ts, c.v))
          }
        }
        buffered(k).foreach(joinOne)
        buffered(k).clear()
      }

      // ---- run the operator ----
      val bIn = MemoryStream[(Timestamp, String, Double, String)]
      val pIn = MemoryStream[(Long, String)]
      val out = LateralSnapshotJoin(
        pIn.toDF().toDF("pid", "k"),
        bIn.toDF().toDF("rts", "k", "v", "__rowkind"),
        "k", "rts", flipMs, "2 seconds", joinType = jt)
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-lsjf$seed-").toString
      val name = s"lsj_f_${seed}_$jt"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        batches.foreach { case (bs, ps) =>
          // serialized: builds fully processed before probes are added
          // (see scaladoc — a shared trigger is not guaranteed)
          bIn.addData(bs.map(b => (new Timestamp(b.ts), b.k, b.v, b.kind)))
          q.processAllAvailable()
          if (ps.nonEmpty) {
            pIn.addData(ps.map(p => (p.pid, p.k)))
            q.processAllAvailable()
          }
        }
        bIn.addData(Seq((new Timestamp(nudgeTs), "Z", 0.0, "+I")))
        q.processAllAvailable()
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name)
        .select(col("pid"), col("snap_rts"), col("snap_v"))
        .collect().map { r =>
          (r.getLong(0),
            Option(r.get(1)).map(_ =>
              (r.getTimestamp(1).getTime, r.getDouble(2))))
        }.toSeq
      def multiset[T](xs: Seq[T]) = xs.groupBy(identity).view.mapValues(_.size).toMap
      assert(multiset(got) == multiset(expected.toSeq),
        s"seed $seed $jt flip=$flipMs: got=${got.sorted.take(30)} " +
          s"exp=${expected.toSeq.sorted.take(30)}")
    }
  }
}
