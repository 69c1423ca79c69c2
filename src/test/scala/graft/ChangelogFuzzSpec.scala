package graft

import graft.changelog._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based fuzz of the changelog tier: randomly generated VALID
  * changelogs (insert / update / delete lifecycles, interleaved across
  * entities, one global `__seq` domain) must satisfy the tier's
  * algebraic contracts — the reference's changelog semantics
  * (flink-core/…/types/RowKind.java; StreamExecGroupAggregate /
  * RetractableTopNFunction / StreamingJoinOperator retraction
  * protocols) reduced to machine-checkable invariants:
  *
  *  1. materialize(op(changelog)) == batch-op(materialize(changelog))
  *     for group agg, retractable Top-N, and the changelog equi-join;
  *  2. every operator OUTPUT is itself a well-formed changelog — per
  *     key: +I only when dead, -U/-D only when live and carrying the
  *     exact last-emitted image, +U only immediately after its -U.
  *
  * scalacheck generates the inputs (fixed seeds — deterministic);
  * the batch faces replay them, so each case is fast.
  */
class ChangelogFuzzSpec extends SparkSpecBase {
  import spark.implicits._

  /** (id, g, v, kind, seq) — entity id, group key, value. */
  private type CRow = (Long, Long, Double, String, Long)

  /** One interleaved changelog: each step picks an entity and a legal
    * op for its liveness (dead → +I; live → -U/+U pair or -D). */
  private def genRows(
      nEnt: Int, nOps: Int, groups: Int): Gen[Vector[CRow]] = {
    def step(live: Map[Long, Double], acc: Vector[CRow], seq: Long,
        left: Int): Gen[Vector[CRow]] =
      if (left == 0) Gen.const(acc)
      else Gen.choose(1, nEnt).flatMap { idI =>
        val id = idI.toLong
        val g = id % groups
        Gen.choose(0, 49).map(_.toDouble).flatMap { v =>
          live.get(id) match {
            case None =>
              step(live + (id -> v),
                acc :+ ((id, g, v, RowKind.Insert, seq)),
                seq + 1, left - 1)
            case Some(old) =>
              Gen.prob(0.7).flatMap { upd =>
                if (upd)
                  step(live + (id -> v),
                    acc :+ ((id, g, old, RowKind.UpdateBefore, seq))
                      :+ ((id, g, v, RowKind.UpdateAfter, seq + 1)),
                    seq + 2, left - 1)
                else
                  step(live - id,
                    acc :+ ((id, g, old, RowKind.Delete, seq)),
                    seq + 1, left - 1)
              }
          }
        }
      }
    step(Map.empty, Vector.empty, 1L, nOps)
  }

  private def sample(nEnt: Int, nOps: Int, groups: Int,
      seed: Long): Vector[CRow] =
    genRows(nEnt, nOps, groups)
      .pureApply(Gen.Parameters.default, Seed(seed))

  private def toDf(rows: Vector[CRow], prefix: String = ""): DataFrame =
    rows.toDF(s"${prefix}id", s"${prefix}g", s"${prefix}v",
      RowKind.kindCol, RowKind.seqCol)

  /** Final live state of a generated changelog, computed independently
    * of the operators under test. */
  private def finalState(rows: Vector[CRow]): Map[Long, (Long, Double)] =
    rows.foldLeft(Map.empty[Long, (Long, Double)]) { (m, r) =>
      r._4 match {
        case RowKind.Insert | RowKind.UpdateAfter => m + (r._1 -> (r._2, r._3))
        case RowKind.Delete => m - r._1
        case _ => m // -U: the +U that follows restates the entity
      }
    }

  /** Invariant 2: replay an operator's OUTPUT changelog per key and
    * assert envelope validity. `rows` = (keyRepr, v, kind, seq). */
  private def assertWellFormed(
      rows: Seq[(String, Seq[Any], String, Long)]): Unit = {
    rows.groupBy(_._1).foreach { case (key, ops) =>
      var live: Option[Seq[Any]] = None
      var pendingU = false
      ops.sortBy(_._4).foreach { case (_, img, kind, seq) =>
        kind match {
          case RowKind.Insert =>
            assert(live.isEmpty && !pendingU,
              s"$key: +I at seq $seq while live")
            live = Some(img)
          case RowKind.UpdateBefore =>
            assert(live.contains(img) && !pendingU,
              s"$key: -U at seq $seq without matching live image")
            pendingU = true
          case RowKind.UpdateAfter =>
            assert(pendingU, s"$key: +U at seq $seq without its -U")
            live = Some(img); pendingU = false
          case RowKind.Delete =>
            assert(live.contains(img) && !pendingU,
              s"$key: -D at seq $seq without matching live image")
            live = None
        }
      }
      assert(!pendingU, s"$key: dangling -U")
    }
  }

  test("fuzz: RetractingChangelogAgg materializes to the batch aggregate") {
    (1L to 20L).foreach { seed =>
      val rows = sample(nEnt = 8, nOps = 40, groups = 3, seed)
      val cdf = toDf(rows)
      val out = RetractingChangelogAgg(cdf, Seq("g"), "v")
      val got = UpsertMaterialize(out, Seq("g"))
        .select("g", "n_live", "sum_v", "min_v", "max_v")
        .collect().map(_.toSeq).toSet
      val fs = finalState(rows).values.toSeq
      val exp = fs.groupBy(_._1).map { case (g, vs) =>
        Seq[Any](g, vs.size.toLong, vs.map(_._2).sum,
          vs.map(_._2).min, vs.map(_._2).max)
      }.toSet
      assert(got == exp, s"seed $seed: $got vs $exp")
      // the emitted changelog itself must be well-formed
      assertWellFormed(out.collect().toSeq.map { r =>
        (r.getAs[Long]("g").toString,
          Seq(r.get(1), r.get(2), r.get(3), r.get(4)),
          r.getAs[String](RowKind.kindCol),
          r.getAs[Long](RowKind.seqCol))
      })
    }
  }

  test("fuzz: ChangelogTopN materializes to the top-N of the final state") {
    (1L to 20L).foreach { seed =>
      val rows = sample(nEnt = 10, nOps = 40, groups = 2, seed)
      val cdf = toDf(rows)
      val out = ChangelogTopN(cdf, Seq("g"), "id", "v", n = 2)
      val got = UpsertMaterialize(out, Seq("g", "rank"))
        .select("g", "rank", "id", "v")
        .collect().map(_.toSeq).toSet
      val exp = finalState(rows).toSeq
        .map { case (id, (g, v)) => (g, id, v) }
        .groupBy(_._1).flatMap { case (g, es) =>
          es.sortBy { case (_, id, v) => (-v, String.valueOf(id)) }
            .take(2).zipWithIndex.map { case ((_, id, v), i) =>
              Seq[Any](g, i + 1, id, v)
            }
        }.toSet
      assert(got == exp, s"seed $seed: $got vs $exp")
      assertWellFormed(out.collect().toSeq.map { r =>
        ((r.getAs[Long]("g"), r.getAs[Int]("rank")).toString,
          Seq(r.get(2), r.get(3)),
          r.getAs[String](RowKind.kindCol),
          r.getAs[Long](RowKind.seqCol))
      })
    }
  }

  /** The join's OUTPUT protocol is the UPSERT changelog (`+U` adds or
    * restates a pair, `-D` removes it — an input `-U` maps to pair
    * deletes; see ChangelogJoin's padding protocol doc): validate that
    * alphabet — `-D` only on a live pair with the exact image. */
  private def assertUpsertFormed(
      rows: Seq[(String, Seq[Any], String, Long)]): Unit = {
    rows.groupBy(_._1).foreach { case (key, ops) =>
      var live: Option[Seq[Any]] = None
      ops.sortBy(_._4).foreach { case (_, img, kind, seq) =>
        kind match {
          case RowKind.UpdateAfter => live = Some(img)
          case RowKind.Delete =>
            assert(live.contains(img),
              s"$key: -D at seq $seq without matching live image")
            live = None
          case k => fail(s"$key: unexpected kind $k in upsert output")
        }
      }
    }
  }

  test("fuzz: ChangelogJoin materializes to the join of final states") {
    (1L to 16L).foreach { seed =>
      val all = sample(nEnt = 10, nOps = 44, groups = 3, seed)
      // split entities across sides; ONE global seq domain (the
      // operator's documented input contract)
      val lRows = all.filter(_._1 % 2 == 0)
      val rRows = all.filter(_._1 % 2 == 1)
      val l = toDf(lRows, "l")
      val r = toDf(rRows, "r")
      val out = ChangelogJoin(l, r, "lg", "rg", "lid", "rid", "inner")
      val got = UpsertMaterialize(out, Seq("lid", "rid"))
        .select("lid", "lg", "lv", "rid", "rg", "rv")
        .collect().map(_.toSeq).toSet
      val lf = finalState(lRows); val rf = finalState(rRows)
      val exp = (for {
        (lid, (lg, lv)) <- lf.toSeq
        (rid, (rg, rv)) <- rf.toSeq
        if lg == rg
      } yield Seq[Any](lid, lg, lv, rid, rg, rv)).toSet
      assert(got == exp, s"seed $seed: ${got.size} vs ${exp.size}")
      assertUpsertFormed(out.collect().toSeq.map { x =>
        ((x.getAs[Long]("lid"), x.getAs[Long]("rid")).toString,
          Seq(x.get(2), x.get(5)),
          x.getAs[String](RowKind.kindCol),
          x.getAs[Long](RowKind.seqCol))
      })
    }
  }

  test("fuzz: 3-way ChangelogMultiJoin materializes to the triple join") {
    (1L to 12L).foreach { seed =>
      val all = sample(nEnt = 12, nOps = 48, groups = 2, seed)
      val parts = (0 to 2).map(i => all.filter(_._1 % 3 == i))
      val dfs = Seq(toDf(parts(0), "a"), toDf(parts(1), "b"),
        toDf(parts(2), "c"))
      val out = ChangelogMultiJoin(
        Seq((dfs(0), "ag"), (dfs(1), "bg"), (dfs(2), "cg")))
      val got = UpsertMaterialize(out, Seq("aid", "bid", "cid"))
        .select("aid", "av", "bid", "bv", "cid", "cv")
        .collect().map(_.toSeq).toSet
      val fs = parts.map(finalState)
      val exp = (for {
        (aid, (ag, av)) <- fs(0).toSeq
        (bid, (bg, bv)) <- fs(1).toSeq
        if ag == bg
        (cid, (cg, cv)) <- fs(2).toSeq
        if bg == cg
      } yield Seq[Any](aid, av, bid, bv, cid, cv)).toSet
      assert(got == exp, s"seed $seed: ${got.size} vs ${exp.size}")
    }
  }

  test("fuzz: typed (LEFT) n-ary chain materializes to the left-deep join") {
    // 10 seeds x (3 shapes x 4 type mixes) = 120 randomized cases. The
    // expected set is an independent left-deep evaluation over the final
    // states: depth 1 joins a->b on g, depth 2 joins on b.g (chain — a
    // padded b blocks/pads depth 2) or a.g (star — depth 2 is independent
    // of the depth-1 pad), per joinTypes. The TRIANGLE shape adds the
    // non-tree a—c edge on id parity — a probe-time RESIDUAL condition
    // (AttributeBasedJoinKeyExtractor's non-via ConditionAttributeRef) —
    // on top of the chain's tree edges; the all-inner mix routes every
    // shape through the UNTYPED walk engine (planOf residuals) as well.
    type E = (Long, Long, Double)
    def rowsOf(m: Map[Long, (Long, Double)]): Seq[E] =
      m.toSeq.map { case (id, (g, v)) => (id, g, v) }
    (1L to 10L).foreach { seed =>
      val all = sample(nEnt = 12, nOps = 48, groups = 2, seed)
      val parts = (0 to 2).map(i => all.filter(_._1 % 3 == i))
      val dfs = Seq(
        toDf(parts(0), "a").withColumn("apar", col("aid") % 2),
        toDf(parts(1), "b"),
        toDf(parts(2), "c").withColumn("cpar", col("cid") % 2))
      val fs = parts.map(finalState)
      val (a, b, c) = (rowsOf(fs(0)), rowsOf(fs(1)), rowsOf(fs(2)))
      for {
        shape <- Seq("chain", "star", "triangle")
        types <- Seq(
          Seq("inner", "inner", "inner"), // untyped walk engine
          Seq("inner", "left", "inner"),
          Seq("inner", "left", "left"),
          Seq("inner", "inner", "left"))
      } {
        val conds = shape match {
          case "chain" => Map(
            1 -> Seq(ChangelogMultiJoin.ChainCond(0, "ag", "bg")),
            2 -> Seq(ChangelogMultiJoin.ChainCond(1, "bg", "cg")))
          case "star" => Map(
            1 -> Seq(ChangelogMultiJoin.ChainCond(0, "ag", "bg")),
            2 -> Seq(ChangelogMultiJoin.ChainCond(0, "ag", "cg")))
          case _ => Map( // triangle: chain tree + a—c parity residual
            1 -> Seq(ChangelogMultiJoin.ChainCond(0, "ag", "bg")),
            2 -> Seq(
              ChangelogMultiJoin.ChainCond(1, "bg", "cg"),
              ChangelogMultiJoin.ChainCond(0, "apar", "cpar")))
        }
        val out = ChangelogMultiJoin.chain(dfs, conds, types)
        val got = UpsertMaterialize(out, Seq("aid", "bid", "cid"))
          .select("aid", "av", "bid", "bv", "cid", "cv")
          .collect().map(_.toSeq).toSet
        val t1: Seq[(E, Option[E])] = a.flatMap { ar =>
          val ms = b.filter(_._2 == ar._2)
          if (ms.nonEmpty) ms.map(br => (ar, Some(br)))
          else if (types(1) == "left") Seq((ar, None)) else Nil
        }
        val t2: Seq[(E, Option[E], Option[E])] = t1.flatMap { case (ar, bo) =>
          val key: Option[Long] =
            if (shape == "star") Some(ar._2) else bo.map(_._2)
          val ms = key.map(k => c.filter(cr => cr._2 == k &&
            (shape != "triangle" || cr._1 % 2 == ar._1 % 2))).getOrElse(Nil)
          if (ms.nonEmpty) ms.map(cr => (ar, bo, Some(cr)))
          else if (types(2) == "left") Seq((ar, bo, None)) else Nil
        }
        val exp = t2.map { case (ar, bo, co) =>
          Seq[Any](Long.box(ar._1), Double.box(ar._3),
            bo.map(x => Long.box(x._1)).orNull,
            bo.map(x => Double.box(x._3)).orNull,
            co.map(x => Long.box(x._1)).orNull,
            co.map(x => Double.box(x._3)).orNull)
        }.toSet
        assert(got == exp,
          s"seed $seed $shape ${types.mkString("/")}: " +
            s"missing=${exp -- got} extra=${got -- exp}")
      }
    }
  }

  test("fuzz: outer ChangelogJoin padding materializes to the SQL outer join") {
    (1L to 14L).foreach { seed =>
      val all = sample(nEnt = 10, nOps = 44, groups = 3, seed)
      val lRows = all.filter(_._1 % 2 == 0)
      val rRows = all.filter(_._1 % 2 == 1)
      val lf = finalState(lRows); val rf = finalState(rRows)
      Seq("left", "right", "full").foreach { how =>
        val out = ChangelogJoin(toDf(lRows, "l"), toDf(rRows, "r"),
          "lg", "rg", "lid", "rid", how)
        // padded rows materialize under (lid, NULL)/(NULL, rid): keep-last
        // by the pair key yields exactly the SQL outer join of the final
        // states (the operator's documented contract)
        val got = UpsertMaterialize(out, Seq("lid", "rid"))
          .select("lid", "lv", "rid", "rv")
          .collect().map(_.toSeq).toSet
        val inner = for {
          (lid, (lg, lv)) <- lf.toSeq
          (rid, (rg, rv)) <- rf.toSeq
          if lg == rg
        } yield Seq[Any](lid, lv, rid, rv)
        val matchedL = inner.map(_.head).toSet
        val matchedR = inner.map(_(2)).toSet
        val padL = lf.toSeq.collect {
          case (lid, (_, lv)) if !matchedL.contains(lid) =>
            Seq[Any](lid, lv, null, null)
        }
        val padR = rf.toSeq.collect {
          case (rid, (_, rv)) if !matchedR.contains(rid) =>
            Seq[Any](null, null, rid, rv)
        }
        val exp = (how match {
          case "left" => inner ++ padL
          case "right" => inner ++ padR
          case "full" => inner ++ padL ++ padR
        }).toSet
        assert(got == exp,
          s"seed $seed $how: missing=${exp -- got} extra=${got -- exp}")
      }
    }
  }

  test("fuzz: streaming face matches batch face across random splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    (1L to 3L).foreach { seed =>
      val rows = sample(nEnt = 8, nOps = 36, groups = 3, seed)
      val batchMat = UpsertMaterialize(
        RetractingChangelogAgg(toDf(rows), Seq("g"), "v"), Seq("g"))
        .select("g", "n_live", "sum_v", "min_v", "max_v")
        .collect().map(_.toSeq).toSet

      val input = MemoryStream[CRow]
      val df = input.toDF()
        .toDF("id", "g", "v", RowKind.kindCol, RowKind.seqCol)
      val ckpt =
        java.nio.file.Files.createTempDirectory(s"graft-fz$seed-").toString
      val q = RetractingChangelogAgg(df, Seq("g"), "v")
        .writeStream.format("memory").queryName(s"fz_agg_$seed")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        // split points derived from the seed — retractions cross batches
        val cut1 = (seed * 7 % rows.length).toInt.max(1)
        val cut2 = (cut1 + 11).min(rows.length)
        Seq(rows.take(cut1), rows.slice(cut1, cut2), rows.drop(cut2))
          .filter(_.nonEmpty).foreach { chunk =>
            input.addData(chunk); q.processAllAvailable()
          }
      } finally q.stop()
      val streamMat = UpsertMaterialize(
        spark.table(s"fz_agg_$seed"), Seq("g"))
        .select("g", "n_live", "sum_v", "min_v", "max_v")
        .collect().map(_.toSeq).toSet
      assert(streamMat == batchMat, s"seed $seed")
    }
  }

  test("fuzz: ChangelogNormalize rebuilds the full changelog from upserts") {
    (1L to 16L).foreach { seed =>
      val rows = sample(nEnt = 8, nOps = 40, groups = 3, seed)
      // degrade to an upsert feed: keep +I/+U as upserts, -D as
      // deletes, drop -U (the upsert convention)
      val upserts = rows.filterNot(_._4 == RowKind.UpdateBefore)
        .map { case (id, g, v, kind, seq) =>
          (id, g, v,
            if (kind == RowKind.Delete) RowKind.Delete
            else RowKind.UpdateAfter, seq)
        }
      val feed = upserts.toDF("id", "g", "v", "kind", "__seq")
      val out = ChangelogNormalize(feed, Seq("id"), "kind", "__seq")
      // normalized output materializes to the same final state
      val got = UpsertMaterialize(out, Seq("id"))
        .select("id", "g", "v").collect().map(_.toSeq).toSet
      val exp = finalState(rows).map { case (id, (g, v)) =>
        Seq[Any](id, g, v)
      }.toSet
      assert(got == exp, s"seed $seed")
      assertWellFormed(out.collect().toSeq.map { r =>
        (r.getAs[Long]("id").toString,
          Seq(r.get(1), r.get(2)),
          r.getAs[String](RowKind.kindCol),
          r.getAs[Long](RowKind.seqCol))
      })
    }
  }
}
