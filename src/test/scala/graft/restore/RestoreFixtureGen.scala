package graft.restore

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Generates the committed restore-compat fixtures (run deliberately, via
  * `sbt "Test/runMain graft.restore.RestoreFixtureGen"`, ONLY when a
  * state-layout change is intentional — the whole point of the fixtures
  * is that [[graft.RestoreCompatSpec]] fails when a refactor breaks a
  * checkpoint written by an earlier round).
  *
  * Per scenario: run batch 1, snapshot the checkpoint into
  * `src/test/resources/restore/<name>/checkpoint`, then resume with
  * batch 2 and record the INCREMENTAL output rows as
  * `golden.json` (sorted toJSON lines). The generation run exercises the
  * same restore path the spec replays, so a fixture is born verified.
  */
object RestoreFixtureGen {

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("graft-restore-gen", "local[4]", 4)
    // optional arg: regenerate ONE scenario by name (adding a new
    // operator must not silently rewrite the other pinned fixtures)
    val only = args.headOption
    RestoreScenarios.all
      .filter(s => only.forall(_ == s.name))
      .foreach(generate(spark, _))
    spark.stop()
  }

  private[graft] def copyTree(src: Path, dst: Path): Unit = {
    Files.walk(src).iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  private[graft] def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  private[graft] def writeBatch(spark: SparkSession,
      sc: RestoreScenarios.Scenario, ins: Seq[Path],
      rows: Seq[Seq[org.apache.spark.sql.Row]]): Unit =
    sc.schemas.zip(ins).zip(rows).foreach { case ((schema, dir), rs) =>
      if (rs.nonEmpty)
        spark.createDataFrame(rs.asJava, schema).coalesce(1)
          .write.mode("append").parquet(dir.toString)
    }

  private[graft] def startQuery(spark: SparkSession,
      sc: RestoreScenarios.Scenario, ins: Seq[Path], out: Path,
      ckpt: Path): org.apache.spark.sql.streaming.StreamingQuery = {
    val dfs: Seq[DataFrame] = sc.schemas.zip(ins).map { case (schema, dir) =>
      spark.readStream.schema(schema).parquet(dir.toString)
    }
    sc.build(dfs).writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
  }

  private[graft] def readOut(spark: SparkSession, out: Path): Seq[String] =
    try spark.read.parquet(out.toString).toJSON.collect().toSeq.sorted
    catch { case _: Throwable => Nil }

  /** Multiset difference: rows in `after` not accounted for by `before`. */
  private[graft] def diff(after: Seq[String], before: Seq[String])
      : Seq[String] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    before.foreach(s => counts(s) = counts.getOrElse(s, 0) + 1)
    after.filter { s =>
      val c = counts.getOrElse(s, 0)
      if (c > 0) { counts(s) = c - 1; false } else true
    }
  }

  /** Make a snapshotted checkpoint machine/path-independent:
    *  - blank every file-source log entry to the empty "v1" list (the
    *    [[graft.streaming.StateBootstrap]] contract) — the entries record
    *    ABSOLUTE input paths from generation time, and the engine's
    *    restart getBatch() rejects them under a different input dir
    *    ("Wrong basePath"); the seen-files set they carry only matters if
    *    the generation-time files reappear, which they cannot;
    *  - drop Hadoop .crc sidecars, which would fail verification after
    *    the rewrite. */
  private def relocatable(ckpt: Path): Unit = {
    Files.walk(ckpt).iterator().asScala.toSeq.foreach { p =>
      if (Files.isRegularFile(p)) {
        if (p.getFileName.toString.endsWith(".crc")) Files.delete(p)
        else if (p.toString.contains("/sources/"))
          Files.writeString(p, "v1")
      }
    }
  }

  private def generate(spark: SparkSession,
      sc: RestoreScenarios.Scenario): Unit = {
    // fixtures pin the partition count via the checkpoint's own conf; keep
    // it small so the committed state dirs stay tiny
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val base = Files.createTempDirectory(s"restore-gen-${sc.name}-")
      val ins = sc.schemas.indices.map(i => base.resolve(s"in$i"))
      ins.foreach(Files.createDirectories(_))
      val out = base.resolve("out")
      val ckpt = base.resolve("ckpt")

      writeBatch(spark, sc, ins, sc.batch1)
      val q1 = startQuery(spark, sc, ins, out, ckpt)
      q1.processAllAvailable(); q1.stop()
      val o1 = readOut(spark, out)

      val fixture = Paths.get(RestoreScenarios.fixtureRoot, sc.name)
      deleteTree(fixture)
      copyTree(ckpt, fixture.resolve("checkpoint"))
      relocatable(fixture.resolve("checkpoint"))

      writeBatch(spark, sc, ins, sc.batch2)
      val q2 = startQuery(spark, sc, ins, out, ckpt)
      q2.processAllAvailable(); q2.stop()
      val golden = diff(readOut(spark, out), o1)
      require(golden.nonEmpty,
        s"${sc.name}: batch 2 produced no incremental output — the " +
          "scenario would not detect lost state")
      Files.writeString(fixture.resolve("golden.json"),
        golden.mkString("", "\n", "\n"))
      println(s"[restore-gen] ${sc.name}: ${golden.size} golden rows")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
