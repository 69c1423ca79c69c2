package graft

import graft.restore.{RestoreFixtureGen, RestoreScenarios}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Checkpoint restore compatibility (the reference's `restore-tests/`
  * tier, RestoreTestBase.java): every big stateful operator must resume
  * from the checkpoint COMMITTED IN THE REPO (written by the round that
  * last touched its state layout) and reproduce the recorded golden
  * output. A failure here means the current code can no longer read
  * state written by the shipped operator — a user's running checkpoint
  * would break on upgrade. Fix the regression, or if the layout change
  * is deliberate, regenerate via
  * `sbt "Test/runMain graft.restore.RestoreFixtureGen"` and say so in
  * the commit message.
  */
class RestoreCompatSpec extends SparkSpecBase {

  RestoreScenarios.all.foreach { sc =>
    test(s"${sc.name} resumes from its committed checkpoint") {
      val fixture = Paths.get(RestoreScenarios.fixtureRoot, sc.name)
      assert(Files.exists(fixture.resolve("checkpoint")),
        s"missing committed fixture ${fixture.toAbsolutePath}; run " +
          "`sbt \"Test/runMain graft.restore.RestoreFixtureGen\"`")
      val golden = Files.readAllLines(fixture.resolve("golden.json"))
        .asScala.filter(_.nonEmpty).toSeq.sorted

      val base = Files.createTempDirectory(s"restore-spec-${sc.name}-")
      val ckpt = base.resolve("ckpt")
      RestoreFixtureGen.copyTree(fixture.resolve("checkpoint"), ckpt)
      val ins = sc.schemas.indices.map(i => base.resolve(s"in$i"))
      ins.foreach(Files.createDirectories(_))
      // only batch 2 exists on disk — batch 1 lives solely in the
      // checkpoint's state (its input files are intentionally absent)
      RestoreFixtureGen.writeBatch(spark, sc, ins, sc.batch2)
      // fresh output dir: author empty sink-log entries for the batches
      // the checkpoint already committed (StateBootstrap.prepareFileSink's
      // contract, one per committed batch id)
      val out = base.resolve("out")
      val committed = Files.list(ckpt.resolve("commits")).iterator().asScala
        .map(_.getFileName.toString).filter(_.forall(_.isDigit)).toSeq
      committed.foreach { b =>
        val p = out.resolve("_spark_metadata").resolve(b)
        Files.createDirectories(p.getParent)
        Files.writeString(p, "v1")
      }

      val q = RestoreFixtureGen.startQuery(spark, sc, ins, out, ckpt)
      try { q.processAllAvailable() } finally q.stop()

      // the output dir is fresh, so everything in it IS the restored
      // batch's incremental output — exactly what the golden records
      val produced = RestoreFixtureGen.readOut(spark, out).sorted
      assert(produced == golden,
        s"""${sc.name}: restored output diverged from the committed golden.
           |produced (${produced.size}):
           |  ${produced.mkString("\n  ")}
           |golden (${golden.size}):
           |  ${golden.mkString("\n  ")}""".stripMargin)
    }
  }
}
