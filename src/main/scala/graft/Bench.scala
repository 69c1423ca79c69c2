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
  *   - deterministic name order, median of 3 timed runs per query.
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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.get("graft-bench", s"local[$cpus]", cpus.toInt)

    // Dev loop only (driver leaves it unset): bench a named subset.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Warmup: one untimed pass over every query.
    ordered.foreach { case (_, fn) =>
      try runOnce(spark, sfDir, fn) catch { case _: Throwable => () }
    }

    val results = ordered.map { case (name, fn) =>
      val times =
        try (1 to reps).map(_ => runOnce(spark, sfDir, fn)).sorted
        catch { case _: Throwable => Seq(-1.0) }
      name -> times(times.size / 2) // median
    }

    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a file: the driver captures only the tail of stdout,
    // which truncated half of BENCH_r02 — the file survives intact.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
