package graft.tools

import graft.GraftSession

/** Dev-loop: split a query's wall time into DataFrame BUILD (the SQL
  * entry pipeline) vs EXECUTE (noop write), per rep — localizes the
  * q_sql_* fixed overhead. Not part of the driver contract.
  */
object SqlBenchDev {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-sqlbench-dev", "local[32]", 32)
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 5
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"[sqlbench] $name rep$i build=${(t1 - t0) / 1e9}%.3f " +
          f"exec=${(t2 - t1) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
