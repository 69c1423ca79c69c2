package graft

/** Dev tool: print the formatted physical plan of named queries (plan
  * audits — pushdown, broadcast choice, WholeStageCodegen spans).
  * Usage: runMain graft.Explain <sfDir> <name>[,<name>…]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim)
    val spark = GraftSession.get("graft-explain", "local[4]", 8)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
