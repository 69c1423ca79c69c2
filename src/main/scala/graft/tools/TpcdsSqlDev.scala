package graft.tools

import graft.GraftSession
import graft.queries.TpcdsSqlQueries

/** Dev-loop smoke for the official-TPC-DS text family: run each of the 99
  * official texts through the SQL entry, print rowcount or the failure.
  * Not part of the driver contract (Verify/Bench are); kept for fast
  * iteration on dialect gaps.
  */
object TpcdsSqlDev {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-tpcds-dev", "local[8]", 8)
    val only: Seq[Int] =
      if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq else (1 to 99)
    var ok = 0
    val fails = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    only.foreach { n =>
      try {
        val t0 = System.nanoTime()
        val rows = TpcdsSqlQueries.run(spark, n).count()
        println(f"q$n%02d OK rows=$rows%-6d ${(System.nanoTime() - t0) / 1e9}%.2fs")
        ok += 1
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.toString)
            .linesIterator.take(3).mkString(" | ").take(300)
          println(s"q$n FAIL $msg")
          fails += ((n, msg))
      }
    }
    println(s"ok=$ok fail=${fails.size}: ${fails.map(_._1).mkString(",")}")
    spark.stop()
  }
}
