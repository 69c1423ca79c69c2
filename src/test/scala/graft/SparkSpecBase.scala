package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (single forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.get("graft-test", "local[4]", 8)
  val sf: String = "/root/testdata/sf0.001"
  val sfMid: String = "/root/testdata/sf0.01"
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
  def sfMid: String = TestSpark.sfMid
}
