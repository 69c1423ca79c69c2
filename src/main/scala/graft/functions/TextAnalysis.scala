package graft.functions

import org.apache.spark.sql.SparkSession

/** Text-analysis functions for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  */
object TextAnalysis {
  def register(spark: SparkSession): Unit = {
    // populated in M4
  }
}
