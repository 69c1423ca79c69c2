package graft.functions

import org.apache.spark.sql.SparkSession

/** JSON_OBJECTAGG / JSON_ARRAYAGG aggregators (SURVEY.md §2.8 JSON pack). */
object JsonAggFunctions {
  def register(spark: SparkSession): Unit = {
    // populated in M3
  }
}
