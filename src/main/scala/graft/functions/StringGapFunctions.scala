package graft.functions

import org.apache.spark.sql.SparkSession

/** Scalar string functions the reference has and Spark lacks.
  * Inventory from SURVEY.md §2.8 (BuiltInFunctionDefinitions.java):
  * SPLIT_INDEX, STR_TO_MAP variants, PARSE_URL deltas, INET_ATON/NTOA,
  * IS_VALID_UTF8 / MAKE_VALID_UTF8, TRANSLATE3, JSON_QUOTE, …
  */
object StringGapFunctions {
  def register(spark: SparkSession): Unit = {
    // populated in M3
  }
}
