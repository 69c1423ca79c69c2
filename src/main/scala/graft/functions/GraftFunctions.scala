package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-name registration for every custom graft function.
  *
  * Mirrors the reference's function registry
  * (flink-table/flink-table-common/src/main/java/org/apache/flink/table/
  * functions/BuiltInFunctionDefinitions.java) for the functions Spark lacks;
  * everything Spark already ships is used directly and never re-registered.
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    StringGapFunctions.register(spark)
    CollectionGapFunctions.register(spark)
    BitmapFunctions.register(spark)
    JsonAggFunctions.register(spark)
    TextAnalysis.register(spark)
    FlinkNameCompat.register(spark)
  }
}
