package graft.functions

import org.apache.spark.sql.SparkSession

/** BITMAP_* function family over RoaringBitmap-encoded BinaryType columns.
  * Mirrors the reference's RT/functions/scalar/Bitmap*.java +
  * RT/functions/aggregate/AbstractBitmap*.java (SURVEY.md §2.8).
  */
object BitmapFunctions {
  def register(spark: SparkSession): Unit = {
    // populated in M3
  }
}
