package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal-pack gap functions (reference: BuiltInFunctionDefinitions.java
  * temporal section). Composed from built-ins — stays in codegen. */
object TemporalFunctions {

  /** TEMPORAL_OVERLAPS: true when the two periods share at least one time
    * point (boundaries inclusive, SQL OVERLAPS semantics); each period is
    * normalized so its bounds may be given in either order. */
  def temporalOverlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column = {
    val lo1 = least(s1, e1); val hi1 = greatest(s1, e1)
    val lo2 = least(s2, e2); val hi2 = greatest(s2, e2)
    lo1 <= hi2 && lo2 <= hi1
  }
}
