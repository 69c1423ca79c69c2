package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** MATCH_RECOGNIZE-lite: batch row-pattern matching per key in event-time
  * order — the first slice of the reference's CEP tier
  * (StreamExecMatch.java:61; NFA in flink-cep/…/cep/nfa/NFA.java:76).
  *
  * Scope (v2, deliberately restricted to stay oracle-checkable):
  * the classic `A+ B` shape with greedy `A+` and AFTER MATCH SKIP PAST
  * LAST ROW — here instantiated as the V-shape detector: a maximal run of
  * strictly-falling values immediately followed by one rising value.
  * Predicates compare consecutive rows (PREV semantics). One output row
  * per match: key, match start/end (exact micros), run length, depth.
  *
  * Execution: one hash shuffle on the key, external (spilling) sort within
  * partitions, then a single streamed pass per key running a 2-state NFA
  * (SecondarySort.mapOrderedGroups) — the same single-scan shape the
  * reference's NFA performs per key. Per-key heap is the NFA registers
  * only (O(1)); a hot key spills in the sort, never in the operator.
  */
object MatchRecognize {

  /** Falling-run-then-rise matcher over (key, timeUs, value).
    * @param df       input
    * @param keyCol   partition key column
    * @param timeCol  LongType event time (exact micros; ties must be
    *                 pre-deduplicated for determinism)
    * @param valCol   DoubleType measure
    */
  def fallingRunThenRise(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valCol: String): DataFrame = {

    val kIdx = df.schema.fieldIndex(keyCol)
    val tIdx = df.schema.fieldIndex(timeCol)
    val vIdx = df.schema.fieldIndex(valCol)
    val keyField = df.schema.fields(kIdx)

    val outSchema = StructType(Seq(
      keyField,
      StructField("start_us", LongType),
      StructField("end_us", LongType),
      StructField("n_down", LongType),
      StructField("depth", DoubleType)))

    SecondarySort.mapOrderedGroups(
      df, Seq(keyCol), Seq(org.apache.spark.sql.functions.col(timeCol)),
      outSchema) { (key, rows) =>
      // 2-state NFA: Idle --(fall)--> InRun --(rise)--> emit, skip past.
      // Lazy flatMap: emits stream out as the scan advances — no per-key
      // output buffer either.
      var runStart = -1L // time of the row the run FELL FROM
      var runLen = 0L
      var runTop = 0.0
      var prevT = -1L
      var prevV = 0.0
      var havePrev = false
      rows.flatMap { r =>
        val t = r.getLong(tIdx)
        val v = r.getDouble(vIdx)
        var emit: Option[Row] = None
        if (havePrev) {
          if (v < prevV) {
            if (runLen == 0) { runStart = prevT; runTop = prevV }
            runLen += 1
          } else if (v > prevV && runLen > 0) {
            emit = Some(Row(key.head, runStart, t, runLen, runTop - prevV))
            runLen = 0 // SKIP PAST LAST ROW: run consumed
          } else if (v == prevV) {
            runLen = 0 // plateau breaks the pattern, no match
          }
        }
        prevT = t; prevV = v; havePrev = true
        emit
      }
    }
  }
}
