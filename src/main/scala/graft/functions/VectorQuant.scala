package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the 4× storage compression
  * every large-scale embedding store runs before writing vectors at
  * corpus scale (the absmax scheme: scale = max|x| / 127, q_i =
  * round(x_i / scale) ∈ [-127, 127]). Pure built-in expressions
  * (transform / zip_with / array_max) — whole-stage codegen, no UDF,
  * linear per row; the reconstruction error is bounded by scale/2 per
  * dimension by construction.
  *
  * Reference anchor: the vector-search tier's storage story
  * (docs/sql/reference/queries/vector-search.md operates on
  * ARRAY<FLOAT> columns; quantized storage is the standard scale path
  * for those columns at 100 TB). */
object VectorQuant {

  /** Per-vector scale (max|x| / 127) as double; 0 for the zero vector. */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** The quantized vector as `array<tinyint>` given the [[int8Scale]]
    * column (zero vectors quantize to zeros). */
  def quantizeInt8(vec: Column, scale: Column): Column =
    when(scale === 0,
      transform(vec, _ => lit(0).cast("byte")))
      .otherwise(transform(vec,
        x => round(x.cast("double") / scale).cast("byte")))

  /** Dequantized double vector. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Max absolute reconstruction error of a (vec, q, scale) triple —
    * `<= scale / 2 (+ float noise)` by construction. */
  def maxAbsError(vec: Column, q: Column, scale: Column): Column =
    array_max(zip_with(dequantizeInt8(q, scale), vec,
      (d, x) => abs(d - x.cast("double"))))
}
