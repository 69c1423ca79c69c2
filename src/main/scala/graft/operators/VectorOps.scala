package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._


/** Vector similarity primitives over `array<float>` embedding columns
  * (reference: flink-table-planner/…/exec/stream/
  * StreamExecVectorSearchTableFunction.java:55 and
  * flink-table-common/…/connector/source/VectorSearchTableSource.java).
  *
  * Exactness contract (what makes results oracle-checkable across engines):
  * float→double casts are exact, a product of two floats is exact in double
  * (24-bit mantissas → ≤48 bits), and p·10¹² is the SAME IEEE double in
  * every engine; `floor` of an identical double is tie-free (unlike a
  * half-up/half-even decimal cast, whose rounding mode differs between
  * engines and WILL diverge by one ulp on an exact-tie element — observed
  * in practice). The floored fixed-point elements sum exactly in integer
  * arithmetic (associative → partitioning-independent), and the final
  * divide/sqrt are correctly-rounded IEEE ops on identical doubles.
  *
  * Everything is array-lambda Catalyst expressions (`zip_with`/`aggregate`)
  * — no UDF, no explode: the dot product of a 100 TB embedding column runs
  * inside WholeStageCodegen one row at a time.
  */
object VectorOps {

  // Fixed-point scale: |element product| < 1e3 → |scaled| < 1e15 (exact in
  // double, < 2^53) and a 64k-dim sum < 2^63 — no overflow anywhere.
  private val Scale = 1e12

  /** Exact (partitioning-independent) dot product of two float arrays:
    * fixed-point at 1e-12, integer-summed. Runs as the native codegen
    * expression [[graft.functions.DotFixedExpr]] (the zip_with/aggregate
    * HOF spelling is CodegenFallback — interpreted lambdas per element,
    * ~10× slower on 64-dim embeddings). */
  def dotDec(a: Column, b: Column): Column =
    call_function("dot_fixed_native", a, b)

  /** L2 norm via the exact dot product. */
  def norm(a: Column): Column = sqrt(dotDec(a, a))

  /** Fast approximate dot product in pure double (codegen-friendly, ~10×
    * cheaper than the decimal path but partition-order sensitive in the
    * last bits). Use as a PREFILTER with an epsilon margin, then re-score
    * survivors with [[dotDec]] — the exact result is unchanged because the
    * double/decimal divergence (≲1e-9 relative) is far below any sensible
    * margin. */
  def dotDouble(a: Column, b: Column): Column =
    call_function("dot_double_native", a, b)

  /** Approximate cosine for prefiltering (see [[dotDouble]]). */
  def cosineApprox(a: Column, b: Column, na: Column, nb: Column): Column =
    dotDouble(a, b) / (na * nb)

  /** Cosine similarity given precomputed norms (pass [[norm]] results so
    * each row's norm is computed once, not per pair). */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dotDec(a, b) / (na * nb)

  /** DuckDB SQL spelling of the same exact dot product (oracle side). */
  def sqlDot(a: String, b: String): String =
    s"(CAST((SELECT SUM(CAST(p AS BIGINT)) FROM UNNEST(" +
      s"list_transform(list_zip($a, $b), " +
      s"x -> floor(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) * 1e12)" +
      s")) t(p)) AS DOUBLE) / 1e12)"

  /** DuckDB SQL spelling of [[norm]]. */
  def sqlNorm(a: String): String =
    s"sqrt(CAST((SELECT SUM(CAST(p AS BIGINT)) FROM UNNEST(" +
      s"list_transform($a, x -> floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)" +
      s" * 1e12))) t(p)) AS DOUBLE) / 1e12)"

  /** DuckDB SQL spelling of [[cosine]] over named norm columns. */
  def sqlCos(a: String, b: String, na: String, nb: String): String =
    s"${sqlDot(a, b)} / ($na * $nb)"
}
