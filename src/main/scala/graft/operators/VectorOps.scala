package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector similarity primitives over `array<float>` embedding columns
  * (reference: flink-table-planner/…/exec/stream/
  * StreamExecVectorSearchTableFunction.java:55 and
  * flink-table-common/…/connector/source/VectorSearchTableSource.java).
  *
  * Exactness contract (what makes results oracle-checkable across engines):
  * float→double casts are exact, a product of two floats is exact in double
  * (24-bit mantissas → ≤48 bits), so the ONLY rounding is the single
  * double→DECIMAL(30,12) cast per element; the decimal SUM is then exact and
  * associative — the result is independent of partitioning, and identical in
  * any engine that rounds half-away-from-zero. The final sqrt/divide are
  * correctly-rounded IEEE ops on identical doubles.
  *
  * Everything is array-lambda Catalyst expressions (`zip_with`/`aggregate`)
  * — no UDF, no explode: the dot product of a 100 TB embedding column runs
  * inside WholeStageCodegen one row at a time.
  */
object VectorOps {

  // DECIMAL(30,12): wide enough that element sums never overflow (|element
  // product| < 1e3, ≤ 64k elements → |sum| < 1e8 ≪ 1e18), narrow enough
  // that Spark's decimal addition (precision+1 per add, capped at 38 with
  // scale loss) never reaches the cap — the re-cast in the merge lambda is
  // therefore always exact.
  private val dec = DecimalType(30, 12)

  /** Exact (partitioning-independent) dot product of two float arrays. */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(dec)),
      lit(0).cast(dec),
      (acc, v) => (acc + v).cast(dec))

  /** L2 norm via the exact dot product. */
  def norm(a: Column): Column = sqrt(dotDec(a, a).cast("double"))

  /** Fast approximate dot product in pure double (codegen-friendly, ~10×
    * cheaper than the decimal path but partition-order sensitive in the
    * last bits). Use as a PREFILTER with an epsilon margin, then re-score
    * survivors with [[dotDec]] — the exact result is unchanged because the
    * double/decimal divergence (≲1e-9 relative) is far below any sensible
    * margin. */
  def dotDouble(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Approximate cosine for prefiltering (see [[dotDouble]]). */
  def cosineApprox(a: Column, b: Column, na: Column, nb: Column): Column =
    dotDouble(a, b) / (na * nb)

  /** Cosine similarity given precomputed norms (pass [[norm]] results so
    * each row's norm is computed once, not per pair). */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dotDec(a, b).cast("double") / (na * nb)

  /** DuckDB SQL spelling of the same exact dot product (oracle side). */
  def sqlDot(a: String, b: String): String =
    s"CAST((SELECT SUM(CAST(p AS DECIMAL(30,12))) FROM UNNEST(" +
      s"list_transform(list_zip($a, $b), " +
      s"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) t(p)) AS DOUBLE)"

  /** DuckDB SQL spelling of [[norm]]. */
  def sqlNorm(a: String): String =
    s"sqrt(CAST((SELECT SUM(CAST(p AS DECIMAL(30,12))) FROM UNNEST(" +
      s"list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) t(p)) AS DOUBLE))"

  /** DuckDB SQL spelling of [[cosine]] over named norm columns. */
  def sqlCos(a: String, b: String, na: String, nb: String): String =
    s"${sqlDot(a, b)} / ($na * $nb)"
}
