package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key skew handling by salting — the manual fallback when AQE's
  * skew-join split (enabled in GraftSession) can't help: aggregations
  * with very few distinct keys, and joins whose skew is on the BUILD
  * side. The reference handles these with adaptive repartitioning
  * (BatchExecAdaptiveJoin.java:52, adaptive scheduler); on Spark the
  * same physics is salt + two-phase.
  *
  * Correctness: the salt only changes WHERE partial work happens — the
  * final merge is exact (counts and decimal sums are associative), so
  * results are independent of the salt function and bucket count, which
  * is what the oracle asserts.
  */
object Salt {

  /** Deterministic salt bucket from arbitrary distinguishing columns. */
  def saltCol(n: Int, distinguishers: Column*): Column =
    pmod(hash(distinguishers: _*), lit(n))

  /** Two-phase salted count+sum aggregation: partial per (key, salt) —
    * spreading one hot key over `n` reducers — then exact final merge per
    * key. The shuffle for phase 1 has n× the key cardinality; phase 2
    * shuffles only n rows per key.
    */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[Column],
      value: Column,
      sumScale: Int,
      n: Int,
      distinguishers: Seq[Column]): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(25, sumScale)
    df.withColumn("__salt", saltCol(n, distinguishers: _*))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__pc"), sum(value.cast(dec)).as("__ps"))
      .groupBy(keys: _*)
      .agg(sum(col("__pc")).as("cnt"),
        sum(col("__ps")).cast("double").as("sum_v"))
  }

  /** Skew-safe equi-join: the probe side gets a deterministic salt, the
    * build side is replicated once per salt bucket, and the join key
    * becomes (key, salt) — a hot probe key now lands on n tasks instead
    * of one. Build-side cost: n× replication (keep n small; only worth it
    * when a key genuinely overwhelms one task).
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      n: Int,
      probeDistinguishers: Seq[Column]): DataFrame = {
    val salted = probe.withColumn("__salt",
      saltCol(n, probeDistinguishers: _*))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
