package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-tier corpus generator (VERDICT r15 #3): derive a 10× "sf1" tier
  * from the driver's read-only sf0.1 parquet, written under
  * `scale-data/sf1` (gitignored — regenerate with
  * `sbt "runMain graft.tools.ScaleDataGen"`). The bench's scale tier
  * ([[graft.Bench]]) measures growth factors against this corpus.
  *
  * Construction: 10 replicas with DISJOINT key spaces — every key column
  * is shifted by `replica × (max_key + 1)` consistently across fact and
  * dimension tables, so join fan-outs, group cardinalities and dup-family
  * sizes grow linearly (each replica is an isomorphic copy) and a
  * super-linear runtime can only come from the ENGINE, not from changed
  * workload semantics. Content perturbation keeps the text/vector
  * workloads honest at 10×:
  *   - `documents.text`: every word carries a per-replica suffix —
  *     within-replica shingle structure (and its near-dup families) maps
  *     bijectively, while cross-replica shingles can never match (naive
  *     replication would multiply every dup family by 10 and the pair
  *     count by 100 — a quadratic workload change, not a 10× one);
  *   - `embeddings.embedding`: replicas 1–9 get fresh deterministic
  *     hash-random vectors (near-orthogonal in high dim — no spurious
  *     cross-replica near-dup clusters); replica 0 keeps the original
  *     planted structure.
  * `nation`/`region`/`events` copy through unchanged.
  */
object ScaleDataGen {

  val replicas = 10

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "scale-data/sf1"
    val spark = GraftSession.get("graft-scale-gen", "local[16]", 16)
    try generate(spark, src, out) finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String): Unit = {
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1

    val (cust, ords, li, prt, supp) =
      (rd("customer"), rd("orders"), rd("lineitem"), rd("part"), rd("supplier"))
    val cShift = maxOf(cust, "c_custkey")
    val oShift = maxOf(ords, "o_orderkey")
    val pShift = maxOf(prt, "p_partkey")
    val sShift = maxOf(supp, "s_suppkey")

    def replicate(df: DataFrame, shifts: Map[String, Long])(
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until replicas).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s))
        }
        extra(shifted, i)
      }.reduce(_ unionByName _)

    wr(replicate(cust, Map("c_custkey" -> cShift))(), "customer", 8)
    wr(replicate(ords, Map("o_orderkey" -> oShift, "o_custkey" -> cShift))(),
      "orders", 16)
    wr(replicate(li, Map("l_orderkey" -> oShift, "l_partkey" -> pShift,
      "l_suppkey" -> sShift))(), "lineitem", 32)
    wr(replicate(prt, Map("p_partkey" -> pShift))(), "part", 8)
    wr(replicate(supp, Map("s_suppkey" -> sShift))(), "supplier", 4)

    val docs = rd("documents")
    val dShift = maxOf(docs, "doc_id")
    wr(replicate(docs, Map("doc_id" -> dShift)) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("text", array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"_r$i"))),
          " "))
        .withColumn("n_chars", length(col("text")))
    }, "documents", 16)

    val emb = rd("embeddings")
    val vShift = maxOf(emb, "vec_id")
    wr(replicate(emb, Map("vec_id" -> vShift)) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (_, j) =>
          // cast the RESULT: float/float division still promotes to double
          ((pmod(hash(col("vec_id"), j, lit(i)), lit(2000)) - lit(1000))
            .cast("double") / lit(1000.0)).cast("float")))
    }, "embeddings", 8)

    Seq("nation" -> 1, "region" -> 1, "events" -> 8).foreach {
      case (t, p) => wr(rd(t), t, p)
    }
    println(s"[scale-gen] wrote ${replicas}x tier to $out")
  }
}
