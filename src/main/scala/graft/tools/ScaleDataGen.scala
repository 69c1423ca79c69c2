package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    val spark = GraftSession.get("graft-scale-gen", "local[16]", 16)
    try {
      if (args.headOption.contains("skew")) {
        val src = if (args.length > 1) args(1) else "scale-data/sf1"
        val out = if (args.length > 2) args(2) else "scale-data/sf1skew"
        generateSkew(spark, src, out)
      } else {
        val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
        val out = if (args.length > 1) args(1) else "scale-data/sf1"
        // optional replica count: `ScaleDataGen /root/testdata/sf0.1
        // scale-data/sf3 30` builds the 30x spot-tier corpus (VERDICT r17
        // task 6) with the same disjoint-key-space construction
        val n = if (args.length > 2) args(2).toInt else replicas
        generate(spark, src, out, n)
      }
    } finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
      nReplicas: Int = replicas): Unit = {
    val replicas = nReplicas
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

  /** Adversarially-SKEWED 10× tier (VERDICT r16 task 5): the uniform tier
    * proves linear growth on well-spread keys; this variant measures the
    * story the caps/salting exist for. Derived from the uniform `sf1`
    * output (`sbt "runMain graft.tools.ScaleDataGen skew"`), written to
    * `scale-data/sf1skew` (gitignored, regenerable):
    *
    *   - zipf join keys: 30% of `lineitem.l_orderkey` and 30% of
    *     `orders.o_custkey` are reassigned to a 1,000-key hot list with
    *     zipf(s=1) ranks (inverse-CDF `exp(u·ln k)` over a deterministic
    *     hash) — the hottest order key carries ~3% of ALL lineitem rows,
    *     the shape AQE skew-join/salting must absorb;
    *   - one hot duplicate family: every 5th document (~10⁴ members at
    *     this tier) gets an IDENTICAL text — every shingle in the family
    *     reaches df 10⁴ and every MinHash/SimHash band collapses to one
    *     bucket, so the df-caps and bucket caps are load-bearing, not
    *     latent;
    *   - one hot cosine cluster: every 2nd embedding (~10⁴ at this tier)
    *     becomes a tiny perturbation of a single base vector — the
    *     sign-LSH hot-bucket cap faces a genuinely hot bucket.
    *
    * The bench's `skew` sub-tier runs the skew-sensitive pipelines against
    * this corpus and gates growth at the same 15× bound as the uniform
    * tier — a breach means a cap or salt is missing, not that the data
    * got bigger.
    */
  def generateSkew(spark: SparkSession, src: String, out: String): Unit = {
    require(new java.io.File(s"$src/lineitem.parquet").exists(),
      s"uniform scale tier missing at $src — run ScaleDataGen first")
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")

    // zipf(s=1) rank in [0, k): P(rank=r) ∝ 1/(r+1) via inverse CDF of
    // the log-uniform; u from a salted hash so decision and rank draws
    // are independent
    def unit(salt: Int, cols: Column*): Column =
      (pmod(hash((cols :+ lit(salt)): _*), lit(1000000)).cast("double")
        + lit(0.5)) / lit(1000000.0)
    def zipfRank(k: Int, salt: Int, cols: Column*): Column =
      // floor(exp(u·ln(k+1))) - 1 spans the FULL 0-based rank range
      // [0, k-1] (ADVICE r17: the ln(k) form shifted one unreachable
      // endpoint to the other — rank k-1 could never be drawn; scaling
      // the exponent instead of shifting makes both endpoints reachable)
      least(floor(exp(unit(salt, cols: _*) * lit(math.log(k + 1.0))))
        .cast("int") - lit(1), lit(k - 1))

    // hot lists are REAL keys (collected once, broadcast as literals) so
    // reassigned rows still join
    val ords = rd("orders")
    val hotOrderKeys = ords.select("o_orderkey").orderBy("o_orderkey")
      .limit(1000).collect().map(_.getLong(0))
    val hotCustKeys = ords.select("o_custkey").distinct().orderBy("o_custkey")
      .limit(1000).collect().map(_.getLong(0))

    val li = rd("lineitem")
    wr(li.withColumn("l_orderkey",
      when(unit(1, col("l_orderkey"), col("l_linenumber")) < 0.3,
        element_at(lit(hotOrderKeys),
          zipfRank(1000, 2, col("l_orderkey"), col("l_linenumber")) + 1))
        .otherwise(col("l_orderkey"))), "lineitem", 32)

    wr(ords.withColumn("o_custkey",
      when(unit(3, col("o_orderkey")) < 0.3,
        element_at(lit(hotCustKeys), zipfRank(1000, 4, col("o_orderkey")) + 1))
        .otherwise(col("o_custkey"))), "orders", 16)

    val hotText = (1 to 120).map(i => s"hotdup$i token$i").mkString(" ")
    val docs = rd("documents")
    wr(docs
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 0, lit(hotText))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text"))), "documents", 16)

    val emb = rd("embeddings")
    wr(emb.withColumn("embedding",
      when(pmod(col("vec_id"), lit(2)) === 0,
        transform(col("embedding"), (_, j) =>
          (((pmod(hash(j), lit(2000)) - lit(1000)).cast("double") / lit(1000.0))
            + ((pmod(hash(col("vec_id"), j), lit(200)) - lit(100))
              .cast("double") / lit(10000.0))).cast("float")))
        .otherwise(col("embedding"))), "embeddings", 8)

    Seq("customer" -> 8, "part" -> 8, "supplier" -> 4,
      "nation" -> 1, "region" -> 1, "events" -> 8).foreach {
      case (t, p) => wr(rd(t), t, p)
    }
    println(s"[scale-gen] wrote skewed ${replicas}x tier to $out")
  }
}
