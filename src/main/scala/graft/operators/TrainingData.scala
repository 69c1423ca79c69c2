package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-corpus assembly primitives: deterministic weighted mixing and
  * epoch-salted global shuffle — the two operations between "cleaned
  * corpus" and "training order" in every large-scale data pipeline.
  *
  * Everything is hash-deterministic (md5 over a key + salt), so mixes and
  * shuffles are REPRODUCIBLE across runs, engines, and partitionings —
  * no `rand()`, whose per-partition seeding ties results to the physical
  * plan. Buckets come from 32 hash bits % 10000, so the modulo bias is
  * ≤ 10⁴/2³² ≈ 2·10⁻⁶ — sample rates track the requested weight to well
  * under 0.01% (two hex digits % 100 would be off by up to ~17%).
  *
  * Scale: `sample`/`mix` are pure per-row filters (no shuffle — a mixed
  * corpus never moves data until something downstream asks);
  * `epochShuffle` is ONE range exchange + in-partition sort, the scalable
  * form of a global ORDER BY (no single-task sort, no row_number
  * bottleneck), re-saltable per epoch.
  */
object TrainingData {

  /** Uniform bucket 0..9999 from md5(key ":" salt) — first eight hex
    * chars (32 bits) % 10000. */
  def bucket(key: Column, salt: String): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long") % 10000).cast("int")

  /** Keep each row with probability `weightPct`/100, deterministically by
    * key: keep iff bucket(key, salt) < weightPct·100. `weightPct` may be
    * a per-row column (per-source weights) or a literal, fractional
    * percentages resolve to basis points (w = 12.5 → 1250/10000). */
  def sample(df: DataFrame, key: Column, weightPct: Column,
      salt: String): DataFrame =
    df.where(bucket(key, salt) < weightPct * 100)

  /** Weighted mixture of sources: each (frame, weightPct) contributes its
    * deterministic sample; frames must be union-compatible. Weights over
    * 100 UPSAMPLE: floor(w/100) full copies plus a re-salted fractional
    * sample of the remainder (w = 230 → every row twice + a 30% sample),
    * so epoch-level duplication is explicit and reproducible. */
  def mix(sources: Seq[(DataFrame, Double)], key: String,
      salt: String): DataFrame = {
    require(sources.nonEmpty, "mix needs at least one source")
    sources.flatMap { case (df, w) =>
      require(w >= 0, s"negative mix weight: $w")
      val full = (w / 100).toInt
      val rem = w - full * 100
      Seq.fill(full)(df) ++
        (if (rem > 0)
           Seq(sample(df, col(key), lit(rem),
             if (full == 0) salt else s"$salt#u$full"))
         else Nil)
    }.reduce(_ unionByName _)
  }

  /** Epoch-salted deterministic global shuffle: ORDER BY
    * md5(key ":" epoch) as a range exchange + in-partition sort. Distinct
    * epochs give independent orders; the same epoch always gives the same
    * order. */
  def epochShuffle(df: DataFrame, key: Column, epoch: String): DataFrame = {
    val out = df.withColumn("__shuffle_key",
      md5(concat(key.cast("string"), lit(":" + epoch))))
    out.repartitionByRange(col("__shuffle_key"))
      .sortWithinPartitions(col("__shuffle_key"))
  }

  /** Token-budget-bounded deterministic sampling — the per-domain
    * token-budget draw of an LLM data mix: within each group, documents
    * rank by md5(key ":" salt) and the prefix whose CUMULATIVE token
    * count fits `budget` is kept. Deterministic (same salt → same
    * draw) and monotone (a larger budget only ADDS documents — the
    * prefix property mix re-balancing relies on).
    *
    * Scale: one hash shuffle on the group key; the cumulative count is
    * a running-sum window inside each group partition — no global
    * sort, no driver state. Skewed groups are bounded by their own
    * budget, not the corpus. */
  def sampleByBudget(df: DataFrame, group: Column, key: Column,
      tokens: Column, budget: Long, salt: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(md5(concat(key.cast("string"), lit(":" + salt))))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum_tokens", sum(tokens).over(w))
      .where(col("__cum_tokens") <= budget)
      .drop("__cum_tokens")
  }

  /** Greedy sequence packing — assemble documents into training
    * sequences of at most `maxTokens` tokens (the context-window packing
    * step of an LLM data pipeline; no reference counterpart — this is a
    * north-star extension like the dedup pack).
    *
    * Deterministic and cluster-parallel by construction: each document
    * lands in bin `id % numBins`; bins pack INDEPENDENTLY (one shuffle on
    * the bin key, then a per-partition linear scan in id order — no
    * driver state, no global sequential pass), so throughput scales with
    * `numBins` while any given (corpus, numBins, maxTokens) triple always
    * yields the same packs. Within a bin the greedy rule is: take docs in
    * id order, start a new pack when the running token count would exceed
    * `maxTokens`; an oversized document gets a pack of its own (the
    * trainer's truncation decision stays downstream).
    *
    * Output: (bin, pack, id, n_tokens) — one row per document with its
    * pack assignment; `pack` numbers are per-bin, so (bin, pack) is the
    * global sequence key.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      maxTokens: Long,
      numBins: Int): DataFrame = {
    require(maxTokens > 0 && numBins > 0)
    val sorted = df
      .select(pmod(col(idCol).cast("long"), lit(numBins.toLong)).as("bin"),
        col(idCol), col(tokenCol).cast("long").as("n_tokens"))
      .repartition(numBins min 200, col("bin"))
      .sortWithinPartitions(col("bin"), col(idCol))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bin",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pack",
        org.apache.spark.sql.types.LongType, nullable = false),
      sorted.schema(idCol),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType)))
    sorted.mapPartitions { rows =>
      // a partition holds whole bins (hash-partitioned on bin) in
      // (bin, id) order — linear scan with per-bin reset
      var curBin = Long.MinValue
      var pack = 0L
      var acc = 0L
      rows.map { r =>
        val bin = r.getLong(0)
        val t = r.getLong(2)
        if (bin != curBin) { curBin = bin; pack = 0L; acc = t }
        else if (acc + t <= maxTokens) acc += t
        else { pack += 1L; acc = t }
        org.apache.spark.sql.Row(bin, pack, r.get(1), t)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
