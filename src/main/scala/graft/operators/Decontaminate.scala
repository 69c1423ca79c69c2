package graft.operators

import graft.functions.TextAnalysis.{shingles, tokens}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the n-gram-overlap audit every training
  * pipeline runs before a corpus ships: flag corpus documents whose
  * distinct word-n-gram overlap with any benchmark document exceeds a
  * threshold fraction of the document's own n-gram set (the standard
  * "test-set leakage" check; the reference's table-function tier is the
  * operator surface this slots into, like the other text ops).
  *
  * Scale design (100 TB corpus, ~10⁴–10⁵ benchmark docs): the benchmark
  * shingle set is millions of rows at most — it is BROADCAST, so the
  * corpus is never shuffled for the probe; each corpus partition streams
  * its shingles past the broadcast hash relation. Per-document totals
  * come from `size(shingles(...))` computed inline — no explode, no
  * shuffle. The only shuffles are the two small aggregations AFTER the
  * probe: (doc, bench) match counts and the final doc-keyed join, both
  * proportional to the matched subset, not the corpus. Map-side partial
  * counts absorb hot documents.
  */
object Decontaminate {

  /** @param corpus     frame with `doc_id` and `text`
    * @param benchmark  frame with `bench_id` and `text` (small side)
    * @param n          shingle width in tokens
    * @param minOverlap flag pairs with matched/total >= this fraction
    * @param benchDfCap drop shingles shared by more than this many
    *   BENCHMARK docs: probe multiplicity per corpus posting equals the
    *   shingle's benchmark df, so one boilerplate shingle across the
    *   whole benchmark multiplies the join output by |benchmark| — the
    *   NgramJaccard hot-shingle blow-up on the probe side. Ubiquitous
    *   shingles carry no contamination signal; the cap is far above any
    *   real df at test scale (max 6 at sf0.1), so oracles are unaffected.
    * @return (doc_id, bench_id, matched, total, overlap)
    */
  def apply(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 3,
      minOverlap: Double = 0.5,
      benchDfCap: Int = 1000): DataFrame = {
    val cs = corpus
      .select(col("doc_id"), tokens(col("text")).as("__t"))
      .select(col("doc_id"), explode(shingles(col("__t"), n)).as("s"))
    val bsAll = benchmark
      .select(col("bench_id"), tokens(col("text")).as("__t"))
      .select(col("bench_id"), explode(shingles(col("__t"), n)).as("s"))
    // benchmark-side df cap (cheap: the benchmark is the small side)
    val bs = bsAll.join(
      bsAll.groupBy(col("s")).agg(count(lit(1)).as("__df"))
        .where(col("__df") <= benchDfCap).select(col("s")),
      Seq("s"), "left_semi")
    // per-doc totals without a shuffle: |distinct shingles| inline.
    // Tokens are projected BEFORE the shingle lambda — inlining
    // tokens(text) into shingles() re-evaluates the split per lambda
    // element, O(tokens²) per doc (same note as NgramJaccard).
    val totals = corpus
      .select(col("doc_id"), tokens(col("text")).as("__t"))
      .select(col("doc_id"),
        size(shingles(col("__t"), n)).cast("long").as("total"))
    val matched = cs.join(broadcast(bs), "s")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("matched"))
    matched.join(totals, "doc_id")
      .withColumn("overlap",
        col("matched").cast("double") / col("total").cast("double"))
      .where(col("overlap") >= minOverlap)
      .select(col("doc_id"), col("bench_id"), col("matched"), col("total"),
        col("overlap"))
  }
}
