package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines: tokenization,
  * shingling, seeded hashing for MinHash/LSH, SimHash bit extraction,
  * quality metrics (SURVEY.md §7.1 north-star extensions; reference shape:
  * flink-table-planner/…/exec/stream/StreamExecMLPredictTableFunction.java:55
  * and the scalar-function tier of BuiltInFunctionDefinitions.java).
  *
  * Everything is COMPOSED from built-in Catalyst expressions — array
  * lambdas (`transform`/`filter`/`aggregate`), `md5`, `substring` — so the
  * whole pipeline stays inside WholeStageCodegen with no UDF boundary.
  * Determinism notes (needed for cross-engine oracle checks):
  *   - every hash is md5 over an explicit UTF-8 string, never a
  *     JVM-specific hash;
  *   - MinHash's k hash functions are md5("<seed>:" + shingle) — k
  *     independent permutation surrogates with no arithmetic on parsed
  *     hex (a lexicographic MIN over hex strings is engine-portable);
  *   - ratios are computed as exact integer counts cast to double at the
  *     last step (IEEE division of identical operands is bit-identical).
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped (leading/trailing/double
    * spaces produce empty strings from split). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Token-bounded chunking with overlap — the context-window
    * splitting step of a training-data pipeline: chunk i covers tokens
    * `[i*stride, i*stride + maxTokens)`, so consecutive chunks share
    * `maxTokens - stride` tokens of overlap; the last chunk starts at
    * the first offset whose window reaches the end. Pure built-in
    * expressions (sequence/transform/slice/array_join) — whole-stage
    * codegen, no UDF boundary, linear in corpus size. */
  def chunkTokens(toks: Column, maxTokens: Int, stride: Int): Column = {
    require(maxTokens >= 1 && stride >= 1 && stride <= maxTokens,
      "chunkTokens needs 1 <= stride <= maxTokens")
    val n = size(toks)
    val lastIdx = when(n <= maxTokens, lit(0)).otherwise(
      floor((n - maxTokens + stride - 1).cast("double") / stride)
        .cast("int"))
    transform(sequence(lit(0), lastIdx),
      i => array_join(slice(toks, i * stride + 1, lit(maxTokens)), " "))
  }

  /** Distinct word n-gram shingles over a token array; empty array when
    * the document has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Seeded hash for MinHash: md5("<seed>:" + s). The per-seed MIN over
    * these hex strings is one signature component. */
  def seededMd5(seed: Column, s: Column): Column =
    md5(concat(seed.cast("string"), lit(":"), s))

  /** Value 0-15 of hex char `pos` (1-based) of a hex string — the
    * engine-portable way to read hash bits (strpos/instr exists in every
    * SQL engine; no hex-literal parsing needed). */
  def hexDigit(h: Column, pos: Column): Column =
    call_function("instr", lit("0123456789abcdef"),
      call_function("substring", h, pos, lit(1))) - lit(1)

  /** Bit `b` (0 = most significant of the first hex char) of a hex string. */
  def hexBit(h: Column, b: Column): Column = {
    val digit = hexDigit(h, lit(1) + (b / lit(4)).cast("int"))
    call_function("shiftright", digit, lit(3) - (b % lit(4))).bitwiseAND(lit(1))
  }

  /** Character k-gram md5 fingerprints of a document, mod-`keepMod`
    * selected (winnowing-style density reduction: ~1/keepMod of all
    * k-grams survive, chosen content-deterministically). */
  def charGramFingerprints(text: Column, k: Int, keepMod: Int): Column = {
    val grams = when(
      length(text) >= k,
      transform(
        sequence(lit(1), length(text) - lit(k - 1)),
        i => md5(call_function("substring", text, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
    array_distinct(filter(grams, h => hexDigit(h, lit(1)) % keepMod === 0))
  }

  /** Convenience SQL registrations. The Column API above is the fast path
    * (pure Catalyst); these UDFs mirror its semantics for SQL users. */
  /** All ordered pairs (a < b) within a SORTED id array — LSH-bucket
    * candidate generation WITHOUT a self-join: `groupBy(bucket) +
    * explode(sortedPairs(ids))` evaluates the signature pipeline once,
    * where `sig.as("a").join(sig.as("b"), …)` evaluates it twice (Spark
    * does not reuse the exchange across self-join sides). Bucket sizes
    * are near-dup group sizes — tiny by construction — so the pair
    * explosion is bounded per bucket. */
  def sortedPairs(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)), y => array(x, y))))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("token_count", (s: String) =>
      if (s == null) null
      else java.lang.Long.valueOf(s.split(" ").count(_.nonEmpty).toLong))
    spark.udf.register("word_shingles", (s: String, n: Int) =>
      if (s == null) null
      else {
        val toks = s.split(" ").filter(_.nonEmpty)
        if (toks.length < n) Array.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toArray.distinct
      })
  }
}
