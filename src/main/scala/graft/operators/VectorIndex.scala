package graft.operators

import graft.operators.VectorOps._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pluggable vector-index SPI behind VECTOR_SEARCH — the Spark analog of
  * the reference's `VectorSearchTableSource`
  * (flink-table-common/…/connector/source/VectorSearchTableSource.java,
  * planned by StreamExecVectorSearchTableFunction.java:55): the query
  * surface stays one TVF while the index strategy (exact scan, IVF
  * clusters, LSH buckets, or a user-provided index) plugs in underneath.
  *
  * Contract: `corpus` and `queries` each carry exactly (id BIGINT,
  * embedding ARRAY&lt;FLOAT&gt;) in that order (names are free). The result is
  * `(qid, cid, rnk, cos)` — per query row the top-`k` most-cosine-similar
  * corpus rows, self-matches (`cid == qid`) excluded, ranked by
  * `(cos DESC, cid ASC)` so ties are deterministic.
  *
  * Scale contract every bundled index honors: the query side is the small
  * side and is broadcast; the corpus NEVER shuffles (candidate generation
  * is map-side projection + broadcast joins); the exact decimal cosine
  * runs only on final candidates.
  */
trait VectorIndex extends Serializable {

  def name: String

  /** Top-k per query row; see the class doc for the (qid, cid, rnk, cos)
    * contract. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame

  /** Normalize inputs to the internal (cid, ce) / (qid, qe) shape. */
  protected def shaped(corpus: DataFrame, queries: DataFrame)
      : (DataFrame, DataFrame) = {
    require(corpus.columns.length == 2 && queries.columns.length == 2,
      s"VectorIndex inputs must be (id, embedding); got " +
        s"corpus=${corpus.columns.mkString(",")} " +
        s"queries=${queries.columns.mkString(",")}")
    (corpus.toDF("cid", "ce"), queries.toDF("qid", "qe"))
  }

  /** Shared tail: exact decimal re-score of a candidate set + per-query
    * top-k window. `cand` is (qid, cid); both sides join back to their
    * embeddings. `broadcastQueries` hints the query-embedding side — the
    * right plan for normal probe sizes; million-query probes pass false
    * and shuffle on qid instead (same ceiling as the IVF candidate
    * broadcast, VERDICT r17 task 7). */
  protected def rescore(
      cand: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      broadcastQueries: Boolean = true): DataFrame = {
    val (c, q) = shaped(corpus, queries)
    val qn = q.select(col("qid"), col("qe"), norm(col("qe")).as("qn"))
    val scored = c.select(col("cid"), col("ce"), norm(col("ce")).as("cn"))
      .join(cand, "cid")
      .join(if (broadcastQueries) broadcast(qn) else qn, "qid")
      .select(col("qid"), col("cid"),
        cosine(col("qe"), col("ce"), col("qn"), col("cn")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("rnk"), col("cos"))
      .orderBy(col("qid"), col("rnk"))
  }
}

/** Exact brute-force scan: corpus × broadcast(queries), one decimal cosine
  * per pair. The correctness baseline every approximate index is measured
  * against; linear in |corpus|·|queries|. */
final class BruteForceIndex extends VectorIndex {
  override def name: String = "brute"

  override def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val (c0, q0) = shaped(corpus, queries)
    val c = c0.select(col("cid"), col("ce"), norm(col("ce")).as("cn"))
    val q = q0.select(col("qid"), col("qe"), norm(col("qe")).as("qn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    c.join(broadcast(q), col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        cosine(col("qe"), col("ce"), col("qn"), col("cn")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("rnk"), col("cos"))
      .orderBy(col("qid"), col("rnk"))
  }
}

/** IVF-style index: coarse centroids = every `centStride`-th corpus vector,
  * map-side assignment (cheap double ranking reduced by a max(struct)
  * partial aggregate — the shuffle carries |corpus| pre-reduced rows),
  * `nprobe` probed clusters per query, exact re-score on the candidates.
  * Per-query work drops from |corpus| to |probed clusters|. Plan shape
  * preserved from the r2–r4 tuning (see VERDICT r2 #2). */
final class IvfIndex(centStride: Int = 50, nprobe: Int = 2)
    extends VectorIndex {
  override def name: String = "ivf"

  override def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val (emb, q0) = shaped(corpus, queries)
    val cents = emb.where(col("cid") % centStride === 0)
      .select(col("cid").as("cent_id"), col("ce").as("cemb"),
        norm(col("ce")).as("cnrm"))
    val assign = emb.join(broadcast(cents))
      .select(col("cid"), col("cent_id"),
        (dotDouble(col("ce"), col("cemb")) / col("cnrm")).as("score"))
      .groupBy(col("cid"))
      .agg(max(struct(col("score"), (-col("cent_id")).as("nc"))).as("best"))
      .select(col("cid"), (-col("best.nc")).as("cent_id"))
    // Broadcast ceiling (VERDICT r17 task 7): the probe set is
    // |queries|·nprobe (qid, cent_id) pairs and the candidate set
    // ≈ |queries|·centStride·nprobe (qid, cid) pairs — broadcastable at
    // normal probe sizes, a driver-memory ceiling when a caller probes
    // with millions of queries. Estimate from the QUERY side's plan
    // statistics (no job): stats bytes / ~300 B per embedding row (id +
    // a 64-float vector) ≈ rows, × cluster fan-out × 24 B per pair.
    // Above the ceiling, drop EVERY query-derived broadcast hint (probe,
    // candidates, re-score embeddings) and let Catalyst/AQE pick shuffle
    // joins — the scale-safe plan. Relations with NO real statistics
    // (sizeInBytes at the unknown sentinel) keep the tuned broadcast
    // shape: the million-query scale path always has stats (file scans,
    // ranges), and flipping a small no-stats probe to shuffle would be a
    // silent regression in the common case.
    val statsBytes = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    val estCandBytes =
      if (statsBytes >= Long.MaxValue / 4) BigInt(0) // unknown stats
      else statsBytes / 300 * centStride * nprobe * 24
    val small = estCandBytes <= IvfIndex.BroadcastCandBytes
    def hinted(df: DataFrame): DataFrame = if (small) broadcast(df) else df

    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cent_id").asc)
    val probe = q0.join(broadcast(cents))
      .select(col("qid"), col("cent_id"),
        (dotDouble(col("qe"), col("cemb")) / col("cnrm")).as("score"))
      .withColumn("rk", row_number().over(wq))
      .where(col("rk") <= nprobe)
      .select(col("qid"), col("cent_id"))
    // (qid, cid) unique by construction: assign keeps ONE cluster per cid
    // and a query's ≤nprobe clusters are distinct — no dedup shuffle
    val cand = assign.join(hinted(probe), "cent_id")
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"))
    rescore(hinted(cand), corpus, queries, k, broadcastQueries = small)
  }
}

object IvfIndex {
  /** Max estimated candidate-pair bytes still broadcast to executors. */
  val BroadcastCandBytes: Long = 64L << 20
}

/** Sign-LSH bucketed index: `bands` bands × `bits` sign bits per band over
  * the embedding dims; a corpus vector is a candidate when ANY band key
  * matches (multi-probe recall without all-pairs). Band keys are map-side
  * projections; candidates an equi-join on (band, key) against the
  * broadcast query bands. */
final class LshIndex(bands: Int = 8, bits: Int = 8) extends VectorIndex {
  override def name: String = "lsh"

  private def withKeys(df: DataFrame, vec: String): DataFrame = {
    def bit(i: Int) =
      when(call_function("element_at", col(vec),
        col("band") * bits + lit(i + 1)) >= 0, 1).otherwise(0) * lit(1 << i)
    df.withColumn("band", explode(lit((0 until bands).toArray)))
      .withColumn("key", (0 until bits).map(bit).reduce(_ + _))
  }

  override def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val (c, q) = shaped(corpus, queries)
    val cb = withKeys(c, "ce").select(col("cid"), col("band"), col("key"))
    val qb = withKeys(q, "qe").select(col("band"), col("key"), col("qid"))
    val cand = cb.join(broadcast(qb), Seq("band", "key"))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid")).distinct()
    rescore(cand, corpus, queries, k)
  }
}

/** Index registry for the `VECTOR_SEARCH` SQL TVF and DSL callers; custom
  * indexes plug in via [[register]] (the SPI seam the reference exposes as
  * a connector factory). */
object VectorIndexes {

  private val reg = scala.collection.concurrent.TrieMap[String, VectorIndex](
    "brute" -> new BruteForceIndex,
    "ivf" -> new IvfIndex(),
    "lsh" -> new LshIndex())

  def register(index: VectorIndex): Unit = reg(index.name) = index

  def apply(name: String): VectorIndex =
    reg.getOrElse(name, throw new IllegalArgumentException(
      s"unknown vector index '$name'; registered: ${reg.keys.mkString(", ")}"))
}
