package graft

import graft.functions.TextAnalysis
import graft.ml.{HashScoreModel, MLPredict}
import graft.operators.{Multimodal, VectorOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Specs for the LLM-pipeline tier: text analysis, dedup building blocks,
  * vector similarity, model inference, multimodal columns. */
class PipelineSpec extends SparkSpecBase {

  import spark.implicits._

  test("tokens drops empty tokens from split") {
    val out = Seq("a b  c ", " x", "")
      .toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("t"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a", "b", "c"))
    assert(out(1) == Seq("x"))
    assert(out(2) == Seq.empty)
  }

  test("shingles: sliding distinct n-grams; short docs give empty") {
    val out = Seq("a b c d", "a b")
      .toDF("text")
      .select(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
  }

  test("charGramFingerprints selects a deterministic subset of gram hashes") {
    val text = "the quick brown fox jumps over the lazy dog"
    val all = (0 to text.length - 8).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.substring(i, i + 8).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    val expected = all.filter(h =>
      ("0123456789abcdef".indexOf(h.head) % 4) == 0).distinct.sorted
    val got = Seq(text).toDF("text")
      .select(TextAnalysis.charGramFingerprints(col("text"), 8, 4).as("fp"))
      .as[Seq[String]].collect()(0).sorted
    assert(got == expected)
  }

  test("dotDec is exact and partition-order independent") {
    val a = Array(0.25f, -0.5f, 0.125f)
    val b = Array(2.0f, 4.0f, -8.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(VectorOps.dotDec(col("a"), col("b")).cast("double").as("d"))
      .as[Double].collect()(0)
    // 0.25*2 + (-0.5)*4 + 0.125*(-8) = 0.5 - 2 - 1 = -2.5, all exact
    assert(got == -2.5)
  }

  test("cosine of a vector with itself is ~1, with its negation ~-1") {
    val v = Array(0.3f, -0.7f, 0.2f, 0.9f)
    val df = Seq((v, v.map(x => -x))).toDF("a", "b")
      .select(
        VectorOps.norm(col("a")).as("na"),
        VectorOps.norm(col("b")).as("nb"),
        col("a"), col("b"))
      .select(
        VectorOps.cosine(col("a"), col("a"), col("na"), col("na")).as("self"),
        VectorOps.cosine(col("a"), col("b"), col("na"), col("nb")).as("neg"))
    val r = df.collect()(0)
    // fixed-point floor truncation bounds the error at ~dim * 1e-12
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-9)
  }

  test("MLPredict sync/async agree and are batch-size independent") {
    val in = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val sync1 = MLPredict(in, new HashScoreModel("n_chars"), batchSize = 1)
      .select("doc_id", "score", "pred_label").orderBy("doc_id").collect()
    val sync64 = MLPredict(in, new HashScoreModel("n_chars"), batchSize = 64)
      .select("doc_id", "score", "pred_label").orderBy("doc_id").collect()
    val async = MLPredict.async(in, new HashScoreModel("n_chars"),
      batchSize = 7, maxInFlight = 3)
      .select("doc_id", "score", "pred_label").orderBy("doc_id").collect()
    assert(sync1.sameElements(sync64))
    assert(sync1.sameElements(async))
    assert(sync1.nonEmpty)
  }

  test("Multimodal pack/decode/frameSample: schema and row expansion") {
    val packed = Multimodal.pack(Tables.documents(spark, sf), col("text"),
      "text/plain")
    assert(packed.schema("media").dataType.typeName == "binary")
    val decoded = Multimodal.decodeStub(packed)
    val metaRows = decoded
      .select(col("media_meta.n_bytes"), col("n_frames")).collect()
    metaRows.foreach { case Row(n: Long, f: Int) =>
      assert(f == (n % 7).toInt + 1)
    }
    val frames = Multimodal.frameSample(decoded, col("text"))
    val expanded = frames.groupBy("doc_id").count()
      .join(decoded.select(col("doc_id"), col("n_frames")), "doc_id")
      .where(col("count") =!= col("n_frames")).count()
    assert(expanded == 0)
  }

  test("minhash LSH candidates include high-jaccard near-dup pairs") {
    val cands = SparkEntry.queries("q_dedup_minhash")(spark, sfMid)
      .as[(Long, Long)].collect().toSet
    val jacc = SparkEntry.queries("q_ngram_jaccard")(spark, sfMid)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    // every pair with jaccard >= 0.8 must be recalled by 4x4 LSH banding
    val strong = jacc.filter(_._3 >= 0.8).map(t => (t._1, t._2))
    assert(strong.nonEmpty)
    strong.foreach(p => assert(cands.contains(p), s"LSH missed $p"))
  }
}
