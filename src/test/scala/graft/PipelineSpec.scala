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

  test("ImageCodec reads true dimensions/frames from real bitstreams") {
    import graft.operators.ImageCodec
    // PNG + JPEG: real ImageIO bitstreams
    val png = ImageCodec.synthesize("png", 17, 9, seed = 42)
    assert(ImageCodec.decode(png).contains(
      ImageCodec.ImageMeta(17, 9, 1, "image/png")))
    val jpg = ImageCodec.synthesize("jpg", 33, 21, seed = 7)
    assert(ImageCodec.decode(jpg).contains(
      ImageCodec.ImageMeta(33, 21, 1, "image/jpeg")))
    // APNG: acTL chunk inserted after IHDR carries the frame count
    assert(ImageCodec.decode(ImageCodec.withApngFrames(png, 5)).contains(
      ImageCodec.ImageMeta(17, 9, 5, "image/png")))
    // GIF: hand-built container, two image descriptors = two frames
    def le(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val frame = Seq(0x2c, 0, 0, 0, 0).map(_.toByte) ++ le(5) ++ le(3) ++
      Seq(0x00, 0x02, 0x01, 0x00, 0x00).map(_.toByte) // flags, lzw, 1-byte block, term
    val gif = ("GIF89a".getBytes("US-ASCII") ++ le(5) ++ le(3) ++
      Seq(0x00, 0x00, 0x00).map(_.toByte) ++ frame ++ frame :+ 0x3b.toByte)
    assert(ImageCodec.decode(gif.toArray).contains(
      ImageCodec.ImageMeta(5, 3, 2, "image/gif")))
    // BMP: minimal header
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 11; bmp(22) = 7
    assert(ImageCodec.decode(bmp).contains(
      ImageCodec.ImageMeta(11, 7, 1, "image/bmp")))
    // garbage and truncations decode to None, never throw
    assert(ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(ImageCodec.decode(png.take(20)).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("Multimodal decode is real: synth dims round-trip; bad bytes → null") {
    val packed = Multimodal.packSynthetic(
      Tables.documents(spark, sf).select(col("doc_id")), "doc_id")
    assert(packed.schema("media").dataType.typeName == "binary")
    val decoded = Multimodal.decode(packed)
    decoded.select("doc_id", "width", "height", "n_frames", "decoded_mime")
      .collect().foreach { case Row(id: Long, w: Int, h: Int, f: Int, m: String) =>
        assert(w == (id % 61).toInt + 4 && h == (id % 37).toInt + 4)
        val expF = if (id % 3 != 0 && id % 5 == 0) (id % 4).toInt + 2 else 1
        assert(f == expF, s"doc $id frames $f != $expF")
        assert(m == (if (id % 3 == 0) "image/jpeg" else "image/png"))
      }
    // text bytes are not a known container: null features, no failure
    val textPacked = Multimodal.pack(
      Tables.documents(spark, sf).limit(5), col("text"), "text/plain")
    val nulls = Multimodal.decode(textPacked)
      .select("width", "height", "n_frames").collect()
    assert(nulls.length == 5 && nulls.forall(r => r.isNullAt(0) &&
      r.isNullAt(1) && r.isNullAt(2)))
  }

  test("frameSample expands one row per decoded frame, deterministically") {
    val decoded = Multimodal.decode(Multimodal.packSynthetic(
      Tables.documents(spark, sf).select(col("doc_id")), "doc_id"))
    val frames = Multimodal.frameSample(decoded)
    val expanded = frames.groupBy("doc_id").count()
      .join(decoded.select(col("doc_id"), col("n_frames")), "doc_id")
      .where(col("count") =!= col("n_frames")).count()
    assert(expanded == 0)
    // offsets partition the payload; fingerprints reproduce run-to-run
    val a = frames.select("doc_id", "frame_idx", "frame_off", "frame_hash")
      .orderBy("doc_id", "frame_idx").collect()
    val b = Multimodal.frameSample(decoded)
      .select("doc_id", "frame_idx", "frame_off", "frame_hash")
      .orderBy("doc_id", "frame_idx").collect()
    assert(a.nonEmpty && a.sameElements(b))
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

  test("packSequences: packs respect the budget; oversized docs isolate") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, 100L), (8L, 200L), (16L, 300L), (24L, 150L), // bin 0
      (1L, 600L), (9L, 50L), // bin 1: first doc oversized
      (2L, 512L), (10L, 1L)) // bin 2: exact fit then overflow
      .toDF("doc_id", "n_toks")
    val packed = graft.operators.TrainingData
      .packSequences(docs, "doc_id", "n_toks", maxTokens = 512, numBins = 8)
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._3)
    // bin 0: 100+200 fits (300+300>512 -> new pack), 300+150 fits
    assert(rows.filter(_._1 == 0).map(r => (r._3, r._2)).toSeq ==
      Seq((0L, 0L), (8L, 0L), (16L, 1L), (24L, 1L)))
    // bin 1: oversized 600 alone in pack 0; 50 starts pack 1
    assert(rows.filter(_._1 == 1).map(r => (r._3, r._2)).toSeq ==
      Seq((1L, 0L), (9L, 1L)))
    // bin 2: exactly 512 fills pack 0; the next token opens pack 1
    assert(rows.filter(_._1 == 2).map(r => (r._3, r._2)).toSeq ==
      Seq((2L, 0L), (10L, 1L)))
    // invariant on real data: no multi-doc pack exceeds the budget, and
    // the result is identical across partitionings
    val real = Tables.documents(spark, sf).select(col("doc_id"),
      size(graft.functions.TextAnalysis.tokens(col("text")))
        .cast("long").as("n_toks"))
    val a = graft.operators.TrainingData
      .packSequences(real, "doc_id", "n_toks", 512, 8)
    val sums = a.groupBy("bin", "pack")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n")).collect()
    sums.foreach { r =>
      assert(r.getLong(2) <= 512 || r.getLong(3) == 1,
        s"overfull multi-doc pack: $r")
    }
    val b = graft.operators.TrainingData
      .packSequences(real.repartition(17), "doc_id", "n_toks", 512, 8)
    assert(a.collect().toSet == b.collect().toSet,
      "packing must not depend on the input partitioning")
  }
}
