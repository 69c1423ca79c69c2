package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.roaringbitmap.RoaringBitmap

/** BITMAP_* family over RoaringBitmap-encoded BinaryType columns.
  *
  * Mirrors the reference's bitmap surface (SURVEY.md §2.8; scalar ops in
  * RT/functions/scalar/Bitmap*.java, aggregates in
  * RT/functions/aggregate/AbstractBitmap*.java) re-expressed as Spark
  * `Aggregator`s + scalar UDFs. Aggregation runs through
  * ObjectHashAggregateExec: the bitmap object lives across updates and is
  * only (de)serialized at spill/shuffle boundaries, so a 100 TB build is a
  * partial-agg of compressed bitmaps per partition + a small merge shuffle —
  * the same partial/final split the reference uses.
  *
  * Values are 32-bit (RoaringBitmap); out-of-range inputs throw.
  */
object BitmapFunctions {

  private[functions] def ser(rb: RoaringBitmap): Array[Byte] = {
    rb.runOptimize()
    val out = new Array[Byte](rb.serializedSizeInBytes())
    rb.serialize(ByteBuffer.wrap(out))
    out
  }

  private[functions] def deser(b: Array[Byte]): RoaringBitmap = {
    val rb = new RoaringBitmap()
    rb.deserialize(ByteBuffer.wrap(b))
    rb
  }

  private def toIntChecked(v: Long): Int = {
    require(v >= 0 && v <= Int.MaxValue, s"bitmap value out of 32-bit range: $v")
    v.toInt
  }

  /** Mutable merge buffer; Externalizable-friendly via java serialization. */
  final class Buf(var set: Boolean, var rb: RoaringBitmap) extends Serializable

  private implicit val bufEnc: Encoder[Buf] = Encoders.javaSerialization[Buf]

  /** BITMAP_AGG: build a bitmap from a column of non-negative int32 values. */
  val buildAgg: Aggregator[java.lang.Long, Buf, Array[Byte]] =
    new Aggregator[java.lang.Long, Buf, Array[Byte]] {
      def zero: Buf = new Buf(true, new RoaringBitmap())
      def reduce(b: Buf, v: java.lang.Long): Buf = {
        if (v != null) b.rb.add(toIntChecked(v.longValue()))
        b
      }
      def merge(a: Buf, b: Buf): Buf = { a.rb.or(b.rb); a }
      def finish(b: Buf): Array[Byte] = ser(b.rb)
      def bufferEncoder: Encoder[Buf] = bufEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** BITMAP_OR_AGG: union of serialized bitmaps. */
  val orAgg: Aggregator[Array[Byte], Buf, Array[Byte]] =
    new Aggregator[Array[Byte], Buf, Array[Byte]] {
      def zero: Buf = new Buf(true, new RoaringBitmap())
      def reduce(b: Buf, v: Array[Byte]): Buf = {
        if (v != null) b.rb.or(deser(v))
        b
      }
      def merge(a: Buf, b: Buf): Buf = { a.rb.or(b.rb); a }
      def finish(b: Buf): Array[Byte] = ser(b.rb)
      def bufferEncoder: Encoder[Buf] = bufEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** BITMAP_AND_AGG: intersection of serialized bitmaps (empty input →
    * empty bitmap; the `set` flag marks "no element seen yet" so the
    * identity is the universe, like the reference's retractable AND agg).
    */
  val andAgg: Aggregator[Array[Byte], Buf, Array[Byte]] =
    new Aggregator[Array[Byte], Buf, Array[Byte]] {
      def zero: Buf = new Buf(false, new RoaringBitmap())
      def reduce(b: Buf, v: Array[Byte]): Buf = {
        if (v != null) {
          if (!b.set) { b.rb = deser(v); b.set = true }
          else b.rb.and(deser(v))
        }
        b
      }
      def merge(a: Buf, b: Buf): Buf =
        if (!a.set) b
        else if (!b.set) a
        else { a.rb.and(b.rb); a }
      def finish(b: Buf): Array[Byte] = ser(b.rb)
      def bufferEncoder: Encoder[Buf] = bufEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** BITMAP_XOR_AGG: symmetric difference of serialized bitmaps. */
  val xorAgg: Aggregator[Array[Byte], Buf, Array[Byte]] =
    new Aggregator[Array[Byte], Buf, Array[Byte]] {
      def zero: Buf = new Buf(true, new RoaringBitmap())
      def reduce(b: Buf, v: Array[Byte]): Buf = {
        if (v != null) b.rb.xor(deser(v))
        b
      }
      def merge(a: Buf, b: Buf): Buf = { a.rb.xor(b.rb); a }
      def finish(b: Buf): Array[Byte] = ser(b.rb)
      def bufferEncoder: Encoder[Buf] = bufEnc
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** The reference's *_CARDINALITY_AGG forms: same accumulation, 64-bit
    * cardinality out — saves shipping the final bitmap when only the
    * count is wanted.
    */
  private def cardinalityOf[I](
      inner: Aggregator[I, Buf, Array[Byte]]): Aggregator[I, Buf, Long] =
    new Aggregator[I, Buf, Long] {
      def zero: Buf = inner.zero
      def reduce(b: Buf, v: I): Buf = inner.reduce(b, v)
      def merge(a: Buf, b: Buf): Buf = inner.merge(a, b)
      def finish(b: Buf): Long = b.rb.getLongCardinality
      def bufferEncoder: Encoder[Buf] = bufEnc
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  // Scalar ops (binary in, binary/long/bool out)
  private val andF = (a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null
    else ser(RoaringBitmap.and(deser(a), deser(b)))
  private val orF = (a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null
    else ser(RoaringBitmap.or(deser(a), deser(b)))
  private val xorF = (a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null
    else ser(RoaringBitmap.xor(deser(a), deser(b)))
  private val andNotF = (a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null
    else ser(RoaringBitmap.andNot(deser(a), deser(b)))
  private val cardF = (a: Array[Byte]) =>
    if (a == null) null else java.lang.Long.valueOf(deser(a).getLongCardinality)
  private val containsF = (a: Array[Byte], v: Long) =>
    if (a == null) null
    else java.lang.Boolean.valueOf(deser(a).contains(toIntChecked(v)))
  private val toArrayF = (a: Array[Byte]) =>
    if (a == null) null else deser(a).toArray.map(_.toLong & 0xffffffffL)
  private val fromArrayF = (xs: Seq[Long]) =>
    if (xs == null) null
    else {
      val rb = new RoaringBitmap()
      xs.foreach(v => rb.add(toIntChecked(v)))
      ser(rb)
    }
  // BITMAP_FROM_BYTES / BITMAP_TO_BYTES: the engine's BITMAP storage IS
  // the 32-bit RoaringBitmap serialization the reference specifies, so
  // both directions are a validating round trip (malformed input throws,
  // like the reference's deserializer).
  private val fromBytesF = (b: Array[Byte]) =>
    if (b == null) null else ser(deser(b))
  // BITMAP_TO_STRING: same output as the reference byte for byte — both
  // delegate to org.roaringbitmap.RoaringBitmap#toString ("{1,2,3}",
  // unsigned order, library-side truncation for huge sets).
  private val toStringF = (b: Array[Byte]) =>
    if (b == null) null else deser(b).toString

  def register(spark: SparkSession): Unit = {
    spark.udf.register("bitmap_agg", udaf(buildAgg))
    spark.udf.register("bitmap_or_agg", udaf(orAgg))
    spark.udf.register("bitmap_and_agg", udaf(andAgg))
    spark.udf.register("bitmap_and", andF)
    spark.udf.register("bitmap_or", orF)
    spark.udf.register("bitmap_xor", xorF)
    spark.udf.register("bitmap_andnot", andNotF)
    spark.udf.register("bitmap_cardinality", cardF)
    spark.udf.register("bitmap_contains", containsF)
    spark.udf.register("bitmap_to_array", toArrayF)
    spark.udf.register("bitmap_from_array", fromArrayF)
    // reference catalog spellings (docs/data/sql_functions.yml bitmap
    // section): BUILD = from-array, BUILD_AGG = value agg, plus the
    // byte/string codecs and the cardinality-fused aggregates
    spark.udf.register("bitmap_build", fromArrayF)
    spark.udf.register("bitmap_build_agg", udaf(buildAgg))
    spark.udf.register("bitmap_xor_agg", udaf(xorAgg))
    spark.udf.register("bitmap_from_bytes", fromBytesF)
    spark.udf.register("bitmap_to_bytes", fromBytesF)
    spark.udf.register("bitmap_to_string", toStringF)
    spark.udf.register("bitmap_build_cardinality_agg", udaf(cardinalityOf(buildAgg)))
    spark.udf.register("bitmap_or_cardinality_agg", udaf(cardinalityOf(orAgg)))
    spark.udf.register("bitmap_and_cardinality_agg", udaf(cardinalityOf(andAgg)))
    spark.udf.register("bitmap_xor_cardinality_agg", udaf(cardinalityOf(xorAgg)))
  }

  // Column API
  def bitmapAgg(c: Column): Column = udaf(buildAgg).apply(c)
  def bitmapOrAgg(c: Column): Column = udaf(orAgg).apply(c)
  def bitmapAndAgg(c: Column): Column = udaf(andAgg).apply(c)
}
