package graft.changelog

import graft.SparkSpecBase
import org.apache.spark.sql.types._

/** Unit lock on the ChangelogJoin streaming-state codec (r20): the v2
  * UnsafeRow-backed layout must round-trip payload rows exactly (values,
  * nulls, insertion order), and a pre-v2 blob — the Kryo `(Map, Map)`
  * form every committed checkpoint before r20 holds — must decode through
  * the fallback path. The end-to-end restore story stays locked by
  * RestoreCompatSpec's pinned `changelog_join` fixture; this spec pins
  * the byte-level dispatch itself.
  */
class JoinStateCodecSpec extends SparkSpecBase {

  private val lType = StructType(Seq(
    StructField("ljk", LongType), StructField("lk", StringType),
    StructField("lv", DoubleType)))
  private val rType = StructType(Seq(
    StructField("rjk", LongType), StructField("rk", StringType),
    StructField("rv", DoubleType)))

  test("v2 codec round-trips both sides' payload rows in order") {
    spark // force session init so SparkEnv exists for the codec
    val codec = new ChangelogJoin.JoinStateCodec(lType, rType)
    val l = Seq(
      Seq[Any](1L, "a", 1.5),
      Seq[Any](2L, null, 2.5), // null payload field
      Seq[Any](1L, "c", -0.0))
    val r = Seq(Seq[Any](9L, "x", 99.25))
    val bytes = codec.encode(l, r)
    val (l2, r2) = codec.decode(bytes)
    assert(l2 == l, "left side must round-trip exactly, in order")
    assert(r2 == r)
    // empty sides round-trip too (a side can be drained mid-stream)
    val (le, re) = codec.decode(codec.encode(Nil, Nil))
    assert(le.isEmpty && re.isEmpty)
  }

  test("pre-v2 Kryo state blobs decode through the fallback path") {
    spark
    // the exact serializer Encoders.kryo resolves at runtime — these are
    // the bytes sitting in every checkpoint written before r20
    val conf = org.apache.spark.SparkEnv.get.conf
    val kryo =
      new org.apache.spark.serializer.KryoSerializer(conf).newInstance()
    val old: (Map[Any, Seq[Any]], Map[Any, Seq[Any]]) = (
      Map[Any, Seq[Any]]("a" -> Seq[Any](1L, "a", 1.5)),
      Map[Any, Seq[Any]]("x" -> Seq[Any](9L, "x", 2.0),
        "y" -> Seq[Any](9L, "y", 3.0)))
    val blob = {
      val bb = kryo.serialize(old)
      val out = new Array[Byte](bb.remaining())
      bb.get(out)
      out
    }
    val codec = new ChangelogJoin.JoinStateCodec(lType, rType)
    val (l, r) = codec.decode(blob)
    assert(l.toSet == old._1.values.toSet)
    assert(r.toSet == old._2.values.toSet)
  }
}
