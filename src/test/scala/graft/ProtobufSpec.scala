package graft

import graft.sources.ProtobufLite
import graft.sources.ProtobufLite._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The jar-free protobuf wire codec: golden byte vectors from the public
  * protobuf encoding documentation pin the wire format (so encode/decode
  * are anchored to the real spec, not merely to each other), round trips
  * cover every declared type, and malformed inputs yield NULL rows. */
class ProtobufSpec extends SparkSpecBase {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.split(" ").filter(_.nonEmpty).map(Integer.parseInt(_, 16).toByte)

  private val test1 = PbMessage(Seq(PbField(1, "a", PbInt32)))

  test("golden vectors from the protobuf encoding docs") {
    // Test1{a: 150} = 08 96 01 (the canonical example)
    val df = Seq(Tuple1(hex("08 96 01"))).toDF("b")
      .select(expr(s"pb_decode(b, '${render(test1)}')").as("m"))
    assert(df.select($"m.a").as[Int].head() == 150)

    // Test2{b: "testing"} = 12 07 74 65 73 74 69 6e 67
    val test2 = PbMessage(Seq(PbField(2, "b", PbString)))
    val s = Seq(Tuple1(hex("12 07 74 65 73 74 69 6e 67"))).toDF("b")
      .select(expr(s"pb_decode(b, '${render(test2)}')").as("m"))
    assert(s.select($"m.b").as[String].head() == "testing")

    // Test3{c: Test1{a: 150}} = 1a 03 08 96 01
    val test3 = PbMessage(Seq(PbField(3, "c", test1)))
    val n = Seq(Tuple1(hex("1a 03 08 96 01"))).toDF("b")
      .select(expr(s"pb_decode(b, '${render(test3)}')").as("m"))
    assert(n.select($"m.c.a").as[Int].head() == 150)

    // Test4{d: [3, 270, 86942]} packed = 22 06 03 8e 02 9e a7 05
    val test4 = PbMessage(Seq(PbField(4, "d", PbInt32, repeated = true)))
    val pk = Seq(Tuple1(hex("22 06 03 8e 02 9e a7 05"))).toDF("b")
      .select(expr(s"pb_decode(b, '${render(test4)}')").as("m"))
    assert(pk.select($"m.d").as[Seq[Int]].head() == Seq(3, 270, 86942))

    // int64 -1 is ten bytes of sign extension; sint64 -1 zigzags to 1
    val i64 = PbMessage(Seq(PbField(1, "v", PbInt64)))
    val neg = Seq(Tuple1(hex("08 ff ff ff ff ff ff ff ff ff 01"))).toDF("b")
      .select(expr(s"pb_decode(b, '${render(i64)}')").as("m"))
    assert(neg.select($"m.v").as[Long].head() == -1L)
    val s64 = PbMessage(Seq(PbField(1, "v", PbSInt64)))
    val zz = Seq(Tuple1(hex("08 01"))).toDF("b")
      .select(expr(s"pb_decode(b, '${render(s64)}')").as("m"))
    assert(zz.select($"m.v").as[Long].head() == -1L)

    // double 1.0 = fixed64 LE 09 00 00 00 00 00 00 f0 3f
    val d = PbMessage(Seq(PbField(1, "v", PbDouble)))
    val dv = Seq(Tuple1(hex("09 00 00 00 00 00 00 f0 3f"))).toDF("b")
      .select(expr(s"pb_decode(b, '${render(d)}')").as("m"))
    assert(dv.select($"m.v").as[Double].head() == 1.0)
  }

  test("encode produces the golden bytes") {
    val enc = Seq(Tuple1(150)).toDF("a")
      .select(expr(s"pb_encode(named_struct('a', a), '${render(test1)}')"))
      .as[Array[Byte]].head()
    assert(enc.toSeq == hex("08 96 01").toSeq)

    val test4 = PbMessage(Seq(PbField(4, "d", PbInt32, repeated = true)))
    val encP = Seq(Tuple1(Seq(3, 270, 86942))).toDF("d")
      .select(expr(s"pb_encode(named_struct('d', d), '${render(test4)}')"))
      .as[Array[Byte]].head()
    assert(encP.toSeq == hex("22 06 03 8e 02 9e a7 05").toSeq)
  }

  test("full-type round trip incl. nested message and repeated fields") {
    val meta = PbMessage(Seq(
      PbField(1, "k", PbString), PbField(2, "v", PbSInt32)))
    val msg = PbMessage(Seq(
      PbField(1, "id", PbInt64),
      PbField(2, "name", PbString),
      PbField(3, "score", PbDouble),
      PbField(4, "flag", PbBool),
      PbField(5, "tags", PbString, repeated = true),
      PbField(6, "nums", PbSInt64, repeated = true),
      PbField(7, "meta", meta),
      PbField(8, "raw", PbBytes),
      PbField(9, "f32", PbFloat),
      PbField(10, "fx", PbFixed64)))
    val row = Row(7L, "alpha", 2.5, true, Seq("x", "y"),
      Seq(-3L, 0L, 9L), Row("k1", -42), Array[Byte](1, 2, 3), 1.5f, 99L)
    val df = spark.createDataFrame(
      java.util.List.of(Row(row)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("m", sparkType(msg)))))
    val rt = df.select(expr(
      s"pb_decode(pb_encode(m, '${render(msg)}'), '${render(msg)}')")
      .as("r"))
    val out = rt.select($"r.id", $"r.name", $"r.score", $"r.flag",
      $"r.tags", $"r.nums", $"r.meta.k", $"r.meta.v", $"r.raw", $"r.f32",
      $"r.fx").head()
    assert(out.getLong(0) == 7L && out.getString(1) == "alpha" &&
      out.getDouble(2) == 2.5 && out.getBoolean(3) &&
      out.getSeq[String](4) == Seq("x", "y") &&
      out.getSeq[Long](5) == Seq(-3L, 0L, 9L) &&
      out.getString(6) == "k1" && out.getInt(7) == -42 &&
      out.getAs[Array[Byte]](8).toSeq == Seq[Byte](1, 2, 3) &&
      out.getFloat(9) == 1.5f && out.getLong(10) == 99L)
  }

  test("absent fields are NULL, unknown fields are skipped") {
    // bytes carry ONLY field 1; descriptor also declares field 2
    val two = PbMessage(Seq(
      PbField(1, "a", PbInt32), PbField(2, "b", PbString)))
    val r = Seq(Tuple1(hex("08 96 01"))).toDF("b")
      .select(expr(s"pb_decode(b, '${render(two)}')").as("m"))
      .select($"m.a", $"m.b").head()
    assert(r.getInt(0) == 150 && r.isNullAt(1))

    // bytes carry fields 1 (varint) + 99 (string) — 99 is undeclared
    val extra = hex("08 96 01") ++
      (Seq(0x9a, 0x06, 0x03).map(_.toByte) ++ "abc".getBytes) // tag 99<<3|2
    val r2 = Seq(Tuple1(extra)).toDF("b")
      .select(expr(s"pb_decode(b, '${render(test1)}')").as("m"))
      .select($"m.a").head()
    assert(r2.getInt(0) == 150)

    // unpacked repeated varints also decode (spec: parsers accept both)
    val test4 = PbMessage(Seq(PbField(4, "d", PbInt32, repeated = true)))
    val unpacked = Seq(Tuple1(hex("20 03 20 8e 02 20 9e a7 05"))).toDF("b")
      .select(expr(s"pb_decode(b, '${render(test4)}')").as("m"))
    assert(unpacked.select($"m.d").as[Seq[Int]].head() == Seq(3, 270, 86942))
  }

  test("malformed bytes decode to NULL, not task failure") {
    val bad = Seq(
      Tuple1(hex("08")), // truncated varint
      Tuple1(hex("12 07 74 65")), // length overruns buffer
      Tuple1(hex("0f 01"))) // wire type 7 is invalid
      .toDF("b")
      .select(expr(s"pb_decode(b, '${render(test1)}')").as("m"))
    assert(bad.where($"m".isNull).count() == 3)
  }

  test("descriptor render/parse round trip") {
    val meta = PbMessage(Seq(
      PbField(1, "k", PbString), PbField(2, "v", PbSInt32)))
    val msg = PbMessage(Seq(
      PbField(1, "id", PbInt64),
      PbField(5, "tags", PbString, repeated = true),
      PbField(7, "meta", meta)))
    assert(ProtobufLite.parse(render(msg)) == msg)
  }

  test("fromDescriptorSet parses a compiled .desc file") {
    val in = getClass.getResourceAsStream("/graft/fixtures/person.desc")
    val bytes =
      try in.readAllBytes()
      finally in.close()
    val expected = PbMessage(Seq(
      PbField(1, "name", PbString),
      PbField(2, "id", PbInt64),
      PbField(3, "scores", PbInt32, repeated = true),
      PbField(4, "addr", PbMessage(Seq(PbField(1, "city", PbString))))))
    // fully-qualified, simple-name suffix, and the nested message itself
    assert(ProtobufLite.fromDescriptorSet(bytes, "graft.Person") == expected)
    assert(ProtobufLite.fromDescriptorSet(bytes, "Person") == expected)
    assert(ProtobufLite.fromDescriptorSet(bytes, "Address") ==
      PbMessage(Seq(PbField(1, "city", PbString))))
    intercept[IllegalArgumentException] {
      ProtobufLite.fromDescriptorSet(bytes, "NoSuchMessage")
    }
    // the loaded descriptor drives a real encode/decode round trip
    val d = render(ProtobufLite.fromDescriptorSet(bytes, "Person"))
    val row = Seq(("ada", 7L, Seq(1, 2), "paris")).toDF("n", "i", "sc", "ci")
      .select(expr(
        s"""pb_decode(pb_encode(named_struct(
           |  'name', n, 'id', i, 'scores', sc,
           |  'addr', named_struct('city', ci)), '$d'), '$d')""".stripMargin)
        .as("m"))
      .select($"m.name", $"m.id", $"m.scores", $"m.addr.city")
      .as[(String, Long, Seq[Int], String)].head()
    assert(row == (("ada", 7L, Seq(1, 2), "paris")))
  }
}
