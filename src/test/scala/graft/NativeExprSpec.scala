package graft

import graft.functions.InetAtonUtil
import graft.operators.MatchRecognize
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Specs for the native codegen Expression tier and MATCH_RECOGNIZE-lite. */
class NativeExprSpec extends SparkSpecBase {

  import spark.implicits._

  test("inet_aton_native: parse semantics incl. malformed inputs") {
    def p(s: String): java.lang.Long = InetAtonUtil.parse(UTF8String.fromString(s))
    assert(p("1.2.3.4") == 16909060L)
    assert(p("0.0.0.0") == 0L)
    assert(p("255.255.255.255") == 4294967295L)
    assert(p("256.1.1.1") == null)
    assert(p("1.2.3") == null)
    assert(p("1.2.3.4.5") == null)
    assert(p("a.b.c.d") == null)
    assert(p("1..2.3") == null)
    assert(p("") == null)
  }

  test("inet_aton_native runs inside WholeStageCodegen via extensions") {
    // parquet-backed input so the projection isn't constant-folded away
    val df = Tables.nation(spark, sf)
      .select(concat(col("n_nationkey").cast("string"), lit(".0.0.1")).as("ip"))
      .select(col("ip"), expr("inet_aton_native(ip)").as("n"))
    // the expression must not break the codegen span (no UDF boundary):
    // the Project evaluating it must sit inside a WholeStageCodegen stage
    // (rendered as the "*(n)" prefix)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [ip"), s"codegen broken:\n$plan")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("0.0.0.1") == 1L)
    assert(got("1.0.0.1") == (1L << 24) + 1L)
    // and the literal path agrees with interpreted eval
    val lit3 = spark.sql("SELECT inet_aton_native('255.1.2.3')").head().getLong(0)
    assert(lit3 == 255L * (1L << 24) + (1L << 16) + (2L << 8) + 3L)
  }

  test("dot_fixed_native / dot_double_native: codegen, parity, nulls") {
    // Parity with the HOF spelling they replaced, on real embedding rows.
    val emb = Tables.embeddings(spark, sf).limit(64)
      .select(col("vec_id"), col("embedding"))
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) =>
        floor(x.cast("double") * y.cast("double") * lit(1e12)).cast("long")),
      lit(0L), (acc, v) => acc + v).cast("double") / lit(1e12)
    val cmp = emb.select(
      expr("dot_fixed_native(embedding, embedding)").as("nat"),
      hof.as("hof"))
    assert(cmp.where(col("nat") =!= col("hof")).count() == 0)
    // The whole projection stays inside one WholeStageCodegen span.
    val plan = cmp.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"codegen broken:\n$plan")
    // Null semantics: null array, length mismatch, null element → null.
    val r = spark.sql(
      """SELECT
        |  dot_double_native(CAST(NULL AS ARRAY<FLOAT>),
        |                    array(CAST(1.0 AS FLOAT))) AS a,
        |  dot_double_native(array(CAST(1.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS b,
        |  dot_double_native(array(CAST(NULL AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT))) AS c,
        |  dot_double_native(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |                    array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS d
        |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 23.0)
  }

  test("MatchRecognize: falling run then rise, skip past last row") {
    val rows = Seq(
      // key 1: 5 4 3 6 → match (start t1, end t4, n_down=2, depth 5-3=2)
      (1L, 1L, 5.0), (1L, 2L, 4.0), (1L, 3L, 3.0), (1L, 4L, 6.0),
      // then 6 6 2 7 → plateau breaks, then 6>2>? 2 is one fall → match
      (1L, 5L, 6.0), (1L, 6L, 2.0), (1L, 7L, 7.0),
      // key 2: rise only → no match
      (2L, 1L, 1.0), (2L, 2L, 2.0))
      .toDF("k", "t", "v")
    val out = MatchRecognize.fallingRunThenRise(rows, "k", "t", "v")
      .orderBy("k", "start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 4L, 2L, 2.0),
      (1L, 5L, 7L, 1L, 4.0)))
  }
}
