package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.types._

/** Flink-name compatibility registrations for built-in functions the
  * reference spells differently from Spark (SURVEY.md §2.8; the full
  * public inventory is the reference's docs/data/sql_functions.yml and
  * BuiltInFunctionDefinitions.java).
  *
  * Every function here is COMPOSED from Spark's own builtin expression
  * builders (`FunctionRegistry.builtin`), so the registered name resolves
  * to a pure Catalyst expression tree — full WholeStageCodegen, no UDF
  * boundary, scale-identical to calling the Spark spelling directly. A
  * migrating user's `SELECT TO_BASE64(s), WEEK(d), SHA256(x)` runs
  * unchanged through `FlinkSql.sql` or plain `spark.sql`.
  *
  * Names Spark already has with matching semantics (ABS … YEAR, ~170 of
  * the catalog) are intentionally NOT re-registered; see
  * [[graft.sql.FunctionCatalog]] for the audited name-by-name map and the
  * documented semantic deltas (e.g. Flink SPLIT's literal delimiter vs
  * Spark's regex — deliberately not shadowed).
  */
object FlinkNameCompat {

  private def b(name: String): Seq[Expression] => Expression =
    FunctionRegistry.builtin
      .lookupFunctionBuilder(FunctionIdentifier(name))
      .getOrElse(throw new IllegalStateException(s"missing builtin: $name"))

  private def fn(name: String, args: Expression*): Expression = b(name)(args)

  /** Builtin aggregate builders return the bare AggregateFunction; when
    * nested inside a composed tree the analyzer won't wrap it, so wrap
    * here.
    */
  private def aggFn(name: String, args: Expression*): Expression =
    b(name)(args) match {
      case a: AggregateFunction => a.toAggregateExpression()
      case e => e
    }

  private def lit(v: Any): Expression = Literal(v)
  private def nullOf(dt: DataType): Expression = Literal.create(null, dt)

  private def lambda1(f: Expression => Expression, v: String): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq(v))
    LambdaFunction(f(x), Seq(x))
  }

  /** Strip the SQL/JSON path mode prefix (`lax `/`strict `) the reference
    * accepts; `get_json_object` wants the bare `$…` path. Constant-folds
    * for the (ubiquitous) literal-path case.
    */
  private def stripMode(path: Expression): Expression =
    fn("regexp_replace", path, lit("^(?i)(lax|strict)\\s+"), lit(""))

  /** JSON subtree text at `path`, or the whole (trimmed) value without. */
  private def jsonAt(cs: Seq[Expression]): Expression =
    if (cs.size > 1) fn("get_json_object", cs(0), stripMode(cs(1)))
    else fn("btrim", cs(0))

  private def isCompound(s: Expression): Expression =
    fn("rlike", s, lit("^\\s*[\\[{]"))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")

    // -------------------------------------------------- plain renames
    put("week")(cs => fn("weekofyear", cs: _*))
    put("array_concat")(cs => fn("concat", cs: _*))
    put("array_reverse")(cs => fn("reverse", cs: _*))
    // statement-start timestamp is Spark's model; the reference stamps per
    // row — documented delta (monotonic within a statement either way)
    put("current_row_timestamp")(_ => fn("current_timestamp"))
    put("group_id")(_ => fn("grouping_id"))

    // -------------------------------------------------- string/binary
    // Flink FROM_BASE64 → STRING, TO_BASE64 accepts STRING or BYTES
    put("from_base64")(cs => fn("decode", fn("unbase64", cs(0)), lit("UTF-8")))
    put("to_base64")(cs => fn("base64", Cast(cs(0), BinaryType)))
    for (bits <- Seq(224, 256, 384, 512))
      put(s"sha$bits")(cs => fn("sha2", Cast(cs(0), BinaryType), lit(bits)))
    put("is_alpha")(cs => fn("rlike", cs(0), lit("^[A-Za-z]+$")))
    put("is_digit")(cs => fn("rlike", cs(0), lit("^[0-9]+$")))
    // the reference's IS_DECIMAL = "new BigDecimal(str) parses" (plain or
    // exponent notation)
    put("is_decimal")(cs => fn("rlike", cs(0),
      lit("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$")))

    // -------------------------------------------------- numeric
    // TRUNCATE(n[, d]): toward zero at d decimal places (DOUBLE face; the
    // reference's DECIMAL-typed variant keeps scale — documented delta)
    put("truncate") { cs =>
      val x = Cast(cs(0), DoubleType)
      val d = if (cs.size > 1) cs(1) else lit(0)
      val p = fn("power", lit(10.0), Cast(d, DoubleType))
      fn("*", fn("signum", x),
        fn("/", Cast(fn("floor", fn("*", fn("abs", x), p)), DoubleType), p))
    }

    // -------------------------------------------------- temporal
    // CONVERT_TZ('1970-01-01 00:00:00', 'UTC', 'America/New_York'):
    // wall-clock string re-zoned, string out — the reference's signature
    put("convert_tz")(cs => fn("date_format",
      fn("convert_timezone", cs(1), cs(2), fn("to_timestamp_ntz", cs(0))),
      lit("yyyy-MM-dd HH:mm:ss")))

    // TO_TIMESTAMP_LTZ(numeric, 0|3): epoch seconds/millis → timestamp —
    // the reference's primary spelling, which Spark's same-named
    // string-parsing function doesn't cover. A literal integer second
    // argument selects the epoch path; anything else (string [, format])
    // falls through to Spark's parser form. The reference's 1-arg
    // NUMERIC variant (= millis) is not distinguishable from the string
    // form at registration time — documented delta, pass the precision.
    put("to_timestamp_ltz") { cs =>
      cs match {
        case Seq(x, Literal(p: Int, _)) if p == 0 || p == 3 =>
          if (p == 0) fn("timestamp_seconds", Cast(x, LongType))
          else fn("timestamp_millis", Cast(x, LongType))
        case _ => fn("to_timestamp_ltz", cs: _*)
      }
    }

    // -------------------------------------------------- collections
    // ELEMENT(arr): the sole element of a singleton array; NULL when empty
    // (the reference throws on >1 — we return NULL, documented delta)
    put("element")(cs => fn("get", cs(0),
      fn("if", fn("=", fn("size", cs(0)), lit(1)), lit(0), lit(-1))))

    // COLLECT(x) → multiset as the engine's map<value, count> convention
    // (SURVEY §1.2; same shape q_multiset oracles). Two aggregates in the
    // tree collapse to one physical collect_list.
    put("collect") { cs =>
      val l = aggFn("collect_list", cs(0))
      val entries = fn("transform", fn("array_distinct", l),
        lambda1(v => fn("struct", v,
          fn("size", fn("filter", l, lambda1(y => fn("=", y, v), "y")))), "v"))
      fn("map_from_entries", entries)
    }

    // CURRENT_WATERMARK(c): the batch face — no watermark has been
    // emitted, so NULL (the reference's own no-watermark-yet answer).
    // Streaming introspection: streaming/WatermarkTracker.currentWatermark.
    put("current_watermark")(_ => nullOf(TimestampType))

    // OBJECT_OF('fqcn', k1, v1, …): structured-type constructor — the
    // class name is type metadata the engine's struct model doesn't need
    put("object_of")(cs => fn("named_struct", cs.drop(1): _*))
    // OBJECT_UPDATE(obj, k1, v1, …): field replacement; keys must be
    // string literals (the reference requires compile-time keys too)
    put("object_update") { cs =>
      require(cs.size >= 3 && cs.size % 2 == 1,
        "OBJECT_UPDATE(obj, key, value, …) needs an odd argument count")
      cs.drop(1).grouped(2).foldLeft(cs.head) {
        case (acc, Seq(Literal(k, StringType), v)) =>
          UpdateFields(acc, k.toString, v)
        case (_, other) => throw new IllegalArgumentException(
          s"OBJECT_UPDATE keys must be string literals, got: ${other.head}")
      }
    }

    // SPLIT with the reference's LITERAL delimiter semantics (Spark's
    // same-named function takes a regex). The FlinkSql entry rewrites
    // bare SPLIT( onto this name so Flink scripts keep their meaning;
    // the quoting is the same \Q…\E neutralization StringGapFunctions
    // uses for SPLIT_INDEX.
    put("split_literal") { cs =>
      val quoted = fn("concat", lit("\\Q"),
        fn("regexp_replace", cs(1), lit("\\\\E"), lit("\\\\E\\\\\\\\E\\\\Q")),
        lit("\\E"))
      fn("split", cs(0), quoted)
    }

    // RAND_INTEGER([seed,] bound): uniform int in [0, bound) — SQL face
    // of CollectionGapFunctions.randInteger
    put("rand_integer") { cs =>
      // the unseeded form gets its seed here rather than from the
      // analyzer's ResolveRandomSeed — downstream expression builders
      // (floor) assert resolved arguments, and an UnresolvedSeed isn't.
      // Same semantics as Spark's own rand(): one seed per query, varies
      // per row/partition.
      val (r, bound) =
        if (cs.size > 1) (fn("rand", cs(0)), cs(1))
        else (fn("rand", Literal(scala.util.Random.nextLong())), cs(0))
      Cast(fn("floor", fn("*", r, Cast(bound, DoubleType))), IntegerType)
    }

    // -------------------------------------------------- JSON pack
    // JSON_QUOTE / JSON_UNQUOTE: SQL faces of the StringGapFunctions
    // compositions (Jackson escaping via to_json, brackets stripped)
    put("json_quote") { cs =>
      val j = fn("to_json", fn("array", cs(0)))
      fn("if", fn("isnotnull", cs(0)),
        fn("substr", j, lit(2), fn("-", fn("length", j), lit(2))),
        nullOf(StringType))
    }
    put("json_unquote")(cs => fn("get",
      fn("from_json", fn("concat", lit("["), cs(0), lit("]")),
        lit("array<string>")), lit(0)))

    // JSON('…'): marks a string as pre-formed JSON inside JSON_OBJECT /
    // JSON_ARRAY — a parsed variant serializes as raw JSON, not a quoted
    // string, which is exactly the reference's insertion semantics
    put("json")(cs => fn("parse_json", cs(0)))
    put("json_exists")(cs => fn("isnotnull", jsonAt(cs)))
    // JSON_VALUE: scalars only (default NULL ON ERROR / on non-scalar)
    put("json_value") { cs =>
      val r = jsonAt(cs)
      fn("if", isCompound(r), nullOf(StringType), r)
    }
    // JSON_QUERY: objects/arrays only (default WITHOUT WRAPPER, NULL else)
    put("json_query") { cs =>
      val r = jsonAt(cs)
      fn("if", isCompound(r), r, nullOf(StringType))
    }
    // JSON_LENGTH: array size | object key count | 1 for a scalar
    put("json_length") { cs =>
      val t = jsonAt(cs)
      fn("coalesce",
        fn("json_array_length", t),
        fn("size", fn("json_object_keys", t)),
        fn("if", fn("isnotnull", fn("try_parse_json", t)),
          lit(1), nullOf(IntegerType)))
    }
    // JSON_OBJECT(k, v, …): the reference's default NULL ON NULL keeps
    // null members; the _absent variant is the ABSENT ON NULL clause
    // (FlinkSql rewrites the KEY … VALUE … syntax onto these names)
    put("json_object")(cs => fn("to_json", fn("named_struct", cs: _*),
      fn("map", lit("ignoreNullFields"), lit("false"))))
    put("json_object_absent")(cs => fn("to_json", fn("named_struct", cs: _*)))
    // JSON_ARRAY(…): default ABSENT ON NULL drops null elements
    put("json_array")(cs => fn("to_json",
      fn("filter", fn("array", cs: _*), lambda1(v => fn("isnotnull", v), "v"))))
    put("json_array_null")(cs => fn("to_json", fn("array", cs: _*)))
    // x IS JSON [VALUE|SCALAR|ARRAY|OBJECT] predicates (FlinkSql rewrites
    // the postfix syntax onto these names)
    def validJson(e: Expression): Expression =
      fn("isnotnull", fn("try_parse_json", e))
    put("is_json_value")(cs => validJson(cs(0)))
    put("is_json_object")(cs => fn("and", validJson(cs(0)),
      fn("rlike", cs(0), lit("^\\s*\\{"))))
    put("is_json_array")(cs => fn("and", validJson(cs(0)),
      fn("rlike", cs(0), lit("^\\s*\\["))))
    put("is_json_scalar")(cs => fn("and", validJson(cs(0)),
      fn("not", fn("rlike", cs(0), lit("^\\s*[\\[{]")))))
  }
}
