package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar string functions the reference has and Spark lacks
  * (SURVEY.md §2.8; reference inventory in BuiltInFunctionDefinitions.java).
  *
  * Everything here is COMPOSED from built-in Catalyst expressions, so the
  * whole function stays inside WholeStageCodegen — no UDF boundary, no
  * serialization, scale-safe. SQL names are registered as thin UDF wrappers
  * for convenience only; hot paths should use the Column API.
  *
  * Already present in Spark and therefore NOT re-implemented: STR_TO_MAP,
  * PARSE_URL, TRANSLATE(3), BTRIM, OVERLAY, ELT, REGEXP_*, URL_ENCODE/DECODE,
  * IS_VALID_UTF8 / MAKE_VALID_UTF8 (Spark 4), FORMAT_STRING (PRINTF).
  */
object StringGapFunctions {

  /** Flink SPLIT_INDEX(str, sep, idx): idx is 0-based, null when out of
    * bounds (reference: flink-table-runtime scalar SplitIndexFunction).
    * The separator is treated literally: full `Pattern.quote` semantics —
    * any embedded `\E` is neutralized (`\E` → `\E\\E\Q`), exactly what
    * the SQL-registered UDF path does via `Pattern.quote`, so the two
    * registered paths cannot drift.
    */
  def splitIndex(str: Column, sep: Column, idx: Column): Column = {
    val quoted =
      concat(lit("\\Q"), regexp_replace(sep, lit("\\\\E"), lit("\\\\E\\\\\\\\E\\\\Q")), lit("\\E"))
    get(call_function("split", str, quoted), idx)
  }

  /** IPv4 dotted-quad → numeric (reference scalar INET_ATON). Null for
    * malformed input (wrong arity, non-digits, octet > 255) — validated
    * before the cast so ANSI mode can't throw.
    */
  def inetAton(ip: Column): Column = {
    val p = call_function("split", ip, lit("\\."))
    val shapeOk = size(p) === 4 && forall(p, x => x.rlike("^\\d{1,3}$"))
    val nums = transform(p, x => x.cast("long"))
    when(shapeOk && forall(nums, v => v <= 255),
      element_at(nums, 1) * 16777216L +
        element_at(nums, 2) * 65536L +
        element_at(nums, 3) * 256L +
        element_at(nums, 4))
  }

  /** Numeric → IPv4 dotted-quad (reference scalar INET_NTOA). */
  def inetNtoa(n: Column): Column =
    concat_ws(".",
      shiftright(n, 24).bitwiseAND(255).cast("string"),
      shiftright(n, 16).bitwiseAND(255).cast("string"),
      shiftright(n, 8).bitwiseAND(255).cast("string"),
      n.bitwiseAND(255).cast("string"))

  /** JSON_QUOTE: escape a string and wrap it in double quotes, per the JSON
    * spec. Composed as to_json of a 1-element array with the brackets
    * stripped — the battle-tested Jackson escaper, still codegen-friendly.
    */
  def jsonQuote(s: Column): Column = {
    val j = to_json(array(s))
    when(s.isNotNull, substring(j, lit(2), length(j) - 2))
  }

  /** JSON_UNQUOTE: parse a JSON string literal back to its value; null if
    * the input is not a valid JSON string.
    */
  def jsonUnquote(s: Column): Column =
    get(from_json(concat(lit("["), s, lit("]")), lit("array<string>")), lit(0))

  def register(spark: SparkSession): Unit = {
    // SQL-name convenience wrappers (UDF-boundary; Column API is the fast path)
    spark.udf.register("split_index",
      (s: String, sep: String, i: Int) =>
        if (s == null || sep == null) null
        else {
          val parts = s.split(java.util.regex.Pattern.quote(sep), -1)
          if (i >= 0 && i < parts.length) parts(i) else null
        })
    spark.udf.register("inet_aton", (ip: String) => {
      if (ip == null) null
      else {
        val p = ip.split("\\.", -1)
        if (p.length != 4) null
        else
          try {
            val o = p.map(_.toLong)
            if (o.exists(x => x < 0 || x > 255)) null
            else java.lang.Long.valueOf(
              (o(0) << 24) | (o(1) << 16) | (o(2) << 8) | o(3))
          } catch { case _: NumberFormatException => null }
      }
    })
    spark.udf.register("inet_ntoa", (n: java.lang.Long) =>
      if (n == null) null
      else s"${(n >> 24) & 255}.${(n >> 16) & 255}.${(n >> 8) & 255}.${n & 255}")
  }
}
