package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Collection / misc scalar functions the reference has and Spark lacks
  * (closing the last inventory deltas against
  * BuiltInFunctionDefinitions.java: JSON_STRING, MAP_UNION, ARRAY_SLICE,
  * RAND_INTEGER). Like [[StringGapFunctions]], everything is COMPOSED
  * from built-in Catalyst expressions — no UDF boundary on the Column
  * API path, so the functions stay inside WholeStageCodegen.
  *
  * Already present in Spark and therefore NOT re-implemented: TYPEOF,
  * IFNULL, REGEXP_INSTR, REGEXP_SUBSTR, REGEXP_COUNT, ARRAY_MIN/MAX,
  * MAP_ENTRIES/KEYS/VALUES/FROM_ARRAYS (exercised by `q_func_gap3` /
  * `FunctionSpec` so coverage is demonstrated, not assumed).
  */
object CollectionGapFunctions {

  /** JSON_STRING(value): serialize ANY SQL value to its JSON text
    * (reference: flink-table-runtime JsonStringFunction — string in,
    * `"s"` out; numerics/booleans unquoted; arrays/rows nested). NULL in,
    * NULL out (the reference's null handling). Composed as `to_json` of
    * a 1-element array with the brackets stripped, so Jackson does the
    * escaping and every input type works. */
  def jsonString(c: Column): Column = {
    val j = to_json(array(c))
    when(c.isNotNull, substring(j, lit(2), length(j) - 2))
  }

  /** MAP_UNION(m1, …, mN): merge maps left to right, later entries
    * overriding earlier ones on key clashes (reference:
    * flink-table-runtime MapUnionFunction; Spark's `map_concat` instead
    * THROWS on duplicates under the default dedup policy). NULL if any
    * argument is NULL, as in the reference. Earlier maps are filtered to
    * the keys the next map does NOT have, then concatenated — pure
    * expression composition, no dedup-policy session conf involved. */
  def mapUnion(ms: Column*): Column = {
    require(ms.nonEmpty, "MAP_UNION needs at least one map")
    val merged = ms.reduceLeft { (a, b) =>
      map_concat(map_filter(a, (k, _) => !map_contains_key(b, k)), b)
    }
    when(ms.map(_.isNotNull).reduce(_ && _), merged)
  }

  /** ARRAY_SLICE(array, start [, end]): 1-based inclusive slice;
    * negative indices count from the end (-1 = last element); an omitted
    * end means "through the last element"; a start past the end or an
    * empty intersection yields an empty array; NULL array (or NULL
    * bounds) → NULL (reference: flink-table-runtime ArraySliceFunction).
    * Maps onto Spark's `slice(arr, start, length)` with the bounds
    * normalized and clamped first. */
  def arraySlice(arr: Column, start: Column, end: Column): Column = {
    val n = size(arr)
    def norm(i: Column): Column = when(i < 0, n + i + lit(1)).otherwise(i)
    val s = greatest(norm(start), lit(1))
    val e = least(norm(end), n)
    when(arr.isNotNull && start.isNotNull && end.isNotNull,
      // slice(arr, 1, 0) is the element-typed empty array
      when(s > e, slice(arr, lit(1), lit(0)))
        .otherwise(slice(arr, s, e - s + lit(1))))
  }

  /** ARRAY_SLICE(array, start): through the end of the array. */
  def arraySlice(arr: Column, start: Column): Column =
    arraySlice(arr, start, lit(-1))

  /** RAND_INTEGER([seed, ] bound): uniform int in [0, bound)
    * (reference: BuiltInFunctionDefinitions.RAND_INTEGER). The seeded
    * form is reproducible per partition, like Spark's seeded `rand`. */
  def randInteger(bound: Column): Column =
    floor(rand() * bound).cast("int")

  def randInteger(seed: Long, bound: Column): Column =
    floor(rand(seed) * bound).cast("int")

  def register(spark: SparkSession): Unit = {
    // SQL-name wrappers (UDF boundary; the Column API is the fast path).
    spark.udf.register("json_string", (s: String) =>
      if (s == null) null
      else {
        val quoted = com.fasterxml.jackson.databind.json.JsonMapper
          .builder().build().writeValueAsString(s)
        quoted
      })
    spark.udf.register("map_union",
      (a: Map[String, String], b: Map[String, String]) =>
        if (a == null || b == null) null else a ++ b)
    spark.udf.register("array_slice",
      (a: Seq[Long], s: Int, e: Int) =>
        if (a == null) null
        else {
          val n = a.length
          val s1 = math.max(if (s < 0) n + s + 1 else s, 1)
          val e1 = math.min(if (e < 0) n + e + 1 else e, n)
          if (s1 > e1) Seq.empty[Long] else a.slice(s1 - 1, e1)
        })
  }
}
