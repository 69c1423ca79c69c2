package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** JSON_OBJECTAGG / JSON_ARRAYAGG (SURVEY.md §2.8 JSON pack; reference:
  * BuiltInFunctionDefinitions JSON_OBJECTAGG/JSON_ARRAYAGG).
  *
  * Distributed aggregation has no stable input order, so both aggs emit in
  * SORTED key/value order — deterministic across partitionings and retries
  * (documented delta vs the reference, which preserves per-key arrival
  * order that is itself nondeterministic under parallelism).
  */
object JsonAggFunctions {

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  // Kryo buffers: orders of magnitude cheaper than java serialization for
  // the spill/shuffle boundary (ObjectHashAggregate only serializes there).
  private implicit val listEnc: Encoder[List[(String, String)]] =
    Encoders.kryo[List[(String, String)]]
  private implicit val slistEnc: Encoder[List[String]] =
    Encoders.kryo[List[String]]

  /** Total order on nullable strings: null sorts before every value, so the
    * duplicate-key winner is independent of partition merge order. */
  private val nullsFirst: Ordering[String] =
    (a: String, b: String) =>
      (a, b) match {
        case (null, null) => 0
        case (null, _) => -1
        case (_, null) => 1
        case (x, y) => x.compareTo(y)
      }

  /** JSON_OBJECTAGG(k, v) → '{"k1":"v1",…}' with entries sorted by raw key
    * (then value); null values become JSON null; duplicate keys keep the
    * smallest value under a null-first total order (deterministic across
    * partitionings and retries).
    */
  val objectAgg: Aggregator[(String, String), List[(String, String)], String] =
    new Aggregator[(String, String), List[(String, String)], String] {
      def zero: List[(String, String)] = Nil
      def reduce(b: List[(String, String)], kv: (String, String)): List[(String, String)] =
        if (kv._1 == null) b else kv :: b
      def merge(a: List[(String, String)], b: List[(String, String)]): List[(String, String)] =
        a ::: b
      def finish(b: List[(String, String)]): String =
        b.groupBy(_._1).toSeq
          .map { case (k, vs) => k -> vs.map(_._2).min(nullsFirst) }
          .sortBy(_._1)
          .map { case (k, v) =>
            val vj = if (v == null) "null" else "\"" + escape(v) + "\""
            "\"" + escape(k) + "\":" + vj
          }
          .mkString("{", ",", "}")
      def bufferEncoder: Encoder[List[(String, String)]] = listEnc
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** JSON_ARRAYAGG(v) → '["v1","v2",…]' with values sorted (nulls dropped,
    * matching the reference's ABSENT ON NULL default).
    */
  val arrayAgg: Aggregator[String, List[String], String] =
    new Aggregator[String, List[String], String] {
      def zero: List[String] = Nil
      def reduce(b: List[String], v: String): List[String] =
        if (v == null) b else v :: b
      def merge(a: List[String], b: List[String]): List[String] = a ::: b
      def finish(b: List[String]): String =
        b.sorted.map(v => "\"" + escape(v) + "\"").mkString("[", ",", "]")
      def bufferEncoder: Encoder[List[String]] = slistEnc
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("json_objectagg", udaf(objectAgg))
    spark.udf.register("json_arrayagg", udaf(arrayAgg))
  }
}
