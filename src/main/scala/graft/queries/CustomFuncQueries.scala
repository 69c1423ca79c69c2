package graft.queries

import graft.Tables
import graft.functions.{GraftFunctions, StringGapFunctions => SG}
import org.apache.spark.sql.functions._

/** Queries exercising the graft custom functions (SURVEY.md §2.8 gaps):
  * SPLIT_INDEX, INET_ATON/NTOA, JSON_QUOTE/UNQUOTE, the BITMAP_* family,
  * JSON_OBJECTAGG/ARRAYAGG — plus Spark built-ins that close reference gaps
  * (STR_TO_MAP, PARSE_URL).
  */
object CustomFuncQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_split_index",
      (s, dir) => {
        Tables.part(s, dir).select(
          col("p_partkey"),
          SG.splitIndex(col("p_type"), lit(" "), lit(1)).as("word2"),
          SG.splitIndex(col("p_type"), lit(" "), lit(9)).as("oob"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               str_split(p_type, ' ')[2] AS word2,
               str_split(p_type, ' ')[10] AS oob
        FROM part ORDER BY p_partkey
      """.trim)),

    QueryDef(
      "q_inet",
      (s, dir) => {
        val n = (col("p_partkey") * lit(2654435761L)) % lit(4294967296L)
        Tables.part(s, dir).select(
          col("p_partkey"),
          SG.inetNtoa(n).as("ip"),
          SG.inetAton(SG.inetNtoa(n)).as("back"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        WITH t AS (SELECT p_partkey,
                          (p_partkey * 2654435761) % 4294967296 AS n
                   FROM part)
        SELECT p_partkey,
               (n // 16777216) % 256 || '.' || (n // 65536) % 256 || '.' ||
               (n // 256) % 256 || '.' || n % 256 AS ip,
               n AS back
        FROM t ORDER BY p_partkey
      """.trim)),

    QueryDef(
      "q_json_quote",
      (s, dir) => {
        Tables.part(s, dir).select(
          col("p_partkey"),
          SG.jsonQuote(col("p_name")).as("quoted"),
          SG.jsonUnquote(SG.jsonQuote(col("p_name"))).as("roundtrip"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
               CAST(to_json(p_name) AS VARCHAR) AS quoted,
               p_name AS roundtrip
        FROM part ORDER BY p_partkey
      """.trim)),

    // Built-in STR_TO_MAP closes the reference gap directly.
    QueryDef(
      "q_str_to_map",
      (s, dir) => {
        Tables.part(s, dir).select(
          col("p_partkey"),
          element_at(
            str_to_map(
              concat(lit("size="), col("p_size"), lit(",key="), col("p_partkey")),
              lit(","), lit("=")),
            "key").as("key_val"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey, CAST(p_partkey AS VARCHAR) AS key_val
        FROM part ORDER BY p_partkey
      """.trim)),

    // Built-in PARSE_URL closes the reference gap directly.
    QueryDef(
      "q_parse_url",
      (s, dir) => {
        val url = concat(lit("https://h"), col("source"),
          lit(".example.com/p/"), col("doc_id"),
          lit("?q="), col("n_chars"), lit("&x=1"))
        Tables.documents(s, dir).select(
          col("doc_id"),
          parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"),
          parse_url(url, lit("QUERY"), lit("q")).as("q_param"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id,
                          'https://h' || source || '.example.com/p/' || doc_id ||
                          '?q=' || n_chars || '&x=1' AS url
                   FROM documents)
        SELECT doc_id,
               regexp_extract(url, '^https?://([^/?]+)', 1) AS host,
               regexp_extract(url, '^https?://[^/?]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param
        FROM t ORDER BY doc_id
      """.trim)),

    // Bitmap distinct-count: cardinality(bitmap_agg(x)) ≡ COUNT(DISTINCT x).
    QueryDef(
      "q_bitmap_distinct",
      (s, dir) => {
        GraftFunctions.registerAll(s)
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(expr("bitmap_cardinality(bitmap_agg(l_partkey))").as("nd_part"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """.trim)),

    // Bitmap set algebra across two pre-aggregated bitmaps.
    QueryDef(
      "q_bitmap_setops",
      (s, dir) => {
        GraftFunctions.registerAll(s)
        val l = Tables.lineitem(s, dir)
        val a = l.where(col("l_returnflag") === "A")
          .agg(expr("bitmap_agg(l_partkey)").as("ba"))
        val r = l.where(col("l_returnflag") === "R")
          .agg(expr("bitmap_agg(l_partkey)").as("br"))
        a.crossJoin(r).select(
          expr("bitmap_cardinality(bitmap_and(ba, br))").as("and_card"),
          expr("bitmap_cardinality(bitmap_or(ba, br))").as("or_card"),
          expr("bitmap_cardinality(bitmap_xor(ba, br))").as("xor_card"),
          expr("bitmap_cardinality(bitmap_andnot(ba, br))").as("andnot_card"))
      },
      Some("""
        WITH a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
             r AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R')
        SELECT
          (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM r)) AS and_card,
          (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM r)) AS or_card,
          (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM r))
            - (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM r)) AS xor_card,
          (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM r)) AS andnot_card
      """.trim)),

    QueryDef(
      "q_json_objectagg",
      (s, dir) => {
        GraftFunctions.registerAll(s)
        Tables.supplier(s, dir)
          .groupBy(col("s_nationkey"))
          .agg(expr("json_objectagg(CAST(s_suppkey AS STRING), s_name)")
            .as("obj"))
          .orderBy(col("s_nationkey"))
      },
      Some("""
        SELECT s_nationkey,
               '{' || string_agg(
                 '"' || CAST(s_suppkey AS VARCHAR) || '":"' || s_name || '"', ','
                 ORDER BY '"' || CAST(s_suppkey AS VARCHAR) || '":"' || s_name || '"')
               || '}' AS obj
        FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
      """.trim)),

    QueryDef(
      "q_json_arrayagg",
      (s, dir) => {
        GraftFunctions.registerAll(s)
        Tables.supplier(s, dir)
          .groupBy(col("s_nationkey"))
          .agg(expr("json_arrayagg(s_name)").as("arr"))
          .orderBy(col("s_nationkey"))
      },
      Some("""
        SELECT s_nationkey,
               '[' || string_agg('"' || s_name || '"', ',' ORDER BY s_name)
               || ']' AS arr
        FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
      """.trim))
  )
}
