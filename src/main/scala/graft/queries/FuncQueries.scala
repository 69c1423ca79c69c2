package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Scalar function packs (SURVEY.md §2.8) + Correlate/UNNEST (§2.2).
  * Everything here is a Spark built-in (codegen'd, stays inside
  * WholeStageCodegen); the custom gap functions live in graft.functions.
  */
object FuncQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_string_funcs",
      (s, dir) => {
        Tables.part(s, dir).select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 5).as("sub5"),
          length(col("p_name")).as("len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "#").as("rp"),
          regexp_replace(col("p_name"), " ", "_").as("und"),
          substring(col("p_name"), 1, 3).as("l3"),
          reverse(col("p_brand")).as("rev"),
          repeat(col("p_type"), 2).as("rep2"),
          instr(col("p_name"), "a").as("pos_a"),
          ascii(col("p_brand")).as("asc0"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey,
          upper(p_name) AS up, lower(p_brand) AS lo,
          substring(p_name, 1, 5) AS sub5, length(p_name) AS len,
          concat_ws('-', p_brand, p_type) AS bt,
          lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '#') AS rp,
          replace(p_name, ' ', '_') AS und,
          substring(p_name, 1, 3) AS l3,
          reverse(p_brand) AS rev, repeat(p_type, 2) AS rep2,
          strpos(p_name, 'a') AS pos_a, ascii(p_brand) AS asc0
        FROM part ORDER BY p_partkey
      """.trim)),

    // REGEXP pack (reference string family: REGEXP_COUNT / REGEXP_EXTRACT
    // / REGEXP_EXTRACT_ALL / REGEXP_REPLACE / RLIKE) over documents text.
    QueryDef(
      "q_regexp_funcs",
      (s, dir) => {
        Tables.documents(s, dir).select(
          col("doc_id"),
          regexp_count(col("text"), lit("\\bthe\\b")).as("n_the"),
          regexp_extract(col("text"), "([A-Za-z]+)ing", 1).as("first_ing"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .as("n_nums"),
          regexp_replace(col("text"), "[aeiou]", "").as("no_vowels"),
          col("text").rlike("data").as("has_data"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '\bthe\b')) AS INT) AS n_the,
          regexp_extract(text, '([A-Za-z]+)ing', 1) AS first_ing,
          CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_nums,
          regexp_replace(text, '[aeiou]', '', 'g') AS no_vowels,
          regexp_matches(text, 'data') AS has_data
        FROM documents ORDER BY doc_id
      """.trim)),

    // Remaining reference string rows that ARE Spark built-ins — exercised
    // against DuckDB equivalents (OVERLAY / TRANSLATE3 / BTRIM / ELT /
    // PRINTF) and constant-oracled where DuckDB lacks the function
    // (URL_ENCODE / URL_DECODE round trip, UTF8 validators).
    QueryDef(
      "q_string_gap2",
      (s, dir) => {
        Tables.nation(s, dir).select(
          col("n_nationkey"),
          expr("overlay(n_name placing 'XX' from 2)").as("ov"),
          translate(col("n_name"), "AEI", "aei").as("tr"),
          expr("btrim(concat('**', n_name, '**'), '*')").as("bt"),
          expr("elt(1 + CAST(n_nationkey % 3 AS INT), 'alpha', 'beta', 'gamma')")
            .as("e"),
          format_string("%s-%03d", col("n_name"), col("n_nationkey"))
            .as("fmt"),
          expr("url_decode(url_encode(concat(n_name, ' & co')))")
            .as("url_rt"),
          expr("url_encode('a b&c')").as("url_enc"),
          expr("is_valid_utf8(n_name)").as("utf_ok"),
          expr("make_valid_utf8(n_name)").as("utf_fix"))
          .orderBy(col("n_nationkey"))
      },
      Some("""
        SELECT n_nationkey,
          substr(n_name, 1, 1) || 'XX' || substr(n_name, 4) AS ov,
          translate(n_name, 'AEI', 'aei') AS tr,
          trim('**' || n_name || '**', '*') AS bt,
          CASE 1 + n_nationkey % 3 WHEN 1 THEN 'alpha' WHEN 2 THEN 'beta'
               ELSE 'gamma' END AS e,
          printf('%s-%03d', n_name, n_nationkey) AS fmt,
          n_name || ' & co' AS url_rt,
          'a+b%26c' AS url_enc,
          TRUE AS utf_ok,
          n_name AS utf_fix
        FROM nation ORDER BY n_nationkey
      """.trim)),

    // Gap pack #3 — the last inventory deltas vs
    // BuiltInFunctionDefinitions.java: JSON_STRING / ARRAY_SLICE (graft
    // compositions, see functions.CollectionGapFunctions) and the
    // Spark-native REGEXP_SUBSTR / REGEXP_INSTR / REGEXP_COUNT / IFNULL
    // demonstrated against independent DuckDB formulations.
    QueryDef(
      "q_func_gap3",
      (s, dir) => {
        Tables.nation(s, dir).select(
          col("n_nationkey"),
          graft.functions.CollectionGapFunctions.jsonString(col("n_name"))
            .as("js"),
          graft.functions.CollectionGapFunctions
            .jsonString(col("n_nationkey")).as("js_num"),
          concat_ws(",", transform(
            graft.functions.CollectionGapFunctions.arraySlice(
              sequence(lit(1L), lit(1L) + col("n_nationkey") % 5),
              lit(2), lit(3)),
            x => x.cast("string"))).as("sl"),
          expr("regexp_substr(n_name, '[AEIOU]+')").as("rs"),
          expr("regexp_instr(n_name, '[AEIOU]+')").as("ri"),
          expr("ifnull(nullif(n_name, 'ALGERIA'), 'DEFAULT')").as("ifn"),
          expr("regexp_count(n_name, '[AEIOU]')").as("rc"))
          .orderBy(col("n_nationkey"))
      },
      Some("""
        SELECT n_nationkey,
          CAST(to_json(n_name) AS VARCHAR) AS js,
          CAST(to_json(n_nationkey) AS VARCHAR) AS js_num,
          coalesce(array_to_string((range(1, 2 + n_nationkey % 5))[2:3], ','), '') AS sl,
          regexp_extract(n_name, '[AEIOU]+') AS rs,
          strpos(n_name, regexp_extract(n_name, '[AEIOU]+')) AS ri,
          ifnull(nullif(n_name, 'ALGERIA'), 'DEFAULT') AS ifn,
          len(regexp_extract_all(n_name, '[AEIOU]')) AS rc
        FROM nation ORDER BY n_nationkey
      """.trim)),

    // TIMESTAMPDIFF / TIMESTAMPADD arithmetic (reference temporal pack):
    // whole-unit diffs on date-resolution timestamps are crossing-count
    // identical across engines.
    QueryDef(
      "q_ts_arith",
      (s, dir) => {
        Tables.orders(s, dir).select(
          col("o_orderkey"),
          expr("timestampdiff(HOUR, o_orderdate, timestamp'1998-12-01 00:00:00')")
            .as("hours_to_cutoff"),
          expr("timestampdiff(MONTH, o_orderdate, timestamp'1998-12-01 00:00:00')")
            .as("months_to_cutoff"),
          expr("timestampadd(MONTH, 3, o_orderdate)").as("plus3m"),
          expr("timestampadd(DAY, -7, o_orderdate)").as("minus7d"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          from_unixtime(lit(86400)).as("day2_str"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
          date_diff('hour', o_orderdate, TIMESTAMP '1998-12-01 00:00:00')
            AS hours_to_cutoff,
          date_diff('month', o_orderdate, TIMESTAMP '1998-12-01 00:00:00')
            - CASE WHEN day(o_orderdate) > 1 AND
                date_diff('month', o_orderdate,
                          TIMESTAMP '1998-12-01 00:00:00') > 0
              THEN 1 ELSE 0 END
            AS months_to_cutoff,
          o_orderdate + INTERVAL 3 MONTH AS plus3m,
          o_orderdate - INTERVAL 7 DAY AS minus7d,
          CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
          '1970-01-02 00:00:00' AS day2_str
        FROM orders ORDER BY o_orderkey
      """.trim)),

    QueryDef(
      "q_datetime_funcs",
      (s, dir) => {
        Tables.orders(s, dir).select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          date_trunc("month", col("o_orderdate")).as("mstart"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          datediff(to_date(lit("1998-12-01")), to_date(col("o_orderdate")))
            .as("days_to_cutoff"),
          date_format(
            to_date(col("o_orderdate")) + expr("INTERVAL 30 DAYS"),
            "yyyy-MM-dd").as("plus30"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
          EXTRACT(year FROM o_orderdate) AS y,
          EXTRACT(month FROM o_orderdate) AS m,
          EXTRACT(day FROM o_orderdate) AS d,
          EXTRACT(quarter FROM o_orderdate) AS q,
          date_trunc('month', o_orderdate) AS mstart,
          strftime(o_orderdate, '%Y-%m') AS ym,
          date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS days_to_cutoff,
          strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30
        FROM orders ORDER BY o_orderkey
      """.trim)),

    QueryDef(
      "q_conditional",
      (s, dir) => {
        Tables.orders(s, dir).select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", "done")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status_w"),
          coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")),
            lit("none")).as("prio"),
          greatest(col("o_totalprice"), lit(100000.0)).as("g"),
          least(col("o_custkey"), col("o_orderkey")).as("l"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey,
          CASE WHEN o_orderstatus = 'F' THEN 'done'
               WHEN o_orderstatus = 'O' THEN 'open'
               ELSE 'other' END AS status_w,
          COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'none') AS prio,
          GREATEST(o_totalprice, 100000.0) AS g,
          LEAST(o_custkey, o_orderkey) AS l
        FROM orders ORDER BY o_orderkey
      """.trim)),

    QueryDef(
      "q_math_funcs",
      (s, dir) => {
        Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25.0).as("absq"),
          floor(col("l_quantity") / 7.0).cast("long").as("flq"),
          ceil(col("l_quantity") / 7.0).cast("long").as("clq"),
          (col("l_orderkey") % 7).as("mod7"),
          pow(lit(2.0), col("l_linenumber")).as("pow2"),
          sqrt(col("l_quantity") * col("l_quantity")).as("sq"),
          col("l_orderkey").bitwiseAND(255).as("band"),
          col("l_orderkey").bitwiseOR(1).as("bor"),
          signum(col("l_quantity") - 25.0).cast("int").as("sgn"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
          abs(l_quantity - 25.0) AS absq,
          CAST(floor(l_quantity / 7.0) AS BIGINT) AS flq,
          CAST(ceil(l_quantity / 7.0) AS BIGINT) AS clq,
          l_orderkey % 7 AS mod7,
          pow(2.0, l_linenumber) AS pow2,
          sqrt(l_quantity * l_quantity) AS sq,
          l_orderkey & 255 AS band,
          l_orderkey | 1 AS bor,
          CAST(sign(l_quantity - 25.0) AS INTEGER) AS sgn
        FROM lineitem ORDER BY l_orderkey, l_linenumber
      """.trim)),

    QueryDef(
      "q_hash_funcs",
      (s, dir) => {
        Tables.part(s, dir).select(
          col("p_partkey"),
          md5(col("p_name").cast("binary")).as("h_md5"),
          sha2(col("p_name").cast("binary"), 256).as("h_sha256"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256
        FROM part ORDER BY p_partkey
      """.trim)),

    QueryDef(
      "q_json_funcs",
      (s, dir) => {
        Tables.events(s, dir).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"),
          from_json(col("props"), lit("k INT")).getField("k").as("k_struct"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id,
          CAST(props->>'$.k' AS INTEGER) AS k_val,
          CAST(props->>'$.k' AS INTEGER) AS k_struct
        FROM events ORDER BY event_id
      """.trim)),

    // The rest of the reference's JSON pack (§2.8): IS_JSON, JSON_EXISTS,
    // JSON_VALUE, JSON_QUERY (subtree as text), JSON_LENGTH, object keys,
    // json_tuple. The nested object is built with identical string concat
    // on both sides so subtree extraction compares byte-exact.
    QueryDef(
      "q_json_funcs2",
      // spread (r19): 7 JSON parses per row above a one-task scan
      (s, dir) => {
        Tables.spread(Tables.events(s, dir))
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .withColumn("obj", concat(lit("{\"k\":"), col("k"),
            lit(",\"arr\":["), col("k"), lit(","), col("k") + 1, lit("]}")))
          .select(
            col("event_id"),
            expr("try_parse_json(props) IS NOT NULL").as("is_json"),
            expr("try_parse_json('not json') IS NOT NULL").as("bad_json"),
            col("k").as("v_k"),
            get_json_object(col("props"), "$.missing").isNull
              .as("missing_null"),
            get_json_object(col("obj"), "$.arr").as("arr_txt"),
            json_array_length(get_json_object(col("obj"), "$.arr"))
              .as("arr_len"),
            concat_ws(",", json_object_keys(col("obj"))).as("keys_csv"),
            json_tuple(col("props"), "k").as("jt_k"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, props,
            CAST(props->>'$.k' AS INT) AS k,
            '{"k":' || CAST(props->>'$.k' AS INT) || ',"arr":[' ||
              CAST(props->>'$.k' AS INT) || ',' ||
              (CAST(props->>'$.k' AS INT) + 1) || ']}' AS obj
          FROM events)
        SELECT event_id,
          json_valid(props) AS is_json,
          FALSE AS bad_json,
          k AS v_k,
          props->>'$.missing' IS NULL AS missing_null,
          CAST(json_extract(obj, '$.arr') AS VARCHAR) AS arr_txt,
          CAST(json_array_length(obj, '$.arr') AS INT) AS arr_len,
          array_to_string(json_keys(obj), ',') AS keys_csv,
          props->>'$.k' AS jt_k
        FROM e ORDER BY event_id
      """.trim)),

    // Correlate / UNNEST (reference: StreamExecCorrelate.java:53) — explode
    // of a per-row generated array.
    QueryDef(
      "q_unnest",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .where(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            explode(sequence(lit(1), col("l_linenumber"))).as("i"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("i"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               unnest(generate_series(1, l_linenumber)) AS i
        FROM lineitem WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber, i
      """.trim)),

    // UNNEST WITH ORDINALITY → posexplode.
    // Flink-name compat pack (FlinkNameCompat + FlinkSql scalar-syntax
    // rewrites): the reference catalog's own spellings — TRUNCATE, WEEK,
    // SHA256, FROM/TO_BASE64, IS_ALPHA/IS_DECIMAL, ELEMENT, the
    // JSON_OBJECT KEY…VALUE constructor, JSON_VALUE, JSON_LENGTH — run as
    // SQL TEXT through the entry and oracle-checked value by value.
    QueryDef(
      "q_flink_fn_compat",
      // Tables.spread (r19): the JSON/sha/regex projection above a
      // one-split scan ran single-task — 4.3 s in one job (profiled);
      // spread unlocks all cores (no-op at scale, see Tables.spread)
      (s, dir) => graft.sql.FlinkSql.sql(s,
        """SELECT o_orderkey,
          |  TRUNCATE(CAST(o_totalprice AS DOUBLE)) AS tp_trunc,
          |  WEEK(o_orderdate) AS wk,
          |  SHA256(o_orderpriority) AS prio_sha,
          |  FROM_BASE64(TO_BASE64(o_orderpriority)) AS prio_rt,
          |  IS_ALPHA(o_orderstatus) AS alpha_st,
          |  IS_DECIMAL(CAST(o_totalprice AS STRING)) AS dec_tp,
          |  ELEMENT(ARRAY(o_orderkey)) AS elem_k,
          |  JSON_VALUE(JSON_OBJECT(KEY 'k' VALUE o_orderkey), '$.k') AS jv,
          |  JSON_LENGTH(JSON_ARRAY(o_orderkey, o_custkey)) AS jl
          |FROM orders
          |ORDER BY o_orderkey""".stripMargin,
        Map("orders" -> Tables.spread(Tables.orders(s, dir)))),
      Some("""
        SELECT o_orderkey,
          trunc(CAST(o_totalprice AS DOUBLE)) AS tp_trunc,
          weekofyear(o_orderdate) AS wk,
          sha256(o_orderpriority) AS prio_sha,
          o_orderpriority AS prio_rt,
          regexp_full_match(o_orderstatus, '[A-Za-z]+') AS alpha_st,
          regexp_full_match(CAST(o_totalprice AS VARCHAR),
            '[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?') AS dec_tp,
          o_orderkey AS elem_k,
          CAST(o_orderkey AS VARCHAR) AS jv,
          2 AS jl
        FROM orders
        ORDER BY o_orderkey
      """.trim)),

    QueryDef(
      "q_unnest_ordinality",
      (s, dir) => {
        Tables.documents(s, dir)
          .where(col("doc_id") < 20)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .withColumnRenamed("col", "word")
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""
        WITH d AS (SELECT doc_id, str_split(text, ' ') AS parts
                   FROM documents WHERE doc_id < 20),
        i AS (SELECT doc_id, parts,
                     unnest(generate_series(1, len(parts))) AS i
              FROM d)
        SELECT doc_id, i - 1 AS pos, parts[i] AS word
        FROM i ORDER BY doc_id, pos
      """.trim))
  )
}
