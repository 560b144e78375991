package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.Scores

/** Scalar-function surface (SURVEY.md §2.8): the reference's score formulas,
  * reward curves, authorperm construct/resolve, JSON extraction, regex, date
  * arithmetic and formatting — all as codegen'd Column expressions (no UDFs).
  */
object FunctionQueries {

  val qs: Map[String, Q] = Map(

    // ---- F1/W1: trending score — sign·log10(max(|r|,1)) + ts/480000
    // (engine/utils.py:41-46). Rounded to 6 dp for cross-engine float parity. ----
    // routed through the custom Catalyst ScoreExpression (doGenCode path) so
    // the native expression itself is oracle-verified
    "f1_score_trend" -> Q(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          round(graft.expressions.ScoreExpression.score(
            col("value"), unix_timestamp(col("ts")), lit(480000L)), 4).as("score"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        round((CASE WHEN value > 0 THEN 1.0 ELSE -1.0 END) * log10(greatest(abs(value), 1.0))
              + cast(floor(epoch(ts)) AS BIGINT) / 480000.0, 4) AS score
        FROM events ORDER BY event_id""")),

    // ---- F1/W2: hot score — timescale 10000
    // (processors/engine_comments_contract_processor.py:104-106) ----
    // Composite score rounded to 4dp (the time term's magnitude amplifies
    // 1-ulp log10 differences between engines at 6dp); the log ordering term
    // is additionally checked standalone at 6dp.
    "f1_score_hot" -> Q(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          round(Scores.scoreHot(col("value"), unix_timestamp(col("ts"))), 4).as("score"),
          // + 0.0 normalizes IEEE negative zero (-1 * log10(1) = -0.0, which
          // DuckDB keeps and Spark's round folds to 0.0)
          (round(when(col("value") > 0, 1.0).otherwise(-1.0) *
            log10(greatest(abs(col("value")), lit(1.0))), 6) + lit(0.0)).as("order_term"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        round((CASE WHEN value > 0 THEN 1.0 ELSE -1.0 END) * log10(greatest(abs(value), 1.0))
              + cast(floor(epoch(ts)) AS BIGINT) / 10000.0, 4) AS score,
        round((CASE WHEN value > 0 THEN 1.0 ELSE -1.0 END) * log10(greatest(abs(value), 1.0)), 6) + 0.0 AS order_term
        FROM events ORDER BY event_id""")),

    // ---- F2: convergent_linear curve (engine/utils.py:33-34), integer inputs
    // scaled so the squared term stays exactly representable in a double ----
    "f2_convergent_linear" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          Scores.convergentLinear(
            (col("l_quantity").cast("long") * 100000L),
            lit(2000000L)).as("reward"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
        cast(trunc(((r + s) * (r + s) - s * s) / (r + 4 * s)) AS BIGINT) AS reward
        FROM (SELECT l_orderkey, l_linenumber,
                cast(l_quantity AS BIGINT) * 100000 AS r, cast(2000000 AS BIGINT) AS s
              FROM lineitem)
        WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber""")),

    // ---- F3/F4: convergent_square_root with truncating int_sqrt
    // (engine/utils.py:25-26, 37-38) ----
    "f3_convergent_sqrt" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          Scores.convergentSquareRoot(
            (col("l_quantity").cast("long") * 100000L),
            lit(2000000L)).as("reward"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
        cast(trunc(r / floor(sqrt(r + 2 * s))) AS BIGINT) AS reward
        FROM (SELECT l_orderkey, l_linenumber,
                cast(l_quantity AS BIGINT) * 100000 AS r, 2000000 AS s
              FROM lineitem)
        WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber""")),

    // ---- F5: authorperm construct + resolve roundtrip
    // ("@{author}/{permlink}", processors/engine_comments_contract_processor.py:60) ----
    "f5_authorperm" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"),
          concat(lit("@"), col("c_name"), lit("/"), col("c_mktsegment")).as("authorperm"))
        .select(col("c_custkey"), col("authorperm"),
          regexp_extract(col("authorperm"), "^@([^/]+)/(.+)$", 1).as("author"),
          regexp_extract(col("authorperm"), "^@([^/]+)/(.+)$", 2).as("permlink"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, '@' || c_name || '/' || c_mktsegment AS authorperm,
        regexp_extract('@' || c_name || '/' || c_mktsegment, '^@([^/]+)/(.+)$', 1) AS author,
        regexp_extract('@' || c_name || '/' || c_mktsegment, '^@([^/]+)/(.+)$', 2) AS permlink
        FROM customer ORDER BY c_custkey""")),

    // ---- F6: JSON field extraction (json_metadata parsing,
    // processors/comment_processor_for_engine.py:54-57) ----
    "f6_json_extract" -> Q(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events ORDER BY event_id""")),

    // ---- F7: tag extraction — category + metadata tags, dedup, comma-join,
    // truncate (processors/comment_processor_for_engine.py:66-85, 132) ----
    "f7_tag_extract" -> Q(
      (s, dir) => Tables.part(s, dir)
        .select(col("p_partkey"),
          substring(
            array_join(array_sort(array_distinct(
              concat(array(lower(col("p_brand"))), split(col("p_name"), " ")))), ","),
            1, 256).as("tags"))
        .orderBy(col("p_partkey")),
      // list_distinct does not preserve order in DuckDB, so both sides sort
      Some("""SELECT p_partkey,
        substring(array_to_string(list_sort(list_distinct(
          list_prepend(lower(p_brand), string_split(p_name, ' ')))), ','), 1, 256) AS tags
        FROM part ORDER BY p_partkey""")),

    // ---- F8: truncation (title[:256] / desc[:300],
    // processors/comment_processor_for_engine.py:132,142-144) ----
    "f8_truncate" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          substring(col("text"), 1, 100).as("excerpt"),
          length(substring(col("text"), 1, 100)).as("excerpt_len"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, substring(text, 1, 100) AS excerpt,
        cast(length(substring(text, 1, 100)) AS INT) AS excerpt_len
        FROM documents ORDER BY doc_id""")),

    // ---- F10: memo → authorperm regex (processors/engine_promote_post_processor.py:59-67) ----
    "f10_memo_regex" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "#0*([1-9][0-9]*|0)$", 1).as("memo_id"))
        .orderBy(col("c_custkey")),
      Some("SELECT c_custkey, regexp_extract(c_name, '#0*([1-9][0-9]*|0)$', 1) AS memo_id FROM customer ORDER BY c_custkey")),

    // ---- F11: date arithmetic — cashout = created + window days
    // (processors/engine_comments_contract_processor.py:69-70) ----
    "f11_date_arith" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("cashout_time"),
          (col("o_orderdate") - expr("INTERVAL 30 DAYS")).as("window_start"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_orderdate + INTERVAL 7 DAY AS cashout_time,
        o_orderdate - INTERVAL 30 DAY AS window_start
        FROM orders ORDER BY o_orderkey""")),

    // ---- F12: time formatting (formatTimeString, server/app.py:76-80) ----
    "f12_date_format" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("created_iso"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS created_iso,
        cast(year(o_orderdate) AS INT) AS y, cast(month(o_orderdate) AS INT) AS m
        FROM orders ORDER BY o_orderkey""")),

    // ---- F13: case normalization (token upper-cased, server/app.py:132-133) ----
    "f13_upper" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"), upper(col("c_mktsegment")).as("token"),
          lower(col("c_name")).as("name_lc"))
        .orderBy(col("c_custkey")),
      Some("SELECT c_custkey, upper(c_mktsegment) AS token, lower(c_name) AS name_lc FROM customer ORDER BY c_custkey")),

    // ---- F14: numeric-string validation via try_cast
    // (processors/engine_promote_post_processor.py:41-48) ----
    "f14_cast_validation" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"),
          expr("try_cast(split(c_name, '#')[1] AS BIGINT)").as("parsed_id"),
          expr("try_cast(c_mktsegment AS BIGINT)").as("invalid_parse"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, try_cast(string_split(c_name, '#')[2] AS BIGINT) AS parsed_id,
        try_cast(c_mktsegment AS BIGINT) AS invalid_parse
        FROM customer ORDER BY c_custkey""")),

    // ---- F15: error-log gate — skip ops whose parsed logs show errors
    // (processors/custom_json_processor.py:50-66) ----
    "f15_error_gate" -> Q(
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_type") =!= "error" &&
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)") < 50)
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type FROM events
        WHERE event_type <> 'error' AND try_cast(json_extract_string(props, '$.k') AS BIGINT) < 50
        ORDER BY event_id""")),

    // ---- F16: user extraction — first of auth list else fallback list
    // (processors/custom_json_processor.py:33-47) ----
    "f16_first_auth" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"),
          coalesce(
            get(when(col("c_custkey") % 3 === 0, array().cast("array<string>"))
              .otherwise(array(col("c_name"))), lit(0)),
            get(array(col("c_mktsegment")), lit(0))).as("user"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
        coalesce((CASE WHEN c_custkey % 3 = 0 THEN [] ELSE [c_name] END)[1], ([c_mktsegment])[1]) AS user
        FROM customer ORDER BY c_custkey"""))
  )
}
