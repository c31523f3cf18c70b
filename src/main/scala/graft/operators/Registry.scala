package graft.operators

import graft.SparkEntry.Q
import graft.sources.{JsonDecode, ParquetSink, SchemaInfer}

/** Additional declared queries beyond the relational core — extension packs
  * (temporal joins, scalar functions, schema/JSON parity, sinks; dedup,
  * similarity, text and multimodal packs register here as they land).
  *
  * Every SQL-expressible entry carries a DuckDB oracle with identical output
  * column names and a total ORDER BY (SURVEY.md §2.4). Type notes: DuckDB
  * `len`/`year`/`length` return BIGINT where Spark returns INT (cast in the
  * oracle); Spark `ceil`/`floor` return BIGINT where DuckDB returns DOUBLE
  * (cast in the oracle); DuckDB `regexp_replace` needs the 'g' flag to match
  * Spark's replace-all semantics.
  */
object Registry {
  def extra: Seq[Q] = temporal ++ scalars ++ schemaJson

  private def temporal: Seq[Q] = Seq(
    Q(
      "q30_asof_join",
      AsOf.lastViewBeforePurchase,
      Some("""
        WITH t AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tag
          FROM events WHERE event_type IN ('view', 'purchase')
        ), w AS (
          SELECT event_id, user_id, tag, epoch_us(ts) AS ts_us,
                 last_value(CASE WHEN tag = 0 THEN epoch_us(ts) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, tag
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts_us
          FROM t
        )
        SELECT event_id, user_id, ts_us, last_view_ts_us
        FROM w WHERE tag = 1 ORDER BY event_id
      """)
    ),
    Q(
      "q31_range_window_join",
      AsOf.viewsInPrecedingHour,
      Some("""
        WITH t AS (
          SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
          FROM events WHERE event_type IN ('view', 'purchase')
        ), w AS (
          SELECT event_id, user_id, event_type,
                 CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END)
                   OVER (PARTITION BY user_id ORDER BY ts_us
                         RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS n_views_prior_hour
          FROM t
        )
        SELECT event_id, user_id, n_views_prior_hour
        FROM w WHERE event_type = 'purchase' ORDER BY event_id
      """)
    )
  )

  private def scalars: Seq[Q] = Seq(
    Q(
      "q40_string_funcs",
      Scalars.stringFuncs,
      Some("""
        SELECT p_partkey,
               regexp_replace(p_name, '-', '_', 'g') AS name_sanitized,
               upper(p_brand) AS brand_upper,
               CAST(len(string_split(p_type, ' ')) AS INT) AS type_words,
               array_to_string(string_split(p_type, ' '), '_') AS type_joined,
               CAST(length(p_name) AS INT) AS name_len,
               substr(p_name, 1, 5) AS name_prefix,
               concat_ws('|', p_brand, p_type) AS brand_type
        FROM part ORDER BY p_partkey
      """)
    ),
    Q(
      "q41_date_funcs",
      Scalars.dateFuncs,
      Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(month(o_orderdate) AS INT) AS mo,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
               MAX(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_start,
               CAST(MAX(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) AS DATE) AS max_plus_30d
        FROM orders GROUP BY yr, qtr, mo ORDER BY yr, qtr, mo
      """)
    ),
    Q(
      "q42_math_funcs",
      Scalars.mathFuncs,
      Some("""
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25.0) AS qty_dev,
               CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
               CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
               sqrt(l_quantity) AS qty_sqrt,
               POWER(l_discount, 2.0) AS disc_sq,
               LN(l_extendedprice) AS price_ln
        FROM lineitem WHERE l_orderkey <= 200 ORDER BY l_orderkey, l_linenumber
      """)
    ),
    Q(
      "q43_explode_tokens",
      Scalars.explodeTokens,
      Some("""
        SELECT token, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 50
      """)
    ),
    Q(
      "q44_array_funcs",
      Scalars.arrayFuncs,
      Some("""
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
               toks[1] AS first_tok,
               toks[-1] AS last_tok,
               list_contains(toks, 'spark') AS has_spark,
               CAST(len(list_filter(toks, t -> length(t) > 4)) AS INT) AS n_long_tokens,
               array_to_string(list_transform(toks, t -> upper(t))[1:3], ' ') AS first3_upper
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        ORDER BY doc_id
      """)
    ),
    Q(
      "q45_map_json_funcs",
      Scalars.mapJsonFuncs,
      Some("""
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
               json_extract(props, '$.k')::BIGINT AS k_value,
               json_extract(props, '$.k')::BIGINT AS k_via_path
        FROM events ORDER BY event_id
      """)
    )
  )

  private def schemaJson: Seq[Q] = Seq(
    // Inference output is engine-specific metadata → rows-only check.
    Q("q50_schema_inference", SchemaInfer.inferPropsSchema, None),
    Q(
      "q51_strict_decode",
      JsonDecode.strictDecode,
      Some("""
        WITH ev AS (
          SELECT event_id,
                 CASE WHEN event_id % 7 = 0
                      THEN regexp_replace(props, '\}$', ',"extra":1}')
                      ELSE props END AS props2
          FROM events
        )
        SELECT event_id, json_extract(props2, '$.k')::BIGINT AS k
        FROM ev
        WHERE len(list_filter(json_keys(props2), x -> x <> 'k')) = 0
        ORDER BY event_id
      """)
    ),
    Q(
      "q52_dead_letter_audit",
      JsonDecode.deadLetterAudit,
      Some("""
        WITH ev AS (
          SELECT CASE WHEN event_id % 11 = 0 THEN '{not valid json'
                      ELSE props END AS props2
          FROM events
        )
        SELECT CAST(SUM(CASE WHEN json_valid(props2) THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
               CAST(SUM(CASE WHEN json_valid(props2) THEN 0 ELSE 1 END) AS BIGINT) AS n_dead_letter
        FROM ev
      """)
    ),
    Q(
      "q53_sink_audit",
      ParquetSink.sinkAudit,
      Some("""
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events WHERE event_type = 'purchase'
        GROUP BY day ORDER BY day
      """)
    )
  )
}
