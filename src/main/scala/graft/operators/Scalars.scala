package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function query pack: string (O16 — the reference's replaceAll /
  * split / join at Bootstrap.java:298,:82-84,:254-256 generalized), date,
  * math, array lambda, map and JSON functions — all codegen'd built-ins,
  * no UDFs (SURVEY.md §2.2).
  */
object Scalars {

  /** String functions: sanitize (regexp_replace), split+rejoin, case, length,
    * substring — over part names/types. */
  def stringFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .part(spark, sfDir)
      .select(
        $"p_partkey",
        // translate, not regexp_replace (r20 sweep): identical single-char
        // literal map, no regex machinery per row
        translate($"p_name", "-", "_").as("name_sanitized"),
        upper($"p_brand").as("brand_upper"),
        size(split($"p_type", " ")).as("type_words"),
        array_join(split($"p_type", " "), "_").as("type_joined"),
        length($"p_name").as("name_len"),
        substring($"p_name", 1, 5).as("name_prefix"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type")
      )
      .orderBy($"p_partkey")
  }

  /** Date functions: extract parts, truncate, shift — grouped revenue by
    * order month. */
  def dateFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .orders(spark, sfDir)
      .groupBy(
        year($"o_orderdate").as("yr"),
        quarter($"o_orderdate").as("qtr"),
        month($"o_orderdate").as("mo")
      )
      .agg(
        count(lit(1)).as("n_orders"),
        Det.decSum($"o_totalprice", 2).as("total"),
        max(to_date(date_trunc("month", $"o_orderdate"))).as("month_start"),
        max(date_add(to_date($"o_orderdate"), 30)).as("max_plus_30d")
      )
      .orderBy($"yr", $"qtr", $"mo")
  }

  /** Math functions over lineitem: abs/ceil/floor/sqrt/pow/log — exact
    * IEEE ops shared by both engines. */
  def mathFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, sfDir)
      .filter($"l_orderkey" <= 200)
      .select(
        $"l_orderkey",
        $"l_linenumber",
        abs($"l_quantity" - 25.0).as("qty_dev"),
        ceil($"l_extendedprice" / 1000.0).as("price_k_ceil"),
        floor($"l_extendedprice" / 1000.0).as("price_k_floor"),
        sqrt($"l_quantity").as("qty_sqrt"),
        pow($"l_discount", lit(2.0)).as("disc_sq"),
        log($"l_extendedprice").as("price_ln")
      )
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Generator/UDTF surface: explode tokens (posexplode analog) + global
    * token frequency top-50. */
  def explodeTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(50)
  }

  /** Array lambda functions: size / distinct / element_at / contains /
    * filter+transform over tokenized documents. */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .withColumn("toks", split($"text", " "))
      .select(
        $"doc_id",
        size($"toks").as("n_tokens"),
        size(array_distinct($"toks")).as("n_distinct"),
        element_at($"toks", 1).as("first_tok"),
        element_at($"toks", -1).as("last_tok"),
        array_contains($"toks", "spark").as("has_spark"),
        size(filter($"toks", t => length(t) > 4)).as("n_long_tokens"),
        array_join(slice(transform($"toks", t => upper(t)), 1, 3), " ").as("first3_upper")
      )
      .orderBy($"doc_id")
  }

  /** Map + JSON functions: parse props to a map, enumerate sorted keys,
    * extract typed value (O10's union-free decode path). */
  def mapJsonFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, sfDir)
      .withColumn("m", from_json($"props", lit("map<string,bigint>")))
      .select(
        $"event_id",
        array_join(array_sort(map_keys($"m")), ",").as("keys_sorted"),
        element_at($"m", "k").as("k_value"),
        get_json_object($"props", "$.k").cast("bigint").as("k_via_path")
      )
      .orderBy($"event_id")
  }

  /** Semi-structured decode through Spark 4's VARIANT type — the modern
    * schema-on-read path for the reference's tolerant JSON decoding
    * (ExtendedJsonDecoder's whole job): parse once into the binary VARIANT
    * encoding, then typed-path extraction with both strict (`variant_get`)
    * and tolerant (`try_variant_get` → null on type mismatch, the dead-
    * letter-free analog of O10/O11) access. The nested document wraps the
    * raw `props` payload in an envelope built from typed columns, so the
    * extraction exercises multi-level paths, not a flat object. */
  def variantDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // spread BEFORE the parse: the single-row-group scan would otherwise run
    // every parse_json in one task (same trap as the md5 kernels — see
    // BASELINE.md round-2 notes)
    Tables
      .spread(Tables.events(spark, sfDir))
      .withColumn(
        "js",
        concat(
          lit("{\"meta\":{\"type\":\""),
          $"event_type",
          lit("\",\"user\":"),
          $"user_id",
          lit("},\"payload\":"),
          $"props",
          lit("}")
        )
      )
      .withColumn("v", parse_json($"js"))
      .select(
        $"event_id",
        variant_get($"v", "$.meta.type", "string").as("meta_type"),
        variant_get($"v", "$.meta.user", "bigint").as("meta_user"),
        variant_get($"v", "$.payload.k", "bigint").as("payload_k"),
        try_variant_get($"v", "$.meta.type", "bigint").as("type_as_int"),
        try_variant_get($"v", "$.payload.missing", "bigint").as("absent_path")
      )
      .orderBy($"event_id")
  }
}
