package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tolerant JSON decode with the reference's enforcement semantics
  * (SURVEY.md O10/O11, ExtendedJsonDecoder.java):
  *
  *   - out-of-order fields: free (`from_json` is order-insensitive; the
  *     reference needed a 700-line reorder buffer, :463-523)
  *   - missing fields → null injected (PERMISSIVE default; reference
  *     default-injection at :719-747)
  *   - extra fields → record REJECTED (reference throws per record at
  *     :511-512 and the caller drops it, EsParquetWriter.java:74-81) —
  *     expressed as a key-subset filter, keeping the pipeline declarative
  *   - malformed records → dead-letter split instead of silent drop
  *     (documented improvement; auditable)
  */
object JsonDecode {

  /** True when the JSON object's keys are a subset of `allowed` — the strict
    * extra-field gate. Malformed JSON yields null keys → not strict. */
  def keysSubsetOf(jsonCol: Column, allowed: Seq[String]): Column =
    size(array_except(json_object_keys(jsonCol), array(allowed.map(lit): _*))) === 0

  // --- the decoder's non-JSON-native scalar branches (ExtendedJsonDecoder) ---

  /** Avro `bytes` semantics (readBytes :260-274, charset constant :77): the
    * reference carries binary payloads as JSON strings, one ISO-8859-1 char
    * per byte. Codegen'd built-in `encode`; null in → null out. */
  def bytesIso88591(c: Column): Column = encode(c, "ISO-8859-1")

  /** Avro `fixed(n)` semantics (readFixed :286-336): ISO-8859-1 bytes plus
    * the exact-width gate — a wrong-length value yields null so the caller
    * can dead-letter it (the reference throws per record). */
  def fixedIso88591(c: Column, n: Int): Column = {
    val b = encode(c, "ISO-8859-1")
    when(length(b) === n, b)
  }

  /** Avro `enum` semantics (readEnum :338-353): symbol-membership gate —
    * a non-member yields null for dead-letter routing. */
  def enumSymbol(c: Column, symbols: Seq[String]): Column =
    when(c.isInCollection(symbols), c)

  /** PERMISSIVE decode splitting valid rows from a dead-letter side.
    * Returns (valid, deadLetter); `valid` carries the parsed struct.
    * from_json in PERMISSIVE mode yields an all-null struct (not a null
    * struct) for malformed input, so the split keys off a corrupt-record
    * column — the auditable dead-letter mechanism. */
  def decodeWithDeadLetter(
      df: DataFrame,
      jsonCol: String,
      schemaDdl: String
  ): (DataFrame, DataFrame) = {
    val st = org.apache.spark.sql.types.StructType
      .fromDDL(schemaDdl)
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    val parsed = df.withColumn(
      "_parsed",
      from_json(col(jsonCol), st, Map("columnNameOfCorruptRecord" -> "_corrupt"))
    )
    val isBad = col(jsonCol).isNull || col("_parsed").isNull ||
      col("_parsed").getField("_corrupt").isNotNull
    val good = parsed.filter(!isBad)
    val bad  = parsed.filter(isBad).drop("_parsed")
    (good, bad)
  }

  /** Declared query: strict decode (extra fields dropped). A deterministic
    * slice of rows (event_id % 7 == 0) is rewritten with an extra JSON key to
    * exercise the rejection path on real data. */
  def strictDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables
      .events(spark, sfDir)
      .withColumn(
        "props2",
        when(
          $"event_id" % 7 === 0,
          regexp_replace($"props", lit("\\}$"), lit(",\"extra\":1}"))
        ).otherwise($"props")
      )
    ev.filter(keysSubsetOf($"props2", Seq("k")))
      .select($"event_id", from_json($"props2", lit("k BIGINT")).getField("k").as("k"))
      .orderBy($"event_id")
  }

  /** Declared query: the reference decoder's NESTED type matrix
    * (ExtendedJsonDecoder.java:260-461) exercised end-to-end on real data —
    * nested struct, array, map, number→string coercion, missing-subtree
    * null injection, and wrong-type dead-lettering, each on a deterministic
    * slice:
    *
    *   - every row gets a synthesized nested document
    *     `{"k":…,"meta":{"src":…,"depth":…},"tags":[…,…],"nstr":<number>,
    *     "attrs":{"a":…}}` built from its own columns
    *   - `event_id % 13 == 0`: `depth` carries a STRING where the schema
    *     declares BIGINT → the record dead-letters (the decoder's
    *     type-mismatch rejection, readLong :184-193)
    *   - else `event_id % 17 == 0`: the whole `meta` subtree is absent →
    *     decoded as null struct (default injection, :719-747)
    *   - `nstr` is declared STRING but always arrives as a JSON number →
    *     coerced to its literal text (readString's relaxed scalar
    *     acceptance, :219-241)
    *
    * Output: one row per event with the extracted leaf values and a
    * `status` column ('ok' | 'dead'); the oracle recomputes every leaf
    * independently from the base columns. */
  def nestedDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // spread: JSON synthesis + from_json must not run in the one scan task
    val ev = Tables
      .spread(Tables.events(spark, sfDir))
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .withColumn(
        "meta_json",
        when(
          $"event_id" % 13 === 0,
          concat(lit("{\"src\":\"ev_"), $"event_type", lit("\",\"depth\":\"deep\"}"))
        ).otherwise(
          concat(
            lit("{\"src\":\"ev_"),
            $"event_type",
            lit("\",\"depth\":"),
            ($"event_id" % 5).cast("string"),
            lit("}")
          )
        )
      )
      .withColumn(
        "tail_json",
        concat(
          lit(",\"tags\":[\"t"),
          ($"user_id" % 3).cast("string"),
          lit("\",\"u"),
          ($"user_id" % 5).cast("string"),
          lit("\"],\"nstr\":"),
          ($"event_id" % 9).cast("string"),
          lit(",\"attrs\":{\"a\":"),
          ($"event_id" % 7).cast("string"),
          lit("}}")
        )
      )
      .withColumn(
        "props3",
        when(
          $"event_id" % 13 =!= 0 && $"event_id" % 17 === 0,
          concat(lit("{\"k\":"), $"k".cast("string"), $"tail_json")
        ).otherwise(
          concat(lit("{\"k\":"), $"k".cast("string"), lit(",\"meta\":"), $"meta_json", $"tail_json")
        )
      )
    // Single-pass assembly: a good/dead union would scan + synthesize +
    // decode everything twice (one branch per side); a conditional
    // projection over ONE from_json keeps it a single scan stage. The
    // physical dead-letter SPLIT (separate outputs) stays the domain of
    // [[decodeWithDeadLetter]] / q52.
    val st = org.apache.spark.sql.types.StructType
      .fromDDL(
        "k BIGINT, meta STRUCT<src: STRING, depth: BIGINT>, tags ARRAY<STRING>, nstr STRING, attrs MAP<STRING, BIGINT>"
      )
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    val parsed = ev.withColumn(
      "_parsed",
      from_json($"props3", st, Map("columnNameOfCorruptRecord" -> "_corrupt"))
    )
    val isBad = $"props3".isNull || $"_parsed".isNull || $"_parsed._corrupt".isNotNull
    parsed
      .select(
        $"event_id",
        when(isBad, lit("dead")).otherwise(lit("ok")).as("status"),
        when(!isBad, $"_parsed.k").as("k"),
        when(!isBad, $"_parsed.meta.src").as("meta_src"),
        when(!isBad, $"_parsed.meta.depth").as("meta_depth"),
        when(!isBad, size($"_parsed.tags")).as("n_tags"),
        when(!isBad, element_at($"_parsed.attrs", "a")).as("attr_a"),
        when(!isBad, $"_parsed.nstr").as("nstr")
      )
      .orderBy($"event_id")
  }

  /** Declared query: dead-letter audit. A deterministic slice
    * (event_id % 11 == 0) is corrupted; output the per-side counts the
    * reference only logged (EsParquetWriter.java:96). */
  def deadLetterAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables
      .events(spark, sfDir)
      .withColumn(
        "props2",
        when($"event_id" % 11 === 0, lit("{not valid json")).otherwise($"props")
      )
    val (good, bad) = decodeWithDeadLetter(ev, "props2", "k BIGINT")
    good
      .agg(count(lit(1)).as("n_valid"))
      .crossJoin(bad.agg(count(lit(1)).as("n_dead_letter")))
      .select($"n_valid", $"n_dead_letter")
  }
}
