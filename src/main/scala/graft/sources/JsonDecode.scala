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

  // --- general Avro union decode (readIndex :436-461) ---

  /** Resolve the Avro union branch for record field `field` from the raw
    * record JSON, with the reference decoder's exact rules
    * (ExtendedJsonDecoder.java readIndex :436-461):
    *
    *   - JSON `null` (or an absent field — the reference's default
    *     injection turns those into null before the union resolves) → the
    *     `"null"` branch, which must be a member, else reject
    *   - a wrapped single-key object `{"label": v}` → that label; an
    *     unknown label rejects (`Unknown union branch`, :456-458)
    *   - a BARE value is only legal for a two-branch union containing
    *     `"null"` — it resolves to the non-null branch (:448-451); for any
    *     other union shape a bare value rejects (:452-453)
    *
    * Reject = null result, so the caller routes the record to the same
    * auditable dead-letter side as malformed JSON. This closes the declared
    * [null, T]-only divergence for arbitrary `[null, long, string, …]`
    * unions. All probes are codegen'd JSON built-ins over the raw text —
    * no UDFs.
    *
    * Declared divergences of the declarative probes vs the token-stream
    * reference: (a) a JSON STRING whose content happens to parse as an
    * object (`"{\"long\":1}"`) resolves as if wrapped, where the reference
    * sees a string token (get_json_object erases the quoting); (b) a
    * resolved TYPED branch whose payload fails to decode (JSON null inside
    * a wrapper, or a bare value of the wrong type) yields a null VALUE
    * rather than a null label — callers must treat branch-resolved-but-
    * value-null as the reference's decode error (see [[unionDecode]]'s
    * status column, which does exactly that). */
  def unionLabel(rec: Column, field: String, branches: Seq[String]): Column = {
    val raw     = get_json_object(rec, s"$$.$field")
    val keys    = json_object_keys(raw)
    val key1    = element_at(keys, 1)
    val nonNull = branches.filter(_ != "null")
    val bareOk  = branches.size == 2 && branches.contains("null")
    val reject = lit(null).cast("string")
    // Wrapped {"null": ...}: the reference's findLabel matches ALL branches
    // including "null" (readIndex :455), then readNull throws unless the
    // payload token is a JSON null — so at the record level {"null": null}
    // is the null branch and {"null": <non-null>} is a decode error. The
    // label probe folds that payload check in: rejecting here routes the
    // record to the same dead-letter side the reference's throw does.
    val wrappedNullOk =
      if (branches.contains("null")) get_json_object(raw, "$.null").isNull else lit(false)
    when(raw.isNull, if (branches.contains("null")) lit("null") else reject)
      .when(
        keys.isNotNull && size(keys) === 1 && key1 === "null",
        when(wrappedNullOk, lit("null")).otherwise(reject)
      )
      .when(keys.isNotNull && size(keys) === 1 && key1.isInCollection(nonNull), key1)
      .when(keys.isNull, if (bareOk) lit(nonNull.head) else reject)
    // multi-key / unknown-label wrapped objects fall through → null (reject)
  }

  /** The resolved union value's raw text for `label`: the wrapped branch
    * payload when the field IS a wrapped object, else the bare value (only
    * reachable for the two-branch nullable shortcut). The bare fallback
    * must never fire for a wrapped object — `{"string": null}` has a null
    * payload, and falling back would return the whole wrapper text as the
    * value. Cast/decode per branch type at the call site — e.g.
    * `.cast("long")` for a `long` branch, [[bytesIso88591]] for a `bytes`
    * branch — and treat a null result on a typed branch as the decode
    * error it is (reference read<T> throws on a null token). */
  def unionValue(rec: Column, field: String, label: String): Column = {
    val raw = get_json_object(rec, s"$$.$field")
    when(json_object_keys(raw).isNotNull, get_json_object(rec, s"$$.$field.$label"))
      .otherwise(raw)
  }

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

  /** Declared query: general union decode (the [[unionLabel]] rules) on
    * real data. Every event carries two synthesized union-typed fields
    * built from its own columns:
    *
    *   - `u`, union `["null","long","string"]`, WRAPPED encoding:
    *     `event_id % 5 == 0` → `{"long": id%100}`; `% 5 == 1` →
    *     `{"string": "s<user%10>"}`; `% 5 == 2` → JSON null; `% 5 == 3` →
    *     `{"double": 1.5}` (unknown branch → dead); `% 5 == 4` → bare `7`
    *     (bare value with a 3-branch union → dead, :452-453)
    *   - `v`, union `["null","long"]`, BARE encoding (the two-branch
    *     shortcut, :448-451): even `user_id` → the number, odd → null
    *
    * Output: per event the resolved branches, the typed branch values, and
    * the ok/dead verdict; the oracle recomputes all of it independently
    * from the base columns. */
  def unionDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // spread: JSON synthesis + three json probes per row must not run in
    // the one scan task (same discipline as nestedDecode)
    val ev = Tables
      .spread(Tables.events(spark, sfDir))
      .withColumn(
        "u_json",
        when($"event_id" % 5 === 0, concat(lit("{\"long\":"), ($"event_id" % 100).cast("string"), lit("}")))
          .when($"event_id" % 5 === 1, concat(lit("{\"string\":\"s"), ($"user_id" % 10).cast("string"), lit("\"}")))
          .when($"event_id" % 5 === 2, lit("null"))
          .when($"event_id" % 5 === 3, lit("{\"double\":1.5}"))
          .otherwise(lit("7"))
      )
      .withColumn(
        "v_json",
        when($"user_id" % 2 === 0, ($"user_id" % 50).cast("string")).otherwise(lit("null"))
      )
      .withColumn("rec", concat(lit("{\"u\":"), $"u_json", lit(",\"v\":"), $"v_json", lit("}")))
    val uB    = unionLabel($"rec", "u", Seq("null", "long", "string"))
    val vB    = unionLabel($"rec", "v", Seq("null", "long"))
    val uLong = when(uB === "long", unionValue($"rec", "u", "long").cast("long"))
    val uStr  = when(uB === "string", unionValue($"rec", "u", "string"))
    val vLong = when(vB === "long", unionValue($"rec", "v", "long").cast("long"))
    // dead = unresolvable label OR a typed branch whose payload failed to
    // decode (null-inside-wrapper / wrong-type bare value) — the reference
    // throws on both, see unionLabel's declared-divergence note
    val uBad = uB.isNull || (uB === "long" && uLong.isNull) || (uB === "string" && uStr.isNull)
    val vBad = vB.isNull || (vB === "long" && vLong.isNull)
    ev.select(
      $"event_id",
      uB.as("u_branch"),
      vB.as("v_branch"),
      uLong.as("u_long"),
      uStr.as("u_str"),
      vLong.as("v_long"),
      when(uBad || vBad, lit("dead")).otherwise(lit("ok")).as("status")
    ).orderBy($"event_id")
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

  /** Declared query (q128): CSV dead-letter parity with [[deadLetterAudit]]
    * — the same auditable good/bad split, but for MALFORMED CSV through the
    * file reader's PERMISSIVE mode + columnNameOfCorruptRecord (the CSV
    * reads elsewhere, q54/q128's siblings, only ever saw well-formed
    * files). A deterministic events slice goes out as raw CSV lines with
    * the `% 13 == 0` slice corrupted (too few tokens AND a non-numeric
    * where the schema demands BIGINT); the read back splits on the corrupt
    * column and counts each side.
    *
    * The audit also sums `user_id` over valid rows. Besides being the
    * natural "did the values survive" check, referencing a non-key data
    * column is load-bearing twice over: (a) Spark disallows CSV queries
    * whose referenced columns are ONLY the internal corrupt-record column;
    * (b) the CSV reader prunes parsing to the referenced columns — an
    * audit that never references `user_id` never PARSES `user_id`, the
    * malformed token is never converted, and every corrupt row silently
    * counts as valid (found the hard way: 0 dead letters at sf0.01). */
  def csvDeadLetterAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = ParquetSink.memoFixture(spark, "csv_dead_letter", sfDir) { dir =>
      // Line arity must NOT depend on data nulls: concat_ws silently DROPS
      // null columns, so a null user_id/value would emit a short line the
      // reader flags corrupt while the oracle (classifying purely by
      // event_id % 13) still counts it valid. Each column goes through
      // coalesce to the empty token instead — "id,," parses back as
      // (id, NULL, NULL), still a valid row on both sides.
      def cell(c: org.apache.spark.sql.Column) = coalesce(c.cast("string"), lit(""))
      Tables
        .events(spark, sfDir)
        .select(
          when($"event_id" % 13 === 0, concat($"event_id".cast("string"), lit(",oops")))
            .otherwise(
              concat(cell($"event_id"), lit(","), cell($"user_id"), lit(","), cell($"value"))
            )
            .as("value")
        )
        .write
        .mode("overwrite")
        .text(dir)
    }
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("event_id BIGINT, user_id BIGINT, value DOUBLE")
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(base)
      .agg(
        sum(when($"_corrupt".isNull && $"event_id".isNotNull, 1L).otherwise(0L)).as("n_valid"),
        sum(when($"_corrupt".isNotNull || $"event_id".isNull, 1L).otherwise(0L)).as("n_dead_letter"),
        sum(when($"_corrupt".isNull, $"user_id")).as("sum_user_valid")
      )
  }
}
