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
