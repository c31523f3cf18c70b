package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis pack over the `documents` table — the LLM-training-pipeline
  * operators the north star mandates: token counting, quality scoring,
  * language ID, document fingerprinting. All codegen'd built-ins (no UDFs);
  * every computation is a per-row map, so the plans are a single scan stage
  * with no shuffle other than the final presentation sort — embarrassingly
  * parallel at 100 TB.
  */
object Text {

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs | digit runs | single punctuation). */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .spread(Tables.documents(spark, sfDir))
      .select(
        $"doc_id",
        size(tokens($"text")).as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
          .as("n_re_tokens"),
        length($"text").as("len_chars")
      )
      .orderBy($"doc_id")
  }

  /** Quality scoring: length / distinct-token ratio / stopword ratio /
    * mean token length folded into a logistic score. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    Tables
      .spread(Tables.documents(spark, sfDir))
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("n_stop", size(filter($"toks", t => t.isInCollection(stop))))
      .withColumn(
        "mean_tok_len",
        // translate = literal char strip; identical output to the regex
        // form for a single-space pattern, without per-row regex machinery
        length(translate($"text", " ", "")).cast("double") / $"n_tokens"
      )
      .withColumn("distinct_ratio", size(array_distinct($"toks")).cast("double") / $"n_tokens")
      .withColumn("stop_ratio", $"n_stop".cast("double") / $"n_tokens")
      .select(
        $"doc_id",
        $"n_tokens",
        round($"mean_tok_len", 6).as("mean_tok_len"),
        round($"distinct_ratio", 6).as("distinct_ratio"),
        round($"stop_ratio", 6).as("stop_ratio"),
        round(
          lit(1.0) / (lit(1.0) +
            exp(-(lit(0.1) * $"mean_tok_len" + lit(2.0) * $"distinct_ratio" - lit(3.0) * $"stop_ratio"))),
          6
        ).as("quality")
      )
      .orderBy($"doc_id")
  }

  /** Language ID by marker-word counts (n-gram heuristic): count hits in
    * per-language function-word sets, argmax with fixed priority en>de>fr. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val en = Seq("the", "and", "of", "is")
    val de = Seq("der", "die", "das", "und")
    val fr = Seq("le", "la", "les", "et")
    Tables
      .spread(Tables.documents(spark, sfDir))
      .withColumn("toks", tokens($"text"))
      .withColumn("c_en", size(filter($"toks", t => t.isInCollection(en))))
      .withColumn("c_de", size(filter($"toks", t => t.isInCollection(de))))
      .withColumn("c_fr", size(filter($"toks", t => t.isInCollection(fr))))
      .select(
        $"doc_id",
        $"lang",
        when($"c_en" >= $"c_de" && $"c_en" >= $"c_fr", "en")
          .when($"c_de" >= $"c_fr", "de")
          .otherwise("fr")
          .as("pred_lang"),
        $"c_en",
        $"c_de",
        $"c_fr"
      )
      .withColumn("is_match", $"lang" === $"pred_lang")
      .orderBy($"doc_id")
  }

  /** Document fingerprinting: md5 of whitespace-normalized text + the
    * min-shingle rolling-hash fingerprint (MinHash with k=1). */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // min over shingle hashes needs no shingle strings materialized: the
    // kernel hashes the 3-gram windows straight off the token array.
    Tables
      .spread(Tables.documents(spark, sfDir))
      .withColumn("shs", graft.functions.Kernels.shingleHashes(tokens($"text"), 3))
      .select(
        $"doc_id",
        md5(trim(regexp_replace(lower($"text"), "\\s+", " "))).as("fp_md5"),
        array_min($"shs").as("min_shingle_h"),
        size($"shs").as("n_shingles")
      )
      .orderBy($"doc_id")
  }

  /** Intra-document repetition score (the Gopher-style quality rule
    * "fraction of duplicated n-grams"): 3-gram shingles per doc, repetition
    * ratio = 1 − distinct/total, flag above 20%. Per-row map over the
    * compiled shingle kernel — no shuffle, linear at any scale. */
  def repetitionScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .spread(Tables.documents(spark, sfDir))
      .withColumn("shs", graft.functions.Kernels.shingleHashes(tokens($"text"), 3))
      .select(
        $"doc_id",
        size($"shs").as("n_shingles"),
        size(array_distinct($"shs")).as("n_distinct")
      )
      .withColumn(
        "repetition_ratio",
        when($"n_shingles" > 0, round(lit(1.0) - $"n_distinct" / $"n_shingles", 6))
      )
      .withColumn("is_repetitive", $"repetition_ratio" >= 0.2)
      .orderBy($"doc_id")
  }

  // Patterns kept to the Java-regex ∩ RE2 subset so the DuckDB oracle runs
  // the IDENTICAL expressions (no backrefs, no lookaround).
  private val EmailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
  private val PhoneRe = "555-[0-9]{4}"
  private val IpRe    = "10\\.0\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII scrubbing — the redaction pass of a training-data pipeline:
    * detect + replace emails / phone numbers / IPs with typed placeholder
    * tokens, report per-doc match counts and the digest of the scrubbed
    * text. The corpus is synthetic, so deterministic slices get PII
    * appended first (same injection discipline as the dedup queries) and
    * the operator must find exactly those. Pure per-row regex maps —
    * codegen'd, no shuffle, linear at any scale. */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val injected = Tables
      .spread(Tables.documents(spark, sfDir))
      .withColumn(
        "text2",
        concat(
          $"text",
          when($"doc_id" % 7 === 0, concat(lit(" contact user"), $"doc_id", lit("@example.com"))).otherwise(lit("")),
          when($"doc_id" % 11 === 0, concat(lit(" call 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
          when($"doc_id" % 13 === 0, concat(lit(" from 10.0."), ($"doc_id" % 256).cast("string"), lit("."), (($"doc_id" / 7).cast("long") % 256).cast("string"))).otherwise(lit(""))
        )
      )
    injected
      .select(
        $"doc_id",
        size(expr(s"regexp_extract_all(text2, '$EmailRe', 0)")).as("n_emails"),
        size(expr(s"regexp_extract_all(text2, '$PhoneRe', 0)")).as("n_phones"),
        size(expr(s"regexp_extract_all(text2, '$IpRe', 0)")).as("n_ips"),
        md5(
          regexp_replace(
            regexp_replace(regexp_replace($"text2", EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"),
            IpRe,
            "<IP>"
          )
        ).as("scrubbed_md5")
      )
      .orderBy($"doc_id")
  }
}
