package graft.operators

import graft.Tables
import graft.functions.TextFns.h60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data sharding operators: deterministic shard assignment and a
  * reproducible global shuffle order — the materialization step of a
  * training pipeline (write N shard files in a fixed pseudo-random order,
  * identically on every rerun and every engine).
  *
  * Both key off the md5-derived hash so the DuckDB oracle reproduces them
  * exactly; engine-native hash functions would not be portable. At scale:
  * shard assignment is a per-row map (no shuffle until the write
  * partitions by shard), and the deterministic shuffle's top-k cut is a
  * TakeOrderedAndProject — per-partition heaps merged on the driver, never
  * a full global sort or an unpartitioned window.
  */
object Sharding {

  /** Deterministic shard id per document + per-shard audit stats. */
  def shardAssignment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .withColumn("shard", h60(concat(lit("shard:"), $"doc_id".cast("string"))) % 16)
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc")
      )
      .orderBy($"shard")
  }

  /** Deterministic train/val/test split (90/5/5 by key hash) — the standard
    * leakage-safe split: assignment depends only on the key, so it is stable
    * across reruns, engines, and data reshuffles. */
  def trainValTestSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .withColumn("h", h60(concat(lit("split:"), $"doc_id".cast("string"))) % 100)
      .withColumn(
        "split",
        when($"h" < 90, "train").when($"h" < 95, "val").otherwise("test")
      )
      .groupBy($"split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_doc")
      )
      .orderBy($"split")
  }

  /** Deterministic stratified sample: the first `k` documents of every
    * language stratum in md5-hash order — "same N examples per class on
    * every run and every engine". The rank window partitions by the
    * stratum, so it parallelizes across strata (never a global window);
    * at scale this is one shuffle on the stratum key. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = 20
    val w = Window
      .partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    Tables
      .documents(spark, sfDir)
      .select($"doc_id", $"lang")
      .withColumn("pos", row_number().over(w))
      .filter($"pos" <= k)
      .select($"lang", $"pos", $"doc_id")
      .orderBy($"lang", $"pos")
  }

  /** Reproducible global shuffle: order documents by their key hash (a
    * fixed pseudo-random permutation), emit the first 100 positions.
    *
    * Scale shape: the cut happens FIRST via `orderBy().limit(100)` — Spark
    * plans a TakeOrderedAndProject (per-partition top-k + merge of 100-row
    * heaps, no global sort, no full-table single-partition window). Only the
    * surviving 100 rows flow through the numbering window, so its
    * single-partition frame is bounded by the constant k, not the data. For
    * an UNBOUNDED global rank the two-pass bucket prefix sum in
    * [[Chunking.packSequences]] is the pattern to reuse. */
  def deterministicShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val top = Tables
      .documents(spark, sfDir)
      .select($"doc_id", md5($"doc_id".cast("string")).as("hk"))
      .orderBy($"hk", $"doc_id")
      .limit(100)
    top
      .withColumn("pos", row_number().over(Window.orderBy($"hk", $"doc_id")))
      .select($"pos", $"doc_id")
      .orderBy($"pos")
  }
}
