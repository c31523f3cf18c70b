package graft.operators

import graft.functions.TextFns.h60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-data pipeline as ONE declared, oracle-checked
  * query — the capstone that proves the operators compose as plain
  * DataFrames: quality-gate ([[Text.qualityScore]]) → benchmark
  * decontamination ([[Dedup.decontaminate]], anti-join) → deterministic
  * sharding ([[Sharding]] hash) → per-shard audit stats.
  *
  * Scale shape: the quality gate is per-row; decontamination is the
  * broadcast-eval inverted-index join; the anti-join streams the corpus
  * against the (small) contaminated-id set; sharding is a per-row hash; the
  * only corpus-wide shuffle is the final 16-group aggregate. */
object Training {

  def trainingPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val quality = Text
      .qualityScore(spark, sfDir)
      .select($"doc_id", $"quality", $"n_tokens")
    val contaminated = Dedup
      .decontaminate(spark, sfDir)
      .filter($"contaminated")
      .select($"train_id".as("doc_id"))
    quality
      .filter($"quality" >= 0.5)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("shard", h60(concat(lit("shard:"), $"doc_id".cast("string"))) % 16)
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("sum_tokens"),
        min($"doc_id").as("min_doc")
      )
      .orderBy($"shard")
  }
}
