package graft

import graft.operators.{Dedup, Text}
import graft.functions.TextFns.h60
import org.apache.spark.sql.functions._

/** Capstone integration: the LLM-training-data pipeline composed from the
  * engine's own operators, the way a user would write it —
  *
  *   corpus → exact dedup (survivors) → quality gate → language filter →
  *   deterministic shard assignment → shard-partitioned parquet → audit
  *
  * Asserts the end state: no duplicate content in the output, every row
  * passes the gates, shards balanced, write round-trips. */
class TrainingPipelineSpec extends SparkSpec {

  test("dedup -> quality -> lang -> shard -> write round-trips coherently") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_train").toString

    // 1. dedup: survivors of the duplicate-injected corpus
    val survivors = Dedup.exactDedup(spark, sf).select($"survivor_id".as("doc_id"))
    val docs = Dedup.docsWithDups(spark, sf).join(survivors, "doc_id")

    // 2-3. quality + language gates (reusing the pack's scoring exprs)
    val scored = Text.qualityScore(spark, sf).select($"doc_id", $"quality")
    val lang   = Text.langId(spark, sf).select($"doc_id", $"pred_lang")
    val gated = docs
      .join(scored, "doc_id")
      .join(lang, "doc_id")
      .filter($"quality" >= 0.5 && $"pred_lang" === "en")

    // 4. deterministic shards
    val sharded = gated.withColumn(
      "shard",
      h60(concat(lit("shard:"), $"doc_id".cast("string"))) % 8
    )

    // 5. shard-partitioned write + re-read audit
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out)
    val back = spark.read.parquet(out).cache()

    assert(back.count() > 0, "pipeline must keep rows")
    assert(back.groupBy(md5($"text")).count().filter($"count" > 1).count() === 0,
      "no duplicate content may survive")
    assert(back.filter($"quality" < 0.5).count() === 0)
    assert(back.select($"shard").distinct().count() === 8, "all shards populated")
    val sizes = back.groupBy($"shard").count().select($"count").as[Long].collect()
    assert(sizes.max.toDouble / sizes.min <= 3.0, s"shards roughly balanced: ${sizes.toSeq}")
    assert(back.count() === gated.count(), "write round-trip preserves row count")
  }
}
