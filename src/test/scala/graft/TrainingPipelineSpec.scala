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

  test("release capstone v2: funnel monotone, span surgery fires, decontam bounded") {
    import spark.implicits._
    val out = graft.operators.Curation.corpusReleaseV2(spark, sf).cache()
    // per-source funnel counts can only shrink stage to stage
    assert(out.filter($"n_quality" > $"n_raw").count() === 0)
    assert(out.filter($"n_import" > $"n_quality").count() === 0)
    assert(out.filter($"n_exact" > $"n_import").count() === 0)
    assert(out.filter($"n_final" > $"n_exact").count() === 0)
    // the stitched-doc slice guarantees duplication REACHES the span stage
    // (quality passes it, exact dedup passes it, the LSH gate mostly passes
    // it) — a silently no-op surgery would zero these
    val Seq(spanDocs, toksRemoved) =
      out.agg(sum($"n_span_docs"), sum($"toks_removed")).head().toSeq.map(_.asInstanceOf[Long])
    assert(spanDocs > 0, "span removal must touch documents on the stitch-augmented corpus")
    assert(toksRemoved >= spanDocs * 15L, "each cut span removes at least L tokens")
    // split inventory sums to the release; verdicts stay within the bench
    assert(out.filter($"n_train" + $"n_val" + $"n_test" =!= $"n_final").count() === 0)
    assert(out.filter($"n_contam" > $"n_bench").count() === 0)
    assert(out.filter($"n_span_docs" > $"n_final").count() === 0)
    out.unpersist()
  }
}
