package graft

import graft.operators.{Dedup, Sharding, Similarity, Sketch, Vocab}
import org.apache.spark.sql.functions._

/** Semantic properties of the round-3 corpus-engineering pack that the
  * row-hash oracle can't express: span recovery, CMS no-undercount,
  * mixture-cap equality, A-ES top-k equivalence, quantization round-trip. */
class Round3OpsSpec extends SparkSpec {

  test("span dedup recovers every window of an injected duplicate doc") {
    import spark.implicits._
    val out = Dedup.spanDedup(spark, sf).cache()
    assert(out.filter($"n_docs" < 2).count() === 0)
    assert(out.filter($"n_occ" < $"n_docs").count() === 0)
    // the smallest injected doc with >= 16 tokens: every one of its spans
    // exists in the duplicate copy, so all must be reported
    val probe = Tables
      .documents(spark, sf)
      .filter($"doc_id" % 10 === 0 && size(split($"text", " ")) >= 16)
      .orderBy($"doc_id")
      .limit(1)
      .select($"doc_id", split($"text", " ").as("toks"))
    val spans = probe
      .select(
        explode(
          transform(
            sequence(lit(1), size($"toks") - 15),
            i => md5(concat_ws(" ", slice($"toks", i, lit(16))))
          )
        ).as("span_md5")
      )
      .distinct()
    val missing = spans.join(out, Seq("span_md5"), "left_anti")
    assert(missing.count() === 0, "all spans of a duplicated doc are flagged")
  }

  test("domain mixture caps every source at the min source count") {
    import spark.implicits._
    val out  = Sharding.domainMixture(spark, sf).cache()
    val srcs = Tables.documents(spark, sf).groupBy($"source").count()
    val cap  = srcs.agg(min($"count")).head().getLong(0)
    assert(out.count() === srcs.count(), "every source survives")
    assert(out.filter($"n_kept" =!= cap).count() === 0, "uniform cap")
  }

  test("tf-idf ranks are dense, bounded, and score-monotone per doc") {
    import spark.implicits._
    val out = Vocab.tfidfTopTerms(spark, sf).cache()
    assert(out.filter($"rk" < 1 || $"rk" > 3).count() === 0)
    val bad = out
      .groupBy($"doc_id")
      .agg(
        max(when($"rk" === 1, $"tfidf")).as("s1"),
        max(when($"rk" === 2, $"tfidf")).as("s2"),
        max(when($"rk" === 3, $"tfidf")).as("s3")
      )
      .filter($"s1" < $"s2" || $"s2" < $"s3")
    assert(bad.count() === 0, "per-doc scores non-increasing in rank")
  }

  test("count-min sketch never undercounts and matches exact counts") {
    import spark.implicits._
    val out = Sketch.cmsHeavyHitters(spark, sf).cache()
    assert(out.count() === 10)
    assert(out.filter($"overcount" < 0).count() === 0, "CMS guarantee: est >= exact")
    val exact = Tables
      .spread(Tables.documents(spark, sf))
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("true_cnt"))
    val mismatch = out.join(exact, Seq("token")).filter($"exact" =!= $"true_cnt")
    assert(mismatch.count() === 0, "candidate counts are the exact counts")
  }

  test("CMS sketches merge: half-corpus sketches sum to the full sketch") {
    import spark.implicits._
    def toks(filter: org.apache.spark.sql.Column) =
      Tables
        .documents(spark, sf)
        .filter(filter)
        .select(explode(split($"text", " ")).as("token"))
    val full = Sketch.cmsSketchOf(toks(lit(true)))
    val merged = Sketch
      .cmsSketchOf(toks($"doc_id" % 2 === 0))
      .unionByName(Sketch.cmsSketchOf(toks($"doc_id" % 2 === 1)))
      .groupBy($"j", $"b")
      .agg(sum($"c").as("c"))
    assert(full.except(merged).count() === 0 && merged.except(full).count() === 0)
  }

  test("incremental dedup: verbatim re-ingests exact, truncated near, rest kept") {
    import spark.implicits._
    val out = Dedup.incrementalDedup(spark, sf).cache()
    // every verbatim re-ingested doc must be flagged exact
    val exactIds = Tables
      .documents(spark, sf)
      .filter($"doc_id" % 7 === 3)
      .select(($"doc_id" + 2000000L).as("new_id"))
    val misExact =
      exactIds.join(out.filter($"verdict" =!= "exact_dup"), Seq("new_id"))
    assert(misExact.count() === 0, "all verbatim re-ingests detected as exact")
    // truncated docs with enough shingles must be flagged (exact or near);
    // near-verdict docs must exist (the truncation makes them non-exact)
    assert(out.filter($"verdict" === "near_dup").count() > 0)
    val truncatedLong = Tables
      .documents(spark, sf)
      .filter($"doc_id" % 13 === 5 && size(split($"text", " ")) >= 30)
      .select(($"doc_id" + 3000000L).as("new_id"))
    val missedNear = truncatedLong.join(out.filter($"verdict" === "kept"), Seq("new_id"))
    assert(missedNear.count() === 0, "long truncated docs are containment-caught")
  }

  test("weighted sample equals the brute-force A-ES top-20") {
    import spark.implicits._
    import graft.functions.TextFns.h60
    val out = Sharding.weightedSample(spark, sf)
    val brute = Tables
      .documents(spark, sf)
      .select(
        $"doc_id",
        size(split($"text", " ")).cast("long").as("n_toks"),
        h60($"doc_id".cast("string")).as("h")
      )
      .withColumn("u", ($"h" + 1).cast("double") / lit(1152921504606846976.0d))
      .withColumn("key6", round(log($"u") / $"n_toks" * 1e6).cast("long"))
      .orderBy($"key6".desc, $"doc_id")
      .limit(20)
      .select($"doc_id")
    assert(out.count() === 20)
    assert(out.select($"doc_id").except(brute).count() === 0, "same winner set")
  }

  test("int8 quantization codes are in range and reconstruct the max dim") {
    import spark.implicits._
    val e = Tables
      .embeddings(spark, sf)
      .select(
        $"vec_id",
        transform(
          $"embedding",
          x =>
            round(
              x.cast("double") * 127.0 /
                array_max(transform($"embedding", y => abs(y.cast("double"))))
            ).cast("int")
        ).as("q")
      )
      .select($"vec_id", $"q", array_max(transform($"q", abs(_))).as("amax"))
    // symmetric int8: |code| <= 127 everywhere, and the max-|x| dim hits 127
    assert(e.filter($"amax" =!= 127).count() === 0)
    val out   = Similarity.quantizeEmbeddings(spark, sf)
    val total = Tables.embeddings(spark, sf).count()
    assert(out.count() === total)
    assert(out.filter($"l1_q" > 127L * 64).count() === 0)
    // digest parity with the independently recomputed codes
    val recomputed = e.select($"vec_id", md5(concat_ws(",", transform($"q", _.cast("string")))).as("q_md5"))
    assert(out.select($"vec_id", $"q_md5").except(recomputed).count() === 0)
  }
}
