package graft

import graft.functions.{Kernels, TextFns}
import org.apache.spark.sql.functions._

/** Kernel edge cases: empty arrays, null inputs, sub-n-gram token counts. */
class KernelEdgeSpec extends SparkSpec {

  test("md5Array60 on empty array yields empty; null propagates") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, Some(Seq("a"))),
      (3L, None)
    ).toDF("id", "arr")
    val out = df.select($"id", Kernels.md5Array60($"arr").as("h")).orderBy($"id").collect()
    assert(out(0).getSeq[Long](1) === Seq.empty)
    assert(out(1).getSeq[Long](1).length === 1)
    assert(out(2).isNullAt(1))
  }

  test("shingleHashes with fewer than n tokens yields empty array") {
    import spark.implicits._
    val df = Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq.empty[String]).toDF("toks")
    val out = df.select(size(Kernels.shingleHashes($"toks", 3)).as("n")).as[Int].collect()
    assert(out.toSeq === Seq(0, 1, 0))
  }

  test("minhashSigK on empty base hashes yields k null lanes") {
    import spark.implicits._
    val df = Seq(Seq.empty[Long]).toDF("hs")
    val row = df.select(Kernels.minhashSigK($"hs", 4, TextFns.MinhashP).as("sig")).head()
    val sig = row.getSeq[Any](0)
    assert(sig.length === 4 && sig.forall(_ == null))
  }

  test("dot kernel on empty vectors is 0.0; simhash of no tokens is 0") {
    import spark.implicits._
    val df = Seq((Seq.empty[Float], Seq.empty[Long])).toDF("v", "hs")
    val row = df.select(Kernels.dot($"v", $"v"), Kernels.simhash($"hs")).head()
    assert(row.getDouble(0) === 0.0)
    assert(row.getLong(1) === 0L)
  }

  test("chunking expressions handle docs shorter than the window") {
    import spark.implicits._
    // replicate chunkDocuments' start-sequence + slice on a 2-token doc
    val df = Seq(Seq("a", "b")).toDF("toks")
    val out = df
      .withColumn("starts", sequence(lit(1), greatest(size($"toks") - 32 + 1, lit(1)), lit(16)))
      .select(explode($"starts").as("st"), $"toks")
      .select(slice($"toks", $"st", lit(32)).as("chunk"))
      .collect()
    assert(out.length === 1)
    assert(out(0).getSeq[String](0) === Seq("a", "b"), "whole short doc becomes one chunk")
  }
}
