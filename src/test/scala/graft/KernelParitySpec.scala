package graft

import graft.functions.{Kernels, TextFns}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The compiled kernels must be value-identical to the declarative
  * formulations they replaced (and therefore to the DuckDB oracle SQL).
  * Property-checked over generated strings/vectors plus real corpus data. */
class KernelParitySpec extends SparkSpec {

  private val asciiWord: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  /** Deterministic samples from a Gen (raw scalacheck, fixed seed). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("md5Array60 kernel == conv(substr(md5(x),1,15),16,10) declarative form") {
    import spark.implicits._
    val wordLists = samples(Gen.listOfN(20, asciiWord), 10)
    wordLists.foreach { words =>
      val df = Seq(words).toDF("arr")
      val row = df
        .select(
          Kernels.md5Array60($"arr").as("k"),
          transform($"arr", x => TextFns.h60(x)).as("d")
        )
        .head()
      assert(row.getSeq[Long](0) === row.getSeq[Long](1))
    }
  }

  test("md5Array60 mod-p variant matches declarative mod") {
    import spark.implicits._
    val words = Seq("the fast key", "spark sql engine", "ünïcödé tøkens", "", "a")
    val row = Seq(words)
      .toDF("arr")
      .select(
        Kernels.md5Array60($"arr", TextFns.MinhashP).as("k"),
        transform($"arr", x => TextFns.h60(x) % TextFns.MinhashP).as("d")
      )
      .head()
    assert(row.getSeq[Long](0) === row.getSeq[Long](1))
  }

  test("shingleHashes kernel == md5Array60(shingles3(tokens)) on the corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
    val cmp = docs.select(
      Kernels.shingleHashes(TextFns.tokens($"text"), 3, TextFns.MinhashP).as("k"),
      transform(TextFns.shingles3(TextFns.tokens($"text")), x => TextFns.h60(x) % TextFns.MinhashP).as("d")
    )
    assert(cmp.filter(!($"k" === $"d")).count() === 0)
  }

  test("minhashSigK kernel == affine transform/array_min formulation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
    val hs = docs.select(
      Kernels.shingleHashes(TextFns.tokens($"text"), 3, TextFns.MinhashP).as("hs")
    )
    val cmp = hs.select(
      Kernels.minhashSigK($"hs", 16, TextFns.MinhashP).as("k"),
      TextFns.minhashSigFromHashes($"hs", 16).as("d")
    )
    assert(cmp.filter(!($"k" === $"d")).count() === 0)
  }

  test("dot kernel == aggregate(zip_with(...)) IEEE-exactly on embeddings") {
    import spark.implicits._
    // Exclude the KernelizeDotProduct rewrite for the declarative branch —
    // otherwise the session extension rewrites it into the very kernel under
    // test and the comparison is vacuous.
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.KernelizeDotProduct")
    try {
      val e = Tables.embeddings(spark, sf).limit(100)
      val cmp = e.select(
        Kernels.dot($"embedding", $"embedding").as("k"),
        aggregate(
          zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0),
          (a, v) => a + v
        ).as("d")
      )
      // the declarative branch must really be the interpreted HOF path
      val physical = cmp.queryExecution.executedPlan.toString
      assert(physical.contains("aggregate("), s"declarative branch was rewritten away:\n$physical")
      // bit-exact: same element order, same double ops
      assert(cmp.filter($"k" =!= $"d").count() === 0)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("dot kernel nulls on length mismatch, matching zip_with null-pad semantics") {
    import spark.implicits._
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.KernelizeDotProduct")
    try {
      val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      val row = df
        .select(
          Kernels.dot($"a", $"b").as("k"),
          aggregate(
            zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0),
            (acc, v) => acc + v
          ).as("d")
        )
        .head()
      assert(row.isNullAt(0), "kernel must return null for unequal lengths")
      assert(row.isNullAt(1), "declarative form must return null for unequal lengths")
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }
}
