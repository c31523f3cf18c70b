package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule must rewrite the declarative dot-product
  * pattern into the compiled kernel call — same values, kernelized plan. */
class GraftExtensionsSpec extends SparkSpec {

  private def declarativeDot = {
    import spark.implicits._
    Tables
      .embeddings(spark, sf)
      .limit(50)
      .select(
        $"vec_id",
        aggregate(
          zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0),
          (acc, v) => acc + v
        ).as("dot")
      )
  }

  test("KernelizeDotProduct rewrites aggregate(zip_with(...)) to the kernel StaticInvoke") {
    val optimized = declarativeDot.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dotFF"), s"kernel call missing from plan:\n$optimized")
    assert(!optimized.contains("aggregate("), "declarative form should be gone")
  }

  test("rewrite preserves values bit-exactly vs the direct kernel") {
    import spark.implicits._
    val viaRule = declarativeDot
    val direct = Tables
      .embeddings(spark, sf)
      .limit(50)
      .select($"vec_id", graft.functions.Kernels.dot($"embedding", $"embedding").as("dot"))
    assert(viaRule.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(viaRule).count() === 0)
  }

  test("non-matching aggregates are left untouched") {
    import spark.implicits._
    val other = Tables
      .embeddings(spark, sf)
      .limit(5)
      .select(
        aggregate(transform($"embedding", x => x.cast("double")), lit(1.0), (a, v) => a * v).as("prod")
      )
    // different zero/shape: must still evaluate (no mis-rewrite crash)
    assert(other.count() === 5)
    assert(!other.queryExecution.optimizedPlan.toString.contains("dotFF"))
  }
}
