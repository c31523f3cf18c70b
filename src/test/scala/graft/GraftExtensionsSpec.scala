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

  test("nullable-element arrays route to the checked kernel and null-poison") {
    import spark.implicits._
    // element arrays built via array() of nullable exprs → containsNull=true
    // (spark.range, not a local Seq — a LocalRelation would constant-fold
    // the whole query away before the plan can be inspected)
    val df = spark
      .range(2)
      .select(
        array(
          when($"id" > 0, $"id".cast("float")), // null for row id=0
          lit(2.0f)
        ).as("v")
      )
      .select(
        aggregate(
          zip_with($"v", $"v", (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0),
          (acc, p) => acc + p
        ).as("dot")
      )
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dotFFChecked"), s"checked kernel expected:\n$optimized")
    val rows = df.orderBy($"dot".asc_nulls_first).collect()
    assert(rows(0).isNullAt(0), "null element must null the aggregate")
    assert(rows(1).getDouble(0) === (1.0 + 4.0))
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
