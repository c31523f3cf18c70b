package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join (the checklist's bucketing row, and the 100 TB
  * story for repeated big-big joins): both sides written bucketed by the
  * join key join WITHOUT a shuffle exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with no shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    Tables
      .lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity")
      .write
      .bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .mode("overwrite")
      .saveAsTable("li_b")
    Tables
      .orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
      .write
      .bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey")
      .mode("overwrite")
      .saveAsTable("ord_b")

    val joined = spark
      .table("li_b")
      .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q"), max($"o_totalprice").as("p"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // and it computes the same result as the plain-parquet join
    val plain = Tables
      .lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q"), max($"o_totalprice").as("p"))
    assert(joined.exceptAll(plain).count() === 0 && plain.exceptAll(joined).count() === 0)
  }
}
