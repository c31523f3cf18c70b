package graft

import org.apache.spark.sql.functions._

/** The custom DataSource V2 connector: partition planning, deterministic
  * content, and column pruning pushed into the scan. */
class Dsv2SourceSpec extends SparkSpec {

  private def read(rows: Long, parts: Int) =
    spark.read
      .format("graft.sources.dsv2.SyntheticEventsSource")
      .option("rows", rows)
      .option("partitions", parts)
      .load()

  test("source produces the requested rows across the requested partitions") {
    import spark.implicits._
    val df = read(1000, 8)
    assert(df.count() === 1000)
    assert(df.select(spark_partition_id()).distinct().count() === 8)
    // deterministic content: same read twice is identical
    assert(read(1000, 8).exceptAll(df).count() === 0)
  }

  test("column pruning reaches the connector (ReadSchema shrinks)") {
    import spark.implicits._
    val pruned = read(100, 2).select($"event_type")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("event_type") && !plan.contains("ts_us"),
      s"scan must read only the required column:\n$plan")
    assert(pruned.distinct().count() === 5)
  }

  test("connector output joins with the relational core like any table") {
    import spark.implicits._
    val agg = read(500, 4)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type")
      .collect()
    assert(agg.length === 5 && agg.map(_.getLong(1)).sum === 500)
  }
}
