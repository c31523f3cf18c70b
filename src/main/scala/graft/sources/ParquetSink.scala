package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet sink + write audit (SURVEY.md O12/O14).
  *
  * The reference writes one parquet file per (rule, index) with a hand-rolled
  * record counter (EsParquetWriter.java:43-97, summed at Bootstrap.java:
  * 318-334). Spark-first: `partitionBy(day)` replaces per-index files, the
  * commit protocol replaces silent per-record loss, and the audit is a
  * group-count over the re-read output — verifying the files actually
  * round-trip, not just that a counter incremented.
  */
object ParquetSink {

  /** Write `df` partitioned by `day` (derived from ts) and return the
    * re-read audit: rows per day partition. */
  def writePartitionedWithAudit(
      spark: SparkSession,
      df: DataFrame,
      outDir: String
  ): DataFrame = {
    import spark.implicits._
    df.withColumn("day", to_date($"ts"))
      .write
      .mode("overwrite")
      .partitionBy("day")
      .parquet(outDir)
    spark.read
      .parquet(outDir)
      .groupBy($"day")
      .agg(count(lit(1)).as("n"))
  }

  /** Declared query: export events filtered to one type (the reference's
    * per-rule slice, EsParquetWriter.java:69) partitioned by day, re-read,
    * audit counts per partition. */
  def sinkAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val out = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_sink_audit"
    val ev  = Tables.events(spark, sfDir).filter($"event_type" === "purchase")
    writePartitionedWithAudit(spark, ev, out).orderBy($"day")
  }
}
