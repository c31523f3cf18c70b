package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Single place that pins the settings every entry point (Verify, Bench,
  * tests) must share for oracle parity and local-mode sanity:
  *   - UTC session time zone (DuckDB hashes must agree on timestamps)
  *   - shuffle partitions sized to the local core count, not the 200 default
  *   - AQE on (runtime coalescing / skew-join handling — the 100 TB story)
  *   - `nanosAsLong` so the ns-precision `events.ts` parquet column loads
  *     (Spark has no TIMESTAMP(NANOS) type; see Tables.events for the cast)
  */
object Session {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(master: String = s"local[$cpus]", appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the parity configs to an externally-built session (the driver
    * may smoke-call `SparkEntry.entry` with its own session). Best-effort:
    * anything static in that session is skipped rather than failed. */
  def tune(spark: SparkSession): SparkSession = {
    def trySet(k: String, v: String): Unit =
      try spark.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    trySet("spark.sql.session.timeZone", "UTC")
    // events.ts is parquet TIMESTAMP(NANOS); without this the read fails
    trySet("spark.sql.legacy.parquet.nanosAsLong", "true")
    // µs-precision fixtures carry isAdjustedToUTC=false; read them as plain
    // TimestampType (UTC session) so values match DuckDB's naive read
    trySet("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark
  }
}
