package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Kernels
import org.apache.spark.sql.functions._

/** Time-series resampling: regularize each user's event stream onto a daily
  * calendar (gap rows injected via a per-user `sequence` explode) and
  * forward-fill the last observed value across gaps — the standard
  * prepare-for-training resample+ffill. One shuffle on user_id for the
  * window; the calendar explode is a per-row map. */
object TimeSeries {

  def resampleDailyFfill(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables
      .events(spark, sfDir)
      .groupBy($"user_id", to_date($"ts").as("day"))
      // per-day mean on the Det scaled-long grid: a raw double avg's merge
      // order follows the shuffle and can flip the 6th rounded decimal
      .agg(round((sum(Kernels.roundLong($"value" * 1e6)) / 1e6) / count(lit(1)), 6).as("v"))
    val cal = daily
      .groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id", explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window
      .partitionBy($"user_id")
      .orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal
      .join(daily, Seq("user_id", "day"), "left")
      .select(
        $"user_id",
        $"day",
        last($"v", ignoreNulls = true).over(w).as("value_ffill"),
        $"v".isNull.as("was_gap")
      )
      .orderBy($"user_id", $"day")
  }

  /** Declared query (q129): gaps-and-islands streak detection — per-user
    * runs of CONSECUTIVE active days (the classic pattern a training-data
    * pipeline runs for temporal-coverage audits and activity cohorts).
    * Technique: distinct (user, day), then `day - row_number()` within the
    * user is CONSTANT across a consecutive run and strictly drops at every
    * gap — the island key — so streaks reduce to two grouped aggregations.
    * The only window is partitioned by user_id (no global window; the
    * distinct and both groupBys shuffle on user-derived keys), so the plan
    * scales with users, and a user's active-day count is calendar-bounded
    * (~2.5k rows for 7 years) regardless of SF. */
  def userStreaks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tables
      .events(spark, sfDir)
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
    val rn = row_number().over(Window.partitionBy($"user_id").orderBy($"day"))
    d.withColumn("grp", date_sub($"day", rn))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_streaks"),
        max($"len").as("max_streak"),
        sum($"len").as("active_days")
      )
      .orderBy($"user_id")
  }

  /** Mergeable distinct-count sketches (the "novel sketch" surface): one
    * HLL sketch per day, unioned into a single weekly estimate — the
    * pre-aggregate-then-merge pattern that replaces exact distinct at
    * 100 TB. Estimate is engine-specific → the declared output carries the
    * exact count + tolerance boolean for the hash oracle; accuracy vs the
    * exact count is asserted in the test suite. */
  def hllSketchUnion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Oracle-checkable form: per-day DataSketches HLL sketches merged via
    // hll_union_agg (the mergeable-sketch pattern that replaces exact
    // distinct at scale), output = the deterministic exact count + day
    // count + `within_tolerance` (merged estimate within 5% of exact).
    // The oracle replays the exact values with within_tolerance = true.
    val ev = Tables.events(spark, sfDir)
    val merged = ev
      .groupBy(to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
      .agg(
        hll_sketch_estimate(hll_union_agg($"sk")).as("est"),
        count(lit(1)).as("n_days_merged")
      )
    val exact = ev.agg(countDistinct($"user_id").as("distinct_users_exact"))
    merged
      .crossJoin(exact)
      .select(
        $"distinct_users_exact",
        $"n_days_merged",
        (abs($"est" - $"distinct_users_exact") <= $"distinct_users_exact" * 0.05)
          .as("within_tolerance")
      )
  }
}
