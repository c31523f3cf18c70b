package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range temporal joins — operators Spark lacks natively
  * (SURVEY.md §2.2 join row), composed from built-ins so they stay
  * shuffle-minimal at scale:
  *
  *   - as-of: the union-sort trick — tag both sides, sort once per key by
  *     (ts, tag), carry the last left-side value forward with an ignoreNulls
  *     window. ONE shuffle on the key, no join at all; this is the plan
  *     you'd want at 100 TB (a naive inequality join is O(n·m) per key).
  *   - range ("events within preceding interval"): a RANGE window frame over
  *     epoch micros — again one shuffle, no self-join blow-up.
  */
object AsOf {

  /** For each purchase event: the most recent view at-or-before it by the
    * same user (timestamp and id carried). Null when no prior view. */
  def lastViewBeforePurchase(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val views     = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id", lit(0).as("tag"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", lit(1).as("tag"))
    // tag 0 sorts before tag 1 at equal ts → a view at the same instant counts
    val w = Window
      .partitionBy($"user_id")
      .orderBy($"ts", $"tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views
      .unionByName(purchases)
      .withColumn("last_view_ts", last(when($"tag" === 0, $"ts"), ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select(
        $"event_id",
        $"user_id",
        unix_micros($"ts").as("ts_us"),
        unix_micros($"last_view_ts").as("last_view_ts_us")
      )
      .orderBy($"event_id")
  }

  /** Interval-overlap join: gap-based user sessions (30-min inactivity)
    * joined against the calendar days they overlap — a session spanning
    * midnight lands in both days. The day side is tiny and broadcast; the
    * overlap predicate (start < day_end AND end > day_start) is the residual
    * condition — the standard interval-join shape. */
  def sessionDayOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sessions = graft.streaming.Streaming.sessionize(Tables.events(spark, sfDir))
    val days = Tables
      .events(spark, sfDir)
      .select(to_date($"ts").as("day"))
      .distinct()
      .withColumn("day_start_us", unix_micros($"day".cast("timestamp")))
      .withColumn("day_end_us", $"day_start_us" + 86400000000L)
    sessions
      .join(
        broadcast(days),
        $"session_start_us" < $"day_end_us" && $"session_end_us" > $"day_start_us"
      )
      .groupBy($"day")
      .agg(count(lit(1)).as("n_sessions"), countDistinct($"user_id").as("n_users"))
      .orderBy($"day")
  }

  /** The BIG-BIG scale path for the same interval-overlap semantics as
    * [[sessionDayOverlap]]: when NEITHER side of an interval join is
    * broadcastable (two interval tables that both scale with the data),
    * the standard plan is BINNING — explode each interval into the
    * fixed-width bins it covers (here: calendar days, bin = µs div 86.4e9)
    * and EQUI-JOIN on the bin id with the overlap predicate as residual.
    * Each (interval, bin) pair appears exactly once, the join is a hash
    * shuffle both sides (hinted, so the plan demonstrates the big-big
    * shape rather than letting AQE broadcast the small fixture side), and
    * the explode factor is interval-length/bin-width — bounded by choosing
    * the bin at the expected interval scale. Declared with the IDENTICAL
    * oracle as q35: two physical plans, one hash-checked semantics. */
  def sessionDayOverlapBinned(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val D        = 86400000000L
    val sessions = graft.streaming.Streaming.sessionize(Tables.events(spark, sfDir))
    val days = Tables
      .events(spark, sfDir)
      .select(to_date($"ts").as("day"))
      .distinct()
      .withColumn("day_start_us", unix_micros($"day".cast("timestamp")))
      .withColumn("day_end_us", $"day_start_us" + D)
      .withColumn("day_bin", expr(s"day_start_us div ${D}L"))
    // covered bins: [start div D, (end-1) div D] — end is exclusive and
    // strictly > start (sessions close at last-event + gap), so a session
    // ending exactly at midnight stays out of the new day, matching the
    // strict end > day_start overlap predicate
    val binned = sessions.withColumn(
      "day_bin",
      explode(expr(s"sequence(session_start_us div ${D}L, (session_end_us - 1) div ${D}L)"))
    )
    binned
      .hint("shuffle_hash")
      .join(days.hint("shuffle_hash"), Seq("day_bin"))
      .filter($"session_start_us" < $"day_end_us" && $"session_end_us" > $"day_start_us")
      .groupBy($"day")
      .agg(count(lit(1)).as("n_sessions"), countDistinct($"user_id").as("n_users"))
      .orderBy($"day")
  }

  /** For each purchase: how many views the same user made in the preceding
    * hour (exclusive of the purchase instant) — a range join expressed as a
    * RANGE window frame, one shuffle total. */
  def viewsInPrecedingHour(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables
      .events(spark, sfDir)
      .filter($"event_type".isin("view", "purchase"))
      .withColumn("ts_us", unix_micros($"ts"))
    val w = Window
      .partitionBy($"user_id")
      .orderBy($"ts_us")
      .rangeBetween(-3600L * 1000 * 1000, -1L)
    ev.withColumn(
        "n_views_prior_hour",
        coalesce(sum(when($"event_type" === "view", 1L)).over(w), lit(0L))
      )
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"n_views_prior_hour")
      .orderBy($"event_id")
  }
}
