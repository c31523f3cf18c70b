package graft

import org.apache.spark.sql.functions._

/** CLI entry point — the reference's Bootstrap.main UX (SURVEY.md O15),
  * non-interactive: discover the top event types in the recent window,
  * pick one (argument or the top bucket, mirroring the reference's
  * default-to-first menu), run the full export pipeline, report counts.
  *
  * Usage:
  *   runMain graft.Cli --sf-dir /root/testdata/sf0.001 --out /tmp/graft_cli \
  *     [--event-type purchase] [--window-days 7] [--top 10]
  *
  * Flags mirror the reference's prompts: window days default 7
  * (Bootstrap.java:98), top-k buckets default 10 (:211), selection defaults
  * to the biggest bucket (:285-286 default-to-first).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val opts = args
      .sliding(2, 2)
      .collect { case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }
      .toMap
    val sfDir      = opts.getOrElse("sf-dir", "/root/testdata/sf0.001")
    val out        = opts.getOrElse("out", "/tmp/graft_cli_export")
    val windowDays = opts.getOrElse("window-days", "7").toInt
    val topK       = opts.getOrElse("top", "10").toInt

    val spark = Session.build(appName = "graft-cli")
    try {
      // Discovery: the reference's terms aggregation (O3).
      val buckets = Tables
        .events(spark, sfDir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("doc_count"))
        .orderBy(col("doc_count").desc, col("event_type"))
        .limit(topK)
        .collect()
      println(s"[cli] event types in $sfDir (top $topK):")
      buckets.zipWithIndex.foreach { case (r, i) =>
        println(s"[cli]   ${i + 1}. ${r.getString(0)}  (${r.getLong(1)} docs)")
      }
      // Selection: argument, else the top bucket (reference default-to-first).
      val chosen = opts.getOrElse("event-type", buckets.head.getString(0))
      println(s"[cli] exporting event_type='$chosen', last $windowDays days -> $out")

      val audit = Pipeline.exportByType(spark, sfDir, out, chosen, windowDays).collect()
      val total = audit.map(_.getAs[Long]("n_rows")).sum
      val dead  = audit.map(_.getAs[Long]("n_dead")).sum
      audit.foreach(r =>
        println(s"[cli]   ${r.getAs[java.sql.Date]("day")}: ${r.getAs[Long]("n_rows")} rows")
      )
      println(s"[cli] done: $total rows exported, $dead dead-lettered, schema at $out/schema.json")
    } finally spark.stop()
  }
}
