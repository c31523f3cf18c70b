package graft

import org.apache.spark.sql.functions._

/** CLI entry point — the reference's Bootstrap.main UX (SURVEY.md O15):
  * discover the top event types in the recent window, pick one, run the
  * full export pipeline, report counts.
  *
  * Usage:
  *   runMain graft.Cli --sf-dir /root/testdata/sf0.001 --out /tmp/graft_cli \
  *     [--event-type purchase] [--window-days 7] [--top 10] [--interactive true]
  *
  * Two selection modes, both reference-faithful:
  *   - flag-driven (default): `--event-type`, else the biggest bucket
  *     (the reference's default-to-first on empty input, Bootstrap.java:285)
  *   - `--interactive true`: real prompts — window days (empty → 7,
  *     Bootstrap.java:95-106) and the numbered bucket menu in the
  *     reference's exact layout (`* [0]: name  || doc count:N`,
  *     Bootstrap.java:154-180), empty → first, out-of-range → abort.
  * The prompt functions take an injected line reader so tests can script a
  * session (CliSpec).
  */
object Cli {

  /** One-line integer prompt, empty input → default (Bootstrap.java:95-106). */
  private[graft] def promptInt(readLine: () => String, msg: String, default: Int): Int = {
    println(s"[cli] $msg")
    val line = Option(readLine()).getOrElse("")
    if (line.trim.isEmpty) { println(s"[cli] No input found. Using default: $default"); default }
    else line.trim.toInt
  }

  /** The reference's selection menu (Bootstrap.java:154-180): print
    * `* [0]: name  || doc count:N` rows, read one line; empty → first item,
    * a number → that index, out-of-range → None (the reference returns
    * null). */
  private[graft] def select(items: Seq[(String, Long)], readLine: () => String): Option[String] = {
    items.zipWithIndex.foreach { case ((name, n), i) =>
      val star = if (i == 0) "*" else " "
      println(s"$star [$i]: $name  || doc count:$n")
    }
    val line = Option(readLine()).getOrElse("")
    if (line.trim.isEmpty) items.headOption.map(_._1)
    else {
      val choice = line.trim.toInt
      items.lift(choice).map(_._1)
    }
  }

  def main(args: Array[String]): Unit = {
    val opts = args
      .sliding(2, 2)
      .collect { case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }
      .toMap
    val sfDir       = opts.getOrElse("sf-dir", "/root/testdata/sf0.001")
    val out         = opts.getOrElse("out", "/tmp/graft_cli_export")
    val interactive = opts.get("interactive").exists(_.toBoolean)
    val stdinLine   = () => scala.io.StdIn.readLine()
    val windowDays =
      if (interactive) promptInt(stdinLine, "Days of events to export (empty = 7):", 7)
      else opts.getOrElse("window-days", "7").toInt
    val topK = opts.getOrElse("top", "10").toInt

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
      // Selection: interactive menu, else argument, else the top bucket
      // (reference default-to-first).
      val chosen =
        if (interactive)
          select(buckets.toSeq.map(r => r.getString(0) -> r.getLong(1)), stdinLine)
            .getOrElse(sys.error("invalid selection"))
        else opts.getOrElse("event-type", buckets.head.getString(0))
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
