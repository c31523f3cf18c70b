package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run the headline queries on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Each query is materialized through the `noop` sink — `count()` would let
  * Catalyst collapse projection-only plans to a metadata count and measure
  * nothing. One untimed warm-up action absorbs JVM/codegen startup; each
  * query then reports the best of 2 runs (steady-state, still cheap).
  *
  * Phase-proofing: host phase (VM clock/IO state after restarts) has moved
  * identical-code snapshots by ~1.5× between rounds, which reads as a code
  * regression in an absolute-seconds record. So after timing the engine,
  * the SAME invocation times the SAME headline queries' oracle SQL in
  * DuckDB (via `tools/time_oracle.py`, best-effort — skipped silently when
  * python3/duckdb/the script are absent, e.g. on a real cluster) and the
  * JSON gains `duckdb_total` + `engine_duckdb_ratio`. Both engines see the
  * same host phase, so the RATIO is the phase-cancelling number to compare
  * across rounds; absolute seconds stay for continuity. Disable with
  * SPARK_GRAFT_PAIR_ORACLE=0.
  */
object Bench {

  /** Minimal JSON string escaper for embedding oracle SQL in the temp
    * oracle_sql.json handed to the DuckDB timer. */
  private def jsonEscape(s: String): String = {
    val b = new StringBuilder(s.length + 16)
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  /** Time the headline oracles in DuckDB within THIS invocation; None when
    * the driver-side tooling is unavailable (never an error — the engine
    * bench must not depend on it). */
  private def pairedDuckdbTotal(sfDir: String, names: Seq[String]): Option[Double] =
    try {
      if (sys.env.get("SPARK_GRAFT_PAIR_ORACLE").contains("0")) return None
      val script = java.nio.file.Paths.get("tools", "time_oracle.py")
      if (!java.nio.file.Files.exists(script)) return None
      val sqls = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      if (sqls.isEmpty) return None
      val tmp = java.nio.file.Files.createTempDirectory("graft_bench_oracle")
      try {
        val json = sqls
          .map { case (k, v) => "\"" + k + "\":\"" + jsonEscape(v) + "\"" }
          .mkString("{", ",", "}")
        java.nio.file.Files.write(tmp.resolve("oracle_sql.json"), json.getBytes("UTF-8"))
        val pb = new ProcessBuilder("python3", script.toString, sfDir, tmp.toString, "2")
        pb.redirectErrorStream(true)
        val p   = pb.start()
        val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
        val ok  = p.waitFor() == 0
        if (!ok) { System.err.println(s"[bench] paired oracle failed:\n$out"); None }
        else
          out.linesIterator
            .find(_.startsWith("TOTAL\t"))
            .map(_.split('\t')(1).toDouble)
      } finally graft.sources.ParquetSink.deleteRecursively(tmp.toString)
    } catch { case e: Throwable => System.err.println(s"[bench] paired oracle skipped: $e"); None }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the machine's core count (the driver runs local[32]); a
    // hardcoded small default would silently benchmark a 4-thread session.
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString
    )
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // keep AQE's parallelism-first coalescing (the default): advisory-size
      // coalescing was measured to collapse the shuffle-hash self-joins to
      // 1-2 fat partitions at this scale (q67 1.1 s → 3.8 s)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    // warm-up: touch every table + JIT the pipeline once
    try SparkEntry.queries(names.head)(spark, sfDir).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    // best of 3: the first run carries janino codegen compilation + C2 JIT
    // warm-up that a long-lived cluster amortizes away; steady state is the
    // number comparable across rounds.
    val results = names.map { n =>
      val runs = (1 to 3).map(_ => materialize(n)).filter(_ >= 0)
      n -> (if (runs.isEmpty) -1.0 else runs.min)
    }
    val qs    = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // same-invocation DuckDB pairing: the ratio cancels host phase
    val paired = pairedDuckdbTotal(sfDir, names)
      .map(d => f""","duckdb_total":$d%.3f,"engine_duckdb_ratio":${total / d}%.3f""")
      .getOrElse("")
    val json  = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"$paired}"""
    println(json)
    // Also write the metric to a file: sbt interleaves [info]/[error] log
    // noise into stdout, which broke the driver's machine-parse of this line
    // (BENCH_r06.json "parsed": null). A file is unambiguous.
    try {
      val out = java.nio.file.Paths.get("target", "bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, json.getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: $e") }
    spark.stop()
  }
}
