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

  /** Per-run scratch root: namespaced by the Spark applicationId so
    * concurrent drivers (bench vs verify vs parallel test JVMs) never race
    * on the same sink directory. */
  def scratchDir(spark: SparkSession, tag: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft_${tag}_${spark.sparkContext.applicationId}"

  // One written fixture per (JVM, tag, sfDir): plan-only consumers (the
  // corpus sweep, bench warm-up walks) construct these queries too, so the
  // multi-job fixture writes must not repeat per construction — same
  // memoization discipline as AvroData.writtenDirs / Layout.bucketTables.
  // Dirs are removed at JVM exit by the shutdown hook.
  private val fixtureDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  sys.addShutdownHook {
    fixtureDirs.values.forEach(deleteRecursively)
  }

  /** Depth-first recursive delete; no-op on a missing path. The single
    * shared implementation for every scratch-dir cleanup site (shutdown
    * hooks, per-invocation finallys, retired-fixture sweeps). */
  private[graft] def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(root)) {
      val walk = java.nio.file.Files.walk(root)
      try
        walk
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** Cheap content fingerprint (relative path, size, mtime of every file)
    * of a file-or-directory — enough to catch an in-place fixture
    * regeneration without reading data. Lives next to [[deleteRecursively]]
    * so every filesystem tree traversal has one home (DisciplineSpec). */
  private[graft] def contentFingerprint(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) "absent"
    else {
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      val walk  = java.nio.file.Files.walk(p)
      try walk.forEach { f =>
        if (java.nio.file.Files.isRegularFile(f))
          parts += s"${p.relativize(f)}:${java.nio.file.Files.size(f)}:${java.nio.file.Files.getLastModifiedTime(f).toMillis}"
      } finally walk.close()
      java.lang.Integer.toHexString(parts.sorted.mkString(",").hashCode)
    }
  }

  /** Memoized fixture dir: runs `write(dir)` once per (JVM, tag, sfDir),
    * returns the dir on every later call. */
  private[graft] def memoFixture(spark: SparkSession, tag: String, sfDir: String)(
      write: String => Unit
  ): String =
    fixtureDirs.computeIfAbsent(
      tag + "|" + sfDir,
      _ => {
        val d = scratchDir(spark, tag) + "_" + java.lang.Integer.toHexString(sfDir.hashCode)
        write(d)
        d
      }
    )

  /** Write `df` partitioned by `day` (derived from ts) and return the
    * re-read audit: rows per day partition. `repartition(day)` first, so
    * each day partition is exactly ONE file — the reference's
    * one-file-per-source-partition layout (EsParquetWriter.java:56) and the
    * small-files fix at scale (without it every task writes a sliver into
    * every day directory). */
  def writePartitionedWithAudit(
      spark: SparkSession,
      df: DataFrame,
      outDir: String
  ): DataFrame = {
    import spark.implicits._
    df.withColumn("day", to_date($"ts"))
      .repartition($"day")
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
    val ev = Tables.events(spark, sfDir).filter($"event_type" === "purchase")
    writePartitionedWithAudit(spark, ev, scratchDir(spark, "sink_audit")).orderBy($"day")
  }

  /** Idempotent incremental re-ingest: rewrite ONLY the day partitions
    * present in `delta` (dynamic partition overwrite), leaving every other
    * partition untouched — the restartable daily-backfill pattern (the
    * reference wipes the whole rule directory per run,
    * Bootstrap.java:182-194; partition-scoped overwrite is the at-scale
    * replacement: re-running one day never disturbs the rest). */
  def overwriteDayPartitions(spark: SparkSession, delta: DataFrame, outDir: String): Unit = {
    import spark.implicits._
    delta
      .withColumn("day", to_date($"ts"))
      .repartition($"day")
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(outDir)
  }

  /** Declared query: JSON-lines and CSV sink/source round trip (the
    * checklist's "+ json/csv" file formats). A deterministic slice goes out
    * through both writers, comes back through both readers with explicit
    * schemas, and the audit proves both round trips preserved every row and
    * value (join on the key, compare columns, count mismatches = 0). */
  /** ORC sink/source round trip — same audit shape as
    * [[jsonCsvRoundTrip]]: write the slice as ORC (Spark's built-in
    * columnar alternative; schema + stats preserved natively, unlike
    * json/csv), read it back, and count value mismatches against the
    * source (zero on success). */
  def orcRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = scratchDir(spark, "orc_roundtrip")
    val src = graft.Tables
      .events(spark, sfDir)
      .filter($"event_type" === "signup")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"value")
    src.write.mode("overwrite").orc(s"$base/orc")
    val o = spark.read
      .orc(s"$base/orc")
      .select($"event_id", $"user_id".as("o_user"), $"ts_us".as("o_ts"), $"value".as("o_val"))
    src
      .join(o, "event_id")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(
          when($"user_id" <=> $"o_user" && $"ts_us" <=> $"o_ts" && $"value" <=> $"o_val", 0L)
            .otherwise(1L)
        ).as("orc_mismatches")
      )
  }

  /** Declared query (q130): schema-evolution read across batches. Batch 1
    * is written with the v1 schema (event_id, user_id); batch 2 with an
    * ADDED column (value) — the drift a long-lived table accumulates every
    * time a producer adds a field. `mergeSchema=true` unifies the footers
    * at read time (the per-file merge is distributed; at 100 TB prefer a
    * catalog schema, but the read semantics are the same); the audit
    * proves pre-evolution rows surface the new column as NULL — never a
    * default, never an error — via per-batch counts and min/max. */
  def schemaEvolutionRead(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = memoFixture(spark, "schema_evo", sfDir) { dir =>
      val ev = Tables.events(spark, sfDir)
      ev.filter($"event_id" % 2 === 0)
        .select($"event_id", $"user_id")
        .write
        .mode("overwrite")
        .parquet(s"$dir/batch=1")
      ev.filter($"event_id" % 2 === 1)
        .select($"event_id", $"user_id", $"value")
        .write
        .mode("overwrite")
        .parquet(s"$dir/batch=2")
    }
    spark.read
      .option("mergeSchema", "true")
      .parquet(base)
      .groupBy($"batch")
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"value".isNull.cast("long")).as("n_null_value"),
        min($"value").as("min_value"),
        max($"value").as("max_value")
      )
      .orderBy($"batch")
  }

  /** Declared query (q132): small-files COMPACTION — the maintenance job
    * every long-lived 100 TB table needs (streaming sinks and incremental
    * backfills fragment partitions; thousands of KB-files per directory
    * destroy scan scheduling and NameNode/liststatus costs). A slice is
    * deliberately fragmented to 64 files, then compacted by rewriting to a
    * bounded file count; the audit reports MEASURED file counts alongside
    * row conservation, so a compaction that loses rows, skips files, or
    * fails to actually reduce the file count hash-mismatches. At real
    * scale the target is size-based — `repartition(ceil(bytes/128MB))` or
    * `spark.sql.files.maxRecordsPerFile` — and the rewrite can cluster
    * while it is at it ([[graft.operators.Layout.writeZOrdered]]); the
    * fixed 64→4 here keeps the audit deterministic across SFs. */
  def compactionAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def parquetFiles(dir: String): Long = {
      val d = new java.io.File(dir)
      val fs = d.listFiles()
      if (fs == null) 0L else fs.count(f => f.getName.endsWith(".parquet")).toLong
    }
    val base = memoFixture(spark, "compaction", sfDir) { dir =>
      val src = Tables.events(spark, sfDir).select($"event_id", $"user_id", $"value")
      // The oracle pins files_before=64 / files_after=4. Round-robin
      // repartition fills output slots contiguously per INPUT PARTITION
      // (each partition starts at a pseudo-random slot), so ≥64 rows in
      // total does NOT guarantee all 64 slots fill — 512 single-row input
      // partitions leave a slot empty with small but real probability.
      // (A coalesce(1) barrier does NOT close the gap: CollapseRepartition
      // removes a non-shuffle repartition directly under a shuffle one, so
      // it never reaches the executed plan.) Every actual fixture arrives
      // as a handful of multi-thousand-row partitions, which fills all 64;
      // the post-write require turns any future layout drift into a loud
      // failure at fixture build instead of a mysterious pinned-count
      // hash mismatch at oracle compare.
      val n = src.count()
      require(n >= 512, s"compactionAudit needs a comfortably >64-row slice, got $n")
      src.repartition(64).write.mode("overwrite").parquet(s"$dir/fragmented")
      val written = {
        val fs = new java.io.File(s"$dir/fragmented").listFiles()
        if (fs == null) 0 else fs.count(_.getName.endsWith(".parquet"))
      }
      require(written == 64, s"fragmented write produced $written files, oracle pins 64")
      spark.read
        .parquet(s"$dir/fragmented")
        .repartition(4)
        .write
        .mode("overwrite")
        .parquet(s"$dir/compacted")
    }
    val frag        = spark.read.parquet(s"$base/fragmented")
    val filesBefore = parquetFiles(s"$base/fragmented")
    val filesAfter  = parquetFiles(s"$base/compacted")
    frag
      .agg(count(lit(1)).as("n_rows_in"))
      .crossJoin(spark.read.parquet(s"$base/compacted").agg(count(lit(1)).as("n_rows_out")))
      .select(
        $"n_rows_in",
        $"n_rows_out",
        lit(filesBefore).as("files_before"),
        lit(filesAfter).as("files_after")
      )
  }

  def jsonCsvRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = scratchDir(spark, "fmt_roundtrip")
    val src = Tables
      .events(spark, sfDir)
      .filter($"event_type" === "signup")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"value")
    src.write.mode("overwrite").json(s"$base/json")
    src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val schema = "event_id BIGINT, user_id BIGINT, ts_us BIGINT, value DOUBLE"
    val fromJson = spark.read.schema(schema).json(s"$base/json")
    val fromCsv  = spark.read.schema(schema).option("header", "true").csv(s"$base/csv")
    val j = fromJson.select($"event_id", $"user_id".as("j_user"), $"ts_us".as("j_ts"), $"value".as("j_val"))
    val c = fromCsv.select($"event_id", $"user_id".as("c_user"), $"ts_us".as("c_ts"), $"value".as("c_val"))
    src
      .join(j, "event_id")
      .join(c, "event_id")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"user_id" <=> $"j_user" && $"ts_us" <=> $"j_ts" && $"value" <=> $"j_val", 0L).otherwise(1L))
          .as("json_mismatches"),
        sum(when($"user_id" <=> $"c_user" && $"ts_us" <=> $"c_ts" && $"value" <=> $"c_val", 0L).otherwise(1L))
          .as("csv_mismatches")
      )
  }
}
