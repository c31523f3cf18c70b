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

  test("equality filter pushes into the scan and skips rows at generation") {
    import spark.implicits._
    val filtered = read(1000, 4).filter($"event_type" === "click")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(event_type,click)"),
      s"filter must be pushed into the scan node:\n$plan")
    // 1000 rows cycle 5 types → exactly 200 clicks, generated not post-filtered
    assert(filtered.count() === 200)
    assert(filtered.select($"event_type").distinct().collect().map(_.getString(0)).toSeq === Seq("click"))
  }

  test("range + IN filters push and evaluate correctly at the source") {
    import spark.implicits._
    val df = read(1000, 4).filter($"event_id" >= 10 && $"event_id" < 20 && $"user_id".isin(10L, 11L, 12L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(event_id,10)"), plan)
    assert(df.collect().map(_.getAs[Long]("event_id")).toSeq === Seq(10L, 11L, 12L))
  }

  test("limit pushdown stops the readers early (PushedLimit in the scan)") {
    import spark.implicits._
    val lim = read(1000000, 4).limit(3)
    val plan = lim.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 3"), s"limit must reach the scan:\n$plan")
    assert(lim.count() === 3)
    // the reference's sample read: filter + size(1) both pushed
    val one = read(1000000, 4).filter($"event_type" === "purchase").limit(1)
    val p1 = one.queryExecution.executedPlan.toString
    assert(p1.contains("EqualTo(event_type,purchase)") && p1.contains("PushedLimit: 1"), p1)
    assert(one.collect().map(_.getAs[String]("event_type")).toSeq === Seq("purchase"))
  }

  test("COUNT(*) GROUP BY pushes into the source (the reference's server-side terms agg)") {
    import spark.implicits._
    val agg  = read(1000, 4).groupBy($"event_type").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*) GROUP BY event_type]"),
      s"aggregate must reach the scan:\n$plan")
    val rows = agg.orderBy($"event_type").collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getLong(1) === 200L), "1000 rows cycle 5 types evenly")
  }

  test("global COUNT(*) and filtered grouped count push down together") {
    import spark.implicits._
    val total = read(1000, 4).agg(count(lit(1)).as("n"))
    assert(total.queryExecution.executedPlan.toString.contains("PushedAggregation: [COUNT(*)]"))
    assert(total.head().getLong(0) === 1000L)
    val filtered = read(1000, 4).filter($"event_type" === "click").groupBy($"event_type").count()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation") && plan.contains("EqualTo(event_type,click)"), plan)
    assert(filtered.head().getLong(1) === 200L)
  }

  test("unsupported aggregates fall back to normal row scan") {
    import spark.implicits._
    // SUM over a generated column is not in the pushable set — must still answer
    val sums = read(100, 2).groupBy($"event_type").agg(sum($"user_id").as("s"))
    assert(!sums.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(sums.count() === 5)
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

  // ---- MicroBatchStream: the resumable scroll cursor, read side ----

  private def readStream(rows: Long, parts: Int, perBatch: Long) =
    spark.readStream
      .format("graft.sources.dsv2.SyntheticEventsSource")
      .option("rows", rows)
      .option("partitions", parts)
      .option("rowsPerBatch", perBatch)
      .load()

  private def runToDrained(rows: Long, perBatch: Long, key: String, ckpt: String) = {
    import graft.sources.dsv2.AuditSink
    val q = readStream(rows, parts = 3, perBatch)
      .select(org.apache.spark.sql.functions.col("event_id"))
      .writeStream
      .format("graft.sources.dsv2.AuditSink")
      .option("key", key)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    q
  }

  test("streaming source paginates deterministic epochs and drains to the cap") {
    import graft.sources.dsv2.AuditSink
    val ckpt = java.nio.file.Files.createTempDirectory("mbs_ckpt").toString
    val key  = s"mbs-drain-${java.util.UUID.randomUUID()}"
    val q    = runToDrained(rows = 600, perBatch = 250, key, ckpt)
    // rows 0..599 exactly once: count 600, id-sum 600*599/2
    assert(AuditSink.streamAudit(key) === Some((600L, 179700L)))
    // the sink's committed state is race-free: exactly 3 epochs
    assert(AuditSink.streamEpochs(key) === 3L)
    // epoch pagination is the scroll page size: 250, 250, 100. The
    // progress buffer appends ASYNC after each commit, so poll briefly
    // rather than reading it immediately (the final entry can lag stop())
    val deadline = System.nanoTime() + 5_000_000_000L
    def sizes()  = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    while (sizes().length < 3 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(sizes() === Seq(250L, 250L, 100L), s"epoch sizes: ${sizes()}")
    AuditSink.clearStream(key)
  }

  test("restart from checkpoint resumes the cursor: no row lost, none doubled") {
    import graft.sources.dsv2.AuditSink
    val ckpt = java.nio.file.Files.createTempDirectory("mbs_ckpt2").toString
    val key  = s"mbs-resume-${java.util.UUID.randomUUID()}"
    // phase 1: the source exposes 600 rows; drain and kill the query
    runToDrained(rows = 600, perBatch = 250, key, ckpt)
    assert(AuditSink.streamAudit(key) === Some((600L, 179700L)))
    // phase 2: the "scroll" has grown to 1000 rows; a NEW query instance on
    // the SAME checkpoint must resume at the committed cursor (600), not
    // re-read from 0 — the id-sum is exact-once arithmetic: a re-read
    // inflates it, a lost page deflates it
    runToDrained(rows = 1000, perBatch = 250, key, ckpt)
    assert(AuditSink.streamAudit(key) === Some((1000L, 499500L)),
      "resume must deliver exactly rows 600..999 on top of phase 1")
    AuditSink.clearStream(key)
  }

  test("Trigger.AvailableNow drains all epochs and terminates on its own") {
    import graft.sources.dsv2.AuditSink
    val ckpt = java.nio.file.Files.createTempDirectory("mbs_ckpt4").toString
    val key  = s"mbs-avnow-${java.util.UUID.randomUUID()}"
    val q = readStream(rows = 900, parts = 3, perBatch = 400)
      .select(org.apache.spark.sql.functions.col("event_id"))
      .writeStream
      .format("graft.sources.dsv2.AuditSink")
      .option("key", key)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow must terminate by itself once the snapshot is drained —
    // no stop() needed; a hang here means the cursor never reached the cap
    assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    // 900 rows in 400-row pages: 3 epochs, exact once
    assert(AuditSink.streamAudit(key) === Some((900L, 404550L)))
    assert(AuditSink.streamEpochs(key) === 3L)
    AuditSink.clearStream(key)
  }

  test("streaming scan filters correctly above the scan (V2 pushdown is batch-only)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
    val ckpt = java.nio.file.Files.createTempDirectory("mbs_ckpt3").toString
    val q = readStream(rows = 500, parts = 2, perBatch = 500)
      .filter($"event_type" === "click")
      .select($"event_id")
      .writeStream
      .format("memory")
      .queryName(s"mbs_prune_${java.util.UUID.randomUUID().toString.replace("-", "")}")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // 500 rows cycle 5 types -> exactly 100 clicks
      val n = spark.sql(s"SELECT COUNT(*) FROM ${q.name}").head().getLong(0)
      assert(n === 100L, s"expected 100 generated clicks, saw $n")
      // Pin the KNOWN Spark limitation so a future Spark upgrade that lifts
      // it shows up as a test failure (and an opportunity): the micro-batch
      // path does not run V2ScanRelationPushDown, so the streaming scan
      // reads the full schema with no pushed filters and Catalyst filters/
      // projects ABOVE the scan. Batch reads of the same source DO push
      // (asserted earlier in this suite).
      val plan = q
        .asInstanceOf[StreamingQueryWrapper]
        .streamingQuery
        .lastExecution
        .executedPlan
        .toString
      assert(plan.contains("Filter") && plan.contains("MicroBatchScan"), plan.take(3000))
      assert(plan.contains("PushedFilters: []"),
        "Spark now pushes filters into micro-batch scans — drop this pin and " +
          "assert the pushed shape instead (free perf on the streaming path)")
    } finally q.stop()
  }
}
