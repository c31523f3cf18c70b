package graft.sources.es

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries exercising the wire-protocol ES connector end to end.
  *
  * q163 is the reference's whole program as ONE declared query
  * (Bootstrap.java: discover → scroll-export with a pushed equality →
  * sink), except the export lands in a DataFrame and aggregates instead of
  * raw parquet files: seed the stub cluster from the fixture events table,
  * scroll it back over HTTP through [[EsScrollSource]] (8 slices, pushed
  * exact `term(event_type)`, `_source`-pruned columns), and compute the
  * daily purchase rollup. The DuckDB oracle computes the same rollup
  * directly over the events parquet — so the hash compare proves the wire
  * round-trip (JSON encode → scroll pages → tolerant decode → timestamp
  * micros) is lossless, not just row-count-preserving.
  */
object EsQueries {

  def dailyPurchases(spark: SparkSession, sfDir: String): DataFrame =
    dailyPurchasesVia(spark, sfDir, "scroll")

  /** q166: q163's plan pair on the MODERN pagination — the same export and
    * rollup driven by PIT + `search_after` instead of scroll (ES documents
    * search_after as scroll's replacement for deep pagination). Shares
    * q163's oracle: the hash compare proves the two wire protocols deliver
    * the identical multiset. */
  def dailyPurchasesPit(spark: SparkSession, sfDir: String): DataFrame =
    dailyPurchasesVia(spark, sfDir, "search_after")

  private def dailyPurchasesVia(spark: SparkSession, sfDir: String, pagination: String): DataFrame = {
    import spark.implicits._
    val ev  = Tables.events(spark, sfDir)
    val srv = EsStubServer.fromDataFrame(ev, "events")
    srv.start()
    try {
      val scrolled = spark.read
        .format("graft.sources.es.EsScrollSource")
        .schema(ev.schema)
        .option("url", srv.url)
        .option("index", "events")
        .option("slices", 8)
        .option("pageSize", 5000)
        .option("pagination", pagination)
        .load()
        .where($"event_type" === "purchase") // pushed as an exact term; non-matches never cross the wire
        .select($"ts", $"user_id", $"value") // pruned into the request's _source filter
      val rollup = scrolled
        .groupBy(to_date($"ts").as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"),
          Det.decSum($"value", 2).as("sum_value")
        )
      // materialize while the stub cluster is still serving; the rollup is
      // O(days) rows, so the checkpoint is tiny and later actions (the
      // verify write, plan sweeps) replay from it, not from HTTP
      val pinned = rollup.localCheckpoint()
      pinned.orderBy($"day")
    } finally srv.stop()
  }

  /** q164: the reference's DISCOVERY aggregation served server-side — its
    * Bootstrap runs a terms/count aggregation against ES to enumerate event
    * types before exporting. Here `groupBy(event_type).count()` over the
    * connector is pushed down (SupportsPushDownAggregates) as a paged
    * `composite` aggregation: zero raw documents cross the wire, only
    * O(distinct) bucket rows (spec-asserted: hitsServed == 0). The tiny
    * pageSize forces multi-page `after` resumption at fixture scale. */
  def topEventTypes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev  = Tables.events(spark, sfDir)
    val srv = EsStubServer.fromDataFrame(ev, "events")
    srv.start()
    try {
      val counts = spark.read
        .format("graft.sources.es.EsScrollSource")
        .schema(ev.schema)
        .option("url", srv.url)
        .option("index", "events")
        .option("pageSize", 2) // < distinct event types: exercises composite paging
        .load()
        .groupBy($"event_type")
        .count()
      counts.localCheckpoint().orderBy($"event_type")
    } finally srv.stop()
  }

  /** q165: the reference's time-partitioned index layout end to end — its
    * program discovers daily `<name>-yyyy.MM.dd` indices and exports only
    * those its query window touches (O2, window pruning). The stub cluster
    * is seeded with one index per UTC day of the events fixture; the read
    * uses the `events-*` pattern and a pushed `ts >=` filter, so the
    * connector resolves indices via `_cat/indices` and PRUNES the 20
    * out-of-window days at partition-planning time (spec-asserted: pruned
    * indices receive zero requests). The oracle rolls up the parquet under
    * the same predicate — hash equality proves discovery + pruning +
    * multi-index scroll lose nothing. */
  def windowedDailyRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev  = Tables.events(spark, sfDir)
    val srv = EsStubServer.fromDayPartitionedDataFrame(ev, "events")
    srv.start()
    try {
      val cut = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-21T00:00:00Z"))
      val rollup = spark.read
        .format("graft.sources.es.EsScrollSource")
        .schema(ev.schema)
        .option("url", srv.url)
        .option("index", "events-*")
        .option("slices", 2)
        .option("pageSize", 5000)
        .load()
        .where($"ts" >= lit(cut)) // prunes 20 of 30 daily indices, then filters in-window rows server-side
        .groupBy(to_date($"ts").as("day"), $"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"),
          Det.decSum($"value", 2).as("sum_value")
        )
      rollup.localCheckpoint().orderBy($"day", $"event_type")
    } finally srv.stop()
  }

  /** q169: the flagship streaming-curation composition — the wire-protocol
    * ES tail (q167's MicroBatchStream) feeding the AT-ARRIVAL near-dup
    * ingest gate (q150's flatMapGroupsWithState band registry) in ONE
    * declared pipeline: the reference's scheduled re-export loop upgraded
    * into "tail the cluster, judge every arriving document against the
    * registry as of its arrival". Epoch batching is pinned by the CURSOR
    * itself: the tail admits `EpochIds` cursor values per micro-batch, so
    * epoch(doc) = doc_id div EpochIds, ts is set to the epoch minute, and
    * within-batch arrival order is (ts, doc_id) = doc_id — GLOBAL arrival
    * order is therefore exactly ascending doc_id, which makes the
    * at-arrival verdicts batching-deterministic AND equal to the
    * registry-final semantics (every pair's smaller id arrives first; the
    * q136 oracle applies with the at-arrival column name). The injected
    * copies (+1M ids) arrive epochs after their originals, cross-epoch
    * through the HTTP boundary and the state store. */
  def tailDedupGate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val EpochIds = 131072L
    val docs = graft.operators.Dedup
      .docsWithDups(spark, sfDir)
      .select(
        $"doc_id",
        timestamp_seconds(lit(1704067200L) + ($"doc_id" / EpochIds).cast("long") * 60).as("ts"),
        $"text"
      )
    val out = graft.sources.ParquetSink.memoFixture(spark, "es_tail_gate_out", sfDir) { outDir =>
      val srv = EsStubServer.fromDataFrame(docs, "docs")
      srv.start()
      val root = java.nio.file.Files.createTempDirectory("graft_q169").toString
      try {
        import scala.concurrent.duration._
        val stream = spark.readStream
          .format("graft.sources.es.EsScrollSource")
          .schema(docs.schema)
          .option("url", srv.url)
          .option("index", "docs")
          .option("slices", 4)
          .option("pageSize", 5000)
          .option("cursorField", "doc_id")
          .option("maxIdsPerBatch", EpochIds)
          .load()
        val q = graft.streaming.Streaming
          .nearDupAtArrivalFlags(stream, horizon = 3650.days)
          .toDF()
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
            graft.streaming.Streaming
              .atArrivalVerdicts(batch)
              .write.mode("overwrite").parquet(s"$root/verdicts/epoch=$epoch")
            ()
          }
          .start()
        try q.processAllAvailable()
        finally q.stop()
        val v = spark.read.parquet(s"$root/verdicts")
        val nEpochs = v.agg(count_distinct($"epoch")).as[Long].head()
        require(nEpochs >= 2, s"q169 ran $nEpochs non-empty epochs — the copies must arrive after their originals")
        v.select($"doc_id", $"first_match", $"is_dup_at_arrival")
          .write.mode("overwrite").parquet(outDir)
      } finally {
        srv.stop()
        graft.sources.ParquetSink.deleteRecursively(root)
      }
    }
    spark.read.parquet(out).orderBy($"doc_id")
  }

  /** q167: the STREAMING tail of the stub cluster — the reference's
    * scheduled re-export loop subsumed by a Structured Streaming source
    * over the same wire protocol. The whole fixture drains through
    * micro-batch epochs (cursor = event_id, admission-capped per epoch,
    * each epoch a sliced PIT+search_after range read) into a memory sink;
    * the rollup over the drained rows is hash-compared to the parquet —
    * a lost epoch, re-read epoch, or mis-resumed cursor changes counts or
    * sums and mismatches. */
  def tailRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev  = Tables.events(spark, sfDir)
    val srv = EsStubServer.fromDataFrame(ev, "events")
    srv.start()
    val sinkName = s"es_tail_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = java.nio.file.Files.createTempDirectory("q167_ckpt")
    try {
      // Input-sized admission (r13 verdict task 7): a FIXED per-epoch cap
      // meant ~40 micro-batches at sf0.1 — 8 s of pure scheduling tax in
      // every corpus walk. Splitting the dense id range in three keeps the
      // multi-epoch resume property (≥2 epochs asserted below) at every SF
      // while the declared query pays for ~3 scheduler round-trips, not 40.
      val maxIdRow = ev.agg(max($"event_id")).head()
      require(!maxIdRow.isNullAt(0),
        "q167: events table is empty — the tail rollup needs at least one event to drain")
      val maxId = maxIdRow.getLong(0)
      val q = spark.readStream
        .format("graft.sources.es.EsScrollSource")
        .schema(ev.schema)
        .option("url", srv.url)
        .option("index", "events")
        .option("slices", 4)
        .option("pageSize", 5000)
        .option("cursorField", "event_id")
        .option("maxIdsPerBatch", maxId / 3 + 1) // 3 epochs (ids dense 0..n-1)
        .load()
        .select($"event_type", $"user_id", $"value")
        .writeStream
        .format("memory")
        .queryName(sinkName)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        q.processAllAvailable()
        val nEpochs = q.recentProgress.count(_.numInputRows > 0)
        // A corpus with a single id (maxId=0) can only ever drain in one
        // epoch — the resume property is vacuous there, so don't assert it.
        if (maxId > 0) require(nEpochs >= 2,
          s"q167 drained in $nEpochs non-empty epochs — the tail must resume across micro-batches")
      } finally q.stop()
      val rollup = spark.table(sinkName)
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"),
          Det.decSum($"value", 2).as("sum_value")
        )
      rollup.localCheckpoint().orderBy($"event_type")
    } finally {
      srv.stop()
      spark.catalog.dropTempView(sinkName)
      graft.sources.ParquetSink.deleteRecursively(ckpt.toString)
    }
  }
}
