package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** DataSource V2 SINK with the full commit protocol — the writer-side
  * analog of [[SyntheticEventsSource]]. The reference IS a writer
  * (EsParquetWriter.java drives scroll→decode→parquet and keeps a per-run
  * row counter it only logs, :96); this sink demonstrates the Spark-native
  * commit machinery a production connector rides on:
  *
  *   - per-TASK [[AuditWriter]]s accumulate (row count, sum of the first
  *     long column) and surface them as `WriterCommitMessage`s on task
  *     commit; `abort()` discards the partial state, so a failed attempt
  *     contributes NOTHING to the result
  *   - the DRIVER-side `BatchWrite.commit(messages)` is the only place
  *     messages enter the audit registry, and Spark hands it exactly one
  *     committed message per partition — which is why the audit stays
  *     exactly-once under task retries and speculation (the task-level
  *     abort/commit contract is asserted directly in Dsv2SinkSpec)
  *   - a failed JOB calls `BatchWrite.abort`, which must leave the
  *     registry untouched (no partial audit ever becomes visible)
  *
  * "Storage" is an in-JVM registry keyed by the caller's `key` option (no
  * external store in this environment); each committed write REPLACES its
  * key, so re-running a query is idempotent. The protocol — task commit
  * messages, driver-side commit, abort semantics — is the part a real
  * connector reuses unchanged.
  *
  * Usage:
  *   df.write.format("graft.sources.dsv2.AuditSink")
  *     .option("key", "my-audit").mode("append").save()
  *   then AuditSink.audit("my-audit") => (n_rows, sum_first_long_col)
  */
class AuditSink extends TableProvider {
  // the sink takes its schema from the DataFrame being written
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]
  ): Table = new AuditSinkTable(schema, properties.asScala.toMap)
}

object AuditSink {
  private val registry = new ConcurrentHashMap[String, (Long, Long)]()

  /** Streaming audit state per (key, queryId): (last committed epoch,
    * rows, sum, committed-epoch count). Epochs at or below the last committed one FOR THE SAME
    * QUERY are REPLAYS (a recovering query re-commits its last epoch
    * after restart, keeping its queryId and epoch numbering from the
    * checkpoint) and must be ignored — that idempotence is what turns
    * Spark's at-least-once epoch delivery into an exactly-once sink
    * result. A DIFFERENT query reusing the key (fresh checkpoint, epochs
    * restarting at 0) carries a new queryId, so its state starts fresh
    * instead of being swallowed by the replay guard. */
  private val streamRegistry = new ConcurrentHashMap[(String, String), (Long, Long, Long, Long)]()

  /** (rows, sum) accumulated across all committed streaming epochs of
    * every query that wrote under `key`. */
  def streamAudit(key: String): Option[(Long, Long)] = {
    val totals = streamRegistry.asScala.collect {
      case ((k, _), (_, r, s, _)) if k == key => (r, s)
    }
    if (totals.isEmpty) None
    else Some(totals.foldLeft((0L, 0L)) { case ((r1, s1), (r2, s2)) => (r1 + r2, s1 + s2) })
  }

  /** Number of distinct committed epochs under `key` (replays excluded) —
    * read from the sink's own commit-time state, NOT from
    * StreamingQuery.recentProgress: the progress buffer is appended
    * asynchronously after the batch commits, so reading it right after
    * processAllAvailable() races and can miss the final epoch. */
  def streamEpochs(key: String): Long =
    streamRegistry.asScala.collect { case ((k, _), (_, _, _, n)) if k == key => n }.sum

  private[dsv2] def publishEpoch(
      key: String,
      queryId: String,
      epochId: Long,
      rows: Long,
      sum: Long
  ): Unit = {
    streamRegistry.compute(
      (key, queryId),
      (_, prev) =>
        prev match {
          case null                              => (epochId, rows, sum, 1L)
          case (last, r, s, n) if epochId > last => (epochId, r + rows, s + sum, n + 1)
          case keep                              => keep // replayed epoch: drop
        }
    )
    ()
  }

  private[graft] def clearStream(key: String): Unit = {
    streamRegistry.keySet.asScala.filter(_._1 == key).foreach(streamRegistry.remove)
  }

  /** Declared query (q123): push the purchase slice of `events` through
    * the sink's full commit protocol, then report the committed audit —
    * the exactly-once analog of the row counter the reference only logs
    * (EsParquetWriter.java:96). The oracle recomputes count and id-sum
    * relationally, so a duplicated or lost task contribution would
    * hash-mismatch. */
  def sinkAuditQuery(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String
  ): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val key = s"q123-${spark.sparkContext.applicationId}"
    graft.Tables
      .events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"event_id")
      .write
      .format("graft.sources.dsv2.AuditSink")
      .option("key", key)
      .mode("append")
      .save()
    val (n, s) = audit(key).getOrElse((0L, 0L))
    Seq((n, s)).toDF("n_rows", "sum_ids")
  }

  /** Declared query (q124): drain the DSv2 STREAMING source through the
    * DSv2 streaming sink — the full scroll-cursor round trip
    * (EsParquetWriter.java:62-98 as Structured Streaming sees it). 12 000
    * generated rows paginate in 2 500-row epochs (2500×4 + 2000 → 5
    * epochs); the committed audit and the epoch count are pure cursor
    * arithmetic, so the oracle replays them from `range()` — a lost or
    * replayed epoch, or a mis-resumed cursor, hash-mismatches. */
  def streamCursorQuery(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String
  ): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val key  = s"q124-${java.util.UUID.randomUUID()}"
    val ckpt = java.nio.file.Files.createTempDirectory("q124_ckpt")
    try {
      val q = spark.readStream
        .format("graft.sources.dsv2.SyntheticEventsSource")
        .option("rows", 12000)
        .option("partitions", 8)
        .option("rowsPerBatch", 2500)
        .load()
        .select($"event_id")
        .writeStream
        .format("graft.sources.dsv2.AuditSink")
        .option("key", key)
        .option("checkpointLocation", ckpt.toString)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      // epoch count from the sink's COMMITTED state (streamEpochs), never
      // from recentProgress — the progress buffer appends asynchronously
      // after commit and can still miss the final epoch here
      val epochs      = streamEpochs(key)
      val (rows, sum) = streamAudit(key).getOrElse((0L, 0L))
      Seq((rows, sum, epochs)).toDF("n_rows", "sum_ids", "n_epochs")
    } finally {
      // registry cleanup belongs with the checkpoint cleanup: on a failed
      // start()/processAllAvailable() the UUID-keyed entry would otherwise
      // leak for the JVM lifetime
      clearStream(key)
      // the checkpoint is per-invocation scratch — don't accumulate /tmp
      graft.sources.ParquetSink.deleteRecursively(ckpt.toString)
    }
  }

  /** (rows, sum of first long column) for the last COMMITTED write under
    * `key`; None if no write ever committed (aborts leave no trace). */
  def audit(key: String): Option[(Long, Long)] = Option(registry.get(key))

  private[dsv2] def publish(key: String, rows: Long, sum: Long): Unit = {
    registry.put(key, (rows, sum)); ()
  }

  private[graft] def clear(key: String): Unit = { registry.remove(key); () }
}

private[dsv2] class AuditSinkTable(writeSchema: StructType, props: Map[String, String])
    extends Table
    with SupportsWrite {
  override def name(): String                 = s"audit-sink(${props.getOrElse("key", "default")})"
  override def schema(): StructType           = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet
      .of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val key = info.options.getOrDefault("key", "default")
    val qid = info.queryId()
    // audit dimension: the FIRST long column, or -1 for count-only audits
    val sumIdx = info.schema().fields.indexWhere(_.dataType == LongType)
    new WriteBuilder with SupportsTruncate {
      // overwrite mode = same semantics here (commit replaces the key)
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(key, sumIdx)
        override def toStreaming: streaming.StreamingWrite =
          new AuditStreamingWrite(key, qid, sumIdx)
      }
    }
  }
}

/** Driver-side half of the protocol: aggregates exactly the COMMITTED task
  * messages; abort leaves the registry untouched. */
private[graft] class AuditBatchWrite(key: String, sumIdx: Int) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    AuditWriterFactory(sumIdx)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (rows, sum) = messages.foldLeft((0L, 0L)) {
      case ((r, s), AuditCommit(n, x)) => (r + n, s + x)
      case (acc, _)                    => acc
    }
    AuditSink.publish(key, rows, sum)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[graft] case class AuditWriterFactory(sumIdx: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditWriter(sumIdx)
}

/** Streaming half: one commit per EPOCH, keyed so replays are idempotent —
  * after a failure Spark re-runs the last epoch and re-commits it with the
  * SAME epochId; [[AuditSink.publishEpoch]] drops epochs it has already
  * applied, which is the whole exactly-once contract of a streaming sink
  * (the same protocol a file-sink log or a transactional store implements
  * with durable epoch markers). */
private[graft] class AuditStreamingWrite(key: String, queryId: String, sumIdx: Int)
    extends streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo
  ): streaming.StreamingDataWriterFactory =
    AuditStreamingWriterFactory(sumIdx)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (rows, sum) = messages.foldLeft((0L, 0L)) {
      case ((r, s), AuditCommit(n, x)) => (r + n, s + x)
      case (acc, _)                    => acc
    }
    AuditSink.publishEpoch(key, queryId, epochId, rows, sum)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[graft] case class AuditStreamingWriterFactory(sumIdx: Int)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int,
      taskId: Long,
      epochId: Long
  ): DataWriter[InternalRow] = new AuditWriter(sumIdx)
}

/** Task-side half: accumulates locally, surfaces the total ONLY through
  * commit() — abort() (failed attempt) discards it, which is what makes
  * retried/speculated tasks contribute exactly once. */
private[dsv2] class AuditWriter(sumIdx: Int) extends DataWriter[InternalRow] {
  private var rows = 0L
  private var sum  = 0L

  override def write(row: InternalRow): Unit = {
    rows += 1
    if (sumIdx >= 0 && !row.isNullAt(sumIdx)) sum += row.getLong(sumIdx)
  }

  override def commit(): WriterCommitMessage = AuditCommit(rows, sum)
  override def abort(): Unit                 = ()
  override def close(): Unit                 = ()
}

private[graft] case class AuditCommit(rows: Long, sum: Long) extends WriterCommitMessage
