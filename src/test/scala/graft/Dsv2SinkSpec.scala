package graft

import graft.sources.dsv2.{AuditBatchWrite, AuditCommit, AuditSink, AuditStreamingWrite, AuditWriterFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The DSv2 sink's commit protocol: end-to-end write, task abort/commit
  * semantics (exactly-once under retries), and job-abort invisibility. */
class Dsv2SinkSpec extends SparkSpec {

  test("end-to-end write publishes the committed audit") {
    import spark.implicits._
    (0L until 100L)
      .toDF("event_id")
      .repartition(8)
      .write
      .format("graft.sources.dsv2.AuditSink")
      .option("key", "e2e")
      .mode("append")
      .save()
    assert(AuditSink.audit("e2e") === Some((100L, 4950L)))
  }

  test("an aborted task attempt contributes nothing; only committed messages count") {
    // drive the task-side protocol by hand, exactly as Spark's write path
    // does: attempt 1 fails mid-write (abort), its retry commits — the
    // driver only ever sees the retry's commit message
    val factory = AuditWriterFactory(sumIdx = 0)
    val attempt1 = factory.createWriter(partitionId = 0, taskId = 1L)
    (1L to 5L).foreach(i => attempt1.write(InternalRow(i)))
    attempt1.abort() // failed attempt: partial (5, 15) must vanish
    val attempt2 = factory.createWriter(partitionId = 0, taskId = 2L)
    (1L to 3L).foreach(i => attempt2.write(InternalRow(i)))
    val msg = attempt2.commit()
    new AuditBatchWrite("retry", sumIdx = 0).commit(Array(msg))
    assert(AuditSink.audit("retry") === Some((3L, 6L)),
      "only the committed retry counts — aborted attempt leaked into the audit")
  }

  test("a job-level abort leaves no partial audit visible") {
    val factory = AuditWriterFactory(sumIdx = 0)
    val w = factory.createWriter(partitionId = 0, taskId = 3L)
    (1L to 7L).foreach(i => w.write(InternalRow(i)))
    val msg = w.commit()
    new AuditBatchWrite("aborted-job", sumIdx = 0).abort(Array(msg))
    assert(AuditSink.audit("aborted-job") === None,
      "job abort must not publish any audit")
  }

  test("streaming epochs accumulate exactly once end-to-end") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in  = MemoryStream[Long]
    val dir = java.nio.file.Files.createTempDirectory("audit-ckpt").toString
    val q = in
      .toDF()
      .select($"value".as("event_id"))
      .writeStream
      .format("graft.sources.dsv2.AuditSink")
      .option("key", "stream")
      .option("checkpointLocation", dir)
      .start()
    try {
      in.addData(1L to 5L: _*)
      q.processAllAvailable()
      in.addData(6L to 10L: _*)
      q.processAllAvailable()
      assert(AuditSink.streamAudit("stream") === Some((10L, 55L)))
    } finally {
      q.stop()
      AuditSink.clearStream("stream")
    }
  }

  test("a replayed epoch drops; a NEW query reusing the key is not swallowed by the guard") {
    // the post-recovery path: a restarted query keeps its queryId and
    // re-commits its last epoch with the same epochId — must change nothing
    val wA = new AuditStreamingWrite("skey", "qA", 0)
    wA.commit(0L, Array(AuditCommit(5L, 15L)))
    wA.commit(1L, Array(AuditCommit(5L, 40L)))
    wA.commit(1L, Array(AuditCommit(100L, 999L))) // replay of epoch 1
    assert(AuditSink.streamAudit("skey") === Some((10L, 55L)),
      "replayed epoch leaked into the streaming audit")
    // a DIFFERENT query (fresh checkpoint: epochs restart at 0, new
    // queryId) writing the same key must accumulate, not be dropped as a
    // stale-epoch replay of the first query
    new AuditStreamingWrite("skey", "qB", 0).commit(0L, Array(AuditCommit(2L, 3L)))
    assert(AuditSink.streamAudit("skey") === Some((12L, 58L)),
      "fresh query's epoch 0 swallowed by the old query's replay guard")
    AuditSink.clearStream("skey")
    assert(AuditSink.streamAudit("skey") === None, "clearStream must drop every query under the key")
  }

  test("a re-run replaces its key (idempotent), never accumulates") {
    import spark.implicits._
    def run(): Unit =
      (0L until 10L)
        .toDF("event_id")
        .write
        .format("graft.sources.dsv2.AuditSink")
        .option("key", "idem")
        .mode("append")
        .save()
    run(); run()
    assert(AuditSink.audit("idem") === Some((10L, 45L)),
      "second run must replace the audit, not double it")
    AuditSink.clear("idem")
    assert(AuditSink.audit("idem") === None, "clear must drop the batch audit")
  }
}
