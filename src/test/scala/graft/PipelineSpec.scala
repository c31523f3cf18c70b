package graft

import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** End-to-end reference-workflow pipeline + foreachBatch streaming sink. */
class PipelineSpec extends SparkSpec {

  test("export pipeline round-trips: audit equals source counts, schema persisted") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val audit = Pipeline.exportByType(spark, sf, out, "purchase", 30).cache()
    assert(audit.count() > 0)
    assert(audit.agg(sum($"n_dead")).head().getLong(0) === 0L, "clean data has no dead letters")
    // schema persisted and re-readable (O9 parity)
    val st = org.apache.spark.sql.types.DataType
      .fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(s"$out/schema.json")))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.contains("k"))
    // the exported data re-reads with the decoded column present
    val back = spark.read.parquet(s"$out/data")
    assert(back.columns.contains("k") && back.columns.contains("day"))
    assert(back.count() === audit.agg(sum($"n_rows")).head().getLong(0))
  }

  test("foreachBatch parquet sink appends each micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_febatch").toString
    val in = MemoryStream[(Timestamp, Long)]
    val q = in
      .toDF()
      .toDF("ts", "user_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id)).write.mode("append").parquet(out)
      }
      .start()
    try {
      in.addData((new Timestamp(1000), 1L), (new Timestamp(2000), 2L))
      q.processAllAvailable()
      in.addData((new Timestamp(3000), 3L))
      q.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.count() === 3)
      assert(back.select($"batch_id").distinct().count() === 2)
    } finally q.stop()
  }
}
