package graft.operators

import graft.Tables
import graft.functions.TextFns.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Context-window preparation operators — the step between a cleaned corpus
  * and a token stream: overlapping chunking and greedy sequence packing.
  * Chunking is a pure per-row explode (embarrassingly parallel); packing is
  * one global sort by the reproducible-shuffle hash plus a running sum —
  * Spark's range-partitioned sort, the scalable form of "concatenate the
  * corpus in a fixed pseudo-random order and chop into windows". */
object Chunking {

  private val ChunkSize = 32
  private val Stride    = 16

  /** Sliding token windows (size 32, stride 16; short docs yield one whole
    * chunk). Emits chunk start, token count, and a content digest rather
    * than the chunk text (keeps the declared output narrow). */
  def chunkDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .spread(Tables.documents(spark, sfDir))
      .withColumn("toks", tokens($"text"))
      .withColumn(
        "starts",
        sequence(lit(1), greatest(size($"toks") - ChunkSize + 1, lit(1)), lit(Stride))
      )
      .select($"doc_id", $"toks", explode($"starts").as("chunk_start"))
      .withColumn("chunk", slice($"toks", $"chunk_start", lit(ChunkSize)))
      .select(
        $"doc_id",
        $"chunk_start",
        size($"chunk").as("n_chunk_toks"),
        md5(array_join($"chunk", " ")).as("chunk_md5")
      )
      .orderBy($"doc_id", $"chunk_start")
  }

  /** Greedy sequence packing: documents laid out in the reproducible
    * hash-shuffle order, token offsets by running sum, each doc assigned to
    * the 4096-token bin its first token lands in. */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val binTokens = 4096L
    val w = Window
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .documents(spark, sfDir)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_toks"))
      .withColumn("end_offset", sum($"n_toks").over(w))
      .select(
        $"doc_id",
        $"n_toks",
        ($"end_offset" - $"n_toks").as("start_offset"),
        (($"end_offset" - $"n_toks") / binTokens).cast("long").as("bin")
      )
      .orderBy($"start_offset")
  }
}
