package graft.operators

import graft.Tables
import graft.functions.TextFns.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Context-window preparation operators — the step between a cleaned corpus
  * and a token stream: overlapping chunking and greedy sequence packing.
  * Chunking is a pure per-row explode (embarrassingly parallel); packing is
  * a global running sum over the reproducible-shuffle hash order, computed
  * as a two-pass distributed prefix sum (per-bucket partial sums + broadcast
  * cumulative offsets) — no single-partition window anywhere in the plan. */
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
    * hash-shuffle order, token offsets by global running sum, each doc
    * assigned to the 4096-token bin its first token lands in.
    *
    * The running sum is a two-pass distributed prefix sum (a naive
    * `Window.orderBy` with no partition would funnel every row through ONE
    * task — the classic global-window bottleneck):
    *   1. bucket each row by the leading hex digits of its md5 sort key —
    *      deterministic and monotone in the sort order, so every bucket owns
    *      a contiguous slice of the global order;
    *   2. aggregate per-bucket token totals (one tiny row per bucket on the
    *      driver — bounded by the bucket count, never by the data) and
    *      prefix-scan them into cumulative offsets, shipped back as a map
    *      literal;
    *   3. per-bucket running sum (a PARTITIONED window — parallel across
    *      buckets) plus the bucket's offset = the exact global running sum.
    * At 100 TB, raise the bucket count with the shuffle parallelism; the
    * driver still only ever sees one row per bucket. */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val binTokens = 4096L
    globalTokenOffsets(spark, sfDir)
      .select(
        $"doc_id",
        $"n_toks",
        ($"end_offset" - $"n_toks").as("start_offset"),
        (($"end_offset" - $"n_toks") / binTokens).cast("long").as("bin")
      )
      .orderBy($"start_offset")
  }

  /** Global token offsets in the reproducible hash-shuffle order — the
    * shared two-pass prefix sum behind [[packSequences]] and
    * [[tokenBudgetSample]]. Returns (doc_id, n_toks, hk, end_offset). */
  private[graft] def globalTokenOffsets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val nBuckets = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val base = Tables
      .documents(spark, sfDir)
      .select(
        $"doc_id",
        size(tokens($"text")).cast("long").as("n_toks"),
        md5($"doc_id".cast("string")).as("hk")
      )
      // first 4 hex digits → [0, 65536) → scaled to nBuckets: monotone in
      // hk, so bucket boundaries respect the global (hk, doc_id) order
      .withColumn(
        "bucket",
        (conv(substring($"hk", 1, 4), 16, 10).cast("long") * nBuckets / 65536L).cast("int")
      )
    val perBucket = base
      .groupBy($"bucket")
      .agg(sum($"n_toks").as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until nBuckets).map { b =>
        val o = acc
        acc += perBucket.getOrElse(b, 0L)
        b -> o
      }.toMap
    }
    val wLocal = Window
      .partitionBy($"bucket")
      .orderBy($"hk", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn(
      "end_offset",
      sum($"n_toks").over(wLocal) + coalesce(element_at(typedLit(offsets), $"bucket"), lit(0L))
    )
  }

  /** Token-budget sampling: the first `budget` tokens of the corpus in the
    * reproducible shuffle order — "give me a deterministic 10k-token
    * training slice" as one filter over the global prefix sum. Same
    * scalable two-pass plan as [[packSequences]]; at 100 TB the budget
    * filter prunes whole buckets whose starting offset already exceeds the
    * budget. */
  def tokenBudgetSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val budget = 10000L
    globalTokenOffsets(spark, sfDir)
      .filter($"end_offset" <= budget)
      .select($"doc_id", $"n_toks", $"end_offset")
      .orderBy($"end_offset")
  }

  /** Content-defined chunking: boundaries where the token's 60-bit md5 hash
    * is 0 mod 16 (expected chunk ≈ 16 tokens), so chunk boundaries are
    * INSERT-STABLE — editing one token only reshapes its local chunk, which
    * is what makes CDC chunks dedup-friendly across document revisions
    * (fixed-width windows shift every downstream chunk). The running
    * boundary count is a per-doc window — parallel across docs, no global
    * state. Chunk text reassembles through sort_array(collect_list) (exact
    * order restored after the shuffle, same discipline as the centroid
    * builds). */
  /** The CDC chunk inventory over any (doc_id, text) frame: one row per
    * (doc, chunk) with token count and chunk md5. THE single definition of
    * the boundary rule — [[cdcChunks]] (q118) and `Dedup.cdcSpans` (the
    * span-dedup candidate generator) both build on this, so the
    * insert-stability and same-rule guarantees documented on each hold by
    * construction. */
  private[graft] def cdcChunkInventory(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.TextFns.{h60, tokens}
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy($"doc_id")
      .orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("b", when(h60($"tok") % 16 === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", sum($"b").over(w))
      .groupBy($"doc_id", $"chunk_id")
      // collect_list ALONE: a count() riding beside it would drag the whole
      // agg's per-row update onto the interpreted path for nothing — the
      // token count IS the collected array's size (struct(pos,tok) is never
      // null, so collect_list drops nothing)
      .agg(array_sort(collect_list(struct($"pos", $"tok"))).as("pm"))
      .select(
        $"doc_id",
        $"chunk_id",
        size($"pm").cast("long").as("n_toks"),
        md5(array_join(transform($"pm", p => p.getField("tok")), " ")).as("chunk_md5")
      )
  }

  def cdcChunks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    cdcChunkInventory(Tables.spread(Tables.documents(spark, sfDir)))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Length-bucketed inference batching: docs bucketed by token count
    * (width 32), then packed 8-per-batch in doc_id order within each
    * bucket. Serving systems batch same-length inputs to cut padding
    * waste; the audit reports exactly that waste (Σ max_toks − n_toks per
    * batch). Ranking windows are per-bucket — parallel, never global. */
  def lengthBucketedBatches(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFns.tokens
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"bucket").orderBy($"doc_id")
    Tables
      .documents(spark, sfDir)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_toks"))
      .withColumn("bucket", ($"n_toks" / 32L).cast("long"))
      .withColumn("batch_no", ((row_number().over(w) - 1) / 8).cast("long"))
      .groupBy($"bucket", $"batch_no")
      .agg(
        count(lit(1)).as("n_docs"),
        max($"n_toks").as("max_toks"),
        min($"doc_id").as("first_doc"),
        (max($"n_toks") * count(lit(1)) - sum($"n_toks")).as("padding_waste")
      )
      .orderBy($"bucket", $"batch_no")
  }
}
