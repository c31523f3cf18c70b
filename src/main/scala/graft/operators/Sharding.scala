package graft.operators

import graft.Tables
import graft.functions.TextFns.h60
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data sharding operators: deterministic shard assignment and a
  * reproducible global shuffle order — the materialization step of a
  * training pipeline (write N shard files in a fixed pseudo-random order,
  * identically on every rerun and every engine).
  *
  * Both key off the md5-derived hash so the DuckDB oracle reproduces them
  * exactly; engine-native hash functions would not be portable. At scale:
  * shard assignment is a per-row map (no shuffle until the write
  * partitions by shard), and the deterministic shuffle's top-k cut is a
  * TakeOrderedAndProject — per-partition heaps merged on the driver, never
  * a full global sort or an unpartitioned window.
  */
object Sharding {

  /** Deterministic shard id per document + per-shard audit stats. */
  def shardAssignment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .withColumn("shard", h60(concat(lit("shard:"), $"doc_id".cast("string"))) % 16)
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc")
      )
      .orderBy($"shard")
  }

  /** Deterministic train/val/test split (90/5/5 by key hash) — the standard
    * leakage-safe split: assignment depends only on the key, so it is stable
    * across reruns, engines, and data reshuffles. */
  def trainValTestSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documents(spark, sfDir)
      .withColumn("h", h60(concat(lit("split:"), $"doc_id".cast("string"))) % 100)
      .withColumn(
        "split",
        when($"h" < 90, "train").when($"h" < 95, "val").otherwise("test")
      )
      .groupBy($"split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_doc")
      )
      .orderBy($"split")
  }

  /** Deterministic stratified sample: the first `k` documents of every
    * language stratum in md5-hash order — "same N examples per class on
    * every run and every engine". The rank window partitions by the
    * stratum, so it parallelizes across strata (never a global window);
    * at scale this is one shuffle on the stratum key. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = 20
    val w = Window
      .partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    Tables
      .documents(spark, sfDir)
      .select($"doc_id", $"lang")
      .withColumn("pos", row_number().over(w))
      .filter($"pos" <= k)
      .select($"lang", $"pos", $"doc_id")
      .orderBy($"lang", $"pos")
  }

  /** Mixture temperature for [[temperatureMixture]] — α = 0.5 (square-root
    * scaling), the published data-mixture practice (multilingual BERT /
    * XLM-R / PaLM sample domains ∝ n^α with α < 1 to upweight small
    * domains relative to proportional sampling). */
  private[graft] val MixtureAlpha = 0.5

  /** Temperature-based domain mixture (q155): re-mix the corpus so each
    * source's share of the release is ∝ n_i^α instead of ∝ n_i — the
    * standard fix for head-domain domination (α = [[MixtureAlpha]]). All
    * arithmetic is grid-integer so both engines agree bit-for-bit:
    * per-source weight s6 = floor(sqrt(n_i)·1e6) (floor of a double is
    * exact cross-engine; round of an irrational is not), target_i =
    * (T · s6_i) div Σs6 with T = ⌊Σn_i / 2⌋ (release half the corpus,
    * re-mixed), kept_i = min(target_i, n_i) (an upweighted small domain
    * clips at its own size — standard), and the kept slice is each
    * source's lowest-md5-rank documents (the [[domainMixture]] /
    * [[stratifiedSample]] determinism rule). The two scalar pulls (Σs6,
    * T) fold into plan literals; the rank window partitions by source —
    * parallel across domains, one shuffle at any scale. Capacity note
    * (the GridOverflowSpec discipline): T·s6 ≈ (n/2)·√n·1e6 stays inside
    * LONG up to ~7×10⁸ documents; past that, drop the weight grid to 1e3
    * (same plan, same semantics, quota precision still ≪ 1 doc). Output:
    * the per-source mixture audit. */
  def temperatureMixture(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFns.tokens
    val d = Tables
      .documents(spark, sfDir)
      .select(
        $"doc_id",
        $"source",
        size(tokens($"text")).cast("long").as("n_toks"),
        md5($"doc_id".cast("string")).as("hk")
      )
    val counts = d
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("s6", floor(sqrt($"n_docs") * 1e6).cast("long"))
    // two bounded scalar pulls -> plan literals (the pagerank `n` pattern)
    val r      = counts.agg(sum($"s6"), sum($"n_docs")).head()
    val sumS6  = r.getLong(0)
    val target = r.getLong(1) / 2
    val quotas = counts
      .withColumn("target", expr(s"(${target}L * s6) div ${sumS6}L").cast("long"))
      .withColumn("n_kept", least($"target", $"n_docs"))
    val w = Window.partitionBy($"source").orderBy($"hk", $"doc_id")
    val keptAgg = d
      .join(broadcast(quotas.select($"source", $"n_kept")), "source")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= $"n_kept")
      .groupBy($"source")
      .agg(sum($"n_toks").as("toks_kept"))
    // LEFT join: a source whose quota rounds to zero (tiny SF) still
    // reports its audit row with toks_kept = 0
    quotas
      .join(keptAgg, Seq("source"), "left")
      .select(
        $"source",
        $"n_docs",
        round($"s6" / 1e6, 6).as("weight"),
        $"target",
        $"n_kept",
        coalesce($"toks_kept", lit(0L)).as("toks_kept")
      )
      .orderBy($"source")
  }

  /** Domain-mixture rebalancing — cap every source domain at the smallest
    * domain's document count, keeping each domain's lowest-md5-rank slice
    * (the deterministic analog of "downsample over-represented domains to a
    * target mixture"). Output: per-domain kept-doc and kept-token audit.
    *
    * Scale shape: the per-domain counts are a tiny aggregate (one row per
    * domain — bounded by the domain vocabulary, never the corpus) collected
    * once and folded into the plan as a literal; the rank window partitions
    * by domain, so it parallelizes across domains exactly like
    * [[stratifiedSample]]. One shuffle on the domain key. */
  def domainMixture(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFns.tokens
    val d = Tables
      .documents(spark, sfDir)
      .select(
        $"doc_id",
        $"source",
        size(tokens($"text")).cast("long").as("n_toks"),
        md5($"doc_id".cast("string")).as("hk")
      )
    // one row per domain; the min is the shared cap (driver-side by design:
    // the domain set is small and the cap must be a plan literal)
    val cap = d.groupBy($"source").agg(count(lit(1)).as("n")).agg(min($"n")).head().getLong(0)
    val w   = Window.partitionBy($"source").orderBy($"hk", $"doc_id")
    d.withColumn("rk", row_number().over(w))
      .filter($"rk" <= cap)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"n_toks").as("toks_kept"))
      .orderBy($"source")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES): each document draws u from its md5 hash, gets key
    * ln(u)/weight (weight = token count — longer docs proportionally more
    * likely), and the k largest keys win. The log-space key is snapped to a
    * 1e6 grid so the DuckDB oracle replays it exactly (ulp-level libm
    * differences sit far below the grid).
    *
    * Scale shape: the key is a per-row map; the cut is `orderBy().limit(k)`
    * — a TakeOrderedAndProject (per-partition heaps, no global sort). The
    * numbering window runs over the k surviving rows only. */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFns.tokens
    val k = 20
    val top = Tables
      .documents(spark, sfDir)
      .select(
        $"doc_id",
        size(tokens($"text")).cast("long").as("n_toks"),
        h60($"doc_id".cast("string")).as("h")
      )
      // u ∈ (0, 1]: (h+1) / 2^60 — both engines convert BIGINT→DOUBLE the
      // same way, and ln on the 1e6 grid is engine-replayable
      .withColumn("u", ($"h" + 1).cast("double") / lit(1152921504606846976.0d))
      // roundLong kernel (r20 sweep): per-doc projection, no BigDecimal/row
      .withColumn("key6", graft.functions.Kernels.roundLong(log($"u") / $"n_toks" * 1e6))
      .orderBy($"key6".desc, $"doc_id")
      .limit(k)
    top
      .withColumn("rk", row_number().over(Window.orderBy($"key6".desc, $"doc_id")))
      .select($"rk", $"doc_id", $"n_toks", round($"key6" / 1e6, 6).as("log_key"))
      .orderBy($"rk")
  }

  /** Reproducible global shuffle: order documents by their key hash (a
    * fixed pseudo-random permutation), emit the first 100 positions.
    *
    * Scale shape: the cut happens FIRST via `orderBy().limit(100)` — Spark
    * plans a TakeOrderedAndProject (per-partition top-k + merge of 100-row
    * heaps, no global sort, no full-table single-partition window). Only the
    * surviving 100 rows flow through the numbering window, so its
    * single-partition frame is bounded by the constant k, not the data. For
    * an UNBOUNDED global rank the two-pass bucket prefix sum in
    * [[Chunking.packSequences]] is the pattern to reuse. */
  def deterministicShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val top = Tables
      .documents(spark, sfDir)
      .select($"doc_id", md5($"doc_id".cast("string")).as("hk"))
      .orderBy($"hk", $"doc_id")
      .limit(100)
    top
      .withColumn("pos", row_number().over(Window.orderBy($"hk", $"doc_id")))
      .select($"pos", $"doc_id")
      .orderBy($"pos")
  }
}
