package graft.operators

import graft.Tables
import graft.functions.TextFns.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-pipeline operators: frequency-ranked vocabulary construction
  * and corpus encoding against it — the step between a cleaned corpus and
  * token-id tensors.
  *
  * Scale shape: vocabulary building is one hash aggregation over exploded
  * tokens followed by a TakeOrderedAndProject cut to the vocab size (the
  * id-assignment window runs over the CUT result — bounded by vocab size,
  * never by the corpus). Encoding is a broadcast join of that small vocab
  * against (doc, position, token) triples — map-side only against the
  * corpus — then one per-doc re-aggregation.
  */
object Vocab {

  // Deliberately SMALLER than the fixture's distinct-token count so the
  // out-of-vocab (-1 / UNK) path carries real weight in the oracle compare.
  private val VocabSize = 20

  /** Default cap for every LM-scoring lookup table (unigram logprobs, idf,
    * bigram contexts): top-N tokens by (freq desc, token asc). At corpus
    * scale the raw token vocabulary grows with the data — broadcasting it
    * uncapped would OOM the driver at 100 TB — so the broadcast side is
    * bounded to a constant and out-of-vocab tokens take a deterministic
    * UNK floor (the standard KenLM move). The DEFAULT is kept below the
    * fixture's 31 distinct tokens so the OOV path carries real weight in
    * the oracle compare at every SF; the scoring shapes take the cap as a
    * parameter (`lmK`), and a production deployment runs ~100,000 — a
    * few-MB broadcast — which the `scalelm` probe exercises literally
    * (k=100,000 over a ~10M-distinct-token synthetic corpus, with a
    * tripwire that the capped broadcast keeps the run within a constant
    * factor of the k=24 run). */
  private[graft] val LmVocabSize = 24

  /** Internal: (token_id, token, freq), ids contiguous from 0 in
    * (freq desc, token asc) order — deterministic across engines. */
  private[graft] def vocab(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cut = Tables
      .spread(Tables.documents(spark, sfDir))
      .select(explode(tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token")
      .limit(VocabSize)
    // the numbering window's input is the bounded cut (cf. q78's pattern)
    cut
      .withColumn("token_id", row_number().over(Window.orderBy($"freq".desc, $"token")) - 1)
      .select($"token_id", $"token", $"freq")
  }

  /** Declared query: the vocabulary itself. */
  def vocabBuild(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    vocab(spark, sfDir).orderBy($"token_id")
  }

  /** Declared query: unigram log-probability scoring — the language-model
    * quality proxy used by data-filtering pipelines (score each document by
    * the mean corpus-unigram log-likelihood of its tokens; outliers in
    * either direction are candidates for removal). Per-token logprobs are
    * snapped onto a 1e6 grid and summed as LONG, so the score is
    * order-independent and engine-replayable despite ln() being involved
    * (ulp-level libm differences sit ~9 orders of magnitude below the
    * grid). The unigram table is CAPPED to the [[LmVocabSize]] most
    * frequent tokens before it broadcasts (the raw vocabulary scales with
    * the corpus — an uncapped broadcast OOMs the driver at 100 TB);
    * out-of-vocab tokens score the deterministic UNK floor ln(1/total),
    * replayed identically by the oracle. Scoring is one bounded broadcast
    * join + one per-doc aggregate. */
  def unigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    unigramLogprobOf(Tables.spread(Tables.documents(spark, sfDir))).orderBy($"doc_id")
  }

  /** The docs-parameterized unigram-scoring shape ([[unigramLogprob]] minus
    * source + presentation sort) — the scaling probe drives it over
    * synthetic corpora whose vocabulary GROWS with the data, proving the
    * [[LmVocabSize]] cap keeps the broadcast bounded. */
  private[graft] def unigramLogprobOf(docs: DataFrame, lmK: Int = LmVocabSize): DataFrame = {
    import docs.sparkSession.implicits._
    val tok   = docs.select($"doc_id", explode(tokens($"text")).as("token"))
    val freqs = tok.groupBy($"token").agg(count(lit(1)).as("freq"))
    val total = freqs.agg(sum($"freq")).head().getLong(0)
    val lp = freqs
      .orderBy($"freq".desc, $"token")
      .limit(lmK)
      .select(
        $"token",
        round(log($"freq" / lit(total.toDouble)) * 1e6).cast("long").as("lp6")
      )
    val oovLp6 = BigDecimal(math.log(1.0 / total.toDouble) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP)
      .toLong
    tok
      .join(broadcast(lp), Seq("token"), "left")
      .select($"doc_id", coalesce($"lp6", lit(oovLp6)).as("lp6"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"), sum($"lp6").as("slp"))
      // the mean is rounded in INTEGER space: slp is negative, so round
      // half-away-from-zero is -((2·(-slp)+n) truncdiv (2n)) — exact and
      // identical in both engines, where round(double, 6) can flip when
      // slp/n lands exactly on a .5 grid boundary (observed at sf0.1)
      .select(
        $"doc_id",
        $"n_toks",
        (expr("-((2 * (-slp) + n_toks) div (2 * n_toks))") / 1e6).as("mean_logprob")
      )
  }

  /** Declared query: TF-IDF top terms per document — the classic keyword /
    * relevance signal (idf = ln(N/df) on the 1e6 grid → integer score
    * tf·idf6, order-independent and engine-replayable; ties broken by
    * token).
    *
    * Scale shape: keyword candidacy is restricted to the [[LmVocabSize]]
    * most frequent tokens (the fixed vocabulary a production keyword
    * pipeline scores against) — the raw token set scales with the corpus,
    * so the uncapped idf table must never broadcast. tf is one hash
    * aggregation on (doc, token) over the restricted stream; df is one on
    * token; the idf table is then provably ≤ [[LmVocabSize]] rows and
    * broadcasts safely at any SF. The per-doc top-k window partitions by
    * doc_id — parallel, never global. */
  def tfidfTopTerms(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = 3
    val tok = Tables
      .spread(Tables.documents(spark, sfDir))
      .select($"doc_id", explode(tokens($"text")).as("token"))
    // corpus size as a plan literal (tiny driver-side count, same pattern
    // as the unigram total above)
    val nDocs = Tables.documents(spark, sfDir).count()
    val vcut = tok
      .groupBy($"token")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token")
      .limit(LmVocabSize)
      .select($"token")
    val vtok = tok.join(broadcast(vcut), Seq("token"))
    val idf = vtok
      .groupBy($"token")
      .agg(countDistinct($"doc_id").as("df"))
      .select(
        $"token",
        round(log(lit(nDocs.toDouble) / $"df") * 1e6).cast("long").as("idf6")
      )
    val w = Window.partitionBy($"doc_id").orderBy($"score6".desc, $"token")
    vtok
      .groupBy($"doc_id", $"token")
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(idf), Seq("token"))
      .withColumn("score6", $"tf" * $"idf6")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"doc_id", $"rk", $"token", round($"score6" / 1e6, 6).as("tfidf"))
      .orderBy($"doc_id", $"rk")
  }

  /** Declared query: bigram conditional log-probability scoring with add-1
    * smoothing — the next step up from [[unigramLogprob]] toward the
    * KenLM-style perplexity filters production pipelines use: score each
    * document by mean ln P(w_i | w_{i-1}) under the corpus bigram model.
    * Same 1e6-grid determinism contract as the unigram query.
    *
    * Scale shape: bigram extraction is a per-row explode, done ONCE — the
    * bigram count c12 is a window count over the (w1, w2)-repartitioned
    * stream rather than a groupBy + self-join (the join formulation scans
    * and explodes the corpus twice: column pruning drops doc_id from the
    * count branch, the two exchanges stop canonicalizing identically, and
    * AQE cannot reuse them — observed live in the round-8 final-plan
    * audit). The window's required distribution is exactly the repartition
    * already in place, so c12 costs one in-partition sort and zero extra
    * shuffles. The unigram context table is CAPPED to the [[LmVocabSize]]
    * most frequent tokens before it broadcasts (an uncapped table scales
    * with the corpus and would OOM the driver at 100 TB); an out-of-vocab
    * context takes c1=0, which under add-1 smoothing is the natural
    * unseen-context floor P = (c12+1)/V — deterministic and replayed by
    * the oracle. V itself stays the FULL distinct-token count (a scalar
    * from one count job, not a broadcast relation). */
  def bigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    bigramLogprobOf(Tables.spread(Tables.documents(spark, sfDir))).orderBy($"doc_id")
  }

  /** Docs-parameterized bigram-scoring shape (see [[unigramLogprobOf]]). */
  private[graft] def bigramLogprobOf(docs: DataFrame, lmK: Int = LmVocabSize): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select($"doc_id", tokens($"text").as("tk"))
    val big = toks
      .filter(size($"tk") >= 2)
      .select(
        $"doc_id",
        explode(
          transform(
            sequence(lit(1), size($"tk") - 1),
            i => struct(element_at($"tk", i).as("w1"), element_at($"tk", i + 1).as("w2"))
          )
        ).as("bg")
      )
      .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
      .repartition($"w1", $"w2")
    val uniAll    = toks.select(explode($"tk").as("w1")).groupBy($"w1").agg(count(lit(1)).as("c1"))
    val vocabSize = uniAll.count()
    val uni       = uniAll.orderBy($"c1".desc, $"w1").limit(lmK)
    big
      .withColumn("c12", count(lit(1)).over(Window.partitionBy($"w1", $"w2")))
      .join(broadcast(uni), Seq("w1"), "left")
      .withColumn(
        "lp6",
        // roundLong kernel (r20 sweep): this projection runs per BIGRAM row
        // (data-sized) — the Round expression allocates a BigDecimal per
        // row; the kernel is value-identical (GridOverflowSpec equivalence)
        graft.functions.Kernels.roundLong(
          log(($"c12" + 1.0) / (coalesce($"c1", lit(0L)) + vocabSize)) * 1e6)
      )
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"lp6").as("slp"))
      // integer-space mean rounding — same boundary defense as
      // [[unigramLogprob]] (a .5 mean grid hit flipped one sf0.1 row)
      .select(
        $"doc_id",
        $"n_bigrams",
        (expr("-((2 * (-slp) + n_bigrams) div (2 * n_bigrams))") / 1e6).as("mean_logprob")
      )
  }

  /** Declared query: encode every document against the vocabulary —
    * out-of-vocab tokens map to -1 (the UNK accounting every tokenizer
    * pipeline needs). Output keeps the declared schema narrow: token
    * count, UNK count, and a digest of the ordered id sequence. */
  def encodeDocs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val v = vocab(spark, sfDir).select($"token", $"token_id")
    val tokPos = Tables
      .spread(Tables.documents(spark, sfDir))
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "token")))
    tokPos
      .join(broadcast(v), Seq("token"), "left")
      .withColumn("id", coalesce($"token_id", lit(-1)))
      .groupBy($"doc_id")
      // collect_list ALONE (see Chunking.cdcChunkInventory): the token and
      // unknown counts derive from the collected array — struct(pos,id) is
      // never null, so size() is the exact count — instead of riding
      // count/sum beside the ImperativeAggregate and interpreting the
      // whole per-token update path
      .agg(array_sort(collect_list(struct($"pos".as("p"), $"id".as("i")))).as("pm"))
      .select(
        $"doc_id",
        size($"pm").cast("long").as("n_toks"),
        size(filter($"pm", s => s.getField("i") === -1)).cast("long").as("n_unk"),
        md5(
          concat_ws(",", transform($"pm", s => s.getField("i").cast("string")))
        ).as("ids_md5")
      )
      .orderBy($"doc_id")
  }

  /** Per-source KL divergence of the token distribution vs the whole
    * corpus — the statistical drift check a mixture pipeline runs before
    * reweighting domains (large KL = the source's language is far from the
    * mix). Grid-exact: each token's log-ratio term rides the 1e6 grid as
    * an INTEGER (the products stay < 2^53 so the double division is exact),
    * weighted by the integer count, so the aggregate is order-independent
    * and DuckDB-replayable. One token-explode shuffle + two small joins —
    * the corpus-side totals broadcast. */
  def domainKlDivergence(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFns.tokens
    val tok = Tables
      .spread(Tables.documents(spark, sfDir))
      .select($"source", explode(tokens($"text")).as("tok"))
    val bySrc = tok.groupBy($"source", $"tok").agg(count(lit(1)).as("cnt_s"))
    val totS  = bySrc.groupBy($"source").agg(sum($"cnt_s").as("tot_s"))
    val all   = bySrc.groupBy($"tok").agg(sum($"cnt_s").as("cnt_all"))
    val totAll = all.agg(sum($"cnt_all").as("tot_all"))
    // token-keyed join stays a shuffle join (the vocabulary is unbounded at
    // corpus scale — only the per-source totals and the 1-row grand total
    // broadcast)
    bySrc
      .join(all, "tok")
      .join(broadcast(totS), "source")
      .crossJoin(broadcast(totAll))
      .withColumn(
        // each factor is cast to double BEFORE the multiply: cnt_s·tot_all
        // as a long product overflows at large corpus scale (Spark would
        // silently wrap non-ANSI, DuckDB would error — parity breaks
        // exactly when it matters); double·double just loses ulps, and the
        // oracle mirrors the same association.
        "term6",
        round(
          log(
            ($"cnt_s".cast("double") * $"tot_all".cast("double")) /
              ($"cnt_all".cast("double") * $"tot_s".cast("double"))
          ) * 1e6
        ).cast("long")
      )
      .groupBy($"source")
      .agg(
        first($"tot_s").as("n_tokens"),
        sum($"cnt_s" * $"term6").as("kl6")
      )
      .select(
        $"source",
        $"n_tokens",
        round($"kl6" / $"n_tokens" / 1e6, 6).as("kl_vs_corpus")
      )
      .orderBy($"source")
  }
}
