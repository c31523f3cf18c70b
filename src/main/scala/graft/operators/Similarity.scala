package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star X3/X4):
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * The query set is tiny (vec_id < 10) and broadcast, so the brute-force
  * plan is a single pass over the candidate side — scan-parallel at any
  * scale for a bounded query set. The LSH variant buckets BOTH sides by
  * sign-pattern so the join is equi on the bucket id — a hash shuffle, no
  * cross join — which is the plan that survives 1000 executors.
  *
  * All projection weights derive from md5 (computed driver-side into plan
  * literals) so the pipeline is deterministic with no RNG state.
  */
object Similarity {

  private val Dim = graft.Tables.EmbeddingDim

  /** Deterministic md5-derived pseudo-random weight in [-1, 1) for
    * (plane, dim) — same arithmetic the DuckDB oracle can replay:
    * (('0x'||substr(md5(p||'_'||d),1,15))::BIGINT % 2001 - 1000) / 1000.0 */
  private def planeWeight(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${p}_$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    (h % 2001 - 1000) / 1000.0
  }

  /** Projection of a float vector onto a literal hyperplane — the compiled
    * [[graft.functions.Kernels.dotWeights]] kernel (one static call per row
    * inside codegen; the declarative zip_with form pays per-element
    * interpreted dispatch × planes × tables). */
  private def dotLit(e: Column, w: Seq[Double]): Column =
    graft.functions.Kernels.dotWeights(e, typedLit(w))

  /** L2 norm via the codegen'd dot kernel (same sequential-order IEEE sum
    * as the aggregate/zip_with formulation — see [[graft.functions.Kernels]]). */
  private[operators] def norm(e: Column): Column =
    sqrt(graft.functions.Kernels.dot(e, e))

  private[operators] def cosine(e1: Column, n1: Column, e2: Column, n2: Column): Column =
    graft.functions.Kernels.dot(e1, e2) / (n1 * n2)

  /** Brute-force cosine top-10 per query (queries = vec_id < 10, self
    * excluded). Rank on the 6-decimal-rounded cosine with vec_id tiebreak so
    * the cut is deterministic across engines. */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.spread(Tables.embeddings(spark, sfDir))
      .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"nrm".as("qn"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    e.join(broadcast(q), $"vec_id" =!= $"query_id")
      .withColumn("cos", round(cosine($"qe", $"qn", $"embedding", $"nrm"), 6))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 10)
      .select($"query_id", $"rk", $"vec_id".as("cand_id"), $"cos")
      .orderBy($"query_id", $"rk")
  }

  /** Sign-pattern bucket id over `nPlanes` hyperplanes from table `table`
    * (each table uses an independent md5-derived plane set). */
  def lshBucket(e: Column, table: Int, nPlanes: Int): Column =
    (0 until nPlanes)
      .map(p =>
        when(dotLit(e, (0 until Dim).map(planeWeight(table * nPlanes + p, _))) > 0, 1L << p)
          .otherwise(0L)
      )
      .reduce(_ + _)

  /** Probe width of the DECLARED q76 query (pinned — its DuckDB oracle
    * replays this exact setting). The scalerecall probe grades the
    * recall-vs-nprobe curve; at the fixture's nlist (= #labels) this
    * narrow setting is fine, but on a large random-vector index recall at
    * low target cosine degrades (measured 0.71 at cosine 0.80, 64 lists)
    * — which is why the PRODUCTION setting is separate and wider. */
  private[graft] val IvfNprobe = 4

  /** Production probe width: the lowest step of the scalerecall
    * recall-vs-nprobe curve (nprobe ∈ {4, 8, 16} over 64 lists) that holds
    * recall@10 ≥ 0.9 down to target cosine 0.80 at n = 100k — the probe
    * tripwires this setting every run. Cost is linear in nprobe
    * (nprobe/nlist of the index is scanned), the standard IVF
    * recall-for-throughput dial. */
  private[graft] val IvfNprobeProd = 16

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path next to LSH: a small centroid table (the coarse quantizer; here
    * the per-label mean vectors, a deterministic stand-in for k-means),
    * every vector assigned to its nearest centroid (one broadcast pass), and
    * queries probing the `nprobe` nearest inverted lists via an equi-join on
    * centroid id — a hash shuffle over ~nprobe/k of the data instead of a
    * full scan. Every ingredient (scaled-long centroid means, md5-free
    * deterministic assignment, sequential-order IEEE dots) is deliberately
    * engine-replayable, so the DuckDB oracle reproduces the FULL approximate
    * result hash-exactly; recall vs brute force is additionally asserted in
    * the test suite and graded against nprobe by the scalerecall probe. */
  def ivfCosineTopK(spark: SparkSession, sfDir: String): DataFrame =
    ivfCosineTopKAt(spark, sfDir, IvfNprobe)

  /** Declared query (q153): the IVF plan at FULL probe width (nprobe ≥
    * nlist — every inverted list probed). Every vector is assigned to
    * exactly one list, so probing all lists scores exactly the
    * brute-force candidate set and the result is HASH-IDENTICAL to q69's
    * oracle — the plan-pair proving the index machinery is lossless at
    * the nprobe dial's endpoint (the recall scalerecall measures at
    * narrow nprobe is lost to the probe cut alone). */
  def ivfFullProbeTopK(spark: SparkSession, sfDir: String): DataFrame =
    ivfCosineTopKAt(spark, sfDir, Int.MaxValue)

  /** Declared query (q154): the IVF plan over a TRAINED coarse quantizer —
    * the centroids from q107's two-iteration grid-exact Lloyd loop
    * ([[Clustering.trainedCentroids]]) instead of the per-label means.
    * This declares the composition the q76/SemDeDup scaladocs describe
    * ("a production run points this at the k-means loop") as a checked
    * query: training, index assignment, probing, and rescoring all replay
    * bit-exactly in the DuckDB oracle (the q107 Lloyd CTEs feed the q76
    * query tail). Same probe width as q76. */
  def ivfTrainedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.spread(Tables.embeddings(spark, sfDir))
      .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    ivfQuery(e, Clustering.trainedCentroids(spark, sfDir), IvfNprobe)
  }

  /** The nprobe-parameterized IVF shape ([[IvfNprobe]] for the declared
    * query, [[IvfNprobeProd]] for the graded production setting,
    * Int.MaxValue for the q153 full-probe plan pair). */
  private[graft] def ivfCosineTopKAt(spark: SparkSession, sfDir: String, nprobe: Int): DataFrame = {
    import spark.implicits._
    val e = Tables.spread(Tables.embeddings(spark, sfDir))
      .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))

    // Coarse quantizer: per-label mean vector (k = #labels inverted lists).
    // The mean goes through the Det scaled-long grid (round(v·1e6) summed as
    // LONG) so it is independent of shuffle-merge order AND bit-replayable
    // by the DuckDB oracle — a raw double avg would differ in final ulps
    // between engines and across runs.
    val cents = Tables.embeddings(spark, sfDir)
      .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      .agg((sum(round($"v" * 1e6).cast("long")) / 1e6 / count(lit(1))).as("m"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
      .select(
        $"label".as("cent_id"),
        transform($"pm", p => p.getField("m").cast("float")).as("cvec")
      )
      .withColumn("cnrm", norm($"cvec"))

    ivfQuery(e, cents, nprobe)
  }

  /** The IVF QUERY tail shared by q76/q153 (label-mean quantizer) and q154
    * (trained quantizer): assign every vector to its nearest centroid
    * (broadcast the tiny centroid table), probe the queries' `nprobe`
    * nearest lists, score only candidates in probed lists via the
    * equi-join on centroid id, rank top 10. `cents` must carry
    * (cent_id, cvec, cnrm). */
  private[graft] def ivfQuery(e: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val wAssign = Window.partitionBy($"vec_id").orderBy($"ccos".desc, $"cent_id")
    val assigned = e
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine($"embedding", $"nrm", $"cvec", $"cnrm"))
      .withColumn("crk", row_number().over(wAssign))
      .filter($"crk" === 1)
      .select($"vec_id", $"embedding", $"nrm", $"cent_id")

    val wProbe = Window.partitionBy($"query_id").orderBy($"ccos".desc, $"probe_cent")
    val probes = e
      .filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"nrm".as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine($"qe", $"qn", $"cvec", $"cnrm"))
      .withColumn("probe_cent", $"cent_id")
      .withColumn("crk", row_number().over(wProbe))
      .filter($"crk" <= nprobe)
      .select($"query_id", $"qe", $"qn", $"probe_cent")

    val wRank = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    assigned
      .join(broadcast(probes), $"cent_id" === $"probe_cent" && $"vec_id" =!= $"query_id")
      .withColumn("cos", round(cosine($"qe", $"qn", $"embedding", $"nrm"), 6))
      .withColumn("rk", row_number().over(wRank))
      .filter($"rk" <= 10)
      .select($"query_id", $"rk", $"vec_id".as("cand_id"), $"cos")
      .orderBy($"query_id", $"rk")
  }

  /** LSH-bucketed approximate top-k with OR-amplification: `nTables`
    * independent hash tables of `nPlanes` hyperplanes each; a candidate is
    * scored if it shares a bucket with the query in ANY table. The join is
    * equi on (table, bucket) — a hash shuffle, never a cross join — and the
    * per-pair dedup + top-k are bounded by the bucket sizes: the plan that
    * survives 1000 executors. The md5-derived plane weights exist precisely
    * so the DuckDB oracle can replay the whole pipeline — buckets, candidate
    * join, exact rescoring, ranks — and hash-compare the full approximate
    * output; recall vs the brute-force baseline is additionally asserted in
    * the test suite. */
  def lshCosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val nTables = 4
    val nPlanes = 4
    val e = Tables.spread(Tables.embeddings(spark, sfDir))
      .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    val buckets = array(
      (0 until nTables).map(t => struct(lit(t).as("t"), lshBucket($"embedding", t, nPlanes).as("b"))): _*
    )
    val cand = e.select($"vec_id", $"embedding", $"nrm", explode(buckets).as("tb"))
    val q = cand
      .filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"nrm".as("qn"), $"tb".as("qtb"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    cand
      .join(broadcast(q), $"tb" === $"qtb" && $"vec_id" =!= $"query_id")
      .dropDuplicates("query_id", "vec_id")
      .withColumn("cos", round(cosine($"qe", $"qn", $"embedding", $"nrm"), 6))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 10)
      .select($"query_id", $"rk", $"vec_id".as("cand_id"), $"cos")
      .orderBy($"query_id", $"rk")
  }

  /** Symmetric int8 quantization of the embedding column — the storage /
    * ANN-index compression step (4× smaller than float32): per-vector scale
    * = 127 / max|x|, q_i = round(x_i · 127 / max|x|) ∈ [-127, 127]. Output
    * keeps the declared schema narrow: the scale denominator, a digest of
    * the quantized ints, and their L1 mass as an integrity sum.
    *
    * Pure per-row map — no shuffle at any scale. Determinism: every float
    * widens to the same double in both engines, the product/divide sequence
    * is identical IEEE arithmetic, and round() on doubles rounds half away
    * from zero in both — so the int codes hash-compare exactly. */
  def quantizeEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .spread(Tables.embeddings(spark, sfDir))
      .select(
        $"vec_id",
        $"embedding",
        array_max(transform($"embedding", x => abs(x.cast("double")))).as("mx")
      )
      .withColumn(
        "q",
        transform($"embedding", x => round(x.cast("double") * 127.0 / $"mx").cast("int"))
      )
      .select(
        $"vec_id",
        round($"mx", 6).as("max_abs"),
        md5(concat_ws(",", transform($"q", _.cast("string")))).as("q_md5"),
        aggregate($"q", lit(0L), (acc, x) => acc + abs(x)).as("l1_q")
      )
      .orderBy($"vec_id")
  }
}
