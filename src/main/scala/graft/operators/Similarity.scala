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
    // No spread barrier here (r19): the per-row work is 10 kernel dots —
    // light enough that the round-robin exchange cost more than the
    // parallelism bought back (measured 0.57 → 0.44 s at sf0.1). At scale
    // the scan itself is parallel. The broadcast side reads the base scan
    // directly (vec_id < 10 pushed to the scan) instead of hanging off the
    // spread exchange — one stage, no shuffle, same rows.
    val base = Tables.embeddings(spark, sfDir)
    val e    = base.select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    val q = base
      .filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), norm($"embedding").as("qn"))
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
    ivfQuery(e, labelCents(spark, sfDir), nprobe)
  }

  /** Coarse quantizer shared by q76/q153/q156: per-label mean vector
    * (k = #labels inverted lists). The mean goes through the Det
    * scaled-long grid (round(v·1e6) summed as LONG) so it is independent
    * of shuffle-merge order AND bit-replayable by the DuckDB oracle — a
    * raw double avg would differ in final ulps between engines and across
    * runs. */
  private[graft] def labelCents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      .agg((sum(graft.functions.Kernels.roundLong($"v" * 1e6)) / 1e6 / count(lit(1))).as("m"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
      .select(
        $"label".as("cent_id"),
        transform($"pm", p => p.getField("m").cast("float")).as("cvec")
      )
      .withColumn("cnrm", norm($"cvec"))
  }

  /** Coarse nearest-centroid assignment WITHOUT the n×k row blowup: the
    * whole (small, ≤ nlist-row) centroid table collapses to ONE broadcast
    * row (ids, row-major flattened vectors, norms) and
    * [[graft.functions.Kernels.bestCent]] computes the argmax inside a
    * single codegen'd call per vector — identical pick to the
    * crossJoin + `row_number() over (ccos DESC, cent_id ASC)` formulation
    * it replaced (same sequential-IEEE dots, java.lang.Double.compare =
    * Spark's sort order at the NaN/−0.0 edges), but with NO n×k
    * intermediate rows. The old shape materialized 2B rows × ~300 B
    * through a window sort at the sf100 rung (2M vectors × 1000 lists) —
    * an ~600 GB spill that OOM'd the default 8 GB heap and forced
    * `SPARK_DRIVER_MEM=32g` (r14 memory note); this shape is O(n) rows and
    * n·k·dim flops, constant memory — the 100 TB answer. Output: `e`'s
    * columns plus `cent_id`. */
  private[operators] def assignCents(e: DataFrame, cents: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    // ids ride the kernel as LONG regardless of the caller's cent_id type
    // (int labels/clusters OR the recall probe's vec_id-derived bigints —
    // a fixed-width getInt on a long array corrupts silently), and the
    // result narrows back to the caller's exact type so downstream joins
    // and declared schemas are unchanged.
    val idType = cents.schema("cent_id").dataType
    val centsRow = cents
      .agg(array_sort(collect_list(struct($"cent_id".cast("long").as("cent_id"), $"cvec", $"cnrm"))).as("cl"))
      .select(
        transform($"cl", s => s.getField("cent_id")).as("cent_ids"),
        flatten(transform($"cl", s => s.getField("cvec"))).as("cent_flat"),
        transform($"cl", s => s.getField("cnrm")).as("cent_nrms")
      )
    e.crossJoin(broadcast(centsRow))
      .withColumn(
        "cent_id",
        graft.functions.Kernels.bestCent($"embedding", $"nrm", $"cent_ids", $"cent_flat", $"cent_nrms")
          .cast(idType)
      )
      // degenerate inputs (empty centroid table, per-row dim mismatch)
      // null the kernel result; the crossJoin+window this replaced yielded
      // ZERO rows there, so drop them rather than hand a future caller a
      // silent null cent_id (r15 ADVICE — current callers inner-join on
      // cent_id and are unaffected either way)
      .filter($"cent_id".isNotNull)
      .drop("cent_ids", "cent_flat", "cent_nrms")
  }

  /** The IVF QUERY tail shared by q76/q153 (label-mean quantizer) and q154
    * (trained quantizer): assign every vector to its nearest centroid
    * ([[assignCents]] — kernel argmax over the broadcast centroid row),
    * probe the queries' `nprobe` nearest lists, score only candidates in
    * probed lists via the equi-join on centroid id, rank top 10. `cents`
    * must carry (cent_id, cvec, cnrm). */
  private[graft] def ivfQuery(e: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val assigned = assignCents(e, cents)
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
  // ---- IVF-PQ (q156): product quantization composed into the IVF tail ----

  /** PQ geometry: 64-dim vectors split into 8 sub-vectors of 8 dims. */
  private[graft] val PqBlocks = 8
  private[graft] val PqBlockDim = Dim / PqBlocks
  /** Codes per sub-vector codebook (4-bit PQ). The scalerecall probe grades
    * recall at (nprobe, codes) corners; this is the declared setting. */
  private[graft] val PqCodes = 16
  /** ADC shortlist width before exact rescoring. */
  private[graft] val PqShortlist = 50

  /** Integer squared-L2 between two equal-length long arrays — exact in
    * both engines (all values on the 1e6 grid; max Σ ≈ 1e14 « 2^63). */
  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  /** (vec_id, b, gvec): the 1e6-grid sub-vectors of every embedding —
    * slice, not explode/regroup, so the fan-out is a cheap projection. */
  private def pqBlocks(g: DataFrame): DataFrame = {
    import g.sparkSession.implicits._
    g.select(
      $"vec_id",
      explode(
        array((0 until PqBlocks).map(b =>
          struct(lit(b).as("b"), slice($"grid", b * PqBlockDim + 1, PqBlockDim).as("gvec"))): _*)
      ).as("blk")
    ).select($"vec_id", $"blk.b".as("b"), $"blk.gvec".as("gvec"))
  }

  /** Per-(block, code) centroid of `assigned` (vec_id, b, gvec, c): the
    * truncated-integer per-dim mean `sum div count` — Spark `div` and
    * DuckDB `//` both truncate toward zero, so the codebook is bit-equal
    * in both engines with NO floating point anywhere. */
  private def pqCodebook(assigned: DataFrame): DataFrame = {
    import assigned.sparkSession.implicits._
    assigned
      .select($"b", $"c", posexplode($"gvec").as(Seq("j", "gv")))
      .groupBy($"b", $"c", $"j")
      .agg(expr("sum(gv) div count(1)").cast("long").as("cg"))
      .groupBy($"b", $"c")
      .agg(array_sort(collect_list(struct($"j", $"cg"))).as("jc"))
      .select($"b", $"c", transform($"jc", s => s.getField("cg")).as("cvec"))
  }

  /** Nearest-code assignment of every (vec, block) against codebook `cb`
    * (b, c, cvec) — integer d2, deterministic code tiebreak. Same shape
    * shift as [[assignCents]]: the per-block codebook (≤ nCodes rows)
    * collapses to one broadcast row per b and
    * [[graft.functions.Kernels.bestCode]] computes the argmin per (vec,
    * block) in one codegen'd call — identical pick to the old
    * join + `row_number() over (bd2 ASC, c ASC)` window (exact long
    * arithmetic both ways), without materializing blocks×codes rows
    * (256M at the sf100 rung) through a window sort. */
  private def pqAssign(blocks: DataFrame, cb: DataFrame): DataFrame = {
    import blocks.sparkSession.implicits._
    // code ids ride the kernel as LONG (the kernel id convention — see
    // HashKernels.bestCodeId) and the result narrows back to the declared
    // int code type; the long cast inside the struct preserves sort order
    val cbRow = cb
      .groupBy($"b")
      .agg(array_sort(collect_list(struct($"c".cast("long").as("c"), $"cvec"))).as("cl"))
      .select(
        $"b",
        transform($"cl", s => s.getField("c")).as("code_ids"),
        flatten(transform($"cl", s => s.getField("cvec"))).as("code_flat")
      )
    blocks
      .join(broadcast(cbRow), "b")
      .withColumn(
        "c",
        graft.functions.Kernels.bestCode($"gvec", $"code_ids", $"code_flat").cast("int")
      )
      .select($"vec_id", $"b", $"gvec", $"c")
  }

  /** Declared query (q156): IVF-PQ — the production 100 TB ANN composition.
    * Product-quantization codebooks are TRAINED per 8-dim sub-vector block
    * (seed code = vec_id mod 16, one Lloyd assign+recompute step — the
    * q107/q154 trained-centroid pattern on the 1e6 integer grid with
    * truncated-integer means, zero floating point), every vector is
    * ENCODED to 8 nibbles (4-bit codes — a 64× compression of the float
    * vector), the coarse IVF tail (q76's label-mean quantizer) restricts
    * candidates to the probed inverted lists, candidates are scored by
    * ASYMMETRIC DISTANCE (exact integer d2 between the query's grid
    * sub-vectors and each candidate's reconstructed codebook entries —
    * the candidate's floats are never touched), the best
    * [[PqShortlist]] per query by ADC advance, and the shortlist alone is
    * EXACTLY rescored by cosine for the final top-10. Every stage —
    * training, encoding, probing, ADC, rescore — replays bit-exactly in
    * the DuckDB oracle. Scale shape: codebooks and probe tables broadcast
    * (≤ 128 rows); the ADC join is equi on (cand_id) then (b, code);
    * no all-pairs anywhere; the scan side touches nprobe/nlist of the
    * data and reads 8 bytes of code per candidate instead of 256 bytes
    * of float — the memory-bandwidth win PQ exists for. */
  def ivfPqTopK(spark: SparkSession, sfDir: String): DataFrame =
    ivfPqTopKAt(spark, sfDir, IvfNprobe, PqCodes)

  /** Declared query (q161): IVF-PQ over the TRAINED coarse quantizer —
    * the full production ANN composition: q154's grid-exact two-iteration
    * Lloyd centroids ([[Clustering.trainedCentroids]]) bound the inverted
    * lists, [[ivfPqQuery]]'s trained codebooks score the candidates by
    * integer asymmetric distance, the shortlist rescores exactly. Pure
    * composition of the two declared halves — one plan, one oracle. */
  def ivfPqTrainedTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = {
      import spark.implicits._
      Tables.spread(Tables.embeddings(spark, sfDir))
        .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    }
    ivfPqQuery(e, Clustering.trainedCentroids(spark, sfDir), IvfNprobe, PqCodes)
  }

  /** (nprobe, nCodes)-parameterized IVF-PQ — the scalerecall probe grades
    * the corners; the declared query pins (IvfNprobe, PqCodes). */
  private[graft] def ivfPqTopKAt(
      spark: SparkSession,
      sfDir: String,
      nprobe: Int,
      nCodes: Int
  ): DataFrame = {
    val e = {
      import spark.implicits._
      Tables.spread(Tables.embeddings(spark, sfDir))
        .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    }
    ivfPqQuery(e, labelCents(spark, sfDir), nprobe, nCodes)
  }

  /** The IVF-PQ query tail over any (vec_id, embedding, nrm) relation and
    * coarse-centroid table — shared by the declared query (query set =
    * vec_id 0..9, the fixture convention) and the scalerecall
    * synthetic-corpus probe (query ids 1..20). */
  private[graft] def ivfPqQuery(
      e: DataFrame,
      cents: DataFrame,
      nprobe: Int,
      nCodes: Int,
      qLo: Long = 0L,
      qHi: Long = 9L
  ): DataFrame = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window

    val g = e.select(
      $"vec_id",
      // roundLong kernel (r20 sweep): per vector ELEMENT (64×/row) — the
      // Round expression allocated a BigDecimal per element
      transform($"embedding", v => graft.functions.Kernels.roundLong(v.cast("double") * 1e6))
        .as("grid")
    )
    // ONE grid/explode pass (r20): the block table is consumed by the two
    // training passes (cb0 assign, cb1 assign), the encode pass and the
    // query-block probe — AQE reuses only the spread EXCHANGE across those
    // subtrees, so the grid transform + block explode re-executed per
    // consumer. The table is minimal-width (vec_id, b, 8-long gvec); the
    // eager localCheckpoint materializes it once, the same discipline as
    // the phash/funnel tables (at the truly-huge rung swap for reliable
    // checkpoint storage).
    val blocks = pqBlocks(g).localCheckpoint(true)

    // train: seed codebook from vec_id mod nCodes, one Lloyd step
    val cb0 = pqCodebook(blocks.withColumn("c", ($"vec_id" % nCodes).cast("int")))
    val cb1 = pqCodebook(pqAssign(blocks, cb0))
    // encode: nearest cb1 code per (vec, block)
    val codes = pqAssign(blocks, cb1).select($"vec_id", $"b", $"c".as("code"))

    // coarse IVF: assign all vectors to lists (kernel argmax — see
    // assignCents), probe the queries' nprobe lists
    val assigned = assignCents(e, cents)
      .select($"vec_id", $"cent_id")
    val wProbe = Window.partitionBy($"query_id").orderBy($"ccos".desc, $"probe_cent")
    val probes = e
      .filter($"vec_id".between(qLo, qHi))
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"nrm".as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine($"qe", $"qn", $"cvec", $"cnrm"))
      .withColumn("probe_cent", $"cent_id")
      .withColumn("crk", row_number().over(wProbe))
      .filter($"crk" <= nprobe)
      .select($"query_id", $"probe_cent")
    val cand = assigned
      .join(broadcast(probes), $"cent_id" === $"probe_cent" && $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("cand_id"))

    // ADC: query grid blocks vs each candidate's reconstructed code vectors
    val qb = blocks
      .filter($"vec_id".between(qLo, qHi))
      .select($"vec_id".as("query_id"), $"b", $"gvec".as("qvec"))
    val cbR = cb1.select($"b".as("cb_b"), $"c".as("cb_c"), $"cvec")
    val adc = cand
      .join(codes.withColumnRenamed("vec_id", "cand_id"), "cand_id")
      .join(broadcast(cbR), $"b" === $"cb_b" && $"code" === $"cb_c")
      .join(broadcast(qb), Seq("query_id", "b"))
      .withColumn("bd2", d2($"qvec", $"cvec"))
      .groupBy($"query_id", $"cand_id")
      .agg(sum($"bd2").as("adc"))
    val wShort = Window.partitionBy($"query_id").orderBy($"adc".asc, $"cand_id")
    val short = adc
      .withColumn("srk", row_number().over(wShort))
      .filter($"srk" <= PqShortlist)
      .select($"query_id", $"cand_id")

    // exact rescore of the shortlist only
    val wRank = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id")
    short
      .join(e.select($"vec_id".as("query_id"), $"embedding".as("qe"), $"nrm".as("qn")), "query_id")
      .join(e.select($"vec_id".as("cand_id"), $"embedding".as("ce"), $"nrm".as("cn")), "cand_id")
      .withColumn("cos", round(cosine($"qe", $"qn", $"ce", $"cn"), 6))
      .withColumn("rk", row_number().over(wRank))
      .filter($"rk" <= 10)
      .select($"query_id", $"rk", $"cand_id", $"cos")
      .orderBy($"query_id", $"rk")
  }

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
        // roundLong kernel (r20 sweep): per element; the int cast is exact —
        // q ∈ [−127, 127] by construction (|x| ≤ mx)
        transform($"embedding",
          x => graft.functions.Kernels.roundLong(x.cast("double") * 127.0 / $"mx").cast("int"))
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
