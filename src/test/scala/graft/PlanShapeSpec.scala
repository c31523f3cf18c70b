package graft

import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the properties that make these queries
  * scale are structural (broadcast vs shuffle, partial agg, top-k without
  * global sort, no cartesian products) — assert them so a refactor can't
  * silently regress the 100 TB story. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01 aggregates split partial/final (two HashAggregates)") {
    val p = planOf("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q01 pushes the shipdate filter into the parquet scan") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
  }

  test("q01 prunes columns at the scan (no full-width read)") {
    val p = planOf("q01_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && readSchema.contains("l_quantity"), readSchema)
  }

  test("q10 star join broadcasts the filtered customer side; top-20 avoids a full sort") {
    // BENCH_r12 read q10 at 1.64x its r11 time (host-phase suspected); this
    // pins the plan so a regression would be CODE, not phase: the filtered
    // customer dimension broadcasts (from stats, per the hint policy), the
    // fact join never sort-merges at this size, and the limit-20 plans as
    // TakeOrderedAndProject rather than a global sort.
    val p = planOf("q10_join_revenue_by_order")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), "no sort-merge in the fixture-size star join")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q11 dimension joins broadcast (no shuffle join)") {
    val p = planOf("q11_join_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dimensions must not sort-merge at this size")
  }

  test("q16 theta join plans as a band-blocked hash join (no nested loop)") {
    val p = planOf("q16_theta_join_price_band")
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(3000))
  }

  test("q19b part side broadcasts from size stats alone (no hint)") {
    // the hint was removed per the broadcast policy (Relational:117-124);
    // at fixture size Catalyst must still pick broadcast from stats, and
    // at 100 TB the unhinted join degrades to shuffle instead of OOM
    val p = planOf("q19b_disjunctive_predicates")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q26 global top-k avoids a full sort (TakeOrderedAndProject)") {
    val p = planOf("q26_global_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q65 minhash LSH never plans a cartesian or nested-loop join") {
    val p = planOf("q65_minhash_lsh_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q13 semi join plans as a semi join (no row duplication)") {
    val p = planOf("q13_semi_join_orders")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("q69 cosine top-k broadcasts the query side") {
    val p = planOf("q69_cosine_topk")
    assert(p.contains("BroadcastExchange"), p.take(2000))
  }

  test("q68 embedding near-dup is bucketed: no nested-loop or cartesian join") {
    val p = planOf("q68_embedding_near_dup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(3000))
  }

  test("q67 jaccard self-join never broadcasts the exploded shingle side") {
    val p = planOf("q67_ngram_jaccard_pairs")
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastHashJoin"), "exploded inverted index must not broadcast")
  }

  test("q84 pack-sequences runs no single-partition window (two-pass prefix sum)") {
    // AQE wraps the physical tree, so assert on the optimized logical plan:
    // every Window node must carry a partition spec (the bucket column)
    val ws = SparkEntry
      .queries("q84_pack_sequences")(spark, sf)
      .queryExecution
      .optimizedPlan
      .collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(ws.nonEmpty, "expected a partitioned running-sum window")
    ws.foreach(w => assert(w.partitionSpec.nonEmpty, s"unpartitioned window: $w"))
  }

  test("q78 deterministic shuffle cuts with TakeOrderedAndProject before numbering") {
    val p = planOf("q78_deterministic_shuffle")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q86 decontamination broadcasts the (small) eval side only") {
    val p = planOf("q86_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(3000))
  }

  test("q89 capped jaccard keeps the candidate self-join off broadcast") {
    val p = planOf("q89_capped_jaccard_pairs")
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
  }

  private def finalAdaptivePlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.write.mode("overwrite").format("noop").save()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.finalPhysicalPlan.toString
      case p => p.toString
    }
  }

  test("dedup self-joins materialize their heavy pipeline ONCE (AQE ReusedExchange)") {
    // the shared repartition-on-the-join-key before the per-side renames is
    // what makes both sides' exchanges canonically identical — regression
    // here means the signature/band pipeline silently runs twice
    for (q <- Seq("q65_minhash_lsh_pairs", "q66_simhash_pairs", "q67_ngram_jaccard_pairs", "q68_embedding_near_dup", "q89_capped_jaccard_pairs")) {
      val p = finalAdaptivePlan(q)
      assert(p.contains("ReusedExchange"), s"$q: no exchange reuse in final adaptive plan:\n${p.take(2000)}")
    }
  }

  test("q25 per-group top-k prunes inside the window (WindowGroupLimit)") {
    // rank-filter queries must plan the group-limit optimization: each
    // partition keeps only k rows per group BEFORE the shuffle+window,
    // instead of windowing the full table and filtering after
    val p = planOf("q25_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // Spark's InjectRuntimeFilter: a selective dimension filter becomes a
    // bloom filter applied to the fact scan — the 100 TB defense against
    // shuffling fact rows that can never join. Thresholds are lowered to
    // make the tiny fixture eligible.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val ord = Tables.orders(spark, sf).filter($"o_orderpriority" === "1-URGENT")
      val j = Tables
        .lineitem(spark, sf)
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"), p.take(3000))
      assert(j.collect().map(_.getLong(1)).sum > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q127 bucketed join plans with zero shuffle (hash) exchanges") {
    // both sides bucketBy(8, orderkey): join + per-order agg read bucket
    // layout instead of shuffling — only the presentation sort may add a
    // range exchange. At the tiny fixture Catalyst prefers broadcasting
    // the small side (still shuffle-free); with broadcast disabled the
    // plan must be the 100 TB shape — a bucket-co-located SortMergeJoin
    // with STILL no hash exchange on either side.
    val p = planOf("q127_bucketed_join")
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p2 = planOf("q127_bucketed_join")
      assert(p2.contains("SortMergeJoin"), p2.take(3000))
      assert(!p2.contains("Exchange hashpartitioning"), p2.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q91 stratified sample uses a PARTITIONED rank window (no global window)") {
    val ws = SparkEntry
      .queries("q91_stratified_sample")(spark, sf)
      .queryExecution
      .optimizedPlan
      .collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty), ws.mkString("\n"))
  }
}

/** Det.decSum must be invariant to partitioning/merge order. */
class DetOrderIndependenceSpec extends SparkSpec {
  test("scaled-long sum is identical across repartitionings") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf).select($"l_extendedprice", $"l_discount")
    def total(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(Det.decSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("s"))
        .head().getDouble(0)
    val base = total(li)
    assert(total(li.repartition(1)) === base)
    assert(total(li.repartition(13)) === base)
    assert(total(li.orderBy($"l_extendedprice".desc)) === base)
  }

  test("q29 power-sum moments are bit-identical across shuffle layouts") {
    // the Welford-style builtins this replaced vary in the last ulps with
    // merge order; the exact power-sum formulation must not
    val spark2 = spark
    def run(parts: String): Seq[org.apache.spark.sql.Row] = {
      val prev = spark2.conf.get("spark.sql.shuffle.partitions")
      spark2.conf.set("spark.sql.shuffle.partitions", parts)
      try SparkEntry.queries("q29_stats_agg")(spark2, sf).collect().toSeq
      finally spark2.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(run("1") === run("7"), "moments must not depend on partition count")
  }
}
