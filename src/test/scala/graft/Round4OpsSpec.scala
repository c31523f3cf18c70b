package graft

import graft.operators.{Advanced, Chunking, Clustering, Graph, Skew, Versioning, Vocab}
import org.apache.spark.sql.functions._

/** Semantic properties of the round-4 iterative/versioning pack that the
  * row-hash oracle can't express: k-means partition totals, PageRank mass
  * conservation bounds, snapshot-diff verdict arithmetic, SCD2 interval
  * chaining. */
class Round4OpsSpec extends SparkSpec {

  test("kmeans clusters partition the embedding set; cosines are valid") {
    import spark.implicits._
    val out  = Clustering.kmeansClusters(spark, sf).cache()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(out.agg(sum($"n_vecs")).head().getLong(0) === nVec, "every vector assigned once")
    assert(out.select($"cluster").distinct().count() === out.count(), "cluster ids unique")
    assert(out.filter($"mean_cos" > 1.000001 || $"mean_cos" < -1.000001).count() === 0)
    assert(out.count() <= 8, "at most k clusters survive")
  }

  test("pagerank: every node ranked, floor = teleport mass, total mass bounded") {
    import spark.implicits._
    val out = Clustering.pagerankDocs(spark, sf).cache()
    val n   = Tables.documents(spark, sf).count()
    assert(out.count() === n, "one rank per document")
    val base = math.round(0.15 * 1e6 / n) / 1e6
    assert(out.filter($"pagerank" < base - 1e-9).count() === 0, "teleport floor")
    // dangling mass is dropped each round, so total mass can only shrink
    val total = out.agg(sum($"pagerank")).head().getDouble(0)
    assert(total <= 1.0 + 1e-6, s"rank mass bounded by 1 (got $total)")
    assert(total > 0.15, "teleport mass alone keeps the total above 0.15·1")
  }

  test("snapshot diff verdicts match the generating predicates exactly") {
    import spark.implicits._
    val out  = Versioning.snapshotDiff(spark, sf).cache()
    val keys = Tables.orders(spark, sf).select($"o_orderkey")
    val nRemoved = keys.filter($"o_orderkey" % 97 === 0).count()
    val nAdded   = keys.filter($"o_orderkey" % 50 === 7).count()
    val nChanged = keys.filter($"o_orderkey" % 10 === 3 && $"o_orderkey" % 97 =!= 0).count()
    val byVerdict = out.groupBy($"verdict").count().as[(String, Long)].collect().toMap
    assert(byVerdict.getOrElse("removed", 0L) === nRemoved)
    assert(byVerdict.getOrElse("added", 0L) === nAdded)
    assert(byVerdict.getOrElse("changed", 0L) === nChanged)
    assert(!byVerdict.contains("unchanged"), "unchanged rows filtered out")
  }

  test("scd2 history chains validity intervals with one open row per key") {
    import spark.implicits._
    val out = Versioning.scd2History(spark, sf).cache()
    assert(out.filter($"version" === 1).count() ===
      out.select($"o_orderkey").distinct().count(), "every key starts at version 1")
    assert(out.filter($"is_current").count() ===
      out.select($"o_orderkey").distinct().count(), "exactly one current row per key")
    // lead() chaining: valid_to of version v equals valid_from of version v+1
    val chained = out.as("a")
      .join(out.as("b"),
        $"a.o_orderkey" === $"b.o_orderkey" && $"a.version" + 1 === $"b.version")
      .filter($"a.valid_to" =!= $"b.valid_from")
    assert(chained.count() === 0, "intervals chain exactly")
    assert(out.filter(!$"is_current" && $"valid_to".isNull).count() === 0)
  }

  test("salted skew join returns exactly the plain join, through a shuffle join") {
    import spark.implicits._
    val salted = Skew.saltedSkewJoin(spark, sf)
    val plain  = Skew.plainJoin(spark, sf)
    assert(salted.collect().toSeq === plain.collect().toSeq, "salt is result-invariant")
    salted.write.mode("overwrite").format("noop").save()
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"salted join must stay a shuffle join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), "broadcast would defeat the salting demo")
  }

  test("recursive reachability: seeds at hop 0, hops bounded, paths positive") {
    import spark.implicits._
    val out = Graph.recursiveReachability(spark, sf).cache()
    assert(out.filter($"min_hop" === 0).count() > 0, "seed nodes present")
    assert(out.filter($"min_hop" < 0 || $"min_hop" > 10).count() === 0)
    assert(out.filter($"n_paths" < 1).count() === 0)
    // every hop-0 node must satisfy the seed predicate
    assert(out.filter($"min_hop" === 0 && $"node" % 91 =!= 0).count() === 0)
  }

  test("incremental MV merge equals the from-scratch aggregate") {
    import spark.implicits._
    val merged = Versioning.mvIncrementalMerge(spark, sf)
    val direct = Tables
      .events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round($"value" * 100).cast("long")).cast("double") / 100.0).as("total_value")
      )
      .orderBy($"day", $"event_type")
    assert(merged.collect().toSeq === direct.collect().toSeq)
  }

  test("integrity manifest checksum is partitioning-independent") {
    import spark.implicits._
    val m1 = Versioning.integrityManifest(spark, sf).collect().toSeq
    // row counts match the source tables
    val nOrders = Tables.orders(spark, sf).count()
    val nDocs   = Tables.documents(spark, sf).count()
    val byTable = m1.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTable("orders") === nOrders)
    assert(byTable("documents") === nDocs)
    // xor checksum survives an arbitrary repartition of the inputs (order-free)
    val m2 = Versioning.integrityManifest(spark, sf).collect().toSeq
    assert(m1 === m2)
  }

  test("lateral top-k: at most 3 per nation, balances non-increasing") {
    import spark.implicits._
    val out = Advanced.lateralTopPerGroup(spark, sf).cache()
    val over = out.groupBy($"n_name").count().filter($"count" > 3)
    assert(over.count() === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"n_name").orderBy($"c_acctbal".desc, $"c_name")
    val bad = out
      .withColumn("prev", lag($"c_acctbal", 1).over(w))
      .filter($"prev".isNotNull && $"prev" < $"c_acctbal")
    assert(bad.count() === 0, "per-nation balances non-increasing")
  }

  test("domain KL divergence is non-negative and covers every source") {
    import spark.implicits._
    val out  = Vocab.domainKlDivergence(spark, sf).cache()
    val nSrc = Tables.documents(spark, sf).select($"source").distinct().count()
    assert(out.count() === nSrc)
    // q (corpus) covers p's support, so KL >= 0 up to grid rounding
    assert(out.filter($"kl_vs_corpus" < -1e-4).count() === 0)
  }

  test("cdc chunks partition every document's tokens exactly") {
    import spark.implicits._
    import graft.functions.TextFns.tokens
    val out = Chunking.cdcChunks(spark, sf).cache()
    val perDoc = out.groupBy($"doc_id").agg(sum($"n_toks").as("total"))
    val src = Tables
      .documents(spark, sf)
      .select($"doc_id", size(tokens($"text")).cast("long").as("n"))
    assert(perDoc.join(src, "doc_id").filter($"total" =!= $"n").count() === 0)
    assert(out.filter($"n_toks" < 1).count() === 0)
  }

  test("cdc chunk boundaries are insert-stable: one inserted token reshapes only local chunks") {
    import spark.implicits._
    // THE property that makes CDC chunks dedup-friendly across document
    // revisions (and that fixed-width windows lack: those shift every
    // downstream chunk). Insert a single token mid-document; every chunk
    // except the one containing the edit (at most two, if the inserted
    // token lands on/creates a boundary) must keep its exact content hash.
    val base = Tables.documents(spark, sf).select($"doc_id", $"text")
    val edited = base
      .withColumn("toks", graft.functions.TextFns.tokens($"text"))
      .withColumn(
        "text",
        expr(
          "concat_ws(' ', concat(slice(toks, 1, int(size(toks) / 2)), array('zq'), " +
            "slice(toks, int(size(toks) / 2) + 1, size(toks))))"
        )
      )
      .select($"doc_id", $"text")
    val orig = Chunking.cdcChunkInventory(base).select($"doc_id", $"chunk_md5")
    val ed   = Chunking.cdcChunkInventory(edited).select($"doc_id", $"chunk_md5".as("md5_e"))
    val lost = orig
      .join(ed, orig("doc_id") === ed("doc_id") && $"chunk_md5" === $"md5_e", "left_anti")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_lost"))
      .filter($"n_lost" > 2)
    assert(lost.count() === 0,
      "an edit must invalidate at most its local chunk (plus a possible boundary split)")
  }

  test("length-bucketed batches: 8-doc cap, non-negative padding, full cover") {
    import spark.implicits._
    val out = Chunking.lengthBucketedBatches(spark, sf).cache()
    assert(out.filter($"n_docs" > 8).count() === 0)
    assert(out.filter($"padding_waste" < 0).count() === 0)
    assert(
      out.agg(sum($"n_docs")).head().getLong(0) ===
        Tables.documents(spark, sf).count()
    )
    // only the last batch of a bucket may be short
    val shortNonLast = out
      .withColumn(
        "max_batch",
        max($"batch_no").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"bucket")
        )
      )
      .filter($"n_docs" < 8 && $"batch_no" =!= $"max_batch")
    assert(shortNonLast.count() === 0)
  }

  test("cdc upsert: latest wins, deletes drop, inserts land, and re-apply is idempotent") {
    import spark.implicits._
    val base = Tables
      .orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    val feed   = Versioning.cdcChangeFeedOf(base).cache()
    val merged = Versioning.applyCdc(base, feed).cache()
    val nBase  = base.count()
    // deletes that were NOT resurrected are gone (an epoch-2 update of any
    // kind — %22 resurrection or %21 repricing — overrides the delete);
    // resurrected keys are back
    assert(
      merged
        .filter(
          $"o_orderkey" % 11 === 0 && $"o_orderkey" % 22 =!= 0 &&
            $"o_orderkey" % 21 =!= 0 && $"o_orderkey" < 1000000000L
        )
        .count() === 0
    )
    val resurrected = merged.filter($"o_orderkey" % 22 === 0 && $"o_orderkey" < 1000000000L)
    assert(resurrected.count() === base.filter($"o_orderkey" % 22 === 0).count())
    assert(resurrected.filter($"o_orderstatus" =!= "R" || $"version" =!= 2L).count() === 0)
    // epoch-2 repricing overrides epoch-1 (%21 keys not %22: status V, version 2)
    assert(
      merged
        .filter($"o_orderkey" % 21 === 0 && $"o_orderkey" % 22 =!= 0 && $"o_orderkey" < 1000000000L)
        .filter($"o_orderstatus" =!= "V" || $"version" =!= 2L)
        .count() === 0
    )
    // inserts land unless epoch 2 deleted them (%26 of the base key)
    val ins = merged.filter($"o_orderkey" >= 10000000000000L)
    assert(
      ins.count() ===
        base.filter($"o_orderkey" % 13 === 0 && $"o_orderkey" % 26 =!= 0).count()
    )
    // untouched rows pass through at version 0 with their base payload
    assert(merged.filter($"version" === 0L).count() > nBase / 2)
    // IDEMPOTENCE: applying the same feed to the merged output reproduces it
    val again = Versioning.applyCdc(
      merged.select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice"),
      feed
    )
    val mergedNoV = merged.select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    val againNoV  = again.select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    assert(mergedNoV.except(againNoV).count() === 0)
    assert(againNoV.except(mergedNoV).count() === 0)
  }
}
