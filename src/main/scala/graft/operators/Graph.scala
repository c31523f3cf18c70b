package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components — the clustering step a dedup pipeline runs AFTER
  * pair generation: near-dup pairs form edges, components are the duplicate
  * clusters, and one survivor is kept per component. Implemented as
  * iterative min-label propagation over DataFrames (the Pregel pattern
  * without GraphX): every node starts labelled with itself; each round a
  * node takes the minimum label in its neighborhood; fixpoint in
  * O(component diameter) rounds.
  *
  * Scale shape: each round is ONE shuffle (edge⋈label join + min
  * aggregation on the node key) — the same plan GraphX/Pregel executes; the
  * driver only coordinates the loop and sees one changed-row count per
  * round. Labels are cached per round and the loop is diameter-bounded; at
  * 100 TB add `localCheckpoint` every few rounds to truncate lineage, and
  * switch to the large-star/small-star variant if diameters are unbounded.
  */
object Graph {

  /** Deterministic test graph over `documents`: chain edges (i, i+1) where
    * i % 7 < 2 and jump edges (i, i+10) where i % 13 == 0 — small
    * multi-node components with nontrivial shapes, replayable in SQL. */
  private[operators] def edges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id")
    val e1 = docs.filter($"doc_id" % 7 < 2).select($"doc_id".as("src"), ($"doc_id" + 1).as("dst"))
    val e2 = docs.filter($"doc_id" % 13 === 0).select($"doc_id".as("src"), ($"doc_id" + 10).as("dst"))
    // keep only edges whose destination exists in the node set
    e1.unionByName(e2)
      .join(docs.select($"doc_id".as("dst")), Seq("dst"))
      .select($"src", $"dst")
  }

  /** Min-label propagation over an undirected edge list; returns
    * (node, comp) with comp = min node id reachable.
    *
    * One ACTION per round: the convergence metric rides the same
    * cache-populating count as the new labels via `observe` (a
    * `CollectMetrics` node in the plan — the accumulator is filled during
    * the pass, no separate filtered-count job, and no second cached copy of
    * the round's output). Every `checkpointEvery` rounds the cached labels
    * are `localCheckpoint`ed to truncate the join-on-join lineage — at
    * 100 TB a 20-deep cached-plan chain is a recompute bomb if an executor
    * loses a cache block. */
  def minLabelComponents(
      nodes: DataFrame,
      edgeList: DataFrame,
      maxIter: Int = 20,
      checkpointEvery: Int = 5
  ): DataFrame = {
    import nodes.sparkSession.implicits._
    // cache the symmetrized edges: the edge list may itself be an expensive
    // plan (q120 feeds the Jaccard pair self-join in here) and is read once
    // per round — without the cache every round re-executes it from scratch
    val sym = edgeList
      .unionByName(edgeList.select($"dst".as("src"), $"src".as("dst")))
      .cache()
    var labels  = nodes.select($"node", $"node".as("comp")).cache()
    var changed = 1L
    var iter    = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels, $"dst" === $"node")
        .groupBy($"src")
        .agg(min($"comp").as("nbr_comp"))
      val obs = Observation(s"cc_round_$iter")
      val next = labels
        .join(nbrMin, $"node" === $"src", "left")
        .select(
          $"node",
          least($"comp", coalesce($"nbr_comp", $"comp")).as("comp"),
          when($"nbr_comp" < $"comp", 1L).otherwise(0L).as("ch")
        )
        .observe(obs, sum($"ch").as("changed"))
        .select($"node", $"comp")
        .cache()
      next.count() // the round's single action: fills cache + observation
      changed = obs.get("changed") match {
        case n: Number => n.longValue()
        case _         => 0L
      }
      val prev = labels
      labels = next
      prev.unpersist()
      if (changed > 0 && (iter + 1) % checkpointEvery == 0) {
        val chk = labels.localCheckpoint(true)
        labels.unpersist()
        labels = chk
      }
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Declared query: components of the deterministic doc graph — one row
    * per node with its component id (min member) and component size. */
  def connectedComponents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nodes = Tables.documents(spark, sfDir).select($"doc_id".as("node"))
    val comp  = minLabelComponents(nodes, edges(spark, sfDir))
    val sizes = comp.groupBy($"comp").agg(count(lit(1)).as("comp_size"))
    comp
      .join(sizes, "comp")
      .select($"node", $"comp", $"comp_size")
      .orderBy($"node")
  }

  /** Transitive reachability through the SQL entry point's RECURSIVE CTE
    * (Spark 4's UnionLoop execution): hop-bounded BFS from hub seeds
    * (src % 91 == 0) over the directed doc graph, returning each reachable
    * node with its minimum hop distance and path multiplicity. The edge set
    * is a DAG (dst > src always), so the UNION ALL recursion terminates
    * without the hop guard; the guard documents the bound and protects
    * arbitrary user graphs. Each recursion level is one equi-join shuffle —
    * the same per-level plan the hand-rolled [[minLabelComponents]] loop
    * executes, but declared in SQL and planned by Catalyst. */
  def recursiveReachability(spark: SparkSession, sfDir: String): DataFrame = {
    // Unique per-call view name: createOrReplaceTempView is session-global
    // mutable state, and a fixed name would race if two queries ran
    // concurrently in one SparkSession. sql() resolves the view eagerly, so
    // it can be dropped before returning.
    val v = s"doc_edges_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    edges(spark, sfDir).createOrReplaceTempView(v)
    try
      spark.sql(s"""
        WITH RECURSIVE reach(node, hop) AS (
          SELECT DISTINCT src AS node, 0 AS hop FROM $v WHERE src % 91 = 0
          UNION ALL
          SELECT e.dst, r.hop + 1
          FROM reach r JOIN $v e ON e.src = r.node
          WHERE r.hop < 10
        )
        SELECT node, CAST(MIN(hop) AS INT) AS min_hop, COUNT(*) AS n_paths
        FROM reach GROUP BY node ORDER BY node
      """)
    finally spark.catalog.dropTempView(v)
  }
}
