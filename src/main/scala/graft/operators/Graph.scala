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
  private[graft] def edges(spark: SparkSession, sfDir: String): DataFrame = {
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
    * `roundsPerAction` propagation rounds per ACTION (default 2): each
    * driver action evaluates the label-update plan that many times
    * back-to-back — same shuffles per round, fewer job-launch / cache /
    * convergence-check barriers (at 1000 executors every action is a full
    * cluster sync). Size it to the expected component diameter: near-dup
    * clusters are diameter-≤2 almost always, so 3 rounds converge AND
    * prove the fixpoint in a single action. The convergence metric rides
    * the cache-populating count via `observe` (a `CollectMetrics` node per
    * round, no separate filtered-count job); a zero-change round is a
    * fixpoint, so stopping on the last round's counter is exact. Every
    * `checkpointEvery` actions the cached labels are `localCheckpoint`ed
    * to truncate the join-on-join lineage — at 100 TB a deep cached-plan
    * chain is a recompute bomb if an executor loses a cache block. */
  def minLabelComponents(
      nodes: DataFrame,
      edgeList: DataFrame,
      maxIter: Int = 20,
      checkpointEvery: Int = 3,
      roundsPerAction: Int = 2
  ): DataFrame = {
    import nodes.sparkSession.implicits._
    // cache the DIRECTED edges, not the symmetrized union: the edge list
    // may itself be an expensive plan (the dedup endgame feeds the minhash
    // pair pipeline in here), and a cache placed above the union would
    // evaluate that plan once per union branch during fill — both branches
    // below share ONE InMemoryRelation, so the plan runs once and every
    // round's symmetrize is two cheap cached scans
    val e = edgeList.cache()
    val sym = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
    // one min-label round: neighborhood-min join + label update, with the
    // changed-row count observed in-pass
    def step(lbl: DataFrame, obs: Observation): DataFrame = {
      // deliberately UNHINTED joins: both sides are cached, so AQE plans
      // each round from ACCURATE runtime sizes — broadcast while the label
      // table provably fits (fast on fixtures), shuffle-on-key once it
      // doesn't (the 100 TB shape). This differs from the dedup self-joins,
      // whose shuffle_hash hints guard against a STATIC misestimate of an
      // exploded side; here there is nothing to misestimate. (Forcing
      // shuffle_hash was measured 3x slower at sf0.1: it trades one
      // broadcast for two exchanges of tiny tasks per round.)
      val nbrMin = sym
        .join(lbl, $"dst" === $"node")
        .groupBy($"src")
        .agg(min($"comp").as("nbr_comp"))
      lbl
        .join(nbrMin, $"node" === $"src", "left")
        .select(
          $"node",
          least($"comp", coalesce($"nbr_comp", $"comp")).as("comp"),
          when($"nbr_comp" < $"comp", 1L).otherwise(0L).as("ch")
        )
        .observe(obs, sum($"ch").as("changed"))
        .select($"node", $"comp")
    }
    def metric(obs: Observation): Long = obs.get("changed") match {
      case n: Number => n.longValue()
      case _         => 0L
    }
    var labels     = nodes.select($"node", $"node".as("comp")).cache()
    var changed    = 1L
    var action     = 0
    val rounds     = math.max(roundsPerAction, 1)
    val maxActions = (maxIter + rounds - 1) / rounds
    while (changed > 0 && action < maxActions) {
      val obss = (1 to rounds).map(r => Observation(s"cc_a${action}_r$r"))
      val next = obss.foldLeft(labels)((lbl, obs) => step(lbl, obs)).cache()
      next.count() // the action: fills cache + every round's observation
      changed = metric(obss.last)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] action=$action changed=${obss.map(metric).mkString(",")}")
      val prev = labels
      labels = next
      prev.unpersist()
      if (changed > 0 && (action + 1) % checkpointEvery == 0) {
        val chk = labels.localCheckpoint(true)
        labels.unpersist()
        labels = chk
      }
      action += 1
    }
    // Break the result's lineage from the loop caches BEFORE dropping
    // them: uncaching a parent INVALIDATES dependent cached data (Spark's
    // non-cascading uncache clears dependents for lazy rebuild), so
    // returning the cached `labels` directly would silently replay the
    // whole loop lineage — including a possibly-expensive edge plan like
    // the dedup endgame's minhash pairs — on the caller's next action.
    // The checkpoint copies only the tiny (node, comp) table out of the
    // cache, after which every loop cache can be dropped for real.
    val result = labels.localCheckpoint(true)
    labels.unpersist()
    e.unpersist()
    result
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
