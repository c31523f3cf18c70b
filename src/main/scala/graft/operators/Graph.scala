package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * (node, comp) with comp = min node id reachable. */
  def minLabelComponents(nodes: DataFrame, edgeList: DataFrame, maxIter: Int = 20): DataFrame = {
    import nodes.sparkSession.implicits._
    val sym = edgeList
      .unionByName(edgeList.select($"dst".as("src"), $"src".as("dst")))
    var labels  = nodes.select($"node", $"node".as("comp")).cache()
    var changed = 1L
    var iter    = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels, $"dst" === $"node")
        .groupBy($"src")
        .agg(min($"comp").as("nbr_comp"))
      val next = labels
        .join(nbrMin, $"node" === $"src", "left")
        .select($"node", $"comp", least($"comp", coalesce($"nbr_comp", $"comp")).as("comp2"))
        .cache()
      changed = next.filter($"comp2" < $"comp").count()
      val prev = labels
      labels = next.select($"node", $"comp2".as("comp")).cache()
      prev.unpersist()
      next.unpersist()
      iter += 1
    }
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
    edges(spark, sfDir).createOrReplaceTempView("doc_edges")
    spark.sql("""
      WITH RECURSIVE reach(node, hop) AS (
        SELECT DISTINCT src AS node, 0 AS hop FROM doc_edges WHERE src % 91 = 0
        UNION ALL
        SELECT e.dst, r.hop + 1
        FROM reach r JOIN doc_edges e ON e.src = r.node
        WHERE r.hop < 10
      )
      SELECT node, CAST(MIN(hop) AS INT) AS min_hop, COUNT(*) AS n_paths
      FROM reach GROUP BY node ORDER BY node
    """)
  }
}
