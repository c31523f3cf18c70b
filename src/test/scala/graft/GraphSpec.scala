package graft

import graft.operators.{Dedup, Graph}

/** Min-label connected components: exact clusters on a known graph, and the
  * real dedup integration (near-dup pairs → duplicate clusters → survivor). */
class GraphSpec extends SparkSpec {

  test("exact components on a hand-built graph") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val comp = Graph
      .minLabelComponents(nodes, edges)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("minhash pairs cluster into duplicate components with the source as survivor") {
    import spark.implicits._
    val pairs = Dedup.minhashLshPairs(spark, sf)
    val nodes = Dedup
      .docsWithDups(spark, sf)
      .select($"doc_id".as("node"))
    val comp = Graph.minLabelComponents(
      nodes,
      pairs.select($"id1".as("src"), $"id2".as("dst"))
    )
    // every injected copy (id + 1_000_000) must share a component with its
    // source doc (clusters may legitimately merge further via natural
    // near-dup pairs between different sources)
    val byNode = comp.select($"node", $"comp")
    val copies = byNode
      .filter($"node" >= 1000000L)
      .select(($"node" - 1000000L).as("src_node"), $"comp".as("copy_comp"))
    val misplaced = copies
      .join(byNode.select($"node".as("src_node"), $"comp".as("src_comp")), "src_node")
      .filter($"copy_comp" =!= $"src_comp")
      .count()
    assert(misplaced === 0, "each injected duplicate clusters with its source doc")
  }
}
