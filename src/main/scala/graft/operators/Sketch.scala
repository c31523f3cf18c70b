package graft.operators

import graft.Tables
import graft.functions.TextFns.{h60, tokens}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the streaming/distributed counterpart of
  * exact group-counts (companion to the HLL cardinality sketch in
  * [[TimeSeries.hllSketchUnion]]).
  *
  * The count-min sketch here is built the distributed way: per-partition
  * partial bucket counts merged by ONE hash aggregation over a fixed
  * d×w = 4×64 grid — the sketch itself is 256 rows regardless of corpus
  * size, which is the whole point (heavy-hitter queries over 100 TB of
  * tokens touch a constant-size structure instead of a corpus-wide
  * group-by). All arithmetic is integer, so the DuckDB oracle replays the
  * sketch bit-for-bit — an EXACT hash compare of an approximate structure.
  */
object Sketch {

  private val Depth = 4
  private val Width = 64L

  /** Row-j CMS bucket of a token: md5-derived 60-bit hash mod width —
    * DuckDB mirror: ('0x' || substr(md5('cms' || j || ':' || t), 1, 15))::BIGINT % 64. */
  private def cmsBucket(j: Int, t: Column): Column =
    h60(concat(lit(s"cms$j:"), t)) % Width

  /** Declared query: heavy hitters with count-min estimates. The exact
    * top-10 tokens (the candidates a real pipeline gets from a heap beside
    * the sketch) are looked up in the sketch; the estimate is the min over
    * the d rows. `overcount` = est − exact ≥ 0 always (CMS never
    * undercounts) — emitted so the oracle verifies the guarantee, not just
    * the numbers. */
  /** The sketch of a token column: (row j, bucket b, count c) — one shuffle
    * over (row, bucket), partial map-side counts merging into ≤ d·w cells.
    * MERGEABLE by construction: the sketch of a union is the cell-wise sum
    * of the parts' sketches (asserted in Round3OpsSpec), which is what lets
    * shards/streams sketch independently and combine. */
  private[graft] def cmsSketchOf(tok: DataFrame): DataFrame = {
    import tok.sparkSession.implicits._
    tok
      .select(
        explode(
          array((0 until Depth).map(j => struct(lit(j).as("j"), cmsBucket(j, $"token").as("b"))): _*)
        ).as("jb")
      )
      .groupBy($"jb.j".as("j"), $"jb.b".as("b"))
      .agg(count(lit(1)).as("c"))
  }

  def cmsHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables
      .spread(Tables.documents(spark, sfDir))
      .select(explode(tokens($"text")).as("token"))
    val sketch = cmsSketchOf(tok)
    val top = tok
      .groupBy($"token")
      .agg(count(lit(1)).as("exact"))
      .orderBy($"exact".desc, $"token")
      .limit(10)
    top
      .select(
        $"token",
        $"exact",
        explode(
          array((0 until Depth).map(j => struct(lit(j).as("j"), cmsBucket(j, $"token").as("b"))): _*)
        ).as("jb")
      )
      .select($"token", $"exact", $"jb.j".as("j"), $"jb.b".as("b"))
      .join(broadcast(sketch), Seq("j", "b"))
      .groupBy($"token", $"exact")
      .agg(min($"c").as("cms_est"))
      .select($"token", $"exact", $"cms_est", ($"cms_est" - $"exact").as("overcount"))
      .orderBy($"exact".desc, $"token")
  }
}
