package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Kernels
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. At 100 TB the single biggest shuffle-join
  * failure mode is a hot key: one reducer receives a large fraction of the
  * fact table while the other 999 executors idle. The standard fix when the
  * dimension side is too large to broadcast is SALTING: replicate each dim
  * row `SALT` times (one per salt bucket), scatter the fact side uniformly
  * across the buckets with a hash, and join on (key, salt) — the hot key's
  * rows now spread over `SALT` reducers. The salt never reaches the output,
  * so the result is identical to the plain join (asserted in Round4OpsSpec
  * and via the DuckDB oracle, which replays the UNSALTED join).
  */
object Skew {

  private val Salt = 16

  /** Fact side with an artificially skewed key: 3 of every 4 line items
    * land on key 0, the rest spread over 1..996. */
  private def skewedFact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, sfDir)
      .select(
        when($"l_orderkey" % 4 =!= 0, lit(0L))
          .otherwise($"l_orderkey" % 997)
          .as("k"),
        $"l_extendedprice"
      )
  }

  /** Dimension keyed 0..996 with a 7-way category (too many distinct keys
    * to pre-aggregate the fact side; small here, but the salted plan is the
    * one that works when it is NOT broadcastable). */
  private def dim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .part(spark, sfDir)
      .filter($"p_partkey" <= 997)
      .select(($"p_partkey" - 1).as("k"), ($"p_partkey" % 7).as("category"))
  }

  /** Revenue per category through a salted shuffle-hash join. The fact row's
    * salt is any uniform hash (it only balances partitions — the value never
    * affects the result); the dim side replicates each row across all Salt
    * buckets via explode. The `shuffle_hash` hint keeps the join a shuffle
    * join so the test proves the salted shape, not a broadcast shortcut.
    * Revenue sums in integer cents (order-independent, oracle-exact). */
  def saltedSkewJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val factS = skewedFact(spark, sfDir)
      .withColumn("salt", pmod(xxhash64($"l_extendedprice"), lit(Salt.toLong)))
    val dimS = dim(spark, sfDir)
      .withColumn("salt", explode(sequence(lit(0L), lit(Salt - 1L))))
    factS
      .join(dimS.hint("shuffle_hash"), Seq("k", "salt"))
      .groupBy($"category")
      .agg(
        count(lit(1)).as("n_items"),
        sum(Kernels.roundLong($"l_extendedprice" * 100)).as("cents")
      )
      .select(
        $"category",
        $"n_items",
        ($"cents".cast("double") / 100.0).as("revenue")
      )
      .orderBy($"category")
  }

  /** The unsalted reference join (same result, hot-key-bottlenecked plan) —
    * used by the parity test, not declared. */
  private[graft] def plainJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    skewedFact(spark, sfDir)
      .join(dim(spark, sfDir), Seq("k"))
      .groupBy($"category")
      .agg(
        count(lit(1)).as("n_items"),
        sum(Kernels.roundLong($"l_extendedprice" * 100)).as("cents")
      )
      .select(
        $"category",
        $"n_items",
        ($"cents".cast("double") / 100.0).as("revenue")
      )
      .orderBy($"category")
  }
}
