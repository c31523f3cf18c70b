package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-versioning operators — the bookkeeping layer of an incremental
  * corpus pipeline: diff two snapshots of a table (what changed between
  * ingest runs) and build a type-2 slowly-changing-dimension history from a
  * change feed (full validity intervals per key). Both mirror the
  * reference's idempotent re-export behavior (re-running the pipeline must
  * reconcile, not duplicate — cf. /root/reference EsParquetWriter.java's
  * overwrite-per-index layout) as first-class relational operators.
  *
  * Scale shape: the diff is ONE shuffle (full outer hash join on the key);
  * SCD2 is ONE shuffle (window partitioned by the key — parallel across
  * keys, never a global window). Both survive a 1000-executor scale-up
  * unchanged.
  */
object Versioning {

  /** Snapshot diff: compare `orders` against a simulated next version
    * (keys %97 deleted, %10=3 repriced, %50=7 re-ingested under new ids)
    * and emit one row per difference with its verdict. The derived second
    * snapshot keeps the query self-contained and exactly replayable; users
    * pass any two versions of the same table. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_totalprice")
    val next = base
      .filter($"o_orderkey" % 97 =!= 0)
      .select(
        $"o_orderkey",
        when($"o_orderkey" % 10 === 3, $"o_totalprice" + 100.0)
          .otherwise($"o_totalprice")
          .as("o_totalprice")
      )
      .unionByName(
        base
          // synthetic "added" keys: TPC-H orderkeys reach 6M·SF, so the
          // offset must sit far above any real key at any plausible SF
          // (1e13 clears SF 100k = 100 TB by 16×) or adds silently
          // collide with real rows and stop modelling an add.
          .filter($"o_orderkey" % 50 === 7)
          .select(($"o_orderkey" + 10000000000000L).as("o_orderkey"), $"o_totalprice")
      )
    base
      .select($"o_orderkey", $"o_totalprice".as("old_price"))
      .join(
        next.select($"o_orderkey", $"o_totalprice".as("new_price")),
        Seq("o_orderkey"),
        "full_outer"
      )
      .withColumn(
        "verdict",
        when($"old_price".isNull, "added")
          .when($"new_price".isNull, "removed")
          .when($"old_price" =!= $"new_price", "changed")
          .otherwise("unchanged")
      )
      .filter($"verdict" =!= "unchanged")
      .select($"o_orderkey", $"verdict", $"old_price", $"new_price")
      .orderBy($"o_orderkey")
  }

  /** Type-2 SCD history: a change feed (initial order + price revisions at
    * +30/+60 days for keys %3 / %9) folded into validity intervals —
    * valid_from/valid_to per version, open interval = current row. The
    * lead() window partitioned by the key is the canonical one-shuffle
    * SCD2 build. Keys capped at 2000 to bound the declared output. */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = Tables
      .orders(spark, sfDir)
      .filter($"o_orderkey" <= 2000)
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
    val feed = base
      .select($"o_orderkey", $"o_orderdate".as("change_ts"), $"o_totalprice".as("price"))
      .unionByName(
        base
          .filter($"o_orderkey" % 3 === 0)
          .select(
            $"o_orderkey",
            ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("change_ts"),
            ($"o_totalprice" + 10.0).as("price")
          )
      )
      .unionByName(
        base
          .filter($"o_orderkey" % 9 === 0)
          .select(
            $"o_orderkey",
            ($"o_orderdate" + expr("INTERVAL 60 DAYS")).as("change_ts"),
            ($"o_totalprice" + 25.0).as("price")
          )
      )
    val w = Window.partitionBy($"o_orderkey").orderBy($"change_ts")
    feed
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead($"change_ts", 1).over(w))
      .select(
        $"o_orderkey",
        $"version",
        $"price",
        $"change_ts".as("valid_from"),
        $"valid_to",
        $"valid_to".isNull.as("is_current")
      )
      .orderBy($"o_orderkey", $"version")
  }

  /** Incremental materialized-view maintenance: a daily (day, event_type)
    * aggregate MV split into a BASE partition (days 1-20, the stored MV)
    * and a DELTA partition (days 21+, the new batch), merged with a full
    * outer join + coalesced partial sums. At 100 TB this is the identity
    * that makes re-aggregation unnecessary: only the delta is scanned and
    * the merge shuffles MV-sized (tiny) data, never the fact table. The
    * value sums ride the integer-cents grid so merged == recomputed exactly
    * (the DuckDB oracle recomputes from scratch and must hash-match). */
  def mvIncrementalMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables
      .events(spark, sfDir)
      .select(
        to_date($"ts").as("day"),
        $"event_type",
        round($"value" * 100).cast("long").as("cents")
      )
    def agg(df: DataFrame): DataFrame =
      df.groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n"), sum($"cents").as("c"))
    val base  = agg(ev.filter(dayofmonth($"day") <= 20))
    val delta = agg(ev.filter(dayofmonth($"day") > 20))
    base
      .select($"day", $"event_type", $"n".as("bn"), $"c".as("bc"))
      .join(
        delta.select($"day", $"event_type", $"n".as("dn"), $"c".as("dc")),
        Seq("day", "event_type"),
        "full_outer"
      )
      .select(
        $"day",
        $"event_type",
        (coalesce($"bn", lit(0L)) + coalesce($"dn", lit(0L))).as("n_events"),
        ((coalesce($"bc", lit(0L)) + coalesce($"dc", lit(0L))).cast("double") / 100.0)
          .as("total_value")
      )
      .orderBy($"day", $"event_type")
  }

  /** Cross-run integrity manifest: per-table row count plus an ORDER-FREE
    * content checksum (bit_xor of a 60-bit md5 key hash) over every core
    * table. XOR is commutative/associative, so the checksum is independent
    * of partitioning and merge order — the property that lets two 100 TB
    * runs (or an engine and its oracle) compare content without sorting a
    * single row. */
  def integrityManifest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFns.h60
    // spread: the md5 checksum must not run inside the single-row-group scan
    def man(name: String, df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
      Tables.spread(df).select(lit(name).as("table_name"), h60(key).as("h"))
    val rows = man(
      "orders",
      Tables.orders(spark, sfDir),
      concat_ws("|", $"o_orderkey", $"o_orderstatus")
    ).unionByName(
      man(
        "lineitem",
        Tables.lineitem(spark, sfDir),
        concat_ws("|", $"l_orderkey", $"l_linenumber")
      )
    ).unionByName(
      man("customer", Tables.customer(spark, sfDir), concat_ws("|", $"c_custkey", $"c_name"))
    ).unionByName(
      man("documents", Tables.documents(spark, sfDir), concat_ws("|", $"doc_id", md5($"text")))
    )
    rows
      .groupBy($"table_name")
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("content_xor"),
        min($"h").as("min_h"),
        max($"h").as("max_h")
      )
      .orderBy($"table_name")
  }
}
