package graft.operators

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational query pack: reference-parity operators (SURVEY.md §2.1 O2-O5,
  * O14, O16) plus the relational core the checklist mandates (§2.2 — joins of
  * every type, aggregation variants, windows, sorts/top-k, set ops).
  *
  * Everything here is declarative DataFrame code: Catalyst handles predicate
  * pushdown, column pruning, partial aggregation and join selection. Small
  * dimension tables (region/nation/supplier/customer at any SF that matters)
  * are explicitly `broadcast()` so the plans stay shuffle-free on the probe
  * side at 100 TB; big-big joins shuffle on their keys, which is the correct
  * plan at scale.
  */
object Relational {

  /** O3/O14-style pricing summary (TPC-H Q1 shape): scan+filter+agg with
    * partial/final HashAggregate. Reference analog: the terms aggregation at
    * Bootstrap.java:196-219 generalized to multi-measure. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Two-level exact aggregation (Det.gridPartial/gridMergeWide): six
    // groups see ~1/6 of the table each, so the 1e4 grid's LONG capacity
    // runs out near SF ~9e3 and the 1e6 grid's near SF ~80
    // (GridOverflowSpec); the two-level idiom keeps per-row work LONG and
    // pays DECIMAL only across (groups x partitions) partials. The 1e2
    // grids fit LONG end-to-end (audited), so their partials merge as
    // plain long sums.
    val grid = Tables
      .lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1999-01-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus", spark_partition_id().as("_pid"))
      .agg(
        sum($"l_quantity").as("p_qty"),
        Det.gridPartial($"l_extendedprice", 2).as("p_base"),
        Det.gridPartial($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("p_disc"),
        Det
          .gridPartial($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6)
          .as("p_charge"),
        Det.gridPartial($"l_discount", 2).as("p_dsc"),
        count(lit(1)).as("p_n")
      )
    grid
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"p_qty").as("sum_qty"),
        (sum($"p_base").cast("double") / 100.0).as("sum_base_price"),
        Det.gridMergeWide($"p_disc", 4).as("sum_disc_price"),
        Det.gridMergeWide($"p_charge", 6).as("sum_charge"),
        (sum($"p_qty") / sum($"p_n")).as("avg_qty"),
        (sum($"p_base").cast("double") / 100.0 / sum($"p_n")).as("avg_price"),
        (sum($"p_dsc").cast("double") / 100.0 / sum($"p_n")).as("avg_disc"),
        sum($"p_n").as("count_order")
      )
      // bounded output (6 returnflag×linestatus groups) — Tables.sortSmall
      .transform(Tables.sortSmall(_, $"l_returnflag", $"l_linestatus"))
  }

  /** O3: group-count + top-k — the reference's headline "terms aggregation"
    * (Bootstrap.java:204-218, size 10 at :211) over event_type in place of
    * rule_name. TakeOrderedAndProject does the top-k without a full sort. */
  def topEventTypes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, sfDir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("doc_count"))
      .orderBy($"doc_count".desc, $"event_type")
      .limit(10)
  }

  /** O2: "last N days" window pruning (getRecentNDaysIndices analog,
    * Bootstrap.java:259-268) — resolve the window off max(ts) so the query is
    * self-contained, then count per day. The scalar max is a broadcast of a
    * 1-row aggregate, not a driver collect. */
  def recentWindowDailyCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val mx = ev.agg(max($"ts").as("mx"))
    ev.crossJoin(broadcast(mx))
      .filter($"ts" >= $"mx" - expr("INTERVAL 7 DAYS"))
      .groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_events"))
      // bounded output (<= 8 day rows inside the 7-day window)
      .transform(Tables.sortSmall(_, $"day"))
  }

  /** O4: equality predicate on a text field (match_phrase rule_name analog,
    * EsParquetWriter.java:69) — pushed to the parquet scan by Catalyst. */
  def filterEquality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, sfDir)
      .filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"value")
      .orderBy($"event_id")
  }

  /** O5: deterministic 1-row sample (the `.size(1)` inference sample,
    * Bootstrap.java:294) — made deterministic by keying on event_id. */
  def sampleFirst(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, sfDir)
      .select($"event_id", $"event_type", $"user_id")
      .orderBy($"event_id")
      .limit(1)
  }

  // ---------------------------------------------------------------- joins

  /** Shuffled big-big equi-join + agg (TPC-H Q3 shape): customer ⋈ orders ⋈
    * lineitem. orders⋈lineitem shuffles on orderkey — the correct plan shape
    * at 100 TB.
    *
    * Broadcast-hint policy (applies to every query in this file): hints are
    * reserved for FIXED-cardinality dimensions (nation=25, region=5 rows at
    * every SF). Sides that scale with the data (customer, supplier) carry no
    * hint — a hint overrides autoBroadcastJoinThreshold unconditionally, so
    * at the 100 TB target it would force a driver-OOM broadcast that AQE
    * cannot demote. Without the hint AQE still picks broadcast locally from
    * runtime stats (PlanShapeSpec asserts this), and at scale it degrades
    * gracefully to a shuffled hash join. */
  def revenueByOrder(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING")
    val ord  = Tables.orders(spark, sfDir)
    val li   = Tables.lineitem(spark, sfDir)
    // dims-first join order (r19, guide §3.1): reduce orders by the
    // selective customer filter BEFORE the fact join, so the fact joins ONE
    // pre-filtered side. Locally AQE broadcasts the ~1/5-of-orders result
    // and lineitem is never shuffled; at 100 TB both joins degrade to the
    // same shuffle joins as the fact-first order. Inner-join reorder —
    // results identical (oracle-verified).
    li.join(ord.join(cust, $"o_custkey" === $"c_custkey"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", to_date($"o_orderdate").as("order_date"))
      .agg(Det.decSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(20)
  }

  /** Broadcast star join through the full dimension chain (TPC-H Q5 shape):
    * region/nation are hint-broadcast (fixed 5/25 rows at every SF); customer
    * is left to AQE (broadcast locally, shuffled at 100 TB — see the hint
    * policy on revenueByOrder). Only lineitem⋈orders must shuffle. */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nat  = Tables.nation(spark, sfDir)
    val reg  = Tables.region(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val ord  = Tables.orders(spark, sfDir)
    val li   = Tables.lineitem(spark, sfDir)
    // dims-first join order (r19, guide §3.1): resolve orders → customer →
    // nation → region into one slim (o_orderkey, r_name, n_name) side
    // before the fact join. Locally AQE broadcasts it and lineitem is
    // never shuffled; at 100 TB the join pair degrades to the same
    // shuffle joins as the fact-first order. Inner-join reorder — results
    // identical (oracle-verified).
    val dims = ord
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .select($"o_orderkey", $"r_name", $"n_name")
    li.join(dims, $"l_orderkey" === $"o_orderkey")
      // ~125 (region, nation) groups: the 1e4 grid overflows LONG near
      // SF 2e4 — two-level LONG-then-DECIMAL sum (Det.gridPartial; the
      // post-join partition sizes are AQE-bounded, same partial headroom)
      .groupBy($"r_name", $"n_name", spark_partition_id().as("_pid"))
      .agg(
        Det.gridPartial($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("p_rev"),
        count(lit(1)).as("p_n")
      )
      .groupBy($"r_name", $"n_name")
      .agg(
        Det.gridMergeWide($"p_rev", 4).as("revenue"),
        sum($"p_n").as("n_items")
      )
      // bounded output (~125 region×nation groups) — Tables.sortSmall
      .transform(Tables.sortSmall(_, $"r_name", $"n_name"))
  }

  /** Left outer join + null-aware agg: every customer with order stats,
    * customers without orders kept (count=0). */
  def customerOrderStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
    val ord  = Tables.orders(spark, sfDir)
    cust
      .join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(
        count($"o_orderkey").as("n_orders"),
        Det.decSum(coalesce($"o_totalprice", lit(0.0)), 2).as("total_spent")
      )
      .orderBy($"c_custkey")
  }

  /** Left-semi join (EXISTS): orders that have at least one high-quantity
    * line item. No duplication of the left side, right columns dropped. */
  def semiJoinOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, sfDir)
    val big = Tables.lineitem(spark, sfDir).filter($"l_quantity" >= 45).select($"l_orderkey")
    ord
      .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
      .select($"o_orderkey", $"o_orderstatus", to_date($"o_orderdate").as("order_date"))
      .orderBy($"o_orderkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no large order. */
  def antiJoinCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
    val ord  = Tables.orders(spark, sfDir).filter($"o_totalprice" > 300000).select($"o_custkey")
    cust
      .join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_nationkey")
      .orderBy($"c_custkey")
  }

  /** Full outer join on grouped keys: per-nation customer vs supplier
    * counts, nations present on either side kept. */
  def fullOuterNationCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir).groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, sfDir).groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
    c.join(s, $"c_nationkey" === $"s_nationkey", "full_outer")
      .select(
        coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp")
      )
      // bounded output (fixed 25-nation domain)
      .transform(Tables.sortSmall(_, $"nationkey"))
  }

  /** Theta (range-predicate) join via LOSSLESS band blocking: parts priced
    * within a fixed-width window [b, b+50] of each supplier's b=acctbal/4.
    * The naive plan is a nested-loop join (all-pairs at scale); because the
    * window width is a CONSTANT, the same trick as [[fuzzyNameMatch]]
    * applies — bucket prices into width-50 bands, note that a width-50
    * interval covers at most the two bands {floor(b/50), floor(b/50)+1},
    * explode the supplier side to those two, and join EQUI on the band with
    * the exact range as a post-join residual. Each qualifying pair meets on
    * exactly one band (the part's), so no dedup pass. Both sides scale with
    * the data and neither is broadcast: the band join is a hash shuffle,
    * the correct shape at 100 TB. */
  def thetaJoinPriceBand(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bandW = 50
    val supp = Tables
      .supplier(spark, sfDir)
      .select($"s_suppkey", ($"s_acctbal" / 4).as("lo"))
      .select(
        $"s_suppkey",
        $"lo",
        explode(array(floor($"lo" / bandW), floor($"lo" / bandW) + 1)).as("pb")
      )
    val part = Tables
      .part(spark, sfDir)
      .select($"p_partkey", $"p_retailprice", floor($"p_retailprice" / bandW).as("pb"))
    part
      .hint("shuffle_hash")
      .join(supp.hint("shuffle_hash"), Seq("pb"))
      .filter($"p_retailprice" >= $"lo" && $"p_retailprice" <= $"lo" + bandW)
      .select($"s_suppkey", $"p_partkey", $"p_retailprice")
      .orderBy($"s_suppkey", $"p_partkey")
  }

  /** TPC-H Q4 shape: order-priority count over a date range where at least
    * one line item was received late — semi join inside a windowed slice. */
  def latePriorityCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables
      .orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp"))
      .filter($"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val lateLines = Tables.lineitem(spark, sfDir).filter($"l_quantity" >= 48).select($"l_orderkey")
    ord
      .join(lateLines, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      // bounded output (fixed 5-priority domain)
      .transform(Tables.sortSmall(_, $"o_orderpriority"))
  }

  /** TPC-H Q7 shape: shipping volume between two nation pairs by year —
    * lineitem joined through supplier-nation AND customer-nation with a
    * symmetric pair predicate; fixed-cardinality nation dims are
    * hint-broadcast, customer/supplier are AQE's call (hint policy on
    * revenueByOrder), fact shuffles once. */
  def crossNationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n1 = Tables.nation(spark, sfDir).select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir).select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
    val li = Tables.lineitem(spark, sfDir)
    val or = Tables.orders(spark, sfDir)
    val cu = Tables.customer(spark, sfDir)
    val su = Tables.supplier(spark, sfDir)
    li.join(or, $"l_orderkey" === $"o_orderkey")
      .join(cu, $"o_custkey" === $"c_custkey")
      .join(su, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"sk")
      .join(broadcast(n2), $"c_nationkey" === $"ck")
      .filter(
        ($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_8") ||
          ($"supp_nation" === "NATION_8" && $"cust_nation" === "NATION_3")
      )
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("yr"))
      // ~14 nation-pair×year groups after the filter; per-group rows still
      // scale linearly with SF — wide accumulator (GridOverflowSpec)
      .agg(graft.Det.decSumWide($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("volume"))
      // bounded output (2 nation pairs x shipdate years)
      .transform(Tables.sortSmall(_, $"supp_nation", $"cust_nation", $"yr"))
  }

  /** TPC-H Q19 shape: disjunctive multi-attribute predicates (OR of ANDed
    * brand/size/quantity bands) — Catalyst pushes the common part join key
    * and evaluates the residual disjunction post-join. Part carries NO
    * broadcast hint (it scales with SF — hint policy on revenueByOrder);
    * Catalyst/AQE still broadcast it locally from size stats
    * (PlanShapeSpec), and at 100 TB the join degrades to a shuffled hash
    * join instead of a forced driver-OOM broadcast. */
  def disjunctivePredicates(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val pt = Tables.part(spark, sfDir)
    li.join(pt, $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 15)) ||
          ($"p_brand" === "Brand#2" && $"p_size".between(10, 30) && $"l_quantity".between(10, 25)) ||
          ($"p_brand" === "Brand#3" && $"p_size".between(20, 50) && $"l_quantity".between(20, 40))
      )
      .agg(
        // GLOBAL aggregate (one group sees every surviving row) on the 1e4
        // grid — wide accumulator (GridOverflowSpec)
        graft.Det.decSumWide($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
        count(lit(1)).as("n_items")
      )
  }

  // ----------------------------------------------------- aggregation variants

  /** Distinct + approx-distinct aggregation. The HLL estimate is engine-
    * specific, so only exact measures are oracle-checked; the approx column
    * lives in [[approxDistinct]] (exact-part + tolerance oracle). */
  def distinctAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Split-distinct plan (r19): the classic multi-countDistinct form
    // plans ONE Expand (3× the input) whose partial aggregate runs inside
    // the scan stage — serial on a single-row-group input and 3× the rows
    // everywhere. Two separate dedup pipelines collapse map-side on their
    // own key and join on the 3-row group domain (measured 1.23 → 0.82 s
    // at sf0.1). `count(col)` over the per-key groups mirrors COUNT
    // (DISTINCT col)'s null semantics exactly (a null key forms a group;
    // count(col) skips it); n_rows = Σ per-key counts = count(*).
    val li = Tables.lineitem(spark, sfDir)
    val no = li
      .groupBy($"l_returnflag", $"l_orderkey")
      .agg(count(lit(1)).as("c"))
      .groupBy($"l_returnflag")
      .agg(count($"l_orderkey").as("n_orders"), sum($"c").as("n_rows"))
    val np = li
      .groupBy($"l_returnflag", $"l_partkey")
      .agg(count(lit(1)).as("c2"))
      .groupBy($"l_returnflag")
      .agg(count($"l_partkey").as("n_parts"))
      .withColumnRenamed("l_returnflag", "rf2")
    // null-SAFE equi-join (r20, r19 ADVICE): both pipelines aggregate the
    // same rows, so their group-key sets are identical — but a NULL
    // returnflag group (which the original groupBy+countDistinct form
    // emitted as a row) would never match under a plain equi-join. <=>
    // keeps that row; still a hash-joinable equi-condition on a 3-row side.
    no.join(np, $"l_returnflag" <=> $"rf2")
      .select($"l_returnflag", $"n_orders", $"n_parts", $"n_rows")
      // bounded output (3 returnflag groups)
      .transform(Tables.sortSmall(_, $"l_returnflag"))
  }

  /** approx_count_distinct (HLL++) made fully oracle-checkable: the
    * estimate itself is engine-specific, so the declared output is the
    * deterministic part (the exact count) plus `within_tolerance`, computed
    * Spark-side as |est − exact| ≤ 5% · exact (rsd 0.02 → ~2σ headroom).
    * The oracle emits the same exact counts with `within_tolerance = true`,
    * so the driver hash-checks both the exact values AND that the sketch
    * estimate landed inside its error contract. */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Both aggregates ride ONE (returnflag, orderkey) dedup pipeline (r19):
    // the HLL++ sketch is a function of the SET of hashed inputs, so the
    // estimate over deduplicated keys is bit-identical to the estimate
    // over raw rows, and count(col) over the per-key groups mirrors
    // COUNT(DISTINCT col) exactly (nulls form a group count skips). This
    // removes the distinct-rewrite's serial partial aggregate over the
    // full table (measured 2.91 → 0.89 s at sf0.1).
    Tables
      .lineitem(spark, sfDir)
      .groupBy($"l_returnflag", $"l_orderkey")
      .agg(count(lit(1)).as("c"))
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", 0.02).as("est"),
        count($"l_orderkey").as("n_orders_exact")
      )
      .select(
        $"l_returnflag",
        $"n_orders_exact",
        (abs($"est" - $"n_orders_exact") <= $"n_orders_exact" * 0.05).as("within_tolerance")
      )
      // bounded output (3 returnflag groups)
      .transform(Tables.sortSmall(_, $"l_returnflag"))
  }

  /** ROLLUP: order counts at (status, priority), (status), () levels.
    * GROUPING() distinguishes the null-as-total rows from real nulls. */
  def rollupOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .orders(spark, sfDir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        // the rollup's () grand-total row sums EVERY order: the 1e2 grid's
        // LONG capacity runs out near SF 1.2e5 — wide (GridOverflowSpec)
        Det.decSumWide($"o_totalprice", 2).as("total"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_priority")
      )
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"g_status",
        $"g_priority",
        $"n",
        $"total"
      )
      // bounded output (status x priority rollup over fixed domains)
      .transform(Tables.sortSmall(_, $"g_status", $"g_priority", $"status", $"priority"))
  }

  /** CUBE over (returnflag, linestatus) with grouping id. */
  def cubeLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, sfDir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping($"l_returnflag").cast("int").as("g_rf"),
        grouping($"l_linestatus").cast("int").as("g_ls")
      )
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"g_rf",
        $"g_ls",
        $"sum_qty",
        $"n"
      )
      // bounded output (returnflag x linestatus cube)
      .transform(Tables.sortSmall(_, $"g_rf", $"g_ls", $"returnflag", $"linestatus"))
  }

  // ------------------------------------------------------------- windows

  /** Window-function pack: row_number / rank / dense_rank / lag / lead /
    * running sum, partitioned per order. */
  def windowFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w  = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .lineitem(spark, sfDir)
      .filter($"l_orderkey" <= 100)
      .select(
        $"l_orderkey",
        $"l_linenumber",
        $"l_quantity",
        row_number().over(w).as("rn"),
        rank().over(Window.partitionBy($"l_orderkey").orderBy($"l_quantity".desc, $"l_linenumber")).as("qty_rank"),
        dense_rank().over(Window.partitionBy($"l_orderkey").orderBy($"l_quantity".desc)).as("qty_dense_rank"),
        lag($"l_quantity", 1).over(w).as("prev_qty"),
        lead($"l_quantity", 1).over(w).as("next_qty"),
        sum($"l_quantity").over(wr).as("running_qty")
      )
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Extended window-function pack: ntile / percent_rank / cume_dist /
    * first / nth_value over per-customer order histories. */
  def windowFunctionsExtended(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
    Tables
      .orders(spark, sfDir)
      .filter($"o_custkey" <= 50)
      .select(
        $"o_custkey",
        $"o_orderkey",
        $"o_totalprice",
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first($"o_orderkey").over(w).as("cheapest_order"),
        nth_value($"o_orderkey", 2).over(w).as("second_cheapest")
      )
      .orderBy($"o_custkey", $"o_totalprice", $"o_orderkey")
  }

  /** Fuzzy string matching (levenshtein ≤ 6) with LOSSLESS length-band
    * blocking — the candidate generator that makes edit-distance dedup work
    * unsliced: strings within edit distance k differ in length by at most k,
    * so with band = len/(k+1) a qualifying pair's bands differ by at most 1.
    * One side explodes to {band-1, band, band+1}, the other keeps its band,
    * and the join is EQUI on the band — a hash shuffle whose cost is
    * bucket-bounded, never an all-pairs theta join. Each pair meets on
    * exactly one band value, so no dedup pass is needed. A cheap
    * length-delta prefilter skips hopeless levenshtein calls. The p_partkey
    * slice only bounds the declared output size; the plan does not depend
    * on it. (Production upgrade path for tighter candidate sets: PassJoin
    * segment signatures.) */
  def fuzzyNameMatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    fuzzyPairs(
      Tables.part(spark, sfDir).filter($"p_partkey" <= 100).select($"p_partkey", $"p_name"),
      "p_partkey",
      "p_name",
      6
    ).orderBy($"id1", $"id2")
  }

  /** The reusable blocked fuzzy self-match over any (id, string) relation —
    * unsliced, scale-shaped. Returns (id1, id2, dist) for all pairs with
    * levenshtein ≤ maxDist. */
  def fuzzyPairs(df: DataFrame, id: String, s: String, maxDist: Int): DataFrame = {
    import df.sparkSession.implicits._
    val bandW = maxDist + 1
    val p     = df.select(col(id), col(s), (length(col(s)) / bandW).cast("int").as("band"))
    val a = p.select(
      col(id).as("id1"),
      col(s).as("name1"),
      explode(array($"band" - 1, $"band", $"band" + 1)).as("jb")
    )
    val b = p.select(col(id).as("id2"), col(s).as("name2"), $"band".as("jb"))
    a.hint("shuffle_hash")
      .join(b.hint("shuffle_hash"), Seq("jb"))
      .filter($"id1" < $"id2" && abs(length($"name1") - length($"name2")) <= maxDist)
      .withColumn("dist", levenshtein($"name1", $"name2"))
      .filter($"dist" <= maxDist)
      .select($"id1", $"id2", $"dist")
  }

  /** Top-k per group via window + filter: 3 most expensive orders per
    * customer (the scalable alternative to a global sort). */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables
      .orders(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk")
  }

  /** Global top-k: 10 most expensive orders (TakeOrderedAndProject — no full
    * sort at scale). */
  def globalTopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables
      .orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  // ------------------------------------------------------------- set ops

  /** UNION / INTERSECT / EXCEPT over the nation-key sets of customers vs
    * suppliers, tagged per operation in one result. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir).select($"c_nationkey".cast("int").as("nationkey")).distinct()
    val s = Tables.supplier(spark, sfDir).select($"s_nationkey".cast("int").as("nationkey")).distinct()
    val u = c.union(s).distinct().withColumn("op", lit("union"))
    val i = c.intersect(s).withColumn("op", lit("intersect"))
    val e = c.except(s).withColumn("op", lit("except"))
    u.unionByName(i)
      .unionByName(e)
      .select($"op", $"nationkey")
      // bounded output (3 ops x fixed 25-nation domain)
      .transform(Tables.sortSmall(_, $"op", $"nationkey"))
  }
}
